package graft

import graft.plans.AsOfJoin
import graft.queries.AdvancedQueries
import org.apache.spark.sql.functions._

/** Native as-of join (custom LogicalPlan/Strategy/SparkPlan) semantics:
  * handcrafted edge cases, plan shape, and equivalence with the
  * window-composed form on the events fixture.
  */
class AsOfJoinSpec extends SparkSpec {

  private def handcrafted = {
    import spark.implicits._
    val probe = Seq(
      (1L, "a", 100L), // between b1 and b2 → matches t=90
      (2L, "a", 90L),  // exact tie → matches t=90 (inclusive)
      (3L, "a", 10L),  // before all builds → null
      (4L, "b", 500L), // key with single build row
      (5L, "c", 50L),  // key absent from build → null
      (6L, null, 50L)  // null key → null
    ).toDF("id", "k", "t")
    val build = Seq(
      ("a", 20L, "b0"), ("a", 90L, "b1"), ("a", 150L, "b2"),
      ("b", 400L, "bb")
    ).toDF("bk", "bt", "tag")
    (probe, build)
  }

  test("as-of: inclusive match, no-match null, null keys never match") {
    val (probe, build) = handcrafted
    val out = AsOfJoin.asof(probe, build,
        Seq(probe("k")), Seq(build("bk")), probe("t"), build("bt"))
      .select("id", "bt", "tag").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 90L, "b1"), (2L, 90L, "b1"), (3L, null, null),
      (4L, 400L, "bb"), (5L, null, null), (6L, null, null)))
  }

  test("as-of physical plan: AsOfJoinExec present, probe side not shuffled") {
    val (probe, build) = handcrafted
    val out = AsOfJoin.asof(probe, build,
      Seq(probe("k")), Seq(build("bk")), probe("t"), build("bt"))
    val plan = out.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Exchange"), s"as-of join must not shuffle:\n$plan")
  }

  private def withSmjForced[A](body: => A): A = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try { spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1"); body }
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("sort-merge as-of (big build path): same results, exchanges+sorts planted") {
    withSmjForced {
      val (probe, build) = handcrafted
      val out = AsOfJoin.asof(probe, build,
        Seq(probe("k")), Seq(build("bk")), probe("t"), build("bt"))
      val plan = out.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeAsOfJoin"), plan)
      assert(plan.contains("Exchange hashpartitioning"),
        s"EnsureRequirements must plant hash exchanges:\n$plan")
      assert(plan.contains("Sort ["), s"EnsureRequirements must plant sorts:\n$plan")
      val rows = out.select("id", "bt", "tag").orderBy("id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), r.getString(2)))
      assert(rows.toSeq == Seq(
        (1L, 90L, "b1"), (2L, 90L, "b1"), (3L, null, null),
        (4L, 400L, "bb"), (5L, null, null), (6L, null, null)))
    }
  }

  test("as-of tolerance: matches older than the bound fall to null (both paths)") {
    val (probe, build) = handcrafted
    def run(): Seq[(Long, Any)] =
      AsOfJoin.asof(probe, build,
        Seq(probe("k")), Seq(build("bk")), probe("t"), build("bt"),
        toleranceMicros = 15L)
        .select("id", "bt").orderBy("id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSeq
    // id=1 (t=100, match bt=90, dist 10 <= 15): kept; id=2 (dist 0): kept;
    // id=4 (t=500, match bt=400, dist 100 > 15): nulled
    val expected = Seq((1L, 90L), (2L, 90L), (3L, null), (4L, null), (5L, null), (6L, null))
    assert(run() == expected)
    withSmjForced { assert(run() == expected) }
  }

  test("sort-merge as-of equals broadcast as-of on events") {
    val smj = withSmjForced {
      AdvancedQueries.asofNative(spark, sf).collect().map(_.toSeq).toSeq
    }
    val bcast = AdvancedQueries.asofNative(spark, sf).collect().map(_.toSeq).toSeq
    assert(smj.nonEmpty && smj == bcast)
  }

  test("as-of with empty build side: all probes null-matched (both paths)") {
    val (probe, build) = handcrafted
    val empty = build.filter(org.apache.spark.sql.functions.lit(false))
    def run(): Long =
      AsOfJoin.asof(probe, empty,
        Seq(probe("k")), Seq(empty("bk")), probe("t"), empty("bt"))
        .filter(org.apache.spark.sql.functions.col("bt").isNull).count()
    assert(run() == 6)
    withSmjForced { assert(run() == 6) }
  }

  test("AsOfJoinPruning: projecting after asof prunes unreferenced columns to the scan") {
    import org.apache.spark.sql.functions.col
    // full-width events on BOTH sides (incl. the fat JSON props column)
    val ev = Tables.events(spark, sf)
    val probe = ev.filter(col("event_type") === "purchase")
    val build = ev.filter(col("event_type") === "click")
      .select(ev.columns.map(c => col(c).as(s"c_$c")): _*)
    val out = AsOfJoin.asof(probe, build,
        Seq(probe("user_id")), Seq(build("c_user_id")),
        probe("ts"), build("c_ts"))
      .select("event_id", "c_ts")
    val plan = out.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(!plan.contains("props"),
      s"props must be pruned from both scans:\n$plan")
    assert(out.count() > 0)
  }

  test("randomized differential: both paths equal a driver-side reference under ties") {
    import spark.implicits._
    // Deterministic adversarial generation: 5-7 keys x 25 time values over
    // hundreds of rows forces the cases the fixture never has — exact
    // boundary ties (bt == t), duplicate (key, time) build rows, probe keys
    // absent from the build (probe draws k0-k6, build only k0-k4, so k5/k6
    // probes structurally have no build rows), null keys — under both
    // tolerance modes and both physical paths. The matched TIME is compared
    // (tie payload is documented-undefined, as in DuckDB ASOF /
    // pandas merge_asof).
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 4) {
      val probe = (1 to 200).map(i => (i.toLong,
        if (rnd.nextInt(10) == 0) null else s"k${rnd.nextInt(7)}",
        rnd.nextInt(25).toLong))
      val build = (1 to 120).map(_ =>
        (s"k${rnd.nextInt(5)}", rnd.nextInt(25).toLong, rnd.nextInt(1000)))
      val pdf = probe.toDF("id", "k", "t")
      val bdf = build.toDF("bk", "bt", "pay")
      val tol = if (trial % 2 == 0) 5L else -1L
      val sortedTimes = build.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sorted }
      val expect = probe.map { case (id, k, t) =>
        id -> (if (k == null) None
               else sortedTimes.getOrElse(k, Nil).takeWhile(_ <= t).lastOption
                 .filter(bt => tol < 0 || t - bt <= tol))
      }.toMap
      def run(): Map[Long, Option[Long]] = {
        val rows = AsOfJoin.asof(pdf, bdf,
            Seq(pdf("k")), Seq(bdf("bk")), pdf("t"), bdf("bt"),
            toleranceMicros = tol)
          .select("id", "bt").collect()
        assert(rows.length == probe.length,
          s"as-of must stay 1:1 per probe row even on build-side ties (trial $trial)")
        rows.map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      }
      assert(run() == expect, s"broadcast path diverged (trial $trial, tol $tol)")
      withSmjForced { assert(run() == expect, s"smj path diverged (trial $trial, tol $tol)") }
    }
  }

  test("native as-of equals window-composed as-of on events (no tie collisions in fixture)") {
    val native = AdvancedQueries.asofNative(spark, sf).collect().map(_.toSeq)
    val window = AdvancedQueries.asofJoin(spark, sf).collect().map(_.toSeq)
    assert(native.nonEmpty)
    assert(native.toSeq == window.toSeq)
  }
}
