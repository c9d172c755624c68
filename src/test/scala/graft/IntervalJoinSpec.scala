package graft

import graft.plans.IntervalJoin
import org.apache.spark.sql.functions._

/** The native interval-join exec vs the composed BETWEEN-join form it
  * replaces — equivalence on real data, overlap multiplicity, boundary
  * inclusivity, null/inverted-interval hygiene, and the plan itself.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // a val, not a def: each call of a def would mint fresh attribute ids,
  // and the point/lo/hi Columns must resolve against the SAME plan instance
  private lazy val bands = spark.range(14).select(col("id").as("band_id"),
    (col("id").cast("double") * 8000).as("lo"),
    (col("id").cast("double") * 8000 + 15999.99).as("hi"))

  test("equivalent to the BNLJ BETWEEN join on lineitem, row for row") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val native = IntervalJoin.intervalJoin(li, bands,
        li("l_extendedprice"), bands("lo"), bands("hi"))
      .select("l_orderkey", "l_linenumber", "band_id")
      .orderBy("l_orderkey", "l_linenumber", "band_id").collect().toSeq
    val reference = li.join(bands,
        li("l_extendedprice") >= bands("lo") && li("l_extendedprice") <= bands("hi"))
      .select("l_orderkey", "l_linenumber", "band_id")
      .orderBy("l_orderkey", "l_linenumber", "band_id").collect().toSeq
    assert(native.nonEmpty && native == reference)
  }

  test("overlapping intervals emit one row per containing interval") {
    val probe = Seq((1L, 10.0), (2L, 25.0)).toDF("id", "x")
    val build = Seq(("a", 0.0, 15.0), ("b", 5.0, 30.0), ("c", 20.0, 40.0))
      .toDF("name", "blo", "bhi")
    val out = IntervalJoin.intervalJoin(probe, build,
        probe("x"), build("blo"), build("bhi"))
      .select("id", "name").orderBy("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c")))
  }

  test("closed boundaries match; nulls and inverted intervals never do") {
    val probe = Seq((1L, Some(5.0)), (2L, Some(7.0)), (3L, None)).toDF("id", "x")
    val build = Seq(
      (Some(5.0), Some(7.0), "ok"),      // closed [5,7]: both boundary probes hit
      (None, Some(100.0), "null_lo"),
      (Some(0.0), None, "null_hi"),
      (Some(9.0), Some(1.0), "inverted"))
      .toDF("blo", "bhi", "tag")
    val out = IntervalJoin.intervalJoin(probe, build,
        probe("x"), build("blo"), build("bhi"))
      .select("id", "tag").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "ok"), (2L, "ok")))
  }

  test("randomized differential vs the BETWEEN join: shared endpoints, zero width") {
    // Integer-valued doubles over a 50-value space force what the fixture
    // differential rarely hits: probes landing EXACTLY on interval
    // endpoints, zero-width [lo, lo] intervals, duplicate intervals, and
    // dense multi-overlap — compared row-for-row against the BETWEEN
    // cross-join reference.
    val rnd = new scala.util.Random(73L)
    for (trial <- 1 to 3) {
      val probe = (1 to 300).map(i => (i.toLong, rnd.nextInt(50).toDouble))
        .toDF("id", "x")
      val build = (1 to 60).map { j =>
        val lo = rnd.nextInt(50).toDouble
        (j.toLong, lo, lo + rnd.nextInt(8).toDouble)
      }.toDF("bid", "blo", "bhi")
      def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        df.select("id", "bid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val native = pairs(IntervalJoin.intervalJoin(probe, build,
        probe("x"), build("blo"), build("bhi")))
      val reference = pairs(probe.join(build,
        probe("x") >= build("blo") && probe("x") <= build("bhi")))
      assert(native.nonEmpty && native == reference, s"trial $trial")
    }
  }

  test("empty build side yields an empty result, not a failure") {
    val probe = Seq((1L, 5.0)).toDF("id", "x")
    val build = Seq.empty[(Double, Double, String)].toDF("blo", "bhi", "tag")
    assert(IntervalJoin.intervalJoin(probe, build,
      probe("x"), build("blo"), build("bhi")).count() == 0)
  }

  test("plans the custom exec — never a BroadcastNestedLoopJoin") {
    val plan = SparkEntry.queries("q_interval_native")(spark, sf)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastIntervalJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("column pruning reaches the scans through the custom node") {
    val li = Tables.lineitem(spark, sf)
    val joined = IntervalJoin.intervalJoin(li, bands,
        li("l_extendedprice"), bands("lo"), bands("hi"))
      .select("l_extendedprice", "band_id")
    val scan = joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("FileScan") && l.contains("lineitem"))
      .getOrElse(fail("no lineitem scan in plan"))
    assert(scan.contains("ReadSchema: struct<l_extendedprice:double>"),
      s"scan not pruned to the referenced column:\n$scan")
  }
}
