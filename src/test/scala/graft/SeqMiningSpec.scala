package graft

import graft.queries.{MixQueries, SequenceQueries}
import org.apache.spark.sql.functions._

/** Sequential 2-pattern support and the DoReMi reweighting step: both
  * recomputed driver-side from raw data with independent logic (event-level
  * existential scan; StrictMath-free Taylor fold), plus the structural
  * invariants each must satisfy.
  */
class SeqMiningSpec extends SparkSpec {

  test("seq-pair support equals the event-level existential scan (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent logic: scan every event PAIR per user (quadratic, no
    // first/last-occurrence shortcut)
    val byUser = ev.groupBy(_._1)
    val support = scala.collection.mutable.Map.empty[(String, String), Int]
    byUser.values.foreach { evs =>
      val pairs = (for {
        (_, a, ta) <- evs; (_, b, tb) <- evs if ta < tb
      } yield (a, b)).toSet
      pairs.foreach(p => support(p) = support.getOrElse(p, 0) + 1)
    }
    val hasType = scala.collection.mutable.Map.empty[String, Int]
    byUser.values.foreach(_.map(_._2).toSet.foreach(t =>
      hasType(t) = hasType.getOrElse(t, 0) + 1))
    val got = SequenceQueries.seqPairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === support.keySet)
    got.foreach { case ((a, b), (nab, na, conf)) =>
      assert(nab === support((a, b)).toLong, s"support mismatch for $a->$b")
      assert(na === hasType(a).toLong, s"antecedent count mismatch for $a")
      assert(nab <= na && conf <= 1.0 + 1e-12)
      val want = BigDecimal(nab.toDouble / na)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(conf - want) < 1e-9)
    }
  }

  test("doremi weights form a distribution and move with token excess (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = MixQueries.doremiStep(spark, dir).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
          r.getAs[Double]("excess"), r.getAs[Double]("weight")))
      // distribution: sums to 1 within the per-domain rounding budget
      val sum = rows.map(_._4).sum
      assert(math.abs(sum - 1.0) < rows.length * 1e-6 + 1e-9,
        s"weights sum to $sum at $dir")
      // exponentiated-gradient monotonicity: more excess, more weight
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).foreach { case Array((sa, _, ea, wa), (sb, _, eb, wb)) =>
        if (eb > ea + 1e-9)
          assert(wb >= wa - 1e-9, s"$sb (excess $eb) below $sa ($ea) at $dir")
      }
      // smoothing floor: no domain starves below c/N
      rows.foreach { case (src, _, _, w) =>
        assert(w >= 0.1 / rows.length - 1e-6, s"$src starved at $dir")
      }
    }
  }
}
