package graft

import graft.queries.SketchQueries
import org.apache.spark.sql.Row

/** Invariants of the fully-oracled sketch family (SketchQueries): HLL
  * error envelope at two scales, Bloom one-sided error, and fingerprint
  * layout-independence — the properties that make each sketch USABLE,
  * beyond the oracle's bit-equality on this fixture.
  */
class SketchOpsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("sketch_hll estimate lands inside the 3-sigma envelope at two SFs") {
    for (d <- Seq(sf, sf01)) {
      val r = SketchQueries.hll(spark, d).select("est_distinct", "exact_distinct")
        .head()
      val (est, exact) = (r.getDouble(0), r.getLong(1))
      // m=64 => relative std error 1.04/sqrt(64) ~= 13%; allow 3 sigma.
      assert(math.abs(est - exact) <= 0.39 * exact,
        s"$d: est=$est exact=$exact drifted past 39%")
    }
  }

  test("sketch_hll registers are a well-formed 64-cell file") {
    val regs = SketchQueries.hll(spark, sf01).select("bucket", "reg").collect()
    assert(regs.length == 64)
    assert(regs.map(_.getLong(0)).toSet == (0L until 64L).toSet)
    assert(regs.forall { r => val v = r.getLong(1); v >= 0 && v <= 26 })
  }

  test("sketch_bloom never false-negatives; absent probes present") {
    for (d <- Seq(sf, sf01)) {
      val rows = SketchQueries.bloom(spark, d).collect()
      val falseNeg = rows.filter(r =>
        r.getAs[Long]("present") == 1 && r.getAs[Long]("bloom_hit") == 0)
      assert(falseNeg.isEmpty, s"$d: bloom false negatives: ${falseNeg.mkString}")
      assert(rows.count(_.getAs[Long]("present") == 0) == 20,
        s"$d: expected all 20 synthetic absent probes")
      // every flagged false_positive is consistent with (hit && !present)
      assert(rows.forall(r => (r.getAs[Long]("false_positive") == 1) ==
        (r.getAs[Long]("bloom_hit") == 1 && r.getAs[Long]("present") == 0)))
    }
  }

  test("q_table_fingerprint is invariant under repartitioning (layout-free)") {
    val li = Tables.lineitem(spark, sf01)
    def strip(r: Row) = r.toSeq
    val base = SketchQueries.audit("t", li, SketchQueries.lineitemCanon)
      .head()
    val shuffled = SketchQueries
      .audit("t", li.repartition(7), SketchQueries.lineitemCanon).head()
    val coalesced = SketchQueries
      .audit("t", li.coalesce(1), SketchQueries.lineitemCanon).head()
    assert(strip(base) == strip(shuffled) && strip(base) == strip(coalesced),
      s"fingerprint changed with layout: $base vs $shuffled vs $coalesced")
  }

  test("q_table_fingerprint detects a single-row mutation") {
    val li = Tables.lineitem(spark, sf01)
    val mutated = li.withColumn("l_suppkey",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("l_orderkey") === li.select("l_orderkey").head().getLong(0),
        org.apache.spark.sql.functions.col("l_suppkey") + 1
      ).otherwise(org.apache.spark.sql.functions.col("l_suppkey")))
    val a = SketchQueries.audit("t", li, SketchQueries.lineitemCanon).head()
    val b = SketchQueries.audit("t", mutated, SketchQueries.lineitemCanon).head()
    assert(a.getAs[Long]("h_sum") != b.getAs[Long]("h_sum") ||
      a.getAs[Long]("h_xor") != b.getAs[Long]("h_xor"),
      "fingerprint failed to catch a one-row mutation")
  }
}
