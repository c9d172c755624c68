package graft

import graft.plans.TopKAgg
import graft.queries.WindowQueries
import org.apache.spark.sql.functions._

/** Native bounded-heap top-k aggregate: window-rank equivalence, partition
  * invariance (merge path), tie/null/overshoot semantics, the
  * ObjectHashAggregate partial-aggregation plan pin, and the raw Buffer's
  * serialize/insert contract.
  */
class TopKAggSpec extends SparkSpec {

  test("q_topk_native equals the rank-window answer and is partition-invariant") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          (col("l_orderkey") * 8L + col("l_linenumber")).as("ref"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy(col("price_c").desc, col("ref"))
      val want = li.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("flag", "rnk", "price_c", "ref")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      for (parts <- Seq(1, 7)) {
        val got = li.repartition(parts)
          .groupBy("flag")
          .agg(TopKAgg.topk(col("price_c"), col("ref"), 5).as("top"))
          .select(col("flag"), posexplode(col("top")))
          .select(col("flag"), (col("pos") + 1).cast("int").as("rnk"),
            col("col.k"), col("col.p"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got === want, s"mismatch at $dir with $parts partitions")
      }
    }
  }

  test("ties break on payload asc; k past group size returns the whole group; nulls skipped") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(10L), 3L), ("a", Some(10L), 1L), ("a", Some(10L), 2L),
      ("a", Some(5L), 4L), ("b", Some(7L), 9L), ("b", None, 1L))
      .toDF("g", "key", "p")
    val got = df.groupBy("g")
      .agg(TopKAgg.topk(col("key"), col("p"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.k"), col("col.p"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      ("a", 0, 10L, 1L), ("a", 1, 10L, 2L), ("a", 2, 10L, 3L),
      ("b", 0, 7L, 9L)))
  }

  test("SQL registration through extensions; plan uses partial ObjectHashAggregate") {
    import spark.implicits._
    Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("g", "key", "p").createOrReplaceTempView("topk_in")
    val df = spark.sql(
      "SELECT g, t.col.k, t.col.p FROM (SELECT g, topk(key, p, 2) AS top FROM topk_in GROUP BY g), " +
        "LATERAL explode(top) AS t")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === Set((1L, 30L, 3L), (1L, 20L, 2L)))
    val phys = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate, and the
    // map-side partial (the whole point: k rows per group per task cross
    // the exchange) must be present alongside the final
    assert("ObjectHashAggregate".r.findAllIn(phys).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$phys")
  }

  test("double keys round-trip the sortable-bits encoding exactly") {
    // spot the involution on tricky values, then the aggregate end-to-end
    for (d <- Seq(0.0, -0.0, 1.5, -1.5, 1e-300, -1e-300, Double.MaxValue,
        Double.MinPositiveValue, -Double.MaxValue, 0.1 + 0.2)) {
      assert(TopKAgg.fromSortable(TopKAgg.toSortable(d)) === d)
    }
    assert(TopKAgg.toSortable(-1e-300) < TopKAgg.toSortable(0.0))
    assert(TopKAgg.toSortable(0.0) < TopKAgg.toSortable(1e-300))
    // SQL comparison semantics: the zeros are EQUAL (tie-break falls
    // through to the payload), not IEEE-totally-ordered
    assert(TopKAgg.toSortable(-0.0) === TopKAgg.toSortable(0.0))
    import spark.implicits._
    val df = Seq((1L, 0.3, 1L), (1L, -0.7, 2L), (1L, 0.95, 3L), (1L, 0.3, 0L))
      .toDF("g", "key", "p")
    val got = df.groupBy("g")
      .agg(TopKAgg.topk(col("key"), col("p"), 3).as("top"))
      .select(posexplode(col("top")))
      .collect().map(r => (r.getInt(0), r.getStruct(1).getDouble(0), r.getStruct(1).getLong(1)))
    assert(got.toSeq === Seq((0, 0.95, 3L), (1, 0.3, 0L), (2, 0.3, 1L)))
  }

  test("buffer serialize/deserialize preserves the heap; inserts stay bounded") {
    val buf = new TopKAgg.Buffer(3)
    Seq((5L, 50L), (9L, 90L), (1L, 10L), (9L, 80L), (7L, 70L), (2L, 20L))
      .foreach { case (k, p) => buf.insert(k, p) }
    val restored = TopKAgg.Buffer.fromBytes(3, buf.toBytes)
    assert(restored.sortedBestFirst.toSeq === Seq((9L, 80L), (9L, 90L), (7L, 70L)))
    assert(buf.sortedBestFirst.toSeq === restored.sortedBestFirst.toSeq)
  }
}
