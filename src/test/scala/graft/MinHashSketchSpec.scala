package graft

import graft.functions.TextFunctions.{bigramShingles, spaceTokens}
import graft.plans.MinHashSketch
import org.apache.spark.sql.functions._

/** Hash-identity pin for the r12 native `MinHashSketch` aggregate: the
  * single multi-min buffer must be bit-identical to the composed
  * relational form it replaced — k = 128 separate
  * `min(xxhash64(lit(i), h))` aggregates — including the degenerate
  * paths where xxhash64's null-skipping makes the composed row value the
  * bare seed `hashInt(i, 42)` rather than SQL NULL. This is the "delicate
  * hash-identity proof" the r11 round parked the optimization over.
  */
class MinHashSketchSpec extends SparkSpec {

  private val k = 128

  test("native sketch ≡ 128 composed min(xxhash64(i, h)) on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 2000L)
      .select(col("doc_id"), bigramShingles(spaceTokens(col("text"))).as("shingles"))
    val exploded = docs.select(col("doc_id"),
      explode(transform(col("shingles"), sh => xxhash64(sh))).as("h"))
      // multiple partitions so the merge (partial → final) path is live
      .repartition(4)
    val minCols = (0 until k).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val composed = exploded.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
    val native = exploded.groupBy("doc_id")
      .agg(MinHashSketch.minhash_sketch(col("h"), k).as("sig"))
    val joined = composed.as("c").join(native.as("n"), "doc_id")
      .select(col("doc_id"), col("c.sig").as("cs"), col("n.sig").as("ns"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"sketch drift for doc_id=${r.getLong(0)}")
    }
  }

  test("null input hashes contribute the bare seed, exactly like xxhash64's null-skip") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.Row(1, java.lang.Long.valueOf(123456789L)),
      org.apache.spark.sql.Row(1, null),
      org.apache.spark.sql.Row(2, null)).asJava
    val df = spark.createDataFrame(rows, schema)
    val kk = 8
    val minCols = (0 until kk).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val composed = df.groupBy("g").agg(minCols.head, minCols.tail: _*)
      .select(col("g"), array((0 until kk).map(i => col(s"m$i")): _*).as("sig"))
    val native = df.groupBy("g")
      .agg(MinHashSketch.minhash_sketch(col("h"), kk).as("sig"))
    val joined = composed.as("c").join(native.as("n"), "g")
      .select(col("c.sig"), col("n.sig")).collect()
    assert(joined.length == 2)
    joined.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("seed hoist is the identity: slot i's inner seed equals hashInt(i, 42)") {
    // one-row sanity pin of the hoisted constant against Spark's own
    // xxhash64 evaluation with a null second child (which skips it)
    val df = spark.range(1).select(
      (0 until 4).map(i =>
        xxhash64(lit(i), lit(null).cast("long")).as(s"s$i")): _*)
    val r = df.collect()(0)
    (0 until 4).foreach { i =>
      assert(r.getLong(i) ==
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L))
    }
  }
}
