package graft

import graft.plans.Fnv1a64
import org.apache.spark.sql.functions._

/** The native Catalyst expression: interpreted vs codegen parity, SQL
  * registration, and the known-answer FNV-1a test vectors.
  */
class Fnv1a64Spec extends SparkSpec {

  // classic FNV-1a 64 test vectors
  private val vectors = Seq(
    "" -> 0xcbf29ce484222325L,
    "a" -> 0xaf63dc4c8601ec8cL,
    "foobar" -> 0x85944171f73967e8L)

  test("known-answer vectors via the Column API (codegen path)") {
    import spark.implicits._
    val got = vectors.map(_._1).toDF("s")
      .select(Fnv1a64.fnv1a64(col("s")).as("h")).collect().map(_.getLong(0))
    assert(got.toSeq == vectors.map(_._2))
  }

  test("interpreted eval matches the static hash") {
    vectors.foreach { case (s, want) =>
      assert(Fnv1a64.hashBytes(s.getBytes("UTF-8")) == want)
    }
  }

  test("SQL registration: usable from spark.sql") {
    Fnv1a64.register(spark)
    val r = spark.sql("SELECT fnv1a64('foobar') AS h").collect()(0).getLong(0)
    assert(r == 0x85944171f73967e8L)
  }

  test("binary input hashes the raw bytes") {
    import spark.implicits._
    val viaString = Seq("graft").toDF("s")
      .select(Fnv1a64.fnv1a64(col("s"))).collect()(0).getLong(0)
    val viaBinary = Seq("graft").toDF("s")
      .select(Fnv1a64.fnv1a64(col("s").cast("binary"))).collect()(0).getLong(0)
    assert(viaString == viaBinary)
  }

  test("non-string/binary input is an analysis error, not a runtime crash") {
    Fnv1a64.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT fnv1a64(42)").collect()
    }
    assert(e.getMessage.contains("fnv1a64 requires a string or binary"))
  }

  test("ihash31 is non-negative and below 2^31") {
    import spark.implicits._
    val vals = (0 until 1000).map(i => s"key_$i").toDF("s")
      .select(Fnv1a64.ihash31(col("s")).as("h")).collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v < (1L << 31)))
  }
}
