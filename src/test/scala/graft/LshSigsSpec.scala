package graft

import graft.plans.{DotProduct, LshSigs}
import graft.queries.{SimilarityQueries => SQ}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Equivalence pin for the r11 native `LshSigs` expression: the single
  * compiled loop must be bit-identical to the composed per-bit form it
  * replaced (`when(dot_product(v, array(...)) > 0, 1<<i).otherwise(0)`
  * summed per table), including the degenerate inputs where the composed
  * form's null-propagation quietly yields 0 bits: null vector, null
  * element, length mismatch, NaN dot.
  */
class LshSigsSpec extends SparkSpec {

  private val tables = 24
  private val bits = 4

  private def planesFor(lb: Int): Array[Array[Double]] =
    Array.tabulate(tables * bits) { k =>
      val j = SQ.lshPlaneId(k / bits, k % bits, lb, tables)
      Array.tabulate(64)(p => SQ.splitmixDouble(j * 64L + p))
    }

  /** The pre-r11 composed column tree, reconstructed verbatim. */
  private def composedSigs(v: Column, lb: Int): Column = {
    val plane: Long => Column = j =>
      array((0 until 64).map(i => lit(SQ.splitmixDouble(j * 64L + i))): _*)
    def tableSig(t: Int): Column =
      (0 until bits).map(i =>
        when(DotProduct.dot_product(v,
          plane(SQ.lshPlaneId(t, i, lb, tables))) > 0, lit(1 << i))
          .otherwise(lit(0)))
        .reduce(_ + _)
    array((0 until tables).map(tableSig): _*)
  }

  test("native LshSigs ≡ composed per-bit form on the fixture corpus") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = base.select(col("vec_id"),
      LshSigs.lsh_sigs(col("v"), planesFor(4), bits).as("native"),
      composedSigs(col("v"), 4).as("composed"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"sig drift for vec_id=${r.getLong(0)}")
    }
  }

  test("degenerate inputs: null vector / null element / length mismatch → 0 bits") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true),
        nullable = true)))
    val good = (0 until 64).map(i => java.lang.Double.valueOf(i * 0.01 - 0.3))
    val withNull = good.updated(7, null: java.lang.Double)
    val short = good.take(10)
    // r12 (ADVICE): pin the NaN/Infinity semantics the doc claims — a NaN
    // dot must SET the bit on both forms (Spark's GreaterThan orders NaN
    // above everything), and ±Infinity dots must agree too
    val withNaN = good.updated(0, java.lang.Double.valueOf(Double.NaN))
    val withInf =
      good.updated(0, java.lang.Double.valueOf(Double.PositiveInfinity))
    val withNegInf =
      good.updated(0, java.lang.Double.valueOf(Double.NegativeInfinity))
    val rows = Seq(
      org.apache.spark.sql.Row(good),
      org.apache.spark.sql.Row(withNull),
      org.apache.spark.sql.Row(short),
      org.apache.spark.sql.Row(null),
      org.apache.spark.sql.Row(withNaN),
      org.apache.spark.sql.Row(withInf),
      org.apache.spark.sql.Row(withNegInf)).asJava
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(
      LshSigs.lsh_sigs(col("v"), planesFor(4), bits).as("native"),
      composedSigs(col("v"), 4).as("composed")).collect()
    out.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
      assert(!r.isNullAt(0), "native form must never return null")
    }
    // the degenerate rows specifically must read all-zero signatures
    assert(out(1).getSeq[Int](0).forall(_ == 0))
    assert(out(2).getSeq[Int](0).forall(_ == 0))
    assert(out(3).getSeq[Int](0).forall(_ == 0))
    // NaN dots rank above 0 in Spark's total order: every bit set
    assert(out(4).getSeq[Int](0).forall(_ == (1 << bits) - 1))
  }

  test("annLshBuckets single-table path: first element equals the legacy 12-plane sig") {
    val planes12 =
      Array.tabulate(12)(j => Array.tabulate(64)(i => SQ.splitmixDouble(j * 64L + i)))
    val plane: Int => Column = j =>
      array((0 until 64).map(i => lit(SQ.splitmixDouble(j * 64L + i))): _*)
    val legacySig = (0 until 12).map(j =>
      when(DotProduct.dot_product(col("v"), plane(j)) > 0,
        shiftleft(lit(1L), j)).otherwise(0L)).reduce(_ + _)
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = base.select(
      LshSigs.lsh_sigs(col("v"), planes12, 12).getItem(0).cast("long").as("native"),
      legacySig.as("composed")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
