package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All word n-gram FNV-1a fingerprints of a token array in one fused
  * codegen'd pass: element i = fnv1a64 of `tokens(i..i+n-1)` joined with
  * a single space — byte-identical to hashing the materialized gram
  * string, but no gram string, slice copy, or concat is ever allocated
  * (the separator byte is folded into the running hash between tokens).
  *
  * Replaces the `transform(sequence, i -> concat_ws(slice))` HOF chain,
  * whose lambda expressions are CodegenFallback in Spark: per-position
  * interpreted eval + O(n) array slices dominated pipeline_decontam's
  * runtime (measured ~3.7 s → sub-second at sf0.1). At corpus scale the
  * shuffle after the explode carries only (long, long) rows — the
  * dedup_exact fingerprint discipline applied to n-gram space
  * (SURVEY.md §4 preference order (b): native Expression over UDF).
  */
case class WordGramFnv(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_gram_fnv requires array<string>, got ${other.catalogString}")
    }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_gram_fnv"

  override protected def nullSafeEval(input: Any): Any =
    WordGramFnv.gramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordGramFnv.gramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGramFnv =
    copy(child = newChild)
}

object WordGramFnv {

  /** The fused loop — called from both interpreted eval and generated
    * code. Null elements are dropped up front (the same filtering the
    * upstream tokenizers apply) rather than NPEing: the type check admits
    * ArrayType(String, containsNull=true) because typed-Dataset encoders
    * mark element nullability even for never-null data.
    */
  def gramHashes(tokens: ArrayData, n: Int): ArrayData = {
    val raw = tokens.numElements()
    val toks = new Array[UTF8String](raw)
    var len = 0
    var r = 0
    while (r < raw) {
      if (!tokens.isNullAt(r)) { toks(len) = tokens.getUTF8String(r); len += 1 }
      r += 1
    }
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i < out.length) {
      var h = Fnv1a64.OffsetBasis
      var j = 0
      while (j < n) {
        if (j > 0) { // the single ' ' separator byte of the joined gram
          h ^= 0x20L
          h *= Fnv1a64.Prime
        }
        val bytes = toks(i + j).getBytes
        var k = 0
        while (k < bytes.length) {
          h ^= (bytes(k) & 0xffL)
          h *= Fnv1a64.Prime
          k += 1
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def wordGramFnv(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(WordGramFnv(GraftSqlBridge.expression(tokens), n))
}
