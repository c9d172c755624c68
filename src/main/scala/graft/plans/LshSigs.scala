package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All per-table random-hyperplane LSH signatures of one vector as ONE
  * native Catalyst expression (r11 optimization, guide §1.2 "per-task
  * work" + §4 "prefer codegen expressions").
  *
  * The composed form this replaces built `tables × bits` separate
  * `when(dot_product(v, array(64 literals)) > 0, 1<<i)` column trees —
  * ~6 000 expression nodes for the 4-bit × 24-table family. Analysis,
  * optimization (constant-folding each 64-literal array) and Janino
  * compilation of that plan cost multiple seconds on EVERY fresh plan,
  * which the per-query bench pays in full (measured r11: the composed
  * `dedup_embedding_lsh` sig subtree alone billed ~3 s cold vs ~0.2 s
  * warm). Here the plane family is a single `double[][]` reference
  * object and the whole signature computation is one compiled loop —
  * plan size and codegen cost are O(1) in bits × tables.
  *
  * Bit-identical to the composed form (LshSigsSpec proves it on the
  * fixture corpus): dots accumulate left-to-right exactly like
  * `DotProduct.compute`; bit i of table t is set iff that dot > 0; a
  * null vector, length mismatch or null element contributes 0 for that
  * bit (the `when(null > 0, ...).otherwise(0)` analog) — so a NULL
  * input yields the all-zero signature row the old form produced, never
  * a null row.
  *
  * `planes` is indexed `[t * bits + i]`; callers build it with the
  * shared `lshPlaneId` seeding so plane identity can never drift from
  * the DuckDB oracle's VALUES list.
  */
case class LshSigs(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression {

  // r12 (ADVICE): fail fast on geometry a caller could silently truncate —
  // the Int signature wraps at bit 31 (the composed form's shiftleft longs
  // were valid to 63), and integer division below would drop a trailing
  // partial table if the plane family miscounts.
  require(bits > 0 && bits <= 31, s"lsh_sigs bits must be in [1,31], got $bits")
  require(planes.length % bits == 0,
    s"planes.length=${planes.length} is not a multiple of bits=$bits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_sigs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_sigs requires array<double>, got ${other.catalogString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    LshSigs.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], planes, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val javaCode = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.LshSigs.compute(
          ${c.isNull} ? null : ${c.value}, $ref, $bits);
    """
    ev.copy(code = javaCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshSigs =
    copy(child = newChild)
}

object LshSigs {

  /** One bit of one table: dot(v, p) > 0 with the composed form's exact
    * Spark semantics (left-to-right accumulation; length mismatch or null
    * element → null dot → bit unset, like `when(null > 0, _)`; a NaN dot
    * SETS the bit because Spark's GreaterThan orders NaN above every
    * value — r12 ADVICE fix: plain Java `d > 0` left it unset, diverging
    * from the composed form exactly on the NaN inputs the doc claimed). */
  private def bitSet(v: ArrayData, p: Array[Double]): Boolean = {
    val n = p.length
    if (v.numElements() != n) return false
    var d = 0.0d
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return false
      d += v.getDouble(i) * p(i)
      i += 1
    }
    java.lang.Double.isNaN(d) || d > 0
  }

  /** Called from interpreted eval and generated code. Never returns null:
    * a null vector yields the all-zero signature array (the composed
    * form's `otherwise(0)` per bit). */
  def compute(v: ArrayData, planes: Array[Array[Double]], bits: Int): ArrayData = {
    val tables = planes.length / bits
    val sigs = new Array[Int](tables)
    if (v != null) {
      var t = 0
      while (t < tables) {
        var sig = 0
        var i = 0
        while (i < bits) {
          if (bitSet(v, planes(t * bits + i))) sig += (1 << i)
          i += 1
        }
        sigs(t) = sig
        t += 1
      }
    }
    new GenericArrayData(sigs)
  }

  /** Column wrapper. */
  def lsh_sigs(v: Column, planes: Array[Array[Double]], bits: Int): Column =
    GraftSqlBridge.column(LshSigs(GraftSqlBridge.expression(v), planes, bits))
}
