package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two double arrays as a native Catalyst expression —
  * dot product and both norms accumulated in one fused loop (SURVEY.md §4
  * path (b)). Replaces the higher-order-function formulation
  * (`aggregate(zip_with(...))`), which is interpreted per element and
  * allocates an intermediate array per row; this runs a single compiled
  * loop per row with zero allocation.
  *
  * Float semantics match DuckDB's `list_cosine_similarity` exactly:
  * left-to-right accumulation, `dot / (sqrt(na) * sqrt(nb))`, then a
  * CLAMP to [-1, 1]. The clamp is load-bearing, not cosmetic: on
  * identical (or exactly scaled) vectors the unclamped quotient is
  * 1.0000000000000002 — fl(sqrt(x)*sqrt(x)) can exceed x by an ulp —
  * and DuckDB clamps it to exactly 1.0. The sf1 sweep exposed this:
  * key-offset replication creates bit-identical vector pairs, and every
  * self-pair's sim hash-diverged (dedup_semantic, 21,735 rows) while
  * all fixture-scale SFs — which have no identical vectors — had
  * passed. (The single-sqrt form `dot / sqrt(na * nb)` fixes self-pairs
  * too but diverges from DuckDB by an ulp on ordinary pairs — probed
  * empirically on pair (0, 1204) of the sf1 fixtures — so clamp, don't
  * refactor the quotient.) Mismatched lengths yield null (the
  * zip_with-pads-null analog), as does any null element.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  // null is produced even from non-null inputs (length mismatch, null
  // elements), so nullability must not be derived from the children —
  // otherwise consumers treat the slot as non-null and read the default 0.0
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double r = graft.plans.CosineSimilarity.compute($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** The fused loop — called from interpreted eval and generated code.
    * Returns null (boxed) on length mismatch or null elements.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val r = dot / (math.sqrt(na) * math.sqrt(nb))
    java.lang.Double.valueOf(
      if (r > 1.0d) 1.0d else if (r < -1.0d) -1.0d else r)
  }

  /** Column wrapper. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
