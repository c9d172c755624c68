package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash as a native Catalyst expression with whole-stage
  * codegen — byte-compatible with the reference's shuffle-placement hash
  * (`/root/reference/src/lib.rs:203-208`: FNV-1a over the key bytes, masked
  * to 31 bits before `% n_reduce`; mask via [[Fnv1a64.ihash31]]).
  *
  * A native Expression rather than a Scala UDF: no boxing/serialization at
  * the row boundary and the hash loop is inlined into the generated stage
  * (SURVEY.md §4 — preference order (b)).
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // analysis-time type error instead of a runtime MatchError for
  // `SELECT fnv1a64(42)` (ExpectsInputTypes is private[sql] in Spark 4, so
  // validate directly)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fnv1a64 requires a string or binary argument, got ${other.catalogString}")
    }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Fnv1a64.hashBytes(s.getBytes)
    case b: Array[Byte] => Fnv1a64.hashBytes(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = child.dataType match {
        case StringType => s"$c.getBytes()"
        case BinaryType => c
      }
      s"${ev.value} = graft.plans.Fnv1a64.hashBytes($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object Fnv1a64 {
  final val OffsetBasis: Long = 0xcbf29ce484222325L
  final val Prime: Long = 0x100000001b3L

  /** The hash loop — called from both interpreted eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Column wrapper. */
  def fnv1a64(c: Column): Column =
    GraftSqlBridge.column(Fnv1a64(GraftSqlBridge.expression(c)))

  /** The reference's `ihash`: FNV-1a masked to a non-negative 31-bit value,
    * ready for `% n_reduce` bucket placement (lib.rs:203-208).
    */
  def ihash31(c: Column): Column = fnv1a64(c).bitwiseAND(0x7fffffffL)

  /** SQL registration so the expression is usable from spark.sql too. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv1a64", exprs => {
        require(exprs.length == 1, s"fnv1a64 takes 1 argument, got ${exprs.length}")
        Fnv1a64(exprs.head)
      }, "scala_udf")
}
