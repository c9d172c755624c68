package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native point-in-interval join — the second whole-operator Catalyst
  * extension (SURVEY.md §4 path (c), same architecture as [[AsOfJoin]]).
  *
  * Semantics: INNER join of every probe row against every build row whose
  * closed interval contains the probe's point: `lo <= point <= hi`.
  * Intervals may overlap (a probe row can emit several matches); null
  * points and null/inverted intervals never match.
  *
  * Why it exists: OSS Spark plans a pure-inequality join as
  * BroadcastNestedLoopJoin — O(probe × build) with the ENTIRE build side
  * scanned per probe row. This exec broadcasts the build side sorted by
  * `lo` and augmented with a running prefix-maximum of `hi`; each probe
  * row binary-searches the last interval with `lo <= point` and walks
  * left only while the prefix-max says a match is still possible —
  * O(log m + answer) per row for mostly-disjoint interval sets (band
  * tables, calendars, IP ranges), degrading gracefully toward O(m) only
  * when everything overlaps everything. The probe side is never shuffled
  * or sorted — at 100 TB the fact table streams straight from the scan,
  * exactly like Spark's own broadcast hash join. Build sides too big to
  * broadcast want a shuffled bucket-by-range variant; no workload here
  * needs one (DESIGN.md).
  */
case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    lo: Expression,
    hi: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through the custom node (the [[AsOfJoinPruning]] story:
  * a custom operator is an optimization barrier unless a rule teaches
  * ColumnPruning's job to it). */
object IntervalJoinPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: IntervalJoin) =>
      val req = AttributeSet(p.projectList.flatMap(_.references)) ++
        j.point.references ++ j.lo.references ++ j.hi.references
      if ((j.outputSet -- req).isEmpty) p
      else {
        def prune(child: LogicalPlan): LogicalPlan = {
          val keep = child.output.filter(req.contains)
          if (keep.length == child.output.length) child else Project(keep, child)
        }
        p.copy(child = j.copy(left = prune(j.left), right = prune(j.right)))
      }
  }
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, p, lo, hi) =>
      BroadcastIntervalJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Broadcast interval join exec: build collected to (lo-sorted rows +
  * prefix-max-hi), probe partitions stream and emit 0..N matches per row.
  */
case class BroadcastIntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    point: Expression,
    lo: Expression,
    hi: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  // ≥0 output rows per probe row in probe order: probe-side partitioning
  // survives (ordering too — emitted groups preserve the row's position)
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering
      : Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    require(lo.dataType == point.dataType && hi.dataType == point.dataType,
      s"interval join types differ: point ${point.dataType}, " +
        s"lo ${lo.dataType}, hi ${hi.dataType} — cast explicitly")
    val ord: Ordering[Any] = TypeUtils.getInterpretedOrdering(point.dataType)
    // ---- build phase (driver): rows sorted by lo, prefix-max of hi ----
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val valid = right.executeCollect().flatMap { row =>
      val l = loB.eval(row); val h = hiB.eval(row)
      // null or inverted intervals can never contain a point
      if (l == null || h == null || ord.gt(l, h)) None else Some((l, h, row))
    }.sortBy(_._1)(ord)
    val loArr = valid.map(_._1)
    val hiArr = valid.map(_._2)
    val rows = valid.map(_._3)
    val prefixMaxHi = new Array[Any](valid.length)
    var i = 0
    while (i < valid.length) {
      prefixMaxHi(i) =
        if (i == 0) hiArr(0)
        else if (ord.gteq(hiArr(i), prefixMaxHi(i - 1))) hiArr(i)
        else prefixMaxHi(i - 1)
      i += 1
    }
    val bc = sparkContext.broadcast((loArr, hiArr, prefixMaxHi, rows))
    val outAttrs = output
    val leftOut = left.output
    val pointExpr = point
    // ---- probe phase ----
    left.execute().mapPartitions { iter =>
      val (los, his, maxHi, brows) = bc.value
      val pB = BindReferences.bindReference(pointExpr, leftOut)
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ outAttrs.drop(leftOut.length))
      val joined = new JoinedRow
      iter.flatMap { lrow =>
        val p = pB.eval(lrow)
        if (p == null || los.isEmpty) Iterator.empty
        else {
          // rightmost index with lo <= p
          var loIdx = 0; var hiIdx = los.length - 1; var ub = -1
          while (loIdx <= hiIdx) {
            val mid = (loIdx + hiIdx) >>> 1
            if (ord.lteq(los(mid), p)) { ub = mid; loIdx = mid + 1 }
            else hiIdx = mid - 1
          }
          if (ub < 0) Iterator.empty
          else {
            // the probe row is reused by the scan iterator while we lazily
            // emit 0..N joined rows — copy once per matching probe row
            val lcopy = lrow.copy()
            new Iterator[InternalRow] {
              private var j = ub
              private var nextRow: InternalRow = null
              private def advance(): Unit = {
                nextRow = null
                while (j >= 0 && nextRow == null && ord.gteq(maxHi(j), p)) {
                  if (ord.gteq(his(j), p)) nextRow = brows(j)
                  j -= 1
                }
                if (nextRow == null) j = -1
              }
              advance()
              override def hasNext: Boolean = nextRow != null
              override def next(): InternalRow = {
                val out = outProj(joined(lcopy, nextRow))
                advance()
                out
              }
            }
          }
        }
      }
    }
  }
}

object IntervalJoin {

  /** Planner/optimizer registration for sessions built without
    * GraftExtensions — same idempotence contract as [[AsOfJoin]]. */
  private def ensureStrategy(spark: SparkSession): Unit = {
    if (GraftSqlBridge.hasPlannerStrategy(spark, IntervalJoinStrategy)) return
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(IntervalJoinPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntervalJoinPruning
  }

  /** The BIG-build-side path, composed from existing operators
    * (SURVEY.md §4 preference order (a) — no custom exec needed):
    * bucketize the domain with a fixed width, replicate each interval to
    * every bucket it overlaps (explode over a sequence — replication
    * factor = interval span / width), equi-join on the bucket id, then
    * re-check containment exactly. Both sides shuffle ONCE on the bucket
    * key (codegen'd hash join); no side needs to fit anywhere. Width is
    * the knob: smaller ⇒ less false-candidate filtering but more
    * interval replication. Use [[intervalJoin]] (broadcast exec) when
    * the build side is small; this when it isn't.
    */
  def intervalJoinBucketed(probe: DataFrame, build: DataFrame,
      point: Column, lo: Column, hi: Column, width: Double): DataFrame = {
    import org.apache.spark.sql.functions.{explode, floor, sequence}
    require(width > 0, "bucket width must be positive")
    val p = probe.withColumn("_bkt", floor(point / width).cast("long"))
    val b = build.withColumn("_bkt",
      explode(sequence(floor(lo / width).cast("long"),
        floor(hi / width).cast("long"))))
    p.join(b, "_bkt").filter(point >= lo && point <= hi).drop("_bkt")
  }

  /** Public interval-join API: every probe row × each build interval
    * containing its point. Columns must resolve against their own side;
    * the two plans must not share attribute ids (alias the build side).
    */
  def intervalJoin(probe: DataFrame, build: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    val spark = probe.sparkSession
    ensureStrategy(spark)
    val lp = GraftSqlBridge.analyzedPlan(probe)
    val rp = GraftSqlBridge.analyzedPlan(build)
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "interval-join children share attribute ids — alias the build side")
    GraftSqlBridge.ofRows(spark, IntervalJoin(lp, rp,
      GraftSqlBridge.expression(point),
      GraftSqlBridge.expression(lo),
      GraftSqlBridge.expression(hi)))
  }
}
