package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension (SURVEY.md §4
  * path (c)): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions` (GraftExtensions) and
  * `spark.experimental.extraStrategies`.
  *
  * Semantics: LEFT OUTER as-of — every left (probe) row is joined to the
  * single right (build) row with equal keys and the greatest time ≤ the
  * probe's time; unmatched probes carry nulls. If several build rows
  * share that exact (key, time), which one's payload is returned is not
  * defined (same caveat as DuckDB ASOF / pandas merge_asof) — add a
  * tie-breaking column to the time expression if it matters. Spark has no built-in as-of
  * operator; the composable fallback is the union + last-over-window trick
  * (AdvancedQueries.asofJoin), which requires both relations through ONE
  * shuffle+sort. This exec instead broadcasts the (small) build side as
  * per-key time-sorted arrays and binary-searches per probe row:
  * zero shuffle, zero sort of the probe side — at 100 TB the probe
  * (events/fact) streams straight from the scan. For build sides too big
  * to broadcast, use the window form (or shuffle both on key and merge —
  * not needed for any workload here, documented in DESIGN.md).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long = -1L) extends BinaryNode {

  // LEFT OUTER: build-side columns become nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (SURVEY.md §4 path (c), the `Rule[LogicalPlan]` leg):
  * column pruning THROUGH the custom node. A custom operator is an
  * optimization barrier — Catalyst's ColumnPruning doesn't know its
  * semantics — so without this, `asof(events, clicks).select(2 cols)`
  * reads every column of both scans (including fat ones like the events
  * JSON props). The rule pushes per-child Projects keeping only the
  * attributes the parent references plus the join's own keys/times; once
  * every output is referenced it no longer matches, so the fixed-point
  * batch terminates.
  */
object AsOfJoinPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoin) =>
      val req = required(p, j)
      if ((j.outputSet -- req).isEmpty) p
      else {
        def prune(child: LogicalPlan): LogicalPlan = {
          val keep = child.output.filter(req.contains)
          if (keep.length == child.output.length) child else Project(keep, child)
        }
        p.copy(child = j.copy(left = prune(j.left), right = prune(j.right)))
      }
  }

  private def required(p: Project, j: AsOfJoin): AttributeSet =
    AttributeSet(p.projectList.flatMap(_.references)) ++
      AttributeSet(j.leftKeys.flatMap(_.references)) ++
      AttributeSet(j.rightKeys.flatMap(_.references)) ++
      j.leftTime.references ++ j.rightTime.references
}

/** Planner rule: AsOfJoin → AsOfJoinExec. Installed by GraftExtensions
  * (`injectPlannerStrategy`) and idempotently by `AsOfJoin.asof` via
  * `spark.experimental.extraStrategies` for sessions built without the
  * extension.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      // same physical-selection contract as Spark's equi-join planning:
      // broadcast when build-side stats fit the broadcast threshold, else
      // shuffle both sides and merge (distribution+ordering requirements
      // make EnsureRequirements insert the exchanges and sorts)
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (threshold >= 0 && r.stats.sizeInBytes <= threshold)
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
      else
        SortMergeAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

/** Broadcast as-of join exec: collect + broadcast the build side grouped by
  * key with time-sorted row arrays; probe partitions stream and
  * binary-search. Null keys and null times never match (SQL join
  * semantics).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // one output row per probe row, in probe order — the probe side's
  // partitioning and ordering survive (mirrors BroadcastHashJoinExec), so
  // a downstream groupBy on an already-partitioned probe key re-shuffles
  // nothing
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering
      : Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    left.outputOrdering

  @transient private lazy val timeOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(leftTime.dataType)

  override protected def doExecute(): RDD[InternalRow] = {
    require(leftTime.dataType == rightTime.dataType,
      s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
    val ord = timeOrdering
    // ---- build phase (driver): key → rows sorted by time ascending ----
    val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val grouped = new scala.collection.mutable.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]
    right.executeCollect().foreach { row =>
      val key = rKeyProj(row)
      val t = rTime.eval(row)
      if (!key.anyNull && t != null) {
        // copy the key only on first sight (getOrElseUpdate would copy per row)
        val buf = grouped.get(key) match {
          case Some(b) => b
          case None =>
            val b = new scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]
            grouped.put(key.copy(), b); b
        }
        buf += ((t, row))
      }
    }
    val buildMap: Map[UnsafeRow, Array[(Any, InternalRow)]] =
      grouped.view.mapValues(_.sortBy(_._1)(ord).toArray).toMap
    val broadcastBuild = sparkContext.broadcast(buildMap)
    val rightWidth = right.output.length
    val outAttrs = output
    val leftOut = left.output
    val lKeys = leftKeys
    val lTime = leftTime
    val tol = toleranceMicros
    AsOfJoin.checkToleranceType(tol, leftTime.dataType)
    // ---- probe phase: stream left partitions, binary-search per row ----
    left.execute().mapPartitions { iter =>
      val build = broadcastBuild.value
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val lTimeBound = BindReferences.bindReference(lTime, leftOut)
      val outProj = UnsafeProjection.create(outAttrs, leftOut ++ outAttrs.drop(leftOut.length))
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(rightWidth)
      iter.map { lrow =>
        val key = lKeyProj(lrow)
        val t = lTimeBound.eval(lrow)
        val matched: InternalRow =
          if (key.anyNull || t == null) nullRow
          else build.get(key) match {
            case None => nullRow
            case Some(arr) =>
              // greatest index with arr(i)._1 <= t
              var lo = 0; var hi = arr.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (ord.lteq(arr(mid)._1, t)) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0 ||
                  !AsOfJoin.withinTolerance(tol, t, arr(ans)._1)) nullRow
              else arr(ans)._2
          }
        outProj(joined(lrow, matched))
      }
    }
  }
}

/** Shuffled sort-merge as-of join — the big-build path. Declares
  * `requiredChildDistribution` (clustered on the keys) and
  * `requiredChildOrdering` ((keys, time) ascending both sides), so
  * EnsureRequirements plants the hash exchanges and sorts; doExecute then
  * zips co-partitioned sorted partitions and merges with two pointers:
  * build rows are buffered one key-group at a time, probe rows
  * binary-search the group. Memory is bounded by the largest single
  * key-group on the build side, not the partition.
  */
case class SortMergeAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SortMergeAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override def requiredChildDistribution
      : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(leftKeys) ::
      org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(rightKeys) :: Nil

  // probe rows stream through in (keys, time) order, one output row each —
  // keep the probe side's partitioning/ordering visible downstream
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering
      : Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    requiredChildOrdering.head

  override def requiredChildOrdering
      : Seq[Seq[org.apache.spark.sql.catalyst.expressions.SortOrder]] = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))
  }

  @transient private lazy val timeOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(leftTime.dataType)

  override protected def doExecute(): RDD[InternalRow] = {
    require(leftTime.dataType == rightTime.dataType,
      s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
    val ord = timeOrdering
    val keyTypes = leftKeys.map(_.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val tol = toleranceMicros
    AsOfJoin.checkToleranceType(tol, leftTime.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition: the generated ordering class is not serializable
      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeBound = BindReferences.bindReference(lTime, leftOut)
      val rTimeBound = BindReferences.bindReference(rTime, rightOut)
      val outProj = UnsafeProjection.create(outAttrs, leftOut ++ outAttrs.drop(leftOut.length))
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(rightOut.length)
      val rBuffered = rIter.buffered
      // current build key-group (time-sorted by child ordering)
      var groupKey: UnsafeRow = null
      val groupTimes = new scala.collection.mutable.ArrayBuffer[Any]
      val groupRows = new scala.collection.mutable.ArrayBuffer[InternalRow]
      def loadGroup(target: UnsafeRow): Unit = {
        // skip build groups with key < target, then buffer the == group
        while (rBuffered.hasNext && {
          val k = rKeyProj(rBuffered.head)
          k.anyNull || keyOrdering.compare(k, target) < 0
        }) rBuffered.next()
        groupTimes.clear(); groupRows.clear()
        if (rBuffered.hasNext && keyOrdering.compare(rKeyProj(rBuffered.head), target) == 0) {
          groupKey = rKeyProj(rBuffered.head).copy()
          while (rBuffered.hasNext &&
              keyOrdering.compare(rKeyProj(rBuffered.head), target) == 0) {
            // copy FIRST: the shuffle reader reuses its row buffer, and a
            // non-primitive time value (UTF8String/Decimal) evaluated from
            // the live buffer would be clobbered by the next() that follows
            val row = rBuffered.next().copy()
            val t = rTimeBound.eval(row)
            if (t != null) { groupTimes += t; groupRows += row }
          }
        } else groupKey = target.copy() // remember we looked: empty group
      }
      lIter.map { lrow =>
        val key = lKeyProj(lrow)
        val t = lTimeBound.eval(lrow)
        val matched: InternalRow =
          if (key.anyNull || t == null) nullRow
          else {
            if (groupKey == null || keyOrdering.compare(key, groupKey) != 0)
              loadGroup(key)
            if (groupTimes.isEmpty) nullRow
            else {
              var lo = 0; var hi = groupTimes.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (ord.lteq(groupTimes(mid), t)) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0 ||
                  !AsOfJoin.withinTolerance(tol, t, groupTimes(ans))) nullRow
              else groupRows(ans)
            }
          }
        outProj(joined(lrow, matched))
      }
    }
  }
}

object AsOfJoin {

  /** Bounded lookback: with a tolerance, a match additionally requires
    * probeTime - buildTime <= toleranceMicros (inclusive). Times must be
    * long-backed (timestamp = epoch micros, or integral). */
  def withinTolerance(tol: Long, probeT: Any, buildT: Any): Boolean =
    tol < 0L ||
      probeT.asInstanceOf[Number].longValue -
        buildT.asInstanceOf[Number].longValue <= tol

  def checkToleranceType(tol: Long,
      t: org.apache.spark.sql.types.DataType): Unit =
    if (tol >= 0L) require(
      t == org.apache.spark.sql.types.TimestampType ||
        t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType,
      s"as-of tolerance requires a long-backed time type, got $t")

  /** Ensure the planner and optimizer know the node, for sessions built
    * without GraftExtensions (Verify/Bench/Cli). Idempotent — and a no-op
    * on extension-built sessions, where injectPlannerStrategy/
    * injectOptimizerRule already installed both (the experimental
    * `contains` checks can't see injected registrations, so without the
    * planner probe we'd append duplicate copies there). */
  private def ensureStrategy(spark: SparkSession): Unit = {
    if (GraftSqlBridge.hasPlannerStrategy(spark, AsOfJoinStrategy)) return
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinPruning
  }

  /** Public as-of join API over DataFrames. Key/time columns must be
    * resolved against `left`/`right` (use `df("col")`); the two outputs
    * must not share attribute ids — alias the build side's columns.
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      toleranceMicros: Long = -1L): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = GraftSqlBridge.analyzedPlan(left)
    val rp = GraftSqlBridge.analyzedPlan(right)
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of children share attribute ids — alias the build side columns")
    // no analyzer coercion happens on a custom node: mismatched key types
    // would silently never match (different UnsafeRow layouts), so fail loud
    val lkT = leftKeys.map(GraftSqlBridge.expression(_).dataType)
    val rkT = rightKeys.map(GraftSqlBridge.expression(_).dataType)
    require(lkT == rkT,
      s"as-of key types differ: $lkT vs $rkT — cast the keys explicitly")
    GraftSqlBridge.ofRows(spark, AsOfJoin(lp, rp,
      leftKeys.map(GraftSqlBridge.expression),
      rightKeys.map(GraftSqlBridge.expression),
      GraftSqlBridge.expression(leftTime),
      GraftSqlBridge.expression(rightTime),
      toleranceMicros))
  }
}
