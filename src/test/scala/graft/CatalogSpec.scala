package graft

import graft.queries.CatalogQueries
import org.apache.spark.sql.functions._

/** Plan-shape pins for the catalog-layout queries (the registry entries'
  * values are oracle-gated; these tests pin WHY the layouts matter — the
  * shuffle and file-listing work they remove).
  */
class CatalogSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("q_bucketed_join: neither join side shuffles (bucket-aligned scan)") {
    // broadcast must be OFF for this pin to mean anything: at the test SF
    // the dim fits under autoBroadcastJoinThreshold and a BHJ plan has no
    // hashpartitioning exchanges regardless of bucketing — the assertion
    // would pass vacuously. Forcing the sort-merge path makes the absent
    // exchanges attributable to the bucketed layout alone.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "-1")
      val df = CatalogQueries.bucketedJoin(spark, sf)
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected the non-broadcast join path under threshold=-1:\n$plan")
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"join sides were shuffled:\n$plan")
      // values sanity on top of the oracle: counts match the plain join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(df.agg(sum("cnt")).collect()(0).getLong(0) == expected)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("q_partition_pruned: partition filter prunes at listing time") {
    val df = CatalogQueries.partitionPruned(spark, sf)
    df.collect() // finalize the adaptive plan before inspecting scans
    val scans = collect(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec over the layout")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters pushed:\n${df.queryExecution.executedPlan}")
    // pruning must actually drop partitions: the fixture has more event
    // types than the two selected
    val allTypes = Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(allTypes > 2, s"fixture lost event-type variety ($allTypes)")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "scan read every partition — pruning did not happen")
  }

  test("q_dpp_join: dynamic pruning reaches the fact scan's partition filters") {
    val df = CatalogQueries.dppJoin(spark, sf)
    df.collect() // finalize the adaptive plan
    val scans = collect(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("event_type") => f
    }
    assert(scans.nonEmpty, "expected a partitioned fact scan")
    val scan = scans.head
    // the predicate on the partition column exists only at runtime (it is
    // derived from the dim's category filter) — a static IN-list here would
    // mean the test degenerated into q_partition_pruned
    assert(scan.partitionFilters.exists(
        _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])),
      s"no DynamicPruning in partition filters: ${scan.partitionFilters}")
    // and it must actually prune AT RUNTIME: the static selection keeps all
    // partitions (the predicate is unknown at listing time), so the proof
    // lives in the scan's execution metrics — 2 qualifying types out of 5
    assert(scan.metrics("numFiles").value < scan.metrics("staticFilesNum").value,
      s"dynamic pruning read every file: ${scan.metrics.view.mapValues(_.value).toMap}")
    assert(scan.metrics("numPartitions").value == 2,
      s"expected 2 surviving partitions: ${scan.metrics.view.mapValues(_.value).toMap}")
  }

  test("q_runtime_filter: bloom filter is injected on the fact side") {
    CatalogQueries.withConfs(spark, CatalogQueries.runtimeFilterConfs) {
      val df = CatalogQueries.runtimeFilterShaped(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // broadcast is off, so the join must be shuffle-based — the shape
      // whose exchange the injected filter shrinks
      assert(!plan.contains("BroadcastHashJoin"), plan)
      // the injected BloomFilterMightContain prints as might_contain(...)
      // over a scalar subquery in the physical plan
      assert(plan.contains("might_contain"),
        s"runtime bloom filter was not injected:\n$plan")
    }
    // and the builder restores every conf it touched
    val df2 = CatalogQueries.runtimeFilter(spark, sf)
    assert(df2.collect().nonEmpty)
    assert(spark.conf.getOption(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .forall(_ != "0"),
      "runtime-filter builder leaked a session conf override")
  }

  test("q_skew_join_aqe: session confs are restored after the eager run") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.getOption(key)
    val rows = CatalogQueries.skewJoinAqe(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(spark.conf.getOption(key) == before,
      "skew-join builder leaked a session conf override")
  }
}
