package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the named-operator registry (the Spark-native analog of the
  * reference's app registry, /root/reference/src/app/mod.rs:29-63); every
  * entry that is ANSI-SQL-expressible has a DuckDB oracle in `oracleSql`.
  * Entries are contributed by the per-category modules in graft.queries.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Q.ReferenceApps.queries, Q.ReferenceApps.oracles),
      (Q.RelationalQueries.queries, Q.RelationalQueries.oracles),
      (Q.JoinQueries.queries, Q.JoinQueries.oracles),
      (Q.WindowQueries.queries, Q.WindowQueries.oracles),
      (Q.FunctionQueries.queries, Q.FunctionQueries.oracles),
      (Q.EventQueries.queries, Q.EventQueries.oracles),
      (Q.DedupQueries.queries, Q.DedupQueries.oracles),
      (Q.SimilarityQueries.queries, Q.SimilarityQueries.oracles),
      (Q.TextQueries.queries, Q.TextQueries.oracles),
      (Q.MultimodalQueries.queries, Q.MultimodalQueries.oracles),
      (Q.ExtensionQueries.queries, Q.ExtensionQueries.oracles),
      (Q.AdvancedQueries.queries, Q.AdvancedQueries.oracles),
      (Q.FunctionQueries2.queries, Q.FunctionQueries2.oracles),
      (Q.GraphQueries.queries, Q.GraphQueries.oracles),
      (Q.MiscQueries.queries, Q.MiscQueries.oracles),
      (Q.AnalyticsQueries.queries, Q.AnalyticsQueries.oracles),
      (Q.StatsQueries.queries, Q.StatsQueries.oracles),
      (Q.StreamingBridge.queries, Q.StreamingBridge.oracles),
      (Q.TpchQueries.queries, Q.TpchQueries.oracles),
      (Q.TpchQueries2.queries, Q.TpchQueries2.oracles),
      (Q.PipelineQueries.queries, Q.PipelineQueries.oracles),
      (Q.CurationQueries.queries, Q.CurationQueries.oracles),
      (Q.CorpusQueries.queries, Q.CorpusQueries.oracles),
      (Q.QualityQueries.queries, Q.QualityQueries.oracles),
      (Q.ScaleQueries.queries, Q.ScaleQueries.oracles),
      (Q.MixQueries.queries, Q.MixQueries.oracles),
      (Q.MatchQueries.queries, Q.MatchQueries.oracles),
      (Q.SequenceQueries.queries, Q.SequenceQueries.oracles),
      (Q.MlQueries.queries, Q.MlQueries.oracles),
      (Q.RecursiveQueries.queries, Q.RecursiveQueries.oracles),
      (Q.SurfaceQueries.queries, Q.SurfaceQueries.oracles),
      (Q.ExperimentQueries.queries, Q.ExperimentQueries.oracles),
      (Q.SketchQueries.queries, Q.SketchQueries.oracles),
      (Q.MlQueries2.queries, Q.MlQueries2.oracles),
      (Q.CatalogQueries.queries, Q.CatalogQueries.oracles),
      (Q.MiningQueries.queries, Q.MiningQueries.oracles),
      (Q.InsightQueries.queries, Q.InsightQueries.oracles),
      (Q.BreadthQueries.queries, Q.BreadthQueries.oracles),
      (Q.FrontierQueries.queries, Q.FrontierQueries.oracles),
      (Q.SignalQueries.queries, Q.SignalQueries.oracles)
    )

  /** Per-module registry sizes — lets ContractSpec prove no cross-module
    * key collision silently drops an implementation in the merge. */
  private[graft] def moduleQueryCounts: Seq[Int] = modules.map(_._1.size)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Q.ReferenceApps.wcWordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap

  /** Dev-only SPARK_GRAFT_ONLY subset filter, shared by Verify and Bench:
    * comma-separated names, whitespace-tolerant, and FAIL-FAST on a name
    * that is not in the registry — a typo or stale name must not silently
    * produce an empty run that reads as success. */
  def onlyFilter(): Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").map { raw =>
      val names = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
      val unknown = names -- queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in registry: ${unknown.toSeq.sorted.mkString(", ")}")
      names
    }
}
