package graft

/** Registry-wide join-strategy audit: every query's physical plan is swept
  * for the operators that become scale killers when unintended — cartesian
  * products, broadcast-nested-loop joins, and shuffle joins — against an
  * explicit whitelist of queries where each is the DOCUMENTED design
  * (1-row scalar cross joins, bounded theta joins, fact-fact merges). A new
  * query that accidentally plans a cartesian or an unhinted shuffle join
  * fails here instead of surfacing as a 100× regression on a cluster.
  *
  * Complements PlanShapeSpec (which pins load-bearing properties of
  * specific headline plans) with breadth: the WHOLE registry, one property.
  */
class PlanAuditSpec extends SparkSpec {

  // stream_* execute eagerly at build time (memory-sink settle) — their
  // batch-side plans are covered by the shared batch queries they mirror
  private def auditable: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    SparkEntry.queries.filterNot(_._1.startsWith("stream_"))

  private def planOf(name: String): String =
    auditable(name)(spark, sf)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  // every entry is a deliberate, documented plan choice (see scaladoc at
  // the query): scalar one-row cross joins, bounded-universe theta joins,
  // pure-inequality range joins, or fact-fact merges with no broadcastable
  // side
  private val allowCartesianOrBnlj = Set(
    "dedup_embedding_cosine", // bounded all-pairs theta join (va < vb)
    "q_cross_join",           // the cross-join demonstration itself
    "q_join_range",           // pure inequality join — BNLJ is OSS Spark's only strategy
    "q_resample_1h",          // 1-row bounds × tiny type dimension
    "q_tpch_q11",             // 1-row grand-total scalar
    "q_tpch_q22",             // 1-row avg-balance scalar
    "graph_triangles",        // final 1-row × 1-row count cross join
    "sim_cosine_topk",        // broadcast query set × corpus stream (the design)
    "text_tfidf",             // broadcast 1-row doc-count scalar
    "q_scalar_subquery",      // scalar subquery becomes a 1-row broadcast
    "q_metadata_cols",        // 1-row per-file rollup × 1-row global
                              // distinct-orders scalar (layout-invariant
                              // totals) — both sides single-row by
                              // construction at any data size
    "q_lateral",              // lateral explode over a 1-row aggregate
    "pipeline_token_budget",  // 1-row broadcast budget scalar × selection filter
    "pipeline_e2e_curation",  // same budget-scalar shape at the end of the chain
    "layout_pruning_stats",   // 10-band × file-zone-stat metadata cross (both tiny)
    "q_interpolate",          // type-dim × 24-slot grid (both tiny)
    "emb_knn_classify",       // broadcast 20-query set × corpus stream (sim_cosine_topk shape)
    "pipeline_decontam_semantic", // broadcast eval-embedding set × train stream (the design)
    "text_bm25",              // broadcast 1-row corpus-stats scalar (N, avgdl)
    "ml_kmeans_step",         // broadcast k-row centroid set × corpus stream
    "ml_eval_confusion",      // broadcast 10-row centroid model × corpus stream
    "ml_kmeans_iter",         // same shape, two unrolled Lloyd rounds
    "pipeline_neg_samples",   // broadcast 1-row corpus-count scalar
    "sketch_hll",             // 64-register file × two 1-row scalars (estimate, exact)
    "sketch_hll_union",       // 1-row union estimate × 1-row direct/exact scalar
    "sketch_kmv_intersect",   // four 1-row scalars (θ, ρ, exacts) crossed
    "q_incremental_agg",      // broadcast 1-row cutoff scalar × events stream
    "ml_histogram_split",     // ~50-row histogram × broadcast 1-row totals scalar
    "sketch_bloom",           // 40-probe report × 1-row bits_set scalar
    "sketch_mg_heavy",        // 1-row token-total scalar × word counts;
                              // the ≤k-row MG summary is broadcast
    "pipeline_doremi_step",   // two 1-row scalars (corpus totals, micro
                              // weight sum) × the 20-row domain table
    "ml_naive_bayes",         // doc grid × broadcast C-row class-constant table
    "q_market_basket",        // broadcast 1-row n_orders scalar × pair table
    "pipeline_curriculum",    // broadcast 1-row quantile-boundary scalar × corpus
    "sim_matryoshka",         // broadcast 10-query set × corpus stream (sim_cosine_topk shape)
    "ml_gbdt_residual",       // broadcast 1-row best-split/totals scalars × histogram
    "text_bpe_apply",         // broadcast 1-row merge-rule scalar × vocabulary
    "sim_sparse_knn",         // broadcast 1-row n_docs scalar × term stats
    "graph_modularity",       // broadcast 1-row 2m-edge-count scalar × communities
    "text_cooc_pmi",          // broadcast 1-row n_docs scalar × pair table
    "ml_eval_prf",            // broadcast 10-row centroid model × corpus stream
                              // (the ml_eval_confusion shape, shared cells)
    "sim_binary_hamming",     // broadcast 10-query signature set × corpus
                              // stream (the sim_cosine_topk shape)
    "sim_ann_recall",         // inherits sim_cosine_topk's broadcast
                              // query-set × corpus shape verbatim
    "text_kl_source"          // broadcast 1-row corpus-total scalar ×
                              // (source × word) grid (the text_bm25 shape)
  )
  private val allowShuffleJoin = Set(
    "q_join_full",    // full outer: no broadcastable side by semantics
    "q_merge_upsert", // MERGE core is a full outer join — same semantics
    "q_tpch_q21",     // lineitem self-joins co-keyed on l_orderkey (documented)
    "graph_triangles",// edge-set self-joins, both sides same relation
    "graph_clustering",// same wedge self-join (both sides the oriented
                       // edge set) + deg ⋈ tri-count: both vertex-sized,
                       // co-keyed on vertex id (the Pregel annotate shape;
                       // the closing-edge join IS broadcast-hinted)
    "ml_naive_bayes", // doc-grid ⋈ doc-scores ⋈ doc-lengths: every side is
                      // document-count-sized, co-keyed on doc_id — no
                      // broadcastable side by semantics (model join IS hinted)
    "q_shuffle_hash_join", // the SHUFFLE_HASH hint demonstration itself —
                           // the forced ShuffledHashJoin IS the operator
    "ml_eval_prf",    // byTrue FULL JOIN byPred: no broadcast strategy for
                      // equi full outer; both sides class-count-sized
    "sim_sparse_knn",  // query-candidate dot table ⋈ corpus-sized norm
                       // table, co-keyed on doc_id — no broadcastable
                       // side by semantics (norms grow with the corpus)
    "graph_modularity", // edges ⋈ vertex-label table (both graph-sized,
                        // co-keyed on vertex id) — the Pregel annotate shape
    "er_sorted_neighborhood" // probes (n·w) ⋈ ranked (n) co-keyed on rank:
                             // both sides corpus-sized by design (and the
                             // ranked side is an RDD-backed frame with no
                             // stats) — the O(n·w) equi-join IS the operator
  )

  test("no query plans an UNDOCUMENTED cartesian/BNLJ/shuffle join") {
    val offenders = auditable.keys.toSeq.sorted.flatMap { q =>
      val plan = planOf(q)
      val bad = Seq(
        ((plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          && !allowCartesianOrBnlj(q), "cartesian/BNLJ"),
        ((plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
          && !allowShuffleJoin(q), "shuffle join")).collect { case (true, w) => w }
      if (bad.isEmpty) None else Some(s"$q: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"unexpected join strategies (document or fix):\n${offenders.mkString("\n")}")
  }
}
