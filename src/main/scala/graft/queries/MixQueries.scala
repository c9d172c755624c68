package graft.queries

import graft.Tables
import graft.functions.TextFunctions.spaceTokens
import graft.plans.Fnv1a64
import graft.plans.CosineSimilarity.cosine_sim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 training-mixture + embedding-analytics operators: the decisions a
  * data-curation run makes AFTER cleaning — how the corpus splits, how
  * domains are weighted against a token budget, what the embedding space
  * looks like per class, and label transfer through nearest neighbors.
  * Everything decision-sized is an aggregate over the corpus (sources,
  * labels, split cells), so at 100 TB each query is one or two linear
  * passes plus broadcast-sized control tables.
  */
object MixQueries {

  /** Deterministic train/val/test split by content-independent key hash:
    * fnv1a("split|" + doc_id) mod 1000 → 80/10/10. The hash is the native
    * Fnv1a64 expression (codegen'd, byte-exact with the reference's ihash,
    * lib.rs:203-208), so assignment is stable across engines, partitionings
    * and reruns — the property that makes the split reproducible and
    * leakage-auditable. The salt prefix decorrelates this hash from every
    * other doc_id-keyed hash in the pipeline (sampling, bucketing). Output
    * is the split×source audit table (doc + token counts) a mixture
    * designer reads before training.
    */
  def split(s: SparkSession, d: String): DataFrame =
    splitOf(Tables.documents(s, d))

  /** The split over an arbitrary documents frame — separated so the
    * partition-stability test can feed the SAME data under a different
    * physical layout and prove identical assignment. */
  def splitOf(docs: DataFrame): DataFrame = {
    val bucket = Fnv1a64.ihash31(
      concat(lit("split|"), col("doc_id").cast("string"))) % 1000
    docs
      .select(col("doc_id"), col("source"),
        size(spaceTokens(col("text"))).cast("long").as("ntok"),
        bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 800, "train")
          .when(col("bucket") < 900, "val").otherwise("test"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
      .orderBy("split", "source")
  }

  /** Domain-mixture planning: given a uniform target share per source and a
    * global token budget (half the corpus), compute each source's sampling
    * rate = min(1, budget·share / tokens) and the tokens it contributes.
    * This is the control table for mixture-weighted sampling (the
    * DoReMi/Pile-style reweighting knob): rates for over-represented
    * domains fall below 1, scarce domains keep everything. One groupBy,
    * totals via a window over the tiny per-source aggregate — nothing
    * here grows with the corpus.
    */
  def mixture(s: SparkSession, d: String): DataFrame = {
    // corpus totals via an unpartitioned window over the per-source
    // aggregate (tens of rows) — one corpus scan, no scalar cross join
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(spaceTokens(col("text"))).cast("long")).as("tokens_src"))
      .withColumn("tot", sum(col("tokens_src")).over(whole))
      .withColumn("nsrc", count(lit(1)).over(whole))
      .withColumn("budget", (col("tot") / lit(2)).cast("long"))
      .withColumn("rate",
        round(least(lit(1.0),
          col("budget") * (lit(1.0) / col("nsrc")) / col("tokens_src")), 6))
      .withColumn("exp_tokens", round(col("rate") * col("tokens_src"), 4))
      .select(col("source"), col("n_docs"), col("tokens_src"),
        col("rate"), col("exp_tokens"))
      .orderBy("source")
  }

  /** Temperature-scaled sampling weights (the multilingual/multi-domain
    * `p_i ∝ n_i^α` reweighting of mBERT/XLM-R and data-mixture tuning):
    * raising token counts to α < 1 compresses the size spectrum so
    * low-resource sources are up-sampled relative to their share.
    * α = 0.5 deliberately: each per-source sqrt is correctly rounded
    * under IEEE-754 (a non-dyadic pow(x, α) could drift a last ulp
    * between libm implementations — sqrt cannot), so the only
    * order-sensitive term left is the normalizing SUM of those sqrts,
    * and the round(weight, 6) absorbs its possible last-ulp drift — do
    * NOT drop the rounding. One groupBy; totals via a window over the
    * tiny per-source aggregate, like `mixture`.
    */
  def mixtureTemperature(s: SparkSession, d: String): DataFrame = {
    // the normalizing total comes from an unpartitioned window over the
    // per-source AGGREGATE (tens of rows — SinglePartition of a tiny
    // frame), so the corpus is scanned ONCE; the agg-then-cross-join
    // alternative plans a second full corpus scan for the total branch
    // (AQE can reuse the stage at runtime, but the single-scan plan
    // doesn't need rescuing)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(spaceTokens(col("text"))).cast("long")).as("tokens_src"))
      .withColumn("w_raw", sqrt(col("tokens_src").cast("double")))
      .withColumn("weight", col("w_raw") / sum(col("w_raw")).over(whole))
      // boost_rank: scarcest source first — the up-sample ordering the
      // temperature exists to produce; integer-exact
      .withColumn("boost_rank",
        rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("tokens_src").asc, col("source").asc)).cast("long"))
      .select(col("source"), col("n_docs"), col("tokens_src"),
        round(col("weight"), 6).as("weight"), col("boost_rank"))
      .orderBy("source")
  }

  /** Per-label embedding centroids + cohesion: mean vector per label
    * (components rounded 6dp BEFORE reuse — the order-dependent-aggregate
    * rule, so both engines see identical centroids), centroid norm, and
    * mean cosine of members to their centroid. The class-separation /
    * collapse diagnostic of embedding QA. Shape: posexplode to (label,
    * dim) — 64·n rows of (int, int, double) — one (label,dim) shuffle,
    * then the centroid table (labels × dims, tiny) pivots back to arrays
    * and BROADCASTS into the membership pass; the corpus is scanned twice,
    * shuffled on label only once.
    */
  def centroids(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("label"),
        col("embedding").cast("array<double>").as("v"))
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(round(avg("x"), 6).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        p => p.getField("c")).as("cv"))
    val norm = cent.select(col("label"),
      round(sqrt(aggregate(col("cv"), lit(0.0), (a, x) => a + x * x)), 6)
        .as("centroid_norm"))
    e.join(broadcast(cent), Seq("label"))
      .withColumn("cos", cosine_sim(col("v"), col("cv")))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("cos"), 6).as("cohesion"))
      .join(broadcast(norm), Seq("label"))
      .select("label", "n", "centroid_norm", "cohesion")
      .orderBy("label")
  }

  /** k-NN label transfer — the end-to-end application of similarity
    * search: hold out vec_id < 20 as queries, rank the rest by cosine,
    * majority-vote the top-5 labels (ties → smaller label), report the
    * prediction against the held-out truth. Same scale story as
    * sim_cosine_topk: the query set broadcasts, the corpus streams once
    * through a fused codegen'd cosine, and per-query top-k is a bounded
    * window over qid (20 groups) — no corpus shuffle at any size.
    */
  def knnClassify(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("true_label"),
        col("v").as("qv"))
    val corpus = e.filter(col("vec_id") >= 20)
    val wTop = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val wVote = Window.partitionBy("qid")
      .orderBy(col("votes").desc, col("label").asc)
    corpus.join(broadcast(queries))
      .withColumn("sim", cosine_sim(col("v"), col("qv")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .groupBy("qid", "true_label", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("qid"), col("true_label"), col("label").as("pred_label"),
        col("votes"), (col("label") === col("true_label")).as("correct"))
      .orderBy("qid")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis-
    * Spirakis A-ES): each doc draws a reproducible uniform u from a salted
    * content hash and gets priority u^(1/w) — computed as ln(u)/w, same
    * monotone order — with w = distinct-token-ratio quality. The top-k
    * priorities ARE a weighted sample without replacement, so "sample the
    * best-skewed subset, reproducibly, on any cluster" is one scan + one
    * TakeOrderedAndProject: no RNG state, no partition dependence, and
    * re-running with the same salt re-selects the identical subset (the
    * debuggability property q_sample_hash establishes, extended to
    * weights). Ordering ties ride on round-6dp + doc_id so a last-ulp libm
    * difference between engines cannot flip a boundary row (the
    * threshold-compare rounding rule, DESIGN.md).
    */
  def sampleWeighted(s: SparkSession, d: String, k: Int = 50): DataFrame = {
    val u = (Fnv1a64.ihash31(concat(lit("wrs|"), col("doc_id").cast("string")))
      .cast("double") + 1.0) / 2147483649.0
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), spaceTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("w"))
      .withColumn("priority", round(log(u) / col("w"), 6))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("source"), round(col("w"), 6).as("w"),
        col("priority"))
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * each anchor doc draws k=4 pseudo-random negatives from the corpus
    * via the slot-salted FNV stream, self-collisions resolved by +1
    * linear probing mod corpus size. Hash-derived ⇒ the "random" draws
    * are engine- and partitioning-independent AND re-derivable by the
    * oracle — the same reproducibility contract as pipeline_split.
    * Corpus size is a 1-row broadcast scalar; the anchor scan streams.
    */
  def negSamples(s: SparkSession, d: String, kNeg: Int = 4,
      maxAnchor: Long = 200L): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val raw = Fnv1a64.ihash31(concat(lit("neg|"), col("doc_id").cast("string"),
      lit("|"), col("slot").cast("string"))) % col("n_docs")
    docs.filter(col("doc_id") < maxAnchor).select(col("doc_id"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_docs"),
        explode(array((0 until kNeg).map(lit): _*)).as("slot"))
      .withColumn("neg_id",
        when(raw === col("doc_id"), (raw + 1) % col("n_docs")).otherwise(raw))
      .select(col("doc_id"), col("slot").cast("long").as("slot"), col("neg_id"))
      .orderBy("doc_id", "slot")
  }

  /** Deterministic shard + shuffle — training prep's LAST op before the
    * data loader: every doc hash-assigned to one of K shards (independent
    * salted FNV), then pseudo-randomly ordered WITHIN its shard by a
    * second independent hash (tie doc_id), positions 0-based. This is
    * F3+F5 (hash partition + per-partition sort) applied to the corpus
    * itself: one shuffle keyed on shard, rank never leaves the partition,
    * and the assignment is layout-independent (pure function of doc_id —
    * same reproducibility contract as pipeline_split). At 100 TB, K is
    * the loader's file-group count and this plan IS the shuffled-shard
    * writer.
    */
  def shardShuffle(s: SparkSession, d: String, shards: Int = 8): DataFrame =
    shardShuffleOf(Tables.documents(s, d), shards)

  /** The shard+shuffle over an arbitrary documents frame — separated (like
    * `splitOf`) so the stability test can feed the SAME data under a
    * different physical layout and prove identical (shard, pos)
    * assignment.
    */
  def shardShuffleOf(docs: DataFrame, shards: Int = 8): DataFrame = {
    val shard = Fnv1a64.ihash31(
      concat(lit("shard|"), col("doc_id").cast("string"))) % shards
    val ord = Fnv1a64.ihash31(
      concat(lit("order|"), col("doc_id").cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
    docs
      .select(col("doc_id"), shard.as("shard"), ord.as("ord"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** Epoch-repeat upsampling — how a mixture weight actually materializes
    * into training data: each source gets a deterministic epoch count
    * (hash-derived 1-3 here; in production the mixture solver's output),
    * and every document is REPLICATED once per epoch with an epoch tag,
    * plus a per-replica stable shuffle key so repeats of the same doc
    * land in different shards (the loader must never see epoch-adjacent
    * duplicates). One narrow explode — no shuffle until the output sort;
    * at 100 TB the replication happens at write time into the shard
    * layout (`pipeline_shard_shuffle`), never as a stored 3x copy.
    */
  def repeatUpsample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (Fnv1a64.ihash31(col("source")) % 3 + 1).as("n_epochs"))
      .select(col("doc_id"), col("source"), col("n_epochs"),
        explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
      .withColumn("shard_key",
        Fnv1a64.ihash31(concat(col("doc_id").cast("string"), lit("#"),
          col("epoch").cast("string"))) % 64)
      .orderBy("doc_id", "epoch")

  /** Embedding-distribution DRIFT monitor: split the corpus into two
    * cohorts (vec_id parity stands in for two ingestion days) and compare
    * per-dimension means — the feature-drift table a serving pipeline
    * alerts on. Per-cohort per-dimension sums accumulate as micro-rounded
    * BIGINTs (order-independent, the fixed-point discipline), so means
    * and shifts are integer-exact; one scan, a 2×64-key aggregate.
    */
  def embDrift(s: SparkSession, d: String): DataFrame = {
    val terms = Tables.embeddings(s, d)
      .select((col("vec_id") % 2).as("grp"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("j0", "x")))
      .select(col("grp"), (col("j0") + 1).as("dim"),
        round(col("x") * 1e6).cast("long").as("x_micro"))
    terms.groupBy("dim")
      .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("grp") === 0, col("x_micro")).otherwise(0L)).as("sum_a_micro"),
        sum(when(col("grp") === 1, col("x_micro")).otherwise(0L)).as("sum_b_micro"))
      .withColumn("mean_a", round(col("sum_a_micro") / col("n_a") / lit(1000000.0), 6))
      .withColumn("mean_b", round(col("sum_b_micro") / col("n_b") / lit(1000000.0), 6))
      .withColumn("shift",
        round(abs(col("sum_a_micro") / col("n_a") / lit(1000000.0)
          - col("sum_b_micro") / col("n_b") / lit(1000000.0)), 6))
      .select(col("dim").cast("int").as("dim"), col("n_a"), col("n_b"),
        col("sum_a_micro"), col("sum_b_micro"), col("mean_a"), col("mean_b"),
        col("shift"))
      .orderBy("dim")
  }

  /** Shard MANIFEST with content checksums — what a 100 TB shard writer
    * emits next to the data so any later copy/load can verify integrity
    * without re-reading sources: per shard (same hash assignment as
    * pipeline_shard_shuffle) the doc count, byte total, and two
    * ORDER-INDEPENDENT content fingerprints (sum and xor of per-doc FNV
    * text hashes — the q_table_fingerprint commutative-reduction trick,
    * so the manifest is identical under any partitioning or write
    * order).
    */
  def shardManifest(s: SparkSession, d: String, shards: Int = 8): DataFrame =
    Tables.documents(s, d)
      .select(
        (Fnv1a64.ihash31(concat(lit("shard|"), col("doc_id").cast("string")))
          % shards).as("shard"),
        col("n_chars"),
        Fnv1a64.ihash31(col("text")).as("fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        sum(col("fp")).as("sum_fp"), expr("bit_xor(fp)").as("xor_fp"))
      .orderBy("shard")

  /** Round-robin SOURCE INTERLEAVING — the training-reader order that
    * guarantees every window of ~n_sources consecutive samples touches
    * every domain (no long single-domain runs, the lightweight
    * alternative to full shuffling): docs rank within their source by
    * the salted-FNV order hash (same determinism as
    * pipeline_shard_shuffle), and global position = src_rank·n_sources +
    * dense source index. Positions are unique and layout-stable; one
    * shuffle on source for the rank, one tiny source-index broadcast.
    */
  def interleaveSources(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // n_src rides INSIDE the plan (a count window over the tiny distinct
    // source set — same single-partition window that already assigns the
    // dense index) instead of an eager count() at build time: the query
    // builder stays a pure plan constructor with no hidden job, the
    // pipeline_curriculum discipline.
    val srcIdx = docs.select(col("source")).distinct()
      .withColumn("src_idx",
        (dense_rank().over(Window.orderBy("source")) - 1).cast("long"))
      .withColumn("n_src",
        count(lit(1)).over(Window.partitionBy(lit(1))).cast("long"))
    val w = Window.partitionBy("source").orderBy(col("ord"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        Fnv1a64.ihash31(concat(lit("ilv|"), col("doc_id").cast("string")))
          .as("ord"))
      .withColumn("src_rank", (row_number().over(w) - 1).cast("long"))
      .join(broadcast(srcIdx), "source")
      .withColumn("global_pos", col("src_rank") * col("n_src") + col("src_idx"))
      .select("doc_id", "source", "src_rank", "src_idx", "global_pos")
      .orderBy("global_pos")
  }

  /** exp(x) as a 15-term Taylor-Horner fold — pure +,*,/ on doubles with
    * the SAME operation sequence emitted for both engines (the Scala loop
    * below generates the Spark expression AND the SQL text), so the
    * result is bit-exact by construction instead of relying on two libm
    * implementations agreeing. Accurate to ~1 ulp for |x| ≤ 1, which the
    * caller's η-scaled excess guarantees. */
  private def taylorExp(x: Column): Column =
    (1 to 15).reverse.foldLeft(lit(1.0)) { (acc, k) =>
      lit(1.0) + x * acc / k.toDouble
    }

  private def taylorExpSql(x: String): String =
    (1 to 15).reverse.foldLeft("1.0") { (acc, k) =>
      s"(1.0 + ($x) * ($acc) / $k.0)"
    }

  /** One DoReMi-style domain-reweighting step: each source's mixture
    * weight moves by exp(η · excess), where excess is the domain's
    * per-doc token mass relative to the corpus mean (the deterministic
    * stand-in for the proxy-model excess loss the published method
    * measures — the OPERATOR is the exponentiated-gradient update, not
    * the loss), then weights normalize and smooth toward uniform
    * ((1−c)·ŵ + c/N, c = 0.1). Numeric discipline: every input to the
    * exp fold is an exact-integer-derived double; weights micro-round to
    * BIGINTs before the normalizing sum (order-independent integer
    * addition — the fixed-point discipline), so the emitted weights are
    * bit-stable cross-engine. Scale: one corpus scan → 20-row domain
    * table; everything after is decision-sized broadcast arithmetic.
    */
  def doremiStep(s: SparkSession, d: String): DataFrame = {
    val toks = size(spaceTokens(col("text"))).cast("long")
    val per = Tables.documents(s, d)
      .select(col("source"), toks.as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("tok_sum"))
      .localCheckpoint(false) // feeds the total, the fold, and the output
    val tot = per.agg(sum(col("tok_sum")).as("tot_toks"),
      sum(col("n_docs")).as("tot_docs"), count(lit(1)).as("n_src"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("excess",
        (col("tok_sum") / col("n_docs"))
          / (col("tot_toks") / col("tot_docs")) - 1.0)
      .withColumn("w_micro",
        round(taylorExp(col("excess") * 0.5) * 1e6).cast("long"))
    val norm = scored.agg(sum(col("w_micro")).as("sum_micro"))
    scored.crossJoin(broadcast(norm))
      .select(col("source"), col("n_docs"),
        round(col("excess"), 6).as("excess"),
        round(lit(0.9) * col("w_micro") / col("sum_micro")
          + lit(0.1) / col("n_src"), 6).as("weight"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_doremi_step" -> (doremiStep(_, _)),
    "pipeline_interleave" -> (interleaveSources(_, _)),
    "pipeline_shard_manifest" -> (shardManifest(_, _)),
    "ml_eval_prf" -> (evalPrf(_, _)),
    "emb_drift" -> (embDrift(_, _)),
    "pipeline_repeat_upsample" -> (repeatUpsample(_, _)),
    "pipeline_shard_shuffle" -> (shardShuffle(_, _)),
    "pipeline_neg_samples" -> (negSamples(_, _)),
    "pipeline_sample_weighted" -> (sampleWeighted(_, _)),
    "pipeline_split" -> (split(_, _)),
    "pipeline_mixture" -> (mixture(_, _)),
    "pipeline_mix_temperature" -> (mixtureTemperature(_, _)),
    "emb_centroids" -> (centroids(_, _)),
    "emb_knn_classify" -> (knnClassify(_, _)),
    "ml_eval_confusion" -> (evalConfusion(_, _)),
    "pipeline_length_buckets" -> (lengthBuckets(_, _))
  )

  /** Length-bucketed batching stats — the padding-waste ledger behind
    * bucketed training batches (`pipeline_pack_sequences` is the packing
    * alternative): each doc lands in a fixed power-of-2 token-length
    * ladder rung (a CASE ladder, how bucket boundaries are actually
    * configured), and the per-bucket aggregate reports exactly how many
    * pad tokens that rung costs (padded = n_docs × rung, waste = padded −
    * real tokens). All-integer arithmetic, one map-side-combinable
    * aggregate over one scan — the report a 100 TB tokenization job emits
    * to choose its ladder.
    */
  def lengthBuckets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(size(spaceTokens(col("text"))).cast("long").as("ntok"))
      .withColumn("bucket_len",
        when(col("ntok") <= 16, 16L).when(col("ntok") <= 32, 32L)
          .when(col("ntok") <= 64, 64L).when(col("ntok") <= 128, 128L)
          .when(col("ntok") <= 256, 256L).otherwise(512L))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
      .select(col("bucket_len"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket_len")).as("padded_tokens"),
        (col("n_docs") * col("bucket_len") - col("sum_tokens")).as("waste"))
      .orderBy("bucket_len")

  /** Nearest-centroid classification of EVERY vector + the full confusion
    * matrix — the model-eval aggregate a training pipeline runs at corpus
    * scale. Centroids are 6dp-rounded per-label means (identical across
    * engines); each vector takes the argmax-cosine centroid (ties →
    * smaller label — the margin is a ranking decision, same contract as
    * emb_knn_classify); the matrix and its row/column marginals are pure
    * integer counts, so the gate is exact with no float metrics at all
    * (precision/recall are one division away for the consumer).
    *
    * Scale: the 10-centroid model broadcasts; the corpus streams once
    * through the fused cosine; the only shuffles are the (label,dim)
    * centroid aggregate and the ≤|labels|² cell aggregate.
    */
  /** Shared nearest-centroid confusion cells (true_label, pred_label, n)
    * — one definition for the matrix view and the P/R/F1 view. */
  private def confusionCells(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val cent = e.select(col("label").as("clabel"),
        posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("clabel", "pos").agg(round(avg("x"), 6).as("c"))
      .groupBy("clabel")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        p => p.getField("c")).as("cv"))
    val wBest = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("clabel"))
    e.join(broadcast(cent))
      .withColumn("cos", cosine_sim(col("v"), col("cv")))
      .withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .groupBy(col("label").as("true_label"), col("clabel").as("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-class precision / recall / F1 from the nearest-centroid
    * assignments — the scalar metrics one division away from
    * ml_eval_confusion's integer matrix, computed here so the derivation
    * itself is gated: tp/support/pred_total reduce from the cells, the
    * three ratios divide exact integers, F1 assembles from the raw
    * ratios before rounding. Classes never predicted get precision NULL
    * (0/0), the honest answer; classes PREDICTED but never occurring as
    * a true label (possible on unbalanced data — a centroid can exist
    * for a label no eval row carries) get support 0 and recall NULL via
    * the FULL outer join, instead of silently vanishing from the report
    * the way a true-side left join would drop them.
    */
  def evalPrf(s: SparkSession, d: String): DataFrame = {
    val cells = confusionCells(s, d)
    val byTrue = cells.groupBy(col("true_label").as("class"))
      .agg(sum(col("n")).as("support"),
        sum(when(col("true_label") === col("pred_label"), col("n"))
          .otherwise(0L)).as("tp"))
    val byPred = cells.groupBy(col("pred_label").as("class"))
      .agg(sum(col("n")).as("pred_total"))
    val p = col("tp") / col("pred_total")
    val r = col("tp") / col("support")
    // full outer: neither side may drop classes (no broadcast — Spark has
    // no broadcast strategy for equi full outer; both sides are
    // class-count-sized, whitelisted in PlanAuditSpec)
    byTrue.join(byPred, Seq("class"), "full")
      .withColumn("pred_total", coalesce(col("pred_total"), lit(0L)))
      .withColumn("support", coalesce(col("support"), lit(0L)))
      .withColumn("tp", coalesce(col("tp"), lit(0L)))
      .withColumn("precision", when(col("pred_total") > 0, round(p, 6)))
      .withColumn("recall", when(col("support") > 0, round(r, 6)))
      .withColumn("f1", when(col("pred_total") > 0 && col("support") > 0
          && (p + r) > 0,
        round(lit(2.0) * p * r / (p + r), 6)))
      .select("class", "support", "pred_total", "tp", "precision", "recall", "f1")
      .orderBy("class")
  }

  def evalConfusion(s: SparkSession, d: String): DataFrame = {
    val cells = confusionCells(s, d)
    cells
      .withColumn("row_total",
        sum("n").over(Window.partitionBy("true_label")))
      .withColumn("col_total",
        sum("n").over(Window.partitionBy("pred_label")))
      .withColumn("is_diag", col("true_label") === col("pred_label"))
      .orderBy("true_label", "pred_label")
  }

  import OracleSql.fnvIhash31

  /** Shared nearest-centroid cells CTE chain, ending in
    * `cells(true_label, pred_label, n)` — one SQL definition for the
    * confusion-matrix and P/R/F1 oracles. */
  private val confusionCellsSql: String =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |p AS (SELECT label AS clabel, unnest(generate_series(1, len(v))) AS pos,
      |             unnest(v) AS x FROM e),
      |cent AS (SELECT clabel, pos, round(avg(x), 6) AS c
      |         FROM p GROUP BY 1, 2),
      |carr AS (SELECT clabel, list(c ORDER BY pos) AS cv
      |         FROM cent GROUP BY clabel),
      |assigned AS (
      |  SELECT e.vec_id, e.label, carr.clabel,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_cosine_similarity(e.v, carr.cv) DESC,
      |                    carr.clabel) AS rk
      |  FROM e, carr),
      |cells AS (
      |  SELECT label AS true_label, clabel AS pred_label,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM assigned WHERE rk = 1 GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipeline_interleave" ->
      s"""WITH si AS (
         |  SELECT source,
         |         CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT)
         |           AS src_idx
         |  FROM (SELECT DISTINCT source FROM documents)),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
         |r AS (
         |  SELECT doc_id, source,
         |         CAST(${OracleSql.fnvIhash31("('ilv|' || CAST(doc_id AS VARCHAR))")}
         |              AS BIGINT) AS ord
         |  FROM documents),
         |rk AS (
         |  SELECT doc_id, source,
         |         CAST(row_number() OVER (PARTITION BY source
         |              ORDER BY ord, doc_id) - 1 AS BIGINT) AS src_rank
         |  FROM r)
         |SELECT doc_id, source, src_rank, src_idx,
         |       CAST(src_rank * n_src + src_idx AS BIGINT) AS global_pos
         |FROM rk JOIN si USING (source) CROSS JOIN n
         |ORDER BY global_pos""".stripMargin,
    "ml_eval_prf" ->
      s"""$confusionCellsSql,
         |byt AS (
         |  SELECT true_label AS class, CAST(sum(n) AS BIGINT) AS support,
         |         CAST(sum(CASE WHEN true_label = pred_label THEN n
         |                  ELSE 0 END) AS BIGINT) AS tp
         |  FROM cells GROUP BY 1),
         |byp AS (
         |  SELECT pred_label AS class, CAST(sum(n) AS BIGINT) AS pred_total
         |  FROM cells GROUP BY 1)
         |SELECT class,
         |       CAST(coalesce(support, 0) AS BIGINT) AS support,
         |       CAST(coalesce(pred_total, 0) AS BIGINT) AS pred_total,
         |       CAST(coalesce(tp, 0) AS BIGINT) AS tp,
         |       CASE WHEN coalesce(pred_total, 0) > 0
         |            THEN round(coalesce(tp, 0) / pred_total, 6) END AS precision,
         |       CASE WHEN coalesce(support, 0) > 0
         |            THEN round(coalesce(tp, 0) / support, 6) END AS recall,
         |       CASE WHEN coalesce(pred_total, 0) > 0
         |             AND coalesce(support, 0) > 0
         |             AND tp / pred_total + tp / support > 0
         |            THEN round(2.0 * (tp / pred_total) * (tp / support)
         |                       / (tp / pred_total + tp / support), 6)
         |       END AS f1
         |FROM byt FULL JOIN byp USING (class)
         |ORDER BY class""".stripMargin,
    "pipeline_shard_manifest" ->
      s"""WITH docs AS (
         |  SELECT CAST(${OracleSql.fnvIhash31("('shard|' || CAST(doc_id AS VARCHAR))")}
         |              % 8 AS BIGINT) AS shard,
         |         n_chars,
         |         CAST(${OracleSql.fnvIhash31("text")} AS BIGINT) AS fp
         |  FROM documents)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |       CAST(sum(fp) AS BIGINT) AS sum_fp,
         |       CAST(bit_xor(fp) AS BIGINT) AS xor_fp
         |FROM docs GROUP BY shard ORDER BY shard""".stripMargin,
    "emb_drift" ->
      """WITH t AS (
        |  SELECT vec_id % 2 AS grp, j AS dim,
        |         CAST(round(CAST(embedding[j] AS DOUBLE) * 1e6) AS BIGINT)
        |           AS x_micro
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS j))
        |SELECT CAST(dim AS INT) AS dim,
        |       CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |       CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |       CAST(sum(CASE WHEN grp = 0 THEN x_micro ELSE 0 END) AS BIGINT)
        |         AS sum_a_micro,
        |       CAST(sum(CASE WHEN grp = 1 THEN x_micro ELSE 0 END) AS BIGINT)
        |         AS sum_b_micro,
        |       round(sum(CASE WHEN grp = 0 THEN x_micro ELSE 0 END)
        |             / sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
        |             / 1000000.0, 6) AS mean_a,
        |       round(sum(CASE WHEN grp = 1 THEN x_micro ELSE 0 END)
        |             / sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
        |             / 1000000.0, 6) AS mean_b,
        |       round(abs(sum(CASE WHEN grp = 0 THEN x_micro ELSE 0 END)
        |                 / sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
        |                 / 1000000.0
        |                 - sum(CASE WHEN grp = 1 THEN x_micro ELSE 0 END)
        |                   / sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
        |                   / 1000000.0), 6) AS shift
        |FROM t GROUP BY dim ORDER BY dim""".stripMargin,
    "pipeline_repeat_upsample" ->
      s"""WITH base AS (
         |  SELECT doc_id, source,
         |         CAST(${fnvIhash31("source")} % 3 + 1 AS BIGINT) AS n_epochs
         |  FROM documents)
         |SELECT doc_id, source, n_epochs, CAST(epoch AS BIGINT) AS epoch,
         |       CAST(${fnvIhash31("doc_id::VARCHAR || '#' || epoch::VARCHAR")} % 64
         |            AS BIGINT) AS shard_key
         |FROM base, LATERAL (SELECT unnest(generate_series(1, n_epochs)) AS epoch)
         |ORDER BY doc_id, epoch""".stripMargin,
    "pipeline_shard_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |         CAST(${fnvIhash31("'shard|' || doc_id::VARCHAR")} % 8
         |              AS BIGINT) AS shard,
         |         ${fnvIhash31("'order|' || doc_id::VARCHAR")} AS ord
         |  FROM documents)
         |SELECT doc_id, shard,
         |       CAST(row_number() OVER (PARTITION BY shard
         |                               ORDER BY ord, doc_id) - 1
         |            AS BIGINT) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin,
    "pipeline_neg_samples" ->
      s"""WITH n AS (SELECT count(*) AS n_docs FROM documents),
         |a AS (SELECT doc_id, slot FROM documents,
         |      (SELECT unnest(generate_series(0, 3)) AS slot)
         |      WHERE doc_id < 200),
         |h AS (
         |  SELECT doc_id, slot,
         |         CAST(${fnvIhash31(
             "'neg|' || doc_id::VARCHAR || '|' || slot::VARCHAR")} % n_docs
         |              AS BIGINT) AS raw, n_docs
         |  FROM a, n)
         |SELECT doc_id, CAST(slot AS BIGINT) AS slot,
         |       CAST(CASE WHEN raw = doc_id THEN (raw + 1) % n_docs
         |                 ELSE raw END AS BIGINT) AS neg_id
         |FROM h ORDER BY doc_id, slot""".stripMargin,
    "pipeline_sample_weighted" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         len(list_distinct(l))::DOUBLE / len(l)::DOUBLE AS w,
         |         ((${fnvIhash31("'wrs|' || doc_id::VARCHAR")})::DOUBLE + 1.0)
         |           / 2147483649.0 AS u
         |  FROM (SELECT doc_id, source, string_split(text, ' ') AS l
         |        FROM documents))
         |SELECT doc_id, source, round(w, 6) AS w,
         |       round(ln(u) / w, 6) AS priority
         |FROM d
         |ORDER BY round(ln(u) / w, 6) DESC, doc_id LIMIT 50""".stripMargin,
    "pipeline_split" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS ntok,
         |         (${fnvIhash31("'split|' || doc_id::VARCHAR")} % 1000)::BIGINT AS bucket
         |  FROM documents)
         |SELECT CASE WHEN bucket < 800 THEN 'train'
         |            WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
         |       source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(ntok) AS BIGINT) AS n_tokens
         |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "pipeline_mix_temperature" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_src
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, sqrt(CAST(tokens_src AS DOUBLE)) AS w_raw FROM per),
        |tot AS (SELECT sum(w_raw) AS w_tot FROM w)
        |SELECT source, n_docs, tokens_src,
        |       round(w_raw / w_tot, 6) AS weight,
        |       CAST(rank() OVER (ORDER BY tokens_src ASC, source ASC) AS BIGINT)
        |         AS boost_rank
        |FROM w, tot ORDER BY source""".stripMargin,
    "pipeline_doremi_step" -> {
      val fold = taylorExpSql("(excess) * 0.5")
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_sum
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(tok_sum) AS BIGINT) AS tot_toks,
         |               CAST(sum(n_docs) AS BIGINT) AS tot_docs,
         |               CAST(count(*) AS BIGINT) AS n_src FROM per),
         |scored AS (
         |  SELECT per.source, per.n_docs, tot.n_src,
         |         (tok_sum / CAST(n_docs AS DOUBLE))
         |           / (tot_toks / CAST(tot_docs AS DOUBLE)) - 1.0 AS excess
         |  FROM per CROSS JOIN tot),
         |w AS (
         |  SELECT source, n_docs, n_src, excess,
         |         CAST(round(($fold) * 1e6) AS BIGINT) AS w_micro
         |  FROM scored),
         |norm AS (SELECT CAST(sum(w_micro) AS BIGINT) AS sum_micro FROM w)
         |SELECT source, n_docs, round(excess, 6) AS excess,
         |       round(0.9 * CAST(w_micro AS DOUBLE) / CAST(sum_micro AS DOUBLE)
         |             + 0.1 / CAST(n_src AS DOUBLE), 6) AS weight
         |FROM w CROSS JOIN norm ORDER BY source""".stripMargin
    },
    "pipeline_mixture" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_src
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(tokens_src) AS BIGINT) AS tot,
        |               CAST(count(*) AS BIGINT) AS nsrc FROM per)
        |SELECT source, n_docs, tokens_src,
        |       round(least(1.0, (tot // 2) * (1.0 / nsrc) / tokens_src), 6) AS rate,
        |       round(round(least(1.0, (tot // 2) * (1.0 / nsrc) / tokens_src), 6)
        |             * tokens_src, 4) AS exp_tokens
        |FROM per, tot ORDER BY source""".stripMargin,
    "emb_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT label, unnest(generate_series(1, len(v))) AS pos,
        |             unnest(v) AS x FROM e),
        |cent AS (SELECT label, pos, round(avg(x), 6) AS c
        |         FROM p GROUP BY 1, 2),
        |carr AS (SELECT label, list(c ORDER BY pos) AS cv
        |         FROM cent GROUP BY label),
        |norm AS (SELECT label,
        |                round(sqrt(list_sum(list_transform(cv, x -> x * x))), 6)
        |                  AS centroid_norm
        |         FROM carr),
        |coh AS (SELECT e.label, CAST(count(*) AS BIGINT) AS n,
        |               round(avg(list_cosine_similarity(e.v, carr.cv)), 6)
        |                 AS cohesion
        |        FROM e JOIN carr USING (label) GROUP BY e.label)
        |SELECT label, n, centroid_norm, cohesion
        |FROM coh JOIN norm USING (label) ORDER BY label""".stripMargin,
    "pipeline_length_buckets" ->
      """WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |b AS (
        |  SELECT CASE WHEN ntok <= 16 THEN 16 WHEN ntok <= 32 THEN 32
        |              WHEN ntok <= 64 THEN 64 WHEN ntok <= 128 THEN 128
        |              WHEN ntok <= 256 THEN 256 ELSE 512 END AS bucket_len,
        |         ntok
        |  FROM t)
        |SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(ntok) AS BIGINT) AS sum_tokens,
        |       CAST(count(*) * bucket_len AS BIGINT) AS padded_tokens,
        |       CAST(count(*) * bucket_len - sum(ntok) AS BIGINT) AS waste
        |FROM b GROUP BY bucket_len ORDER BY bucket_len""".stripMargin,
    "ml_eval_confusion" ->
      s"""$confusionCellsSql
        |SELECT true_label, pred_label, n,
        |       CAST(sum(n) OVER (PARTITION BY true_label) AS BIGINT)
        |         AS row_total,
        |       CAST(sum(n) OVER (PARTITION BY pred_label) AS BIGINT)
        |         AS col_total,
        |       true_label = pred_label AS is_diag
        |FROM cells ORDER BY true_label, pred_label""".stripMargin,
    "emb_knn_classify" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, label AS true_label, v AS qv
        |      FROM e WHERE vec_id < 20),
        |sims AS (
        |  SELECT q.qid, q.true_label, c.label, c.vec_id,
        |         row_number() OVER (PARTITION BY q.qid
        |           ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id)
        |           AS rk
        |  FROM e c, q WHERE c.vec_id >= 20),
        |votes AS (
        |  SELECT qid, true_label, label, CAST(count(*) AS BIGINT) AS votes,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY count(*) DESC, label) AS vr
        |  FROM sims WHERE rk <= 5 GROUP BY qid, true_label, label)
        |SELECT qid, true_label, label AS pred_label, votes,
        |       label = true_label AS correct
        |FROM votes WHERE vr = 1 ORDER BY qid""".stripMargin
  )
}
