package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star ops).
  *
  * Scale design: the brute-force top-k broadcasts the (small) query set and
  * streams the corpus once — no shuffle of the corpus at all; per-row work is
  * |Q|·dim inside one codegen'd expression. That is the right baseline up to
  * millions of vectors per executor-scan. The LSH variant buckets vectors by
  * random-hyperplane signatures so candidate generation is O(n), the scale
  * path when |Q| or n make brute force quadratic.
  */
object SimilarityQueries {

  /** Row-count budget for the pair-verification joins' vector-table
    * broadcasts (`vecsFitBroadcast`) — the embedding-family sibling of
    * `GraphQueries.edgesFitBroadcast`. The near-dup verifiers
    * (`dedup_semantic`, `dedup_embedding_lsh`) generate a candidate-pair
    * stream orders of magnitude larger than the vector table, then join
    * the vectors back by id twice; Catalyst's size estimate for that
    * stream descends from a cells-sized aggregate (8 rows), so past the
    * auto-broadcast threshold it plans a sort-merge join that SHUFFLES
    * AND SORTS the pair stream — measured at sf10: the 2.5e9-row pair
    * exchange pinned a 48 GB heap for 20+ minutes, where broadcasting
    * the 110 MB vector table keeps the pair stream fully pipelined
    * (generate → probe → probe → filter, no pair ever shuffled).
    * Default 1M vectors ≈ 0.6 GB hashed at 64 double dims — inside a
    * production executor budget, 5× the sf10 fixture; past it the hint
    * is dropped and the join degrades to the shuffle it genuinely needs
    * at that scale. Callers pass the MEASURED vector count (a parquet
    * footer-stats count, effectively free). */
  private[graft] val BroadcastVecLimitKey = "spark.graft.sim.broadcastVecLimit"
  private[graft] val BroadcastVecLimitDefault = 1000000L
  private[graft] def vecsFitBroadcast(s: SparkSession, n: Long): Boolean =
    n <= s.conf.get(BroadcastVecLimitKey, BroadcastVecLimitDefault.toString).toLong

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  /** Brute-force cosine top-k: 10 query vectors (vec_id < 10) against the
    * full corpus, k=5 neighbors each, ranked (sim DESC, vec_id) for
    * determinism. The ranking runs through the native bounded-heap
    * aggregate (`plans/TopKAgg`, double keys ride their order-preserving
    * IEEE bits — exactly invertible, so sims are bit-identical to the
    * former rank-window form). The former window also bounded the
    * exchange (WindowGroupLimit), but sorted each map partition's scored
    * stream to do it; the heap aggregate drops both Sorts from the plan
    * (pinned in PlanShapeSpec) and keeps 5 candidates per query per task
    * in O(n log k) — the streamed-corpus × broadcast-queries shape that
    * survives a corpus 1000× this size.
    */
  def cosineTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val base = vecs(s, d)
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    base.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim",
        graft.plans.CosineSimilarity.cosine_sim(col("v"), col("qv")))
      .groupBy("qid")
      .agg(graft.plans.TopKAgg.topk(col("sim"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.p").as("vec_id"), col("col.k").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("qid", "rank")
  }

  /** Deterministic pseudo-random doubles in [-1, 1) via splitmix64 — plane
    * components are fixed at plan-build time and become array literals, so
    * per-row work is just `bits` dot products.
    */
  private[graft] def splitmixDouble(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Random-hyperplane LSH bucketing: 12-bit signatures from deterministic
    * pseudo-random planes — candidate generation for ANN in O(n). Emits
    * bucket occupancy (signature, count, distinct labels). The planes are
    * plan-time constants, so unlike the xxhash-family sketches this IS
    * SQL-expressible — fully oracled below.
    */
  def annLshBuckets(s: SparkSession, d: String, bits: Int = 12): DataFrame = {
    // r11: one native LshSigs evaluation (single table) instead of 12
    // inline 64-literal plane arrays — same signature values, O(1) plan.
    // Plane j here is lshPlaneId(0, j, legacy=bits, tables=1) = j, i.e.
    // byte-identical to the historical seeding and the oracle's planes.
    val planes: Array[Array[Double]] =
      Array.tabulate(bits)(j => Array.tabulate(64)(i => splitmixDouble(j * 64L + i)))
    val sig = graft.plans.LshSigs.lsh_sigs(col("v"), planes, bits)
      .getItem(0).cast("long")
    vecs(s, d)
      .withColumn("sig", sig)
      .groupBy("sig")
      .agg(count(lit(1)).as("n_vectors"), countDistinct(col("label")).as("n_labels"))
      .orderBy("sig")
  }

  /** End-to-end ANN top-k retrieval via multi-table random-hyperplane LSH:
    * bucket → candidates → fused cosine verify → per-query top-k. Same
    * output shape as the brute-force `cosineTopK`, which is its
    * answer-quality ground truth (AnnRecallSpec measures recall ≥ 0.9).
    *
    * Band geometry (3 bits × 24 tables) is tuned for this corpus, whose
    * embeddings are isotropic-random (max pairwise cosine ≈ 0.5) — the
    * worst case for LSH, where any pruning costs recall. Measured here:
    * recall 0.94–0.98 at sf0.001/0.01/0.1. On a real clustered corpus the
    * same operator prunes far harder (raise bits, keep tables).
    *
    * Scale shape: corpus scanned once for signatures (72 codegen'd
    * `dot_product` evaluations per row — native Expression, not interpreted
    * HOFs); query signatures and query vectors are broadcast (|Q|=10);
    * the only shuffle is the distinct over candidate (qid, vec_id) int
    * pairs. The corpus re-scan to fetch candidate vectors is
    * broadcast-joined against the candidate set, so corpus vectors are
    * never shuffled — at 100 TB both scans stream and all joins are
    * broadcast-hash.
    */
  def annTopK(s: SparkSession, d: String, k: Int = 5, bits: Int = 3,
      tables: Int = 24): DataFrame = {
    val base = vecs(s, d)
    val sigs = lshTableSigs(base, bits, tables)
    val qsigs = sigs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("tbl"), col("sig"))
    val cand = sigs.join(broadcast(qsigs), Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    verifyTopK(base, cand, k)
  }

  /** Shared ANN tail: verify the candidate (qid, vec_id) set with the
    * fused cosine against broadcast query vectors and keep the top k per
    * query. The tie-break (`sim DESC, vec_id`) is the determinism contract
    * both ANN oracles depend on — it lives only here.
    */
  private def verifyTopK(base: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    val qvec = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    base.join(broadcast(cand), "vec_id")
      .join(broadcast(qvec), "qid")
      .withColumn("sim",
        graft.plans.CosineSimilarity.cosine_sim(col("v"), col("qv")))
      .select(col("qid"), col("vec_id"), col("sim"), row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** IVF (inverted-file) ANN — the other coarse-quantization family: 16
    * cells seeded from the first 16 corpus vectors (the train-then-apply
    * pattern — a real IVF trains k-means centroids offline and loads them;
    * here the quantizer is materialized driver-side before the scan, like
    * any broadcast-side model), each vector assigned to its max-cosine cell,
    * queries probe their 4 nearest cells, candidates verified with the
    * fused cosine. On this corpus: ~24% of the corpus scanned per query at
    * recall 0.92–1.0 — the measured pruning/recall tradeoff LSH can't hit
    * here. Deterministic end to end (ties → smallest centroid id) → fully
    * oracled.
    */
  def ivfTopK(s: SparkSession, d: String, k: Int = 5, cells: Int = 16,
      probes: Int = 4): DataFrame = {
    import graft.plans.CosineSimilarity.cosine_sim
    val base = vecs(s, d)
    val cents: Array[Array[Double]] = base.filter(col("vec_id") < cells)
      .select(col("vec_id"), col("v")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    // the oracle keys cells by ACTUAL vec_id, the Spark side by array
    // position — they only coincide when ids 0..cells-1 all exist
    require(cents.length == cells,
      s"IVF quantizer expects contiguous vec_ids 0..${cells - 1}; found ${cents.length}")
    val cLit: Int => Column = j => array(cents(j).map(lit(_)): _*)
    val simArr = array((0 until cells).map(j => cosine_sim(col("v"), cLit(j))): _*)
    // cell = FIRST index of the max similarity (ties → smallest id)
    val assigned = base.withColumn("sims", simArr)
      .withColumn("cell",
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
    val qprobes = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), posexplode(col("sims")).as(Seq("cid", "csim")))
    val w0 = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probeCells = qprobes
      .select(col("qid"), col("cid").as("cell"), row_number().over(w0).as("rnk"))
      .filter(col("rnk") <= probes)
      .select("qid", "cell")
    val cand = assigned.join(broadcast(probeCells), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    verifyTopK(base, cand, k)
  }

  /** Embedding statistics per label: count + average L2 norm. */
  def normStats(s: SparkSession, d: String): DataFrame =
    vecs(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"), round(avg(l2norm(col("v"))), 6).as("avg_norm"))
      .orderBy("label")

  /** Product-quantization encode — the memory half of billion-scale ANN
    * (IVF picks the cells, PQ shrinks the residents): the 64-dim vector
    * splits into 8 subspaces of 8 dims, each assigned to its nearest of 4
    * codebook centroids, so a 256-byte float vector serves from 8 code
    * bytes (32×). Codebook = the 4 lowest-vec_id vectors' subvectors (a
    * fixed, broadcast-sized model — same contract as the IVF/kmeans
    * centroid seeds); distances fold squared diffs in index order with a
    * 0.0 init, so the doubles are bit-identical across engines, and
    * argmin ties break by centroid id. Output is one row per (vector,
    * subspace) with the code and its exact quantization error.
    *
    * Scale: assignment is a broadcast join (4×8 tiny centroids) over one
    * linear scan — no shuffle until the output sort; training with real
    * Lloyd rounds reuses `ml_kmeans_iter`'s shape per subspace.
    */
  def pqCodes(s: SparkSession, d: String, m: Int = 8, dsub: Int = 8,
      k: Int = 4): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val subs = emb.select(col("vec_id"), explode(array((0 until m).map { j =>
        struct(lit(j).as("j"), slice(col("v"), j * dsub + 1, dsub).as("sv"))
      }: _*)).as("e"))
      .select(col("vec_id"), col("e.j").as("j"), col("e.sv").as("sv"))
    val cents = subs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("j"), col("sv").as("cv"))
    val dist = aggregate(
      zip_with(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)
    val w = Window.partitionBy("vec_id", "j").orderBy(col("dist"), col("cid"))
    subs.join(broadcast(cents), "j")
      .select(col("vec_id"), col("j"), col("cid"), dist.as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("j"), col("cid").as("code"), col("dist"))
      .orderBy("vec_id", "j")
  }

  /** SPARSE similarity search — TF-IDF cosine top-k over the inverted
    * index (the dense family above covers embeddings; this is the
    * lexical/BM25-side retrieval shape): candidate pairs generate ONLY
    * through shared vocabulary terms, with a document-frequency cap
    * (df ≤ n/4) pruning stopword-grade terms exactly like champion
    * lists, so per-query work is Σ_term posting-list length, never a
    * corpus scan. Per-term weight products and per-doc norm terms are
    * micro-rounded to BIGINT before summing (fixed-point discipline —
    * absorbs any last-ulp ln() divergence too); cosine assembles from
    * those exact integers.
    */
  def sparseKnn(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    import graft.functions.TextFunctions.spaceTokens
    val docs = Tables.documents(s, d)
    // term space = word BIGRAMS: on this small-vocabulary corpus every
    // unigram is stopword-grade (df ≈ n) and a df cap would empty the
    // index; bigrams give a realistically long-tailed term distribution.
    // Grams never exist as STRINGS: the native WordGramFnv expression
    // (the pipeline_decontam fusion) emits the FNV-1a hash of each gram
    // in one codegen'd loop, so the inverted-index shuffles and the
    // posting-list joins carry (long, long) rows instead of ~16-char
    // gram strings — the hash is internal, never an output column, and
    // the oracle re-derives the identical fold, so parity is exact by
    // construction, collisions included.
    val words = spaceTokens(col("text"))
    val terms = docs
      .filter(size(words) >= 2)
      .select(col("doc_id"),
        explode(graft.plans.WordGramFnv.wordGramFnv(words, 2)).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val voc = terms.groupBy("h").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 4 <= col("n_docs"))
      .withColumn("idf", log(col("n_docs").cast("double") / col("df")))
      .select("h", "idf")
    val w = terms.join(voc, "h").withColumn("wt", col("tf") * col("idf"))
    val norms = w.groupBy("doc_id")
      .agg(sum(round(col("wt") * col("wt") * 1e6).cast("long")).as("nrm_micro"))
    val qw = w.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"), col("h"), col("wt").as("qwt"))
    val dots = w.join(broadcast(qw), "h")
      .filter(col("doc_id") =!= col("qid"))
      .groupBy("qid", "doc_id")
      .agg(sum(round(col("wt") * col("qwt") * 1e6).cast("long")).as("dot_micro"))
    val qNorms = norms.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"), col("nrm_micro").as("qn_micro"))
    val wnd = Window.partitionBy("qid").orderBy(col("cos").desc, col("doc_id"))
    dots.join(norms, "doc_id").join(broadcast(qNorms), "qid")
      .withColumn("cos", col("dot_micro") / 1e6
        / (sqrt(col("nrm_micro") / 1e6) * sqrt(col("qn_micro") / 1e6)))
      .select(col("qid"), col("doc_id"), col("cos"),
        row_number().over(wnd).as("rank"))
      .filter(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_sparse_knn" -> (sparseKnn(_, _)),
    "emb_pq_codes" -> (pqCodes(_, _)),
    "sim_cosine_topk" -> (cosineTopK(_, _)),
    "sim_ann_lsh" -> (annLshBuckets(_, _)),
    "sim_ann_topk" -> (annTopK(_, _)),
    "sim_ivf_topk" -> (ivfTopK(_, _)),
    "emb_norm_stats" -> (normStats(_, _))
  )

  /** Hard cap on the scale-aware band width (`scaledLshBits`): 16 bits =
    * 65 536 buckets/table covers corpora to ~8M vectors at the 125-rows/
    * bucket target before the cap binds. Also sizes the extended plane
    * namespace below. */
  private[graft] val MaxLshBits = 16

  /** Scale-aware LSH band width: the smallest b in [legacy, MaxLshBits]
    * with n ≤ 125·2^b — i.e. bucket occupancy targeted at ~125 vectors,
    * the production sizing rule (band width grows with corpus size so
    * candidate volume stays bucket-bounded; a FIXED width is Ω(n²/2^bits)
    * by convexity no matter how clustered the corpus is). Integer
    * comparison, never floating log2: the DuckDB oracle evaluates the
    * identical integer rule, and a float boundary (n/125 a near-power of
    * two) must not be able to disagree between engines. At every driver
    * fixture SF (n ≤ 2000) this floors at `legacy`, so fixture answers
    * are bit-identical to the fixed-width era. */
  private[graft] def scaledLshBits(n: Long, legacy: Int = 4): Int = {
    var b = legacy
    while (b < MaxLshBits && n > (125L << b)) b += 1
    b
  }

  /** The SINGLE definition of the multi-table plane-id namespace, shared by
    * `lshTableSigs` (Spark side) and `planeRowsSqlScaled` (oracle side) so
    * the two can never drift. Bit positions below `legacy` keep the
    * historical `t * legacy + i` seeding — every fixture-scale answer is
    * byte-identical to the fixed-width era — while positions in
    * [legacy, MaxLshBits) draw from a disjoint range starting at
    * `legacy * tables`, each table owning `MaxLshBits - legacy` consecutive
    * extended ids. Injective over (t, i) ∈ [0,tables) × [0,MaxLshBits) —
    * pinned by LshScaleSpec. */
  private[graft] def lshPlaneId(t: Int, i: Int, legacy: Int, tables: Int): Long =
    if (i < legacy) (t * legacy + i).toLong
    else legacy.toLong * tables + t.toLong * (MaxLshBits - legacy) + (i - legacy)

  /** Per-table LSH signatures (vec_id, tbl, sig) — the SINGLE definition
    * of the multi-table plane family. Shared by `annTopK` and
    * `DedupQueries.embeddingLsh` so band geometry / plane seeding can
    * never drift between them and the `planeRowsSql` oracle side.
    *
    * `legacyBits` (r10): callers that widen their bands with corpus size
    * (`scaledLshBits`) pass their ORIGINAL fixed width here. Plane ids for
    * bit positions below it keep the historical `t * legacyBits + i`
    * seeding — so every fixture-scale answer is unchanged — while
    * positions above it draw from a disjoint id range starting at
    * `legacyBits * tables` (plane ids never collide across tables:
    * each table owns MaxLshBits − legacyBits consecutive extended ids).
    */
  private[graft] def lshTableSigs(base: DataFrame, bits: Int,
      tables: Int, legacyBits: Int = -1): DataFrame = {
    val lb = if (legacyBits < 0) bits else legacyBits
    require(bits <= MaxLshBits, s"bits=$bits exceeds MaxLshBits=$MaxLshBits")
    // r11: the whole plane family rides into ONE native expression
    // (plans/LshSigs) instead of tables × bits × 65 inline literal nodes —
    // same signatures bit-for-bit (LshSigsSpec), but the plan and its
    // codegen are O(1) in band geometry, which the per-fresh-plan bench
    // (and any short-lived production job) pays for directly.
    val planes: Array[Array[Double]] = Array.tabulate(tables * bits) { k =>
      val j = lshPlaneId(k / bits, k % bits, lb, tables)
      Array.tabulate(64)(p => splitmixDouble(j * 64L + p))
    }
    base.select(col("vec_id"),
      posexplode(graft.plans.LshSigs.lsh_sigs(col("v"), planes, bits))
        .as(Seq("tbl", "sig")))
  }

  /** The hyperplanes as a DuckDB VALUES list — the ANN pipeline is fully
    * deterministic (fixed planes, sequential-fold dots on both engines), so
    * unlike the hash-family sketches it gets a complete SQL oracle.
    */
  private[graft] def planeRowsSql(bits: Int, tables: Int): String =
    (0 until bits * tables).map { j =>
      val comps =
        (0 until 64).map(i => splitmixDouble(j * 64L + i).toString).mkString(",")
      s"($j,[$comps])"
    }.mkString(",")

  /** The FULL (tbl, bit, plane) family up to MaxLshBits per table as a
    * DuckDB VALUES list, for oracles whose band width is computed from the
    * corpus size at query time (`scaledLshBits`): the oracle carries every
    * plane it could ever need and filters `bit < nb`. Ids follow the
    * `lshTableSigs(legacyBits)` mapping exactly, so the fixture-era planes
    * (bit < legacy) are byte-identical literals to `planeRowsSql`. */
  private[graft] def planeRowsSqlScaled(tables: Int, legacy: Int): String =
    (0 until tables).flatMap { t =>
      (0 until MaxLshBits).map { i =>
        val j = lshPlaneId(t, i, legacy, tables)
        val comps =
          (0 until 64).map(p => splitmixDouble(j * 64L + p).toString).mkString(",")
        s"($t,$i,[$comps])"
      }
    }.mkString(",")

  val oracles: Map[String, String] = Map(
    "sim_sparse_knn" ->
      """WITH terms AS (
        |  SELECT doc_id, h, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               list_reduce(
        |                 list_prepend(14695981039346656037::HUGEINT,
        |                   list_transform(string_split_regex(g, ''),
        |                                  c -> unicode(c)::HUGEINT)),
        |                 (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
        |                           % 18446744073709551616::HUGEINT) AS h
        |        FROM (SELECT doc_id,
        |                     unnest(list_transform(
        |                       list_zip(l[1:len(l)-1], l[2:len(l)]),
        |                       x -> x[1] || ' ' || x[2])) AS g
        |              FROM (SELECT doc_id, string_split(text, ' ') AS l
        |                    FROM documents
        |                    WHERE len(string_split(text, ' ')) >= 2)))
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |voc AS (
        |  SELECT h, ln(CAST(n_docs AS DOUBLE) / df) AS idf
        |  FROM (SELECT h, CAST(count(*) AS BIGINT) AS df
        |        FROM terms GROUP BY h), n
        |  WHERE df * 4 <= n_docs),
        |w AS (SELECT doc_id, terms.h, tf * idf AS wt
        |      FROM terms JOIN voc USING (h)),
        |norms AS (SELECT doc_id,
        |                 CAST(sum(CAST(round(wt * wt * 1e6) AS BIGINT))
        |                      AS BIGINT) AS nrm_micro
        |          FROM w GROUP BY doc_id),
        |qw AS (SELECT doc_id AS qid, h, wt AS qwt FROM w WHERE doc_id < 10),
        |dots AS (
        |  SELECT qid, w.doc_id,
        |         CAST(sum(CAST(round(wt * qwt * 1e6) AS BIGINT)) AS BIGINT)
        |           AS dot_micro
        |  FROM w JOIN qw USING (h) WHERE w.doc_id <> qid GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, d.doc_id,
        |         dot_micro / 1000000.0
        |           / (sqrt(nb.nrm_micro / 1000000.0)
        |              * sqrt(nq.nrm_micro / 1000000.0)) AS cos
        |  FROM dots d
        |  JOIN norms nb ON nb.doc_id = d.doc_id
        |  JOIN norms nq ON nq.doc_id = d.qid)
        |SELECT qid, doc_id, cos, rank FROM (
        |  SELECT qid, doc_id, cos,
        |         CAST(row_number() OVER (PARTITION BY qid
        |              ORDER BY cos DESC, doc_id) AS INT) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // same index-order fold: list_reduce's first-element init equals the
    // 0.0-init fold exactly (0.0 + d1 == d1), so dist is bit-identical
    "emb_pq_codes" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |subs AS (
        |  SELECT vec_id, j, list_slice(v, j * 8 + 1, j * 8 + 8) AS sv
        |  FROM e, (SELECT unnest(generate_series(0, 7)) AS j)),
        |cents AS (SELECT vec_id AS cid, j, sv AS cv FROM subs WHERE vec_id < 4),
        |assigned AS (
        |  SELECT s.vec_id, s.j, c.cid,
        |         list_reduce(
        |           list_transform(generate_series(1, 8),
        |             i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])),
        |           (a, b) -> a + b) AS dist
        |  FROM subs s JOIN cents c ON c.j = s.j)
        |SELECT vec_id, CAST(j AS INT) AS j, code, dist FROM (
        |  SELECT vec_id, j, cid AS code, dist,
        |         row_number() OVER (PARTITION BY vec_id, j
        |                            ORDER BY dist, cid) AS rn
        |  FROM assigned)
        |WHERE rn = 1 ORDER BY vec_id, j""".stripMargin,
    "sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |sims AS (
        |  SELECT qid, vec_id, list_cosine_similarity(v, qv) AS sim,
        |         CAST(row_number() OVER (PARTITION BY qid
        |              ORDER BY list_cosine_similarity(v, qv) DESC, vec_id) AS INT) AS rank
        |  FROM e JOIN q ON vec_id <> qid)
        |SELECT qid, vec_id, sim, rank FROM sims
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "sim_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |p(j, pl) AS (VALUES ${planeRowsSql(12, 1)}),
         |bits AS (
         |  SELECT e.vec_id, e.label,
         |         CASE WHEN list_dot_product(e.v, p.pl) > 0
         |              THEN CAST(1 AS BIGINT) << p.j ELSE 0 END AS b
         |  FROM e CROSS JOIN p),
         |sigs AS (SELECT vec_id, label, CAST(bit_or(b) AS BIGINT) AS sig
         |         FROM bits GROUP BY vec_id, label)
         |SELECT sig, count(*) AS n_vectors,
         |       count(DISTINCT label) AS n_labels
         |FROM sigs GROUP BY sig ORDER BY sig""".stripMargin,
    "sim_ann_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |p(j, pl) AS (VALUES ${planeRowsSql(3, 24)}),
         |bits AS (
         |  SELECT e.vec_id, p.j // 3 AS tbl,
         |         CASE WHEN list_dot_product(e.v, p.pl) > 0
         |              THEN 1 << (p.j % 3) ELSE 0 END AS b
         |  FROM e CROSS JOIN p),
         |sigs AS (SELECT vec_id, tbl, CAST(bit_or(b) AS INT) AS sig
         |         FROM bits GROUP BY vec_id, tbl),
         |qs AS (SELECT vec_id AS qid, tbl, sig FROM sigs WHERE vec_id < 10),
         |cand AS (SELECT DISTINCT q.qid, s.vec_id
         |         FROM sigs s
         |         JOIN qs q ON s.tbl = q.tbl AND s.sig = q.sig
         |                   AND s.vec_id <> q.qid),
         |sims AS (SELECT c.qid, c.vec_id,
         |                list_cosine_similarity(ev.v, eq.v) AS sim
         |         FROM cand c
         |         JOIN e ev ON c.vec_id = ev.vec_id
         |         JOIN e eq ON c.qid = eq.vec_id),
         |ranked AS (SELECT qid, vec_id, sim,
         |                  CAST(row_number() OVER (PARTITION BY qid
         |                       ORDER BY sim DESC, vec_id) AS INT) AS rank
         |           FROM sims)
         |SELECT qid, vec_id, sim, rank FROM ranked
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "sim_ivf_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |asg AS (SELECT e.vec_id,
        |               (SELECT c.cid FROM cents c
        |                ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid
        |                LIMIT 1) AS cell
        |        FROM e),
        |qp AS (SELECT q.vec_id AS qid, c.cid AS cell,
        |              row_number() OVER (PARTITION BY q.vec_id
        |                ORDER BY list_cosine_similarity(q.v, c.cv) DESC, c.cid) AS rnk
        |       FROM e q CROSS JOIN cents c WHERE q.vec_id < 10),
        |probes AS (SELECT qid, cell FROM qp WHERE rnk <= 4),
        |cand AS (SELECT DISTINCT p.qid, a.vec_id
        |         FROM asg a JOIN probes p ON a.cell = p.cell
        |                                 AND a.vec_id <> p.qid),
        |sims AS (SELECT c.qid, c.vec_id,
        |                list_cosine_similarity(ev.v, eq.v) AS sim
        |         FROM cand c
        |         JOIN e ev ON c.vec_id = ev.vec_id
        |         JOIN e eq ON c.qid = eq.vec_id),
        |ranked AS (SELECT qid, vec_id, sim,
        |                  CAST(row_number() OVER (PARTITION BY qid
        |                       ORDER BY sim DESC, vec_id) AS INT) AS rank
        |           FROM sims)
        |SELECT qid, vec_id, sim, rank FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "emb_norm_stats" ->
      """SELECT label, count(*) AS cnt,
        |       round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                              x -> x * x)))), 6) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  )
}
