package graft.queries

import graft.Tables
import graft.functions.TextFunctions.spaceTokens
import graft.plans.{CosineSimilarity, Fnv1a64}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ML primitives as relational plans: one spherical k-means
  * Lloyd step, closed-form OLS regression, and a deterministic count-min
  * sketch. The point at 100 TB: each is a constant number of scans +
  * hash-aggregates (no driver-side math beyond literals), so they
  * parallelize exactly like any other aggregate — the "ML on the
  * warehouse" pattern, not a separate compute system.
  */
object MlQueries {

  /** One spherical k-means Lloyd step over the embeddings: k=8 centroids
    * initialized from vec_id < 8, cosine assignment (argmax, tie → lower
    * centroid id) via the native fused [[CosineSimilarity]] expression,
    * then per-dimension mean recompute. Output is the flattened
    * (cluster, dim) centroid matrix with cluster sizes — scalar columns,
    * never array cells (the driver's hash can't see inside arrays).
    *
    * Scale: centroids are k rows → broadcast; assignment is one streamed
    * scan of the corpus; recompute is one hash-agg on (cluster, dim) —
    * k×dim cells. Iterating = re-running this plan with the previous
    * output as the centroid literal set (cf. graph_components for the
    * loop-with-truncation idiom).
    */
  def kmeansStep(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val cents = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    lloydAssign(base, cents)
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cid").as("cluster_id"), col("dim"))
      .agg(round(avg("x"), 6).as("c_val"), count(lit(1)).as("n"))
      .select(col("cluster_id"), (col("dim") + 1).cast("long").as("dim"),
        col("c_val"), col("n"))
      .orderBy("cluster_id", "dim")
  }

  /** One cosine-argmax assignment pass: corpus streamed against a
    * broadcast centroid set, rank-1 per vector (tie → lower cid). */
  private def lloydAssign(base: DataFrame, cents: DataFrame): DataFrame = {
    val best = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    base.crossJoin(broadcast(cents))
      .withColumn("sim", CosineSimilarity.cosine_sim(col("v"), col("cv")))
      .withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("v"))
  }

  /** Centroid recompute with 6dp quantization — the rounding is the
    * cross-engine determinism contract BETWEEN iterations (both engines
    * re-assign against identical quantized centroids), and incidentally
    * the "centroids in fp32-ish precision" production shape. */
  private def lloydRecompute(assign: DataFrame): DataFrame =
    assign.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cid", "pos").agg(round(avg("x"), 6).as("c"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        p => p.getField("c")).as("cv"))

  /** TWO full Lloyd iterations (assign → recompute → re-assign →
    * recompute), the iterative-ML loop as repeated broadcast-join plans:
    * each round is one streamed corpus scan + one (k×dim)-cell hash agg;
    * the centroid set never exceeds k rows, so NOTHING corpus-sized ever
    * shuffles, and the loop carries no growing lineage (the per-round
    * aggregate output is k rows — contrast graph_components, where the
    * carried state is vertex-sized and needs checkpoint truncation).
    * Oracle = the same two rounds unrolled as DuckDB CTEs (the
    * graph_pagerank pattern).
    */
  def kmeansIter(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val c0 = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val c1 = lloydRecompute(lloydAssign(base, c0))
    val a2 = lloydAssign(base, c1)
    val c2 = lloydRecompute(a2)
    val sizes = a2.groupBy("cid").agg(count(lit(1)).as("n"))
    c2.select(col("cid"), posexplode(col("cv")).as(Seq("pos", "c_val")))
      .join(broadcast(sizes), "cid")
      .select(col("cid").as("cluster_id"), (col("pos") + 1).cast("long").as("dim"),
        col("c_val"), col("n"))
      .orderBy("cluster_id", "dim")
  }

  /** Closed-form simple linear regression (l_quantity → l_extendedprice):
    * the five power sums accumulate as DECIMAL (exact, order-independent —
    * the distributed-float-sum trap does not exist in decimal), then the
    * slope/intercept/R² arithmetic runs in doubles with IDENTICAL
    * parenthesization on both engines, so even >2^53 cross-products stay
    * bit-equal. The one-pass, shuffle-free regression at any scale.
    */
  def linregOls(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_quantity").cast("decimal(18,2)").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sx2"),
        sum(col("y") * col("y")).cast("double").as("sy2"))
      .select(col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sx2") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sx2") - col("sx") * col("sx")) * col("sx")) / col("n"),
          6).as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sx2") - col("sx") * col("sx")) *
            (col("n") * col("sy2") - col("sy") * col("sy"))), 6).as("r2"))

  /** Deterministic count-min sketch from relational ops: d=4 hash rows
    * (FNV over `token|seed`), w=64 columns, counts per cell, probe
    * estimate = min over the 4 cells — shown against the exact counts for
    * the 20 most frequent tokens. Because hashing is the shared FNV
    * expression, DuckDB re-derives the ENTIRE sketch cell-by-cell: a
    * fully-oracled sketch, unlike the opaque binary `count_min_sketch`
    * builtin. est ≥ exact always (collisions only ever inflate).
    *
    * Scale: the sketch is d×w = 256 cells regardless of corpus size —
    * the fixed-memory frequency summary to gossip/broadcast, where exact
    * counts need a vocabulary-sized shuffle.
    */
  def countMin(s: SparkSession, d: String, w: Int = 64): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(spaceTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val seeds = array((0 until 4).map(lit): _*)
    val sketch = toks
      .select(col("tok"), explode(seeds).as("r"))
      .withColumn("cell",
        Fnv1a64.ihash31(concat(col("tok"), lit("|"), col("r").cast("string"))) % w)
      .groupBy("r", "cell").agg(count(lit(1)).as("cnt"))
    val probes = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("tok")).limit(20)
    probes
      .select(col("tok"), col("exact"), explode(seeds).as("r"))
      .withColumn("cell",
        Fnv1a64.ihash31(concat(col("tok"), lit("|"), col("r").cast("string"))) % w)
      .join(sketch, Seq("r", "cell"))
      .groupBy(col("tok").as("token"), col("exact"))
      .agg(min("cnt").as("est"))
      .orderBy("token")
  }

  /** Item-item collaborative-filtering recommendations over implicit
    * basket feedback: items = parts, "users" = orders, similarity =
    * binary cosine cooc/√(n_a·n_b). Co-occurrence pairs generate from
    * per-order sorted distinct item lists via BucketPairs (fan-out
    * bounded by basket size², never an item×item or order×order join);
    * per-item top-5 comes from one window over the symmetrized pair
    * table. The floor of 2 shared baskets mirrors production min-support
    * pruning. Cosines divide exact integers (√ is IEEE-exact), rounded
    * at 6dp AFTER ranking on the raw value with an id tie-break.
    */
  def itemRecs(s: SparkSession, d: String, minCooc: Long = 2, k: Int = 5): DataFrame = {
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .distinct()
    val itemCnt = baskets.groupBy("item").agg(count(lit(1)).as("n"))
    val lists = baskets.groupBy("okey")
      .agg(sort_array(collect_set(col("item"))).as("items"))
    val cooc = BucketPairs.pairs(lists, "items", "ia", "ib")
      .groupBy("ia", "ib").agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCooc)
    val sym = cooc.select(col("ia").as("item"), col("ib").as("rec"), col("cooc"))
      .union(cooc.select(col("ib").as("item"), col("ia").as("rec"), col("cooc")))
    val w = Window.partitionBy("item").orderBy(col("score").desc, col("rec"))
    sym
      .join(itemCnt.select(col("item"), col("n").as("n_item")), "item")
      .join(itemCnt.select(col("item").as("rec"), col("n").as("n_rec")), "rec")
      .withColumn("score",
        col("cooc") / (sqrt(col("n_item").cast("double")) * sqrt(col("n_rec").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("rec"), col("cooc"), col("n_item"), col("n_rec"),
        round(col("score"), 6).as("score"), col("rank"))
      .orderBy("item", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_item_recs" -> (itemRecs(_, _)),
    "ml_kmeans_step" -> (kmeansStep(_, _)),
    "ml_kmeans_iter" -> (kmeansIter(_, _)),
    "ml_linreg_ols" -> (linregOls(_, _)),
    "sketch_countmin" -> (countMin(_, _))
  )

  import OracleSql.fnvIhash31

  val oracles: Map[String, String] = Map(
    "ml_item_recs" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item
        |  FROM lineitem),
        |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n
        |       FROM baskets GROUP BY item),
        |cooc AS (
        |  SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS cooc
        |  FROM baskets a JOIN baskets b
        |    ON a.okey = b.okey AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (
        |  SELECT ia AS item, ib AS rec, cooc FROM cooc
        |  UNION ALL SELECT ib, ia, cooc FROM cooc),
        |scored AS (
        |  SELECT s.item, s.rec, s.cooc, ni.n AS n_item, nr.n AS n_rec,
        |         s.cooc / (sqrt(CAST(ni.n AS DOUBLE))
        |                   * sqrt(CAST(nr.n AS DOUBLE))) AS score
        |  FROM sym s
        |  JOIN ic ni ON ni.item = s.item
        |  JOIN ic nr ON nr.item = s.rec)
        |SELECT item, rec, cooc, n_item, n_rec, round(score, 6) AS score, rank
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY item
        |                     ORDER BY score DESC, rec) AS INT) AS rank
        |      FROM scored)
        |WHERE rank <= 5 ORDER BY item, rank""".stripMargin,
    "ml_kmeans_step" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |sims AS (
        |  SELECT e.vec_id, c.cid, e.v,
        |         list_cosine_similarity(e.v, c.cv) AS sim
        |  FROM e, c),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY sim DESC, cid) AS rn
        |  FROM sims),
        |ex AS (
        |  SELECT cid, unnest(generate_series(1, len(v))) AS dim, unnest(v) AS x
        |  FROM best WHERE rn = 1)
        |SELECT CAST(cid AS BIGINT) AS cluster_id, CAST(dim AS BIGINT) AS dim,
        |       round(avg(x), 6) AS c_val, CAST(count(*) AS BIGINT) AS n
        |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ml_kmeans_iter" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |a1 AS (
        |  SELECT vec_id, cid, v FROM (
        |    SELECT e.vec_id, c0.cid, e.v,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c0.cv) DESC, c0.cid) AS rn
        |    FROM e, c0) WHERE rn = 1),
        |c1 AS (
        |  SELECT cid, list(c ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, round(avg(x), 6) AS c FROM (
        |      SELECT cid, unnest(generate_series(1, len(v))) AS pos,
        |             unnest(v) AS x FROM a1) GROUP BY cid, pos)
        |  GROUP BY cid),
        |a2 AS (
        |  SELECT vec_id, cid, v FROM (
        |    SELECT e.vec_id, c1.cid, e.v,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c1.cv) DESC, c1.cid) AS rn
        |    FROM e, c1) WHERE rn = 1),
        |c2 AS (
        |  SELECT cid, list(c ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, round(avg(x), 6) AS c FROM (
        |      SELECT cid, unnest(generate_series(1, len(v))) AS pos,
        |             unnest(v) AS x FROM a2) GROUP BY cid, pos)
        |  GROUP BY cid),
        |sizes AS (SELECT cid, count(*) AS n FROM a2 GROUP BY cid)
        |SELECT CAST(f.cid AS BIGINT) AS cluster_id, CAST(f.dim AS BIGINT) AS dim,
        |       f.x AS c_val, CAST(sizes.n AS BIGINT) AS n
        |FROM (SELECT cid, unnest(generate_series(1, len(cv))) AS dim,
        |             unnest(cv) AS x FROM c2) f
        |JOIN sizes USING (cid)
        |ORDER BY cluster_id, dim""".stripMargin,
    "ml_linreg_ols" ->
      """WITH s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sx,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sy,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sxy,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sx2,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sy2
        |  FROM lineitem)
        |SELECT n,
        |       round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
        |       round((sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx) / n,
        |             6) AS intercept,
        |       round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |             ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,
    "sketch_countmin" ->
      s"""WITH toks AS (
         |  SELECT t AS tok FROM (
         |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
         |  WHERE t <> ''),
         |hashed AS (
         |  SELECT tok, r,
         |         CAST(${fnvIhash31("tok || '|' || CAST(r AS VARCHAR)")} % 64
         |              AS BIGINT) AS cell
         |  FROM toks, (SELECT unnest(generate_series(0, 3)) AS r)),
         |sketch AS (
         |  SELECT r, cell, count(*) AS cnt FROM hashed GROUP BY r, cell),
         |probes AS (
         |  SELECT tok, count(*) AS exact FROM toks GROUP BY tok
         |  ORDER BY exact DESC, tok LIMIT 20),
         |pcells AS (
         |  SELECT p.tok, p.exact, r,
         |         CAST(${fnvIhash31("p.tok || '|' || CAST(r AS VARCHAR)")} % 64
         |              AS BIGINT) AS cell
         |  FROM probes p, (SELECT unnest(generate_series(0, 3)) AS r))
         |SELECT p.tok AS token, CAST(p.exact AS BIGINT) AS exact,
         |       CAST(min(s.cnt) AS BIGINT) AS est
         |FROM pcells p JOIN sketch s USING (r, cell)
         |GROUP BY p.tok, p.exact ORDER BY token""".stripMargin
  )
}
