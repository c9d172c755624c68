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

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Brute-force cosine top-k: 10 query vectors (vec_id < 10) against the
    * full corpus, k=5 neighbors each, ranked (sim DESC, vec_id) for
    * determinism. Norms computed once per side before the join.
    */
  def cosineTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val base = vecs(s, d)
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val joined = base.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim",
        graft.plans.CosineSimilarity.cosine_sim(col("v"), col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    joined
      .select(col("qid"), col("vec_id"), col("sim"), row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** Deterministic pseudo-random doubles in [-1, 1) via splitmix64 — plane
    * components are fixed at plan-build time and become array literals, so
    * per-row work is just `bits` dot products.
    */
  private def splitmixDouble(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Random-hyperplane LSH bucketing: 12-bit signatures from deterministic
    * pseudo-random planes — candidate generation for ANN in O(n). Emits
    * bucket occupancy (signature, count, distinct labels); hash-specific →
    * rows-only driver check.
    */
  def annLshBuckets(s: SparkSession, d: String, bits: Int = 12): DataFrame = {
    val plane: (Int) => Column = j =>
      array((0 until 64).map(i => lit(splitmixDouble(j * 64L + i))): _*)
    val sig = (0 until bits).map(j =>
      when(dot(col("v"), plane(j)) > 0, shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ + _)
    vecs(s, d)
      .withColumn("sig", sig)
      .groupBy("sig")
      .agg(count(lit(1)).as("n_vectors"), countDistinct(col("label")).as("n_labels"))
      .orderBy("sig")
  }

  /** Embedding statistics per label: count + average L2 norm. */
  def normStats(s: SparkSession, d: String): DataFrame =
    vecs(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"), round(avg(l2norm(col("v"))), 6).as("avg_norm"))
      .orderBy("label")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> (cosineTopK(_, _)),
    "sim_ann_lsh" -> (annLshBuckets(_, _)),
    "emb_norm_stats" -> (normStats(_, _))
  )

  val oracles: Map[String, String] = Map(
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
    "emb_norm_stats" ->
      """SELECT label, count(*) AS cnt,
        |       round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                              x -> x * x)))), 6) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  )
}
