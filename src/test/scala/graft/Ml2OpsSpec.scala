package graft

import graft.queries.MlQueries2
import org.apache.spark.sql.functions._

/** Semantic invariants for the batch-two ML operators (MlQueries2) —
  * properties of the MATH, beyond the oracle's engine parity: the
  * gradient step must descend the loss, Naive Bayes must emit one
  * in-domain prediction per document, and hashed features must conserve
  * token mass.
  */
class Ml2OpsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("ml_logreg_step strictly decreases the mean log-loss") {
    val r = MlQueries2.logregStep(spark, sf01).head()
    val (n, w0n, w1n, w2n, loss0) = (r.getAs[Long]("n"), r.getAs[Double]("w0_new"),
      r.getAs[Double]("w1_new"), r.getAs[Double]("w2_new"),
      r.getAs[Long]("loss_micro"))
    def meanLoss(w0: Double, w1: Double, w2: Double): Double = {
      val z = lit(w0) + lit(w1) * col("l_discount") + lit(w2) * col("l_tax")
      val p = lit(1.0d) / (lit(1.0d) + exp(-z))
      val y = when(col("l_returnflag") === "R", 1.0d).otherwise(0.0d)
      Tables.lineitem(spark, sf01)
        .agg(avg(-(y * log(p) + (lit(1.0d) - y) * log(lit(1.0d) - p))))
        .head().getDouble(0)
    }
    val before = loss0.toDouble / 1e6 / n
    val after = meanLoss(w0n, w1n, w2n)
    assert(after < before,
      s"gradient step did not descend: before=$before after=$after")
  }

  test("ml_naive_bayes: one in-domain prediction per document") {
    val docs = Tables.documents(spark, sf01)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val preds = MlQueries2.naiveBayes(spark, sf01).collect()
    assert(preds.length == docs.count())
    assert(preds.map(_.getAs[Long]("doc_id")).distinct.length == preds.length)
    assert(preds.forall(r => langs.contains(r.getAs[String]("pred"))),
      "prediction outside the training label domain")
  }

  test("ml_feature_hash conserves token mass per doc (|Σw| ≤ Σ|w| ≤ n_tokens)") {
    val fh = MlQueries2.featureHash(spark, sf01)
      .groupBy("doc_id")
      .agg(sum(abs(col("weight"))).as("mass"), sum("weight").as("net"))
    val toks = Tables.documents(spark, sf01).filter(col("doc_id") < 50)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).as("n_toks"))
    val bad = fh.join(toks, "doc_id")
      .filter(col("mass") > col("n_toks") ||
        abs(col("net")) > col("mass"))
      .count()
    assert(bad == 0, "hashed feature mass exceeds token count")
  }
}
