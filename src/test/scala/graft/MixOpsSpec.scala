package graft

import graft.queries.MixQueries
import org.apache.spark.sql.functions._

/** Invariant tests for the training-mixture + embedding-analytics
  * operators (MixQueries). */
class MixOpsSpec extends SparkSpec {

  test("split partitions every doc once, near the 80/10/10 design (2 SFs)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val out = MixQueries.split(spark, dir).collect()
      val total = out.map(_.getAs[Long]("n_docs")).sum
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      assert(total == nDocs, s"$dir: split covers $total of $nDocs docs")
      val bySplit = out.groupBy(_.getAs[String]("split"))
        .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
      assert(bySplit.keySet == Set("train", "val", "test"))
      val trainFrac = bySplit("train").toDouble / nDocs
      assert(trainFrac > 0.7 && trainFrac < 0.9,
        s"$dir: train fraction $trainFrac far from 0.8")
    }
  }

  test("split assignment is content-hash stable across partitionings") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = MixQueries.splitOf(docs.coalesce(1)).collect().toSeq
    val b = MixQueries.splitOf(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("shard-shuffle assignment is layout-independent and positions are dense") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = MixQueries.shardShuffleOf(docs.coalesce(1)).collect().toSeq
    val b = MixQueries.shardShuffleOf(docs.repartition(13)).collect().toSeq
    assert(a == b, "(shard, pos) assignment must be a pure function of doc_id")
    // positions within each shard are exactly 0..n-1 (a permutation, no
    // holes — the contract a data loader indexes by)
    a.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rows) =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps == (0L until ps.length.toLong), s"shard $sh positions not dense")
    }
    // every doc appears exactly once
    assert(a.map(_.getAs[Long]("doc_id")).distinct.size == docs.count())
  }

  test("mixture rates are valid probabilities and never oversample") {
    val rows = MixQueries.mixture(spark, sf).collect()
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("exp_tokens") <= r.getAs[Long]("tokens_src") + 1e-6)
    }
    // the budget is half the corpus, so the planned mixture must not exceed it
    val planned = rows.map(_.getAs[Double]("exp_tokens")).sum
    val totalTok = rows.map(_.getAs[Long]("tokens_src")).sum
    assert(planned <= totalTok / 2.0 + rows.length) // +rounding slack
  }

  test("centroids cover every label; cohesion and norm are consistent") {
    val rows = MixQueries.centroids(spark, sf).collect()
    val nLabels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label").distinct().count()
    assert(rows.length == nLabels)
    val nTotal = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nTotal)
    rows.foreach { r =>
      assert(r.getAs[Double]("centroid_norm") > 0.0)
      val coh = r.getAs[Double]("cohesion")
      assert(coh >= -1.0 - 1e-9 && coh <= 1.0 + 1e-9)
    }
  }

  test("knn votes are bounded by k and predictions come from real labels") {
    val rows = MixQueries.knnClassify(spark, sf).collect()
    assert(rows.length == 20)
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    rows.foreach { r =>
      val v = r.getAs[Long]("votes")
      assert(v >= 1L && v <= 5L)
      assert(labels.contains(r.getAs[Int]("pred_label")))
    }
  }
}
