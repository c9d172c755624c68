package graft

import graft.queries.{AdvancedQueries, MixQueries, PipelineQueries}
import org.apache.spark.sql.functions._

/** Invariant tests for the nineteenth batch: SQL pipe syntax,
  * parameterized SQL, P/R/F1 metrics, cluster-size histogram, shard
  * manifest.
  */
class ManifestOpsSpec extends SparkSpec {

  test("sql pipe reaches the same result as the DataFrame restatement") {
    val pipe = AdvancedQueries.sqlPipe(spark, sf).collect()
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") >= 30)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"))
      .orderBy("l_returnflag").collect()
    assert(pipe.map(_.toSeq).toSeq === df.map(_.toSeq).toSeq)
  }

  test("parameterized sql binds named parameters") {
    val rows = AdvancedQueries.sqlParams(spark, sf).collect()
    assert(rows.nonEmpty)
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") >= 25 && col("l_returnflag") === "R").count()
    assert(rows.map(_.getAs[Long]("cnt")).sum === expected)
  }

  test("prf: tp bounded by both marginals, recall consistent with support") {
    val rows = MixQueries.evalPrf(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (tp, sup, pt) = (r.getAs[Long]("tp"), r.getAs[Long]("support"),
        r.getAs[Long]("pred_total"))
      assert(tp <= sup && tp <= pt.max(tp))
      val recall = r.getAs[Double]("recall")
      assert(math.abs(recall - tp.toDouble / sup) < 1e-6)
      if (pt > 0) {
        assert(math.abs(r.getAs[Double]("precision") - tp.toDouble / pt) < 1e-6)
      }
    }
  }

  test("cluster sizes: all clusters >= 2 docs, totals reconcile with labels") {
    val rows = PipelineQueries.clusterSizes(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("cluster_size") >= 2,
      "the pair graph only contains docs with at least one partner"))
    val docsCovered = rows.map(_.getAs[Long]("n_docs")).sum
    assert(docsCovered === PipelineQueries.dedupClusters(spark, sf).count())
  }

  test("shard manifest: shards partition the corpus, checksums non-trivial") {
    val rows = MixQueries.shardManifest(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(rows.map(_.getAs[Long]("xor_fp")).distinct.length > 1,
      "distinct content must yield distinct shard fingerprints")
  }
}
