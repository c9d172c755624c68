package graft

import graft.queries.{CorpusQueries, EventQueries, MatchQueries, MlQueries}
import org.apache.spark.sql.functions._

/** Invariant tests for the fifteenth batch: golden-record consolidation,
  * PMI co-occurrence, time-weighted average, item-item recommendations.
  */
class ConsensusOpsSpec extends SparkSpec {

  test("golden record: majority vote always recovers the clean fields") {
    val golden = MatchQueries.goldenRecord(spark, sf)
    val part = spark.read.parquet(s"$sf/part.parquet")
      .withColumn("price_s",
        round(col("p_retailprice") * 100).cast("long").cast("string"))
    val joined = golden.join(part, "p_partkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("name_g") === r.getAs[String]("p_name"),
        "clean name appears 2/3 times and must win the vote")
      assert(r.getAs[String]("brand_g") === r.getAs[String]("p_brand"))
      assert(r.getAs[String]("price_g") === r.getAs[String]("price_s"),
        "the +1 price outlier must lose 2:1")
      assert(r.getAs[String]("size_g") === r.getAs[Long]("p_size").toString)
    }
  }

  test("pmi: descending scores, cooc bounded by document frequencies") {
    val rows = CorpusQueries.cooccurrencePmi(spark, sf).collect()
    assert(rows.length === 20)
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("cooc") <=
        math.min(r.getAs[Long]("df_a"), r.getAs[Long]("df_b")))
      assert(r.getAs[String]("w_a") < r.getAs[String]("w_b"))
    }
  }

  test("twap: lies within the per-type value range") {
    val rows = EventQueries.timeWeightedAvg(spark, sf).collect()
    assert(rows.nonEmpty)
    val ranges = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    rows.foreach { r =>
      val (lo, hi) = ranges(r.getAs[String]("event_type"))
      val t = r.getAs[Double]("twap")
      assert(t >= lo - 0.01 && t <= hi + 0.01,
        s"TWAP $t outside [$lo, $hi] for ${r.getAs[String]("event_type")}")
      assert(r.getAs[Long]("sum_dt_us") > 0)
    }
  }

  test("item recs: contiguous ranks, cooc bounded, scores in (0,1]") {
    val rows = MlQueries.itemRecs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("item")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq === (1 to ranks.length))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("cooc") <=
        math.min(r.getAs[Long]("n_item"), r.getAs[Long]("n_rec")))
      val s = r.getAs[Double]("score")
      assert(s > 0 && s <= 1.0 + 1e-9)
    }
  }
}
