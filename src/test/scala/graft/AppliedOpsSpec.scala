package graft

import graft.queries.{EventQueries, MlQueries2, PipelineQueries, RelationalQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Invariant tests for the eleventh-batch operators (BPE merge apply, GBDT
  * residual round, DECIMAL money surface, gate-ablation waterfall, hourly
  * seasonal decomposition) — properties that must hold on ANY input.
  */
class AppliedOpsSpec extends SparkSpec {

  test("bpe apply: merged pair never survives, rule is constant") {
    val rows = TextQueries.bpeApplyMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    val rules = rows.map(_.getAs[String]("merge_rule")).distinct
    assert(rules.length === 1)
    assert(!rules.head.contains("@"))
    rows.foreach { r =>
      assert(r.getAs[String]("pair") !== rules.head,
        "applying the merge must eliminate every occurrence of the merged pair")
      assert(r.getAs[Long]("pair_count") > 0)
    }
  }

  test("gbdt residual round: partition sizes reconcile, best split is the max") {
    val rows = MlQueries2.gbdtResidualStep(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = rows.map(r => r.getAs[Long]("n_left") + r.getAs[Long]("n_right")).distinct
    assert(totals.length === 1, "every threshold splits the same population")
    val maxScore = rows.map(_.getAs[Double]("score")).max
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_best") === (r.getAs[Double]("score") == maxScore))
      assert(r.getAs[Long]("sum_left_rc") + r.getAs[Long]("sum_right_rc") ===
        rows.head.getAs[Long]("sum_left_rc") + rows.head.getAs[Long]("sum_right_rc"))
    }
  }

  test("decimal money: revenue bounded by price, counts reconcile, all-BIGINT schema") {
    val df = RelationalQueries.decimalMoney(spark, sf)
    // No-DECIMAL-output rule (r4/r5/r6 driver evidence): every non-key
    // output column must be a scalar LongType.
    df.schema.fields.filterNot(f => f.name.startsWith("l_")).foreach { f =>
      assert(f.dataType === org.apache.spark.sql.types.LongType,
        s"${f.name} must be BIGINT, got ${f.dataType}")
    }
    val rows = df.collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(rows.map(_.getAs[Long]("n")).sum === li.count())
    rows.foreach { r =>
      // revenue_e4 is 1e-4 units, price_cents is 1e-2 units: compare in 1e-4.
      assert(r.getAs[Long]("sum_revenue_e4") <= r.getAs[Long]("sum_price_cents") * 100L)
      assert(r.getAs[Long]("min_revenue_e4") <= r.getAs[Long]("max_revenue_e4"))
    }
  }

  test("gate ablation: waterfall chain r_i = r_{i-1} - fail_marginal_i") {
    val rows = PipelineQueries.gateAblation(spark, sf).collect()
      .sortBy(_.getAs[Long]("step"))
    assert(rows.length === 4)
    val total = rows.head.getAs[Long]("total_docs")
    var prev = total
    rows.foreach { r =>
      val (fm, rem) = (r.getAs[Long]("fail_marginal"), r.getAs[Long]("remaining"))
      assert(rem === prev - fm, s"step ${r.getAs[Long]("step")} chain broken")
      assert(fm <= r.getAs[Long]("fail_alone"),
        "marginal failures are a subset of standalone failures")
      prev = rem
    }
  }

  test("seasonal decomposition: 24 hours, weighted seasonal indexes cancel") {
    val rows = EventQueries.seasonalHourly(spark, sf).collect()
    assert(rows.length === 24)
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n === spark.read.parquet(s"$sf/events.parquet").count())
    val weighted = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("seasonal_idx")).sum
    assert(math.abs(weighted) < n * 1e-5,
      "n-weighted seasonal indexes must sum to ~0")
  }
}
