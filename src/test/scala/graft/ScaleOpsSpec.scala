package graft

import graft.queries.ScaleQueries
import org.apache.spark.sql.functions._

/** Invariant tests for the data-layout + incremental-maintenance operators
  * (ScaleQueries) — properties that must hold on ANY input, complementing
  * the per-fixture DuckDB oracles.
  */
class ScaleOpsSpec extends SparkSpec {

  test("compaction bins never exceed target + one file, and are contiguous") {
    val target = 4096L
    val plan = ScaleQueries.compactionPlan(spark, sf, target).collect()
    val maxFile = spark.read.parquet(s"$sf/documents.parquet")
      .agg(max("n_chars")).head.getLong(0)
    plan.foreach { r =>
      val bytes = r.getAs[Long]("bin_bytes")
      assert(bytes <= target + maxFile,
        s"bin ${r.getAs[Long]("bin")} of ${r.getAs[String]("source")} holds $bytes bytes")
    }
    // bins per source are 0..n-1 with no holes (sequential packing)
    plan.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted.toSeq
      assert(bins == (0L until bins.length.toLong).toSeq,
        s"$src bins not contiguous: ${bins.mkString(",")}")
    }
  }

  test("z-order buckets cover small rectangles on BOTH dimensions") {
    val rows = ScaleQueries.zorderStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // bucket = top 6 of 16 interleaved bits → low 5 bits of each dim free
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 31)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 31)
    }
  }

  test("sort-clustered layout prunes at least as well as natural layout") {
    val rows = ScaleQueries.pruningStats(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("scan_sorted") <= r.getAs[Long]("scan_natural"))
    }
    // and strictly better somewhere, else the demonstration shows nothing
    assert(rows.exists(r =>
      r.getAs[Long]("scan_sorted") < r.getAs[Long]("scan_natural")))
  }

  test("SCD2 output: exactly one current row per key, intervals chain (2 SFs)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val out = ScaleQueries.scd2Merge(spark, dir)
      val perKey = out.groupBy("custkey")
        .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"),
          count(lit(1)).as("n_rows"))
        .collect()
      perKey.foreach { r =>
        assert(r.getAs[Long]("n_cur") == 1L,
          s"$dir custkey ${r.get(0)}: ${r.getAs[Long]("n_cur")} current rows")
      }
      // closed rows' valid_to equals the opened row's valid_from
      val chained = out.filter(!col("is_current"))
        .select(col("custkey"), col("valid_to"))
        .join(out.filter(col("is_current") && col("valid_from") > "1990-01-01")
          .select(col("custkey"), col("valid_from")), Seq("custkey"))
        .filter(col("valid_to") =!= col("valid_from"))
      assert(chained.count() == 0L, dir)
    }
  }

  test("q_median_2pass: pass 2 sorts only a small bucket, never the corpus") {
    val (n, stats) = graft.queries.AdvancedQueries.median2passStats(spark, sf)
    assert(stats.nonEmpty)
    stats.foreach { case (k, b, rows, _) =>
      assert(rows < n / 10,
        s"rank-$k bucket $b holds $rows of $n rows — selection not selective")
    }
  }

  test("q_incremental_agg: the base/delta split is non-vacuous on the fixture") {
    // the oracle proves merge ≡ recompute, but that equality is trivially
    // true if the 1-day cutoff put everything on one side — the MERGE is
    // only exercised when both partial relations contribute rows
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val cut = ev.agg((max(col("ts")).cast("long") - 86400L).as("c"))
      .collect()(0).getLong(0)
    val base = ev.filter(col("ts").cast("long") < cut).count()
    val delta = ev.filter(col("ts").cast("long") >= cut).count()
    assert(base > 0 && delta > 0,
      s"degenerate split: base=$base delta=$delta — merge untested")
    assert(base + delta == ev.count())
  }

  test("merge upsert labels every row correctly and keeps keys unique") {
    val out = ScaleQueries.mergeUpsert(spark, sf)
    assert(out.groupBy("custkey").count().filter(col("count") > 1).count() == 0L)
    // every inserted key is one the target filter excluded
    assert(out.filter(col("op") === "insert" && col("custkey") % 3 =!= 0)
      .count() == 0L)
    assert(out.filter(col("op") === "update").count() > 0L)
  }

  test("interpolation fills every slot and stays within neighbor bounds") {
    val rows = ScaleQueries.interpolate(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(2)))
    // linear fill between neighbors lies within [min(pv,nv), max(pv,nv)]
    val bySeries = rows.groupBy(_.getString(0))
    bySeries.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(3).foreach {
        case Array(a, g, b) if g.getBoolean(3) && !a.getBoolean(3) && !b.getBoolean(3) =>
          val (lo, hi) = (math.min(a.getDouble(2), b.getDouble(2)),
            math.max(a.getDouble(2), b.getDouble(2)))
          assert(g.getDouble(2) >= lo - 1e-9 && g.getDouble(2) <= hi + 1e-9)
        case _ =>
      }
    }
  }
}
