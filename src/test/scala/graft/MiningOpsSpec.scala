package graft

import graft.queries.{GraphQueries, MiningQueries}
import org.apache.spark.sql.functions._

/** Invariant tests for the pattern-mining + robust-stats batch
  * (MiningQueries) — properties that must hold on ANY input, complementing
  * the per-fixture DuckDB oracles.
  */
class MiningOpsSpec extends SparkSpec {

  test("market basket: lift/confidence/support are mutually consistent") {
    val rows = MiningQueries.marketBasket(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pair, na, nb, n) = (r.getAs[Long]("pair_cnt"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_orders"))
      assert(pair <= math.min(na, nb), "pair count bounded by item counts")
      assert(math.abs(r.getAs[Double]("support") - pair.toDouble / n) < 1e-6)
      assert(math.abs(r.getAs[Double]("confidence") - pair.toDouble / na) < 1e-6)
      assert(math.abs(r.getAs[Double]("lift") -
        pair.toDouble * n / (na.toDouble * nb)) < 1e-6)
      // support ≤ confidence always (n ≥ n_a)
      assert(r.getAs[Double]("support") <= r.getAs[Double]("confidence") + 1e-9)
    }
  }

  test("label propagation: labels never cross connected-component boundaries") {
    val lp = MiningQueries.labelPropagation(spark, sf)
      .select(col("vtx"), col("lbl"))
    val cc = GraphQueries.connectedComponents(spark, sf)
      .select(col("vtx"), col("comp"))
    val crossers = lp
      .join(cc, "vtx")
      .join(cc.select(col("vtx").as("lbl"), col("comp").as("lcomp")), "lbl")
      .filter(col("comp") =!= col("lcomp"))
      .count()
    assert(crossers === 0L, "a propagated label must be reachable from its vertex")
    // full vertex coverage: every vertex keeps exactly one label
    assert(lp.count() === cc.count())
    assert(lp.select("vtx").distinct().count() === lp.count())
  }

  test("chunk dedup: total kept chunks == global distinct chunks, kept ≤ total") {
    val out = MiningQueries.chunkDedup(spark, sf)
    val perDoc = out.collect()
    perDoc.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_chunks"))
      // reassembled word count = 8 per kept chunk except possibly one tail
      val words = r.getAs[String]("kept_text") match {
        case "" => 0L
        case t  => t.split(" ").length.toLong
      }
      assert(words <= r.getAs[Long]("n_kept") * 8)
      assert(words > r.getAs[Long]("n_kept") * 8 - 8 || r.getAs[Long]("n_kept") == 0)
    }
    val totalKept = perDoc.map(_.getAs[Long]("n_kept")).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val distinctChunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(posexplode(transform(
        sequence(lit(0), (ceil(size(col("w")) / lit(8.0)) - 1).cast("int")),
        i => array_join(slice(col("w"), i * 8 + 1, lit(8)), " "))).as(Seq("i", "c")))
      .select("c").distinct().count()
    assert(totalKept === distinctChunks,
      "exactly one survivor per distinct chunk")
  }

  test("pca power step: 64 dims, w_rel normalized to max-abs 1") {
    val rows = MiningQueries.pcaPowerStep(spark, sf).collect()
    assert(rows.length === 64)
    val rels = rows.map(_.getAs[Double]("w_rel"))
    assert(rels.forall(r => r >= -1.0 && r <= 1.0))
    assert(rels.count(r => math.abs(r) === 1.0) >= 1)
    // w_rel sign matches w_micro sign
    rows.foreach { r =>
      assert(math.signum(r.getAs[Double]("w_rel")) ===
        math.signum(r.getAs[Long]("w_micro").toDouble) ||
        r.getAs[Long]("w_micro") === 0L)
    }
  }

  test("random walks: every step follows an edge, walks are complete") {
    val rows = MiningQueries.randomWalks(spark, sf).collect()
    assert(rows.nonEmpty)
    val byWalk = rows.groupBy(_.getAs[Long]("walk_id"))
    byWalk.foreach { case (start, steps) =>
      val path = steps.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("node"))
      assert(path.length === 6, s"walk $start incomplete")
      assert(path.head === start, "step 0 is the start vertex")
    }
    // every consecutive (node, next) pair must be a real edge (the edge
    // set restated from the fixture — GraphQueries.edges is package-private)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_partkey") % 10 === col("l_suppkey") % 10)
      .select(col("l_partkey").as("u"), (col("l_suppkey") + 1000000L).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (li ++ li.map(_.swap)).toSet
    byWalk.values.foreach { steps =>
      val path = steps.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("node"))
      path.zip(path.tail).foreach { case (a, b) =>
        assert(edges.contains((a, b)), s"walk used non-edge $a -> $b")
      }
    }
  }

  test("MAD outliers: every flagged row clears the 3.5 modified-z bar") {
    val rows = MiningQueries.outliersMad(spark, sf).collect()
    assert(rows.nonEmpty, "fixture should produce at least one robust outlier")
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(math.abs(z) > 3.5)
      assert(r.getAs[Double]("mad") > 0)
      // z sign agrees with the deviation's sign
      val dev = r.getAs[Long]("v_c") - r.getAs[Double]("med")
      assert(math.signum(z) === math.signum(dev))
    }
  }
}
