package graft

import graft.plans.JaroWinkler
import graft.queries.{MatchQueries, MlQueries, RecursiveQueries, SurfaceQueries}
import org.apache.spark.sql.functions._

/** Round-3 operator invariants: the JaroWinkler expression's reference
  * values + codegen/null behavior, entity-resolution linkage quality on
  * the derived dirty feed, count-min sketch over-estimation bounds, the
  * k-means step's partition-of-the-corpus property, and OLS sanity.
  */
class LinkOpsSpec extends SparkSpec {

  test("JaroWinkler.score matches the published reference values") {
    assert(math.abs(JaroWinkler.score("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinkler.score("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(JaroWinkler.score("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(math.abs(JaroWinkler.score("aXXXXXX", "aYYYYYY") - 3.0 / 7.0) < 1e-12)
    assert(JaroWinkler.score("", "") == 1.0)
    assert(JaroWinkler.score("a", "") == 0.0)
    assert(JaroWinkler.score("same", "same") == 1.0)
  }

  test("JaroWinkler expression: codegen path equals interpreted score, nulls propagate") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), ("abc", "xyz"))
      .toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == JaroWinkler.score(r.getString(0), r.getString(1)))
    }
    val withNull = Seq(("x", Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("er_fuzzy_match links every dirty row, er_jaro_winkler agrees on the match") {
    val dirtyCount = queries.MatchQueries.queries("er_fuzzy_match")(spark, sf).count()
    val feedSize = graft.Tables.part(spark, sf)
      .filter(col("p_partkey") % 5 === 0 && length(col("p_name")) >= 4).count()
    assert(dirtyCount == feedSize, "every corrupted row must link back to a master")
    // the two scorers must agree on the matched master almost everywhere
    // (levenshtein and jaro-winkler rank the one-edit corruption first)
    val lev = MatchQueries.queries("er_fuzzy_match")(spark, sf)
      .select("p_partkey", "matched_name")
    val jar = MatchQueries.queries("er_jaro_winkler")(spark, sf)
      .select(col("p_partkey"), col("matched_name").as("jw_name"))
    val joined = lev.join(jar, "p_partkey")
    val agree = joined.filter(col("matched_name") === col("jw_name")).count()
    assert(agree >= (joined.count() * 0.95).toLong,
      "lev and jaro linkage should agree on ≥95% of rows")
  }

  test("sketch_countmin never under-estimates and is tight on a small vocabulary") {
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val rows = MlQueries.queries("sketch_countmin")(spark, dir)
        .select("exact", "est").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(1) >= r.getLong(0), "CMS estimate must be ≥ exact count")
      }
    }
  }

  test("ml_kmeans_step output is a partition: sizes sum to corpus, k clusters × dims") {
    val out = MlQueries.queries("ml_kmeans_step")(spark, sf)
    val n = graft.Tables.embeddings(spark, sf).count()
    val dims = out.select("dim").distinct().count()
    val perCluster = out.groupBy("cluster_id").agg(first("n").as("n"))
    assert(perCluster.agg(sum("n")).head.getLong(0) == n,
      "cluster sizes must sum to the corpus size")
    assert(out.count() == perCluster.count() * dims,
      "output must be the full (cluster × dim) centroid matrix")
  }

  test("ml_linreg_ols agrees with covar_pop/var_pop and corr² (independent path)") {
    val r = MlQueries.queries("ml_linreg_ols")(spark, sf).head
    val slope = r.getAs[Double]("slope")
    val r2 = r.getAs[Double]("r2")
    val ref = graft.Tables.lineitem(spark, sf)
      .agg((covar_pop(col("l_quantity"), col("l_extendedprice")) /
        var_pop(col("l_quantity"))).as("slope"),
        (corr(col("l_quantity"), col("l_extendedprice")) *
          corr(col("l_quantity"), col("l_extendedprice"))).as("r2")).head
    assert(math.abs(slope - ref.getDouble(0)) < 1e-3,
      s"decimal-sum slope $slope vs covar/var ${ref.getDouble(0)}")
    assert(math.abs(r2 - ref.getDouble(1)) < 1e-6 && r2 >= 0.0 && r2 <= 1.0)
  }

  test("q_recursive_cte depth histogram covers every non-root customer exactly once per level") {
    val rows = RecursiveQueries.queries("q_recursive_cte")(spark, sf).collect()
    val depth1 = rows.find(_.getLong(0) == 1L).get.getLong(1)
    val nonRoot = graft.Tables.customer(spark, sf)
      .filter(col("c_custkey") > 0).count()
    assert(depth1 == nonRoot, "depth 1 must hold every starting node")
    // strictly fewer nodes survive each further level (chains shrink)
    val byDepth = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(byDepth.zip(byDepth.tail).forall { case (a, b) => b <= a })
  }

  test("text_bm25 scores are positive and the cut is the global top-k") {
    val out = SurfaceQueries.queries("text_bm25")(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    assert(out.forall(_.getAs[Double]("score") > 0.0))
    val sorted = out.map(_.getAs[Double]("score"))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
  }
}
