package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Shapley gate attribution vs the INDEPENDENT permutation definition —
  * φᵢ as the average marginal rejection over all 4! gate orderings,
  * computed from raw per-doc flags with none of the subset/bitmask
  * machinery — plus the efficiency axiom (Σφ = docs rejected by the full
  * gate set).
  */
class GateShapleySpec extends SparkSpec {

  test("matches the all-orderings definition and satisfies efficiency (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    // independent per-doc flag derivation from the raw fixture
    val docFlags = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val lang = r.getString(1)
        val w = r.getString(2).split(" ", -1)
        val top = w.groupBy(identity).values.map(_.length).max
        Array(
          w.length >= 20,
          Seq("en", "es", "de", "fr").contains(lang),
          w.distinct.length.toDouble / w.length >= 0.4,
          top.toDouble / w.length <= 0.2)
      }.toSeq
    // permutation definition: marginal = doc newly rejected when gate i
    // joins the prefix; average over the 24 orderings, exact in 24ths
    def rejected(gates: Set[Int]): Long =
      docFlags.count(f => gates.exists(g => !f(g))).toLong
    val perms = (0 until 4).permutations.toSeq
    val want24 = (0 until 4).map { i =>
      perms.map { p =>
        val before = p.takeWhile(_ != i).toSet
        rejected(before + i) - rejected(before)
      }.sum
    }
    val got = PipelineQueries.gateShapley(spark, dir).collect()
      .map(r => (r.getAs[Long]("gate_idx"), r.getAs[Long]("shapley_24"),
        r.getAs[Double]("shapley")))
    assert(got.map(_._2).toSeq === want24.map(_.toLong),
      "Shapley numerators diverge from the permutation definition")
    // efficiency: Σφ = v(all gates)
    assert(got.map(_._2).sum === 24L * rejected(Set(0, 1, 2, 3)))
    got.foreach { case (_, n24, d) =>
      assert(math.abs(d - BigDecimal(n24 / 24.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
