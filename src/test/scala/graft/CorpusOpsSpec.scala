package graft

import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._

/** Invariant tests for the round-3 corpus operators (each also carries a
  * full DuckDB oracle; these assert the ALGORITHMIC properties the hash
  * compare can't express).
  */
class CorpusOpsSpec extends SparkSpec {

  test("sequence packing: every doc packed once, bins respect the budget except oversize docs") {
    val budget = 256
    val packed = CorpusQueries.packSequences(spark, sf, budget = budget).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(packed.length == nDocs, "every document must appear exactly once")
    // per (shard, bin): total tokens <= budget unless the bin is a single
    // oversize doc (next-fit gives oversize docs their own bin)
    packed.groupBy(r => (r.getLong(0), r.getLong(2))).foreach { case ((sh, bin), rows) =>
      val tot = rows.map(_.getLong(3)).sum
      assert(tot <= budget || rows.length == 1,
        s"shard $sh bin $bin holds $tot tokens across ${rows.length} docs")
    }
    // bins are consumed densely in doc_id order within a shard
    packed.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      val bins = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      bins.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(1) - w(0) <= 1 && w(1) >= w(0),
            s"shard $shard: bin ids must be non-decreasing steps of <=1, got $w")
      }
    }
  }

  test("chunking: stride coverage — chunks tile every token, overlap = window - stride") {
    val window = 32; val stride = 24
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("ntok"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = CorpusQueries.chunkOverlap(spark, sf).collect()
      .groupBy(_.getLong(0))
    docs.foreach { case (id, ntok) =>
      val cs = chunks(id).sortBy(_.getLong(1))
      val expected = 1 + (math.max(ntok, 1) - 1) / stride
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks, want $expected")
      // all but possibly the tail chunks are full windows
      cs.init.foreach { c =>
        val start = c.getLong(1) * stride
        assert(c.getLong(2) == math.min(window, ntok - start),
          s"doc $id chunk ${c.getLong(1)}: bad size")
      }
    }
  }

  test("int8 quantization: reconstruction error bounded by half-step per dimension") {
    // |x - q/scale| <= 0.5/scale per element => l2_err <= sqrt(dim)*0.5/scale
    val rows = CorpusQueries.quantizeInt8(spark, sf).collect()
    assert(rows.nonEmpty)
    val dim = Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).first().getInt(0)
    rows.foreach { r =>
      val scale = r.getDouble(1); val err = r.getDouble(2)
      val bound = math.sqrt(dim) * 0.5 / scale + 1e-6
      assert(err <= bound, s"vec ${r.getLong(0)}: l2_err $err > bound $bound")
      assert(r.getLong(3) >= 1, "the max-magnitude element must saturate to ±127")
    }
  }

  test("redaction removes every synthesized email and digit run") {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val out = CorpusQueries.redact(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == nDocs, "exactly one email injected+redacted per doc")
    assert(out.map(_.getLong(3)).sum == nDocs, "exactly one numeric ref per doc")
    // spot-check: redacted text contains no residual match
    val residual = Tables.documents(spark, sf)
      .select(regexp_replace(
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com ref "), col("doc_id") * 7),
        emailPat, "<EMAIL>").as("t"))
      .filter(col("t").rlike(emailPat)).count()
    assert(residual == 0)
  }

  test("source capping: every source sampled at or below its cap-derived expectation") {
    val out = CorpusQueries.capSources(spark, sf).collect()
    out.foreach { r =>
      val nBefore = r.getLong(1); val thresh = r.getLong(2); val nSampled = r.getLong(3)
      assert(thresh == 15L * 10000L / nBefore)
      assert(nSampled <= nBefore)
      // hash-uniformity sanity: sampled fraction within a loose band of rate
      val rate = thresh.toDouble / 10000.0
      assert(math.abs(nSampled.toDouble / nBefore - rate) <= 0.35,
        s"${r.getString(0)}: sampled $nSampled of $nBefore at rate $rate")
    }
  }

  test("substring pairs are a subset of high-overlap docs and symmetric-free") {
    val pairs = CorpusQueries.substringPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b }, "pairs must be oriented da < db")
    assert(pairs.toSet.size == pairs.length, "no duplicate pairs")
  }
}
