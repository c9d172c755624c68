package graft

import graft.queries.{DedupQueries, SimilarityQueries}
import graft.sources.Multimodal
import org.apache.spark.sql.functions._

/** Semantics tests for the LLM-pipeline operators that have no SQL oracle:
  * MinHash LSH recall against exact Jaccard ground truth, SimHash locality,
  * ANN bucket sanity, multimodal decode plumbing.
  */
class LlmOpsSpec extends SparkSpec {

  test("minhash LSH finds every J>=0.95 pair that exact jaccard finds (recall, two scales)") {
    // two-scale invariant (driver check is rows-only): recall vs the exact
    // quadratic ground truth at both test SF and bench SF corpora
    for (dir <- Seq(sf, "/root/testdata/sf0.1")) {
      val exact = DedupQueries.ngramJaccard(spark, dir, maxDocId = 500, threshold = 0.95)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = DedupQueries.minhashLsh(spark, dir, maxDocId = 500, threshold = 0.95)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty, s"$dir: fixture should contain near-dup pairs")
      val missed = exact -- lsh
      assert(missed.size <= math.max(1, exact.size / 20),
        s"$dir: LSH missed ${missed.size} of ${exact.size} J>=0.95 pairs: ${missed.take(5)}")
      // precision is guaranteed by construction: candidates are verified with
      // exact jaccard before emission
      assert((lsh -- exact).isEmpty)
    }
  }

  test("simhash: near-dup pairs have smaller Hamming distance than the corpus baseline (two scales)") {
    // locality invariant (driver check is rows-only): the mean Hamming
    // distance between signatures of exact-Jaccard near-dup pairs must sit
    // well below the mean over arbitrary pairs, at both test and bench SF
    import graft.functions.TextFunctions._
    for (dir <- Seq(sf, "/root/testdata/sf0.1")) {
      val sig = DedupQueries.simhashSignatures(spark, dir)
      val near = DedupQueries.ngramJaccard(spark, dir, maxDocId = 500, threshold = 0.9)
        .select("da", "db")
      def ham(pairs: org.apache.spark.sql.DataFrame): Double = pairs
        .join(sig.select(col("doc_id").as("da"), col("simhash").as("sa")), "da")
        .join(sig.select(col("doc_id").as("db"), col("simhash").as("sb")), "db")
        .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("h"))
        .agg(avg("h")).collect()(0).getDouble(0)
      val nearHam = ham(near)
      // baseline: consecutive-id pairs (arbitrary, near-dups vanishingly rare)
      val baseline = ham(sig.select(col("doc_id").as("da"), (col("doc_id") + 7).as("db")))
      assert(nearHam < baseline / 2,
        s"$dir: near-dup mean Hamming $nearHam !<< baseline $baseline")
    }
  }

  test("simhash: identical docs get identical signatures; signatures are 64-bit") {
    val sigs = DedupQueries.simhashSignatures(spark, sf)
    val dup = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .limit(1).union(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id") + 100000, col("text")).limit(1))
    import graft.functions.TextFunctions._
    val two = dup.select(simhash64(tokenHashes(spaceTokens(col("text")))).as("s"))
      .collect().map(_.getLong(0))
    assert(two(0) == two(1))
    assert(sigs.count() == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("cosine top-k: self-similarity excluded, ranks contiguous, sim in [-1,1]") {
    val topk = SimilarityQueries.cosineTopK(spark, sf).collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      assert(r.getAs[Long]("qid") != r.getAs[Long]("vec_id"))
      val sim = r.getAs[Double]("sim")
      assert(sim >= -1.0001 && sim <= 1.0001)
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 5)
    }
    val perQuery = topk.groupBy(_.getAs[Long]("qid"))
    perQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann top-k retrieval: recall >= 0.9 vs brute-force cosine (sf0.001 + sf0.01)") {
    // The corpus is isotropic-random — LSH's worst case — so measured recall
    // here is the floor, not the typical case (see SimilarityQueries.annTopK).
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(SimilarityQueries.cosineTopK(spark, dir))
      val ann = pairs(SimilarityQueries.annTopK(spark, dir))
      assert(exact.size == 50, s"$dir: expected 10 queries x top-5")
      val recall = (exact & ann).size.toDouble / exact.size
      assert(recall >= 0.9, s"$dir: ANN recall $recall < 0.9")
      // every ANN answer carries a rank 1..5 and excludes self-matches
      SimilarityQueries.annTopK(spark, dir).collect().foreach { r =>
        assert(r.getAs[Long]("qid") != r.getAs[Long]("vec_id"))
        assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 5)
      }
    }
  }

  test("ivf top-k retrieval: recall >= 0.9 vs brute force at ~25% scan") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(SimilarityQueries.cosineTopK(spark, dir))
      val ivf = pairs(SimilarityQueries.ivfTopK(spark, dir))
      val recall = (exact & ivf).size.toDouble / exact.size
      assert(recall >= 0.9, s"$dir: IVF recall $recall < 0.9")
    }
  }

  test("embedding LSH dedup: recall >= 0.9 vs exact all-pairs; precision 1 by construction") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(DedupQueries.embeddingCosine(spark, dir))
      val lsh = pairs(DedupQueries.embeddingLsh(spark, dir))
      assert(exact.nonEmpty, s"$dir: exact pairs should be non-empty")
      assert((lsh -- exact).isEmpty, s"$dir: LSH emitted non-near-dup pairs")
      val recall = (exact & lsh).size.toDouble / exact.size
      assert(recall >= 0.9, s"$dir: embedding LSH recall $recall < 0.9")
    }
  }

  test("ann lsh buckets: partition the corpus exactly") {
    val buckets = SimilarityQueries.annLshBuckets(spark, sf)
    val total = buckets.agg(sum("n_vectors")).collect()(0).getLong(0)
    assert(total == spark.read.parquet(s"$sf/embeddings.parquet").count())
  }

  test("dedup clusters: pair endpoints co-clustered, keeper is the min id (two scales)") {
    import graft.queries.PipelineQueries
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val labels = PipelineQueries.dedupClusters(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      val pairs = DedupQueries.ngramJaccard(spark, dir)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty, s"$dir: fixture should contain near-dup pairs")
      // every pair's endpoints share a cluster label
      pairs.foreach { case (a, b) =>
        assert(labels(a)._1 == labels(b)._1, s"$dir: pair ($a,$b) split across clusters")
      }
      // cluster label is the min member; exactly that member is the keeper
      labels.groupBy(_._2._1).foreach { case (cid, members) =>
        assert(members.keys.min == cid, s"$dir: cluster $cid label != min member")
        assert(members.count(_._2._2) == 1 && members(cid)._2,
          s"$dir: cluster $cid keeper flag wrong")
      }
    }
  }

  test("dedup clusters: a pair-free corpus yields an empty frame, not a crash") {
    // threshold > 1 makes the Jaccard pair set provably empty — the shared
    // min-label loop must converge on the empty graph (sum over zero rows
    // is SQL null; regression guard for the null-coalesced convergence)
    val out = graft.queries.PipelineQueries.dedupClusters(spark, sf, threshold = 1.01)
    assert(out.count() == 0)
  }

  test("approx percentiles sit within the 1% envelope of exact (two scales)") {
    // the query's p50/p90/p99 columns are now the EXACT percentiles (those
    // are what the oracle hash-checks); the GK sketch itself is gated by
    // the *_ok envelope booleans — assert THEM at both test and bench SF,
    // so a broken sketch at the larger scale still fails here
    for (dir <- Seq(sf, "/root/testdata/sf0.1")) {
      graft.queries.PipelineQueries.approxPercentiles(spark, dir).collect()
        .foreach { r =>
          val flag = r.getString(0)
          Seq("p50_ok", "p90_ok", "p99_ok").foreach { c =>
            assert(r.getAs[Boolean](c),
              s"$dir/$flag: GK estimate outside 1% of exact ($c=false)")
          }
        }
    }
  }

  test("multimodal: resize + frame-sample stubs keep typed plumbing real") {
    val media = Multimodal.fromDocuments(spark, sf)
    val resized = Multimodal.resizeStub(media, 4)
    val orig = media.filter(col("id") === 0).collect()(0).media.length
    val small = resized.filter(col("id") === 0).collect()(0).media.length
    assert(small == (orig + 3) / 4)
    val frames = Multimodal.frameSampleStub(media, frameSize = 16, stride = 2)
    val f0 = frames.filter(col("id") === 0).collect()
    assert(f0.nonEmpty && f0.forall(_.frame_no % 2 == 0))
    assert(f0.forall(_.frame.length <= 16))
  }

  test("multimodal: decode plumbing is deterministic and schema-stable") {
    val feats = Multimodal.decodeBatch(Multimodal.fromDocuments(spark, sf))
    assert(feats.schema.fieldNames.toSeq ==
      Seq("id", "kind", "n_bytes", "width", "height", "channels"))
    val r = feats.filter(col("id") === 0).collect()(0)
    val again = Multimodal.decodeBatch(Multimodal.fromDocuments(spark, sf))
      .filter(col("id") === 0).collect()(0)
    assert(r == again)
    assert(r.width >= 64 && r.height >= 64)
  }
}
