package graft

import graft.queries.{DedupQueries, SimilarityQueries => SQ}
import org.apache.spark.sql.functions._

/** Pins for the scale-aware LSH band width (r10's `scaledLshBits` /
  * `lshPlaneId` extended plane namespace — the sizing that keeps
  * `dedup_embedding_lsh` candidate volume bucket-bounded instead of
  * Ω(n²/2^bits) on a growing corpus):
  *
  *  1. integer boundary behavior of `scaledLshBits` (the sf0.1 fixture sits
  *     EXACTLY on the n = 125·2⁴ = 2000 floor; n = 2001 must widen to 5);
  *  2. bit-for-bit agreement with the DuckDB oracle's `nb` CTE integer rule
  *     at every 125·2^b boundary and a dense sweep (a float-log2 form could
  *     disagree between engines at near-power-of-two boundaries — both
  *     sides are integer by contract);
  *  3. injectivity of the (table, bit) → plane-id mapping and exact
  *     preservation of the fixture-era `t·legacy + i` prefix, so every
  *     fixture-scale answer is byte-identical to the fixed-width era;
  *  4. the oracle's scaled VALUES plane list carries those fixture-era
  *     planes as byte-identical literals to the fixed list;
  *  5. signature-level invariance on the real 2000-vector sf0.1 corpus
  *     (scaled form ≡ fixed-width form at the floor, ≠ once widened);
  *  6. end-to-end through the WIDENED path: past the floor, exact
  *     duplicates are guaranteed candidates (identical vectors ⇒ identical
  *     signatures in every table), so recall on dup pairs must be 1.0 and
  *     emitted sims exactly 1.0.
  */
class LshScaleSpec extends SparkSpec {

  test("scaledLshBits: integer boundaries, legacy floor, MaxLshBits cap") {
    assert(SQ.scaledLshBits(1) == 4, "floor binds for tiny corpora")
    assert(SQ.scaledLshBits(500) == 4, "sf0.001/sf0.01 fixtures")
    assert(SQ.scaledLshBits(2000) == 4, "sf0.1 fixture = 125·2^4 EXACTLY")
    assert(SQ.scaledLshBits(2001) == 5, "one past the floor widens")
    assert(SQ.scaledLshBits(4000) == 5)
    assert(SQ.scaledLshBits(4001) == 6)
    assert(SQ.scaledLshBits(200000) == 11, "the sf10 corpus reads 11 bits")
    assert(SQ.scaledLshBits(125L << 16) == 16)
    assert(SQ.scaledLshBits((125L << 16) + 1) == 16, "cap binds past ~8.2M")
    assert(SQ.scaledLshBits(Long.MaxValue / 2) == 16)
    assert(SQ.scaledLshBits(10, legacy = 6) == 6, "caller floor honored")
    assert(SQ.scaledLshBits(125L << 7, legacy = 6) == 7)
  }

  test("scaledLshBits agrees with the DuckDB oracle's integer rule everywhere") {
    // Transliteration of the dedup_embedding_lsh oracle's nb CTE:
    //   coalesce(min(b) for b in [4, MaxLshBits] with 125·2^b >= n, MaxLshBits)
    def oracleBits(n: Long): Int =
      (4 to SQ.MaxLshBits).find(b => 125L * (1L << b) >= n)
        .getOrElse(SQ.MaxLshBits)
    val boundaries = (4 to SQ.MaxLshBits).flatMap { b =>
      val n = 125L << b; Seq(n - 1, n, n + 1)
    }
    // deterministic LCG sweep across the whole plausible corpus range
    var x = 12345L
    val sampled = (1 to 5000).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 20) % 20000000L + 1
    }
    for (n <- boundaries ++ sampled)
      assert(SQ.scaledLshBits(n) == oracleBits(n),
        s"engines would disagree on band width at n=$n")
  }

  test("lshPlaneId: injective, dense, fixture prefix preserved, ranges disjoint") {
    val tables = 24
    for (legacy <- Seq(3, 4)) {
      val ids = for (t <- 0 until tables; i <- 0 until SQ.MaxLshBits)
        yield SQ.lshPlaneId(t, i, legacy, tables)
      assert(ids.distinct.size == ids.size, s"legacy=$legacy: plane ids collide")
      assert(ids.toSet == (0L until tables.toLong * SQ.MaxLshBits).toSet,
        s"legacy=$legacy: namespace not dense [0, ${tables * SQ.MaxLshBits})")
    }
    // the fixture-era prefix is the historical t·legacy + i seeding
    for (t <- 0 until tables; i <- 0 until 4)
      assert(SQ.lshPlaneId(t, i, 4, tables) == t * 4 + i)
    // every extended id sits strictly above the whole legacy range
    for (t <- 0 until tables; i <- 4 until SQ.MaxLshBits)
      assert(SQ.lshPlaneId(t, i, 4, tables) >= 4 * tables)
  }

  // Parse a "(k1,...,[c1,c2,...])"-style VALUES list into key→vector-text.
  private def parseValues(s: String): Map[Seq[Int], String] =
    s.split("\\]\\),\\(").map(_.stripPrefix("(").stripSuffix("])")).map { row =>
      val Array(keys, vec) = row.split("\\[", 2)
      keys.split(",").filter(_.nonEmpty).map(_.toInt).toSeq -> vec
    }.toMap

  test("planeRowsSqlScaled carries the fixture-era planes byte-identically") {
    val fixed = parseValues(SQ.planeRowsSql(4, 24))        // key = (j)
    val scaled = parseValues(SQ.planeRowsSqlScaled(24, 4)) // key = (t, bit)
    assert(fixed.size == 96 && scaled.size == 24 * SQ.MaxLshBits)
    for (t <- 0 until 24; i <- 0 until 4)
      assert(scaled(Seq(t, i)) == fixed(Seq(t * 4 + i)),
        s"fixture-era plane (t=$t, bit=$i) drifted from the fixed list")
    // distinct ids must yield distinct planes (no seed reuse anywhere)
    assert(scaled.values.toSeq.distinct.size == scaled.size)
  }

  test("sf0.1 floor: scaled signature family ≡ fixed-width era; widening changes it") {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    def sigSet(bits: Int, legacyBits: Int): Set[(Long, Int, Int)] =
      SQ.lshTableSigs(base, bits, 24, legacyBits)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val n = base.count()
    assert(n == 2000 && SQ.scaledLshBits(n) == 4,
      "fixture contract: sf0.1 sits exactly on the widening floor")
    val eraFixed = sigSet(4, -1)           // the pre-r10 fixed-width family
    val scaledAtFloor = sigSet(SQ.scaledLshBits(n), 4)
    assert(scaledAtFloor == eraFixed,
      "scaled form must be bit-identical to the fixed-width era at n<=2000")
    // sanity that the comparison has teeth: a genuinely widened family differs
    assert(sigSet(5, 4) != eraFixed)
  }

  test("widened path end-to-end: exact duplicates past the floor are all found") {
    // synthetic corpus: the 2000 sf0.1 vectors + 520 exact duplicates
    // (vec_id + 10000) → n = 2520 → scaledLshBits = 5 > the legacy 4, so
    // the extended plane ids genuinely drive the signatures. Identical
    // vectors get identical signatures in EVERY table regardless of the
    // planes, so each dup pair is a guaranteed candidate: recall on the
    // 520 planted pairs must be exactly 1.0, with sim ≈ 1 (one ulp of
    // IEEE rounding in the fused dot/norm).
    val tmp = java.nio.file.Files.createTempDirectory("lsh-scale").toString
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    base.unionByName(
        base.filter(col("vec_id") < 520)
          .withColumn("vec_id", col("vec_id") + 10000L))
      .coalesce(1).write.parquet(s"$tmp/embeddings.parquet")
    assert(SQ.scaledLshBits(2520) == 5)
    val rows = DedupQueries.embeddingLsh(spark, tmp).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == rows.length, "emitted pairs must be distinct")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "canonical va < vb")
    val missed = (0L until 520L).filter(i => !pairs.contains((i, i + 10000L)))
    assert(missed.isEmpty, s"widened band missed dup pairs: ${missed.take(5)}")
    rows.filter(r => r.getLong(1) >= 10000L && r.getLong(1) - 10000L == r.getLong(0))
      .foreach(r => assert(r.getDouble(2) > 1.0 - 1e-12, s"dup sim must be ~1.0: $r"))
  }
}
