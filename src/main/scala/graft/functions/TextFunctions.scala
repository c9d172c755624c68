package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks for the LLM-data-pipeline operators
  * (dedup / similarity / text analysis). Everything here stays inside
  * Catalyst expressions — builtin + higher-order functions only, no Scala
  * UDFs — so the hot paths remain codegen'd and null-safe at scale.
  *
  * The reference engine's text vocabulary is tokenize+lowercase+count
  * (/root/reference/src/app/wc.rs); these extend it with the sketching
  * primitives (shingles, MinHash, SimHash, cosine) a 100 TB training-data
  * pipeline needs.
  */
object TextFunctions {

  /** Whitespace tokens (driver documents are single-space-separated). */
  def spaceTokens(text: Column): Column = split(text, " ")

  /** Distinct-token ratio — the corpus quality score shared by the
    * selection operators (keep-best curation, source-quantile gate).
    * BIGINT÷BIGINT double division: bit-identical to DuckDB's
    * `len(list_distinct(l))::DOUBLE / len(l)`.
    */
  def distinctTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("long") / size(toks).cast("long")

  /** Word trigrams of a token array as (w1, w2, w3) structs — builtin
    * slice+zip_with expressions (codegen'd, no UDF). Shared by the
    * trigram-LM statistics and the perplexity scorer so the two trigram
    * surfaces can never disagree on boundary semantics (< 3 tokens → []).
    */
  def trigrams(toks: Column): Column = {
    val n = size(toks)
    zip_with(
      zip_with(slice(toks, lit(1), greatest(n - 2, lit(0))),
        slice(toks, lit(2), greatest(n - 2, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      slice(toks, lit(3), greatest(n - 2, lit(0))),
      (p, c) => struct(p.getField("w1").as("w1"), p.getField("w2").as("w2"),
        c.as("w3")))
  }

  /** Overlapping word-bigram shingles, deduplicated.
    * ["a","b","c"] → ["a b", "b c"].
    */
  def bigramShingles(toks: Column): Column =
    array_distinct(
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b)))

  /** k seeded 64-bit hashes of one value: xxhash64 with the seed mixed in as
    * a prefix (Spark's xxhash64 has a fixed seed, so we derive families by
    * prefixing).
    */
  def seededHash(seed: Column, value: Column): Column =
    xxhash64(concat_ws(":", seed.cast("string"), value))

  /** MinHash signature over PRE-HASHED shingles (`tokenHashes` output,
    * materialized as its own column): k minimums over k families, each
    * family re-mixing the 8-byte hash (xxhash64 of (seed, h)) instead of
    * re-hashing the string.
    *
    * Pass an attribute, not the hashing expression: an inline expression
    * gets duplicated into all k lambda bodies and the string hashing runs
    * k×. (Catalyst's CollapseProject keeps multi-referenced non-cheap
    * projections materialized, so a withColumn boundary is enough.)
    */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleHashes, h => xxhash64(i, h))))

  /** LSH band keys from a MinHash signature: `bands` buckets of `rowsPerBand`
    * signature entries, each band hashed to one 64-bit key. Docs sharing any
    * band key are near-dup candidates.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(
        b.cast("string"),
        concat_ws(",", slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))))

  /** Token hashes for SimHash — materialize once per row, then feed
    * `simhash64` (which references its input 64 times).
    */
  def tokenHashes(toks: Column): Column = transform(toks, t => xxhash64(t))

  /** 64-bit SimHash over precomputed token hashes: per bit position, sum
    * +1/-1 votes of each hash's bit; bit set iff the vote is positive. The
    * bit loop is unrolled at plan-build time (shift amounts must be Scala
    * ints for the builtin shift functions).
    */
  def simhash64(hashes: Column): Column =
    (0 until 64).map { j =>
      when(
        aggregate(hashes, lit(0L),
          (v, h) => v + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Dot product of two double arrays (sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm of a double array. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  /** Cosine similarity of two double arrays — `dot / (l2norm * l2norm)`
    * CLAMPED to [-1, 1], matching `plans.CosineSimilarity` and DuckDB's
    * `list_cosine_similarity` bit-exactly (the unclamped quotient exceeds
    * 1.0 by an ulp on identical vectors; see CosineSimilarity's scaladoc). */
  def cosine(a: Column, b: Column): Column = {
    val q = dot(a, b) / (l2norm(a) * l2norm(b))
    // guard NaN explicitly: Spark's least/greatest order NaN above every
    // double, which would silently clamp a 0-norm NaN to 1.0
    when(isnan(q), q)
      .otherwise(least(greatest(q, lit(-1.0d)), lit(1.0d)))
  }

  /** Jaccard similarity of two pre-deduplicated arrays. (For hot paths,
    * materialize `size(array_intersect(a, b))` as its own column first so
    * the intersection runs once — see DedupQueries.minhashLsh.)
    */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(array_union(a, b)).cast("double")
    size(array_intersect(a, b)).cast("double") / union
  }
}
