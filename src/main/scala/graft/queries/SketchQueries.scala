package graft.queries

import graft.Tables
import graft.functions.TextFunctions.spaceTokens
import graft.plans.Fnv1a64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fully-oracled probabilistic/integrity sketches built from relational
  * ops over the shared FNV-1a hash (`graft.plans.Fnv1a64`): a HyperLogLog
  * register file, a Bloom membership filter, and an order-independent
  * table fingerprint. Unlike the opaque builtin sketches
  * (`approx_count_distinct`'s HLL++ binary, `count_min_sketch`), every
  * cell here is re-derivable in DuckDB, so the driver's gate checks the
  * sketch CONTENTS, not just row counts — the `sketch_countmin` pattern
  * (MlQueries.scala) extended to the two remaining workhorse sketches plus
  * the data-integrity primitive a 100 TB copy job actually needs.
  */
object SketchQueries {

  private val M = 64 // HLL registers (2^6); std error 1.04/sqrt(64) ≈ 13%

  /** HyperLogLog from relational ops: hash every token, split the 31-bit
    * ihash into a 6-bit register index and a 25-bit remainder, register =
    * max over the geometric rank rho (position of the lowest set bit —
    * same Geometric(1/2) law as the leading-zero convention, but
    * `log2(rest & -rest)` is EXACT in ieee754, so both engines derive
    * identical ranks with no libm boundary risk). Output is the full
    * 64-register file plus the estimate and the exact distinct count.
    *
    * Scale: the sketch is 64 cells regardless of corpus size and merges
    * by per-register max — the distributed-distinct-count summary you
    * gossip between partitions instead of shuffling a vocabulary. The
    * small-range linear-counting correction (zeros > 0, raw ≤ 2.5m) is
    * included so the operator is honest at tiny cardinalities too.
    */
  def hll(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(spaceTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val rho = toks
      .select(Fnv1a64.ihash31(col("tok")).as("h"))
      .select((col("h") % M).as("bucket"), expr(s"h div $M").as("rest"))
      .select(col("bucket"),
        when(col("rest") === 0, lit(26))
          .otherwise(log2(col("rest").bitwiseAND(-col("rest"))).cast("int") + 1)
          .as("rho"))
    val regs = s.range(M).select(col("id").as("bucket"))
      .join(rho.groupBy("bucket").agg(max("rho").as("mx")), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("mx"), lit(0)).cast("long").as("reg"))
    // Exact Σ 2^-reg: 64 terms, each an exact power of two in [2^-26, 1] —
    // a double sum with < 52 bits of span is associative, so the aggregate
    // is order-independent without rounding.
    val stats = regs.agg(
        sum(pow(lit(2.0), -col("reg"))).as("sum_inv"),
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("zeros"))
      .select(
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
          * lit(64.0) * lit(64.0) / col("sum_inv")).as("raw"),
        col("zeros"))
      .select(round(
        when(col("raw") <= 160.0 && col("zeros") > 0,
          lit(64.0) * log(lit(64.0) / col("zeros"))).otherwise(col("raw")),
        6).as("est_distinct"))
    val exact = toks.agg(countDistinct(col("tok")).as("exact_distinct"))
    regs.crossJoin(broadcast(stats)).crossJoin(broadcast(exact))
      .orderBy("bucket")
  }

  private val BloomBits = 65536 // 2^16
  private val BloomK = 3

  /** Bloom filter from relational ops: k=3 salted FNV hashes of every
    * distinct part name into a 2^16-bit domain; the filter is the distinct
    * bit-position set, membership = all k probe positions present. Probed
    * with 20 known-present and 20 known-absent keys; false positives are
    * possible (and deterministic), false negatives never — the spec pins
    * the one-sided error. `q_bloom_prejoin` demonstrates Spark's opaque
    * BloomFilterAggregate in a join; this is the glass-box counterpart the
    * oracle can re-derive bit by bit.
    *
    * Scale: the filter materializes as DISTINCT positions — O(min(k·n, m))
    * rows — built by one hash-aggregate; probing is a broadcast join of
    * the tiny probe set against it. At 100 TB you'd fold the position set
    * into 1024 bitmap longs per partition and OR them (the
    * q_bitmap_distinct layout); the position-set form keeps every bit
    * SQL-visible.
    */
  def bloom(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d).select(col("p_name")).distinct()
    val seeds = array((0 until BloomK).map(lit): _*)
    def positions(df: DataFrame, key: String): DataFrame =
      df.select(col(key), explode(seeds).as("i"))
        .select(col(key),
          (Fnv1a64.ihash31(concat(col(key), lit("#"), col("i").cast("string")))
            % BloomBits).as("pos"))
    val filterBits = positions(names, "p_name").select("pos").distinct()
    val bitsSet = filterBits.agg(count(lit(1)).as("bits_set"))
    val present = Tables.part(s, d)
      .orderBy("p_partkey").limit(20).select(col("p_name").as("probe"))
    val absent = s.range(20)
      .select(concat(lit("absent#"), col("id").cast("string")).as("probe"))
    val probes = present.union(absent).distinct()
    val hits = positions(probes, "probe")
      .join(filterBits.withColumn("found", lit(1L)), Seq("pos"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("found"), lit(0L))).as("bloom_hit"))
    val truth = probes
      .join(names.withColumn("in_set", lit(1L)),
        probes("probe") === names("p_name"), "left")
      .select(col("probe"), coalesce(col("in_set"), lit(0L)).as("present"))
    hits.join(truth, "probe")
      .select(col("probe"), col("present"), col("bloom_hit"),
        (col("bloom_hit") === 1 && col("present") === 0).cast("long").as("false_positive"))
      .crossJoin(broadcast(bitsSet))
      .orderBy("probe")
  }

  /** Order-independent table fingerprint: each row canonicalized to a '|'
    * string of stable columns (floats via exact cent scaling, timestamps
    * via epoch seconds — never engine-formatted float strings), FNV-hashed,
    * then reduced with the commutative trio (count, sum, xor) plus
    * min/max. Two tables differing in ANY row disagree in sum or xor with
    * overwhelming probability; identical tables agree exactly.
    *
    * Scale: THE way to verify a 100 TB copy/migration — one streamed scan
    * per side, five scalar aggregates, zero shuffle (partial aggregation
    * reduces each partition to five numbers); no sort, no row pairing, and
    * partitioning/layout of the two sides is irrelevant because every
    * aggregate is commutative. The repartition-invariance spec pins that.
    */
  /** The five commutative audit aggregates over one canonicalized relation —
    * package-visible so the spec can prove layout independence by feeding
    * the SAME relation repartitioned. */
  private[graft] def audit(tbl: String, df: DataFrame,
      canon: org.apache.spark.sql.Column): DataFrame =
    df.select(Fnv1a64.ihash31(canon).as("h"))
      .agg(count(lit(1)).as("n_rows"), sum("h").as("h_sum"),
        expr("bit_xor(h)").as("h_xor"), min("h").as("h_min"), max("h").as("h_max"))
      .select(lit(tbl).as("tbl"), col("n_rows"), col("h_sum"),
        col("h_xor"), col("h_min"), col("h_max"))

  /** Canonical row string for lineitem (shared by query and spec). */
  private[graft] def lineitemCanon: org.apache.spark.sql.Column =
    concat_ws("|", col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
      round(col("l_extendedprice") * 100).cast("long"),
      col("l_shipdate").cast("timestamp").cast("long"))

  def fingerprint(s: SparkSession, d: String): DataFrame = {
    val li = audit("lineitem", Tables.lineitem(s, d), lineitemCanon)
    val ord = audit("orders", Tables.orders(s, d),
      concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"),
        col("o_orderdate").cast("timestamp").cast("long")))
    li.union(ord).orderBy("tbl")
  }

  /** The BUILT-IN Apache DataSketches HLL surface (hll_sketch_agg /
    * hll_sketch_estimate, Spark 3.5+) next to this module's relational
    * re-derivation (`sketch_hll`): the production mergeable sketch a
    * 100 TB distinct-count actually uses. Sketch bytes are
    * implementation-specific, so the gate is the envelope pattern: exact
    * counts oracle-checked value-for-value, plus a deterministic
    * within-5% boolean (≈3σ at the default lgConfigK=12; the sketch is
    * deterministic for fixed data, so the pass is stable).
    */
  def hllNative(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("est"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("est") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("within_tol"))
      .orderBy("l_returnflag")

  /** Mergeable-sketch re-aggregation: one HLL sketch per return flag, then
    * `hll_union_agg` folds the per-group sketches into a global one — the
    * exact shape of a 100 TB distinct-count rollup, where each partition /
    * day / source keeps a kilobyte sketch and ANY rollup level is a
    * sketch-union away (never a re-scan of the raw keys). Gated two ways:
    * the union estimate must sit within the 5% envelope of the
    * oracle-checked exact count (`within_tol`), and within 2% of a direct
    * single-pass global sketch (`union_close`). The union is NOT
    * bit-identical to the direct sketch: DataSketches unions accumulate in
    * dense HLL_8 while a small direct sketch stays in sparse/coupon mode
    * (near-exact), so the paths diverge slightly (measured ≤0.6% across
    * sf0.001/0.01/0.1 — est 1991 vs 1999 vs exact 2000 at sf0.01). Both
    * gates are deterministic for fixed data.
    */
  def hllUnion(s: SparkSession, d: String): DataFrame = {
    val perFlag = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    val merged = perFlag.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_union"),
      count(lit(1)).as("n_sketches"))
    val direct = Tables.lineitem(s, d).agg(
      expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("est_direct"),
      countDistinct(col("l_partkey")).as("exact_global"))
    merged.crossJoin(broadcast(direct))
      .select(col("n_sketches"), col("exact_global"),
        (abs(col("est_union") - col("est_direct")) <=
          col("exact_global") * 0.02).as("union_close"),
        (abs(col("est_union") - col("exact_global")) <=
          col("exact_global") * 0.05).as("within_tol"))
  }

  private val KmvK = 128

  /** KMV (theta-style) sketch with set INTERSECTION — the estimate HLL
    * structurally cannot give (HLL unions; inclusion-exclusion on it
    * explodes the error). Per set: the k=128 smallest normalized FNV
    * hashes of the distinct keys. Union sketch = k smallest of the
    * combined hash stream; θ = its k-th value; est_union = (k−1)/θ, and
    * est_inter = ρ · est_union / k where ρ counts union-sketch members
    * present in BOTH sets — the standard θ-sketch estimator, here over
    * the part keys bought under returnflag A vs R. Every step (hash,
    * k-smallest, ρ) is exact integer/rank work, so the whole sketch is
    * re-derivable in SQL and the gate checks sketch CONTENTS; the
    * estimates land within the 15% envelope (~1.7σ at k=128) of the
    * oracle-checked exact counts on all fixtures, deterministically.
    *
    * Scale: per-set sketches are k values built by one hash-aggregate +
    * top-k (map-side partial heaps); union/intersection of ANY pair of
    * pre-built sketches is k-row work — the pattern that answers overlap
    * questions across 100 TB corpus slices without re-scanning either.
    */
  def kmvIntersect(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("f"), col("l_partkey"))
      .distinct()
      .select(col("f"),
        // Fibonacci post-mix: the masked low FNV bits are visibly
        // non-uniform on short numeric strings (θ landed ~2× high,
        // est_union 50% off); ×2654435761 mod 2^31 re-spreads them
        // (measured ≤9% estimator error across all three SFs)
        (((Fnv1a64.ihash31(col("l_partkey").cast("string"))
          * 2654435761L) % 2147483648L).cast("double")
          / 2147483647.0).as("h"))
    val exact = keys.groupBy("f").agg(count(lit(1)).as("n"))
    val exacts = exact.agg(
      sum(when(col("f") === "A", col("n"))).as("n_a_exact"),
      sum(when(col("f") === "R", col("n"))).as("n_r_exact"))
    val exactInter = keys.groupBy("h").agg(countDistinct("f").as("nf"))
      .agg(count(lit(1)).as("union_exact"),
        sum(when(col("nf") === 2, 1L).otherwise(0L)).as("inter_exact"))
    // k-smallest via sort+limit = a TakeOrdered heap (map-side partial
    // top-k), never a corpus-wide ranking window
    val unionKmv = keys.select("h").distinct().orderBy("h").limit(KmvK)
    val theta = unionKmv.agg(max("h").as("theta"), count(lit(1)).as("k_eff"))
    val rho = unionKmv.join(keys, "h")
      .groupBy("h").agg(countDistinct("f").as("nf"))
      .agg(sum(when(col("nf") === 2, 1L).otherwise(0L)).as("rho"))
    theta.crossJoin(broadcast(rho)).crossJoin(broadcast(exacts))
      .crossJoin(broadcast(exactInter))
      .select(col("n_a_exact"), col("n_r_exact"), col("union_exact"),
        col("inter_exact"), col("k_eff"), col("rho"),
        round((lit(KmvK - 1) / col("theta")), 4).as("est_union"),
        round(col("rho") * (lit(KmvK - 1) / col("theta")) / KmvK, 4)
          .as("est_inter"))
      .select(col("*"),
        (abs(col("est_union") - col("union_exact")) <=
          col("union_exact") * 0.15).as("union_tol"),
        (abs(col("est_inter") - col("inter_exact")) <=
          col("inter_exact") * 0.15).as("inter_tol"))
  }

  /** Misra-Gries heavy hitters over the corpus word stream through the
    * native mergeable summary (`plans/HeavyHittersAgg`, the second
    * TypedImperativeAggregate): one global aggregate whose map-side
    * partials are k-counter MG summaries merged under the
    * mergeable-summaries rule. The summary's counter values are
    * arrival-order-dependent, so the gate rides the THEOREM instead:
    * every word with exact frequency > n/(k+1) is guaranteed present in
    * the summary (`found`) with an estimate inside
    * [cnt − n/(k+1), cnt] (`within`) — both deterministically TRUE under
    * any partitioning, checked with exact integer arithmetic
    * (cnt·(k+1) vs n, never a float threshold). The deterministic-bound
    * cousin of `sketch_countmin`'s probabilistic overcount.
    */
  private val MgK = 50

  def mgHeavy(s: SparkSession, d: String, k: Int = MgK): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(spaceTokens(col("text"))).as("word"))
    val exact = words.groupBy("word").agg(count(lit(1)).as("cnt"))
    val tot = words.agg(count(lit(1)).as("n"))
    val mg = words.agg(graft.plans.HeavyHittersAgg.heavyHitters(col("word"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("word"), col("e.est").as("est"))
    exact.crossJoin(broadcast(tot))
      .filter(col("cnt") * (k + 1) > col("n"))
      .join(broadcast(mg), Seq("word"), "left")
      .select(col("word"), col("cnt"),
        col("est").isNotNull.as("found"),
        (col("est").isNotNull && col("est") <= col("cnt") &&
          (col("cnt") - col("est")) * (k + 1) <= col("n")).as("within"))
      .orderBy(col("cnt").desc, col("word"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_mg_heavy" -> (mgHeavy(_, _, MgK)),
    "sketch_kmv_intersect" -> (kmvIntersect(_, _)),
    "sketch_hll" -> (hll(_, _)),
    "sketch_hll_union" -> (hllUnion(_, _)),
    "sketch_hll_native" -> (hllNative(_, _)),
    "sketch_bloom" -> (bloom(_, _)),
    "q_table_fingerprint" -> (fingerprint(_, _))
  )

  import OracleSql.fnvIhash31

  /** Threshold derives from the SAME k the registry binds — changing the
    * binding cannot desynchronize the word sets the engines gate on. */
  private def mgHeavySql(k: Int): String =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
       |exact AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word)
       |SELECT word, cnt, TRUE AS found, TRUE AS within
       |FROM exact CROSS JOIN n WHERE cnt * ${k + 1} > n
       |ORDER BY cnt DESC, word""".stripMargin

  val oracles: Map[String, String] = Map(
    // theorem-backed envelope (the sketch_hll device): exact counts are
    // value-checked; the MG guarantees are literal TRUE because they hold
    // under any partitioning by the deficiency bound
    "sketch_mg_heavy" -> mgHeavySql(MgK),
    "sketch_kmv_intersect" ->
      s"""WITH keys AS (
         |  SELECT f,
         |         CAST(CAST(${fnvIhash31("CAST(l_partkey AS VARCHAR)")} AS BIGINT)
         |              * 2654435761 % 2147483648 AS DOUBLE)
         |           / 2147483647.0 AS h
         |  FROM (SELECT DISTINCT l_returnflag AS f, l_partkey FROM lineitem
         |        WHERE l_returnflag IN ('A', 'R'))),
         |ex AS (
         |  SELECT CAST(sum(CASE WHEN f = 'A' THEN n END) AS BIGINT) AS n_a_exact,
         |         CAST(sum(CASE WHEN f = 'R' THEN n END) AS BIGINT) AS n_r_exact
         |  FROM (SELECT f, count(*) AS n FROM keys GROUP BY f)),
         |exi AS (
         |  SELECT CAST(count(*) AS BIGINT) AS union_exact,
         |         CAST(sum(CASE WHEN nf = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS inter_exact
         |  FROM (SELECT h, count(DISTINCT f) AS nf FROM keys GROUP BY h)),
         |kmv AS (SELECT DISTINCT h FROM keys ORDER BY h LIMIT 128),
         |th AS (SELECT max(h) AS theta, CAST(count(*) AS BIGINT) AS k_eff
         |       FROM kmv),
         |rho AS (
         |  SELECT CAST(sum(CASE WHEN nf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS rho
         |  FROM (SELECT k.h, count(DISTINCT keys.f) AS nf
         |        FROM kmv k JOIN keys ON keys.h = k.h GROUP BY k.h))
         |SELECT ex.n_a_exact, ex.n_r_exact, exi.union_exact, exi.inter_exact,
         |       th.k_eff, rho.rho,
         |       round(CAST(127 AS DOUBLE) / th.theta, 4) AS est_union,
         |       round(rho.rho * (CAST(127 AS DOUBLE) / th.theta) / 128, 4)
         |         AS est_inter,
         |       TRUE AS union_tol, TRUE AS inter_tol
         |FROM th, rho, ex, exi""".stripMargin,
    "sketch_hll_union" ->
      """SELECT CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_sketches,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_global,
        |       TRUE AS union_close, TRUE AS within_tol
        |FROM lineitem""".stripMargin,
    "sketch_hll_native" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sketch_hll" ->
      s"""WITH toks AS (
         |  SELECT t AS tok FROM (
         |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
         |  WHERE t <> ''),
         |hv AS (SELECT CAST(${fnvIhash31("tok")} AS BIGINT) AS h FROM toks),
         |rho AS (
         |  SELECT h % 64 AS bucket,
         |         CASE WHEN h // 64 = 0 THEN 26
         |              ELSE CAST(log2((h // 64) & (-(h // 64))) AS INT) + 1
         |         END AS rho
         |  FROM hv),
         |regs AS (
         |  SELECT g.bucket, CAST(COALESCE(MAX(rho.rho), 0) AS BIGINT) AS reg
         |  FROM (SELECT unnest(generate_series(0, 63)) AS bucket) g
         |  LEFT JOIN rho ON rho.bucket = g.bucket
         |  GROUP BY g.bucket),
         |st AS (
         |  SELECT 0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0
         |           / sum(pow(2.0, -reg)) AS raw,
         |         sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zeros
         |  FROM regs),
         |est AS (
         |  SELECT round(CASE WHEN raw <= 160.0 AND zeros > 0
         |                    THEN 64.0 * ln(64.0 / zeros)
         |                    ELSE raw END, 6) AS est_distinct
         |  FROM st),
         |ex AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
         |       FROM toks)
         |SELECT CAST(regs.bucket AS BIGINT) AS bucket, regs.reg,
         |       est.est_distinct, ex.exact_distinct
         |FROM regs, est, ex
         |ORDER BY bucket""".stripMargin,
    "sketch_bloom" ->
      s"""WITH names AS (SELECT DISTINCT p_name FROM part),
         |fbits AS (
         |  SELECT DISTINCT
         |    CAST(${fnvIhash31("p_name || '#' || CAST(i AS VARCHAR)")} % 65536
         |         AS BIGINT) AS pos
         |  FROM names, (SELECT unnest(generate_series(0, 2)) AS i)),
         |bs AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM fbits),
         |probes AS (
         |  SELECT DISTINCT probe FROM (
         |    SELECT p_name AS probe
         |    FROM (SELECT p_name FROM part ORDER BY p_partkey LIMIT 20)
         |    UNION ALL
         |    SELECT 'absent#' || CAST(i AS VARCHAR)
         |    FROM (SELECT unnest(generate_series(0, 19)) AS i))),
         |pp AS (
         |  SELECT probe,
         |    CAST(${fnvIhash31("probe || '#' || CAST(i AS VARCHAR)")} % 65536
         |         AS BIGINT) AS pos
         |  FROM probes, (SELECT unnest(generate_series(0, 2)) AS i)),
         |hits AS (
         |  SELECT pp.probe,
         |         CAST(min(CASE WHEN fbits.pos IS NULL THEN 0 ELSE 1 END)
         |              AS BIGINT) AS bloom_hit
         |  FROM pp LEFT JOIN fbits ON fbits.pos = pp.pos
         |  GROUP BY pp.probe),
         |truth AS (
         |  SELECT probe,
         |         CAST(CASE WHEN names.p_name IS NULL THEN 0 ELSE 1 END
         |              AS BIGINT) AS present
         |  FROM probes LEFT JOIN names ON names.p_name = probes.probe)
         |SELECT h.probe, t.present, h.bloom_hit,
         |       CAST(CASE WHEN h.bloom_hit = 1 AND t.present = 0
         |                 THEN 1 ELSE 0 END AS BIGINT) AS false_positive,
         |       bs.bits_set
         |FROM hits h JOIN truth t ON t.probe = h.probe, bs
         |ORDER BY h.probe""".stripMargin,
    "q_table_fingerprint" ->
      s"""WITH li AS (
         |  SELECT CAST(${fnvIhash31(
                  "concat_ws('|', CAST(l_orderkey AS VARCHAR), " +
                    "CAST(l_linenumber AS VARCHAR), CAST(l_suppkey AS VARCHAR), " +
                    "CAST(round(l_extendedprice * 100) AS BIGINT), " +
                    "CAST(floor(epoch(l_shipdate)) AS BIGINT))")} AS BIGINT) AS h
         |  FROM lineitem),
         |ord AS (
         |  SELECT CAST(${fnvIhash31(
                  "concat_ws('|', CAST(o_orderkey AS VARCHAR), " +
                    "CAST(o_custkey AS VARCHAR), o_orderstatus, " +
                    "CAST(round(o_totalprice * 100) AS BIGINT), " +
                    "CAST(floor(epoch(o_orderdate)) AS BIGINT))")} AS BIGINT) AS h
         |  FROM orders)
         |SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(h) AS BIGINT) AS h_sum, CAST(bit_xor(h) AS BIGINT) AS h_xor,
         |       CAST(min(h) AS BIGINT) AS h_min, CAST(max(h) AS BIGINT) AS h_max
         |FROM li
         |UNION ALL
         |SELECT 'orders', CAST(count(*) AS BIGINT),
         |       CAST(sum(h) AS BIGINT), CAST(bit_xor(h) AS BIGINT),
         |       CAST(min(h) AS BIGINT), CAST(max(h) AS BIGINT)
         |FROM ord
         |ORDER BY tbl""".stripMargin
  )
}
