package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the function surface: ordered-selection aggregates,
  * statistical aggregates, distribution windows + RANGE frames, grouping
  * sets, null-handling, extended string/date functions, regexp-all, map
  * values, conditional counts, bitwise aggregates — each oracle-checked.
  */
object FunctionQueries2 {

  /** max_by/min_by with a struct tie-break so selection is deterministic. */
  def minmaxBy(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        max_by(col("l_orderkey"), struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))).as("key_of_max_price"),
        min_by(col("l_orderkey"), struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))).as("key_of_min_price"),
        round(max("l_extendedprice"), 2).as("max_price"))
      .orderBy("l_returnflag")

  /** Statistical aggregates (sample stddev/variance, correlation, covariance). */
  def statsAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"))
      .orderBy("l_returnflag")

  /** Distribution windows: ntile / percent_rank / cume_dist over a unique
    * ordering, plus a value-based RANGE frame sum.
    */
  def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val byBal = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val byBalRange = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal")).rangeBetween(-500L, 0L)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(byBal).as("quartile"),
        round(percent_rank().over(byBal), 6).as("prank"),
        round(cume_dist().over(byBal), 6).as("cdist"),
        round(sum(col("c_acctbal")).over(byBalRange), 2).as("range_sum"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** GROUPING SETS — the general form rollup/cube specialize. */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  /** Null-handling scalars over injected nulls. */
  def nullFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_returnflag"), lit("A")).as("flag_or_null"),
        coalesce(nullif(col("l_returnflag"), lit("A")), lit("-")).as("flag_coalesced"),
        least(col("l_quantity"), col("l_discount") * 100).as("least_v"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("greatest_v"))
      .filter(col("l_orderkey") < 300)
      .orderBy("l_orderkey", "l_linenumber")

  /** Extended string functions. */
  def stringFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        translate(col("p_brand"), "#", "_").as("brand_t"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        rpad(col("p_name"), 12, ".").as("name_padded"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        repeat(col("p_brand"), 2).as("brand2"),
        reverse(col("p_name")).as("name_rev"))
      .orderBy("p_partkey")

  /** Extended date/time functions on event timestamps. */
  def dateFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("sec"),
        quarter(col("ts")).cast("long").as("q"),
        last_day(col("ts")).cast("string").as("month_end"),
        date_add(col("ts").cast("date"), 30).cast("string").as("plus30"))
      .orderBy("event_id")

  /** regexp_extract_all, joined for scalar comparison. */
  def regexpAll(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        array_join(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)), ",").as("vowel_runs"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0))).cast("long").as("n_runs"))
      .orderBy("p_partkey")

  /** collect_set → sorted joined string (dedup collection). */
  def collectSet(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("flags"),
        size(collect_set(col("l_linenumber"))).cast("long").as("n_distinct_ln"))
      .orderBy("l_suppkey")

  /** Map values built + consumed Spark-side, emitted as a canonical string. */
  def mapFuncs(s: SparkSession, d: String): DataFrame = {
    val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
    Tables.part(s, d)
      .select(col("p_partkey"),
        array_join(sort_array(map_keys(m)), ",").as("mkeys"),
        element_at(m, "brand").as("brand_val"),
        size(m).cast("long").as("msize"))
      .orderBy("p_partkey")
  }

  /** Conditional counting: count_if / filtered aggregates. */
  def countIf(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .agg(
        count_if(col("l_quantity") > 25).as("n_heavy"),
        count_if(col("l_discount") === 0.0).as("n_nodisc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_linestatus")

  /** Bitwise aggregates over keys. */
  def bitwiseAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        bit_and(col("l_orderkey")).as("band"),
        bit_or(col("l_orderkey")).as("bor"),
        bit_xor(col("l_orderkey")).as("bxor"))
      .orderBy("l_returnflag")

  /** first_value / last_value / nth_value over a running frame. */
  def windowFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Array set algebra as scalars: union/intersect/except of per-row arrays,
    * emitted sorted+joined for canonical comparison.
    */
  def arraySetOps(s: SparkSession, d: String): DataFrame = {
    val a = sequence(lit(1), col("l_linenumber"))
    val b = sequence(col("l_linenumber"), lit(7))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        array_join(array_sort(array_union(a, b)), ",").as("au"),
        array_join(array_sort(array_intersect(a, b)), ",").as("ai"),
        array_join(array_sort(array_except(a, b)), ",").as("ae"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Cryptographic digests + binary encodings — the content-address /
    * fingerprint surface (md5/sha256 for content ids, base64/hex for
    * binary transport). hex is lower()ed on both sides: Spark emits
    * uppercase A-F, DuckDB lowercase.
    */
  def hashFuncs(s: SparkSession, d: String): DataFrame =
    graft.Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"),
        md5(col("p_name").cast("binary")).as("name_md5"),
        sha2(col("p_name").cast("binary"), 256).as("name_sha256"),
        base64(col("p_name").cast("binary")).as("name_b64"),
        lower(hex(col("p_name").cast("binary"))).as("name_hex"),
        // round-trip proof: decode(unbase64(base64(x))) == x
        (decode(unbase64(base64(col("p_name").cast("binary"))), "UTF-8")
          === col("p_name")).as("b64_roundtrip"))
      .orderBy("p_partkey")

  /** Spark 4 XML surface: each document serialized with `to_xml` and
    * parsed back with `from_xml`; the parsed fields are emitted and must
    * hash-equal the originals (the oracle just selects them from the
    * fixture), so XML escaping of free text — quotes, angle brackets,
    * ampersands — plus numeric field typing round-trip exactly. The XML
    * string itself is never output (its formatting is engine-specific);
    * the CONTENT is what is gated.
    */
  def xmlFuncs(s: SparkSession, d: String): DataFrame = {
    val xmlSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    Tables.documents(s, d)
      .withColumn("xml",
        to_xml(struct(col("lang"), col("n_chars"), col("text"))))
      .withColumn("p", from_xml(col("xml"), xmlSchema))
      .select(col("doc_id"), col("p.lang").as("parsed_lang"),
        col("p.n_chars").as("parsed_n_chars"),
        col("p.text").as("parsed_text"))
      .orderBy("doc_id")
  }

  /** Ordered string aggregation: Spark 4's `listagg ... WITHIN GROUP`
    * (ANSI ordered-set aggregate) — the deterministic form of
    * concat-the-group; the explicit ORDER BY is what makes the result
    * partition-independent (an unordered listagg is nondeterministic by
    * definition and would never pass a hash oracle).
    */
  def listaggQ(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .groupBy("n_regionkey")
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("nations"),
        count(lit(1)).as("n"))
      .orderBy("n_regionkey")

  /** OUTER generator semantics (`posexplode_outer`): rows whose array is
    * empty survive with NULL (pos, tok) instead of vanishing — the
    * LEFT-JOIN-shaped explode every flatten-then-aggregate pipeline needs
    * when "no matches" must stay observable. The filter keeps only long
    * tokens so the fixture exercises BOTH branches (docs with and without
    * survivors).
    */
  def explodeOuter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => length(t) >= 8).as("lst"))
      .select(col("doc_id"), posexplode_outer(col("lst")).as(Seq("pos", "tok")))
      .orderBy("doc_id", "pos")

  /** Map higher-order functions — transform_values / map_filter /
    * map_entries over a per-user event_type→count map (built with a
    * SORTED entry list so map iteration order is deterministic): counts
    * double, small entries filter out, survivors explode back to rows.
    * The oracle states the same pointwise pipeline relationally, which is
    * exactly what the map HOFs guarantee.
    */
  def mapHof(s: SparkSession, d: String): DataFrame = {
    val m = Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("event_type"), col("c"))))).as("m"))
      .withColumn("m2", transform_values(col("m"), (_, v) => v * 2))
      .withColumn("m3", map_filter(col("m2"), (_, v) => v >= lit(8L)))
    m.select(col("user_id"), explode(map_entries(col("m3"))).as(Seq("x")))
      .select(col("user_id"), col("x.key").as("event_type"),
        col("x.value").as("doubled"))
      .orderBy("user_id", "event_type")
  }

  /** Row-level CSV codec expressions (`to_csv` / `from_csv`): each order
    * serializes to one CSV line and parses back; the aggregate proves the
    * round trip is lossless and pins the lexicographic extremes of the
    * encoded lines (so the encoding itself — not just the parsed values —
    * is oracle-checked).
    */
  def csvExpr(s: SparkSession, d: String): DataFrame = {
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
    val line = to_csv(struct(col("o_orderkey"), col("o_orderstatus"),
      col("o_orderpriority")))
    val parsed = from_csv(line,
      lit("o_orderkey BIGINT, o_orderstatus STRING, o_orderpriority STRING"),
      new java.util.HashMap[String, String]())
    src.withColumn("line", line).withColumn("p", parsed)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("p.o_orderkey") === col("o_orderkey") &&
          col("p.o_orderstatus") === col("o_orderstatus") &&
          col("p.o_orderpriority") === col("o_orderpriority"), 1L)
          .otherwise(0L)).as("n_ok"),
        min(col("line")).as("min_line"), max(col("line")).as("max_line"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_map_hof" -> (mapHof(_, _)),
    "q_csv_expr" -> (csvExpr(_, _)),
    "q_explode_outer" -> (explodeOuter(_, _)),
    "q_listagg" -> (listaggQ(_, _)),
    "q_xml_funcs" -> (xmlFuncs(_, _)),
    "q_hash_funcs" -> (hashFuncs(_, _)),
    "q_window_firstlast" -> (windowFirstLast(_, _)),
    "q_array_setops" -> (arraySetOps(_, _)),
    "q_minmax_by" -> (minmaxBy(_, _)),
    "q_stats_agg" -> (statsAgg(_, _)),
    "q_window_distribution" -> (windowDistribution(_, _)),
    "q_grouping_sets" -> (groupingSets(_, _)),
    "q_null_funcs" -> (nullFuncs(_, _)),
    "q_string_funcs2" -> (stringFuncs2(_, _)),
    "q_date_funcs2" -> (dateFuncs2(_, _)),
    "q_regexp_all" -> (regexpAll(_, _)),
    "q_collect_set" -> (collectSet(_, _)),
    "q_map_funcs" -> (mapFuncs(_, _)),
    "q_count_if" -> (countIf(_, _)),
    "q_bitwise_agg" -> (bitwiseAgg(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_map_hof" ->
      """SELECT user_id, event_type,
        |       CAST(count(*) * 2 AS BIGINT) AS doubled
        |FROM events GROUP BY user_id, event_type
        |HAVING count(*) * 2 >= 8
        |ORDER BY user_id, event_type""".stripMargin,
    "q_csv_expr" ->
      """WITH l AS (
        |  SELECT o_orderkey,
        |         CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus
        |           || ',' || o_orderpriority AS line
        |  FROM orders)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_ok,
        |       min(line) AS min_line, max(line) AS max_line
        |FROM l""".stripMargin,
    "q_explode_outer" ->
      """WITH l AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '),
        |                     t -> length(t) >= 8) AS lst
        |  FROM documents),
        |x AS (SELECT doc_id,
        |             CASE WHEN len(lst) = 0 THEN [NULL] ELSE lst END AS lst2
        |      FROM l),
        |u AS (SELECT doc_id, unnest(lst2) AS tok,
        |             unnest(range(len(lst2))) AS i FROM x)
        |SELECT doc_id,
        |       CASE WHEN tok IS NULL THEN NULL ELSE CAST(i AS INT) END AS pos,
        |       tok
        |FROM u ORDER BY doc_id, pos""".stripMargin,
    "q_listagg" ->
      """SELECT n_regionkey,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |       count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    // the XML writer/parser is Spark's; the oracle pins that parsed
    // content equals the source fields exactly
    "q_xml_funcs" ->
      """SELECT doc_id, lang AS parsed_lang,
        |       CAST(n_chars AS BIGINT) AS parsed_n_chars,
        |       text AS parsed_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_hash_funcs" ->
      """SELECT p_partkey, p_name,
        |       md5(p_name) AS name_md5,
        |       sha256(p_name) AS name_sha256,
        |       to_base64(CAST(p_name AS BLOB)) AS name_b64,
        |       lower(hex(p_name)) AS name_hex,
        |       (CAST(from_base64(to_base64(CAST(p_name AS BLOB))) AS VARCHAR)
        |          = p_name) AS b64_roundtrip
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_orderkey) OVER w AS first_ok,
        |       last_value(o_orderkey) OVER w AS last_ok,
        |       nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_array_setops" ->
      """SELECT l_orderkey, l_linenumber,
        |       coalesce(list_aggregate(list_sort(list_distinct(
        |         list_concat(generate_series(1, l_linenumber),
        |                     generate_series(l_linenumber, 7)))), 'string_agg', ','), '') AS au,
        |       coalesce(list_aggregate(list_sort(list_distinct(list_filter(
        |         generate_series(1, l_linenumber),
        |         x -> list_contains(generate_series(l_linenumber, 7), x)))), 'string_agg', ','), '') AS ai,
        |       coalesce(list_aggregate(list_sort(list_distinct(list_filter(
        |         generate_series(1, l_linenumber),
        |         x -> NOT list_contains(generate_series(l_linenumber, 7), x)))), 'string_agg', ','), '') AS ae
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // arg_max/arg_min on a zero-padded fixed-width composite key instead
    // of two full window sorts: the row_number form spilled >40 GB sorting
    // 600M rows TWICE at sf100 and blew the sandbox disk (r9 gate);
    // lexicographic order on the padded string equals the numeric
    // composite order (all parts non-negative: price_c ≤ 8 digits,
    // orderkey ≤ 15 digits at sf100, linenumber ≤ 7), so this is the same
    // answer from one hash aggregate. DuckDB's lpad silently TRUNCATES a
    // string longer than the pad width — which would silently mis-order
    // the composite instead of erroring — so the CASE guard below fails
    // the oracle loudly if any part outgrows its width (r10, ADVICE item)
    "q_minmax_by" ->
      """WITH p AS (
        |  SELECT l_returnflag, l_orderkey, l_extendedprice,
        |         CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR) AS pc,
        |         CAST(l_orderkey AS VARCHAR) AS ok,
        |         CAST(l_linenumber AS VARCHAR) AS ln
        |  FROM lineitem),
        |k AS (
        |  SELECT l_returnflag, l_orderkey, l_extendedprice,
        |         CASE WHEN length(pc) <= 12 AND length(ok) <= 16 AND length(ln) <= 2
        |              THEN lpad(pc, 12, '0') || lpad(ok, 16, '0') || lpad(ln, 2, '0')
        |              ELSE error('q_minmax_by composite-key overflow: widen the lpad widths')
        |         END AS ck
        |  FROM p)
        |SELECT l_returnflag,
        |       arg_max(l_orderkey, ck) AS key_of_max_price,
        |       arg_min(l_orderkey, ck) AS key_of_min_price,
        |       round(max(l_extendedprice), 2) AS max_price
        |FROM k GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 4) AS sd_qty,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       round(corr(l_quantity, l_discount), 6) AS corr_qd,
        |       round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_window_distribution" ->
      """SELECT c_mktsegment, c_custkey,
        |       CAST(ntile(4) OVER wu AS INT) AS quartile,
        |       round(percent_rank() OVER wu, 6) AS prank,
        |       round(cume_dist() OVER wu, 6) AS cdist,
        |       round(sum(c_acctbal) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
        |             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW), 2) AS range_sum
        |FROM customer
        |WINDOW wu AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q_null_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       nullif(l_returnflag, 'A') AS flag_or_null,
        |       coalesce(nullif(l_returnflag, 'A'), '-') AS flag_coalesced,
        |       least(l_quantity, l_discount * 100) AS least_v,
        |       greatest(l_quantity, l_discount * 100) AS greatest_v
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        |       split_part(p_type, ' ', 1) AS type_head,
        |       translate(p_brand, '#', '_') AS brand_t,
        |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        |       rpad(p_name, 12, '.') AS name_padded,
        |       CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        |       repeat(p_brand, 2) AS brand2,
        |       reverse(p_name) AS name_rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs2" ->
      """SELECT event_id,
        |       CAST(hour(ts) AS BIGINT) AS h,
        |       CAST(minute(ts) AS BIGINT) AS mi,
        |       CAST(second(ts) AS BIGINT) AS sec,
        |       CAST(quarter(ts) AS BIGINT) AS q,
        |       CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
        |       CAST(CAST(ts AS DATE) + 30 AS VARCHAR) AS plus30
        |FROM events ORDER BY event_id""".stripMargin,
    "q_regexp_all" ->
      """SELECT p_partkey,
        |       list_aggregate(regexp_extract_all(p_name, '[aeiou]+'), 'string_agg', ',') AS vowel_runs,
        |       CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_runs
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_collect_set" ->
      """SELECT l_suppkey,
        |       string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags,
        |       CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct_ln
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_map_funcs" ->
      """SELECT p_partkey,
        |       'brand,type' AS mkeys,
        |       p_brand AS brand_val,
        |       CAST(2 AS BIGINT) AS msize
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_count_if" ->
      """SELECT l_linestatus,
        |       CAST(count_if(l_quantity > 25) AS BIGINT) AS n_heavy,
        |       CAST(count_if(l_discount = 0.0) AS BIGINT) AS n_nodisc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_bitwise_agg" ->
      """SELECT l_returnflag,
        |       bit_and(l_orderkey) AS band,
        |       bit_or(l_orderkey) AS bor,
        |       bit_xor(l_orderkey) AS bxor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
