package graft.queries

import graft.Tables
import graft.plans.{Fnv1a64, JaroWinkler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): match a corrupted feed back to its
  * clean master table — the canonical "same real-world entity, different
  * strings" pipeline (dedup across sources, catalog reconciliation,
  * user-input cleanup).
  *
  * The corpus is synthetic and typo-free, so the dirty feed is DERIVED
  * deterministically: a hash-picked sample of part rows each gets one
  * hash-picked corruption (delete / adjacent-transpose / substitute at a
  * hash-picked position ≥ 2). Both engines re-derive the identical feed
  * from the FNV fold, so the oracle checks the full match pipeline
  * end-to-end, not a fixture.
  *
  * Scale shape: the master name dimension is tiny (distinct names) →
  * broadcast; the dirty feed streams once; first-char blocking bounds the
  * per-row candidate set to one block instead of |master| — the standard
  * blocking/scoring split of record linkage at scale (blocking recall
  * trade-offs are the documented cost: a corruption in the blocking key
  * itself would be missed, which is why corruption positions start at 2).
  */
object MatchQueries {

  /** Hash-corrupted sample of part names: (p_partkey, dirty_name).
    * h = ihash31(partkey): mode = h%3 picks the corruption, pos =
    * (h div 3) % (len-2) + 2 ∈ [2, len-1] picks the position (first char
    * preserved ⇒ blocking-safe; pos+1 ≤ len ⇒ transpose in-bounds).
    */
  private def dirtyFeed(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 5 === 0 && length(col("p_name")) >= 4)
      .select(col("p_partkey"), col("p_name"))
      .withColumn("h", Fnv1a64.ihash31(col("p_partkey").cast("string")))
      .withColumn("pos",
        (expr("h div 3") % (length(col("p_name")) - 2) + 2).cast("int"))
      .withColumn("dirty_name",
        when(col("h") % 3 === 0, expr(
          "concat(substring(p_name, 1, pos-1), substring(p_name, pos+1))"))
        .when(col("h") % 3 === 1, expr(
          "concat(substring(p_name, 1, pos-1), substring(p_name, pos+1, 1)," +
            " substring(p_name, pos, 1), substring(p_name, pos+2))"))
        .otherwise(expr(
          "concat(substring(p_name, 1, pos-1), '0', substring(p_name, pos+1))")))
      .select("p_partkey", "dirty_name")

  /** Levenshtein linkage: block on first char + |len diff| ≤ 1, score with
    * the builtin edit distance, keep the best (min dist, then min name)
    * master per dirty row. Every feed row links (its own corruption is
    * ≤ 2 edits away and first-char blocking always admits the source).
    */
  def fuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val master = Tables.part(s, d).select(col("p_name").as("m_name")).distinct()
    val cand = dirtyFeed(s, d)
      .join(broadcast(master),
        substring(col("dirty_name"), 1, 1) === substring(col("m_name"), 1, 1) &&
          abs(length(col("dirty_name")) - length(col("m_name"))) <= 1)
      .withColumn("dist", levenshtein(col("dirty_name"), col("m_name")))
      .filter(col("dist") <= 2)
    val best = Window.partitionBy("p_partkey").orderBy(col("dist"), col("m_name"))
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("p_partkey"), col("dirty_name"),
        col("m_name").as("matched_name"), col("dist").cast("long").as("dist"))
      .orderBy("p_partkey")
  }

  /** Jaro-Winkler linkage via the native [[graft.plans.JaroWinkler]]
    * expression (Spark has no Jaro family builtin) — argmax score per
    * dirty row over the first-char block, thresholded at 0.8. Scores are
    * rounded to 6dp BEFORE the argmax/threshold so the DuckDB oracle
    * (native `jaro_winkler_similarity`, same 0.7-boost semantics) ranks
    * identically.
    */
  def jaroMatch(s: SparkSession, d: String): DataFrame = {
    val master = Tables.part(s, d).select(col("p_name").as("m_name")).distinct()
    val cand = dirtyFeed(s, d)
      .join(broadcast(master),
        substring(col("dirty_name"), 1, 1) === substring(col("m_name"), 1, 1))
      .withColumn("jw",
        round(JaroWinkler.jaroWinkler(col("dirty_name"), col("m_name")), 6))
    val best = Window.partitionBy("p_partkey")
      .orderBy(col("jw").desc, col("m_name"))
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1 && col("jw") >= 0.8)
      .select(col("p_partkey"), col("dirty_name"),
        col("m_name").as("matched_name"), col("jw"))
      .orderBy("p_partkey")
  }

  /** Sorted-neighborhood blocking — the OTHER classic blocking strategy
    * (first-char hash blocks above; LSH in the dedup family): master and
    * dirty records sort together on the name key, and ONLY records within
    * a w=10 window of the sorted order become candidate pairs, so
    * candidate generation is O(n·w) regardless of block-size skew (the
    * failure mode of hash blocking when one block goes hot). Ranks come
    * from the q_global_rank two-pass (range-partitioned sort +
    * zipWithIndex), and the window materializes as delta-explode + EQUI
    * join on rank — never a rank-range theta join. Candidates verify with
    * edit distance ≤ 2 and keep the best master per dirty row.
    * Neighborhood recall is a documented trade (a pair separated by > w
    * strangers in sort order is missed); the oracle restates the same
    * window, so recall is gated exactly, not estimated.
    */
  def sortedNeighborhood(s: SparkSession, d: String, w: Int = 10): DataFrame = {
    val master = Tables.part(s, d).select(col("p_name")).distinct()
      .select(lit(-1L).as("rid"), col("p_name").as("name"), lit("m").as("tag"))
    val dirty = dirtyFeed(s, d)
      .select(col("p_partkey").as("rid"), col("dirty_name").as("name"),
        lit("d").as("tag"))
    val sorted = master.union(dirty).orderBy("name", "tag", "rid")
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = s.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
    val probes = ranked.select(col("rid").as("rid1"), col("name").as("name1"),
        col("tag").as("tag1"),
        explode(sequence(lit(1), lit(w - 1))).as("delta"),
        col("rank"))
      .select(col("rid1"), col("name1"), col("tag1"),
        (col("rank") + col("delta")).as("rank"))
    val cands = probes.join(ranked, "rank")
      .filter(col("tag1") =!= col("tag"))
      .select(
        when(col("tag1") === "d", col("rid1")).otherwise(col("rid")).as("p_partkey"),
        when(col("tag1") === "d", col("name1")).otherwise(col("name")).as("dirty_name"),
        when(col("tag1") === "d", col("name")).otherwise(col("name1")).as("m_name"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("m_name")))
      .filter(col("dist") <= 2)
    val best = Window.partitionBy("p_partkey").orderBy(col("dist"), col("m_name"))
    cands.withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("p_partkey"), col("dirty_name"),
        col("m_name").as("matched_name"), col("dist").cast("long").as("dist"))
      .orderBy("p_partkey")
  }

  /** Golden-record consolidation — the step AFTER matching: three
    * deterministically-derived versions of every 5th part (clean, one
    * 1-edit name corruption + a null, a price outlier + a conditional
    * null) collapse into one consensus row by per-field majority vote
    * over non-null values, ties to the smallest value. Implemented in
    * LONG format — (entity, field, value) — so ONE count + ONE window
    * argmax resolves every field at once and adding a field costs zero
    * new shuffles; the winner pivots back with conditional aggregates.
    */
  def goldenRecord(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d)
      .filter(col("p_partkey") % 5 === 0 && length(col("p_name")) >= 4)
      .withColumn("h", Fnv1a64.ihash31(col("p_partkey").cast("string")))
      .withColumn("dirty_name", concat(substring(col("p_name"), 1, 1),
        lit("0"), expr("substring(p_name, 3)")))
      .withColumn("price_c", round(col("p_retailprice") * 100).cast("long"))
    val versions = base.select(col("p_partkey"), explode(array(
        struct(col("p_name").as("name"), lit(null).cast("string").as("brand"),
          col("p_size").cast("string").as("size"),
          col("price_c").cast("string").as("price")),
        struct(col("dirty_name").as("name"), col("p_brand").as("brand"),
          lit(null).cast("string").as("size"),
          (col("price_c") + 1).cast("string").as("price")),
        struct(col("p_name").as("name"), col("p_brand").as("brand"),
          when(col("h") % 2 === 0, col("p_size").cast("string")).as("size"),
          col("price_c").cast("string").as("price")))).as("v"))
    val long = versions.select(col("p_partkey"),
        explode(array(
          struct(lit("name").as("field"), col("v.name").as("value")),
          struct(lit("brand").as("field"), col("v.brand").as("value")),
          struct(lit("size").as("field"), col("v.size").as("value")),
          struct(lit("price").as("field"), col("v.price").as("value")))).as("f"))
      .select(col("p_partkey"), col("f.field").as("field"), col("f.value").as("value"))
      .filter(col("value").isNotNull)
    val w = Window.partitionBy("p_partkey", "field")
      .orderBy(col("cnt").desc, col("value"))
    long.groupBy("p_partkey", "field", "value").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("p_partkey")
      .agg(max(when(col("field") === "name", col("value"))).as("name_g"),
        max(when(col("field") === "brand", col("value"))).as("brand_g"),
        max(when(col("field") === "size", col("value"))).as("size_g"),
        max(when(col("field") === "price", col("value"))).as("price_g"))
      .orderBy("p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_golden_record" -> (goldenRecord(_, _)),
    "er_fuzzy_match" -> (fuzzyMatch(_, _)),
    "er_jaro_winkler" -> (jaroMatch(_, _)),
    "er_sorted_neighborhood" -> (sortedNeighborhood(_, _))
  )

  /** Shared oracle CTE: the identical hash-corrupted feed. NOTE: this
    * fragment is interpolated into strings that are stripMargin'd again,
    * so no line may start with `|` (e.g. a leading `||` concat would lose
    * a pipe and turn into bitwise OR).
    */
  private val feedSql =
    s"""feed AS (
       |  SELECT p_partkey, p_name,
       |         CAST(${OracleSql.fnvIhash31("CAST(p_partkey AS VARCHAR)")} AS BIGINT) AS h,
       |         length(p_name) AS len
       |  FROM part WHERE p_partkey % 5 = 0 AND length(p_name) >= 4),
       |dirty AS (
       |  SELECT p_partkey,
       |         CASE h % 3
       |           WHEN 0 THEN substr(p_name, 1, pos-1) || substr(p_name, pos+1)
       |           WHEN 1 THEN substr(p_name, 1, pos-1) || substr(p_name, pos+1, 1) ||
       |                         substr(p_name, pos, 1) || substr(p_name, pos+2)
       |           ELSE substr(p_name, 1, pos-1) || '0' || substr(p_name, pos+1)
       |         END AS dirty_name
       |  FROM (SELECT *, CAST((h // 3) % (len - 2) + 2 AS INTEGER) AS pos FROM feed)),
       |master AS (SELECT DISTINCT p_name AS m_name FROM part)""".stripMargin

  val oracles: Map[String, String] = Map(
    "er_golden_record" ->
      s"""WITH base AS (
         |  SELECT p_partkey, p_name, p_brand,
         |         substr(p_name, 1, 1) || '0' || substr(p_name, 3) AS dirty_name,
         |         CAST(p_size AS VARCHAR) AS size_s,
         |         CAST(CAST(round(p_retailprice * 100) AS BIGINT) AS VARCHAR)
         |           AS price_s,
         |         CAST(CAST(round(p_retailprice * 100) AS BIGINT) + 1 AS VARCHAR)
         |           AS price1_s,
         |         CAST(${OracleSql.fnvIhash31("CAST(p_partkey AS VARCHAR)")}
         |              AS BIGINT) AS h
         |  FROM part WHERE p_partkey % 5 = 0 AND length(p_name) >= 4),
         |long AS (
         |  SELECT p_partkey, 'name' AS field, p_name AS value FROM base
         |  UNION ALL SELECT p_partkey, 'name', dirty_name FROM base
         |  UNION ALL SELECT p_partkey, 'name', p_name FROM base
         |  UNION ALL SELECT p_partkey, 'brand', p_brand FROM base
         |  UNION ALL SELECT p_partkey, 'brand', p_brand FROM base
         |  UNION ALL SELECT p_partkey, 'size', size_s FROM base
         |  UNION ALL SELECT p_partkey, 'size',
         |    CASE WHEN h % 2 = 0 THEN size_s END FROM base
         |  UNION ALL SELECT p_partkey, 'price', price_s FROM base
         |  UNION ALL SELECT p_partkey, 'price', price1_s FROM base
         |  UNION ALL SELECT p_partkey, 'price', price_s FROM base),
         |winners AS (
         |  SELECT p_partkey, field, value FROM (
         |    SELECT p_partkey, field, value, count(*) AS cnt,
         |           row_number() OVER (PARTITION BY p_partkey, field
         |               ORDER BY count(*) DESC, value) AS rn
         |    FROM long WHERE value IS NOT NULL GROUP BY 1, 2, 3)
         |  WHERE rn = 1)
         |SELECT p_partkey,
         |       max(CASE WHEN field = 'name' THEN value END) AS name_g,
         |       max(CASE WHEN field = 'brand' THEN value END) AS brand_g,
         |       max(CASE WHEN field = 'size' THEN value END) AS size_g,
         |       max(CASE WHEN field = 'price' THEN value END) AS price_g
         |FROM winners GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "er_fuzzy_match" ->
      s"""WITH $feedSql,
         |cand AS (
         |  SELECT d.p_partkey, d.dirty_name, m.m_name,
         |         levenshtein(d.dirty_name, m.m_name) AS dist
         |  FROM dirty d JOIN master m
         |    ON substr(d.dirty_name, 1, 1) = substr(m.m_name, 1, 1)
         |   AND abs(length(d.dirty_name) - length(m.m_name)) <= 1
         |  WHERE levenshtein(d.dirty_name, m.m_name) <= 2),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY p_partkey
         |                               ORDER BY dist, m_name) AS rn
         |  FROM cand)
         |SELECT p_partkey, dirty_name, m_name AS matched_name,
         |       CAST(dist AS BIGINT) AS dist
         |FROM best WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "er_sorted_neighborhood" ->
      s"""WITH $feedSql,
         |allr AS (
         |  SELECT CAST(-1 AS BIGINT) AS rid, m_name AS name, 'm' AS tag
         |  FROM master
         |  UNION ALL
         |  SELECT p_partkey, dirty_name, 'd' FROM dirty),
         |ranked AS (
         |  SELECT rid, name, tag,
         |         row_number() OVER (ORDER BY name, tag, rid) - 1 AS rank
         |  FROM allr),
         |cands AS (
         |  SELECT CASE WHEN a.tag = 'd' THEN a.rid ELSE b.rid END AS p_partkey,
         |         CASE WHEN a.tag = 'd' THEN a.name ELSE b.name END AS dirty_name,
         |         CASE WHEN a.tag = 'd' THEN b.name ELSE a.name END AS m_name
         |  FROM ranked a JOIN ranked b
         |    ON b.rank BETWEEN a.rank + 1 AND a.rank + 9
         |  WHERE a.tag <> b.tag),
         |scored AS (
         |  SELECT p_partkey, dirty_name, m_name,
         |         levenshtein(dirty_name, m_name) AS dist
         |  FROM cands WHERE levenshtein(dirty_name, m_name) <= 2),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY p_partkey
         |                               ORDER BY dist, m_name) AS rn
         |  FROM scored)
         |SELECT p_partkey, dirty_name, m_name AS matched_name,
         |       CAST(dist AS BIGINT) AS dist
         |FROM best WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "er_jaro_winkler" ->
      s"""WITH $feedSql,
         |cand AS (
         |  SELECT d.p_partkey, d.dirty_name, m.m_name,
         |         round(jaro_winkler_similarity(d.dirty_name, m.m_name), 6) AS jw
         |  FROM dirty d JOIN master m
         |    ON substr(d.dirty_name, 1, 1) = substr(m.m_name, 1, 1)),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY p_partkey
         |                               ORDER BY jw DESC, m_name) AS rn
         |  FROM cand)
         |SELECT p_partkey, dirty_name, m_name AS matched_name, jw
         |FROM best WHERE rn = 1 AND jw >= 0.8 ORDER BY p_partkey""".stripMargin
  )
}
