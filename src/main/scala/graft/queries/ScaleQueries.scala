package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 data-layout + incremental-maintenance operators: the table-
  * management half of a 100 TB engine. The reference's surface stops at
  * map→shuffle→reduce over static files (/root/reference/design.md:1-171);
  * a production corpus additionally needs its physical layout *planned*
  * (compaction, multi-dimensional clustering, pruning telemetry) and its
  * derived tables *maintained incrementally* (SCD2 history, upsert/MERGE,
  * gap interpolation). Each operator here is the metadata/plan side of
  * those jobs — deterministic, oracled, and shaped so the heavy input is a
  * file-level or key-level aggregate that is orders of magnitude smaller
  * than the corpus it describes.
  */
object ScaleQueries {

  /** Small-file compaction planning (the OPTIMIZE bin-packer): treat each
    * document as a file (bytes = n_chars), walk files per source in id
    * order, and assign each to output bin floor(exclusive_prefix / target)
    * — the sorted-cumsum packing Delta/Iceberg compaction uses to emit
    * ~target-sized files without a second pass.
    *
    * Scale shape: this is a METADATA query — at 100 TB the input is the
    * file listing (file count ≪ row count), the window partitions by
    * source (bounded groups, no global range exchange), and the output
    * plan (bin → file list) is what the rewrite job fans out on. Integer
    * arithmetic throughout; the division is exact below 2^53.
    */
  def compactionPlan(s: SparkSession, d: String, target: Long = 4096L): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").as("bytes"))
      .withColumn("cum", sum("bytes").over(w))
      .withColumn("bin", ((col("cum") - col("bytes")) / lit(target)).cast("long"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "bin")
  }

  /** Morton/Z-order clustering key: interleave the low 8 bits of two
    * dimensions (nation key; account balance mod 256) and bucket rows by
    * the top bits of the resulting 16-bit key. Per-bucket min/max of BOTH
    * dimensions demonstrates the point of the curve: every bucket covers a
    * small rectangle in (x, y) space, so file-level min/max stats prune
    * scans on EITHER dimension — the property a single-column sort cannot
    * give. At 100 TB this key feeds a range-partitioned sorted write; the
    * query itself is one scan + one 64-group aggregate, no join.
    *
    * Bit interleave is a codegen'd expression fold (shift/and/add — no
    * UDF); the oracle mirrors it with the same integer arithmetic.
    */
  def zorderStats(s: SparkSession, d: String): DataFrame = {
    val x = col("c_nationkey").cast("long").bitwiseAND(255L)
    val y = pmod(floor(col("c_acctbal")).cast("long"), lit(256L))
    val z = (0 until 8).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(col("x"), i).bitwiseAND(1L) * lit(1L << (2 * i)) +
        shiftright(col("y"), i).bitwiseAND(1L) * lit(1L << (2 * i + 1))
    }
    Tables.customer(s, d)
      .select(x.as("x"), y.as("y"))
      .withColumn("zkey", z)
      .withColumn("zbucket", shiftright(col("zkey"), 10))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .withColumn("span", col("max_x") - col("min_x") + col("max_y") - col("min_y"))
      .orderBy("zbucket")
  }

  /** File-pruning telemetry: how many files must be scanned for a range
    * predicate, under the natural (insertion-order) layout vs a
    * sort-clustered layout. Both layouts split orders into the same 15
    * equal-size files (ntile) — one tiled in insertion order, one tiled in
    * price order — and each file carries min/max(o_totalprice) zone stats.
    * For ten 50k-wide price bands, a file is scanned iff [min,max] overlaps
    * the band. The natural layout scans ~every file for every band (price
    * uncorrelated with insertion order); the price-clustered layout scans
    * ~1-3 — the measured argument for sort-before-write, and exactly the
    * statistic a table optimizer reports at 100 TB (computed purely on
    * file metadata; the per-row ntile here stands in for the file listing
    * a real catalog already has).
    */
  def pruningStats(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    // r12 (guide §2 / VERDICT): the per-row ntile rode an UNPARTITIONED
    // window unconditionally — a single-partition sort of every order at
    // 100 TB. Hybrid now (rationale at TwoPass.smallInput): under the
    // row-count gate (parquet-footer stats, zero jobs) the classic window
    // stays — bounded input, and 2× cheaper at fixture scale; past it
    // TwoPass.globalNtile reproduces ntile's exact bucket boundaries from
    // a range-partitioned global rank (same file_id values bit-for-bit —
    // TwoPassSpec, and the pure two-pass form was oracle-gated green at
    // all three fixture SFs before the gate landed). Both orders are
    // total because o_orderkey tie-breaks.
    val small = TwoPass.smallInput(s, Tables.rowCount(s, d, "orders"))
    def tiled(keys: Seq[Column]): DataFrame =
      if (small) o.withColumn("file_id",
        ntile(15).over(Window.orderBy(keys: _*)).cast("long"))
      else TwoPass.globalNtile(o, 15, keys, "file_id")
    val natural = tiled(Seq(col("o_orderkey")))
    val sorted = tiled(Seq(col("o_totalprice"), col("o_orderkey")))
    def zones(df: DataFrame): DataFrame =
      df.groupBy("file_id")
        .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
    // file count from the 15-row zone aggregate, not a third pass over
    // the global-window sort
    val zonesNat = zones(natural)
    val nFiles = zonesNat.agg(count(lit(1)).as("nf"))
    val bands = s.range(0, 10).select(col("id").as("band"),
      (col("id") * 50000.0).as("lo"), ((col("id") + 1) * 50000.0).as("hi"))
    def scanned(zs: DataFrame, name: String): DataFrame =
      bands.crossJoin(zs)
        .groupBy("band", "lo", "hi")
        .agg(sum(when(col("mn") <= col("hi") && col("mx") >= col("lo"), 1L)
          .otherwise(0L)).as(name))
    scanned(zonesNat, "scan_natural")
      .join(scanned(zones(sorted), "scan_sorted"), Seq("band", "lo", "hi"))
      .crossJoin(nFiles)
      .select(col("band"), col("lo"), col("hi"),
        col("scan_natural"), col("scan_sorted"), col("nf").as("n_files_natural"))
      .orderBy("band")
  }

  /** SCD type-2 history maintenance: apply a change set (latest qualifying
    * order per customer — row_number over (date DESC, key DESC), the
    * deterministic max_by) to the customer dimension, emitting effective-
    * dated rows: the original row closes at the change date (valid_to) and
    * the changed row opens there, current. One broadcastable change set +
    * one key-partitioned join — the standard nightly-dimension-merge shape;
    * at 100 TB the change set is the day's delta, orders of magnitude
    * smaller than the dimension, and the union is written partition-wise.
    */
  def scd2Merge(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = Tables.orders(s, d)
      .filter(col("o_orderkey") % 7 === 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("custkey"),
        round(col("o_totalprice"), 2).as("new_bal"),
        col("o_orderdate").as("eff"))
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("custkey"), round(col("c_acctbal"), 2).as("bal"))
    val closed = base.join(changes, Seq("custkey"), "left")
      .select(col("custkey"), col("bal").as("balance"),
        to_timestamp(lit("1990-01-01")).as("valid_from"),
        col("eff").as("valid_to"), col("eff").isNull.as("is_current"))
    val opened = base.join(changes, Seq("custkey"))
      .select(col("custkey"), col("new_bal").as("balance"),
        col("eff").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current"))
    closed.unionAll(opened).orderBy("custkey", "valid_from")
  }

  /** MERGE / upsert semantics (the Delta `MERGE INTO` core) as a full
    * outer join: target = a customer subset, source = per-customer order
    * aggregates. Matched keys update, source-only keys insert, target-only
    * keys keep — each row labeled with its op. At 100 TB both sides
    * shuffle on the merge key once (or the delta broadcasts when small);
    * the op labels are exactly the row-level actions a copy-on-write
    * rewrite would apply file-by-file.
    */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val target = Tables.customer(s, d)
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("custkey"), round(col("c_acctbal"), 2).as("bal"))
    val source = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
    target.join(source, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        round(coalesce(col("spend"), col("bal")), 2).as("balance"),
        when(col("bal").isNotNull && col("spend").isNotNull, "update")
          .when(col("bal").isNull, "insert")
          .otherwise("keep").as("op"))
      .orderBy("custkey")
  }

  /** Time-series gap interpolation: fold events onto a 24-slot 5-minute
    * grid (minute-of-day mod 120 — every event lands on the grid, so the
    * profile is dense at every SF), declare every third slot a sensor gap,
    * and fill gaps by linear interpolation between the nearest observed
    * slots (edge gaps fall back to nearest-observed). The
    * interpolation frame is IGNORE-NULLS window functions over the slot
    * grid — per-type partitions, bounded (24 slots), so a 1000-executor
    * run never materializes more than the grid (types × slots), which is
    * tiny next to the event stream it summarizes. Observed values are
    * rounded (order-dependent avg) BEFORE interpolation so both engines
    * interpolate identical inputs.
    */
  def interpolate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val slotted = ev
      .withColumn("slot",
        (pmod(hour(col("ts")) * 60 + minute(col("ts")), lit(120)) / 5).cast("long"))
      .groupBy(col("event_type"), col("slot"))
      .agg(round(avg(col("value")), 6).as("obs_raw"))
    val grid = slotted.select("event_type").distinct()
      .crossJoin(s.range(0, 24).select(col("id").as("slot")))
    val joined = grid.join(slotted, Seq("event_type", "slot"), "left")
      .withColumn("obs", when(col("slot") % 3 === 0, lit(null)).otherwise(col("obs_raw")))
    val wPrev = Window.partitionBy("event_type").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("event_type").orderBy("slot")
      .rowsBetween(1, Window.unboundedFollowing)
    val obsSlot = when(col("obs").isNotNull, col("slot"))
    joined
      .withColumn("pv", last(col("obs"), ignoreNulls = true).over(wPrev))
      .withColumn("ps", last(obsSlot, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("obs"), ignoreNulls = true).over(wNext))
      .withColumn("ns", first(obsSlot, ignoreNulls = true).over(wNext))
      .withColumn("filled", round(coalesce(
        col("obs"),
        col("pv") + (col("nv") - col("pv")) * (col("slot") - col("ps"))
          / (col("ns") - col("ps")),
        col("pv"), col("nv")), 6))
      .withColumn("was_gap", col("obs").isNull)
      .select("event_type", "slot", "filled", "was_gap")
      .orderBy("event_type", "slot")
  }

  /** The range-partitioned total-order stage, exposed so PlanShapeSpec can
    * pin the Exchange rangepartitioning on the query's OWN plan. */
  private[graft] def globalRankSorted(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .orderBy("ts_us", "event_id")

  /** Distributed global enumeration: a dense 1..N rank over a corpus-wide
    * total order WITHOUT the single-partition window `row_number() OVER
    * (ORDER BY …)` plans (the anti-scale shape — one task materializes
    * everything). Instead: (1) a range-partitioned sort (sampled
    * boundaries, each partition holds a contiguous key range), then
    * (2) `zipWithIndex`'s two-pass offset scheme — one tiny job counts
    * rows per partition, the driver prefix-sums ~hundreds of counts, and
    * each partition stamps `offset + local position` independently. This
    * is the TeraSort-style enumeration a 100 TB export actually uses.
    * The unique (ts, event_id) tie-break makes the order — and therefore
    * every stamped rank — deterministic; the oracle recomputes it with
    * the window form, so the distributed ranks must match row-for-row.
    */
  def globalRank(s: SparkSession, d: String): DataFrame = {
    val sorted = globalRankSorted(s, d)
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    s.createDataFrame(ranked, schema).orderBy("rank")
  }

  /** Run-length encoding statistics — the storage-engineering readout
    * behind sort-key choice: with lineitem laid out in (orderkey,
    * linenumber) order, how RLE-compressible is each low-cardinality
    * column? A run starts where lag() differs; runs are counted inside
    * each order's partition (partition-local windows, no global sort) and
    * the cross-order boundary conservatively counts as a new run —
    * exactly how parquet pages behave at row-group boundaries. Output per
    * column: total runs, rows, and mean run length.
    */
  def encodingStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (orderkey, linenumber) is NOT unique in the fixture; adding the
    // compared columns to the sort key makes any remaining ties
    // interchangeable for run counting, so the count is total-order-free
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
        col("ship"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").cast("string").as("ship"))
    val runCols = Seq("l_returnflag", "l_linestatus", "ship").map { c =>
      when(lag(col(c), 1).over(w).isNull ||
        lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L).as(s"r_$c")
    }
    val runs = li.select(col("l_orderkey") +: runCols: _*)
    val a = runs.agg(count(lit(1)).as("n_rows"),
      sum(col("r_l_returnflag")).as("runs_returnflag"),
      sum(col("r_l_linestatus")).as("runs_linestatus"),
      sum(col("r_ship")).as("runs_shipdate"))
    a.select(explode(array(
        struct(lit("l_returnflag").as("column"), col("runs_returnflag").as("n_runs"),
          col("n_rows").as("n_rows")),
        struct(lit("l_linestatus").as("column"), col("runs_linestatus").as("n_runs"),
          col("n_rows").as("n_rows")),
        struct(lit("l_shipdate").as("column"), col("runs_shipdate").as("n_runs"),
          col("n_rows").as("n_rows")))).as("x"))
      .select(col("x.column").as("column"), col("x.n_runs").as("n_runs"),
        col("x.n_rows").as("n_rows"),
        round(col("x.n_rows") / col("x.n_runs"), 6).as("avg_run_len"))
      .orderBy("column")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_encoding_stats" -> (encodingStats(_, _)),
    "q_global_rank" -> (globalRank(_, _)),
    "layout_compaction_plan" -> (compactionPlan(_, _)),
    "layout_zorder" -> (zorderStats(_, _)),
    "layout_pruning_stats" -> (pruningStats(_, _)),
    "q_scd2_merge" -> (scd2Merge(_, _)),
    "q_merge_upsert" -> (mergeUpsert(_, _)),
    "q_interpolate" -> (interpolate(_, _))
  )

  /** The z-order oracle mirrors the expression fold with generated SQL —
    * same shifts, same addends, same integer types. */
  private val zorderSql: String = {
    val terms = (0 until 8).flatMap(i => Seq(
      s"((x >> $i) & 1) * ${1L << (2 * i)}",
      s"((y >> $i) & 1) * ${1L << (2 * i + 1)}"))
    s"""WITH q AS (
       |  SELECT (c_nationkey & 255)::BIGINT AS x,
       |         ((CAST(floor(c_acctbal) AS BIGINT) % 256) + 256) % 256 AS y
       |  FROM customer),
       |z AS (SELECT x, y, (${terms.mkString(" + ")}) AS zkey FROM q)
       |SELECT zkey >> 10 AS zbucket, CAST(count(*) AS BIGINT) AS n,
       |       min(x) AS min_x, max(x) AS max_x,
       |       min(y) AS min_y, max(y) AS max_y,
       |       max(x) - min(x) + max(y) - min(y) AS span
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "layout_encoding_stats" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |         CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship
        |  FROM lineitem),
        |runs AS (
        |  SELECT
        |    CASE WHEN lag(l_returnflag) OVER w IS NULL
        |           OR lag(l_returnflag) OVER w <> l_returnflag
        |         THEN 1 ELSE 0 END AS r_flag,
        |    CASE WHEN lag(l_linestatus) OVER w IS NULL
        |           OR lag(l_linestatus) OVER w <> l_linestatus
        |         THEN 1 ELSE 0 END AS r_status,
        |    CASE WHEN lag(ship) OVER w IS NULL
        |           OR lag(ship) OVER w <> ship
        |         THEN 1 ELSE 0 END AS r_ship
        |  FROM li
        |  WINDOW w AS (PARTITION BY l_orderkey
        |               ORDER BY l_linenumber, l_returnflag, l_linestatus,
        |                        ship)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |             CAST(sum(r_flag) AS BIGINT) AS rf,
        |             CAST(sum(r_status) AS BIGINT) AS rs,
        |             CAST(sum(r_ship) AS BIGINT) AS rd
        |      FROM runs)
        |SELECT 'l_returnflag' AS "column", rf AS n_runs, n_rows,
        |       round(n_rows / rf, 6) AS avg_run_len FROM a
        |UNION ALL SELECT 'l_linestatus', rs, n_rows, round(n_rows / rs, 6) FROM a
        |UNION ALL SELECT 'l_shipdate', rd, n_rows, round(n_rows / rd, 6) FROM a
        |ORDER BY "column"""".stripMargin,
    "q_global_rank" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       CAST(row_number() OVER (ORDER BY epoch_us(ts), event_id)
        |            AS BIGINT) AS rank
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY rank""".stripMargin,
    "layout_compaction_plan" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars AS bytes,
        |         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM documents)
        |SELECT source, CAST((cum - bytes) // 4096 AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "layout_zorder" -> zorderSql,
    "layout_pruning_stats" ->
      """WITH nat AS (
        |  SELECT file_id, min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM (SELECT o_totalprice,
        |               CAST(ntile(15) OVER (ORDER BY o_orderkey) AS BIGINT) AS file_id
        |        FROM orders) GROUP BY 1),
        |srt AS (
        |  SELECT file_id, min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM (SELECT o_totalprice,
        |               CAST(ntile(15) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS file_id
        |        FROM orders) GROUP BY 1),
        |bands AS (
        |  SELECT b AS band, b::DOUBLE * 50000 AS lo, (b + 1)::DOUBLE * 50000 AS hi
        |  FROM (SELECT unnest(generate_series(0, 9)) AS b)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_files_natural FROM nat)
        |SELECT band, lo, hi,
        |       (SELECT CAST(sum(CASE WHEN f.mn <= bd.hi AND f.mx >= bd.lo
        |                             THEN 1 ELSE 0 END) AS BIGINT)
        |        FROM nat f) AS scan_natural,
        |       (SELECT CAST(sum(CASE WHEN f.mn <= bd.hi AND f.mx >= bd.lo
        |                             THEN 1 ELSE 0 END) AS BIGINT)
        |        FROM srt f) AS scan_sorted,
        |       n.n_files_natural
        |FROM bands bd, n ORDER BY band""".stripMargin,
    "q_scd2_merge" ->
      """WITH chg AS (
        |  SELECT o_custkey AS custkey, round(o_totalprice, 2) AS new_bal,
        |         o_orderdate AS eff
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |        FROM orders WHERE o_orderkey % 7 = 0)
        |  WHERE rn = 1),
        |base AS (SELECT c_custkey AS custkey, round(c_acctbal, 2) AS bal
        |         FROM customer)
        |SELECT b.custkey, b.bal AS balance,
        |       TIMESTAMP '1990-01-01' AS valid_from, c.eff AS valid_to,
        |       c.eff IS NULL AS is_current
        |FROM base b LEFT JOIN chg c USING (custkey)
        |UNION ALL
        |SELECT b.custkey, c.new_bal AS balance, c.eff AS valid_from,
        |       NULL::TIMESTAMP AS valid_to, true AS is_current
        |FROM base b JOIN chg c USING (custkey)
        |ORDER BY custkey, valid_from""".stripMargin,
    "q_merge_upsert" ->
      """WITH t AS (SELECT c_custkey AS custkey, round(c_acctbal, 2) AS bal
        |           FROM customer WHERE c_custkey % 3 <> 0),
        |s AS (SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS spend
        |      FROM orders GROUP BY 1)
        |SELECT coalesce(t.custkey, s.custkey) AS custkey,
        |       round(coalesce(s.spend, t.bal), 2) AS balance,
        |       CASE WHEN t.bal IS NOT NULL AND s.spend IS NOT NULL THEN 'update'
        |            WHEN t.bal IS NULL THEN 'insert'
        |            ELSE 'keep' END AS op
        |FROM t FULL OUTER JOIN s ON t.custkey = s.custkey
        |ORDER BY custkey""".stripMargin,
    "q_interpolate" ->
      """WITH slotted AS (
        |  SELECT event_type,
        |         (((hour(ts) * 60 + minute(ts)) % 120) // 5)::BIGINT AS slot,
        |         round(avg(value), 6) AS obs_raw
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT et.event_type, g.slot FROM
        |    (SELECT DISTINCT event_type FROM slotted) et,
        |    (SELECT unnest(generate_series(0, 23))::BIGINT AS slot) g),
        |j AS (
        |  SELECT g.event_type, g.slot,
        |         CASE WHEN g.slot % 3 = 0 THEN NULL ELSE s.obs_raw END AS obs
        |  FROM grid g LEFT JOIN slotted s USING (event_type, slot)),
        |w AS (
        |  SELECT event_type, slot, obs,
        |    last_value(obs IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN obs IS NOT NULL THEN slot END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ps,
        |    first_value(obs IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN obs IS NOT NULL THEN slot END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ns
        |  FROM j)
        |SELECT event_type, slot,
        |       round(coalesce(obs,
        |         pv + (nv - pv) * (slot - ps) / (ns - ps), pv, nv), 6) AS filled,
        |       obs IS NULL AS was_gap
        |FROM w ORDER BY event_type, slot""".stripMargin
  )
}
