package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-table layout surface: the 100 TB seam `Tables` promises.
  *
  * The parquet fixtures stand in for what would be partitioned/bucketed
  * catalog tables on a real cluster (`Tables.scala` scaladoc). This module
  * makes that swap REAL and gated, not aspirational prose:
  *
  *  - `q_bucketed_join`   — both fact tables written `bucketBy(join key)`
  *    via the session catalog, then equi-joined WITHOUT shuffling either
  *    side (bucket-aligned scan; CatalogSpec pins the no-Exchange plan).
  *    At 100 TB this is the difference between re-shuffling 100 TB per
  *    join and a one-time layout cost amortized over every downstream
  *    consumer.
  *  - `q_partition_pruned` — events laid out `partitionBy(event_type)`,
  *    then scanned with a partition-column predicate; pruning happens at
  *    file listing (CatalogSpec pins PartitionFilters + partitionCount),
  *    so the query never opens the other partitions' files at all.
  *  - `q_skew_join_aqe`   — the runtime half of the skew story
  *    (`q_salted_join` is the static half): one hot key carrying ~99% of
  *    the fact rows, joined WITHOUT broadcast under AQE's
  *    OptimizeSkewedJoin with thresholds scaled to the fixture, so the
  *    hot partition is split at runtime from shuffle statistics. The
  *    builder evaluates eagerly under temporarily-set session confs
  *    (restored in `finally`) and returns the settled result — same
  *    pattern as the streaming bridges, because conf scope must cover
  *    execution, not just plan construction.
  *
  * Layout writes go to per-SF external paths under java.io.tmpdir and are
  * rebuilt per call (overwrite) — Bench resets all cross-query state
  * between queries, so the honest per-query timing INCLUDES the layout
  * cost, which is exactly the trade the 100 TB design makes explicit.
  */
object CatalogQueries {

  private def tmpRoot: String = TmpPaths.root("graft_catalog")

  private def sfTag(sfDir: String): String = TmpPaths.sfTag(sfDir)

  /** Write `df` as a bucketed+sorted external catalog table and return the
    * catalog relation (whose scan carries the bucket spec). Overwrite mode
    * keeps repeated builds idempotent within a session.
    */
  private def bucketedTable(s: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int, path: String): DataFrame = {
    // Pre-shuffle onto the bucket hash (repartition's HashPartitioning is
    // the same pmod(murmur3) the bucket spec uses) so each write task owns
    // exactly one bucket: 1 sorted file per bucket instead of
    // (input partitions × buckets) small files — at 100 TB the difference
    // between a clean layout and a small-file explosion, and the readback
    // gets single-file buckets (no per-bucket merge).
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .option("path", path).mode("overwrite").saveAsTable(table)
    s.table(table)
  }

  /** Co-located join: lineitem and orders both bucketed on the order key.
    * The join reads bucket-aligned files — the ONLY exchange in the plan
    * is the one after the join feeding the 3-key aggregate. The aggregate
    * keeps sums integer-valued-in-double (quantity) so the result is
    * order-independent and exactly oracle-comparable.
    */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val tag = sfTag(d)
    val li = bucketedTable(s, Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity"),
      s"graft_li_b_$tag", "l_orderkey", 8, s"$tmpRoot/li_b_$tag")
    val ord = bucketedTable(s, Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus"),
      s"graft_ord_b_$tag", "o_orderkey", 8, s"$tmpRoot/ord_b_$tag")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  /** Partition-pruned scan: events written partitionBy(event_type), read
    * back with a partition-column predicate. Pruning is a LISTING-time
    * decision (PartitionFilters in the scan node) — the non-matching
    * partitions' files are never opened. The µs-epoch max keeps the
    * timestamp column exercised through the partitioned round-trip.
    */
  def partitionPruned(s: SparkSession, d: String): DataFrame = {
    val path = s"$tmpRoot/events_p_${sfTag(d)}"
    Tables.events(s, d).write.partitionBy("event_type")
      .mode("overwrite").parquet(path)
    s.read.parquet(path)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy("event_type")
  }

  /** AQE skew-split join, evaluated eagerly under fixture-scaled skew
    * thresholds (see module scaladoc). The fact's key expression funnels
    * ~99% of lineitem onto k=1 (hot) and spreads the rest over the cold
    * keys; the dim is 1000 part rows — broadcast is disabled so the skew
    * machinery, not BHJ, has to absorb the hot key. Quantity sums are
    * integer-valued doubles → exact under any partition split AQE picks.
    */
  /** Session confs under which the skew join must EXECUTE (not just
    * plan): broadcast off so the skew machinery absorbs the hot key,
    * thresholds scaled so the fixture's hot partition trips the split.
    * Shared with tools.SkewProbe, which re-runs the identical shape at
    * upscaled SFs and pins `skew=true` in the AQE final plan. */
  private[graft] val skewJoinConfs = Map(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB")

  /** The un-settled join shape behind q_skew_join_aqe: key expression
    * funnels ~99% of lineitem onto k=1 REGARDLESS of key-offset
    * replication (the modulus is taken per replica, so every replica's
    * non-divisible rows land on the same literal hot key) — which makes
    * this the registry shuffle that stays genuinely skewed under the
    * sf1 upscale, where replication otherwise preserves distribution
    * shapes. */
  private[graft] def skewJoinShape(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 100 =!= 0, lit(1L))
        .otherwise(col("l_orderkey") % 1000).as("k"),
      col("l_quantity"))
    val dim = Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey").as("k"), col("p_brand"))
    fact.join(dim, "k")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy("p_brand")
  }

  def skewJoinAqe(s: SparkSession, d: String): DataFrame = {
    withConfs(s, skewJoinConfs) {
      val shaped = skewJoinShape(s, d)
      // settle under the confs: execution (not just plan construction)
      // must run with broadcast off + skew thresholds in force
      val rows = java.util.Arrays.asList(shaped.collect(): _*)
      s.createDataFrame(rows, shaped.schema)
    }
  }

  /** ORC round-trip: the columnar-format alternative to parquet, written
    * and scanned through Spark's native vectorized ORC path. The readback
    * aggregate is oracle-checked against the parquet fixture — proving
    * the values survive the format change bit-for-bit (dates, doubles,
    * strings). Predicate + pruning behavior matches parquet (ORC carries
    * its own min/max indexes), so the 100 TB guidance is format-neutral.
    */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = s"$tmpRoot/orders_orc_${sfTag(d)}"
    Tables.orders(s, d).write.mode("overwrite").orc(path)
    s.read.orc(path)
      .filter(col("o_orderstatus") =!= "P")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        // BIGINT cents summed exactly (q_tpch_q9 discipline) — the r8 sf10
        // sweep caught the last cent flipping on the ~1M-row strata
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"),
        max(col("o_orderdate")).as("max_date"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** SQL DDL/DML path end-to-end: CREATE TABLE ... USING parquet at an
    * external LOCATION, INSERT OVERWRITE (the idempotent-batch write —
    * re-running a failed job must replace, not double), INSERT INTO
    * append, then a SQL read over the accumulated table. The overwrite
    * slice is high-value orders, the append slice mid-value — the result
    * proves overwrite replaced and append added, value-for-value against
    * the fixture.
    */
  def sqlDml(s: SparkSession, d: String): DataFrame = {
    val tag = sfTag(d)
    val table = s"graft_dml_$tag"
    val path = s"$tmpRoot/dml_$tag"
    val view = s"orders_src_$tag"
    Tables.orders(s, d).createOrReplaceTempView(view)
    // the DML below materializes eagerly, so the source view can be dropped
    // before returning (same no-leak contract as the streaming bridges);
    // the result plan reads only the created table
    try {
      s.sql(s"DROP TABLE IF EXISTS $table")
      s.sql(s"""CREATE TABLE $table
               |  (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
               |  USING parquet LOCATION '$path'""".stripMargin)
      s.sql(s"""INSERT OVERWRITE $table
               |SELECT o_orderkey, o_orderstatus, o_totalprice
               |FROM $view WHERE o_totalprice > 300000""".stripMargin)
      s.sql(s"""INSERT INTO $table
               |SELECT o_orderkey, o_orderstatus, o_totalprice
               |FROM $view
               |WHERE o_totalprice > 150000 AND o_totalprice <= 300000""".stripMargin)
    } finally s.catalog.dropTempView(view)
    // BIGINT cents summed exactly (q_tpch_q9 discipline): millions of
    // rows per status stratum at sf10 make round(sum(double),2)
    // order-dependent in the last cent
    s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
             |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_c,
             |       min(o_orderkey) AS min_key
             |FROM $table GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)
  }

  /** CSV round-trip: write with header, read back with the ORIGINAL
    * schema (never inferSchema — type drift, not the format, is what
    * breaks CSV pipelines). Values must survive quoting/escaping exactly;
    * every fixture row is returned, not an aggregate, so any mangled cell
    * fails the hash.
    */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = Tables.nation(s, d)
    val path = s"$tmpRoot/nation_csv_${sfTag(d)}"
    src.write.mode("overwrite").option("header", "true").csv(path)
    s.read.schema(src.schema).option("header", "true").csv(path)
      .orderBy("n_nationkey")
  }

  /** JSON-lines round-trip on events: `props` is a JSON document INSIDE a
    * string field, so the writer must escape it and the reader unescape it
    * bit-for-bit — the classic nested-quoting trap. Read uses the original
    * schema (timestamps at µs through the ISO round-trip). Aggregated to
    * per-type counts + exact concat-length checksums over ts/props.
    */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = Tables.events(s, d)
    val path = s"$tmpRoot/events_json_${sfTag(d)}"
    // default JSON timestampFormat carries milliseconds only — the fixture
    // is µs-grained, so the format must say so on BOTH sides or the
    // round-trip silently truncates (caught by the ts_us columns below)
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    src.write.mode("overwrite").option("timestampFormat", tsFmt).json(path)
    s.read.schema(src.schema).option("timestampFormat", tsFmt).json(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        min(unix_micros(col("ts"))).as("ts_us_min"),
        max(unix_micros(col("ts"))).as("ts_us_max"),
        sum(length(col("props")).cast("long")).as("props_len_sum"),
        min(col("props")).as("props_min"))
      .orderBy("event_type")
  }

  /** Dynamic partition pruning: events laid out partitionBy(event_type)
    * joined to a small category dim whose predicate is on a NON-partition
    * column. Static pruning (`q_partition_pruned`) cannot help — the
    * partition column has no literal predicate; the surviving event types
    * are only known after filtering the dim. Catalyst injects a
    * DynamicPruningExpression into the fact scan's PartitionFilters
    * (reusing the join's broadcast of the filtered dim), so the listing
    * still skips the non-qualifying partitions at runtime. CatalogSpec
    * pins the dynamicpruning expression AND that fewer files are read.
    *
    * Scale: at 100 TB the fact's partition count is the dominant listing
    * and IO term; DPP is what keeps star-schema joins from scanning every
    * date/type partition when the predicate lives on the dim.
    */
  def dppJoin(s: SparkSession, d: String): DataFrame = {
    val tag = sfTag(d)
    val factPath = s"$tmpRoot/events_dpp_$tag"
    Tables.events(s, d).write.partitionBy("event_type")
      .mode("overwrite").parquet(factPath)
    // dim derived deterministically from the fixture's type universe; a
    // real deployment would read a catalog dim table — written to parquet
    // so the optimizer sees a genuine scan relation with stats, not a
    // constant-foldable LocalRelation
    val dimPath = s"$tmpRoot/etype_dim_$tag"
    Tables.events(s, d).select("event_type").distinct()
      .withColumn("category",
        when(col("event_type").isin("click", "view"), lit("engagement"))
          .when(col("event_type").isin("purchase", "signup"), lit("conversion"))
          .otherwise(lit("ops")))
      .write.mode("overwrite").parquet(dimPath)
    val fact = s.read.parquet(factPath)
    val dim = s.read.parquet(dimPath).filter(col("category") === "engagement")
    fact.join(dim, "event_type")
      .groupBy("event_type", "category")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("event_type")
  }

  /** Runtime bloom-filter injection (InjectRuntimeFilter): lineitem joined
    * to a brand-filtered part slice with broadcast DISABLED — the shape
    * where, at 100 TB, the fact side would shuffle ~every row only for the
    * join to discard ~96% of them. With the runtime filter on, Catalyst
    * builds a bloom filter over the filtered dim's join keys and injects
    * `bloom_filter_might_contain` as a fact-side scan predicate, so
    * non-qualifying rows die before the exchange, not after it.
    *
    * Thresholds are scaled to the fixture (the application-side floor
    * defaults to 10 GB); broadcast is disabled because a BHJ needs no
    * semi-join reduction — SMJ/SHJ is the plan whose shuffle the filter
    * exists to shrink. Eager settle under save/restore confs, same
    * contract as `skewJoinAqe`. PlanShapeSpec pins the injected filter and
    * its row-reduction effect.
    */
  /** Conf set + shaped plan shared with CatalogSpec's pin, so the pinned
    * plan IS the query's plan, not a re-derivation. */
  private[graft] val runtimeFilterConfs = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private[graft] def runtimeFilterShaped(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#11")
      .select(col("p_partkey"), col("p_brand"))
    Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy("p_brand")
  }

  /** Run `body` with `confs` set on the session, restoring priors after. */
  private[graft] def withConfs[T](s: SparkSession, confs: Map[String, String])(body: => T): T = {
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    try { confs.foreach { case (k, v) => s.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  def runtimeFilter(s: SparkSession, d: String): DataFrame =
    withConfs(s, runtimeFilterConfs) {
      val shaped = runtimeFilterShaped(s, d)
      val rows = java.util.Arrays.asList(shaped.collect(): _*)
      s.createDataFrame(rows, shaped.schema)
    }

  /** `binaryFile` source surface: the documents corpus is written as ONE
    * text file in doc_id order, then read back whole via the binaryFile
    * format (path/length/content — the ingestion path for opaque media
    * blobs, cf. sources/Multimodal) and fingerprinted. The oracle
    * recomputes the exact file bytes relationally (newline-joined texts +
    * trailing newline), so file count, byte length, and the md5 of the
    * raw content are all hash-checked. Byte-level: octet_length/strlen,
    * not char counts.
    */
  def binaryfileRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = s"$tmpRoot/docs_bin_${sfTag(d)}"
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .coalesce(1).sortWithinPartitions("doc_id").select("text")
      .write.mode("overwrite").text(path)
    s.read.format("binaryFile").option("pathGlobFilter", "part-*").load(path)
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("total_bytes"),
        min(md5(col("content"))).as("digest"))
  }

  /** Parquet schema-evolution read (`mergeSchema`): two snapshots of the
    * orders table written with DIFFERENT column sets are read under one
    * merged schema — the column-add migration every long-lived lake table
    * goes through. The readback aggregates prove rows double, each
    * snapshot-specific column is null exactly outside its snapshot, and
    * the money sum survives the merge bit-exactly (cent-scaled).
    */
  def schemaMerge(s: SparkSession, d: String): DataFrame = {
    val root = s"$tmpRoot/orders_evo_${sfTag(d)}"
    val o = Tables.orders(s, d)
    o.select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$root/snap=1")
    o.select("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$root/snap=2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$root/snap=1", s"$root/snap=2")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_price"),
        count(col("o_custkey")).as("n_cust"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"))
  }

  /** Cache/persist surface: the projected lineitem columns are cached
    * (columnar InMemoryRelation) and the aggregate reads through the
    * InMemoryTableScan — plan-pinned in SurfaceRoundtripSpec. The sweep in
    * Verify/Bench unpersists it between queries like every other
    * persisted block, so the cache cannot leak across the registry.
    */
  def cachedScan(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity")).cache()
    li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"))
      .orderBy("l_returnflag")
  }

  /** CSV malformed-record modes: the nation table plus three deliberately
    * broken lines read back under PERMISSIVE (corrupt rows quarantined in
    * `_corrupt_record`) and DROPMALFORMED (corrupt rows vanish) — the
    * dirty-ingestion contract every CSV pipeline depends on. One
    * malformed line has a non-numeric key, one has too many columns, one
    * too few; all three must quarantine, and the clean rows must survive
    * both modes bit-identically.
    */
  def csvMalformed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = s"$tmpRoot/nation_dirty_${sfTag(d)}"
    val nation = Tables.nation(s, d)
    nation.write.mode("overwrite").csv(s"$root/good")
    Seq("notakey,BADLAND,0", "1,TOOMANY,2,3,4", "7")
      .toDF("value").coalesce(1)
      .write.mode("overwrite").text(s"$root/bad")
    val schema = org.apache.spark.sql.types.StructType(
      nation.schema.fields :+ org.apache.spark.sql.types
        .StructField("_corrupt_record", org.apache.spark.sql.types.StringType))
    // Spark disallows queries that reference ONLY the corrupt-record
    // column against the raw files (the parser would need a second,
    // inconsistent pass); caching the parsed frame first is the
    // documented contract for corrupt-record analytics
    val permissive = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(s"$root/good", s"$root/bad")
      .cache()
    // DROPMALFORMED only drops rows the parser actually PARSES: with CSV
    // column pruning on, a count(*) references zero columns and malformed
    // rows sail through. Disable pruning around an eager count so every
    // field is parsed and all three bad lines are detected. The flip runs
    // in a throwaway newSession() — same SparkContext, PRIVATE SQL conf —
    // so the shared session's conf is never mutated and the builder stays
    // race-free under concurrent query construction (the PERMISSIVE half
    // above executes later, under the caller's session, with pruning at
    // its default).
    val iso = s.newSession()
    iso.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    val nDrop = iso.read.schema(nation.schema).option("mode", "DROPMALFORMED")
      .csv(s"$root/good", s"$root/bad").count()
    permissive
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
      .withColumn("n_dropmode", lit(nDrop))
  }

  /** Hidden file-metadata columns (`_metadata.file_name` / `row_index`):
    * the ingestion-lineage surface — every production loader records
    * which file each row came from. The audit is LAYOUT-INDEPENDENT
    * (r7 verdict #3): rows aggregate per `_metadata.file_name` first,
    * each file's row count is reconciled against its `row_index` span
    * (a full scan sees every file dense: count == max(row_index)+1),
    * then the per-file subtotals roll up to the global totals the oracle
    * can predict from the view alone. The same query is therefore
    * checkable on the driver's single-file fixture AND a multi-part
    * Spark-written directory (sf1+): a broken file_name (rows
    * misattributed across files) or a broken row_index surfaces as
    * n_sparse_files > 0 on any multi-file layout, while the emitted
    * totals are invariant to how rows fell into files. At 100 TB this is
    * how per-file audit counts and quarantine-by-file work without a
    * filename column materialized in the data.
    */
  def metadataCols(s: SparkSession, d: String): DataFrame = {
    // no per-file countDistinct here (r8 ADVICE): n_orders is the GLOBAL
    // distinct (orders span files on a multi-part layout), so a per-file
    // distinct can never roll up to it — it was dead weight and the most
    // expensive aggregate in the query
    val perFile = s.read.parquet(s"$d/lineitem.parquet")
      .select(expr("_metadata.file_name").as("file_name"),
        expr("_metadata.row_index").as("row_index"))
      .groupBy("file_name")
      .agg(count(lit(1)).as("f_rows"),
        (max(col("row_index")) + 1).as("f_span"))
    perFile.agg(
        sum(col("f_rows")).as("n_rows"),
        sum(when(col("f_rows") === col("f_span"), 0L).otherwise(1L))
          .as("n_sparse_files"))
      .crossJoin(s.read.parquet(s"$d/lineitem.parquet")
        .agg(countDistinct(col("l_orderkey")).as("n_orders")))
      .select(col("n_rows"), col("n_orders"), col("n_sparse_files"))
  }

  /** Column DEFAULT values (Spark 3.4+ DDL surface): a table declared
    * with defaults, rows inserted WITHOUT those columns, and the filled
    * values read back — the schema-evolution affordance that lets old
    * writers keep inserting after a column lands. Same DDL runs in both
    * engines; the oracle restates the expected rows as VALUES.
    */
  def defaultCols(s: SparkSession, d: String): DataFrame = {
    val t = s"graft_defaults_${sfTag(d)}"
    // EXTERNAL table at a tmpRoot location with INSERT OVERWRITE first
    // (the q_sql_dml discipline): a MANAGED table's leftover warehouse
    // directory makes CREATE fail in any later JVM whose catalog never
    // saw the table — exactly how the first full re-run of this query
    // failed (LOCATION_ALREADY_EXISTS).
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(
      s"""CREATE TABLE $t (
         |  id BIGINT,
         |  status STRING DEFAULT 'new',
         |  score BIGINT DEFAULT 42)
         |  USING parquet LOCATION '$tmpRoot/defaults_${sfTag(d)}'""".stripMargin)
    s.sql(s"INSERT OVERWRITE $t (id) VALUES (1), (2)")
    s.sql(s"INSERT INTO $t (id, status) VALUES (3, 'done')")
    s.sql(s"INSERT INTO $t VALUES (4, 'full', 7)")
    s.sql(s"SELECT id, status, score FROM $t ORDER BY id")
  }

  /** CSV QUOTING round-trip: values containing the delimiter, double
    * quotes, AND embedded newlines — the three things naive CSV handling
    * corrupts — written through Spark's CSV codec and read back with
    * multiLine=true. The payload is constructed deterministically from
    * fixture columns, and the oracle re-derives the same expression
    * directly, so the gate proves the codec's escaping is lossless (a
    * quoting bug shows up as a hash mismatch or a row-count explosion
    * from split records). Complements q_csv_roundtrip (clean values) and
    * q_csv_malformed (broken rows).
    */
  def csvQuoted(s: SparkSession, d: String): DataFrame = {
    val tricky = concat(col("source"), lit(",\""), col("lang"),
      lit("\"\n"), substring(col("text"), 1, 20))
    val src = Tables.documents(s, d)
      .select(col("doc_id"), tricky.as("payload"))
    val path = s"$tmpRoot/csv_quoted_${sfTag(d)}"
    // Spark's CSV codec TRIMS leading/trailing whitespace by default on
    // both write and read — lossy for free-text payloads (this fixture's
    // substrings end in spaces). Disabling the trim on both sides is part
    // of the lossless-roundtrip contract this query pins.
    src.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    s.read.option("header", "true").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .schema(src.schema).csv(path)
      .orderBy("doc_id")
  }

  /** DYNAMIC partition overwrite (`partitionOverwriteMode=dynamic`, set
    * per-WRITE via the DataFrameWriter option — no session conf
    * mutation): an overwrite write replaces ONLY the partitions present
    * in the incoming data. The base layout holds every event_type
    * partition; a patched write carrying only 'click' rows (values
    * doubled) must leave all other partitions intact — under the default
    * STATIC mode they would be wiped, the classic production data-loss
    * foot-gun this mode exists to prevent, and here that failure reads
    * as a row-count mismatch at the gate. This is the partition-level
    * upsert every incremental 100 TB pipeline runs daily.
    */
  def dynamicOverwrite(s: SparkSession, d: String): DataFrame = {
    val path = s"$tmpRoot/events_dyn_${sfTag(d)}"
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("v_c"))
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)
    ev.filter(col("event_type") === "click")
      .withColumn("v_c", col("v_c") * 2)
      .write.partitionBy("event_type").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)
    s.read.parquet(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("sum_c"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dynamic_overwrite" -> (dynamicOverwrite(_, _)),
    "q_csv_quoted" -> (csvQuoted(_, _)),
    "q_metadata_cols" -> (metadataCols(_, _)),
    "q_default_cols" -> (defaultCols(_, _)),
    "q_cached_scan" -> (cachedScan(_, _)),
    "q_csv_malformed" -> (csvMalformed(_, _)),
    "q_binaryfile_roundtrip" -> (binaryfileRoundtrip(_, _)),
    "q_schema_merge" -> (schemaMerge(_, _)),
    "q_bucketed_join" -> (bucketedJoin(_, _)),
    "q_partition_pruned" -> (partitionPruned(_, _)),
    "q_skew_join_aqe" -> (skewJoinAqe(_, _)),
    "q_orc_roundtrip" -> (orcRoundtrip(_, _)),
    "q_sql_dml" -> (sqlDml(_, _)),
    "q_csv_roundtrip" -> (csvRoundtrip(_, _)),
    "q_json_roundtrip" -> (jsonRoundtrip(_, _)),
    "q_dpp_join" -> (dppJoin(_, _)),
    "q_runtime_filter" -> (runtimeFilter(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_dynamic_overwrite" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(CASE WHEN event_type = 'click' THEN 2 ELSE 1 END
        |                     AS BIGINT)
        |                * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_csv_quoted" ->
      """SELECT doc_id,
        |       source || ',"' || lang || '"' || chr(10)
        |         || substr(text, 1, 20) AS payload
        |FROM documents ORDER BY doc_id""".stripMargin,
    // layout-independent (single file or multi-part dir): the Spark side
    // derives these totals THROUGH per-_metadata.file_name aggregation
    // with a row_index density reconciliation; the oracle predicts the
    // layout-invariant roll-up
    "q_metadata_cols" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |       CAST(0 AS BIGINT) AS n_sparse_files
        |FROM lineitem""".stripMargin,
    "q_default_cols" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'new',  CAST(42 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'new',  CAST(42 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'done', CAST(42 AS BIGINT)),
        |  (CAST(4 AS BIGINT), 'full', CAST(7 AS BIGINT)))
        |  AS t(id, status, score)
        |ORDER BY id""".stripMargin,
    "q_cached_scan" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_qty_c
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_csv_malformed" ->
      """SELECT CAST(count(*) + 3 AS BIGINT) AS n_total,
        |       CAST(count(*) AS BIGINT) AS n_good,
        |       CAST(3 AS BIGINT) AS n_corrupt,
        |       CAST(count(*) + 1 AS BIGINT) AS n_dropmode
        |FROM nation""".stripMargin,
    "q_binaryfile_roundtrip" ->
      """SELECT CAST(1 AS BIGINT) AS n_files,
        |       CAST(sum(strlen(text) + 1) AS BIGINT) AS total_bytes,
        |       md5(string_agg(text, chr(10) ORDER BY doc_id) || chr(10))
        |         AS digest
        |FROM documents""".stripMargin,
    "q_schema_merge" ->
      """SELECT CAST(2 * count(*) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_price,
        |       CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS sum_price_c
        |FROM orders""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_partition_pruned" ->
      """SELECT event_type, count(*) AS cnt,
        |       round(sum(value), 2) AS sum_value,
        |       max(epoch_us(ts)) AS max_ts_us
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_skew_join_aqe" ->
      """SELECT p_brand, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM (SELECT CASE WHEN l_orderkey % 100 <> 0 THEN 1
        |                  ELSE l_orderkey % 1000 END AS k, l_quantity
        |      FROM lineitem) f
        |JOIN (SELECT p_partkey AS k, p_brand FROM part
        |      WHERE p_partkey <= 1000) p USING (k)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS total_c,
        |       max(o_orderdate) AS max_date
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    // overwrite slice (>300k) + append slice (150k..300k] = everything >150k
    "q_sql_dml" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS total_c,
        |       min(o_orderkey) AS min_key
        |FROM orders WHERE o_totalprice > 150000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_csv_roundtrip" ->
      """SELECT * FROM nation ORDER BY n_nationkey""".stripMargin,
    // the dim's category mapping restated as the partition predicate DPP
    // derives at runtime
    "q_dpp_join" ->
      """SELECT event_type, 'engagement' AS category, count(*) AS cnt,
        |       round(sum(value), 2) AS sum_value
        |FROM events WHERE event_type IN ('click', 'view')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_runtime_filter" ->
      """SELECT p_brand, count(*) AS cnt,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#11'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_json_roundtrip" ->
      """SELECT event_type, count(*) AS cnt,
        |       min(epoch_us(ts)) AS ts_us_min,
        |       max(epoch_us(ts)) AS ts_us_max,
        |       CAST(sum(length(props)) AS BIGINT) AS props_len_sum,
        |       min(props) AS props_min
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
