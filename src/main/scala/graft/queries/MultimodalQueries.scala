package graft.queries

import graft.sources.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable faces of the multimodal plumbing (graft.sources
  * .Multimodal). The decode stub is deterministic arithmetic over the bytes,
  * so the whole typed mapPartitions pipeline — binary column in, feature
  * schema out — has an exact SQL oracle.
  */
object MultimodalQueries {

  /** Full pipeline: binary media column → per-partition batched "decode" →
    * feature rows. Runs through Dataset[MediaRecord] → mapPartitions →
    * Dataset[MediaFeatures].
    */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeBatch(Multimodal.fromDocuments(s, d))
      .toDF()
      .orderBy("id")

  /** Metadata-only path: blob bytes never touched (column pruning). */
  def mediaSizes(s: SparkSession, d: String): DataFrame =
    Multimodal.withMeta(Multimodal.fromDocuments(s, d))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"), sum("n_bytes").cast("long").as("total_bytes"),
        min("n_bytes").cast("long").as("min_bytes"), max("n_bytes").cast("long").as("max_bytes"))
      .orderBy("kind")

  /** The 1→N video-ingest shape under the gate: frame-sample each blob
    * (64-byte frames, every 2nd kept) through the typed flatMap, then
    * per-media frame stats. The stub is byte arithmetic, so frame counts
    * and byte totals re-derive in SQL from octet_length alone.
    */
  def frameStats(s: SparkSession, d: String, frameSize: Int = 64,
      stride: Int = 2): DataFrame = {
    val media = Multimodal.fromDocuments(s, d)
    val perFrame = Multimodal.frameSampleStub(media, frameSize, stride)
      .toDF()
      .groupBy("id")
      .agg(count(lit(1)).as("n_frames"),
        sum(octet_length(col("frame"))).cast("long").as("frame_bytes"))
    // left join from the media catalog so ZERO-byte media report
    // (n_frames=0, frame_bytes=0) instead of silently vanishing — the
    // oracle's arithmetic path emits a row for every document
    media.toDF().select(col("id"))
      .join(perFrame, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("frame_bytes"), lit(0L)).as("frame_bytes"))
      .orderBy("id")
  }

  /** The decode→transform shape: "resize" (deterministic 1-in-4 byte
    * subsample) through per-partition execution; original vs resized
    * sizes per media row.
    */
  def resizeSizes(s: SparkSession, d: String, factor: Int = 4): DataFrame = {
    val orig = Multimodal.fromDocuments(s, d)
    Multimodal.resizeStub(orig, factor).toDF()
      .select(col("id"), octet_length(col("media")).cast("long").as("n_resized"))
      .join(Multimodal.withMeta(orig).select(col("id"), col("n_bytes").cast("long").as("n_orig")), "id")
      .select("id", "n_orig", "n_resized")
      .orderBy("id")
  }

  /** Multimodal PAIRING: join the decoded media features with the
    * embeddings table on id (the media↔embedding association a paired
    * training set needs), then report per-label pair counts, total media
    * bytes, and the mean embedding norm — norms micro-rounded to BIGINT
    * before summing (the fixed-point discipline) so the per-label mean is
    * integer-exact. The join is co-keyed on the id both tables already
    * carry; at scale it is THE shuffle of multimodal sample assembly.
    */
  def pairEmbed(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.l2norm
    val media = Multimodal.decodeBatch(Multimodal.fromDocuments(s, d))
      .toDF().select(col("id"), col("n_bytes"))
    val emb = graft.Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm_micro", round(l2norm(col("v")) * 1e6).cast("long"))
    media.join(emb, "id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("norm_micro")).as("sum_norm_micro"))
      .withColumn("avg_norm",
        round(col("sum_norm_micro") / col("n_pairs") / lit(1000000.0), 6))
      .orderBy("label")
  }

  /** Perceptual-hash near-dup over the media column: the typed
    * per-partition Walsh-Hadamard pHash stub (`Multimodal.phashStub` —
    * integer-exact, so fully oracled), then each media row reports its
    * hash and how many corpus rows share it (the exact-bucket face of
    * perceptual dedup; Hamming-banded near-dup is `dedup_simhash`'s
    * machinery, applied downstream of this hash at scale). The bucket
    * join broadcasts the decision-sized (phash, count) aggregate.
    */
  def phash(s: SparkSession, d: String): DataFrame = {
    // h feeds the bucket aggregate AND the join probe — pin it so the
    // scan + per-row WHT runs once (the triangles() multi-reference device)
    val h = Multimodal.phashStub(Multimodal.fromDocuments(s, d)).toDF()
      .localCheckpoint(false)
    val buckets = h.groupBy("phash").agg(count(lit(1)).as("bucket_size"))
    h.join(broadcast(buckets), "phash")
      .select(col("id"), col("phash"), col("bucket_size"))
      .orderBy("id")
  }

  /** Per-media audio summary over the PCM stub: frame count, total
    * energy, peak amplitude, and RELATIVE-silence frames — a frame is
    * "quiet" when its energy is under half the media's own mean
    * (energy · n_frames · 2 < energy_total, exact integer compare; an
    * absolute threshold would be vacuous on text-byte PCM). Media too
    * short for one full frame report zeros via the left join — the
    * frame_stats discipline. All BIGINT until nothing; fully oracled by
    * re-deriving the sample arithmetic from the text bytes.
    */
  def audioEnergy(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.fromDocuments(s, d)
    val per = Multimodal.audioEnergyStub(media).toDF()
      .groupBy("id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("energy")).as("energy_total"),
        max(col("peak")).as("peak"))
    val frames = Multimodal.audioEnergyStub(media).toDF()
      .join(per.select(col("id"), col("n_frames").as("nf"),
        col("energy_total").as("et")), "id")
      .groupBy("id")
      .agg(sum(when(col("energy") * col("nf") * 2 < col("et"), 1L)
        .otherwise(0L)).as("n_quiet"))
    media.toDF().select(col("id"))
      .join(per, Seq("id"), "left")
      .join(frames, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("energy_total"), lit(0L)).as("energy_total"),
        coalesce(col("peak"), lit(0L)).as("peak"),
        coalesce(col("n_quiet"), lit(0L)).as("n_quiet"))
      .orderBy("id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_energy" -> (audioEnergy(_, _)),
    "mm_phash" -> (phash(_, _)),
    "mm_pair_embed" -> (pairEmbed(_, _)),
    "mm_binary_meta" -> (binaryMeta(_, _)),
    "mm_media_sizes" -> (mediaSizes(_, _)),
    "mm_frame_stats" -> (frameStats(_, _)),
    "mm_resize_sizes" -> (resizeSizes(_, _))
  )

  val oracles: Map[String, String] = Map(
    // PCM sample arithmetic re-derived from the ASCII text bytes (the
    // byte-level oracle convention): little-endian int16 with the sign
    // fold, 32-sample frames, tail truncated
    "mm_audio_energy" ->
      """WITH d AS (SELECT doc_id AS id, text, length(text) AS n FROM documents),
        |fr AS (
        |  SELECT id, i AS frame_no,
        |         CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS energy,
        |         CAST(max(abs(s)) AS BIGINT) AS peak
        |  FROM (
        |    SELECT d.id, f.i, sm.j,
        |           CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
        |    FROM d,
        |         LATERAL (SELECT unnest(generate_series(0, n // 64 - 1)) AS i) f,
        |         LATERAL (SELECT unnest(generate_series(0, 31)) AS j) sm,
        |         LATERAL (SELECT unicode(substr(text, CAST(i*64 + 2*j + 1 AS INT), 1))
        |                  + 256 * unicode(substr(text, CAST(i*64 + 2*j + 2 AS INT), 1))
        |                  AS raw) r)
        |  GROUP BY id, i),
        |per AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS n_frames,
        |         CAST(sum(energy) AS BIGINT) AS energy_total,
        |         CAST(max(peak) AS BIGINT) AS peak
        |  FROM fr GROUP BY id),
        |q AS (
        |  SELECT fr.id,
        |         CAST(sum(CASE WHEN fr.energy * per.n_frames * 2
        |                            < per.energy_total THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_quiet
        |  FROM fr JOIN per ON per.id = fr.id GROUP BY fr.id)
        |SELECT d.id, coalesce(per.n_frames, 0) AS n_frames,
        |       coalesce(per.energy_total, 0) AS energy_total,
        |       coalesce(per.peak, 0) AS peak,
        |       coalesce(q.n_quiet, 0) AS n_quiet
        |FROM d LEFT JOIN per ON per.id = d.id LEFT JOIN q ON q.id = d.id
        |ORDER BY d.id""".stripMargin,
    // the Walsh-Hadamard pHash re-derived relationally: 64 sampled byte
    // "pixels" (ASCII text bytes, like every byte-level oracle here),
    // ±1 weights from popcount parity, lower-median threshold, 16 bits
    "mm_phash" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |px AS (
        |  SELECT doc_id, i,
        |         CASE WHEN n = 0 THEN 0
        |              ELSE unicode(substr(text, CAST((i * n) // 64 AS INT) + 1, 1))
        |         END AS p
        |  FROM d, LATERAL (SELECT unnest(generate_series(0, 63)) AS i)),
        |jt AS (SELECT rf.g * 8 + cf.g AS j, rf.g * 4 + cf.g AS b
        |       FROM (SELECT unnest(generate_series(0, 3)) AS g) rf,
        |            (SELECT unnest(generate_series(0, 3)) AS g) cf),
        |coef AS (
        |  SELECT px.doc_id, jt.b,
        |         CAST(sum(CASE WHEN bit_count(jt.j & px.i) % 2 = 0
        |                       THEN px.p ELSE -px.p END) AS BIGINT) AS c
        |  FROM px CROSS JOIN jt GROUP BY 1, 2),
        |med AS (
        |  SELECT doc_id, c AS m FROM (
        |    SELECT doc_id, c, row_number() OVER (PARTITION BY doc_id ORDER BY c) AS rk
        |    FROM coef)
        |  WHERE rk = 8),
        |ph AS (
        |  SELECT coef.doc_id AS id,
        |         CAST(sum(CASE WHEN coef.c > med.m THEN 1::BIGINT << coef.b
        |                       ELSE 0 END) AS BIGINT) AS phash
        |  FROM coef JOIN med ON coef.doc_id = med.doc_id GROUP BY 1),
        |bk AS (SELECT phash, CAST(count(*) AS BIGINT) AS bucket_size
        |       FROM ph GROUP BY 1)
        |SELECT ph.id, ph.phash, bk.bucket_size
        |FROM ph JOIN bk USING (phash) ORDER BY ph.id""".stripMargin,
    "mm_pair_embed" ->
      """WITH m AS (SELECT doc_id AS id, strlen(text) AS n_bytes
        |           FROM documents),
        |e AS (SELECT vec_id AS id, label,
        |             CAST(round(sqrt(list_sum(list_transform(
        |                    CAST(embedding AS DOUBLE[]), x -> x * x))) * 1e6)
        |                  AS BIGINT) AS norm_micro
        |      FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |       CAST(sum(norm_micro) AS BIGINT) AS sum_norm_micro,
        |       round(sum(norm_micro) / count(*) / 1000000.0, 6) AS avg_norm
        |FROM m JOIN e USING (id)
        |GROUP BY label ORDER BY label""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id AS id, 'image' AS kind,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       CAST(64 + octet_length(CAST(text AS BLOB)) % 577 AS BIGINT) AS width,
        |       CAST(64 + (ascii(substring(text, 1, 1)) * 7 + octet_length(CAST(text AS BLOB))) % 353 AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels
        |FROM documents ORDER BY id""".stripMargin,
    "mm_media_sizes" ->
      """SELECT 'image' AS kind, count(*) AS n_media,
        |       CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |       CAST(min(octet_length(CAST(text AS BLOB))) AS BIGINT) AS min_bytes,
        |       CAST(max(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes
        |FROM documents""".stripMargin,
    // chunking arithmetic: n_chunks = ceil(L/64); kept frames are the even
    // chunk indices; the (possibly short) last chunk contributes its true
    // size only when its index is even
    "mm_frame_stats" ->
      """WITH m AS (
        |  SELECT doc_id AS id, octet_length(CAST(text AS BLOB)) AS L,
        |         (octet_length(CAST(text AS BLOB)) + 63) // 64 AS n_chunks
        |  FROM documents)
        |SELECT id, CAST((n_chunks + 1) // 2 AS BIGINT) AS n_frames,
        |       CAST(CASE WHEN (n_chunks - 1) % 2 = 0
        |                 THEN 64 * ((n_chunks + 1) // 2 - 1) + (L - 64 * (n_chunks - 1))
        |                 ELSE 64 * ((n_chunks + 1) // 2) END AS BIGINT) AS frame_bytes
        |FROM m ORDER BY id""".stripMargin,
    "mm_resize_sizes" ->
      """SELECT doc_id AS id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_orig,
        |       CAST((octet_length(CAST(text AS BLOB)) + 3) // 4 AS BIGINT) AS n_resized
        |FROM documents ORDER BY id""".stripMargin
  )
}
