package graft.queries

import graft.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch-equivalence bridge for the Structured Streaming operators: runs the
  * events table THROUGH the streaming engine (readStream → transform →
  * memory sink) and returns the settled result shaped exactly like the batch
  * query, so the streaming surface sits under the driver's DuckDB oracle
  * gate instead of only ScalaTest (`stream_events_tumbling` shares
  * `q_events_tumbling`'s oracle).
  *
  * The memory sink is the test/driver-visibility sink; in production the
  * identical `StreamingOps.tumblingCounts` plan writes to any sink with
  * watermark-bounded state (see graft.streaming). Unlike every other
  * registry entry this one executes eagerly (a streaming query must run to
  * produce its table) — the returned frame is the settled result.
  */
object StreamingBridge {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The events parquet as a bounded stream, with the same ns→µs timestamp
    * normalization the batch loader applies (streaming sources require an
    * explicit schema, so the raw — nanosAsLong — schema is probed first).
    */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d) // ensures the nanosAsLong conf is in place
    val raw = s.read.parquet(s"$d/events.parquet").schema
    // glob form: FileStreamSource requires a directory or glob basePath,
    // and the fixture is a single parquet file
    s.readStream.schema(raw).parquet(s"$d/{events}.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling windows via the streaming engine; equals `q_events_tumbling`. */
  def tumblingViaStream(s: SparkSession, d: String): DataFrame = {
    val name = s"graft_stream_tumbling_${counter.incrementAndGet()}"
    val q = StreamingOps.toMemorySink(
      StreamingOps.tumblingCounts(eventsStream(s, d)), name, OutputMode.Complete())
    try q.processAllAvailable() finally q.stop()
    s.table(name)
      .select(col("win_start").cast("long").as("win_start"), col("event_type"),
        col("cnt"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy("win_start", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_events_tumbling" -> (tumblingViaStream(_, _))
  )

  val oracles: Map[String, String] = Map(
    // identical oracle to q_events_tumbling — THAT is the equivalence claim
    "stream_events_tumbling" -> EventQueries.oracles("q_events_tumbling")
  )
}
