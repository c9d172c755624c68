package graft

import org.apache.spark.sql.functions._

/** Checkpoint recovery: the fault-tolerance contract the reference
  * implements by hand (coordinator re-dispatch of lost tasks,
  * /root/reference/src/coordinator/mod.rs:328-500) and Spark gives via the
  * checkpoint log. A stateful aggregation is run over file batch 1,
  * STOPPED, and restarted on the same checkpoint after file batch 2
  * arrives: the restarted query must (a) carry the state store forward —
  * users from batch 1 keep their counts — and (b) never reprocess batch 1
  * (the file-source log records consumed files), so totals exactly equal
  * the batch aggregate over both files. Sink = foreachBatch upsert into a
  * driver map (the memory sink forbids recovery by design).
  */
class StreamingRecoverySpec extends SparkSpec {

  test("stateful agg resumes from checkpoint: state kept, no reprocessing") {
    val srcDir = java.nio.file.Files.createTempDirectory("rec-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rec-ckpt").toString

    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "value")
    val schema = ev.schema
    def writeBatch(cond: org.apache.spark.sql.Column, name: String): Unit =
      ev.filter(cond).coalesce(1).write.parquet(s"$srcDir/$name")

    // accumulated sink: upsert per micro-batch, keyed by user
    val totals = scala.collection.concurrent.TrieMap.empty[Long, Long]
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => totals(r.getLong(0)) = r.getLong(1))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    writeBatch(col("event_id") % 2 === 0, "half_a")
    run()
    val afterFirst = totals.toMap
    assert(afterFirst.nonEmpty, "first run produced no state")

    writeBatch(col("event_id") % 2 === 1, "half_b")
    run()

    val expected = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals.toMap == expected,
      s"restart diverged from batch: got=${totals.toMap} want=$expected")
    // reprocessing batch 1 would have doubled its users' counts past the
    // batch totals — equality above is the exactly-once claim; this pins
    // that the restart actually ADDED to prior state rather than starting
    // from zero over only the new file
    val grew = expected.exists { case (u, n) => afterFirst.get(u).exists(_ < n) }
    assert(grew, "no user's count grew across the restart — state not carried")
  }
}
