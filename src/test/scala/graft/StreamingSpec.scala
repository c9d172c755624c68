package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming semantics: drive the same transforms that the batch
  * EventQueries oracle-check, through a MemoryStream in micro-batches, and
  * compare against the batch result on identical data.
  */
class StreamingSpec extends SparkSpec {

  private def sampleEvents: Seq[Event] = {
    val base = 1700000000000L
    (0 until 200).map { i =>
      Event(i.toLong, new java.sql.Timestamp(base + i * 73000L), (i % 7).toLong,
        Seq("click", "view", "purchase")(i % 3), (i % 13) * 1.5)
    }
  }

  test("streaming tumbling counts == batch tumbling counts on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.toMemorySink(
      StreamingOps.tumblingCounts(stream.toDF()), "tumbling_out", OutputMode.Complete())
    try {
      val (first, second) = sampleEvents.splitAt(120)
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("win_start", "event_type").collect().toSeq
      val batch = StreamingOps.tumblingCounts(sampleEvents.toDF())
        .orderBy("win_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming session windows produce per-user sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.toMemorySink(
      StreamingOps.sessionCounts(stream.toDF()), "session_out", OutputMode.Complete())
    try {
      stream.addData(sampleEvents)
      q.processAllAvailable()
      val sessions = spark.table("session_out").collect()
      assert(sessions.nonEmpty)
      // event cadence is 73s < 30min gap → exactly one session per user
      assert(sessions.length == 7)
      assert(sessions.map(_.getAs[Long]("n_events")).sum == 200L)
    } finally q.stop()
  }

  test("mapGroupsWithState: running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.runningUserTotals(stream.toDS())
      .writeStream.format("memory").queryName("totals_out")
      .outputMode(OutputMode.Update()).start()
    try {
      val (first, second) = sampleEvents.splitAt(100)
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
      // last update per user must equal the full-data totals
      val last = spark.table("totals_out")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expected = sampleEvents.groupBy(_.user_id).map { case (u, es) =>
        (u, es.size.toLong, es.map(_.value).sum)
      }.toSet
      assert(last == expected)
    } finally q.stop()
  }

  test("file-source streaming: parquet directory drained with availableNow") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-src").toString
    sampleEvents.take(80).toDF().write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = StreamingOps.tumblingCounts(
        spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("file_out")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("file_out").agg(sum("cnt")).collect()(0).getLong(0)
      assert(streamed == 80L)
    } finally q.stop()
  }

  test("stream-stream interval join == batch range join across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // chronological feed: signups in micro-batch 1 must survive in state to
    // match purchases arriving in micro-batch 2 within the 1-hour horizon
    val base = 1700000000000L
    val evs = (0 until 300).map { i =>
      Event(i.toLong, new java.sql.Timestamp(base + i * 97000L), (i % 5).toLong,
        Seq("signup", "purchase", "view")(i % 3), i * 0.5)
    }
    val stream = MemoryStream[Event]
    val q = StreamingOps.toMemorySink(
      StreamingOps.purchasesAfterSignup(stream.toDF()), "ivjoin_out",
      OutputMode.Append())
    try {
      val (a, b) = evs.splitAt(150)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("signup_id", "purchase_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamed = pairs(spark.table("ivjoin_out"))
      val batch = pairs(StreamingOps.purchasesAfterSignup(evs.toDF()))
      assert(streamed.nonEmpty)
      // cross-batch matches must exist (a batch-1 signup with a batch-2
      // purchase), or the state-retention claim is untested
      assert(streamed.exists { case (s, p) => s < 150 && p >= 150 })
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream_late_drop: the committed watermark rejects some late rows, never on-time ones") {
    import org.apache.spark.sql.functions._
    val kept = graft.queries.StreamingBridge.lateDropViaStream(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    val total = Tables.events(spark, sf).count()
    // the oracle gate proves the drop BOUNDARY is exact; this pins that the
    // query is a non-vacuous demonstration: late rows were really dropped
    // (kept < total) and the on-time half survived intact (kept ≥ half)
    assert(kept < total, s"no late rows dropped: kept=$kept total=$total")
    assert(kept >= total / 2, s"on-time rows lost: kept=$kept total=$total")
  }

  test("streaming dedup drops re-delivered event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.toMemorySink(
      StreamingOps.streamingDedup(stream.toDF()), "dedup_out", OutputMode.Append())
    try {
      stream.addData(sampleEvents.take(50))
      q.processAllAvailable()
      stream.addData(sampleEvents.take(50)) // exact redelivery
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 50L)
    } finally q.stop()
  }

  test("bridges leave no conf or temp-view footprint on the shared session") {
    // The isolation contract: per-query streaming confs (max watermark
    // policy, RocksDB provider) and the memory-sink temp view live on the
    // bridge's private child session; the caller's session must come back
    // byte-identical. A concurrently-built query observing a flipped conf
    // is the race this pins against.
    val watchedConfs = Seq(
      "spark.sql.streaming.multipleWatermarkPolicy",
      "spark.sql.streaming.stateStore.providerClass")
    val before = watchedConfs.map(k => k -> spark.conf.getOption(k))
    // one bridge per conf class, both settle non-empty
    assert(queries.StreamingBridge.queries("stream_interval_left")(spark, sf)
      .count() >= 0)
    assert(queries.StreamingBridge.queries("stream_transform_state")(spark, sf)
      .count() > 0)
    val after = watchedConfs.map(k => k -> spark.conf.getOption(k))
    assert(after == before,
      s"bridge mutated shared-session conf: before=$before after=$after")
    val leaked = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_stream_"))
    assert(leaked.isEmpty, s"bridge leaked temp views: ${leaked.mkString(",")}")
  }
}
