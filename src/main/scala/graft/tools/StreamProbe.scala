package graft.tools

import graft.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.OutputMode

/** Dev utility: run one streaming-bridge shape and print the engine's own
  * per-micro-batch duration breakdown (`StreamingQueryProgress.json`:
  * addBatch / getBatch / queryPlanning / walCommit / commitOffsets, plus
  * per-operator state-store commit times), so streaming-floor optimization
  * targets the measured cost instead of a guess. The registry bridges hide
  * the `StreamingQuery` handle behind `runSettled`, hence this probe.
  *
  * Usage: runMain graft.tools.StreamProbe <sfDir> <shape[,shape...]> [shufflePartitions]
  * Shapes: ivfull ivleft ivjoin leaderboard tumbling availnow
  * Each shape runs twice in the same JVM — the second run is the marginal
  * (warm-session) cost the bench's per-query times approximate.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shapes =
      if (args.length > 1) args(1).split(",").toSeq else Seq("ivfull")
    val parts = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def events(): DataFrame = {
      Tables.events(spark, sfDir)
      val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
      val src =
        spark.readStream.schema(raw).parquet(s"$sfDir/{events}.parquet")
      Tables.normalizeTs(src, raw("ts").dataType)
    }

    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(shape: String): Unit = {
      val (df, mode, single) = shape match {
        case "ivfull" =>
          spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
          (StreamingOps.purchasesAfterSignupFull(events()),
            OutputMode.Append(), false)
        case "ivleft" =>
          spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
          (StreamingOps.purchasesAfterSignupOuter(events()),
            OutputMode.Append(), false)
        case "ivjoin" =>
          (StreamingOps.purchasesAfterSignup(events()),
            OutputMode.Append(), true)
        case "leaderboard" =>
          (StreamingOps.userLeaderboard(events()), OutputMode.Complete(), true)
        case "tumbling" =>
          (StreamingOps.tumblingCounts(events()), OutputMode.Complete(), true)
        case "sessionwin" =>
          (StreamingOps.sessionCounts(events()), OutputMode.Complete(), true)
        case "sstarts" =>
          import spark.implicits._
          val ev = events()
            .select(org.apache.spark.sql.functions.col("event_id"),
              org.apache.spark.sql.functions.col("ts"),
              org.apache.spark.sql.functions.col("user_id"),
              org.apache.spark.sql.functions.col("event_type"),
              org.apache.spark.sql.functions.col("value"))
            .as[StreamingOps.Event]
          (StreamingOps.sessionStarts(ev).toDF(), OutputMode.Append(), true)
        case "simdedup" =>
          import org.apache.spark.sql.functions._
          val raw = spark.read.parquet(s"$sfDir/documents.parquet").schema
          val src = spark.readStream.schema(raw)
            .parquet(s"$sfDir/{documents}.parquet")
          val sigs = src.select(col("doc_id"),
            graft.queries.DedupQueries.simhashCol.as("simhash"))
            .withColumn("ts",
              timestamp_seconds(lit(1700000000L) + col("doc_id") % 600))
          val redelivered = sigs
            .select(col("doc_id"), col("simhash"), col("ts"),
              explode(array(lit(0), lit(1))).as("delivery"))
            .drop("delivery")
          (StreamingOps.streamingSimhashDedup(redelivered),
            OutputMode.Append(), true)
        case "simsig" => // simdedup minus the dedup operator (isolation probe)
          import org.apache.spark.sql.functions._
          val t0b = System.nanoTime()
          graft.queries.DedupQueries.simhashSignatures(spark, sfDir).count()
          println(f"  batch simhashSignatures: ${(System.nanoTime() - t0b) / 1e9}%.2f s")
          val raw = spark.read.parquet(s"$sfDir/documents.parquet").schema
          val src = spark.readStream.schema(raw)
            .parquet(s"$sfDir/{documents}.parquet")
          val sigs = src.select(col("doc_id"),
            graft.queries.DedupQueries.simhashCol.as("simhash"))
            .withColumn("ts",
              timestamp_seconds(lit(1700000000L) + col("doc_id") % 600))
          (sigs.select(col("doc_id"), col("simhash"), col("ts"),
              explode(array(lit(0), lit(1))).as("delivery"))
            .drop("delivery"),
            OutputMode.Append(), true)
        case "chained" =>
          (StreamingOps.chainedWindowAgg(events()), OutputMode.Append(), false)
        case "latedrop" =>
          // two-phase checkpoint-restart probe (the stream_late_drop shape):
          // times each phase's stream lifecycle separately so the bridge's
          // wall splits into staging writes vs the two stream starts
          import org.apache.spark.sql.functions._
          val srcDir = java.nio.file.Files.createTempDirectory("graft-probe-late")
          val ckpt = java.nio.file.Files.createTempDirectory("graft-probe-lckpt")
          val ev = Tables.events(spark, sfDir).select(col("event_id"), col("ts"))
          val schema = ev.schema
          def phase(label: String)(f: => Unit): Unit = {
            val t0 = System.nanoTime()
            f
            println(f"  latedrop $label%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          }
          def runPhase(): Unit = {
            val q = spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
              .withWatermark("ts", "10 minutes")
              .groupBy(window(col("ts"), "5 minutes").as("win"))
              .agg(count(lit(1)).as("n_events"))
              .writeStream.outputMode(OutputMode.Update())
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (b: DataFrame, _: Long) => b.collect(); () }
              .start()
            try q.processAllAvailable() finally q.stop()
          }
          phase("write on_time") { ev.filter(col("event_id") % 2 === 0)
            .coalesce(1).write.parquet(s"$srcDir/on_time") }
          phase("stream 1") { runPhase() }
          phase("write late") { ev.filter(col("event_id") % 2 === 1)
            .coalesce(1).write.parquet(s"$srcDir/late") }
          phase("stream 2") { runPhase() }
          import scala.reflect.io.Directory
          new Directory(srcDir.toFile).deleteRecursively()
          new Directory(ckpt.toFile).deleteRecursively()
          return
        case "availnow" =>
          import org.apache.spark.sql.functions._
          val root = "/tmp/graft_probe_avnow"
          Tables.events(spark, sfDir).repartition(4)
            .write.mode("overwrite").parquet(root)
          val raw = spark.read.parquet(root).schema
          val src = Tables.normalizeTs(
            spark.readStream.schema(raw).option("maxFilesPerTrigger", "1")
              .parquet(root),
            raw("ts").dataType)
          (src.groupBy("user_id", "event_type")
            .agg(count(lit(1)).as("n"),
              sum(round(col("value") * 100).cast("long")).as("v_c")),
            OutputMode.Complete(), true)
        case other => sys.error(s"unknown shape $other")
      }
      val name = s"probe_${shape}_${n.incrementAndGet()}"
      val t0 = System.nanoTime()
      val q =
        if (shape == "availnow")
          StreamingOps.toMemorySinkAvailableNow(df, name, mode)
        else StreamingOps.toMemorySink(df, name, mode, single)
      try {
        if (single) q.awaitTermination() else q.processAllAvailable()
      } finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"== $shape parts=$parts wall=$secs%.2f s batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        val so = p.stateOperators.map(o =>
          s"${o.operatorName}:commit=${o.commitTimeMs}ms,rows=${o.numRowsTotal}")
          .mkString(" | ")
        println(s"  batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs} state[$so]")
      }
      spark.catalog.dropTempView(name)
    }

    shapes.foreach { sh => run(sh); run(sh) }
    spark.stop()
  }
}
