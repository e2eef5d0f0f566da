package graft

import graft.config.{Enums, PlaybackConfig}
import Enums._
import graft.streaming.PlaybackStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Playback throughput benchmark: exports the events table to CSV once,
  * then replays it forever through the csvplayback source at the
  * reference's validated 1M readings/sec ceiling, reporting sustained
  * throughput (BASELINE.md target: ≥ 500k readings/sec).
  *
  * Standalone main so it can run under a profiler; Bench.scala embeds
  * the same measurement in the per-round JSON.
  */
object PlaybackBench {

  def exportCsv(spark: SparkSession, sfDir: String, workDir: java.nio.file.Path): Unit = {
    val out = workDir.resolve("export")
    Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS+0000").as("user_ts"))
      .coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(out.toString)
    val part = java.nio.file.Files.list(out).iterator()
    val csv = scala.jdk.CollectionConverters.IteratorHasAsScala(part).asScala
      .find(_.toString.endsWith(".csv")).get
    java.nio.file.Files.move(csv, workDir.resolve("events_play.csv"))
  }

  /** Plays for `seconds`, returns readings/sec. `rate` is the
    * configured admission ceiling (readings/sec); measured throughput
    * saturates at min(rate, engine capability), so probing the
    * engine's own ceiling needs a rate set above it. */
  def run(spark: SparkSession, sfDir: String, seconds: Int = 10,
      rate: Int = 1000000): Double = {
    val workDir = java.nio.file.Files.createTempDirectory("playback-bench")
    exportCsv(spark, sfDir, workDir)
    val cfg = PlaybackConfig(
      csvDirName = workDir.toString, csvFileName = "events_play",
      ingestMode = IngestMode.Burst, sampleRate = rate, burstInterval = 500,
      postProcessMethod = PostProcess.ContinuePlaying)
    val rows = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        rows.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q = PlaybackStream.readings(spark, cfg)
      .writeStream.format("noop")
      .trigger(Trigger.ProcessingTime(500))
      .start()
    try {
      Thread.sleep(2000) // warmup
      val t0 = System.nanoTime()
      val rows0 = rows.get()
      Thread.sleep(seconds * 1000L)
      val rows1 = rows.get()
      val dt = (System.nanoTime() - t0) / 1e9
      (rows1 - rows0) / dt
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(workDir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Aggregate throughput over `n` concurrent playback queries, each
    * at the reference's maximum configurable rate (sampleRate ≤ 1M is
    * the reference's own validation rule, mirrored by PlaybackConfig —
    * a single stream cannot be configured faster). The reference runs
    * one plugin instance per file on one thread; Structured Streaming
    * schedules many independent playback queries onto one executor
    * pool, so aggregate ingest scales with cores until parse bandwidth
    * saturates. Returns total readings/sec across all queries. */
  def runConcurrent(spark: SparkSession, sfDir: String, n: Int,
      seconds: Int = 10): Double = {
    val workDir = java.nio.file.Files.createTempDirectory("playback-bench")
    exportCsv(spark, sfDir, workDir)
    val rows = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        rows.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val queries = (1 to n).map { _ =>
      val cfg = PlaybackConfig(
        csvDirName = workDir.toString, csvFileName = "events_play",
        ingestMode = IngestMode.Burst, sampleRate = 1000000,
        burstInterval = 500,
        postProcessMethod = PostProcess.ContinuePlaying)
      PlaybackStream.readings(spark, cfg)
        .writeStream.format("noop")
        .trigger(Trigger.ProcessingTime(500))
        .start()
    }
    try {
      Thread.sleep(3000) // warmup
      val t0 = System.nanoTime()
      val rows0 = rows.get()
      Thread.sleep(seconds * 1000L)
      val rows1 = rows.get()
      val dt = (System.nanoTime() - t0) / 1e9
      (rows1 - rows0) / dt
    } finally {
      queries.foreach(_.stop())
      spark.streams.removeListener(listener)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(workDir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seconds = args.headOption.map(_.toInt).getOrElse(10)
    val streams = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val rps =
      if (streams > 1) runConcurrent(spark, sfDir, streams, seconds)
      else run(spark, sfDir, seconds,
        rate = sys.env.get("SPARK_GRAFT_PLAYBACK_RATE").map(_.toInt).getOrElse(1000000))
    println(f"""{"metric":"playback_rps","value":$rps%.0f,"unit":"rows/sec","sf":"$sfDir","streams":$streams}""")
    spark.stop()
  }
}
