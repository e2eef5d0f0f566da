package graft

import graft.config.{Enums, PlaybackConfig}
import Enums._
import graft.streaming.{Playback, PlaybackStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.{Files, Paths, StandardCopyOption}

class PlaybackFacadeSpec extends SparkSpec {

  private def stagedCfg(post: Enums.PostProcess = PostProcess.ContinuePlaying) = {
    val dir = Files.createTempDirectory("facade")
    Files.copy(Paths.get(fixture("vibration.csv")), dir.resolve("vibration.csv"),
      StandardCopyOption.REPLACE_EXISTING)
    PlaybackConfig(csvDirName = dir.toString, csvFileName = "vibration",
      ingestMode = IngestMode.Continuous, sampleRate = 3,
      timestampStyle = TimestampStyle.CopyCsvValue, timestampCol = "user_ts",
      postProcessMethod = post)
  }

  test("start() delivers readings to the ingest callback (K1 parity)") {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val q = Playback.start(spark, stagedCfg())(rows => rows.foreach(got.add))
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (got.size() < 6 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(got.size() >= 6, "two file passes delivered via callback")
    } finally q.stop()
  }

  test("ThroughputListener accumulates and reports (E5 TIME_IT parity)") {
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new Playback.ThroughputListener(every = 5, log = reports.add(_))
    spark.streams.addListener(l)
    val q = Playback.start(spark, stagedCfg())(_ => ())
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (l.totalReadings < 10 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(l.totalReadings >= 10)
      assert(!reports.isEmpty, "periodic throughput lines emitted")
      assert(reports.peek().contains("readings/s"))
    } finally { q.stop(); spark.streams.removeListener(l) }
  }

  test("windowed aggregation with watermark runs on the playback stream " +
      "(relational streaming comes free from Catalyst)") {
    val cfg = stagedCfg()
    val agg = PlaybackStream.readings(spark, cfg)
      .withWatermark("timestamp", "1 second")
      .groupBy(window(col("timestamp"), "1 second"))
      .agg(count(lit(1)).as("n"), avg(col("channel1").cast("double")).as("avg_c1"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("windowed")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def rows() = spark.sql("SELECT * FROM windowed").count()
      while (rows() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(rows() >= 1)
      val r = spark.sql("SELECT n FROM windowed ORDER BY n DESC").head()
      assert(r.getLong(0) >= 3, "all three same-second readings land in one window")
    } finally q.stop()
  }

  test("reconfigure swaps config without the reference's 10s sleep") {
    val got = new java.util.concurrent.atomic.AtomicLong
    val q1 = Playback.start(spark, stagedCfg())(rows => got.addAndGet(rows.size))
    val t0 = System.currentTimeMillis()
    val q2 = Playback.reconfigure(spark, q1, stagedCfg())(rows => got.addAndGet(rows.size))
    val reconfMs = System.currentTimeMillis() - t0
    try {
      assert(!q1.isActive && q2.isActive)
      assert(reconfMs < 10000, s"reconfigure took ${reconfMs}ms, reference sleeps 10s")
    } finally q2.stop()
  }
}
