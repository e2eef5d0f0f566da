package graft.tools

import graft.config.{Enums, PlaybackConfig}
import Enums._
import graft.streaming.Playback
import org.apache.spark.sql.SparkSession

/** Live demo of the plugin-lifecycle facade (dev tool): plays a staged
  * CSV via the ingest callback with TIME_IT-style throughput lines,
  * reconfigures mid-flight, then runs the preprocessing CLI path. */
object FacadeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("facade-demo")
    java.nio.file.Files.writeString(dir.resolve("vibration.csv"),
      "channel1,channel2,user_ts\n" + (0 until 500).map(i =>
        f"0.00$i%04d,0.001,2019-12-12 10:00:00.${i * 125}%06d+0000").mkString("\n") + "\n")

    val cfg = PlaybackConfig(csvDirName = dir.toString, csvFileName = "vibration",
      ingestMode = IngestMode.Continuous, sampleRate = 500,
      timestampStyle = TimestampStyle.CopyCsvValue, timestampCol = "user_ts",
      postProcessMethod = PostProcess.ContinuePlaying)

    val listener = new Playback.ThroughputListener(every = 1000)
    spark.streams.addListener(listener)
    val got = new java.util.concurrent.atomic.AtomicLong
    val q1 = Playback.start(spark, cfg)(rows => got.addAndGet(rows.size))
    while (got.get() < 2000) Thread.sleep(50)
    println(s"[demo] ingest callback received ${got.get()} readings (>=4 file passes)")

    // reconfigure mid-flight to a different rate
    val q2 = Playback.reconfigure(spark, q1, cfg.copy(sampleRate = 100))(
      rows => got.addAndGet(rows.size))
    println(s"[demo] reconfigured: q1.active=${q1.isActive} q2.active=${q2.isActive}")
    Thread.sleep(1500)
    q2.stop()

    // preprocessing CLI path: extract + repair + CSV write
    val raw = graft.sources.CsvPlayback.readFile(spark, PlaybackConfig(),
      "/root/repo/src/test/resources/raw_fledge_export.csv")
    val out = dir.resolve("clean_out").toString
    graft.preprocess.CleanCsv.process(raw, out, choice = "fill", method = "linear")
    val written = spark.read.option("header", "true").csv(out)
    println(s"[demo] CleanCsv.process wrote ${written.count()} rows, cols=${written.columns.mkString(",")}")
    spark.stop()
  }
}
