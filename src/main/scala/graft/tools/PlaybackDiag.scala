package graft.tools

import graft.config.{PlaybackConfig}
import graft.config.Enums._
import graft.streaming.PlaybackStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic: start N concurrent playback streams and print each
  * micro-batch's duration breakdown (triggerExecution, addBatch,
  * latestOffset, ...) to see where concurrent playback time goes.
  * Dev tool only — not part of the bench or verify surface. */
object PlaybackDiag {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val secs = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val workDir = java.nio.file.Files.createTempDirectory("playback-diag")
    graft.PlaybackBench.exportCsv(spark, sfDir, workDir)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[diag] q=${p.id.toString.take(8)} batch=${p.batchId} " +
          s"rows=${p.numInputRows} durations=${p.durationMs}")
      }
    })
    val qs = (1 to n).map { _ =>
      val cfg = PlaybackConfig(
        csvDirName = workDir.toString, csvFileName = "events_play",
        ingestMode = IngestMode.Burst, sampleRate = 1000000,
        burstInterval = 500,
        postProcessMethod = PostProcess.ContinuePlaying)
      PlaybackStream.readings(spark, cfg)
        .writeStream.format("noop")
        .trigger(Trigger.ProcessingTime(100))
        .start()
    }
    Thread.sleep(secs * 1000L)
    qs.foreach(q => try q.stop() catch { case _: Throwable => () })
    spark.stop()
  }
}
