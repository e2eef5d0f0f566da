package graft.streaming

import graft.config.PlaybackConfig
import graft.operators.TimestampStyles
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Plugin-lifecycle facade: the reference's entry points
  * (plugin_init / plugin_start / plugin_poll / plugin_reconfigure /
  * plugin_shutdown, csvplayback.py:258-474) mapped onto Structured
  * Streaming's query lifecycle.
  *
  * | reference                      | here                            |
  * |--------------------------------|---------------------------------|
  * | plugin_init(config)            | `PlaybackConfig(...).validated` |
  * | plugin_start + ingest callback | [[start]] with a row callback   |
  * | plugin_poll ticks              | micro-batch triggers            |
  * | plugin_reconfigure             | [[reconfigure]] (stop + start)  |
  * | plugin_shutdown                | `query.stop()`                  |
  * | TIME_IT throughput prints      | [[ThroughputListener]] (E5)     |
  *
  * The reference's hand-rolled producer/consumer bounded queue
  * (csvplayback.py:787-930, E4) has no equivalent code here: trigger
  * pacing + source admission control ARE that backpressure.
  */
object Playback {

  /** plugin_start + async ingest callback (K1, csvplayback.py:907-912):
    * each micro-batch is delivered to `ingest` as reading rows. The
    * callback runs on the driver (like the reference's C callback);
    * heavy sinks should use `writeStream` directly instead. */
  def start(spark: SparkSession, cfg: PlaybackConfig)
      (ingest: Seq[Row] => Unit): StreamingQuery = {
    val readings = PlaybackStream.readings(spark, cfg.validated)
    readings.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingest(batch.collect().toSeq)
      }
      .trigger(pollTrigger(cfg))
      .start()
  }

  /** Emission cadence is governed by the SOURCE's wall-clock admission
    * (`PlaybackConfig.paceSec`), so the trigger only needs to poll at
    * least that often — a quarter of the pace keeps the quantization
    * error small without hot-spinning, and a trigger cycle that
    * overruns one pace tick no longer aliases the rate to the next
    * trigger boundary (the source releases the next due chunk at the
    * first trigger after it falls due). */
  private def pollTrigger(cfg: PlaybackConfig): Trigger =
    Trigger.ProcessingTime(math.max(1L, (cfg.paceSec * 1000 / 4).toLong))

  /** Burst/continuous emission into an arbitrary sink format. */
  def startTo(spark: SparkSession, cfg: PlaybackConfig, format: String,
      options: Map[String, String] = Map.empty): StreamingQuery =
    PlaybackStream.readings(spark, cfg.validated)
      .writeStream.format(format).options(options)
      .trigger(pollTrigger(cfg))
      .start()

  /** plugin_reconfigure (csvplayback.py:336-353): stop, swap config,
    * start — without the reference's hard-coded 10 s sleep (stop() is
    * synchronous here). */
  def reconfigure(spark: SparkSession, running: StreamingQuery,
      newCfg: PlaybackConfig)(ingest: Seq[Row] => Unit): StreamingQuery = {
    running.stop()
    start(spark, newCfg)(ingest)
  }

  /** E5 (TIME_IT, csvplayback.py:916-922): throughput instrumentation —
    * total readings, readings/sec, batches/sec — over the streaming
    * progress events, logging every `every` readings. */
  class ThroughputListener(every: Long = 10000, log: String => Unit = println)
      extends StreamingQueryListener {
    import StreamingQueryListener._
    private val total = new java.util.concurrent.atomic.AtomicLong
    private val batches = new java.util.concurrent.atomic.AtomicLong
    private val startNanos = System.nanoTime()
    private val lastReport = new java.util.concurrent.atomic.AtomicLong

    def totalReadings: Long = total.get()

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val t = total.addAndGet(e.progress.numInputRows)
      val b = batches.incrementAndGet()
      if (t - lastReport.get() >= every) {
        lastReport.set(t)
        val sec = (System.nanoTime() - startNanos) / 1e9
        log(f"[playback] total=$t readings in $sec%.1f s · " +
          f"${t / sec}%.0f readings/s · ${b / sec}%.1f batches/s")
      }
    }
  }
}
