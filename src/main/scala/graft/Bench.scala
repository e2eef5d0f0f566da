package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs the headline queries (the
  * `bench = true` subset of the registry: heavy relational joins/aggs,
  * dedup, ANN, text analysis) against `SPARK_GRAFT_SF_DIR`, plus the
  * playback-throughput measurement, and prints ONE JSON line.
  *
  * Timing = full query execution to an action (`count`), after a single
  * session-warmup query so JIT/codegen startup isn't billed to the
  * first headline query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the repeat runs re-cache identical plans by
    // design (CacheManager dedups them), and the resulting WARN spam
    // is the only thing WARN level ever printed here
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: touch every table once
    Tables.names.foreach(n => Tables(spark, sfDir, n).count())

    // dev knob: skip the playback stages to isolate query timings
    val skipPlayback = sys.env.contains("SPARK_GRAFT_SKIP_PLAYBACK")

    // Task-level failure accounting: every non-Success task end
    // (failure → scheduler retry, or kill) is counted and emitted in
    // the JSON. Round 11's bench tail carried an unexplained
    // "DataWritingSparkTask: Aborting commit" ERROR; with this listener
    // (and PlaybackBench.stopInterrupts naming the teardown-interrupt
    // cause) an abort is in-band data, not a stray stack trace.
    val taskFailed = new java.util.concurrent.atomic.AtomicLong
    val taskKilled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          e.reason match {
            case org.apache.spark.Success => ()
            case _: org.apache.spark.TaskKilled => taskKilled.incrementAndGet()
            case _ => taskFailed.incrementAndGet()
          }
      })

    // playback throughput first, before 20+ query runs fill the old gen.
    // Fixed-work CPU probes bracket the playback measurements so a
    // degraded host window (co-tenant contention) is visible IN the
    // bench JSON, not argued after the fact: probe seconds are
    // comparable across rounds, and host_noise_factor relates the
    // worst probe to the documented quiet-window anchor. The 8-thread
    // probe measures per-core SPEED only; the bracketing hostSentinel
    // scaling probes (1 thread vs all cores, same fixed work each)
    // additionally measure effective PARALLELISM — the dimension the
    // r9–r11 agg8 swings lived in (see PlaybackBench.HostSentinel).
    val sent0 = PlaybackBench.hostSentinel()
    val probe0 = PlaybackBench.cpuProbe()
    // every phase below ALSO carries its own concurrent contention
    // sample (loadavg + low-duty probe): the bracketing sentinels
    // attribute the RUN's window, the phase stats attribute each
    // NUMBER's window — contention that arrives and leaves inside one
    // phase (the r12 agg8 case: scaling 1.62 brackets around a
    // loadavg-19 phase) is now in-band next to the figure it dented
    val (playbackRps, playbackPhase) = PlaybackBench.sampledPhase {
      if (skipPlayback) -1.0
      else try PlaybackBench.run(spark, sfDir, seconds = 8)
      catch { case e: Throwable =>
        System.err.println(s"[bench] playback failed: ${e.getMessage}"); -1.0 }
    }
    val probe1 = PlaybackBench.cpuProbe()

    // aggregate ceiling: 8 concurrent playback queries, each at the
    // reference's 1M/sec maximum configurable rate (a single stream
    // cannot be configured faster — the cap is the reference's own
    // sampleRate validation rule, mirrored here). The reference runs
    // one plugin per thread; this engine schedules them onto one pool.
    val (playbackAgg8, agg8Phase) = PlaybackBench.sampledPhase {
      if (skipPlayback) -1.0
      else try PlaybackBench.runConcurrent(spark, sfDir, 8, seconds = 8)
      catch { case e: Throwable =>
        System.err.println(s"[bench] concurrent playback failed: ${e.getMessage}"); -1.0 }
    }
    val probe2 = PlaybackBench.cpuProbe()
    val sent1 = PlaybackBench.hostSentinel()

    // steady-state timing: first pass over the whole set pays Janino/JIT
    // compilation of each query's unique expression trees (one-time per
    // cluster lifetime) and warms the page cache; the reported number is
    // the per-query min over three INTERLEAVED rounds of the full set —
    // back-to-back repeats of one query all land inside the same
    // multi-second host stall (observed: one rotating query spiking
    // 5-10× with all three consecutive runs slow), while round-robin
    // spreads a query's three samples minutes apart so the min sees at
    // least one clean run.
    // dev knob: bench only the named queries (comma-separated) —
    // iterating on one operator shouldn't pay the full 40-query set
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) =>
        val want = only.split(",").map(_.trim).filter(_.nonEmpty).toSet
        QueryRegistry.benchNames.filter(want)
      case None => QueryRegistry.benchNames
    }
    // Each sample pays its own operator-cache builds: queries register
    // intermediate frames (ANN indexes, signature/window-hash streams)
    // in OpCaches, and Spark's CacheManager would otherwise hand a
    // later query — or a later sample of the same query — a warm frame
    // built on an earlier one's clock. Releasing after every run keeps
    // samples independent and timings standalone-honest; the assert
    // pins that no query leaks tracked frames past its release.
    def once(name: String): Long =
      try QueryRegistry.queryMap(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      finally {
        graft.operators.OpCaches.release(spark)
        assert(graft.operators.OpCaches.trackedCount == 0,
          s"$name left tracked operator caches behind")
      }
    // the queries phase samples PER QUERY: mark() tags the sampler with
    // the query about to run (outside its timed region), so every bench
    // entry carries its own contention evidence instead of the phase
    // pool's (r13 verdict item 3)
    val qSampler = new PlaybackBench.PhaseSampler()
    val measured =
      try measure(names, once, beforeEach = qSampler.mark)
      finally qSampler.stop() // idempotent: a query throw must still
                              // stop the ticker and keep its samples
    val queriesPhase = qSampler.stop()

    val (priorName, prior) = loadPriorBench()
    println(renderJson(measured, playbackRps, playbackAgg8, sfDir,
      probes = Seq(probe0, probe1, probe2),
      sentinels = Seq(sent0, sent1),
      stopInterrupts = PlaybackBench.stopInterrupts.get,
      taskFailed = taskFailed.get, taskKilled = taskKilled.get,
      phases = Seq("playback" -> playbackPhase, "agg8" -> agg8Phase,
        "queries" -> queriesPhase),
      queryContention = qSampler.labelStats,
      prior = prior, priorName = priorName,
      cpus = cpus, master = s"local[$cpus]"))
    spark.stop()
  }

  /** Previous round's per-query seconds, for in-band regression
    * annotation, plus WHICH file supplied them (emitted in the JSON as
    * `prior_bench` so a comparison against the current round's own
    * committed file — possible on a post-commit re-run, when the
    * highest-numbered BENCH_r*.json IS this round's — is visible in
    * the output, never a silently-empty regressions list).
    * GRAFT_PRIOR_BENCH names the JSON explicitly (`none` disables the
    * comparison entirely), else the highest-numbered BENCH_r*.json in
    * the working directory — correct on the driver's own cadence,
    * where round N's artifacts are committed only after round N's
    * bench ran. Absent/unparseable → empty map, no annotation. */
  def loadPriorBench(): (Option[String], Map[String, Double]) = {
    val path = sys.env.get("GRAFT_PRIOR_BENCH")
      .filter(_.trim.toLowerCase != "none")
      .orElse {
        if (sys.env.get("GRAFT_PRIOR_BENCH").exists(
            _.trim.toLowerCase == "none")) None
        else Option(new java.io.File(".").listFiles())
          .getOrElse(Array.empty)
          .filter(_.getName.matches("BENCH_r\\d+\\.json"))
          .sortBy(_.getName.replaceAll("\\D", "").toInt)
          .lastOption.map(_.getPath)
      }
    path.flatMap { p =>
      try Some(p -> parsePriorQueries(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)))))
      catch { case _: Throwable => None }
    } match {
      case Some((p, m)) => (Some(p), m)
      case None => (None, Map.empty)
    }
  }

  /** Minimal extraction of `"queries":{"name":sec,...}` from a prior
    * bench JSON line (no JSON lib in the runtime classpath — the shape
    * is this main's own output). */
  def parsePriorQueries(json: String): Map[String, Double] = {
    val m = java.util.regex.Pattern.compile("\"queries\":\\{(.*?)\\}")
      .matcher(json)
    if (!m.find()) Map.empty
    else {
      val pair = java.util.regex.Pattern
        .compile("\"([A-Za-z0-9_]+)\":(-?[0-9.]+)")
      val it = pair.matcher(m.group(1))
      val out = Map.newBuilder[String, Double]
      while (it.find()) out += (it.group(1) -> it.group(2).toDouble)
      out.result()
    }
  }

  /** One query's bench outcome: best wall time over the sample rounds
    * (−1 if ANY sample failed — a fast-failing query must read as
    * broken, never as a 0.05 s win), the warmup-pass row count, and
    * the warmup-pass wall seconds (the one run that pays one-time
    * costs: Janino/JIT, page cache, and any memoized model builds —
    * e.g. t39's 512-merge BPE train, whose steady-state min prices
    * only the cached-model read). */
  final case class QueryResult(sec: Double, rows: Long,
      warmupSec: Double = -1.0) {
    def failed: Boolean = sec < 0 || rows < 0
  }

  /** Bench rows whose steady-state timing reads a per-JVM memoized
    * model (trained once, on the warmup pass) rather than re-running
    * the full build — emitted in the JSON so the number can never be
    * quoted as a train cost; the train wall is the row's
    * `warmup_queries` entry. */
  val MemoizedBench: Set[String] = Set("t39_bpe_wide_train")

  /** Runs the warmup pass + 3 interleaved timing rounds over `names`
    * through `once` (which returns the row count, or −1 on failure).
    * Pure harness logic, separated from SparkSession wiring so the
    * failure-accounting contract is unit-testable (BenchHarnessSpec). */
  def measure(names: Seq[String], once: String => Long,
      rounds: Int = 3,
      beforeEach: String => Unit = _ => ()): Seq[(String, QueryResult)] = {
    val warmup = names.map { n => // warmup pass, timed: its wall is the
      beforeEach(n)               // only place one-time costs (JIT, page
      val t0 = System.nanoTime()  // cache, memoized model trains) show up
      val rc = once(n)
      n -> (rc, (System.nanoTime() - t0) / 1e9)
    }.toMap
    val best = scala.collection.mutable.Map.empty[String, Double]
    val broken = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to rounds; name <- names) {
      beforeEach(name) // un-timed: sampler mark (~8 ms probe)
      val t0 = System.nanoTime()
      val rc = once(name)
      val sec = (System.nanoTime() - t0) / 1e9
      if (rc < 0) broken += name
      else if (best.getOrElse(name, Double.MaxValue) > sec) best(name) = sec
    }
    names.map { name =>
      val (rows, wsec) = warmup(name)
      val ok = !broken(name) && rows >= 0 && best.contains(name)
      name -> QueryResult(if (ok) best(name) else -1.0, rows, wsec)
    }
  }

  /** The one-line bench JSON. Failed queries appear with timing −1 AND
    * in a `"failed"` list; the total sums only successful timings, so a
    * broken query can never flatter the headline number. A non-empty
    * failed list also sets `"bench_failures"` so the driver sees a
    * scalar flag even if it only reads top-level fields. */
  def renderJson(results: Seq[(String, QueryResult)], playbackRps: Double,
      playbackAgg8: Double, sfDir: String,
      probes: Seq[Double] = Nil,
      sentinels: Seq[PlaybackBench.HostSentinel] = Nil,
      stopInterrupts: Long = 0L,
      taskFailed: Long = 0L, taskKilled: Long = 0L,
      phases: Seq[(String, PlaybackBench.PhaseStats)] = Nil,
      queryContention: Map[String, PlaybackBench.PhaseStats] = Map.empty,
      prior: Map[String, Double] = Map.empty,
      priorName: Option[String] = None,
      cpus: String = "", master: String = ""): String = {
    val qs = results.map { case (k, r) => "\"" + k + f"""":${r.sec}%.3f""" }
      .mkString("{", ",", "}")
    // warmup-pass walls: where one-time costs live (JIT, page cache,
    // memoized model trains) — t39's 512-merge train wall is THIS
    // map's entry, never the steady-state row
    val wq = results.collect { case (k, r) if r.warmupSec >= 0 =>
      "\"" + k + f"""":${r.warmupSec}%.3f""" }.mkString("{", ",", "}")
    val memo = results.collect { case (k, _) if MemoizedBench(k) =>
      "\"" + k + "\"" }.mkString("[", ",", "]")
    val failed = results.collect { case (k, r) if r.failed => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val nFailed = results.count(_._2.failed)
    val total = results.collect { case (_, r) if !r.failed => r.sec }.sum
    // host-contention sentinel: absolute fixed-work probe seconds
    // (round-over-round comparable) + worst probe over the quiet
    // anchor. factor ~1 = clean window; >~2 = the playback numbers in
    // THIS json were measured under co-tenant contention.
    val probeJson = probes.map(p => f"$p%.3f").mkString("[", ",", "]")
    val noise = if (probes.isEmpty) -1.0
      else probes.max / PlaybackBench.QuietProbeSec
    // parallelism sentinel: worst (max) scaling ratio over the
    // bracketing snapshots — ~1 = all cores effectively free; on a
    // 32-core host a value of R means only ~cores/R cores' worth of
    // CPU was available, and agg8 in THIS json is expected ~R× low.
    val sentJson = sentinels.map(_.json).mkString("[", ",", "]")
    val worstScaling =
      if (sentinels.isEmpty) -1.0 else sentinels.map(_.scalingRatio).max
    // phase-LOCAL contention: each headline number's own window,
    // sampled concurrently while that phase ran (loadavg + low-duty
    // probe) — the bracketing sentinels attribute the run, these
    // attribute the number (r12 verdict: agg8 must carry its phase's
    // reading)
    val phaseJson = phases
      .map { case (k, p) => "\"" + k + "\":" + p.json }
      .mkString("{", ",", "}")
    // per-QUERY contention: the samples taken while each bench entry
    // was the one running (mark-at-start + periodic ticks), so a
    // single-query outlier carries its own window's evidence
    val qcJson = results.flatMap { case (k, _) =>
      queryContention.get(k).map(p => "\"" + k + "\":" + p.json) }
      .mkString("{", ",", "}")
    // in-band round-over-round annotation: every successful query
    // >1.3× its prior-round seconds, with ITS contention factor next
    // to the ratio — a regression under probe_factor ~1 is an engine
    // change; under 2+ it's the window
    val regressions = results.collect {
      case (k, r) if !r.failed && prior.get(k).exists(p =>
          p > 0 && r.sec / p > 1.3) =>
        val pf = queryContention.get(k).map(_.probeFactor).getOrElse(-1.0)
        val lm = queryContention.get(k).map(_.loadMean).getOrElse(-1.0)
        f"""{"query":"$k","prev_sec":${prior(k)}%.3f,"sec":${r.sec}%.3f,"ratio":${r.sec / prior(k)}%.2f,"probe_factor":$pf%.2f,"loadavg_mean":$lm%.2f}"""
    }.mkString("[", ",", "]")
    val priorJson = priorName.map("\"" + _ + "\"").getOrElse("null")
    // in-band scaling contract (r16): the knobs the harness actually
    // honored, so the driver can confirm $SPARK_GRAFT_CPUS /
    // $SPARK_GRAFT_SF_DIR reached the session without reading the code
    // (Bench.scala builds master local[$cpus] + shuffle.partitions from
    // the same env var; flat low/high-core ratios at sf0.1 are fixed-
    // cost saturation, not an ignored knob — evidence/scaling_r16.json
    // shows the same binary separating 8 vs 32 cores at sf1)
    val envJson = if (cpus.isEmpty) ""
      else s""""cpus":$cpus,"master":"$master","sf_dir":"$sfDir","""
    f"""{"metric":"total","value":$total%.3f,"unit":"sec",$envJson"queries":$qs,"warmup_queries":$wq,"memoized":$memo,"failed":$failed,"bench_failures":$nFailed,"playback_rps":$playbackRps%.0f,"playback_rps_agg8":$playbackAgg8%.0f,"host_probe_sec":$probeJson,"host_noise_factor":$noise%.2f,"host_sentinel":$sentJson,"host_scaling_ratio":$worstScaling%.2f,"phase_contention":$phaseJson,"query_contention":$qcJson,"regressions":$regressions,"prior_bench":$priorJson,"playback_stop_interrupts":$stopInterrupts,"task_failed":$taskFailed,"task_killed":$taskKilled,"sf":"$sfDir"}"""
  }
}
