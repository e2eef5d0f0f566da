package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Idle-state eviction for the stateful streaming twins: a key silent
  * past the configured horizon must have its state DROPPED (bounding
  * state by the ACTIVE key population, not lifetime-distinct keys), a
  * post-horizon event must re-open the key as if first-seen, and the
  * timeout must also fire from checkpoint-RECOVERED state. Each op's
  * close-out contract (emit vs silent drop) is pinned per its
  * scaladoc. Default `None` keeps the original run-forever behavior —
  * covered by the existing StatefulOpsSpec suites.
  */
class StateEvictionSpec extends SparkSpec {
  import spark.implicits._

  private val secMicros = 1000000L
  private val dayMicros = 86400L * secMicros

  test("gapDetect: idle key evicts silently; re-opened key detects fresh gaps") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.Keyed]
    val gaps = StatefulOps.gapDetect(input.toDS(), maxGapMicros = 1 * secMicros,
      idleHorizonMicros = Some(2 * secMicros))
    val q = gaps.writeStream.format("memory").queryName("evict_gaps")
      .outputMode("append").start()
    try {
      // 1 s, not 0: an event AT the initial watermark (epoch 0) is
      // filtered as late before the stateful operator ever sees it
      input.addData(StatefulOps.Keyed("a", 1 * secMicros, 1.0))
      q.processAllAvailable()
      // 'b' advances the watermark far past a's 2 s horizon; the next
      // batch fires a's timeout → state dropped, nothing emitted
      input.addData(StatefulOps.Keyed("b", 10 * secMicros, 1.0))
      q.processAllAvailable()
      input.addData(StatefulOps.Keyed("b", 11 * secMicros, 1.0))
      q.processAllAvailable()
      // a returns 10.5 s after its last reading: under NoTimeout this
      // would emit a 10.5 s gap — eviction means a is first-seen again
      input.addData(StatefulOps.Keyed("a", 11500000L, 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM evict_gaps").count() == 0,
        "evicted key must not back-report the idle span as a gap")
      // ...but the re-opened key is fully live: a real gap now emits
      input.addData(StatefulOps.Keyed("a", 14 * secMicros, 1.0))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT key, fromMicros, toMicros FROM evict_gaps")
        .as[(String, Long, Long)].collect().toSeq
      assert(got == Seq(("a", 11500000L, 14 * secMicros)),
        s"re-opened key must detect post-re-open gaps: $got")
    } finally q.stop()
  }

  test("streamingStreaks: horizon closes and EMITS the open streak; re-open starts fresh") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.Keyed]
    val streaks = StatefulOps.streamingStreaks(input.toDS(),
      idleHorizonMicros = Some(2 * dayMicros))
    val q = streaks.writeStream.format("memory").queryName("evict_streaks")
      .outputMode("append").start()
    try {
      input.addData(StatefulOps.Keyed("u", 1 * dayMicros, 1.0),
        StatefulOps.Keyed("u", 2 * dayMicros, 1.0))
      q.processAllAvailable()
      // watermark rides to day 10 on another key; next batch fires u's
      // timeout (day 2 + 2-day horizon < day 10) → emit-and-drop
      input.addData(StatefulOps.Keyed("w", 10 * dayMicros, 1.0))
      q.processAllAvailable()
      input.addData(StatefulOps.Keyed("w", 10 * dayMicros + 1, 1.0))
      q.processAllAvailable()
      val afterTimeout = spark.sql(
        "SELECT key, startDay, endDay, len FROM evict_streaks")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(afterTimeout == Set(("u", 1L, 2L, 2L)),
        s"the open streak must close AT the horizon, no later event needed: $afterTimeout")
      // post-horizon event re-opens a brand-new streak...
      input.addData(StatefulOps.Keyed("u", 12 * dayMicros, 1.0))
      q.processAllAvailable()
      // ...which the horizon closes again (watermark to day 20)
      input.addData(StatefulOps.Keyed("w", 20 * dayMicros, 1.0))
      q.processAllAvailable()
      input.addData(StatefulOps.Keyed("w", 20 * dayMicros + 1, 1.0))
      q.processAllAvailable()
      val all = spark.sql(
        "SELECT key, startDay, endDay, len FROM evict_streaks")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(all.contains(("u", 12L, 12L, 1L)),
        s"re-opened streak must start fresh at day 12, not extend [1,2]: $all")
    } finally q.stop()
  }

  test("streamingScd2: horizon emits the open interval with the MaxValue marker; re-open restarts versioning") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.Scd2Event]
    val ivals = StatefulOps.streamingScd2(input.toDS(),
      idleHorizonMicros = Some(2 * secMicros))
    val q = ivals.writeStream.format("memory").queryName("evict_scd2")
      .outputMode("append").start()
    try {
      // start at 1 s, not 0: an event at the INITIAL watermark (epoch 0)
      // is filtered as late before the stateful operator sees it
      input.addData(StatefulOps.Scd2Event("k1", 1 * secMicros, 1L, "A"),
        StatefulOps.Scd2Event("k1", 2 * secMicros, 2L, "B"))
      q.processAllAvailable()
      input.addData(StatefulOps.Scd2Event("k2", 60 * secMicros, 3L, "X"))
      q.processAllAvailable()
      input.addData(StatefulOps.Scd2Event("k2", 61 * secMicros, 4L, "X"))
      q.processAllAvailable()
      val afterTimeout = spark.sql(
        "SELECT key, version, state, validFromUs, validToUs FROM evict_scd2 WHERE key = 'k1'")
        .as[(String, Long, String, Long, Long)].collect().toSet
      assert(afterTimeout == Set(
        ("k1", 1L, "A", 1 * secMicros, 2 * secMicros),
        ("k1", 2L, "B", 2 * secMicros, Long.MaxValue)),
        s"horizon must close the open B interval with the open-ended marker: $afterTimeout")
      // post-horizon event: a NEW history epoch, version numbering restarts
      input.addData(StatefulOps.Scd2Event("k1", 90 * secMicros, 5L, "C"))
      q.processAllAvailable()
      input.addData(StatefulOps.Scd2Event("k1", 91 * secMicros, 6L, "D"))
      q.processAllAvailable()
      val epoch2 = spark.sql(
        "SELECT version, state FROM evict_scd2 WHERE key = 'k1' AND validFromUs = 90000000")
        .as[(Long, String)].collect().toSet
      assert(epoch2 == Set((1L, "C")),
        s"the re-opened epoch must restart at version 1: $epoch2")
    } finally q.stop()
  }

  test("streamingAttribution: expired touch state drops; post-horizon purchase credits direct") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.TouchEvent]
    val att = StatefulOps.streamingAttribution(input.toDS(),
      idleHorizonMicros = Some(2 * secMicros))
    val q = att.writeStream.format("memory").queryName("evict_att")
      .outputMode("append").start()
    try {
      // 1 s, not 0: equal-to-initial-watermark rows filter as late
      input.addData(StatefulOps.TouchEvent("s1", 1 * secMicros, 1L, "ad", 0.0))
      q.processAllAvailable()
      input.addData(StatefulOps.TouchEvent("s2", 60 * secMicros, 2L, "email", 0.0))
      q.processAllAvailable()
      input.addData(StatefulOps.TouchEvent("s2", 61 * secMicros, 3L, "email", 0.0))
      q.processAllAvailable()
      // s1's "ad" touch is 90 s stale — far past the 2 s attribution
      // window. With NoTimeout this purchase would credit ("ad","ad").
      input.addData(StatefulOps.TouchEvent("s1", 90 * secMicros, 4L, "purchase", 19.99))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT firstTouch, lastTouch, cents FROM evict_att")
        .as[(String, String, Long)].collect().toSeq
      assert(got == Seq(("direct", "direct", 1999L)),
        s"expired touches must not earn credit: $got")
    } finally q.stop()
  }

  test("streamingFunnel: idle funnel drops; post-horizon event opens a fresh one") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.TouchEvent]
    val fs = StatefulOps.streamingFunnel(input.toDS(),
      stepTimeoutMicros = 1 * secMicros,
      idleHorizonMicros = Some(2 * secMicros))
    val q = fs.writeStream.format("memory").queryName("evict_funnel")
      .outputMode("append").start()
    try {
      // 1 s, not 0: equal-to-initial-watermark rows filter as late
      input.addData(StatefulOps.TouchEvent("f1", 1 * secMicros, 1L, "view", 0.0))
      q.processAllAvailable()
      // advance the watermark far past f1's horizon via another key
      input.addData(StatefulOps.TouchEvent("f2", 60 * secMicros, 2L, "view", 0.0))
      q.processAllAvailable()
      input.addData(StatefulOps.TouchEvent("f2", 61 * secMicros, 3L, "view", 0.0))
      q.processAllAvailable()
      // f1 re-opens: a SECOND 1_view must emit (with NoTimeout the old
      // funnel would still hold stage 1 and swallow this view)
      input.addData(StatefulOps.TouchEvent("f1", 90 * secMicros, 4L, "view", 0.0))
      q.processAllAvailable()
      val f1 = spark.sql(
          "SELECT stage, tsMicros FROM evict_funnel WHERE key = 'f1'")
        .as[(String, Long)].collect().toSet
      assert(f1 == Set(("1_view", 1 * secMicros), ("1_view", 90 * secMicros)),
        s"post-horizon view must start a fresh funnel: $f1")
    } finally q.stop()
  }

  test("streamingStreaks: timeout fires from checkpoint-RECOVERED state") {
    // The recovery half of the eviction contract: the horizon must
    // close a streak whose state was written by a PREVIOUS query run —
    // i.e. the timeout timestamp survives in the state store, not just
    // in memory.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("evict-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evict-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("evict-out").toString
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("tsMicros", LongType), StructField("value", DoubleType)))
    def stream() = StatefulOps.streamingStreaks(
      spark.readStream.schema(schema).json(dir)
        .as[StatefulOps.Keyed](org.apache.spark.sql.Encoders.product),
      idleHorizonMicros = Some(2 * dayMicros))
    def write(name: String, rows: Seq[(String, Long)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        rows.map { case (k, d) =>
          s"""{"key":"$k","tsMicros":${d * dayMicros},"value":1.0}"""
        }.mkString("", "\n", "\n").getBytes("UTF-8"))
    // run 1: u active days 1-2, streak open at shutdown
    write("b1.json", Seq(("u", 1L), ("u", 2L)))
    val q1 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // run 2: only OTHER-key traffic; u's timeout must fire from the
    // recovered state store and emit the [1,2] streak closed
    write("b2.json", Seq(("w", 10L)))
    write("b3.json", Seq(("w", 11L)))
    val q2 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val closed = spark.read
      .schema(StructType(Seq(StructField("key", StringType),
        StructField("startDay", LongType), StructField("endDay", LongType),
        StructField("len", LongType))))
      .json(out).filter(col("key") === "u")
      .select("startDay", "endDay", "len").as[(Long, Long, Long)]
      .collect().toSet
    assert(closed == Set((1L, 2L, 2L)),
      s"recovered state must still time out and emit: $closed")
  }

  test("streamingTokenBudget: dormant source evicts (event-time horizon) and its budget re-opens") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.SourcedDoc]
    val admitted = StatefulOps.streamingTokenBudget(input.toDS(),
      budgetTokens = 10, idleHorizonMicros = Some(2 * secMicros))
    val q = admitted.writeStream.format("memory").queryName("evict_budget")
      .outputMode("append").start()
    try {
      // 1 s, not 0: the initial watermark IS epoch 0 and equal-time
      // rows filter as late
      input.addData(StatefulOps.SourcedDoc("s1", 1L, 7L, 1 * secMicros))
      q.processAllAvailable()
      // s2 keeps ingesting far past s1's horizon: the watermark rides
      // to 60 s and the next batch drops s1's used=7 state
      input.addData(StatefulOps.SourcedDoc("s2", 2L, 1L, 60 * secMicros))
      q.processAllAvailable()
      input.addData(StatefulOps.SourcedDoc("s2", 3L, 1L, 61 * secMicros))
      q.processAllAvailable()
      // 9 tokens would NOT fit 10-7=3 remaining — admission proves the
      // budget re-opened from zero
      input.addData(StatefulOps.SourcedDoc("s1", 4L, 9L, 90 * secMicros))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT docId, budgetUsed FROM evict_budget WHERE source = 's1'")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 7L, 4L -> 9L),
        s"dormant source's budget must re-open after eviction: $got")
    } finally q.stop()
  }

  test("streamingDebounce: eviction is output-invariant (horizon >= window)") {
    implicit val sq = spark.sqlContext
    def e(k: String, us: Long, id: Long) =
      StatefulOps.TouchEvent(k, us, id, "x", 0.0)
    // same event sequence through both configurations: the kept set
    // must be IDENTICAL — that is the op's documented invariance
    def run(name: String, horizon: Option[Long]): Set[(String, Long)] = {
      val input = MemoryStream[StatefulOps.TouchEvent]
      val q = StatefulOps.streamingDebounce(input.toDS(),
          windowMicros = 1 * secMicros, idleHorizonMicros = horizon)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // a: burst at 1s (head + chained suppression), then long idle
        input.addData(e("a", 1 * secMicros, 1), e("a", 1500000L, 2))
        q.processAllAvailable()
        // b rides the watermark past a's horizon → a evicts (with one)
        input.addData(e("b", 20 * secMicros, 3))
        q.processAllAvailable()
        input.addData(e("b", 21 * secMicros, 4))
        q.processAllAvailable()
        // a returns: chain head under BOTH semantics (gap >> window)
        input.addData(e("a", 22 * secMicros, 5), e("a", 22300000L, 6))
        q.processAllAvailable()
        spark.sql(s"SELECT key, eventId FROM $name")
          .as[(String, Long)].collect().toSet
      } finally q.stop()
    }
    val withEvict = run("deb_ev", Some(2 * secMicros))
    val noEvict = run("deb_no", None)
    assert(withEvict == noEvict, s"evict=$withEvict forever=$noEvict")
    // b's 21 s event sits EXACTLY one window after 20 s: >= keeps it
    assert(withEvict == Set(("a", 1L), ("b", 3L), ("b", 4L), ("a", 5L)),
      withEvict.toString)
    // the precondition is enforced, not just documented
    intercept[IllegalArgumentException] {
      StatefulOps.streamingDebounce(
        MemoryStream[StatefulOps.TouchEvent].toDS(),
        windowMicros = 10 * secMicros, idleHorizonMicros = Some(1 * secMicros))
    }
  }

  test("streamingHeavyHitters: idle shard drops its sketch; re-open counts fresh") {
    implicit val sq = spark.sqlContext
    def item(sh: Int, w: String, us: Long) = StatefulOps.ShardedItem(sh, w, us)
    val input = MemoryStream[StatefulOps.ShardedItem]
    val q = StatefulOps.streamingHeavyHitters(input.toDS(), capacity = 4,
        topJ = 4, idleHorizonMicros = Some(2 * secMicros))
      .writeStream.format("memory").queryName("evict_hh")
      .outputMode("append").start()
    try {
      input.addData(item(0, "a", 1 * secMicros), item(0, "a", 1 * secMicros + 1))
      q.processAllAvailable()
      // shard 9 rides the watermark past shard 0's horizon
      input.addData(item(9, "w", 30 * secMicros))
      q.processAllAvailable()
      input.addData(item(9, "w", 31 * secMicros))
      q.processAllAvailable()
      // shard 0 returns: the sketch must have been dropped — "a" counts
      // from 1 again, not 3
      input.addData(item(0, "a", 32 * secMicros))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT estCount, asOfMicros FROM evict_hh WHERE shard = 0 AND item = 'a'")
        .as[(Long, Long)].collect().toMap
      assert(rows == Map(2L -> (1 * secMicros + 1), 1L -> 32 * secMicros),
        s"evicted shard must re-count from scratch: $rows")
    } finally q.stop()
  }

  test("streamingHeavyHitters: counters survive checkpoint restart; timeout fires from recovered state") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("hh-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hh-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("hh-out").toString
    val schema = StructType(Seq(StructField("shard", IntegerType),
      StructField("item", StringType), StructField("tsMicros", LongType)))
    def stream() = StatefulOps.streamingHeavyHitters(
      // one file per micro-batch: the eviction sequence needs batch
      // BOUNDARIES between the watermark-advancing traffic and the
      // returning key (one big batch would deliver the return before
      // the timeout's no-data batch can fire)
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .json(dir)
        .as[StatefulOps.ShardedItem](org.apache.spark.sql.Encoders.product),
      capacity = 4, topJ = 4, idleHorizonMicros = Some(2 * secMicros))
    var seq = 0
    def write(name: String, rows: Seq[(Int, String, Long)]): Unit = {
      val p = java.nio.file.Paths.get(s"$dir/$name")
      java.nio.file.Files.write(p,
        rows.map { case (s, i, us) =>
          s"""{"shard":$s,"item":"$i","tsMicros":$us}"""
        }.mkString("", "\n", "\n").getBytes("UTF-8"))
      // explicit ascending modTimes pin the file source's batch order
      seq += 1
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + seq * 10000L))
    }
    // run 1: shard 0 counts a twice
    write("b1.json", Seq((0, "a", 1 * secMicros), (0, "a", 1 * secMicros + 1)))
    val q1 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // run 2 (fresh query from the checkpoint): the RECOVERED counter
    // must continue at 3, then idle past the horizon and evict, then
    // re-open from 1
    write("b2.json", Seq((0, "a", 1 * secMicros + 2)))
    write("b3.json", Seq((9, "w", 30 * secMicros)))
    write("b4.json", Seq((9, "w", 31 * secMicros)))
    write("b5.json", Seq((0, "a", 32 * secMicros)))
    val q2 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read
      .schema(StructType(Seq(StructField("shard", IntegerType),
        StructField("item", StringType), StructField("estCount", LongType),
        StructField("maxError", LongType), StructField("asOfMicros", LongType))))
      .json(out).filter(col("shard") === 0)
      .select("estCount", "asOfMicros").as[(Long, Long)].collect().toMap
    assert(got == Map(
      2L -> (1 * secMicros + 1), // run-1 snapshot
      3L -> (1 * secMicros + 2), // recovered counter continued +1
      1L -> 32 * secMicros),     // evicted after idle, fresh count on return
      s"recovered sketch must continue, evict, and re-open: $got")
  }

  test("streamingZscore: idle key drops its window and re-warms from cold") {
    implicit val sq = spark.sqlContext
    def e(k: String, us: Long, id: Long, v: Double) =
      StatefulOps.TouchEvent(k, us, id, "x", v)
    val input = MemoryStream[StatefulOps.TouchEvent]
    val q = StatefulOps.streamingZscore(input.toDS(), window = 20, minN = 4,
        threshold = 2.5, idleHorizonMicros = Some(5 * secMicros))
      .writeStream.format("memory").queryName("evict_zs")
      .outputMode("append").start()
    try {
      // warm key a with 6 varied values inside 1 s (minN = 4)
      input.addData((0 until 6).map(i =>
        e("a", secMicros + i * 1000L, i.toLong, (i % 3).toDouble)): _*)
      q.processAllAvailable()
      // spike flags while warm
      input.addData(e("a", secMicros + 7000L, 10L, 50.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT eventId FROM evict_zs").as[Long]
        .collect().toSet == Set(10L), "warm spike must flag")
      // other-key traffic rides the watermark past a's 5 s horizon
      input.addData(e("w", 30 * secMicros, 20L, 0.0))
      q.processAllAvailable()
      input.addData(e("w", 31 * secMicros, 21L, 0.0))
      q.processAllAvailable()
      // a returns with an identical spike — COLD now, must NOT flag
      input.addData(e("a", 32 * secMicros, 30L, 50.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT eventId FROM evict_zs").as[Long]
        .collect().toSet == Set(10L),
        "post-eviction spike must wait for re-warm")
      // re-warm with 10 values (enough that the buffered cold spike no
      // longer dominates the std), then the next spike flags again
      input.addData((0 until 10).map(i =>
        e("a", 33 * secMicros + i * 1000L, 40L + i, (i % 3).toDouble)): _*)
      q.processAllAvailable()
      input.addData(e("a", 34 * secMicros, 50L, 50.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT eventId FROM evict_zs").as[Long]
        .collect().toSet == Set(10L, 50L),
        "re-warmed key must score fresh anomalies")
    } finally q.stop()
  }
}
