package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gap detection across micro-batches keeps per-key state") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.Keyed]
    val gaps = StatefulOps.gapDetect(input.toDS(), maxGapMicros = 1000000L) // 1s
    val q = gaps.writeStream.format("memory").queryName("gaps")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    try {
      // batch 1: a steady, then silence
      input.addData(
        StatefulOps.Keyed("a", 0L, 1.0),
        StatefulOps.Keyed("a", 500000L, 1.0),
        StatefulOps.Keyed("b", 0L, 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM gaps").count() == 0)
      // batch 2: 'a' resumes 3s later (gap!), 'b' stays regular
      input.addData(
        StatefulOps.Keyed("a", 3500000L, 1.0),
        StatefulOps.Keyed("b", 800000L, 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT key, fromMicros, toMicros, gapMicros FROM gaps")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got == Seq(("a", 500000L, 3500000L, 3000000L)),
        s"one gap, across the batch boundary, state remembered: $got")
    } finally q.stop()
  }

  test("within-batch gaps are detected too") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.Keyed]
    val gaps = StatefulOps.gapDetect(input.toDS(), maxGapMicros = 100L)
    val q = gaps.writeStream.format("memory").queryName("gaps2")
      .outputMode("append").start()
    try {
      input.addData(
        StatefulOps.Keyed("k", 0L, 1.0),
        StatefulOps.Keyed("k", 50L, 1.0),
        StatefulOps.Keyed("k", 500L, 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT gapMicros FROM gaps2").as[Long].collect().toSeq
      assert(got == Seq(450L))
    } finally q.stop()
  }

  test("streaming session windows close after inactivity gap + watermark") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "5 seconds").as("w"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      input.addData((ts(0), "u1"), (ts(2), "u1"), (ts(3), "u2"))
      q.processAllAvailable()
      // nothing closed yet: watermark at 3s, sessions open until gap+5s
      assert(spark.sql("SELECT * FROM sess").count() == 0)
      input.addData((ts(60), "u1")) // advances watermark past both sessions
      q.processAllAvailable()
      val got = spark.sql("SELECT user, n FROM sess").as[(String, Long)]
        .collect().toSet
      assert(got == Set(("u1", 2L), ("u2", 1L)))
    } finally q.stop()
  }

  test("streamingSessionize matches the batch session_window aggregation") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = StatefulOps.streamingSessionize(
      input.toDF().toDF("ts", "user"), "user", "ts",
      gap = "5 seconds", delay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("ssess")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // u1: one session split across batches (4s gap < 5s window, the
    // cross-batch state-merge case) then a second session; u2: a
    // singleton; final u3 event only advances the watermark to flush
    val rows = Seq(
      Seq((ts(0), "u1"), (ts(2), "u1"), (ts(3), "u2")),
      Seq((ts(6), "u1")),                      // merges into u1's open session
      Seq((ts(20), "u1"), (ts(21), "u1")),     // second u1 session
      Seq((ts(300), "u3")))                    // watermark flush sentinel
    try {
      rows.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.sql(
          "SELECT user, start_us, end_us, n_events FROM ssess")
        .as[(String, Long, Long, Long)].collect().toSet
      // batch twin (q49's shape) over the same rows minus the
      // still-open flush sentinel
      val batch = rows.flatten.dropRight(1).toDF("ts", "user")
        .groupBy(col("user"), session_window(col("ts"), "5 seconds"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"))
        .select(col("user"), col("start_us"), col("end_us"), col("n_events"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed.count(_._1 == "u1") == 2, "cross-batch merge + split")
    } finally q.stop()
  }

  test("streaming dedup drops in-batch and cross-batch duplicates") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val deduped = StatefulOps.streamingDedup(df, "text", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      input.addData((ts(0), "alpha"), (ts(1), "alpha"), (ts(2), "beta"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sdedup").count() == 2)
      // cross-batch duplicate (within watermark) still dropped
      input.addData((ts(3), "alpha"), (ts(4), "gamma"))
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM sdedup").as[String]
        .collect().sorted.toSeq
      assert(texts == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("end-to-end streaming curation equals the batch pipeline") {
    // the composition claim: the SAME quality-gate expressions plus
    // dedup, run as a stateful stream over three micro-batches, keep
    // exactly what the batch pipeline keeps on the union of the data
    import graft.operators.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val rows = Seq(
      (ts(0), 0L, "the quick brown fox jumps over the lazy dog"),
      (ts(1), 1L, "x"),                                     // too short → gated
      (ts(2), 2L, "the quick brown fox jumps over the lazy dog"), // dup of 0
      (ts(3), 3L, "a completely different document about spark and the sea"),
      (ts(4), 4L, "zzz qqq jjj xxx vvv www"),               // no stopwords → gated
      (ts(5), 5L, "a completely different document about spark and the sea"), // dup of 3
      (ts(6), 6L, "one more clean document with the usual words in it"))
    def gate(df: org.apache.spark.sql.DataFrame) = df
      .filter(TextAnalysis.tokenCount(col("text")) >= 5)
      .filter(TextAnalysis.stopwordRatio(col("text")) > 0.05)
    val streamed = StatefulOps.streamingDedup(
      gate(input.toDF().toDF("ts", "doc_id", "text")), "text", "ts", "10 minutes")
    val q = streamed.writeStream.format("memory").queryName("curated")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    try {
      rows.grouped(3).foreach { batch => input.addData(batch); q.processAllAvailable() }
      // the streaming dedup keeps ONE survivor per content group (the
      // first row SEEN, which across parallel partitions is not
      // necessarily the earliest timestamp — that's the documented
      // contract difference vs batch keep-first); the curated CONTENT
      // must match the batch pipeline exactly
      val streamKept = spark.sql("SELECT text FROM curated").as[String]
        .collect().toSeq
      val batchKept = Dedup.exactKeepFirst(
          gate(rows.toDF("ts", "doc_id", "text")), "text", "doc_id")
        .select("text").as[String].collect().toSeq
      assert(streamKept.size == streamKept.toSet.size, "one survivor per group")
      assert(streamKept.toSet == batchKept.toSet,
        s"stream=${streamKept.toSet} batch=${batchKept.toSet}")
      assert(streamKept.size == 3)
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, String)]
    val errors = MemoryStream[(java.sql.Timestamp, String)]
    val joined = StatefulOps.streamIntervalJoin(
      clicks.toDF().toDF("click_ts", "user"),
      errors.toDF().toDF("err_ts", "user"),
      keyCol = "user", leftTsCol = "click_ts", rightTsCol = "err_ts",
      delay = "0 seconds", lookback = "0 seconds", lookahead = "5 seconds")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      // u1's error lands 3s after its click (in window); u2's error has
      // no click; u3's error precedes its click (out of window)
      clicks.addData((ts(10), "u1"), (ts(10), "u3"))
      errors.addData((ts(13), "u1"), (ts(13), "u2"), (ts(8), "u3"))
      q.processAllAvailable()
      val got = spark.sql("SELECT user, click_ts, err_ts FROM ivj")
        .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSeq
      assert(got == Seq(("u1", ts(10), ts(13))), got.toString)
      // a later error outside the 5s window never matches
      errors.addData((ts(30), "u1"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM ivj").count() == 1)
    } finally q.stop()
  }

  test("streaming incremental dedup drops history dups and in-stream repeats") {
    implicit val sq = spark.sqlContext
    val history = Seq("alpha", "gamma").toDF("text")
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val deduped = StatefulOps.streamingIncrementalDedup(
      df, history, "text", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sincdedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      // alpha: in history → dropped; delta: new → kept once
      input.addData((ts(0), "alpha"), (ts(1), "delta"), (ts(2), "delta"))
      q.processAllAvailable()
      // Gamma (normalization dup of history) dropped; epsilon kept;
      // cross-batch delta repeat dropped
      input.addData((ts(3), "Gamma  "), (ts(4), "epsilon"), (ts(5), "delta"))
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM sincdedup").as[String]
        .collect().sorted.toSeq
      assert(texts == Seq("delta", "epsilon"))
    } finally q.stop()
  }

  test("streaming contamination flag catches every planted leak, map-side") {
    implicit val sq = spark.sqlContext
    // the "benchmark": two eval questions
    val eval = Seq(
      "what is the boiling point of water at sea level",
      "name the largest moon of the planet saturn").toDF("text")
    val input = MemoryStream[(Long, String)]
    val flagged = StatefulOps.contaminationFlag(
      input.toDF().toDF("doc_id", "text"), eval, "text", shingleK = 5)
    val q = flagged.writeStream.format("memory").queryName("contam")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    try {
      input.addData(
        // leak: contains an exact 5-gram of eval q1
        (1L, "trivia dump: the boiling point of water at altitude differs"),
        // leak: prefix overlap with eval q2
        (2L, "name the largest moon of jupiter or saturn for bonus points"),
        // clean: shares words but no 5-gram run
        (3L, "water boils and saturn spins but never five shared words running"),
        // clean and totally disjoint
        (4L, "completely unrelated sentence about compilers and register allocation"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, maybe_contaminated FROM contam")
        .as[(Long, Boolean)].collect().toMap
      assert(got(1L) && got(2L), s"both planted leaks must flag: $got")
      assert(!got(3L) && !got(4L),
        s"clean docs must pass (fpp ~1e-2 at 2-doc eval scale): $got")
      // map-side contract: the micro-batch plan moved no data — no
      // exchange, no aggregate, no stateful operator
      val exec = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("Exchange") && !exec.contains("StateStore"),
        s"flag must stay map-side:\n$exec")
    } finally q.stop()
  }

  test("streamingOhlc matches the batch candle aggregation across batches") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val candles = StatefulOps.streamingOhlc(
      input.toDF().toDF("ts", "event_id", "event_type", "value"),
      "event_type", "ts", "event_id", "value",
      windowDur = "10 seconds", delay = "0 seconds")
    val q = candles.writeStream.format("memory").queryName("ohlc")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // one window [0,10) for type a split across micro-batches, with a
    // timestamp TIE at t=2 resolved by event_id (ids 2 then 3 — the
    // open must be id 2's value); type b is a singleton window; the
    // final late-window event only advances the watermark to flush
    val rows = Seq(
      Seq((ts(2), 2L, "a", 5.0), (ts(4), 4L, "a", 9.0)),
      Seq((ts(2), 3L, "a", 1.0), (ts(7), 7L, "a", 3.0), (ts(3), 5L, "b", 2.0)),
      Seq((ts(100), 9L, "a", 0.0))) // watermark flush sentinel
    try {
      rows.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.sql(
          """SELECT event_type, n_events, open_value, close_value, low, high
             FROM ohlc WHERE window_start < timestamp'1970-01-01 00:00:50'""")
        .collect().map(_.toSeq).toSet
      assert(streamed == Set(
        Seq("a", 4L, 5.0, 3.0, 1.0, 9.0), // open = id2's 5.0 (tie), close = t7's 3.0
        Seq("b", 1L, 2.0, 2.0, 2.0, 2.0)), s"got $streamed")
    } finally q.stop()
  }

  test("NTZ-typed event time analyzes and matches the instant-typed twin") {
    // The driver's parquet generator shipped `timestamp[us]` (no tz) in
    // round 8, which Spark reads as TIMESTAMP_NTZ — unix_micros rejects
    // it raw. StatefulOps normalizes at entry (mirroring Tables), so
    // the same rows produce identical output whichever physical type
    // the source parquet carries. Batch mode exercises the same
    // analysis + expressions as the streaming plan.
    import org.apache.spark.sql.functions._
    val ltz = Seq(
        (new java.sql.Timestamp(0L), "u1", 1.0),
        (new java.sql.Timestamp(2000L), "u1", 2.0),
        (new java.sql.Timestamp(60000L), "u2", 3.0))
      .toDF("ts", "user", "v")
    val ntz = ltz.withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)

    val keyedLtz = StatefulOps.keyed(ltz, "user", "ts", "v").collect().toSet
    val keyedNtz = StatefulOps.keyed(ntz, "user", "ts", "v").collect().toSet
    assert(keyedNtz == keyedLtz, s"ntz=$keyedNtz ltz=$keyedLtz")

    val sessLtz = StatefulOps.streamingSessionize(
      ltz, "user", "ts", gap = "5 seconds", delay = "0 seconds").collect().toSet
    val sessNtz = StatefulOps.streamingSessionize(
      ntz, "user", "ts", gap = "5 seconds", delay = "0 seconds").collect().toSet
    assert(sessNtz == sessLtz, s"ntz=$sessNtz ltz=$sessLtz")
  }

  test("streamingTokenBudget: admits in order until each source's budget exhausts") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StatefulOps.SourcedDoc]
    val out = StatefulOps.streamingTokenBudget(input.toDS(), budgetTokens = 10)
    val q = out.writeStream.format("memory").queryName("budget")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    def d(s: String, id: Long, tok: Long) = StatefulOps.SourcedDoc(s, id, tok)
    try {
      // batch 1: s1 uses 7 of 10; s2 uses 9 of 10 (in docId order)
      input.addData(d("s1", 2, 4), d("s1", 1, 3), d("s2", 1, 9))
      q.processAllAvailable()
      // batch 2: s1's id 3 (tok 4) exceeds remaining 3 -> skipped, but
      // id 4 (tok 3) still fits; s2 is exhausted for anything > 1
      input.addData(d("s1", 3, 4), d("s1", 4, 3), d("s2", 2, 2))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT source, docId, nTokens, budgetUsed FROM budget")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == Set(
        ("s1", 1L, 3L, 3L),   // batch 1, docId order: 1 before 2
        ("s1", 2L, 4L, 7L),
        ("s2", 1L, 9L, 9L),
        ("s1", 4L, 3L, 10L)), // id 3 skipped (over budget), id 4 admitted
        s"got $got")
    } finally q.stop()
  }

  test("streamingTokenBudget: budget state survives a checkpoint restart") {
    // The property that matters operationally: if the admission state
    // did NOT survive a restart, the source's budget would reset and
    // the stream would over-admit. A file source + checkpoint replays
    // the real recovery path (MemoryStream cannot restart).
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("budget-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("budget-ckpt").toString
    val schema = StructType(Seq(StructField("source", StringType),
      StructField("docId", LongType), StructField("nTokens", LongType)))
    def stream() = StatefulOps.streamingTokenBudget(
      spark.readStream.schema(schema).json(dir)
        .select(col("source"), col("docId"), col("nTokens"),
          org.apache.spark.sql.functions.lit(0L).as("tsMicros"))
        .as[StatefulOps.SourcedDoc](org.apache.spark.sql.Encoders.product),
      budgetTokens = 10)
    def write(name: String, lines: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        lines.getBytes("UTF-8"))
    // run 1: s1 admits 7 of 10
    write("b1.json",
      """{"source":"s1","docId":1,"nTokens":4}
        |{"source":"s1","docId":2,"nTokens":3}
        |""".stripMargin)
    val out1 = java.nio.file.Files.createTempDirectory("budget-out").toString
    val q1 = stream().writeStream.format("json")
      .option("path", out1).option("checkpointLocation", ckpt).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // run 2 (fresh query, same checkpoint): docId 3 (tok 4) must be
    // REJECTED — only possible if the used=7 state was recovered;
    // docId 4 (tok 3) fits the remaining 3 exactly
    write("b2.json",
      """{"source":"s1","docId":3,"nTokens":4}
        |{"source":"s1","docId":4,"nTokens":3}
        |""".stripMargin)
    val q2 = stream().writeStream.format("json")
      .option("path", out1).option("checkpointLocation", ckpt).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val admitted = spark.read
      .schema(StructType(Seq(StructField("source", StringType),
        StructField("docId", LongType), StructField("nTokens", LongType),
        StructField("budgetUsed", LongType))))
      .json(out1)
      .select("docId", "budgetUsed").as[(Long, Long)].collect().toMap
    assert(admitted == Map(1L -> 4L, 2L -> 7L, 4L -> 10L),
      s"restart must preserve budget state: $admitted")
  }

  test("streamingStreaks: open-streak state survives a checkpoint restart") {
    // Recovery pin (the budget test's twin): a streak spanning the
    // restart must close with its FULL length — losing state would
    // emit a short streak or none.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val day = 86400L * 1000000L
    val dir = java.nio.file.Files.createTempDirectory("streak-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("streak-ckpt").toString
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("tsMicros", LongType), StructField("value", DoubleType)))
    def stream() = StatefulOps.streamingStreaks(
      spark.readStream.schema(schema).json(dir)
        .as[StatefulOps.Keyed](org.apache.spark.sql.Encoders.product))
    def write(name: String, rows: Seq[(String, Long)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        rows.map { case (k, d) =>
          s"""{"key":"$k","tsMicros":${d * day},"value":1.0}"""
        }.mkString("", "\n", "\n").getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("streak-out").toString
    // run 1: days 1,2 — streak open at restart
    write("b1.json", Seq(("u", 1L), ("u", 2L)))
    val q1 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // run 2: day 3 extends ACROSS the restart; day 9 closes [1..3]
    write("b2.json", Seq(("u", 3L)))
    write("b3.json", Seq(("u", 9L)))
    val q2 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val closed = spark.read
      .schema(StructType(Seq(StructField("key", StringType),
        StructField("startDay", LongType), StructField("endDay", LongType),
        StructField("len", LongType))))
      .json(out)
      .select("startDay", "endDay", "len").as[(Long, Long, Long)]
      .collect().toSet
    assert(closed == Set((1L, 3L, 3L)),
      s"the restart-spanning streak must close at full length: $closed")
  }

  test("streamingScd2: closed intervals match the batch q57 run-collapse") {
    implicit val sq = spark.sqlContext
    def e(key: String, us: Long, id: Long, st: String) =
      StatefulOps.Scd2Event(key, us, id, st)
    val input = MemoryStream[StatefulOps.Scd2Event]
    val iv = StatefulOps.streamingScd2(input.toDS())
    val q = iv.writeStream.format("memory").queryName("scd2")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    // u1: view view click view (3 runs, run 1 spans a batch edge);
    // u2: click click (1 run, never closes); same-ts rows on u1 use
    // event_id as the order tie-break (ids 40,41 both at us=400)
    val batches = Seq(
      Seq(e("u1", 100, 1, "view"), e("u2", 150, 2, "click")),
      Seq(e("u1", 200, 3, "view"), e("u1", 300, 4, "click"),
        e("u2", 250, 5, "click")),
      Seq(e("u1", 400, 41, "view"), e("u1", 400, 40, "view")))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.sql("SELECT key, version, state, validFromUs, " +
          "validToUs, nEvents FROM scd2")
        .as[(String, Long, String, Long, Long, Long)].collect().toSet
      // batch run-collapse over the same rows, minus each key's final
      // (still-open) run — the q57 shape
      val expected = batches.flatten.groupBy(_.key).flatMap {
        case (k, rows) =>
          val ordered = rows.sortBy(r => (r.tsMicros, r.eventId))
          val runs = ordered.foldLeft(List.empty[(String, Long, Long)]) {
            case ((st, from, n) :: tail, r) if r.state == st =>
              (st, from, n + 1) :: tail
            case (acc, r) => (r.state, r.tsMicros, 1L) :: acc
          }.reverse
          runs.zipWithIndex.zip(runs.drop(1)).map {
            case (((st, from, n), i), (_, nextFrom, _)) =>
              (k, i + 1L, st, from, nextFrom, n)
          }
      }.toSet
      assert(streamed == expected, s"streamed=$streamed batch=$expected")
    } finally q.stop()
  }

  test("streamingScd2: version counter survives a checkpointed restart") {
    // Recovery pin: the open interval (version 2, "click") must resume
    // from the checkpoint — losing state would restart numbering at
    // version 1 and report a wrong valid_from.
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("scd2-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scd2-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("scd2-out").toString
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("tsMicros", LongType), StructField("eventId", LongType),
      StructField("state", StringType)))
    def stream() = StatefulOps.streamingScd2(
      spark.readStream.schema(schema).json(dir)
        .as[StatefulOps.Scd2Event](org.apache.spark.sql.Encoders.product))
    def write(name: String, rows: Seq[(Long, Long, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        rows.map { case (us, id, st) =>
          s"""{"key":"u1","tsMicros":$us,"eventId":$id,"state":"$st"}"""
        }.mkString("", "\n", "\n").getBytes("UTF-8"))
    // run 1: view → click (closes v1, leaves v2 "click" open)
    write("b1.json", Seq((100L, 1L, "view"), (200L, 2L, "click")))
    val q1 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // run 2: view closes v2 ACROSS the restart; error closes v3
    write("b2.json", Seq((300L, 3L, "view")))
    write("b3.json", Seq((400L, 4L, "error")))
    val q2 = stream().writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read
      .schema(StructType(Seq(StructField("key", StringType),
        StructField("version", LongType), StructField("state", StringType),
        StructField("validFromUs", LongType),
        StructField("validToUs", LongType), StructField("nEvents", LongType))))
      .json(out)
      .select("version", "state", "validFromUs", "validToUs")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set((1L, "view", 100L, 200L), (2L, "click", 200L, 300L),
      (3L, "view", 300L, 400L)),
      s"restart must continue version numbering: $got")
  }

  test("streamingAttribution: matches the batch q59 touch semantics") {
    implicit val sq = spark.sqlContext
    def e(k: String, us: Long, id: Long, t: String, v: Double = 0.0) =
      StatefulOps.TouchEvent(k, us, id, t, v)
    val input = MemoryStream[StatefulOps.TouchEvent]
    val q = StatefulOps.streamingAttribution(input.toDS())
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    // u1: view → click → purchase(3.21) → purchase(1.005, across batch);
    // u2: purchase with NO touches (direct/direct); the second u1
    // purchase must still credit (view, click) — purchases don't
    // update touch state
    val batches = Seq(
      Seq(e("u1", 100, 1, "view"), e("u1", 200, 2, "click"),
        e("u2", 150, 3, "purchase", 9.99)),
      Seq(e("u1", 300, 4, "purchase", 3.21)),
      Seq(e("u1", 400, 5, "purchase", 1.01)))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.sql(
          "SELECT key, eventId, firstTouch, lastTouch, cents FROM attr")
        .as[(String, Long, String, String, Long)].collect().toSet
      assert(got == Set(
        ("u2", 3L, "direct", "direct", 999L),
        ("u1", 4L, "view", "click", 321L),
        ("u1", 5L, "view", "click", 101L)), got.toString)
    } finally q.stop()
  }

  test("streamingFunnel: matches the batch q55 timed-window semantics") {
    implicit val sq = spark.sqlContext
    def e(k: String, us: Long, id: Long, t: String) =
      StatefulOps.TouchEvent(k, us, id, t, 0.0)
    val input = MemoryStream[StatefulOps.TouchEvent]
    val q = StatefulOps.streamingFunnel(input.toDS(),
        stepTimeoutMicros = 1000L)
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    // u1: clean 3-stage funnel split across batches;
    // u2: click BEFORE any view is ignored, purchase before click is
    //     ignored, then the in-order fills count;
    // u3: click arrives past the step window — funnel stalls at view;
    // u4: purchase out of turn ignored, funnel still completes later;
    // u5: click at EXACTLY v+timeout counts (inclusive boundary),
    //     purchase at c+timeout+1 does not
    val batches = Seq(
      Seq(e("u1", 100, 1, "view"), e("u2", 100, 2, "click"),
        e("u2", 150, 3, "view"), e("u3", 100, 4, "view"),
        e("u4", 100, 5, "view"), e("u5", 100, 6, "view")),
      Seq(e("u1", 200, 7, "click"), e("u2", 160, 8, "purchase"),
        e("u2", 180, 9, "click"), e("u4", 150, 10, "purchase"),
        e("u5", 1100, 11, "click")),
      Seq(e("u1", 300, 12, "purchase"), e("u2", 200, 13, "purchase"),
        e("u3", 1200, 14, "click"), e("u4", 200, 15, "click"),
        e("u4", 250, 16, "purchase"), e("u5", 2101, 17, "purchase")))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.sql("SELECT key, stage, tsMicros FROM funnel")
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(
        ("u1", "1_view", 100L), ("u1", "2_click", 200L),
        ("u1", "3_purchase", 300L),
        ("u2", "1_view", 150L), ("u2", "2_click", 180L),
        ("u2", "3_purchase", 200L),
        ("u3", "1_view", 100L),
        ("u4", "1_view", 100L), ("u4", "2_click", 200L),
        ("u4", "3_purchase", 250L),
        ("u5", "1_view", 100L), ("u5", "2_click", 1100L)), got.toString)
      // per-stage counts — the q55 funnel numbers — from the same rows
      val counts = spark.sql(
          "SELECT stage, count(*) FROM funnel GROUP BY stage")
        .as[(String, Long)].collect().toMap
      assert(counts == Map("1_view" -> 5L, "2_click" -> 4L,
        "3_purchase" -> 3L), counts.toString)
    } finally q.stop()
  }

  test("streamingStreaks: closed streaks match the batch q53 islands") {
    implicit val sq = spark.sqlContext
    val day = 86400L * 1000000L
    def ev(key: String, d: Long, offs: Long = 0L) =
      StatefulOps.Keyed(key, d * day + offs, 1.0)
    val input = MemoryStream[StatefulOps.Keyed]
    val streaks = StatefulOps.streamingStreaks(input.toDS())
    val q = streaks.writeStream.format("memory").queryName("streaks")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    // u1: days 1,2,3 then 6,7 then 10 (two closed streaks by the end);
    // u2: days 2,3 then 9 (one closed); streak 1-2-3 spans a batch
    // boundary and day 3 repeats across batches (dedup within state)
    val batches = Seq(
      Seq(ev("u1", 1), ev("u1", 2), ev("u2", 2), ev("u2", 3)),
      Seq(ev("u1", 3), ev("u1", 3, 5L)),        // extends + same-day repeat
      Seq(ev("u1", 6), ev("u1", 7), ev("u2", 9)), // closes u1[1-3], u2[2-3]
      Seq(ev("u1", 10)))                          // closes u1[6-7]
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.sql(
          "SELECT key, startDay, endDay, len FROM streaks")
        .as[(String, Long, Long, Long)].collect().toSet
      // batch gaps-and-islands over the SAME rows (the q53 shape),
      // minus each key's final island (still open in streaming state)
      val allDays = batches.flatten
        .map(k => (k.key, Math.floorDiv(k.tsMicros, day))).distinct
      val islands = allDays.groupBy(_._1).flatMap { case (k, rows) =>
        val ds = rows.map(_._2).sorted
        val runs = ds.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: tail, d) if d == e + 1 => (s, d) :: tail
          case (acc, d) => (d, d) :: acc
        }.reverse
        runs.dropRight(1).map { case (s, e) => (k, s, e, e - s + 1) }
      }.toSet
      assert(streamed == islands, s"streamed=$streamed batch=$islands")
    } finally q.stop()
  }

  test("streamingDebounce: matches the batch q41 chain-head semantics") {
    implicit val sq = spark.sqlContext
    def e(k: String, us: Long, id: Long) =
      StatefulOps.TouchEvent(k, us, id, "x", 0.0)
    val input = MemoryStream[StatefulOps.TouchEvent]
    val q = StatefulOps.streamingDebounce(input.toDS(), windowMicros = 10L)
      .writeStream.format("memory").queryName("deb")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    // u1: 0, 6, 12, 30 — 6 within 10 of 0, 12 within 10 of 6 (chained
    // suppression), 30 is 18 past 12 → kept. u2: gap EXACTLY the
    // window (>= rule keeps it). Cross-batch: u1's 12 arrives in a
    // later batch and must still be suppressed against the 6.
    val batches = Seq(
      Seq(e("u1", 0, 1), e("u1", 6, 2), e("u2", 100, 3)),
      Seq(e("u1", 12, 4), e("u2", 110, 5)),
      Seq(e("u1", 30, 6)))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.sql("SELECT key, eventId FROM deb")
        .as[(String, Long)].collect().toSet
      assert(got == Set(("u1", 1L), ("u1", 6L), ("u2", 3L), ("u2", 5L)),
        got.toString)
      // cross-check against the literal q41 batch kernel on the same rows
      val all = batches.flatten
      // .toSeq first: flatMap on a Map with pair results would rebuild
      // a Map and silently collapse per-key rows
      val batch = all.groupBy(_.key).toSeq.flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r.tsMicros, r.eventId))
        sorted.zip(Long.MinValue +: sorted.map(_.tsMicros))
          .collect { case (r, prev)
            if prev == Long.MinValue || r.tsMicros - prev >= 10L =>
            (k, r.eventId) }
      }.toSet
      assert(got == batch, s"streamed=$got batch=$batch")
    } finally q.stop()
  }

  test("streamingZscore: matches the batch q48 trailing-window kernel") {
    implicit val sq = spark.sqlContext
    // key a: 30 warm-up values with variance, then a spike and a dip
    // split across micro-batches; key b: too few values to ever warm up
    val warm = (0 until 30).map(i =>
      StatefulOps.TouchEvent("a", i * 100L, i.toLong, "x", (i % 5).toDouble))
    val spikes = Seq(
      StatefulOps.TouchEvent("a", 3000L, 30L, "x", 50.0),
      StatefulOps.TouchEvent("a", 3100L, 31L, "x", 2.0),
      StatefulOps.TouchEvent("a", 3200L, 32L, "x", -40.0),
      StatefulOps.TouchEvent("b", 10L, 33L, "x", 99.0))
    val input = MemoryStream[StatefulOps.TouchEvent]
    val q = StatefulOps.streamingZscore(input.toDS())
      .writeStream.format("memory").queryName("zs")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    try {
      (warm.grouped(12).toSeq ++ Seq(spikes)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = spark.sql("SELECT key, eventId, value, zSign, z2e6 FROM zs")
        .as[(String, Long, Double, Int, Long)].collect()
        .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
      // replay the exact batch-kernel integer arithmetic locally
      val all = (warm ++ spikes).groupBy(_.key)
      val want = all.flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r.tsMicros, r.eventId)).toVector
        sorted.indices.flatMap { i =>
          val frame = sorted.slice(math.max(0, i - 20), i)
            .map(r => math.round(r.value * 100))
          val n = frame.length.toLong
          if (n < 10) None
          else {
            val s1 = frame.sum
            val s2 = frame.map(v => v * v).sum
            val varnum = n * s2 - s1 * s1
            if (varnum <= 0) None
            else {
              val x2 = math.round(sorted(i).value * 100)
              val nn = x2 * n - s1
              val z2e6 = (2 * nn * nn * 1000000L + varnum) / (2 * varnum)
              if (z2e6 > 6250000L)
                Some((k, sorted(i).eventId) -> ((BigDecimal(sorted(i).value)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
                  java.lang.Long.signum(nn), z2e6)))
              else None
            }
          }
        }
      }.toMap
      assert(want.nonEmpty && want.keySet.contains(("a", 30L)),
        "fixture must flag the spike")
      assert(!want.keySet.exists(_._1 == "b"), "b never warms up")
      assert(got == want, s"streamed=$got batch=$want")
    } finally q.stop()
  }

  test("streamingHeavyHitters: exact under capacity, Space-Saving bounds over it") {
    implicit val sq = spark.sqlContext
    def item(sh: Int, w: String, us: Long) = StatefulOps.ShardedItem(sh, w, us)
    val input = MemoryStream[StatefulOps.ShardedItem]
    val q = StatefulOps.streamingHeavyHitters(input.toDS(),
        capacity = 2, topJ = 2)
      .writeStream.format("memory").queryName("hh")
      .outputMode("append").trigger(Trigger.ProcessingTime(10)).start()
    // shard 0: a,a,a then b — fits in capacity 2, counts stay EXACT
    // across batches; then c overflows: evicts min(b=1), inherits its
    // count as error → est(c)=2, err(c)=1. Space-Saving invariants:
    // est >= true, est − err <= true (true c = 1).
    // shard 1 runs independently (one item, exact).
    val batches = Seq(
      Seq(item(0, "a", 10), item(0, "a", 20), item(1, "x", 15)),
      Seq(item(0, "a", 30), item(0, "b", 40)),
      Seq(item(0, "c", 50)))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      def latest(sh: Int): Map[String, (Long, Long)] = {
        val rows = spark.sql(
            s"SELECT item, estCount, maxError, asOfMicros FROM hh WHERE shard = $sh")
          .as[(String, Long, Long, Long)].collect()
        val asOf = rows.map(_._4).max
        rows.filter(_._4 == asOf).map(r => r._1 -> ((r._2, r._3))).toMap
      }
      assert(latest(1) == Map("x" -> ((1L, 0L))), latest(1).toString)
      val s0 = latest(0)
      assert(s0 == Map("a" -> ((3L, 0L)), "c" -> ((2L, 1L))), s0.toString)
      // intermediate snapshot (batch 2) was exact: a=3, b=1, no error
      val mid = spark.sql(
          "SELECT item, estCount, maxError FROM hh WHERE shard = 0 AND asOfMicros = 40")
        .as[(String, Long, Long)].collect().toSet
      assert(mid == Set(("a", 3L, 0L), ("b", 1L, 0L)), mid.toString)
    } finally q.stop()
  }
}
