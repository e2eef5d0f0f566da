package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges (co-located join)") {
    val wh = java.nio.file.Files.createTempDirectory("bucketed")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val ord = Tables(spark, "/root/testdata/sf0.001", "orders")
    ScaleOps.writeBucketed(li, "li_b", "l_orderkey", 4, s"$wh/li")
    ScaleOps.writeBucketed(ord, "ord_b", "o_orderkey", 4, s"$wh/ord")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum("l_quantity").as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val joinRegion = plan.split("HashAggregate").last // below the agg
      val exchangesBeforeJoin = "Exchange hashpartitioning".r
        .findAllIn(joinRegion).length
      assert(exchangesBeforeJoin == 0,
        s"bucketed join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("q61 over bucketed fact tables: shuffle-free join, identical result") {
    // The promoted 100 TB shape for the q61 registry entry: the SAME
    // shipLatencyByPriority kernel over writeBucketed lineitem/orders
    // must (a) plan the orderkey join with ZERO exchange on either
    // side, and (b) produce byte-identical results to the plain-table
    // run — proving the bucketed promotion is a pure physical-plan
    // change, not a semantic one.
    val wh = java.nio.file.Files.createTempDirectory("q61bucketed")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val ord = Tables(spark, "/root/testdata/sf0.001", "orders")
    ScaleOps.writeBucketed(li, "q61_li_b", "l_orderkey", 4, s"$wh/li")
    ScaleOps.writeBucketed(ord, "q61_ord_b", "o_orderkey", 4, s"$wh/ord")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val bucketed = ScaleOps.shipLatencyByPriority(
        spark.table("q61_li_b"), spark.table("q61_ord_b"))
      val got = bucketed.collect().map(_.toString).toSeq
      val plan = bucketed.queryExecution.executedPlan.toString
      // the only exchanges allowed are ABOVE the aggregate (the tiny
      // per-priority roll-up); the join region below the LAST partial
      // aggregate must be exchange-free — both scans arrive
      // pre-distributed on orderkey. Split on "Aggregate" (percentile
      // plans as ObjectHashAggregate, not HashAggregate).
      val joinRegion = plan.split("Aggregate").last
      assert("Exchange hashpartitioning".r.findAllIn(joinRegion).isEmpty,
        s"bucketed q61 join must not shuffle either fact side:\n$plan")
      assert("SortMergeJoin".r.findAllIn(plan).nonEmpty,
        s"expected the co-located sort-merge join:\n$plan")
      val plain = ScaleOps.shipLatencyByPriority(li, ord)
        .collect().map(_.toString).toSeq
      assert(got == plain,
        s"bucketed promotion changed the answer:\n$got\nvs\n$plain")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS q61_li_b")
      spark.sql("DROP TABLE IF EXISTS q61_ord_b")
    }
  }

  test("salted join result equals plain join") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity", "l_linenumber")
    val ord = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(ord, "l_orderkey")
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
      .as[(Long, Int, String)].collect().toSet
    val salted = ScaleOps.saltedJoin(li, ord, "l_orderkey", salts = 8)
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
      .as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("salted join spreads a hot key over multiple salts") {
    val hot = Seq.fill(1000)((1L, "x")).toDF("k", "v")
    val salts = hot.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .select("_salt").distinct().count()
    // all rows identical → same salt; realistic rows differ. Use index:
    val hotIdx = (0 until 1000).map(i => (1L, s"x$i")).toDF("k", "v")
    val saltSpread = hotIdx.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .select("_salt").distinct().count()
    assert(saltSpread == 8, s"distinct rows of a hot key spread over all salts (got $saltSpread)")
    assert(salts == 1, "degenerate identical rows collapse to one salt (documented)")
  }

  test("key skew profile surfaces the heavy keys") {
    val df = (Seq.fill(90)(("hot", 1)) ++ Seq.tabulate(10)(i => (s"k$i", 1)))
      .toDF("key", "v")
    val prof = ScaleOps.keySkewProfile(df, "key", topN = 3).collect()
    assert(prof.head.getString(0) == "hot")
    assert(prof.head.getDouble(2) == 0.9)
  }

  test("AQE splits a planted skewed join partition (skew=true in the finalized plan)") {
    // The runtime half of the skew story: keySkewProfile + salting are
    // the STATIC mitigations; this pins that the engine's own
    // adaptive skew-join also fires under our session extensions, so a
    // hot key at 100 TB gets split without hand-salting. Thresholds
    // are forced low so a local fixture trips them; broadcast is
    // disabled so the join stays sort-merge (the only shape AQE
    // skew-splits).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // hot key 1 carries ~50k wide rows; the rest are uniform
      val pad = "p" * 64
      val left = spark.range(0, 50000).toDF("i")
        .select((col("i") % 1000 === 0).cast("int").as("_u"), col("i"))
        .select(when(col("_u") === 1, col("i")).otherwise(lit(1L)).as("k"),
          concat(lit(pad), col("i")).as("v"))
      val right = spark.range(0, 2000).toDF("i")
        .select((col("i") % 50).as("k"), lit("r").as("w"))
      val joined = left.join(right, "k")
      joined.queryExecution.executedPlan.execute().foreach(_ => ())
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), s"fixture must stay SMJ:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("globalRankByRange equals the global-sort rank, dense and gapless") {
    // 5000 rows with heavy value ties (v = i % 37) across 16 ranges —
    // ties must resolve identically to one global ORDER BY (v, id),
    // and the composed offsets must leave no gaps or duplicates.
    val df = spark.range(0, 5000).toDF("id")
      .select(col("id"), (col("id") % 37).as("v"))
    val ranked = ScaleOps.globalRankByRange(
      df, Seq(col("v"), col("id")), nRanges = 16)
    val got = ranked.orderBy("grank").select("id", "grank")
      .as[(Long, Long)].collect()
    val expect = df.select("id", "v").as[(Long, Long)].collect()
      .sortBy { case (id, v) => (v, id) }.map(_._1)
    assert(got.map(_._2).toSeq == (0L until 5000L),
      "ranks must be exactly [0, N) with no gaps")
    assert(got.map(_._1).toSeq == expect.toSeq,
      "rank order must match the global (v, id) sort")
  }

  test("globalRankByRange gini formula hits the closed-form extremes") {
    // q65's Gini spine on crafted distributions: all-equal masses →
    // G = 0; one holder owns everything → G = (n−1)/n exactly.
    def gini(values: Seq[Long]): Double = {
      val df = values.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
      val ranked = ScaleOps.globalRankByRange(
        df, Seq(col("x"), col("id")), nRanges = 4)
      val r = ranked.agg(count(lit(1)), sum(col("x")),
        sum((col("grank") + 1) * col("x"))).head()
      val (n, t, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
      2.0 * w / (n * t) - (n + 1.0) / n
    }
    assert(math.abs(gini(Seq.fill(8)(100L))) < 1e-12)
    assert(math.abs(gini(Seq.fill(9)(0L) :+ 1000L) - 0.9) < 1e-12)
  }

  test("basketPairs: mega-basket cap bounds fan-out, leaves small baskets exact") {
    // plant a degenerate fat order (the bot-cart shape a 100 TB crawl
    // WILL contain) among normal baskets and check: uncapped fan-out is
    // basket²; capped fan-out is cap·(cap−1)/2 from the cap smallest
    // item ids; every basket at or under the cap emits identical pairs
    val fat = (1 to 200).map(i => (999L, i.toLong))
    val small = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 40L),
      (3L, 7L)) // incl. a singleton basket: no pairs
    val dup = Seq((1L, 10L)) // duplicate (basket, item): distinct-folded
    val df = (fat ++ small ++ dup).toDF("ok", "pk")

    val unc = ScaleOps.basketPairs(df, "ok", "pk")
    assert(unc.filter(col("ok") === 999L).count() == 200L * 199 / 2)
    val cap = ScaleOps.basketPairs(df, "ok", "pk", maxBasketSize = Some(10))
    assert(cap.filter(col("ok") === 999L).count() == 10L * 9 / 2)
    // deterministic truncation: the kept items are the 10 SMALLEST ids
    assert(cap.filter(col("ok") === 999L).agg(max(col("part_b"))).head()
      .getLong(0) == 10L)
    // baskets within the cap are untouched, pair-for-pair
    def smallPairs(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("ok") < 999L).select("ok", "part_a", "part_b")
        .as[(Long, Long, Long)].collect().toSet
    assert(smallPairs(cap) == smallPairs(unc))
    assert(smallPairs(unc) == Set((1L, 10L, 20L), (1L, 10L, 30L),
      (1L, 20L, 30L), (2L, 10L, 40L)))
    intercept[IllegalArgumentException] {
      ScaleOps.basketPairs(df, "ok", "pk", maxBasketSize = Some(1))
    }
  }
}
