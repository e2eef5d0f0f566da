package graft

import org.apache.spark.sql.functions._

/** Hand-built fixtures for the product-analytics queries (q32/q33) —
  * the DuckDB oracle checks them at scale; these pin the semantics on
  * cases small enough to reason through.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("funnel stages gate on the earliest qualifying prior stage") {
    // u1 completes in order; u2 clicks BEFORE viewing (must not count
    // past stage 1); u3 views only
    val ev = Seq(
      (ts(10), 1L, "view"), (ts(20), 1L, "click"), (ts(30), 1L, "purchase"),
      (ts(5), 2L, "click"), (ts(10), 2L, "view"), (ts(40), 2L, "purchase"),
      (ts(10), 3L, "view"))
      .toDF("ts", "user_id", "event_type")
    ev.createOrReplaceTempView("funnel_fixture")
    val base = ev.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val v = base.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = base.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") >= col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = base.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") >= col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    assert(v.count() == 3) // u1, u2, u3 all viewed
    assert(c.as[(Long, Long)].collect().map(_._1).toSet == Set(1L)) // only u1 clicked after viewing
    assert(p.as[(Long, Long)].collect().map(_._1).toSet == Set(1L))
  }

  test("debounce keeps chain heads: a burst chained by inter-arrival stays suppressed") {
    import org.apache.spark.sql.expressions.Window
    // q41's semantics on crafted rows, window = 10s. u1: 0, 6, 12, 30 —
    // t=12 is ≥10s after the KEPT t=0, but only 6s after t=6, so the
    // burst chain keeps it suppressed (the lag()-only formulation would
    // wrongly keep it); t=30 starts a fresh chain.
    val winUs = 10L * 1000000L
    val ev = Seq(
      (ts(0), 1L, "e"), (ts(6), 1L, "e"), (ts(12), 1L, "e"), (ts(30), 1L, "e"),
      (ts(0), 2L, "e"), (ts(15), 2L, "e"))
      .toDF("ts", "user_id", "event_type")
      .withColumn("event_id", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val withChain = ev
      .withColumn("_us", unix_micros(col("ts")))
      .withColumn("_prev", lag(col("_us"), 1).over(w))
      .withColumn("_new_chain",
        (col("_prev").isNull || (col("_us") - col("_prev")) >= winUs).cast("long"))
      .withColumn("_chain", sum(col("_new_chain")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wc = Window.partitionBy(col("user_id"), col("event_type"), col("_chain"))
      .orderBy(col("ts"), col("event_id"))
    val kept = withChain.withColumn("_rn", row_number().over(wc))
      .filter(col("_rn") === 1)
      .select(col("user_id"), col("_us") / 1000000L)
      .as[(Long, Double)].collect().toSet
    assert(kept == Set((1L, 0.0), (1L, 30.0), (2L, 0.0), (2L, 15.0)), kept.toString)
  }

  test("retention offsets count distinct users per cohort day") {
    val day = 86400L
    val ev = Seq(
      (ts(0), 1L), (ts(day), 1L), (ts(day), 1L),   // u1: day0 cohort, back day1
      (ts(0), 2L),                                  // u2: day0 only
      (ts(day), 3L), (ts(3 * day), 3L))             // u3: day1 cohort, back day3
      .toDF("ts", "user_id")
    val days = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val got = days.join(cohort, "user_id")
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        datediff(col("day"), col("cohort_day")).as("off"), col("user_id"))
      .groupBy("cohort", "off").agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got(("1970-01-01", 0)) == 2) // u1 + u2 in day-0 cohort
    assert(got(("1970-01-01", 1)) == 1) // u1 retained next day
    assert(got(("1970-01-02", 0)) == 1) // u3 cohort
    assert(got(("1970-01-02", 2)) == 1) // u3 back at offset 2
  }

  test("peak concurrency sweep is exact, end-inclusive, per-day partitioned") {
    val day = 86400L
    val ev = Seq(
      // day 0: u1 [10,100], u2 [50,150], u3 [100,100] → 3 overlap at 100;
      //        u4 [200,300], u5 [300,300] → boundary-inclusive pair of 2
      (ts(10), 1L), (ts(100), 1L),
      (ts(50), 2L), (ts(150), 2L),
      (ts(100), 3L),
      (ts(200), 4L), (ts(300), 4L),
      (ts(300), 5L),
      // day 1: two disjoint singleton-ish sessions → peak 1
      (ts(day + 10), 1L), (ts(day + 20), 1L),
      (ts(day + 30), 2L))
      .toDF("ts", "user_id")
    val got = graft.operators.EventOps.peakConcurrencyDaily(ev)
      .select(date_format(col("day"), "yyyy-MM-dd"),
        col("peak_concurrent"), col("n_sessions"))
      .as[(String, Long, Long)].collect().toList
    assert(got == List(("1970-01-01", 3L, 5L), ("1970-01-02", 1L, 2L)),
      got.toString)
  }

  test("q63 aggregate rewrite equals the textbook EXISTS/NOT-EXISTS Q21 plan") {
    // The registry ships the two-level-aggregate rewrite (zero fact-fact
    // self-joins); this pins it against the literal TPC-H Q21 shape —
    // correlated EXISTS (another supplier on the order) + NOT EXISTS
    // (another LATE supplier) — on real testdata, where multi-supplier
    // orders with exactly one late supplier genuinely occur.
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "lineitem").createOrReplaceTempView("q63_li")
    Tables(spark, dir, "orders").createOrReplaceTempView("q63_ord")
    Tables(spark, dir, "supplier").createOrReplaceTempView("q63_supp")
    val textbook = spark.sql("""
      -- count DISTINCT orders: a supplier with two late lineitems on one
      -- order kept ONE order waiting (the raw Q21 count(*) would say 2)
      SELECT s.s_suppkey, s.s_name,
        count(DISTINCT l1.l_orderkey) AS numwait
      FROM q63_li l1
      JOIN q63_ord o ON l1.l_orderkey = o.o_orderkey
        AND o.o_orderstatus = 'F'
      JOIN q63_supp s ON l1.l_suppkey = s.s_suppkey
      WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 75 DAYS
        AND EXISTS (
          SELECT 1 FROM q63_li l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM q63_li l3
          JOIN q63_ord o3 ON l3.l_orderkey = o3.o_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 75 DAYS)
      GROUP BY s.s_suppkey, s.s_name
      ORDER BY numwait DESC, s_suppkey
      LIMIT 20""")
      .as[(Long, String, Long)].collect().toList
    val rewrite = QueryRegistry.queryMap("q63_waiting_suppliers")(spark, dir)
      .as[(Long, String, Long)].collect().toList
    assert(textbook.nonEmpty, "fixture must exercise the semantics")
    assert(rewrite == textbook,
      s"rewrite=$rewrite\ntextbook=$textbook")
  }

  test("basket lift: an always-together pair scores exactly 1, a planted affinity pair scores T/co-share") {
    // q67's lift formula on crafted baskets. Parts 1,2 appear in ALL 6
    // orders → co=6, n1=n2=6, lift = 6·6/(6·6) = 1 exactly. Parts 3,4
    // appear in 2 orders each, always together → lift = 2·6/(2·2) = 3.
    val op = (for {
      ok <- 1L to 6L
      pk <- Seq(1L, 2L) ++ (if (ok <= 2) Seq(3L, 4L) else Nil)
    } yield (ok, pk)).toDF("ok", "pk")
    val co = op.as("a")
      .join(op.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("co"))
    val sup = op.groupBy(col("pk")).agg(count(lit(1)).as("n"))
    val lifts = co
      .join(sup.select(col("pk").as("pa"), col("n").as("na")), "pa")
      .join(sup.select(col("pk").as("pb"), col("n").as("nb")), "pb")
      .select(col("pa"), col("pb"),
        ((col("co") * 6).cast("double") / (col("na") * col("nb"))).as("lift"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, l) => (a, b) -> l }.toMap
    assert(lifts((1L, 2L)) == 1.0)
    assert(lifts((3L, 4L)) == 3.0)
    assert(lifts((1L, 3L)) == 1.0) // 2·6/(6·2): co-membership at chance
  }
}
