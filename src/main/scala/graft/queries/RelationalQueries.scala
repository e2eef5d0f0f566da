package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.8): scan, filter, project,
  * hash/sort aggregation, broadcast + shuffle joins, semi/anti joins,
  * window functions, rollup/cube, set ops, subquery patterns, pivot,
  * top-k. All come from Catalyst; the point of each query is that the
  * produced *plan* is the one we'd want at 100 TB (filters pushed to the
  * parquet scan, small dimensions broadcast, partial aggregation before
  * shuffle).
  *
  * Reference scope note: the reference engine itself has no relational
  * operators (SURVEY.md §2.8) — this is the north-star query surface the
  * Spark build adds on top of playback parity.
  */
object RelationalQueries {

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")
  private def part(s: SparkSession, d: String) = Tables(s, d, "part")
  private def supp(s: SparkSession, d: String) = Tables(s, d, "supplier")
  private def nat(s: SparkSession, d: String) = Tables(s, d, "nation")
  private def reg(s: SparkSession, d: String) = Tables(s, d, "region")
  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")

  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  // --- q01: TPC-H Q1 pricing summary: scan → partial agg → final agg ---
  // All money/quantity outputs go out in EXACT integer units (qty,
  // cents, e-4 and e-6 dollars) rather than rounded doubles. The
  // salt-13 fuzz shape proved `round(x, k)` is engine-defined whenever
  // x is a ratio/average of decimal-backed values: the true value can
  // be a short decimal ending in 5 at digit k+1 — non-dyadic, so
  // Spark's shortest-repr HALF_UP snaps to the boundary while DuckDB's
  // float multiply lands just under it. Quantities are whole, prices
  // and rates are hundredths in this corpus, so every sum/avg below is
  // computable in pure integers: averages use round-half-away
  // (2·m·S + n) DIV (2n) (q21's formula), and the charge sum runs
  // through DECIMAL(38,0) before the output cast so a 100 TB corpus
  // overflows loudly, never silently (per-term ≤ ~8e10 · rows).
  private val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("_q"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("_pc"),
          expr("CAST(round(l_discount * 100) AS BIGINT)").as("_d2"),
          expr("CAST(round(l_tax * 100) AS BIGINT)").as("_t2"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("_q")).as("sum_qty"),
          sum(col("_pc")).as("sum_base_price_c"),
          // through DECIMAL(38,0) like sum_charge: per-term ≤ ~1e9, so
          // past ~9e9 qualifying rows a plain Long sum would WRAP
          // silently under non-ANSI Spark — decimal overflows loudly
          sum((col("_pc") * (lit(100L) - col("_d2")))
            .cast("decimal(38,0)")).cast("long").as("sum_disc_price_e4"),
          sum((col("_pc") * (lit(100L) - col("_d2")) * (lit(100L) + col("_t2")))
            .cast("decimal(38,0)")).cast("long").as("sum_charge_e6"),
          sum(col("_d2")).as("_sd"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty_e4",
          expr("(sum_qty * 20000 + count_order) DIV (2 * count_order)"))
        .withColumn("avg_price_e4",
          expr("(sum_base_price_c * 200 + count_order) DIV (2 * count_order)"))
        .withColumn("avg_disc_e6",
          expr("(_sd * 20000 + count_order) DIV (2 * count_order)"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price_c"), col("sum_disc_price_e4"),
          col("sum_charge_e6"), col("avg_qty_e4"), col("avg_price_e4"),
          col("avg_disc_e6"), col("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""WITH u AS (
      SELECT l_returnflag, l_linestatus,
        CAST(round(l_quantity) AS BIGINT) AS q,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
        CAST(round(l_discount * 100) AS BIGINT) AS d2,
        CAST(round(l_tax * 100) AS BIGINT) AS t2
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
    SELECT l_returnflag, l_linestatus,
      CAST(sum(q) AS BIGINT) AS sum_qty,
      CAST(sum(pc) AS BIGINT) AS sum_base_price_c,
      CAST(sum(pc * (100 - d2)) AS BIGINT) AS sum_disc_price_e4,
      CAST(sum(CAST(pc * (100 - d2) * (100 + t2) AS HUGEINT)) AS BIGINT)
        AS sum_charge_e6,
      (CAST(sum(q) AS BIGINT) * 20000 + count(*)) // (2 * count(*))
        AS avg_qty_e4,
      (CAST(sum(pc) AS BIGINT) * 200 + count(*)) // (2 * count(*))
        AS avg_price_e4,
      (CAST(sum(d2) AS BIGINT) * 20000 + count(*)) // (2 * count(*))
        AS avg_disc_e6,
      count(*) AS count_order
    FROM u
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  // --- q02: selective filter + projection + deterministic top-k -------
  private val q02 = GraftQuery(
    "q02_filter_topk",
    (s, d) =>
      li(s, d)
        .filter(col("l_quantity") >= 48 && col("l_discount") <= 0.02)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_quantity >= 48 AND l_discount <= 0.02
    ORDER BY price DESC, l_orderkey, l_linenumber
    LIMIT 100"""))

  // --- q03: TPC-H Q3-style 3-way join; customer broadcast-able --------
  private val q03 = GraftQuery(
    "q03_shipping_priority",
    (s, d) => {
      val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = ord(s, d).filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val l = li(s, d).filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        // exact e-4 integer revenue (q01's pc/d2 pattern; r13 sf1
        // lesson): price*(1-disc) is a 4-decimal true value, so
        // round(float-sum, 2) sits ON a rounding boundary whenever the
        // true value ends in .xx50 - and the top-50 ORDER itself was
        // ulp-sensitive at the cut; exact integers settle both
        .agg(sum((expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
            (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
            .cast("decimal(38,0)")).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey"))
        .limit(50)
    },
    Some("""SELECT l_orderkey,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        AS revenue_e4
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey
    ORDER BY revenue_e4 DESC, l_orderkey
    LIMIT 50"""),
    bench = true)

  // --- q04: fact ⋈ broadcast(dim) aggregation -------------------------
  private val q04 = GraftQuery(
    "q04_brand_volume",
    (s, d) =>
      li(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_lines"),
          round(sum("l_extendedprice"), 2).as("volume"))
        .orderBy("p_brand"),
    Some("""SELECT p_brand, count(*) AS n_lines,
      round(sum(l_extendedprice), 2) AS volume
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand"""),
    bench = true)

  // --- q05: TPC-H Q5-style 6-way join with local-supplier predicate ---
  private val q05 = GraftQuery(
    "q05_local_supplier_volume",
    (s, d) => {
      val l = li(s, d)
      val o = ord(s, d).filter(
        col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val c = cust(s, d)
      val su = supp(s, d)
      val n = nat(s, d)
      val r = reg(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // exact e-4 integer revenue (see q03)
        .agg(sum((expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
            (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
            .cast("decimal(38,0)")).cast("long").as("revenue_e4"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        AS revenue_e4
    FROM lineitem, orders, customer, supplier, nation, region
    WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND o_custkey = c_custkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY n_name"""),
    bench = true)

  // --- q06: TPC-H Q6 single-pass filter-aggregate ---------------------
  private val q06 = GraftQuery(
    "q06_forecast_revenue",
    (s, d) =>
      li(s, d)
        .filter(
          col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00") &&
            col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
            col("l_quantity") < 24)
        .agg(sum((expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
            expr("CAST(round(l_discount * 100) AS BIGINT)"))
            .cast("decimal(38,0)")).cast("long").as("revenue_e4")), // exact e-4 (see q03)
    Some("""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24"""))

  // --- q07: ranking window function, top-3 per group ------------------
  private val q07 = GraftQuery(
    "q07_top_customers_per_nation",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      cust(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_nationkey", "rn")
    },
    Some("""SELECT c_nationkey, rn, c_custkey, round(c_acctbal, 2) AS acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
        row_number() OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
    WHERE rn <= 3
    ORDER BY c_nationkey, rn"""))

  // --- q08: running-total window over an explicit ROWS frame ----------
  // Window-order totality, the hard way: the driver generator's
  // (l_orderkey, l_linenumber) is NOT unique (sf0.01 carries 11,785
  // duplicate pairs), so ordering by (shipdate, orderkey, linenumber)
  // alone leaves ROWS-frame prefixes engine-defined on ties. The
  // driver-shape gate passed by luck (uniform suppkeys rarely put two
  // tied rows in the same ≤10 partition); the round-12 Zipf-reshaped
  // second-shape run piled ties into one partition and caught Spark
  // and DuckDB disagreeing. l_quantity as the final tie-break makes
  // the OUTPUT MULTISET order-invariant even under full ties: rows
  // agreeing on every ordering column contribute identical (x+q,
  // x+2q) running values whichever engine-order they take.
  private val q08 = GraftQuery(
    "q08_running_supplier_qty",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li(s, d)
        .filter(col("l_suppkey") <= 10)
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
      sum(l_quantity) OVER (PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 10
    ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  // --- q09: exact distinct aggregation (expand + two-phase agg) -------
  private val q09 = GraftQuery(
    "q09_distinct_parts",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_lines"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(*) AS n_lines,
      count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""))

  // --- q10: rollup grouping sets --------------------------------------
  private val q10 = GraftQuery(
    "q10_rollup_flag_status",
    (s, d) =>
      li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  // --- q11: anti join (NOT EXISTS) ------------------------------------
  private val q11 = GraftQuery(
    "q11_customers_without_orders",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey"""))

  // --- q12: semi join (EXISTS) ----------------------------------------
  private val q12 = GraftQuery(
    "q12_customers_with_urgent_orders",
    (s, d) =>
      cust(s, d)
        .join(
          ord(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey"""))

  // --- q13: correlated-aggregate pattern (join against per-key agg) ---
  private val q13 = GraftQuery(
    "q13_orders_above_customer_avg",
    (s, d) => {
      val o = ord(s, d)
      val custAvg = o.groupBy(col("o_custkey").as("ck"))
        .agg(avg(col("o_totalprice")).as("avg_price"))
      o.join(custAvg, col("o_custkey") === col("ck"))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey"""))

  // --- q14: scalar expressions: CASE / string funcs / arithmetic ------
  private val q14 = GraftQuery(
    "q14_part_size_classes",
    (s, d) =>
      part(s, d)
        .withColumn("size_class",
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large"))
        .withColumn("name_head", upper(substring(col("p_name"), 1, 5)))
        .groupBy(col("size_class"), col("name_head"))
        // average in exact e-4-dollar units (q21's integer
        // round-half-away over the cents sum) — round(avg(cents), 4)
        // is engine-defined on a .00005 boundary
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(p_retailprice * 100) AS BIGINT)")).as("_sc"))
        .withColumn("avg_price_e4", expr("(_sc * 200 + n) DIV (2 * n)"))
        .select(col("size_class"), col("name_head"), col("n"),
          col("avg_price_e4"))
        .orderBy("size_class", "name_head"),
    Some("""SELECT
      CASE WHEN p_size < 10 THEN 'small'
           WHEN p_size < 30 THEN 'medium'
           ELSE 'large' END AS size_class,
      upper(substr(p_name, 1, 5)) AS name_head,
      count(*) AS n,
      (CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) * 200
        + count(*)) // (2 * count(*)) AS avg_price_e4
    FROM part
    GROUP BY 1, 2
    ORDER BY size_class, name_head"""))

  // --- q15: time bucketing on the events stream table -----------------
  private val q15 = GraftQuery(
    "q15_events_hourly",
    (s, d) =>
      ev(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type"""),
    bench = true)

  // --- q16: regex extraction from the JSON-ish props column -----------
  // (reference: process_csv_data.py:74-81 pulls fields out of stringified
  // dicts by hand; we use regexp_extract — R7 in SURVEY.md §2.3)
  private val q16 = GraftQuery(
    "q16_props_extract",
    (s, d) =>
      ev(s, d)
        .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).cast("int"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k"),
    Some("""SELECT CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k,
      count(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY k"""))

  // --- q17: grouped HAVING --------------------------------------------
  private val q17 = GraftQuery(
    "q17_nation_supplier_balance",
    (s, d) =>
      supp(s, d)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"), round(sum("s_acctbal"), 2).as("total_bal"))
        .filter(col("n_supp") >= 2)
        .orderBy("s_nationkey"),
    Some("""SELECT s_nationkey, count(*) AS n_supp,
      round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    GROUP BY s_nationkey
    HAVING count(*) >= 2
    ORDER BY s_nationkey"""))

  // --- q18: TPC-H Q18-style large-volume orders (agg → semi filter) ---
  private val q18 = GraftQuery(
    "q18_large_orders",
    (s, d) => {
      val big = li(s, d)
        .groupBy(col("l_orderkey").as("lk"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 180)
      ord(s, d)
        .join(big, col("o_orderkey") === col("lk"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("totalprice"),
          round(col("sum_qty"), 2).as("sum_qty"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
      round(t.sum_qty, 2) AS sum_qty
    FROM orders
    JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 180) t
      ON o_orderkey = t.l_orderkey
    ORDER BY o_orderkey"""),
    bench = true)

  // --- q19 / q20: set operations --------------------------------------
  private val q19 = GraftQuery(
    "q19_intersect_priorities",
    (s, d) => {
      val o = ord(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey")))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey"""))

  private val q20 = GraftQuery(
    "q20_except_years",
    (s, d) => {
      val o = ord(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      y95.except(y96).orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996
    ORDER BY o_custkey"""))

  // --- q21: cube grouping sets ----------------------------------------
  // The average goes out in EXACT 1e-4-dollar units, not as a rounded
  // double: `round(avg(double), 4)` flipped its last digit between
  // engines on the round-12 salt-13 fuzz shape (3993.8912 vs .8913) —
  // Spark rounds the shortest decimal repr half-up while DuckDB rounds
  // in float arithmetic, so a group average near a .00005 boundary is
  // engine-defined even from identical inputs. Integer cents sum →
  // (200·|S| + n) div (2n) with the sign reapplied is round-half-away
  // computed entirely in integers — bit-identical everywhere (q62's
  // exact-cents rule extended to averages). |S|·200 ≤ 2e18 up to ~1e10
  // rows/group of max-balance customers; ANSI overflow is loud.
  private val q21 = GraftQuery(
    "q21_cube_segment_nation",
    (s, d) =>
      cust(s, d)
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("_s"))
        .withColumn("avg_bal_e4", expr(
          """CASE WHEN _s >= 0 THEN (_s * 200 + n) DIV (2 * n)
             ELSE -(((-_s) * 200 + n) DIV (2 * n)) END"""))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n"),
          col("avg_bal_e4"))
        .orderBy(col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first),
    Some("""WITH g AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS n,
        CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s
      FROM customer
      GROUP BY CUBE (c_mktsegment, c_nationkey))
    SELECT c_mktsegment, c_nationkey, n,
      CAST(CASE WHEN s >= 0 THEN (s * 200 + n) // (2 * n)
        ELSE -(((-s) * 200 + n) // (2 * n)) END AS BIGINT) AS avg_bal_e4
    FROM g
    ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST"""))

  // --- q22: TPC-H Q17-style below-average-quantity revenue ------------
  private val q22 = GraftQuery(
    "q22_small_quantity_revenue",
    (s, d) => {
      val l = li(s, d)
      val avgQty = l.groupBy(col("l_partkey").as("pk"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_lim"))
      l.join(broadcast(part(s, d).filter(col("p_brand") === "Brand#12")),
          col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("qty_lim"))
        // Σcents/7 emitted in exact e-2-dollar units via integer
        // round-half-away. /7 never lands exactly on a .005 boundary
        // (7 ∤ 2Sc with odd quotient), but the double cents-sum loses
        // exactness past 2^53 (~9e15 cents ≈ sf100) and then the two
        // engines' partition-ordered sums differ in the low bits —
        // BIGINT sums keep the output scale-invariant
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("_sc"))
        .select(expr("(_sc * 2 + 7) DIV 14").as("avg_yearly_e2"))
    },
    Some("""SELECT (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        AS BIGINT) * 2 + 7) // 14 AS avg_yearly_e2
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"""))

  // --- q23: deterministic arg-max per group via ranking ---------------
  private val q23 = GraftQuery(
    "q23_peak_event_per_type",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("event_id"), round(col("value"), 2).as("peak"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, event_id, round(value, 2) AS peak
    FROM (
      SELECT event_type, event_id, value,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY value DESC, event_id) AS rn
      FROM events)
    WHERE rn = 1
    ORDER BY event_type"""))

  // --- q24: pivot (conditional aggregation) ---------------------------
  private val q24 = GraftQuery(
    "q24_daily_event_pivot",
    (s, d) =>
      ev(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("day"),
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS day,
      count(*) FILTER (WHERE event_type = 'click') AS click,
      count(*) FILTER (WHERE event_type = 'error') AS error,
      count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      count(*) FILTER (WHERE event_type = 'signup') AS signup,
      count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY 1
    ORDER BY day"""))

  // --- q25: sessionization (lag + running sum of session starts) ------
  private val q25 = GraftQuery(
    "q25_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L ||
            lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          // exact integer µs (not round(µs/1e6, 3)): float half-way ties
          // round differently in Spark (HALF_UP) vs DuckDB → hash drift
          (max(col("us")) - min(col("us"))).as("duration_us"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 OR
                  lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, us,
        CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
      FROM t)
    SELECT user_id, session_id, count(*) AS n_events,
      max(us) - min(us) AS duration_us
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""),
    bench = true)

  // --- q26: as-of join (most recent click before each error) ----------
  // Spark lacks ASOF JOIN; the union + running-last trick expresses it
  // shuffle-once (no range join explosion). DuckDB has native ASOF.
  private val q26 = GraftQuery(
    "q26_asof_click_before_error",
    (s, d) => {
      val e = ev(s, d).filter(col("event_type").isin("click", "error"))
      // clicks sort before errors at equal timestamps (ASOF includes ties)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), when(col("event_type") === "error", 1).otherwise(0),
          col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_us",
          last(when(col("event_type") === "click", unix_micros(col("ts"))), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("click_id"),
          // exact integer µs (same rationale as q25: round(µs/1e6, 3)
          // resolves half-way ties differently across engines)
          (unix_micros(col("ts")) - col("click_us")).as("lag_us"))
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id, c.event_id AS click_id,
      epoch_us(e.ts) - epoch_us(c.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    ORDER BY e.event_id"""))

  // --- q27: approximate sketches (HLL distinct, quantile sketch) ------
  // Sketch ALGORITHMS are engine-specific (Spark's HLL++/KLL vs
  // DuckDB's), so raw sketch outputs can never hash across engines.
  // The gate instead verifies the two things that CAN be pinned:
  // (1) the exact companions (distinct count, interpolated
  // percentiles — the q35 parity pattern) hash against DuckDB, and
  // (2) the sketches' accuracy CLAIM is emitted as 0/1 columns —
  // Spark computes |approx − exact| ≤ 15% (3× HLL++'s default 5% rsd;
  // the same generous band covers the percentile sketches, whose rank
  // error at accuracy 1000 is far tighter) in the same aggregate, the
  // oracle expects literal 1, and a sketch drifting out of tolerance
  // flips the column to 0 and fails the hash. That turns the old
  // rows-only entry into a driver-red-on-regression SANITY gate —
  // deliberately 3σ, not 1σ: the estimator is deterministic per
  // dataset, so a 1σ band would deterministically fail ~32% of groups
  // on any corpus other than the pinned fixture (SketchSpec still
  // asserts tighter bounds with explicit numbers on the fixture).
  private val q27 = GraftQuery(
    "q27_approx_stats",
    (s, d) => {
      // 3× HLL++'s default 5% rsd: the gate asserts the sketch is SANE,
      // not lucky — a 1-rsd band (0.05) would be a ~32% deterministic
      // failure chance per group on any dataset other than the pinned
      // fixture (the estimator is deterministic per dataset, so an
      // unlucky corpus fails every run, reading as a regression)
      val tol = 0.15
      val exactUsers = count_distinct(col("user_id"))
      val exactP50 = expr("percentile(value, 0.5)")
      val exactP95 = expr("percentile(value, 0.95)")
      val band = (approx: Column, exact: Column) =>
        (abs(approx - exact) <= greatest(abs(exact) * tol, lit(1e-9)))
          .cast("long")
      ev(s, d)
        .groupBy(col("event_type"))
        .agg(
          exactUsers.as("exact_users"),
          round(exactP50, 4).as("p50_exact"),
          round(exactP95, 4).as("p95_exact"),
          band(approx_count_distinct(col("user_id")).cast("double"),
            exactUsers.cast("double")).as("approx_users_ok"),
          band(percentile_approx(col("value"), lit(0.5), lit(1000)), exactP50)
            .as("p50_ok"),
          band(percentile_approx(col("value"), lit(0.95), lit(1000)), exactP95)
            .as("p95_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
      count(DISTINCT user_id) AS exact_users,
      round(quantile_cont(value, 0.5), 4) AS p50_exact,
      round(quantile_cont(value, 0.95), 4) AS p95_exact,
      CAST(1 AS BIGINT) AS approx_users_ok,
      CAST(1 AS BIGINT) AS p50_ok,
      CAST(1 AS BIGINT) AS p95_ok
    FROM events GROUP BY event_type ORDER BY event_type"""))

  // --- q28: time-range join (clicks in the 5 min before each error) ---
  // A naive theta-join (user matches AND ts in range) can't hash-
  // partition. Bucketing time into 5-min bins turns it into an
  // equi-join on (user_id, bin) with a 2-bin probe per error — shuffle
  // volume is O(events), the exact filter runs post-join, and the plan
  // scales like any hash join. The histogram output keeps the result
  // bounded at any SF.
  private val q28 = GraftQuery(
    "q28_range_join_histogram",
    (s, d) => {
      val winUs = 300000000L // 5 min in µs
      val base = ev(s, d).withColumn("us", unix_micros(col("ts")))
      val e = base.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("us").as("e_us"))
        .withColumn("bin", expr(s"e_us div $winUs"))
      val eb = e.withColumn("probe", explode(array(col("bin"), col("bin") - 1)))
      val c = base.filter(col("event_type") === "click")
        .select(col("user_id"), col("us").as("c_us"))
        .withColumn("probe", expr(s"c_us div $winUs"))
      // a click lives in exactly one bin and an error probes two distinct
      // bins, so each qualifying (error, click) pair joins exactly once
      val perError = eb.join(c, Seq("user_id", "probe"))
        .filter(col("c_us") <= col("e_us") && col("c_us") > col("e_us") - winUs)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_before"))
      e.select(col("event_id")).join(perError, Seq("event_id"), "left")
        .select(coalesce(col("n_before"), lit(0L)).as("n_before"))
        .groupBy(col("n_before"))
        .agg(count(lit(1)).as("n_errors"))
        .orderBy("n_before")
    },
    Some("""WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'error'),
    c AS (
      SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'click'),
    per AS (
      SELECT e.event_id, count(c.us) AS n_before
      FROM e LEFT JOIN c ON c.user_id = e.user_id
        AND c.us <= e.us AND c.us > e.us - 300000000
      GROUP BY e.event_id)
    SELECT n_before, count(*) AS n_errors
    FROM per GROUP BY n_before ORDER BY n_before"""),
    bench = true)

  // --- q29: distribution windows (ntile + percent_rank per nation) ----
  // Partitioned by nation so the ranking never needs a global
  // single-partition window; percent_rank is ranked on the raw balance
  // with custkey tiebreak (ties in acctbal resolve identically on both
  // engines), and only integer/rounded outputs are emitted.
  private val q29 = GraftQuery(
    "q29_balance_quartiles",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      cust(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("c_nationkey"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("c_acctbal")), 2).as("min_bal"),
          round(max(col("c_acctbal")), 2).as("max_bal"))
        .orderBy("c_nationkey", "quartile")
    },
    Some("""SELECT c_nationkey, quartile, count(*) AS n,
      round(min(c_acctbal), 2) AS min_bal,
      round(max(c_acctbal), 2) AS max_bal
    FROM (
      SELECT c_nationkey, c_acctbal, ntile(4) OVER (
        PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer)
    GROUP BY c_nationkey, quartile
    ORDER BY c_nationkey, quartile"""))

  // --- q30: GROUPING SETS with grouping flags -------------------------
  private val q30 = GraftQuery(
    "q30_grouping_sets",
    (s, d) => {
      li(s, d).createOrReplaceTempView("g30_lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus,
          grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
          count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM g30_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
          l_linestatus NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(grouping(l_returnflag) AS INT) AS g_flag,
      CAST(grouping(l_linestatus) AS INT) AS g_status,
      count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
      l_linestatus NULLS FIRST"""))

  // --- q31: salted two-stage aggregation over a skewed key ------------
  // event_type has 5 hot values — the shape where one reducer owns a
  // whole key. The salted plan spreads each key over 16 reducers and
  // re-aggregates; the oracle is the plain GROUP BY, proving the
  // decomposition is exact.
  private val q31 = GraftQuery(
    "q31_salted_skew_agg",
    (s, d) =>
      graft.operators.ScaleOps
        .saltedSumCount(ev(s, d).select("event_type", "value"),
          "event_type", "value", salts = 16)
        .select(col("event_type"),
          round(col("sum_value"), 2).as("sum_value"), col("n"))
        .orderBy("event_type"),
    Some("""SELECT event_type, round(sum(value), 2) AS sum_value,
      count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type"""))

  // --- q32: ordered funnel (view → click → purchase) ------------------
  // Stage N's earliest qualifying timestamp gates stage N+1. One scan
  // of events and ONE user_id shuffle: the three stage timestamps are
  // chained unbounded-window minimums over the same partitioning
  // (Spark stacks the Window operators on a single Exchange+Sort, and
  // the per-user collapse reuses that partitioning too — the
  // join-back formulation re-scanned events 6 times and shuffled 11). */
  private val q32 = GraftQuery(
    "q32_funnel",
    (s, d) => {
      val wu = Window.partitionBy(col("user_id"))
      val staged = ev(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("v_us",
          min(when(col("event_type") === "view", col("us"))).over(wu))
        .withColumn("c_us",
          min(when(col("event_type") === "click" &&
            col("us") >= col("v_us"), col("us"))).over(wu))
        .withColumn("p_us",
          min(when(col("event_type") === "purchase" &&
            col("us") >= col("c_us"), col("us"))).over(wu))
        .groupBy(col("user_id"))
        .agg(max(col("v_us")).as("v_us"), max(col("c_us")).as("c_us"),
          max(col("p_us")).as("p_us"))
      staged
        .agg(count(col("v_us")).as("n_view"), count(col("c_us")).as("n_click"),
          count(col("p_us")).as("n_purchase"))
        .select(expr("stack(3, '1_view', n_view, '2_click', n_click, " +
          "'3_purchase', n_purchase) AS (stage, n_users)"))
        .orderBy("stage")
    },
    Some("""WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT user_id, min(us) AS v_us FROM e
      WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.us) AS c_us FROM e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.us >= v.v_us GROUP BY 1),
    p AS (SELECT e.user_id, min(e.us) AS p_us FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us >= c.c_us GROUP BY 1)
    SELECT '1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
    ORDER BY stage"""))

  // --- q33: retention cohorts (first-seen day × day offset) -----------
  // cohort_day is an unbounded-window min over the user partition the
  // distinct already shuffled into place — no join-back, no second
  // scan of events.
  private val q33 = GraftQuery(
    "q33_retention_cohorts",
    (s, d) => {
      val days = ev(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      days
        .withColumn("cohort_day",
          min(col("day")).over(Window.partitionBy(col("user_id"))))
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"), col("user_id"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
          col("day_offset").cast("long").as("day_offset"), col("n_users"))
        .orderBy("cohort", "day_offset")
    },
    Some("""WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    coh AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
      day - cohort_day AS day_offset, count(DISTINCT user_id) AS n_users
    FROM d JOIN coh USING (user_id)
    WHERE day - cohort_day <= 7
    GROUP BY 1, 2 ORDER BY cohort, day_offset"""))

  // --- q34: full outer join presence matrix ---------------------------
  private val q34 = GraftQuery(
    "q34_full_outer_presence",
    (s, d) => {
      val c = cust(s, d).select(col("c_custkey"))
      val o = ord(s, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
            .when(col("o_custkey").isNull, "customer_only")
            .otherwise("order_only").as("presence"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .groupBy(col("presence"))
        .agg(count(lit(1)).as("n"), sum(col("n_orders")).as("total_orders"))
        .orderBy("presence")
    },
    Some("""SELECT presence, count(*) AS n,
      CAST(sum(n_orders) AS BIGINT) AS total_orders
    FROM (
      SELECT CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
                  THEN 'both'
                  WHEN o.o_custkey IS NULL THEN 'customer_only'
                  ELSE 'order_only' END AS presence,
        coalesce(o.n_orders, 0) AS n_orders
      FROM customer c
      FULL OUTER JOIN (
        SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
        ON c.c_custkey = o.o_custkey)
    GROUP BY presence ORDER BY presence"""))

  // --- q35: exact quartiles per group (continuous interpolation) ------
  // The exact counterpart of q27's sketches: both engines compute the
  // same linearly interpolated order statistic; means of two doubles
  // are IEEE-identical, and rounding happens after.
  private val q35 = GraftQuery(
    "q35_exact_quartiles",
    (s, d) =>
      ev(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.25)"), 4).as("p25"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.75)"), 4).as("p75"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
      round(quantile_cont(value, 0.25), 4) AS p25,
      round(quantile_cont(value, 0.5), 4) AS p50,
      round(quantile_cont(value, 0.75), 4) AS p75
    FROM events GROUP BY event_type ORDER BY event_type"""))

  // --- q36: second-moment aggregates per group ------------------------
  private val q36 = GraftQuery(
    "q36_value_moments",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
      round(stddev_samp(l_quantity), 4) AS sd_qty,
      round(var_samp(l_discount), 6) AS var_disc,
      round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // --- q37: time-grid resample + LOCF gap-fill ------------------------
  // Regularize each event_type's value series onto a 15-minute grid:
  // bucket means where data exists, last-observation-carried-forward
  // where it doesn't (the classic sensor/metric resample). The grid is
  // generated per series from its own [min, max] bucket bounds
  // (sequence + explode — map-side), so no calendar table ships with
  // the query. LOCF is inherently sequential per series: the window
  // partitions by event_type, which is safe while series count ≥
  // cores; corpora with few huge series shard the window key by
  // (series, epoch-range) and stitch the chunk boundaries with a
  // second small join — the documented trade for all the engine's
  // ordered-repair operators (see CleanCsv).
  private val q37 = GraftQuery(
    "q37_resample_locf",
    (s, d) => {
      val bucketUs = 900000000L // 15 minutes
      // floor division, not DIV (truncation): pre-1970 timestamps have
      // negative micros, and the oracle's `//` floors — subtracting
      // pmod first makes the integer division exact floor on both signs
      // bucket means in EXACT e-6 integer units (the q21 migration
      // class, caught by the r13 sf1 parity sweep: `round(avg(value),
      // 4)` over a float sum flips at round boundaries once buckets
      // hold enough summands for the ulp dice to land on one; values
      // are exact cents, so the mean is an exact integer ratio and
      // round-half-away in pure integers matches on any engine)
      val means = ev(s, d)
        .select(col("event_type"),
          expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $bucketUs))" +
            s" DIV $bucketUs").as("b"),
          expr("CAST(round(value * 100) AS BIGINT)").as("_v2"))
        .groupBy("event_type", "b")
        .agg(sum(col("_v2")).as("_s"), count(lit(1)).as("_n"))
        .withColumn("v_obs_e6", expr(
          "CASE WHEN _s >= 0 THEN (_s * 20000 + _n) DIV (2 * _n)" +
            " ELSE -((-_s * 20000 + _n) DIV (2 * _n)) END"))
        .select(col("event_type"), col("b"), col("v_obs_e6"))
      val grid = means.groupBy("event_type")
        .agg(min("b").as("b0"), max("b").as("b1"))
        .select(col("event_type"), explode(sequence(col("b0"), col("b1"))).as("b"))
      val w = Window.partitionBy("event_type").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(means, Seq("event_type", "b"), "left")
        .withColumn("value_locf_e6",
          last(col("v_obs_e6"), ignoreNulls = true).over(w))
        .select(col("event_type"),
          date_format(timestamp_micros(col("b") * lit(bucketUs)),
            "yyyy-MM-dd HH:mm:ss").as("bucket_start"),
          col("value_locf_e6"),
          col("v_obs_e6").isNotNull.cast("int").as("observed"))
        .orderBy("event_type", "bucket_start")
    },
    Some("""WITH means AS (
        SELECT event_type, epoch_us(ts) // 900000000 AS b,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      m2 AS (
        SELECT event_type, b,
          CAST(CASE WHEN s >= 0 THEN (s * 20000 + n) // (2 * n)
            ELSE -((-s * 20000 + n) // (2 * n)) END AS BIGINT) AS v_obs_e6
        FROM means),
      bounds AS (
        SELECT event_type, min(b) AS b0, max(b) AS b1 FROM m2 GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(generate_series(b0, b1)) AS b FROM bounds),
      j AS (
        SELECT g.event_type, g.b, m.v_obs_e6 FROM grid g
        LEFT JOIN m2 m ON m.event_type = g.event_type AND m.b = g.b)
      SELECT event_type,
        strftime(make_timestamp(b * 900000000), '%Y-%m-%d %H:%M:%S')
          AS bucket_start,
        last_value(v_obs_e6 IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS UNBOUNDED PRECEDING) AS value_locf_e6,
        CAST(v_obs_e6 IS NOT NULL AS INT) AS observed
      FROM j ORDER BY event_type, bucket_start"""))

  // --- q38: event-type transition matrix (first-order Markov counts)
  //     lead() over each user's timeline, then a count per (from, to)
  //     pair — one window shuffle on user_id, one partial-agg shuffle
  //     on the pair (at most |types|² groups, trivially broadcastable
  //     downstream at any corpus size) -------------------------------
  private val q38 = GraftQuery(
    "q38_event_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH t AS (
        SELECT event_type AS from_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS to_type
        FROM events)
      SELECT from_type, to_type, count(*) AS n
      FROM t WHERE to_type IS NOT NULL
      GROUP BY 1, 2 ORDER BY from_type, to_type"""),
    bench = true)

  // --- q39: trailing 7-day rolling distinct users per day -------------
  // Rolling COUNT(DISTINCT) doesn't decompose into a window aggregate,
  // and the naive day-grid range join is O(days × rows) nested-loop.
  // Instead each (day, user) fact is exploded onto the ≤7 trailing
  // window ends it contributes to — a map-side 7× fan-out of NARROW
  // (date, id) pairs — and the distinct count is a plain hash
  // aggregate: linear work, one shuffle on (day, user), no range join
  // anywhere. Days with no events contribute no window of their own
  // (the grid is the observed days), matching the oracle's join.
  private val q39 = GraftQuery(
    "q39_rolling_distinct_users",
    (s, d) => {
      val daily = ev(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val contrib = daily.select(
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
        col("user_id"))
      val days = daily.select("day").distinct()
      contrib.groupBy("day")
        .agg(countDistinct(col("user_id")).as("users_7d"))
        .join(days, Seq("day")) // trailing windows past the last day drop
        .orderBy("day")
    },
    Some("""WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      days AS (SELECT DISTINCT day FROM daily)
      SELECT d.day, count(DISTINCT u.user_id) AS users_7d
      FROM days d JOIN daily u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day ORDER BY d.day"""))

  // --- q40: categorical distribution stats (deterministic mode +
  //     Shannon entropy) per group -------------------------------------
  // mode() in both engines breaks ties arbitrarily, so the modal value
  // is derived from the count table with an explicit (count DESC, value)
  // ranking instead — deterministic on both sides. Entropy sums over
  // the same count table. One partial-agg shuffle on (group, value) —
  // at most |groups|×|values| rows after it — then a broadcast-sized
  // window + re-agg; the raw table is touched once.
  private val q40 = GraftQuery(
    "q40_category_stats",
    (s, d) => {
      val counts = Tables(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("source"))
      val stats = counts
        .withColumn("_tot", sum(col("n")).over(Window.partitionBy(col("lang"))))
        .withColumn("_rk", row_number().over(w))
      stats.groupBy(col("lang"))
        .agg(
          max(when(col("_rk") === 1, col("source"))).as("modal_source"),
          sum(col("n")).as("n_docs"),
          round(-sum((col("n") / col("_tot")) *
            log2(col("n") / col("_tot"))) + lit(0.0), 6).as("source_entropy"))
        .orderBy("lang")
    },
    Some("""WITH counts AS (
        SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
      ranked AS (
        SELECT lang, source, n,
          sum(n) OVER (PARTITION BY lang) AS tot,
          row_number() OVER (PARTITION BY lang ORDER BY n DESC, source) AS rk
        FROM counts)
      SELECT lang,
        max(CASE WHEN rk = 1 THEN source END) AS modal_source,
        CAST(sum(n) AS BIGINT) AS n_docs,
        round(-sum((n / tot) * log2(n / tot)) + 0, 6) AS source_entropy
      FROM ranked GROUP BY lang ORDER BY lang"""))

  // --- q41: per-key event debounce (quiet-period chain heads) ---------
  // Telemetry dedup-in-time with QUIET-PERIOD semantics: rows whose
  // inter-arrival gap is < 10 minutes chain together, and only the
  // HEAD of each chain (the first row after a ≥10-minute quiet period)
  // is kept. Events at t=0, 6, 12 min form one chain — only t=0
  // survives, even though t=12 is ≥10 min after it. That is stricter
  // than distance-from-last-kept throttling (which would also keep
  // t=12) and stricter still than a plain lag() filter (which would
  // keep all three). Chains are found with a session-style pass: a
  // row starts a new chain iff its gap to the previous ROW is ≥ the
  // window. One window shuffle on the key.
  private val q41 = GraftQuery(
    "q41_event_debounce",
    (s, d) => {
      val winUs = 600L * 1000000L // 10 min in exact integer µs (q25's rule)
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      // anchor chains: a row starts a new debounce chain iff its gap to
      // the previous row ≥ window; within a chain (rows < window apart
      // in sequence), only the chain head is kept.
      val withGap = ev(s, d)
        .withColumn("_us", unix_micros(col("ts")))
        .withColumn("_prev", lag(col("_us"), 1).over(w))
        .withColumn("_new_chain",
          (col("_prev").isNull ||
            (col("_us") - col("_prev")) >= winUs).cast("long"))
      val withChain = withGap
        .withColumn("_chain", sum(col("_new_chain")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wc = Window.partitionBy(col("user_id"), col("event_type"), col("_chain"))
        .orderBy(col("ts"), col("event_id"))
      withChain
        .withColumn("_rn", row_number().over(wc))
        .filter(col("_rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (
        SELECT user_id, event_type, ts, event_id,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (
        SELECT *, CAST(sum(CASE WHEN prev IS NULL
              OR epoch_us(ts) - prev >= 600000000 THEN 1 ELSE 0 END) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chain
        FROM g),
      kept AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type, chain
            ORDER BY ts, event_id) AS rn
        FROM ch)
      SELECT event_type, count(*) AS n_kept
      FROM kept WHERE rn = 1
      GROUP BY event_type ORDER BY event_type"""))

  // --- q42: robust dispersion (median absolute deviation per group) ---
  // Outlier-resistant spread: MAD = median(|x − median(x)|), the robust
  // twin of q36's stddev. Two aggregate passes over the (small) group
  // medians: pass 1 computes each group's median (partial agg before
  // the group shuffle), the broadcast-sized result re-joins the facts
  // map-side, pass 2 medians the absolute deviations. Both engines
  // interpolate medians identically (q35's rule).
  private val q42 = GraftQuery(
    "q42_value_mad",
    (s, d) => {
      val med = ev(s, d).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("_med"))
      ev(s, d).join(broadcast(med), "event_type")
        .withColumn("_dev", abs(col("value") - col("_med")))
        .groupBy(col("event_type"))
        .agg(
          round(max(col("_med")), 4).as("median_value"),
          round(expr("percentile(_dev, 0.5)"), 4).as("mad"))
        .orderBy("event_type")
    },
    Some("""WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS m
        FROM events GROUP BY event_type)
      SELECT event_type,
        round(max(m), 4) AS median_value,
        round(quantile_cont(abs(value - m), 0.5), 4) AS mad
      FROM events JOIN med USING (event_type)
      GROUP BY event_type ORDER BY event_type"""))

  // --- q43: inter-arrival time distribution per key -------------------
  // The arrival-process profile (burstiness diagnosis): per event type,
  // quantiles of the gap between a user's consecutive events. One
  // window shuffle on (user, type) for the lag, then the same
  // interpolated quantiles as q35 over exact integer-µs gaps.
  private val q43 = GraftQuery(
    "q43_interarrival_quantiles",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("_us", unix_micros(col("ts")))
        .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(w))
        .filter(col("_gap").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_gaps"),
          round(expr("percentile(_gap, 0.5)"), 2).as("gap_p50_us"),
          round(expr("percentile(_gap, 0.9)"), 2).as("gap_p90_us"),
          max(col("_gap")).as("gap_max_us"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (
        SELECT event_type,
          epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
        FROM events)
      SELECT event_type, count(*) AS n_gaps,
        round(quantile_cont(gap, 0.5), 2) AS gap_p50_us,
        round(quantile_cont(gap, 0.9), 2) AS gap_p90_us,
        max(gap) AS gap_max_us
      FROM g WHERE gap IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""))

  // --- q44: first-seen accounting (new vs cumulative users per day) ---
  // Growth accounting over the event stream: a user's first-seen day,
  // daily new-user counts, and the cumulative registry size. Two
  // narrow shuffles — min-date per user (partial agg), then count per
  // day — and one window over the handful of day rows for the running
  // total (tiny by construction: one row per calendar day, so the
  // unpartitioned running-sum window is a non-issue at any corpus
  // scale).
  private val q44 = GraftQuery(
    "q44_new_users_daily",
    (s, d) => {
      val firstSeen = ev(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("day"))
      val daily = firstSeen.groupBy(col("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy("day")
    },
    Some("""WITH f AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
      daily AS (
        SELECT day, count(*) AS new_users FROM f GROUP BY 1)
      SELECT day, new_users,
        CAST(sum(new_users) OVER (ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM daily ORDER BY day"""))

  // --- q45: one-pass table profile ------------------------------------
  // The dataset-profiling utility every pipeline runs before training:
  // null counts, distinct cardinalities, ranges and means for a column
  // set, in ONE scan — a single multi-expression aggregate (Spark
  // plans the two exact distinct columns via one Expand, still one
  // pass over the files), no per-column jobs. At 100 TB swap the exact
  // distincts for approx_count_distinct and the plan loses the Expand.
  private val q45 = GraftQuery(
    "q45_table_profile",
    (s, d) =>
      Tables(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1).otherwise(0)).cast("long")
          .as("qty_nulls"),
        min(col("l_quantity")).as("qty_min"),
        max(col("l_quantity")).as("qty_max"),
        // whole-unit quantities → average in exact e-4 units (q21's
        // integer round-half-away); count(qty) not count(*) so a null
        // row can't shift the mean
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("_sq"),
        count(col("l_quantity")).as("_nq"),
        countDistinct(col("l_returnflag")).as("flag_distinct"),
        countDistinct(col("l_partkey")).as("part_distinct"),
        min(col("l_shipdate")).as("ship_min"),
        max(col("l_shipdate")).as("ship_max"))
        .withColumn("qty_avg_e4", expr(
          """CASE WHEN _sq >= 0 THEN (_sq * 20000 + _nq) DIV (2 * _nq)
             ELSE -(((-_sq) * 20000 + _nq) DIV (2 * _nq)) END"""))
        .drop("_sq", "_nq"),
    Some("""SELECT count(*) AS n_rows,
        CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS qty_nulls,
        min(l_quantity) AS qty_min,
        max(l_quantity) AS qty_max,
        CASE WHEN sum(CAST(round(l_quantity) AS BIGINT)) >= 0
          THEN (CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) * 20000
                + count(l_quantity)) // (2 * count(l_quantity))
          ELSE -((-CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) * 20000
                + count(l_quantity)) // (2 * count(l_quantity))) END
          AS qty_avg_e4,
        count(DISTINCT l_returnflag) AS flag_distinct,
        count(DISTINCT l_partkey) AS part_distinct,
        min(l_shipdate) AS ship_min,
        max(l_shipdate) AS ship_max
      FROM lineitem"""))

  // --- q46: contribution analytics (share-of-total, running share) ----
  // The BI staple pair of windows over a pre-aggregated frame: each
  // nation's revenue share of the total and the running cumulative
  // share in descending-revenue order (the Pareto curve). Both windows
  // run over the ALREADY-AGGREGATED per-nation rows (≤ #nations), so
  // the unpartitioned specs are bounded by construction — the heavy
  // lifting is the one partial-agg shuffle underneath.
  private val q46 = GraftQuery(
    "q46_revenue_contribution",
    (s, d) => {
      val li = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      // per-nation revenue in exact e-4 integers (see q03): the
      // absolute column hashes as an integer, and the share ratios
      // divide IDENTICAL exact ints on both engines, so the only
      // remaining round() risk is the measure-zero exact-boundary case
      val rev = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
            (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
            .cast("decimal(38,0)")).cast("long").as("_rev"))
      val wAll = Window.partitionBy()
      val wRun = Window.orderBy(col("_rev").desc, col("n_name"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev
        .withColumn("_tot", sum(col("_rev")).over(wAll))
        .select(col("n_name"),
          col("_rev").as("revenue_e4"),
          round(col("_rev").cast("double") / col("_tot"), 6).as("share"),
          round(sum(col("_rev")).over(wRun).cast("double") / col("_tot"), 6)
            .as("running_share"))
        .orderBy(col("revenue_e4").desc, col("n_name"))
    },
    Some("""WITH rev AS (
        SELECT n_name,
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name, r AS revenue_e4,
        round(CAST(r AS DOUBLE) / CAST(sum(r) OVER () AS DOUBLE), 6) AS share,
        round(CAST(sum(r) OVER (ORDER BY r DESC, n_name
            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
          / CAST(sum(r) OVER () AS DOUBLE), 6) AS running_share
      FROM rev ORDER BY revenue_e4 DESC, n_name"""))

  // --- q47: ranking-function parity in one frame ----------------------
  // rank / dense_rank / percent_rank / cume_dist over a DELIBERATELY
  // tie-heavy key (account balance rounded to thousands) — the four
  // functions disagree exactly on ties, so hash-matching all four in
  // one frame pins the tie semantics, not just the happy path. One
  // window shuffle on the nation key.
  private val q47 = GraftQuery(
    "q47_ranking_parity",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("_kilo").desc)
      Tables(s, d, "customer")
        .withColumn("_kilo", floor(col("c_acctbal") / 1000).cast("long"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("prnk", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .filter(col("c_nationkey") < 3)
        .select(col("c_custkey"), col("c_nationkey"), col("_kilo").as("kilo"),
          col("rnk"), col("drnk"), col("prnk"), col("cume"))
        .orderBy("c_nationkey", "kilo", "c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
        CAST(floor(c_acctbal / 1000) AS BIGINT) AS kilo,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        round(percent_rank() OVER w, 6) AS prnk,
        round(cume_dist() OVER w, 6) AS cume
      FROM customer
      WHERE c_nationkey < 3
      WINDOW w AS (PARTITION BY c_nationkey
        ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT) DESC)
      ORDER BY c_nationkey, kilo, c_custkey"""))

  // --- q48: rolling z-score anomaly flags -----------------------------
  // Streaming-style outlier detection done relationally: each event is
  // scored against the mean/std of its type's previous 20 events,
  // flagged when the 6-dp-rounded |z| clears the threshold. One
  // shuffle (the per-type window); at scale the partition key is
  // (type, coarse time bucket) to bound partition width — here types
  // are few and bounded.
  //
  // The whole score runs in EXACT integer arithmetic (two catches by
  // the r13 sf1 parity sweep): (1) the float form `avg(x²) − avg(x)²`
  // cancels catastrophically on near-constant windows, where
  // engine-side sum ordering turned ±1 ulp of noise into fabricated
  // |z| ≈ 16,000 rows that diverged across engines — with x in exact
  // cents an exactly-constant window now yields variance 0 and drops;
  // (2) even bit-identical z = N/√V hits the engine-defined round
  // boundary whenever V is a PERFECT SQUARE (z is then a terminating
  // decimal that can end in 5 at the round digit — one sf1 row did).
  // So the gate carries sign(z) and z² = N²/V — an exact integer
  // ratio — in round-half-away e-6 units, and the |z| > 2.5 cut
  // becomes the exact integer comparison z² > 6.25e6. Per-term bound:
  // 2·N²·10⁶ ≤ 2.6e18 at this corpus's ≤$560 values (int64 holds to
  // ~$21k cents; a wider value domain routes the product through
  // DECIMAL(38,0), the q01 treatment).
  private val q48 = GraftQuery(
    "q48_rolling_zscore",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)
      ev(s, d)
        .withColumn("_x2", expr("CAST(round(value * 100) AS BIGINT)"))
        .withColumn("_n", count(lit(1)).over(w))
        .withColumn("_s1", sum(col("_x2")).over(w))
        .withColumn("_s2", sum(col("_x2") * col("_x2")).over(w))
        .filter(col("_n") >= 10)
        .withColumn("_varnum", col("_n") * col("_s2") - col("_s1") * col("_s1"))
        .filter(col("_varnum") > 0)
        .withColumn("_nn", col("_x2") * col("_n") - col("_s1"))
        .withColumn("z_sign", signum(col("_nn")).cast("int"))
        .withColumn("z2_e6", expr(
          "(2 * _nn * _nn * 1000000 + _varnum) DIV (2 * _varnum)"))
        .filter(col("z2_e6") > 6250000L)
        .select(col("event_type"), col("event_id"), round(col("value"), 4).as("value"),
          col("z_sign"), col("z2_e6"))
        .orderBy("event_type", "event_id")
    },
    Some("""WITH e2 AS (
        SELECT event_type, event_id, ts, value,
          CAST(round(value * 100) AS BIGINT) AS x2
        FROM events),
      scored AS (
        SELECT event_type, event_id, value, x2,
          count(*) OVER w AS n,
          CAST(sum(x2) OVER w AS BIGINT) AS s1,
          CAST(sum(x2 * x2) OVER w AS BIGINT) AS s2
        FROM e2
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      z AS (
        SELECT event_type, event_id, value,
          CAST(sign(x2 * n - s1) AS INT) AS z_sign,
          CAST((2 * (x2 * n - s1) * (x2 * n - s1) * 1000000
              + (n * s2 - s1 * s1)) // (2 * (n * s2 - s1 * s1))
            AS BIGINT) AS z2_e6
        FROM scored
        WHERE n >= 10 AND n * s2 - s1 * s1 > 0)
      SELECT event_type, event_id, round(value, 4) AS value, z_sign, z2_e6
      FROM z WHERE z2_e6 > 6250000
      ORDER BY event_type, event_id"""),
    bench = true)

  // --- q49: native session-window aggregation ------------------------
  // The same 30-minute sessionization as q25, but through Spark's
  // built-in `session_window` aggregate instead of the lag+running-sum
  // window pair — one shuffle on user_id, no window sort pass, and the
  // identical code runs under Structured Streaming (the streaming twin
  // lives in StatefulOps.streamingSessionize, spec-pinned to this).
  // Semantics pinned by the oracle: a new session starts when the gap
  // is >= the window (Spark merges windows that OVERLAP; an event at
  // exactly prev_ts + gap does not overlap [prev_ts, prev_ts + gap)),
  // which differs from q25's strict `>` cut — both are asserted
  // against DuckDB so the boundary rule is documented by test, not
  // prose. window_span_us = end - start = last-event offset + gap by
  // construction, kept in the output to pin session_window's
  // end-extension semantics.
  private val q49 = GraftQuery(
    "q49_session_window",
    (s, d) => {
      val e = ev(s, d).withColumn("us", unix_micros(col("ts")))
      e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
          (unix_micros(col("sw.end")) - unix_micros(col("sw.start"))).as("window_span_us"))
        .orderBy("user_id", "start_us")
    },
    Some("""WITH t AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 OR
                    lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, us,
          CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
        FROM t)
      SELECT user_id, min(us) AS start_us, max(us) AS end_us,
        count(*) AS n_events,
        max(us) - min(us) + 1800000000 AS window_span_us
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, start_us"""),
    bench = true)

  // --- q50: lateral top-N per key -------------------------------------
  // Spark 4's Dataset.lateralJoin with a correlated, ordered, limited
  // subquery — the declarative "top 2 orders per customer" shape.
  // Catalyst decorrelates the per-row LIMIT into a ranked window under
  // the hood (no per-customer subquery execution), so the physical
  // plan is one join + one bounded window, not N scans — asserted in
  // PlanAssertionsSpec. DuckDB runs the same query with native LATERAL.
  private val q50 = GraftQuery(
    "q50_lateral_topn",
    (s, d) => {
      val c = cust(s, d).filter(col("c_custkey") < 200)
        .select(col("c_custkey"))
      val top2 = ord(s, d)
        .filter(col("o_custkey") === col("c_custkey").outer())
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(2)
        .select(col("o_orderkey"), col("o_totalprice"))
      c.lateralJoin(top2)
        .select(col("c_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total"))
        .orderBy("c_custkey", "o_orderkey")
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS total
      FROM (SELECT c_custkey FROM customer WHERE c_custkey < 200) c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c_custkey, o_orderkey"""))

  // --- q51: unpivot/melt wide measures to long form --------------------
  // Dataset.unpivot turns lineitem's four measure columns into
  // (measure, value) rows — the wide→long reshape every profiling /
  // plotting / per-measure-normalization step wants. Physically it is
  // a map-side Expand (each input row emits 4 narrow rows inside the
  // scan stage; no shuffle, no self-union of 4 scans — the shape that
  // matters when the wide table is 100 TB), followed by one ordinary
  // partial-agg'd groupBy on the 4-value measure key. The oracle
  // replays the reshape as the canonical UNION ALL.
  private val q51 = GraftQuery(
    "q51_unpivot_measures",
    (s, d) => {
      li(s, d)
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "measure",
          valueColumnName = "value")
        // exact integer units (the q21/r13-sf1 migration class): all
        // four measures are 2-decimal-quantized, so float sum/avg +
        // round is one corpus-size increase away from an
        // engine-defined boundary; totals ship as exact cents (through
        // DECIMAL(38,0) so 100 TB overflows loudly) and means as
        // round-half-away e-6 integers
        .withColumn("_v2", expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(col("_v2").cast("decimal(38,0)")).cast("long").as("total_c"))
        .withColumn("mean_e6",
          expr("(total_c * 20000 + n) DIV (2 * n)"))
        .select(col("measure"), col("n"), col("total_c"), col("mean_e6"))
        .orderBy("measure")
    },
    Some("""WITH long AS (
        SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value
          FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, 'l_extendedprice', l_extendedprice
          FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, 'l_discount', l_discount
          FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, 'l_tax', l_tax
          FROM lineitem WHERE l_linenumber = 1),
      c2 AS (
        SELECT measure, CAST(round(value * 100) AS BIGINT) AS v2
        FROM long)
      SELECT measure, count(*) AS n,
        CAST(sum(v2) AS BIGINT) AS total_c,
        (CAST(sum(v2) AS BIGINT) * 20000 + count(*)) // (2 * count(*))
          AS mean_e6
      FROM c2 GROUP BY measure ORDER BY measure"""))

  // --- q52: per-type daily OHLC (time-series candle aggregation) -------
  // The telemetry roll-up a metrics store serves: for each
  // (event_type, day), the first and last value by event time plus the
  // range extremes — open/high/low/close. min_by/max_by make the whole
  // candle ONE partial-agg'd exchange on the (type, day) key — no
  // window sort, no self-join; at 100 TB each map task forwards one
  // candle per (type, day) it saw. The ordering key is
  // [[graft.operators.TimestampStyles.eventOrderKey]] — the zero-padded
  // biased "epoch_us:event_id" string, which (a) makes endpoints
  // deterministic under timestamp ties and (b) is the composite-key
  // encoding BOTH engines order identically for any instant, pre-1970
  // included (the oracle's arg_min accepts no struct keys;
  // lexicographic order on fixed-width positive digits IS numeric
  // order). Output values are untouched source doubles (no float
  // arithmetic), so the gate hashes exactly.
  private val q52 = GraftQuery(
    "q52_event_ohlc",
    (s, d) => {
      val ord = graft.operators.TimestampStyles.eventOrderKey(col("ts"), col("event_id"))
      val e = ev(s, d).select(col("event_type"),
        to_date(col("ts")).as("day"), ord.as("_ord"), col("value"))
      e.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          min_by(col("value"), col("_ord")).as("open_value"),
          max_by(col("value"), col("_ord")).as("close_value"),
          min(col("value")).as("low"),
          max(col("value")).as("high"))
        .orderBy("event_type", "day")
    },
    Some("""SELECT event_type, CAST(ts AS DATE) AS day,
        count(*) AS n_events,
        arg_min(value, printf('%020d:%020d',
          epoch_us(ts) + 5000000000000000000, event_id)) AS open_value,
        arg_max(value, printf('%020d:%020d',
          epoch_us(ts) + 5000000000000000000, event_id)) AS close_value,
        min(value) AS low, max(value) AS high
      FROM events GROUP BY 1, 2 ORDER BY event_type, day"""),
    bench = true)

  // --- q53: activity streaks (gaps-and-islands) ------------------------
  // Engagement analytics no windowed aggregate expresses directly: per
  // user, consecutive-calendar-day activity runs. The classic
  // gaps-and-islands rewrite — distinct active days, then
  // date_sub(day, row_number) is constant within a run — needs ONE
  // exchange on user_id that the distinct, the window, and both
  // aggregations all reuse (no re-partition between steps; at 100 TB
  // the plan's only wide edge is that single user-keyed shuffle).
  private val q53 = GraftQuery(
    "q53_activity_streaks",
    (s, d) => {
      val days = ev(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val islands = days
        .withColumn("_anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("_anchor"))
        .agg(count(lit(1)).as("_len"))
      islands.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_streaks"),
          max(col("_len")).as("longest_streak"),
          sum(col("_len")).as("active_days"))
        .filter(col("longest_streak") >= 3)
        .orderBy("user_id")
    },
    Some("""WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      islands AS (
        SELECT user_id, anchor, count(*) AS len FROM (
          SELECT user_id,
            day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
              AS INTEGER) AS anchor
          FROM days)
        GROUP BY user_id, anchor)
      SELECT user_id, count(*) AS n_streaks,
        max(len) AS longest_streak, CAST(sum(len) AS BIGINT) AS active_days
      FROM islands GROUP BY user_id
      HAVING max(len) >= 3 ORDER BY user_id"""),
    bench = true)

  // --- q54: changelog compaction (latest state per key) ----------------
  // The upsert-compaction every table-format maintenance job runs:
  // treat events as a changelog and keep each user's latest row by
  // (ts, event_id) — max_by over the same zero-padded composite key as
  // q52, so ties are deterministic and the oracle's arg_max compares
  // the identical string. ONE partial-agg'd exchange on the key: each
  // map task forwards one candidate row per user it saw, which is the
  // shape that lets a 100 TB changelog compact into |keys| rows
  // without a window sort or self-join.
  private val q54 = GraftQuery(
    "q54_latest_state",
    (s, d) => {
      val ord = graft.operators.TimestampStyles.eventOrderKey(col("ts"), col("event_id"))
      ev(s, d).select(col("user_id"), col("event_type"), col("value"), ord.as("_ord"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_versions"),
          max_by(col("event_type"), col("_ord")).as("last_event_type"),
          max_by(col("value"), col("_ord")).as("last_value"),
          max(col("_ord")).as("_last"))
        .select(col("user_id"), col("n_versions"),
          col("last_event_type"), col("last_value"),
          (expr("cast(split(_last, ':')[0] as bigint)") -
            lit(graft.operators.TimestampStyles.OrderKeyBiasUs)).as("last_ts_us"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, count(*) AS n_versions,
        arg_max(event_type, printf('%020d:%020d',
          epoch_us(ts) + 5000000000000000000, event_id)) AS last_event_type,
        arg_max(value, printf('%020d:%020d',
          epoch_us(ts) + 5000000000000000000, event_id)) AS last_value,
        CAST(string_split(max(printf('%020d:%020d',
          epoch_us(ts) + 5000000000000000000, event_id)), ':')[1] AS BIGINT)
          - 5000000000000000000 AS last_ts_us
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // --- q55: funnel with per-step timeout -------------------------------
  // The product-analytics funnel as actually specified: each next step
  // must land within Δ (1 h here) of the previous step's FIRST
  // occurrence, not merely after it (q32's unbounded chain). Same
  // one-exchange shape as q32 — all three chained min-over-window
  // stages share the single user_id partition — with the timeout folded
  // into each window's predicate, plus per-stage conversion ppm. At
  // 100 TB this is still exactly one wide edge (the user-keyed
  // exchange); the funnel depth only adds window passes over the same
  // partitioning, never another shuffle.
  private val q55 = GraftQuery(
    "q55_funnel_timeout",
    (s, d) => {
      val hourUs = 3600L * 1000000L
      val wu = Window.partitionBy(col("user_id"))
      val staged = ev(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("v_us",
          min(when(col("event_type") === "view", col("us"))).over(wu))
        .withColumn("c_us",
          min(when(col("event_type") === "click" &&
            col("us") >= col("v_us") &&
            col("us") <= col("v_us") + hourUs, col("us"))).over(wu))
        .withColumn("p_us",
          min(when(col("event_type") === "purchase" &&
            col("us") >= col("c_us") &&
            col("us") <= col("c_us") + hourUs, col("us"))).over(wu))
        .groupBy(col("user_id"))
        .agg(max(col("v_us")).as("v_us"), max(col("c_us")).as("c_us"),
          max(col("p_us")).as("p_us"))
      staged
        .agg(count(col("v_us")).as("n_view"), count(col("c_us")).as("n_click"),
          count(col("p_us")).as("n_purchase"))
        // empty-stage guard: an empty previous stage means 0 ppm
        // conversion, not a division — Spark 4's ANSI mode makes the
        // unguarded divide a runtime error the moment a shape (the
        // r12 third-shape run: skewed event mix at sf0.001) empties a
        // funnel stage, and DuckDB would silently emit NaN/inf instead
        .select(expr("""stack(3,
            '1_view', n_view, CAST(1000000 AS BIGINT),
            '2_click', n_click,
              CAST(CASE WHEN n_view = 0 THEN 0
                ELSE round(n_click / n_view * 1e6) END AS BIGINT),
            '3_purchase', n_purchase,
              CAST(CASE WHEN n_click = 0 THEN 0
                ELSE round(n_purchase / n_click * 1e6) END AS BIGINT)
          ) AS (stage, n_users, conv_ppm)"""))
        .orderBy("stage")
    },
    Some("""WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT user_id, min(us) AS v_us FROM e
      WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.us) AS c_us FROM e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.us >= v.v_us
        AND e.us <= v.v_us + 3600000000 GROUP BY 1),
    p AS (SELECT e.user_id, min(e.us) AS p_us FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us >= c.c_us
        AND e.us <= c.c_us + 3600000000 GROUP BY 1),
    n AS (SELECT (SELECT count(*) FROM v) AS nv,
      (SELECT count(*) FROM c) AS nc, (SELECT count(*) FROM p) AS np)
    SELECT * FROM (
      SELECT '1_view' AS stage, nv AS n_users,
        CAST(1000000 AS BIGINT) AS conv_ppm FROM n
      UNION ALL SELECT '2_click', nc,
        CAST(CASE WHEN nv = 0 THEN 0
          ELSE round(nc / nv * 1e6) END AS BIGINT) FROM n
      UNION ALL SELECT '3_purchase', np,
        CAST(CASE WHEN nc = 0 THEN 0
          ELSE round(np / nc * 1e6) END AS BIGINT) FROM n)
    ORDER BY stage"""))

  // --- q56: peak concurrency (interval sweep) --------------------------
  // "How many sessions were active AT ONCE, at the worst moment of each
  // day" — the capacity-planning number a max-over-windowed-counts
  // approximation undercounts (bucketed counts miss peaks straddling
  // bucket edges). Exact sweep: each (user, day) activity interval
  // emits +1 at its start and −1 at its end, and the peak is the max
  // running sum in (us, delta DESC) order — delta DESC makes the
  // boundary inclusive (a session starting the instant another ends
  // overlaps it). Both engines use the default RANGE window frame, so
  // tie groups accumulate identically.
  //
  // Scale shape: the sweep never sees raw events — intervals come from
  // one (day, user) partial aggregate, and the swept stream is 2 rows
  // per session. The one wide edge is the day-keyed exchange; the
  // within-partition sort is over a day's session boundaries, not its
  // events. Peak-day skew is bounded by sessions/day; at 100 TB a
  // pathological day splits into a chunked two-phase sweep (per-chunk
  // sums, then a prefix over chunk totals) without changing the shape.
  private val q56 = GraftQuery(
    "q56_peak_concurrency",
    (s, d) => graft.operators.EventOps.peakConcurrencyDaily(ev(s, d)),
    Some("""WITH iv AS (
        SELECT CAST(ts AS DATE) AS day, user_id,
          min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events GROUP BY 1, 2),
      b AS (
        SELECT day, lo AS us, 1 AS delta FROM iv
        UNION ALL
        SELECT day, hi, -1 FROM iv),
      r AS (
        SELECT day, sum(delta) OVER (
          PARTITION BY day ORDER BY us, delta DESC) AS running
        FROM b)
      SELECT day, CAST(max(running) AS BIGINT) AS peak_concurrent,
        CAST(count(*) / 2 AS BIGINT) AS n_sessions
      FROM r GROUP BY day ORDER BY day"""),
    bench = true)

  // --- q57: SCD2 interval construction (changelog → history table) -----
  // The warehouse dimension-history build: collapse each user's
  // event_type stream into versioned [valid_from, valid_to) rows —
  // version N's valid_to is version N+1's valid_from, the current
  // state stays open (NULL valid_to). Gaps-and-islands via the
  // change-flag running sum; run boundaries use the (ts, event_id)
  // total order so same-microsecond events can't make run membership
  // engine-dependent. Distinct from q38 (transition COUNTS) and q53
  // (presence streaks): this materializes the interval table itself.
  //
  // Scale shape: ONE user-keyed exchange serves all three stages —
  // the change-detect window sorts within user, the (user, version)
  // aggregate reuses the partitioning (subset-key clustering), and
  // the closing lead() re-sorts the already-collapsed run rows. The
  // 100 TB changelog compacts to |runs| rows before the only
  // per-version pass. Bounded to 20 users: the gate hashes the full
  // interval TABLE, not a summary, so output stays inspection-sized.
  private val q57 = GraftQuery(
    "q57_scd2_intervals",
    (s, d) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val prev = lag(col("event_type"), 1).over(wOrd)
      val runs = ev(s, d).filter(col("user_id") < 20)
        .withColumn("_chg",
          when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("version", sum(col("_chg")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val iv = runs.groupBy(col("user_id"), col("version"))
        .agg(min(col("event_type")).as("state"),
          min(unix_micros(col("ts"))).as("valid_from_us"),
          count(lit(1)).as("n_events"))
      val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
      iv.withColumn("valid_to_us",
          lead(col("valid_from_us"), 1).over(wv))
        .select(col("user_id"), col("version"), col("state"),
          col("valid_from_us"), col("valid_to_us"), col("n_events"))
        .orderBy("user_id", "version")
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events WHERE user_id < 20),
      r AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
            OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      v AS (
        SELECT *, sum(chg) OVER (PARTITION BY user_id
          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS version
        FROM r),
      iv AS (
        SELECT user_id, version, min(event_type) AS state,
          min(us) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
        FROM v GROUP BY 1, 2)
      SELECT user_id, CAST(version AS BIGINT) AS version, state,
        valid_from_us,
        lead(valid_from_us) OVER (
          PARTITION BY user_id ORDER BY version) AS valid_to_us,
        n_events
      FROM iv ORDER BY user_id, version"""),
    bench = true)

  // --- q58: semi-structured props via VariantType ----------------------
  // The Spark-4-native path for schema-on-read JSON: q16 regex/
  // get_json_object-extracts the props string per access; this parses
  // it ONCE into the binary Variant encoding and does typed
  // `variant_get` field access — the representation a lakehouse keeps
  // semi-structured columns in so repeated field reads never re-parse
  // text. try_-variants keep the pipeline total (malformed JSON or a
  // missing/mistyped field lands in n_bad, never a task failure — the
  // contract a 100 TB ingest needs). Map-side parse+extract, one
  // event_type-keyed aggregate.
  private val q58 = GraftQuery(
    "q58_variant_props",
    (s, d) => {
      val k = try_variant_get(try_parse_json(col("props")), "$.k", "int")
      ev(s, d).select(col("event_type"), k.as("_k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("_k")).as("n_with_k"),
          (count(lit(1)) - count(col("_k"))).as("n_bad"),
          min(col("_k")).as("min_k"),
          max(col("_k")).as("max_k"),
          sum(col("_k").cast("long")).as("sum_k"),
          count(col("_k")).as("_nk"))
        // integer k → average in exact e-6 units (q21's signed integer
        // round-half-away); round(avg(int), 6) is engine-defined when
        // sum_k/n lands on a .0000005 boundary
        .withColumn("avg_k_e6", expr(
          """CASE WHEN _nk = 0 THEN NULL
             WHEN sum_k >= 0 THEN (sum_k * 2000000 + _nk) DIV (2 * _nk)
             ELSE -(((-sum_k) * 2000000 + _nk) DIV (2 * _nk)) END"""))
        .drop("_nk")
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
        count(*) AS n_events,
        count(TRY_CAST(props->>'$.k' AS INTEGER)) AS n_with_k,
        count(*) - count(TRY_CAST(props->>'$.k' AS INTEGER)) AS n_bad,
        min(TRY_CAST(props->>'$.k' AS INTEGER)) AS min_k,
        max(TRY_CAST(props->>'$.k' AS INTEGER)) AS max_k,
        CAST(sum(TRY_CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
        CASE WHEN count(TRY_CAST(props->>'$.k' AS INTEGER)) = 0 THEN NULL
          WHEN sum(TRY_CAST(props->>'$.k' AS INTEGER)) >= 0
          THEN (CAST(sum(TRY_CAST(props->>'$.k' AS INTEGER)) AS BIGINT) * 2000000
                + count(TRY_CAST(props->>'$.k' AS INTEGER)))
               // (2 * count(TRY_CAST(props->>'$.k' AS INTEGER)))
          ELSE -((-CAST(sum(TRY_CAST(props->>'$.k' AS INTEGER)) AS BIGINT) * 2000000
                + count(TRY_CAST(props->>'$.k' AS INTEGER)))
               // (2 * count(TRY_CAST(props->>'$.k' AS INTEGER)))) END
          AS avg_k_e6
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // --- q59: first-/last-touch purchase attribution ---------------------
  // The marketing-attribution split q32's funnel doesn't answer: for
  // each purchase, WHICH channel gets credit — the user's first
  // pre-purchase event (first-touch) or their most recent one
  // (last-touch)? Both models from the same two IGNORE NULLS windows
  // over the (ts, event_id) total order; purchases with no preceding
  // touch credit 'direct'. Values aggregate in exact integer cents
  // (round(value·100) per event), so no float summation order can
  // shift a total. One user-keyed exchange serves both windows; the
  // attribution aggregate is over |purchases| narrow rows.
  private val q59 = GraftQuery(
    "q59_touch_attribution",
    (s, d) => {
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val p = ev(s, d)
        .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
        .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          coalesce(col("first_touch"), lit("direct")).as("fch"),
          coalesce(col("last_touch"), lit("direct")).as("lch"),
          round(col("value") * 100).cast("long").as("cents"))
      val byFirst = p.groupBy(col("fch").as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("sum_value_cents"))
        .withColumn("model", lit("first"))
      val byLast = p.groupBy(col("lch").as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("sum_value_cents"))
        .withColumn("model", lit("last"))
      byFirst.unionByName(byLast)
        .select("model", "channel", "n_purchases", "sum_value_cents")
        .orderBy("model", "channel")
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
        FROM events),
      t AS (
        SELECT *,
          first_value(CASE WHEN event_type <> 'purchase'
            THEN event_type END IGNORE NULLS) OVER w AS first_touch,
          last_value(CASE WHEN event_type <> 'purchase'
            THEN event_type END IGNORE NULLS) OVER w AS last_touch
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      p AS (
        SELECT coalesce(first_touch, 'direct') AS fch,
          coalesce(last_touch, 'direct') AS lch,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM t WHERE event_type = 'purchase')
      SELECT * FROM (
        SELECT 'first' AS model, fch AS channel, count(*) AS n_purchases,
          CAST(sum(cents) AS BIGINT) AS sum_value_cents
        FROM p GROUP BY 2
        UNION ALL
        SELECT 'last', lch, count(*), CAST(sum(cents) AS BIGINT)
        FROM p GROUP BY 2)
      ORDER BY model, channel"""))

  // --- q60: daily percentile trend with day-over-day delta -------------
  // The SLO dashboard shape: exact P50/P95 of value per day (q35's
  // interpolated order statistic at daily grain) plus the
  // day-over-day P50 delta — the "did the median move" number an
  // on-call reads first. The trend lag runs over the already-
  // aggregated ~31-row day table (a single tiny partition by then);
  // the corpus-sized work is one day-keyed percentile aggregate.
  // Deltas subtract the ROUNDED p50s, so the difference is parity-
  // exact; the first day's delta is NULL by contract.
  private val q60 = GraftQuery(
    "q60_daily_percentile_trend",
    (s, d) => {
      val daily = ev(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
      val w = Window.orderBy(col("day"))
      daily
        .withColumn("dod_p50",
          round(col("p50") - lag(col("p50"), 1).over(w), 4))
        .orderBy("day")
    },
    Some("""WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
          round(quantile_cont(value, 0.5), 4) AS p50,
          round(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY 1)
      SELECT day, n_events, p50, p95,
        round(p50 - lag(p50) OVER (ORDER BY day), 4) AS dod_p50
      FROM daily ORDER BY day"""))

  // --- q61: fulfillment latency by order priority ----------------------
  // The order-to-ship SLA analytic (the TPC-H Q12 question restated
  // over the driver's slim columns): per priority, how long from
  // order to line shipment — exact integer day diffs feed count/avg/
  // P50/P95 and a >90-day late share in ppm. The kernel lives in
  // ScaleOps.shipLatencyByPriority: the join is the fact-fact
  // lineitem ⋈ orders edge, and the PROMOTED 100 TB plan runs the
  // identical aggregation over ScaleOps.writeBucketed tables with
  // zero exchange on either join side (ScaleOpsSpec pins that plan
  // and result-equality with this entry). At the gate's test SF the
  // orders side is dimension-sized and AQE broadcasts it.
  private val q61 = GraftQuery(
    "q61_ship_latency",
    (s, d) => graft.operators.ScaleOps.shipLatencyByPriority(
      li(s, d), ord(s, d)),
    Some("""WITH j AS (
        SELECT o_orderpriority,
          CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      SELECT o_orderpriority, count(*) AS n_lines,
        CASE WHEN sum(days) >= 0
          THEN (CAST(sum(days) AS BIGINT) * 20000 + count(*)) // (2 * count(*))
          ELSE -((-CAST(sum(days) AS BIGINT) * 20000 + count(*)) // (2 * count(*)))
        END AS avg_days_e4,
        round(quantile_cont(days, 0.5), 4) AS p50_days,
        round(quantile_cont(days, 0.95), 4) AS p95_days,
        (CAST(sum(CASE WHEN days > 90 THEN 1 ELSE 0 END) AS BIGINT) * 2000000
          + count(*)) // (2 * count(*)) AS late_ppm
      FROM j GROUP BY 1 ORDER BY 1"""))

  // --- q62: national market share within a region (TPC-H Q8 shape) ----
  // Per order year, the share of PROMO-part revenue sold into EUROPE
  // customers that NATION_3's suppliers captured — the five-way
  // dim-join + conditional-aggregate plan every BI "share of market"
  // question compiles to. 100 TB shape: part/customer/supplier/nation/
  // region are all dimension-sized and explicitly broadcast, so the
  // only shuffled rows are the surviving lineitem ⋈ orders fact edge,
  // and the share needs no second pass — numerator and denominator are
  // one conditional aggregate over the same rows. Revenue goes through
  // exact integer cents (price and discount are hundredths, so
  // round(price·(1−disc)·100) is parity-stable) and the share is ppm
  // over BIGINT sums, so the gate is float-drift-free.
  private val q62 = GraftQuery(
    "q62_market_share",
    (s, d) => {
      val promo = broadcast(part(s, d)
        .filter(col("p_type") === "PROMO").select("p_partkey"))
      val euroCust = broadcast(cust(s, d)
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey"))
      val suppNation = broadcast(supp(s, d)
        .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      li(s, d)
        .join(promo, col("l_partkey") === col("p_partkey"))
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(euroCust, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .withColumn("rev_cents", expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("rev_cents"))
            .otherwise(lit(0L))).as("nation_cents"),
          sum(col("rev_cents")).as("total_cents"))
        .withColumn("share_ppm", expr(
          "CAST(round(nation_cents * 1e6 / total_cents) AS BIGINT)"))
        .orderBy("o_year")
    },
    Some("""WITH j AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          n2.n_name AS supp_nation,
          CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
            AS rev_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey),
      agg AS (
        SELECT o_year,
          CAST(sum(CASE WHEN supp_nation = 'NATION_3'
            THEN rev_cents ELSE 0 END) AS BIGINT) AS nation_cents,
          CAST(sum(rev_cents) AS BIGINT) AS total_cents
        FROM j GROUP BY 1)
      SELECT o_year, nation_cents, total_cents,
        CAST(round(nation_cents * 1e6 / total_cents) AS BIGINT) AS share_ppm
      FROM agg ORDER BY o_year"""),
    bench = true)

  // --- q63: suppliers who kept orders waiting (TPC-H Q21 shape) -------
  // The textbook Q21 plan is lineitem EXISTS-self-join NOT-EXISTS-self-
  // join — three fact-fact joins on l_orderkey. At 100 TB that is three
  // full-fact exchanges and two of them carry the whole lineitem table
  // twice. This implementation is the aggregate REWRITE of the same
  // semantics: per (order, supplier) collapse lateness once, then per
  // order count suppliers / late-suppliers and keep the orders where
  // exactly ONE supplier was late among ≥2 — which IS "another supplier
  // exists AND no other supplier was late". Two narrowing exchanges
  // (orderkey+suppkey, then orderkey over already-collapsed rows), zero
  // self-joins; supplier names come from a broadcast dim at the end.
  // Lateness = shipped >75 days after order date (this testdata has no
  // receipt/commit dates); 'F' status mirrors Q21's finished-order scope.
  private val q63 = GraftQuery(
    "q63_waiting_suppliers",
    (s, d) => {
      val late = when(
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"),
        lit(1)).otherwise(lit(0))
      val perPair = li(s, d)
        .join(ord(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(late).as("supp_late"))
      val perOrd = perPair
        .groupBy("l_orderkey")
        .agg(
          count(lit(1)).as("n_supp"),
          sum("supp_late").cast("long").as("n_late"),
          max(when(col("supp_late") === 1, col("l_suppkey"))).as("s_suppkey"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
      perOrd
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(supp(s, d).select("s_suppkey", "s_name")), "s_suppkey")
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    },
    Some("""WITH j AS (
        SELECT l_orderkey, l_suppkey,
          CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
            THEN 1 ELSE 0 END AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'),
      per_pair AS (
        SELECT l_orderkey, l_suppkey, max(late) AS supp_late
        FROM j GROUP BY 1, 2),
      per_ord AS (
        SELECT l_orderkey, count(*) AS n_supp,
          CAST(sum(supp_late) AS BIGINT) AS n_late,
          max(CASE WHEN supp_late = 1 THEN l_suppkey END) AS s_suppkey
        FROM per_pair GROUP BY 1)
      SELECT o.s_suppkey AS s_suppkey, s_name, count(*) AS numwait
      FROM per_ord o JOIN supplier ON o.s_suppkey = supplier.s_suppkey
      WHERE n_supp >= 2 AND n_late = 1
      GROUP BY 1, 2
      ORDER BY numwait DESC, o.s_suppkey
      LIMIT 20"""),
    bench = true)

  // --- q64: dormant high-balance customers (TPC-H Q22 shape) ----------
  // Who holds above-average account balance but hasn't ordered since
  // the cutoff — the win-back-campaign list. The Q22 plan shape on
  // this schema (every customer here has SOME order, so plain
  // "no orders ever" is degenerate): a 1-row scalar aggregate
  // broadcast (global avg positive balance) filters customers
  // map-side, then a LEFT ANTI join against the date-filtered orders
  // — the date predicate pushes to the parquet scan, so at 100 TB the
  // anti join's build side is only the recent slice, never order
  // history. Balance goes through exact integer cents per q62's rule —
  // INCLUDING the above-average gate: `cents·n > Σcents` in integers,
  // because a float `bal > avg(bal)` threshold is partition-order
  // dependent (Spark's double summation) and engine dependent (DuckDB
  // accumulates differently), so a balance within an ulp of the mean
  // could flip the gate nondeterministically. cents ≤ 1e6 and the
  // product needs n > 9e12 customers to overflow Long — safe.
  private val q64 = GraftQuery(
    "q64_dormant_customers",
    (s, d) => {
      val avgBal = cust(s, d).filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("_n_pos"),
          sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
            .as("_sum_pos_cents"))
      val recent = ord(s, d)
        .filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
        .select(col("o_custkey"))
      cust(s, d)
        .crossJoin(broadcast(avgBal)) // 1-row scalar broadcast
        .filter(expr("CAST(round(c_acctbal * 100) AS BIGINT)")
          * col("_n_pos") > col("_sum_pos_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
            .as("totacctbal_cents"))
        .withColumn("totacctbal_cents", col("totacctbal_cents").cast("long"))
        .orderBy("n_name")
    },
    Some("""WITH ab AS (
        SELECT count(*) AS n,
          CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s
        FROM customer WHERE c_acctbal > 0)
      SELECT n_name, count(*) AS numcust,
        CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
          AS totacctbal_cents
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM ab)
          > (SELECT s FROM ab)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY 1 ORDER BY 1"""))

  // --- q65: revenue concentration — Lorenz deciles + Gini -------------
  // "How concentrated is our revenue?" — the per-customer revenue
  // distribution as a Lorenz table (decile → revenue share, cumulative
  // share) plus the Gini coefficient via the rank formula
  // G = 2·Σ((rank+1)·x) / (n·Σx) − (n+1)/n. The rank is the part that
  // does not scale naively: per-customer revenue grows with the
  // corpus, so ranking it is NOT in the tiny-post-aggregate-window
  // class — it goes through [[graft.operators.ScaleOps
  // .globalRankByRange]] (range partitions + in-range window + bounded
  // offset collect), never a single-partition sort. Revenue is exact
  // integer cents (q62's rule); rank/decile arithmetic is exact
  // integer on both engines; the only doubles are the final share and
  // Gini divisions, identical IEEE ops on both sides. The 10-row
  // cumulative window sits above the decile aggregate (the lint's
  // bounded-subtree waiver).
  private val q65 = GraftQuery(
    "q65_revenue_lorenz",
    (s, d) => {
      val rev = ord(s, d).groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("rev_cents"))
        .withColumn("rev_cents", col("rev_cents").cast("long"))
      val ranked = graft.operators.ScaleOps.globalRankByRange(
        rev, Seq(col("rev_cents"), col("o_custkey")), nRanges = 32)
      // _w in DECIMAL(38,0): (rank+1)·cents is Long×Long that wraps past
      // 9.2e18 at roughly rank 1e7 × cents 1e8 — exactly the corpus
      // sizes this query exists for. Spark (non-ANSI) would wrap
      // SILENTLY; decimal keeps the sum exact to 38 digits and the only
      // subsequent use is one cast to double for the Gini division.
      val tot = ranked.agg(
        count(lit(1)).as("_n"),
        sum(col("rev_cents")).as("_t"),
        sum((col("grank") + 1).cast("decimal(38,0)") * col("rev_cents"))
          .as("_w"))
      val dec = ranked.crossJoin(broadcast(tot)) // 1-row scalar broadcast
        .withColumn("decile", expr("grank * 10 div _n") + 1)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev_cents")).cast("long").as("revenue_cents"),
          first(col("_n")).as("_n"), first(col("_t")).as("_t"),
          first(col("_w")).as("_w"))
      val cum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec
        .withColumn("share",
          round(col("revenue_cents").cast("double") / col("_t"), 6))
        .withColumn("cum_share",
          round(sum(col("revenue_cents")).over(cum).cast("double")
            / col("_t"), 6))
        .withColumn("gini",
          // n·t likewise overflows Long (n 1e7 × t 1e15); divide in
          // double — both engines cast the same exact integers, so the
          // IEEE ops match bit-for-bit
          round(lit(2.0) * col("_w").cast("double")
            / (col("_n").cast("double") * col("_t").cast("double"))
            - (col("_n") + lit(1.0)) / col("_n"), 6))
        .select("decile", "n_customers", "revenue_cents", "share",
          "cum_share", "gini")
        .orderBy("decile")
    },
    Some("""WITH rev AS (
        SELECT o_custkey,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS rev_cents
        FROM orders GROUP BY 1),
      rk AS (
        SELECT o_custkey, rev_cents,
          row_number() OVER (ORDER BY rev_cents, o_custkey) - 1 AS grank
        FROM rev),
      tot AS (
        SELECT count(*) AS n, CAST(sum(rev_cents) AS BIGINT) AS t,
          sum(CAST(grank + 1 AS HUGEINT) * rev_cents) AS w
        FROM rk),
      dec AS (
        SELECT (grank * 10) // n + 1 AS decile, count(*) AS n_customers,
          CAST(sum(rev_cents) AS BIGINT) AS revenue_cents
        FROM rk, tot GROUP BY 1)
      SELECT decile, n_customers, revenue_cents,
        round(revenue_cents::DOUBLE / t, 6) AS share,
        round(CAST(sum(revenue_cents) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          ::DOUBLE / t, 6) AS cum_share,
        round(2.0 * CAST(w AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
          - (n + 1.0) / n, 6) AS gini
      FROM dec, tot ORDER BY decile"""),
    bench = true)

  // --- q66: repeat-purchase intervals by market segment ----------------
  // Customer-lifecycle cadence: for every consecutive order pair of the
  // same customer, the gap, rolled up per market segment. The per-key
  // lag window partitions by o_custkey — embarrassingly parallel at
  // any scale (each customer's history sorts inside its own hash
  // partition; no global ordering anywhere). Gaps are exact integer
  // seconds (timezone-free because the two epoch reads cancel);
  // avg/median divide once at the end. The customer dimension joins
  // AFTER the per-customer gap extraction, so only (custkey, gap)
  // pairs — never full order rows — reach the segment join.
  private val q66 = GraftQuery(
    "q66_repeat_interval",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = ord(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("_prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("_prev").isNotNull)
        .select(col("o_custkey"),
          (unix_timestamp(col("o_orderdate"))
            - unix_timestamp(col("_prev"))).as("gap_s"))
      gaps
        .join(cust(s, d).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        // date-diff gaps are whole days (86400 s multiples), so the
        // mean goes out in exact e-4-day units via integer
        // round-half-away — round(avg(int)/86400, 4) is engine-defined
        // on a .00005 boundary. The quantile/max stay rounded doubles:
        // quantile_cont interpolates at j/20 over whole-day values, so
        // its true value terminates ≥2 digits before the boundary.
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_s")).as("_ss"),
          round(expr("percentile(gap_s, 0.5)") / 86400d, 4)
            .as("p50_gap_days"),
          round(max(col("gap_s")) / lit(86400d), 4).as("max_gap_days"))
        .withColumn("avg_gap_days_e4",
          expr("(_ss * 20000 + 86400 * n_gaps) DIV (2 * 86400 * n_gaps)"))
        .select(col("c_mktsegment"), col("n_gaps"), col("avg_gap_days_e4"),
          col("p50_gap_days"), col("max_gap_days"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH gaps AS (
        SELECT o_custkey,
          date_diff('second',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS gap_s
        FROM orders)
      SELECT c_mktsegment, count(*) AS n_gaps,
        (CAST(sum(gap_s) AS BIGINT) * 20000 + 86400 * count(*))
          // (2 * 86400 * count(*)) AS avg_gap_days_e4,
        round(quantile_cont(gap_s, 0.5) / 86400, 4) AS p50_gap_days,
        round(max(gap_s) / 86400.0, 4) AS max_gap_days
      FROM gaps JOIN customer ON o_custkey = c_custkey
      WHERE gap_s IS NOT NULL
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // --- q67: market-basket part affinity (co-occurrence lift) -----------
  // Which part pairs land in the same order far more often than chance
  // — the classic association-rule screen, kept to the top-20 by lift.
  // Scale shape: the pair generation is a SELF-JOIN ON THE ORDER KEY
  // (co-partitioned fact-fact — at 100 TB both sides arrive bucketed
  // on orderkey per [[graft.operators.ScaleOps.writeBucketed]] and the
  // join runs exchange-free; pair fan-out is bounded by per-order
  // basket size, never corpus²). Part supports and the order total are
  // aggregates of the same deduped (order, part) frame; lift is exact
  // integer products divided once. The support≥2 floor cuts the
  // singleton-pair noise before the lift join.
  private val q67 = GraftQuery(
    "q67_basket_lift",
    (s, d) => {
      // op feeds FOUR consumers (the pair self-join's two sides via
      // basketPairs, the per-part support counts, and the
      // distinct-order total); NOT operator-cached, measured (r15):
      // exchange reuse dedups the repeated distinct's shuffle, and
      // caching it was measured slower (2.06→2.73 s at sf0.1)
      val op = li(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // pair generation via ScaleOps.basketPairs, whose optional
      // maxBasketSize cap bounds per-key fan-out on untrusted
      // basket-size distributions; default None here — TPC-H baskets
      // are ≤7 items and the gated semantics stay exact.
      // assumeDistinct: op IS the deduped frame, so the operator's
      // internal distinct would re-shuffle it to remove nothing
      val co = graft.operators.ScaleOps
        .basketPairs(op, "ok", "pk", assumeDistinct = true)
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("co_orders"))
        .filter(col("co_orders") >= 2)
      val sup = op.groupBy(col("pk")).agg(count(lit(1)).as("n"))
      val totO = op.agg(countDistinct(col("ok")).as("_o"))
      co
        .join(sup.select(col("pk").as("part_a"), col("n").as("n_a")), "part_a")
        .join(sup.select(col("pk").as("part_b"), col("n").as("n_b")), "part_b")
        .crossJoin(broadcast(totO)) // 1-row scalar broadcast
        .withColumn("lift",
          round((col("co_orders") * col("_o")).cast("double")
            / (col("n_a") * col("n_b")), 6))
        .select("part_a", "part_b", "co_orders", "n_a", "n_b", "lift")
        .orderBy(col("lift").desc, col("part_a"), col("part_b"))
        .limit(20)
    },
    Some("""WITH op AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      sup AS (SELECT pk, count(*) AS n FROM op GROUP BY 1),
      o AS (SELECT count(DISTINCT ok) AS t FROM op),
      co AS (
        SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS co_orders
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT part_a, part_b, co_orders, na.n AS n_a, nb.n AS n_b,
        round(CAST(co_orders * t AS BIGINT)::DOUBLE / (na.n * nb.n), 6)
          AS lift
      FROM co
      JOIN sup na ON na.pk = part_a
      JOIN sup nb ON nb.pk = part_b, o
      ORDER BY lift DESC, part_a, part_b LIMIT 20"""),
    bench = true)

  // --- q68: domain-authority PageRank over the crawl link graph -------
  // The curation signal web corpora weight quality by. The graph is
  // derived from closed forms over doc_id (both engines build the
  // SAME distinct edge set from the documents table), and the kernel
  // is [[graft.operators.GraphOps.pageRank]] — one shuffle per
  // iteration, rank frame localCheckpoint-ed so the loop's plan stays
  // linear. The oracle UNROLLS the 10 damped iterations as chained
  // CTEs (the v35 trajectory precedent): no spectral shortcut, every
  // intermediate sum replayed. Ranks are continuous (divisions by a
  // prime node count, damping products), so round(…, 6) is in the
  // measure-zero class — gated as an exact hash like every q-query.
  private val q68 = GraftQuery(
    "q68_domain_pagerank",
    (s, d) => {
      val id = col("doc_id")
      val src = (id % 331).as("src")
      val dst = when(id % 2 === 0, (id % 331) * 7 + 3)
        .otherwise((id % 331) * 11 + 5) % 331
      val edges = Tables(s, d, "documents")
        .select(src, dst.as("dst")).distinct()
      graft.operators.GraphOps.pageRank(s, edges, "src", "dst", 10, 0.85)
        .select(col("node"), round(col("r"), 6).as("pr6"))
        .orderBy("node")
    },
    Some {
      val step = (k: Int) => s"""
      p$k AS (
        SELECT nd.node,
          (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
            + CAST(0.85 AS DOUBLE) * coalesce(c.cin, CAST(0 AS DOUBLE)) AS r
        FROM nodes nd CROSS JOIN nn
        LEFT JOIN (
          SELECT e.dst AS node, sum(p.r / od.deg) AS cin
          FROM p${k - 1} p
          JOIN od ON p.node = od.src
          JOIN e ON e.src = p.node
          GROUP BY e.dst) c ON c.node = nd.node)"""
      """WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 331 AS src,
          (CASE WHEN doc_id % 2 = 0 THEN (doc_id % 331) * 7 + 3
                ELSE (doc_id % 331) * 11 + 5 END) % 331 AS dst
        FROM documents),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT count(*) AS n FROM nodes),
      od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      p0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),""" +
        (1 to 10).map(step).mkString(",") + """
      SELECT node, round(r, 6) AS pr6 FROM p10 ORDER BY node"""
    },
    bench = true)

  // --- q69: HITS hubs & authorities over a richer link graph ---------
  // The complementary link-quality signal to q68's PageRank: hub and
  // authority scores from [[graft.operators.GraphOps.hits]] (L1
  // normalization FOLDED out of the loop since r13 — iterations run
  // unnormalized, the read-time divide is a ratio of plain sums, no
  // sqrt, so the 6 iterations SQL-replay exactly like q68's). The
  // graph here is a different closed form (mod-293 residues, three
  // out-link rules keyed on doc_id % 3) so the two graph queries
  // don't share a fixture shape. Scores are continuous (L1 totals are
  // messy sums), so round(…, 6) is in the measure-zero class.
  private val q69 = GraftQuery(
    "q69_hits_authority",
    (s, d) => {
      val res = col("doc_id") % 293
      val dst = when(col("doc_id") % 3 === 0, (res * 2 + 1) % 293)
        .when(col("doc_id") % 3 === 1, (res * 3 + 7) % 293)
        .otherwise((res * 5 + 11) % 293)
      val edges = Tables(s, d, "documents")
        .select(res.as("src"), dst.as("dst")).distinct()
      graft.operators.GraphOps.hits(s, edges, "src", "dst", 6)
        .select(col("node"), round(col("auth"), 6).as("auth6"),
          round(col("hub"), 6).as("hub6"))
        .orderBy("node")
    },
    Some {
      // normalization folded out of the iteration exactly like the
      // operator: unnormalized sparse half-steps, one L1 divide at
      // read time (linearity makes the per-round rescale a scalar —
      // the normalized fixed direction is identical)
      val step = (k: Int) => s"""
      ar$k AS MATERIALIZED (
        SELECT e.dst AS node, sum(h.hub) AS ar
        FROM h${k - 1} h JOIN e ON e.src = h.node GROUP BY e.dst),
      h$k AS MATERIALIZED (
        SELECT e.src AS node, sum(a.ar) AS hub
        FROM ar$k a JOIN e ON e.dst = a.node GROUP BY e.src)"""
      """WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 293 AS src,
          (CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 293) * 2 + 1) % 293
                WHEN doc_id % 3 = 1 THEN ((doc_id % 293) * 3 + 7) % 293
                ELSE ((doc_id % 293) * 5 + 11) % 293 END) AS dst
        FROM documents),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      h0 AS (SELECT node, CAST(1 AS DOUBLE) AS hub FROM nodes),""" +
        (1 to 6).map(step).mkString(",") + """,
      at AS (SELECT sum(ar) AS t FROM ar6),
      ht AS (SELECT sum(hub) AS t FROM h6)
      SELECT nd.node,
        round(coalesce(ar.ar, CAST(0 AS DOUBLE)) / att.t, 6) AS auth6,
        round(coalesce(h.hub, CAST(0 AS DOUBLE)) / htt.t, 6) AS hub6
      FROM nodes nd
      CROSS JOIN at att CROSS JOIN ht htt
      LEFT JOIN ar6 ar ON ar.node = nd.node
      LEFT JOIN h6 h ON h.node = nd.node
      ORDER BY nd.node"""
    },
    bench = true)

  // --- q70: link-graph structural audit -------------------------------
  // The exact-integer profile a crawl team reads before trusting q68/
  // q69's rankings: degree histograms both directions, self-loops,
  // unordered reciprocal pairs, dangling and source-only node counts
  // ([[graft.operators.GraphOps.linkGraphProfile]]). Same mod-293
  // graph as q69 so the audit describes the ranked graph. All counts,
  // no floats — the strongest gate class.
  private val q70 = GraftQuery(
    "q70_linkgraph_profile",
    (s, d) => {
      val res = col("doc_id") % 293
      val dst = when(col("doc_id") % 3 === 0, (res * 2 + 1) % 293)
        .when(col("doc_id") % 3 === 1, (res * 3 + 7) % 293)
        .otherwise((res * 5 + 11) % 293)
      val edges = Tables(s, d, "documents")
        .select(res.as("src"), dst.as("dst")).distinct()
      graft.operators.GraphOps.linkGraphProfile(s, edges, "src", "dst")
        .orderBy("metric", "k")
    },
    Some("""WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 293 AS src,
          (CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 293) * 2 + 1) % 293
                WHEN doc_id % 3 = 1 THEN ((doc_id % 293) * 3 + 7) % 293
                ELSE ((doc_id % 293) * 5 + 11) % 293 END) AS dst
        FROM documents),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      idg AS (SELECT dst, count(*) AS deg FROM e GROUP BY dst)
      SELECT * FROM (
        SELECT 'out_deg' AS metric, deg AS k, count(*) AS n FROM od GROUP BY deg
        UNION ALL
        SELECT 'in_deg', deg, count(*) FROM idg GROUP BY deg
        UNION ALL
        SELECT 'self_loop', CAST(0 AS BIGINT), count(*) FROM e WHERE src = dst
        UNION ALL
        SELECT 'reciprocal', CAST(0 AS BIGINT), count(*) FROM e
        WHERE src < dst AND EXISTS (
          SELECT 1 FROM e e2 WHERE e2.src = e.dst AND e2.dst = e.src)
        UNION ALL
        SELECT 'dangling', CAST(0 AS BIGINT), count(*) FROM nodes
        WHERE node NOT IN (SELECT src FROM e)
        UNION ALL
        SELECT 'source_only', CAST(0 AS BIGINT), count(*) FROM nodes
        WHERE node NOT IN (SELECT dst FROM e)
      ) ORDER BY metric, k"""),
    bench = false)

  // --- q71: BFS reachability layers from a seed list ------------------
  // The crawl-frontier primitive: every node within 6 directed hops of
  // the seed set (residues ≡ 0 mod 97), labeled with its shortest-hop
  // depth ([[graft.operators.GraphOps.bfsLayers]] — frontier-sized
  // joins per round, fixed unroll so the trajectory SQL-replays with
  // no data-dependent stopping rule). Same mod-293 graph as q69/q70.
  // All-integer output — the strongest gate class.
  private val q71 = GraftQuery(
    "q71_bfs_reach_layers",
    (s, d) => {
      val res = col("doc_id") % 293
      val dst = when(col("doc_id") % 3 === 0, (res * 2 + 1) % 293)
        .when(col("doc_id") % 3 === 1, (res * 3 + 7) % 293)
        .otherwise((res * 5 + 11) % 293)
      val edges = Tables(s, d, "documents")
        .select(res.as("src"), dst.as("dst")).distinct()
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.filter(col("node") % 97 === 0)
      graft.operators.GraphOps.bfsLayers(s, edges, "src", "dst", seeds, "node", 6)
        .orderBy("node")
    },
    Some {
      val step = (k: Int) => s"""
      f$k AS MATERIALIZED (
        SELECT DISTINCT e.dst AS node
        FROM f${k - 1} f JOIN e ON e.src = f.node
        WHERE e.dst NOT IN (SELECT node FROM v${k - 1})),
      v$k AS MATERIALIZED (
        SELECT node, depth FROM v${k - 1}
        UNION ALL SELECT node, CAST($k AS BIGINT) FROM f$k)"""
      """WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 293 AS src,
          (CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 293) * 2 + 1) % 293
                WHEN doc_id % 3 = 1 THEN ((doc_id % 293) * 3 + 7) % 293
                ELSE ((doc_id % 293) * 5 + 11) % 293 END) AS dst
        FROM documents),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      v0 AS MATERIALIZED (
        SELECT node, CAST(0 AS BIGINT) AS depth FROM nodes WHERE node % 97 = 0),
      f0 AS MATERIALIZED (SELECT node FROM v0),""" +
        (1 to 6).map(step).mkString(",") + """
      SELECT node, depth FROM v6 ORDER BY node"""
    },
    bench = false)

  // --- q72: exact triangle census + global clustering -----------------
  // Local link density over a third closed-form graph (mod-257,
  // successor rules s+1/s+2 keyed on doc_id parity — a ring mesh that
  // genuinely contains triangles). Kernel is
  // [[graft.operators.GraphOps.triangleCount]]: degree-ordered
  // orientation (the O(m^1.5) bound), two equi-joins + LEFT SEMI for
  // the closing edge, wedges from the degree table alone. All-integer
  // output incl. the ppm clustering coefficient (denominator guarded
  // on both engines).
  private val q72 = GraftQuery(
    "q72_triangle_census",
    (s, d) => {
      val res = col("doc_id") % 257
      val dst = when(col("doc_id") % 2 === 0, (res + 1) % 257)
        .otherwise((res + 2) % 257)
      val edges = Tables(s, d, "documents")
        .select(res.as("src"), dst.as("dst")).distinct()
      graft.operators.GraphOps.triangleCount(s, edges, "src", "dst")
    },
    Some("""WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 257 AS src,
          (CASE WHEN doc_id % 2 = 0 THEN ((doc_id % 257) + 1) % 257
                ELSE ((doc_id % 257) + 2) % 257 END) AS dst
        FROM documents),
      und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM e WHERE src <> dst),
      deg AS MATERIALIZED (
        SELECT node, count(*) AS deg
        FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        GROUP BY node),
      ori AS MATERIALIZED (
        SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
                    THEN und.u ELSE und.v END AS a,
               CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
                    THEN und.v ELSE und.u END AS b
        FROM und
        JOIN deg du ON du.node = und.u
        JOIN deg dv ON dv.node = und.v),
      tri AS (
        SELECT count(*) AS triangles
        FROM ori e1 JOIN ori e2 ON e2.a = e1.b
        WHERE EXISTS (SELECT 1 FROM ori e3 WHERE e3.a = e1.a AND e3.b = e2.b)),
      wed AS (
        SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS wedges FROM deg)
      SELECT t.triangles, w.wedges,
        CASE WHEN w.wedges = 0 THEN CAST(0 AS BIGINT)
             ELSE (3000000 * t.triangles) // w.wedges END AS gcc_ppm
      FROM tri t CROSS JOIN wed w"""),
    bench = true)

  // --- q73: personalized PageRank from trusted seeds ------------------
  // Crawl prioritization: restart mass goes to a LITERAL 7-domain seed
  // list (residues 0,47,…,282 of the q68 graph), so scores measure
  // authority as seen from the trusted set
  // ([[graft.operators.GraphOps.personalizedPageRank]]). The seed
  // count is a literal prime (7 ∉ {2,5}) on purpose: every nonzero
  // rank then carries a factor 1/7, whose decimal never terminates —
  // keeping round(…, 6) in the measure-zero class the way q68's prime
  // node count does. (A data-dependent seed count could land on 4 or
  // 8 under a reshaped fixture and make short TERMINATING decimals —
  // the salt-13 q21 boundary class — possible.) Unreached nodes are
  // exactly 0.0 on both engines.
  private val q73 = GraftQuery(
    "q73_seeded_pagerank",
    (s, d) => {
      import s.implicits._
      val id = col("doc_id")
      val src = (id % 331).as("src")
      val dst = when(id % 2 === 0, (id % 331) * 7 + 3)
        .otherwise((id % 331) * 11 + 5) % 331
      val edges = Tables(s, d, "documents")
        .select(src, dst.as("dst")).distinct()
      val seeds = Seq(0L, 47L, 94L, 141L, 188L, 235L, 282L).toDF("node")
      graft.operators.GraphOps
        .personalizedPageRank(s, edges, "src", "dst", seeds, "node", 8, 0.85)
        .select(col("node"), round(col("r"), 6).as("ppr6"))
        .orderBy("node")
    },
    Some {
      val step = (k: Int) => s"""
      p$k AS MATERIALIZED (
        SELECT b.node,
          (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * b.p0
            + CAST(0.85 AS DOUBLE) * coalesce(c.cin, CAST(0 AS DOUBLE)) AS r
        FROM base b
        LEFT JOIN (
          SELECT e.dst AS node, sum(p.r / od.deg) AS cin
          FROM p${k - 1} p
          JOIN od ON p.node = od.src
          JOIN e ON e.src = p.node
          GROUP BY e.dst) c ON c.node = b.node)"""
      """WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 331 AS src,
          (CASE WHEN doc_id % 2 = 0 THEN (doc_id % 331) * 7 + 3
                ELSE (doc_id % 331) * 11 + 5 END) % 331 AS dst
        FROM documents),
      seeds AS (SELECT CAST(s.node AS BIGINT) AS node
                FROM (VALUES (0),(47),(94),(141),(188),(235),(282)) s(node)),
      nodes AS MATERIALIZED (
        SELECT src AS node FROM e UNION SELECT dst FROM e
        UNION SELECT node FROM seeds),
      base AS MATERIALIZED (
        SELECT nd.node,
          CASE WHEN nd.node IN (SELECT node FROM seeds)
               THEN CAST(1 AS DOUBLE) / 7 ELSE CAST(0 AS DOUBLE) END AS p0
        FROM nodes nd),
      od AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
      p0 AS (SELECT node, p0 AS r FROM base),""" +
        (1 to 8).map(step).mkString(",") + """
      SELECT node, round(r, 6) AS ppr6 FROM p8 ORDER BY node"""
    },
    bench = false)

  // --- q74: co-citation related-domain pairs ---------------------------
  // Related-domain discovery without content: pairs co-linked by ≥2
  // distinct sources, top-20 under a total (shared DESC, a, b) order
  // ([[graft.operators.GraphOps.coCitationPairs]] — candidate fan-out
  // is Σ out-deg² per SOURCE, never corpus²; the maxOutDeg hub cap is
  // spec-exercised, default off here where out-degree ≤ 5 by
  // construction). Five-branch mod-97 closed form so shared counts
  // genuinely exceed 1 (measured: one pair at 3, fifty at 2 on the
  // driver shape). All-integer output.
  private val q74 = GraftQuery(
    "q74_cocitation_pairs",
    (s, d) => {
      val res = col("doc_id") % 97
      val dst = when(col("doc_id") % 5 === 0, (res * 2 + 1) % 97)
        .when(col("doc_id") % 5 === 1, (res * 3 + 2) % 97)
        .when(col("doc_id") % 5 === 2, (res * 5 + 3) % 97)
        .when(col("doc_id") % 5 === 3, (res * 7 + 5) % 97)
        .otherwise((res * 11 + 7) % 97)
      val edges = Tables(s, d, "documents")
        .select(res.as("src"), dst.as("dst")).distinct()
      graft.operators.GraphOps.coCitationPairs(s, edges, "src", "dst", 2L, 20)
    },
    Some("""WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 97 AS src,
          (CASE doc_id % 5
             WHEN 0 THEN ((doc_id % 97) * 2 + 1) % 97
             WHEN 1 THEN ((doc_id % 97) * 3 + 2) % 97
             WHEN 2 THEN ((doc_id % 97) * 5 + 3) % 97
             WHEN 3 THEN ((doc_id % 97) * 7 + 5) % 97
             ELSE ((doc_id % 97) * 11 + 7) % 97 END) AS dst
        FROM documents)
      SELECT x.dst AS a, y.dst AS b, count(*) AS shared
      FROM e x JOIN e y ON y.src = x.src AND x.dst < y.dst
      GROUP BY x.dst, y.dst
      HAVING count(*) >= 2
      ORDER BY shared DESC, a, b LIMIT 20"""),
    bench = false)

  // --- q75: WEIGHTED PageRank over the crawl link graph ---------------
  // Real crawl graphs weight edges (an edge backed by 500 links
  // asserts more than one backed by 1): rank splits proportionally,
  // r·w/W ([[graft.operators.GraphOps.pageRankWeighted]]). Weights
  // are the CLOSED FORM 1 + src mod 3 — structural on purpose: the
  // rank numerators stay products of {1,2,3}·3·17^j, never divisible
  // by the prime node count 331, so every value keeps its
  // non-terminating 1/331 factor and round(…,6) stays strictly in the
  // measure-zero class (a data-derived weight could cancel the 331
  // and re-admit the terminating-decimal boundary).
  private val q75 = GraftQuery(
    "q75_weighted_pagerank",
    (s, d) => {
      val id = col("doc_id")
      val src = (id % 331).as("src")
      val dst = when(id % 2 === 0, (id % 331) * 7 + 3)
        .otherwise((id % 331) * 11 + 5) % 331
      val edges = Tables(s, d, "documents")
        .select(src, dst.as("dst")).distinct()
        .withColumn("w", lit(1) + col("src") % 3)
      graft.operators.GraphOps
        .pageRankWeighted(s, edges, "src", "dst", "w", 10, 0.85)
        .select(col("node"), round(col("r"), 6).as("wpr6"))
        .orderBy("node")
    },
    Some {
      val step = (k: Int) => s"""
      p$k AS MATERIALIZED (
        SELECT nd.node,
          (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
            + CAST(0.85 AS DOUBLE) * coalesce(c.cin, CAST(0 AS DOUBLE)) AS r
        FROM nodes nd CROSS JOIN nn
        LEFT JOIN (
          SELECT ew.dst AS node, sum(p.r * ew.w / ow.wtot) AS cin
          FROM p${k - 1} p
          JOIN ow ON p.node = ow.src
          JOIN ew ON ew.src = p.node
          GROUP BY ew.dst) c ON c.node = nd.node)"""
      """WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 331 AS src,
          (CASE WHEN doc_id % 2 = 0 THEN (doc_id % 331) * 7 + 3
                ELSE (doc_id % 331) * 11 + 5 END) % 331 AS dst
        FROM documents),
      ew AS MATERIALIZED (
        SELECT src, dst, CAST(1 + src % 3 AS DOUBLE) AS w FROM e),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT count(*) AS n FROM nodes),
      ow AS MATERIALIZED (SELECT src, sum(w) AS wtot FROM ew GROUP BY src),
      p0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),""" +
        (1 to 10).map(step).mkString(",") + """
      SELECT node, round(r, 6) AS wpr6 FROM p10 ORDER BY node"""
    },
    bench = false)

  // --- q76: k-core peel — link-mesh survivors --------------------------
  // The density primitive behind spam-farm detection: repeatedly
  // remove nodes with fewer than k surviving neighbors; a mesh
  // survives, a star collapses
  // ([[graft.operators.GraphOps.kCorePeel]], k = 2, 12 fixed rounds —
  // far past the fixpoint at this scale, and a fixed unroll so the
  // trajectory SQL-replays with no data-dependent stopping rule).
  // Undirected simple graph from the mod-293 closed form (varied
  // degrees, so the peel genuinely cascades). All-integer output.
  private val q76 = GraftQuery(
    "q76_kcore_peel",
    (s, d) => {
      val res = col("doc_id") % 293
      val dst = when(col("doc_id") % 3 === 0, (res * 2 + 1) % 293)
        .when(col("doc_id") % 3 === 1, (res * 3 + 7) % 293)
        .otherwise((res * 5 + 11) % 293)
      val edges = Tables(s, d, "documents")
        .select(res.as("src"), dst.as("dst")).distinct()
      graft.operators.GraphOps.kCorePeel(s, edges, "src", "dst", 2, 12)
        .orderBy("node")
    },
    Some {
      val step = (k: Int) => s"""
      e$k AS MATERIALIZED (
        SELECT und.u, und.v FROM und
        JOIN a${k - 1} x ON x.node = und.u
        JOIN a${k - 1} y ON y.node = und.v),
      d$k AS MATERIALIZED (
        SELECT node, count(*) AS core_deg
        FROM (SELECT u AS node FROM e$k UNION ALL SELECT v AS node FROM e$k)
        GROUP BY node HAVING count(*) >= 2),
      a$k AS MATERIALIZED (SELECT node FROM d$k)"""
      """WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 293 AS src,
          (CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 293) * 2 + 1) % 293
                WHEN doc_id % 3 = 1 THEN ((doc_id % 293) * 3 + 7) % 293
                ELSE ((doc_id % 293) * 5 + 11) % 293 END) AS dst
        FROM documents),
      und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM e WHERE src <> dst),
      a0 AS MATERIALIZED (SELECT u AS node FROM und UNION SELECT v FROM und),""" +
        (1 to 12).map(step).mkString(",") + """
      SELECT node, core_deg FROM d12 ORDER BY node"""
    },
    bench = true)

  // --- q77: deterministic random-walk corpus ---------------------------
  // The DeepWalk/node2vec training-data generator as a gated operator
  // ([[graft.operators.GraphOps.deterministicWalks]]): one 6-step walk
  // per node over the mod-293 graph, each step picking among the
  // ranked out-neighbors by md5("start:t:cur")'s first 4 bytes mod
  // outdeg (modulo bias ≤ outdeg/2³² per rank) — the
  // engine's portable hash-deviate idiom (s10/s23 family), so the
  // FULL trajectory of every walk hash-gates across engines. Walks
  // halt at dangling nodes (standard truncation; both engines drop
  // the same rows). All-integer output.
  private val q77 = GraftQuery(
    "q77_graph_walks",
    (s, d) => {
      val res = col("doc_id") % 293
      val dst = when(col("doc_id") % 3 === 0, (res * 2 + 1) % 293)
        .when(col("doc_id") % 3 === 1, (res * 3 + 7) % 293)
        .otherwise((res * 5 + 11) % 293)
      val edges = Tables(s, d, "documents")
        .select(res.as("src"), dst.as("dst")).distinct()
      graft.operators.GraphOps.deterministicWalks(s, edges, "src", "dst", 6)
        .orderBy("start", "step")
    },
    Some {
      val step = (t: Int) => s"""
      w$t AS MATERIALIZED (
        SELECT w.start, r.dst AS cur
        FROM w${t - 1} w
        JOIN dg ON dg.src = w.cur
        JOIN ranked r ON r.src = w.cur
         AND r.rn = CAST(('0x' || substr(md5(
               CAST(w.start AS VARCHAR) || ':$t:' || CAST(w.cur AS VARCHAR)
             ), 1, 8)) AS BIGINT) % dg.deg)"""
      """WITH e AS MATERIALIZED (
        SELECT DISTINCT doc_id % 293 AS src,
          (CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 293) * 2 + 1) % 293
                WHEN doc_id % 3 = 1 THEN ((doc_id % 293) * 3 + 7) % 293
                ELSE ((doc_id % 293) * 5 + 11) % 293 END) AS dst
        FROM documents),
      ranked AS MATERIALIZED (
        SELECT src, dst,
          CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
            AS BIGINT) AS rn
        FROM e),
      dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      w0 AS MATERIALIZED (SELECT node AS start, node AS cur FROM nodes),""" +
        (1 to 6).map(step).mkString(",") + """
      SELECT start, step, node FROM (
        SELECT start, 0 AS step, cur AS node FROM w0
        UNION ALL SELECT start, 1, cur FROM w1
        UNION ALL SELECT start, 2, cur FROM w2
        UNION ALL SELECT start, 3, cur FROM w3
        UNION ALL SELECT start, 4, cur FROM w4
        UNION ALL SELECT start, 5, cur FROM w5
        UNION ALL SELECT start, 6, cur FROM w6)
      ORDER BY start, step"""
    },
    bench = false)

  val all: Seq[GraftQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
    q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37,
    q38, q39, q40, q41, q42, q43, q44, q45, q46, q47, q48, q49, q50,
    q51, q52, q53, q54, q55, q56, q57, q58, q59, q60, q61, q62, q63,
    q64, q65, q66, q67, q68, q69, q70, q71, q72, q73, q74, q75, q76,
    q77)
}
