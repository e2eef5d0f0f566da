package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shuffle-management toolkit for 100 TB operation: bucketed
  * co-located joins (pay the shuffle once at write time, never again)
  * and salted joins for skewed keys (beyond what AQE's skew-join
  * splitting handles).
  */
object ScaleOps {

  /** Writes a table bucketed + sorted on the join key. Subsequent joins
    * between tables bucketed the same way execute with NO exchange on
    * either side — the scan is already hash-distributed. This is the
    * 100 TB pattern for fact-fact joins (lineitem ⋈ orders): one write
    * shuffle amortized over every future join. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      nBuckets: Int, path: String): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(tableName)

  /** The q61 fulfillment-latency kernel over caller-supplied fact
    * frames — factored out of the registry query so the SAME
    * aggregation runs against either the plain parquet tables (AQE
    * broadcasts the sf-test orders side) or a pair of
    * [[writeBucketed]] tables, where the orderkey join executes with
    * ZERO exchange on both sides (ScaleOpsSpec pins that plan). This
    * is the promoted 100 TB shape: bucket lineitem and orders on
    * orderkey once at ingest, and every fact-fact join on that key —
    * this latency roll-up included — reads pre-distributed buckets
    * instead of shuffling ~100 TB per query. */
  def shipLatencyByPriority(li: DataFrame, ord: DataFrame): DataFrame = {
    val days = datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
    li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), days.as("days"))
      .groupBy(col("o_orderpriority"))
      // integer day diffs → mean in exact e-4 units and the late share
      // in exact integer ppm (round-half-away on BIGINT sums):
      // round(avg(int), 4) is engine-defined on a .00005 decimal
      // boundary (non-dyadic, so Spark's shortest-repr HALF_UP and
      // DuckDB's float rounding split). The interpolated percentiles
      // stay doubles — j/20 interpolation over whole days terminates
      // ≥2 digits above the rounding boundary.
      .agg(count(lit(1)).as("n_lines"),
        sum(col("days")).as("_sd"),
        round(expr("percentile(days, 0.5)"), 4).as("p50_days"),
        round(expr("percentile(days, 0.95)"), 4).as("p95_days"),
        sum(when(col("days") > 90, 1L).otherwise(0L)).as("_late"))
      .withColumn("avg_days_e4", expr(
        """CASE WHEN _sd >= 0 THEN (_sd * 20000 + n_lines) DIV (2 * n_lines)
           ELSE -(((-_sd) * 20000 + n_lines) DIV (2 * n_lines)) END"""))
      .withColumn("late_ppm",
        expr("(_late * 2000000 + n_lines) DIV (2 * n_lines)"))
      .select(col("o_orderpriority"), col("n_lines"), col("avg_days_e4"),
        col("p50_days"), col("p95_days"), col("late_ppm"))
      .orderBy("o_orderpriority")
  }

  /** Salted join for a skewed build side: the big (skewed) side gets a
    * deterministic salt in [0, salts) derived from its whole row; the
    * small side is replicated `salts` times. Join key becomes
    * (key, salt) — a hot key's rows spread over `salts` reducers.
    * Semantics identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val explodedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(explodedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage salted aggregation for skewed grouping keys: stage one
    * aggregates on (key, salt) so a hot key's reduce work spreads over
    * `salts` tasks; stage two re-aggregates the tiny (keys × salts)
    * intermediate. Exact for algebraic aggregates (sum/count here —
    * min/max/avg decompose the same way). Spark's hash aggregate
    * already computes map-side partials; explicit salting additionally
    * splits a hot key's reducer, which AQE can't do for aggregations. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_s")).as("sum_value"), sum(col("_c")).as("n"))
  }

  /** Global rank [0, N) under `order` without a single-partition sort:
    * range-partition on the order columns, rank WITHIN each range (a
    * window partitioned by the physical range id — never a global
    * window), then compose per-range offsets from one bounded
    * `nRanges`-row count collect. Range partitions are ordered by
    * construction — every row in range i precedes every row in range
    * i+1 under `order` — so offset + in-range position IS the global
    * rank. Same shape as [[graft.operators.Sampling.curriculumStages]]'
    * rank core (see there for why the frame is localCheckpoint-ed: the
    * sampled range boundaries must not be re-drawn between the counts
    * job and the final job; a 100 TB run swaps the localCheckpoint for
    * a reliable checkpoint, shapes unchanged).
    *
    * This is the scale-safe spine for rank statistics over frames too
    * big for the post-aggregate single-partition-window whitelist —
    * Lorenz/Gini curves (q65) rank EVERY customer, a frame that grows
    * with the corpus. */
  def globalRankByRange(df: DataFrame, order: Seq[Column],
      nRanges: Int = 64, rankCol: String = "grank"): DataFrame = {
    require(nRanges >= 1 && nRanges <= 4096,
      s"nRanges=$nRanges: offsets ride the plan as literals, keep it bounded")
    val ranged = df.repartitionByRange(nRanges, order: _*)
      .withColumn("_range", spark_partition_id())
      .localCheckpoint(false) // lazy: the counts collect below materializes it
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_range")).orderBy(order: _*)
    val withPos = ranged.withColumn("_pos", row_number().over(w).cast("long"))
    val counts = withPos.groupBy(col("_range")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val nParts = counts.keys.maxOption.map(_.toInt + 1).getOrElse(1)
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p.toLong, 0L))
    val offCol = element_at(
      array(offsets.take(nParts).map(lit(_)): _*), col("_range") + 1)
    withPos.withColumn(rankCol, offCol + col("_pos") - 1)
      .drop("_range", "_pos")
  }

  /** Key-frequency probe for deciding salting / AQE skew thresholds:
    * top-n heaviest keys with their share of the table. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total.toDouble, 6))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }

  /** Within-basket pair generation (the q67 co-occurrence kernel):
    * distinct (basket, item) → self-join on the basket key with
    * item_a < item_b. Fan-out is basket²-per-key — bounded on order
    * data (TPC-H baskets are ≤7 items) but unbounded on a raw 100 TB
    * crawl, where ONE degenerate mega-basket (a bot cart with 10⁶
    * items) would emit 5·10¹¹ pairs from a single key and own the
    * job.
    *
    * `maxBasketSize = Some(cap)` closes that hole: baskets larger
    * than the cap are DETERMINISTICALLY truncated to their `cap`
    * smallest item ids (a per-key window on the same key the pair
    * join shuffles on — no extra exchange), capping per-key fan-out
    * at cap·(cap−1)/2. Default None preserves exact semantics — the
    * cap is an explicit opt-in for untrusted basket-size
    * distributions. The capped frame is fully LAZY (no action at
    * construction time, so it composes into bigger plans and computes
    * the window exactly once); callers that must see what the cap cut
    * run [[truncatedBaskets]] as an explicit audit pass. */
  def basketPairs(op: DataFrame, keyCol: String, itemCol: String,
      maxBasketSize: Option[Int] = None,
      assumeDistinct: Boolean = false): DataFrame = {
    require(maxBasketSize.forall(_ >= 2),
      s"maxBasketSize=$maxBasketSize: below 2 no pair can form")
    // assumeDistinct: callers that already hold the deduped
    // (key, item) frame (and typically have it operator-cached) skip
    // the internal distinct — on already-unique rows it would shuffle
    // the whole frame again to remove nothing (ScaleOpsSpec pins the
    // two paths equal on duplicated input vs its distinct)
    val base0 = op.select(col(keyCol).as("ok"), col(itemCol).as("pk"))
    val base = if (assumeDistinct) base0 else base0.distinct()
    val capped = maxBasketSize match {
      case None => base
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ok")).orderBy(col("pk"))
        base.withColumn("_pos", row_number().over(w))
          .filter(col("_pos") <= cap).drop("_pos")
    }
    capped.as("a")
      .join(capped.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.ok").as("ok"),
        col("a.pk").as("part_a"), col("b.pk").as("part_b"))
  }

  /** Audit companion to [[basketPairs]]'s `maxBasketSize` cap: the
    * baskets the cap WOULD truncate, with their true sizes — run it
    * explicitly (and pay its one aggregate) when the cut must be
    * visible; the capped pair frame itself stays lazy and silent. */
  def truncatedBaskets(op: DataFrame, keyCol: String, itemCol: String,
      maxBasketSize: Int): DataFrame =
    op.select(col(keyCol).as("ok"), col(itemCol).as("pk")).distinct()
      .groupBy(col("ok")).agg(count(lit(1)).as("basket_size"))
      .filter(col("basket_size") > maxBasketSize)
}
