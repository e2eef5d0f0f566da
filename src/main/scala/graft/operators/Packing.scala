package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch preparation: lay documents out
  * in a deterministic order and cut the stream into fixed token-budget
  * packs (the concat-and-split scheme pretraining pipelines use — a
  * doc's pack is `floor(tokens_before_it / budget)`).
  *
  * The running sum is windowed **per shard** (e.g. the source column),
  * never globally: each shard packs independently, so there is no
  * single-partition window and a 1000-executor run packs all shards in
  * parallel. Pack ids are therefore (shard, pack) pairs.
  */
object Packing {

  /** Adds `_pack`: the token-budget pack index of each row within its
    * shard, by `order` within `Window.partitionBy(shard)`. */
  def packByBudget(df: DataFrame, shard: Column, order: Column,
      tokens: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(tokens).over(w), lit(0L))
    df.withColumn("_pack", floor(before / lit(budget.toDouble)))
  }
}
