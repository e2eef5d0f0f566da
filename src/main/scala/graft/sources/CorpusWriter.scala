package graft.sources

import graft.operators.Sampling
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Final-materialization sink for a curated corpus: the deterministic
  * shuffle ([[Sampling.shardAssignment]]) decides each row's shard and
  * in-shard position, and the writer lays the dataset out as
  * `shard=K/` partition directories with rows stored in position order.
  * Training loaders then stream shards sequentially with zero further
  * shuffling, and re-running the writer over the same corpus produces a
  * byte-stable layout (no RNG, no timestamp-dependent ordering).
  *
  * Scale shape: one exchange keyed on the shard id co-locates each
  * shard in a single task (`repartition(nShards, shard)`), and the
  * in-task sort on (shard, pos) is per-shard, never global. nShards is
  * the output-file count — thousands at 100 TB — so tasks stay
  * uniformly sized because the shard assignment is an md5 hash mod.
  * `maxRecordsPerFile` (if set by the caller via writer options) can
  * further split a shard without breaking pos order.
  */
object CorpusWriter {

  /** Writes `df` to `outDir/shard=K/...` in deterministic shuffled
    * order; returns the sharded frame (with `shard`/`pos`) for callers
    * that want to audit the assignment. Epoch-specific layouts pass a
    * distinct `salt` (see [[Sampling.shardAssignment]]). */
  def writeSharded(df: DataFrame, key: Column, outDir: String,
      nShards: Int, format: String = "parquet", salt: String = ""): DataFrame = {
    val sharded = Sampling.shardAssignment(df, key, nShards, salt)
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.format(format)
      .partitionBy("shard")
      .mode("overwrite")
      .save(outDir)
    sharded
  }

  /** JSONL export — the interchange shard format training stacks
    * consume directly: same deterministic shard/position layout as
    * [[writeSharded]], written as (optionally gzip-compressed)
    * line-delimited JSON. Column order inside each object follows the
    * input schema, so re-running over the same corpus is byte-stable.
    * Round-trips through [[CorpusReader.readJsonl]] (spec-pinned):
    * content-addressed ids regenerate identically from the text.
    *
    * The synthetic `pos` column is dropped before serialization (a
    * post-sort projection, so in-file line order IS position order):
    * `partitionBy` already strips `shard` into the directory name, and
    * an extra `pos` field per record would make every exported object
    * carry a layout artifact no loader schema expects. */
  def writeJsonl(df: DataFrame, key: Column, outDir: String,
      nShards: Int, compress: Boolean = true, salt: String = ""): DataFrame = {
    val sharded = Sampling.shardAssignment(df, key, nShards, salt)
    val w = sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .drop("pos")
      .write
      .partitionBy("shard")
      .mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(outDir)
    sharded
  }

  /** Hive-partitioned columnar export: `outDir/col1=v1/col2=v2/...` —
    * the layout that makes slice reads PARTITION-PRUNED (a filter on
    * the partition columns prunes directories at planning time; the
    * scan never opens non-matching files — i05 gates the round trip
    * and CorpusWriterSpec pins the pruning on `inputFiles`). Repartition
    * by the partition columns first so each partition directory is
    * written by the tasks owning it (without this, every task writes a
    * sliver of every partition — the small-files explosion at 100 TB:
    * nTasks × nPartitions files instead of ~nPartitions). */
  def writeHivePartitioned(df: DataFrame, outDir: String,
      partitionCols: Seq[String], format: String = "parquet"): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.repartition(partitionCols.map(col): _*)
      .write.format(format)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .save(outDir)
  }
}
