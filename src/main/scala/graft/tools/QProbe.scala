package graft.tools

import graft.QueryRegistry
import org.apache.spark.sql.SparkSession

/** A/B timing for individual bench queries (dev scratch).
  * `SPARK_GRAFT_RELEASE=1` drops tracked operator caches between
  * samples — the bench harness's standalone-honest mode; without it,
  * later samples reuse frames (ANN indexes, signature streams) built
  * by earlier ones, isolating how much of a query's time is cache
  * build vs query proper. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val release = sys.env.contains("SPARK_GRAFT_RELEASE")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n => graft.Tables(spark, sfDir, n).count())
    for (name <- args; i <- 1 to 4) {
      val t0 = System.nanoTime()
      QueryRegistry.queryMap(name)(spark, sfDir).count()
      println(f"[$name] run $i${if (release) " (released)" else " (warm)"}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (release) graft.operators.OpCaches.release(spark)
    }
    spark.stop()
  }
}
