package graft.tools

import graft.QueryRegistry
import org.apache.spark.sql.SparkSession

/** A/B timing for individual bench queries (dev scratch). */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[$name] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
