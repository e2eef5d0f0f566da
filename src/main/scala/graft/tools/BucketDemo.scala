package graft.tools

import graft.Tables
import graft.operators.ScaleOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Live demo: the same fact-fact join with and without bucketing,
  * exchange counts printed from the executed plans (dev tool). */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("bucketdemo")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh.resolve("warehouse").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).length
    }

    val plainJoin = Tables(spark, d, "lineitem")
      .join(Tables(spark, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum("l_quantity").as("q"))
    println(s"[demo] plain join exchanges: ${exchanges(plainJoin)}")

    ScaleOps.writeBucketed(Tables(spark, d, "lineitem"), "li_b", "l_orderkey", 8, s"$wh/li")
    ScaleOps.writeBucketed(Tables(spark, d, "orders"), "ord_b", "o_orderkey", 8, s"$wh/ord")
    val bucketedJoin = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum("l_quantity").as("q"))
    println(s"[demo] bucketed join exchanges: ${exchanges(bucketedJoin)}")

    val a = plainJoin.orderBy("o_orderstatus").collect().map(_.toString).toSeq
    val b = bucketedJoin.orderBy("o_orderstatus").collect().map(_.toString).toSeq
    println(s"[demo] results identical: ${a == b}")
    println("[demo] skew profile of l_orderkey: " +
      ScaleOps.keySkewProfile(Tables(spark, d, "lineitem"), "l_orderkey", 2)
        .collect().mkString(" "))
    spark.stop()
  }
}
