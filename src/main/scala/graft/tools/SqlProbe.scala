package graft.tools

import org.apache.spark.sql.SparkSession

object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    println("[probe] vec_dot = " + spark.sql(
      "SELECT vec_dot(array(1.0d,2.0d), array(3.0d,4.0d))").head().getDouble(0))
    try {
      spark.sql("SELECT vec_dot(array(1.0d))").collect()
      println("[probe] wrong arity: NO ERROR (bad)")
    } catch { case e: Throwable =>
      println("[probe] wrong arity error: " + e.getMessage.linesIterator.next()) }
    try {
      spark.sql("SELECT minhash64(array('a'), 1 + 1)").collect()
      println("[probe] non-literal numHashes accepted: " +
        spark.sql("SELECT size(minhash64(array('a'), 2))").head().getInt(0))
    } catch { case e: Throwable =>
      println("[probe] numHashes expr error: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
