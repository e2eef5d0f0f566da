package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("deterministic sample: stable across runs, ~fraction sized") {
    val a = Sampling.deterministicSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same sample every run")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.05 && frac < 0.4, s"~20% requested, got $frac")
  }

  test("nested samples: 10% sample is a subset of the 20% sample") {
    val s10 = Sampling.deterministicSample(docs, col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    val s20 = Sampling.deterministicSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s20), "hash thresholding nests samples")
  }

  test("split assignment: disjoint, exhaustive, stable") {
    val split = docs.withColumn("s", Sampling.assignSplit(col("doc_id")))
    assert(split.count() == docs.count())
    val counts = split.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts.getOrElse("val", 0L))
  }

  test("stratified sample keeps non-targeted strata whole") {
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
        Map("en" -> 0.25))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    before.keys.filter(_ != "en").foreach(l => assert(after(l) == before(l)))
    assert(after("en") < before("en"))
  }

  test("SQL registration: custom expressions callable from spark.sql") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
    assert(dot == 11.0)
    val sim = spark.sql(
      "SELECT simhash64(array('a','b')) = simhash64(array('a','b')) AS eq").head().getBoolean(0)
    assert(sim)
    val mh = spark.sql(
      "SELECT size(minhash64(array('x y z', 'y z w'), 64)) AS n").head().getInt(0)
    assert(mh == 64)
  }
}
