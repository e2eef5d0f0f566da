package graft.tools

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for plan-shape investigation (dev tool). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    docs.count()

    time("shingles only") {
      docs.select(graft.operators.TextAnalysis.wordShingles(col("text"), 3).as("s"))
        .select(sum(size(col("s")))).head()
    }
    time("minhash sigs") {
      Dedup.withMinhash(docs, "text").select(sum(size(col("_minhash")))).head()
    }
    val sigs = Dedup.withMinhash(docs, "text")
      .select(col("doc_id"), col("_shingles"), col("_minhash"))
    time("lsh buckets") {
      Dedup.lshBuckets(sigs, "doc_id", 32).count()
    }
    time("full minhash pairs") {
      Dedup.minhashNearDupPairs(docs, "doc_id", "text").count()
    }
    val plan = Dedup.withMinhash(docs, "text").queryExecution.executedPlan.toString
    println("[profile] xxhash64 occurrences in minhash plan: " +
      "xxhash64".r.findAllIn(plan).length)

    val emb = Tables(spark, sfDir, "embeddings")
    emb.count()
    time("withUnit sum") {
      Similarity.withUnit(emb, "embedding").select(sum(element_at(col("_unit"), 1))).head()
    }
    time("bruteForceTopK") {
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 5).count()
    }
    time("lshTopK") {
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 5, nbits = 6).count()
    }
    val uplan = Similarity.withUnit(emb, "embedding")
      .withColumn("_sig", graft.functions.Vec.hyperplaneSignature(col("_unit"),
        graft.functions.Vec.randomPlanes(6, 64)))
      .queryExecution.executedPlan.toString
    println("[profile] aggregate-in-plan occurrences for 1 signature: " +
      "aggregate\\(".r.findAllIn(uplan).length)

    val planted = docs // d01 shape
    time("d01 keep-first") {
      Dedup.exactKeepFirst(planted, "text", "doc_id").count()
    }
    time("d01 keep-first (2nd)") {
      Dedup.exactKeepFirst(planted, "text", "doc_id").count()
    }
    time("fingerprint only") {
      docs.select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
        .select(max(col("fp"))).head()
    }
    time("window on plain col") {
      import org.apache.spark.sql.expressions.Window
      docs.withColumn("_rn", row_number().over(
          Window.partitionBy(col("text")).orderBy(col("doc_id"))))
        .filter(col("_rn") === 1).count()
    }
    // d01's actual bench shape: keep-first over the planted union
    val near = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    val exact = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
    val full = docs.unionByName(near).unionByName(exact)
    time("d01 planted-union keep-first (1st)") {
      Dedup.exactKeepFirst(full, "text", "doc_id").count()
    }
    time("d01 planted-union keep-first (2nd)") {
      Dedup.exactKeepFirst(full, "text", "doc_id").count()
    }
    spark.stop()
  }
}
