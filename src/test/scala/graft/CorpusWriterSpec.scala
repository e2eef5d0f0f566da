package graft

import graft.sources.CorpusWriter
import org.apache.spark.sql.functions._

class CorpusWriterSpec extends SparkSpec {
  import spark.implicits._

  test("sharded write: partition dirs, lossless readback, stable pos order") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("corpus-writer").toString
    try {
      val sharded = CorpusWriter.writeSharded(docs, col("doc_id"), out, nShards = 4)

      // layout: one partition directory per shard
      val dirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"), dirs.toSeq)

      // lossless: every row comes back, with its assignment intact
      val back = spark.read.parquet(out)
      assert(back.count() == docs.count())
      assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
        docs.select("doc_id").as[Long].collect().sorted.toSeq)

      // within each shard file, physical row order IS pos order (the
      // property that lets a loader stream shards without sorting)
      for (sh <- 0 until 4) {
        val physical = spark.read.parquet(s"$out/shard=$sh")
          .select("pos").as[Long].collect().toSeq
        assert(physical == physical.sorted, s"shard $sh rows out of pos order")
      }

      // determinism: a second write is the same assignment
      val again = CorpusWriter.writeSharded(docs, col("doc_id"), out, nShards = 4)
      assert(sharded.select("doc_id", "shard", "pos").collect().toSet ==
        again.select("doc_id", "shard", "pos").collect().toSet)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
