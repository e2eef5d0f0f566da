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

  test("ORC layout: same deterministic shard/pos assignment, lossless readback") {
    // writeSharded's format parameter rides straight into the
    // DataFrameWriter — ORC (bundled with Spark) is the other columnar
    // layout training stacks consume; the assignment must be identical
    // to the parquet one (it is computed before the writer).
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val pq = java.nio.file.Files.createTempDirectory("cw-parquet").toString
    val orc = java.nio.file.Files.createTempDirectory("cw-orc").toString
    try {
      val a = CorpusWriter.writeSharded(docs, col("doc_id"), pq, nShards = 4)
      val b = CorpusWriter.writeSharded(docs, col("doc_id"), orc, nShards = 4,
        format = "orc")
      assert(a.select("doc_id", "shard", "pos").collect().toSet ==
        b.select("doc_id", "shard", "pos").collect().toSet,
        "assignment must be format-independent")
      val back = spark.read.orc(orc)
      assert(back.count() == docs.count())
      assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
        docs.select("doc_id").as[Long].collect().sorted.toSeq)
      // ORC shard files preserve in-file pos order too
      for (sh <- 0 until 4) {
        val physical = spark.read.orc(s"$orc/shard=$sh")
          .select("pos").as[Long].collect().toSeq
        assert(physical == physical.sorted, s"orc shard $sh out of pos order")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(pq, orc).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("hive-partitioned export: a slice read is pruned to exactly its directory") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "source")
    val out = java.nio.file.Files.createTempDirectory("graft-hivep").toString
    try {
      CorpusWriter.writeHivePartitioned(docs, out, Seq("source", "lang"))
      val (src, lg) = docs.select("source", "lang")
        .orderBy("source", "lang").as[(String, String)].head()
      val slice = spark.read.parquet(out)
        .filter(col("source") === src && col("lang") === lg)
      // the scan's own partition filters must prune the file listing to
      // the one matching directory — this IS the pruning, asked of the
      // FileIndex the way the physical scan asks it
      val scan = slice.queryExecution.sparkPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in the slice plan"))
      assert(scan.partitionFilters.nonEmpty, "partition filters must push")
      val pruned = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files).map(_.getPath.toString)
      assert(pruned.nonEmpty &&
        pruned.forall(f => f.contains(s"source=$src") && f.contains(s"lang=$lg")),
        s"pruned listing leaked other partitions: $pruned")
      // and the slice content round-trips exactly (partition values
      // restored from directory names)
      val got = slice.select("doc_id").as[Long].collect().toSet
      val want = docs.filter(col("source") === src && col("lang") === lg)
        .select("doc_id").as[Long].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
