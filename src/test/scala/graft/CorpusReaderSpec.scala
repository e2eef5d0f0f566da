package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.sources.CorpusReader
import org.apache.spark.sql.functions._

class CorpusReaderSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def write(path: String, content: String): Unit =
    Files.write(Paths.get(path), content.getBytes("UTF-8"))

  private def writeGz(path: String, content: String): Unit = {
    val out = new GZIPOutputStream(Files.newOutputStream(Paths.get(path)))
    out.write(content.getBytes("UTF-8")); out.close()
  }

  private def writeZst(path: String, content: String): Unit = {
    // zstd-jni's encoder — an implementation INDEPENDENT of the
    // airlift pure-Java decoder the reader dispatches to, so this
    // round trip cross-validates the two against each other
    val out = new com.github.luben.zstd.ZstdOutputStream(
      Files.newOutputStream(Paths.get(path)))
    out.write(content.getBytes("UTF-8")); out.close()
  }

  private def writeBz2(path: String, content: String): Unit = {
    // Hadoop's BZip2Codec (pure-Java path, no native lib needed) —
    // the same codec the text datasource dispatches to on read
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(Files.newOutputStream(Paths.get(path)))
    out.write(content.getBytes("UTF-8")); out.close()
  }

  test("readJsonl: explicit schema, defaults for missing fields, gz/bz2 transparent") {
    val dir = tmpDir("jsonl")
    write(s"$dir/a.jsonl",
      """{"text":"alpha beta gamma","lang":"en","source":"web"}
        |{"text":"delta epsilon"}
        |""".stripMargin)
    writeGz(s"$dir/b.jsonl.gz",
      """{"text":"zeta eta theta","lang":"fr","source":"books"}
        |""".stripMargin)
    writeBz2(s"$dir/c.jsonl.bz2",
      """{"text":"iota kappa lambda","lang":"el","source":"wiki"}
        |""".stripMargin)
    writeZst(s"$dir/d.jsonl.zst",
      """{"text":"mu nu xi","lang":"de","source":"news"}
        |""".stripMargin)
    val docs = CorpusReader.readJsonl(spark, dir)
    assert(docs.columns.toSeq == Seq("doc_id", "text", "lang", "source"))
    val rows = docs.select("text", "lang", "source")
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("alpha beta gamma", "en", "web"),
      ("delta epsilon", "und", "unknown"), // defaults, not nulls
      ("zeta eta theta", "fr", "books"),
      ("iota kappa lambda", "el", "wiki"), // bz2: pure-Java codec path
      ("mu nu xi", "de", "news"))) // zst: airlift pure-Java decoder
    // content-addressed id: md5 of the normalized text, the same key
    // TextAnalysis.fingerprint computes — dedup composes directly
    val ids = docs.select("doc_id", "text").as[(String, String)].collect()
    ids.foreach { case (id, text) =>
      val fp = Seq(text).toDF("t")
        .select(md5(lower(trim(regexp_replace(col("t"), "\\s+", " ")))))
        .head().getString(0)
      assert(id == fp)
    }
  }

  test("readJsonl: malformed lines FAIL the read rather than nulling documents") {
    val dir = tmpDir("jsonlbad")
    write(s"$dir/bad.jsonl", "{\"text\":\"ok\"}\nnot json at all\n")
    intercept[Exception] {
      CorpusReader.readJsonl(spark, dir).collect()
    }
  }

  test("readJsonl: well-formed lines with null/missing text FAIL the read") {
    // FAILFAST only rejects unparseable JSON — these two lines parse
    // fine but would yield null text AND null doc_id (a null dedup key)
    for (line <- Seq("{\"lang\":\"en\",\"source\":\"s1\"}",
                     "{\"text\":null,\"lang\":\"en\"}")) {
      val dir = tmpDir("jsonlnulltext")
      write(s"$dir/n.jsonl", "{\"text\":\"fine\"}\n" + line + "\n")
      val e = intercept[Exception] {
        CorpusReader.readJsonl(spark, dir).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("readJsonl")),
        s"expected the null-text raise_error, got: $e")
    }
  }

  test("readTextFiles: one document per file, file name as source") {
    val dir = tmpDir("wholetext")
    write(s"$dir/doc1.txt", "first document body\nwith a second line")
    write(s"$dir/doc2.txt", "second document")
    val docs = CorpusReader.readTextFiles(spark, dir)
    val bySource = docs.select("source", "text").as[(String, String)]
      .collect().toMap
    assert(bySource.keySet == Set("doc1.txt", "doc2.txt"))
    assert(bySource("doc1.txt").contains("second line"),
      "wholetext keeps a multi-line file as ONE document")
  }

  test("readTextLines: one document per non-blank line across files") {
    val dir = tmpDir("lines")
    write(s"$dir/a.txt", "line one\n\nline two\n")
    writeGz(s"$dir/b.txt.gz", "line three\n")
    val docs = CorpusReader.readTextLines(spark, dir)
    assert(docs.select("text").as[String].collect().toSet ==
      Set("line one", "line two", "line three")) // blank dropped
  }

  test("writeJsonl -> readJsonl round-trip: content and ids regenerate exactly") {
    val src = tmpDir("rt_src"); val out = tmpDir("rt_out")
    write(s"$src/in.jsonl",
      """{"text":"round trip one","lang":"en","source":"s1"}
        |{"text":"round trip two two","lang":"de","source":"s2"}
        |{"text":"round trip three","lang":"en","source":"s1"}
        |""".stripMargin)
    val docs = CorpusReader.readJsonl(spark, src)
    graft.sources.CorpusWriter.writeJsonl(
      docs, col("doc_id"), out, nShards = 2)
    val back = CorpusReader.readJsonl(spark, out, recursive = true)
    // the reader re-derives doc_id from content, so equality of full
    // rows proves the export preserved text/lang/source byte-exactly
    assert(back.select("doc_id", "text", "lang", "source").collect().map(_.toSeq).toSet
      == docs.select("doc_id", "text", "lang", "source").collect().map(_.toSeq).toSet)
    // gzip shards on disk (the training-stack interchange layout)
    val files = java.nio.file.Files.walk(Paths.get(out)).toArray.map(_.toString)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString("\n"))
    // interchange purity: exported objects carry ONLY the input schema —
    // the synthetic pos column is dropped before serialization (in-file
    // line order is position order), and shard lives in the dir name
    val rawLines = spark.read.textFile(s"$out/shard=*").collect()
    assert(rawLines.nonEmpty && rawLines.forall(l =>
        !l.contains("\"pos\"") && !l.contains("\"shard\"")),
      "JSONL records must not leak layout columns")
  }

  test("canonical shape composes with the library operators directly") {
    val dir = tmpDir("compose")
    write(s"$dir/c.jsonl",
      """{"text":"a b c d e f","lang":"en","source":"s1"}
        |{"text":"a b c d e f","lang":"en","source":"s1"}
        |{"text":"totally different words here","lang":"en","source":"s2"}
        |""".stripMargin)
    val docs = CorpusReader.readJsonl(spark, dir)
    // exact dedup keys on the content-addressed id out of the box
    val deduped = graft.operators.Dedup.exactKeepFirst(docs, "text", "doc_id")
    assert(deduped.count() == 2, "identical documents collapse")
    val stats = graft.operators.TextAnalysis
      .ngramNovelty(docs, "doc_id", "text")
    // the duplicated doc's single distinct id appears once in novelty
    assert(stats.count() == 2)
  }

  test("readCsv round-trips adversarial quoting exactly") {
    import org.apache.spark.sql.functions.col
    // the texts CSV escaping gets wrong when it gets anything wrong:
    // embedded commas, RFC-4180 double quotes, a leading quote, a
    // field that looks like a number with a leading zero
    val texts = Seq(
      """a, b, and c""",
      """she said "hi, there" twice""",
      """"leading quote""",
      """0042 with spaces   inside""")
    val df = texts.zipWithIndex
      .map { case (t, i) => (t, "en", s"s$i") }
      .toDF("text", "lang", "source")
    val out = java.nio.file.Files
      .createTempDirectory("csv-rt").toString
    df.write.mode("overwrite").option("header", "true").csv(out)
    val back = CorpusReader.readCsv(spark, out)
    assert(back.select("text").as[String].collect().toSet == texts.toSet)
    // content addressing survives the cycle
    val ids = back.select("doc_id").as[String].collect().toSet
    assert(ids.size == texts.size)
  }

  test("readJsonlStream: arriving shard files yield the batch reader's exact rows") {
    val dir = tmpDir("jsonl-stream")
    def shard(name: String, rows: Seq[(String, String, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        rows.map { case (t, l, s) =>
          s"""{"text":"$t","lang":"$l","source":"$s"}"""
        }.mkString("", "\n", "\n").getBytes("UTF-8"))
    shard("s0.jsonl", Seq(("alpha beta", "en", "web")))
    val q = CorpusReader.readJsonlStream(spark, dir)
      .writeStream.format("memory").queryName("ingest_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a LATE-ARRIVING shard (the live-crawl shape) lands in a later
      // micro-batch; one uses the lang/source defaults
      shard("s1.jsonl", Seq(("gamma  delta", "fr", "cc")))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/s2.jsonl"),
        """{"text":"epsilon"}""".getBytes("UTF-8"))
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT doc_id, text, lang, source FROM ingest_stream")
        .as[(String, String, String, String)].collect().toSet
      val batch = CorpusReader.readJsonl(spark, dir)
        .as[(String, String, String, String)].collect().toSet
      assert(streamed == batch && streamed.size == 3,
        s"streamed=$streamed\nbatch=$batch")
      // defaults applied, and ids are the shared content address
      assert(streamed.exists(r => r._2 == "epsilon" && r._3 == "und" &&
        r._4 == "unknown"))
    } finally q.stop()
  }
}
