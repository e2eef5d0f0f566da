package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Readers for the corpus layouts LLM data pipelines actually ingest,
  * normalized to the canonical documents shape
  * `(doc_id: string, text, lang, source)` so every operator in this
  * library (dedup, text analysis, sampling, novelty, packing) composes
  * directly on top. The playback CSV source covers the reference's
  * format; these cover the rest of a 100 TB ingest surface.
  *
  * Scale notes shared by all three:
  *   - schemas are EXPLICIT — no inference pass (Spark's JSON schema
  *     inference is a full extra scan of the corpus);
  *   - compression is handled by the text datasource per file, so
  *     mixed directories read transparently: .gz, .bz2 AND .zst work
  *     everywhere with NO native libhadoop — gz/bz2 through Hadoop's
  *     own pure-Java codecs, .zst through airlift's pure-Java zstd
  *     decoder (`io.airlift.compress.zstd.ZstdCodec`, shipped in
  *     Spark's own classpath), registered per session by
  *     [[ensureZstdCodec]] and cross-validated in CorpusReaderSpec
  *     against the INDEPENDENT zstd-jni encoder;
  *   - `doc_id` is the md5 of the normalized content — content-
  *     addressed and engine-portable (the same id on re-ingest, on any
  *     cluster size, and reproducible by the SQL oracles' md5), which
  *     is exactly what the downstream dedup/split operators key on.
  */
object CorpusReader {

  private val canonical = Seq("doc_id", "text", "lang", "source")

  /** Registers the pure-Java zstd Hadoop codec for `.zst` files —
    * airlift's `ZstdCodec` (already on Spark's classpath; no native
    * libhadoop) — in the session's Hadoop configuration. Setting
    * `io.compression.codecs` REPLACES Hadoop's default codec list, so
    * the new list is the session's CURRENT EFFECTIVE list (whatever
    * `CompressionCodecFactory` resolves — explicit config or the
    * ServiceLoader defaults, Snappy/Lz4/native-zstd included) with the
    * airlift codec appended LAST, so its `.zst` extension mapping wins
    * over any native-backed default while every other extension keeps
    * decompressing exactly as before. Idempotent and cheap — every
    * reader calls it. */
  def ensureZstdCodec(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val zc = classOf[io.airlift.compress.zstd.ZstdCodec]
    import scala.jdk.CollectionConverters._
    val effective = org.apache.hadoop.io.compress.CompressionCodecFactory
      .getCodecClasses(conf).asScala.toSeq
    val want = (effective.filterNot(_ == zc) :+ zc).map(_.getName)
      .mkString(",")
    if (conf.get("io.compression.codecs") != want)
      conf.set("io.compression.codecs", want)
  }

  // Collapse-THEN-trim: trim only strips spaces (both Spark and
  // DuckDB), so trim-first would leave a trailing '\n' — e.g. the one
  // every text-sink file ends with — to become a trailing ' ' after
  // the collapse, silently changing the content address across a
  // write/read round trip. Replacing first turns ANY edge whitespace
  // into spaces that trim then removes, so a doc keeps one id no
  // matter which serialization it last passed through.
  private def withDocId(df: DataFrame): DataFrame =
    df.withColumn("doc_id",
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .select(canonical.map(col): _*)

  /** CSV corpus layout (header + quoted fields — the spreadsheet-era
    * interchange a surprising share of public text datasets still
    * ship as): explicit (text, lang, source) schema, FAILFAST, with
    * the same null-text guard as [[readJsonl]] — a quoting bug that
    * nulls a field fails the read instead of minting a null doc_id.
    * Spark's CSV codec handles embedded commas/quotes via standard
    * RFC-4180 double-quoting; the i04 gate round-trips the corpus
    * through writer+reader and checks the content-addressed inventory
    * against the original table, so any escaping asymmetry hashes
    * red. Single-line documents only (multiLine parsing makes the
    * scan non-splittable; a corpus with embedded newlines belongs in
    * JSONL). */
  def readCsv(spark: SparkSession, path: String,
      recursive: Boolean = false): DataFrame = {
    ensureZstdCodec(spark)
    val schema = StructType(Seq(
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType)))
    val raw = spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST")
      .option("recursiveFileLookup", recursive.toString)
      .csv(path)
    withDocId(raw.select(
      when(col("text").isNull, raise_error(concat(
          lit("readCsv: row with null/missing text in "),
          input_file_name())))
        .otherwise(col("text")).as("text"),
      coalesce(col("lang"), lit("und")).as("lang"),
      coalesce(col("source"), lit("unknown")).as("source")))
  }

  /** JSONL (one JSON object per line, the interchange format of public
    * text corpora): explicit single-pass schema over the named fields;
    * missing lang/source fields land as configurable defaults rather
    * than nulls so group-bys stay total. Malformed lines fail the read
    * (PERMISSIVE would silently null entire documents — for a training
    * corpus that is data loss, not tolerance; callers wanting a
    * quarantine pipe read with their own schema). FAILFAST only rejects
    * lines that don't parse, so a WELL-FORMED object missing the text
    * field (or carrying `"text": null`) would otherwise slip through as
    * a null-text row — and a null doc_id, a null key poisoning every
    * downstream dedup/split group-by. Those rows fail the read too
    * (`raise_error` at first occurrence, map-side), keeping the
    * docstring's totality claim enforced rather than assumed. */
  def readJsonl(spark: SparkSession, path: String,
      textField: String = "text", langField: String = "lang",
      sourceField: String = "source", defaultLang: String = "und",
      defaultSource: String = "unknown",
      recursive: Boolean = false): DataFrame = {
    val schema = StructType(Seq(
      StructField(textField, StringType),
      StructField(langField, StringType),
      StructField(sourceField, StringType)))
    ensureZstdCodec(spark)
    // Recursive concrete-root listing for sharded layouts (shard=K/
    // dirs): same rationale as [[readTextFiles]] — a wildcard in the
    // path trips a FileStreamSink metadata probe stack trace.
    val raw = spark.read.schema(schema).option("mode", "FAILFAST")
      .option("recursiveFileLookup", recursive.toString).json(path)
    normalizeJsonl(raw, "readJsonl", textField, langField, sourceField,
      defaultLang, defaultSource)
  }

  /** The shared guard + normalization [[readJsonl]] and
    * [[readJsonlStream]] apply — ONE place decides what a canonical
    * document row is, so the batch and streaming paths cannot drift. */
  private def normalizeJsonl(raw: DataFrame, caller: String,
      textField: String, langField: String, sourceField: String,
      defaultLang: String, defaultSource: String): DataFrame =
    withDocId(raw.select(
      when(col(textField).isNull, raise_error(concat(
          lit(s"$caller: well-formed line with null/missing '$textField' in "),
          input_file_name())))
        .otherwise(col(textField)).as("text"),
      coalesce(col(langField), lit(defaultLang)).as("lang"),
      coalesce(col(sourceField), lit(defaultSource)).as("source")))

  /** Streaming twin of [[readJsonl]] — file-ARRIVAL-driven corpus
    * ingest: new shard files landing under `path` become micro-batches
    * with the identical FAILFAST schema, null-text guard, defaults,
    * and content-addressed doc ids as the batch reader (the
    * normalization is shared code, so the two paths cannot diverge;
    * CorpusReaderSpec pins streamed ids == batch ids over the same
    * files). This is the live-crawl front door: compose with
    * [[graft.streaming.StatefulOps.streamingDedup]] /
    * `streamingTokenBudget` for admission, or
    * [[graft.streaming.StatefulOps.streamingHeavyHitters]] for
    * monitoring. Pass `maxFilesPerTrigger` in `options` to bound
    * batch size; content-addressed ids make replayed files idempotent
    * to dedupe downstream. */
  def readJsonlStream(spark: SparkSession, path: String,
      textField: String = "text", langField: String = "lang",
      sourceField: String = "source", defaultLang: String = "und",
      defaultSource: String = "unknown",
      options: Map[String, String] = Map.empty): DataFrame = {
    val schema = StructType(Seq(
      StructField(textField, StringType),
      StructField(langField, StringType),
      StructField(sourceField, StringType)))
    ensureZstdCodec(spark)
    val raw = spark.readStream.schema(schema).option("mode", "FAILFAST")
      .options(options).json(path)
    normalizeJsonl(raw, "readJsonlStream", textField, langField,
      sourceField, defaultLang, defaultSource)
  }

  /** Directory of raw text files, one DOCUMENT per FILE (the
    * crawl-extract layout): `wholetext` keeps each file a single row —
    * a file is never split across partitions, so per-document operators
    * see complete documents — and the file name becomes the source.
    * `recursive` descends into subdirectories (hidden `_`/`.` files
    * skipped by Spark's file index) — pass the concrete root rather
    * than a wildcard glob, which trips a noisy FileStreamSink metadata
    * probe on the non-existent literal path. */
  def readTextFiles(spark: SparkSession, dir: String,
      lang: String = "und", recursive: Boolean = false): DataFrame = {
    val raw = spark.read.option("wholetext", "true")
      .option("recursiveFileLookup", recursive.toString).text(dir)
      .select(col("value").as("text"),
        lit(lang).as("lang"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("source"))
    withDocId(raw)
  }

  /** Directory of text files, one DOCUMENT per LINE (the sentence/
    * paragraph-corpus layout): plain line scan — files split across
    * partitions freely, so a 100 GB single file still parallelizes.
    * Blank lines drop (they carry no document). */
  def readTextLines(spark: SparkSession, dir: String,
      lang: String = "und"): DataFrame = {
    ensureZstdCodec(spark)
    val raw = spark.read.text(dir)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("text"),
        lit(lang).as("lang"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("source"))
    withDocId(raw)
  }
}
