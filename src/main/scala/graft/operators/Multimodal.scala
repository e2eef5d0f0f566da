package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media payloads are
  * opaque `binary` columns travelling next to typed metadata; decode /
  * feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] is a deterministic stand-in with the same
  * shape a real decoder would have. Everything around it — schema,
  * batch iteration, partition sizing, output typing — is real Spark
  * plumbing: swap `FakeCodec.decode` for an actual JNI/FFI decoder and
  * nothing else changes.
  *
  * Scale notes: payloads stay off the shuffle path (feature extraction
  * is map-side); `repartitionForPayloads` sizes partitions by byte
  * budget, not row count, so a 100 TB corpus of skewed media sizes
  * still yields bounded-memory tasks.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** STUB decoder: a real build would call an image/audio codec here
    * (the `???`-equivalent is the deterministic fake below, so the
    * pipeline is testable end-to-end). */
  object FakeCodec {
    /** "Decodes" a payload into a fixed-length feature vector: byte
      * histogram moments — deterministic, shape-compatible with a real
      * embedding head. */
    def decode(payload: Array[Byte], dim: Int = 8): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < dim) { out(j) /= math.max(1, payload.length / dim); j += 1 }
      }
      out
    }

    /** STUB frame sampler: returns `n` evenly spaced frame offsets. */
    def sampleFrames(nFrames: Int, n: Int): Array[Int] =
      if (nFrames <= 0 || n <= 0) Array.empty
      else Array.tabulate(math.min(n, nFrames))(i => i * nFrames / math.min(n, nFrames))
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * step: one decoder instance per partition (amortized init), rows
    * streamed through it. Output: (media_id, kind, features array). */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      // decoder/codec init would happen once per partition here
      it.map { r =>
        Row(r.getLong(idIdx), r.getString(kindIdx),
          FakeCodec.decode(r.getAs[Array[Byte]](payloadIdx), dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Column-level frame sampling: `n` evenly spaced offsets into an
    * `nFrames`-frame payload — same integer arithmetic as
    * [[FakeCodec.sampleFrames]] but as a pure expression
    * (sequence/transform), so planning a 100 TB frame-extraction job
    * never leaves the declarative plan. Empty for nFrames <= 0. */
  def frameSampleOffsets(nFrames: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val take = least(lit(n), nFrames)
    when(nFrames <= 0 || lit(n) <= 0, array().cast("array<int>"))
      .otherwise(transform(sequence(lit(0), take - 1),
        i => (i * nFrames.cast("long") / take.cast("long")).cast("int")))
  }

  /** STUB resize: a real build decodes, scales, and re-encodes the
    * payload; the deterministic stand-in truncates it to a
    * width×height byte budget (one byte per pixel placeholder) so the
    * plumbing — metadata rewrite, byte accounting, map-side-only
    * execution — is real and testable. Payloads already under budget
    * pass through unchanged; `meta.width/height` always update. Swap
    * the payload expression for a real codec call and nothing else
    * changes. */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"resize to ${width}x$height")
    // Long product, capped: 65536×65536 must not overflow Int to a
    // zero budget that would silently empty every payload
    val budget = math.min(width.toLong * height.toLong, Int.MaxValue.toLong).toInt
    df.withColumn("payload", substring(col("payload"), 1, budget))
      .withColumn("meta", struct(
        lit(width).as("width"), lit(height).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))
  }

  /** Payload-size-aware repartitioning: target ≤ `bytesPerPartition`
    * of media per task regardless of row-size skew. */
  def repartitionForPayloads(df: DataFrame, bytesPerPartition: Long): DataFrame = {
    val totalBytes = df.agg(sum(length(col("payload")))).head().getLong(0)
    val parts = math.max(1, (totalBytes / bytesPerPartition).toInt)
    df.repartition(parts)
  }

  /** Builds a deterministic multimodal frame from the documents table
    * (text bytes as stand-in payloads) — the fixture generator for
    * tests and demo queries. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 100).cast("int").as("n_frames")).as("meta"))
}
