package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark,
    Tables(spark, "/root/testdata/sf0.001", "documents"))

  test("synthetic media frame matches the canonical schema shape") {
    assert(media.columns.toSeq == Seq("media_id", "kind", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, fixed-dim, partition-batched") {
    val f1 = Multimodal.extractFeatures(media, dim = 8)
    assert(f1.schema("features").dataType.typeName == "array")
    val rows = f1.orderBy("media_id").limit(3).collect()
    assert(rows.forall(_.getSeq[Double](2).length == 8))
    val again = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").limit(3).collect()
    assert(rows.map(_.getSeq[Double](2)).toSeq == again.map(_.getSeq[Double](2)).toSeq)
  }

  test("distributed feature extraction equals the local FakeCodec kernel per row") {
    // pins the d06 VALUES, not just determinism: the partition-batched
    // distributed path must reproduce FakeCodec.decode applied locally
    // to each payload's bytes — the contract that survives swapping the
    // stub for a real decoder (only the kernel changes, not the plumbing)
    val rows = media.orderBy("media_id").limit(10)
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    val got = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").limit(10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    rows.foreach { case (id, payload) =>
      val want = Multimodal.FakeCodec.decode(payload, dim = 8).toSeq
      assert(got(id) == want, s"media $id: distributed != local kernel")
    }
  }

  test("payload-size-aware repartitioning bounds bytes per task") {
    val parts = Multimodal.repartitionForPayloads(media, bytesPerPartition = 4096)
      .rdd.getNumPartitions
    assert(parts >= 2, "50 docs x ~250B should split into multiple partitions")
  }

  test("resize stub truncates to the pixel budget, rewrites metadata, passes short payloads") {
    import org.apache.spark.sql.functions._
    val media = graft.operators.Multimodal.syntheticMedia(spark,
      Tables(spark, "/root/testdata/sf0.001", "documents"))
    val resized = graft.operators.Multimodal.resizeStub(media, 8, 8)
    val rows = resized.select(length(col("payload")), col("meta.width"),
        col("meta.height")).collect()
    assert(rows.forall(_.getInt(0) <= 64), "payloads truncated to 8*8 bytes")
    assert(rows.forall(r => r.getInt(1) == 8 && r.getInt(2) == 8))
    // short payloads pass through byte-identical
    val tiny = media.filter(length(col("payload")) <= 64)
      .select(col("media_id"), col("payload"))
    if (tiny.count() > 0) {
      val joined = tiny.join(
        graft.operators.Multimodal.resizeStub(media, 8, 8)
          .select(col("media_id"), col("payload").as("p2")), "media_id")
      assert(joined.filter(col("payload") =!= col("p2")).count() == 0)
    }
  }

  test("frame sampler stub: even spacing, bounds respected") {
    assert(Multimodal.FakeCodec.sampleFrames(100, 4).toSeq == Seq(0, 25, 50, 75))
    assert(Multimodal.FakeCodec.sampleFrames(2, 5).toSeq == Seq(0, 1))
    assert(Multimodal.FakeCodec.sampleFrames(0, 5).isEmpty)
  }

  test("frameSampleOffsets column matches FakeCodec.sampleFrames") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(0, 1, 2, 3, 4, 7, 50, 99).toDF("nf")
    val got = df.select(col("nf"),
      Multimodal.frameSampleOffsets(col("nf"), 4).as("off"))
      .as[(Int, Seq[Int])].collect().toMap
    for ((nf, off) <- got)
      assert(off == Multimodal.FakeCodec.sampleFrames(nf, 4).toSeq, s"nf=$nf")
  }
}
