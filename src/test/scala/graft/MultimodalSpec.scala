package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("fromDocuments produces the media schema with deterministic content") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    // simpleString compares names+types, ignoring nullability flags
    assert(media.schema.simpleString === Multimodal.mediaSchema.simpleString)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    // content bytes round-trip the source text
    val row = media.filter(col("media_id") === 0)
      .join(graft.sources.Tables.load(spark, sfDir, "documents"),
        col("media_id") === col("doc_id"))
      .select(decode(col("content"), "UTF-8"), col("text")).head
    assert(row.getString(0) === row.getString(1))
  }

  test("extractFeatures: 16-bin histogram sums to ~1 per row") {
    val feats = Multimodal.extractFeatures(
      Multimodal.fromDocuments(spark, sfDir)).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3)
      assert(f.n_bytes > 0)
    }
  }

  test("byteHistogram is exact on known bytes") {
    val h = Multimodal.byteHistogram(Array[Byte](0x00, 0x10, 0x10, 0x7f))
    assert(h(0) === 0.25f && h(1) === 0.5f && h(7) === 0.25f)
  }

  test("resize truncates content and rewrites metadata") {
    val resized = Multimodal.resize(
      Multimodal.fromDocuments(spark, sfDir), 8, 8)
    val r = resized.select(length(col("content")).as("len"),
      col("meta.width"), col("meta.height")).collect()
    r.foreach { row =>
      assert(row.getInt(0) <= 64)
      assert(row.getInt(1) === 8 && row.getInt(2) === 8)
    }
  }

  test("sampleFrames keeps every Nth 256-byte block of video rows") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val idx = frames.select("frame_idx").collect().map(_.getInt(0))
    assert(idx.nonEmpty)
    assert(idx.forall(_ % 2 === 0))
    val nonVideo = frames.join(media.filter(col("kind") =!= "video"),
      Seq("media_id"), "left_semi").count()
    assert(nonVideo === 0)
  }
}
