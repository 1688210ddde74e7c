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

  test("oracle parity precondition: fixture text is pure ASCII (chars==bytes)") {
    // the media oracles (q40/q41/q70/q161/q163/q168) slice VARCHAR by
    // characters while Spark slices the payload by bytes — identical only
    // when every document's char count equals its UTF-8 byte count
    val nonAscii = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(length(col("text")) =!=
        length(encode(col("text"), "UTF-8")))
      .count()
    assert(nonAscii === 0,
      s"$nonAscii documents are non-ASCII: byte-sliced Spark blocks and " +
        "char-sliced oracle blocks would diverge")
  }

  test("q168 mediaKeepSummary: per-kind counts partition the corpus") {
    val rows = Multimodal.mediaKeepSummary(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("audio", "image", "video"))
    rows.foreach { r =>
      assert(r.getAs[Int]("n_kept") + r.getAs[Int]("n_dropped") ===
        r.getAs[Int]("n_media"), r.toString)
      assert(r.getAs[Int]("n_dropped") > 0, s"no dups found for ${r.getString(0)}")
    }
    // total = base docs + injected variants
    val nDocs = graft.sources.Tables.load(spark, sfDir, "documents").count()
    val nVar = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0).count()
    assert(rows.map(_.getAs[Int]("n_media").toLong).sum === nDocs + nVar)
  }

  test("q161 mediaDedupExact: copies collapse onto base-id canonicals") {
    val res = Multimodal.mediaDedupExact(spark, sfDir).collect()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    val nInjected = docs.filter(col("doc_id") % 10 === 0).count()
    assert(res.length === nDocs) // base payloads are distinct
    assert(res.count(_.getAs[Int]("n_copies") == 2) === nInjected)
    assert(res.forall(
      _.getAs[Long]("canonical_id") < Multimodal.MediaVariantOffset))
  }

  test("q163 mediaNearDup: every header-rewritten variant pairs with its " +
    "base at block-Jaccard >= 1/2") {
    val pairs = Multimodal.mediaNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Int]("n_shared"), r.getAs[Int]("n_union")))
    // integer threshold holds on every emitted pair
    pairs.foreach { case (_, _, sh, un) =>
      assert(sh > 0 && un >= sh && 2 * sh >= un)
    }
    // injected variants: base docs long enough to share >= half their
    // blocks after the 16-byte header rewrite (>= 3 blocks)
    val off = Multimodal.MediaVariantOffset
    val expected = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 20 === 0 &&
        length(col("text")) > 2 * Multimodal.MediaBlockBytes)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val found = pairs.collect {
      case (a, b, _, _) if b == a + off => a
    }.toSet
    assert(expected.subsetOf(found),
      s"missing variant pairs for bases ${expected -- found}")
  }
}
