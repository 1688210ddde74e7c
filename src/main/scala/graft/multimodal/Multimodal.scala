package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The Spark-side plumbing — schema, partitioning, typed mapPartitions
  * batch shape — is real and tested. The codec step itself is a STUB: this
  * container has no image/audio libraries, so `decode` derives a
  * deterministic fake "decoded" representation from the bytes (documented
  * on each method). Swapping in a real codec changes only the marked
  * function bodies, not the distributed shape.
  *
  * Scale notes: binary payloads ride in parquet row groups; all operators
  * are narrow per-partition maps (zero shuffle), so they scale with input
  * splits. Metadata-only queries (q40) never touch `content` thanks to
  * parquet column pruning.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Deterministic synthetic media table derived from `documents`: content =
    * utf-8 bytes of text, kind by doc_id mod 3, metadata from content size.
    * (TESTDATA carries no real media; this provides a reproducible fixture
    * with the exact schema a real ingest would produce.) */
  def fromDocuments(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          (pmod(col("n_chars"), lit(64)) + 16).cast(IntegerType).as("width"),
          (pmod(col("n_chars"), lit(48)) + 12).cast(IntegerType).as("height"),
          lit(16000).as("sample_rate"),
          (pmod(col("n_chars"), lit(30)) + 1).cast(IntegerType).as("n_frames"))
          .as("meta"))

  /** Metadata extraction — never reads `content` beyond length/hash;
    * demonstrates column pruning on binary tables. */
  def mediaMetadata(s: SparkSession, dir: String): DataFrame =
    fromDocuments(s, dir).select(
      col("media_id"), col("kind"),
      length(col("content")).cast(LongType).as("n_bytes"),
      md5(col("content")).as("content_md5"),
      col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy("media_id")

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, features: Array[Float],
                                 top_bin: Int)

  /** Feature extraction over binary content via typed mapPartitions — the
    * batch shape a real decoder would use (iterate a partition, run the
    * codec per element, emit fixed-width features).
    *
    * STUB CODEC: features = 16-bin normalized byte histogram (deterministic,
    * real math on the raw bytes). A real implementation would replace
    * `byteHistogram` with pixel/spectrogram statistics post-decode. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content").as[MediaRow]
      .mapPartitions { iter =>
        iter.map { m =>
          val counts = byteCounts(m.content)
          MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
            normalize(counts, m.content.length), topBin(counts))
        }
      }
  }

  private[graft] def byteCounts(bytes: Array[Byte]): Array[Int] = {
    val counts = new Array[Int](16)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    counts
  }

  private def normalize(counts: Array[Int], len: Int): Array[Float] = {
    val hist = new Array[Float](16)
    if (len > 0) { var j = 0
      while (j < 16) { hist(j) = counts(j) / len.toFloat; j += 1 } }
    hist
  }

  /** Dominant high-nibble bin, ties toward the smaller bin — integer-exact,
    * the oracle-checkable projection of the stub features. */
  private[graft] def topBin(counts: Array[Int]): Int = {
    var best = 0; var j = 1
    while (j < 16) { if (counts(j) > counts(best)) best = j; j += 1 }
    best
  }

  private[graft] def byteHistogram(bytes: Array[Byte]): Array[Float] =
    normalize(byteCounts(bytes), bytes.length)

  /** "Resize" — STUB: truncates/pads the payload to the target byte budget
    * and rewrites metadata, preserving the narrow-map distributed shape of
    * a real resampler. */
  def resize(media: DataFrame, targetWidth: Int, targetHeight: Int): DataFrame = {
    val budget = targetWidth * targetHeight
    media
      .withColumn("content", substring(col("content"), 1, budget))
      .withColumn("meta", struct(
        lit(targetWidth).as("width"), lit(targetHeight).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))
  }

  /** Frame sampling for `video` rows — STUB: treats each 256-byte block as a
    * "frame" and keeps every `stride`-th block (posexplode + filter, the
    * same plan real frame extraction would produce; one narrow explode). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val nBlocks = ceil(length(col("content")) / lit(256.0)).cast(IntegerType)
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nBlocks - 1, lit(0)), lit(stride))))
      .select(col("media_id"), col("frame_idx"),
        expr("substring(content, frame_idx * 256 + 1, 256)").as("frame_bytes"))
  }

  /** q70: frame sampling as a query — every `stride`-th 256-byte block of
    * each video payload, fingerprinted. The narrow posexplode shape real
    * frame extraction produces (one input row → n_frames output rows, no
    * shuffle before the presentation sort). Oracle-able because the stub
    * content is the documents' ASCII text: byte offsets == char offsets. */
  val FrameStride = 2 // q70 sampling step — interpolated into the oracle SQL

  def frameSampleQuery(s: SparkSession, dir: String,
                       stride: Int = FrameStride): DataFrame =
    sampleFrames(fromDocuments(s, dir), stride)
      .select(col("media_id"),
        col("frame_idx").cast(IntegerType).as("frame_idx"),
        md5(col("frame_bytes")).as("frame_md5"),
        length(col("frame_bytes")).cast(IntegerType).as("frame_len"))
      .orderBy("media_id", "frame_idx")

  /** q40 oracle: metadata extraction is SQL-expressible (md5 of utf-8 text
    * bytes = md5 of the blob). */
  def oracleSql: Map[String, String] = Map(
    "q70_frame_sample" ->
      s"""WITH v AS (SELECT doc_id AS media_id, text FROM documents
        |    WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id, text,
        |    unnest(range(0, greatest(CAST(ceil(length(text) / 256.0) AS BIGINT), 1),
        |      $FrameStride)) AS frame_idx
        |  FROM v)
        |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  md5(substr(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256)) AS frame_md5,
        |  CAST(length(substr(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256))
        |    AS INTEGER) AS frame_len
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    // q41: the stub features' integer projection (dominant high-nibble bin)
    // is SQL-expressible because documents are printable ASCII: per-char
    // code >> 4 == per-utf8-byte nibble.
    "q41_media_features" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, length(text)),
        |    i -> ascii(substr(text, CAST(i AS INTEGER), 1)) >> 4)) AS bin
        |  FROM documents),
        |counts AS (SELECT doc_id, bin, count(*) AS cnt FROM chars GROUP BY 1, 2),
        |top AS (SELECT doc_id, bin,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bin) AS rn
        |  FROM counts)
        |SELECT d.doc_id AS media_id,
        |  CASE CAST(d.doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(COALESCE(t.bin, 0) AS INTEGER) AS top_bin
        |FROM documents d LEFT JOIN top t ON d.doc_id = t.doc_id AND t.rn = 1
        |ORDER BY media_id""".stripMargin,
    "q40_media_metadata" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  CAST(n_chars % 64 + 16 AS INTEGER) AS width,
        |  CAST(n_chars % 48 + 12 AS INTEGER) AS height
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
