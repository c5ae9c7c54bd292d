package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Multimodal-column plumbing (BASELINE.json north star): media payloads as
  * opaque `binary` columns with typed metadata, decode/feature-extraction as
  * partition-wise batch functions.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic fake (`fakeDecode`); everything around it —
  * schema, binary column handling, partition batching, the typed Dataset
  * signature — is the real plumbing a codec would plug into. The Scala
  * analog of a Pandas `mapInPandas` UDF is `mapPartitions` over a typed
  * Dataset: per-partition iterator-in/iterator-out, so a real decoder can
  * amortize model/codec init across a whole partition batch.
  */
object Multimodal {

  /** Typed decode output row. */
  final case class MediaFeature(
      doc_id: Long, byte_len: Long, content_md5: String,
      width: Long, height: Long, channels: Long, mean_byte: Double)

  /** Attach an opaque binary payload column (here: utf-8 bytes of `text`;
    * in production: the image/audio blob read from parquet/object store). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.withColumn("data", col("text").cast("binary"))

  /** STUB decode kernel — deterministic fake standing in for an image
    * decoder. Real implementation would parse the codec header; the fake
    * derives dimensions from metadata and a byte-mean "feature". */
  def fakeDecode(docId: Long, bytes: Array[Byte], nChars: Long): MediaFeature = {
    val sum = { var s = 0L; var i = 0; while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }; s }
    MediaFeature(
      doc_id = docId,
      byte_len = bytes.length.toLong,
      content_md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString,
      width = 64 + nChars % 512,
      height = 64 + (nChars * 7) % 512,
      channels = 3L,
      mean_byte = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
  }

  /** Partition-wise decode: iterator-in/iterator-out so codec/model init
    * happens once per partition, not per row (the mapInPandas batch shape). */
  def decodeFeatures(spark: SparkSession, docsWithData: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    docsWithData.select(col("doc_id"), col("data"), col("n_chars"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition init would go here (codec handles, model weights)
        it.map { case (id, bytes, n) => fakeDecode(id, bytes, n) }
      }
  }

  /** Typed frame row for the video-style frame-sampling path. */
  final case class FrameFeature(
      doc_id: Long, frame_idx: Long, frame_md5: String, mean_byte: Double)

  /** Frame sampling: one input blob → N frame feature rows (iterator-out
    * cardinality change, the flatMap batch shape a video decoder needs).
    * The STUB splits the payload into fixed-size windows standing in for
    * decoded frames; a real codec would seek keyframes. */
  def sampleFrames(spark: SparkSession, docsWithData: DataFrame, frameBytes: Int = 64,
      maxFrames: Int = 8): Dataset[FrameFeature] = {
    import spark.implicits._
    docsWithData.select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (codec handle) would go here
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          bytes.grouped(frameBytes).take(maxFrames).zipWithIndex.map { case (frame, i) =>
            val sum = frame.foldLeft(0L)((s, b) => s + (b & 0xff))
            FrameFeature(id, i.toLong,
              md.digest(frame).map("%02x".format(_)).mkString,
              if (frame.isEmpty) 0.0 else sum.toDouble / frame.length)
          }
        }
      }
  }

  /** q40 — the declarative slice of the media pipeline (binary length, content
    * hash, fake-decoded dimensions) so the plumbing is oracle-checkable; the
    * mapPartitions path is exercised by the ScalaTest spec. */
  val q40MediaFeatures: Q = Q(
    "q40_multimodal_features",
    (s, dir) => attachBinary(Tables(s, dir, "documents"))
      .select(
        col("doc_id"),
        length(col("data")).cast("long").as("byte_len"),
        md5(col("data")).as("content_md5"),
        (lit(64) + col("n_chars") % 512).as("width"),
        (lit(64) + (col("n_chars") * 7) % 512).as("height"),
        lit(3L).as("channels"))
      .withColumn("aspect", col("width").cast("double") / col("height")),
    Some("""SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS content_md5,
      |  64 + n_chars % 512 AS width,
      |  64 + (n_chars * 7) % 512 AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(64 + n_chars % 512 AS DOUBLE) / (64 + (n_chars * 7) % 512) AS aspect
      |FROM documents""".stripMargin))

  val all: Seq[Q] = Seq(q40MediaFeatures)
}
