package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Multimodal-column plumbing (BASELINE.json north star): media payloads as
  * opaque `binary` columns with typed metadata, decode/feature-extraction as
  * partition-wise batch functions.
  *
  * The decode kernel is REAL for uncompressed binary netpbm payloads
  * (`decodePnm`: P5 grayscale / P6 RGB headers parsed, true dimensions and
  * pixel statistics computed, concatenated-frame streams split — pure JVM,
  * no codec dependency), and a clearly-marked deterministic fake
  * (`fakeDecode`) stands in ONLY for compressed formats (JPEG/PNG/audio),
  * whose codecs this container cannot host. Everything around the kernel —
  * schema, binary column handling, partition batching, the typed Dataset
  * signature — is the production plumbing either kernel plugs into. The
  * Scala analog of a Pandas `mapInPandas` UDF is `mapPartitions` over a
  * typed Dataset: per-partition iterator-in/iterator-out, so a decoder
  * amortizes codec/model init across a whole partition batch.
  */
object Multimodal {

  /** A decoded netpbm frame: dimensions, channel count, payload offset of
    * the first sample, and the exclusive end offset. */
  final case class PnmFrame(width: Int, height: Int, channels: Int,
      dataStart: Int, dataEnd: Int)

  /** REAL decoder for binary netpbm (P5 = 1-channel grayscale, P6 = 3-channel
    * RGB, maxval ≤ 255): parses the header (whitespace + '#' comments per the
    * spec), validates the payload length, and returns sample bounds. Returns
    * None for anything else — truncated data, 2-byte-sample maxval, or a
    * compressed format — which callers route to the declared stub. */
  def decodePnm(bytes: Array[Byte], from: Int = 0): Option[PnmFrame] = {
    if (from + 2 > bytes.length || bytes(from) != 'P') return None
    val channels = bytes(from + 1) match {
      case '5' => 1
      case '6' => 3
      case _ => return None
    }
    var i = from + 2
    def skipSpace(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipSpace()
      var v = -1
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly ONE whitespace byte separates maxval from the samples (netpbm
    // spec); anything else is a malformed header whose acceptance would shift
    // every sample offset by one — route it to the fallback instead
    if (i >= bytes.length || !(bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\r' || bytes(i) == '\n')) return None
    i += 1
    // Long arithmetic: adversarial header dims (e.g. 46341×46341) overflow
    // an Int product and would otherwise slip past the length check
    val end = i.toLong + w.toLong * h.toLong * channels
    if (i > bytes.length || end > bytes.length) None
    else Some(PnmFrame(w, h, channels, i, end.toInt))
  }

  private def sampleMean(bytes: Array[Byte], start: Int, end: Int): Double = {
    if (end <= start) return 0.0
    var s = 0L; var i = start
    while (i < end) { s += bytes(i) & 0xff; i += 1 }
    s.toDouble / (end - start)
  }

  /** Typed decode output row. */
  final case class MediaFeature(
      doc_id: Long, byte_len: Long, content_md5: String,
      width: Long, height: Long, channels: Long, mean_byte: Double)

  /** Attach an opaque binary payload column (here: utf-8 bytes of `text`;
    * in production: the image/audio blob read from parquet/object store). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.withColumn("data", col("text").cast("binary"))

  /** Decode one payload: REAL parse for netpbm (true dimensions + pixel
    * mean), `fakeDecode` fallback for formats whose codecs the container
    * can't host. This is the kernel `decodeFeatures` runs per row; `md` is
    * the partition-scoped digest (per-partition init, not per-row). */
  def decode(docId: Long, bytes: Array[Byte], nChars: Long,
      md: java.security.MessageDigest): MediaFeature =
    decodePnm(bytes) match {
      case Some(f) => MediaFeature(
        doc_id = docId,
        byte_len = bytes.length.toLong,
        content_md5 = md.digest(bytes).map("%02x".format(_)).mkString,
        width = f.width.toLong,
        height = f.height.toLong,
        channels = f.channels.toLong,
        mean_byte = sampleMean(bytes, f.dataStart, f.dataEnd))
      case None => fakeDecode(docId, bytes, nChars, md)
    }

  /** STUB decode kernel — deterministic fake standing in for a COMPRESSED
    * format's decoder (JPEG/PNG/audio; no codecs in this container). The
    * fake derives dimensions from metadata and a byte-mean "feature". */
  def fakeDecode(docId: Long, bytes: Array[Byte], nChars: Long,
      md: java.security.MessageDigest): MediaFeature = {
    val sum = { var s = 0L; var i = 0; while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }; s }
    MediaFeature(
      doc_id = docId,
      byte_len = bytes.length.toLong,
      content_md5 = md.digest(bytes).map("%02x".format(_)).mkString,
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
        // per-partition init: one digest per partition, not per row
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes, n) => decode(id, bytes, n, md) }
      }
  }

  /** Typed frame row for the video-style frame-sampling path. */
  final case class FrameFeature(
      doc_id: Long, frame_idx: Long, frame_md5: String, mean_byte: Double)

  /** Frame sampling: one input blob → N frame feature rows (iterator-out
    * cardinality change, the flatMap batch shape a video decoder needs).
    * REAL for concatenated-netpbm streams (the uncompressed frame format
    * ffmpeg emits as `-f image2pipe -vcodec ppm`): frames are parsed
    * back-to-back with `decodePnm` until the payload is exhausted. Payloads
    * that are not netpbm streams fall back to the STUB fixed-size windowing
    * standing in for a compressed codec's keyframe seek. */
  def sampleFrames(spark: SparkSession, docsWithData: DataFrame, frameBytes: Int = 64,
      maxFrames: Int = 8): Dataset[FrameFeature] = {
    import spark.implicits._
    docsWithData.select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (codec handle) would go here
        val md = java.security.MessageDigest.getInstance("MD5")
        def feature(id: Long, idx: Long, frame: Array[Byte], meanStart: Int, meanEnd: Int) =
          FrameFeature(id, idx,
            md.digest(frame).map("%02x".format(_)).mkString,
            sampleMean(frame, meanStart, meanEnd))
        it.flatMap { case (id, bytes) =>
          decodePnm(bytes) match {
            case Some(first) =>
              // real path: split the concatenated stream into frames
              val frames = Iterator.iterate(Option(first)) {
                case Some(f) => decodePnm(bytes, f.dataEnd)
                case None => None
              }.takeWhile(_.isDefined).map(_.get).take(maxFrames).toSeq
              frames.zipWithIndex.map { case (f, i) =>
                val frame = java.util.Arrays.copyOfRange(bytes,
                  if (i == 0) 0 else frames(i - 1).dataEnd, f.dataEnd)
                feature(id, i.toLong, frame,
                  f.dataStart - (if (i == 0) 0 else frames(i - 1).dataEnd),
                  f.dataEnd - (if (i == 0) 0 else frames(i - 1).dataEnd))
              }
            case None =>
              // stub path for compressed containers
              bytes.grouped(frameBytes).take(maxFrames).zipWithIndex.map { case (frame, i) =>
                feature(id, i.toLong, frame, 0, frame.length)
              }.toSeq
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
