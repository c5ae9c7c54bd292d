package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Multimodal-column plumbing (BASELINE.json north star): media payloads as
  * opaque `binary` columns with typed metadata, decode/feature-extraction as
  * partition-wise batch functions.
  *
  * The decode ladder is REAL for two rungs and stubbed for the third:
  * (1) `decodePnm` — pure-JVM binary netpbm (P5/P6) header parse + pixel
  * statistics, concatenated-frame streams split; (2) `decodeRaster` —
  * PNG/BMP/GIF/JPEG through the JDK's own `javax.imageio` (magic-sniffed,
  * malformed payloads fall through); (3) `fakeDecode` — a clearly-marked
  * deterministic fake ONLY for formats with no JVM codec (video
  * containers, exotic audio). Everything around the kernel —
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
    * mean), then REAL ImageIO decode for PNG/BMP/GIF/JPEG, `fakeDecode`
    * fallback only for formats with no JVM codec. This is the kernel
    * `decodeFeatures` runs per row; `md` is the partition-scoped digest
    * (per-partition init, not per-row). */
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
      case None => decodeRaster(bytes) match {
        case Some(r) => MediaFeature(
          doc_id = docId,
          byte_len = bytes.length.toLong,
          content_md5 = md.digest(bytes).map("%02x".format(_)).mkString,
          width = r.width.toLong,
          height = r.height.toLong,
          channels = r.channels.toLong,
          mean_byte = r.meanByte)
        case None => fakeDecode(docId, bytes, nChars, md)
      }
    }

  /** A decoded standard-raster frame (see `decodeRaster`). */
  final case class RasterFrame(width: Int, height: Int, channels: Int, meanByte: Double)

  /** One-time JVM init for ImageIO: disable the tmp-file read cache on
    * executors. `setUseCache` mutates unsynchronized global state, so it
    * must run once per JVM (lazy val), not per row from task threads. */
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL decoder for the standard compressed raster containers — PNG,
    * BMP, GIF, JPEG — via the JDK's own `javax.imageio` (java.desktop
    * ships with every JDK, so these formats need no external codec; only
    * exotic/video containers remain on the declared stub below). A 4-byte
    * magic sniff rejects non-raster payloads before ImageIO probing, and a
    * payload whose magic matches but whose body is corrupt/truncated
    * (ImageIO throws IOException or a codec RuntimeException) returns None
    * — falling through to `fakeDecode` like truncated netpbm does, instead
    * of crashing the Spark task.
    * Mean byte is an exact integer sum of the R+G+B samples divided once
    * — deterministic across JVMs for the lossless formats. */
  def decodeRaster(bytes: Array[Byte]): Option[RasterFrame] = {
    if (bytes.length < 4) return None
    val isPng = (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'
    val isJpg = (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
    val isBmp = bytes(0) == 'B' && bytes(1) == 'M'
    val isGif = bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'
    if (!isPng && !isJpg && !isBmp && !isGif) return None
    imageIoInit
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight * 3L
        Some(RasterFrame(img.getWidth, img.getHeight,
          img.getColorModel.getNumComponents,
          if (n == 0) 0.0 else s.toDouble / n))
      }
    } catch {
      // Only the known ImageIO codec failure modes — a blanket RuntimeException
      // catch would silently degrade a genuine decode-kernel bug (e.g. an NPE)
      // to the fake path instead of surfacing it.
      case _: java.io.IOException | _: IllegalArgumentException |
           _: IndexOutOfBoundsException | _: java.awt.color.CMMException => None
    }
  }

  /** STUB decode kernel — deterministic fake standing in for formats with
    * no JVM codec (video containers, exotic audio). The fake derives
    * dimensions from metadata and a byte-mean "feature". */
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

  /** A parsed PCM WAV payload: format geometry + data-chunk sample bounds. */
  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataStart: Int, dataEnd: Int) {
    def nSamples: Long = (dataEnd - dataStart).toLong / (bitsPerSample / 8) / channels
    def durationMs: Double = nSamples * 1000.0 / sampleRate
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** REAL audio decoder for RIFF/WAVE PCM (audioFormat 1, 16-bit): walks
    * the chunk list (any order, unknown chunks skipped per the RIFF spec,
    * odd-size chunks padded), validates the fmt geometry against the data
    * bounds, and returns sample-addressable bounds. None for anything
    * else — truncated RIFF, float/compressed WAV, 8/24-bit — which
    * callers route to the declared stub, exactly like `decodePnm`. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    def tag(i: Int, t: String): Boolean =
      i + 4 <= bytes.length && t.indices.forall(k => bytes(i + k) == t.charAt(k))
    if (!tag(0, "RIFF") || bytes.length < 44 || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None
    while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(bytes, i + 4)
      val body = i + 8
      if (body + size > bytes.length || size < 0) return None
      if (tag(i, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(bytes, body)
        if (audioFormat != 1) return None // PCM only; float/ADPCM → stub
        fmt = Some((le16(bytes, body + 2), le32(bytes, body + 4).toInt,
          le16(bytes, body + 14)))
      } else if (tag(i, "data")) {
        data = Some((body, body + size.toInt))
      }
      i = body + size.toInt + (size.toInt & 1) // RIFF pads odd chunks
    }
    for {
      (ch, rate, bits) <- fmt
      (start, end) <- data
      if ch > 0 && rate > 0 && bits == 16 &&
        (end - start) % (ch * 2) == 0 && end <= bytes.length
    } yield WavInfo(ch, rate, bits, start, end)
  }

  /** Mean absolute amplitude of the PCM16 samples in [start, end) —
    * normalized to [0, 1] against full scale (32768). */
  def pcm16MeanAbs(bytes: Array[Byte], start: Int, end: Int): Double = {
    var s = 0L; var i = start
    while (i + 1 < end) {
      val v = (le16(bytes, i) << 16) >> 16 // sign-extend
      s += math.abs(v); i += 2
    }
    val n = (end - start) / 2
    if (n == 0) 0.0 else s.toDouble / n / 32768.0
  }

  /** Typed audio-feature row. */
  final case class AudioFeature(doc_id: Long, channels: Long, sample_rate: Long,
      n_samples: Long, duration_ms: Double, mean_abs_amplitude: Double)

  /** Partition-wise audio feature extraction (same iterator-in/iterator-out
    * batch shape as `decodeFeatures`): REAL features for PCM16 WAV, None
    * rows filtered for payloads needing a codec this container lacks. */
  def audioFeatures(spark: SparkSession, withData: DataFrame): Dataset[AudioFeature] = {
    import spark.implicits._
    withData.select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeWav(bytes).map { w =>
            AudioFeature(id, w.channels.toLong, w.sampleRate.toLong, w.nSamples,
              w.durationMs, pcm16MeanAbs(bytes, w.dataStart, w.dataEnd))
          }
        }
      }
  }

  /** Exclusive end offset of the JPEG frame starting at `from` (which must
    * point at an SOI marker), or None for truncated/malformed data. Walks
    * the REAL marker structure instead of searching for the EOI byte pair:
    * length-prefixed segments (APPn/DQT/SOF/...) are skipped wholesale —
    * so an EXIF APP1 whose embedded thumbnail contains its own EOI cannot
    * cut the frame short — and SOS entropy data is scanned honoring byte
    * stuffing (FF 00) and restart markers (FF D0–D7), the only FF forms
    * that can legally appear inside a compressed scan. */
  def jpegEnd(bytes: Array[Byte], from: Int): Option[Int] = {
    val n = bytes.length
    if (from + 2 > n || (bytes(from) & 0xff) != 0xff ||
        (bytes(from + 1) & 0xff) != 0xd8) return None
    var i = from + 2
    while (i + 2 <= n) {
      if ((bytes(i) & 0xff) != 0xff) return None // lost marker sync
      // fill bytes: any number of FFs may pad before the marker code
      while (i + 1 < n && (bytes(i + 1) & 0xff) == 0xff) i += 1
      if (i + 2 > n) return None
      val m = bytes(i + 1) & 0xff
      if (m == 0xd9) return Some(i + 2) // EOI
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
      else if (m == 0xda) { // SOS: skip header, then scan entropy data
        if (i + 4 > n) return None
        i += 2 + (((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff))
        var inScan = true
        while (inScan && i < n) {
          if ((bytes(i) & 0xff) != 0xff) i += 1
          else if (i + 1 >= n) return None
          else {
            val c = bytes(i + 1) & 0xff
            if (c == 0x00 || (c >= 0xd0 && c <= 0xd7)) i += 2 // stuffed/RST
            else inScan = false // a real marker (EOI, DNL, next SOS…)
          }
        }
        if (i >= n) return None
      } else { // length-prefixed segment
        if (i + 4 > n) return None
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

  /** Split an MJPEG payload (back-to-back JPEG frames — what `ffmpeg -f
    * mjpeg` emits) into frame byte ranges. Strict: frames must abut with
    * no inter-frame garbage; returns the longest valid prefix of frames,
    * or Nil if the payload doesn't start with a complete JPEG. */
  def splitMjpeg(bytes: Array[Byte], maxFrames: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var at = 0
    var count = 0
    while (count < maxFrames) {
      jpegEnd(bytes, at) match {
        case Some(end) => out += ((at, end)); at = end; count += 1
        case None => count = maxFrames // stop
      }
    }
    out.result()
  }

  /** Typed frame row for the video-style frame-sampling path. */
  final case class FrameFeature(
      doc_id: Long, frame_idx: Long, frame_md5: String, mean_byte: Double)

  /** Frame sampling: one input blob → N frame feature rows (iterator-out
    * cardinality change, the flatMap batch shape a video decoder needs).
    * REAL for two stream formats: concatenated netpbm (the uncompressed
    * format ffmpeg emits as `-f image2pipe -vcodec ppm`), split with
    * `decodePnm`, and MJPEG (back-to-back JPEGs, ffmpeg `-f mjpeg`), split
    * on the real marker structure with `jpegEnd` and decoded per-frame via
    * ImageIO for true pixel statistics. Only payloads matching neither
    * fall back to the STUB fixed-size windowing standing in for codecs the
    * JVM cannot host. */
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
              val jpegFrames = splitMjpeg(bytes, maxFrames)
              if (jpegFrames.nonEmpty) {
                // real MJPEG path: per-frame ImageIO decode for true pixel
                // stats; a frame whose entropy data is corrupt despite a
                // valid marker walk degrades to its raw byte mean
                jpegFrames.zipWithIndex.map { case ((s0, e0), i) =>
                  val frame = java.util.Arrays.copyOfRange(bytes, s0, e0)
                  val mean = decodeRaster(frame).map(_.meanByte)
                    .getOrElse(sampleMean(frame, 0, frame.length))
                  FrameFeature(id, i.toLong,
                    md.digest(frame).map("%02x".format(_)).mkString, mean)
                }
              } else {
                // stub path for compressed containers the JVM cannot host
                bytes.grouped(frameBytes).take(maxFrames).zipWithIndex.map { case (frame, i) =>
                  feature(id, i.toLong, frame, 0, frame.length)
                }.toSeq
              }
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
