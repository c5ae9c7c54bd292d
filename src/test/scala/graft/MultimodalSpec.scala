package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Binary-column plumbing: the mapPartitions decode path must agree with the
  * declarative q40 slice on the shared fields. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("frame sampling flatMaps one blob into bounded per-frame rows") {
    val docs = Seq((1L, "x" * 200, 200L), (2L, "ab", 2L))
      .toDF("doc_id", "text", "n_chars")
    val frames = Multimodal.sampleFrames(spark, Multimodal.attachBinary(docs),
        frameBytes = 64, maxFrames = 3)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).length == 3)            // 200 bytes → 4 windows, capped at 3
    assert(frames(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(frames(2L).length == 1 && frames(2L).head.mean_byte == (97 + 98) / 2.0)
  }

  /** A binary P6 RGB image: 4×2, samples 0..23 → mean 11.5. */
  private def ppm(w: Int, h: Int, seed: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val samples = Array.tabulate(w * h * 3)(i => ((i + seed) % 256).toByte)
    header ++ samples
  }

  test("netpbm decode is REAL: true dimensions, channels, and pixel mean") {
    val img = ppm(4, 2, 0)
    val gray = "P5\n# a comment\n3 3\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(9)(i => (i * 10).toByte)
    val docs = Seq((1L, img), (2L, gray), (3L, "not an image".getBytes("US-ASCII")))
      .toDF("doc_id", "data").withColumn("n_chars", lit(12L))
    val out = Multimodal.decodeFeatures(spark, docs).collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 4 && out(1L).height == 2 && out(1L).channels == 3)
    assert(out(1L).mean_byte == (0 until 24).sum / 24.0) // true pixel mean, not payload mean
    assert(out(2L).width == 3 && out(2L).height == 3 && out(2L).channels == 1)
    assert(out(2L).mean_byte == (0 until 9).map(_ * 10).sum / 9.0)
    // non-image payloads route to the declared stub (metadata-derived dims)
    assert(out(3L).width == 64 + 12 % 512 && out(3L).channels == 3)
  }

  test("PNG and BMP decode is REAL via the JDK's ImageIO: dimensions and exact mean") {
    // 4×2 gradient: pixel (x,y) has r=g=b = 16*(y*4+x) → mean = 16*3.5 = 56.0
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val v = 16 * (y * 4 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    for (fmt <- Seq("png", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"ImageIO lacks $fmt")
      val bytes = bos.toByteArray
      val r = Multimodal.decodeRaster(bytes).get
      assert((r.width, r.height, r.channels) == ((4, 2, 3)), fmt)
      assert(r.meanByte == 56.0, fmt)
      // end-to-end through the partition-wise kernel: raster rung wins
      val feats = Multimodal.decodeFeatures(spark,
        Seq((7L, bytes, 0L)).toDF("doc_id", "data", "n_chars")).collect()
      assert(feats.length == 1)
      assert((feats(0).width, feats(0).height, feats(0).mean_byte) == ((4L, 2L, 56.0)), fmt)
    }
    // non-raster payloads never reach ImageIO (magic sniff) → None
    assert(Multimodal.decodeRaster("plain text payload".getBytes).isEmpty)
  }

  test("corrupt raster payloads with valid magic fall back instead of crashing the task") {
    // a real PNG truncated mid-stream: magic sniff passes, ImageIO throws —
    // decodeRaster must return None (→ fakeDecode), like truncated netpbm
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val truncated = bos.toByteArray.take(bos.size() / 2)
    assert(Multimodal.decodeRaster(truncated).isEmpty)
    // and a pure garbage body behind a PNG signature
    val garbage = Array[Byte](0x89.toByte, 'P', 'N', 'G') ++ Array.fill(64)(0x41.toByte)
    assert(Multimodal.decodeRaster(garbage).isEmpty)
    // end-to-end: the kernel lands on the deterministic fake, not an exception
    val feats = Multimodal.decodeFeatures(spark,
      Seq((9L, truncated, 11L)).toDF("doc_id", "data", "n_chars")).collect()
    assert(feats.length == 1)
    assert(feats(0).width == 64 + 11 % 512) // fakeDecode's metadata-derived dims
  }

  test("truncated or high-maxval netpbm payloads fall back to the stub") {
    val truncated = ppm(4, 2, 0).dropRight(5)
    val wide = "P5\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill(8)(0.toByte)
    val docs = Seq((1L, truncated), (2L, wide)).toDF("doc_id", "data")
      .withColumn("n_chars", lit(7L))
    val out = Multimodal.decodeFeatures(spark, docs).collect()
    assert(out.forall(f => f.width == 64 + 7 % 512)) // stub dims, no crash
  }

  test("frame sampling splits a concatenated netpbm stream into real frames") {
    val stream = ppm(4, 2, 0) ++ ppm(4, 2, 100) ++ ppm(2, 2, 7)
    val docs = Seq((9L, stream)).toDF("doc_id", "data")
    val frames = Multimodal.sampleFrames(spark, docs, maxFrames = 8)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 3)
    assert(frames(0).mean_byte == (0 until 24).map(i => i % 256).sum / 24.0)
    assert(frames(1).mean_byte == (0 until 24).map(i => (i + 100) % 256).sum / 24.0)
    assert(frames(2).mean_byte == (0 until 12).map(i => (i + 7) % 256).sum / 12.0)
    assert(frames.map(_.frame_md5).distinct.length == 3)
  }

  /** A solid-color JPEG via the JDK's own encoder. */
  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "ImageIO lacks jpg")
    bos.toByteArray
  }

  test("MJPEG decode is REAL: marker-walk split + per-frame ImageIO pixel stats") {
    // three solid-color frames; JPEG encodes solid color near-losslessly,
    // so each decoded frame mean must land within 2 of its true color
    val colors = Seq(0x202020, 0x808080, 0xe0e0e0)
    val stream = colors.map(jpeg(16, 8, _)).reduce(_ ++ _)
    val docs = Seq((11L, stream)).toDF("doc_id", "data")
    val frames = Multimodal.sampleFrames(spark, docs, maxFrames = 8)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 3)
    frames.zip(Seq(0x20, 0x80, 0xe0)).foreach { case (f, c) =>
      assert(math.abs(f.mean_byte - c) < 2.0,
        s"frame ${f.frame_idx}: mean ${f.mean_byte} vs solid color $c")
    }
    assert(frames.map(_.frame_md5).distinct.length == 3)
    // maxFrames caps the split
    assert(Multimodal.sampleFrames(spark, docs, maxFrames = 2)
      .collect().length == 2)
  }

  test("jpegEnd skips an EXIF APP1 whose embedded thumbnail contains an EOI") {
    // naive FFD9 search would cut the frame inside the APP1 payload; the
    // marker walk must skip the whole length-prefixed segment instead
    val base = jpeg(8, 8, 0x404040)
    val thumbish = Array[Byte](
      'E', 'x', 'i', 'f', 0, 0,
      0xff.toByte, 0xd8.toByte, 0x55, 0x55, 0xff.toByte, 0xd9.toByte)
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((thumbish.length + 2) >> 8) & 0xff).toByte,
      ((thumbish.length + 2) & 0xff).toByte) ++ thumbish
    val withExif = base.take(2) ++ app1 ++ base.drop(2)
    assert(Multimodal.jpegEnd(withExif, 0).contains(withExif.length))
    // and in a 2-frame stream the second frame is still found intact
    val stream = withExif ++ jpeg(8, 8, 0xa0a0a0)
    val splits = Multimodal.splitMjpeg(stream, 8)
    assert(splits == Seq((0, withExif.length), (withExif.length, stream.length)))
  }

  test("a truncated trailing MJPEG frame yields the valid prefix, garbage yields the stub") {
    val f1 = jpeg(8, 8, 0x606060)
    val f2 = jpeg(8, 8, 0x909090)
    val truncStream = f1 ++ f2.dropRight(7)
    assert(Multimodal.splitMjpeg(truncStream, 8) == Seq((0, f1.length)))
    val frames = Multimodal.sampleFrames(spark,
        Seq((13L, truncStream)).toDF("doc_id", "data"), maxFrames = 8)
      .collect()
    assert(frames.length == 1 && math.abs(frames(0).mean_byte - 0x60) < 2.0)
    // non-JPEG payloads never enter the MJPEG path (stub windowing instead)
    assert(Multimodal.splitMjpeg("plain text".getBytes, 8).isEmpty)
  }

  test("decodeWav parses real PCM16 WAV payloads and rejects non-PCM/truncated ones") {
    def wav(channels: Int, rate: Int, samples: Seq[Short],
        extraChunk: Boolean = false): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(128 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataLen = samples.length * 2
      bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
      if (extraChunk) { // unknown chunk before fmt — must be skipped
        bb.put("LIST".getBytes); bb.putInt(4); bb.put("INFO".getBytes)
      }
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1.toShort); bb.putShort(channels.toShort)
      bb.putInt(rate); bb.putInt(rate * channels * 2)
      bb.putShort((channels * 2).toShort); bb.putShort(16.toShort)
      bb.put("data".getBytes); bb.putInt(dataLen)
      samples.foreach(s => bb.putShort(s))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val mono = wav(1, 8000, Seq[Short](0, 16384, -16384, 32767))
    val info = Multimodal.decodeWav(mono).get
    assert(info.channels == 1 && info.sampleRate == 8000 && info.nSamples == 4)
    assert(math.abs(info.durationMs - 0.5) < 1e-9)
    val amp = Multimodal.pcm16MeanAbs(mono, info.dataStart, info.dataEnd)
    assert(math.abs(amp - (0.0 + 16384 + 16384 + 32767) / 4 / 32768.0) < 1e-12)
    // chunk skipping: unknown LIST chunk before fmt
    assert(Multimodal.decodeWav(wav(2, 44100, Seq[Short](1, 2, 3, 4), extraChunk = true))
      .exists(w => w.channels == 2 && w.nSamples == 2))
    // rejects: truncated, non-RIFF, and declared-but-missing data bytes
    assert(Multimodal.decodeWav(mono.take(20)).isEmpty)
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeWav(mono.dropRight(2)).isEmpty)

    // the Dataset path: real WAVs decode, garbage rows are filtered
    val rows = Seq(
      (1L, mono),
      (2L, wav(2, 16000, Seq[Short](100, -100, 200, -200, 300, -300))),
      (3L, "plain text".getBytes))
    val df = rows.toDF("doc_id", "data")
    val got = Multimodal.audioFeatures(spark, df)
      .collect().map(f => f.doc_id -> f).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(2L).channels == 2 && got(2L).sample_rate == 16000 && got(2L).n_samples == 3)
  }

  test("decodeFeatures (mapPartitions) matches the declarative feature slice") {
    val docs = Seq((1L, "hello world", 11L), (2L, "abc", 3L))
      .toDF("doc_id", "text", "n_chars")
    val ds = Multimodal.decodeFeatures(spark, Multimodal.attachBinary(docs))
      .collect().map(f => f.doc_id -> f).toMap

    assert(ds(1L).byte_len == 11L)
    assert(ds(2L).byte_len == 3L)
    assert(ds(1L).width == 64 + 11 % 512 && ds(1L).height == 64 + (11 * 7) % 512)
    assert(ds(1L).channels == 3L)
    // md5 agrees with Spark's builtin over the same bytes
    val sqlMd5 = docs.filter(col("doc_id") === 1)
      .select(md5(col("text").cast("binary"))).as[String].head()
    assert(ds(1L).content_md5 == sqlMd5)
    // mean_byte of "abc" = (97+98+99)/3
    assert(math.abs(ds(2L).mean_byte - 98.0) < 1e-12)
  }
}
