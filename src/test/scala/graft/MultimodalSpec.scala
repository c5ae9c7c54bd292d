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
