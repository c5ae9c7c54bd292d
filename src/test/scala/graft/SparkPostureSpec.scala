package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two load-bearing properties of the harness posture:
  * the zstd shuffle codec is part of every harness session (the sf100
  * find: the single-disk shuffle path is bytes-bound — lz4→zstd was 5-7×
  * on the 600M-row star join), and an explicit -Dspark.* system property
  * wins over the posture so GRAFT_SPARK_OPTS probes can A/B codecs
  * without source edits. */
class SparkPostureSpec extends AnyFunSuite {

  test("posture carries the zstd shuffle codec and bigger file buffers") {
    val m = SparkPosture.effective.toMap
    assert(m.get("spark.io.compression.codec").contains("zstd"))
    assert(m.get("spark.shuffle.file.buffer").contains("1m"))
  }

  test("an explicit -D system property removes the key from the posture") {
    val key = "spark.io.compression.codec"
    sys.props(key) = "lz4"
    try {
      val m = SparkPosture.effective.toMap
      assert(!m.contains(key), "posture must yield to the launcher's -D")
      // untouched keys stay
      assert(m.get("spark.shuffle.file.buffer").contains("1m"))
    } finally sys.props.remove(key)
  }
}
