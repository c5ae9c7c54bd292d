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

  test("bypass writer is capped so wide shuffles spill instead of OOM") {
    // r15 constrained run: at the DEFAULT threshold (200) a 200-partition
    // shuffle x 32 tasks x the 1m buffer above = 6.4 GB of raw writer
    // buffers OUTSIDE the memory manager — crashed a 4 GiB heap with zero
    // prior spills. The cap must not silently revert (e.g. on a Spark
    // upgrade or a posture edit that drops the pair with file.buffer).
    val m = SparkPosture.effective.toMap
    assert(m.get("spark.shuffle.sort.bypassMergeThreshold").contains("32"),
      "bypassMergeThreshold=32 is load-bearing with the 1m file buffer")
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
