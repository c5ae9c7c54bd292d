package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** The probabilistic guarantees the q80/q81 oracles alone cannot enforce:
  * the oracle hash-compare proves Spark and DuckDB agree on the flag
  * columns, but not that the flags are TRUE — that is the structural
  * invariant asserted here.
  */
class SketchesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("count-min never undercounts, and some overcount exists at this sizing") {
    // sf0.01: 150 users over w=64 buckets — collisions are certain; at
    // sf0.001 only 15 users exist and the sketch is trivially exact
    val rows = Sketches.q80CountMin.run(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), "estimate < exact would break the CMS guarantee")
    assert(rows.forall { case (exact, est, _) => est >= exact })
    // w=64 over hundreds of users: collisions must actually occur,
    // otherwise the sketch test is vacuous
    assert(rows.exists { case (exact, est, _) => est > exact },
      "no collision at w=64 — sizing no longer exercises overcounts")
  }

  test("bloom filter has no false negatives; false-positive rate stays sane") {
    val rows = Sketches.q81BloomFilter.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), "a member hashed to an unset bit: structural bug")
    val nonMembers = rows.count(!_._2)
    val falsePos = rows.count(r => r._1 && !r._2)
    // 1024 bits / k=3 over a few hundred members: FP rate must be well
    // under 100% (a saturated filter would make every probe positive)
    assert(nonMembers == 0 || falsePos < nonMembers,
      s"filter saturated: $falsePos false positives of $nonMembers non-members")
  }
}
