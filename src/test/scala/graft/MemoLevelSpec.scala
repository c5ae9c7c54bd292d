package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins the heap-adaptive storage level for memoized dedup intermediates
  * (ADVICE r15 item 3 — the change whose half-edited form broke the r15
  * build, now finished properly).
  *
  * Why it exists: deserialized MEMORY_AND_DISK block sizes are
  * SizeEstimator ESTIMATES; under a tight heap the underestimation lets
  * the block store overfill physical heap before eviction starts — the
  * 2 GiB full-registry probe died of raw OutOfMemoryError in q48 with
  * every family memo warm, while q48 alone at 2 GiB passed. Serialized
  * blocks are byte-exact accounted (~4× smaller), so small heaps must
  * trade per-reuse deserialization CPU for survival. These branches are
  * CI-pinned so a refactor can't silently flip the policy.
  */
class MemoLevelSpec extends AnyFunSuite {

  test("GRAFT_MEMO_SER=1 forces serialized persistence") {
    assert(Dedup.memoLevelFor(Some("1"), Long.MaxValue) ==
      StorageLevel.MEMORY_AND_DISK_SER)
  }

  test("GRAFT_MEMO_SER=0 forces deserialized persistence") {
    assert(Dedup.memoLevelFor(Some("0"), 1L << 30) ==
      StorageLevel.MEMORY_AND_DISK)
  }

  test("auto: serialized below a 6 GiB max heap, deserialized at/above") {
    // the r15 constrained probes ran at 2 and 4 GiB — both must auto-SER
    assert(Dedup.memoLevelFor(None, 2L << 30) ==
      StorageLevel.MEMORY_AND_DISK_SER)
    assert(Dedup.memoLevelFor(None, 4L << 30) ==
      StorageLevel.MEMORY_AND_DISK_SER)
    assert(Dedup.memoLevelFor(None, (6L << 30) - 1) ==
      StorageLevel.MEMORY_AND_DISK_SER)
    // the boundary itself and roomy heaps keep deserialized reuse speed
    assert(Dedup.memoLevelFor(None, 6L << 30) ==
      StorageLevel.MEMORY_AND_DISK)
    assert(Dedup.memoLevelFor(None, 128L << 30) ==
      StorageLevel.MEMORY_AND_DISK)
  }

  test("unrecognized GRAFT_MEMO_SER values fall back to the heap heuristic") {
    assert(Dedup.memoLevelFor(Some("yes"), 2L << 30) ==
      StorageLevel.MEMORY_AND_DISK_SER)
    assert(Dedup.memoLevelFor(Some(""), 64L << 30) ==
      StorageLevel.MEMORY_AND_DISK)
  }
}
