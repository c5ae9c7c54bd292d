package graft.tools

import org.apache.spark.sql.SparkSession

/** Long-lived-driver soak (follows the r15 checkpoint-leak fix): a serving
  * driver that runs the dedup/similarity family per request must hold ZERO
  * growing state across request cycles — before Checkpoints, every cycle
  * leaked its localCheckpoint blocks, so block count grew linearly until
  * the ContextCleaner happened to GC. This probe runs `rounds` cycles of
  * the whole family (one fresh child session per cycle, the multi-tenant
  * shape), releases after each, and records persisted-RDD count, tracked
  * checkpoint count, memo keys, and heap after GC. PASS = all three
  * counters return to the pre-cycle baseline every cycle and used heap
  * stays bounded (no monotone growth).
  *
  * Usage: tools/run.sh graft.tools.SessionSoak [sfDir] [rounds=5]
  */
object SessionSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val root = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("ERROR")

    val family = Seq(
      graft.operators.Dedup.q30ExactDedup, graft.operators.Dedup.q31NgramJaccard,
      graft.operators.Dedup.q32MinHashLsh, graft.operators.Dedup.q33SimHash,
      graft.operators.Dedup.q48DedupClusters,
      graft.operators.Dedup.q113DedupSurvivorsLsh,
      graft.operators.Dedup.q34EmbeddingDups,
      graft.operators.SimilaritySearch.q36LshTopK,
      graft.operators.SimilaritySearch.q111EmbeddingClusters,
      graft.operators.Graph.q68PagerankStep)

    def usedHeapMb(): Long = {
      System.gc(); Thread.sleep(200)
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
    }
    val baseBlocks = root.sparkContext.getPersistentRDDs.size
    println(s"[soak] baseline persisted_rdds=$baseBlocks heap_mb=${usedHeapMb()}")
    var failed = false
    var firstCycleHeap = 0L
    for (r <- 1 to rounds) {
      val s = root.newSession()
      val rows = family.map(q => q.run(s, sfDir).count()).sum
      graft.operators.Dedup.releaseCaches(s)
      // releaseCaches unpersists async — give the block manager a moment
      var blocks = root.sparkContext.getPersistentRDDs.size
      val deadline = System.nanoTime() + 15e9.toLong
      while (blocks != baseBlocks && System.nanoTime() < deadline) {
        Thread.sleep(200); blocks = root.sparkContext.getPersistentRDDs.size
      }
      val ckpts = graft.operators.Checkpoints.trackedIdsFor(s).size
      val memos = graft.operators.Dedup.memoKeysFor(s).size
      val heap = usedHeapMb()
      if (r == 1) firstCycleHeap = heap
      val ok = blocks == baseBlocks && ckpts == 0 && memos == 0
      if (!ok) failed = true
      println(s"[soak] cycle $r: rows=$rows persisted_rdds=$blocks " +
        s"tracked_ckpts=$ckpts memo_keys=$memos heap_mb=$heap " +
        (if (ok) "clean" else "LEAK"))
    }
    val endHeap = usedHeapMb()
    // bounded-heap check: allow 50% headroom over the first post-cycle
    // measurement for JIT/code-cache/metaspace warm growth; monotone leak
    // across cycles would blow well past that
    val heapOk = endHeap <= firstCycleHeap * 3 / 2 + 256
    println(s"[soak] ${if (!failed && heapOk) "PASS" else "FAIL"} " +
      s"rounds=$rounds final_heap_mb=$endHeap first_cycle_heap_mb=$firstCycleHeap " +
      s"(bound ${firstCycleHeap * 3 / 2 + 256})")
    root.stop()
    if (failed || !heapOk) sys.exit(1)
  }
}
