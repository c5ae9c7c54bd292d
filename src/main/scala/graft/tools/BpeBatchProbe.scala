package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TextAnalysis

/** Evidence probe for the batched BPE trainer: merge-table parity plus the
  * superstep/wall-time reduction vs the sequential loop.
  * Usage: runMain graft.tools.BpeBatchProbe <sfDir> <merges> [maxBatch] */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val merges = args(1).toInt
    val maxBatch = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup round: pay codegen/JIT outside either measurement
    TextAnalysis.bpeTrainBatched(spark, sfDir, math.min(merges, 8), maxBatch)
    val t0 = System.nanoTime()
    val seq = TextAnalysis.bpeTrain(spark, sfDir, merges)
    val t1 = System.nanoTime()
    val (bat, steps) = TextAnalysis.bpeTrainBatched(spark, sfDir, merges, maxBatch)
    val t2 = System.nanoTime()
    println(f"[bpe] merges=${seq.length} parity=${seq == bat} " +
      f"seq_steps=${seq.length} bat_steps=$steps " +
      f"seq_s=${(t1 - t0) / 1e9}%.2f bat_s=${(t2 - t1) / 1e9}%.2f")
    spark.stop()
  }
}
