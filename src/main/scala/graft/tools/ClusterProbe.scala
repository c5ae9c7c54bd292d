package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkPosture

/** Probe the production embedding-cluster form at arbitrary settings.
  * Usage: runMain graft.tools.ClusterProbe <sfDir> <bands> <bits> <threshold>
  * Prints wall time, clustered-vector count, component count, and the
  * largest component size (percolation indicator). */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val (dir, bands, bits, thr) =
      (args(0), args(1).toInt, args(2).toInt, args(3).toDouble)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkPosture(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.operators.SimilaritySearch
      .embeddingClusters(spark, dir, bands, bits, thr)
    // coalesce: with zero components (plausible at the production 0.6–0.9
    // thresholds this tool exists to probe), sum/max are NULL — report 0s
    // instead of NPE-ing on getLong.
    import org.apache.spark.sql.functions.{coalesce, count, lit, max, sum}
    val stats = out.groupBy("cluster_rep").count()
      .agg(count(lit(1)).as("components"),
        coalesce(sum("count"), lit(0L)).as("clustered"),
        coalesce(max("count"), lit(0L)).as("largest"))
      .first()
    println(f"[clusterprobe] bands=$bands bits=$bits thr=$thr " +
      f"clustered=${stats.getLong(1)} components=${stats.getLong(0)} " +
      f"largest=${stats.getLong(2)} t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    graft.operators.Dedup.releaseCaches(spark)
    spark.stop()
  }
}
