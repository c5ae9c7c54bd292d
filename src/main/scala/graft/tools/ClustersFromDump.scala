package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkPosture

/** Run the q111 cluster stage over a stored q110 pair dump — the
  * restart/audit path for the sf100 decade, where re-deriving the pair
  * relation costs another multi-hour lshPairs pass that the dump already
  * paid (and that tools/check_lsh_sampled.py has independently verified).
  * Writes the cluster relation in the q111 dump layout so
  * tools/check_clusters_scaled.py (layered GRAFT_CLUSTER_EDGES mode)
  * closes the components/sizes stage cross-engine.
  *
  * Usage: run.sh graft.tools.ClustersFromDump <pairDumpDir> <outDir>
  *        [threshold=0.35]
  */
object ClustersFromDump {
  def main(args: Array[String]): Unit = {
    val pairs = args(0)
    val out = args(1)
    val thr = if (args.length > 2) args(2).toDouble else 0.35
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // sf100 pair relations are ~750M rows (1.5B symmetric): the distinct
    // inside connectedComponents needs reduce partitions sized to the
    // EDGE count, not the core count — 16 partitions put ~94M-pair hash
    // sets in every task and OOMed a 24g heap. Default 256 keeps
    // per-task state ~6M pairs.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val spark = SparkPosture(SparkSession.builder()).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.operators.SimilaritySearch
      .clustersFromPairs(spark.read.parquet(pairs), thr)
      .write.mode("overwrite").parquet(s"$out/q111_embedding_clusters")
    println(f"[clustersfromdump] pairs=$pairs thr=$thr " +
      f"t=${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")
    spark.stop()
  }
}
