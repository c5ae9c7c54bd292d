package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SimilaritySearch

/** Scale probe for the embedding-LSH pair family: times the q38 oracle
  * anchor (4 bands × 4 bits — buckets fixed at 16/band, candidate pairs
  * O(N²/16)) against the parameterized `lshPairs` with bits sized to the
  * corpus. The sf1 bench surfaced the anchor as the one super-linear query
  * in the registry (42.8× at 10× vectors); this probe shows the
  * parameterized form restoring ~linear growth at the same plan shape.
  *
  * Usage: bash tools/run.sh graft.tools.LshScaleProbe <sfDir> [<sfDir>...]
  *   SPARK_GRAFT_LSH_BANDS   band count for the parameterized form (default 4)
  *   SPARK_GRAFT_LSH_ANCHOR  "0" skips the quadratic anchor timing (it is
  *                           minutes at 30×; the production curve is the point)
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val rows = f
      println(f"[lsh-scale] $label rows=$rows t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val bands = sys.env.getOrElse("SPARK_GRAFT_LSH_BANDS", "4").toInt
    val runAnchor = sys.env.getOrElse("SPARK_GRAFT_LSH_ANCHOR", "1") != "0"
    args.foreach { dir =>
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      // bits ≈ log2(N / targetBucket): ~64 vectors per bucket
      val bits = math.max(4, (math.log(n / 64.0) / math.log(2)).ceil.toInt)
      println(s"[lsh-scale] dir=$dir n=$n scaledBits=$bits")
      if (runAnchor) time(s"anchor(4x4)  @ $dir") {
        graft.SparkEntry.queries("q38_dedup_embedding_lsh")(spark, dir).count()
      }
      time(s"lshPairs(${bands}x$bits) @ $dir") {
        SimilaritySearch.lshPairs(spark, dir, bands = bands, bitsPerBand = bits).count()
      }
    }
    spark.stop()
  }
}
