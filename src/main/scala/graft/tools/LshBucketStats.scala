package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** Bucket-population diagnostics for the embedding-LSH family: for a given
  * (bands, bits) prints the candidate-pair total implied by the bucket
  * histogram (sum over buckets of n·(n−1)/2), the top bucket populations,
  * and the within- vs cross-replica split of the EMITTED pairs (replica =
  * vec_id / key-offset in gen_sf.py corpora). Distinguishes "the engine
  * shuffled too much" from "the corpus genuinely contains that many pairs"
  * — the two failure modes a slow LSH point can hide.
  *
  * Usage: bash tools/run.sh graft.tools.LshBucketStats <dir> <bands> <bits>
  *   [<replicaOffset>]   (default 10000 — gen_sf.py's vec_id offset)
  */
object LshBucketStats {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bands = args(1).toInt
    val bits = args(2).toInt
    val off = if (args.length > 3) args(3).toLong else 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val planes = SimilaritySearch.radPlanes(bands * bits)
    val e = SimilaritySearch.embWithNorm(spark, dir)
    val banded = e.select(col("vec_id"),
      posexplode(graft.functions.Similarity.lshBandCodes(col("emb"), planes, bits))
        .as(Seq("band_idx", "bucket")))

    val hist = banded.groupBy("band_idx", "bucket").count()
    val stats = hist.agg(
      sum(col("count") * (col("count") - 1) / 2).as("cand_pairs"),
      max("count").as("max_bucket"),
      expr("percentile_approx(count, 0.99)").as("p99_bucket"),
      count(lit(1)).as("nonempty_buckets")).head()
    println(s"[lsh-stats] dir=$dir bands=$bands bits=$bits " +
      s"candPairs=${stats.get(0)} maxBucket=${stats.get(1)} " +
      s"p99Bucket=${stats.get(2)} nonemptyBuckets=${stats.get(3)}")
    hist.orderBy(desc("count")).limit(10).collect().foreach(r =>
      println(s"[lsh-stats] top bucket band=${r.get(0)} code=${r.get(1)} n=${r.get(2)}"))

    val pairs = SimilaritySearch.lshPairs(spark, dir, bands, bits)
      .withColumn("same_replica",
        (col("vec_a") / off).cast("long") === (col("vec_b") / off).cast("long"))
    val split = pairs.groupBy("same_replica").count().as[(Boolean, Long)]
      .collect().toMap
    println(s"[lsh-stats] emitted pairs within-replica=${split.getOrElse(true, 0L)} " +
      s"cross-replica=${split.getOrElse(false, 0L)}")
    spark.stop()
  }
}
