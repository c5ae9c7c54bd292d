package graft.tools

import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head: spark.ml MinHashLSH approxSimilarityJoin vs the custom
  * q32 MinHash+banding pipeline on the same corpus/threshold. Evidence for
  * PLANS.md's "custom sketch matches-or-beats the standard-library path".
  * Usage: runMain graft.tools.MlDedupBench [sfDir] */
object MlDedupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mlbench] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // JVM/codegen warmup, as graft.Bench does
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val dim = 1 << 20
    val ml = timed("spark.ml MinHashLSH (8 tables)") {
      val docs = graft.sources.Tables(spark, dir, "documents")
        .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.shingles(col("w"))).as("shingle"))
        .withColumn("idx", pmod(xxhash64(col("shingle")), lit(dim)).cast("int"))
        .groupBy("doc_id").agg(collect_set("idx").as("idxs"))
        .map { r =>
          val idxs = r.getAs[Seq[Int]]("idxs").distinct.sorted.toArray
          (r.getLong(0), Vectors.sparse(dim, idxs, Array.fill(idxs.length)(1.0)))
        }.toDF("doc_id", "features")
      val model = new MinHashLSH().setNumHashTables(8).setSeed(42L)
        .setInputCol("features").setOutputCol("hashes").fit(docs)
      model.approxSimilarityJoin(docs, docs, 0.5, "jaccard_dist")
        .filter(col("datasetA.doc_id") < col("datasetB.doc_id")).count()
    }
    val custom = timed("custom q32 full pipeline") {
      graft.SparkEntry.queries("q32_dedup_minhash_lsh")(spark, dir)
        .filter(col("jaccard") >= 0.5).count()
    }
    graft.operators.Dedup.releaseCaches(spark)
    println(s"[mlbench] custom pairs@>=0.5: $custom, ml pairs@dist<0.5: $ml")
    spark.stop()
  }
}
