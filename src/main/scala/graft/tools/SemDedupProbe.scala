package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SimilaritySearch

/** Scale probe for the TRAINED SemDeDup composition (VERDICT r7 item 3):
  * times `semdedupTrained` end-to-end (√N̅ Lloyd training + assignment +
  * cid-bucketed prune) and prints the executed assignment plan, so the
  * large-k broadcast-table path (`assignByTable`,
  * k > SimilaritySearch.literalPathMaxK = 16 since the r8 cutover — the
  * k² CASE chain overflows codegen above that) is evidenced at scale.
  * Note the sf0.1 corpus itself (2 000 vecs → k ≈ 45) now exercises
  * `assignByTable` too; only tiny dirs (k ≤ 16) show the literal path.
  *
  * Usage: bash tools/run.sh graft.tools.SemDedupProbe <sfDir> [<sfDir>...]
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      System.gc()
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val k = math.max(2, math.round(math.sqrt(n.toDouble)).toInt)
      val t0 = System.nanoTime()
      val out = SimilaritySearch.semdedupTrained(spark, dir)
      val (rows, pruned) = {
        import org.apache.spark.sql.functions._
        val r = out.agg(count(lit(1)), sum(when(col("pruned"), 1L).otherwise(0L)))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[semdedup-probe] dir=$dir n=$n k=$k rows=$rows pruned=$pruned t=$t%.2f s")
      // Executed-plan excerpt of the assignment half: the broadcast
      // centroid-table argmin (k>64) vs plan-literal scores (k<=64).
      val assigned = SimilaritySearch.trainedAssignment(spark, dir)
      assigned.collect() // force execution so AQE finalizes the plan
      val plan = assigned.queryExecution.executedPlan.toString()
      val interesting = plan.linesIterator.filter { l =>
        l.contains("Broadcast") || l.contains("Exchange") ||
        l.contains("HashAggregate") || l.contains("Join")
      }.take(12).mkString("\n")
      println(s"[semdedup-probe] assignment plan (dir=$dir, k=$k):\n$interesting")
    }
    spark.stop()
  }
}
