package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkPosture
import graft.operators.SimilaritySearch

/** Measures the SemDeDup TRAINING rung (VERDICT r12 item 2): full-corpus
  * Lloyd (`trainedAssignment`'s shape, cost N·k·d·iters) vs sample-trained
  * Lloyd (`sampleTrainedAssignment`, cost S·k·d·iters with S=sampleCap) at
  * each given corpus, then drives the sample-trained composition end to
  * end. The claim under test: the corpus factor N is GONE from training —
  * sample-train wall should track k (≈√N model size) only, while
  * full-train wall grows ~N·√N per decade (which is what made q85's sf100
  * point hours-long). Pass `--skip-full` decades where full training is
  * known-hours (sf100).
  *
  * Usage: tools/run.sh graft.tools.SemdedupTrainProbe <sfDir> [sfDir ...]
  *        [--skip-full=<comma dirs>] [--iters=3] [--cap=65536]
  */
object SemdedupTrainProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args.filterNot(_.startsWith("--")).toSeq match {
      case Nil => Seq("/tmp/sf1", "/tmp/sf10")
      case ds  => ds
    }
    val skipFull = args.collectFirst {
      case a if a.startsWith("--skip-full=") => a.drop(12).split(",").toSet
    }.getOrElse(Set.empty[String])
    val iters = args.collectFirst {
      case a if a.startsWith("--iters=") => a.drop(8).toInt }.getOrElse(3)
    val cap = args.collectFirst {
      case a if a.startsWith("--cap=") => a.drop(6).toInt }.getOrElse(65536)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkPosture(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def secs[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println("[semdedup-train] dir n k sample_train_s full_train_s assign_prune_s survivors")
    dirs.foreach { dir =>
      val e = SimilaritySearch.embWithNorm(spark, dir)
      val n = e.count()
      val k = math.min(cap.toLong,
        math.max(2L, math.round(math.sqrt(n.toDouble)))).toInt
      // sample-trained rung, instrumented: carve + init + Lloyd on S rows
      // (the carve is the LIBRARY's md5Sample — the probe must measure the
      // shipped rung; an inline copy here silently missed the
      // post-limit repartition and measured a single-threaded Lloyd)
      val (centroids, tSample) = secs {
        val sample = SimilaritySearch.md5Sample(spark, e, n, cap)
        val init = sample.orderBy(col("vec_id")).limit(k)
          .select(col("emb")).collect().map(_.getSeq[Double](0).toArray).toSeq
        SimilaritySearch.kmeansIterateOn(sample.select(col("emb")), iters, init)._1
      }
      // full-corpus training (the rung this probe retires at scale)
      val tFull =
        if (skipFull(dir)) Double.NaN
        else secs {
          val init = e.orderBy(col("vec_id")).limit(k)
            .select(col("emb")).collect().map(_.getSeq[Double](0).toArray).toSeq
          SimilaritySearch.kmeansIterateOn(e.select(col("emb")), iters, init)._1
        }._2
      // assignment + prune with the ALREADY-trained model (one corpus pass
      // + the cid-bucketed pair search — the cost a user pays regardless)
      val (nSurv, tPrune) = secs {
        val assigned =
          if (centroids.length <= SimilaritySearch.literalPathMaxK)
            SimilaritySearch.assignLiteral(e, centroids)
          else SimilaritySearch.assignByTable(spark, e, centroids)
        SimilaritySearch.semdedupPrune(assigned, 0.3)
          .filter(!col("pruned")).count()
      }
      println(f"[semdedup-train] $dir $n $k $tSample%.1f $tFull%.1f $tPrune%.1f $nSurv")
    }
    spark.stop()
  }
}
