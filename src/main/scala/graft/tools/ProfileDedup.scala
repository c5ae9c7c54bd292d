// Scratch profiler: stage-by-stage timing of the q31 pipeline (shingle
// materialization vs pair join vs consumers) under bench-like conditions.
// Usage: bash tools/run.sh graft.tools.ProfileDedup [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup session
    spark.read.parquet(s"$dir/documents.parquet").count()

    val sh = t("shingled build+persist") {
      val s = graft.sources.Tables(spark, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.shingles(col("w"))).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"),
          conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("x60"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val nsh = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    t("hot-shingle agg") {
      sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 1000).count()
    }
    t("pair join + agg + denoms") {
      val a = sh.select(col("doc_id").as("doc_a"), col("h"))
      val b = sh.select(col("doc_id").as("doc_b"), col("h").as("hb"))
      a.join(b, col("h") === col("hb") && col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("common"))
        .join(nsh.toDF("doc_a", "na"), "doc_a")
        .join(nsh.toDF("doc_b", "nb"), "doc_b")
        .withColumn("jaccard",
          col("common").cast("double") / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.1)
        .count()
    }
    t("pair join only (no denoms)") {
      val a = sh.select(col("doc_id").as("doc_a"), col("h"))
      val b = sh.select(col("doc_id").as("doc_b"), col("h").as("hb"))
      a.join(b, col("h") === col("hb") && col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("common")).count()
    }
    t("shingle build, no distinct") {
      graft.sources.Tables(spark, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.shingles(col("w"))).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"),
          conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("x60"))
        .count()
    }
    t("shingle build, no md5") {
      graft.sources.Tables(spark, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.shingles(col("w"))).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
        .count()
    }
    def base = graft.sources.Tables(spark, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.shingles(col("w"))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"),
        conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("x60"))
    t("build + distinct, no persist") { base.distinct().count() }
    t("build + persist, no distinct") {
      val s = base.persist(StorageLevel.MEMORY_AND_DISK); s.count(); s.unpersist(true)
    }
    t("build + rowlevel array_distinct") {
      graft.sources.Tables(spark, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(array_distinct(graft.operators.TextAnalysis.shingles(col("w")))).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"),
          conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("x60"))
        .count()
    }
    t("build + local groupBy(doc,h,x60)") {
      base.groupBy(col("doc_id"), col("h"), col("x60")).agg(lit(1)).count()
    }
    spark.stop()
  }
}
