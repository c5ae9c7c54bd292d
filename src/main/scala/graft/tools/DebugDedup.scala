package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val ex = graft.sources.Tables(spark, dir, "documents")
      .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(graft.operators.TextAnalysis.shingles(col("w"))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .distinct()
    val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select(col("h"))
    val exCapped = ex.join(hot, Seq("h"), "left_anti")
    println("exCapped columns: " + exCapped.columns.mkString(", "))
    val pairs = graft.operators.Dedup.jaccardPairs(spark, dir)
    println("pairs total: " + pairs.count())
    println("pairs >= 0.8: " + pairs.filter(col("jaccard") >= 0.8).count())
    pairs.orderBy(desc("jaccard")).show(5)
    spark.stop()
  }
}
