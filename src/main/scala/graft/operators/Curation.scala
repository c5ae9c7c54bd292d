package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The capstone composition: run the curation verdicts (q67), keep the
  * surviving documents, assign them to fixed token-budget training shards
  * (q83's distributed prefix sum), and write a shard-partitioned corpus —
  * the end-to-end "raw lake in, training set out" path a user of this
  * library actually runs. Every stage is an already-oracle-checked
  * operator; this wires them into one DAG and one partitioned write.
  */
object Curation {

  /** Kept documents with their audit fields, shard ids, and text — ready
    * to write. Shard ids are assigned AFTER filtering (so shards pack
    * contiguously over survivors, no holes from dropped docs). */
  def trainingSet(spark: SparkSession, dir: String,
      tokenBudget: Long = 2000L): DataFrame = {
    val kept = Dedup.q67CurationPipeline.run(spark, dir)
      .filter(col("kept"))
      .select(col("doc_id"), col("predicted_lang"), col("quality_score"))
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val toks = kept.join(docs, "doc_id")
      .withColumn("tokens", size(TextAnalysis.words(col("text"))).cast("long"))
      .withColumn("bucket", expr("doc_id div 256"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
    val wB = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    val offsets = toks.groupBy(col("bucket"))
      .agg(sum(col("tokens")).as("btotal"))
      .withColumn("boffset", coalesce(
        sum(col("btotal")).over(wB.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boffset"))
    toks.withColumn("within", sum(col("tokens")).over(wIn))
      .join(offsets, "bucket")
      .select(col("doc_id"), col("predicted_lang"), col("quality_score"),
        col("tokens"), col("text"),
        expr(s"(boffset + within - tokens) div $tokenBudget").as("shard_id"))
  }

  /** Write the curated corpus partitioned by shard — one directory per
    * training shard, each holding ~tokenBudget tokens of clean text. */
  def exportTrainingSet(spark: SparkSession, dir: String, outPath: String,
      tokenBudget: Long = 2000L): Unit =
    trainingSet(spark, dir, tokenBudget)
      .repartition(col("shard_id"))
      .write.mode("overwrite")
      .partitionBy("shard_id")
      .parquet(outPath)
}
