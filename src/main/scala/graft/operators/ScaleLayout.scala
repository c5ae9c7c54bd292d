package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB scale (SURVEY.md §4: the reference's
  * secondary indexes map to partitioning/bucketing; its batched-write tuning
  * maps to shuffle-free co-located joins).
  */
object ScaleLayout {

  /** Write a table bucketed+sorted on its join key. Two tables bucketed the
    * same way join with ZERO exchanges (verified in ScaleLayoutSpec): at
    * 100 TB this turns the recurring fact⨝fact shuffle into a local
    * per-bucket sort-merge — the Spark analog of the reference's indexed
    * master table (transform-complex-full.py:215-221). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Date-partitioned lake layout: partition pruning serves the reference's
    * timestamp index use case (BI range scans touch only matching files). */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("part_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("part_date")
      .parquet(path)

  /** Small-file compaction for a parquet lake directory — the steady-state
    * maintenance job a 100 TB lake cannot live without (streaming sinks and
    * fine-grained partitions accrete kilobyte files; scan throughput dies on
    * per-file open cost). Rewrites `path` into ceil(bytes/targetBytes)
    * files via a round-robin repartition (no shuffle key — pure bin-packing;
    * within-file order is not part of the lake contract, which is also why
    * rewriting is safe mid-pipeline). Returns (filesBefore, filesAfter).
    * The rewrite stages into `path + ".compact"` then swaps, so a failed
    * job never destroys the source. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String) =
      fs.listStatus(new Path(p)).filter(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val staging = path + ".compact"
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(staging)
    val afterN = parquetFiles(staging).length
    fs.delete(new Path(path), true)
    fs.rename(new Path(staging), new Path(path))
    (before.length, afterN)
  }

  /** Incremental MERGE upsert for a parquet lake table (the step beyond the
    * reference's whole-table `if_exists='replace'` load): latest row per
    * key wins, decided by `versionCol` (ties to existing rows lose — an
    * equal-version update is applied). Implemented as unionByName →
    * per-key max-version keep, which is ONE shuffle on the key at any
    * scale; the rewrite uses the same staged-swap protocol as `compact`,
    * so a failed merge never destroys the base table. For recurring merges
    * at 100 TB, store the base bucketed on `key` (writeBucketed) so the
    * keep-window shuffles only the delta. */
  def mergeUpsert(spark: SparkSession, path: String, updates: DataFrame,
      key: String, versionCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.expressions.Window
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = spark.read.parquet(path).withColumn("__src", lit(0))
    val merged = base.unionByName(updates.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col(versionCol).desc, col("__src").desc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
    val staging = path + ".merge"
    merged.write.mode("overwrite").parquet(staging)
    fs.delete(new Path(path), true)
    fs.rename(new Path(staging), new Path(path))
  }

  /** Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
    * skew at runtime; this explicit variant covers plans AQE can't rewrite
    * (e.g. when the skewed side feeds a co-grouped computation). The big
    * side gets a deterministic-per-row salt in [0, salts); the small side is
    * replicated `salts` times; the join key becomes (key, salt). Result rows
    * are identical to the plain join — only the distribution changes. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
