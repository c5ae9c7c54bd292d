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
