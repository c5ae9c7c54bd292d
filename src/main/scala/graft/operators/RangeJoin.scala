package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — the second custom operator Spark lacks natively
  * (SURVEY.md §7.3 ladder step (a): composed from built-ins).
  *
  * The naive formulation `L JOIN R ON v >= lo AND v < hi` has no equi-key,
  * so Spark plans a BroadcastNestedLoopJoin — O(|L|·|R|) comparisons. This
  * rewrite buckets the value domain with width `bucketWidth`: each range
  * explodes into the integer buckets it covers, each left row maps to
  * exactly one bucket, and the join becomes an equi-join on the bucket id
  * with a residual predicate. Shuffle on bucket id; per-row candidate count
  * = ranges overlapping that bucket only.
  *
  * At 100 TB choose bucketWidth near the median range width: too small
  * multiplies the replicated range rows, too large inflates candidates.
  * Overlapping ranges are supported (each match emits a row).
  */
object RangeJoin {

  def bucketed(
      left: DataFrame, valueCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val rb = ranges.withColumn("__b",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val lb = left.withColumn("__b", floor(col(valueCol) / bucketWidth).cast("long"))
    lb.join(rb, Seq("__b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__b")
  }
}
