package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking — the scale-safe replacement for the
  * classic `row_number().over(Window.orderBy(...))` anti-pattern, which
  * moves the ENTIRE input to one partition (WindowExec with an empty
  * partition spec = single-executor sort + OOM at corpus scale).
  *
  * Shape (the generalized q83 two-level prefix sum):
  *   1. `repartitionByRange` on the sort key — contiguous, ORDERED key
  *      ranges, one per partition, balanced by the range sampler (the sort
  *      key must be a total order, e.g. tie-broken by a unique id, so equal
  *      prefixes still split across partitions).
  *   2. rank / running sums WITHIN each partition id — a partitioned
  *      window, parallel across the cluster.
  *   3. per-partition totals reduce to a `numShufflePartitions`-row
  *      relation; its prefix sums (one tiny window over driver-scale data)
  *      are the offsets each partition adds back via a broadcast join.
  *
  * The produced rank/running values are EXACT global results regardless of
  * where the sampled range splits land, because step 3 uses the actual
  * per-partition counts — the partitioning only controls parallelism, never
  * the answer. Used by q84 (corpus-wide BM25 rank) and q87 (vocabulary
  * report); PlanAuditSpec enforces registry-wide that no data-scale relation
  * flows into an unpartitioned window.
  */
object Ranks {

  /** Append a global ROW_NUMBER column named `rankName` (LongType) ranked by
    * `order` (which must be a total order — include a unique tiebreaker),
    * plus an exact global running sum column `name` for each `(expr, name)`
    * in `running`, all without any data-scale unpartitioned window. */
  def withGlobalOrder(df: DataFrame, order: Seq[Column], rankName: String,
      running: Seq[(Column, String)] = Nil): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // Range partitions are contiguous in `order`, so partition id ascending
    // IS the global order at partition granularity.
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val cum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = running.foldLeft(
      ranged.withColumn("__within", row_number().over(wIn).cast("long"))) {
      case (d, (c, n)) => d.withColumn(s"__run_$n", sum(c).over(cum))
    }
    // Offsets: totals of all STRICTLY EARLIER partitions. The window here is
    // over a ≤`parts`-row relation (post-aggregate) — driver-scale by
    // construction at any input size.
    val wOff = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val totals = ranged.groupBy(col("__pid")).agg(
      count(lit(1)).as("__pcnt"),
      running.map { case (c, n) => sum(c).as(s"__ptot_$n") }: _*)
    val offsets = running.foldLeft(
      totals.withColumn("__poff", coalesce(sum(col("__pcnt")).over(wOff), lit(0L)))) {
      case (d, (_, n)) =>
        d.withColumn(s"__off_$n", coalesce(sum(col(s"__ptot_$n")).over(wOff), lit(0L)))
    }.select(col("__pid") +: col("__poff") +:
      running.map { case (_, n) => col(s"__off_$n") }: _*)
    val joined = running.foldLeft(
      within.join(broadcast(offsets), "__pid")
        .withColumn(rankName, col("__poff") + col("__within"))) {
      case (d, (_, n)) => d.withColumn(n, col(s"__off_$n") + col(s"__run_$n"))
    }
    joined.drop("__pid" :: "__within" :: "__poff" ::
      running.toList.flatMap { case (_, n) => List(s"__run_$n", s"__off_$n") }: _*)
  }
}
