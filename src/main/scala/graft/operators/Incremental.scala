package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cleanse.money

/** Incremental aggregate maintenance — the materialized-view refresh path a
  * 100 TB lake needs: a dashboard aggregate over the full corpus is never
  * recomputed from raw data; instead a compact STATE table (one row per
  * group, mergeable partials) absorbs each new delta partition. Everything
  * here is algebraic: count/sum merge by addition, min/max by min/max, avg
  * derives at read time, and distinct counts ride an HLL sketch (binary,
  * associatively unionable — the same mergeable-sketch shape as q49).
  * Refresh cost is O(|delta| + |state|), independent of lake size.
  */
object Incremental {

  /** Partial-aggregate state of `raw` grouped by `key`: exact decimal sums
    * (order-independent merges — double sums would drift under re-merging),
    * min/max, and an HLL sketch of `distinctCol`. */
  def aggState(raw: DataFrame, key: String, valueCol: String,
      distinctCol: String): DataFrame =
    raw.groupBy(col(key)).agg(
      count(lit(1)).as("cnt"),
      sum(money(col(valueCol))).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"),
      hll_sketch_agg(col(distinctCol)).as("distinct_sk"))

  /** Merge any number of state tables into one: the refresh step. Because
    * every column is algebraic, merging is a plain re-aggregation of the
    * unioned states — associative and commutative, so deltas can arrive in
    * any order and states can be merged hierarchically (per-hour → per-day
    * → total) without changing the result. */
  def mergeStates(states: Seq[DataFrame], key: String): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col(key)).agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        hll_union_agg(col("distinct_sk")).as("distinct_sk"))

  /** Read-time view over a state table: the user-facing aggregate (avg
    * derived from exact partials, distinct estimated from the sketch). */
  def readState(state: DataFrame, key: String): DataFrame =
    state.select(col(key), col("cnt"),
      col("sum_v").cast("double").as("sum_value"),
      // divide in DOUBLE: decimal division re-scales with operand precision,
      // so a twice-merged state (precision 38) would round differently than
      // a once-aggregated one — double division of the exact partials is
      // state-shape-independent
      (col("sum_v").cast("double") / col("cnt").cast("double")).as("avg_value"),
      col("min_v"), col("max_v"),
      round(hll_sketch_estimate(col("distinct_sk"))).cast("long")
        .as("approx_distinct"))
}
