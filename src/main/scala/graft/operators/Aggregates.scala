package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cleanse._

/** Per-order aggregate builders — the `pay_agg` / `rev_agg` / argmax-subquery
  * capabilities of the reference master transform (SURVEY.md §2.3 J6, §2.4
  * A1–A6; reference transform-complex-full.py:67-91), keyed on the testdata
  * fact key `l_orderkey` (FIXTURES.md §2 role mapping).
  *
  * Scale design: every builder is a single hash aggregation on the join key —
  * Catalyst plans partial (map-side) + final HashAggregate, so the only
  * shuffle is on `l_orderkey`, the same key the master join shuffles on.
  * AQE can reuse/coalesce those exchanges; nothing here materializes on the
  * driver.
  */
object Aggregates {

  /** Per-row discounted+taxed line revenue, money-typed (reference
    * `item_price + item_freight` at transform-complex-full.py:157, with the
    * testdata's TPC-H-style price/discount/tax shape). */
  def lineRevenue: Column =
    money(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))

  /** `pay_agg` analog (A1, A2, A6; transform-complex-full.py:67-82):
    * one row per order — item count, zero-ignoring quantity sum, exact
    * decimal revenue. */
  def perOrder(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("order_item_count"),
      coalesce(sum(nullIfZero(col("l_quantity"))), lit(0.0)).as("order_qty"),
      moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
        .as("order_revenue_dec"))

  /** J6 argmax analog — "primary payment type" becomes "primary return flag":
    * per order, the l_returnflag with the largest SUM(l_extendedprice).
    *
    * The reference's `ORDER BY SUM(...) DESC LIMIT 1`
    * (transform-complex-full.py:72-79) is tie-nondeterministic; we pin the
    * total order (sum DESC, flag ASC) on both engine and oracle sides
    * (SURVEY.md §7.4 item 1).
    *
    * Implementation: two hash aggregations (order×flag, then order) via
    * MIN(STRUCT(-sum, flag)) — cheaper at scale than a window (no sort, no
    * single-partition pressure; both aggs get map-side partials and shuffle
    * on the same key prefix). */
  def primaryFlag(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"), col("l_returnflag"))
      .agg(moneySum(col("l_extendedprice")).as("flag_rev"))
      .select(col("l_orderkey"), col("l_returnflag"),
        struct(negate(col("flag_rev")).as("neg_rev"), col("l_returnflag").as("flag")).as("ranked"))
      .groupBy(col("l_orderkey"))
      .agg(min(col("ranked")).as("top"))
      .select(
        col("l_orderkey"),
        col("top.flag").as("primary_returnflag"),
        negate(col("top.neg_rev")).cast("double").as("primary_flag_revenue"))

  /** `rev_agg` analog (A3, A4; transform-complex-full.py:83-91): per-order
    * MIN/MAX timestamps and an exact-decimal average. */
  def revStats(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey")).agg(
      min(col("l_shipdate")).as("first_ship_ts"),
      max(col("l_shipdate")).as("last_ship_ts"),
      (sum(col("l_discount").cast("decimal(8,6)")).cast("double") / count(col("l_discount")))
        .as("avg_discount"))

  /** All per-order aggregates (perOrder ∪ primaryFlag ∪ revStats) from ONE
    * scan and one shuffle family: a (l_orderkey, l_returnflag) partial
    * aggregation collapses line grain to ≤|flags| rows per order, then a
    * cheap per-order re-aggregation derives totals, min/max, the exact
    * decimal average and the argmax — every combiner here is associative
    * and exact (decimal sums, counts, min/max), so results are identical to
    * the three standalone builders. At 100 TB this replaces three full
    * lineitem shuffles with one map-combined shuffle of near-order-grain
    * rows plus a trivial second exchange. */
  def perOrderAll(lineitem: DataFrame): DataFrame = {
    val flagAgg = lineitem
      .groupBy(col("l_orderkey"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(nullIfZero(col("l_quantity"))).as("qty_s"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("rev_s"),
        moneySum(col("l_extendedprice")).as("flag_rev"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        sum(col("l_discount").cast("decimal(8,6)")).as("disc_s"),
        count(col("l_discount")).as("disc_n"))
    flagAgg
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("cnt")).as("order_item_count"),
        coalesce(sum(col("qty_s")), lit(0.0)).as("order_qty"),
        sum(col("rev_s")).as("order_revenue_dec"),
        min(struct(negate(col("flag_rev")).as("neg_rev"), col("l_returnflag").as("flag"))).as("top"),
        min(col("min_ship")).as("first_ship_ts"),
        max(col("max_ship")).as("last_ship_ts"),
        (sum(col("disc_s")).cast("double") / sum(col("disc_n"))).as("avg_discount"))
      .select(
        col("l_orderkey"),
        col("order_item_count"),
        col("order_qty"),
        col("order_revenue_dec"),
        col("top.flag").as("primary_returnflag"),
        negate(col("top.neg_rev")).cast("double").as("primary_flag_revenue"),
        col("first_ship_ts"),
        col("last_ship_ts"),
        col("avg_discount"))
  }
}
