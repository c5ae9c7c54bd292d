package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Cleanse._
import graft.sources.Tables

/** The flagship master-table assembly — the reference's 210-line MASTER_SQL
  * (transform-complex-full.py:127-210; SURVEY.md §3.3) re-expressed as one
  * declarative DataFrame DAG over the testdata role mapping (FIXTURES.md §2):
  * line-item grain, inner join to orders, left joins to three per-order
  * aggregates (incl. the J6 argmax), left joins up the customer→nation→region
  * dimension chain, then the CASE/timestamp-arithmetic KPI columns
  * (transform-complex-full.py:167-195).
  *
  * Scale design (100 TB):
  *  - All per-order aggregates (totals, argmax, min/max/avg) are fused into
  *    ONE two-stage aggregation (Aggregates.perOrderAll): lineitem is
  *    scanned twice total (items + aggregate side), with a single
  *    map-combined shuffle of near-order-grain rows instead of three
  *    lineitem-grain shuffles.
  *  - nation/region are broadcast explicitly; customer is left to AQE's
  *    size-based broadcast decision (small here, shuffle-join at real scale).
  *  - All KPI expressions are built-in (whole-stage codegen, no UDFs).
  *  - The whole thing is one lazy plan: Catalyst prunes columns into the
  *    parquet scans (only the ~10 referenced lineitem columns are read).
  */
object Master {

  def apply(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")

    val items = l.select(
      col("l_orderkey"),
      col("l_linenumber").as("line_number"),
      col("l_quantity").as("quantity"),
      Aggregates.lineRevenue.as("line_revenue_dec"),
      col("l_shipdate").as("ship_ts"))

    val ord = Tables(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      normLower(col("o_orderstatus")).as("order_status"),
      col("o_orderdate").as("order_ts"),
      normLower(col("o_orderpriority")).as("order_priority"))

    val cust = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")

    items
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Aggregates.perOrderAll(l), Seq("l_orderkey"), "left")
      .join(cust, col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        col("l_orderkey").as("order_key"),
        col("line_number"),
        col("quantity"),
        col("line_revenue_dec").cast("double").as("line_revenue"),
        col("order_status"),
        col("order_ts"),
        col("order_priority"),
        col("ship_ts"),
        col("c_mktsegment").as("mktsegment"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"),
        col("order_revenue_dec").cast("double").as("order_revenue"),
        col("order_item_count"),
        col("order_qty"),
        col("primary_returnflag"),
        col("primary_flag_revenue"),
        col("first_ship_ts"),
        col("last_ship_ts"),
        col("avg_discount"),
        // F7 — fractional-day delivery KPI (transform-complex-full.py:169)
        fracDays(col("ship_ts"), col("order_ts")).as("ship_delay_days"),
        // F9/F10 — three-valued late flag (transform-complex-full.py:186-195)
        when(col("ship_ts").isNotNull && col("order_ts").isNotNull,
          col("ship_ts") > col("order_ts") + expr("INTERVAL 60 DAYS"))
          .otherwise(lit(null).cast("boolean")).as("late_flag"),
        // F9 — multi-branch CASE (transform-complex-full.py:167-184)
        when(col("line_revenue_dec") > 50000, lit("high"))
          .when(col("line_revenue_dec") > 10000, lit("mid"))
          .otherwise(lit("low")).as("value_class"))
  }

  val oracle: String =
    """WITH items AS (
      |  SELECT l_orderkey, l_linenumber AS line_number, l_quantity AS quantity,
      |    CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6)) AS line_revenue_dec,
      |    l_shipdate AS ship_ts
      |  FROM lineitem),
      |ord AS (
      |  SELECT o_orderkey, o_custkey, lower(trim(o_orderstatus)) AS order_status,
      |    o_orderdate AS order_ts, lower(trim(o_orderpriority)) AS order_priority
      |  FROM orders),
      |pay AS (
      |  SELECT l_orderkey, COUNT(*) AS order_item_count,
      |    COALESCE(SUM(NULLIF(l_quantity, 0)), 0) AS order_qty,
      |    SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS order_revenue_dec
      |  FROM lineitem GROUP BY l_orderkey),
      |arg AS (
      |  SELECT l_orderkey, l_returnflag AS primary_returnflag,
      |         CAST(flag_rev AS DOUBLE) AS primary_flag_revenue
      |  FROM (SELECT l_orderkey, l_returnflag, flag_rev,
      |          ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |                             ORDER BY flag_rev DESC, l_returnflag ASC) AS rn
      |        FROM (SELECT l_orderkey, l_returnflag,
      |                SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS flag_rev
      |              FROM lineitem GROUP BY 1, 2) fr) rk
      |  WHERE rn = 1),
      |rev AS (
      |  SELECT l_orderkey, MIN(l_shipdate) AS first_ship_ts, MAX(l_shipdate) AS last_ship_ts,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE)/COUNT(l_discount) AS avg_discount
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT i.l_orderkey AS order_key, i.line_number, i.quantity,
      |  CAST(i.line_revenue_dec AS DOUBLE) AS line_revenue,
      |  o.order_status, o.order_ts, o.order_priority, i.ship_ts,
      |  c.c_mktsegment AS mktsegment, n.n_name AS nation_name, r.r_name AS region_name,
      |  CAST(p.order_revenue_dec AS DOUBLE) AS order_revenue,
      |  p.order_item_count, p.order_qty,
      |  a.primary_returnflag, a.primary_flag_revenue,
      |  v.first_ship_ts, v.last_ship_ts, v.avg_discount,
      |  (epoch_us(i.ship_ts) - epoch_us(o.order_ts))/86400000000.0 AS ship_delay_days,
      |  CASE WHEN i.ship_ts IS NOT NULL AND o.order_ts IS NOT NULL
      |       THEN i.ship_ts > o.order_ts + INTERVAL 60 DAY ELSE NULL END AS late_flag,
      |  CASE WHEN i.line_revenue_dec > 50000 THEN 'high'
      |       WHEN i.line_revenue_dec > 10000 THEN 'mid' ELSE 'low' END AS value_class
      |FROM items i
      |JOIN ord o ON i.l_orderkey = o.o_orderkey
      |LEFT JOIN pay p ON i.l_orderkey = p.l_orderkey
      |LEFT JOIN arg a ON i.l_orderkey = a.l_orderkey
      |LEFT JOIN rev v ON i.l_orderkey = v.l_orderkey
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin
}
