package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Aggregates

/** Pins the tricky reference semantics: J6 argmax tiebreak
  * (transform-complex-full.py:72-79), A2 COALESCE(SUM(NULLIF))
  * (transform-complex-full.py:71). */
class AggregatesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def li(rows: (Long, Double, String)*) =
    rows.toDF("l_orderkey", "l_extendedprice", "l_returnflag")
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_shipdate", lit("2024-01-01").cast("timestamp"))

  test("primaryFlag picks the flag with the largest sum") {
    val out = Aggregates.primaryFlag(li(
      (1L, 10.0, "A"), (1L, 30.0, "R"), (1L, 5.0, "N")))
      .select("primary_returnflag").as[String].collect()
    assert(out.toSeq == Seq("R"))
  }

  test("primaryFlag breaks exact ties by flag ASC (deterministic, pinned)") {
    val out = Aggregates.primaryFlag(li(
      (1L, 20.0, "R"), (1L, 20.0, "A"),   // tie: A wins (asc)
      (2L, 7.5, "N"), (2L, 7.5, "B")))    // tie: B wins
      .orderBy("l_orderkey")
      .select("primary_returnflag").as[String].collect()
    assert(out.toSeq == Seq("A", "B"))
  }

  test("perOrder order_qty ignores zeros via NULLIF and backfills 0 when all-zero") {
    val df = Seq(
      (1L, 5.0), (1L, 0.0), (1L, 3.0),   // zeros ignored → 8
      (2L, 0.0), (2L, 0.0))              // all zero → COALESCE → 0
      .toDF("l_orderkey", "l_quantity")
      .withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
    val out = Aggregates.perOrder(df).orderBy("l_orderkey")
      .select("order_qty").as[Double].collect()
    assert(out.toSeq == Seq(8.0, 0.0))
  }

  test("perOrder revenue is exact decimal math") {
    val df = Seq((1L, 100.10, 0.10, 0.05)).toDF(
      "l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .withColumn("l_quantity", lit(1.0))
    val rev = Aggregates.perOrder(df).select(col("order_revenue_dec").cast("string"))
      .as[String].head()
    // 100.10 * 0.9 * 1.05 = 94.5945 exactly, captured at scale 6
    assert(rev == "94.594500")
  }
}
