package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Runtime metrics via the Observation API — the operational monitoring
  * surface a pipeline hangs data-quality alerts on without a second pass
  * over the data (metrics are collected during the action itself). */
class ObservationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("observe() collects row counts and sums during the action, no extra scan") {
    val obs = Observation("master_metrics")
    val out = graft.operators.Master(spark, TestSpark.sf0001)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("late_flag"), 1L).otherwise(0L)).as("late_rows"),
        min(col("order_ts")).as("min_order_ts"))
    val written = out.count()
    val m = obs.get
    assert(m("rows") == written)
    assert(m("late_rows").asInstanceOf[Long] > 0)
    assert(m("min_order_ts") != null)
  }
}
