package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of: inclusive at equal ts, latest-prior wins, no-prior → null") {
    val left = Seq(
      (1L, 10L, "2024-01-05 00:00:00"),  // between r1 and r2 → r1
      (2L, 10L, "2024-01-10 00:00:00"),  // exactly r2's ts → r2 (inclusive)
      (3L, 10L, "2024-01-01 00:00:00"),  // before everything → null
      (4L, 20L, "2024-02-01 00:00:00"))  // other key → r3
      .toDF("id", "k", "t_s").withColumn("t", col("t_s").cast("timestamp")).drop("t_s")
    val right = Seq(
      (10L, "2024-01-02 00:00:00", "r1"),
      (10L, "2024-01-10 00:00:00", "r2"),
      (20L, "2024-01-15 00:00:00", "r3"))
      .toDF("rk", "rt_s", "tag").withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")

    val out = AsofJoin.asofBackwardFlat(left, right, "k", "rk", "t", "rt",
        Seq("tag" -> "matched_tag"))
      .orderBy("id")
      .select("id", "matched_tag")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(out(1L).contains("r1"))
    assert(out(2L).contains("r2"))
    assert(out(3L).isEmpty)
    assert(out(4L).contains("r3")) // event at 02-01 is after r3 (01-15)
  }

  test("forward as-of: inclusive at equal ts, earliest-later wins, none-later → null") {
    val left = Seq(
      (1L, 10L, "2024-01-05 00:00:00"),  // between r1 and r2 → r2 (next)
      (2L, 10L, "2024-01-10 00:00:00"),  // exactly r2's ts → r2 (inclusive)
      (3L, 10L, "2024-01-20 00:00:00"),  // after everything → null
      (4L, 20L, "2024-01-01 00:00:00"))  // before r3 → r3
      .toDF("id", "k", "t_s").withColumn("t", col("t_s").cast("timestamp")).drop("t_s")
    val right = Seq(
      (10L, "2024-01-02 00:00:00", "r1"),
      (10L, "2024-01-10 00:00:00", "r2"),
      (20L, "2024-01-15 00:00:00", "r3"))
      .toDF("rk", "rt_s", "tag").withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")

    val out = AsofJoin.asofForward(left, right, "k", "rk", "t", "rt", Seq("tag"))
      .select(col("id"), col("asof.tag").as("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("r2"))
    assert(out(2L).contains("r2"))
    assert(out(3L).isEmpty)
    assert(out(4L).contains("r3"))
  }
}
