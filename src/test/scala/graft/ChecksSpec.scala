package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Checks, Master}

/** Constraint assertions — the reference's PRIMARY KEY declarations
  * (transform-complex-full.py:212-213) as executable checks. */
class ChecksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("orders and dim_locations hold their primary keys") {
    Checks.assertPrimaryKey(
      graft.sources.Tables(spark, TestSpark.sf0001, "orders"), Seq("o_orderkey"))
    Checks.assertPrimaryKey(
      graft.operators.Dimensions.dimLocations(spark, TestSpark.sf0001), Seq("location_id"))
  }

  test("the check catches that synthetic lineitem does NOT key on (order, line)") {
    // Unlike real TPC-H, the driver's generator assigns l_linenumber randomly
    // (sf0.001: 1161 duplicate groups) — so the reference's PK declaration
    // would FAIL on this data; the assertion surfaces exactly that.
    val dups = Checks.duplicateKeys(Master(spark, TestSpark.sf0001),
      Seq("order_key", "line_number"))
    assert(dups.count() > 0)
  }

  test("duplicateKeys surfaces violations") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val dups = Checks.duplicateKeys(df, Seq("k")).collect()
    assert(dups.length == 1 && dups.head.getInt(0) == 1 && dups.head.getLong(1) == 2L)
    intercept[IllegalArgumentException] { Checks.assertPrimaryKey(df, Seq("k")) }
  }

  test("nullViolations catches NULLs in key columns") {
    import spark.implicits._
    val df = Seq((Some(1), "a"), (None, "b")).toDF("k", "v")
    assert(Checks.nullViolations(df, Seq("k")).count() == 1)
  }
}
