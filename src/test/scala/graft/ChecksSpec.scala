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

  test("fkViolations finds orphans but not NULL FKs; lineitem→orders is clean") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("id")
    val child = Seq(Some(1L), Some(3L), None).toDF("pid")
    val orphans = Checks.fkViolations(child, parent, "pid", "id").collect()
    assert(orphans.length == 1 && orphans.head.getLong(0) == 3L)
    // real referential integrity in the fixtures
    val li = graft.sources.Tables(spark, TestSpark.sf0001, "lineitem")
    val ord = graft.sources.Tables(spark, TestSpark.sf0001, "orders")
    assert(Checks.fkViolations(li, ord, "l_orderkey", "o_orderkey").count() == 0)
  }

  test("acceptedValues flags out-of-domain and NULL values") {
    import spark.implicits._
    val df = Seq(Some("A"), Some("X"), None).toDF("flag")
    assert(Checks.acceptedValues(df, "flag", Seq("A", "N", "R")).count() == 2)
    val ord = graft.sources.Tables(spark, TestSpark.sf0001, "lineitem")
    assert(Checks.acceptedValues(ord, "l_returnflag", Seq("A", "N", "R")).count() == 0)
  }

  test("acceptedValues treats NULL as accepted when null is in the set") {
    import spark.implicits._
    val df = Seq(Some("A"), Some("X"), None).toDF("flag")
    val bad = Checks.acceptedValues(df, "flag", Seq("A", null)).collect()
    assert(bad.length == 1 && bad.head.getString(0) == "X")
    // null-only domain: every non-null value violates
    assert(Checks.acceptedValues(df, "flag", Seq(null)).count() == 2)
  }
}
