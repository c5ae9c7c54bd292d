package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dimensions

class DimensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("surrogate keys are dense 0..N-1 in natural-key order, deterministic across runs") {
    val a = Dimensions.dimLocations(spark, TestSpark.sf0001).collect()
    val b = Dimensions.dimLocations(spark, TestSpark.sf0001).collect()
    val ids = a.map(_.getAs[Long]("location_id")).sorted
    assert(ids.toSeq == ids.indices.map(_.toLong))
    assert(a.map(r => (r.getAs[Long]("location_id"), r.getAs[Int]("nationkey"))).sortBy(_._1).toSeq ==
           b.map(r => (r.getAs[Long]("location_id"), r.getAs[Int]("nationkey"))).sortBy(_._1).toSeq)
  }

  test("zone dict lookup yields NULL on miss (MIDDLE EAST absent by design)") {
    val rows = Dimensions.dimLocations(spark, TestSpark.sf0001)
      .select("region_name", "zone").distinct().collect()
      .map(r => (r.getAs[String]("region_name"), Option(r.getAs[String]("zone")))).toMap
    assert(rows.get("MIDDLE EAST").flatten.isEmpty)
    assert(rows.get("EUROPE").flatten.contains("EMEA"))
  }
}
