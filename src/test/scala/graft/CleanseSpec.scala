package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Cleanse

/** Scalar surface semantics: F7 fractional days, J7 map-miss → NULL,
  * F1/F2 normalization (SURVEY.md §2.8). */
class CleanseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("fracDays is microsecond-exact fractional days") {
    val df = Seq(("2024-01-02 12:00:00.5", "2024-01-01 00:00:00"))
      .toDF("a", "b")
      .select(Cleanse.fracDays(col("a").cast("timestamp"), col("b").cast("timestamp")).as("d"))
    val d = df.as[Double].head()
    assert(math.abs(d - (1.5 + 0.5 / 86400.0)) < 1e-12)
  }

  test("mapLookup misses yield NULL (pandas .map semantics)") {
    val dict = Map("SP" -> "Sao Paulo", "RJ" -> "Rio de Janeiro")
    val out = Seq("SP", "XX", null.asInstanceOf[String]).toDF("code")
      .select(Cleanse.mapLookup(dict, col("code")).as("name"))
      .as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("Sao Paulo"), None, None))
  }

  test("normLower / normUpper trim then case-fold") {
    val out = Seq(("  DeLiVeReD  ", "  são paulo "))
      .toDF("a", "b")
      .select(Cleanse.normLower(col("a")).as("x"), Cleanse.normUpper(col("b")).as("y"))
      .as[(String, String)].head()
    assert(out == ("delivered", "SÃO PAULO"))
  }

  test("money cast is exact for ≤6-decimal values") {
    val out = Seq(12345.678901).toDF("v")
      .select(Cleanse.money(col("v")).cast("string")).as[String].head()
    assert(out == "12345.678901")
  }

  test("nullIfZero") {
    val out = Seq(0, 5).toDF("v")
      .select(Cleanse.nullIfZero(col("v")).as("n")).as[Option[Int]].collect()
    assert(out.toSeq == Seq(None, Some(5)))
  }
}
