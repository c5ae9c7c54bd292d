package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Similarity

class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine(
        Similarity.toDoubleArray(col("a")), Similarity.toDoubleArray(col("b"))).as("c"))
      .as[Double].collect()
    assert(out(0) === 1.0)
    assert(out(1) === 0.0)
    assert(out(2) === -1.0)
  }

  test("dot is a left-to-right sequential fold (deterministic)") {
    val df = Seq((Array(0.1, 0.2, 0.3), Array(1.0, 1.0, 1.0))).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b")).as("d")).as[Double].head()
    assert(out == ((0.1 * 1.0) + (0.2 * 1.0)) + (0.3 * 1.0)) // exact bit match
  }
}
