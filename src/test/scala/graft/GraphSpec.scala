package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("pagerank superstep conserves damped rank mass and is deterministic") {
    val rows = Graph.q68PagerankStep.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // bipartite namespacing holds
    assert(rows.forall { case (id, tpe, _, _, _) =>
      (id % 2 == 0) == (tpe == "part") })
    // every rank has the damping floor; total mass ≈ 1 (integer-division
    // remainders only lose < nEdges quanta of 2^-30 each)
    val n = rows.length
    assert(rows.forall(_._5 >= 0.15 / n))
    val total = rows.map(_._5).sum
    assert(math.abs(total - 1.0) < 1e-3, s"mass not conserved: $total")
  }

  test("pagerank iteration is bit-identical across runs and keeps mass bounded") {
    def run() = Graph.pagerankIterate(spark, TestSpark.sf0001, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val a = run()
    val b = run()
    assert(a == b, "fixed-point iteration must be bit-reproducible")
    val total = a.map(_._2).sum.toDouble / (1L << 30).toDouble
    assert(total > 0.9 && total <= 1.0 + 1e-9, s"scaled mass drifted: $total")
  }
}
