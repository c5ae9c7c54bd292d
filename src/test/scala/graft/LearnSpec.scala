package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Learn

/** Driver-side brute-force parity for the supervised supersteps (q99/q100).
  * The DuckDB oracle pins cross-engine bytes; this pins the math against a
  * from-scratch Scala reimplementation on the sf0.001 corpus. */
class LearnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  private lazy val docs: Array[(String, String)] = spark.read
    .parquet(s"$dir/documents.parquet")
    .select($"lang", $"text").as[(String, String)].collect()

  private val stop = Set("the", "a", "of", "and")

  test("q99: gradient equals a from-scratch perceptron pass") {
    val w = Learn.W.map(_._2)
    var nMis = 0L
    val grad = Array.fill(4)(0L)
    for ((lang, text) <- docs) {
      val words = text.trim.split("\\s+")
      val y = if (lang == "en") 1L else -1L
      val x = Array(1L, words.length.toLong, text.length.toLong,
        words.count(stop).toLong)
      val m = w.zip(x).map { case (wi, xi) => wi * xi }.sum
      if (y * m <= 0) { nMis += 1; for (j <- 0 until 4) grad(j) += y * x(j) }
    }
    val out = Learn.q99PerceptronStep.run(spark, dir)
      .select($"feature", $"n_docs", $"n_mis", $"grad", $"w_new")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 4)
    Learn.W.zipWithIndex.foreach { case ((name, wi), j) =>
      val (_, nDocs, mis, g, wNew) = out(name)
      assert(nDocs == docs.length.toLong)
      assert(mis == nMis)
      assert(g == grad(j), s"grad mismatch for $name")
      assert(wNew == (wi * 1000L + grad(j)).toDouble / 1000000.0)
    }
  }

  test("q100: contingency and chi-squared equal a from-scratch recount") {
    val nDocs = docs.length.toLong
    val nEn = docs.count(_._1 == "en").toLong
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((lang, text) <- docs) {
      val en = if (lang == "en") 1L else 0L
      for (t <- text.trim.split("\\s+").distinct) {
        val (a, b) = counts.getOrElse(t, (0L, 0L))
        counts(t) = (a + en, b + (1L - en))
      }
    }
    val expected = counts.toSeq
      .filter { case (_, (a, b)) => a + b >= 5 && a + b < nDocs }
      .map { case (t, (a, b)) =>
        val c = nEn - a; val d = nDocs - nEn - b
        val adbc = a * d - b * c
        val chi2 = nDocs.toDouble * adbc.toDouble * adbc.toDouble /
          ((a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble)
        (t, a, b, c, d, chi2)
      }
      .sortBy { case (t, _, _, _, _, chi2) => (-chi2, t) }
      .take(30)
    val out = Learn.q100Chi2Terms.run(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == expected)
  }
}
