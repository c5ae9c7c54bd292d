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

  private def bigramsOf(text: String): Seq[(String, String)] = {
    val w = text.trim.split("\\s+")
    if (w.length < 2) Seq.empty else w.sliding(2).map(p => (p(0), p(1))).toSeq
  }

  test("q102: quantized bigram-LM scores equal a from-scratch recount") {
    val allDocs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, t) <- allDocs; bg <- bigramsOf(t)) c2(bg) = c2.getOrElse(bg, 0L) + 1
    val c1 = c2.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val expected = allDocs.flatMap { case (id, t) =>
      val bgs = bigramsOf(t)
      if (bgs.isEmpty) None
      else Some(id -> (bgs.length.toLong,
        bgs.map(bg => 1000000L * c2(bg) / c1(bg._1)).sum))
    }.toMap
    val got = Learn.q102BigramLm.run(spark, dir)
      .select($"doc_id", $"n_bigrams", $"sum_q", $"fluency")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == expected.size)
    for ((id, n, sq, fl) <- got) {
      assert((n, sq) == expected(id), s"doc $id")
      assert(fl == sq.toDouble / (n * 1000000L).toDouble)
    }
  }

  test("q103: dsir weights favor the target slice on average") {
    val out = Learn.q103DsirWeights.run(spark, dir).cache()
    // weights live in [0, ~1+]: qt <= 10^6 per bigram; and sum_qt <= would
    // not generally bound by sum_qs, but zero-target bigrams force qt=0
    assert(out.filter($"dsir_weight" < 0.0).count() == 0)
    val meanByClass = out.groupBy($"lang" === "en")
      .agg(org.apache.spark.sql.functions.avg($"dsir_weight"))
      .as[(Boolean, Double)].collect().toMap
    // the target LM is trained ON the en slice: en docs must score higher
    assert(meanByClass(true) > meanByClass(false))
    out.unpersist()
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
