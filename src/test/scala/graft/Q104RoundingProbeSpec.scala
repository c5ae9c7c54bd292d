package graft

import java.math.{BigDecimal => JBig, RoundingMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ranking

/** Exhaustive evidence that q104's 1e-6-grid rounding is engine-portable —
  * the load-bearing probe behind giving the textbook-ln BM25 a DuckDB hash
  * oracle at all (Ranking.bm25ScoredIdf doc).
  *
  * Cross-engine error budget: `ln` may differ between the JVM and DuckDB in
  * the last ulp (measured 7/5550 idf inputs), and each engine's `round`
  * implementation differs (Spark: shortest-decimal-string HALF_UP; DuckDB:
  * scaled `std::round`), with value-domain error ≲1e-14 on scores ≤64. So
  * the rounded values agree whenever every raw score sits ≥1e-12 from the
  * nearest rounding boundary (k+0.5)·1e-6, and the rank permutations agree
  * whenever scores from DIFFERENT score-determining inputs are separated by
  * ≥1e-9 (equal inputs give bit-equal scores in each engine, and the
  * doc_id tiebreak then matches). Both margins are checked here over EVERY
  * corpus score at EVERY test SF, in exact decimal arithmetic — a new
  * corpus that violates them fails CI loudly instead of hash-mismatching. */
class Q104RoundingProbeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val half = new JBig("0.5")
  private val million = new JBig(1000000)
  // 1e-12 in value units = 1e-6 in the ×1e6 scaled units used below
  private val boundaryMargin = new JBig("1e-6")

  /** Distance (scaled ×1e6) from s to the nearest rounding boundary, exact. */
  private def boundaryDist(s: Double): JBig = {
    val scaled = new JBig(s).multiply(million) // new JBig(double) is exact
    val frac = scaled.subtract(scaled.setScale(0, RoundingMode.FLOOR)) // [0,1)
    frac.subtract(half).abs()
  }

  // sf1/sf3 (10×/30× sf0.1, tools/gen_sf.py) are ALWAYS registered tests:
  // `assume` inside the body makes ScalaTest report them CANCELED on
  // machines without the corpora — visible in the run summary, never a
  // silent skip.
  private val outOfGateDirs = Seq("/tmp/sf1", "/tmp/sf3")

  for (dir <- TestSpark.allSfs ++ outOfGateDirs)
    test(s"q104 probe @ $dir: no score near a 1e-6 boundary; input-distinct scores separated") {
      assume(new java.io.File(s"$dir/documents.parquet").exists(),
        s"corpus $dir absent — generate with: python3 tools/gen_sf.py $dir <replicas>")
      // one row per distinct score-determining input (dl, tf*) — the score is
      // a pure function of these, so equal inputs are bit-equal in BOTH
      // engines and need no separation.
      val rows = Ranking.bm25LnRaw(spark, dir)
        .select(col("dl"), col("tf_query"), col("tf_scan"), col("tf_vector"),
          col("bm25_ln"))
        .distinct()
        .as[(Long, Long, Long, Long, Double)].collect()
      assert(rows.nonEmpty)

      // (a) boundary distance, every score (all-zero-tf rows score exactly 0,
      // which is its own grid point — distance is exactly 0.5 scaled)
      rows.foreach { case (dl, t0, t1, t2, s) =>
        val d = boundaryDist(s)
        assert(d.compareTo(boundaryMargin) > 0,
          s"score $s (dl=$dl tf=$t0/$t1/$t2) sits ${d.toPlainString} scaled units " +
            "from a 1e-6 rounding boundary (< 1e-12 in value units)")
      }

      // (b) zero-tf docs score EXACTLY 0.0 regardless of dl (both engines:
      // idf * 0.0) — the only legitimate cross-input score collision
      val zero = rows.filter(r => r._2 == 0 && r._3 == 0 && r._4 == 0)
      zero.foreach { case (dl, _, _, _, s) =>
        assert(s == 0.0, s"zero-tf doc (dl=$dl) scored $s, expected exact 0.0")
      }

      // (c) distinct nonzero-tf inputs map to distinct scores, pairwise
      // separated (and separated from 0.0) by more than the rank-flip margin
      val nz = rows.filter(r => r._2 + r._3 + r._4 > 0)
      val nzScores = nz.map(_._5)
      assert(nzScores.distinct.length == nz.length,
        "two distinct (dl, tf*) inputs collided to one double score")
      val all = (0.0 +: nzScores).sorted
      val minGap = all.iterator.sliding(2).map(p => p(1) - p(0)).min
      assert(minGap > 1e-9,
        f"adjacent distinct scores only $minGap%.3e apart — rank order could " +
          "differ across engines")
    }
}
