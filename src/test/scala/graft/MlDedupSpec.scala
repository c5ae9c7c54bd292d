package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Cross-check: the spark.ml MinHashLSH path (SURVEY.md §2.11's standard-
  * library option; single definition in `tools.MlDedupBench.mlPairs`)
  * agrees with our custom MinHash+banding pipeline on which documents are
  * near-duplicates. approxSimilarityJoin's Jaccard distance threshold
  * mirrors our 0.5. */
class MlDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("spark.ml MinHashLSH finds the same high-Jaccard pairs as the custom sketch") {
    val mlPairs = graft.tools.MlDedupBench.mlPairs(spark, TestSpark.sf0001, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val custom = Dedup.jaccardPairs(spark, TestSpark.sf0001)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(custom.nonEmpty)
    val recall = custom.count(mlPairs.contains).toDouble / custom.size
    assert(recall >= 0.8, s"ml recall $recall of ${custom.size} ground-truth pairs")
  }
}
