package graft

import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.{SparseVector, Vectors}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Cross-check: the spark.ml MinHashLSH path (SURVEY.md §2.11's standard-
  * library option) agrees with our custom xxhash64 MinHash+banding pipeline
  * on which documents are near-duplicates. Feature vectors are shingle-hash
  * sets; approxSimilarityJoin's Jaccard distance threshold mirrors our 0.5.
  */
class MlDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("spark.ml MinHashLSH finds the same high-Jaccard pairs as the custom sketch") {
    val dim = 1 << 20
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
      .withColumn("w", graft.operators.TextAnalysis.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.shingles(col("w"))).as("shingle"))
      .withColumn("idx", pmod(xxhash64(col("shingle")), lit(dim)).cast("int"))
      .groupBy("doc_id").agg(collect_set("idx").as("idxs"))
      .map { r =>
        val idxs = r.getAs[Seq[Int]]("idxs").distinct.sorted.toArray
        (r.getLong(0), Vectors.sparse(dim, idxs, Array.fill(idxs.length)(1.0)))
      }.toDF("doc_id", "features")

    val model = new MinHashLSH().setNumHashTables(8).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(docs)
    val mlPairs = model.approxSimilarityJoin(docs, docs, 0.5, "jaccard_dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
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
