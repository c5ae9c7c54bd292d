package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Retrieval scoring over the `documents` corpus — the ranking half of a
  * training-data pipeline (query-relevance scoring for targeted corpus
  * carving, retrieval-quality probes, contamination triage).
  *
  * Cross-engine exactness: BM25's classic idf is `ln((N-df+0.5)/(df+0.5)+1)`,
  * but `ln` is NOT bitwise-portable between the JVM and DuckDB (probed
  * exhaustively over the df domain at every test SF: 7/5550 inputs differ in
  * the last ulp — enough to flip a hash compare). The score here is the
  * RATIONAL-idf BM25 variant: idf_r = (N-df+0.5)/(df+0.5), composed with the
  * standard saturated-tf term. Every operation is IEEE +,-,*,/ over exactly
  * reproduced operands in an identical evaluation order, so the score is
  * bit-for-bit identical in both engines and fully hash-checked. Swapping
  * the log back in changes only the per-term weight shape, not the plan.
  */
object Ranking {

  /** Literal query-term set (spread of document frequencies in the synthetic
    * vocabulary: "query" common, "scan" common, "vector" rare). */
  private[operators] val queryTerms: Seq[String] = Seq("query", "scan", "vector")

  /** q84 — BM25 document ranking (k1=1.2, b=0.75, rational idf; see object
    * doc). Per-doc term frequencies come straight off the words array (one
    * per-row pass, no explode/shuffle); N, Σdl, and per-term df reduce to a
    * ONE-ROW stats relation that cross-broadcasts back onto the corpus, so
    * the whole scorer is a map-side pass over documents plus one tiny
    * aggregate — at 100 TB the stats row is the only global state, and the
    * final rank window is the one global sort (drop it if only scores are
    * needed; kept here because ranked output is the operator's point).
    * Scale note: tf via `filter(w, …)` is a higher-order function
    * (interpreted); for a hot 100 TB path the q21-style explode+agg shape or
    * a native Expression is the swap-in — at a 3-term query set the
    * per-row cost is negligible. */
  val q84Bm25: Q = Q(
    "q84_bm25",
    (s, dir) => {
      val wtf0 = Tables(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.words(col("text")).as("w"))
        .withColumn("dl", size(col("w")).cast("long"))
      val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
        size(filter(col("w"), x => x === lit(t))).cast("long").as(s"tf$i")
      }
      val wtf = wtf0.select(col("doc_id") +: col("dl") +: tfCols: _*)
      val statCols = Seq(sum(col("dl")).as("sum_dl")) ++
        queryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = wtf.agg(count(lit(1)).as("n_docs"), statCols: _*)
      val scored = wtf.crossJoin(broadcast(stats))
      // avgdl and the per-term scores, assembled in the exact operand order
      // the oracle SQL spells out (doubles are order-sensitive).
      val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
      val termScores = queryTerms.indices.map { i =>
        val tf = col(s"tf$i").cast("double")
        val dfD = col(s"df$i").cast("double")
        val idf = (col("n_docs").cast("double") - dfD + lit(0.5)) / (dfD + lit(0.5))
        val tfn = (tf * lit(2.2)) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
        idf * tfn
      }
      val bm25 = termScores.reduceLeft(_ + _)
      val named = queryTerms.zipWithIndex.map { case (t, i) => col(s"tf$i").as(s"tf_$t") }
      val base = scored.select(
        (col("doc_id") +: col("dl") +: named :+ bm25.as("bm25")): _*)
      base.withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)).cast("long"))
    },
    Some {
      val tfDefs = queryTerms.zipWithIndex.map { case (t, i) =>
        s"    CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf$i"
      }.mkString(",\n")
      val dfDefs = queryTerms.indices.map(i =>
        s"    CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
        .mkString(",\n")
      val scoreSum = queryTerms.indices.map { i =>
        s"((CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) * " +
          s"((CAST(tf$i AS DOUBLE) * 2.2) / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
      }.reduceLeft((a, b) => s"($a + $b)")
      val tfNames = queryTerms.zipWithIndex
        .map { case (t, i) => s"tf$i AS tf_$t" }.mkString(", ")
      raw"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         |t AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         |$tfDefs
         |  FROM d),
         |st AS (
         |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
         |$dfDefs
         |  FROM t),
         |scored AS (
         |  SELECT doc_id, dl, $tfNames,
         |    $scoreSum AS bm25
         |  FROM t CROSS JOIN st)
         |SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
         |FROM scored""".stripMargin
    })

  val all: Seq[Q] = Seq(q84Bm25)
}
