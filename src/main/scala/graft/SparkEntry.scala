package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the §2.11 extension
  * surface) is a named entry in `queries`, with DuckDB-equivalent SQL in
  * `oracleSql` where the semantics are SQL-expressible.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    operators.CoreQueries.all ++
    streaming.Events.all ++
    operators.TextAnalysis.all ++
    operators.Dedup.all ++
    operators.Ranking.all ++
    operators.Curation.all ++
    operators.Graph.all ++
    operators.Cdc.all ++
    operators.Learn.all ++
    operators.Sketches.all ++
    operators.SimilaritySearch.all ++
    operators.Multimodal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Master(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.queryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Q.oracleMap(registry)
}
