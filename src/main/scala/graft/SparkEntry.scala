package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the §2.11 extension
  * surface) is a named entry in `queries`, with DuckDB-equivalent SQL in
  * `oracleSql` where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Operator families — the registry grouped by source module, so bench
    * artifacts can attribute time at a glance (BENCH families key). */
  private def modules: Seq[(String, Seq[Q])] = Seq(
    "core"       -> operators.CoreQueries.all,
    "streaming"  -> streaming.Events.all,
    "text"       -> operators.TextAnalysis.all,
    "dedup"      -> operators.Dedup.all,
    "ranking"    -> operators.Ranking.all,
    "curation"   -> operators.Curation.all,
    "graph"      -> operators.Graph.all,
    "cdc"        -> operators.Cdc.all,
    "learn"      -> operators.Learn.all,
    "sketches"   -> operators.Sketches.all,
    "ann"        -> operators.SimilaritySearch.all,
    "multimodal" -> operators.Multimodal.all)

  private def registry: Seq[Q] = modules.flatMap(_._2)

  /** query name → family, for bench reporting. */
  def families: Map[String, String] =
    modules.flatMap { case (f, qs) => qs.map(_.name -> f) }.toMap

  /** Declared super-linear correctness anchors (brute-force ground truths /
    * fixed-granularity research points with a separate production form) —
    * bench reports these as their own family so production family totals
    * stay readable at scale. */
  def anchors: Set[String] = registry.filter(_.anchor).map(_.name).toSet

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
