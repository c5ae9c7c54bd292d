package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark query over a testdata dir plus an
  * optional DuckDB-equivalent oracle SQL (driver contract, SURVEY.md §5.1).
  *
  * `oracle` is ANSI SQL the driver executes in DuckDB against the same
  * parquet tables; column names/aliases MUST match the Spark result exactly
  * (the driver sorts columns by name before hashing). Queries whose
  * semantics are not SQL-expressible (e.g. Spark-hash-seeded MinHash) leave
  * `oracle = None` and get a weaker rows-only check.
  *
  * `anchor = true` marks a DECLARED correctness anchor whose cost is
  * super-linear by construction (brute-force ground truth, fixed-granularity
  * research point) and which has a separate production-form operator for
  * scale. Bench reports anchors as their own family so production family
  * totals aren't polluted by ground-truth cost (VERDICT r9 item 3).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    anchor: Boolean = false)

object Q {
  /** Registry helper: turn a list of Q into the two SparkEntry maps. */
  def queryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
