package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over ArrayType columns (SURVEY.md §2.10/§2.11
  * extension surface — the one UDF candidate in the reference maps here; we
  * use codegen'd higher-order functions instead of UDFs).
  *
  * Determinism: embeddings are float[]; we cast to double[] FIRST so every
  * product is a double×double IEEE op, then fold left-to-right — bit-for-bit
  * reproducible and identical to DuckDB's sequential list_dot_product.
  */
object Similarity {

  /** float[] → double[] so downstream arithmetic is pure double IEEE. */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product via zip_with + aggregate (codegen-friendly,
    * no UDF). Inputs must already be double[]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with explicit (normA*normB) grouping — the oracle SQL
    * must parenthesize identically for bitwise-equal doubles. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (compute each row's norm once, not once
    * per pair — at 100 TB the norm column is materialized with the vector). */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
