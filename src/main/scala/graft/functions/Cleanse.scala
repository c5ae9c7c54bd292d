package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's scalar-function surface (SURVEY.md §2.8) as composable
  * `Column => Column` builders. All of these stay inside whole-stage codegen
  * (pure built-ins, no UDFs), so they cost nothing extra at 100 TB.
  */
object Cleanse {

  /** F1 — LOWER(TRIM(x)); reference transform-complex-full.py:24,51-52,161. */
  def normLower(c: Column): Column = lower(trim(c))

  /** F2 — UPPER(TRIM(x)); reference transform-complex-full.py:36-37,44-45,96-97. */
  def normUpper(c: Column): Column = upper(trim(c))

  /** F4 — exact money type; reference numeric(12,2) at
    * transform-complex-full.py:63-64. We widen to DECIMAL(18,6).
    *
    * Why scale 6: testdata money values are 2-decimal doubles, and every
    * money expression we build (price × (1±2-decimal rate) × (1±rate)) has at
    * most 6 true decimal digits. At scale 6 the double→decimal cast is
    * therefore EXACT — no rounding occurs — which makes distributed SUMs
    * order-independent AND engine-independent.
    *
    * GENERAL CAST-SCALE RULE (learned twice on this corpus): cast a derived
    * double at the TRUE decimal scale of the quantity it approximates, never
    * finer. Spark rounds the exact binary expansion HALF_UP while DuckDB
    * rounds the shortest decimal representation HALF_EVEN; the two agree iff
    * the double sits far (≫ rounding half-grid) from a scale boundary, which
    * holds exactly when the scale matches the value's true decimal grid —
    * the FP error (ulps of arithmetic) is then tiny vs half a grid step.
    * Observed failures: scale 4 for 6-decimal money products (q01/q04) and
    * scale 8 for 4-decimal squared prices (q53).
    */
  val MoneyType: DecimalType = DecimalType(18, 6)
  def money(c: Column): Column = c.cast(MoneyType)

  /** F5/F6 — COALESCE / NULLIF(x,0); reference transform-complex-full.py:52,71. */
  def nullIfZero(c: Column): Column = nullif(c, lit(0))

  /** F7 — EXTRACT(EPOCH FROM (a-b))/86400.0 as fractional days; reference
    * transform-complex-full.py:169,175,182. Microsecond-exact: difference in
    * long micros, one double division, so DuckDB's
    * (epoch_us(a)-epoch_us(b))/86400000000.0 reproduces identical bits. */
  def fracDays(a: Column, b: Column): Column =
    (unix_micros(a.cast(TimestampType)) - unix_micros(b.cast(TimestampType))) / lit(8.64e10)

  /** J7/F11 — dictionary lookup with NULL on miss (pandas `.map` semantics;
    * reference create_dimensions.py:54-63). `element_at` on a map literal
    * yields NULL for absent keys, matching exactly. */
  def mapLookup(dict: Map[String, String], key: Column): Column =
    element_at(typedLit(dict), key)

  /** Exact-sum-of-doubles helper: per-row IEEE arithmetic (deterministic and
    * engine-identical) → exact decimal cast → order-independent SUM. Callers
    * cast the result back to double for oracle-type parity. */
  def moneySum(perRow: Column): Column = sum(money(perRow))
}
