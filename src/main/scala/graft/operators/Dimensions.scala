package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cleanse._
import graft.sources.Tables

/** Dimension builder — the `create_dimensions.py` capability (SURVEY.md
  * §2.7 U1, §2.4 A7, §1.3 surrogate keys) on the testdata role mapping
  * (FIXTURES.md §2: customer ∪ supplier keys play the three location
  * sources; nation/region play the state-name enrichment).
  *
  * Pipeline: unionByName → distinct → na.drop → dict-lookup → deterministic
  * surrogate key, exactly the reference's order of operations
  * (create_dimensions.py:49-67; dedup BEFORE dropna — SURVEY.md §7.4 item 7).
  */
object Dimensions {

  /** J7 analog of the 27-entry state_code→state_name dict
    * (create_dimensions.py:54-63): region → zone, intentionally missing one
    * key ("MIDDLE EAST") so the NULL-on-miss `.map` semantics are exercised. */
  val zoneDict: Map[String, String] = Map(
    "AFRICA" -> "EMEA", "EUROPE" -> "EMEA", "ASIA" -> "APAC", "AMERICA" -> "AMER")

  /** U1 + A7 + P4: union of customer/supplier nation keys, dedup, drop nulls. */
  def locationKeys(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val supp = Tables(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    cust.unionByName(supp).distinct().na.drop("any")
  }

  /** Full dim build with surrogate key. The reference's key is the pandas row
    * index (create_dimensions.py:67) — order-dependent; we use
    * row_number() over an explicit natural-key sort for determinism
    * (SURVEY.md §7.4 item 2).
    *
    * Scale note: the global-order window is a single-partition sort, which is
    * correct ONLY because dimensions are small by definition (distinct keys,
    * here ≤25 rows; Olist ≈27k). Fact-side surrogate keys would instead use
    * zipWithIndex-style partition offsets. Enrichment joins are broadcast —
    * nation/region are tiny dims. */
  def dimLocations(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    locationKeys(spark, dir)
      .join(broadcast(nation), col("nationkey") === col("n_nationkey"), "left")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        col("nationkey"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"),
        mapLookup(zoneDict, col("r_name")).as("zone"))
      .withColumn("location_id",
        (row_number().over(Window.orderBy(col("nationkey"))) - 1).cast("long"))
  }

  val locationKeysOracle: String =
    """SELECT DISTINCT nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey FROM supplier
      |) u WHERE nationkey IS NOT NULL""".stripMargin

  val dimLocationsOracle: String =
    s"""WITH keys AS ($locationKeysOracle)
       |SELECT nationkey, n_name AS nation_name, r_name AS region_name,
       |  CASE WHEN r_name = 'AFRICA' THEN 'EMEA'
       |       WHEN r_name = 'EUROPE' THEN 'EMEA'
       |       WHEN r_name = 'ASIA' THEN 'APAC'
       |       WHEN r_name = 'AMERICA' THEN 'AMER'
       |       ELSE NULL END AS zone,
       |  CAST(ROW_NUMBER() OVER (ORDER BY nationkey) - 1 AS BIGINT) AS location_id
       |FROM keys
       |LEFT JOIN nation ON nationkey = n_nationkey
       |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin
}
