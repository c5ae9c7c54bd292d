package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Catalog-stats mode (Tables.statsMode / GRAFT_CATALOG_STATS=1): reads
  * route through ANALYZEd external catalog tables so leaf relations carry
  * a real rowCount — the input runtime bloom-filter sizing and CBO need.
  * The mode is env-gated, so this spec exercises the registration helper
  * directly through the same SQL it issues and pins the two contracts:
  * (1) the catalog route returns exactly the path-scan rows; (2) the
  * ANALYZEd relation exposes rowCount to the optimizer once
  * planStats is on. */
class CatalogStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def register(name: String): String = {
    val tbl = s"graft_spec_$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dir/$name.parquet'")
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
    tbl
  }

  test("catalog table returns exactly the path-scan relation") {
    val tbl = register("lineitem")
    val viaCatalog = spark.table(tbl)
    val viaPath = Tables(spark, dir, "lineitem")
    assert(viaCatalog.schema == viaPath.schema)
    assert(viaCatalog.count() == viaPath.count())
    assert(viaCatalog.exceptAll(viaPath).isEmpty && viaPath.exceptAll(viaCatalog).isEmpty)
  }

  test("ANALYZE gives the optimizer a rowCount once planStats is enabled") {
    val tbl = register("orders")
    val expected = spark.table(tbl).count()
    val prev = spark.conf.getOption("spark.sql.cbo.planStats.enabled")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val stats = spark.table(tbl).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expected)),
        s"want rowCount=Some($expected), got ${stats.rowCount}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.planStats.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.planStats.enabled")
    }
  }

  test("path scans expose NO rowCount (the gap the mode closes)") {
    val prev = spark.conf.getOption("spark.sql.cbo.planStats.enabled")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val stats = spark.read.parquet(s"$dir/orders.parquet")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isEmpty, s"unexpected rowCount ${stats.rowCount}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.planStats.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.planStats.enabled")
    }
  }

  test("full mode excludes nested AND TIMESTAMP_NTZ columns from ANALYZE") {
    import org.apache.spark.sql.types._
    assert(Tables.statColumns(Tables.schemas("lineitem")) ==
      Tables.schemas("lineitem").fieldNames.toSeq)
    assert(Tables.statColumns(Tables.schemas("embeddings")) ==
      Seq("vec_id", "label")) // embedding: ARRAY<FLOAT> unsupported by ANALYZE
    val ntz = StructType(Seq(
      StructField("k", LongType), StructField("d", TimestampNTZType)))
    assert(Tables.statColumns(ntz) == Seq("k"))
  }

  test("UPSTREAM PIN: NTZ column stats + range predicate MatchErrors under CBO") {
    // Spark 4.1 FilterEstimation.evaluateBinary has no TimestampNTZType
    // case: a range predicate over an NTZ column THAT HAS column stats
    // MatchErrors inside BasicStatsPlanVisitor, killing the whole query
    // with INTERNAL_ERROR when spark.sql.cbo.enabled is on. This is why
    // statColumns excludes NTZ. If a Spark upgrade makes this test FAIL
    // (no more MatchError), drop the exclusion and re-enable NTZ stats.
    val tbl = "graft_spec_ntz_pin"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dir/orders.parquet'")
    assume(spark.table(tbl).schema("o_orderdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS o_orderdate")
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val filtered = spark.table(tbl)
        .filter("o_orderdate >= timestamp'1996-01-01'")
      val err = intercept[Throwable] {
        filtered.queryExecution.optimizedPlan.stats
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(err).exists(_.isInstanceOf[scala.MatchError]),
        s"expected a MatchError in the cause chain, got $err")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("statColumns-guided ANALYZE keeps date-window queries alive under CBO") {
    // the end-to-end counterpart of the UPSTREAM PIN: with the NTZ column
    // excluded exactly as full mode excludes it, the same query that dies
    // when o_orderdate has stats plans and runs fine under cbo.enabled
    val tbl = "graft_spec_cbo_safe"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dir/orders.parquet'")
    val cols = Tables.statColumns(spark.table(tbl).schema)
    assert(!cols.contains("o_orderdate"))
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS" +
      cols.map(c => s"`$c`").mkString(" FOR COLUMNS ", ", ", ""))
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val n = spark.table(tbl)
        .filter("o_orderdate >= timestamp'1996-01-01' AND " +
          "o_orderdate < timestamp'1997-01-01'")
        .count()
      assert(n > 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("events normalization applies on the catalog route too") {
    // Tables.apply("events") must yield TimestampType regardless of route;
    // the catalog table surfaces whatever physical type the footer has.
    val viaPath = Tables(spark, dir, "events")
    assert(viaPath.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val tbl = register("events")
    val viaCatalog = spark.table(tbl)
    // same normalization branch as Tables.apply
    val normalized = viaCatalog.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        viaCatalog.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => viaCatalog
      case _ => viaCatalog.withColumn("ts",
        viaCatalog("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
    assert(normalized.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val a = viaPath.agg(min("ts"), max("ts"), count(lit(1))).first()
    val b = normalized.agg(min("ts"), max("ts"), count(lit(1))).first()
    assert(a == b)
  }
}
