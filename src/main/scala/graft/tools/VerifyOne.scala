package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkPosture
import graft.SparkEntry

/** Verify-style dump for a SUBSET of registry queries — self-check an
  * oracle against DuckDB without paying for the full 110-query sweep.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <qname> [...] */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // sf>=10 probes want more reduce partitions than cores (see TimeQ)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkPosture(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      // coalesce(16), not (1): every checker globs <name>/*.parquet, so a
      // single file was never required — and at sf100 a coalesce(1) pulls
      // a ~100M-row result through ONE write task (q110's dump sat at 1.5
      // cores for hours in round 12). 16 keeps dumps tidy without
      // serializing the tail of the job.
      SparkEntry.queries(name)(spark, sfDir).coalesce(16)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      SparkEntry.oracleSql.get(name).foreach(sql =>
        Files.writeString(Paths.get(s"$outDir/$name.sql"), sql))
    }
    // subset oracle_sql.json so tools/selfcheck.py runs directly on outDir
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val subset = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      subset.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}"))
    graft.operators.Dedup.releaseCaches(spark)
    spark.stop()
  }
}
