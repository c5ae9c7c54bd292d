// Scratch runner: EXECUTES a named query, then prints the final (post-AQE)
// physical plan — the only place runtime exchange/stage reuse is visible.
// Usage: bash tools/run.sh graft.tools.ExplainExec <query_name> [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkPosture

object ExplainExec {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkPosture(SparkSession.builder()).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    // collect() drives df's OWN QueryExecution (count() would build a new
    // aggregate QueryExecution and leave this one unexecuted — the printed
    // adaptive plan would still be the initial one)
    df.collect()
    // scalastyle:off println
    println(df.queryExecution.executedPlan.toString)
    // scalastyle:on println
    spark.stop()
  }
}
