package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.OlistPipeline

/** Prints the executed master-build plan over an existing PipelineBench
  * lake (which join strategies AQE actually picked at that scale).
  * Usage: bash tools/run.sh graft.tools.MasterPlanProbe <lakeDir> */
object MasterPlanProbe {
  def main(args: Array[String]): Unit = {
    val lake = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$lake/$t.parquet")
    val m = OlistPipeline.buildMaster(
      read("orders"), read("order_items"), read("order_payments"),
      read("order_reviews"), read("products"),
      read("product_category_name_translation"),
      read("customers"), read("sellers"), read("dim_locations"))
    m.collect()
    val lines = m.queryExecution.executedPlan.toString().linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.replaceAll("#\\d+L?", "").take(130)).take(40).mkString("\n")
    println(s"[master-plan] $lake:\n$lines")
    spark.stop()
  }
}
