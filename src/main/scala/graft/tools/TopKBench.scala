package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.1", "lineitem")
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$label run$i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    time("window row_number") {
      li.withColumn("rk", row_number().over(Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)))
        .filter(col("rk") <= 10).drop("rk").count()
    }
    time("graft TopK exec") {
      graft.plans.TopK.perGroup(li, Seq("l_returnflag"),
        Seq("l_extendedprice" -> false, "l_orderkey" -> true, "l_linenumber" -> true), 10).count()
    }
    spark.stop()
  }
}
