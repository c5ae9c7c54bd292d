package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print sketch-vs-exact deviations per sf dir, to size the q19/q49
  * error-bound flags. Usage: runMain graft.tools.SketchDev <sfDir>... */
object SketchDev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      graft.sources.Tables(spark, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact"),
          approx_count_distinct(col("user_id")).as("approx"),
          approx_count_distinct(col("user_id"), 0.01).as("approx_rsd01"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("amed"),
          expr("percentile(value, 0.5)").as("emed"))
        .collect().foreach { r =>
          val (t, e, a, a01) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
          val (am, em) = (r.getDouble(4), r.getDouble(5))
          println(f"[dev] $dir $t exact=$e approx=$a (${100.0 * (a - e) / e}%.2f%%) " +
            f"rsd01=$a01 (${100.0 * (a01 - e) / e}%.2f%%) med dev=${100 * (am - em) / em}%.3f%%")
        }
    }
    spark.stop()
  }
}
