package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ScaleLayout

/** Skew evidence probe (VERDICT r7 item 7): a deliberately skewed join —
  * one hot key carrying half the fact — driven three ways:
  *
  *  1. plain shuffle join with AQE skew handling ON → the executed plan
  *     shows the hot partition SPLIT (`AQEShuffleRead ... skewed`,
  *     `SortMergeJoin(skew=true)`);
  *  2. plain shuffle join with AQE skew handling OFF → the straggler
  *     baseline (one task sorts half the fact);
  *  3. `ScaleLayout.saltedJoin` with AQE skew handling OFF → the explicit
  *     rewrite for plans AQE can't touch, checked row-identical to (2) by
  *     an order-insensitive checksum.
  *
  * The fact is 8M rows, 50% on key 0, the rest uniform over 100k keys; the
  * dim is 100k single-row keys, forced out of broadcast (as a wide dim
  * would be at cluster scale) so the join actually shuffles.
  *
  * Usage: bash tools/run.sh graft.tools.SkewProbe
  */
object SkewProbe {
  private val N = 8000000L
  private val KEYS = 100000L

  private def fact(spark: SparkSession): DataFrame =
    spark.range(N).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(KEYS))).as("key"),
      (col("id") * 3 % 1000).as("v"))

  private def dim(spark: SparkSession): DataFrame =
    spark.range(KEYS).select(col("id").as("key"),
      concat(lit("payload_"), col("id")).as("tag"))

  /** Order-insensitive checksum; returns the FINALIZED adaptive plan of the
    * execution that produced it (the base df's own plan never finalizes —
    * only derived plans execute). */
  private def checksum(df: DataFrame): (java.math.BigDecimal, String) = {
    val agg = df.agg(sum(xxhash64(col("key"), col("v"), col("tag")).cast("decimal(38,0)")))
    val v = agg.collect()(0).getDecimal(0)
    (v, agg.queryExecution.executedPlan.toString())
  }

  /** min-of-2 runs — first execution in a JVM pays codegen/JIT warmup. */
  private def time[A](label: String)(f: => A): A = {
    System.gc()
    val t0 = System.nanoTime()
    val r = f
    val t1 = (System.nanoTime() - t0) / 1e9
    System.gc()
    val t2 = System.nanoTime()
    f
    val t3 = (System.nanoTime() - t2) / 1e9
    println(f"[skew-probe] $label t=${math.min(t1, t3)}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force the dim out of broadcast so the join genuinely shuffles
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // thresholds scaled to the probe's MB-sized partitions (defaults
      // target 256MB cluster partitions)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def joined = fact(spark).join(dim(spark), "key")

    // warmup: pay whole-stage codegen + JIT once, outside any measurement
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    checksum(joined)

    // 1. AQE skew handling ON: hot partition split at runtime
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (aqeSum, plan) = time("plain join, AQE skew ON ")(checksum(joined))
    val skewLines = plan.linesIterator
      .filter(l => l.contains("skew=true") || l.contains("skewed"))
      .map(_.trim.take(120)).take(6).mkString("\n")
    println(s"[skew-probe] AQE skew evidence in executed plan:\n$skewLines")
    if (args.contains("debug")) println(plan.take(5000))

    // 2. AQE skew handling OFF: the straggler baseline
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (plainSum, _) = time("plain join, AQE skew OFF")(checksum(joined))

    // 3. saltedJoin under the same handicap
    val (saltedSum, _) = time("saltedJoin,  AQE skew OFF")(
      checksum(ScaleLayout.saltedJoin(fact(spark), dim(spark), "key", salts = 8)))

    assert(aqeSum == plainSum && plainSum == saltedSum,
      s"checksum mismatch: aqe=$aqeSum plain=$plainSum salted=$saltedSum")
    println(s"[skew-probe] parity OK: checksum=$plainSum for all three plans")
    spark.stop()
  }
}
