package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB scale (SURVEY.md §4: the reference's
  * secondary indexes map to partitioning/bucketing; its batched-write tuning
  * maps to shuffle-free co-located joins).
  */
object ScaleLayout {

  /** Write a table bucketed+sorted on its join key. Two tables bucketed the
    * same way join with ZERO exchanges (verified in ScaleLayoutSpec): at
    * 100 TB this turns the recurring fact⨝fact shuffle into a local
    * per-bucket sort-merge — the Spark analog of the reference's indexed
    * master table (transform-complex-full.py:215-221). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Stage a layout write into `path + suffix`, then rename-swap into
    * place: EVERY ScaleLayout path write is crash-consistent — a direct
    * `overwrite` of a live lake path deletes the old data before the job
    * runs, so a mid-job failure leaves the path neither old nor new (the
    * exportEpoch tear the r9 kill-and-resume specs caught). The written
    * relation routes through `withFailpoint(staging)` so those specs can
    * inject mid-write task failures here too. */
  private def writeStaged(spark: SparkSession, path: String, suffix: String)(
      write: String => Unit): Unit = {
    val staging = path + suffix
    write(staging)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    stagedSwap(fs, path, staging)
  }

  /** Date-partitioned lake layout: partition pruning serves the reference's
    * timestamp index use case (BI range scans touch only matching files). */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    writeStaged(df.sparkSession, path, ".datestage") { staging =>
      withFailpoint(df.withColumn("part_date", to_date(col(tsCol))), staging)
        .write.mode("overwrite")
        .partitionBy("part_date")
        .parquet(staging)
    }

  /** Recursive parquet inventory of a lake directory (flat or
    * Hive-partitioned): (fileCount, totalBytes). */
  private def parquetInventory(fs: org.apache.hadoop.fs.FileSystem,
      p: String): (Int, Long) = {
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
    var n = 0; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }

  /** Hive-style partition column chain of a lake directory: the `k=v`
    * directory names from root to leaf (empty for a flat layout). */
  private def partitionCols(fs: org.apache.hadoop.fs.FileSystem,
      p: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = new Path(p)
    var next = Option(cur)
    while (next.isDefined) {
      next = fs.listStatus(next.get).collectFirst {
        case s if s.isDirectory && s.getPath.getName.contains("=") => s.getPath
      }
      next.foreach(d => cols += d.getName.split("=", 2)(0))
    }
    cols.toSeq
  }

  /** Swap `staging` into place at `path` with the source renamed aside
    * first: a crash mid-swap leaves the data recoverable at `path + ".old"`
    * instead of deleted (the delete of the old copy is the LAST step). A
    * missing `path` (first-ever write) is fine: the rename-aside is a no-op
    * and staging renames straight into place. */
  private[operators] def stagedSwap(fs: org.apache.hadoop.fs.FileSystem,
      path: String, staging: String): Unit = {
    import org.apache.hadoop.fs.Path
    val old = new Path(path + ".old")
    fs.delete(old, true)
    // Hadoop FileSystem.rename reports most failures (dest exists, parent
    // missing, permissions) by returning FALSE, not throwing — an unchecked
    // call would report a failed commit as success while `path` still holds
    // stale (or, worse, no) data. Every rename here must prove it happened.
    def renameOrDie(src: Path, dst: Path): Unit =
      require(fs.rename(src, dst), s"stagedSwap: rename $src -> $dst failed")
    // existence-guarded: ChecksumFileSystem.rename THROWS on a missing
    // source (copy fallback) rather than returning false, so a first-ever
    // write must skip the rename-aside
    if (fs.exists(new Path(path))) renameOrDie(new Path(path), old)
    renameOrDie(new Path(staging), new Path(path))
    fs.delete(old, true)
  }

  /** Test-only failpoint for the crash-consistency specs: when set to
    * Some(marker, n), a staged write whose STAGING path contains `marker`
    * throws in task 0 after emitting n rows — a deterministic mid-job task
    * failure, injected between the plan and the sink exactly where a lost
    * executor would land. Path-scoped so concurrently running suites
    * cannot poison each other's writes; never set outside tests. */
  private[graft] val failpoint =
    new java.util.concurrent.atomic.AtomicReference[Option[(String, Int)]](None)

  /** Route a to-be-written DataFrame through the failpoint (no-op — the
    * very same plan — unless `failpoint` targets `stagingPath`). */
  private[graft] def withFailpoint(df: DataFrame, stagingPath: String): DataFrame =
    failpoint.get() match {
      case Some((marker, n)) if stagingPath.contains(marker) =>
        implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
          org.apache.spark.sql.Encoders.row(df.schema)
        df.mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var seen = 0
          it.map { r =>
            seen += 1
            if (pid == 0 && seen > n)
              throw new RuntimeException(
                "graft failpoint: injected mid-write task failure")
            r
          }
        }
      case _ => df
    }

  /** Small-file compaction for a parquet lake directory — the steady-state
    * maintenance job a 100 TB lake cannot live without (streaming sinks and
    * fine-grained partitions accrete kilobyte files; scan throughput dies on
    * per-file open cost). Files and bytes are counted RECURSIVELY, so
    * Hive-partitioned layouts (writeDatePartitioned output) are sized
    * correctly; a partitioned input is rewritten with `partitionBy` on its
    * inferred partition chain — one task per partition value — preserving
    * the layout partition pruning depends on. Flat inputs rewrite into
    * ceil(bytes/targetBytes) files via a round-robin repartition (no shuffle
    * key — pure bin-packing; within-file order is not part of the lake
    * contract, which is also why rewriting is safe mid-pipeline). Returns
    * (filesBefore, filesAfter). The rewrite stages into `path + ".compact"`,
    * then swaps via rename-aside (see `stagedSwap`), so no failure point
    * leaves the lake without a recoverable copy. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (filesBefore, totalBytes) = parquetInventory(fs, path)
    val parts = partitionCols(fs, path)
    val staging = path + ".compact"
    val src = spark.read.parquet(path)
    if (parts.isEmpty) {
      val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      withFailpoint(src.repartition(n), staging)
        .write.mode("overwrite").parquet(staging)
    } else {
      withFailpoint(src.repartition(parts.map(col): _*), staging)
        .write.mode("overwrite").partitionBy(parts: _*).parquet(staging)
    }
    val (filesAfter, _) = parquetInventory(fs, staging)
    stagedSwap(fs, path, staging)
    (filesBefore, filesAfter)
  }

  /** Incremental MERGE upsert for a parquet lake table (the step beyond the
    * reference's whole-table `if_exists='replace'` load): latest row per
    * key wins, decided by `versionCol` (ties to existing rows lose — an
    * equal-version update is applied). Implemented as unionByName →
    * per-key max-version keep, which is ONE shuffle on the key at any
    * scale; the rewrite uses the same staged-swap protocol as `compact`,
    * so a failed merge never destroys the base table. For recurring merges
    * at 100 TB, store the base bucketed on `key` (writeBucketed) so the
    * keep-window shuffles only the delta. */
  def mergeUpsert(spark: SparkSession, path: String, updates: DataFrame,
      key: String, versionCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.expressions.Window
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = spark.read.parquet(path).withColumn("__src", lit(0))
    val merged = base.unionByName(updates.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col(versionCol).desc, col("__src").desc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
    val staging = path + ".merge"
    withFailpoint(merged, staging).write.mode("overwrite").parquet(staging)
    stagedSwap(fs, path, staging)
  }

  /** Range-partitioned, sorted-within-partition write — the global-sort lake
    * layout: file i holds a contiguous key range disjoint from file i+1's, so
    * parquet min/max footer stats become a coarse index (a range predicate
    * opens only the files whose range intersects it — the single-dimension
    * form of clustering/Z-ordering). repartitionByRange samples the key to
    * build balanced range bounds (one pass at any scale) and
    * sortWithinPartitions is a local sort — NO global merge stage; at 100 TB
    * this is the layout that makes time-travel/backfill scans touch only
    * their slice of the lake. */
  def writeSortedRange(df: DataFrame, path: String, sortCol: String,
      partitions: Int): Unit =
    writeStaged(df.sparkSession, path, ".sortstage") { staging =>
      withFailpoint(df.repartitionByRange(partitions, col(sortCol))
        .sortWithinPartitions(sortCol), staging)
        .write.mode("overwrite").parquet(staging)
    }

  /** Morton (Z-order) value: min-max quantize each clustering column to
    * `bits` bits, then interleave the bits — nearby z-values are nearby in
    * EVERY dimension, so range-partitioning on the z-value clusters files in
    * all clustering columns at once. Pure bit arithmetic on longs (shift/and/
    * or), fully inside whole-stage codegen. 16 bits × 2-4 dims stays well
    * under the 63-bit budget. */
  private[operators] def zValue(cols: Seq[org.apache.spark.sql.Column],
      mins: Seq[Double], maxs: Seq[Double], bits: Int): org.apache.spark.sql.Column = {
    val maxQ = (1L << bits) - 1
    val quantized = cols.zipWithIndex.map { case (c, i) =>
      val span = math.max(maxs(i) - mins(i), java.lang.Double.MIN_NORMAL)
      least(lit(maxQ), greatest(lit(0L),
        floor((c.cast("double") - lit(mins(i))) / lit(span) * lit(maxQ.toDouble)).cast("long")))
    }
    val terms = for {
      b <- 0 until bits; (q, i) <- quantized.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * cols.length + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-order clustered write — the multi-dimension generalization of
    * `writeSortedRange`: each output file holds a compact BOX in the space of
    * the clustering columns, so parquet min/max footer stats prune files for
    * predicates on ANY subset of those columns (a 1-D sort only serves its
    * own leading column). The min/max scan is one cheap aggregate pass; the
    * clustered write is one range shuffle on the z-value + a local sort —
    * the same two-pass cost as a plain global sort at any scale. This is the
    * lake layout for multi-tenant scan patterns at 100 TB (time × tenant,
    * partkey × suppkey) where no single sort key serves every query. */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
      partitions: Int, bits: Int = 16): Unit = {
    require(bits * clusterCols.length <= 62,
      s"z-value needs ${bits * clusterCols.length} bits; max 62")
    val stats = df.agg(
      min(col(clusterCols.head)).cast("double"),
      (clusterCols.tail.map(c => min(col(c)).cast("double")) ++
        clusterCols.map(c => max(col(c)).cast("double"))): _*).head()
    val n = clusterCols.length
    if (stats.isNullAt(0)) { // empty or all-NULL input: nothing to cluster
      writeStaged(df.sparkSession, path, ".zstage") { staging =>
        df.write.mode("overwrite").parquet(staging)
      }
      return
    }
    val mins = (0 until n).map(stats.getDouble)
    val maxs = (n until 2 * n).map(stats.getDouble)
    writeStaged(df.sparkSession, path, ".zstage") { staging =>
      withFailpoint(df.withColumn("__z",
          zValue(clusterCols.map(col), mins, maxs, bits))
        .repartitionByRange(partitions, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z"), staging)
        .write.mode("overwrite").parquet(staging)
    }
  }

  /** Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
    * skew at runtime; this explicit variant covers plans AQE can't rewrite
    * (e.g. when the skewed side feeds a co-grouped computation). The big
    * side gets a deterministic-per-row salt in [0, salts); the small side is
    * replicated `salts` times; the join key becomes (key, salt). Result rows
    * are identical to the plain join — only the distribution changes. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
