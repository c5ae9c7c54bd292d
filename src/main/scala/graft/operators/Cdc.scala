package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Change-data-capture over lake snapshots: diff two versions of a keyed
  * table into insert/update/delete records — the feed that drives
  * incremental consumers (Incremental.mergeStates absorbs the updates,
  * downstream syncs replay the log). One full-outer join on the key; at
  * 100 TB both snapshots should be bucketed on the key (ScaleLayout
  * .writeBucketed) so the diff is a zero-shuffle per-bucket merge.
  */
object Cdc {

  /** Rows that differ between `oldSnap` and `newSnap` keyed by `key`:
    * change_type ∈ insert | delete | update, with old/new values of
    * `compareCols` side by side. Unchanged rows are dropped (null-safe
    * comparison — a NULL→value transition is an update, not a match). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val o = compareCols.foldLeft(oldSnap.select(col(key) +: compareCols.map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"old_$c")
    }
    val n = compareCols.foldLeft(newSnap.select(col(key) +: compareCols.map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"new_$c")
    }
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.withColumn("__in_old", lit(1))
      .join(n.withColumn("__in_new", lit(1)), Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change_type").isNotNull)
      .select(col(key) +: col("change_type") +:
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** q76 — CDC diff between two simulated snapshots of orders: the "old"
    * snapshot is missing every 7th key (inserted later), the "new" one
    * drops every 11th (deleted) and doubles the price of every 5th
    * (updated). The oracle reproduces the diff with the same full-outer
    * join — checking classification AND both payload sides. */
  val q76SnapshotDiff: Q = Q(
    "q76_snapshot_diff",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val oldSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = orders.filter(col("o_orderkey") % 11 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      snapshotDiff(oldSnap, newSnap, "o_orderkey", Seq("o_totalprice", "o_orderstatus"))
    },
    Some("""WITH o AS (
      |  SELECT o_orderkey, o_totalprice AS old_o_totalprice,
      |         o_orderstatus AS old_o_orderstatus
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |n AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS new_o_totalprice,
      |    o_orderstatus AS new_o_orderstatus
      |  FROM orders WHERE o_orderkey % 11 <> 0)
      |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
      |       WHEN n.o_orderkey IS NULL THEN 'delete'
      |       WHEN old_o_totalprice IS DISTINCT FROM new_o_totalprice
      |         OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus THEN 'update'
      |  END AS change_type,
      |  old_o_totalprice, new_o_totalprice, old_o_orderstatus, new_o_orderstatus
      |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
      |WHERE CASE WHEN o.o_orderkey IS NULL THEN 'insert'
      |           WHEN n.o_orderkey IS NULL THEN 'delete'
      |           WHEN old_o_totalprice IS DISTINCT FROM new_o_totalprice
      |             OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus THEN 'update'
      |      END IS NOT NULL""".stripMargin))

  val all: Seq[Q] = Seq(q76SnapshotDiff)
}
