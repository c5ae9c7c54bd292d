package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks — the Spark analog of the reference's declarative
  * constraints (PRIMARY KEY at transform-complex-full.py:212-213 and
  * create_dimensions.py:68): constraints become executable assertions over
  * the data (SURVEY.md §7.4 item 6).
  */
object Checks {

  /** Rows violating key uniqueness at the declared grain (empty = PK holds).
    * One hash aggregation — the same cost shape as the reference's index
    * build, but distributed. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Rows with NULLs in NOT-NULL columns (empty = constraint holds). */
  def nullViolations(df: DataFrame, notNullCols: Seq[String]): DataFrame =
    df.filter(notNullCols.map(c => col(c).isNull).reduce(_ || _))

  /** Throwing assertion form, for pipeline gates (fail-fast like
    * pipeline.py's check=True step chaining). */
  def assertPrimaryKey(df: DataFrame, keyCols: Seq[String]): Unit = {
    val dups = duplicateKeys(df, keyCols).limit(1).count()
    require(dups == 0, s"primary key violated on (${keyCols.mkString(", ")})")
    val nulls = nullViolations(df, keyCols).limit(1).count()
    require(nulls == 0, s"primary key columns contain NULLs (${keyCols.mkString(", ")})")
  }

  /** Orphaned foreign-key rows: child rows whose `fkCol` value has no match
    * in the parent's `pkCol` (empty = referential integrity holds; NULL FKs
    * are not orphans, matching SQL FK semantics). Left-anti join — shuffles
    * on the key, or broadcasts when the parent key set is dim-sized. */
  def fkViolations(child: DataFrame, parent: DataFrame,
      fkCol: String, pkCol: String): DataFrame =
    child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")

  /** Rows whose `column` value falls outside the accepted set (empty =
    * constraint holds). NULLs are violations unless `values` itself contains
    * null — the isNull branch is what catches them, since `isin` is
    * three-valued and yields NULL (filtered out) for NULL inputs. */
  def acceptedValues(df: DataFrame, column: String, values: Seq[Any]): DataFrame = {
    val nonNull = values.filterNot(_ == null)
    val outsideSet =
      if (nonNull.isEmpty) col(column).isNotNull else !col(column).isin(nonNull: _*)
    if (values.contains(null)) df.filter(outsideSet)
    else df.filter(outsideSet || col(column).isNull)
  }

  /** Per-column profile (null count, exact distinct count) as rows — the
    * monitoring surface a warehouse would hang alerts on. One pass of
    * aggregates, then a stack() unpivot. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
      countDistinct(col(c)).as(s"__d_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', __n_$c, __d_$c").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (column_name, null_count, distinct_count)")
  }
}
