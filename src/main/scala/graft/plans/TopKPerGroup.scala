package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator custom plan: top-k rows per group — SURVEY.md §7.3 ladder
  * step (c): LogicalPlan + SparkStrategy + SparkPlan, registered through
  * SparkSessionExtensions (or spark.experimental.extraStrategies).
  *
  * Why a physical operator: the declarative formulation
  * (row_number over a window, then filter rank <= k) must SORT every
  * partition fully before ranking. This operator keeps one bounded heap per
  * group — O(n log k) per partition, no full sort — and runs as a
  * partial/final pair like hash aggregation: the map-side stage caps each
  * group at k rows BEFORE the exchange, so the shuffle moves at most
  * k·groups·mapPartitions rows instead of the whole input. At 100 TB with
  * small k this is the difference between shuffling terabytes and megabytes.
  *
  * Top-k is a semigroup (topk(topk(A) ∪ topk(B)) = topk(A ∪ B)), so the
  * two stages run the identical algorithm. The caller's sort order must be
  * total (include a tiebreak) for deterministic results.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression], sortOrder: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression], sortOrder: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def nodeName: String = if (partial) "GraftTopKPerGroup (partial)" else "GraftTopKPerGroup (final)"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(groupExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val order = sortOrder
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val ord = GenerateOrdering.generate(order, childOutput)
      // max-heap in sort order: head = currently-worst kept row
      val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Public API: top-k rows per group (original columns, no rank column).
  * Ordering keys are (columnName, ascending) pairs, resolved directly
  * against the input's analyzed output — include a tiebreak for
  * deterministic results. */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    val byName = analyzed.output.map(a => a.name -> a).toMap
    def attr(name: String): Attribute =
      byName.getOrElse(name, throw new IllegalArgumentException(
        s"column $name not in ${byName.keys.mkString(", ")}"))
    val groupExprs: Seq[Expression] = groupCols.map(attr)
    val sortOrder = orderCols.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    Bridge.ofRows(spark, TopKPerGroup(groupExprs, sortOrder, k, analyzed))
  }

  /** Idempotent runtime strategy registration. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
}
