package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

/** Whole-operator top-k per group — the SURVEY §4 tier-(c) custom operator.
  *
  * Spark expresses "first k rows per group" as window row_number + filter,
  * which SORTS every row of every group before discarding all but k. This
  * operator keeps a bounded k-row heap per group instead:
  *
  *   partial TopKPerGroupExec (map-side, any partitioning)
  *     → shuffle on the group keys (inserted by EnsureRequirements via
  *       requiredChildDistribution)
  *       → final TopKPerGroupExec
  *
  * Per-partition state is O(groups·k) rows; nothing is globally sorted. The
  * same partial/final split as hash aggregation — heaps are mergeable the
  * way partial aggregates are.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    finalPhase: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val orderRef = order
    val groupRef = groupExprs
    val schema = child.output
    val kk = k
    child.execute().mapPartitions ({ iter =>
      val ordering = RowOrdering.create(orderRef, schema)
      val groupProj = UnsafeProjection.create(groupRef, schema)
      // max-heap per group: head = worst retained row; replace when better
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial + final exec pair. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, finalPhase = false, planLater(child))
      TopKPerGroupExec(g, o, k, finalPhase = true, partial) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {
  /** First `k` rows of each group under `orderBy` (use `col(...).asc/.desc`).
    * Output rows keep the input schema; within-group order is the given
    * order. Registers the planner strategy on the session idempotently. */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"TopK.perGroup: k must be >= 1, got $k")
    val spark = df.sparkSession
    // check-then-append under a lock: concurrent query builders on one
    // session must not register the strategy twice
    TopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
        spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
      }
    }
    val sortOrder = orderBy.map { c =>
      ColumnBridge.expressionEager(spark, c) match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      }
    }
    val groupExprs: Seq[Expression] =
      groupCols.map(c => ColumnBridge.expressionEager(spark, df(c)))
    DatasetBridge.ofRows(spark, TopKPerGroup(groupExprs, sortOrder, k, df.queryExecution.analyzed))
  }
}
