package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.IntegerType

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
  *
  * With `rankAttr` set, the FINAL phase appends the 1-based within-group
  * rank (row_number semantics under `order`) — the partial phase stays
  * rank-free, since pre-shuffle ranks would be meaningless. This makes the
  * operator a drop-in for the common `row_number() ... WHERE rn <= k`
  * window shape, rank column included.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // the rank attribute is born here, not consumed from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    finalPhase: Boolean,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (finalPhase) child.output ++ rankAttr else child.output
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      if (finalPhase) rankAttr.toSeq else Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val orderRef = order
    val groupRef = groupExprs
    val schema = child.output
    val kk = k
    val emitRank = finalPhase && rankAttr.isDefined
    val outputRef = output
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
      if (!emitRank)
        heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      else {
        // append the 1-based rank; rows leave the heap worst-first, so the
        // reversed iterator is best-first = rank order
        val toUnsafe = UnsafeProjection.create(outputRef, outputRef)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        heaps.valuesIterator.flatMap { h =>
          val best: Iterator[InternalRow] = h.dequeueAll.reverseIterator
          best.zipWithIndex.map { case (row, i) =>
            rankRow.setInt(0, i + 1)
            toUnsafe(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial + final exec pair. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      val partial = TopKPerGroupExec(g, o, k, finalPhase = false, None, planLater(child))
      TopKPerGroupExec(g, o, k, finalPhase = true, rank, partial) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {
  /** First `k` rows of each group under `orderBy` (use `col(...).asc/.desc`).
    * Output rows keep the input schema; within-group order is the given
    * order. Registers the planner strategy on the session idempotently.
    *
    * @param rankCol when set, append a 1-based within-group rank column of
    *                this name (row_number semantics) — makes the operator a
    *                drop-in for `row_number() OVER (...) WHERE rn <= k` */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int,
               rankCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"TopK.perGroup: k must be >= 1, got $k")
    rankCol.foreach { n =>
      require(!df.columns.contains(n),
        s"TopK.perGroup: rank column '$n' collides with an input column")
    }
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
    val rankAttr = rankCol.map(n => AttributeReference(n, IntegerType, nullable = false)())
    DatasetBridge.ofRows(spark,
      TopKPerGroup(groupExprs, sortOrder, k, rankAttr, df.queryExecution.analyzed))
  }
}
