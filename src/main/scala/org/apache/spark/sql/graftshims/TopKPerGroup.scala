package org.apache.spark.sql.graftshims

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: exact top-k rows per group by a
  * LongType ordering key — the SURVEY §2 "custom operator" tier (c):
  * LogicalPlan + SparkStrategy + SparkPlan, injected via
  * SparkSessionExtensions / extraStrategies.
  *
  * Why not `row_number().over(Window.partitionBy(g).orderBy(o)) <= k`?
  * The window plan SORTS every partition's full row set (shuffle +
  * per-group sort of ALL rows) before discarding everything past k. This
  * operator keeps a bounded k-row heap per group on BOTH sides of the
  * shuffle: the partial stage reduces each map partition to ≤ k rows per
  * group (an aggregation-style map-side collapse the window can never
  * do), so the exchange carries O(groups × k × partitions) rows instead
  * of the whole table, and nothing is ever fully sorted.
  *
  * Contract: the ordering key must be a non-null LongType expression and
  * unique per group for deterministic output (engine convention — every
  * ordering in graft is an exact scaled integer; null keys are dropped).
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    descending: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Two-phase physical plan. `partial = true` runs on map partitions with
  * no distribution requirement; `partial = false` requires clustering on
  * the group keys (EnsureRequirements inserts the hash exchange).
  */
final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    descending: Boolean,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val orderExprB = orderExpr
    val kB = k
    val desc = descending
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val groupProj = UnsafeProjection.create(groupExprsB, childOutput)
      val boundOrder = BindReferences.bindReference(orderExprB, childOutput)
      // per group: a bounded heap keeping the k best rows. For descending
      // (k largest) the heap's head is the smallest kept value — evict it
      // when a better row arrives; ascending mirrors with a reversed
      // ordering (never negation: -Long.MinValue overflows back to itself).
      // Payloads stay InternalRow — rows are only copied and passed
      // through, so no UnsafeRow assumption on the child's row format.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Long, InternalRow)]]
      val byKey = Ordering.by[(Long, InternalRow), Long](_._1)
      val headFirst = if (desc) byKey.reverse else byKey
      iter.foreach { row =>
        val ordAny = boundOrder.eval(row)
        if (ordAny != null) {
          val ord = ordAny.asInstanceOf[Long]
          val key = groupProj(row) // reused buffer: copy only on insert
          val heap = heaps.getOrElse(key, {
            val h = mutable.PriorityQueue.empty[(Long, InternalRow)](headFirst)
            heaps.put(key.copy(), h)
            h
          })
          val better = heap.size < kB ||
            (if (desc) ord > heap.head._1 else ord < heap.head._1)
          if (better) {
            if (heap.size == kB) heap.dequeue()
            heap.enqueue((ord, row.copy()))
          }
        }
      }
      heaps.iterator.flatMap { case (_, heap) => heap.iterator.map(_._2) }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial exec (map-side
  * collapse) under a final exec (post-shuffle exact top-k).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, d, child) =>
      TopKPerGroupExec(g, o, k, d, partial = false,
        TopKPerGroupExec(g, o, k, d, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKApi {
  /** Name-based API: exact top-k rows per group. `orderCol` must be a
    * non-null LongType column of `df`, unique per group for determinism
    * (project the ordering key first). Attributes are resolved against
    * the analyzed child here — Column wrappers would reach execution
    * unevaluable inside a custom logical node.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      k: Int, descending: Boolean = true): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val analyzed = ds.queryExecution.analyzed
    def attr(name: String): Expression =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    org.apache.spark.sql.classic.Dataset.ofRows(
      ds.sparkSession,
      TopKPerGroup(groupCols.map(attr), attr(orderCol), k, descending, analyzed))
  }
}
