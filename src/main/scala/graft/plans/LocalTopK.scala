package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** PARTITION-LOCAL top-k per group — the custom whole-operator leg of
  * the Catalyst machinery catalog (logical node + planner strategy +
  * physical operator, injected via [[graft.GraftExtensions]]).
  *
  * Why Spark can't express this declaratively: the two-phase top-k
  * ([[graft.operators.Ann.topKPerGroup]]) prunes with a window over
  * (group, spark_partition_id()) — correct and hotspot-free, but that
  * window's required distribution inserts an exchange, so phase 1
  * still SHUFFLES EVERY INPUT ROW. This operator keeps a bounded heap
  * per group WITHIN each existing partition — no exchange, no sort,
  * one pass — so the downstream exact ranking shuffles at most
  * `k x partitions` rows per group instead of the full input. At
  * 100 TB (ANN scoring: billions of (query, candidate) scores, k=10)
  * that is the difference between shuffling the score stream and
  * shuffling a rounding error of it.
  *
  * Semantics: emits a superset-free pruning — every row that could be
  * in the global top-k of its group survives (any row beaten by k
  * better rows in its own partition is beaten by k better rows
  * globally). A total `order` (include a tiebreaker) makes the final
  * global top-k deterministic, exactly as a ranking window requires.
  * Memory: O(groups-per-partition x k) buffered rows — the operator's
  * contract is group-cardinality-bounded use (query ids, shard ids),
  * same as any hash aggregate.
  */
case class LocalTopKPerGroup(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {

  require(k > 0, "LocalTopKPerGroup needs k > 0")

  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): LocalTopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator. */
object LocalTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalTopKPerGroup(g, o, k, child) =>
      LocalTopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One pass over each input partition, a bounded max-heap (worst kept
  * row on top) per group key; preserves the child's partitioning —
  * NO exchange, NO sort. */
case class LocalTopKPerGroupExec(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupCols
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      // BaseOrdering: compare(a, b) < 0 means a ranks BEFORE b (better)
      val ord = RowOrdering.create(orderLocal, childOutput)
      // max-heap under ord: head/dequeue = the WORST currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val pq = mutable.PriorityQueue.empty[InternalRow](ord)
            pq += row.copy()
            heaps.update(key.copy(), pq)
          case Some(pq) =>
            if (pq.size < kLocal) pq += row.copy()
            else if (ord.compare(row, pq.head) < 0) {
              pq.dequeue()
              pq += row.copy()
            }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): LocalTopKPerGroupExec =
    copy(child = newChild)
}

object LocalTopK {

  /** Prune `df` to at most `k` rows per (`groupCols`) per PARTITION
    * under `orderKeys` — (column name, descending?) pairs; the first
    * rows of that sort order are "best". Order expressions are
    * resolved against the child HERE (plain attribute references, no
    * Column bridging), so the physical node serializes cleanly.
    * Composes with a final ranking window over the survivors for the
    * exact global top-k — see
    * [[graft.operators.Ann.topKPerGroupLocal]]. Requires
    * [[graft.GraftExtensions]] (config) or `register(spark)` (live)
    * so the planner knows the node. */
  def prune(df: DataFrame, groupCols: Seq[String],
            orderKeys: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = Bridge.plan(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${child.output.map(_.name)}"))
    val groups = groupCols.map(attr)
    val order = orderKeys.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Bridge.dataFrame(df.sparkSession, LocalTopKPerGroup(groups, order, k, child))
  }
}
