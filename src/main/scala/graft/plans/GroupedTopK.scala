package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** TOP-K PER GROUP as a first-class operator — the full custom-operator
  * ladder SURVEY §2-C's extension row (c) names: a [[LogicalPlan]] node,
  * a planner [[org.apache.spark.sql.Strategy]], and a two-phase
  * [[SparkPlan]], handed to the session via
  * `experimental.extraStrategies` (the live-session twin of
  * `SparkSessionExtensions.injectPlannerStrategy`, same as u11's
  * optimizer-rule injection).
  *
  * WHY a physical operator when `row_number() <= k` exists: the window
  * form sorts every group in full — O(n log n) comparisons and, more
  * importantly at 100 TB, it shuffles EVERY row to its group's reducer
  * before any row can be dropped. This operator is aggregation-shaped
  * instead: a PARTIAL pass keeps a k-bounded heap per group per input
  * partition (O(n log k) comparisons, map-side), so the exchange
  * carries at most k·groups·partitions rows — for the candidate-
  * selection shapes this serves (per-probe ANN shortlists, per-source
  * leaderboards) that is the difference between shuffling the corpus
  * and shuffling the answer. (Spark 4's own WindowGroupLimit pushes a
  * rank filter below the window but still sorts and still ships every
  * surviving row through the full window machinery; the heap never
  * sorts a group it is about to discard.)
  *
  * Semantics: exactly the first k rows of each group under `order`
  * (callers include a unique tie-break, as everywhere else in this
  * repo). Equality with the flat window form is spec-pinned
  * (PlanAuditSpec), as is the physical shape: partial exec → exchange →
  * final exec.
  */
case class GroupedTopK(
    groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"GroupedTopK: k must be positive, got $k")
  require(order.nonEmpty, "GroupedTopK: at least one sort order required")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupedTopK = copy(child = newChild)
}

object GroupedTopK {
  /** Build over an existing frame: `group` / `order` resolve by name
    * against the frame's analyzed output, so the node enters the
    * planner fully resolved. `order` = (column, ascending?). */
  def topKPerGroup(df: DataFrame, k: Int, group: Seq[String],
      order: Seq[(String, Boolean)]): DataFrame = {
    val plan = PlanBridge.analyzed(df)
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"GroupedTopK: no column '$n' in ${plan.output.map(_.name)}"))
    val node = GroupedTopK(
      group.map(attr),
      order.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending) },
      k, plan)
    val s = df.sparkSession
    // idempotent live-session registration (the driver builds its own
    // session; injectPlannerStrategy is the builder-time equivalent)
    if (!s.experimental.extraStrategies.exists(
        _.isInstanceOf[GroupedTopKStrategy]))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ new GroupedTopKStrategy
    PlanBridge.ofRows(s, node)
  }
}

/** Plans the logical node as partial-exec → (exchange via required
  * distribution) → final-exec — the aggregation shape, so Spark inserts
  * exactly one hash exchange on the group keys between the phases. */
class GroupedTopKStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      GroupedTopKExec(g, o, k, partial = false,
        GroupedTopKExec(g, o, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** k-bounded heap per group: partial runs on whatever partitioning the
  * child has (map-side, no distribution requirement); final demands
  * clustering on the group keys. Both phases are the same fold — top-k
  * of top-k's is top-k (the operator is an algebraic aggregate whose
  * state is its own output, which is what makes the two-phase plan
  * correct by construction).
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupedTopKExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions({ it =>
      val ord = GenerateOrdering.generate(orderE, childOutput)
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      // heap head = the WORST retained row (reverse of the sort order),
      // so admission is one compare against the current k-th
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[
        UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values.forEach { h =>
        val rows = h.toArray(Array.empty[UnsafeRow]).sorted(
          new Ordering[UnsafeRow] {
            def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
          })
        rows.foreach(out += _)
      }
      out.iterator
    }, preservesPartitioning = true)
  }
}
