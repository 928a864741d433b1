package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.PlanBridge

/** Rank semantics the operator serves. `RowNumberK` keeps exactly the
  * first k rows per group (callers tie-break uniquely — house rule).
  * `RankK` keeps every row whose `rank()` is <= k, i.e. ties OF the
  * k-th position survive (output may exceed k rows). `DenseRankK`
  * keeps rows in the first k DISTINCT order-key values. All three are
  * algebraic folds — retaining-set-of-retaining-sets equals the
  * retaining set of the union — which is what keeps the two-phase
  * plan (and the partial phase's flush-on-pressure) correct by
  * construction: a row with global rank <= k has rank <= k in every
  * subset containing it, so no partial fold can drop a final answer.
  */
sealed abstract class TopKMode(val name: String) extends Serializable
case object RowNumberK extends TopKMode("row_number")
case object RankK extends TopKMode("rank")
case object DenseRankK extends TopKMode("dense_rank")

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
  * MEMORY: the partial phase follows HashAggregateExec's fallback
  * discipline — when the per-partition group map exceeds
  * `spark.graft.topk.partialMaxGroups` (default 131072) it EMITS every
  * current heap and clears the map, then keeps folding. Because the
  * fold is algebraic (top-k of top-k's is top-k, see [[TopKMode]]),
  * a flush costs only exchange width, never correctness — the final
  * phase re-merges the chunks. This bounds partial-phase memory at
  * O(budget · k) rows regardless of group cardinality, so the u40
  * auto-rewrite can never trade the window form's spillable sort for
  * an OOM. Flushes are counted in the `partialFlushes` SQL metric
  * (spec-pinned in PlanAuditSpec at cardinality >> budget).
  *
  * Semantics: per [[TopKMode]]; equality with the flat window form is
  * spec-pinned (PlanAuditSpec / GraftExtensionsSpec), as is the
  * physical shape: partial exec → exchange → final exec.
  */
case class GroupedTopK(
    groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan, mode: TopKMode = RowNumberK) extends UnaryNode {
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
      order: Seq[(String, Boolean)],
      mode: TopKMode = RowNumberK): DataFrame = {
    val plan = PlanBridge.analyzed(df)
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"GroupedTopK: no column '$n' in ${plan.output.map(_.name)}"))
    val node = GroupedTopK(
      group.map(attr),
      order.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending) },
      k, plan, mode)
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
    case GroupedTopK(g, o, k, child, mode) =>
      GroupedTopKExec(g, o, k, mode, partial = false,
        GroupedTopKExec(g, o, k, mode, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** k-bounded retained set per group: partial runs on whatever
  * partitioning the child has (map-side, no distribution requirement);
  * final demands clustering on the group keys. Both phases are the same
  * fold — the retained set is its own output, which is what makes the
  * two-phase plan (and the partial flush) correct by construction.
  *
  * Input rows are copied through an identity [[UnsafeProjection]] when
  * the child emits non-unsafe rows (the SparkPlan contract does not
  * guarantee UnsafeRow from arbitrary children — some non-codegen exec
  * nodes emit GenericInternalRow).
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
    mode: TopKMode, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupedTopKExec = copy(child = newChild)

  override lazy val metrics = Map(
    "partialFlushes" -> SQLMetrics.createMetric(sparkContext,
      "partial-phase heap flushes (memory fallback)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val kk = k
    val md = mode
    val isPartial = partial
    // memory fallback budget: only the partial phase flushes (the final
    // phase's emission IS the answer — flushing there would duplicate
    // groups). Clustered groups in the final phase are bounded by the
    // partial phase's output, O(chunks · k) per group.
    val maxGroups =
      if (partial)
        conf.getConfString("spark.graft.topk.partialMaxGroups",
          "131072").toInt
      else Int.MaxValue
    val flushMetric = longMetric("partialFlushes")
    child.execute().mapPartitions({ it =>
      val ord = GenerateOrdering.generate(orderE, childOutput)
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ascRow = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ord.compare(a, b)
      }
      // heap head = the WORST retained row (reverse of the sort order),
      // so admission is one compare against the current k-th
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ord.compare(b, a)
      }

      sealed trait GroupState {
        def insert(row: UnsafeRow): Unit
        def emit(buf: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit
      }
      // row_number: exactly k rows — the k-heap.
      final class HeapState extends GroupState {
        private val heap = new java.util.PriorityQueue[UnsafeRow](kk, worstFirst)
        def insert(row: UnsafeRow): Unit = {
          if (heap.size < kk) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
        }
        def emit(buf: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit = {
          val rows = heap.toArray(Array.empty[UnsafeRow])
          java.util.Arrays.sort(rows, ascRow)
          rows.foreach(buf += _)
        }
      }
      // rank / dense_rank: order-key → tied rows, sorted ascending.
      // RankK evicts the worst tie-group only once the rows strictly
      // before it number >= k (ties of the k-th survive); DenseRankK
      // caps DISTINCT keys at k.
      final class TieState(dense: Boolean) extends GroupState {
        private val map =
          new java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]](ascRow)
        private var total = 0
        // worst tie-group dies once the rows strictly before it number
        // >= k (its rank exceeded k). Must run after EVERY retained-set
        // growth — including a tie-append to a better key, which raises
        // the count preceding the worst group without touching keys
        // (missed in the first cut; the r17 rank-mode property test
        // caught surviving stale tie-groups under chunked re-folds)
        private def evictOverRank(): Unit = {
          var done = false
          while (!done && map.size > 1) {
            val last = map.lastEntry()
            if (total - last.getValue.size >= kk) {
              total -= last.getValue.size; map.pollLastEntry()
            } else done = true
          }
        }
        def insert(row: UnsafeRow): Unit = {
          val existing = map.get(row)
          if (existing != null) {
            existing.add(row.copy()); total += 1
            if (!dense) evictOverRank()
            return
          }
          if (dense) {
            if (map.size < kk) {
              val l = new java.util.ArrayList[UnsafeRow](); val c = row.copy()
              l.add(c); map.put(c, l); total += 1
            } else if (ord.compare(row, map.lastKey()) < 0) {
              val l = new java.util.ArrayList[UnsafeRow](); val c = row.copy()
              l.add(c); map.put(c, l); total += 1
              val ev = map.pollLastEntry(); total -= ev.getValue.size
            } // else: beyond the k-th distinct value — discard
          } else {
            // rank(x) = #{r < x} + 1; if x is strictly worse than the
            // current worst retained key and >= k rows precede it, skip
            if (total >= kk && !map.isEmpty &&
                ord.compare(row, map.lastKey()) > 0) return
            val l = new java.util.ArrayList[UnsafeRow](); val c = row.copy()
            l.add(c); map.put(c, l); total += 1
            evictOverRank()
          }
        }
        def emit(buf: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit = {
          val vit = map.values.iterator()
          while (vit.hasNext) vit.next().forEach(r => buf += r)
        }
      }
      def newState(): GroupState = md match {
        case RowNumberK => new HeapState
        case RankK => new TieState(dense = false)
        case DenseRankK => new TieState(dense = true)
      }

      new Iterator[InternalRow] {
        private val states =
          new java.util.HashMap[UnsafeRow, GroupState]()
        private var out: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        private def drain(): Iterator[InternalRow] = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          states.values.forEach(_.emit(buf))
          states.clear()
          buf.iterator
        }
        private def advance(): Unit = {
          while (!out.hasNext && !inputDone) {
            if (!it.hasNext) { inputDone = true; out = drain() }
            else {
              var flushed = false
              while (it.hasNext && !flushed) {
                val row = it.next() match {
                  case u: UnsafeRow => u
                  case other => toUnsafe(other)
                }
                val key = keyProj(row)
                var st = states.get(key)
                if (st == null) {
                  st = newState(); states.put(key.copy(), st)
                }
                st.insert(row)
                if (isPartial && states.size > maxGroups) {
                  flushMetric += 1; out = drain(); flushed = true
                }
              }
              if (!flushed && !it.hasNext) { inputDone = true; out = drain() }
            }
          }
        }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }, preservesPartitioning = true)
  }
}
