package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule completing [[GroupedTopK]]'s ladder: the classic
  * `SELECT <cols> FROM (SELECT *, row_number() OVER (PARTITION BY g
  * ORDER BY o) rn ...) WHERE rn <= k` pattern — written by every BI
  * tool and most humans — rewrites to the [[GroupedTopK]] operator
  * whenever the rank column itself is PROJECTED AWAY (if rn survives,
  * the window must run; if it is dropped, only membership in the top k
  * matters and the k-heap computes exactly that without sorting any
  * group). `rank()` and `dense_rank()` drop-rank shapes rewrite too,
  * carrying their tie semantics into the operator ([[RankK]] keeps
  * ties of the k-th position, [[DenseRankK]] the first k distinct
  * order keys — the same split Spark's WindowGroupLimit iterators
  * make). Spark's own InferWindowGroupLimit keeps the window and
  * inserts a pre-filter below it; this rule removes the window
  * machinery entirely for the drop-rank shape — no per-group sort, and
  * under the two-phase exec the exchange shrinks to O(groups·k).
  *
  * Because extraOptimizations run AFTER Spark's built-in batches,
  * InferWindowGroupLimit (default-on) has usually already inserted a
  * [[WindowGroupLimit]] below the Window by the time this rule fires;
  * leaving it in place would keep a per-group sort under the heap
  * operator. The rewrite therefore STRIPS a WindowGroupLimit child
  * whose partition/order match the window's — safe in both directions,
  * since the node is a pure pre-filter of rows the heap would drop
  * anyway (its limit derives from the same predicate). Spec-pinned:
  * GraftExtensionsSpec asserts WindowGroupLimit absence from the
  * optimized plan.
  *
  * Guard rails: fires only on a single row_number/rank/dense_rank
  * window expression, a pure-attribute projection that does not
  * reference the rank, and a `rn <= k` / `rn < k` / `k >= rn`
  * predicate with a positive literal k. Ties: row_number over a
  * non-unique order is nondeterministic in Spark itself; the rewrite
  * preserves "one valid top-k", and every query in this repo orders
  * with a unique tie-break (house rule) — while rank/dense_rank tie
  * sets are deterministic and preserved exactly. Injected per-session
  * via `experimental.extraOptimizations` (u11's discipline) — u40 runs
  * it on an ISOLATED newSession so the shared driver session's
  * 300-query plans stay byte-stable.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {
  private def limitOf(cond: Expression, rn: ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rn => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rn => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn => Some(k - 1)
      case _ => None
    }

  private def modeOf(fn: Expression): Option[TopKMode] = fn match {
    case _: RowNumber => Some(RowNumberK)
    case _: Rank => Some(RankK)
    case _: DenseRank => Some(DenseRankK)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projectList, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(fn, _), _)),
          part, ord, child, _)))
      if ord.nonEmpty && modeOf(fn).isDefined &&
        limitOf(cond, al.exprId).exists(_ > 0) &&
        projectList.forall(_.isInstanceOf[AttributeReference]) &&
        projectList.forall(_.exprId != al.exprId) =>
      val realChild = child match {
        case wgl: WindowGroupLimit
          if wgl.partitionSpec == part && wgl.orderSpec == ord => wgl.child
        case _ => child
      }
      Project(projectList,
        GroupedTopK(part, ord, limitOf(cond, al.exprId).get, realChild,
          modeOf(fn).get))
  }
}
