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
  * group). Spark's own InferWindowGroupLimit keeps the window and
  * inserts a pre-filter below it; this rule removes the window
  * machinery entirely for the drop-rank shape — no per-group sort, and
  * under the two-phase exec the exchange shrinks to O(groups·k).
  *
  * Guard rails: fires only on a single row_number window expression,
  * a pure-attribute projection that does not reference the rank, and a
  * `rn <= k` / `rn < k` / `k >= rn` predicate with a positive literal
  * k. Ties: row_number over a non-unique order is nondeterministic in
  * Spark itself; the rewrite preserves "one valid top-k", and every
  * query in this repo orders with a unique tie-break (house rule).
  * Injected per-session via `experimental.extraOptimizations` (u11's
  * discipline) — u40 runs it on an ISOLATED newSession so the shared
  * driver session's 300-query plans stay byte-stable.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projectList, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), _)),
          part, ord, child, _)))
      if ord.nonEmpty &&
        limitOf(cond, al.exprId).exists(_ > 0) &&
        projectList.forall(_.isInstanceOf[AttributeReference]) &&
        projectList.forall(_.exprId != al.exprId) =>
      Project(projectList,
        GroupedTopK(part, ord, limitOf(cond, al.exprId).get, child))
  }
}
