package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes a LeftSemi/LeftAnti join below a `Filter` + `Aggregate` pair
  * when the join keys are grouping attributes — the HAVING-shaped gap in
  * Spark's own `PushDownLeftSemiAntiJoin`.
  *
  * Spark pushes a semi join through an `Aggregate` when the condition
  * only touches grouping expressions, but an interposed `Filter` on the
  * aggregate's OUTPUTS (TPC-H Q20's `sw = 0 AND st >= 100`, any
  * HAVING clause) blocks it: the builtin has no Filter case, and
  * teaching it one naively ping-pongs with `PushPredicateThroughJoin`
  * (which would push the relocated filter straight back into the join).
  * This rule instead jumps the join below BOTH operators in one step —
  * `Join(Filter(f, Agg(c)), r)` → `Filter(f, Agg(Join(c, r)))` — a
  * shape no builtin rewrites back.
  *
  * Soundness: a semi/anti condition that references only grouping
  * attributes is constant within a group, so below the aggregate it
  * keeps or drops each group's rows WHOLE — surviving groups aggregate
  * identically, dropped groups disappear, exactly the join's effect
  * above.  The filter commutes because it references only the
  * aggregate's output either way.  Guards: the join condition, the
  * filter predicate, and every aggregate expression must be
  * deterministic (a nondeterministic predicate may not be re-evaluated
  * against a different row multiplicity).
  *
  * At 100 TB this is the difference between aggregating the whole fact
  * table and aggregating one key family: the hand-written form of the
  * same pushdown measured 11.2 s → 3.5 s on TPC-H Q20 at the 40×
  * replica (PLANS.md round-12 ladder) — this rule gives a user writing
  * the natural aggregate-then-filter-then-semi form that plan
  * automatically.  Registered in [[graft.GraftSession]] via
  * `spark.experimental.extraOptimizations` (the end-of-optimizer user
  * batch, after the operator fixed point — reference behavior:
  * dask-expr rewrites filter/projection pushdown through its own
  * expression graph, `dask_expr/_expr.py:2129` `rewrite_filters`).
  */
object PushSemiThroughFilteredAggregate extends Rule[LogicalPlan] {

  private def groupingAttrs(agg: Aggregate): AttributeSet =
    AttributeSet(agg.groupingExpressions.collect { case a: Attribute => a })

  /** The join may move below the aggregate iff its left-side references
    * are grouping ATTRIBUTES (present verbatim in the aggregate's child)
    * and nothing on the path is nondeterministic.
    */
  private def pushable(agg: Aggregate, f: Expression, right: LogicalPlan,
                       cond: Expression): Boolean = {
    val leftRefs = cond.references -- right.outputSet
    leftRefs.nonEmpty && leftRefs.subsetOf(groupingAttrs(agg)) &&
      cond.deterministic && f.deterministic &&
      agg.aggregateExpressions.forall(_.deterministic)
  }

  private def attrsOnly(pl: Seq[NamedExpression]): Boolean =
    pl.forall(_.isInstanceOf[Attribute])

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(left, right, LeftSemi | LeftAnti, Some(cond), _) =>
      left match {
        // HAVING shape, possibly column-pruned: Project? <- Filter <- Agg
        case Project(pl, Filter(f, agg: Aggregate))
            if attrsOnly(pl) && pushable(agg, f, right, cond) =>
          Project(pl, Filter(f,
            agg.copy(child = j.copy(left = agg.child))))
        case Filter(f, agg: Aggregate) if pushable(agg, f, right, cond) =>
          Filter(f, agg.copy(child = j.copy(left = agg.child)))
        case _ => j
      }
  }
}
