package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes a LeftSemi/LeftAnti join below a `Filter` + `Aggregate` pair
  * when the join keys are group keys — the HAVING-shaped gap in Spark's
  * own `PushDownLeftSemiAntiJoin`.
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
  * The join key may be a grouping ATTRIBUTE (present verbatim in the
  * aggregate's child) or the output of an `Alias` over a deterministic
  * grouping EXPRESSION (`groupBy(expr.as("k"))` + semi on `k`): in the
  * latter case the condition is rewritten to the underlying expression
  * before it moves below the aggregate (round-14; the round-13 version
  * refused the expression case).
  *
  * Soundness: a semi/anti condition whose left-side references are all
  * group keys is constant within a group, so below the aggregate it
  * keeps or drops each group's rows WHOLE — surviving groups aggregate
  * identically, dropped groups disappear, exactly the join's effect
  * above.  The filter commutes because it references only the
  * aggregate's output either way.  Guards: the join condition, the
  * filter predicate, the substituted grouping expressions, and every
  * aggregate expression must be deterministic (a nondeterministic
  * predicate may not be re-evaluated against a different row
  * multiplicity), and — mirroring the `canPushThroughCondition` guard in
  * Spark's `PushDownLeftSemiAntiJoin` — no attribute the condition
  * resolves against the RIGHT side may also appear in the aggregate
  * child's output: in a self-join-shaped plan the same `ExprId` can be
  * visible on both sides, and pushing the join below the aggregate
  * would re-bind the condition ambiguously (ADVICE r13 #1).
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

  /** For each aggregate-output attribute that IS a group key, the
    * expression it evaluates below the aggregate: identity for grouping
    * attributes passed through verbatim, the aliased grouping expression
    * for `Alias(groupingExpr, name)` outputs.  Attributes not in the map
    * are aggregate results — never pushable.
    */
  private def groupKeyBelow(agg: Aggregate): Map[ExprId, Expression] =
    agg.aggregateExpressions.collect {
      case a: Attribute
          if agg.groupingExpressions.exists(_.semanticEquals(a)) =>
        a.exprId -> (a: Expression)
      case al @ Alias(child, _)
          if child.deterministic &&
            agg.groupingExpressions.exists(_.semanticEquals(child)) =>
        al.exprId -> child
    }.toMap

  /** If the join may move below the aggregate, the condition rewritten
    * to aggregate-child attributes; None refuses the push.
    */
  private def pushedCondition(agg: Aggregate, f: Expression,
                              right: LogicalPlan, cond: Expression): Option[Expression] = {
    val below = groupKeyBelow(agg)
    val leftRefs = cond.references -- right.outputSet
    val pushableKeys = leftRefs.nonEmpty &&
      leftRefs.forall(a => below.contains(a.exprId)) &&
      cond.deterministic && f.deterministic &&
      agg.aggregateExpressions.forall(_.deterministic)
    if (!pushableKeys) return None
    // exprId-conflict guards (Spark's canPushThroughCondition analogue):
    // (a) an attribute the condition binds to the right side must not
    //     also be emitted by the aggregate's child — below the Aggregate
    //     it would resolve ambiguously;
    // (b) the child-side attributes the rewritten condition introduces
    //     must not collide with the right side's output either.
    val rightBound = cond.references.intersect(right.outputSet)
    if (rightBound.intersect(agg.child.outputSet).nonEmpty) return None
    val introduced = AttributeSet(
      leftRefs.toSeq.flatMap(a => below(a.exprId).references))
    if (introduced.intersect(right.outputSet).nonEmpty) return None
    Some(cond.transformUp {
      case a: Attribute if !rightBound.contains(a) && below.contains(a.exprId) =>
        below(a.exprId)
    })
  }

  private def attrsOnly(pl: Seq[NamedExpression]): Boolean =
    pl.forall(_.isInstanceOf[Attribute])

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(left, right, LeftSemi | LeftAnti, Some(cond), _) =>
      left match {
        // HAVING shape, possibly column-pruned: Project? <- Filter <- Agg
        case Project(pl, Filter(f, agg: Aggregate)) if attrsOnly(pl) =>
          pushedCondition(agg, f, right, cond) match {
            case Some(c2) => Project(pl, Filter(f,
              agg.copy(child = j.copy(left = agg.child, condition = Some(c2)))))
            case None => j
          }
        case Filter(f, agg: Aggregate) =>
          pushedCondition(agg, f, right, cond) match {
            case Some(c2) => Filter(f,
              agg.copy(child = j.copy(left = agg.child, condition = Some(c2))))
            case None => j
          }
        case _ => j
      }
  }
}
