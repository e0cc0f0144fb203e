package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: fold `IsNotNull` over a conditional whose branch
  * values are provably non-null into the branch-condition disjunction.
  *
  *   isnotnull(CASE WHEN c1 THEN v1 ... WHEN cn THEN vn [ELSE e] END)
  *     ->  c1 OR ... OR cn OR isnotnull(e)        (all vi non-nullable)
  *
  * Why this exists: metadata-compiled engines build year-dispatched
  * columns as CASE chains whose branch values coalesce to a default
  * label (non-nullable) and whose fall-through is NULL — "the code's
  * year has no classification version". A downstream null-drop (pandas
  * `groupby(dropna=True)` parity, Pipeline.GroupBySum) then filters on
  * `isnotnull(<that column>)`, and predicate pushdown re-inlines the
  * WHOLE dispatch chain into upstream join conditions — the ISC
  * flagship measured +40% query time from re-evaluating its
  * classification expression inside two broadcast-hash-join probes.
  * After this fold the same predicate is just a year-window test, which
  * the surrounding fixed-point batch pushes to the dimension-side scan.
  *
  * Three-valued-logic care: `CaseWhen` treats a NULL condition as
  * false, so the folded disjunction can yield NULL where `IsNotNull`
  * (null-intolerant) yields false — fine under a Filter/Join (NULL
  * rejects the row) but wrong in a projection, so a nullable result is
  * wrapped in `coalesce(..., false)`. Non-deterministic conditionals
  * are left untouched (the fold changes how often their parts
  * evaluate).
  */
object FoldIsNotNullConditional extends Rule[LogicalPlan] {

  /** `Some(expr)` equivalent to `IsNotNull(e)` under the fold, `None`
    * when `e` is not a foldable conditional shape.
    */
  private def isNotNullOf(e: Expression): Option[Expression] = e match {
    case v if !v.nullable     => Some(Literal.TrueLiteral)
    case Literal(null, _)     => Some(Literal.FalseLiteral)
    case CaseWhen(branches, elseValue) if branches.forall(b => !b._2.nullable) =>
      val elseTerm = elseValue match {
        case None    => Some(Literal.FalseLiteral)
        case Some(v) => isNotNullOf(v)
      }
      elseTerm.map(t => branches.map(_._1).foldRight(t)((c, acc) => Or(c, acc)))
    case If(p, t, f) if !t.nullable => isNotNullOf(f).map(ft => Or(p, ft))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case inn @ IsNotNull(child @ (_: CaseWhen | _: If)) if child.deterministic =>
        isNotNullOf(child) match {
          case Some(folded) =>
            if (folded.nullable) Coalesce(Seq(folded, Literal.FalseLiteral)) else folded
          case None => inn
        }
    }
}
