package graft.extensions

import graft.functions.expr.{GraftCosine, GraftNorm2}
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, GreaterThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: `graft_cosine(x, x)` (same expression on both sides) is
  * algebraically 1.0 whenever ‖x‖ > 0, and NULL otherwise (the expression's
  * zero-norm convention) — so rewrite the O(3d) fused loop to a single
  * O(d) norm guard:
  *
  *   graft_cosine(x, x)  ==>  CASE WHEN graft_norm2(x) > 0.0 THEN 1.0 END
  *
  * Beyond dropping two-thirds of the arithmetic, the rewrite is *tighter*
  * than the evaluated form: `dot(x,x) / (sqrt(s)·sqrt(s))` carries float
  * rounding (± a few ulp around 1.0), while the algebraic value is exactly
  * 1.0. Self-similarity shows up in real plans through column aliasing
  * (e.g. a join of a table to itself on the same embedding column after
  * view expansion), where nobody writes `cosine(x, x)` literally but the
  * optimizer sees it.
  *
  * NULL semantics are preserved exactly: x NULL (or containing NULL
  * elements) makes graft_norm2 NULL → CaseWhen yields NULL, matching
  * GraftCosine's own null propagation; zero-norm yields NULL through the
  * missing ELSE, matching the expression's NULL-not-NaN convention.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` in
  * [[GraftExtensions]] — the rule only ever fires on plans that contain
  * graft expressions, so it is free for everyone else.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GraftCosine(l, r) if l.deterministic && l.semanticEquals(r) =>
        CaseWhen(
          Seq((GreaterThan(GraftNorm2(l), Literal(0.0, DoubleType)),
            Literal(1.0, DoubleType))),
          None)
    }
}
