package graft.extensions

import graft.functions.expr.{GraftCosine, GraftDot, GraftNorm2}
import org.apache.spark.sql.catalyst.expressions.{And, CaseWhen, Divide, EqualTo, GreaterThan, Literal, Multiply, Not}
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
  * Degenerate-value semantics are preserved exactly:
  *   - x NULL (or containing NULL elements): graft_norm2 is NULL → every
  *     branch condition is NULL → result NULL, matching GraftCosine;
  *   - zero norm: NULL through the missing ELSE (NULL-not-NaN convention);
  *   - NaN elements: norm is NaN, NaN > 0 is false → NULL, matching the
  *     original's nn > 0 guard;
  *   - INFINITE norm: the fast branch is explicitly fenced off and the
  *     original expression evaluates (→ NaN, as Inf/Inf), so the rewrite
  *     NEVER changes a result — 1.0 fires only where algebra guarantees it.
  *     The lazy CaseWhen means finite vectors (all real data) never touch
  *     the cosine loop.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` in
  * [[GraftExtensions]] — the rule only ever fires on plans that contain
  * graft expressions, so it is free for everyone else.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GraftCosine(l, r) if l.deterministic && l.semanticEquals(r) =>
        val n = GraftNorm2(l)
        val finite = Not(EqualTo(n, Literal(Double.PositiveInfinity, DoubleType)))
        CaseWhen(
          Seq(
            (And(GreaterThan(n, Literal(0.0, DoubleType)), finite),
              Literal(1.0, DoubleType)),
            // infinite norm: dot/norm² reproduces the original's Inf/Inf =
            // NaN — spelled WITHOUT GraftCosine, or this rule would
            // re-match its own output forever in the fixed-point batch
            (GreaterThan(n, Literal(0.0, DoubleType)),
              Divide(GraftDot(l, r), Multiply(n, GraftNorm2(r))))),
          None)
    }
}
