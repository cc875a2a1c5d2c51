package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: `levenshtein(a, b) <= k` becomes
  * `abs(length(a) - length(b)) <= k AND levenshtein(a, b) <= k`.
  *
  * Provably safe: edit distance is bounded below by the length difference
  * (each edit changes the length by at most one), so the guard never
  * changes the predicate's value — it only lets codegen reject a
  * length-mismatched pair with two O(1) length reads instead of the O(n·m)
  * DP. In a blocked record-linkage join (Dedup.qFuzzyPairs) most candidate
  * pairs fail on length alone, so the expensive path runs on a fraction of
  * the candidates. This is the expression-level twin of what
  * InjectRuntimeFilter does at plan level: derive a cheap implied
  * predicate and run it first.
  *
  * Only the 2-arg form is rewritten: Spark's 3-arg
  * `levenshtein(a, b, threshold)` returns -1 when the distance exceeds the
  * threshold, so `<= k` can be satisfied by the sentinel while the length
  * guard is false — injecting it there would silently drop rows. The guard
  * is only valid when the expression returns the true distance
  * (`lev.threshold.isEmpty`).
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`), so it runs
  * inside the operator-optimization fixed-point batch: the rewrite detects
  * its own output (guard semantically equal to the one it would build) and
  * leaves it untouched, which makes it idempotent — the fixed point exists.
  */
object LevenshteinGuard extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def rewrite(e: Expression): Expression = e match {
    case a @ And(g, LessThanOrEqual(lev: Levenshtein, k))
        if lev.threshold.isEmpty && g.semanticEquals(guardFor(lev, k)) =>
      a // already guarded — fixed point
    case le @ LessThanOrEqual(lev: Levenshtein, k: Literal) if lev.threshold.isEmpty =>
      And(guardFor(lev, k), le)
    case other => other.mapChildren(rewrite)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
    case j @ Join(_, _, _, Some(cond), _) => j.copy(condition = Some(rewrite(cond)))
  }
}
