package graft.plans

import graft.functions.expressions.{CharNgramDistinctCount, CharNgramHashes}
import org.apache.spark.sql.catalyst.expressions.Size
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrites for graft expressions — the `injectOptimizerRule`
  * leg of [[graft.GraftExtensions]] (functions and a planner strategy are
  * the other two). One fusion today:
  *
  *   `size(graft_char_ngram_hashes(s, n))` → distinct-count-only kernel
  *
  * A query that only wants the distinct-gram COUNT (repetition scoring,
  * x31) otherwise pays for building, deduplicating, and boxing the whole
  * hash array per row just to read its length. The rewrite is exactly the
  * kind of algebraic fusion Catalyst's own rules do for built-ins
  * (e.g. Size over CreateArray); custom expressions need their own rule
  * because the optimizer cannot see inside an opaque eval.
  */
object GraftRewrites extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // only when legacySizeOfNull is off: under spark.sql.legacy.sizeOfNull
      // size(NULL) = -1, while the fused kernel is null-intolerant (NULL in →
      // NULL out) — rewriting there would change results
      case Size(CharNgramHashes(child, n), legacy) if !legacy =>
        CharNgramDistinctCount(child, n)
    }
}
