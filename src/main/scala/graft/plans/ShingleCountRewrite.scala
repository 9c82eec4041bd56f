package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Expression, Greatest,
  IsNull, Literal, Size, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `size(word_shingles(toks, n))` never needs the
  * shingle array — a token array of length m yields exactly
  * `max(m - n + 1, 0)` shingles, so the count folds to arithmetic on
  * `size(toks)` and the (allocation-heavy) shingle construction is
  * eliminated entirely. At corpus scale, profiling queries that only
  * count n-grams (token statistics, shingle-count histograms) skip the
  * whole concat-per-shingle pass.
  *
  * NULL care: `word_shingles(NULL)` is NULL, so `size(...)` is NULL
  * (with legacySizeOfNull=false) — the rewrite preserves that with an
  * explicit null branch rather than relying on `Greatest`, which would
  * silently skip the NULL and return 0.
  *
  * Registered with the optimizer via [[GraftExtensions]]
  * (`injectOptimizerRule`) or on a live session through
  * `spark.experimental.extraOptimizations`.
  */
object ShingleCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(WordShingles(toks, n), _) =>
        val counted: Expression =
          Greatest(Seq(
            Subtract(Size(toks, s.legacySizeOfNull), Literal(n - 1)),
            Literal(0)))
        CaseWhen(
          Seq((IsNull(toks), Literal(null, IntegerType))),
          Some(counted))
    }
}
