package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: derive parquet-pushable raw-column predicates from
  * integer-division comparisons — automating the reference's incremental
  * watermark idiom (`WHERE block_timestamp > filter_value` alongside a
  * redundant partition predicate, e.g. ethereum_wallet_features.sql:53-54)
  * for predicates phrased over derived `div` columns.
  *
  * The engine's watermark predicates compare a DERIVED column —
  * `ts div 1000 > C` (nanos→micros) — which Parquet cannot use for
  * row-group skipping because the scan only has min/max stats for the raw
  * column. For non-negative thresholds the division algebra gives an
  * equivalent raw bound that IS pushable:
  *
  *   (a div k) >  c  ⟺  a >  c*k + k - 1   (k > 0, c ≥ 0)
  *   (a div k) >= c  ⟺  a >= c*k           (k > 0, c ≥ 1)
  *   (a div k) >= 0  ⟺  a >  -k            (k > 0)
  *
  * (Truncating division makes these false outside the stated ranges. For
  * negative thresholds — e.g. a = -5: `a div 1000 = 0 > -1` holds but
  * `a > -1` does not — the rule never fires. For GTE at c = 0 the naive
  * `a >= 0` bound is ALSO wrong for negative dividends: a = -5 gives
  * `a div 1000 = 0 >= 0` true but `a >= 0` false; truncation maps all of
  * [-k+1, -1] to 0, so the sound bound is `a > -k`. The GT case at c = 0
  * is safe because `(a div k) > 0` already forces a ≥ k.) The derived
  * predicate is ADDED
  * alongside the original, never replacing it: Catalyst pushes the raw
  * comparison into the scan (min/max pruning at 100 TB), and the original
  * filter still decides row membership.
  *
  * Registered through [[GraftExtensions]] — the standard
  * `SparkSessionExtensions` path, so any session opts in with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object IntDivPushdown extends Rule[LogicalPlan] {

  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThan(IntegralDivide(a: AttributeReference, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && c >= 0 && a.dataType == LongType =>
      Some(GreaterThan(a, Literal(c * k + k - 1, LongType)))
    case GreaterThanOrEqual(IntegralDivide(a: AttributeReference, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && c >= 1 && a.dataType == LongType =>
      Some(GreaterThanOrEqual(a, Literal(c * k, LongType)))
    case GreaterThanOrEqual(IntegralDivide(a: AttributeReference, Literal(k: Long, LongType), _),
        Literal(0L, LongType)) if k > 0 && a.dataType == LongType =>
      Some(GreaterThan(a, Literal(-k, LongType)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), child)
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}

/** Session extension installing the engine's optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => IntDivPushdown)
}
