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
  * column. Truncating division (`div` rounds toward zero, so all of
  * [-k+1, k-1] maps to 0) still admits an exact raw bound for every
  * comparison, but the bound's SHAPE depends on the threshold's sign
  * (k > 0 throughout; q = a div k):
  *
  *   q >  c:  c ≥ 0 → a > c*k + k - 1        c ≤ -1 → a > c*k
  *   q >= c:  c ≥ 1 → a >= c*k    c = 0 → a > -k    c ≤ -1 → a > (c-1)*k
  *   q <  c:  c ≥ 1 → a < c*k                c ≤ 0  → a <= (c-1)*k
  *   q <= c:  c ≥ 0 → a < (c+1)*k            c ≤ -1 → a <= c*k
  *
  * (Each derives from the two primitive equivalences
  * `q >= m ⟺ a >= m*k` for m ≥ 1 and `q >= m ⟺ a > (m-1)*k` for m ≤ 0,
  * plus negation for the LT/LTE family. The naive sign-blind bound is
  * wrong exactly where truncation's flat zero band sits: a = -5, k = 1000
  * gives q = 0, so `q >= 0` holds but `a >= 0` does not.) Threshold
  * arithmetic that would overflow Long simply skips the derivation.
  * The derived predicate is ADDED
  * alongside the original, never replacing it: Catalyst pushes the raw
  * comparison into the scan (min/max pruning at 100 TB), and the original
  * filter still decides row membership. With both GT/GTE and LT/LTE
  * handled, the reference's block-RANGE scans (`block_number >= A AND
  * block_number <= B` over a derived column) prune from both ends.
  *
  * Registered through [[GraftExtensions]] — the standard
  * `SparkSessionExtensions` path, so any session opts in with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object IntDivPushdown extends Rule[LogicalPlan] {

  /** c*k + add, None on Long overflow (skip the derivation, keep the plan). */
  private def mulAdd(c: Long, k: Long, add: Long): Option[Long] =
    try Some(Math.addExact(Math.multiplyExact(c, k), add))
    catch { case _: ArithmeticException => None }

  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThan(IntegralDivide(a: AttributeReference, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType =>
      (if (c >= 0) mulAdd(c, k, k - 1) else mulAdd(c, k, 0))
        .map(v => GreaterThan(a, Literal(v, LongType)))
    case GreaterThanOrEqual(IntegralDivide(a: AttributeReference, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType =>
      if (c >= 1) mulAdd(c, k, 0).map(v => GreaterThanOrEqual(a, Literal(v, LongType)))
      else if (c == 0) Some(GreaterThan(a, Literal(-k, LongType)))
      else if (c == Long.MinValue) None
      else mulAdd(c - 1, k, 0).map(v => GreaterThan(a, Literal(v, LongType)))
    case LessThan(IntegralDivide(a: AttributeReference, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType =>
      if (c >= 1) mulAdd(c, k, 0).map(v => LessThan(a, Literal(v, LongType)))
      else if (c == Long.MinValue) None
      else mulAdd(c - 1, k, 0).map(v => LessThanOrEqual(a, Literal(v, LongType)))
    case LessThanOrEqual(IntegralDivide(a: AttributeReference, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType =>
      if (c >= 0) {
        if (c == Long.MaxValue) None
        else mulAdd(c + 1, k, 0).map(v => LessThan(a, Literal(v, LongType)))
      } else mulAdd(c, k, 0).map(v => LessThanOrEqual(a, Literal(v, LongType)))
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
