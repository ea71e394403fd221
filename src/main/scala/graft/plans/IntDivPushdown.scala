package graft.plans

import java.time.{Instant, ZoneId, ZoneOffset}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: derive parquet-pushable raw-column predicates from
  * integer-division comparisons — automating the reference's incremental
  * watermark idiom (`WHERE block_timestamp > filter_value` alongside a
  * redundant partition predicate, e.g. ethereum_wallet_features.sql:53-54)
  * for predicates phrased over derived `div` columns.
  *
  * The engine's watermark predicates compare a DERIVED column — `ts div
  * 1000 > C` when the fixture stores nanosecond longs, `unix_micros(ts) > C`
  * when it stores parquet timestamps (see `Graft.events`) — which Parquet
  * cannot use for row-group skipping because the scan only has min/max
  * stats for the raw column. The unix_micros family rewrites exactly
  * (micros precision on both sides, so each comparison carries over to a
  * raw timestamp literal unchanged); the div family needs sign-aware
  * bounds: Truncating division (`div` rounds toward zero, so all of
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

  /** A zone under which local-datetime micros == instant micros (offset 0
    * always), making the NTZ→LTZ cast an exact identity on the internal
    * microsecond value. */
  private def isUtc(tz: String): Boolean =
    try {
      val rules = ZoneId.of(tz).getRules
      rules.isFixedOffset && rules.getOffset(Instant.EPOCH) == ZoneOffset.UTC
    } catch { case _: Exception => false }

  /** Matches `unix_micros(t)` over a raw timestamp column — directly for
    * TIMESTAMP (whose internal value IS epoch micros), or behind a
    * UTC-session cast for TIMESTAMP_NTZ (identity on micros under a
    * zero-offset zone; any other zone is skipped as potentially
    * non-monotonic across DST transitions). Yields the raw attribute and a
    * micros→same-type literal builder, so comparisons against epoch-micros
    * constants rewrite to raw-column bounds parquet can row-group-skip on.
    */
  private object MicrosOfAttr {
    def unapply(e: Expression): Option[(AttributeReference, Long => Literal)] = e match {
      case UnixMicros(a: AttributeReference) if a.dataType == TimestampType =>
        Some((a, c => Literal(c, TimestampType)))
      case UnixMicros(Cast(a: AttributeReference, TimestampType, tzOpt, _))
          if a.dataType == TimestampNTZType && tzOpt.exists(isUtc) =>
        Some((a, c => Literal(c, TimestampNTZType)))
      case _ => None
    }
  }

  /** One derivation step. The `div` family admits ANY deterministic Long
    * child (not just attributes) so compositions like
    * `unix_micros(ts) div k cmp c` chain: step 1 derives the epoch-micros
    * bound, step 2 (via [[deriveAll]]) rewrites it onto the raw timestamp
    * column. unix_micros itself is exactly invertible at micros precision,
    * so its comparisons carry over with NO boundary adjustment.
    */
  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThan(MicrosOfAttr(a, mk), Literal(c: Long, LongType)) =>
      Some(GreaterThan(a, mk(c)))
    case GreaterThanOrEqual(MicrosOfAttr(a, mk), Literal(c: Long, LongType)) =>
      Some(GreaterThanOrEqual(a, mk(c)))
    case LessThan(MicrosOfAttr(a, mk), Literal(c: Long, LongType)) =>
      Some(LessThan(a, mk(c)))
    case LessThanOrEqual(MicrosOfAttr(a, mk), Literal(c: Long, LongType)) =>
      Some(LessThanOrEqual(a, mk(c)))
    case GreaterThan(IntegralDivide(a, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType && a.deterministic =>
      (if (c >= 0) mulAdd(c, k, k - 1) else mulAdd(c, k, 0))
        .map(v => GreaterThan(a, Literal(v, LongType)))
    case GreaterThanOrEqual(IntegralDivide(a, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType && a.deterministic =>
      if (c >= 1) mulAdd(c, k, 0).map(v => GreaterThanOrEqual(a, Literal(v, LongType)))
      else if (c == 0) Some(GreaterThan(a, Literal(-k, LongType)))
      else if (c == Long.MinValue) None
      else mulAdd(c - 1, k, 0).map(v => GreaterThan(a, Literal(v, LongType)))
    case LessThan(IntegralDivide(a, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType && a.deterministic =>
      if (c >= 1) mulAdd(c, k, 0).map(v => LessThan(a, Literal(v, LongType)))
      else if (c == Long.MinValue) None
      else mulAdd(c - 1, k, 0).map(v => LessThanOrEqual(a, Literal(v, LongType)))
    case LessThanOrEqual(IntegralDivide(a, Literal(k: Long, LongType), _),
        Literal(c: Long, LongType)) if k > 0 && a.dataType == LongType && a.deterministic =>
      if (c >= 0) {
        if (c == Long.MaxValue) None
        else mulAdd(c + 1, k, 0).map(v => LessThan(a, Literal(v, LongType)))
      } else mulAdd(c, k, 0).map(v => LessThanOrEqual(a, Literal(v, LongType)))
    case _ => None
  }

  /** Chase derivations to a fixpoint (each step strictly shrinks the
    * comparison's left side, so this terminates). */
  private def deriveAll(e: Expression): Seq[Expression] =
    derive(e) match {
      case Some(d) => d +: deriveAll(d)
      case None => Nil
    }

  /** Only raw-attribute comparisons are worth ADDING: they're the ones the
    * parquet scan can turn into row-group skips. Intermediate forms (e.g.
    * `unix_micros(ts) > v` from a div chain) stay derivation fodder only.
    */
  private def pushable(e: Expression): Boolean = e match {
    case GreaterThan(_: AttributeReference, _: Literal) => true
    case GreaterThanOrEqual(_: AttributeReference, _: Literal) => true
    case LessThan(_: AttributeReference, _: Literal) => true
    case LessThanOrEqual(_: AttributeReference, _: Literal) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(deriveAll).filter(pushable)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .foldLeft(Seq.empty[Expression]) { (acc, d) =>
          if (acc.exists(_.semanticEquals(d))) acc else acc :+ d
        }
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
