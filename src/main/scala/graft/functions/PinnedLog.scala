package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Engine-pinned natural logarithm in 1e-9 fixed point — the missing
  * primitive behind every divergence/entropy statistic this engine had to
  * route around (dq_drift_tvd chose TVD "instead of PSI/KL on purpose",
  * t_bm25 a rational idf, dq_benford digit lengths) because two libm
  * `ln()` implementations are not pinned to agree in the last ulp, and
  * the driver's differential check hashes results bit-for-bit.
  *
  * `lnNanos(a, b)` ≈ ln(a/b)·1e9 as a BIGINT, computed with PURE INTEGER
  * arithmetic — so it is bit-identical in ANY engine that implements the
  * same integer ops, order-free under summation, and exactly reproducible
  * in the DuckDB oracle (see [[PinnedLogSql]], which emits the identical
  * op sequence in DuckDB SQL: `length(bin())` bit lengths, `<<`/`>>`
  * shifts, `//` truncating division — all verified trunc-semantics-equal
  * to Spark's `div` on the nonnegative domain this algorithm stays in).
  *
  * Algorithm (a, b positive, ≤ 2^61):
  *  1. range-reduce by bit length: e = ⌊log2(a/b)⌋ via a bitlen
  *     difference plus one shift-compare, giving mantissa m = A/B ∈ [1,2)
  *     (shift whichever side keeps everything in 63 bits);
  *  2. downshift A, B together until B < 2^33 (keeps the cross products
  *     below 2^63; relative error ≤ 2^-32, sub-nano);
  *  3. atanh series: z = (A−B)·1e9 // (A+B) ∈ [0, 1e9/3], then
  *     ln(m)·1e9 ≈ 2·Σ_{k=1..11} p_k // (2k−1) with p_1 = z,
  *     p_{k+1} = p_k·z2 // 1e9, z2 = z² // 1e9 (11 terms: the tail past
  *     z^23 is below 1 nano at |z| ≤ 1/3);
  *  4. ln(a/b)·1e9 = e·693147181 + ln(m)·1e9.
  *
  * The result is a DEFINED deterministic approximation, not IEEE ln:
  * |lnNanos(a,b)/1e9 − ln(a/b)| < 1e-7 (PinnedLogSpec property-checks the
  * bound across magnitudes and pins exact values). Consumers sum the
  * nano-units as BIGINTs — order-independent at any parallelism — and
  * render a double only at the very end.
  */
object PinnedLog {

  val Scale: Long = 1000000000L
  /** round(ln 2 · 1e9) — a pinned literal, shared with [[PinnedLogSql]]. */
  val Ln2Nanos: Long = 693147181L
  /** Series length: p_k tracks z^(2k-1); at |z| ≤ 1e9/3 term 12 is < 1. */
  val Terms: Int = 11

  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** ln(a/b) in 1e-9 units. Contract: 0 < a ≤ 2^61, 0 < b ≤ 2^61. */
  def lnNanos(a: Long, b: Long): Long = {
    val d = bitlen(a) - bitlen(b)
    val e =
      if (d >= 0) { if (a >= (b << d)) d else d - 1 }
      else { if ((a << -d) >= b) d else d - 1 }
    val bigA = if (e >= 0) a else a << -e
    val bigB = if (e >= 0) b << e else b
    val sh = math.max(0, bitlen(bigB) - 33)
    val a2 = bigA >> sh
    val b2 = bigB >> sh
    val z = (a2 - b2) * Scale / (a2 + b2)
    val z2 = z * z / Scale
    var p = z
    var t = z
    var k = 2
    while (k <= Terms) {
      p = p * z2 / Scale
      t += p / (2L * k - 1)
      k += 1
    }
    e * Ln2Nanos + 2L * t
  }
}

/** `ln_nanos(a, b)` as a native codegen'd expression: one static call per
  * row (both interpreted eval and generated code route through the same
  * [[PinnedLog.lnNanos]], so there is exactly ONE defining implementation
  * on the Spark side). NULL on non-positive input — the defensive twin of
  * the oracle chain's contract that callers only feed positive counts. */
case class LnNanos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ln_nanos requires two bigint args, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "ln_nanos"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[Long]
    val bv = b.asInstanceOf[Long]
    if (av <= 0L || bv <= 0L) null else PinnedLog.lnNanos(av, bv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a <= 0L || $b <= 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PinnedLog.lnNanos($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LnNanos =
    copy(left = newLeft, right = newRight)
}

/** DuckDB-side generator for the SAME algorithm: wraps an inner relation
  * in a chain of `SELECT *, <step> FROM (...)` projections — one per
  * data-dependent step, so each intermediate is computed once, exactly
  * like the Spark expression's locals — and closes with a projection onto
  * `passCols` + the requested ln columns. All scratch columns are
  * `__ln_<out>_*`-prefixed; `//` on the nonnegative intermediates matches
  * Spark's truncating `div` (verified: DuckDB integer `//` truncates,
  * e.g. -7//2 = -3). */
object PinnedLogSql {

  /** `args`: (numeratorExpr, denominatorExpr, outColName) triples over the
    * inner relation's columns; expressions must be positive BIGINTs. */
  def chain(inner: String, passCols: Seq[String],
      args: Seq[(String, String, String)]): String = {
    val S = PinnedLog.Scale
    def lvl(prev: String, cols: Seq[String]): String =
      s"SELECT *, ${cols.mkString(", ")} FROM ($prev)"
    // L0: bind the argument expressions once
    val l0 = lvl(inner, args.flatMap { case (a, b, o) =>
      Seq(s"CAST($a AS BIGINT) AS __ln_${o}_a", s"CAST($b AS BIGINT) AS __ln_${o}_b")
    })
    // L1: bitlen difference
    val l1 = lvl(l0, args.map { case (_, _, o) =>
      s"length(bin(__ln_${o}_a)) - length(bin(__ln_${o}_b)) AS __ln_${o}_d"
    })
    // L2: exponent e = floor(log2(a/b))
    val l2 = lvl(l1, args.map { case (_, _, o) =>
      s"""CASE WHEN __ln_${o}_d >= 0
         | THEN CASE WHEN __ln_${o}_a >= (__ln_${o}_b << __ln_${o}_d)
         |   THEN __ln_${o}_d ELSE __ln_${o}_d - 1 END
         | ELSE CASE WHEN (__ln_${o}_a << (-__ln_${o}_d)) >= __ln_${o}_b
         |   THEN __ln_${o}_d ELSE __ln_${o}_d - 1 END END AS __ln_${o}_e""".stripMargin
    })
    // L3: mantissa numerator/denominator, m = ma/mb in [1,2). (NOT named
    // _A/_B: DuckDB identifiers are case-insensitive, so __ln_x_A would
    // silently resolve to the L0 column __ln_x_a.)
    val l3 = lvl(l2, args.flatMap { case (_, _, o) =>
      Seq(
        s"CASE WHEN __ln_${o}_e >= 0 THEN __ln_${o}_a ELSE (__ln_${o}_a << (-__ln_${o}_e)) END AS __ln_${o}_ma",
        s"CASE WHEN __ln_${o}_e >= 0 THEN (__ln_${o}_b << __ln_${o}_e) ELSE __ln_${o}_b END AS __ln_${o}_mb")
    })
    // L4: joint downshift amount; L5: downshifted a2/b2
    val l4 = lvl(l3, args.map { case (_, _, o) =>
      s"GREATEST(0, length(bin(__ln_${o}_mb)) - 33) AS __ln_${o}_sh"
    })
    val l5 = lvl(l4, args.flatMap { case (_, _, o) =>
      Seq(s"(__ln_${o}_ma >> __ln_${o}_sh) AS __ln_${o}_a2",
        s"(__ln_${o}_mb >> __ln_${o}_sh) AS __ln_${o}_b2")
    })
    // L6: z; L7: z^2 (both in 1e-9 fixed point)
    val l6 = lvl(l5, args.map { case (_, _, o) =>
      s"((__ln_${o}_a2 - __ln_${o}_b2) * $S) // (__ln_${o}_a2 + __ln_${o}_b2) AS __ln_${o}_p1"
    })
    val l7 = lvl(l6, args.map { case (_, _, o) =>
      s"(__ln_${o}_p1 * __ln_${o}_p1) // $S AS __ln_${o}_z2"
    })
    // L8..: odd-power chain p_k = p_{k-1} * z2 // S
    val powered = (2 to PinnedLog.Terms).foldLeft(l7) { (prev, k) =>
      lvl(prev, args.map { case (_, _, o) =>
        s"(__ln_${o}_p${k - 1} * __ln_${o}_z2) // $S AS __ln_${o}_p$k"
      })
    }
    // close: e·ln2 + 2·Σ p_k/(2k-1), scratch dropped
    val outs = args.map { case (_, _, o) =>
      val series = (1 to PinnedLog.Terms)
        .map(k => s"__ln_${o}_p$k // ${2 * k - 1}").mkString(" + ")
      s"CAST(__ln_${o}_e * ${PinnedLog.Ln2Nanos} + 2 * ($series) AS BIGINT) AS $o"
    }
    s"SELECT ${(passCols ++ outs).mkString(", ")} FROM ($powered)"
  }
}
