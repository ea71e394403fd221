package graft

import graft.functions.{PinnedLog, VectorExprs}
import org.apache.spark.sql.functions._

/** PinnedLog: the engine-pinned integer fixed-point ln.
  *
  * The DEFINING implementation is [[PinnedLog.lnNanos]] (pure Long
  * arithmetic); the DuckDB chain ([[graft.functions.PinnedLogSql]]) was
  * verified exactly equal to it on 20k seeded random rationals across all
  * magnitudes (see the query-family oracles that embed the chain — the
  * driver's differential check re-proves the equality every round on real
  * group counts). Here:
  *   - exact pinned values (any algorithm change MUST be flagged — the
  *     oracle chain would have to change in lockstep);
  *   - the documented |error| < 1e-7 accuracy bound vs math.log across
  *     seeded random rationals up to 2^61;
  *   - the Spark expression (codegen AND interpreted) routes through the
  *     same static, including the NULL-on-non-positive contract.
  */
class PinnedLogSpec extends SparkSpec {
  import spark.implicits._

  test("pinned values: any algorithm drift fails loudly") {
    // values cross-checked against the DuckDB chain (exact) and math.log
    // (within bound) when this layer was built
    assert(PinnedLog.lnNanos(1L, 1L) == 0L)
    assert(PinnedLog.lnNanos(2L, 1L) == 693147181L)
    assert(PinnedLog.lnNanos(1L, 2L) == -693147181L)
    assert(PinnedLog.lnNanos(10L, 1L) == 2302585091L)
    assert(PinnedLog.lnNanos(1000000L, 1L) == 13815510557L)
    assert(PinnedLog.lnNanos(3L, 7L) == -847297868L)
  }

  test("accuracy: |lnNanos/1e9 - ln(a/b)| < 1e-7 on seeded random rationals") {
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 50000) {
      val a = 1L + (rnd.nextLong().abs % (1L << rnd.nextInt(61)))
      val b = 1L + (rnd.nextLong().abs % (1L << rnd.nextInt(61)))
      val got = PinnedLog.lnNanos(a, b) / 1e9
      val want = math.log(a.toDouble) - math.log(b.toDouble)
      assert(math.abs(got - want) < 1e-7, s"a=$a b=$b got=$got want=$want")
      i += 1
    }
  }

  test("antisymmetry within rounding: lnNanos(a,b) + lnNanos(b,a) is ~0") {
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val a = 1L + (rnd.nextLong().abs % (1L << rnd.nextInt(50)))
      val b = 1L + (rnd.nextLong().abs % (1L << rnd.nextInt(50)))
      val s = PinnedLog.lnNanos(a, b) + PinnedLog.lnNanos(b, a)
      // truncations are one-sided per direction; the sum stays within
      // the documented absolute bound on each side
      assert(math.abs(s) < 200L, s"a=$a b=$b sum=$s")
    }
  }

  test("ln_nanos expression: codegen result equals the static, null on non-positive") {
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(3)
    val pairs = Seq.fill(500)((
      1L + (rnd.nextLong().abs % (1L << rnd.nextInt(61))),
      1L + (rnd.nextLong().abs % (1L << rnd.nextInt(61)))))
    val got = pairs.toDF("a", "b")
      .select(expr("ln_nanos(a, b)")).as[Long].collect().toSeq
    val want = pairs.map { case (a, b) => PinnedLog.lnNanos(a, b) }
    assert(got == want)
    val nulls = Seq((0L, 5L), (5L, 0L), (-3L, 5L)).toDF("a", "b")
      .select(expr("ln_nanos(a, b)")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("ln_nanos: interpreted eval path equals codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val viaEval = graft.functions.LnNanos(Literal(77L), Literal(13L)).eval(null)
    assert(viaEval == PinnedLog.lnNanos(77L, 13L))
    assert(graft.functions.LnNanos(Literal(0L), Literal(13L)).eval(null) == null)
  }

  test("oracle chain SQL names every scratch column case-insensitively uniquely") {
    // DuckDB identifiers are case-insensitive: __ln_x_A would silently
    // resolve to __ln_x_a (the bug the mantissa columns are named around)
    val sql = graft.functions.PinnedLogSql.chain(
      "SELECT 1 AS k, 10 AS n, 3 AS m", Seq("k"), Seq(("n", "m", "lnv")))
    val cols = "AS (__ln_\\w+)".r.findAllMatchIn(sql).map(_.group(1)).toSeq
    assert(cols.map(_.toLowerCase).distinct.size == cols.distinct.size)
    assert(sql.contains("693147181"))
  }
}
