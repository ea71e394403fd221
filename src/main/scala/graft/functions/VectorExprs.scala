package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the ANN/dedup hot path: exact integer dot
  * product of two BIGINT arrays (quantized embeddings).
  *
  * Why a custom Expression instead of `zip_with`+`aggregate` or an unrolled
  * element_at chain: higher-order-function lambdas drop out of whole-stage
  * codegen, and a 64-term unrolled tree bloats Catalyst
  * optimization/codegen — both measured 10-25× slower than this tight
  * generated loop on the candidate-pair join at sf0.1. `doGenCode` emits a
  * plain `for` over `ArrayData.getLong`, so the whole cosine stays inside
  * one codegen stage.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot requires two array<bigint> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED bigint arrays via a linear merge —
  * the Jaccard hot path. `array_intersect` builds a hash set of boxed
  * elements per row pair; on a candidate-pair join that allocation
  * dominates. Over pre-sorted primitive arrays the merge is branchy long
  * comparisons only, fully inside codegen.
  *
  * Caller contract: both inputs ascending-sorted and duplicate-free
  * (produce with `array_sort(array_distinct(...))` / hashes thereof).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Optimizer fence: identity on its child, marked NONDETERMINISTIC so the
  * optimizer never moves predicates across the projection that computes
  * the child. Catalyst pushes a post-join filter back into the join
  * condition (substituting the projected alias), and it does NOT common
  * up an expression between a join condition and a later projection — so
  * an expensive projected value (a banded edit-distance DP) that is also
  * filtered on would be evaluated TWICE per surviving row. Wrapping the
  * filter side in the fence keeps the single projected evaluation.
  * Codegen is a pass-through: zero runtime cost, purely a planning fence.
  */
case class PlanBarrier(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = child.dataType
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "plan_barrier"
  override protected def nullSafeEval(v: Any): Any = v
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): PlanBarrier =
    copy(child = newChild)
}

/** Element-wise sum of equal-length long vectors — the k-means centroid
  * update aggregate (§2.10 UDAF surface). A typed [[Aggregator]] keeps the
  * whole update one hash-aggregate pass with NO per-element explode: the
  * explode formulation shuffles dim×N rows (64× write amplification at
  * 100 TB), this shuffles one partial vector per (cell × partition).
  * Long addition is exact and commutative, so the result is identical at
  * any parallelism. */
object LongVecSum
    extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
  def zero: Array[Long] = Array.emptyLongArray
  def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
    if (a == null) b
    else if (b.isEmpty) a.clone()
    else { var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b }
  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2 else reduce(b1, b2)
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Sum of a binary payload's UNSIGNED byte values — the media windows'
  * "energy" statistic. The SQL-function form
  * (`aggregate(transform(sequence(1, len), j -> ascii(substring(s, j, 1)))`)
  * is quadratic: each substring re-scans the prefix for UTF-8 boundaries,
  * so a 400-byte window costs ~80k character probes. This is one generated
  * loop over the raw bytes, fully inside whole-stage codegen; on ASCII
  * payloads it equals the per-char ascii sum the DuckDB oracle computes. */
case class ByteSum(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"byte_sum requires a binary arg, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"

  override protected def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += ($a[$i] & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)
}

/** Bucketed histogram of a binary payload's unsigned byte values —
  * the media feature-extraction kernel ([[graft.functions.Multimodal]]'s
  * encoder stand-in: 64 buckets = the embedding, 4 buckets = the decode
  * stub's features). One generated loop over the raw bytes into a
  * primitive long[] (UnsafeArrayData, no boxing), fully inside
  * whole-stage codegen — replacing a per-partition mapPartitions closure
  * that broke the codegen stage around it. Bucket of byte b is
  * (b & 0xff) * nbuckets / 256; `nbuckets` must be a foldable positive
  * int (the plan-time histogram shape). */
case class ByteHist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.IntegerType) if right.foldable =>
        val n = right.eval()
        if (n != null && n.asInstanceOf[Int] > 0 && n.asInstanceOf[Int] <= 256)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"byte_hist bucket count must be a literal in 1..256, got $n")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"byte_hist requires (binary, int literal) args, got $l / $r")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_hist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val n = b.asInstanceOf[Int]
    val hist = new Array[Long](n)
    var i = 0
    while (i < bytes.length) { hist(((bytes(i) & 0xff) * n) / 256) += 1L; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(hist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |long[] $h = new long[$b];
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $h[(($a[$i] & 0xff) * $b) / 256] += 1L;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($h);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteHist =
    copy(left = newLeft, right = newRight)
}

/** Dedup-key text normalization — lowercase, strip non-[a-z0-9 ],
  * collapse space runs, trim — in ONE generated byte scan. The composed
  * form (`trim(regexp_replace(regexp_replace(lower(text), ...), ...))`)
  * walks the string four times through two regex engines and three
  * intermediate allocations; this emits the final bytes directly and
  * stays inside whole-stage codegen. Parity contract: equals the
  * composed form byte-for-byte on ASCII input (multi-byte UTF-8 units
  * can never be [a-z0-9 ], so they strip exactly like the regex class;
  * the divergence is only the handful of Unicode codepoints whose
  * LOWER() maps INTO ascii — U+212A KELVIN, U+017F LONG S — which the
  * corpus contract excludes and the oracle fixture is checked free of). */
case class AsciiNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ascii_normalize requires a string arg, got $other")
    }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "ascii_normalize"

  override protected def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val out = new Array[Byte](in.length)
    var o = 0
    var pend = false
    var i = 0
    while (i < in.length) {
      var b = in(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pend && o > 0) { out(o) = ' '; o += 1 }
        pend = false
        out(o) = b; o += 1
      } else if (b == ' ') pend = true
      // every other byte (incl. negative = non-ASCII) strips
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out, 0, o)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val in = ctx.freshName("in")
      val out = ctx.freshName("out")
      val o = ctx.freshName("o")
      val pend = ctx.freshName("pend")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |byte[] $in = $a.getBytes();
         |byte[] $out = new byte[$in.length];
         |int $o = 0;
         |boolean $pend = false;
         |for (int $i = 0; $i < $in.length; $i++) {
         |  byte $b = $in[$i];
         |  if ($b >= 'A' && $b <= 'Z') $b = (byte)($b + 32);
         |  if (($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9')) {
         |    if ($pend && $o > 0) { $out[$o++] = ' '; }
         |    $pend = false;
         |    $out[$o++] = $b;
         |  } else if ($b == ' ') { $pend = true; }
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String
         |  .fromBytes($out, 0, $o);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiNormalize =
    copy(child = newChild)
}

object VectorExprs {
  /** Register the native expressions on the session's function registry
    * (idempotent) so query code can use them via `expr(...)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_dot", exprs => LongDot(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => SortedIntersectCount(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "plan_barrier", exprs => PlanBarrier(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_sum", exprs => ByteSum(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_hist", exprs => ByteHist(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ln_nanos", exprs => LnNanos(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ascii_normalize", exprs => AsciiNormalize(exprs.head), "built-in")
  }

  /** [[LongVecSum]] as a column aggregate. */
  val longVecSum: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(LongVecSum)
}
