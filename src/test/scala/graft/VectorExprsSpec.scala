package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** LongDot: the native codegen'd dot product must agree with a plain Scala
  * reference on arbitrary inputs, in both codegen and interpreted paths. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("long_dot matches a Scala reference on seeded random vectors") {
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((
      Seq.fill(64)(rnd.nextLong() % 1000000L),
      Seq.fill(64)(rnd.nextLong() % 1000000L)))
    val df = pairs.toDF("a", "b")
    val got = df.select(expr("long_dot(a, b)")).as[Long].collect().toSeq
    val want = pairs.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got == want)
  }

  test("long_dot: interpreted eval equals codegen result") {
    VectorExprs.register(spark)
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    val viaPlan = df.select(expr("long_dot(a, b)")).as[Long].head()
    val viaEval = graft.functions.LongDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1L, 2L, 3L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(4L, 5L, 6L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      .eval(null)
    assert(viaPlan == 32L && viaEval == 32L)
  }

  test("sorted_intersect_count matches array_intersect size on seeded random sets") {
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((
      Seq.fill(50)(rnd.nextInt(80).toLong).distinct.sorted,
      Seq.fill(50)(rnd.nextInt(80).toLong).distinct.sorted))
    val df = pairs.toDF("a", "b")
    val got = df.select(expr("sorted_intersect_count(a, b)")).as[Long].collect().toSeq
    val want = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
    assert(got == want)
  }

  test("long_dot is null-safe") {
    VectorExprs.register(spark)
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(expr("long_dot(a, b)")).head().isNullAt(0))
  }

  test("byte_sum: codegen == interpreted == Scala reference; unsigned; null-safe") {
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(11)
    // include high-bit bytes: (b & 0xff) must treat them UNSIGNED
    val payloads = Seq.fill(100)(Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)) :+
      Array.empty[Byte]
    val df = payloads.map(Tuple1(_)).toDF("b")
    val got = df.select(expr("byte_sum(b)")).as[Long].collect().toSeq
    val want = payloads.map(_.map(x => (x & 0xff).toLong).sum)
    assert(got == want)
    val viaEval = graft.functions.ByteSum(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[Byte](1, -1, 127), org.apache.spark.sql.types.BinaryType)).eval(null)
    assert(viaEval == (1 + 255 + 127).toLong)
    val nulls = Seq(Tuple1(None: Option[Array[Byte]])).toDF("b")
    assert(nulls.select(expr("byte_sum(b)")).head().isNullAt(0))
    // on ASCII payloads byte_sum ≡ the per-char ascii sum (the oracle form)
    val ascii = Seq(Tuple1("hello world 123")).toDF("s")
      .withColumn("b", col("s").cast("binary"))
    val bs = ascii.select(expr("byte_sum(b)")).as[Long].head()
    assert(bs == "hello world 123".map(_.toLong).sum)
  }

  test("byte_hist: codegen == interpreted == Scala reference; unsigned; null-safe") {
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(23)
    val payloads = Seq.fill(100)(Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)) :+
      Array.empty[Byte]
    def ref(bytes: Array[Byte], n: Int): Seq[Long] = {
      val h = new Array[Long](n)
      bytes.foreach(b => h(((b & 0xff) * n) / 256) += 1L)
      h.toSeq
    }
    val df = payloads.map(Tuple1(_)).toDF("b")
    for (n <- Seq(4, 64)) {
      val got = df.select(expr(s"byte_hist(b, $n)")).as[Seq[Long]].collect().toSeq
      assert(got == payloads.map(ref(_, n)), s"byte_hist($n) drifted from reference")
    }
    // interpreted eval path agrees with the plan (codegen) path
    val viaEval = graft.functions.ByteHist(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[Byte](0, -1, 127, 64), org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    // 0 -> bucket 0; 64, 127 -> bucket 1; -1 (=255 unsigned) -> bucket 3
    assert(viaEval == Seq(1L, 2L, 0L, 1L))
    assert(viaEval == ref(Array[Byte](0, -1, 127, 64), 4))
    val nulls = Seq(Tuple1(None: Option[Array[Byte]])).toDF("b")
    assert(nulls.select(expr("byte_hist(b, 4)")).head().isNullAt(0))
  }

  test("ascii_normalize == the composed lower/strip/collapse/trim form; null-safe") {
    VectorExprs.register(spark)
    // seeded random ASCII strings plus the nasty shapes: leading/trailing/
    // repeated spaces, all-stripped, empty, punctuation runs between words
    val rnd = new scala.util.Random(99)
    val alphabet = "ABCdef012 !?.,-_@#\t"
    val cases = Seq("", "   ", "!!!", "  Hello,  WORLD!! 42  ",
      "a", " a ", "a!b", "A  .  B") ++
      Seq.fill(300)(Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = cases.map(Tuple1(_)).toDF("text")
    val got = df.select(expr("ascii_normalize(text)")).as[String].collect().toSeq
    val want = df.select(
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " "))).as[String].collect().toSeq
    assert(got == want, got.zip(want).zip(cases).find { case ((g, w), _) => g != w }
      .map { case ((g, w), c) => s"'$c': got '$g' want '$w'" }.getOrElse(""))
    // interpreted path (direct eval) agrees with the plan/codegen path
    val viaEval = graft.functions.AsciiNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("  Ab!  c9 "),
        org.apache.spark.sql.types.StringType))
      .eval(null).toString
    assert(viaEval == "ab c9")
    val nulls = Seq(Tuple1(None: Option[String])).toDF("text")
    assert(nulls.select(expr("ascii_normalize(text)")).head().isNullAt(0))
  }
}
