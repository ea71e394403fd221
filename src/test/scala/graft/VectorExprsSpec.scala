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
}
