package graft

import graft.queries.ExtraQueries
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** ScalaCheck property for typedPositionalSelect — the bucketed-histogram
  * EXACT selection behind dq_outlier_iqr and a37_percentile_bands: for
  * random (event_type, value) corpora and random positional ranks, the
  * histogram search must return exactly the value a pure-Scala SORT of
  * each type's series puts at that rank. Generators bias toward the
  * selection's hard cases: heavy ties (values drawn from a small
  * domain), single-value types (zero bucket width), skewed type sizes,
  * and rank positions at both extremes (1 and n). */
class PositionalSelectSpec extends SparkSpec {
  import spark.implicits._

  private val corpusGen = for {
    n <- Gen.chooseNum(1, 400)
    domain <- Gen.oneOf(3L, 10L, 5000L) // tie-dense through spread-out
    rows <- Gen.listOfN(n, for {
      t <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(0L, domain)
    } yield (t, v))
  } yield rows

  test("typedPositionalSelect ≡ a pure-Scala sort at every requested rank") {
    val prop = forAll(corpusGen) { rows =>
      val c = rows.toDF("event_type", "v")
      // ranks per type: first, last, and the quartile/percentile shapes
      // the two shipping queries use
      def ranks(n: Long): Seq[(String, Long)] = Seq(
        "first" -> 1L, "last" -> n,
        "q1" -> (n + 3) / 4, "q3" -> (3 * n + 3) / 4,
        "p10" -> (n + 9) / 10, "p90" -> (9 * n + 9) / 10)
      val got = ExtraQueries.typedPositionalSelect(spark, c, ranks)
      val ref = rows.groupBy(_._1).flatMap { case (t, rs) =>
        val sorted = rs.map(_._2).sorted
        val n = sorted.size.toLong
        ranks(n).map { case (tag, k) =>
          (t, tag) -> (n, sorted((k - 1).toInt))
        }
      }.toMap
      got == ref
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }
}
