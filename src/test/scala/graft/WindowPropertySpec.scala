package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the round-15 per-user window family: for
  * random event series, the Spark window programs must equal an
  * INDEPENDENT pure-Scala fold over the same (ts, event_id)-ordered
  * series — a third implementation besides the Spark plan and the DuckDB
  * oracle, so a shared misreading of the window frame can't hide. The
  * fold mirrors the operators' integer contracts exactly (cents =
  * floor(v·100 + 0.5), power-of-two EWMA weights, lower median, running
  * peak), so equality is exact, not approximate. */
class WindowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    uid <- Gen.chooseNum(1L, 3L)
    v <- Gen.chooseNum(1, 99999).map(_ / 100.0) // 2-decimal positive values
  } yield (uid, v)

  /** events fixture dir from (user_id, value) rows; ts follows event_id. */
  private def writeDir(rows: Seq[(Long, Double)]): String = {
    val ev = rows.zipWithIndex
      .map { case ((u, v), i) => (i.toLong + 1, u, v) }
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("event_type", lit("t")).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("wprop").toString
    ev.write.parquet(s"$dir/events.parquet")
    dir
  }

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  /** Per-user (event_id, cents) series in window order. */
  private def series(rows: Seq[(Long, Double)]): Map[Long, Seq[(Long, Long)]] =
    rows.zipWithIndex
      .map { case ((u, v), i) => (u, i.toLong + 1, cents(v)) }
      .groupBy(_._1)
      .map { case (u, es) => u -> es.sortBy(_._2).map(e => (e._2, e._3)) }

  test("property: w18_ewma ≡ pure-Scala 8-tap fold on random series") {
    val prop = forAll(Gen.listOfN(40, rowGen)) { rows =>
      if (rows.isEmpty) true
      else {
        val dir = writeDir(rows)
        val got = SparkEntry.queries("w18_ewma")(spark, dir)
          .as[(Long, Long, Long, Long, Long, Double)].collect()
          .map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
        val want = series(rows).flatMap { case (u, es) =>
          es.zipWithIndex.map { case ((eid, c), i) =>
            val taps = es.slice(math.max(0, i - 7), i + 1).map(_._2).reverse
            val num = taps.zipWithIndex.map { case (x, k) => x << (7 - k) }.sum
            val den = taps.indices.map(k => 1L << (7 - k)).sum
            (u, eid) -> ((num, den, num.toDouble / den))
          }
        }
        got == want
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: w20_rolling_median ≡ pure-Scala 5-frame lower median") {
    val prop = forAll(Gen.listOfN(40, rowGen)) { rows =>
      if (rows.isEmpty) true
      else {
        val dir = writeDir(rows)
        val got = SparkEntry.queries("w20_rolling_median")(spark, dir)
          .as[(Long, Long, Long, Long, Int)].collect()
          .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
        val want = series(rows).flatMap { case (u, es) =>
          es.zipWithIndex.map { case ((eid, _), i) =>
            val win = es.slice(math.max(0, i - 4), i + 1).map(_._2).sorted
            (u, eid) -> ((win((win.size + 1) / 2 - 1), win.size))
          }
        }
        got == want
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: a35_concurrency sweep ≡ brute-force trailing-30s count") {
    // timestamps cluster around a day boundary so the previous-day strip
    // carry is exercised on most samples, not just at the golden's point
    val tsGen = Gen.chooseNum(86400L - 90, 86400L + 90)
    val prop = forAll(Gen.listOfN(30, tsGen)) { secs =>
      if (secs.isEmpty) true
      else {
        val rows = secs.zipWithIndex.map { case (sec, i) => (i.toLong + 1, sec) }
        val ev = rows.toDF("event_id", "sec")
          .withColumn("ts", expr("timestamp_micros(sec * 1000000)"))
          .withColumn("user_id", lit(1L)).withColumn("event_type", lit("t"))
          .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
          .drop("sec")
        val dir = java.nio.file.Files.createTempDirectory("concprop").toString
        ev.write.parquet(s"$dir/events.parquet")
        val got = SparkEntry.queries("a35_concurrency")(spark, dir)
          .as[(Long, Long)].collect().toMap
        val want = rows.map { case (eid, sec) =>
          eid -> rows.count { case (_, s2) => s2 > sec - 30 && s2 <= sec }.toLong
        }.toMap
        got == want
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: w19_drawdown ≡ pure-Scala running-peak argmax") {
    val prop = forAll(Gen.listOfN(40, rowGen)) { rows =>
      if (rows.isEmpty) true
      else {
        val dir = writeDir(rows)
        val got = SparkEntry.queries("w19_drawdown")(spark, dir)
          .as[(Long, Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        val want = series(rows).map { case (u, es) =>
          var peak = Long.MinValue
          val dds = es.map { case (eid, c) =>
            peak = math.max(peak, c); (peak - c, eid, peak)
          }
          // max dd, earliest event on ties — the oracle's (dd DESC, event_id)
          val best = dds.maxBy(d => (d._1, -d._2))
          u -> ((best._1, best._3, best._2))
        }
        got == want
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }
}
