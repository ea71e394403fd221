package graft

import graft.core.Graft
import graft.plans.IntDivPushdown
import org.apache.spark.sql.functions._

/** The IntDivPushdown optimizer rule: watermark predicates over derived
  * columns — `ts div 1000` on the legacy int64-nanos layout,
  * `unix_micros(ts)` on the timestamp layout — must reach the parquet scan
  * as raw-column bounds, without changing results. */
class IntDivPushdownSpec extends SparkSpec {

  private def withRule[A](f: org.apache.spark.sql.SparkSession => A): A = {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(IntDivPushdown)
    f(s2)
  }

  private val cut = 1704153600000000L

  /** The legacy fixture layout (TIMESTAMP(NANOS) read as int64 nanos),
    * reconstructed from the current fixture so the div path stays covered
    * whatever the driver regenerates. */
  private lazy val nanosDir: String = {
    val dir = tmpDir("events-nanos")
    Graft.events(spark, sf)
      .select(col("event_id"), (col("ts_us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("derives a pushable raw-column bound for ts div 1000 > c (nanos layout)") {
    withRule { s2 =>
      val df = s2.read.parquet(nanosDir)
        .filter(expr(s"ts div 1000 > ${cut}L"))
        .select("event_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(s"GreaterThan(ts,${cut * 1000 + 999})"), plan)
    }
  }

  test("derived bound never changes results (vs plain session)") {
    val plain = spark.read.parquet(nanosDir)
      .filter(expr(s"ts div 1000 > ${cut}L"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val ruled = withRule { s2 =>
      s2.read.parquet(nanosDir)
        .filter(expr(s"ts div 1000 > ${cut}L"))
        .select("event_id").collect().map(_.getLong(0)).toSet
    }
    assert(ruled == plain && plain.nonEmpty)
  }

  test("negative thresholds derive the truncation-aware bound (a > c*k, not naive)") {
    withRule { s2 =>
      val df = s2.read.parquet(nanosDir)
        .filter(expr("ts div 1000 > -5L"))
        .select("event_id")
      val plan = df.queryExecution.executedPlan.toString
      // q > -5 ⟺ a > -5000 (the naive a > -5 would drop [-4999, -6])
      assert(plan.contains("GreaterThan(ts,-5000)"), plan)
      assert(!plan.contains("GreaterThan(ts,-5)"), plan)
    }
  }

  test("a block-range filter over a derived column prunes from BOTH ends") {
    withRule { s2 =>
      val df = s2.read.parquet(nanosDir)
        .filter(expr(s"ts div 1000 >= ${cut}L AND ts div 1000 <= ${cut + 10}L"))
        .select("event_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(s"GreaterThanOrEqual(ts,${cut * 1000})"), plan)
      assert(plan.contains(s"LessThan(ts,${(cut + 11) * 1000})"), plan)
    }
  }

  test("timestamp layout: unix_micros watermark reaches the scan as a raw ts bound") {
    // The current fixture stores ts as TIMESTAMP(MICROS, isAdjustedToUTC=false)
    // → TIMESTAMP_NTZ; Graft.events derives ts_us = unix_micros(cast(ts)).
    val plain = Graft.withEpochUs(
        spark.read.parquet(s"$sf/events.parquet"), "ts", "ts_us")
      .filter(col("ts_us") > cut)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val ruled = withRule { s2 =>
      val df = Graft.withEpochUs(
          s2.read.parquet(s"$sf/events.parquet"), "ts", "ts_us")
        .filter(col("ts_us") > cut)
        .select("event_id")
      val optimized = df.queryExecution.optimizedPlan.toString
      // the derived raw-column comparison must appear alongside the original
      assert("""ts#\d+ >""".r.findFirstIn(optimized).isDefined, optimized)
      val executed = df.queryExecution.executedPlan.toString
      assert(executed.contains("GreaterThan(ts,"), executed)
      df.collect().map(_.getLong(0)).toSet
    }
    assert(ruled == plain && plain.nonEmpty)
  }

  test("composition: div of unix_micros chains to a raw ts bound") {
    val cutSec = cut / 1000000L
    def q(s: org.apache.spark.sql.SparkSession) =
      Graft.withEpochUs(s.read.parquet(s"$sf/events.parquet"), "ts", "ts_us")
        .filter(expr(s"ts_us div 1000000 >= ${cutSec}L"))
        .select("event_id")
    val plain = q(spark).collect().map(_.getLong(0)).toSet
    val ruled = withRule { s2 =>
      val df = q(s2)
      val executed = df.queryExecution.executedPlan.toString
      // chained: div bound → unix_micros bound → raw timestamp bound, and
      // only the raw (pushable) form is added to the filter
      assert(executed.contains("GreaterThanOrEqual(ts,"), executed)
      df.collect().map(_.getLong(0)).toSet
    }
    assert(ruled == plain && plain.nonEmpty)
  }

  test("soundness sweep: every op x threshold agrees with the plain session") {
    // boundary values straddling every multiple of k near zero, plus the
    // truncation flat band [-k+1, k-1] edges
    val k = 1000L
    val rows = Seq(-3001L, -3000L, -2999L, -2001L, -2000L, -1999L, -1001L,
      -1000L, -999L, -1L, 0L, 1L, 999L, 1000L, 1001L, 1999L, 2000L, 2001L,
      2999L, 3000L, 3001L)
    val dir = java.nio.file.Files.createTempDirectory("intdiv-sweep").toString
    spark.createDataFrame(rows.map(Tuple1(_))).toDF("v")
      .write.mode("overwrite").parquet(dir)
    for (op <- Seq(">", ">=", "<", "<="); c <- -3L to 3L) {
      val pred = s"v div $k $op ${c}L"
      val plain = spark.read.parquet(dir).filter(expr(pred))
        .collect().map(_.getLong(0)).toSet
      val ruled = withRule { s2 =>
        s2.read.parquet(dir).filter(expr(pred)).collect().map(_.getLong(0)).toSet
      }
      assert(ruled == plain, s"$pred: ruled=$ruled plain=$plain")
    }
  }

  test("GTE at c = 0 keeps negative dividends (a div k = 0 >= 0)") {
    // a = -5: (-5 div 1000) = 0 >= 0 must hold; the naive derived bound
    // a >= 0 would silently drop the row. Sound bound: a > -k.
    val rows = Seq(-1500L, -1000L, -999L, -5L, 0L, 5L, 999L, 1000L, 2500L)
    // Parquet-backed so the filter survives optimization (a LocalRelation
    // would be constant-folded before the rule's output is observable).
    val dir = java.nio.file.Files.createTempDirectory("intdiv").toString
    spark.createDataFrame(rows.map(Tuple1(_))).toDF("v")
      .write.mode("overwrite").parquet(dir)
    val plain = spark.read.parquet(dir)
      .filter(expr("v div 1000 >= 0L")).collect().map(_.getLong(0)).toSet
    val ruled = withRule { s2 =>
      val df = s2.read.parquet(dir).filter(expr("v div 1000 >= 0L"))
      val optimized = df.queryExecution.optimizedPlan.toString
      // the unsound raw bound would print as `(v#NNL >= 0)`; the original
      // `((v#NNL div 1000) >= 0)` must remain, the sound `> -1000` be added
      assert(!"""\(v#\d+L >= 0\)""".r.findFirstIn(optimized).isDefined, optimized)
      assert(optimized.contains("> -1000)"), optimized)
      df.collect().map(_.getLong(0)).toSet
    }
    assert(ruled == plain)
    assert(plain == Set(-999L, -5L, 0L, 5L, 999L, 1000L, 2500L))
  }

  test("GT at c = 0 stays sound for negative dividends") {
    val rows = Seq(-1500L, -5L, 0L, 999L, 1000L, 2500L)
    val plain = spark.createDataFrame(rows.map(Tuple1(_))).toDF("v")
      .filter(expr("v div 1000 > 0L")).collect().map(_.getLong(0)).toSet
    val ruled = withRule { s2 =>
      s2.createDataFrame(rows.map(Tuple1(_))).toDF("v")
        .filter(expr("v div 1000 > 0L")).collect().map(_.getLong(0)).toSet
    }
    assert(ruled == plain && plain == Set(1000L, 2500L))
  }

  test("rule is idempotent at fixpoint (no predicate duplication)") {
    withRule { s2 =>
      val df = s2.read.parquet(nanosDir)
        .filter(expr(s"ts div 1000 >= ${cut}L"))
        .select("event_id")
      val optimized = df.queryExecution.optimizedPlan.toString
      val occurrences = optimized.sliding(s"${cut * 1000}".length)
        .count(_ == s"${cut * 1000}")
      assert(occurrences == 1, optimized)
    }
  }
}
