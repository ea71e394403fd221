package graft

import graft.plans.IntDivPushdown
import org.apache.spark.sql.functions._

/** The IntDivPushdown optimizer rule: watermark predicates over derived
  * `div` columns must reach the parquet scan as raw-column bounds — without
  * changing results. */
class IntDivPushdownSpec extends SparkSpec {

  private def withRule[A](f: org.apache.spark.sql.SparkSession => A): A = {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(IntDivPushdown)
    f(s2)
  }

  private val cut = 1704153600000000L

  test("derives a pushable raw-column bound for ts div 1000 > c") {
    withRule { s2 =>
      val df = s2.read.parquet(s"$sf/events.parquet")
        .filter(expr(s"ts div 1000 > ${cut}L"))
        .select("event_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(s"GreaterThan(ts,${cut * 1000 + 999})"), plan)
    }
  }

  test("derived bound never changes results (vs plain session)") {
    val plain = spark.read.parquet(s"$sf/events.parquet")
      .filter(expr(s"ts div 1000 > ${cut}L"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val ruled = withRule { s2 =>
      s2.read.parquet(s"$sf/events.parquet")
        .filter(expr(s"ts div 1000 > ${cut}L"))
        .select("event_id").collect().map(_.getLong(0)).toSet
    }
    assert(ruled == plain && plain.nonEmpty)
  }

  test("rule does not fire for negative thresholds (truncation unsoundness)") {
    withRule { s2 =>
      val df = s2.read.parquet(s"$sf/events.parquet")
        .filter(expr("ts div 1000 > -5L"))
        .select("event_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("GreaterThan(ts,-"), plan)
    }
  }

  test("rule is idempotent at fixpoint (no predicate duplication)") {
    withRule { s2 =>
      val df = s2.read.parquet(s"$sf/events.parquet")
        .filter(expr(s"ts div 1000 >= ${cut}L"))
        .select("event_id")
      val optimized = df.queryExecution.optimizedPlan.toString
      val occurrences = optimized.sliding(s"${cut * 1000}".length)
        .count(_ == s"${cut * 1000}")
      assert(occurrences == 1, optimized)
    }
  }
}
