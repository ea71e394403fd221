package graft

import graft.core.Lakehouse
import graft.pipeline.Medallion
import org.apache.spark.sql.functions._

/** The CLI layer dispatcher: per-layer stages compose to the same lake state
  * as runCycle (the Main.main entry forks its own session, so the dispatch
  * logic is exercised through the same Medallion calls it routes to). */
class MainSpec extends SparkSpec {

  test("layer-by-layer dispatch produces the same features as runCycle") {
    val csv = tmpDir("main-csv")
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csv)

    val a = tmpDir("main-a"); val b = tmpDir("main-b")
    Medallion.runCycle(spark, csv, a)
    // the dispatcher's sequence, one layer at a time
    Medallion.ingestRaw(spark, csv, b)
    Medallion.stage(spark, b)
    Medallion.analytics(spark, b)
    Medallion.features(spark, b)
    val fa = Lakehouse.read(spark, Medallion.featuresPath(a))
    val fb = Lakehouse.read(spark, Medallion.featuresPath(b))
    assert(fa.exceptAll(fb).isEmpty && fb.exceptAll(fa).isEmpty)
    assert(fa.count() > 0)
  }
}
