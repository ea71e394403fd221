package graft

import graft.core.Lakehouse
import graft.pipeline.Medallion
import graft.quality.DataQuality
import org.apache.spark.sql.functions._

/** The reference's DQ gate semantics over our pipeline output. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = spark.read.parquet(s"$sf/events.parquet")

  test("missingIds finds exactly the dropped ids") {
    val dropped = events.filter(!col("event_id").isin(3L, 7L))
    val missing = DataQuality.missingIds(spark, dropped, "event_id", 0L, 9L)
      .as[Long].collect().toSet
    assert(missing == Set(3L, 7L))
    // intact range -> no violations
    assert(DataQuality.missingIds(spark, events, "event_id", 0L, 9L).count() == 0)
  }

  test("incompleteGroups flags groups not matching their declared count") {
    val df = Seq((1L, 3L), (1L, 3L), (1L, 3L), (2L, 2L)).toDF("g", "declared")
    val bad = DataQuality.incompleteGroups(df, "g", "declared")
      .as[(Long, Long, Long)].collect()
    assert(bad.toSeq == Seq((2L, 1L, 2L)))
  }

  test("featureConstraints + gate over medallion features") {
    val root = tmpDir("dq-root"); val csv = tmpDir("dq-csv")
    events.withColumn("ts_us", expr("ts div 1000"))
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csv)
    Medallion.runCycle(spark, csv, root)
    val feats = Lakehouse.read(spark, Medallion.featuresPath(root))
    // healthy output passes the gate
    DataQuality.gate(Seq(
      "features" -> DataQuality.featureConstraints(
        feats, Seq("n_events"), "n_events", maxZeroRatio = 0.2)))
    // corrupt a counter -> gate throws
    val corrupt = feats.withColumn("n_events",
      when(col("user_id") === feats.select(min("user_id")).head.getLong(0), lit(-1L))
        .otherwise(col("n_events")))
    val ex = intercept[IllegalArgumentException] {
      DataQuality.gate(Seq(
        "features" -> DataQuality.featureConstraints(
          corrupt, Seq("n_events"), "n_events", maxZeroRatio = 0.2)))
    }
    assert(ex.getMessage.contains("features"))
  }
}
