package graft.tools

import graft.core.Graft
import graft.pipeline.Medallion
import org.apache.spark.sql.functions._

/** One-off: time a full medallion cycle (CSV → raw → stage → analytics →
  * features → serving) at a given sf dir. */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session()
    val base = java.nio.file.Files.createTempDirectory("plbench").toString
    val csv = s"$base/csv"; val root = s"$base/lake"
    Graft.events(spark, sfDir)
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .write.option("header", "true").csv(csv)
    val t0 = System.nanoTime()
    Medallion.runCycle(spark, csv, root)
    val t1 = System.nanoTime()
    Medallion.servingExport(spark, root)
    val t2 = System.nanoTime()
    println(f"PIPELINE_CYCLE_SEC=${(t1 - t0) / 1e9}%.1f SERVING_SEC=${(t2 - t1) / 1e9}%.1f")
    // incremental no-op cycle (re-delivery): should be fast and change nothing
    val n1 = spark.read.parquet(Medallion.featuresPath(root)).count()
    val t3 = System.nanoTime()
    Medallion.runCycle(spark, csv, root)
    val t4 = System.nanoTime()
    val n2 = spark.read.parquet(Medallion.featuresPath(root)).count()
    println(f"REDELIVERY_SEC=${(t4 - t3) / 1e9}%.1f FEATURES_ROWS=$n1%d STABLE=${n1 == n2}%b")
    spark.stop()
  }
}
