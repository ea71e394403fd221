package graft

import graft.core.Lakehouse
import org.apache.spark.sql.functions._

/** Physical-layout properties the 100 TB design depends on: hive
  * partitioning with scan-level pruning, and bucketed tables giving
  * shuffle-free co-located joins (the Spark-native form of the reference's
  * 256-way address_partition scheme). */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("ctas writes hive partitions and scans prune to one partition") {
    val path = tmpDir("part")
    val df = graft.core.Graft.events(spark, sf)
      .withColumn("date_partition",
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
    Lakehouse.ctas(df, path, Seq("date_partition"))
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("date_partition=")).map(_.getName).sorted
    assert(parts.length > 1, s"expected multiple month dirs, got ${parts.toSeq}")

    val one = Lakehouse.read(spark, path).filter(col("date_partition") === parts.head.stripPrefix("date_partition="))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date_partition"), plan)
    // pruned scan reads strictly fewer rows than the table holds
    assert(one.count() < Lakehouse.read(spark, path).count())
  }

  test("bucketed tables join without a shuffle (co-located by key)") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    ev.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed_a")
    ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed_b")
    val joined = spark.table("ev_bucketed_a")
      .join(spark.table("ev_bucketed_b"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == ev.count())
  }
}
