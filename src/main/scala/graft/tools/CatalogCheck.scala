package graft.tools

import graft.core.{Graft, PersistentCatalog}
import org.apache.spark.sql.functions._

/** Cross-JVM catalog persistence proof, run by CatalogPersistenceSpec as
  * two separate java processes against the same warehouse + Derby dir:
  *
  *   phase=write — register (a) a managed BUCKETED summary table and
  *     (b) an EXTERNAL table over the fixture's parquet, then exit.
  *   phase=read — a FRESH JVM resolves both by name, checks row counts,
  *     and proves the bucketing spec survived by joining the bucketed
  *     table to itself and counting shuffle exchanges (must be 0).
  *
  * Prints `CATALOG_OK <managedRows> <externalRows> <shuffles>` on success —
  * the spec greps for it.
  */
object CatalogCheck {
  def main(args: Array[String]): Unit = {
    val (phase, warehouse, metastore, sfDir) = (args(0), args(1), args(2), args(3))
    val spark = PersistentCatalog.session(warehouse, metastore)
    phase match {
      case "write" =>
        val summary = Graft.events(spark, sfDir)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(38,6)")).cast("double").as("value_sum"))
        PersistentCatalog.saveBucketed(summary, "graft", "user_summary", "user_id", 8)
        PersistentCatalog.registerExternal(spark, "graft", "events_ext",
          s"$sfDir/events.parquet")
        println(s"WRITE_OK ${spark.table("graft.user_summary").count()}")
      case "read" =>
        val managed = spark.table("graft.user_summary")
        val external = spark.table("graft.events_ext")
        val m = managed.count()
        val e = external.count()
        // bucket metadata must survive the restart: a self-join on the
        // bucket key plans with ZERO shuffle exchanges
        val joined = managed.join(
          spark.table("graft.user_summary").withColumnRenamed("n_events", "n2")
            .withColumnRenamed("value_sum", "v2"), "user_id")
        joined.collect()
        def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = (p match {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
          case _ => 0
        }) + p.children.map(shuffles).sum + (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            shuffles(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            shuffles(s.plan)
          case _ => 0
        })
        val nShuffles = shuffles(joined.queryExecution.executedPlan)
        println(s"CATALOG_OK $m $e $nShuffles")
      case other => sys.error(s"unknown phase $other")
    }
    spark.stop()
  }
}
