package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registered queries in isolation.
  *
  * Usage: runMain graft.tools.QTime <sfDir> <name1,name2,...> [reps]
  *
  * Prints per-query min-of-reps wall time after an untimed warmup run —
  * the per-query twin of Bench for local perf iteration (Bench always runs
  * the whole registry; Verify adds parquet-write cost to every query).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // collect_set/collect_list/map-agg run as ObjectHashAggregate; the
      // default sort-based fallback kicks in at 128 in-memory groups,
      // turning every wide-key collect into a per-task sort of the whole
      // input. Lift it to 128k groups (bounded: buffers are the collected
      // sets themselves, which these queries bound by construction).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // println goes to stdout; sbt relays it (build.sbt StdoutOutput)
      println(f"QTIME $name%-24s min ${times.min}%.3f  all ${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
