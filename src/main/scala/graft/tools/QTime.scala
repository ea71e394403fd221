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
      // AQE partition coalescing optimizes for shuffle BYTES and cannot
      // see compute amplification past the exchange: a 400x explode or a
      // 4.5M-group aggregate downstream of a few-MB shuffle gets packed
      // onto 1-2 cores (g_butterfly measured 6.4s coalesced vs 2.6s not).
      // On a real cluster at 100 TB every such shuffle exceeds the target
      // size and coalescing is a no-op - disabling it locally only
      // removes a small-scale artifact. Skew-join and the rest of AQE
      // stay on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional stage census (GRAFT_QTIME_STAGES=1): per timed rep, print
    // each stage's task count and summed task time — the no-UI way to see
    // WHERE a query's seconds go (a 1-task stage under a 400x explode, a
    // reduce side coalesced to 2 cores, ...).
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long, String)]()
    if (sys.env.contains("GRAFT_QTIME_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          stages.put(i.stageId, (i.numTasks,
            i.taskMetrics.executorRunTime,
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            i.name.linesIterator.next().take(90)))
        }
      })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      val times = (1 to reps).map { _ =>
        // the warmup (and prior reps) of a sealed query leave its RESULT
        // cached, and Spark's cacheManager matches the next rep's identical
        // plan against it — without this clear, every rep after the first
        // measures a cache read, not the query (JIT/page-cache warmth is
        // what the warmup is for; plan-cache reuse is not)
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // println goes to stdout; sbt relays it (build.sbt StdoutOutput)
      println(f"QTIME $name%-24s min ${times.min}%.3f  all ${times.map(t => f"$t%.2f").mkString(",")}")
      if (sys.env.contains("GRAFT_QTIME_STAGES")) {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_._2._3).take(12).foreach {
          case (id, (n, run, wall, nm)) =>
            println(f"  STAGE $id%4d tasks=$n%3d taskTimeSum=${run / 1e3}%.1fs wall=${wall / 1e3}%.1fs  $nm")
        }
        stages.clear()
      }
    }
    spark.stop()
  }
}
