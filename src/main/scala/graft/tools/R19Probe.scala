package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 optimization probe: times alternative formulations of the
  * slow-tail queries against the shipped bodies on the SAME session
  * config as graft.Bench, within ONE JVM (cross-invocation host drift
  * at sf0.1 is larger than most effects), and asserts result equality
  * before reporting a time. Throwaway measurement scaffolding — not on
  * any driver path. The experiment body below is rewritten per probe;
  * the committed version documents the harness, not any one experiment.
  */
object R19Probe {
  def session(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def time(spark: SparkSession, label: String, reps: Int = 3)(f: => DataFrame): Double = {
    def run1(): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run1() // warm
    val best = (1 to reps).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      run1()
    }.min
    println(f"PROBE $label $best%.3f")
    best
  }

  /** rows-equal check via symmetric exceptAll */
  def sameResult(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    graft.core.Graft.tableNames.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").count()
      catch { case _: Throwable => () }
    }

    // ---- experiment body (rewritten per probe) ----
    import graft.queries.{GraphQueries => GQ}
    def stateSideP(state: org.apache.spark.sql.DataFrame, rows: Long) =
      if (rows <= 1000000L) broadcast(state) else state
    // fused LPA superstep: ONE dst exchange; both rollups reuse it
    // (HashPartitioning(dst) satisfies ClusteredDistribution(dst, lbl))
    def lpaStepFused(adj: org.apache.spark.sql.DataFrame,
        labels: org.apache.spark.sql.DataFrame, nV: Long) = {
      val n = adj.sparkSession.sessionState.conf.numShufflePartitions
      adj.join(stateSideP(labels, nV), col("src") === col("node"))
        .select(explode(col("nbrs")).as("dst"), col("lbl"))
        .repartition(n, col("dst"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("lbl"))
    }
    def lpaFused() = {
      val adj = GQ.adjacency(spark, dir, col("l_quantity") >= 45)
      val nV = adj.count()
      var labels = adj.select(col("src").as("node"), col("src").as("lbl"))
      for (_ <- 1 to 3) labels = lpaStepFused(adj, labels, nV)
      graft.queries.CacheScope.sealCheckpoints(
        labels.groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).cast("long").as("n_members"),
            min("node").cast("long").as("min_node"),
            sum("node").cast("long").as("sum_nodes")),
        adj)
    }
    def lpaCur() = graft.SparkEntry.queries("g_lpa")(spark, dir)
    println("lpa equal: " + sameResult(lpaCur(), lpaFused()))
    // count exchanges in one fused superstep's executed plan
    spark.sharedState.cacheManager.clearCache()
    time(spark, "lpa_cur")(lpaCur())
    time(spark, "lpa_fused")(lpaFused())
    time(spark, "lpa_cur2")(lpaCur())
    time(spark, "lpa_fused2")(lpaFused())

    spark.stop()
  }
}
