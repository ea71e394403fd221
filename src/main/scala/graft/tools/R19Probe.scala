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
    def pairsCur() = graft.pipeline.BasketStore
      .pairCounts(graft.core.Graft.table(spark, dir, "lineitem"))
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b")).limit(100)
    def pairsPacked() = {
      val cap = 4096L
      val gathered = graft.core.Graft.table(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val guarded = gathered.withColumn("ps",
        when(size(col("ps")) <= cap, col("ps")).otherwise(raise_error(concat(
          lit("basket pair explode: order "), col("l_orderkey"),
          lit(" has "), size(col("ps")),
          lit(" distinct parts > cap")))))
      guarded
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |            y -> x * 4294967296L + y)))""".stripMargin)).as("pk"))
        .groupBy("pk").agg(count(lit(1)).cast("long").as("n_ab"))
        .select(expr("pk div 4294967296L").as("part_a"),
          expr("pk % 4294967296L").as("part_b"), col("n_ab"))
        .orderBy(col("n_ab").desc, col("part_a"), col("part_b")).limit(100)
    }
    println("pairs equal: " + sameResult(pairsCur(), pairsPacked()))
    spark.sharedState.cacheManager.clearCache()
    time(spark, "pairs_cur")(pairsCur())
    time(spark, "pairs_packed")(pairsPacked())
    time(spark, "pairs_cur2")(pairsCur())
    time(spark, "pairs_packed2")(pairsPacked())

    spark.stop()
  }
}
