package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 optimization probe: times alternative formulations of the
  * iterative-graph tail against the shipped query bodies on the SAME
  * session config as graft.Bench, and asserts result equality before
  * reporting a time. Throwaway measurement scaffolding — not on any
  * driver path.
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

  /** rows-equal check via symmetric except on stringified rows */
  def sameResult(a: DataFrame, b: DataFrame): Boolean = {
    val d1 = a.exceptAll(b).count()
    val d2 = b.exceptAll(a).count()
    d1 == 0 && d2 == 0
  }

  // ---------------------------------------------------------- kcore variants
  def edges(s: SparkSession, dir: String): DataFrame = {
    val e0 = graft.core.Graft.table(s, dir, "orders")
      .join(graft.core.Graft.table(s, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** B: fully lazy rounds, persist only the base edge set; AQE exchange
    * reuse dedupes the repeated subtrees. */
  def kcoreLazy(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val ed0 = edges(s, dir).persist()
    var ed = ed0
    for (_ <- 1 to 3) {
      val surv = ed.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("src")
      ed = ed.join(surv, "src")
        .join(surv.select(col("src").as("dst")), "dst")
        .select("src", "dst")
    }
    graft.queries.CacheScope.sealResult(
      ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("core_degree")),
      ed0)
  }

  /** C: window-degree rounds — one src-keyed exchange carries the degree
    * on every edge row, survivors filter in place, dst side via one join. */
  def kcoreWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val ed0 = edges(s, dir).persist()
    var ed = ed0
    for (_ <- 1 to 3) {
      val bystate = ed.withColumn("d", count(lit(1)).over(Window.partitionBy("src")))
      val srcOk = bystate.filter(col("d") >= k).drop("d")
      val surv = srcOk.select("src").distinct()
      ed = srcOk.join(surv.select(col("src").as("dst")), "dst")
        .select("src", "dst")
    }
    graft.queries.CacheScope.sealResult(
      ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("core_degree")),
      ed0)
  }

  /** D: peel the REMOVED set (deg < k — typically tiny) with anti-joins
    * instead of semi-joining survivors: the |E| rows never cross an
    * exchange after the base persist; each round is a map-side scan +
    * a partial-agg degree exchange, and AQE elects broadcast for the
    * removed side when it is small. No per-round persist needed — the
    * lineage is filters, not joins. */
  def kcorePeel(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val ed0 = edges(s, dir).persist()
    var ed = ed0
    for (_ <- 1 to 3) {
      val removed = ed.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") < k).select("src")
      ed = ed.join(removed, Seq("src"), "left_anti")
        .join(removed.select(col("src").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst")
    }
    graft.queries.CacheScope.sealResult(
      ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("core_degree")),
      ed0)
  }

  /** E: peel-removed with the current per-round persist+count discipline. */
  def kcorePeelPersist(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val ed0 = edges(s, dir).persist()
    var ed = ed0
    val caches = Seq.newBuilder[DataFrame]
    caches += ed0
    for (_ <- 1 to 3) {
      val removed = ed.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") < k).select("src")
      val next = ed.join(removed, Seq("src"), "left_anti")
        .join(removed.select(col("src").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst")
        .persist()
      next.count()
      caches += next
      ed = next
    }
    graft.queries.CacheScope.sealResult(
      ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("core_degree")),
      caches.result(): _*)
  }

  /** F: current semi-join shape, per-round persist kept but WITHOUT the
    * blocking count — the final action materializes the round caches
    * bottom-up inside one job (block-level locking keeps each partition
    * computed once). */
  def kcoreNoBlock(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val ed0 = edges(s, dir).persist()
    var ed = ed0
    val caches = Seq.newBuilder[DataFrame]
    caches += ed0
    for (_ <- 1 to 3) {
      val surv = ed.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("src")
      val next = ed.join(surv, "src")
        .join(surv.select(col("src").as("dst")), "dst")
        .select("src", "dst")
        .persist()
      caches += next
      ed = next
    }
    graft.queries.CacheScope.sealResult(
      ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("core_degree")),
      caches.result(): _*)
  }

  /** G: per-round eager localCheckpoint instead of persist+count — flat
    * plans per round (no lineage growth), blocks freed at the end. */
  def kcoreCkpt(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val ed0 = edges(s, dir).localCheckpoint(true)
    var ed = ed0
    val ckpts = Seq.newBuilder[DataFrame]
    ckpts += ed0
    for (_ <- 1 to 3) {
      val surv = ed.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("src")
      val next = ed.join(surv, "src")
        .join(surv.select(col("src").as("dst")), "dst")
        .select("src", "dst")
        .localCheckpoint(true)
      ckpts += next
      ed = next
    }
    val out = ed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("core_degree"))
      .persist()
    out.count()
    ckpts.result().foreach(graft.queries.CacheScope.freeCheckpoint)
    out
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    // warm tables
    graft.core.Graft.tableNames.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    import org.apache.spark.sql.expressions.Window
    // OLD (pre-r19) implementations, persisted-stage style, for
    // role-swapped within-JVM A/B against the new registry bodies.
    def edgesOld() = {
      val e0 = graft.core.Graft.table(spark, dir, "orders")
        .join(graft.core.Graft.table(spark, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    }
    def kcoreOld() = {
      val k = 8
      var ed = edgesOld().persist()
      val rounds = Seq.newBuilder[org.apache.spark.sql.DataFrame]
      rounds += ed
      for (_ <- 1 to 3) {
        val surv = ed.groupBy("src").agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select("src")
        val next = ed.join(surv, "src")
          .join(surv.select(col("src").as("dst")), "dst")
          .select("src", "dst").persist()
        next.count()
        rounds += next
        ed = next
      }
      graft.queries.CacheScope.sealResult(
        ed.groupBy(col("src").as("node"))
          .agg(count(lit(1)).cast("long").as("core_degree")),
        rounds.result(): _*)
    }
    def adjacencyOld(edgePred: org.apache.spark.sql.Column) = {
      val orders = graft.core.Graft.table(spark, dir, "orders")
      val lineitem = graft.core.Graft.table(spark, dir, "lineitem")
      val e0 = orders
        .join(lineitem.filter(edgePred), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      val ed = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      ed.groupBy("src")
        .agg(collect_set(col("dst")).as("nbrs"))
        .select(col("src"), col("nbrs"), size(col("nbrs")).cast("long").as("outdeg"))
        .persist()
    }
    def stateSideP(state: org.apache.spark.sql.DataFrame, rows: Long) =
      if (rows <= 1000000L) broadcast(state) else state
    def bfsStepOld(adj: org.apache.spark.sql.DataFrame, dist: org.apache.spark.sql.DataFrame, nV: Long) =
      adj.join(stateSideP(dist, nV), col("src") === col("node"))
        .select(explode(col("nbrs")).as("node"), (col("d") + 1).as("d"))
        .unionByName(dist)
        .groupBy("node").agg(min("d").cast("long").as("d"))
    def bfsOld() = {
      val adj = adjacencyOld(lit(true))
      val nV = adj.count()
      var dist = adj.select(col("src").as("node"))
        .filter(pmod(col("node"), lit(200L)) === 0)
        .withColumn("d", lit(0L))
      for (_ <- 1 to 3) dist = bfsStepOld(adj, dist, nV)
      graft.queries.CacheScope.sealResult(
        dist.groupBy(col("d").as("dist"))
          .agg(count(lit(1)).cast("long").as("n_nodes"),
            min("node").cast("long").as("min_node"),
            sum("node").cast("long").as("sum_nodes")),
        adj)
    }
    def reg(n: String) = graft.SparkEntry.queries(n)(spark, dir)
    println("kcore equal: " + sameResult(reg("g_kcore"), kcoreOld()))
    println("bfs equal: " + sameResult(reg("g_bfs"), bfsOld()))
    spark.sharedState.cacheManager.clearCache()
    time(spark, "kcore_old")(kcoreOld())
    time(spark, "kcore_new")(reg("g_kcore"))
    time(spark, "bfs_old")(bfsOld())
    time(spark, "bfs_new")(reg("g_bfs"))
    time(spark, "kcore_old_2")(kcoreOld())
    time(spark, "kcore_new_2")(reg("g_kcore"))
    spark.stop()
  }
}
