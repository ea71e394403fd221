package graft

/** Local timing harness for optimization A/Bs: mirrors graft.Bench's
  * session EXACTLY (a timing from a differently-configured session is
  * not evidence about the bench), then applies any `SPARK_GRAFT_CONF`
  * overrides (semicolon-separated k=v pairs) so a candidate config can
  * be A/B'd without editing Bench. Prints best-of-3 warm times per query
  * — the bench's single-shot cold time is noisier, but a config/plan
  * change that moves the warm minimum moves the bench the same way.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // AQE SMJ->SHJ conversion by RUNTIME size (guide §3.1): the static
      // preferSortMergeJoin=false above only fires when Catalyst's
      // ESTIMATES satisfy the size conditions, and cached-relation
      // estimates are array-inflated (a cached |V|-row adjacency prints
      // as TiB), so the heavy iterative queries still planned sort-merge.
      // With this threshold AQE re-plans those joins from the MEASURED
      // per-partition map output instead — the scale-adaptive guard: a
      // partition over 128 MB keeps its sort legs. Local slots hold 24g/32
      // = 750 MB, a cluster sizes executor memory per core above it (or
      // lowers the threshold). r19 A/B, both run orders: g_modularity
      // 3.0->2.5 s, flagship_contract_map 2.9->1.7/1.9 s, g_bfs/g_lpa/
      // g_basket_lift ~1.1-1.2x, g_jaccard/d_source_overlap flat.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "134217728")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b = b.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench: footer/page-cache touch + codegen warm
    graft.core.Graft.tableNames.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    args.drop(1).foreach { q =>
      // warm once, then best of 3; drop any cache the query leaves behind
      // between runs so each timed run re-executes its full plan
      def run1(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        run1()
        val times = (1 to 3).map { _ =>
          spark.sharedState.cacheManager.clearCache()
          run1()
        }
        println(f"TIME $q ${times.min}%.3f")
      } catch { case e: Throwable =>
        println(s"TIME $q FAILED ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.next().take(200))
      }
    }
    spark.stop()
  }
}
