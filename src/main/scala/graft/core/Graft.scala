package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table-loading helpers shared by every entry point.
  *
  * The engine targets a multi-executor cluster; locally it runs `local[N]`.
  * Scale-relevant defaults (AQE, shuffle partitions sized to cores, UTC) are
  * set here so every query sees the same physical-planning environment.
  */
object Graft {

  /** Build a session tuned for the local harness but with cluster-honest
    * settings: AQE on (runtime re-plan + skew-join handling), broadcast
    * threshold left at default, shuffle partitions = cores (the harness
    * machine), UTC timezone for oracle parity.
    */
  def session(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions())
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // collect_set/collect_list/map-agg run as ObjectHashAggregate; the
      // default sort-based fallback kicks in at 128 in-memory groups,
      // turning every wide-key collect into a per-task sort of the whole
      // input. Lift it to 128k groups (bounded: buffers are the collected
      // sets themselves, which these queries bound by construction).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as long nanos and convert explicitly (the
      // DuckDB oracle truncates the same column to micros — parity is at
      // microsecond resolution via `ts div 1000`).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 256-bucket hive partitions are 2-hex-char strings ("07", "0a"):
      // without this, an all-digit sample infers IntegerType and rewrites
      // partition values ("07" -> 7), breaking partition-dir stability.
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      // Subset co-partitioning for joins: the features/serving tables are
      // bucketed on the wallet key alone while their MERGEs join on
      // (wallet, contract) — with this ON (the default) such a join
      // re-shuffles BOTH wallet-bucketed sides on the full key set. The
      // skew caveat the default guards against is handled the reference's
      // way (whale-wallet exclusion) + AQE skew-join on the plain paths.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The driver-provided synthetic tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one synthetic table from an sf directory. Plain parquet scan —
    * column pruning + predicate pushdown happen in the consumer's plan.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
