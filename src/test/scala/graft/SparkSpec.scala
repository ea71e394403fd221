package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — specs run in
  * the forked test JVM sequentially). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Shuffle exchanges in the EXECUTED (AQE-final) physical plan; with
    * `onKey`, only hash exchanges whose partitioning references that column
    * (the "did we re-shuffle on the bucket key" probe). Cached inputs count
    * as leaves — their interior exchanges ran once at cache time, not here. */
  def countShuffles(df: org.apache.spark.sql.DataFrame,
      onKey: Option[String] = None): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    df.collect() // force AQE to finalize the physical plan
    def hits(p: org.apache.spark.sql.execution.SparkPlan): Int = (p match {
      case s: ShuffleExchangeExec => onKey match {
        case None => 1
        case Some(k) => s.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
              if h.expressions.exists(_.references.exists(_.name == k)) => 1
          case _ => 0
        }
      }
      case _ => 0
    }) + p.children.map(hits).sum + p.subqueries.map(hits).sum + (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        hits(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => hits(s.plan)
      case _ => 0
    })
    hits(df.queryExecution.executedPlan)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // same optimizer extensions as Graft.session — PlanSpec pins depend
      // on IntDivPushdown deriving the raw-column watermark bound
      .withExtensions(new graft.plans.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // collect_set/collect_list/map-agg run as ObjectHashAggregate; the
      // default sort-based fallback kicks in at 128 in-memory groups,
      // turning every wide-key collect into a per-task sort of the whole
      // input. Lift it to 128k groups (bounded: buffers are the collected
      // sets themselves, which these queries bound by construction).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      // mirrors Graft.session: bucket-subset co-partitioned merge joins
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // match the engine sessions: no AQE partition coalescing (see Graft.session)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
