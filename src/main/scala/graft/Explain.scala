package graft
import org.apache.spark.sql.SparkSession
/** Local plan-inspection tool: prints the executed plan and a one-line
  * exchange/window/codegen census for each named query — the iteration loop
  * for keeping plans 100 TB-shaped (`.explain` + count the shuffles).
  *
  * Usage: runMain graft.Explain <sfDir> <query1,query2,...> [full]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val full = args.length > 2 && args(2) == "full"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(s: String, sub: String): Int = s.sliding(sub.length).count(_ == sub)
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      println(s"== $name: exchanges=${count(plan, "Exchange hashpartitioning")}" +
        s" broadcasts=${count(plan, "BroadcastExchange")}" +
        s" windows=${count(plan, "Window [")}" +
        s" sorts=${count(plan, "Sort [")}" +
        s" scans=${count(plan, "FileScan")}" +
        s" wholestage=${count(plan, "WholeStageCodegen")}")
      if (full) println(plan)
    }
    spark.stop()
  }
}
