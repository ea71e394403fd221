package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    args.drop(1).foreach { q =>
      // warm once, then best of 3
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $q ${times.min}%.3f")
    }
    spark.stop()
  }
}
