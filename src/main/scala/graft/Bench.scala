package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup (untimed): touch every table once (footer reads + OS page
    // cache) and run one small query so JIT/codegen warmup isn't billed to
    // whichever query happens to iterate first.
    graft.core.Graft.tableNames.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // one small + one heavy representative: the flagship pipeline's
    // generated stages populate the codegen cache, so the measured runs of
    // the wallet-program family bill their work, not compiler warmup
    Seq("q1_agg", "flagship_priced_features").foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes EVERY output column (count() would let
      // Catalyst prune projection-only work, under-reporting the query).
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      // a failing query must NOT look like a fast success: sentinel -1
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // 3-decimal values keep the line short (~2.0 KB for ~80 queries) so the
    // driver's bounded tail capture holds the WHOLE line (full-precision
    // doubles pushed it past the capture window and truncated the front,
    // leaving unparseable JSON); the totals fields lead the object so even
    // a clipped capture still shows them.
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
