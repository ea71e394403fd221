package graft.tools

import graft.core.{Graft, Lakehouse}
import graft.pipeline.WalletFeatures
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off: quantify what the catalog-bucketed fact buys the feature
  * programs — the same wallet-tx frame written plain-partitioned vs
  * bucketed on wallet_address, the flagship program timed over each.
  * The plain read pays the wallet repartition per run; the bucketed scan
  * starts clustered (zero exchanges, DomainPipelineSpec proves the plan),
  * so the delta is the per-run shuffle the write-time bucketing amortizes
  * away. On a real cluster the shuffle is network-bound, so the saving
  * grows with scale; local[32] shows the lower bound. */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val nWallets = args.headOption.map(_.toInt).getOrElse(3000)
    val rowsEach = args.lift(1).map(_.toInt).getOrElse(400)
    val spark = Graft.session()

    val tx: DataFrame = spark.range(nWallets.toLong * rowsEach).select(
      concat(lit("0xw"), format_string("%05d", col("id") % nWallets)).as("wallet_address"),
      md5(col("id").cast("string")).as("transaction_hash"),
      when(pmod(col("id"), lit(2)) === 0, "sender").otherwise("receiver").as("role"),
      concat(lit("0xc"), col("id") % 5).as("contract_address"),
      (col("id") % 100000).as("block_number"),
      lit("normal").as("transaction_type"),
      lit(0L).as("transaction_index"),
      (lit(1704067200L) + col("id") % 864000).as("block_timestamp"),
      lit(1).as("priority"),
      (pmod(col("id"), lit(97)).cast("double") / 10.0).as("amount"),
      lit(0.001).as("tx_fee"),
      substring(md5(col("wallet_address")), 1, 2).as("address_partition"))

    val base = java.nio.file.Files.createTempDirectory("bucketbench").toString
    val plainPath = s"$base/plain"
    tx.write.mode("overwrite").parquet(plainPath)
    Lakehouse.ctasBucketed(tx, "bb_fact", "wallet_address", 32,
      sortCols = Seq("block_timestamp", "priority"), path = Some(s"$base/bucketed"))

    def time(name: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-10s $s%.1f s")
      s
    }
    // warmup (codegen/JIT) on a slice, untimed
    WalletFeatures.walletFeatures(spark.read.parquet(plainPath).limit(50000),
      dayUnit = 86400L).write.format("noop").mode("overwrite").save()
    // interleave to cancel host drift
    val reps = 3
    val plainSecs = Array.ofDim[Double](reps)
    val bucketSecs = Array.ofDim[Double](reps)
    for (i <- 0 until reps) {
      plainSecs(i) = time(s"plain#$i",
        WalletFeatures.walletFeatures(spark.read.parquet(plainPath), dayUnit = 86400L))
      bucketSecs(i) = time(s"bucketed#$i",
        WalletFeatures.walletFeatures(spark.table("bb_fact"), dayUnit = 86400L))
    }
    println(f"PLAIN_MIN=${plainSecs.min}%.1f BUCKETED_MIN=${bucketSecs.min}%.1f")
    spark.sql("DROP TABLE IF EXISTS bb_fact")
    spark.stop()
  }
}
