package graft.tools

import graft.core.Graft
import graft.pipeline.WalletFeatures
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off: quantify what a whale wallet does to the (unsplittable)
  * window path of the flagship program, and what the reference's
  * exclusion guard buys back. Prints seconds for:
  *  - uniform:  nWallets × rowsEach rows, no skew
  *  - whale:    the same plus ONE wallet carrying `whaleRows`
  *  - guarded:  the whale input with ExcludedWallets-style exclusion
  *
  * Windows cannot be split by AQE (unlike joins — SkewSpec proves the
  * join path splits), so `whale` is expected to degrade toward the one
  * straggler task and `guarded` to recover `uniform`'s time. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nWallets = args.headOption.map(_.toInt).getOrElse(3000)
    val rowsEach = 200
    val whaleRows = args.lift(1).map(_.toInt).getOrElse(600000)
    val spark = Graft.session()
    import spark.implicits._

    def tx(whale: Long): DataFrame = {
      val normal = spark.range(nWallets.toLong * rowsEach).select(
        concat(lit("0xw"), format_string("%05d", col("id") % nWallets)).as("wallet_address"),
        col("id"))
      val w = spark.range(whale).select(lit("0xwhale").as("wallet_address"), col("id"))
      normal.unionByName(w).select(
        col("wallet_address"),
        md5(concat(col("wallet_address"), col("id"))).as("transaction_hash"),
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
    }

    def time(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-8s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val uniform = tx(0).persist(); uniform.count()
    val whale = tx(whaleRows).persist(); whale.count()
    // untimed warmup so codegen/JIT isn't billed to whichever runs first
    WalletFeatures.walletFeatures(uniform.limit(50000), dayUnit = 86400L)
      .write.format("noop").mode("overwrite").save()
    time("uniform", WalletFeatures.walletFeatures(uniform, dayUnit = 86400L))
    time("whale", WalletFeatures.walletFeatures(whale, dayUnit = 86400L))
    time("guarded", WalletFeatures.walletFeatures(
      whale.filter(col("wallet_address") =!= "0xwhale"), dayUnit = 86400L))
    spark.stop()
  }
}
