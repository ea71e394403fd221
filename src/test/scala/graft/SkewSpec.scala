package graft

import graft.pipeline.WalletFeatures
import org.apache.spark.sql.functions._

/** Skew behavior under a whale wallet — the two paths a hot key takes:
  *
  *  - JOINS: AQE's OptimizeSkewedJoin splits the whale's shuffle partition
  *    into parallel sub-tasks (asserted on the physical plan here, with
  *    the size thresholds lowered to make test-sized data "skewed").
  *  - WINDOWS: a window partition cannot be split — the reference's own
  *    contract is the hand-excluded >20M-tx exchange wallets
  *    ([[WalletFeatures.ExcludedWallets]], ethereum_wallet_features.sql:
  *    381-390), which the incremental path applies; this spec pins that
  *    results stay CORRECT under the whale either way (skew costs time,
  *    never rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** wallet-tx-shaped frame: `nWallets` wallets × `rowsEach`, plus one
    * whale wallet carrying `whaleRows`. */
  private def skewedTx(nWallets: Int, rowsEach: Int, whaleRows: Int) = {
    val normal = spark.range(nWallets.toLong * rowsEach).select(
      concat(lit("0xw"), format_string("%04d", col("id") % nWallets)).as("wallet_address"),
      col("id"))
    val whale = spark.range(whaleRows).select(lit("0xwhale").as("wallet_address"), col("id"))
    normal.unionByName(whale).select(
      col("wallet_address"),
      concat(lit("h"), col("id")).as("transaction_hash"),
      when(pmod(col("id"), lit(2)) === 0, "sender").otherwise("receiver").as("role"),
      lit("ETH").as("contract_address"),
      (col("id") % 1000).as("block_number"),
      lit("normal").as("transaction_type"),
      lit(0L).as("transaction_index"),
      (lit(1704067200L) + col("id") % 86400).as("block_timestamp"),
      lit(1).as("priority"),
      (pmod(col("id"), lit(97)).cast("double") / 10.0).as("amount"),
      lit(0.001).as("tx_fee"),
      substring(md5(col("wallet_address")), 1, 2).as("address_partition"))
  }

  test("AQE splits the whale's join partition (skew=true in the executed plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // test-sized "skew": whale partition > 16KB and > 2x median
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try {
      val tx = skewedTx(nWallets = 40, rowsEach = 40, whaleRows = 40000)
        // incompressible per-row payload so the whale's shuffle partition
        // is measurably big at test scale
        .withColumn("pad", md5(concat(col("transaction_hash"), col("wallet_address"))))
      // the dim must be a MATERIALIZED table: OptimizeSkewedJoin pattern-
      // matches SMJ(Sort(shuffle), Sort(shuffle)) — a partial aggregate
      // sitting between the shuffle and the join on one side defeats the
      // split. Lake dims ARE materialized tables, so the production join
      // shape is the splittable one; this is also the reason to persist a
      // dim before joining it against a skewed fact.
      val dimPath = tmpDir("skew-dim")
      tx.groupBy("wallet_address")
        .agg(count(lit(1)).as("n_tx"), sum("amount").as("total"))
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
      val joined = tx.join(dim, "wallet_address")
        .select(col("wallet_address"), col("amount"), col("pad"), col("n_tx"))
      // execute THIS df (not a derived count plan) so AQE finalizes the
      // physical plan we inspect
      val n = joined.collect().length
      assert(n == 40 * 40 + 40000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the whale partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("flagship rollup is row-correct under the whale; exclusion guard drops it") {
    val tx = skewedTx(nWallets = 20, rowsEach = 30, whaleRows = 3000)
    val feats = WalletFeatures.walletFeatures(tx, dayUnit = 86400L)
    assert(feats.count() == 21) // 20 wallets + whale
    val whale = feats.filter(col("wallet_address") === "0xwhale").head()
    assert(whale.getAs[Long]("wallet_total_incoming_tx") == 1500L)
    assert(whale.getAs[Long]("wallet_total_outgoing_tx") == 1500L)
    // the reference's skew contract on the (unsplittable) window path:
    // known mega-wallets are excluded up front
    val guarded = tx.filter(!col("wallet_address")
      .isin(WalletFeatures.ExcludedWallets :+ "0xwhale": _*))
    assert(WalletFeatures.walletFeatures(guarded, dayUnit = 86400L).count() == 20)
  }
}
