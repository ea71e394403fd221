package graft

import graft.pipeline.WalletFeatures
import org.apache.spark.sql.functions._

/** Hand-computed goldens for the wallet-features program (SURVEY §7.2
  * slice 0): running balances over the deterministic order, the hash_rank
  * count-once/sum-all asymmetry, min-positive/max-ever, the contracts map,
  * and the outlier cap. */
class WalletFeaturesSpec extends SparkSpec {
  import spark.implicits._

  // (wallet, role, hash, amount, fee, ts, type, priority, contract)
  private def walletTx(rows: (String, String, String, Double, Double, Long, String, Int, String)*) =
    rows.toDF("wallet_address", "role", "transaction_hash", "amount", "tx_fee",
      "block_timestamp", "transaction_type", "priority", "contract_address")
      .withColumn("block_number", lit(1L))
      .withColumn("date_partition", lit("2024-01"))
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))

  test("running balance follows the deterministic order; features match hand-computed goldens") {
    // w1 on ETH: receive 10 @t1; send 3 fee 0.1 @t2; receive 2 @t3
    //   balances: 10, 6.9, 8.9
    val tx = walletTx(
      ("0xw1", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw1", "sender", "h2", 3.0, 0.1, 200L, "normal", 1, "ETH"),
      ("0xw1", "receiver", "h3", 2.0, 0.0, 300L, "normal", 1, "ETH"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Double]("eth_balance") == 8.9)
    assert(f.getAs[Double]("max_eth_ever") == 10.0)
    assert(f.getAs[Double]("min_eth_ever") == 6.9)
    assert(f.getAs[Long]("n_in") == 2 && f.getAs[Long]("n_out") == 1)
    assert(f.getAs[Double]("total_in") == 12.0 && f.getAs[Double]("total_out") == 3.0)
    assert(math.abs(f.getAs[Double]("total_fees") - 0.1) < 1e-12)
    assert(f.getAs[Double]("avg_in_value") == 6.0)
    assert(f.getAs[String]("address_partition") == "w1")
  }

  test("same-timestamp ties: receiver ordered before sender (balance never dips)") {
    // deposit and spend at the SAME timestamp: receiver-first ordering
    // (ethereum_wallet_features.sql role CASE) keeps the balance at 5 then 2
    val tx = walletTx(
      ("0xw2", "receiver", "ha", 5.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw2", "sender", "hb", 3.0, 0.0, 100L, "normal", 1, "ETH"))
    val e = WalletFeatures.enriched(tx)
      .orderBy("row_num").select("balance").as[Double].collect()
    assert(e.toSeq == Seq(5.0, 2.0))
  }

  test("hash_rank: a hash seen as normal+internal counts once but sums twice") {
    val tx = walletTx(
      ("0xw3", "receiver", "hx", 1.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw3", "receiver", "hx", 2.0, 0.0, 100L, "internal", 2, "ETH"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Long]("n_in") == 1) // counted once (hash_rank=1 only)
    assert(f.getAs[Double]("total_in") == 3.0) // summed across both rows
  }

  test("outlier cap: balances beyond 700000 report as 0") {
    val tx = walletTx(
      ("0xw4", "receiver", "hc", 800000.0, 0.0, 100L, "normal", 1, "ETH"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Double]("eth_balance") == 0.0)
    assert(f.getAs[Double]("max_eth_ever") == 800000.0) // cap applies to the balance, not max
  }

  test("contracts map carries per-contract details; ETH features ignore tokens") {
    val tx = walletTx(
      ("0xw5", "receiver", "h1", 4.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw5", "receiver", "h2", 100.0, 0.0, 200L, "erc20", 3, "0xtok"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Long]("n_contracts") == 2)
    assert(f.getAs[Double]("eth_balance") == 4.0) // token balance not mixed in
    val m = f.getAs[Map[String, Map[String, Double]]]("contracts_aggregations")
    assert(m.keySet == Set("ETH", "0xtok"))
    assert(m("0xtok")("final_balance") == 100.0)
    assert(m("ETH")("n_received") == 1.0)
  }

  test("-0.0 normalization: a round-trip to zero balance is +0.0") {
    val tx = walletTx(
      ("0xw6", "receiver", "h1", 1.5, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw6", "sender", "h2", 1.5, 0.0, 200L, "normal", 1, "ETH"))
    val bal = WalletFeatures.enriched(tx).orderBy("row_num")
      .select("balance").as[Double].collect().last
    assert(bal == 0.0 && (1.0 / bal) > 0, s"expected +0.0, got $bal") // +0.0, not -0.0
  }
}
