package graft

import graft.pipeline.WalletFeatures
import org.apache.spark.sql.functions._

/** Hand-computed goldens for the wallet-features program
  * (ethereum_wallet_features.sql:14-327): running balances over the
  * reference's order chain (timestamp, priority, type-index, role), the
  * WALLET-WIDE hash_rank dedup, the as-of price join asymmetry (a future
  * price may be nearest), clamp/cap placement (negatives → 0 per contract;
  * the 700000 cap ONLY on MAX(total_balance_in_eth)), and the contracts
  * map including the :272 min-in-the-max-slot quirk. */
class WalletFeaturesSpec extends SparkSpec {
  import spark.implicits._

  // (wallet, role, hash, amount, fee, ts, type, priority, contract)
  private def walletTx(rows: (String, String, String, Double, Double, Long, String, Int, String)*) =
    rows.toDF("wallet_address", "role", "transaction_hash", "amount", "tx_fee",
      "block_timestamp", "transaction_type", "priority", "contract_address")
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))

  // same + an explicit transaction_index (the 'normal' order key)
  private def walletTxIdx(rows: (String, String, String, Double, Double, Long, String, Int, String, Long)*) =
    rows.toDF("wallet_address", "role", "transaction_hash", "amount", "tx_fee",
      "block_timestamp", "transaction_type", "priority", "contract_address",
      "transaction_index")
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))

  test("running balances and wallet rollup match hand-computed reference goldens") {
    // w1 on ETH (unpriced run -> ETH values at price 1):
    // receive 10 @100; send 3 fee 0.1 @200; receive 2 @300 -> path 10, 6.9, 8.9
    val tx = walletTx(
      ("0xw1", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw1", "sender", "h2", 3.0, 0.1, 200L, "normal", 1, "ETH"),
      ("0xw1", "receiver", "h3", 2.0, 0.0, 300L, "normal", 1, "ETH"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Double]("wallet_total_balance_eth_only") == 8.9)
    assert(f.getAs[Double]("wallet_total_balance_in_eth_and_erc20") == 8.9)
    assert(f.getAs[Double]("wallet_max_eth_ever") == 10.0)
    assert(f.getAs[Double]("wallet_min_eth_ever") == 6.9)
    assert(f.getAs[Long]("wallet_total_incoming_tx") == 2)
    assert(f.getAs[Long]("wallet_total_outgoing_tx") == 1)
    assert(f.getAs[Long]("wallet_net_incoming_tx") == 1)
    assert(f.getAs[Double]("wallet_incoming_transactions_sum") == 12.0)
    assert(f.getAs[Double]("wallet_outgoing_transactions_sum") == 3.0)
    assert(f.getAs[Double]("wallet_incoming_transactions_mean") == 12.0) // per contract row
    assert(math.abs(f.getAs[Double]("misc_total_fees_eth") - 0.1) < 1e-12)
    assert(math.abs(f.getAs[Double]("misc_avg_total_fees_eth") - 0.1) < 1e-12)
    assert(f.getAs[Long]("number_of_contracts") == 1)
    assert(f.getAs[Long]("wallet_first_tx") == 100L && f.getAs[Long]("wallet_last_tx") == 300L)
    assert(f.getAs[String]("address_partition") == "w1")
  }

  test("same-timestamp ties: receiver ordered before sender (balance never dips)") {
    val tx = walletTx(
      ("0xw2", "receiver", "ha", 5.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw2", "sender", "hb", 3.0, 0.0, 100L, "normal", 1, "ETH"))
    val e = WalletFeatures.enriched(tx)
      .orderBy("row_num").select("balance").as[Double].collect()
    assert(e.toSeq == Seq(5.0, 2.0))
  }

  test("tie-break order: type-index beats role (ethereum_wallet_features.sql:17-26)") {
    // Same timestamp+priority, mixed roles across transactions: the
    // internal row (type-index 999) sorts AFTER the normal row (index 5)
    // even though it is the receiver — so the path is -3 then +7, and the
    // max-ever is 7, NOT the 10 a role-first order would produce.
    val tx = walletTxIdx(
      ("0xw7", "sender", "ha", 3.0, 0.0, 100L, "normal", 1, "ETH", 5L),
      ("0xw7", "receiver", "hb", 10.0, 0.0, 100L, "internal", 1, "ETH", 0L))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Double]("wallet_max_eth_ever") == 7.0)
    assert(f.getAs[Double]("wallet_total_balance_eth_only") == 7.0)
  }

  test("hash_rank is wallet-wide: a hash spanning contracts counts once (:45)") {
    // ERC-20 case: one tx yields an ETH row (priority 1) and a token row
    // (priority 3) under the same hash. The token leg gets hash_rank 2, so
    // the token contract's counts exclude it.
    val tx = walletTx(
      ("0xw3", "receiver", "hx", 1.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw3", "receiver", "hx", 50.0, 0.0, 100L, "erc20", 3, "0xtok"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Long]("wallet_total_incoming_tx") == 1)
    val m = f.getAs[Map[String, Map[String, Double]]]("contracts_aggregations")
    assert(m("0xtok")("incoming_transactions_count") == 0.0)
    assert(m("0xtok")("transactions_count") == 0.0)
    assert(m("ETH")("transactions_count") == 1.0)
    // sums still cover every row: the token leg's value appears in its
    // contract's native balance
    assert(m("0xtok")("total_balance") == 50.0)
  }

  test("clamps: negative final balances report as 0; min stays positive") {
    // receive 1 @100, send 2 @200 -> path 1, -1: final -1 clamps to 0
    val tx = walletTx(
      ("0xw8", "receiver", "h1", 1.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw8", "sender", "h2", 2.0, 0.0, 200L, "normal", 1, "ETH"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Double]("wallet_total_balance_eth_only") == 0.0)
    assert(f.getAs[Double]("wallet_total_balance_in_eth_and_erc20") == 0.0)
    assert(f.getAs[Double]("wallet_min_eth_ever") == 1.0) // min POSITIVE ever
    assert(f.getAs[Double]("wallet_max_eth_ever") == 1.0)
  }

  test("the 700000 cap applies ONLY to MAX(total_balance_in_eth) (:286-289)") {
    val tx = walletTx(
      ("0xw4", "receiver", "hc", 800000.0, 0.0, 100L, "normal", 1, "ETH"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Double]("wallet_total_balance_in_eth_and_erc20") == 0.0) // capped
    assert(f.getAs[Double]("wallet_total_balance_eth_only") == 800000.0) // NOT capped
    assert(f.getAs[Double]("wallet_max_eth_ever") == 800000.0) // NOT capped
  }

  test("contracts map carries per-contract details, with the :272 min-in-max-slot quirk") {
    val tx = walletTx(
      ("0xw5", "receiver", "h1", 4.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw5", "receiver", "h2", 100.0, 0.0, 200L, "erc20", 3, "0xtok"))
    val f = WalletFeatures.walletFeatures(tx).head()
    assert(f.getAs[Long]("number_of_contracts") == 2)
    assert(f.getAs[Double]("wallet_total_balance_eth_only") == 4.0)
    val m = f.getAs[Map[String, Map[String, Double]]]("contracts_aggregations")
    assert(m.keySet == Set("ETH", "0xtok"))
    assert(m("ETH")("total_balance") == 4.0)
    assert(m("ETH")("incoming_transactions_count") == 1.0)
    // unpriced run: the token's eth-valued balance is 0, native is 100
    assert(m("0xtok")("total_balance") == 100.0)
    assert(m("0xtok")("total_balance_in_eth") == 0.0)
    // the quirk: the max slot repeats the MIN (reference :272)
    assert(m("ETH")("min_eth_balance_in_ever") == 4.0)
    assert(m("ETH")("max_eth_balance_in_ever") == 4.0)
  }

  test("as-of price asymmetry: a future price within the candidate set wins (:70-84)") {
    // tokf txs: receive 2.0 early on day 10, receive 1.0 on day 12.
    // Prices: day 5 @2.0 (past-eligible for both) and day 11 @4.0
    // (past-eligible only for the day-12 tx, but stage 2 drops the
    // past-only bound, so it is the NEAREST price for the day-10 tx too).
    val d = 86400000000L
    val tx = walletTx(
      ("0xw6", "receiver", "h1", 2.0, 0.0, 10 * d + 3600000000L, "erc20", 3, "tokf"),
      ("0xw6", "receiver", "h2", 1.0, 0.0, 12 * d + 1000L, "erc20", 3, "tokf"))
    val prices = Seq(
      ("tokf", 2.0, 5 * d), ("tokf", 4.0, 11 * d)).toDF("address", "price", "price_ts")
    val meta = Seq("tokf").toDF("contract_address_metadata")
    val f = WalletFeatures.walletFeatures(tx, Some(prices), Some(meta)).head()
    val m = f.getAs[Map[String, Map[String, Double]]]("contracts_aggregations")
    // day-10 tx valued at the FUTURE day-11 price (|1d-1h| < |5d+1h|):
    // 2*4 = 8; day-12 tx nearest is day 11: 1*4 = 4 -> total 12
    assert(m("tokf")("total_balance_in_eth") == 12.0)
    assert(m("tokf")("total_incoming_value_in_eth") == 12.0)
    assert(f.getAs[Double]("wallet_max_eth_ever") == 12.0)
  }

  test("7-day bound truncates the exact timestamp diff, not calendar days (:66,83)") {
    // Trino date_diff('day', price_ts, tx_ts) truncates the exact diff: a
    // price at 23:00 on day 0 vs a tx at 01:00 on day 8 is 7.08 days ->
    // "7 days" -> INCLUDED, even though the calendar-day difference is 8.
    // A second price sits 8.5 truncated days away -> excluded; if the
    // window were calendar-day arithmetic the near price would be dropped
    // (8 > 7) and the far one would decide, flipping the valuation.
    val d = 86400000000L
    val h = 3600000000L
    val tx = walletTx(
      ("0xw7", "receiver", "h1", 3.0, 0.0, 8 * d + 1 * h, "erc20", 3, "tokg"))
    val prices = Seq(
      ("tokg", 5.0, 0 * d + 23 * h),  // 7.08 truncated days before the tx
      ("tokg", 9.0, -1 * d + 12 * h)) // 8.54 truncated days before: out
      .toDF("address", "price", "price_ts")
    val meta = Seq("tokg").toDF("contract_address_metadata")
    val f = WalletFeatures.walletFeatures(tx, Some(prices), Some(meta)).head()
    val m = f.getAs[Map[String, Map[String, Double]]]("contracts_aggregations")
    assert(m("tokg")("total_balance_in_eth") == 15.0) // 3 * 5.0, not 3 * 9.0 or 0
  }

  test("AUC variant: balance-days area, time-in-positive, wallet maxes (with_auc:181-215)") {
    // +10 ETH held for 200 s, then emptied: area = 10 * 200 / 86400
    // balance-days, 200 s (2e8 µs) in positive
    val tx = walletTx(
      ("0xwA", "receiver", "h1", 10.0, 0.0, 100000000L, "normal", 1, "ETH"),
      ("0xwA", "sender", "h2", 10.0, 0.0, 300000000L, "normal", 1, "ETH"))
    val r = graft.pipeline.WalletFeatures.aucContractBalances(tx).head()
    assert(math.abs(r.getAs[Double]("total_auc_contract") - 10.0 * 200 / 86400.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("total_auc_eth") - 10.0 * 200 / 86400.0) < 1e-12)
    assert(r.getAs[Long]("total_time_in_ever_contract") == 200000000L)
    assert(r.getAs[Long]("total_time_in_ever_eth") == 200000000L)
    assert(r.getAs[Double]("total_balance_in_eth_by_contract") == 0.0)
  }

  test("-0.0 normalization: a round-trip to zero balance is +0.0") {
    val tx = walletTx(
      ("0xw9", "receiver", "h1", 1.5, 0.0, 100L, "normal", 1, "ETH"),
      ("0xw9", "sender", "h2", 1.5, 0.0, 200L, "normal", 1, "ETH"))
    val bal = WalletFeatures.enriched(tx).orderBy("row_num")
      .select("balance").as[Double].collect().last
    assert(bal == 0.0 && (1.0 / bal) > 0, s"expected +0.0, got $bal")
  }
}
