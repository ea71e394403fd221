package graft

import graft.pipeline.CoinBalances
import org.apache.spark.sql.functions._

/** Goldens + faithful quirks for the coin-balances program
  * (ethereum_wallet_coin_balances.sql): RANGE-frame peer collapse, the
  * output-only negative clamp with has_negative_balance, the additive
  * incremental accumulate, and the reference's null-propagating min/max
  * merge for brand-new pairs. */
class CoinBalancesSpec extends SparkSpec {
  import spark.implicits._

  // (wallet, role, hash, amount, fee, ts, type, priority, contract)
  private def walletTx(rows: (String, String, String, Double, Double, Long, String, Int, String)*) =
    rows.toDF("wallet_address", "role", "transaction_hash", "amount", "tx_fee",
      "block_timestamp", "transaction_type", "priority", "contract_address")
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))

  test("full load golden: balances, min/max over ALL values, plain role counts") {
    val tx = walletTx(
      ("0xa1", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xa1", "sender", "h2", 3.0, 0.1, 200L, "normal", 1, "ETH"))
    val r = CoinBalances.fullLoad(tx).head()
    assert(r.getAs[Double]("total_balance") == 6.9)
    assert(r.getAs[Double]("min_balance_in_ever") == 6.9)
    assert(r.getAs[Double]("max_balance_in_ever") == 10.0)
    assert(r.getAs[Long]("incoming_transactions_count") == 1)
    assert(r.getAs[Long]("outgoing_transactions_count") == 1)
    assert(!r.getAs[Boolean]("has_negative_balance"))
    assert(r.getAs[Long]("first_transaction_timestamp") == 100L)
    assert(r.getAs[Long]("last_transaction_timestamp") == 200L)
  }

  test("self-transfer peers share the RANGE cumulative and DISTINCT collapses them (:22-27,:90)") {
    // sender + receiver legs at the same (ts, priority, index): both rows
    // see balance -0.1 (the frame includes ALL peers), the latest pick
    // matches both, and DISTINCT yields exactly one output row.
    val tx = walletTx(
      ("0xa2", "receiver", "hs", 5.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xa2", "sender", "hs", 5.0, 0.1, 100L, "normal", 1, "ETH"))
    val out = CoinBalances.fullLoad(tx).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("total_balance") == 0.0) // clamped output
    assert(r.getAs[Boolean]("has_negative_balance")) // sign preserved in the flag
    assert(r.getAs[Double]("min_balance_in_ever") == -0.1) // min NOT clamped
  }

  test("incremental accumulate ≡ full for the additive columns") {
    // NB the equivalence requires the NEW batch's own relative total to be
    // non-negative: the reference clamps the batch total before adding the
    // stored balance (:220-224,:264), so a net-negative batch diverges from
    // a full recompute — that clamp is pinned by the self-transfer test.
    val all = walletTx(
      ("0xa3", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xa3", "receiver", "h2", 5.0, 0.0, 200L, "normal", 1, "ETH"),
      ("0xa3", "sender", "h3", 2.0, 0.0, 300L, "normal", 1, "ETH"),
      ("0xa3", "receiver", "h4", 4.0, 0.0, 400L, "normal", 1, "ETH"))
    val state = CoinBalances.fullLoad(all.filter(col("block_timestamp") <= 250))
    val merged = CoinBalances.incremental(all, state).head()
    val full = CoinBalances.fullLoad(all).head()
    for (c <- Seq("total_balance", "total_incoming_value", "total_outgoing_value",
        "total_tx_fee", "first_transaction_timestamp", "last_transaction_timestamp"))
      assert(merged.getAs[Any](c) == full.getAs[Any](c), c)
    for (c <- Seq("incoming_transactions_count", "outgoing_transactions_count",
        "transactions_count"))
      assert(merged.getAs[Long](c) == full.getAs[Long](c), c)
  }

  test("brand-new pairs store NULL min/max — the reference's :265-272 CASE semantics") {
    val state = CoinBalances.fullLoad(walletTx(
      ("0xa4", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH")))
    val withNew = walletTx(
      ("0xa4", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xNEW", "receiver", "h2", 7.0, 0.0, 200L, "normal", 1, "ETH"))
    val out = CoinBalances.incremental(withNew, state)
    val newRow = out.filter(col("wallet_address") === "0xNEW").head()
    assert(newRow.isNullAt(newRow.fieldIndex("min_balance_in_ever")))
    assert(newRow.isNullAt(newRow.fieldIndex("max_balance_in_ever")))
    assert(newRow.getAs[Double]("total_balance") == 7.0)
    // the untouched stored wallet carries forward intact
    val oldRow = out.filter(col("wallet_address") === "0xa4").head()
    assert(oldRow.getAs[Double]("total_balance") == 10.0)
    assert(oldRow.getAs[Double]("min_balance_in_ever") == 10.0)
  }

  test("MERGE matched rows keep stored token_symbol and has_negative_balance (:297-310)") {
    val state = CoinBalances.fullLoad(walletTx(
      ("0xa5", "receiver", "h1", 3.0, 0.0, 100L, "normal", 1, "ETH"))
      .withColumn("token_symbol", lit("OLD_SYM")))
    val all = walletTx(
      ("0xa5", "receiver", "h1", 3.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xa5", "sender", "h2", 9.0, 0.0, 200L, "normal", 1, "ETH"))
      .withColumn("token_symbol", lit("NEW_SYM"))
    val merged = CoinBalances.incremental(all, state).head()
    assert(merged.getAs[String]("token_symbol") == "OLD_SYM") // not updated
    // the new batch alone is -9 -> clamped 0 with flag true, but MATCHED
    // rows do NOT update the flag: stored false persists
    assert(!merged.getAs[Boolean]("has_negative_balance"))
    // the new batch's own total (-9) clamps to 0 in ncb, then 0 + stored 3
    assert(merged.getAs[Double]("total_balance") == 3.0)
  }
}
