package graft

import graft.pipeline.WalletFeatures
import org.apache.spark.sql.functions._

/** The :331-833 incremental MERGE: only-new rows + the contracts-map state
  * read-back reproduce the full-load features — continuing wallets stitch
  * balances/min/max/counts, untouched contracts carry forward through the
  * anti-join UNION, untouched wallets survive the MERGE byte-for-byte. */
class WalletFeaturesIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def walletTx(rows: (String, String, String, Double, Double, Long, String, Int, String)*) =
    rows.toDF("wallet_address", "role", "transaction_hash", "amount", "tx_fee",
      "block_timestamp", "transaction_type", "priority", "contract_address")
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))

  private val all = walletTx(
    ("0xa", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH"),
    ("0xa", "sender", "h2", 2.0, 0.01, 200L, "normal", 1, "ETH"),
    ("0xa", "receiver", "h3", 7.0, 0.0, 150L, "erc20", 3, "0xtok"),
    ("0xb", "receiver", "h4", 5.0, 0.0, 120L, "normal", 1, "ETH"),
    // ---- the incremental batch (ts > 250) ----
    ("0xa", "receiver", "h5", 4.0, 0.0, 300L, "normal", 1, "ETH"),
    ("0xa", "receiver", "h6", 1.0, 0.0, 350L, "erc20", 3, "0xtok"),
    ("0xb", "sender", "h7", 1.0, 0.0, 320L, "normal", 1, "ETH"))

  private val cut = 250L

  test("incremental ≡ full: stitched balances, merged min/max, accumulated counts") {
    // Strict equality holds for single-contract wallets with their price
    // rows present. (Multi-contract wallets diverge BY REFERENCE DESIGN:
    // the stored wallet-level balance is MAX over per-contract snapshot
    // rows, and :507 values unpriced receives at 0 — see the
    // incrementalUpdates scaladoc; the multi-contract path is covered by
    // the carry-forward test below.)
    val single = walletTx(
      ("0xa", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH"),
      ("0xa", "sender", "h2", 2.0, 0.01, 200L, "normal", 1, "ETH"),
      ("0xb", "receiver", "h4", 5.0, 0.0, 120L, "normal", 1, "ETH"),
      ("0xa", "receiver", "h5", 4.0, 0.0, 300L, "normal", 1, "ETH"),
      ("0xb", "sender", "h7", 1.0, 0.0, 320L, "normal", 1, "ETH"))
    val prices = Seq(("ETH", 123.0, 0L)).toDF("address", "price", "price_ts")
    val state = WalletFeatures.walletFeatures(
      single.filter(col("block_timestamp") <= cut), Some(prices))
    val merged = WalletFeatures.incremental(
      single.filter(col("block_timestamp") > cut), state, Some(prices))
    val full = WalletFeatures.walletFeatures(single, Some(prices))

    val scalarCols = full.columns.filterNot(_ == "contracts_aggregations").toSeq
    val m = merged.select(scalarCols.map(col): _*)
    val f = full.select(scalarCols.map(col): _*)
    assert(m.exceptAll(f).isEmpty && f.exceptAll(m).isEmpty,
      s"full:\n${f.orderBy("wallet_address").collect().mkString("\n")}\n" +
        s"merged:\n${m.orderBy("wallet_address").collect().mkString("\n")}")

    val fullMaps = full.select("wallet_address", "contracts_aggregations")
      .collect().map(r => r.getString(0) -> r.getAs[Map[String, Map[String, Double]]](1)).toMap
    val mergedMaps = merged.select("wallet_address", "contracts_aggregations")
      .collect().map(r => r.getString(0) -> r.getAs[Map[String, Map[String, Double]]](1)).toMap
    assert(fullMaps == mergedMaps)
  }

  test("untouched contracts carry forward through the anti-join UNION (:656-688)") {
    val state = WalletFeatures.walletFeatures(all.filter(col("block_timestamp") <= cut))
    // a batch touching ONLY 0xa's ETH contract
    val batch = walletTx(("0xa", "receiver", "h9", 4.0, 0.0, 300L, "normal", 1, "ETH"))
    val updates = WalletFeatures.incrementalUpdates(batch, state)
    val a = updates.filter(col("wallet_address") === "0xa").head()
    assert(a.getAs[Long]("number_of_contracts") == 2)
    val maps = a.getAs[Map[String, Map[String, Double]]]("contracts_aggregations")
    val storedTok = state.filter(col("wallet_address") === "0xa").head()
      .getAs[Map[String, Map[String, Double]]]("contracts_aggregations")("0xtok")
    assert(maps("0xtok") == storedTok) // untouched contract == stored entry
    assert(maps("ETH")("total_balance") == 10.0 - 2.0 - 0.01 + 4.0)
  }

  test("untouched wallets survive applyMerge unchanged; updates only cover active wallets") {
    val state = WalletFeatures.walletFeatures(all.filter(col("block_timestamp") <= cut))
    val batch = walletTx(("0xa", "receiver", "h9", 4.0, 0.0, 300L, "normal", 1, "ETH"))
    val updates = WalletFeatures.incrementalUpdates(batch, state)
    assert(updates.select("wallet_address").as[String].collect().toSet == Set("0xa"))
    val merged = WalletFeatures.incremental(batch, state)
    val scalarCols = state.columns.filterNot(_ == "contracts_aggregations").toSeq
    val before = state.filter(col("wallet_address") === "0xb").select(scalarCols.map(col): _*)
    val after = merged.filter(col("wallet_address") === "0xb").select(scalarCols.map(col): _*)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("brand-new wallet in a batch: min-ever pins at 0 — the :503/:516 COALESCE semantics") {
    // The reference coalesces missing state to 0 BEFORE its min/max merge
    // CASEs, so a wallet first seen incrementally stores min_eth_ever = 0
    // even though a full recompute reports its positive minimum. Faithful
    // divergence, pinned here.
    val prices = Seq(("ETH", 123.0, 0L)).toDF("address", "price", "price_ts")
    val state = WalletFeatures.walletFeatures(
      walletTx(("0xold", "receiver", "h1", 5.0, 0.0, 100L, "normal", 1, "ETH")), Some(prices))
    val batch = walletTx(("0xnew", "receiver", "h2", 4.0, 0.0, 300L, "normal", 1, "ETH"))
    val newRow = WalletFeatures.incrementalUpdates(batch, state, Some(prices))
      .filter(col("wallet_address") === "0xnew").head()
    assert(newRow.getAs[Double]("wallet_min_eth_ever") == 0.0) // NOT 4.0
    assert(newRow.getAs[Double]("wallet_max_eth_ever") == 4.0)
    assert(newRow.getAs[Double]("wallet_total_balance_eth_only") == 4.0)
  }

  test("excluded mega-wallets never enter the incremental batch (:381-390)") {
    val state = WalletFeatures.walletFeatures(all.filter(col("block_timestamp") <= cut))
    val mega = WalletFeatures.ExcludedWallets.head
    val batch = walletTx((mega, "receiver", "hX", 9.0, 0.0, 300L, "normal", 1, "ETH"))
    assert(WalletFeatures.incrementalUpdates(batch, state).isEmpty)
  }
}
