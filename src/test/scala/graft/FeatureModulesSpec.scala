package graft

import graft.pipeline.{Auc, RugpullFeatures, WalletFeatures}
import org.apache.spark.sql.functions._

/** Rugpull + AUC feature modules: golden values and the incremental ≡ full
  * invariants. */
class FeatureModulesSpec extends SparkSpec {
  import spark.implicits._

  // (wallet, role, hash, amount, fee, ts, type, priority, contract, is_rugpull)
  private def tx(rows: (String, String, String, Double, Double, Long, String, Int, String, Boolean)*) =
    rows.toDF("wallet_address", "role", "transaction_hash", "amount", "tx_fee",
      "block_timestamp", "transaction_type", "priority", "contract_address", "is_rugpull")
      .withColumn("block_number", lit(1L))
      .withColumn("date_partition", lit("2024-01"))
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))

  private val fixture = tx(
    ("0xw1", "sender", "h1", 5.0, 0.0, 100L, "normal", 1, "ETH", true),
    ("0xw1", "sender", "h2", 2.0e7, 0.0, 200L, "normal", 1, "ETH", true), // capped at 1.3e7
    ("0xw1", "receiver", "h3", 1.0, 0.0, 300L, "normal", 1, "ETH", true),
    ("0xw1", "sender", "h4", 9.0, 0.0, 400L, "normal", 1, "ETH", false), // not rugpull
    ("0xw2", "receiver", "h5", 3.0, 0.0, 150L, "normal", 1, "ETH", false))

  test("rugpull aggregates: filtered counts/sums with the POST-AGGREGATE 1.3e7 cap") {
    val agg = RugpullFeatures.aggregate(fixture)
    val w1 = agg.filter(col("wallet_address") === "0xw1").head()
    assert(w1.getAs[Long]("n_rugpull_sent") == 2)
    assert(w1.getAs[Long]("n_rugpull_received") == 1)
    // 5 + 2e7 sums uncapped to 20000005, then the aggregate caps at 1.3e7
    // (rugpull_features.sql:75 caps total_amount_chain, not each amount)
    assert(w1.getAs[Double]("rugpull_amount_sent") == 1.3e7)
    assert(w1.getAs[Long]("first_rugpull_ts") == 100L)
    assert(w1.getAs[Long]("last_rugpull_ts") == 300L)
    assert(w1.getAs[Long]("n_transactions") == 4)
    val w2 = agg.filter(col("wallet_address") === "0xw2").head()
    assert(w2.getAs[Long]("n_rugpull_sent") == 0 && w2.isNullAt(w2.fieldIndex("first_rugpull_ts")))
  }

  test("ten 2e6 sends cap at 1.3e7, not 2e7 — and the merge re-caps (:75,:169)") {
    val rows = (1 to 10).map(i =>
      ("0xwt", "sender", s"h$i", 2.0e6, 0.0, i * 100L, "normal", 1, "ETH", true))
    val agg = RugpullFeatures.aggregate(tx(rows: _*))
    assert(agg.head().getAs[Double]("rugpull_amount_sent") == 1.3e7)
    // split 6/4: old state stores the capped 1.2e7? no — 6 sends = 1.2e7
    // (under cap), new 4 sends = 8e6; accumulate 2e7 -> re-cap to 1.3e7
    val all = tx(rows: _*)
    val merged = RugpullFeatures.merge(
      RugpullFeatures.aggregate(all.filter(col("block_timestamp") > 600L)),
      RugpullFeatures.aggregate(all.filter(col("block_timestamp") <= 600L)))
    assert(merged.head().getAs[Double]("rugpull_amount_sent") == 1.3e7)
  }

  test("rugpull incremental merge ≡ full aggregate") {
    val cut = 250L
    val full = RugpullFeatures.aggregate(fixture)
    val merged = RugpullFeatures.merge(
      RugpullFeatures.aggregate(fixture.filter(col("block_timestamp") > cut)),
      RugpullFeatures.aggregate(fixture.filter(col("block_timestamp") <= cut)))
    val f = full.orderBy("wallet_address").collect().map(_.toSeq).toSeq
    val m = merged.orderBy("wallet_address").collect().map(_.toSeq).toSeq
    assert(f == m)
  }

  test("AUC time-weighted: hand-computed area under the balance curve") {
    // balances: +10 @100 ... (gap 200s) ... -10 @300 -> 0 (no further events)
    val rows = tx(
      ("0xa", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH", false),
      ("0xa", "sender", "h2", 10.0, 0.0, 300L, "normal", 1, "ETH", false))
    val out = Auc.timeWeighted(WalletFeatures.enriched(rows)).head()
    assert(math.abs(out.getAs[Double]("auc_balance_days") - 10.0 * 200 / 86400.0) < 1e-12)
    assert(out.getAs[Long]("sec_in_positive") == 200L)
    assert(out.getAs[Double]("peak_balance") == 10.0)
    assert(out.getAs[Double]("final_balance") == 0.0)
  }

  test("AUC incremental stitch ≡ full recompute") {
    val rows = tx(
      ("0xa", "receiver", "h1", 10.0, 0.0, 100L, "normal", 1, "ETH", false),
      ("0xa", "sender", "h2", 4.0, 0.0, 300L, "normal", 1, "ETH", false),
      ("0xa", "receiver", "h3", 1.0, 0.0, 700L, "normal", 1, "ETH", false),
      ("0xa", "sender", "h4", 7.0, 0.0, 900L, "normal", 1, "ETH", false))
    val full = Auc.timeWeighted(WalletFeatures.enriched(rows)).head()

    val cut = 400L
    val prev = Auc.timeWeighted(
      WalletFeatures.enriched(rows.filter(col("block_timestamp") <= cut)))
    // continue the new batch's balances from the stored final balance
    val newEnriched = WalletFeatures.enriched(rows.filter(col("block_timestamp") > cut))
      .join(prev.select(col("wallet_address"), col("contract_address"),
        col("final_balance").as("carry")), Seq("wallet_address", "contract_address"), "left_outer")
      .withColumn("balance", col("balance") + coalesce(col("carry"), lit(0.0)))
      .drop("carry")
    val stitched = Auc.stitch(prev, newEnriched).head()

    assert(math.abs(stitched.getAs[Double]("auc_balance_days")
      - full.getAs[Double]("auc_balance_days")) < 1e-12)
    assert(stitched.getAs[Long]("sec_in_positive") == full.getAs[Long]("sec_in_positive"))
    assert(stitched.getAs[Double]("peak_balance") == full.getAs[Double]("peak_balance"))
    assert(stitched.getAs[Double]("final_balance") == full.getAs[Double]("final_balance"))
    assert(stitched.getAs[Long]("last_ts") == full.getAs[Long]("last_ts"))
  }
}
