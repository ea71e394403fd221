package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core feature program — ethereum_wallet_features.sql:14-327
  * (SURVEY §7.2 "slice 0", the densest semantics in the system) — over
  * wallet_transactions rows carrying a `contract_address` ('ETH' for
  * normal/internal value flow, the token address for ERC-20).
  *
  * Stages, with the reference's exact ordering/dedup subtleties:
  *  - W1 deterministic event order per (wallet, contract): timestamp,
  *    priority, receiver-before-sender, hash — ties broken all the way so
  *    the running balance is reproducible (§7.4 #1);
  *  - W2 hash_rank: a hash appearing under several transaction types counts
  *    ONCE (rank-1 rows) while sums cover every row (§7.4 #2);
  *  - W3 signed running balance over the W1 order with a ROWS frame
  *    (receiver +amount, sender -(amount+fee)), ROUND(...,5) with the
  *    -0.0→0.0 normalization (:102-107);
  *  - W5 min-positive-ever / W4 whole-partition totals;
  *  - W6 latest-row pick for the final balance;
  *  - A3 per-contract metric maps collected into a wallet-level map;
  *  - A2 wallet rollup with the reference's outlier cap (balance >700000
  *    → 0, :286-289) and guarded division (:307-310).
  *
  * Scale: one shuffle on (wallet_address, contract_address) drives every
  * window; the wallet rollup re-shuffles only the per-contract summary
  * rows (tiny). The address_partition column rides along so the physical
  * layout can bucket by it, as the reference does.
  */
object WalletFeatures {

  private val roleOrder = when(col("role") === "receiver", 0).otherwise(1)

  /** Per-(wallet, contract) event-level enrichment: order, hash dedup rank,
    * running balance. */
  def enriched(walletTx: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("wallet_address", "contract_address")
      .orderBy(col("block_timestamp"), col("priority"), roleOrder, col("transaction_hash"))
    val wHash = Window.partitionBy("wallet_address", "contract_address", "transaction_hash")
      .orderBy(col("priority"))
    val signed = when(col("role") === "receiver", col("amount"))
      .otherwise(-col("amount") - col("tx_fee"))
    val rawBal = sum(signed.cast("decimal(38,6)"))
      .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      .cast("double")
    val rounded = round(rawBal, 5)
    walletTx
      .withColumn("row_num", row_number().over(wOrd))
      .withColumn("hash_rank", dense_rank().over(wHash))
      // ROUND(...,5) then -0.0 -> 0.0, exactly the reference's normalization
      .withColumn("balance", when(rounded === 0, lit(0.0)).otherwise(rounded))
  }

  /** Per-(wallet, contract) summary — balances AND flow aggregates in ONE
    * unordered window pass over the enriched rows (last row = row_num ==
    * partition count). Fusing them matters: a separate groupBy branch
    * would consume `enrichedTx` twice, re-running the whole window
    * pipeline (no subtree reuse without caching) plus an extra
    * exchange+join — measured ~2× on the flagship program.
    *
    * Counts keep the hash_rank asymmetry: only rank-1 rows count, all
    * rows sum. */
  def perContract(enrichedTx: DataFrame): DataFrame = {
    val w = Window.partitionBy("wallet_address", "contract_address")
    // All window columns in ONE select: chained withColumn(over(w)) plans a
    // separate Window operator per column (each re-buffering every
    // partition); a single projection collapses them into one Window node.
    enrichedTx
      .select(col("*"),
        count(lit(1)).over(w).as("n_rows"),
        coalesce(min(when(col("balance") > 0, col("balance"))).over(w), lit(0.0))
          .as("min_positive_balance"),
        max(col("balance")).over(w).as("max_balance"),
        count(when(col("role") === "receiver" && col("hash_rank") === 1, lit(1))).over(w)
          .as("n_received"),
        count(when(col("role") === "sender" && col("hash_rank") === 1, lit(1))).over(w)
          .as("n_sent"),
        sum(when(col("role") === "receiver", col("amount")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).over(w).cast("double").as("total_received"),
        sum(when(col("role") === "sender", col("amount")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).over(w).cast("double").as("total_sent"),
        sum(col("tx_fee").cast("decimal(38,6)")).over(w).cast("double").as("total_fees"),
        min("block_timestamp").over(w).as("first_tx_ts"),
        max("block_timestamp").over(w).as("last_tx_ts"))
      .filter(col("row_num") === col("n_rows"))
      .select(
        col("wallet_address"), col("address_partition"), col("contract_address"),
        col("balance").as("final_balance"),
        col("min_positive_balance"), col("max_balance"),
        col("n_received"), col("n_sent"), col("total_received"), col("total_sent"),
        col("total_fees"), col("first_tx_ts"), col("last_tx_ts"))
  }

  /** The wallet-level feature row: ETH-specific features pulled out of the
    * per-contract summaries, the contracts map (A3), the outlier cap and
    * the guarded division (A2). */
  def walletFeatures(walletTx: DataFrame): DataFrame = {
    val summary = perContract(enriched(walletTx))

    val capped = when(col("final_balance") > 700000, lit(0.0))
      .otherwise(col("final_balance"))
    val withDetails = summary.withColumn("contract_details", map(
      lit("final_balance"), capped,
      lit("min_positive_balance"), col("min_positive_balance"),
      lit("max_balance"), col("max_balance"),
      lit("n_received"), col("n_received").cast("double"),
      lit("n_sent"), col("n_sent").cast("double"),
      lit("total_received"), col("total_received"),
      lit("total_sent"), col("total_sent")))

    withDetails.groupBy("wallet_address")
      .agg(
        first(col("address_partition")).as("address_partition"),
        // ETH features (conditional aggregates over the summary rows)
        coalesce(max(when(col("contract_address") === "ETH", capped)), lit(0.0))
          .as("eth_balance"),
        coalesce(max(when(col("contract_address") === "ETH", col("max_balance"))), lit(0.0))
          .as("max_eth_ever"),
        coalesce(max(when(col("contract_address") === "ETH", col("min_positive_balance"))),
          lit(0.0)).as("min_eth_ever"),
        sum("n_received").as("n_in"),
        sum("n_sent").as("n_out"),
        sum(col("total_received").cast("decimal(38,6)")).cast("double").as("total_in"),
        sum(col("total_sent").cast("decimal(38,6)")).cast("double").as("total_out"),
        sum(col("total_fees").cast("decimal(38,6)")).cast("double").as("total_fees"),
        min("first_tx_ts").as("first_tx_ts"),
        max("last_tx_ts").as("last_tx_ts"),
        count(lit(1)).as("n_contracts"),
        map_from_arrays(collect_list(col("contract_address")),
          collect_list(col("contract_details"))).as("contracts_aggregations"))
      // guarded division (reference :307-310): avg in-amount only when n_in>0
      .withColumn("avg_in_value",
        when(col("n_in") > 0, col("total_in") / col("n_in")).otherwise(lit(0.0)))
  }
}
