package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytics-layer transforms over the Ethereum domain
  * tables — the per-table SQL programs re-expressed as DataFrame builders.
  * Each function cites the SQL it reproduces; the fixture-driven
  * DomainSpec covers the edge cases the reference's own fixtures call out.
  *
  * Scale notes: every join below is either a broadcast (dims: contracts,
  * metadata, rugpull list) or keyed on the natural big-table key
  * (hash/address), matching the partition design the reference encodes via
  * hash_partition buckets.
  */
object DomainTransforms {

  /** wei → ETH with the reference's split-POWER overflow dodge
    * (ethereum_normal_transactions.sql:53): value / 10^(d/2) / 10^(d/2)
    * rather than /10^d, preserving the halved-exponent semantics (integer
    * division of odd decimals!) exactly. */
  private def weiToUnit(value: org.apache.spark.sql.Column,
      decimals: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val half = pow(lit(10.0), (decimals / lit(2)).cast("long").cast("double"))
    value.cast("double") / half / half
  }

  /** ethereum_internal_transactions.sql:4-68 — the traces pipeline:
    *  - keep only value-bearing traces (value > 0), drop
    *    delegatecall/staticcall/callcode via the 3-valued-logic-safe
    *    NOT COALESCE filter (:33-36, SURVEY §7.4 #6);
    *  - drop traces that duplicate their parent transaction (:36, left
    *    join on (hash, from, to) used only as a filter);
    *  - append synthetic reward rows: 'REWARD_'||reward_type as the
    *    counterparty (:38-68).
    */
  def internalTransactions(traces: DataFrame, transactions: DataFrame): DataFrame = {
    val calls = traces.filter(col("trace_type") === "call")
      .filter(col("value") > 0)
      .filter(!coalesce(
        col("call_type").isin("delegatecall", "staticcall", "callcode"), lit(false)))
    val parents = transactions.select(
      col("hash").as("p_hash"), col("from_address").as("p_from"),
      col("to_address").as("p_to"), col("value").as("p_value"))
    // join on hash only; the duplicate test compares from AND to AND value
    // (:36) under three-valued logic — a trace differing from its parent in
    // any of the three (e.g. a partial internal transfer) is kept.
    val nonDup = calls
      .join(parents, col("transaction_hash") === col("p_hash"), "left_outer")
      .filter(!(col("from_address") === col("p_from") &&
        col("to_address") === col("p_to") && col("value") === col("p_value")))
      .drop("p_hash", "p_from", "p_to", "p_value")
    val rewards = traces.filter(col("trace_type") === "reward")
      .withColumn("transaction_hash",
        concat(lit("REWARD_"), coalesce(col("to_address"), lit(""))))
      .withColumn("from_address", concat(lit("REWARD_"), col("reward_type")))
    val cols = Seq("transaction_hash", "from_address", "to_address", "value",
      "block_timestamp", "block_number", "date_partition")
    nonDup.select(cols.map(col): _*)
      .unionByName(rewards.select(cols.map(col): _*))
      .withColumn("eth_value", weiToUnit(col("value"), lit(18L)))
  }

  /** ethereum_normal_transactions.sql:4-104 — transactions enriched with
    * block base fee (J4), trace error status (J5 shape), contract
    * existence flags via the hash_partition-co-located left joins (J7,
    * :65-72,85-90), and the rugpull 1-day window band join (J8, :91-104).
    */
  def normalTransactions(transactions: DataFrame, blocks: DataFrame,
      contracts: DataFrame, rugpulls: DataFrame): DataFrame = {
    val withBlock = transactions
      .join(blocks.select(col("number"), col("base_fee_per_gas")),
        col("block_number") === col("number"))
      .drop("number")
    // Contracts is NOT broadcast: Ethereum's contracts table is tens of
    // millions of rows (OOMs executors as a broadcast at real scale). The
    // reference co-partitions this join on hash_partition
    // (ethereum_normal_transactions.sql:85-90); here both sides shuffle on
    // the address key — AQE may still elect a broadcast when the dim is
    // genuinely small (tests pin autoBroadcastJoinThreshold=-1 to assert no
    // hard-coded BroadcastExchange survives).
    val fromFlag = contracts.select(col("address").as("c_from"))
    val toFlag = contracts.select(col("address").as("c_to"))
    val flagged = withBlock
      .join(fromFlag, col("from_address") === col("c_from"), "left_outer")
      .join(toFlag, col("to_address") === col("c_to"), "left_outer")
      .withColumn("from_is_contract", col("c_from").isNotNull)
      .withColumn("to_is_contract", col("c_to").isNotNull)
      .drop("c_from", "c_to")
    // rugpull match (ethereum_normal_transactions.sql:95-97): the rugpull
    // announcement lies on the tx's day or the day before —
    // (rd < td AND rd >= td - 1 day) OR rd = td — i.e. a tx on the
    // announcement day or the day after is flagged.
    val rp = rugpulls.select(lower(col("contract_address")).as("rp_addr"),
      col("rugpull_date"))
    val txDate = to_date(timestamp_seconds(col("block_timestamp")))
    val inWindow =
      (col("rugpull_date") < txDate && col("rugpull_date") >= txDate - expr("INTERVAL 1 DAY")) ||
        col("rugpull_date") === txDate
    flagged
      .join(broadcast(rp),
        lower(col("to_address")) === col("rp_addr") && inWindow,
        "left_outer")
      .withColumn("is_rugpull", col("rp_addr").isNotNull)
      .drop("rp_addr", "rugpull_date")
      .withColumn("eth_value", weiToUnit(col("value"), lit(18L)))
      .withColumn("tx_fee",
        col("receipt_gas_used").cast("double") * col("gas_price").cast("double") / lit(1e18))
  }

  /** ethereum_erc20_transactions.sql:4-92 — transfers with the try_cast→0
    * value guard (:13), the latest-metadata-per-contract pick (W6,
    * :22-29), and the decimals-scaled unit conversion (:68, J9). */
  def erc20Transactions(tokenTransfersRaw: DataFrame, tokensMetadata: DataFrame): DataFrame = {
    val typed = tokenTransfersRaw
      .withColumn("value", coalesce(expr("try_cast(value AS DECIMAL(38,9))"),
        lit(0).cast("decimal(38,9)")))
    val w = Window.partitionBy("contract_address").orderBy(col("created_timestamp").desc)
    val latestMeta = tokensMetadata
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("contract_address"), col("symbol"), col("decimals"))
    typed
      .join(broadcast(latestMeta), col("token_address") === col("contract_address"))
      .drop("contract_address")
      .withColumn("token_value", weiToUnit(col("value"), col("decimals")))
  }

  /** ethereum_wallet_transactions.sql:4-147 — the 3-way UNION with
    * per-branch type/priority constants, then the role pivot doubling each
    * row into a sender view and a receiver view (fee borne by the sender
    * only), with burn/genesis filtering (P6, :30,111-113,140-141). */
  /** The zero (burn) address the reference excludes
    * (ethereum_wallet_transactions.sql:113,141). */
  val BurnAddress: String = "0x" + "0" * 40

  def walletTransactions(normal: DataFrame, internal: DataFrame,
      erc20: DataFrame): DataFrame = {
    def branch(df: DataFrame, txType: String, priority: Int,
        valueCol: String, feeCol: Option[String]): DataFrame = {
      // carry contract flags when the branch computes them (normal does;
      // traces/erc20 sides default false, as unflagged addresses).
      val withFlags = Seq("from_is_contract", "to_is_contract").foldLeft(df) {
        (d, c) => if (d.columns.contains(c)) d else d.withColumn(c, lit(false))
      }
      withFlags.select(
        col("transaction_hash"),
        col("from_address"), col("to_address"),
        col("from_is_contract"), col("to_is_contract"),
        col(valueCol).as("amount"),
        feeCol.map(col).getOrElse(lit(0.0)).as("tx_fee"),
        col("block_timestamp"), col("block_number"),
        lit(txType).as("transaction_type"), lit(priority).as("priority"),
        col("date_partition"))
    }

    val unioned =
      branch(normal.withColumnRenamed("hash", "transaction_hash"),
        "normal", 1, "eth_value", Some("tx_fee"))
        .unionByName(branch(internal, "internal", 2, "eth_value", None))
        .unionByName(branch(erc20, "erc20", 3, "token_value", None))

    // Sender view (:111-113): drop contract senders, GENESIS, and the burn
    // address. Receiver view (:140-141): drop contract receivers and the
    // burn address (no GENESIS check on this side — faithful asymmetry).
    val sender = unioned
      .filter(!(col("from_is_contract") === true))
      .filter(col("from_address") =!= "GENESIS")
      .filter(col("from_address") =!= BurnAddress)
      .select(
        col("from_address").as("wallet_address"), lit("sender").as("role"),
        col("transaction_hash"), col("amount"), col("tx_fee"),
        col("block_timestamp"), col("block_number"),
        col("transaction_type"), col("priority"), col("date_partition"))
    val receiver = unioned
      .filter(col("to_address").isNotNull)
      .filter(!(col("to_is_contract") === true))
      .filter(col("to_address") =!= BurnAddress)
      .select(
        col("to_address").as("wallet_address"), lit("receiver").as("role"),
        col("transaction_hash"), col("amount"), lit(0.0).as("tx_fee"),
        col("block_timestamp"), col("block_number"),
        col("transaction_type"), col("priority"), col("date_partition"))
    sender.unionByName(receiver)
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))
  }

  /** ethereum_logs.sql:15-19,40-44 — repair char-exploded topics arrays:
    * when the first element degenerates to one char, re-join and re-chunk
    * into 66-char (0x + 64 hex) topic strings. */
  def repairLogTopics(logs: DataFrame): DataFrame =
    logs.withColumn("topics",
      when(length(element_at(col("topics"), 1)) === 1,
        split(trim(regexp_replace(array_join(col("topics"), ""), "(.{66})", "$1 ")), " "))
        .otherwise(col("topics")))
}
