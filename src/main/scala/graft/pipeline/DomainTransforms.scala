package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytics-layer transforms over the Ethereum domain
  * tables — the per-table SQL programs re-expressed as DataFrame builders,
  * emitting the FULL reference column surface (token columns, error
  * status, both rugpull flags, hash partitions) so the outputs feed
  * [[WalletFeatures]] / [[CoinBalances]] unmodified. Each function cites
  * the SQL it reproduces; DomainSpec covers the edge cases the reference's
  * own fixtures call out.
  *
  * Scale notes: the contracts/rugpull joins key on the address (the
  * reference co-partitions them via hash_partition, a function of the
  * address — same co-location, one fewer key) and are NOT broadcast
  * (contracts is tens of millions of rows); metadata is a genuine dim and
  * broadcasts; the trace-status join keys on the tx hash.
  */
object DomainTransforms {

  /** wei → unit with the reference's split-POWER overflow dodge
    * (ethereum_normal_transactions.sql:53): value / 10^(d/2) / 10^(d/2)
    * rather than /10^d, preserving the halved-exponent semantics (integer
    * division of odd decimals!) exactly. */
  private def weiToUnit(value: Column, decimals: Column): Column = {
    val half = pow(lit(10.0), (decimals / lit(2)).cast("long").cast("double"))
    value.cast("double") / half / half
  }

  private def hashPart(addr: Column): Column = substring(addr, 3, 2)

  /** The rugpull date window (ethereum_normal_transactions.sql:95-104):
    * the announcement lies on the tx's day or the day before. */
  private def rugpullWindow(rugpullDate: Column, txTs: Column): Column = {
    val txDate = to_date(timestamp_seconds(txTs))
    (rugpullDate < txDate && rugpullDate >= txDate - expr("INTERVAL 1 DAY")) ||
      rugpullDate === txDate
  }

  /** Append is_rugpull (matching `matchCol` against the announced token)
    * and to_address_is_rugpull (:74-85 / :92-104) — both shuffle joins
    * against the (small, hinted) rugpull list. */
  private def withRugpullFlags(df: DataFrame, rugpulls: DataFrame,
      matchCol: Column): DataFrame = {
    // The flags are EXISTENCE checks, so the join side must be UNIQUE
    // per address or a list carrying one contract on two in-window dates
    // (or a duplicate row) fans every matching transaction out through
    // the left join — double-counting its amount through every
    // downstream rollup. Collapsing to one row per address with the
    // date SET makes fan-out structurally impossible; the window test
    // moves into an `exists` over the (tiny) per-address set.
    val r1 = rugpulls.groupBy(lower(col("contract_address")).as("rp1_addr"))
      .agg(collect_set(col("rugpull_date")).as("rp1_dates"))
    val r2 = rugpulls.groupBy(lower(col("contract_address")).as("rp2_addr"))
      .agg(collect_set(col("rugpull_date")).as("rp2_dates"))
    df.join(broadcast(r1), lower(matchCol) === col("rp1_addr"), "left_outer")
      .join(broadcast(r2), lower(col("to_address")) === col("rp2_addr"), "left_outer")
      .withColumn("is_rugpull", coalesce(
        exists(col("rp1_dates"), d => rugpullWindow(d, col("block_timestamp"))),
        lit(false)))
      .withColumn("to_address_is_rugpull", coalesce(
        exists(col("rp2_dates"), d => rugpullWindow(d, col("block_timestamp"))),
        lit(false)))
      .drop("rp1_addr", "rp1_dates", "rp2_addr", "rp2_dates")
  }

  /** Append from_is_contract / to_is_contract existence flags (:64-72,
    * :85-90) — shuffle joins on the address (hash_partition-co-located in
    * the reference; never broadcast). */
  private def withContractFlags(df: DataFrame, contracts: DataFrame): DataFrame = {
    // distinct dims: the stage table dedups full ROWS, so a contract
    // re-exported under a new block/date yields two rows with the same
    // address — a non-distinct flag join would duplicate every
    // transaction touching it
    val fromFlag = contracts.select(col("address").as("c_from")).distinct()
    val toFlag = contracts.select(col("address").as("c_to")).distinct()
    df.join(fromFlag, col("from_address") === col("c_from"), "left_outer")
      .join(toFlag, col("to_address") === col("c_to"), "left_outer")
      .withColumn("from_is_contract", col("c_from").isNotNull)
      .withColumn("to_is_contract", col("c_to").isNotNull)
      .drop("c_from", "c_to")
  }

  /** ethereum_internal_transactions.sql:8-115 — the traces pipeline:
    *  - keep only value-bearing calls (value > 0), drop
    *    delegatecall/staticcall/callcode via the 3-valued-logic-safe
    *    filter (:35, SURVEY §7.4 #6);
    *  - drop traces that duplicate their parent transaction (:36 — the
    *    NOT(from AND to AND value) under three-valued logic also drops
    *    parentless traces, which the reference accepts);
    *  - append synthetic reward rows: 'REWARD_'||to_address as the hash
    *    and 'REWARD_'||reward_type as the counterparty (:40-57);
    *  - 'ETH' token columns, is_error from the trace's own status (:25-28
    *    — the reference's CASE cites a `tc` alias that does not exist in
    *    its scope; the trace status is the evident intent), error_code;
    *  - contract/rugpull flags, hash partitions, wei→ETH (:60-115).
    */
  def internalTransactions(traces: DataFrame, transactions: DataFrame,
      contracts: DataFrame, rugpulls: DataFrame): DataFrame = {
    val calls = traces.filter(col("trace_type") === "call")
      .filter(col("value") > 0)
      .filter(!coalesce(
        col("call_type").isin("delegatecall", "staticcall", "callcode"), lit(false)))
    val parents = transactions.select(
      col("hash").as("p_hash"), col("from_address").as("p_from"),
      col("to_address").as("p_to"), col("value").as("p_value"))
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
      "status", "error", "block_timestamp", "block_number", "date_partition")
    val unioned = nonDup.select(cols.map(col): _*)
      .unionByName(rewards.select(cols.map(col): _*))
      .withColumn("contract_address", lit("ETH"))
      .withColumn("token_symbol", lit("ETH"))
      .withColumn("token_decimal", lit(18L))
      .withColumn("is_error",
        !(col("status").isNull || col("status") === 1))
      .withColumnRenamed("error", "error_code")
      .withColumn("current_value", weiToUnit(col("value"), col("token_decimal")))
      .withColumn("from_hash_partition", hashPart(col("from_address")))
      .withColumn("to_hash_partition", hashPart(col("to_address")))
    withRugpullFlags(withContractFlags(unioned, contracts), rugpulls,
      col("contract_address"))
  }

  /** ethereum_normal_transactions.sql:8-104 — transactions enriched with
    * block base fee (J4), trace error status (J5, :22-25), the 'ETH'
    * token columns, contract existence flags (J7), BOTH rugpull flags —
    * is_rugpull matches the (always-'ETH') contract_address, which the
    * reference accepts as a near-constant false; to_address_is_rugpull is
    * the live one (:74-104, J8) — and the reference's exact fee
    * association gas_used * (gas_price / 1e18) (:57). */
  def normalTransactions(transactions: DataFrame, blocks: DataFrame,
      contracts: DataFrame, rugpulls: DataFrame,
      traces: DataFrame): DataFrame = {
    val withBlock = transactions
      .join(blocks.select(col("number"), col("base_fee_per_gas").as("gas_fee")),
        col("block_number") === col("number"))
      .drop("number")
    // re-exported traces can share (hash, block, from, to) under new
    // trace ids — and a re-export that CORRECTED the status yields two
    // rows differing only there, which a full-row distinct would keep
    // both of (fanning the transaction out). Aggregate to one row per
    // key; MAX(status) means "errored unless any trace succeeded",
    // matching the is_error derivation below.
    val traceStatus = traces
      .groupBy(
        col("transaction_hash").as("tc_hash"), col("block_number").as("tc_block"),
        col("from_address").as("tc_from"), col("to_address").as("tc_to"))
      .agg(max(col("status")).as("tc_status"))
    val withError = withBlock
      .join(traceStatus,
        col("hash") === col("tc_hash") && col("block_number") === col("tc_block") &&
          col("from_address") === col("tc_from") && col("to_address") === col("tc_to"),
        "left_outer")
      .withColumn("is_error", !(col("tc_status").isNull || col("tc_status") === 1))
      .drop("tc_hash", "tc_block", "tc_from", "tc_to", "tc_status")
      .withColumn("contract_address", lit("ETH"))
      .withColumn("token_symbol", lit("ETH"))
      .withColumn("token_decimal", lit(18L))
      .withColumn("current_value", weiToUnit(col("value"), col("token_decimal")))
      // :57 — gas_used * (gas_price / 1e18), the reference's association
      .withColumn("tx_fee",
        col("receipt_gas_used").cast("double") * (col("gas_price").cast("double") / lit(1e18)))
      .withColumn("from_hash_partition", hashPart(col("from_address")))
      .withColumn("to_hash_partition", hashPart(col("to_address")))
      .withColumn("eth_value", col("current_value")) // legacy alias
    withRugpullFlags(withContractFlags(withError, contracts), rugpulls,
      col("contract_address"))
  }

  /** ethereum_erc20_transactions.sql:8-104 — transfers with the :40-59
    * source joins (trace status = 1 only, tx for nonce/transaction_index,
    * value > 0), the try_cast→0 value guard, the latest-metadata-per-
    * contract pick (W6, :16-29), the decimals-scaled unit conversion
    * (:68, J9), contract/rugpull flags (is_rugpull matches the token
    * address here) and hash partitions. */
  def erc20Transactions(tokenTransfersRaw: DataFrame, tokensMetadata: DataFrame,
      transactions: DataFrame, traces: DataFrame,
      contracts: DataFrame, rugpulls: DataFrame): DataFrame = {
    val typed = tokenTransfersRaw
      .withColumn("value", coalesce(expr("try_cast(value AS DECIMAL(38,9))"),
        lit(0).cast("decimal(38,9)")))
      .filter(col("value") > 0)
    val okTraces = traces.filter(col("status") === 1)
      .select(col("transaction_hash").as("tc_hash"), col("block_number").as("tc_block"))
      .distinct()
    val txIdx = transactions.select(col("hash").as("ts_hash"),
      col("block_number").as("ts_block"), col("nonce"), col("transaction_index"))
    val sourced = typed
      .join(okTraces, col("transaction_hash") === col("tc_hash") &&
        col("block_number") === col("tc_block"), "left_semi")
      .join(txIdx, col("transaction_hash") === col("ts_hash") &&
        col("block_number") === col("ts_block"))
      .drop("ts_hash", "ts_block")
      .withColumn("is_error", lit(false)) // status = 1 enforced above (:49)
    val w = Window.partitionBy("contract_address").orderBy(col("created_timestamp").desc)
    val latestMeta = tokensMetadata
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("contract_address"), col("symbol").as("token_symbol"),
        col("decimals").as("token_decimal"))
    val withMeta = sourced
      .join(broadcast(latestMeta), col("token_address") === col("contract_address"))
      .withColumn("current_value", weiToUnit(col("value"), col("token_decimal")))
      .withColumn("token_value", col("current_value")) // legacy alias
      .withColumn("from_hash_partition", hashPart(col("from_address")))
      .withColumn("to_hash_partition", hashPart(col("to_address")))
    withRugpullFlags(withContractFlags(withMeta, contracts), rugpulls,
      col("token_address"))
  }

  /** The zero (burn) address the reference excludes
    * (ethereum_wallet_transactions.sql:113,141). */
  val BurnAddress: String = "0x" + "0" * 40

  /** ethereum_wallet_transactions.sql:4-147 — the 3-way UNION with
    * per-branch type/priority constants and error-zeroed values for the
    * normal/internal branches (:38,:65), then the role pivot doubling each
    * row into a sender view and a receiver view (fee borne by the sender
    * only; interacted_with = the other side; address_partition = that
    * side's hash partition), with burn/genesis filtering (P6,
    * :111-113,140-141) and contract↔contract rows dropped (:29,:55,:84).
    * The output feeds [[WalletFeatures]]/[[CoinBalances]] directly. */
  def walletTransactions(normal: DataFrame, internal: DataFrame,
      erc20: DataFrame): DataFrame = {
    def branch(df: DataFrame, txType: String, priority: Int,
        zeroOnError: Boolean, feeCol: Option[String],
        withIndex: Boolean): DataFrame = {
      val value0 = col("current_value")
      val value = if (zeroOnError) when(col("is_error"), lit(0.0)).otherwise(value0)
                  else value0
      df.select(
        col("transaction_hash"),
        (if (withIndex) col("transaction_index") else lit(null).cast("long"))
          .as("transaction_index"),
        col("from_address"), col("to_address"),
        col("from_is_contract"), col("to_is_contract"),
        col("from_hash_partition"), col("to_hash_partition"),
        value.as("amount"),
        feeCol.map(col).getOrElse(lit(0.0)).as("tx_fee"),
        col("contract_address"), col("token_symbol"), col("token_decimal"),
        col("is_error"), col("is_rugpull"), col("to_address_is_rugpull"),
        col("block_timestamp"), col("block_number"),
        lit(txType).as("transaction_type"), lit(priority).as("priority"),
        col("date_partition"))
        // :29,:55,:84 — contract-to-contract rows never reach a wallet
        .filter(!(col("from_is_contract") === true && col("to_is_contract") === true))
    }

    val unioned =
      branch(normal.withColumnRenamed("hash", "transaction_hash"),
        "normal", 1, zeroOnError = true, Some("tx_fee"), withIndex = true)
        .unionByName(branch(internal, "internal", 2, zeroOnError = true, None,
          withIndex = false))
        .unionByName(branch(erc20, "erc20", 3, zeroOnError = false, None,
          withIndex = false))

    val carried = Seq("transaction_hash", "transaction_index", "amount",
      "contract_address", "token_symbol", "token_decimal",
      "is_error", "is_rugpull", "to_address_is_rugpull",
      "block_timestamp", "block_number", "transaction_type", "priority",
      "date_partition")
    // Sender view (:111-113): drop contract senders, GENESIS, and the burn
    // address. Receiver view (:140-141): drop contract receivers and the
    // burn address (no GENESIS check on this side — faithful asymmetry).
    val sender = unioned
      .filter(!(col("from_is_contract") === true))
      .filter(col("from_address") =!= "GENESIS")
      .filter(col("from_address") =!= BurnAddress)
      .select((col("from_address").as("wallet_address") +:
        col("to_address").as("interacted_with") +:
        lit("sender").as("role") +:
        col("from_hash_partition").as("address_partition") +:
        col("tx_fee") +: carried.map(col)): _*)
    val receiver = unioned
      .filter(col("to_address").isNotNull)
      .filter(!(col("to_is_contract") === true))
      .filter(col("to_address") =!= BurnAddress)
      .select((col("to_address").as("wallet_address") +:
        col("from_address").as("interacted_with") +:
        lit("receiver").as("role") +:
        col("to_hash_partition").as("address_partition") +:
        lit(0.0).as("tx_fee") +: carried.map(col)): _*)
    sender.unionByName(receiver)
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
