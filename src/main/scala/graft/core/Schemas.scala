package graft.core

import org.apache.spark.sql.types._

/** The reference's declared table schemas, transcribed verbatim
  * (src/schemas/stage_layer.py, src/schemas/analytics_layer.py — already
  * expressed in PySpark types there; see FIXTURES.md for the per-table
  * citations). Watermark + partition columns per table mirror
  * stage_data_ingestion_pipeline.py:59-108.
  */
object Schemas {

  private val dec = DecimalType(38, 9)

  /** stage.ethereum_blocks (stage_layer.py:4-45). */
  val blocks: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("timestamp_readable", TimestampType),
    StructField("number", LongType),
    StructField("hash", StringType),
    StructField("parent_hash", StringType),
    StructField("nonce", StringType),
    StructField("miner", StringType),
    StructField("difficulty", dec),
    StructField("total_difficulty", dec),
    StructField("size", LongType),
    StructField("gas_limit", LongType),
    StructField("gas_used", LongType),
    StructField("transaction_count", LongType),
    StructField("base_fee_per_gas", LongType),
    StructField("date_partition", StringType)))

  /** stage.ethereum_transactions (stage_layer.py:46-105). */
  val transactions: StructType = StructType(Seq(
    StructField("hash", StringType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("nonce", LongType),
    StructField("transaction_index", LongType),
    StructField("gas", LongType),
    StructField("gas_price", LongType),
    StructField("receipt_cumulative_gas_used", LongType),
    StructField("receipt_gas_used", LongType),
    StructField("receipt_status", LongType),
    StructField("block_timestamp", LongType),
    StructField("block_number", LongType),
    StructField("max_fee_per_gas", LongType),
    StructField("max_priority_fee_per_gas", LongType),
    StructField("receipt_effective_gas_price", LongType),
    StructField("value", dec),
    StructField("input", StringType),
    StructField("block_hash", StringType),
    StructField("receipt_contract_address", StringType),
    StructField("transaction_type", StringType),
    StructField("date_partition", StringType)))

  /** stage.ethereum_traces (stage_layer.py:165-210). */
  val traces: StructType = StructType(Seq(
    StructField("transaction_hash", StringType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("trace_type", StringType),
    StructField("call_type", StringType),
    StructField("reward_type", StringType),
    StructField("trace_id", StringType),
    StructField("error", StringType),
    StructField("value", dec),
    StructField("gas", LongType),
    StructField("gas_used", LongType),
    StructField("subtraces", LongType),
    StructField("status", LongType),
    StructField("block_timestamp", LongType),
    StructField("block_number", LongType),
    StructField("date_partition", StringType)))

  /** stage.ethereum_token_transfers (stage_layer.py:138-164); raw `value`
    * arrives as string to exercise the try_cast→0 guard
    * (ethereum_token_transfers.sql:13). */
  val tokenTransfersRaw: StructType = StructType(Seq(
    StructField("token_address", StringType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("transaction_hash", StringType),
    StructField("block_hash", StringType),
    StructField("value", StringType),
    StructField("log_index", LongType),
    StructField("block_timestamp", LongType),
    StructField("block_number", LongType),
    StructField("date_partition", StringType)))

  /** stage.ethereum_logs (stage_layer.py:106-137): topics array possibly
    * char-exploded (ethereum_logs.sql:15-19). */
  val logs: StructType = StructType(Seq(
    StructField("log_index", LongType),
    StructField("transaction_hash", StringType),
    StructField("address", StringType),
    StructField("data", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("block_timestamp", LongType),
    StructField("block_number", LongType),
    StructField("date_partition", StringType)))

  /** stage.ethereum_contracts (stage_layer.py:211-246): hash_partition =
    * substr(address,3,2) (ethereum_contracts.sql:16). */
  val contracts: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("bytecode", StringType),
    StructField("is_erc20", BooleanType),
    StructField("is_erc721", BooleanType),
    StructField("block_timestamp", LongType),
    StructField("block_number", LongType),
    StructField("hash_partition", StringType),
    StructField("date_partition", StringType)))

  /** stage.ethereum_tokens_metadata (per-contract symbol/decimals dim,
    * possibly with multiple rows per contract over time). */
  val tokensMetadata: StructType = StructType(Seq(
    StructField("contract_address", StringType),
    StructField("symbol", StringType),
    StructField("decimals", LongType),
    StructField("created_timestamp", LongType)))

  /** External input: rugpull token list with announcement dates
    * (rugpull_market_data, ethereum_normal_transactions.sql:91-104). */
  val rugpullMarketData: StructType = StructType(Seq(
    StructField("contract_address", StringType),
    StructField("rugpull_date", DateType)))

  // ------------------------------------------------------------ raw CSVs
  // What the exporter hands the raw layer (raw_data_ingestion_pipeline.py)
  // BEFORE the receipts merge / blocks enrich add the receipt_ and
  // block_timestamp/block_hash/date_partition columns.

  /** transactions.csv (:138-146). */
  val rawTransactionsCsv: StructType = StructType(Seq(
    StructField("hash", StringType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("nonce", LongType),
    StructField("transaction_index", LongType),
    StructField("gas", LongType),
    StructField("gas_price", LongType),
    StructField("max_fee_per_gas", LongType),
    StructField("max_priority_fee_per_gas", LongType),
    StructField("value", dec),
    StructField("input", StringType),
    StructField("block_hash", StringType),
    StructField("block_timestamp", LongType),
    StructField("block_number", LongType),
    StructField("transaction_type", StringType)))

  /** receipts.csv — the 8 columns the merge keeps (:142-151). */
  val receiptsCsv: StructType = StructType(Seq(
    StructField("transaction_hash", StringType),
    StructField("block_number", LongType),
    StructField("cumulative_gas_used", LongType),
    StructField("gas_used", LongType),
    StructField("contract_address", StringType),
    StructField("root", StringType),
    StructField("status", LongType),
    StructField("effective_gas_price", LongType)))

  /** blocks.csv — the enrich columns (:689-691 prunes to these + fee). */
  val rawBlocksCsv: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("number", LongType),
    StructField("hash", StringType),
    StructField("base_fee_per_gas", LongType)))

  /** logs.csv (:250-267); topics arrives '|'-joined in CSV. */
  val rawLogsCsv: StructType = StructType(Seq(
    StructField("log_index", LongType),
    StructField("transaction_hash", StringType),
    StructField("address", StringType),
    StructField("data", StringType),
    StructField("topics", StringType),
    StructField("block_number", LongType)))

  /** token_transfers.csv (:488-500); value as string for the try_cast
    * guard downstream. */
  val rawTokenTransfersCsv: StructType = StructType(Seq(
    StructField("token_address", StringType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("transaction_hash", StringType),
    StructField("value", StringType),
    StructField("log_index", LongType),
    StructField("block_number", LongType)))

  /** contracts.csv (external fetcher output; stage derives
    * hash_partition). */
  val rawContractsCsv: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("bytecode", StringType),
    StructField("is_erc20", BooleanType),
    StructField("is_erc721", BooleanType),
    StructField("block_timestamp", LongType),
    StructField("block_number", LongType),
    StructField("date_partition", StringType)))

  /** tokens_metadata.csv (the Transpose-API fetcher's output contract). */
  val rawTokensMetadataCsv: StructType = StructType(Seq(
    StructField("contract_address", StringType),
    StructField("symbol", StringType),
    StructField("decimals", LongType),
    StructField("created_timestamp", LongType),
    StructField("date_partition", StringType)))

  /** traces.csv (:684-695); value as digit string (the precision clamp
    * operates on the string form). */
  val rawTracesCsv: StructType = StructType(Seq(
    StructField("transaction_hash", StringType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("trace_type", StringType),
    StructField("call_type", StringType),
    StructField("reward_type", StringType),
    StructField("trace_id", StringType),
    StructField("error", StringType),
    StructField("value", StringType),
    StructField("gas", LongType),
    StructField("gas_used", LongType),
    StructField("subtraces", LongType),
    StructField("status", LongType),
    StructField("block_number", LongType)))
}
