package graft.pipeline

import graft.core.Lakehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-table stage cleaners (the SQL files under
  * src/pipelines/stage/transformations, driven by
  * stage_data_ingestion_pipeline.py): each raw table is
  * deduplicated (SELECT DISTINCT), timestamp-normalized (unix seconds +
  * a *_readable companion), uuid-tagged, and incrementally appended behind
  * the per-table watermark switch and anti-join identity keys.
  *
  * The reference's table-by-table variation, kept:
  *  - watermark COLUMN per table (stage_data_ingestion_pipeline.py:59-92):
  *    blocks → number; contracts/tokens → block_timestamp;
  *    tokens_metadata → created_timestamp; everything else → block_number;
  *  - first-run DEFAULT watermarks (:94-108): genesis-adjacent constants
  *    for transactions/logs/token_transfers, '2015-01-01' for the
  *    contract-family tables, 0 otherwise;
  *  - blocks coalesces transaction_count to 0 (ethereum_blocks.sql:28);
  *    tokens_metadata coalesces decimals to 18
  *    (ethereum_tokens_metadata.sql:11); contracts/tokens_metadata derive
  *    hash_partition = substr(address, 3, 2);
  *  - anti-join identity keys per table (the NOT EXISTS tails) — traces'
  *    identity here is (transaction_hash, trace_id, block_number,
  *    date_partition): the reference keys on transaction_index, a column
  *    its exporter adds; trace_id is the same row identity in ours;
  *  - the watermark filter is `>=` for the number/block_number tables and
  *    `>` for the timestamp-watermarked contract family — both as written
  *    in the reference SQL.
  *
  * Scale: DISTINCT shuffles on all columns once per batch (batch-sized,
  * not table-sized); the anti-join probes only the max-partition slice via
  * Lakehouse's pruned watermark; appends repartition by date_partition.
  */
object StageCleaners {

  /** :59-92 — the watermark-column switch. */
  def watermarkColumn(table: String): String = table match {
    case "ethereum_blocks" => "number"
    case "ethereum_contracts" | "ethereum_tokens" => "block_timestamp"
    case "ethereum_tokens_metadata" => "created_timestamp"
    case _ => "block_number"
  }

  /** :94-108 — first-run defaults. The contract-family tables default to
    * '2015-01-01 00:00:00' (their watermark columns are epoch-second
    * timestamps); the block-number tables to genesis-adjacent constants. */
  def initialWatermark(table: String): Long = table match {
    case "ethereum_transactions" => 46147L
    case "ethereum_logs" => 52029L
    case "ethereum_token_transfers" => 447767L
    case "ethereum_contracts" | "ethereum_tokens" | "ethereum_tokens_metadata" =>
      1420070400L // 2015-01-01T00:00:00Z (:102-104)
    case _ => 0L
  }

  /** `>` for the timestamp-watermarked contract family, `>=` elsewhere. */
  def strictWatermark(table: String): Boolean = table match {
    case "ethereum_contracts" | "ethereum_tokens" | "ethereum_tokens_metadata" => true
    case _ => false
  }

  /** The NOT EXISTS identity keys per table. */
  def identityKeys(table: String): Seq[String] = table match {
    case "ethereum_blocks" => Seq("hash", "number", "date_partition")
    case "ethereum_transactions" =>
      Seq("hash", "transaction_index", "block_number", "date_partition")
    case "ethereum_logs" =>
      Seq("transaction_hash", "block_number", "log_index", "date_partition")
    case "ethereum_token_transfers" =>
      Seq("transaction_hash", "log_index", "block_number", "date_partition")
    case "ethereum_traces" =>
      Seq("transaction_hash", "trace_id", "block_number", "date_partition")
    // contracts/tokens carry `address` (Schemas.contracts,
    // cleanContracts/cleanTokens); only tokens_metadata has
    // `contract_address` — keying the wrong name wedged every
    // incremental contracts batch on an AnalysisException
    case "ethereum_contracts" | "ethereum_tokens" =>
      Seq("address", "date_partition")
    case _ => Seq("contract_address", "date_partition")
  }

  private val uuidTag = expr("uuid()").as("uuid")

  /** ethereum_blocks.sql:8-35 — distinct, readable timestamp, zero-default
    * transaction_count, uuid. */
  def cleanBlocks(raw: DataFrame): DataFrame = {
    val withCount = if (raw.columns.contains("transaction_count")) raw
                    else raw.withColumn("transaction_count", lit(null).cast("long"))
    withCount.distinct()
      .withColumn("timestamp_readable", timestamp_seconds(col("timestamp")))
      .withColumn("transaction_count",
        coalesce(col("transaction_count"), lit(0L)))
      .select(uuidTag, col("*"))
  }

  /** ethereum_transactions.sql:8-38 — distinct, readable block timestamp,
    * uuid. */
  def cleanTransactions(raw: DataFrame): DataFrame =
    raw.distinct()
      .withColumn("block_timestamp_readable", timestamp_seconds(col("block_timestamp")))
      .select(uuidTag, col("*"))

  /** ethereum_logs/token_transfers — distinct + uuid (their conversions
    * happened in the raw layer). */
  def cleanGeneric(raw: DataFrame): DataFrame =
    raw.distinct().select(uuidTag, col("*"))

  /** ethereum_traces — the raw layer carries `value` as a (possibly
    * precision-clamped) digit string; stage types it to the declared
    * DECIMAL(38,9). */
  def cleanTraces(raw: DataFrame): DataFrame =
    raw.distinct()
      .withColumn("value",
        col("value").try_cast(org.apache.spark.sql.types.DecimalType(38, 9)))
      .select(uuidTag, col("*"))

  /** ethereum_contracts.sql:8-23 — distinct, hash_partition, uuid. */
  def cleanContracts(raw: DataFrame): DataFrame =
    raw.distinct()
      .withColumn("hash_partition", substring(col("address"), 3, 2))
      .select(uuidTag, col("*"))

  /** ethereum_tokens.sql:8-23 — distinct, the double→bigint decimals
    * cast, try_cast'd total_supply, hash_partition, uuid. Faithful
    * asymmetry: only the INCREMENTAL variant coalesces a failed
    * total_supply cast to 0 (:33) — the full load keeps the NULL (:14). */
  def cleanTokens(raw: DataFrame, incremental: Boolean): DataFrame = {
    val supply = col("total_supply").try_cast(
      org.apache.spark.sql.types.DecimalType(38, 0))
    raw.distinct()
      .withColumn("decimals", col("decimals").cast("double").cast("long"))
      .withColumn("total_supply",
        if (incremental) coalesce(supply, lit(0).cast("decimal(38,0)")) else supply)
      .withColumn("hash_partition", substring(col("address"), 3, 2))
      .select(uuidTag, col("*"))
  }

  /** ethereum_tokens_metadata.sql:8-22 — distinct, 18-decimals default,
    * hash_partition (no uuid in the reference's select). */
  def cleanTokensMetadata(raw: DataFrame): DataFrame =
    raw.distinct()
      .withColumn("decimals", coalesce(col("decimals"), lit(18L)))
      .withColumn("hash_partition", substring(col("contract_address"), 3, 2))

  /** One stage load for `table`: full on first run (still filtered by the
    * reference's initial watermark), watermark-filtered + anti-join-guarded
    * append afterwards. */
  def stageLoad(spark: SparkSession, table: String, raw: DataFrame,
      stageRoot: String, clean: DataFrame => DataFrame): Unit = {
    val wmCol = watermarkColumn(table)
    def newer(wm: Long) =
      if (strictWatermark(table)) raw.filter(col(wmCol) > lit(wm))
      else raw.filter(col(wmCol) >= lit(wm))
    Lakehouse.loadIncremental(spark, s"$stageRoot/$table",
      watermarkCol = wmCol, partitionCols = Seq("date_partition"),
      keys = identityKeys(table),
      full = () => clean(newer(initialWatermark(table))),
      incremental = wm => clean(newer(wm.toString.toLong)))
  }
}
