package graft

import graft.core.Lakehouse
import graft.pipeline.StageCleaners
import org.apache.spark.sql.functions._

/** Per-table stage cleaners: the watermark-column switch, first-run
  * defaults, DISTINCT + conversion + uuid shape, and the anti-join-guarded
  * incremental append. */
class StageCleanersSpec extends SparkSpec {
  import spark.implicits._

  test("watermark switch, defaults, strictness, identity keys per table (:59-108)") {
    assert(StageCleaners.watermarkColumn("ethereum_blocks") == "number")
    assert(StageCleaners.watermarkColumn("ethereum_contracts") == "block_timestamp")
    assert(StageCleaners.watermarkColumn("ethereum_tokens") == "block_timestamp")
    assert(StageCleaners.watermarkColumn("ethereum_tokens_metadata") == "created_timestamp")
    assert(StageCleaners.watermarkColumn("ethereum_transactions") == "block_number")
    assert(StageCleaners.watermarkColumn("ethereum_traces") == "block_number")
    assert(StageCleaners.initialWatermark("ethereum_transactions") == 46147L)
    assert(StageCleaners.initialWatermark("ethereum_logs") == 52029L)
    assert(StageCleaners.initialWatermark("ethereum_token_transfers") == 447767L)
    assert(StageCleaners.initialWatermark("ethereum_blocks") == 0L)
    assert(!StageCleaners.strictWatermark("ethereum_blocks"))
    assert(StageCleaners.strictWatermark("ethereum_tokens_metadata"))
    assert(StageCleaners.identityKeys("ethereum_blocks") ==
      Seq("hash", "number", "date_partition"))
    assert(StageCleaners.identityKeys("ethereum_logs") ==
      Seq("transaction_hash", "block_number", "log_index", "date_partition"))
    // contracts/tokens key on `address` — their cleaned frames have no
    // contract_address column, and keying the wrong name wedged every
    // incremental contracts batch on an AnalysisException
    assert(StageCleaners.identityKeys("ethereum_contracts") ==
      Seq("address", "date_partition"))
    assert(StageCleaners.identityKeys("ethereum_tokens") ==
      Seq("address", "date_partition"))
    assert(StageCleaners.identityKeys("ethereum_tokens_metadata") ==
      Seq("contract_address", "date_partition"))
  }

  test("contracts stage load survives the incremental path (identity keys exist)") {
    import org.apache.spark.sql.Row
    val root = tmpDir("stage-contracts")
    def rawContracts(rows: Row*) =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        graft.core.Schemas.contracts)
    def c(addr: String, tsSec: Long) =
      Row(addr, "0x60", true, false, tsSec, 100L, "c", "2024-01")
    // run 1: full CTAS; run 2: the previously-wedged anti-join path
    StageCleaners.stageLoad(spark, "ethereum_contracts",
      rawContracts(c("0xa", 1704067200L)), root, StageCleaners.cleanContracts)
    StageCleaners.stageLoad(spark, "ethereum_contracts",
      rawContracts(c("0xa", 1704067200L), c("0xb", 1704067300L)),
      root, StageCleaners.cleanContracts)
    val out = Lakehouse.read(spark, s"$root/ethereum_contracts")
    assert(out.count() == 2, "incremental contracts batch wedged or duplicated")
    assert(out.select("address").distinct().count() == 2)
  }

  test("cleanBlocks: DISTINCT collapse, transaction_count default, readable ts, uuid") {
    val raw = Seq(
      (1704067200L, 100L, "bh100", Some(5L), "2024-01"),
      (1704067200L, 100L, "bh100", Some(5L), "2024-01"), // exact duplicate
      (1704067212L, 101L, "bh101", None, "2024-01"))
      .toDF("timestamp", "number", "hash", "transaction_count", "date_partition")
    val out = StageCleaners.cleanBlocks(raw)
    assert(out.count() == 2)
    val r101 = out.filter(col("number") === 101L).head()
    assert(r101.getAs[Long]("transaction_count") == 0L) // coalesce default
    assert(r101.getAs[String]("uuid") != null)
    assert(r101.getAs[java.sql.Timestamp]("timestamp_readable").toInstant.getEpochSecond
      == 1704067212L)
  }

  test("cleanTokensMetadata: 18-decimals default + hash_partition, no uuid") {
    val raw = Seq(("0xAB12cd", Some(9L), "TOK", 5L, "2024-01"),
        ("0xEF34gh", None, "NIL", 6L, "2024-01"))
      .toDF("contract_address", "decimals", "symbol", "created_timestamp", "date_partition")
    val out = StageCleaners.cleanTokensMetadata(raw)
    val byAddr = out.collect().map(r => r.getAs[String]("contract_address") -> r).toMap
    assert(byAddr("0xEF34gh").getAs[Long]("decimals") == 18L)
    assert(byAddr("0xAB12cd").getAs[Long]("decimals") == 9L)
    assert(byAddr("0xAB12cd").getAs[String]("hash_partition") == "AB")
    assert(!out.columns.contains("uuid"))
  }

  test("cleanTokens: decimals double->bigint, total_supply try_cast asymmetry (ethereum_tokens.sql:14,:33)") {
    val raw = Seq(
      ("0xAB1", "TOK", "tokn", 9.0, "12345", 5L, "2024-01"),
      ("0xCD2", "BAD", "badn", 18.0, "garbage", 6L, "2024-01"))
      .toDF("address", "symbol", "name", "decimals", "total_supply",
        "block_timestamp", "date_partition")
    val full = StageCleaners.cleanTokens(raw, incremental = false)
      .collect().map(r => r.getAs[String]("address") -> r).toMap
    assert(full("0xAB1").getAs[Long]("decimals") == 9L)
    assert(full("0xAB1").getAs[java.math.BigDecimal]("total_supply").longValue == 12345L)
    assert(full("0xCD2").isNullAt(full("0xCD2").fieldIndex("total_supply"))) // full keeps NULL
    assert(full("0xAB1").getAs[String]("hash_partition") == "AB")
    val inc = StageCleaners.cleanTokens(raw, incremental = true)
      .collect().map(r => r.getAs[String]("address") -> r).toMap
    assert(inc("0xCD2").getAs[java.math.BigDecimal]("total_supply").longValue == 0L) // :33 coalesce
  }

  test("featuresDbSlice exports only rows past the serving high-water mark") {
    import graft.pipeline.{RugpullFeatures, WalletFeatures}
    val feats = Seq(("0xa", 100L, "aa"), ("0xb", 300L, "bb"))
      .toDF("wallet_address", "wallet_last_tx", "address_partition")
    val out = WalletFeatures.featuresDbSlice(feats, 200L)
    assert(out.select("wallet_address").as[String].collect().toSeq == Seq("0xb"))
    assert(!out.columns.contains("address_partition"))
    val rp = Seq(("0xa", 100L), ("0xb", 300L)).toDF("wallet_address", "last_rugpull_ts")
    assert(RugpullFeatures.featuresDbSlice(rp, 200L)
      .select("wallet_address").as[String].collect().toSeq == Seq("0xb"))
  }

  test("stageLoad: full-then-incremental with the >= re-read deduped by the anti-join") {
    val root = tmpDir("stage")
    def blocks(rows: (Long, Long, String, Long, String)*) =
      rows.toDF("timestamp", "number", "hash", "transaction_count", "date_partition")
    val batch1 = blocks(
      (1704067200L, 100L, "bh100", 1L, "2024-01"),
      (1704067212L, 101L, "bh101", 1L, "2024-01"))
    StageCleaners.stageLoad(spark, "ethereum_blocks", batch1, root,
      StageCleaners.cleanBlocks)
    assert(Lakehouse.read(spark, s"$root/ethereum_blocks").count() == 2)
    // second batch re-carries the watermark block (>= re-selects it) plus
    // one genuinely new block: the anti-join keeps the table duplicate-free
    val batch2 = blocks(
      (1704067212L, 101L, "bh101", 1L, "2024-01"),
      (1704067224L, 102L, "bh102", 1L, "2024-01"))
    StageCleaners.stageLoad(spark, "ethereum_blocks", batch2, root,
      StageCleaners.cleanBlocks)
    val after = Lakehouse.read(spark, s"$root/ethereum_blocks")
    assert(after.count() == 3)
    assert(after.select("number").as[Long].collect().sorted.toSeq == Seq(100L, 101L, 102L))
  }
}
