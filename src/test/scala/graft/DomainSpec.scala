package graft

import graft.core.Schemas
import graft.pipeline.DomainTransforms
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.sql.Date

/** Fixture-driven specs for the domain (Ethereum-table) transforms — the
  * edge cases FIXTURES.md prescribes from the reference's own test style:
  * reward traces, delegatecall filtering, parent-duplicate traces,
  * try_cast value guards, latest-metadata picks, odd-decimals integer
  * division, rugpull date windows, GENESIS filtering, topics repair. */
class DomainSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private def dec(v: String) = new java.math.BigDecimal(v).setScale(9)

  private def trace(hash: String, from: String, to: String, traceType: String,
      callType: String, rewardType: String, value: String): Row =
    Row(hash, from, to, traceType, callType, rewardType, "t1", null,
      dec(value), 100L, 90L, 0L, 1L, 1704067200L, 100L, "2024-01")

  private def tx(hash: String, from: String, to: String, value: String,
      gasPrice: Long = 1000000000L, gasUsed: Long = 21000L,
      ts: Long = 1704067200L): Row =
    Row(hash, from, to, 1L, 0L, 21000L, gasPrice, 0L, gasUsed, 1L,
      ts, 100L, 0L, 0L, gasPrice, dec(value), "0x", "bh", null,
      "2", "2024-01")

  test("internalTransactions: trace filters, parent-dup drop, reward synthesis") {
    val traces = df(Schemas.traces,
      trace("h1", "a", "b", "call", "call", null, "5"),       // kept: differs from parent
      trace("h2", "a", "b", "call", "delegatecall", null, "5"), // dropped: call_type
      trace("h3", "a", "b", "call", null, null, "5"),         // kept: NULL call_type survives NOT COALESCE
      trace("h4", "a", "b", "call", "call", null, "0"),       // dropped: value=0
      trace("hp", "pf", "pt", "call", "call", null, "7"),     // dropped: duplicates parent tx exactly
      trace("hv", "pf", "pt", "call", "call", null, "5"),     // kept: same from/to, DIFFERENT value
      trace(null, null, "miner1", "reward", null, "block", "3")) // reward row
    val txs = df(Schemas.transactions,
      tx("h1", "x", "y", "9"), tx("h3", "x", "y", "9"),
      tx("hp", "pf", "pt", "7"), tx("hv", "pf", "pt", "7"))
    val out = DomainTransforms.internalTransactions(traces, txs)
    val hashes = out.select("transaction_hash").collect().map(_.getString(0)).toSet
    assert(hashes == Set("h1", "h3", "hv", "REWARD_miner1"))
    val reward = out.filter(col("transaction_hash") === "REWARD_miner1").head()
    assert(reward.getAs[String]("from_address") == "REWARD_block")
    // wei -> ETH via the split-power quirk: 5 wei / 10^9 / 10^9
    val v = out.filter(col("transaction_hash") === "h1").head().getAs[Double]("eth_value")
    assert(math.abs(v - 5e-18) < 1e-30)
  }

  test("normalTransactions: contract flags + rugpull 1-day window") {
    val txs = df(Schemas.transactions,
      tx("t_in", "u1", "0xrug", "1000000000000000000"), // on rugpull date -> match
      tx("t_next", "u4", "0xrug", "1000000000000000000",
        ts = 1704067200L + 86400L), // day AFTER the announcement -> match (:95-97)
      tx("t_out", "u2", "0xrug2", "1000000000000000000"), // 4 days before its rugpull date
      tx("t_plain", "u3", "0xc1", "2000000000000000000"))
    val blocks = df(Schemas.blocks,
      Row(1704067200L, null, 100L, "bh", "ph", "n", "m", dec("1"), dec("1"),
        1L, 1L, 1L, 1L, 7L, "2024-01"))
    val contracts = df(Schemas.contracts,
      Row("0xc1", "0x60", true, false, 1704067200L, 99L, "c1", "2024-01"))
    // tx dates are all 2024-01-01; 0xRUG announced that day (in window),
    // 0xRUG2 announced Jan 5 (window (Jan 4, Jan 5] — tx outside). Mixed
    // case in the list exercises the lower() normalization.
    val rugs = df(Schemas.rugpullMarketData,
      Row("0xRUG", Date.valueOf("2024-01-01")),
      Row("0xRUG2", Date.valueOf("2024-01-05")))
    val out = DomainTransforms.normalTransactions(txs, blocks, contracts, rugs)
    val byHash = out.collect().map(r => r.getAs[String]("hash") -> r).toMap
    assert(byHash("t_in").getAs[Boolean]("is_rugpull"))
    assert(byHash("t_next").getAs[Boolean]("is_rugpull")) // day-after branch
    assert(!byHash("t_out").getAs[Boolean]("is_rugpull")) // outside [rd, rd+1]
    assert(!byHash("t_plain").getAs[Boolean]("is_rugpull"))
    assert(byHash("t_plain").getAs[Boolean]("to_is_contract"))
    assert(!byHash("t_plain").getAs[Boolean]("from_is_contract"))
    // eth_value = 1e18 wei -> 1.0; tx_fee = 21000 * 1e9 / 1e18
    assert(math.abs(byHash("t_in").getAs[Double]("eth_value") - 1.0) < 1e-12)
    assert(math.abs(byHash("t_in").getAs[Double]("tx_fee") - 2.1e-5) < 1e-18)
  }

  test("erc20Transactions: try_cast guard, latest-metadata pick, odd-decimals division") {
    val transfers = df(Schemas.tokenTransfersRaw,
      Row("0xtok", "a", "b", "h1", "bh", "1000000000", 0L, 1704067200L, 100L, "2024-01"),
      Row("0xtok", "a", "b", "h2", "bh", "garbage", 1L, 1704067200L, 100L, "2024-01"))
    val meta = df(Schemas.tokensMetadata,
      Row("0xtok", "OLD", 18L, 1L),
      Row("0xtok", "NEW", 9L, 2L)) // latest row wins: decimals=9
    val out = DomainTransforms.erc20Transactions(transfers, meta)
    val byHash = out.collect().map(r => r.getAs[String]("transaction_hash") -> r).toMap
    assert(byHash.size == 2 && byHash("h1").getAs[String]("symbol") == "NEW")
    // garbage value -> 0 via try_cast guard
    assert(byHash("h2").getAs[java.math.BigDecimal]("value").doubleValue() == 0.0)
    // THE quirk: decimals=9 divides by 10^(9 div 2) twice = 10^8, NOT 10^9
    assert(math.abs(byHash("h1").getAs[Double]("token_value") - 10.0) < 1e-9)
  }

  test("walletTransactions: 3-way union, role pivot, GENESIS/burn/contract filters, address_partition") {
    val burn = DomainTransforms.BurnAddress
    val normal = df(Schemas.transactions,
      tx("n1", "0xaa11", "0xbb22", "1000000000000000000"),
      tx("n2", "GENESIS", "0xbb22", "1000000000000000000"), // sender dropped (GENESIS)
      tx("n3", "0xcc33", burn, "1000000000000000000"),      // receiver dropped (burn)
      tx("n4", "0xdd44", "0xc1", "1000000000000000000"))    // receiver dropped (contract)
      .withColumn("eth_value", lit(1.0)).withColumn("tx_fee", lit(0.001))
      .withColumn("from_is_contract", lit(false))
      .withColumn("to_is_contract", col("to_address") === "0xc1")
    val internal = spark.createDataFrame(Seq(
      ("i1", "0xcc33", "0xdd44", 0.5, 1704067200L, 100L, "2024-01")))
      .toDF("transaction_hash", "from_address", "to_address", "eth_value",
        "block_timestamp", "block_number", "date_partition")
    val erc20 = spark.createDataFrame(Seq(
      ("e1", "0xee55", null.asInstanceOf[String], 2.0, 1704067200L, 100L, "2024-01")))
      .toDF("transaction_hash", "from_address", "to_address", "token_value",
        "block_timestamp", "block_number", "date_partition")
    val out = DomainTransforms.walletTransactions(normal, internal, erc20)
    // n1 (2) + n2 (receiver only) + n3 (sender only) + n4 (sender only)
    // + i1 (2) + e1 (sender only: null receiver) = 8
    assert(out.count() == 8)
    assert(out.filter(col("wallet_address") === "GENESIS").count() == 0)
    assert(out.filter(col("wallet_address") === burn).count() == 0)
    assert(out.filter(col("wallet_address") === "0xc1").count() == 0)
    val senderFee = out.filter(col("transaction_hash") === "n1" && col("role") === "sender")
      .head().getAs[Double]("tx_fee")
    val receiverFee = out.filter(col("transaction_hash") === "n1" && col("role") === "receiver")
      .head().getAs[Double]("tx_fee")
    assert(senderFee == 0.001 && receiverFee == 0.0)
    val part = out.filter(col("wallet_address") === "0xaa11").head()
      .getAs[String]("address_partition")
    assert(part == "aa") // substr(addr, 3, 2)
    val pri = out.select("transaction_type", "priority").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(pri == Map("normal" -> 1, "internal" -> 2, "erc20" -> 3))
  }

  test("normalTransactions: contracts side is never hard-broadcast (scale guard)") {
    // With the auto-broadcast threshold off, the ONLY BroadcastExchange
    // allowed is the hinted rugpull dim (a bounded external list). The
    // contracts existence-flag joins must plan as shuffle joins — a
    // broadcast() hint there OOMs executors at the real table's size
    // (tens of millions of contracts).
    val txs = df(Schemas.transactions, tx("t1", "a", "b", "1"))
    val blocks = df(Schemas.blocks,
      Row(1704067200L, null, 100L, "bh", "ph", "n", "m", dec("1"), dec("1"),
        1L, 1L, 1L, 1L, 7L, "2024-01"))
    val contracts = df(Schemas.contracts,
      Row("0xc1", "0x60", true, false, 1704067200L, 99L, "c1", "2024-01"))
    val rugs = df(Schemas.rugpullMarketData, Row("0xRUG", Date.valueOf("2024-01-01")))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = DomainTransforms.normalTransactions(txs, blocks, contracts, rugs)
        .queryExecution.executedPlan.toString
      val n = plan.sliding("BroadcastExchange".length).count(_ == "BroadcastExchange")
      assert(n == 1, s"expected only the hinted rugpull broadcast, got $n:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("raw layer: transactions ⋈ receipts with receipt_ renames (raw_data_ingestion_pipeline.py:142-172)") {
    import graft.pipeline.RawIngestion
    val txs = df(Schemas.rawTransactionsCsv,
      Row("h1", "a", "b", 1L, 0L, 21000L, 5L, 6L, 7L, dec("9"), "0x", "bh",
        1704067200L, 100L, "2"),
      Row("h2", "a", "b", 1L, 0L, 21000L, 5L, 6L, 7L, dec("9"), "0x", "bh",
        1704067200L, 100L, "2"))
    val receipts = df(Schemas.receiptsCsv,
      Row("h1", 100L, 42000L, 21000L, null, "r", 1L, 5L),
      Row("h2", 999L, 42000L, 21000L, null, "r", 1L, 5L)) // wrong block -> dropped
    val out = RawIngestion.transactionsWithReceipts(txs, receipts)
    assert(out.count() == 1) // inner join on (hash, block_number)
    val r = out.head()
    assert(r.getAs[Long]("receipt_gas_used") == 21000L)
    assert(r.getAs[Long]("receipt_cumulative_gas_used") == 42000L)
    assert(r.getAs[Long]("receipt_status") == 1L)
    assert(r.getAs[String]("date_partition") == "2024-01")
    assert(!out.columns.contains("transaction_hash")) // join key dropped (:171)
  }

  test("raw layer: blocks enrich attaches timestamp (+hash) to logs/transfers/traces") {
    import graft.pipeline.RawIngestion
    val blocks = df(Schemas.rawBlocksCsv, Row(1704067200L, 100L, "bh100", 7L))
    val logs = df(Schemas.rawLogsCsv, Row(0L, "h1", "0xc", "0x", "t1|t2", 100L))
      .withColumn("topics", split(col("topics"), "\\|"))
    val lg = RawIngestion.logsWithBlocks(logs, blocks).head()
    assert(lg.getAs[Long]("block_timestamp") == 1704067200L)
    assert(lg.getAs[String]("date_partition") == "2024-01")
    val transfers = df(Schemas.rawTokenTransfersCsv,
      Row("0xtok", "a", "b", "h1", "1000", 0L, 100L))
    val tr = RawIngestion.tokenTransfersWithBlocks(transfers, blocks).head()
    assert(tr.getAs[String]("block_hash") == "bh100")
    assert(tr.getAs[Long]("block_timestamp") == 1704067200L)
    // traces: 45-digit value (> 1e38) clamps to its first 28 chars (:656-670)
    val big = "1" * 45
    val traces = df(Schemas.rawTracesCsv,
      Row("h1", "a", "b", "call", "call", null, "t", null, big, 1L, 1L, 0L, 1L, 100L),
      Row("h2", "a", "b", "call", "call", null, "t", null, "500", 1L, 1L, 0L, 1L, 100L))
    val byHash = RawIngestion.tracesWithBlocks(traces, blocks).collect()
      .map(r => r.getAs[String]("transaction_hash") -> r).toMap
    assert(byHash("h1").getAs[String]("value") == "1" * 28)
    assert(byHash("h2").getAs[String]("value") == "500")
    assert(byHash("h1").getAs[String]("block_hash") == "bh100")
  }

  test("repairLogTopics: char-exploded arrays reassembled, intact arrays untouched") {
    val t1 = "0x" + "a" * 64
    val t2 = "0x" + "b" * 64
    val exploded = (t1 + t2).split("").toSeq // every char its own element
    val intact = Seq(t1, t2)
    val logs = df(Schemas.logs,
      Row(0L, "h1", "0xc", "0x", exploded, 1704067200L, 100L, "2024-01"),
      Row(1L, "h2", "0xc", "0x", intact, 1704067200L, 100L, "2024-01"))
    val out = DomainTransforms.repairLogTopics(logs)
    val byHash = out.collect().map(r => r.getAs[String]("transaction_hash") ->
      r.getAs[scala.collection.Seq[String]]("topics").toSeq).toMap
    assert(byHash("h1") == Seq(t1, t2), byHash("h1"))
    assert(byHash("h2") == Seq(t1, t2))
  }
}
