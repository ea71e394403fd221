package graft

import graft.core.Schemas
import graft.pipeline.DomainTransforms
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.sql.Date

/** Fixture-driven specs for the domain (Ethereum-table) transforms — the
  * edge cases FIXTURES.md prescribes from the reference's own test style:
  * reward traces, delegatecall filtering, parent-duplicate traces,
  * value guards, latest-metadata picks, odd-decimals integer division,
  * rugpull date windows, GENESIS filtering, error zeroing, topics repair,
  * and the raw-layer merges. */
class DomainSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import spark.implicits._

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private def dec(v: String) = new java.math.BigDecimal(v).setScale(9)

  private def trace(hash: String, from: String, to: String, traceType: String,
      callType: String, rewardType: String, value: String, status: Long = 1L): Row =
    Row(hash, from, to, traceType, callType, rewardType, "t1", null,
      dec(value), 100L, 90L, 0L, status, 1704067200L, 100L, "2024-01")

  private def tx(hash: String, from: String, to: String, value: String,
      gasPrice: Long = 1000000000L, gasUsed: Long = 21000L,
      ts: Long = 1704067200L): Row =
    Row(hash, from, to, 1L, 0L, 21000L, gasPrice, 0L, gasUsed, 1L,
      ts, 100L, 0L, 0L, gasPrice, dec(value), "0x", "bh", null,
      "2", "2024-01")

  private val noContracts = spark.createDataFrame(
    new java.util.ArrayList[Row](), Schemas.contracts)
  private val noRugpulls = spark.createDataFrame(
    new java.util.ArrayList[Row](), Schemas.rugpullMarketData)

  test("internalTransactions: trace filters, parent-dup drop, reward synthesis, token columns") {
    val traces = df(Schemas.traces,
      trace("h1", "a", "b", "call", "call", null, "5"),       // kept: differs from parent
      trace("h2", "a", "b", "call", "delegatecall", null, "5"), // dropped: call_type
      trace("h3", "a", "b", "call", null, null, "5"),         // kept: NULL call_type survives NOT COALESCE
      trace("h4", "a", "b", "call", "call", null, "0"),       // dropped: value=0
      trace("hp", "pf", "pt", "call", "call", null, "7"),     // dropped: duplicates parent tx exactly
      trace("hv", "pf", "pt", "call", "call", null, "5"),     // kept: same from/to, DIFFERENT value
      trace("he", "a", "b", "call", "call", null, "5", status = 0L), // kept, is_error = true
      trace(null, null, "miner1", "reward", null, "block", "3")) // reward row
    val txs = df(Schemas.transactions,
      tx("h1", "x", "y", "9"), tx("h3", "x", "y", "9"), tx("he", "x", "y", "9"),
      tx("hp", "pf", "pt", "7"), tx("hv", "pf", "pt", "7"))
    val out = DomainTransforms.internalTransactions(traces, txs, noContracts, noRugpulls)
    val hashes = out.select("transaction_hash").collect().map(_.getString(0)).toSet
    assert(hashes == Set("h1", "h3", "hv", "he", "REWARD_miner1"))
    val byHash = out.collect().map(r => r.getAs[String]("transaction_hash") -> r).toMap
    assert(byHash("REWARD_miner1").getAs[String]("from_address") == "REWARD_block")
    // wei -> ETH via the split-power quirk: 5 wei / 10^9 / 10^9
    assert(math.abs(byHash("h1").getAs[Double]("current_value") - 5e-18) < 1e-30)
    assert(byHash("h1").getAs[String]("contract_address") == "ETH")
    assert(byHash("h1").getAs[Long]("token_decimal") == 18L)
    assert(!byHash("h1").getAs[Boolean]("is_error"))
    assert(byHash("he").getAs[Boolean]("is_error")) // trace status 0
  }

  test("normalTransactions: error status, rugpull flags, token columns, fee association") {
    val txs = df(Schemas.transactions,
      tx("t_in", "u1", "0xrug", "1000000000000000000"), // to a rugpull token on its date
      tx("t_next", "u4", "0xrug", "1000000000000000000",
        ts = 1704067200L + 86400L), // day AFTER the announcement -> match (:95-97)
      tx("t_out", "u2", "0xrug2", "1000000000000000000"), // 4 days before its rugpull date
      tx("t_plain", "u3", "0xc1", "2000000000000000000"),
      tx("t_err", "u5", "0xok", "1000000000000000000"))
    val blocks = df(Schemas.blocks,
      Row(1704067200L, null, 100L, "bh", "ph", "n", "m", dec("1"), dec("1"),
        1L, 1L, 1L, 1L, 7L, "2024-01"))
    val contracts = df(Schemas.contracts,
      Row("0xc1", "0x60", true, false, 1704067200L, 99L, "c1", "2024-01"))
    val rugs = df(Schemas.rugpullMarketData,
      Row("0xRUG", Date.valueOf("2024-01-01")),
      Row("0xRUG2", Date.valueOf("2024-01-05")))
    val traces = df(Schemas.traces,
      trace("t_err", "u5", "0xok", "call", "call", null, "1", status = 0L))
    val out = DomainTransforms.normalTransactions(txs, blocks, contracts, rugs, traces)
    val byHash = out.collect().map(r => r.getAs[String]("hash") -> r).toMap
    // to_address_is_rugpull is the live flag (is_rugpull matches the
    // always-'ETH' contract_address — the reference's near-constant false)
    assert(byHash("t_in").getAs[Boolean]("to_address_is_rugpull"))
    assert(byHash("t_next").getAs[Boolean]("to_address_is_rugpull"))
    assert(!byHash("t_out").getAs[Boolean]("to_address_is_rugpull"))
    assert(!byHash("t_plain").getAs[Boolean]("to_address_is_rugpull"))
    assert(out.filter(col("is_rugpull")).count() == 0)
    assert(byHash("t_plain").getAs[Boolean]("to_is_contract"))
    assert(!byHash("t_plain").getAs[Boolean]("from_is_contract"))
    assert(byHash("t_err").getAs[Boolean]("is_error")) // trace status 0
    assert(!byHash("t_in").getAs[Boolean]("is_error"))
    assert(byHash("t_in").getAs[String]("contract_address") == "ETH")
    // current_value = 1e18 wei -> 1.0; tx_fee = 21000 * (1e9 / 1e18)
    assert(math.abs(byHash("t_in").getAs[Double]("current_value") - 1.0) < 1e-12)
    assert(math.abs(byHash("t_in").getAs[Double]("tx_fee") - 2.1e-5) < 1e-18)
  }

  test("erc20Transactions: value guard + >0 filter, failed-trace drop, latest-metadata pick, odd-decimals division") {
    val transfers = df(Schemas.tokenTransfersRaw,
      Row("0xtok", "a", "b", "h1", "bh", "1000000000", 0L, 1704067200L, 100L, "2024-01"),
      Row("0xtok", "a", "b", "h2", "bh", "garbage", 1L, 1704067200L, 100L, "2024-01"), // ->0, dropped by value>0
      Row("0xtok", "a", "b", "h3", "bh", "1000000000", 2L, 1704067200L, 100L, "2024-01")) // failed trace
    val meta = df(Schemas.tokensMetadata,
      Row("0xtok", "OLD", 18L, 1L),
      Row("0xtok", "NEW", 9L, 2L)) // latest row wins: decimals=9
    val txs = df(Schemas.transactions,
      tx("h1", "a", "b", "0"), tx("h2", "a", "b", "0"), tx("h3", "a", "b", "0"))
    val traces = df(Schemas.traces,
      trace("h1", "a", "b", "call", "call", null, "1", status = 1L),
      trace("h3", "a", "b", "call", "call", null, "1", status = 0L)) // status != 1 -> dropped
    val out = DomainTransforms.erc20Transactions(transfers, meta, txs, traces,
      noContracts, noRugpulls)
    val rows = out.collect().map(r => r.getAs[String]("transaction_hash") -> r).toMap
    assert(rows.keySet == Set("h1")) // h2 value->0 filtered; h3 failed trace
    assert(rows("h1").getAs[String]("token_symbol") == "NEW")
    // THE quirk: decimals=9 divides by 10^(9 div 2) twice = 10^8, NOT 10^9
    assert(math.abs(rows("h1").getAs[Double]("current_value") - 10.0) < 1e-9)
    assert(rows("h1").getAs[Long]("transaction_index") == 0L) // from the tx join
  }

  test("walletTransactions: 3-way union, role pivot, filters, error zeroing, interacted_with") {
    val burn = DomainTransforms.BurnAddress
    def analytics(rows: (String, String, String, Double, Double, Boolean, Boolean, Boolean)*) =
      // (hash, from, to, value, fee, fromIsContract, toIsContract, isError)
      rows.toDF("transaction_hash", "from_address", "to_address", "current_value",
        "tx_fee", "from_is_contract", "to_is_contract", "is_error")
        .withColumn("transaction_index", lit(5L))
        .withColumn("from_hash_partition", substring(col("from_address"), 3, 2))
        .withColumn("to_hash_partition", substring(col("to_address"), 3, 2))
        .withColumn("contract_address", lit("ETH"))
        .withColumn("token_symbol", lit("ETH"))
        .withColumn("token_decimal", lit(18L))
        .withColumn("is_rugpull", lit(false))
        .withColumn("to_address_is_rugpull", lit(false))
        .withColumn("block_timestamp", lit(1704067200L))
        .withColumn("block_number", lit(100L))
        .withColumn("date_partition", lit("2024-01"))
    val normal = analytics(
      ("n1", "0xaa11", "0xbb22", 1.0, 0.001, false, false, false),
      ("n2", "GENESIS", "0xbb22", 1.0, 0.001, false, false, false), // sender dropped
      ("n3", "0xcc33", burn, 1.0, 0.001, false, false, false),      // receiver dropped
      ("n4", "0xdd44", "0xc1", 1.0, 0.001, false, true, false),     // receiver dropped (contract)
      ("n5", "0xc2", "0xc1", 1.0, 0.001, true, true, false),        // contract<->contract: gone
      ("ne", "0xaa11", "0xbb22", 3.0, 0.001, false, false, true))   // error -> amount zeroed
      .withColumnRenamed("transaction_hash", "hash")
    val internal = analytics(("i1", "0xcc33", "0xdd44", 0.5, 0.0, false, false, false))
    val erc20 = analytics(("e1", "0xee55", null, 2.0, 0.0, false, false, false))
    val out = DomainTransforms.walletTransactions(normal, internal, erc20)
    // n1 (2) + n2 (receiver) + n3 (sender) + n4 (sender) + ne (2)
    // + i1 (2) + e1 (sender: null receiver) = 10
    assert(out.count() == 10)
    assert(out.filter(col("wallet_address") === "GENESIS").count() == 0)
    assert(out.filter(col("wallet_address") === burn).count() == 0)
    assert(out.filter(col("wallet_address").isin("0xc1", "0xc2")).count() == 0)
    val n1s = out.filter(col("transaction_hash") === "n1" && col("role") === "sender").head()
    assert(n1s.getAs[Double]("tx_fee") == 0.001)
    assert(n1s.getAs[String]("interacted_with") == "0xbb22")
    assert(n1s.getAs[String]("address_partition") == "aa")
    assert(n1s.getAs[Long]("transaction_index") == 5L)
    val n1r = out.filter(col("transaction_hash") === "n1" && col("role") === "receiver").head()
    assert(n1r.getAs[Double]("tx_fee") == 0.0)
    assert(n1r.getAs[String]("interacted_with") == "0xaa11")
    assert(n1r.getAs[String]("address_partition") == "bb")
    // error rows survive with a ZEROED amount (:38,:65)
    val ne = out.filter(col("transaction_hash") === "ne" && col("role") === "sender").head()
    assert(ne.getAs[Double]("amount") == 0.0)
    // internal/erc20 carry NULL transaction_index (:10,:62)
    val i1 = out.filter(col("transaction_hash") === "i1").head()
    assert(i1.isNullAt(i1.fieldIndex("transaction_index")))
    val pri = out.select("transaction_type", "priority").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(pri == Map("normal" -> 1, "internal" -> 2, "erc20" -> 3))
  }

  test("existence-flag joins never fan a transaction out (duplicate dims, multi-date rugpulls, conflicting trace statuses)") {
    val txs = df(Schemas.transactions,
      tx("t1", "u1", "0xrug", "1000000000000000000",
        ts = 1704067200L + 86400L), // matches TWO in-window rugpull dates
      tx("t2", "u2", "0xdup", "2000000000000000000"))
    val blocks = df(Schemas.blocks,
      Row(1704067200L, null, 100L, "bh", "ph", "n", "m", dec("1"), dec("1"),
        1L, 1L, 1L, 1L, 7L, "2024-01"))
    // the same contract address twice (re-export under a new block), and
    // a rugpull announced on two consecutive days, both inside t1's window
    val contracts = df(Schemas.contracts,
      Row("0xdup", "0x60", true, false, 1704067200L, 99L, "c1", "2024-01"),
      Row("0xdup", "0x60", true, false, 1704067300L, 100L, "c1", "2024-01"))
    val rugs = df(Schemas.rugpullMarketData,
      Row("0xRUG", Date.valueOf("2024-01-01")),
      Row("0xRUG", Date.valueOf("2024-01-02")))
    // conflicting statuses for the same (hash, block, from, to): a
    // re-export corrected status 0 -> 1
    val traces = df(Schemas.traces,
      trace("t2", "u2", "0xdup", "call", "call", null, "1", status = 0L),
      trace("t2", "u2", "0xdup", "call", "call", null, "1", status = 1L))
    val out = DomainTransforms.normalTransactions(txs, blocks, contracts, rugs, traces)
    assert(out.count() == 2,
      s"a flag join fanned transactions out: ${out.count()} rows for 2 txs")
    val byHash = out.collect().map(r => r.getAs[String]("hash") -> r).toMap
    assert(byHash("t1").getAs[Boolean]("to_address_is_rugpull"),
      "multi-date rugpull lost the flag while deduping")
    assert(byHash("t2").getAs[Boolean]("to_is_contract"),
      "duplicate contract rows lost the flag while deduping")
    assert(!byHash("t2").getAs[Boolean]("is_error"),
      "corrected trace status must win (max(status) semantics)")
  }

  test("normalTransactions: contracts side is never hard-broadcast (scale guard)") {
    // With the auto-broadcast threshold off, the ONLY BroadcastExchanges
    // allowed are the hinted rugpull dims (a bounded external list, joined
    // twice — Spark may reuse one exchange). The contracts existence-flag
    // joins must plan as shuffle joins — a broadcast() hint there OOMs
    // executors at the real table's size (tens of millions of contracts).
    val txs = df(Schemas.transactions, tx("t1", "a", "b", "1"))
    val blocks = df(Schemas.blocks,
      Row(1704067200L, null, 100L, "bh", "ph", "n", "m", dec("1"), dec("1"),
        1L, 1L, 1L, 1L, 7L, "2024-01"))
    val contracts = df(Schemas.contracts,
      Row("0xc1", "0x60", true, false, 1704067200L, 99L, "c1", "2024-01"))
    val rugs = df(Schemas.rugpullMarketData, Row("0xRUG", Date.valueOf("2024-01-01")))
    val traces = df(Schemas.traces,
      trace("t1", "a", "b", "call", "call", null, "1"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = DomainTransforms.normalTransactions(txs, blocks, contracts, rugs, traces)
        .queryExecution.executedPlan.toString
      // the contracts existence-flag joins (on c_from/c_to) must never be
      // broadcast joins, regardless of how many rugpull broadcasts plan
      val badBroadcast = plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && (l.contains("c_from") || l.contains("c_to")))
      assert(!badBroadcast, s"contracts side planned as broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
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
