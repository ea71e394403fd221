package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship composite pipeline — the reference's wallet-features program
  * (ethereum_wallet_features.sql:14-327) re-expressed end-to-end over
  * `events` — plus the remaining §2 operator gaps (W10 FIRST_VALUE, J6
  * self-join filter, J9 dedup'd-dim join, the §2.8 scalar/JSON surface, and
  * the nondeterministic uuid source).
  */
object PipelineQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)

  // event-order key single-sourced in EventOrder (QueryDef.scala)
  private val typePriority = EventOrder.typePriority
  private val typePrioritySql = EventOrder.typePrioritySql

  /** Deterministic wallet-transactions + daily-prices fixture for the
    * priced flagship program. Every event yields a sender and a receiver
    * row; purchase events yield an EXTRA ERC-20 leg on a token contract
    * under the SAME hash (the cross-contract hash case the wallet-wide
    * hash_rank dedups); 'error' contracts are absent from the token
    * metadata (decimals = 0 stand-in), so the contract gate drops them.
    * Prices are n/16 doubles (exactly representable) per (contract, day)
    * with deterministic gaps, spanning [first event day - 9, last + 9] so
    * future-only nearest picks occur. Each contract's prices carry a
    * deterministic intra-day hour offset so the 7-day bound exercises the
    * reference's date_diff('day') truncation (a midnight-only fixture
    * cannot distinguish truncated-diff from calendar-day arithmetic). */
  def pricedFixture(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val dayUs = 86400000000L
    val ev = events(s, dir).select(
      col("event_id"), col("ts_us"), col("event_type"), col("value"), col("user_id"),
      coalesce(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"), lit(-1L)).as("cp"))
    val main = ev.select(
      col("event_id"), col("ts_us"), col("value"), col("user_id"), col("cp"),
      when(col("event_type") === "purchase", "ETH").otherwise(col("event_type"))
        .as("contract_address"),
      when(col("event_type") === "purchase",
          when(pmod(col("event_id"), lit(2L)) === 0, "normal").otherwise("internal"))
        .otherwise("erc20").as("transaction_type"))
    val tokenLeg = ev.filter(col("event_type") === "purchase").select(
      col("event_id"), col("ts_us"), col("value"), col("user_id"), col("cp"),
      concat(lit("tok"), pmod(col("event_id"), lit(3L)).cast("string")).as("contract_address"),
      lit("erc20").as("transaction_type"))
    val tx0 = main.unionByName(tokenLeg).select(
      col("event_id").cast("string").as("transaction_hash"),
      col("ts_us").as("block_timestamp"),
      col("contract_address"), col("transaction_type"),
      pmod(col("event_id"), lit(500L)).as("transaction_index"),
      when(col("transaction_type") === "normal", 1)
        .when(col("transaction_type") === "internal", 2).otherwise(3).as("priority"),
      col("value"), col("user_id"), col("cp"))
    val common = Seq("transaction_hash", "block_timestamp", "contract_address",
      "transaction_type", "transaction_index", "priority")
    val sender = tx0.select(
      (col("user_id").cast("string").as("wallet_address") +:
        lit("sender").as("role") +: col("value").as("amount") +:
        when(col("transaction_type") === "normal", col("value") * lit(0.001))
          .otherwise(lit(0.0)).as("tx_fee") +: common.map(col)): _*)
    val receiver = tx0.select(
      (col("cp").cast("string").as("wallet_address") +:
        lit("receiver").as("role") +: col("value").as("amount") +:
        lit(0.0).as("tx_fee") +: common.map(col)): _*)
    // The fixture stands in for the STORED wallet_transactions table (in
    // production a lake table read once, not recomputed per consumer) —
    // persist() expresses exactly that: without it every window/join branch
    // of the flagship programs re-derives the 4-branch union from the
    // events scan (13 parquet scans per query). Spark's cache is keyed by
    // the logical plan, so the three flagship queries share one copy.
    //
    // Measured NEGATIVE result, r16 (the g_kcore discipline): serving this
    // fixture from a ctasBucketed(wallet_address, 32) parquet layout
    // instead was A/B'd at sf0.1 — family total 10.2 s cached vs 8.9 s
    // bucketed (1.14x, below the 1.3x adoption bar; only the priced
    // program moved, 3.3 -> 2.1 s). The flagship programs' dominant cost
    // here is window compute over the (wallet, contract) grain plus the
    // union build, not the first wallet exchange the bucketing elides.
    // The PRODUCTION wallet fact is a different story and already ships
    // bucketed (DomainPipeline.loadIncrementalBucketed + the zero-exchange
    // pins in DomainPipelineSpec); this fixture stays cache-served.
    val wtx = sender.unionByName(receiver)
      .withColumn("address_partition", substring(col("wallet_address"), 1, 2))
      .persist()
    val meta = Seq("signup", "click", "tok0", "tok1", "tok2")
      .toDF("contract_address_metadata")
    val drange = ev.agg(
      min(expr(s"ts_us div $dayUs")).as("dmin"), max(expr(s"ts_us div $dayUs")).as("dmax"))
    val prices = drange
      .crossJoin(Seq("ETH", "signup", "click", "tok0", "tok1", "tok2").toDF("address"))
      .select(col("address"),
        explode(sequence(col("dmin") - 9, col("dmax") + 9)).as("day"))
      // PARITY CAVEAT: Spark pmod (always-positive) vs DuckDB `%`
      // (sign-of-dividend) agree only while day >= 0 — true for every
      // 2024-dated fixture; a regeneration with events within 9 days of
      // epoch would need both sides aligned on one modulo convention.
      .filter(pmod(col("day") + expr("ascii(right(address, 1))"), lit(5L)) =!= 0)
      .select(col("address"),
        ((pmod(col("day") * (length(col("address")) + 1) + expr("ascii(right(address, 1))"),
          lit(400L)) + 1).cast("double") / 16).as("price"),
        (col("day") * dayUs +
          pmod(expr("ascii(right(address, 1))"), lit(24L)) * 3600000000L).as("price_ts"))
    (wtx, prices, meta)
  }

  /** The DuckDB mirror of [[pricedFixture]] + the program through
    * coin_balances_final (`fin`) — shared WITH-prefix of both flagship
    * oracles. Reference semantics per ethereum_wallet_features.sql:14-261;
    * DECIMAL sums + unique tie-breaks per the engine's parity
    * conventions. */
  private val pricedFixtureSql: String =
    """WITH ev AS (
      |  SELECT CAST(event_id AS VARCHAR) AS hash, epoch_us(ts) AS ts, event_id,
      |    event_type, value, user_id,
      |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS cp
      |  FROM events),
      |tx0 AS (
      |  SELECT hash, ts,
      |    CASE WHEN event_type = 'purchase' THEN 'ETH' ELSE event_type END AS contract,
      |    CASE WHEN event_type = 'purchase'
      |         THEN (CASE WHEN event_id % 2 = 0 THEN 'normal' ELSE 'internal' END)
      |         ELSE 'erc20' END AS ttype,
      |    event_id % 500 AS tindex, value, user_id, cp
      |  FROM ev
      |  UNION ALL
      |  SELECT hash, ts, 'tok' || CAST(event_id % 3 AS VARCHAR), 'erc20',
      |    event_id % 500, value, user_id, cp
      |  FROM ev WHERE event_type = 'purchase'),
      |tx1 AS (
      |  SELECT *,
      |    CASE ttype WHEN 'normal' THEN 1 WHEN 'internal' THEN 2 ELSE 3 END AS priority,
      |    CASE WHEN ttype = 'internal' THEN 999 WHEN ttype = 'erc20' THEN 1000
      |         ELSE tindex END AS txi
      |  FROM tx0
      |  WHERE contract IN ('ETH', 'signup', 'click', 'tok0', 'tok1', 'tok2')),
      |wtx AS (
      |  SELECT CAST(user_id AS VARCHAR) AS wallet, 'sender' AS role, hash,
      |    value AS amount,
      |    CASE WHEN ttype = 'normal' THEN value * 0.001 ELSE 0.0 END AS fee,
      |    ts, contract, priority, txi, substr(CAST(user_id AS VARCHAR), 1, 2) AS ap
      |  FROM tx1
      |  UNION ALL
      |  SELECT CAST(cp AS VARCHAR), 'receiver', hash, value, 0.0, ts, contract,
      |    priority, txi, substr(CAST(cp AS VARCHAR), 1, 2)
      |  FROM tx1),
      |drange AS (
      |  SELECT MIN(ts // 86400000000) AS dmin, MAX(ts // 86400000000) AS dmax FROM ev),
      |prices AS (
      |  SELECT c.addr,
      |    CAST((d.day * (length(c.addr) + 1) + ascii(right(c.addr, 1))) % 400 + 1
      |      AS DOUBLE) / 16 AS price,
      |    d.day * 86400000000 + (ascii(right(c.addr, 1)) % 24) * 3600000000 AS pts
      |  FROM (VALUES ('ETH'),('signup'),('click'),('tok0'),('tok1'),('tok2')) c(addr)
      |  CROSS JOIN (SELECT unnest(generate_series(dmin - 9, dmax + 9)) AS day
      |              FROM drange) d
      |  WHERE (d.day + ascii(right(c.addr, 1))) % 5 <> 0),
      |p1 AS (
      |  SELECT DISTINCT p.addr, p.price, p.pts
      |  FROM prices p JOIN wtx w ON p.addr = w.contract
      |    AND p.pts // 86400000000 <= w.ts // 86400000000
      |    AND (w.ts - p.pts) // 86400000000 <= 7),
      |cbts AS (SELECT DISTINCT contract, ts FROM wtx),
      |rp AS (
      |  SELECT contract, cb_ts, price FROM (
      |    SELECT c.contract, c.ts AS cb_ts,
      |      CASE WHEN p.addr = 'ETH' THEN CAST(1 AS DOUBLE) ELSE p.price END AS price,
      |      ROW_NUMBER() OVER (PARTITION BY c.contract, c.ts
      |        ORDER BY ABS(p.pts - c.ts), p.pts, p.price) AS rnk
      |    FROM cbts c JOIN p1 p ON p.addr = c.contract
      |      AND (c.ts - p.pts) // 86400000000 <= 7)
      |  WHERE rnk = 1),
      |cb0 AS (
      |  SELECT w.*,
      |    COALESCE(rp.price, CASE WHEN w.contract = 'ETH' THEN 1 ELSE 0 END) AS peff
      |  FROM wtx w LEFT JOIN rp ON rp.contract = w.contract AND rp.cb_ts = w.ts),
      |bal AS (
      |  SELECT cb0.*,
      |    DENSE_RANK() OVER (PARTITION BY wallet, hash ORDER BY priority) AS hash_rank,
      |    ROW_NUMBER() OVER (PARTITION BY wallet, contract
      |      ORDER BY ts, priority, txi, CASE WHEN role = 'receiver' THEN 0 ELSE 1 END,
      |        hash) AS rnc,
      |    CAST(round(SUM(CAST(CASE WHEN role = 'sender' THEN -amount - fee
      |                             ELSE amount END AS DECIMAL(38,6)))
      |      OVER (PARTITION BY wallet, contract
      |        ORDER BY ts, priority, txi, CASE WHEN role = 'receiver' THEN 0 ELSE 1 END, hash
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 5) AS DOUBLE) AS bal_c,
      |    CAST(round(SUM(CAST(CASE WHEN role = 'sender' THEN (-amount * peff) - fee
      |                             ELSE amount * peff END AS DECIMAL(38,6)))
      |      OVER (PARTITION BY wallet, contract
      |        ORDER BY ts, priority, txi, CASE WHEN role = 'receiver' THEN 0 ELSE 1 END, hash
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 5) AS DOUBLE) AS bal_ec,
      |    CAST(round(SUM(CAST(CASE WHEN role = 'sender' THEN (-amount * peff) - fee
      |                             ELSE amount * peff END AS DECIMAL(38,6)))
      |      OVER (PARTITION BY wallet
      |        ORDER BY ts, priority, txi, CASE WHEN role = 'receiver' THEN 0 ELSE 1 END, hash
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 5) AS DOUBLE) AS bal_ew
      |  FROM cb0),
      |mm AS (
      |  SELECT bal.*,
      |    COALESCE(MIN(CASE WHEN bal_ec > 0 THEN bal_ec END)
      |      OVER (PARTITION BY wallet, contract), 0) AS min_ec,
      |    MAX(bal_ec) OVER (PARTITION BY wallet, contract) AS max_ec,
      |    COALESCE(MIN(CASE WHEN bal_ew > 0 THEN bal_ew END)
      |      OVER (PARTITION BY wallet), 0) AS min_ew,
      |    MAX(bal_ew) OVER (PARTITION BY wallet) AS max_ew,
      |    CAST(SUM(CAST(CASE WHEN role = 'receiver' THEN amount * peff ELSE 0 END
      |      AS DECIMAL(38,6))) OVER (PARTITION BY wallet, contract) AS DOUBLE) AS in_ec,
      |    CAST(SUM(CAST(CASE WHEN role = 'sender' THEN amount * peff ELSE 0 END
      |      AS DECIMAL(38,6))) OVER (PARTITION BY wallet, contract) AS DOUBLE) AS out_ec,
      |    CAST(SUM(CAST(fee AS DECIMAL(38,6)))
      |      OVER (PARTITION BY wallet, contract) AS DOUBLE) AS fee_c,
      |    COUNT(CASE WHEN role = 'receiver' AND hash_rank = 1 THEN 1 END)
      |      OVER (PARTITION BY wallet, contract) AS in_cnt,
      |    COUNT(CASE WHEN role = 'sender' AND hash_rank = 1 THEN 1 END)
      |      OVER (PARTITION BY wallet, contract) AS out_cnt,
      |    COUNT(CASE WHEN hash_rank = 1 THEN 1 END)
      |      OVER (PARTITION BY wallet, contract) AS tx_cnt,
      |    MIN(ts) OVER (PARTITION BY wallet, contract) AS first_ts,
      |    MAX(ts) OVER (PARTITION BY wallet, contract) AS last_ts
      |  FROM bal),
      |fin AS (
      |  SELECT wallet, contract, ap,
      |    CASE WHEN bal_c < 0 THEN 0 ELSE bal_c END AS v_total_balance,
      |    CASE WHEN bal_ec < 0 THEN 0 ELSE bal_ec END AS v_total_balance_in_eth,
      |    CASE WHEN bal_ew < 0 THEN 0 ELSE bal_ew END AS v_balance_in_eth_wallet,
      |    CASE WHEN min_ec < 0 THEN 0 ELSE min_ec END AS v_min_ec,
      |    CASE WHEN max_ec < min_ec THEN min_ec ELSE max_ec END AS v_max_ec,
      |    CASE WHEN min_ew < 0 THEN 0 ELSE min_ew END AS v_min_ew,
      |    CASE WHEN max_ew < min_ew THEN min_ew ELSE max_ew END AS v_max_ew,
      |    in_ec, out_ec, fee_c, in_cnt, out_cnt, tx_cnt, first_ts, last_ts
      |  FROM (
      |    SELECT mm.*, ROW_NUMBER() OVER (PARTITION BY wallet, contract
      |      ORDER BY ts DESC, txi DESC, rnc DESC) AS pk FROM mm)
      |  WHERE pk = 1)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------- FLAGSHIP
    // The GENERIC wallet-features shape in one plan (the driver's smoke
    // entry): deterministic event ordering (W1) → signed running balance
    // over that order (W3) → per-entity rollup (A2): totals, conditional
    // counts, min-positive balance (W5 shape), final balance via last-row
    // pick (W6), first/last timestamps (W4). The REFERENCE-faithful
    // program (prices, hash_rank, clamps, maps) is flagship_priced_features
    // / flagship_contract_map / flagship_auc_features below.
    //
    // Scale shape: ONE shuffle on user_id serves every window (same
    // partitioning reused), then the rollup is a map-side-combinable hash
    // agg over already-co-located rows — Catalyst collapses the windows and
    // the groupBy into a single exchange.
    QueryDef("flagship_wallet_features",
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
         |  FROM events),
         |ordered AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |    ORDER BY ts_us, $typePrioritySql, event_id) AS rn
         |  FROM ev),
         |bal AS (
         |  SELECT *,
         |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
         |                       WHEN event_type = 'error' THEN -value
         |                       ELSE 0 END AS DECIMAL(38,6)))
         |      OVER (PARTITION BY user_id ORDER BY rn
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance,
         |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rn_desc
         |  FROM ordered)
         |SELECT user_id,
         |  COUNT(*) AS n_events,
         |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
         |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
         |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
         |       AS DECIMAL(38,6))) AS DOUBLE) AS total_purchase_value,
         |  MIN(ts_us) AS first_ts_us,
         |  MAX(ts_us) AS last_ts_us,
         |  CAST(MAX(balance) AS DOUBLE) AS max_balance,
         |  COALESCE(CAST(MIN(CASE WHEN balance > 0 THEN balance END) AS DOUBLE), 0.0)
         |    AS min_positive_balance,
         |  CAST(MAX(CASE WHEN rn_desc = 1 THEN balance END) AS DOUBLE) AS final_balance
         |FROM bal GROUP BY user_id""".stripMargin) { (s, dir) =>
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us"), typePriority, col("event_id"))
      val ordered = events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts_us"))
        .withColumn("rn", row_number().over(wOrd))
      val signed = when(col("event_type") === "purchase", col("value"))
        .when(col("event_type") === "error", -col("value"))
        .otherwise(lit(0))
      val wRun = Window.partitionBy("user_id").orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bal = ordered
        .withColumn("balance", sum(signed.cast("decimal(38,6)")).over(wRun).cast("double"))
        .withColumn("rn_desc",
          row_number().over(Window.partitionBy("user_id").orderBy(col("rn").desc)))
      bal.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purchases"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"),
        sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0))
          .cast("decimal(38,6)")).cast("double").as("total_purchase_value"),
        min("ts_us").as("first_ts_us"),
        max("ts_us").as("last_ts_us"),
        max("balance").cast("double").as("max_balance"),
        coalesce(min(when(col("balance") > 0, col("balance"))).cast("double"), lit(0.0))
          .as("min_positive_balance"),
        max(when(col("rn_desc") === 1, col("balance"))).cast("double").as("final_balance"))
    },

    // ------------------------------------------- FLAGSHIP (domain program)
    // The ENTIRE priced WalletFeatures program (pipeline/WalletFeatures
    // .scala — ethereum_wallet_features.sql:14-327) under the oracle gate:
    // events mapped into the wallet_transactions shape (role pivot, JSON
    // counterparty, per-type contract/priority/index, an extra ERC-20 leg
    // per purchase so one hash spans two contracts), a deterministic daily
    // price table, the token-metadata contract gate, the 2-stage nearest-
    // price join, THREE running balances, clamps, and the wallet rollup
    // with the 700000 cap on MAX(total_balance_in_eth) only. The oracle
    // recomputes every stage in reference semantics.
    QueryDef("flagship_priced_features",
      s"""$pricedFixtureSql
         |SELECT wallet AS wallet_address,
         |  MAX(CASE WHEN contract = 'ETH' THEN v_total_balance_in_eth ELSE 0 END)
         |    AS wallet_total_balance_eth_only,
         |  CASE WHEN MAX(v_balance_in_eth_wallet) > 700000 THEN 0
         |       ELSE MAX(v_balance_in_eth_wallet) END AS wallet_total_balance_in_eth_and_erc20,
         |  CAST(0 AS DOUBLE) AS wallet_total_area_in_eth,
         |  CAST(0 AS DOUBLE) AS wallet_total_time_in_ever,
         |  CASE WHEN COUNT(*) = COUNT(CASE WHEN v_min_ew = 0 THEN 1 END) THEN 0
         |       ELSE MIN(CASE WHEN v_min_ew > 0 THEN v_min_ew END) END AS wallet_min_eth_ever,
         |  MAX(v_max_ew) AS wallet_max_eth_ever,
         |  MIN(first_ts) AS wallet_first_tx,
         |  MAX(last_ts) AS wallet_last_tx,
         |  CAST(SUM(in_cnt - out_cnt) AS BIGINT) AS wallet_net_incoming_tx,
         |  CAST(SUM(in_cnt) AS BIGINT) AS wallet_total_incoming_tx,
         |  CAST(SUM(out_cnt) AS BIGINT) AS wallet_total_outgoing_tx,
         |  CAST(SUM(CAST(in_ec AS DECIMAL(38,6))) AS DOUBLE) AS wallet_incoming_transactions_sum,
         |  CAST(SUM(CAST(out_ec AS DECIMAL(38,6))) AS DOUBLE) AS wallet_outgoing_transactions_sum,
         |  CAST(SUM(CAST(in_ec AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
         |    AS wallet_incoming_transactions_mean,
         |  CAST(SUM(CAST(out_ec AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
         |    AS wallet_outgoing_transactions_mean,
         |  CAST(SUM(CAST(fee_c AS DECIMAL(38,6))) AS DOUBLE) AS misc_total_fees_eth,
         |  CASE WHEN SUM(out_cnt) = 0 THEN 0
         |       ELSE CAST(SUM(CAST(fee_c AS DECIMAL(38,6))) AS DOUBLE) / SUM(out_cnt)
         |  END AS misc_avg_total_fees_eth,
         |  COUNT(contract) AS number_of_contracts,
         |  ap AS address_partition
         |FROM fin GROUP BY wallet, ap""".stripMargin) { (s, dir) =>
      val (wtx, prices, meta) = pricedFixture(s, dir)
      graft.pipeline.WalletFeatures.walletFeatures(wtx, Some(prices), Some(meta))
        .drop("contracts_aggregations")
    },

    // The same program's contracts map (ethereum_wallet_features.sql:
    // 263-276,312) verified value-for-value via double-explode — including
    // the reference's :272 quirk (the 'max_eth_balance_in_ever' slot
    // carries the MIN).
    QueryDef("flagship_contract_map",
      s"""$pricedFixtureSql
         |SELECT wallet AS wallet_address, contract AS contract_address,
         |  unnest(['total_balance','total_balance_in_eth','total_auc','total_time_in_ever',
         |          'min_eth_balance_in_ever','max_eth_balance_in_ever',
         |          'total_incoming_value_in_eth','total_outgoing_value_in_eth','total_tx_fee',
         |          'incoming_transactions_count','outgoing_transactions_count',
         |          'transactions_count','first_transaction_timestamp',
         |          'last_transaction_timestamp']) AS metric,
         |  unnest([v_total_balance, v_total_balance_in_eth, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
         |          v_min_ec, v_min_ec,
         |          in_ec, out_ec, fee_c,
         |          CAST(in_cnt AS DOUBLE), CAST(out_cnt AS DOUBLE), CAST(tx_cnt AS DOUBLE),
         |          CAST(first_ts AS DOUBLE), CAST(last_ts AS DOUBLE)]) AS metric_value
         |FROM fin""".stripMargin) { (s, dir) =>
      val (wtx, prices, meta) = pricedFixture(s, dir)
      graft.pipeline.WalletFeatures.walletFeatures(wtx, Some(prices), Some(meta))
        .select(col("wallet_address"),
          explode(col("contracts_aggregations")).as(Seq("contract_address", "details")))
        .select(col("wallet_address"), col("contract_address"),
          explode(col("details")).as(Seq("metric", "metric_value")))
    },

    // ------------------------------------------------ FLAGSHIP (AUC variant)
    // The with-AUC program (pipeline/WalletFeatures.aucContractBalances —
    // ethereum_wallet_features_with_auc.sql:181-310): LEAD holding gaps
    // (W8), running balance-days area (W9) and time-in-positive over the
    // (timestamp, type-index, row-number) order, whole-wallet maxes, the
    // latest pick and the negative-AUC clamp. Products run in exact
    // decimal (µs gaps × balances exceed 2^53); the oracle converts the
    // decimal sum to double through VARCHAR because DuckDB's direct
    // decimal->double double-rounds (int128 -> double -> /10^scale) and
    // can be off by an ulp where Spark's BigDecimal path is correctly
    // rounded.
    QueryDef("flagship_auc_features",
      s"""$pricedFixtureSql,
         |tdc AS (
         |  SELECT mm.*, ROW_NUMBER() OVER (PARTITION BY wallet
         |    ORDER BY ts, priority, txi, CASE WHEN role = 'receiver' THEN 0 ELSE 1 END,
         |      hash) AS rnw
         |  FROM mm),
         |td AS (
         |  SELECT tdc.*,
         |    COALESCE(LEAD(ts) OVER (PARTITION BY wallet, contract
         |      ORDER BY ts, txi, rnc) - ts, 0) AS td_c,
         |    COALESCE(LEAD(ts) OVER (PARTITION BY wallet
         |      ORDER BY ts, txi, rnw) - ts, 0) AS td_w
         |  FROM tdc),
         |auc AS (
         |  SELECT td.*,
         |    CAST(CAST(SUM(CAST(td_c AS DECIMAL(20,0)) * CAST(bal_ec AS DECIMAL(18,6)))
         |      OVER (PARTITION BY wallet, contract ORDER BY ts, txi, rnc
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         |      / 60 / 60 / 24 / 1000000 AS auc_c,
         |    SUM(CASE WHEN bal_ec > 0 THEN td_c ELSE 0 END)
         |      OVER (PARTITION BY wallet, contract ORDER BY ts, txi, rnc
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS time_c,
         |    CAST(CAST(SUM(CAST(td_w AS DECIMAL(20,0)) * CAST(bal_ew AS DECIMAL(18,6)))
         |      OVER (PARTITION BY wallet ORDER BY ts, txi, rnw
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         |      / 60 / 60 / 24 / 1000000 AS auc_w,
         |    SUM(CASE WHEN bal_ew > 0 THEN td_w ELSE 0 END)
         |      OVER (PARTITION BY wallet ORDER BY ts, txi, rnw
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS time_w
         |  FROM td),
         |aucmx AS (
         |  SELECT auc.*, MAX(auc_w) OVER (PARTITION BY wallet) AS mx_auc_w,
         |    MAX(time_w) OVER (PARTITION BY wallet) AS mx_time_w
         |  FROM auc),
         |apick AS (
         |  SELECT aucmx.*, ROW_NUMBER() OVER (PARTITION BY wallet, contract
         |    ORDER BY ts DESC, txi DESC, rnc DESC) AS apk FROM aucmx)
         |SELECT wallet AS wallet_address, contract AS contract_address,
         |  CASE WHEN bal_ec < 0 THEN 0 ELSE bal_ec END AS total_balance_in_eth_by_contract,
         |  CASE WHEN auc_c < 0 THEN 0 ELSE auc_c END AS total_auc_contract,
         |  CASE WHEN mx_auc_w < 0 THEN 0 ELSE mx_auc_w END AS total_auc_eth,
         |  CAST(time_c AS BIGINT) AS total_time_in_ever_contract,
         |  CAST(mx_time_w AS BIGINT) AS total_time_in_ever_eth
         |FROM apick WHERE apk = 1""".stripMargin) { (s, dir) =>
      val (wtx, prices, meta) = pricedFixture(s, dir)
      graft.pipeline.WalletFeatures.aucContractBalances(wtx, Some(prices), Some(meta))
        .select(col("wallet_address"), col("contract_address"),
          col("total_balance_in_eth_by_contract"),
          col("total_auc_contract"), col("total_auc_eth"),
          col("total_time_in_ever_contract").cast("long").as("total_time_in_ever_contract"),
          col("total_time_in_ever_eth").cast("long").as("total_time_in_ever_eth"))
    },

    // --------------------------------------------- FLAGSHIP (coin balances)
    // The coin-balances program (pipeline/CoinBalances.scala —
    // ethereum_wallet_coin_balances.sql:10-123): unpriced per-(wallet,
    // contract) balances over the (ts, priority, type-index) order with the
    // DEFAULT RANGE frame (self-transfer peers share one cumulative value
    // and DISTINCT collapses them), plain role counts (no hash_rank),
    // min/max over ALL balances, the (ts, index)-max latest pick, and the
    // output-only negative clamp + has_negative_balance flag. No metadata
    // gate — 'error' contracts flow through here.
    QueryDef("flagship_coin_balances",
      """WITH ev AS (
        |  SELECT CAST(event_id AS VARCHAR) AS hash, epoch_us(ts) AS ts, event_id,
        |    event_type, value, user_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS cp
        |  FROM events),
        |tx0 AS (
        |  SELECT hash, ts,
        |    CASE WHEN event_type = 'purchase' THEN 'ETH' ELSE event_type END AS contract,
        |    CASE WHEN event_type = 'purchase'
        |         THEN (CASE WHEN event_id % 2 = 0 THEN 'normal' ELSE 'internal' END)
        |         ELSE 'erc20' END AS ttype,
        |    event_id % 500 AS tindex, value, user_id, cp
        |  FROM ev
        |  UNION ALL
        |  SELECT hash, ts, 'tok' || CAST(event_id % 3 AS VARCHAR), 'erc20',
        |    event_id % 500, value, user_id, cp
        |  FROM ev WHERE event_type = 'purchase'),
        |tx1 AS (
        |  SELECT *,
        |    CASE ttype WHEN 'normal' THEN 1 WHEN 'internal' THEN 2 ELSE 3 END AS priority,
        |    CASE WHEN ttype = 'internal' THEN 999 WHEN ttype = 'erc20' THEN 1000
        |         ELSE tindex END AS txi
        |  FROM tx0),
        |wtx AS (
        |  SELECT CAST(user_id AS VARCHAR) AS wallet, 'sender' AS role, hash,
        |    value AS amount,
        |    CASE WHEN ttype = 'normal' THEN value * 0.001 ELSE 0.0 END AS fee,
        |    ts, contract, priority, txi, substr(CAST(user_id AS VARCHAR), 1, 2) AS ap
        |  FROM tx1
        |  UNION ALL
        |  SELECT CAST(cp AS VARCHAR), 'receiver', hash, value, 0.0, ts, contract,
        |    priority, txi, substr(CAST(cp AS VARCHAR), 1, 2)
        |  FROM tx1),
        |cb AS (
        |  SELECT w.*,
        |    CAST(round(SUM(CAST(CASE WHEN role = 'sender' THEN -amount - fee
        |                             ELSE amount END AS DECIMAL(38,6)))
        |      OVER (PARTITION BY wallet, contract ORDER BY ts, priority, txi), 5)
        |      AS DOUBLE) AS bal,
        |    CAST(SUM(CAST(CASE WHEN role = 'receiver' THEN amount ELSE 0 END
        |      AS DECIMAL(38,6))) OVER (PARTITION BY wallet, contract) AS DOUBLE) AS tin,
        |    CAST(SUM(CAST(CASE WHEN role = 'sender' THEN amount ELSE 0 END
        |      AS DECIMAL(38,6))) OVER (PARTITION BY wallet, contract) AS DOUBLE) AS tout,
        |    CAST(SUM(CAST(fee AS DECIMAL(38,6)))
        |      OVER (PARTITION BY wallet, contract) AS DOUBLE) AS tfee,
        |    COUNT(CASE WHEN role = 'receiver' THEN 1 END)
        |      OVER (PARTITION BY wallet, contract) AS icnt,
        |    COUNT(CASE WHEN role = 'sender' THEN 1 END)
        |      OVER (PARTITION BY wallet, contract) AS ocnt,
        |    COUNT(*) OVER (PARTITION BY wallet, contract) AS tcnt,
        |    MIN(ts) OVER (PARTITION BY wallet, contract) AS fts,
        |    MAX(ts) OVER (PARTITION BY wallet, contract) AS lts
        |  FROM wtx w),
        |mm AS (
        |  SELECT cb.*,
        |    MIN(bal) OVER (PARTITION BY wallet, contract) AS mn,
        |    MAX(bal) OVER (PARTITION BY wallet, contract) AS mx
        |  FROM cb),
        |lt AS (
        |  SELECT wallet, contract, ts AS max_ts, txi AS max_txi FROM (
        |    SELECT wallet, contract, ts, txi,
        |      ROW_NUMBER() OVER (PARTITION BY wallet, contract
        |        ORDER BY ts DESC, txi DESC) AS rn
        |    FROM mm) WHERE rn = 1)
        |SELECT DISTINCT
        |  mm.wallet AS wallet_address, mm.contract AS contract_address,
        |  mm.contract AS token_symbol,
        |  CASE WHEN bal < 0 THEN 0 ELSE bal END AS total_balance,
        |  mn AS min_balance_in_ever, mx AS max_balance_in_ever,
        |  tin AS total_incoming_value, tout AS total_outgoing_value,
        |  tfee AS total_tx_fee,
        |  icnt AS incoming_transactions_count, ocnt AS outgoing_transactions_count,
        |  tcnt AS transactions_count,
        |  fts AS first_transaction_timestamp, lts AS last_transaction_timestamp,
        |  bal < 0 AS has_negative_balance,
        |  mm.ap AS address_partition
        |FROM mm JOIN lt ON mm.wallet = lt.wallet AND mm.contract = lt.contract
        |  AND mm.ts = lt.max_ts AND mm.txi = lt.max_txi""".stripMargin) { (s, dir) =>
      val (wtx, _, _) = pricedFixture(s, dir)
      graft.pipeline.CoinBalances.fullLoad(wtx)
    },

    // ------------------------------------------------------------------ W10
    // FIRST_VALUE boundary stitch (ethereum_wallet_features_with_auc.sql:
    // 627-637): each event measures back to the partition's first event.
    QueryDef("w10_first_value",
      """SELECT event_id, user_id,
        |  FIRST_VALUE(event_id) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS first_event_id,
        |  epoch_us(ts) - FIRST_VALUE(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS us_since_first
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      events(s, dir).select(col("event_id"), col("user_id"),
        first("event_id").over(w).as("first_event_id"),
        (col("ts_us") - first("ts_us").over(w)).as("us_since_first"))
    },

    // ------------------------------------------------------------------- J6
    // Left self-join used only as a filter (traces dropping rows that
    // duplicate their parent tx, ethereum_internal_transactions.sql:31-36):
    // drop clicks that co-occur (same user, same timestamp) with a signup.
    QueryDef("j6_self_filter",
      """SELECT e.event_id, e.user_id, e.event_type
        |FROM events e
        |LEFT JOIN (SELECT user_id, epoch_us(ts) AS s_ts, event_id AS s_id
        |           FROM events WHERE event_type = 'signup') p
        |  ON e.user_id = p.user_id AND epoch_us(e.ts) = p.s_ts
        |WHERE NOT COALESCE(e.event_type = 'click' AND p.s_id IS NOT NULL, false)""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val parents = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("p_user"), col("ts_us").as("s_ts"), col("event_id").as("s_id"))
      ev.join(parents, col("user_id") === col("p_user") && col("ts_us") === col("s_ts"), "left_outer")
        .filter(!coalesce(col("event_type") === "click" && col("s_id").isNotNull, lit(false)))
        .select("event_id", "user_id", "event_type")
    },

    // ------------------------------------------------------------------- J9
    // Inner join against a dedup'd dimension (ERC-20 metadata after a
    // latest-per-contract pick, ethereum_erc20_transactions.sql:22-29,89-92):
    // per brand keep the newest part, then broadcast-join fact rows to it.
    QueryDef("j9_dim_dedup_join",
      """WITH dim AS (
        |  SELECT p_brand, p_partkey, p_retailprice FROM (
        |    SELECT p_brand, p_partkey, p_retailprice,
        |      ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_partkey DESC) AS rn
        |    FROM part) WHERE rn = 1)
        |SELECT d.p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN dim d ON l.l_partkey = d.p_partkey
        |GROUP BY d.p_brand""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("p_brand").orderBy(col("p_partkey").desc)
      val dim = Graft.table(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      Graft.table(s, dir, "lineitem")
        .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as("sum_qty"))
    },

    // ----------------------------------------------------------------- §2.8
    // Scalar/JSON function surface: json_extract_scalar → get_json_object
    // (ethereum_wallet_features.sql:403-416), plus the string family the
    // reference leans on (substr, lower/upper, ||, replace, length) and
    // guarded try_cast.
    QueryDef("f_scalar_surface",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        |  upper(event_type) AS type_upper,
        |  substr(event_type, 1, 3) AS type_pre,
        |  replace(event_type, 'c', 'C') AS type_repl,
        |  length(event_type) AS type_len,
        |  event_type || ':' || CAST(user_id AS VARCHAR) AS type_key,
        |  TRY_CAST(event_type AS BIGINT) AS bad_cast,
        |  COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS prop_k_safe
        |FROM events""".stripMargin) { (s, dir) =>
      // parse the JSON ONCE per row (prop_k and prop_k_safe share the
      // extraction through an explicit projection — codegen subexpression
      // elimination is not guaranteed across try_cast boundaries), and use
      // literal-string replace, not a regex engine, for the char swap.
      // bad_cast: a bare try_cast on a never-numeric column runs the
      // exception-per-row path (measured 0.95 s alone at sf0.1 — 10x the
      // whole rest of the projection); the rlike pre-validation
      // short-circuits non-numeric strings in codegen and leaves the
      // inner try_cast (still there, so overflow → NULL stays exact) to
      // fire only on numeric-looking inputs.
      events(s, dir)
        .withColumn("k_raw", get_json_object(col("props"), "$.k"))
        .select(
          col("event_id"),
          col("k_raw").cast("long").as("prop_k"),
          upper(col("event_type")).as("type_upper"),
          substring(col("event_type"), 1, 3).as("type_pre"),
          expr("replace(event_type, 'c', 'C')").as("type_repl"),
          length(col("event_type")).as("type_len"),
          concat(col("event_type"), lit(":"), col("user_id").cast("string")).as("type_key"),
          when(col("event_type").rlike("^\\s*[+-]?\\d+\\s*$"),
            expr("try_cast(event_type AS BIGINT)"))
            .otherwise(lit(null).cast("long")).as("bad_cast"),
          coalesce(expr("try_cast(k_raw AS BIGINT)"), lit(-1L)).as("prop_k_safe"))
    },

    // ------------------------------------------------------- W2 (hard part)
    // hash_rank dedup counting (SURVEY §7.4 #2, ethereum_wallet_features
    // .sql:45,128-133): COUNT only rank-1 rows (a hash appearing as
    // normal+internal+erc20 counts once) while SUM covers ALL rows — the
    // subtle mixed-cardinality aggregate the reference's counts depend on.
    QueryDef("w2b_hash_rank_counting",
      s"""WITH r AS (
         |  SELECT user_id, value,
         |    DENSE_RANK() OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
         |      ORDER BY $typePrioritySql) AS hash_rank
         |  FROM events)
         |SELECT user_id,
         |  COUNT(CASE WHEN hash_rank = 1 THEN 1 END) AS n_deduped,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
         |FROM r GROUP BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), expr("ts_us div 86400000000"))
        .orderBy(typePriority)
      events(s, dir)
        .withColumn("hash_rank", dense_rank().over(w))
        .groupBy("user_id")
        .agg(
          count(when(col("hash_rank") === 1, lit(1))).as("n_deduped"),
          count(lit(1)).as("n_rows"),
          sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
    },

    // ------------------------------------------------------- A3 (hard part)
    // The contracts map-of-maps (ethereum_wallet_features.sql:264-276,312):
    // per-key metric maps collected into an outer map per wallet, then read
    // back by double-explode (:403-430). The nested MapType columns are
    // built for real; the output is the flattened read-back so the oracle
    // verifies the round-trip value-for-value.
    QueryDef("a3b_nested_map",
      """WITH per_type AS (
        |  SELECT user_id, event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id, event_type, 'n' AS metric, CAST(n AS DOUBLE) AS metric_value
        |FROM per_type
        |UNION ALL
        |SELECT user_id, event_type, 'total' AS metric, total AS metric_value
        |FROM per_type""".stripMargin) { (s, dir) =>
      val perType = events(s, dir).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(38,6)")).cast("double").as("total"))
      val withInner = perType.select(col("user_id"), col("event_type"),
        map(lit("n"), col("n").cast("double"), lit("total"), col("total")).as("metrics"))
      val outer = withInner.groupBy("user_id")
        .agg(map_from_arrays(collect_list(col("event_type")), collect_list(col("metrics")))
          .as("contracts"))
      outer
        .select(col("user_id"), explode(col("contracts")).as(Seq("event_type", "metrics")))
        .select(col("user_id"), col("event_type"),
          explode(col("metrics")).as(Seq("metric", "metric_value")))
    },

    // ----------------------------------------------------------- SKEW/SALT
    // Salting for skewed join keys (SURVEY §4 skew handling): the fact side
    // is skewed onto 4 event_type values; the dim side is replicated across
    // 8 salt buckets and the join key widened to (key, salt), spreading each
    // hot key over 8 reducers. Results are provably identical to the
    // unsalted join — which is exactly what the oracle checks.
    QueryDef("j_salted_skew",
      """WITH dim AS (
        |  SELECT event_type, COUNT(*) AS type_total
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, d.type_total
        |FROM events e JOIN dim d ON e.event_type = d.event_type""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_total"))
      val saltedDim = dim.withColumn("salt", explode(sequence(lit(0L), lit(7L))))
        .withColumnRenamed("event_type", "d_type")
      ev.join(saltedDim,
          col("event_type") === col("d_type") && pmod(col("event_id"), lit(8)) === col("salt"))
        .select(col("event_id"), col("type_total"))
    },

    // ----------------------------------------------------------------- MISC
    // uuid() per row (ethereum_blocks.sql:35). The generated VALUES are
    // nondeterministic by design, so the oracle pins the operator's
    // CONTRACT instead of the draws: every row gets a tag that (a) is a
    // well-formed RFC-4122 v4 uuid and (b) is globally unique across the
    // table, alongside the deterministic month partition column — which
    // makes the query fully rows+schema+hash checkable (previously the one
    // rows-only entry in the registry). The per-row frame persists once:
    // uuid() is nondeterministic, so the format branch and the uniqueness
    // aggregate must read the SAME draw, not two independent ones.
    QueryDef("f_uuid_tag",
      """SELECT event_id,
        |  strftime(make_timestamp(epoch_us(ts)), '%Y-%m') AS date_partition,
        |  TRUE AS uuid_ok, TRUE AS uuid_unique
        |FROM events""".stripMargin) { (s, dir) =>
      val tagged = events(s, dir).select(
        col("event_id"),
        expr("uuid()").as("row_uuid"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM").as("date_partition"))
        .persist()
      val v4 = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
      // global-uniqueness check as a 1-row broadcast, not a global window:
      // countDistinct distributes (partial sets per partition), where a
      // whole-table window would funnel every row through one partition
      val uniq = tagged.agg(
        (countDistinct(col("row_uuid")) === count(lit(1))).as("uuid_unique"))
      CacheScope.sealResult(
        tagged
          .withColumn("uuid_ok", col("row_uuid").rlike(v4))
          .crossJoin(broadcast(uniq))
          .select("event_id", "date_partition", "uuid_ok", "uuid_unique"),
        tagged)
    },

    // ------------------------------------------------------------------ F-FH
    // The HASHING TRICK over an interaction feature — per user, the
    // 64-dim hashed count vector of (event_type × day-of-week), the
    // tabular-ML encoding that keeps dimensionality FIXED no matter how
    // many interaction categories exist (one-hot of interactions blows
    // up combinatorially; the hash projects them onto 64 buckets and
    // collisions are the accepted trade). Bucket = two md5 hex nibbles
    // of 'type:dow' ((h1 & 3)·16 + h2 — the a13 grid arithmetic), dow =
    // (epoch_day + 4) % 7 (pure integer, no calendar functions — day 0
    // is a Thursday). Output is the EXPLODED sparse form (user, dim,
    // cnt): engine-parity-exact, and the dense assembly is a trivial
    // downstream pivot. Scale: one fact pass, map-side combinable — the
    // (user × ≤64) rollup is the only shuffle, and the dimension count
    // never grows with category cardinality.
    QueryDef("f_feature_hash",
      """WITH f AS (
        |  SELECT user_id,
        |    event_type || ':' || CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS VARCHAR) AS cat
        |  FROM events),
        |h AS (
        |  SELECT user_id,
        |    ((instr('0123456789abcdef', substr(md5(cat), 1, 1)) - 1) % 4) * 16
        |      + instr('0123456789abcdef', substr(md5(cat), 2, 1)) - 1 AS dim
        |  FROM f)
        |SELECT user_id, CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM h GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val cat = concat(col("event_type"), lit(":"),
        expr("cast((ts_us div 86400000000 + 4) % 7 as string)"))
      val dim = (expr(s"instr('0123456789abcdef', substr(md5(cat), 1, 1)) - 1") % 4) * 16 +
        expr("instr('0123456789abcdef', substr(md5(cat), 2, 1)) - 1")
      events(s, dir)
        .select(col("user_id"), cat.as("cat"))
        .select(col("user_id"), dim.cast("long").as("dim"))
        .groupBy("user_id", "dim")
        .agg(count(lit(1)).cast("long").as("cnt"))
    }
  )
}
