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
    Graft.table(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))

  private val typePriority =
    when(col("event_type") === "signup", 1)
      .when(col("event_type") === "purchase", 2)
      .when(col("event_type") === "click", 3)
      .otherwise(4)

  private val typePrioritySql =
    """CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2
      |                WHEN 'click' THEN 3 ELSE 4 END""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------- FLAGSHIP
    // The wallet-features program in one plan: deterministic event ordering
    // (W1) → signed running balance over that order (W3) → per-entity rollup
    // (A2): totals, conditional counts, min-positive balance (W5 shape),
    // final balance via last-row pick (W6), first/last timestamps (W4).
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
    // The ENTIRE WalletFeatures program (pipeline/WalletFeatures.scala —
    // ethereum_wallet_features.sql:14-327) under the oracle gate: events
    // mapped into the wallet_transactions shape (role pivot, JSON
    // counterparty, per-type contract, priority), then ordering → running
    // balances (ROUND(,5) + -0.0 normalization) → per-contract summaries →
    // wallet rollup with the 700000 cap and guarded division. The oracle
    // recomputes every stage in SQL.
    QueryDef("flagship_full_program",
      s"""WITH tx0 AS (
         |  SELECT CAST(event_id AS VARCHAR) AS hash, epoch_us(ts) AS ts,
         |    CASE event_type WHEN 'purchase' THEN 'ETH' ELSE event_type END AS contract,
         |    $typePrioritySql AS priority,
         |    event_type, value, user_id,
         |    COALESCE(TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT), -1) AS cp
         |  FROM events),
         |wtx AS (
         |  SELECT CAST(user_id AS VARCHAR) AS wallet, 'sender' AS role, hash,
         |         value AS amount, value * 0.001 AS fee, ts, contract, priority
         |  FROM tx0
         |  UNION ALL
         |  SELECT CAST(cp AS VARCHAR), 'receiver', hash, value, 0.0, ts, contract, priority
         |  FROM tx0),
         |enr AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY wallet, contract
         |      ORDER BY ts, priority, CASE WHEN role = 'receiver' THEN 0 ELSE 1 END, hash) AS row_num,
         |    CAST(SUM(CAST(CASE WHEN role = 'receiver' THEN amount
         |                       ELSE -amount - fee END AS DECIMAL(38,6)))
         |      OVER (PARTITION BY wallet, contract
         |            ORDER BY ts, priority, CASE WHEN role = 'receiver' THEN 0 ELSE 1 END, hash
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS rawbal
         |  FROM wtx),
         |bal AS (
         |  SELECT *,
         |    CASE WHEN round(rawbal, 5) = 0 THEN 0.0 ELSE round(rawbal, 5) END AS balance,
         |    ROW_NUMBER() OVER (PARTITION BY wallet, contract ORDER BY row_num DESC) AS rn_desc
         |  FROM enr),
         |pc AS (
         |  SELECT wallet, contract,
         |    MAX(CASE WHEN rn_desc = 1 THEN balance END) AS final_balance,
         |    COALESCE(MIN(CASE WHEN balance > 0 THEN balance END), 0.0) AS min_pos,
         |    MAX(balance) AS max_bal,
         |    COUNT(CASE WHEN role = 'receiver' THEN 1 END) AS n_received,
         |    COUNT(CASE WHEN role = 'sender' THEN 1 END) AS n_sent,
         |    CAST(SUM(CAST(CASE WHEN role = 'receiver' THEN amount ELSE 0 END
         |         AS DECIMAL(38,6))) AS DOUBLE) AS total_received,
         |    CAST(SUM(CAST(CASE WHEN role = 'sender' THEN amount ELSE 0 END
         |         AS DECIMAL(38,6))) AS DOUBLE) AS total_sent,
         |    CAST(SUM(CAST(fee AS DECIMAL(38,6))) AS DOUBLE) AS total_fees,
         |    MIN(ts) AS first_tx_ts, MAX(ts) AS last_tx_ts
         |  FROM bal GROUP BY wallet, contract)
         |SELECT wallet AS wallet_address,
         |  COALESCE(MAX(CASE WHEN contract = 'ETH' THEN
         |    CASE WHEN final_balance > 700000 THEN 0.0 ELSE final_balance END END), 0.0)
         |    AS eth_balance,
         |  COALESCE(MAX(CASE WHEN contract = 'ETH' THEN max_bal END), 0.0) AS max_eth_ever,
         |  COALESCE(MAX(CASE WHEN contract = 'ETH' THEN min_pos END), 0.0) AS min_eth_ever,
         |  CAST(SUM(n_received) AS BIGINT) AS n_in,
         |  CAST(SUM(n_sent) AS BIGINT) AS n_out,
         |  CAST(SUM(CAST(total_received AS DECIMAL(38,6))) AS DOUBLE) AS total_in,
         |  CAST(SUM(CAST(total_sent AS DECIMAL(38,6))) AS DOUBLE) AS total_out,
         |  CAST(SUM(CAST(total_fees AS DECIMAL(38,6))) AS DOUBLE) AS total_fees,
         |  MIN(first_tx_ts) AS first_tx_ts,
         |  MAX(last_tx_ts) AS last_tx_ts,
         |  COUNT(*) AS n_contracts,
         |  CASE WHEN SUM(n_received) > 0
         |       THEN CAST(SUM(CAST(total_received AS DECIMAL(38,6))) AS DOUBLE) / SUM(n_received)
         |       ELSE 0.0 END AS avg_in_value
         |FROM pc GROUP BY wallet""".stripMargin) { (s, dir) =>
      val tx0 = events(s, dir).select(
        col("event_id").cast("string").as("transaction_hash"),
        col("ts_us").as("block_timestamp"),
        when(col("event_type") === "purchase", "ETH").otherwise(col("event_type"))
          .as("contract_address"),
        typePriority.as("priority"),
        col("event_type").as("transaction_type"),
        col("value"), col("user_id"),
        coalesce(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"), lit(-1L)).as("cp"))
      // Role pivot as two projected scans + UNION (each branch stays a
      // clean codegen stage; measured faster than an explode generator).
      val common = Seq("transaction_hash", "block_timestamp", "contract_address",
        "priority", "transaction_type")
      val sender = tx0.select(
        (col("user_id").cast("string").as("wallet_address") +:
          lit("sender").as("role") +: col("value").as("amount") +:
          (col("value") * lit(0.001)).as("tx_fee") +: common.map(col)): _*)
      val receiver = tx0.select(
        (col("cp").cast("string").as("wallet_address") +:
          lit("receiver").as("role") +: col("value").as("amount") +:
          lit(0.0).as("tx_fee") +: common.map(col)): _*)
      val wtx = sender.unionByName(receiver)
        .withColumn("block_number", lit(0L))
        .withColumn("date_partition", lit("2024-01"))
        .withColumn("address_partition", substring(col("wallet_address"), 1, 2))
      graft.pipeline.WalletFeatures.walletFeatures(wtx).select(
        col("wallet_address"), col("eth_balance"), col("max_eth_ever"),
        col("min_eth_ever"), col("n_in"), col("n_out"), col("total_in"),
        col("total_out"), col("total_fees"),
        col("first_tx_ts").as("first_tx_ts"), col("last_tx_ts").as("last_tx_ts"),
        col("n_contracts"), col("avg_in_value"))
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
      events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
        upper(col("event_type")).as("type_upper"),
        substring(col("event_type"), 1, 3).as("type_pre"),
        regexp_replace(col("event_type"), "c", "C").as("type_repl"),
        length(col("event_type")).as("type_len"),
        concat(col("event_type"), lit(":"), col("user_id").cast("string")).as("type_key"),
        expr("try_cast(event_type AS BIGINT)").as("bad_cast"),
        coalesce(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"), lit(-1L))
          .as("prop_k_safe"))
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
    // uuid() per row (ethereum_blocks.sql:35) — nondeterministic, so no
    // oracle: the driver records a rows-only check. Shape: every row tagged
    // with a v4 uuid + the deterministic month partition column.
    QueryDef.noOracle("f_uuid_tag") { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        expr("uuid()").as("row_uuid"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM").as("date_partition"))
    }
  )
}
