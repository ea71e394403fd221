package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.2-2.7) expressed Spark-first
  * over the synthetic tables, each with a DuckDB oracle.
  *
  * Float parity convention: any SUM over doubles goes through
  * `CAST(x AS DECIMAL(38,6))` in BOTH engines — decimal addition is exact and
  * order-independent, so Spark's partial-aggregation order and DuckDB's scan
  * order can't produce last-ulp drift; the final value is cast back to double
  * identically on both sides.
  *
  * Timestamp parity convention: `events.ts`'s stored encoding varies across
  * fixture regenerations (INT64 nanos vs timestamp micros), so all queries go
  * through [[Graft.events]], which probes the schema and derives the same
  * microsecond-epoch `ts_us` either way; DuckDB's `epoch_us(ts)` is the
  * oracle-side half of the contract.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** events with a microsecond epoch column added (see parity note above). */
  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,6)")).cast("double")

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- A2/A5
    // Group-by rollup: the wallet_balances-style hash aggregation
    // (ethereum_wallet_features.sql:278-325): SUM/AVG/COUNT/MIN/MAX plus a
    // conditional aggregate, pure map-side-combinable hash agg.
    QueryDef("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
        |  CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE) AS qty_high_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      // Exact decimal sums at LONG speed (the Photon/DuckDB accumulator
      // trick, DataFrame-shaped). A straight SUM(DECIMAL(38,6)) updates a
      // 128-bit decimal buffer per row — measured 2x the whole query. Per
      // row the decimal cast still happens (same HALF_UP rounding as the
      // oracle — decimal(18,6) and decimal(38,6) round identically below
      // the overflow bound), but its UNSCALED value accumulates as a
      // plain codegen'd BIGINT per (group, input partition) — bounded by
      // partition size, so no overflow at any table size — and only the
      // few partial rows per group pay decimal arithmetic at the merge.
      // The final division runs in the DECIMAL domain: above 2^53 a
      // long->double cast before the /1e6 would double-round (1-ulp
      // divergence from the oracle's decimal->double path).
      def scaled(c: Column): Column =
        (c.cast("decimal(18,6)") * lit(1000000)).cast("long")
      def merged(name: String): Column =
        (sum(col(name).cast("decimal(38,0)")) / lit(1000000)).cast("double")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("__pid"))
        .agg(
          sum(scaled(col("l_quantity"))).as("p_qty"),
          sum(scaled(col("l_extendedprice"))).as("p_base"),
          sum(scaled(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("p_disc"),
          max("l_quantity").as("p_maxq"),
          sum(scaled(when(col("l_discount") > 0.05, col("l_quantity")).otherwise(lit(0))))
            .as("p_hidisc"),
          count(lit(1)).as("p_cnt"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          merged("p_qty").as("sum_qty"),
          merged("p_base").as("sum_base_price"),
          merged("p_disc").as("sum_disc_price"),
          max("p_maxq").cast("double").as("max_qty"),
          merged("p_hidisc").as("qty_high_disc"),
          sum("p_cnt").as("count_order"))
    },

    // ------------------------------------------------------------------- A1
    // Partition-pruned MAX watermark: two-phase max — restrict to the max
    // month, then take the max id inside it
    // (stage_data_ingestion_pipeline.py:50-57).
    QueryDef("a1_watermark",
      """WITH m AS (SELECT MAX(strftime(ts, '%Y-%m')) AS month FROM events)
        |SELECT m.month AS month, MAX(e.event_id) AS wm, COUNT(*) AS n_rows
        |FROM events e CROSS JOIN m
        |WHERE strftime(e.ts, '%Y-%m') = m.month GROUP BY m.month""".stripMargin) { (s, dir) =>
      // One scan: aggregate per month, then keep the max month — same
      // two-phase-max semantics (the watermark only reads the newest
      // partition) without scanning the table twice. On a hive-partitioned
      // table this becomes Lakehouse.watermark's partition-pruned scan.
      val ev = events(s, dir)
        .withColumn("month", date_format(timestamp_micros(col("ts_us")), "yyyy-MM"))
      val perMonth = ev.groupBy("month")
        .agg(max("event_id").as("wm"), count(lit(1)).as("n_rows"))
      perMonth.withColumn("mx", max("month").over(Window.partitionBy()))
        .filter(col("month") === col("mx"))
        .select("month", "wm", "n_rows")
    },

    // ------------------------------------------------------------------- A4
    // FILTER'd aggregates (rugpull_features.sql:60-64): conditional sums and
    // counts per group.
    QueryDef("a4_filtered_agg",
      """SELECT user_id,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE) AS purchase_value,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("user_id").agg(
        dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0)))
          .as("purchase_value"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"),
        count(lit(1)).as("n_events"))
    },

    // ------------------------------------------------------------ A4 domain
    // The rugpull feature module under the oracle gate — notably the :75
    // outlier guard capping the AGGREGATED per-wallet amount at 1.3e7
    // (per-transaction capping would under-count: ten 2e6 sends are 1.3e7
    // in the reference, not 2e7). Amounts scaled so real wallets hit the
    // cap at sf0.01.
    QueryDef("a4b_rugpull_cap",
      """WITH wtx AS (
        |  SELECT CAST(user_id AS VARCHAR) AS wallet_address,
        |    CASE WHEN event_id % 2 = 0 THEN 'sender' ELSE 'receiver' END AS role,
        |    value * 100000 AS amount, epoch_us(ts) AS ts,
        |    event_id % 7 = 0 AS is_rugpull
        |  FROM events),
        |agg AS (
        |  SELECT wallet_address,
        |    COUNT(CASE WHEN is_rugpull AND role = 'sender' THEN 1 END) AS n_rugpull_sent,
        |    COUNT(CASE WHEN is_rugpull AND role = 'receiver' THEN 1 END) AS n_rugpull_received,
        |    CAST(SUM(CAST(CASE WHEN is_rugpull AND role = 'sender' THEN amount ELSE 0 END
        |      AS DECIMAL(38,6))) AS DOUBLE) AS s_sent,
        |    CAST(SUM(CAST(CASE WHEN is_rugpull AND role = 'receiver' THEN amount ELSE 0 END
        |      AS DECIMAL(38,6))) AS DOUBLE) AS s_recv,
        |    MIN(CASE WHEN is_rugpull THEN ts END) AS first_rugpull_ts,
        |    MAX(CASE WHEN is_rugpull THEN ts END) AS last_rugpull_ts,
        |    COUNT(*) AS n_transactions,
        |    MAX(ts) AS last_tx_ts
        |  FROM wtx GROUP BY wallet_address)
        |SELECT wallet_address, n_rugpull_sent, n_rugpull_received,
        |  LEAST(s_sent, 1.3e7) AS rugpull_amount_sent,
        |  LEAST(s_recv, 1.3e7) AS rugpull_amount_received,
        |  first_rugpull_ts, last_rugpull_ts, n_transactions, last_tx_ts
        |FROM agg""".stripMargin) { (s, dir) =>
      val wtx = events(s, dir).select(
        col("user_id").cast("string").as("wallet_address"),
        when(pmod(col("event_id"), lit(2L)) === 0, "sender").otherwise("receiver").as("role"),
        (col("value") * lit(100000)).as("amount"),
        col("ts_us").as("block_timestamp"),
        (pmod(col("event_id"), lit(7L)) === 0).as("is_rugpull"))
      graft.pipeline.RugpullFeatures.aggregate(wtx)
    },

    // ------------------------------------------------------------------- A5
    QueryDef("a5_count_distinct",
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("n_cust"), count(lit(1)).as("n_orders"))
    },

    // ------------------------------------------------------------------- A6
    // GROUP BY + HAVING (missing-transaction detection shape,
    // raw_data_ingestion_pipeline.py:769-810).
    QueryDef("a6_having",
      """SELECT o_custkey, COUNT(*) AS n
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 3""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 3)
    },

    // ------------------------------------------------------------------- A9
    QueryDef("a9_distinct",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    },

    // ------------------------------------------------------------------- P3
    // Monotonic incremental filter: watermark predicate pushed to the scan
    // (ethereum_blocks.sql:32).
    QueryDef("p3_incremental_filter",
      """SELECT event_id, user_id, event_type
        |FROM events WHERE epoch_us(ts) > 1704153600000000""".stripMargin) { (s, dir) =>
      // The watermark compares the DERIVED ts_us column; IntDivPushdown
      // rewrites it onto the raw ts column (nanos-long or timestamp,
      // whichever the fixture stores) so the parquet scan row-group-skips —
      // the predicate that makes incremental loads cheap at 100 TB.
      // PlanSpec pins the pushed filter's presence.
      events(s, dir)
        .filter(col("ts_us") > lit(1704153600000000L))
        .select("event_id", "user_id", "event_type")
    },

    // ------------------------------------------------------------------- P5
    // Blocklist filter (ethereum_wallet_features.sql:381-390).
    QueryDef("p5_blocklist",
      """SELECT user_id, COUNT(*) AS n
        |FROM events WHERE user_id NOT IN (1, 2, 3) GROUP BY user_id""".stripMargin) { (s, dir) =>
      events(s, dir).filter(!col("user_id").isin(1, 2, 3))
        .groupBy("user_id").agg(count(lit(1)).as("n"))
    },

    // ------------------------------------------------------------------- P8
    // Timestamp conversions both directions + month formatting
    // (data_transformations.py:29-76).
    QueryDef("p8_time_convert",
      """SELECT event_id, epoch_us(ts) AS ts_us,
        |  strftime(make_timestamp(epoch_us(ts)), '%Y-%m') AS month,
        |  strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S') AS ts_readable,
        |  epoch_us(ts) // 1000000 AS ts_sec
        |FROM events""".stripMargin) { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        col("ts_us"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM").as("month"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:mm:ss").as("ts_readable"),
        expr("ts_us div 1000000").as("ts_sec"))
    },

    // ------------------------------------------------------------------- J3
    // Anti-join dedup guard (NOT EXISTS): the INSERT-INTO dedup of every
    // stage table (ethereum_blocks.sql:66-72).
    QueryDef("j3_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // ------------------------------------------------------------------- J4
    // Big-big equi join + rollup: revenue per nation through
    // customer⋈orders⋈lineitem, dims broadcast.
    QueryDef("j4_join_rollup",
      """SELECT n.n_name AS nation,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
      // same long-accumulator pattern as q1_agg: the revenue sum over the
      // join output accumulates as per-(nation, partition) BIGINTs —
      // bounded by partition size at any scale — and the few partials per
      // nation merge in decimal
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), spark_partition_id().as("__pid"))
        .agg(
          sum(((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)") * lit(1000000)).cast("long")).as("p_rev"),
          count(lit(1)).as("p_cnt"))
        .groupBy("nation")
        .agg(
          (sum(col("p_rev").cast("decimal(38,0)")) / lit(1000000)).cast("double")
            .as("revenue"),
          sum("p_cnt").as("n_items"))
    },

    // ------------------------------------------------------------------- J7
    // Existence-flag left join: CASE WHEN right.key IS NOT NULL
    // (ethereum_normal_transactions.sql:85-90).
    QueryDef("j7_exists_flag",
      """SELECT p.p_partkey, p.p_name,
        |  CASE WHEN l.l_partkey IS NOT NULL THEN true ELSE false END AS ever_shipped
        |FROM part p
        |LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) l
        |  ON p.p_partkey = l.l_partkey""".stripMargin) { (s, dir) =>
      val shipped = t(s, dir, "lineitem").select("l_partkey").distinct()
      t(s, dir, "part")
        .join(shipped, col("p_partkey") === col("l_partkey"), "left_outer")
        .select(col("p_partkey"), col("p_name"),
          col("l_partkey").isNotNull.as("ever_shipped"))
    },

    // ------------------------------------------------------------------ J13
    // Scalar-subquery cross join: attach a global MAX to every row
    // (ethereum_wallet_coin_balances.sql:128-131).
    QueryDef("j13_scalar_subquery",
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders
        |WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val mx = o.agg(max("o_totalprice").as("mx"))
      o.crossJoin(broadcast(mx))
        .filter(col("o_totalprice") > lit(0.9) * col("mx"))
        .select(col("o_orderkey"), col("o_totalprice").cast("double").as("price"))
    },

    // ------------------------------------------------------------------ J14
    // EXISTS pruning (left semi): restrict a scan to keys touched by new
    // data (ethereum_wallet_features.sql:431).
    QueryDef("j14_semi_prune",
      """SELECT c.c_custkey, c.c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_acctbal")
    },

    // ------------------------------------------------------------------- W3
    // Running balance: signed cumulative SUM over a deterministic row order
    // — the heart of ethereum_wallet_features.sql:100-121. rowsBetween (not
    // range) because the tie-broken ROW order is load-bearing.
    QueryDef("w3_running_balance",
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
        |                     WHEN event_type = 'error' THEN -value
        |                     ELSE 0 END AS DECIMAL(38,6)))
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance
        |FROM events""".stripMargin) { (s, dir) =>
      val signed = when(col("event_type") === "purchase", col("value"))
        .when(col("event_type") === "error", -col("value"))
        .otherwise(lit(0))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir).select(
        col("user_id"), col("event_id"), col("ts_us"),
        sum(signed.cast("decimal(38,6)")).over(w).cast("double").as("balance"))
    },

    // ------------------------------------------------------------------- W6
    // Latest-row pick: top-1-per-group via ROW_NUMBER ... DESC
    // (ethereum_wallet_features.sql:181-198).
    QueryDef("w6_latest_pick",
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
      events(s, dir).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"))
    },

    // -------------------------------------------------------------- §2.7
    // Role-pivot UNION ALL: each order doubled into a sender view and a
    // receiver view with fee zeroed on the receiver side
    // (ethereum_wallet_transactions.sql:86-147).
    QueryDef("set_union_pivot",
      """SELECT o_orderkey, o_custkey AS party, 'sender' AS role,
        |  CAST(o_totalprice AS DOUBLE) AS amount,
        |  CAST(o_totalprice * 0.001 AS DOUBLE) AS fee
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_custkey + 100000 AS party, 'receiver' AS role,
        |  CAST(o_totalprice AS DOUBLE) AS amount, 0.0 AS fee
        |FROM orders""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val sender = o.select(
        col("o_orderkey"), col("o_custkey").as("party"), lit("sender").as("role"),
        col("o_totalprice").cast("double").as("amount"),
        (col("o_totalprice") * lit(0.001)).cast("double").as("fee"))
      val receiver = o.select(
        col("o_orderkey"), (col("o_custkey") + 100000).as("party"),
        lit("receiver").as("role"),
        col("o_totalprice").cast("double").as("amount"), lit(0.0).as("fee"))
      sender.unionByName(receiver)
    },

    // -------------------------------------------------------------- §2.7b
    // INTERSECT / EXCEPT — the remaining ANSI set shapes beside the UNION
    // family: cohort algebra over entity sets ("big spenders who also
    // errored big" vs "who never did"), tagged and re-unioned so one
    // result carries both. Spark's intersect/except are DISTINCT-semantics
    // set ops compiling to left-semi/left-anti joins over de-duplicated
    // sides — at 100 TB each arm is one keyed shuffle of an
    // already-DISTINCT (small) user set, never of raw events (the
    // type+value filters push to the parquet scan).
    QueryDef("set_intersect_except",
      """SELECT 'both' AS tag, user_id FROM (
        |  SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'purchase' AND value > 90
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'error' AND value > 90)
        |UNION ALL
        |SELECT 'only_purchase' AS tag, user_id FROM (
        |  SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'purchase' AND value > 90
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'error' AND value > 90)""".stripMargin) { (s, dir) =>
      val ev = Graft.events(s, dir)
      def side(tpe: String) = ev
        .filter(col("event_type") === tpe && col("value") > 90)
        .select("user_id").distinct()
      val p = side("purchase"); val e = side("error")
      p.intersect(e).select(lit("both").as("tag"), col("user_id"))
        .unionByName(
          p.except(e).select(lit("only_purchase").as("tag"), col("user_id")))
    }
  )
}
