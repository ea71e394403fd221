package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operator inventory (SURVEY.md §2.5) — the heart of the
  * reference (`ethereum_wallet_features.sql` is one large window program).
  * Expressed over `events` with the reference's exact framing rules:
  * running totals use ROWS (not RANGE) frames because the tie-broken row
  * order is load-bearing; whole-partition analytics drop the ORDER BY.
  */
object WindowQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)

  // event-order key shared across the window family and the flagship
  // programs — single-sourced in EventOrder (QueryDef.scala)
  private val typePriority = EventOrder.typePriority
  private val typePrioritySql = EventOrder.typePrioritySql

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------- W1
    // ROW_NUMBER over a multi-key ORDER BY with CASE components — the global
    // event ordering (ethereum_wallet_features.sql:16-39).
    QueryDef("w1_row_order",
      s"""SELECT event_id, user_id,
         |  ROW_NUMBER() OVER (PARTITION BY user_id
         |    ORDER BY epoch_us(ts), $typePrioritySql, event_id) AS row_num
         |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), typePriority, col("event_id"))
      events(s, dir).select(col("event_id"), col("user_id"),
        row_number().over(w).as("row_num"))
    },

    // ------------------------------------------------------------------- W2
    // DENSE_RANK duplicate ranking (hash_rank,
    // ethereum_wallet_features.sql:45,128-133): rank same-day duplicates of a
    // user's activity by type priority so counts don't double-count.
    QueryDef("w2_dense_rank",
      s"""SELECT event_id, user_id,
         |  DENSE_RANK() OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
         |    ORDER BY $typePrioritySql) AS hash_rank
         |FROM events""".stripMargin) { (s, dir) =>
      // PARITY CAVEAT: Spark `div` truncates toward zero; DuckDB `//`
      // floors. They agree on the whole non-negative domain (every
      // fixture is 2024-dated) but diverge for pre-1970 timestamps — if
      // a regeneration ever ships negative ts_us, BOTH sides of this
      // day-bucketing must move to an explicit floor form together.
      val w = Window.partitionBy(col("user_id"), expr("ts_us div 86400000000"))
        .orderBy(typePriority)
      events(s, dir).select(col("event_id"), col("user_id"),
        dense_rank().over(w).as("hash_rank"))
    },

    // ------------------------------------------------------------------- W4
    // Whole-partition aggregates as analytics (no ORDER BY → unbounded frame,
    // ethereum_wallet_features.sql:122-135), incl. conditional counts.
    QueryDef("w4_partition_totals",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id) AS DOUBLE) AS total_value,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |    OVER (PARTITION BY user_id) AS n_purchases,
        |  MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS first_ts_us,
        |  MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS last_ts_us
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
      events(s, dir).select(col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(38,6)")).over(w).cast("double").as("total_value"),
        count(when(col("event_type") === "purchase", lit(1))).over(w).as("n_purchases"),
        min("ts_us").over(w).as("first_ts_us"),
        max("ts_us").over(w).as("last_ts_us"))
    },

    // ------------------------------------------------------------------- W5
    // Conditional MIN-positive over partition with COALESCE 0 — "min balance
    // ever after first nonzero" (ethereum_wallet_features.sql:164-167).
    QueryDef("w5_conditional_min",
      """SELECT event_id, user_id,
        |  COALESCE(CAST(MIN(CASE WHEN value > 100 THEN CAST(value AS DECIMAL(38,6)) END)
        |    OVER (PARTITION BY user_id) AS DOUBLE), 0.0) AS min_large_value
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
      events(s, dir).select(col("event_id"), col("user_id"),
        coalesce(
          min(when(col("value") > 100, col("value").cast("decimal(38,6)"))).over(w).cast("double"),
          lit(0.0)).as("min_large_value"))
    },

    // ------------------------------------------------------------------- W7
    // DENSE_RANK ... DESC last-row flag (ethereum_wallet_features.sql:247).
    QueryDef("w7_last_row_flag",
      s"""SELECT event_id, user_id,
         |  CASE WHEN DENSE_RANK() OVER (PARTITION BY user_id
         |    ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
         |    THEN true ELSE false END AS is_latest
         |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
      events(s, dir).select(col("event_id"), col("user_id"),
        (dense_rank().over(w) === 1).as("is_latest"))
    },

    // ------------------------------------------------------------------- W8
    // LEAD for holding duration, COALESCE 0 at partition end
    // (ethereum_wallet_features_with_auc.sql:181-199).
    QueryDef("w8_lead_duration",
      """SELECT event_id, user_id,
        |  COALESCE(LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) - epoch_us(ts), 0) AS gap_us
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      events(s, dir).select(col("event_id"), col("user_id"),
        coalesce(lead(col("ts_us"), 1).over(w) - col("ts_us"), lit(0L)).as("gap_us"))
    },

    // ------------------------------------------------------------------- W9
    // Time-weighted AUC: cumulative SUM(balance × holding-time)/86400 — the
    // balance-under-curve feature (ethereum_wallet_features_with_auc.sql:187-205).
    QueryDef("w9_auc",
      """WITH bal AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
        |                       WHEN event_type = 'error' THEN -value
        |                       ELSE 0 END AS DECIMAL(38,6)))
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance
        |  FROM events),
        |gaps AS (
        |  SELECT *, COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) - ts_us, 0) // 1000000 AS dt_sec
        |  FROM bal)
        |SELECT user_id, event_id,
        |  CAST(SUM(CAST(balance * dt_sec AS DECIMAL(38,6)))
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 86400.0 AS auc
        |FROM gaps""".stripMargin) { (s, dir) =>
      val signed = when(col("event_type") === "purchase", col("value"))
        .when(col("event_type") === "error", -col("value")).otherwise(lit(0))
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("balance", sum(signed.cast("decimal(38,6)")).over(wRun).cast("double"))
        .withColumn("dt_sec",
          expr("coalesce(lead(ts_us) over (partition by user_id order by ts_us, event_id) - ts_us, 0) div 1000000"))
        .select(col("user_id"), col("event_id"),
          (sum((col("balance") * col("dt_sec")).cast("decimal(38,6)")).over(wRun)
            .cast("double") / lit(86400.0)).as("auc"))
    },

    // ------------------------------------------------------------------- A8
    // MAX of the running value per key — peak balance (AUC rollup,
    // ethereum_wallet_features_with_auc.sql:208-215).
    QueryDef("a8_max_running",
      """WITH bal AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
        |                       WHEN event_type = 'error' THEN -value
        |                       ELSE 0 END AS DECIMAL(38,6)))
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance
        |  FROM events)
        |SELECT user_id, CAST(MAX(balance) AS DOUBLE) AS peak_balance
        |FROM bal GROUP BY user_id""".stripMargin) { (s, dir) =>
      val signed = when(col("event_type") === "purchase", col("value"))
        .when(col("event_type") === "error", -col("value")).otherwise(lit(0))
      val wRun = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("balance", sum(signed.cast("decimal(38,6)")).over(wRun).cast("double"))
        .groupBy("user_id").agg(max("balance").cast("double").as("peak_balance"))
    },

    // ------------------------------------------------------------------ W11
    // ROW_NUMBER over exploded map state (ethereum_wallet_features.sql:
    // 417,439): the stored per-wallet contracts map is exploded back to rows
    // and the dominant entry picked per wallet — map build (A3), lateral
    // explode (J12), and top-1 window in one plan.
    QueryDef("w11_state_explode",
      """WITH per_type AS (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type),
        |ranked AS (
        |  SELECT user_id, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
        |  FROM per_type)
        |SELECT user_id, event_type AS top_type, n AS top_n
        |FROM ranked WHERE rn = 1""".stripMargin) { (s, dir) =>
      val perType = events(s, dir).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      // round-trip through the stored-state MapType shape, as the reference
      // does: build map → explode → rank
      val state = perType.groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
          .as("type_counts"))
      val exploded = state.select(col("user_id"),
        explode(col("type_counts")).as(Seq("event_type", "n")))
      val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))
      exploded.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("top_type"), col("n").as("top_n"))
    },

    // ------------------------------------------------------------------ W12
    // Conflicting-row dedup: latest row per natural key
    // (raw_data_ingestion_pipeline.py:772-781) — here: duplicate document
    // texts resolved to the highest doc_id.
    QueryDef("w12_dedup_latest",
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id DESC) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("text").orderBy(col("doc_id").desc)
      Graft.table(s, dir, "documents")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "lang", "source")
    },

    // ------------------------------------------------------------------ W13
    // MAX OVER whole partition attached to each row
    // (ethereum_wallet_coin_balances.sql:250-257).
    QueryDef("w13_max_over_partition",
      """SELECT o_orderkey, o_custkey,
        |  CAST(MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_max_price,
        |  CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
      Graft.table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        max("o_totalprice").over(w).cast("double").as("cust_max_price"),
        col("o_totalprice").cast("double").as("price"))
    }
  )
}
