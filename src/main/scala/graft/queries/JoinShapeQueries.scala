package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes, projections with tricky semantics, set ops, and the state
  * merge (SURVEY.md §2.2-2.4, §2.7) not covered by RelationalQueries.
  */
object JoinShapeQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------- P2
    // Typed projection with unit conversion, keeping the reference's
    // split-POWER overflow dodge and integer division quirk
    // (ethereum_normal_transactions.sql:53-56: POWER(10,d/2)*POWER(10,d/2)).
    // The divisor 10^(d/2) is built as an exact decimal ('1' || zeros) rather
    // than float POWER: libm pow differs from the JVM by 1 ulp for large
    // exponents, and the decimal→double conversion is correctly rounded in
    // both engines — the same overflow-consciousness as the reference's
    // split-POWER trick, made deterministic.
    QueryDef("p2_unit_convert",
      """SELECT p_partkey,
        |  p_retailprice
        |    / CAST(CAST('1' || repeat('0', p_size // 2) AS DECIMAL(38,0)) AS DOUBLE)
        |    / CAST(CAST('1' || repeat('0', p_size // 2) AS DECIMAL(38,0)) AS DOUBLE)
        |    AS scaled_price,
        |  p_retailprice * 0.001 / 2 AS fee
        |FROM part""".stripMargin) { (s, dir) =>
      val d = expr("repeat('0', p_size div 2)")
      val div = concat(lit("1"), d).cast("decimal(38,0)").cast("double")
      t(s, dir, "part").select(col("p_partkey"),
        (col("p_retailprice") / div / div).as("scaled_price"),
        (col("p_retailprice") * lit(0.001) / lit(2)).as("fee"))
    },

    // ------------------------------------------------------------------- P4
    // NOT-filter over a LEFT JOIN with 3-valued logic: the reference keeps
    // NULL-matched rows via NOT COALESCE(cond, false)
    // (ethereum_internal_transactions.sql:33-36).
    QueryDef("p4_null_not_filter",
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey
        |FROM lineitem l
        |LEFT JOIN (SELECT p_partkey, p_size, p_brand FROM part WHERE p_size > 25) p
        |  ON l.l_partkey = p.p_partkey
        |WHERE NOT COALESCE(p.p_size > 30 AND p.p_brand = l.l_returnflag, false)""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "part").filter(col("p_size") > 25)
        .select("p_partkey", "p_size", "p_brand")
      t(s, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"), "left_outer")
        .filter(!coalesce(col("p_size") > 30 && col("p_brand") === col("l_returnflag"), lit(false)))
        .select("l_orderkey", "l_linenumber", "l_partkey")
    },

    // ------------------------------------------------------------------- P7
    // Precision clamp: digit strings longer than the decimal(38) budget are
    // truncated to 28 chars before the cast
    // (raw_data_ingestion_pipeline.py:655-670).
    QueryDef("p7_precision_clamp",
      """SELECT o_orderkey,
        |  CAST(TRY_CAST(CASE WHEN length(s) > 28 THEN substr(s, 1, 28) ELSE s END
        |       AS DECIMAL(38,0)) AS DOUBLE) AS clamped
        |FROM (SELECT o_orderkey, repeat(CAST(o_orderkey AS VARCHAR), 8) AS s FROM orders)""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          repeat(col("o_orderkey").cast("string"), 8).as("s"))
        .select(col("o_orderkey"),
          when(length(col("s")) > 28, substring(col("s"), 1, 28)).otherwise(col("s"))
            .cast("decimal(38,0)").cast("double").as("clamped"))
    },

    // --------------------------------------------------------------- S-repair
    // Malformed-array repair (ethereum_logs.sql:15-19): when the first array
    // element degenerates to a single char, rebuild the array by joining and
    // re-chunking — regexp_replace + array_join + split, the exact function
    // family the reference uses.
    QueryDef("s_repair_array",
      """SELECT doc_id, n_tokens, first_token FROM (
        |  SELECT doc_id,
        |    CASE WHEN length(tokens[1]) = 1
        |      THEN string_split(trim(regexp_replace(array_to_string(tokens, ''), '(.{4})', '\1 ', 'g')), ' ')
        |      ELSE tokens END AS fixed
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents))
        |t(doc_id, tokens2), LATERAL (SELECT len(tokens2) AS n_tokens, tokens2[1] AS first_token)""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("tokens", split(col("text"), " "))
      docs.withColumn("fixed",
          when(length(element_at(col("tokens"), 1)) === 1,
            split(trim(regexp_replace(array_join(col("tokens"), ""), "(.{4})", "$1 ")), " "))
            .otherwise(col("tokens")))
        .select(col("doc_id"), size(col("fixed")).as("n_tokens"),
          element_at(col("fixed"), 1).as("first_token"))
    },

    // ------------------------------------------------------------------- J5
    // Left equi join on multiple keys (tx ⋈ traces on hash+from+to,
    // ethereum_normal_transactions.sql:36-40): purchases enriched with the
    // same-user same-day error count.
    QueryDef("j5_left_multikey",
      """SELECT p.event_id, COALESCE(e.n_err, 0) AS n_err
        |FROM (SELECT event_id, user_id, epoch_us(ts) // 86400000000 AS day
        |      FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n_err
        |           FROM events WHERE event_type = 'error' GROUP BY 1, 2) e
        |  ON p.user_id = e.user_id AND p.day = e.day""".stripMargin) { (s, dir) =>
      val ev = events(s, dir).withColumn("day", expr("ts_us div 86400000000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "day")
      val errors = ev.filter(col("event_type") === "error")
        .groupBy("user_id", "day").agg(count(lit(1)).as("n_err"))
      purchases.join(errors, Seq("user_id", "day"), "left_outer")
        .select(col("event_id"), coalesce(col("n_err"), lit(0L)).as("n_err"))
    },

    // ------------------------------------------------------------------- J8
    // Temporal band join: equi key + range predicate — the rugpull
    // date-window join (ethereum_normal_transactions.sql:91-104). Catalyst
    // plans the equi part as the shuffle key; the band is a post-probe filter.
    QueryDef("j8_range_join",
      """SELECT o.o_orderkey,
        |  COUNT(l.l_linenumber) AS n_late_items
        |FROM orders o
        |LEFT JOIN lineitem l
        |  ON l.l_orderkey = o.o_orderkey
        | AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 120 DAY
        |GROUP BY o.o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 120 DAYS"),
          "left_outer")
        .groupBy("o_orderkey").agg(count(col("l_linenumber")).as("n_late_items"))
    },

    // ------------------------------------------------------------------ J10
    // Semi join against a dim ∪ literal row (priced contracts ∪ 'ETH',
    // ethereum_wallet_features.sql:47-52).
    QueryDef("j10_semi_union_literal",
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation WHERE n_regionkey = 0
        |  UNION ALL SELECT 99)""".stripMargin) { (s, dir) =>
      val dim = t(s, dir, "nation").filter(col("n_regionkey") === 0)
        .select(col("n_nationkey"))
        .unionByName(s.range(1).select(lit(99).cast("int").as("n_nationkey")))
      t(s, dir, "customer")
        .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select("c_custkey", "c_nationkey")
    },

    // ------------------------------------------------------------------ J11
    // THE flagship: 2-stage as-of join (nearest price within ±7 days,
    // ethereum_wallet_features.sql:57-84,141-144). Stage 1 narrows candidate
    // pairs with an equi key + band predicate; stage 2 ranks candidates by
    // |Δt| (NOT past-only — the reference's asymmetry is kept) and keeps
    // rank 1; consumers left-join so unmatched rows survive.
    QueryDef("j11_asof_join",
      """WITH purchases AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |signups AS (
        |  SELECT event_id AS s_id, user_id, epoch_us(ts) AS s_ts
        |  FROM events WHERE event_type = 'signup'),
        |ranked AS (
        |  SELECT p.p_id, s.s_id, abs(p.p_ts - s.s_ts) AS dt_us,
        |    ROW_NUMBER() OVER (PARTITION BY p.p_id
        |      ORDER BY abs(p.p_ts - s.s_ts), s.s_id) AS rn
        |  FROM purchases p JOIN signups s
        |    ON p.user_id = s.user_id
        |   AND abs(p.p_ts - s.s_ts) <= 604800000000)
        |SELECT p.p_id AS event_id, r.s_id AS nearest_signup, r.dt_us
        |FROM purchases p
        |LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON p.p_id = r.p_id""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts_us").as("s_ts"))
      val week = 604800000000L // 7 days in microseconds
      val ranked = purchases
        .join(signups,
          col("user_id") === col("s_user") && abs(col("p_ts") - col("s_ts")) <= week)
        .withColumn("dt_us", abs(col("p_ts") - col("s_ts")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("p_id").orderBy(col("dt_us"), col("s_id"))))
        .filter(col("rn") === 1)
        .select(col("p_id").as("r_pid"), col("s_id"), col("dt_us"))
      purchases.join(ranked, col("p_id") === col("r_pid"), "left_outer")
        .select(col("p_id").as("event_id"), col("s_id").as("nearest_signup"), col("dt_us"))
    },

    // ------------------------------------------------------------------ J17
    // Bidirectional nearest-event join (the attribution shape): for each
    // purchase, the SAME user's nearest click in time — either side —
    // with the gap and which side won. Where j11's as-of join is banded
    // and join-shaped, this is the UNBANDED nearest-neighbor-in-time,
    // and the scalable plan is NOT a pair join at all: both event kinds
    // ride ONE per-user timeline exchange, the nearest preceding click
    // is a running MAX(click ts) over rows-before and the nearest
    // following a running MIN over rows-after — two frames on the same
    // window sort, zero candidate pairs materialized at ANY time spread
    // (a banded join needs a band guess; a pair join over unbanded time
    // is quadratic per user). Exact integer µs throughout; ties at the
    // same timestamp are ordered by (ts, event_id) in the frame and the
    // ≤-comparison prefers 'before' — all deterministic.
    QueryDef("j17_nearest_event",
      """WITH tl AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |w AS (
        |  SELECT *,
        |    MAX(CASE WHEN event_type = 'click' THEN ts_us END) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts,
        |    MIN(CASE WHEN event_type = 'click' THEN ts_us END) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_ts
        |  FROM tl)
        |SELECT user_id, event_id, ts_us,
        |  CASE
        |    WHEN prev_click_ts IS NULL AND next_click_ts IS NULL THEN NULL
        |    WHEN next_click_ts IS NULL THEN ts_us - prev_click_ts
        |    WHEN prev_click_ts IS NULL THEN next_click_ts - ts_us
        |    WHEN ts_us - prev_click_ts <= next_click_ts - ts_us
        |      THEN ts_us - prev_click_ts
        |    ELSE next_click_ts - ts_us END AS gap_us,
        |  CASE
        |    WHEN prev_click_ts IS NULL AND next_click_ts IS NULL THEN NULL
        |    WHEN next_click_ts IS NULL THEN 'before'
        |    WHEN prev_click_ts IS NULL THEN 'after'
        |    WHEN ts_us - prev_click_ts <= next_click_ts - ts_us THEN 'before'
        |    ELSE 'after' END AS side
        |FROM w WHERE event_type = 'purchase'""".stripMargin) { (s, dir) =>
      val tl = events(s, dir)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      val order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wPrev = order.rowsBetween(Window.unboundedPreceding, -1)
      val wNext = order.rowsBetween(1, Window.unboundedFollowing)
      val clickTs = when(col("event_type") === "click", col("ts_us"))
      val before = col("ts_us") - col("prev_click_ts")
      val after = col("next_click_ts") - col("ts_us")
      tl.withColumn("prev_click_ts", max(clickTs).over(wPrev))
        .withColumn("next_click_ts", min(clickTs).over(wNext))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          when(col("prev_click_ts").isNull && col("next_click_ts").isNull,
            lit(null).cast("long"))
            .when(col("next_click_ts").isNull, before)
            .when(col("prev_click_ts").isNull, after)
            .when(before <= after, before)
            .otherwise(after).as("gap_us"),
          when(col("prev_click_ts").isNull && col("next_click_ts").isNull,
            lit(null).cast("string"))
            .when(col("next_click_ts").isNull, lit("before"))
            .when(col("prev_click_ts").isNull, lit("after"))
            .when(before <= after, lit("before"))
            .otherwise(lit("after")).as("side"))
    },

    // ------------------------------------------------------------------ J18
    // INTERVAL-OVERLAP join — the non-equi range-join class J8 does NOT
    // cover (J8 rides an equi key with a band predicate; here there is
    // NO equi key at all): per-user activity intervals [first, last]
    // against per-(event_type, week) intervals, pairs where the spans
    // intersect. The Spark plan is the classical GRID bucketing: each
    // user interval explodes into the week cells it covers (bounded by
    // the calendar, not the data — an interval covers len/cell cells),
    // the per-week type intervals carry their cell natively (they lie
    // inside one week by construction, which also makes the grid
    // LOSSLESS: any overlap must share the B side's week), and the join
    // is EQUI on the cell with an exact residual verify. A naive θ-join
    // here is a broadcast-nested-loop over |users|·|type-weeks| — fine
    // for a dim-sized side, quadratic death when both sides are fact
    // scale; the grid form shuffles on a key whose cardinality grows
    // with the calendar and keeps every comparison cell-local.
    QueryDef("j18_interval_overlap",
      """WITH a AS (
        |  SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS a_s,
        |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS a_e
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT event_type, epoch_us(ts) // 604800000000 AS wk,
        |    CAST(MIN(epoch_us(ts)) AS BIGINT) AS b_s,
        |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS b_e
        |  FROM events GROUP BY 1, 2)
        |SELECT a.user_id, b.event_type, b.wk,
        |  CAST(LEAST(a.a_e, b.b_e) - GREATEST(a.a_s, b.b_s) AS BIGINT) AS overlap_us
        |FROM a JOIN b ON a.a_s <= b.b_e AND b.b_s <= a.a_e""".stripMargin) { (s, dir) =>
      val week = 604800000000L
      val ev = events(s, dir)
      val a = ev.groupBy("user_id")
        .agg(min("ts_us").cast("long").as("a_s"), max("ts_us").cast("long").as("a_e"))
      val b = ev.groupBy(col("event_type"), expr(s"ts_us div ${week}L").as("wk"))
        .agg(min("ts_us").cast("long").as("b_s"), max("ts_us").cast("long").as("b_e"))
      val cells = a.withColumn("wk",
        explode(expr(s"sequence(a_s div ${week}L, a_e div ${week}L)")))
      cells.join(b, "wk")
        .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select(col("user_id"), col("event_type"), col("wk"),
          (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
            .cast("long").as("overlap_us"))
    },

    // ------------------------------------------------------------------ J16
    // 5-way star join (the TPC-H Q5 shape): two fact-sized relations
    // (orders, lineitem) joined through three dimensions (customer,
    // supplier, nation→region), with the Q5 twist — the supplier must sit
    // in the CUSTOMER's nation, a join condition spanning non-adjacent
    // tables that forces the optimizer to reason about the whole star
    // rather than a left-deep chain. The region filter prunes at the
    // smallest dim and propagates inward; Catalyst broadcasts every dim
    // (nation/region always; customer/supplier under the threshold at test
    // scale — at 100 TB those two become shuffle joins on their keys while
    // the plan shape is otherwise unchanged). Revenue is the exact
    // DECIMAL(38,6) sum route.
    QueryDef("j16_star_join",
      """SELECT n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("s_suppkey") === col("l_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .join(t(s, dir, "nation"), col("n_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "region"), col("r_regionkey") === col("n_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(38,6)")).cast("double").as("revenue"))
    },

    // ------------------------------------------------------------------ J12
    // Lateral explode: CROSS JOIN UNNEST(sequence(a,b))
    // (raw_data_ingestion_pipeline.py:727-732 — the missing-block check).
    QueryDef("j12_explode_sequence",
      """SELECT o_orderkey, UNNEST(generate_series(1, o_orderkey % 3 + 1)) AS seq
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        explode(sequence(lit(1L), col("o_orderkey") % 3 + 1)).as("seq"))
    },

    // ------------------------------------------------------------- A3 + J12
    // MAP_AGG of per-key metrics then exploded back to rows
    // (ethereum_wallet_features.sql:264-276,312 builds MAP(ARRAY_AGG..),
    // :403-430 reads it back via UNNEST). Building the map and exploding it
    // must round-trip losslessly — the oracle checks the flattened values.
    QueryDef("a3_map_agg_roundtrip",
      """SELECT user_id, event_type, CAST(n AS BIGINT) AS n FROM (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type)""".stripMargin) { (s, dir) =>
      val perType = events(s, dir).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val asMap = perType.groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
          .as("type_counts"))
      asMap.select(col("user_id"), explode(col("type_counts")).as(Seq("event_type", "n")))
    },

    // ------------------------------------------------------------------- A7
    // Incremental accumulate: new aggregates merged into previous state via
    // outer join + COALESCE — the manual partial+final agg pattern behind
    // every MERGE (rugpull_features.sql:155-166). Split point = day 15.
    QueryDef("a7_state_merge",
      """WITH old AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
        |    COUNT(*) AS n, MIN(value) AS mn, MAX(value) AS mx
        |  FROM events WHERE epoch_us(ts) <= 1705276800000000 GROUP BY user_id),
        |new AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
        |    COUNT(*) AS n, MIN(value) AS mn, MAX(value) AS mx
        |  FROM events WHERE epoch_us(ts) > 1705276800000000 GROUP BY user_id)
        |SELECT COALESCE(n.user_id, o.user_id) AS user_id,
        |  CAST(COALESCE(n.total, 0) + COALESCE(o.total, 0) AS DOUBLE) AS total,
        |  COALESCE(n.n, 0) + COALESCE(o.n, 0) AS n,
        |  CASE WHEN n.mn IS NULL THEN o.mn WHEN o.mn IS NULL THEN n.mn
        |       WHEN n.mn < o.mn THEN n.mn ELSE o.mn END AS mn,
        |  CASE WHEN n.mx IS NULL THEN o.mx WHEN o.mx IS NULL THEN n.mx
        |       WHEN n.mx > o.mx THEN n.mx ELSE o.mx END AS mx
        |FROM new n FULL OUTER JOIN old o ON n.user_id = o.user_id""".stripMargin) { (s, dir) =>
      val cut = 1705276800000000L
      def agg(df: DataFrame) = df.groupBy("user_id").agg(
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total"),
        count(lit(1)).as("n"), min("value").as("mn"), max("value").as("mx"))
      val ev = events(s, dir)
      val old = agg(ev.filter(col("ts_us") <= cut)).alias("o")
      val neu = agg(ev.filter(col("ts_us") > cut)).alias("n")
      neu.join(old, col("n.user_id") === col("o.user_id"), "full_outer")
        .select(
          coalesce(col("n.user_id"), col("o.user_id")).as("user_id"),
          (coalesce(col("n.total"), lit(0.0)) + coalesce(col("o.total"), lit(0.0)))
            .cast("double").as("total"),
          (coalesce(col("n.n"), lit(0L)) + coalesce(col("o.n"), lit(0L))).as("n"),
          when(col("n.mn").isNull, col("o.mn")).when(col("o.mn").isNull, col("n.mn"))
            .when(col("n.mn") < col("o.mn"), col("n.mn")).otherwise(col("o.mn")).as("mn"),
          when(col("n.mx").isNull, col("o.mx")).when(col("o.mx").isNull, col("n.mx"))
            .when(col("n.mx") > col("o.mx"), col("n.mx")).otherwise(col("o.mx")).as("mx"))
    },

    // ----------------------------------------------------------------- §2.7
    // UNION ALL with synthetic literal rows (REWARD_ rows,
    // ethereum_internal_transactions.sql:38-68): real rows ∪ concat-built
    // synthetic rows.
    QueryDef("set_union_synthetic",
      """SELECT CAST(s_suppkey AS VARCHAR) AS key, s_name AS name FROM supplier
        |UNION ALL
        |SELECT 'REWARD_' || CAST(r_regionkey AS VARCHAR) AS key,
        |       'REWARD_' || r_name AS name FROM region""".stripMargin) { (s, dir) =>
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").cast("string").as("key"), col("s_name").as("name"))
      val synthetic = t(s, dir, "region").select(
        concat(lit("REWARD_"), col("r_regionkey").cast("string")).as("key"),
        concat(lit("REWARD_"), col("r_name")).as("name"))
      sup.unionByName(synthetic)
    }
  )
}
