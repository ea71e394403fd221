package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 late wave: the mining/attribution statistics a training-data
  * pipeline runs AFTER the drift gates pass — non-parametric trend tests
  * on the daily series (Mann–Kendall, Theil–Sen, Spearman), market-basket
  * co-occurrence projection, marketing attribution, momentum windows, and
  * corpus burstiness. House parity discipline throughout: exact
  * integer/decimal arithmetic end-to-end, a FIXED short sequence of
  * correctly-rounded IEEE double steps only in the last projection.
  * Integer division parity note: DuckDB `//` and Spark `div` BOTH
  * truncate toward zero (verified on negative operands), so fixed-point
  * quantities built with them are bit-identical across engines even when
  * deltas go negative (Theil–Sen slopes).
  *
  * Scale spine shared by the trend tests: the |rows| → |days per type|
  * rollup is the only pass over the data; everything pairwise/sorted
  * runs on the BOUNDED daily relation (days grow with the calendar, not
  * the row count — at 100 TB the daily series per type is still a few
  * thousand rows), so the O(d²) pair joins are scale-invariant in the
  * fact-table size.
  */
object MiningQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)

  private val dec = "decimal(38,0)"

  /** The daily count series per event type — one map-side-combinable
    * rollup, the single fact-table pass all three trend tests share. */
  private def dailyCounts(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  private val dailySql =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2""".stripMargin

  /** The lift projection over a top-pair list + item frequencies + the
    * 1-row order total — shared by the recompute and `_mv` forms. */
  private def liftTail(top: DataFrame, item: DataFrame, n: DataFrame): DataFrame = {
    val ia = item.select(col("l_partkey").as("part_a"), col("n_item").as("n_a"))
    val ib = item.select(col("l_partkey").as("part_b"), col("n_item").as("n_b"))
    top.join(ia, "part_a").join(ib, "part_b")
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") * col("n_orders")
          / (col("n_a").cast("double") * col("n_b"))).as("lift"))
  }

  /** Gini tail over a per-node degree table — histogram, cumulative
    * ranks, exact decimal ranksum, two IEEE steps. Shared by the
    * recompute and `_mv` forms. */
  private def giniFromDegrees(deg: DataFrame): DataFrame = {
    val h = deg.groupBy("d").agg(count(lit(1)).cast("long").as("c"))
    val wCum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(col("d"), col("c"),
      sum("c").over(wCum).cast("long").as("cc"),
      sum(col("d") * col("c")).over(Window.partitionBy()).cast("long").as("t"),
      sum("c").over(Window.partitionBy()).cast("long").as("n"))
    cum.agg(max("n").as("n"), max("t").as("t"),
      sum(col("d").cast(dec)
        * ((col("cc") - col("c")).cast(dec) * col("c")
          + expr("(c * (c + 1)) div 2"))).as("ranksum"))
      .select(col("n"), col("t"), col("ranksum").cast("double").as("ranksum"),
        (lit(2) * col("ranksum").cast("double")
          / (col("n").cast("double") * col("t").cast("double"))
          - (col("n").cast("double") + 1) / col("n").cast("double")).as("gini"))
  }

  /** Oracle SQL shared by each basket-family recompute query and its
    * `_mv` stored-view twin — where the rollup lives cannot change the
    * answer, which is exactly what sharing the oracle proves. */
  private val bipartiteProjSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |            CAST(COUNT(*) AS BIGINT) AS n_orders
      |          FROM op a JOIN op b
      |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |          GROUP BY 1, 2)
      |SELECT part_a, part_b, n_orders FROM pairs
      |ORDER BY n_orders DESC, part_a, part_b LIMIT 100""".stripMargin

  private val basketLiftSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM op),
      |item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM op GROUP BY 1),
      |pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |            CAST(COUNT(*) AS BIGINT) AS n_ab
      |          FROM op a JOIN op b
      |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |          GROUP BY 1, 2),
      |top AS (SELECT part_a, part_b, n_ab FROM pairs
      |        ORDER BY n_ab DESC, part_a, part_b LIMIT 100)
      |SELECT t.part_a, t.part_b, t.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
      |  CAST(t.n_ab AS DOUBLE) * n.n_orders
      |    / (CAST(ia.n_item AS DOUBLE) * ib.n_item) AS lift
      |FROM top t JOIN item ia ON ia.l_partkey = t.part_a
      |           JOIN item ib ON ib.l_partkey = t.part_b, n""".stripMargin

  private val degreeGiniSql =
    """WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      |            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |ed AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY src),
      |h AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM deg GROUP BY d),
      |cum AS (SELECT d, c, CAST(SUM(c) OVER (ORDER BY d) AS BIGINT) AS cc,
      |               CAST(SUM(d * c) OVER () AS BIGINT) AS t,
      |               CAST(SUM(c) OVER () AS BIGINT) AS n FROM h),
      |a AS (SELECT MAX(n) AS n, MAX(t) AS t,
      |        SUM(CAST(d AS DECIMAL(38,0))
      |            * (CAST(cc - c AS DECIMAL(38,0)) * c + (c * (c + 1)) // 2)) AS ranksum
      |      FROM cum)
      |SELECT n, t, CAST(ranksum AS DOUBLE) AS ranksum,
      |  2 * CAST(ranksum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
      |    - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE) AS gini
      |FROM a""".stripMargin

  /** The joined order-line relation the [[graft.pipeline.BasketStore]]
    * ingests: (l_orderkey, l_partkey, o_custkey, l_suppkey). */
  private def orderLines(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "orders")
      .join(Graft.table(s, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("o_custkey"), col("l_suppkey"))

  /** Bootstrap-or-resume the persisted basket store for `dir` at the
    * 4/5-orderkey watermark cut (the stored-corpus / live-batch split
    * every *_stored query uses), admit the batch, return the root. The
    * second and later calls replay to a cheap no-op (watermark guard). */
  private def basketRoot(s: SparkSession, dir: String): String = {
    // maxOk comes from lineitem — the SAME quantity the store's watermark
    // tracks (max l_orderkey of orders⋈lineitem ≡ max l_orderkey of
    // lineitem under the FK). Deriving it from orders alone broke the
    // warm-path short circuit whenever the highest-keyed order had no
    // line rows: the watermark could never reach it, so every serving
    // call re-paid the two admission aggregations just to melt the batch.
    val maxOk = Graft.table(s, dir, "lineitem")
      .agg(max("l_orderkey")).head.getLong(0)
    val cut = maxOk * 4 / 5
    val fp = Graft.dataFingerprint(s, s"$dir/lineitem.parquet") + "_" +
      Graft.dataFingerprint(s, s"$dir/orders.parquet")
    val root = graft.core.StoreRoots.rootFor("graft_basket_store", "v2", dir,
      s"${cut}_$fp")
    val ol = orderLines(s, dir)
    graft.pipeline.BasketStore.ensureBuilt(s, root,
      ol.filter(col("l_orderkey") < cut))
    // warm-path short circuit: when the committed watermark already
    // covers the table's max orderkey (metadata-only check), skip the
    // admission entirely — admitBatch would scan the batch twice just to
    // melt it, and a SERVING query must not pay fact-table I/O
    if (graft.pipeline.BasketStore.watermark(s, root).forall(_ < maxOk))
      graft.pipeline.BasketStore.admitBatch(s, root,
        ol.filter(col("l_orderkey") >= cut)): Unit
    root
  }

  /** The distinct customer↔supplier interaction edges (the graph
    * family's node numbering: 2·cust even / 2·supp+1 odd), shared by
    * the degree-distribution queries here. */
  private def bipartiteEdges(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "orders")
      .join(Graft.table(s, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  private val bipartiteEdgesSql =
    """SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      |            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------ A-45
    // Mann–Kendall trend test per event type on the daily count series —
    // the non-parametric "is this metric drifting" screen that does not
    // assume linearity or normality (a38_regression's OLS does). The S
    // statistic is a pure integer pair sum (sign of every forward pair),
    // the tie-corrected variance numerator n(n−1)(2n+5) − Σt(t−1)(2t+5)
    // stays BIGINT (n = DAYS per type, a few thousand at any fact-table
    // scale — cubes of it are nowhere near the BIGINT edge), and the
    // continuity-corrected z is exactly three IEEE steps
    // (divide-by-18, sqrt, divide). The pairwise join runs on the
    // bounded daily relation — broadcast both sides, zero fact-table
    // shuffles beyond the one rollup.
    QueryDef("a45_mann_kendall",
      s"""WITH daily AS ($dailySql),
        |s AS (SELECT a.event_type,
        |        CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1
        |                      WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND b.day > a.day
        |      GROUP BY 1),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1),
        |ties AS (SELECT event_type,
        |           CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |         FROM (SELECT event_type, cnt, CAST(COUNT(*) AS BIGINT) AS t
        |               FROM daily GROUP BY 1, 2) g
        |         GROUP BY 1),
        |v AS (SELECT n.event_type, n.n, s.s_stat,
        |        n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS var18
        |      FROM n JOIN s ON s.event_type = n.event_type
        |             JOIN ties ON ties.event_type = n.event_type)
        |SELECT event_type, n, s_stat, var18,
        |  CASE WHEN var18 <= 0 THEN NULL
        |       WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |         / sqrt(CAST(var18 AS DOUBLE) / 18)
        |       WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |         / sqrt(CAST(var18 AS DOUBLE) / 18)
        |       ELSE CAST(0 AS DOUBLE) END AS z
        |FROM v""".stripMargin) { (s, dir) =>
      val daily = dailyCounts(s, dir).persist() // feeds pairs, ties AND n
      val pairs = daily.as("a")
        .join(broadcast(daily.as("b")),
          col("a.event_type") === col("b.event_type") && col("b.day") > col("a.day"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(when(col("b.cnt") > col("a.cnt"), 1L)
          .when(col("b.cnt") < col("a.cnt"), -1L).otherwise(0L))
          .cast("long").as("s_stat"))
      val n = daily.groupBy("event_type").agg(count(lit(1)).cast("long").as("n"))
      val ties = daily.groupBy(col("event_type"), col("cnt"))
        .agg(count(lit(1)).cast("long").as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .cast("long").as("tie_term"))
      val v = n.join(pairs, "event_type").join(ties, "event_type")
        .withColumn("var18",
          col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie_term"))
      val z = when(col("var18") <= 0, lit(null))
        .when(col("s_stat") > 0,
          (col("s_stat") - 1).cast("double") / sqrt(col("var18").cast("double") / 18))
        .when(col("s_stat") < 0,
          (col("s_stat") + 1).cast("double") / sqrt(col("var18").cast("double") / 18))
        .otherwise(lit(0.0))
      val out = v.select(col("event_type"), col("n"), col("s_stat"),
        col("var18"), z.as("z"))
      CacheScope.sealResult(out, daily)
    },

    // ------------------------------------------------------------------ A-46
    // Theil–Sen robust slope per event type — the median of all pairwise
    // slopes of the daily series, the estimator that shrugs off the
    // outlier days OLS chases. Slopes are quantized to 1e-9 fixed point
    // with TRUNCATING integer division (identical in both engines, see
    // the object note), and the statistic is DEFINED as the positional
    // median of those quantized slopes — exact, deterministic, no float
    // ordering anywhere. Overflow headroom: Δcnt·1e9 needs |Δcnt| <
    // 9.2e9 — a per-type, per-day count delta of nine billion, far past
    // 100 TB's ~3e9/day ceiling. The rank window runs per type over the
    // bounded pair relation (d² of a few-thousand-day series).
    QueryDef("a46_theil_sen",
      s"""WITH daily AS ($dailySql),
        |p AS (SELECT a.event_type,
        |        ((b.cnt - a.cnt) * 1000000000) // (b.day - a.day) AS slope_fp
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND b.day > a.day),
        |r AS (SELECT event_type, slope_fp,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_fp) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n_pairs FROM p)
        |SELECT event_type, CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
        |  CAST(MAX(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope_fp END) AS BIGINT)
        |    AS median_slope_fp,
        |  CAST(MAX(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope_fp END) AS DOUBLE)
        |    / 1000000000 AS median_slope
        |FROM r GROUP BY event_type""".stripMargin) { (s, dir) =>
      val daily = dailyCounts(s, dir).persist()
      val p = daily.as("a")
        .join(broadcast(daily.as("b")),
          col("a.event_type") === col("b.event_type") && col("b.day") > col("a.day"))
        .select(col("a.event_type").as("event_type"),
          expr("((b.cnt - a.cnt) * 1000000000L) div (b.day - a.day)").as("slope_fp"))
      val w = Window.partitionBy("event_type").orderBy("slope_fp")
      val r = p.withColumn("rn", row_number().over(w))
        .withColumn("n_pairs",
          count(lit(1)).over(Window.partitionBy("event_type")))
      val out = r.groupBy("event_type")
        .agg(max("n_pairs").cast("long").as("n_pairs"),
          max(when(col("rn") === expr("(n_pairs + 1) div 2"), col("slope_fp")))
            .cast("long").as("median_slope_fp"))
        .withColumn("median_slope",
          col("median_slope_fp").cast("double") / 1000000000L)
      CacheScope.sealResult(out, daily)
    },

    // ------------------------------------------------------------------ A-47
    // Spearman rank correlation between the purchase and click daily
    // count series — "do the two channels move together" measured on
    // ranks, robust to the heavy right tail that distorts Pearson. Tied
    // ranks use the textbook average-rank convention kept EXACT by
    // doubling: 2·avgrank = 2·RANK + (ties − 1) is always an integer, so
    // the rank moments stay BIGINT/DECIMAL and ρ (Pearson on the doubled
    // ranks — doubling cancels) is three IEEE steps at the end. The rank
    // windows run over the bounded shared-day relation; the single
    // fact-table pass is the (day × type) rollup.
    QueryDef("a47_spearman",
      """WITH byday AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pc,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cc
        |  FROM events GROUP BY 1),
        |r AS (SELECT day, pc, cc,
        |    2 * RANK() OVER (ORDER BY pc) + COUNT(*) OVER (PARTITION BY pc) - 1 AS rx,
        |    2 * RANK() OVER (ORDER BY cc) + COUNT(*) OVER (PARTITION BY cc) - 1 AS ry
        |  FROM byday),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
        |        SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS sxy,
        |        SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS sxx,
        |        SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS syy
        |      FROM r)
        |SELECT n, sx, sy,
        |  CASE WHEN CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx = 0
        |         OR CAST(syy AS DECIMAL(38,0)) * n - CAST(sy AS DECIMAL(38,0)) * sy = 0
        |    THEN NULL ELSE
        |    CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |      / sqrt(CAST(CAST(sxx AS DECIMAL(38,0)) * n
        |                  - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |             * CAST(CAST(syy AS DECIMAL(38,0)) * n
        |                    - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
        |  END AS rho
        |FROM m""".stripMargin) { (s, dir) =>
      val byday = events(s, dir)
        .groupBy(expr("ts_us div 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("long").as("pc"),
          sum(when(col("event_type") === "click", 1).otherwise(0))
            .cast("long").as("cc"))
      val r = byday
        .withColumn("rx", lit(2) * rank().over(Window.orderBy("pc"))
          + count(lit(1)).over(Window.partitionBy("pc")) - 1)
        .withColumn("ry", lit(2) * rank().over(Window.orderBy("cc"))
          + count(lit(1)).over(Window.partitionBy("cc")) - 1)
      val m = r.agg(count(lit(1)).cast("long").as("n"),
        sum("rx").cast("long").as("sx"), sum("ry").cast("long").as("sy"),
        sum(col("rx").cast(dec) * col("ry")).as("sxy"),
        sum(col("rx").cast(dec) * col("rx")).as("sxx"),
        sum(col("ry").cast(dec) * col("ry")).as("syy"))
      val dxD = col("sxx").cast(dec) * col("n") - col("sx").cast(dec) * col("sx")
      val dyD = col("syy").cast(dec) * col("n") - col("sy").cast(dec) * col("sy")
      m.select(col("n"), col("sx"), col("sy"),
        when(dxD === 0 || dyD === 0, lit(null))
          .otherwise((col("sxy").cast(dec) * col("n")
            - col("sx").cast(dec) * col("sy")).cast("double")
            / sqrt(dxD.cast("double") * dyD.cast("double"))).as("rho"))
    },

    // ------------------------------------------------------------------ W-23
    // Cutler's RSI (simple-moving-average momentum index) over each
    // user's event-value series — the bounded 0..100 overbought/oversold
    // oscillator beside w22_bollinger's volatility bands. The delta,
    // gain and loss sums stay integer cents; the index is ONE truncating
    // integer division to ppm (gains·1e6 // (gains+losses)) — no float
    // anywhere, and the division operands are non-negative by
    // construction. Rows are emitted only once the lookback holds the
    // full 14 deltas, so warmup rows never enter the hash. Constant
    // per-row state at any scale: a fixed 14-row frame per user
    // partition, one window exchange.
    QueryDef("w23_rsi",
      """WITH c AS (SELECT user_id, event_id, ts,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, event_id, ts, cents,
        |    cents - lag(cents) OVER win AS delta
        |  FROM c WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, event_id, cents,
        |    CAST(COUNT(delta) OVER rsi AS BIGINT) AS n_delta,
        |    CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER rsi AS BIGINT) AS gains,
        |    CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER rsi AS BIGINT) AS losses
        |  FROM d WINDOW rsi AS (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, cents, gains, losses,
        |  CASE WHEN gains + losses = 0 THEN NULL
        |       ELSE (gains * 1000000) // (gains + losses) END AS rsi_ppm
        |FROM g WHERE n_delta = 14""".stripMargin) { (s, dir) =>
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val rsiW = ord.rowsBetween(-13, Window.currentRow)
      val c = events(s, dir).select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val d = c.withColumn("delta", col("cents") - lag("cents", 1).over(ord))
      d.withColumn("n_delta", count("delta").over(rsiW).cast("long"))
        .withColumn("gains",
          sum(when(col("delta") > 0, col("delta")).otherwise(0L)).over(rsiW)
            .cast("long"))
        .withColumn("losses",
          sum(when(col("delta") < 0, -col("delta")).otherwise(0L)).over(rsiW)
            .cast("long"))
        .filter(col("n_delta") === 14)
        .select(col("user_id"), col("event_id"), col("cents"),
          col("gains"), col("losses"),
          when(col("gains") + col("losses") === 0, lit(null))
            .otherwise(expr("(gains * 1000000) div (gains + losses)"))
            .as("rsi_ppm"))
    },

    // ------------------------------------------------------------------ G-BP
    // Bipartite co-occurrence projection (market-basket): project the
    // order–part bipartite graph onto part–part edges weighted by the
    // number of orders carrying both — the co-occurrence relation a
    // recommender or negative-sampling stage trains on. The pair
    // fan-out is bounded by the per-order line count (≤ 7 in this
    // schema's TPC-H shape → ≤ 21 pairs per order), so the projection
    // stays LINEAR in the fact table at any scale. The oracle states it
    // as the classic DISTINCT + self-join; the Spark plan instead
    // gathers each order's part SET in ONE exchange (partial collect_set
    // combines map-side) and explodes the canonical i<j pairs from the
    // sorted array WITHOUT a join — two exchanges total (orderkey
    // gather, pair rollup) vs the join form's four. Top-100 by weight
    // via TakeOrdered — no global sort. A pathological giant order
    // would square inside one group; this schema caps lines per order,
    // which is exactly what makes the basket projection feasible.
    QueryDef("g_bipartite_proj", bipartiteProjSql) { (s, dir) =>
      graft.pipeline.BasketStore.pairCounts(Graft.table(s, dir, "lineitem"))
        .withColumnRenamed("n_ab", "n_orders")
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(100)
    },

    // ------------------------------------------------------------------ A-48
    // Last-touch attribution: each purchase's value is credited to the
    // channel (event type) of the user's most recent PRECEDING
    // non-purchase event — the classic marketing rollup, and the same
    // "carry the last qualifying row forward" window shape the flagship
    // balance stitch uses. IGNORE-NULLS last_value over a
    // rows-to-1-preceding frame (both engines support it natively);
    // purchases with no preceding touch land in the 'organic' bucket.
    // Revenue stays exact cents. One window exchange on user_id, one
    // bounded (≤ |channels|+1) rollup.
    QueryDef("a48_attribution",
      """WITH o AS (SELECT user_id, event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, epoch_us(ts) AS ts_us
        |  FROM events),
        |t AS (SELECT user_id, event_id, event_type, cents,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM o)
        |SELECT COALESCE(touch, 'organic') AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"), col("ts_us"))
        .withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("organic")).as("channel"))
        .agg(count(lit(1)).cast("long").as("n_purchases"),
          sum("cents").cast("long").as("revenue_cents"))
    },

    // ---------------------------------------------------------------- TEXT-B
    // Token burstiness (Church–Gale): for the 100 highest
    // collection-frequency tokens, the doc frequency, the mean
    // occurrences-per-carrying-doc in ppm (cf·1e6 // df — truncating
    // integer, parity-exact), and the EXACT integer variance numerator
    // of the per-doc counts (df·Σtf² − cf², decimal-widened). Function
    // words spread evenly (burstiness ≈ 1); content words concentrate
    // (≫ 1) — the signal topic-aware curation samples on. One
    // (token, doc) rollup, one token rollup, TakeOrdered — no sort, no
    // window; the token relation is vocabulary-bounded.
    QueryDef("t_burstiness",
      """WITH td AS (
        |  SELECT t.token, d.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
        |  GROUP BY 1, 2),
        |tok AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
        |          CAST(SUM(tf) AS BIGINT) AS cf,
        |          SUM(CAST(tf AS DECIMAL(38,0)) * tf) AS stf2
        |        FROM td GROUP BY token)
        |SELECT token, df, cf, (cf * 1000000) // df AS burst_ppm,
        |  CAST(CAST(df AS DECIMAL(38,0)) * stf2
        |       - CAST(cf AS DECIMAL(38,0)) * cf AS DOUBLE)
        |    / (CAST(df AS DOUBLE) * CAST(df AS DOUBLE)) AS tf_var
        |FROM tok ORDER BY cf DESC, token LIMIT 100""".stripMargin) { (s, dir) =>
      val td = Graft.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token", "doc_id").agg(count(lit(1)).cast("long").as("tf"))
      td.groupBy("token")
        .agg(count(lit(1)).cast("long").as("df"),
          sum("tf").cast("long").as("cf"),
          sum(col("tf").cast(dec) * col("tf")).as("stf2"))
        .select(col("token"), col("df"), col("cf"),
          expr("(cf * 1000000) div df").as("burst_ppm"),
          ((col("df").cast(dec) * col("stf2")
            - col("cf").cast(dec) * col("cf")).cast("double")
            / (col("df").cast("double") * col("df").cast("double"))).as("tf_var"))
        .orderBy(col("cf").desc, col("token")).limit(100)
    },

    // ------------------------------------------------------------------ G-BL
    // Association lift for the top-100 co-occurring part pairs — the
    // market-basket significance score on top of g_bipartite_proj's raw
    // counts (a high co-count of two universally-popular parts is
    // noise; lift = P(a,b)/(P(a)·P(b)) normalizes it away, the statistic
    // a recommender thresholds on). Counts stay exact BIGINT (the
    // join-free pair gather + one distinct-pair item rollup); lift is
    // three IEEE steps from exact integers (the BIGINT product n_ab·N
    // overflows at ~1.5e9 orders, so the double form is the SAFE one —
    // each operand exact, each step correctly rounded, deterministic in
    // both engines). The top-100 joins its item frequencies broadcast.
    QueryDef("g_basket_lift", basketLiftSql) { (s, dir) =>
      val op = Graft.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct().persist()
      val n = op.agg(countDistinct("l_orderkey").cast("long").as("n_orders"))
      val item = op.groupBy("l_partkey")
        .agg(count(lit(1)).cast("long").as("n_item"))
      val top = graft.pipeline.BasketStore
        .pairCounts(Graft.table(s, dir, "lineitem"))
        .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
        .limit(100).persist()
      val out = liftTail(top, item, n)
      CacheScope.sealResult(out, op, top)
    },

    // ------------------------------------------------------------------ A-49
    // Smoothed target encoding of part brand by return rate — the
    // Bayesian mean encoding every tabular-ML feature pipeline ships
    // (category → shrunk posterior rate, so rare categories pull toward
    // the global prior instead of memorizing noise). te = (ret + m·prior)
    // / (n + m) with m = 100, entirely in truncating-integer ppm —
    // prior_ppm from ONE global rollup, the blend ONE division per
    // category. Overflow headroom: ret·1e6 needs ret < 9.2e12 per brand
    // (a 25-brand split of even 100 TB sits far below). The dimension
    // join broadcasts `part`; the category relation is bounded (25
    // brands), so everything after the one fact rollup is scalar work.
    QueryDef("a49_target_encode",
      """WITH j AS (SELECT p.p_brand,
        |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |g AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(r) AS BIGINT) AS ret FROM j GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |        CAST(SUM(ret) AS BIGINT) AS tret FROM g),
        |pr AS (SELECT (tret * 1000000) // tn AS prior_ppm FROM t)
        |SELECT g.p_brand, g.n, g.ret, pr.prior_ppm,
        |  (g.ret * 1000000 + 100 * pr.prior_ppm) // (g.n + 100) AS te_ppm
        |FROM g, pr""".stripMargin) { (s, dir) =>
      val g = Graft.table(s, dir, "lineitem")
        .join(broadcast(Graft.table(s, dir, "part")),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand"),
          when(col("l_returnflag") === "R", 1).otherwise(0).as("r"))
        .groupBy("p_brand")
        .agg(count(lit(1)).cast("long").as("n"), sum("r").cast("long").as("ret"))
      val pr = g.agg(sum("n").cast("long").as("tn"),
        sum("ret").cast("long").as("tret"))
        .select(expr("(tret * 1000000) div tn").as("prior_ppm"))
      g.crossJoin(broadcast(pr))
        .select(col("p_brand"), col("n"), col("ret"), col("prior_ppm"),
          expr("(ret * 1000000 + 100 * prior_ppm) div (n + 100)").as("te_ppm"))
    },

    // ------------------------------------------------------------------ A-50
    // MASE-style forecast benchmark on the daily series: the seasonal-
    // naive (lag-7) forecast's MAE against the naive (lag-1) MAE per
    // event type — "does last week predict today better than yesterday
    // does", the scale-free skill score a pipeline checks BEFORE
    // trusting any seasonal feature (a42's indices only help if this
    // ratio < 1). Absolute-delta sums stay exact BIGINT on the bounded
    // daily relation; the ratio of the two rational MAEs is three IEEE
    // steps. One fact rollup, two lag reads off one window sort.
    QueryDef("a50_mase",
      s"""WITH daily AS ($dailySql),
        |d AS (SELECT event_type, cnt,
        |        cnt - lag(cnt, 1) OVER w AS d1,
        |        cnt - lag(cnt, 7) OVER w AS d7
        |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |m AS (SELECT event_type,
        |        CAST(COUNT(d1) AS BIGINT) AS n1, CAST(SUM(ABS(d1)) AS BIGINT) AS s1,
        |        CAST(COUNT(d7) AS BIGINT) AS n7, CAST(SUM(ABS(d7)) AS BIGINT) AS s7
        |      FROM d GROUP BY 1)
        |SELECT event_type, n1, s1, n7, s7,
        |  CASE WHEN s1 = 0 OR n7 = 0 THEN NULL
        |    ELSE (CAST(s7 AS DOUBLE) / n7) / (CAST(s1 AS DOUBLE) / n1) END AS mase
        |FROM m""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("day")
      val d = dailyCounts(s, dir)
        .select(col("event_type"), col("cnt"),
          (col("cnt") - lag("cnt", 1).over(w)).as("d1"),
          (col("cnt") - lag("cnt", 7).over(w)).as("d7"))
      d.groupBy("event_type")
        .agg(count("d1").cast("long").as("n1"),
          sum(abs(col("d1"))).cast("long").as("s1"),
          count("d7").cast("long").as("n7"),
          sum(abs(col("d7"))).cast("long").as("s7"))
        .select(col("event_type"), col("n1"), col("s1"), col("n7"), col("s7"),
          when(col("s1") === 0 || col("n7") === 0, lit(null))
            .otherwise((col("s7").cast("double") / col("n7"))
              / (col("s1").cast("double") / col("n1"))).as("mase"))
    },

    // ------------------------------------------------------------------ G-DG
    // Gini coefficient of the interaction-graph degree distribution —
    // the one-number inequality summary of graph health (a hub-dominated
    // graph salts differently, samples differently, and breaks
    // mean-field assumptions; t_source_gini's Lorenz machinery applied
    // to degrees). The rank sum A = Σ i·d(i) over degrees sorted
    // ascending NEVER sorts the nodes: degrees roll up to a HISTOGRAM
    // over the degree-VALUE domain, and each value group's rank-block
    // sum is closed-form ((cc−c)·c + c(c+1)/2, exact integers), so the
    // cumulative window runs over the bounded histogram — degree-domain
    // rows, not |V| rows. Products widen to DECIMAL(38,0) (cc·c is
    // |V|² ≈ 1e18 at a billion nodes — the BIGINT edge). G emits as
    // four fixed IEEE steps from exact integer moments. Degrees come
    // from the direct distinct-pair + count build, NOT the graph
    // family's collect_set adjacency spine: gini needs only the degree
    // NUMBER, and materializing neighbor arrays to take their size was
    // measured SLOWER at both scales (ScaleBench 100×: 38.4 s spine vs
    // 34.3 s direct; t1 7.6 vs 2.2 s). The 100× cost is the structural
    // |E|-row dedup shuffle every exact-degree computation pays — the
    // same class as the g_* spine, which costs more, not less.
    QueryDef("g_degree_gini", degreeGiniSql) { (s, dir) =>
      val e0 = bipartiteEdges(s, dir)
      val ed = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      giniFromDegrees(ed.groupBy("src").agg(count(lit(1)).cast("long").as("d")))
    },

    // ------------------------------------------------------------------ G-RC
    // Rich-club connectivity of the hubs — top-10 customers × top-10
    // suppliers by degree, the fraction of POSSIBLE hub-hub edges that
    // exist: "do the whales transact with each other", the
    // hub-collusion screen g_degree_gini's inequality number can't
    // answer. (Per-SIDE top-k, not a global top-20: degree scales
    // differ across the bipartite sides, so a global cut degenerates to
    // one side and φ is undefined.) Hub sets are TakeOrdered top-10s
    // (deterministic id tie-break); both membership probes BROADCAST
    // them, so after the degree rollup the whole query is one linear
    // edge scan with two broadcast semi-joins and a ppm division. No
    // |V| sort, no pair join.
    QueryDef("g_rich_club",
      s"""WITH e0 AS ($bipartiteEdgesSql),
        |ed AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY src),
        |ch AS (SELECT src, d FROM deg WHERE src % 2 = 0 ORDER BY d DESC, src LIMIT 10),
        |sh AS (SELECT src, d FROM deg WHERE src % 2 = 1 ORDER BY d DESC, src LIMIT 10),
        |hubs AS (SELECT src FROM ch UNION ALL SELECT src FROM sh),
        |k AS (SELECT CAST((SELECT COUNT(*) FROM ch) AS BIGINT) AS n_cust,
        |             CAST((SELECT COUNT(*) FROM sh) AS BIGINT) AS n_supp),
        |eh AS (SELECT CAST(COUNT(*) AS BIGINT) AS e_hub FROM e0
        |       WHERE src IN (SELECT src FROM hubs) AND dst IN (SELECT src FROM hubs))
        |SELECT k.n_cust, k.n_supp, eh.e_hub,
        |  CASE WHEN k.n_cust * k.n_supp = 0 THEN NULL
        |    ELSE (eh.e_hub * 1000000) // (k.n_cust * k.n_supp) END AS phi_ppm
        |FROM k, eh""".stripMargin) { (s, dir) =>
      val e0 = bipartiteEdges(s, dir).persist()
      val ed = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = ed.groupBy("src").agg(count(lit(1)).cast("long").as("d")).persist()
      val ch = deg.filter(pmod(col("src"), lit(2)) === 0)
        .orderBy(col("d").desc, col("src")).limit(10)
      val sh = deg.filter(pmod(col("src"), lit(2)) === 1)
        .orderBy(col("d").desc, col("src")).limit(10)
      val hubs = ch.select("src").unionAll(sh.select("src")).persist()
      val k = ch.agg(count(lit(1)).cast("long").as("n_cust"))
        .crossJoin(sh.agg(count(lit(1)).cast("long").as("n_supp")))
      val hubSet = hubs.select(col("src").as("hub"))
      val eh = e0
        .join(broadcast(hubSet), col("src") === col("hub"), "left_semi")
        .join(broadcast(hubSet), col("dst") === col("hub"), "left_semi")
        .agg(count(lit(1)).cast("long").as("e_hub"))
      val out = k.crossJoin(eh)
        .select(col("n_cust"), col("n_supp"), col("e_hub"),
          when(col("n_cust") * col("n_supp") === 0, lit(null))
            .otherwise(expr("(e_hub * 1000000) div (n_cust * n_supp)"))
            .as("phi_ppm"))
      CacheScope.sealResult(out, e0, deg, hubs)
    },

    // ------------------------------------------------------------------ A-52
    // Time-decay multi-touch attribution — a48's last-touch rule, but
    // every preceding touch inside a 7-day window shares the purchase's
    // credit with geometrically decaying weight (halving per day: the
    // classic time-decay model, and the weights are EXACT bit shifts —
    // 1e6 >> days_back — so no float enters). Per-purchase shares
    // normalize by the window's weight sum in truncating ppm; the
    // credit rollup is exact DECIMAL cents×ppm. The pair space is the
    // banded per-user join (j8's shape — one user-keyed shuffle, fan-in
    // bounded by 7-day per-user activity); the share window partitions
    // by purchase id. Purchases with no window touches carry no rows
    // here by design (a48's 'organic' bucket is the last-touch view).
    QueryDef("a52_decay_attribution",
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |pt AS (SELECT p.event_id AS pid, p.cents, t.event_type AS channel,
        |         (p.ts_us - t.ts_us) // 86400000000 AS days_back
        |       FROM ev p JOIN ev t ON t.user_id = p.user_id
        |         AND p.event_type = 'purchase' AND t.event_type <> 'purchase'
        |         AND t.ts_us < p.ts_us
        |         AND p.ts_us - t.ts_us <= 7 * 86400000000),
        |w AS (SELECT pid, cents, channel, 1000000 >> days_back AS wt FROM pt),
        |sw AS (SELECT pid, cents, channel, wt,
        |         CAST(SUM(wt) OVER (PARTITION BY pid) AS BIGINT) AS swt FROM w),
        |sh AS (SELECT channel, cents, (wt * 1000000) // swt AS share_ppm FROM sw)
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touch,
        |  CAST(SUM(CAST(cents AS DECIMAL(38,0)) * share_ppm) AS DOUBLE) AS credit
        |FROM sh GROUP BY 1""".stripMargin) { (s, dir) =>
      val dayUs = 86400000000L
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("event_id").as("pid"),
          col("ts_us").as("p_ts"), col("cents"))
      val t = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("t_uid"), col("event_type").as("channel"),
          col("ts_us").as("t_ts"))
      val pt = p.join(t, col("t_uid") === col("p_uid")
          && col("t_ts") < col("p_ts")
          && col("p_ts") - col("t_ts") <= lit(7L * dayUs))
        .select(col("pid"), col("cents"), col("channel"),
          expr(s"(p_ts - t_ts) div ${dayUs}L").as("days_back"))
      val sw = pt
        .withColumn("wt", expr("shiftright(1000000L, cast(days_back as int))"))
        .withColumn("swt",
          sum("wt").over(Window.partitionBy("pid")).cast("long"))
      sw.select(col("channel"), col("cents"),
          expr("(wt * 1000000) div swt").as("share_ppm"))
        .groupBy("channel")
        .agg(count(lit(1)).cast("long").as("n_touch"),
          sum(col("cents").cast(dec) * col("share_ppm")).cast("double").as("credit"))
    },

    // ------------------------------------------------------------------ A-53
    // Time-to-convert distribution: days from each user's FIRST signup
    // to their first subsequent purchase — the funnel-velocity summary
    // (n converted, min/median/p90/max days) a growth pipeline tracks
    // beside a23_funnel's stage counts. The per-user lag relation is
    // |users|-sized, NOT bounded, so the median/p90 never sort it: they
    // ride the bucketed-histogram EXACT positional selection (the
    // a27/dq_outlier_iqr machinery — two map-side-combinable passes +
    // one bucket-filtered probe). The oracle states the same ranks
    // positionally; rank k ≡ min v with cumcount(≤v) ≥ k makes them
    // hash-equal. Min/max are plain aggregates on the same cached lag
    // relation.
    QueryDef("a53_time_to_convert",
      """WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS s_ts
        |           FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_ts
        |      FROM events e JOIN s ON s.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_ts
        |      GROUP BY 1),
        |l AS (SELECT p.user_id, (p.p_ts - s.s_ts) // 86400000000 AS lag_days
        |      FROM p JOIN s ON s.user_id = p.user_id),
        |r AS (SELECT lag_days, ROW_NUMBER() OVER (ORDER BY lag_days) AS rn,
        |             COUNT(*) OVER () AS n FROM l)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
        |  CAST(MIN(lag_days) AS BIGINT) AS min_days,
        |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_days END) AS BIGINT) AS p50_days,
        |  CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_days END) AS BIGINT) AS p90_days,
        |  CAST(MAX(lag_days) AS BIGINT) AS max_days
        |FROM r""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = events(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("s_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, "user_id")
        .filter(col("ts_us") >= col("s_ts"))
        .groupBy("user_id").agg(min("ts_us").as("p_ts"), min("s_ts").as("s_ts"))
      val lags = pu
        .select(lit("all").as("event_type"),
          expr("(p_ts - s_ts) div 86400000000L").as("v"))
        .persist() // feeds the selection passes AND the min/max rollup
      val sel = ExtraQueries.typedPositionalSelect(s, lags,
        n => Seq("p50" -> (n + 1) / 2, "p90" -> (9 * n + 9) / 10))
      val mm = lags.agg(min("v").cast("long").as("min_days"),
        max("v").cast("long").as("max_days"))
      val bands = Seq((sel(("all", "p50"))._1, sel(("all", "p50"))._2,
        sel(("all", "p90"))._2))
        .toDF("n_converted", "p50_days", "p90_days")
      val out = bands.crossJoin(mm)
        .select(col("n_converted"), col("min_days"), col("p50_days"),
          col("p90_days"), col("max_days"))
      CacheScope.sealResult(out, lags)
    },

    // ------------------------------------------------------------------ A-54
    // Cohort lifetime value: cumulative purchase revenue per
    // (first-activity-week cohort, week offset) with per-user LTV —
    // a24_cohort's retention triangle upgraded from presence counts to
    // exact revenue cents (the curve a growth model actually fits).
    // Weeks are integer floor division on epoch micros (the a24
    // discipline — never engine week-start conventions); the cumulative
    // window runs over the BOUNDED (cohort × offset) triangle, and
    // per-user LTV is ONE truncating division. Fact-scale cost: one
    // (user, week) rollup + the user-keyed first-week join.
    QueryDef("a54_cohort_ltv",
      """WITH uw AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END AS cents
        |  FROM events),
        |uwk AS (SELECT user_id, week, CAST(SUM(cents) AS BIGINT) AS rev
        |        FROM uw GROUP BY 1, 2),
        |fw AS (SELECT user_id, MIN(week) AS cohort FROM uwk GROUP BY 1),
        |cell AS (SELECT f.cohort, u.week - f.cohort AS offs,
        |           CAST(SUM(u.rev) AS BIGINT) AS rev
        |         FROM uwk u JOIN fw f ON f.user_id = u.user_id GROUP BY 1, 2),
        |cs AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users FROM fw GROUP BY 1)
        |SELECT c.cohort, c.offs, c.rev, cs.n_users,
        |  CAST(SUM(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.offs) AS BIGINT)
        |    AS cum_rev,
        |  CAST(SUM(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.offs) AS BIGINT)
        |    // cs.n_users AS ltv_cents
        |FROM cell c JOIN cs ON cs.cohort = c.cohort""".stripMargin) { (s, dir) =>
      val weekUs = 604800000000L
      val uwk = events(s, dir)
        .select(col("user_id"), expr(s"ts_us div ${weekUs}L").as("week"),
          when(col("event_type") === "purchase",
            floor(col("value") * 100 + 0.5).cast("long")).otherwise(0L).as("cents"))
        .groupBy("user_id", "week").agg(sum("cents").cast("long").as("rev"))
        .persist() // feeds the cohort min AND the cell rollup
      val fw = uwk.groupBy("user_id").agg(min("week").as("cohort"))
      val cell = uwk.join(fw, "user_id")
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("offs"))
        .agg(sum("rev").cast("long").as("rev"))
      val cs = fw.groupBy("cohort").agg(count(lit(1)).cast("long").as("n_users"))
      val wCum = Window.partitionBy("cohort").orderBy("offs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val out = cell.join(cs, "cohort")
        .withColumn("cum_rev", sum("rev").over(wCum).cast("long"))
        .select(col("cohort"), col("offs"), col("rev"), col("n_users"),
          col("cum_rev"), expr("cum_rev div n_users").as("ltv_cents"))
      CacheScope.sealResult(out, uwk)
    },

    // ------------------------------------------------------------------ A-55
    // RFM segmentation: every user scored 1–5 on Recency (days since
    // last activity vs the corpus max), Frequency (purchase count) and
    // Monetary (purchase cents), bucketed by VALUE-quintile thresholds
    // — the classic marketing segmentation grid, rolled up to the
    // bounded (r, f, m) cell relation. Thresholds are EXACT positional
    // ranks ⌈i·n/5⌉ over each measure: the oracle states them with
    // ROW_NUMBER; the Spark side rides typedPositionalSelect (NO
    // |users| sort — the a27 histogram machinery, three calls on one
    // cached measure relation). A score is 1 + #(thresholds strictly
    // below the value): value-deterministic under ties in both engines
    // by construction, unlike NTILE (positional, tie-ambiguous). Scale:
    // one fact rollup to |users| rows, bounded everything after.
    QueryDef("a55_rfm",
      """WITH gmax AS (SELECT MAX(epoch_us(ts)) AS mts FROM events),
        |m AS (SELECT e.user_id,
        |    (gmax.mts - MAX(epoch_us(e.ts))) // 86400000000 AS rec,
        |    CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS freq,
        |    CAST(SUM(CASE WHEN e.event_type = 'purchase'
        |      THEN CAST(floor(e.value * 100 + 0.5) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS mon
        |  FROM events e, gmax GROUP BY e.user_id, gmax.mts),
        |qr AS (SELECT CAST(MAX(CASE WHEN rn = (1 * n + 4) // 5 THEN v END) AS BIGINT) AS q1,
        |         CAST(MAX(CASE WHEN rn = (2 * n + 4) // 5 THEN v END) AS BIGINT) AS q2,
        |         CAST(MAX(CASE WHEN rn = (3 * n + 4) // 5 THEN v END) AS BIGINT) AS q3,
        |         CAST(MAX(CASE WHEN rn = (4 * n + 4) // 5 THEN v END) AS BIGINT) AS q4
        |       FROM (SELECT rec AS v, ROW_NUMBER() OVER (ORDER BY rec) AS rn,
        |               COUNT(*) OVER () AS n FROM m)),
        |qf AS (SELECT CAST(MAX(CASE WHEN rn = (1 * n + 4) // 5 THEN v END) AS BIGINT) AS q1,
        |         CAST(MAX(CASE WHEN rn = (2 * n + 4) // 5 THEN v END) AS BIGINT) AS q2,
        |         CAST(MAX(CASE WHEN rn = (3 * n + 4) // 5 THEN v END) AS BIGINT) AS q3,
        |         CAST(MAX(CASE WHEN rn = (4 * n + 4) // 5 THEN v END) AS BIGINT) AS q4
        |       FROM (SELECT freq AS v, ROW_NUMBER() OVER (ORDER BY freq) AS rn,
        |               COUNT(*) OVER () AS n FROM m)),
        |qm AS (SELECT CAST(MAX(CASE WHEN rn = (1 * n + 4) // 5 THEN v END) AS BIGINT) AS q1,
        |         CAST(MAX(CASE WHEN rn = (2 * n + 4) // 5 THEN v END) AS BIGINT) AS q2,
        |         CAST(MAX(CASE WHEN rn = (3 * n + 4) // 5 THEN v END) AS BIGINT) AS q3,
        |         CAST(MAX(CASE WHEN rn = (4 * n + 4) // 5 THEN v END) AS BIGINT) AS q4
        |       FROM (SELECT mon AS v, ROW_NUMBER() OVER (ORDER BY mon) AS rn,
        |               COUNT(*) OVER () AS n FROM m)),
        |scored AS (SELECT
        |    1 + CASE WHEN m.rec > qr.q1 THEN 1 ELSE 0 END
        |      + CASE WHEN m.rec > qr.q2 THEN 1 ELSE 0 END
        |      + CASE WHEN m.rec > qr.q3 THEN 1 ELSE 0 END
        |      + CASE WHEN m.rec > qr.q4 THEN 1 ELSE 0 END AS r_score,
        |    1 + CASE WHEN m.freq > qf.q1 THEN 1 ELSE 0 END
        |      + CASE WHEN m.freq > qf.q2 THEN 1 ELSE 0 END
        |      + CASE WHEN m.freq > qf.q3 THEN 1 ELSE 0 END
        |      + CASE WHEN m.freq > qf.q4 THEN 1 ELSE 0 END AS f_score,
        |    1 + CASE WHEN m.mon > qm.q1 THEN 1 ELSE 0 END
        |      + CASE WHEN m.mon > qm.q2 THEN 1 ELSE 0 END
        |      + CASE WHEN m.mon > qm.q3 THEN 1 ELSE 0 END
        |      + CASE WHEN m.mon > qm.q4 THEN 1 ELSE 0 END AS m_score,
        |    m.mon
        |  FROM m, qr, qf, qm)
        |SELECT r_score, f_score, m_score,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(mon) AS BIGINT) AS cell_cents
        |FROM scored GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = events(s, dir)
      // max() over zero rows is NULL — guard the driver-side scalar so an
      // empty events table yields the oracle's empty result instead of an
      // NPE from getLong, and skips the quintile collects (undefined on ∅).
      val gmaxOpt = Option(ev.agg(max("ts_us")).head.get(0))
      if (gmaxOpt.isEmpty)
        s.emptyDataset[(Int, Int, Int, Long, Long)]
          .toDF("r_score", "f_score", "m_score", "n_users", "cell_cents")
      else rfmBody(s, ev, gmaxOpt.get.asInstanceOf[Long])
    },

    // ------------------------------------------------------------------ A-57
    // Kendall's τ-b between the purchase and click daily series — the
    // third rank-correlation face beside Spearman (a47) and the
    // Mann–Kendall trend S (a45): concordant/discordant PAIR counts,
    // robust to any monotone rescaling and the statistic of choice when
    // tie structure matters (τ-b's denominator corrects for ties on
    // both margins). Everything is exact BIGINT — C, D, the tie terms
    // n1 = Σ tx(tx−1)/2 and n2 — and τ is the FIXED two-step IEEE tail
    // (C−D)/√((n0−n1)(n0−n2)), so both engines agree bit for bit. The
    // pair loop runs on the bounded shared-day relation (d² of a few
    // thousand days at any corpus size); the only fact-scale work is
    // the one (day) rollup.
    QueryDef("a57_kendall_tau",
      """WITH byday AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pc,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cc
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN (a.pc - b.pc) * (a.cc - b.cc) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN (a.pc - b.pc) * (a.cc - b.cc) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM byday a JOIN byday b ON b.day > a.day),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM byday),
        |t1 AS (SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS n1
        |       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM byday GROUP BY pc)),
        |t2 AS (SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS n2
        |       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM byday GROUP BY cc))
        |SELECT c, d, n.n, n1, n2,
        |  CASE WHEN n.n * (n.n - 1) // 2 - n1 = 0 OR n.n * (n.n - 1) // 2 - n2 = 0
        |    THEN NULL
        |    ELSE CAST(c - d AS DOUBLE)
        |      / sqrt(CAST(n.n * (n.n - 1) // 2 - n1 AS DOUBLE)
        |             * CAST(n.n * (n.n - 1) // 2 - n2 AS DOUBLE))
        |  END AS tau_b
        |FROM p, n, t1, t2""".stripMargin) { (s, dir) =>
      val byday = events(s, dir)
        .groupBy(expr("ts_us div 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("long").as("pc"),
          sum(when(col("event_type") === "click", 1).otherwise(0))
            .cast("long").as("cc"))
        .persist()
      val pair = byday.as("a").join(broadcast(byday.as("b")),
          col("b.day") > col("a.day"))
        .select(((col("a.pc") - col("b.pc")) * (col("a.cc") - col("b.cc"))).as("s"))
        .agg(sum(when(col("s") > 0, 1).otherwise(0)).cast("long").as("c"),
          sum(when(col("s") < 0, 1).otherwise(0)).cast("long").as("d"))
      val nDf = byday.agg(count(lit(1)).cast("long").as("n"))
      def ties(c: String, out: String) = byday.groupBy(c)
        .agg(count(lit(1)).cast("long").as("t"))
        .agg(coalesce(sum(expr("t * (t - 1) div 2")), lit(0L)).cast("long").as(out))
      val den1 = expr("n * (n - 1) div 2") - col("n1")
      val den2 = expr("n * (n - 1) div 2") - col("n2")
      val out = pair.crossJoin(broadcast(nDf))
        .crossJoin(broadcast(ties("pc", "n1")))
        .crossJoin(broadcast(ties("cc", "n2")))
        .select(col("c"), col("d"), col("n"), col("n1"), col("n2"),
          when(den1 === 0 || den2 === 0, lit(null))
            .otherwise((col("c") - col("d")).cast("double")
              / sqrt(den1.cast("double") * den2.cast("double"))).as("tau_b"))
      CacheScope.sealResult(out, byday)
    },

    // ------------------------------------------------------------------ A-59
    // Durbin–Watson autocorrelation statistic of the daily count series
    // — "are the residuals serially correlated", the lag-1 diagnostic a
    // forecasting gate runs beside a29's ACF (DW ≈ 2(1−ρ₁); < 1 or > 3
    // flags structure the mean model missed). Exact end-to-end:
    // residuals are mean-centered as e_t = n·y_t − S (scaled by n so
    // they stay BIGINT — the scale cancels in the ratio), both the
    // Σ(e_t−e_{t−1})² numerator and the Σe² denominator are DECIMAL(38,0)
    // sums of exact products, and DW is ONE division of two
    // exactly-rounded doubles. Overflow headroom: e ~ n·y needs
    // n·y < 3e18 — at 3650 days × 3e9 events/day the squares sit at
    // ~1e26, well inside DECIMAL(38,0). One fact pass (the day rollup);
    // the LAG window runs on the bounded day series.
    QueryDef("a59_durbin_watson",
      """WITH d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s FROM d),
        |e AS (
        |  SELECT day, CAST(m.n * d.y - m.s AS DECIMAL(38,0)) AS e,
        |    LAG(CAST(m.n * d.y - m.s AS DECIMAL(38,0))) OVER (ORDER BY day) AS ep
        |  FROM d, m),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    SUM(CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(38,0))
        |        ELSE (e - ep) * (e - ep) END) AS num,
        |    SUM(e * e) AS den
        |  FROM e)
        |SELECT n_days, CAST(num AS DOUBLE) AS num_d, CAST(den AS DOUBLE) AS den_d,
        |  CASE WHEN den = 0 THEN NULL
        |    ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS dw
        |FROM a""".stripMargin) { (s, dir) =>
      val d = events(s, dir)
        .groupBy(expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).cast("long").as("y"))
      val m = d.agg(count(lit(1)).cast("long").as("n"), sum("y").cast("long").as("s"))
      val e = d.crossJoin(broadcast(m))
        .select(col("day"), (col("n") * col("y") - col("s")).cast(dec).as("e"))
        .withColumn("ep", lag("e", 1).over(Window.orderBy("day")))
      val a = e.agg(count(lit(1)).cast("long").as("n_days"),
        sum(when(col("ep").isNull, lit(0).cast(dec))
          .otherwise((col("e") - col("ep")) * (col("e") - col("ep")))).as("num"),
        sum(col("e") * col("e")).as("den"))
      a.select(col("n_days"),
        col("num").cast("double").as("num_d"),
        col("den").cast("double").as("den_d"),
        when(col("den") === 0, lit(null))
          .otherwise(col("num").cast("double") / col("den").cast("double")).as("dw"))
    },

    // ------------------------------------------------------------ G-BP-mv
    // The basket projection SERVED FROM the persisted pair rollup
    // ([[graft.pipeline.BasketStore]]): the recompute form above pays
    // Ω(|pairs|) per query by definition; here the pair view was
    // maintained O(delta-orders) at ingest time and the query is a
    // TakeOrdered over the stored view — `lineitem` never appears in
    // the serving plan (BasketStoreSpec pins the scan list). Same
    // oracle: where the rollup lives cannot change the answer.
    QueryDef("g_bipartite_proj_mv", bipartiteProjSql) { (s, dir) =>
      val root = basketRoot(s, dir)
      graft.pipeline.BasketStore.servePairs(s, root)
        .withColumnRenamed("n_ab", "n_orders")
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(100)
    },

    // ------------------------------------------------------------ G-BL-mv
    // Lift from the stored views: top-100 pairs + item frequencies +
    // the order total, all maintained additively per whole-orders batch
    // — the serving plan touches view files only.
    QueryDef("g_basket_lift_mv", basketLiftSql) { (s, dir) =>
      val root = basketRoot(s, dir)
      val top = graft.pipeline.BasketStore.servePairs(s, root)
        .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
        .limit(100)
      val n = s.range(1).select(
        lit(graft.pipeline.BasketStore.serveNOrders(s, root)).as("n_orders"))
      liftTail(top, graft.pipeline.BasketStore.serveItems(s, root), n)
    },

    // ------------------------------------------------------------ G-DG-mv
    // Degree Gini from the stored degree view: the Ω(|E|) distinct-edge
    // dedup was paid once per batch at ingest (anti-join against the
    // bucketed stored edge set — only NEW edges shuffle); serving is
    // the bounded histogram tail over O(|V|) stored degrees.
    QueryDef("g_degree_gini_mv", degreeGiniSql) { (s, dir) =>
      val root = basketRoot(s, dir)
      giniFromDegrees(graft.pipeline.BasketStore.serveDegrees(s, root))
    }
  )

  private def rfmBody(s: SparkSession, ev: DataFrame, gmax: Long): DataFrame = {
      val m = ev.groupBy("user_id")
        .agg(expr(s"(${gmax}L - max(ts_us)) div 86400000000L").as("rec"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("long").as("freq"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100 + 0.5).cast("long")).otherwise(0L))
            .cast("long").as("mon"))
        .persist() // feeds three selection passes AND the scoring scan
      def quints(c: String): Seq[Long] = {
        val sel = ExtraQueries.typedPositionalSelect(s,
          m.select(lit("all").as("event_type"), col(c).as("v")),
          n => (1 to 4).map(i => s"q$i" -> (i * n + 4) / 5))
        (1 to 4).map(i => sel(("all", s"q$i"))._2)
      }
      val (rq, fq, mq) = (quints("rec"), quints("freq"), quints("mon"))
      def score(c: String, qs: Seq[Long]) =
        qs.foldLeft(lit(1)) { (acc, q) =>
          acc + when(col(c) > q, 1).otherwise(0) }
      val out = m.select(
        score("rec", rq).as("r_score"), score("freq", fq).as("f_score"),
        score("mon", mq).as("m_score"), col("mon"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum("mon").cast("long").as("cell_cents"))
      CacheScope.sealResult(out, m)
  }
}
