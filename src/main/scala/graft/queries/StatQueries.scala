package graft.queries

import graft.core.Graft
import graft.functions.{PinnedLogSql, VectorExprs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The statistics family the engine previously had to route AROUND for
  * cross-engine float parity: every metric built on a logarithm
  * (entropy, PSI, KL-flavored divergences, mutual information,
  * log-degree link weights, Zipf log-log fits) was substituted with a
  * rational stand-in (dq_drift_tvd's TVD "instead of PSI/KL on purpose",
  * t_bm25's rational idf) because libm `ln()` is not pinned to agree in
  * the last ulp across engines. [[graft.functions.PinnedLog]] removes
  * that wall: ln in 1e-9 fixed point over PURE BIGINT arithmetic —
  * bit-identical in Spark (native codegen'd expression) and DuckDB (the
  * generated [[PinnedLogSql]] chain), order-free under aggregation. Each
  * query here keeps the repo's parity discipline: integer/decimal-exact
  * moments everywhere, a FIXED short sequence of correctly-rounded IEEE
  * double ops only at the very end.
  *
  * Scale notes are per-query; the family's common shape is one
  * map-side-combinable rollup to a bounded (types × buckets) relation,
  * with the log arithmetic on the bounded relation — never on raw rows.
  */
object StatQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)

  private val dec = "decimal(38,0)"

  def all: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------- DQ-9
    // Shannon entropy of the event-type distribution — the "how
    // concentrated is this categorical column" statistic a feature
    // catalog publishes per column (and the split-quality primitive
    // under decision-tree binning). H = ln N − (Σ nᵢ·ln nᵢ)/N in nats,
    // every ln the PINNED fixed-point ln (bit-equal in both engines),
    // the weighted sum DECIMAL(38,0)-exact (nᵢ·ln_nanos(nᵢ) is
    // ~N·ln N ≈ 2^63 at ~3e8 rows — the a34/a29 widening lesson), and
    // the single division the one IEEE step. Cost: one
    // map-side-combinable count rollup to |types| rows; the log
    // arithmetic runs on the bounded relation.
    QueryDef("dq_entropy", {
      val inner = PinnedLogSql.chain(
        """SELECT event_type, n, CAST(SUM(n) OVER () AS BIGINT) AS nn
          |FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          |      FROM events GROUP BY event_type)""".stripMargin,
        Seq("event_type", "n", "nn"),
        Seq(("n", "1", "ln_n_nanos"), ("nn", "1", "ln_nn_nanos")))
      s"""SELECT event_type, n, nn, ln_n_nanos,
         |  CAST(CAST(nn AS DECIMAL(38,0)) * ln_nn_nanos
         |       - SUM(CAST(n AS DECIMAL(38,0)) * ln_n_nanos) OVER ()
         |       AS DOUBLE) / nn AS entropy_nanos
         |FROM ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val counts = events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).cast("long").as("n"))
        .withColumn("nn", sum("n").over(Window.partitionBy()).cast("long"))
        .withColumn("ln_n_nanos", expr("ln_nanos(n, 1L)"))
        .withColumn("ln_nn_nanos", expr("ln_nanos(nn, 1L)"))
      counts.select(col("event_type"), col("n"), col("nn"), col("ln_n_nanos"),
        ((col("nn").cast(dec) * col("ln_nn_nanos")
          - sum(col("n").cast(dec) * col("ln_n_nanos")).over(Window.partitionBy()))
          .cast("double") / col("nn")).as("entropy_nanos"))
    },

    // ---------------------------------------------------------------- DQ-10
    // Population Stability Index between the reference window (first two
    // weeks) and the current window — THE industry drift gate in model
    // monitoring, previously unreachable (dq_drift_tvd substituted TVD
    // for exactly this). Same split and value buckets as dq_drift_tvd;
    // add-one smoothing keeps zero-count buckets defined (documented —
    // the standard ε-floor practice). PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with
    // ln(pᵢ/qᵢ) decomposed into four pinned single-count logs (their
    // product form would overflow BIGINT at ~3e9 rows); each bucket's
    // term is an exact DECIMAL cross product, the total ONE window sum
    // of DECIMALs and two fixed IEEE divisions. Bounded relation after
    // one rollup shuffle, like tvd.
    QueryDef("dq_psi", {
      val inner = PinnedLogSql.chain(
        """SELECT bucket, n_ref, n_cur,
          |  CAST(SUM(n_ref) OVER () AS BIGINT) AS t_ref,
          |  CAST(SUM(n_cur) OVER () AS BIGINT) AS t_cur
          |FROM (
          |  SELECT bucket,
          |    CAST(1 + SUM(CASE WHEN week - w0 < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
          |    CAST(1 + SUM(CASE WHEN week - w0 >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
          |  FROM (SELECT LEAST(CAST(floor(value / 20) AS BIGINT), 9) AS bucket,
          |          epoch_us(ts) // 604800000000 AS week FROM events) e,
          |       (SELECT MIN(epoch_us(ts) // 604800000000) AS w0 FROM events) wk
          |  GROUP BY bucket)""".stripMargin,
        Seq("bucket", "n_ref", "n_cur", "t_ref", "t_cur"),
        Seq(("n_cur", "1", "ln_ncur"), ("n_ref", "1", "ln_nref"),
          ("t_cur", "1", "ln_tcur"), ("t_ref", "1", "ln_tref")))
      s"""SELECT bucket, n_ref, n_cur,
         |  CAST((CAST(n_cur AS DECIMAL(38,0)) * t_ref - CAST(n_ref AS DECIMAL(38,0)) * t_cur)
         |       * (ln_ncur + ln_tref - ln_nref - ln_tcur) AS DOUBLE)
         |    / CAST(CAST(t_ref AS DECIMAL(38,0)) * t_cur AS DOUBLE) / 1000000000 AS psi_term,
         |  CAST(SUM((CAST(n_cur AS DECIMAL(38,0)) * t_ref - CAST(n_ref AS DECIMAL(38,0)) * t_cur)
         |           * (ln_ncur + ln_tref - ln_nref - ln_tcur)) OVER () AS DOUBLE)
         |    / CAST(CAST(t_ref AS DECIMAL(38,0)) * t_cur AS DOUBLE) / 1000000000 AS psi_total
         |FROM ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val e = events(s, dir).select(
        least(floor(col("value") / 20).cast("long"), lit(9L)).as("bucket"),
        expr("ts_us div 604800000000").as("week"))
      val wk = e.agg(min("week").as("w0"))
      val counts = e.crossJoin(broadcast(wk))
        .groupBy("bucket")
        .agg(
          (lit(1) + sum(when(col("week") - col("w0") < 2, 1).otherwise(0)))
            .cast("long").as("n_ref"),
          (lit(1) + sum(when(col("week") - col("w0") >= 2, 1).otherwise(0)))
            .cast("long").as("n_cur"))
        .withColumn("t_ref", sum("n_ref").over(Window.partitionBy()).cast("long"))
        .withColumn("t_cur", sum("n_cur").over(Window.partitionBy()).cast("long"))
        .withColumn("ln_ncur", expr("ln_nanos(n_cur, 1L)"))
        .withColumn("ln_nref", expr("ln_nanos(n_ref, 1L)"))
        .withColumn("ln_tcur", expr("ln_nanos(t_cur, 1L)"))
        .withColumn("ln_tref", expr("ln_nanos(t_ref, 1L)"))
      val num = (col("n_cur").cast(dec) * col("t_ref")
        - col("n_ref").cast(dec) * col("t_cur")) *
        (col("ln_ncur") + col("ln_tref") - col("ln_nref") - col("ln_tcur"))
      val den = (col("t_ref").cast(dec) * col("t_cur")).cast("double")
      counts.select(col("bucket"), col("n_ref"), col("n_cur"),
        (num.cast("double") / den / 1000000000L).as("psi_term"),
        (sum(num).over(Window.partitionBy()).cast("double") / den / 1000000000L)
          .as("psi_total"))
    },

    // ---------------------------------------------------------------- DQ-11
    // Mutual information between event type and the value bucket — the
    // feature-relevance / redundancy screen (dq_cramers_v's
    // information-theoretic twin; MI is what feature-selection actually
    // ranks by). MI = Σᵢⱼ (nᵢⱼ/N)·[ln nᵢⱼ + ln N − ln rᵢ − ln cⱼ] over
    // OBSERVED cells (empty cells contribute exactly 0); the four logs
    // are pinned single-count logs, margins are exact window sums over
    // the cell relation (one |rows|→|cells| rollup — the dq_chi2_cells
    // shape), each cell term an exact DECIMAL product, and the total ONE
    // DECIMAL window sum with two fixed IEEE steps at the end. MI in
    // nats, ≥ 0 up to pinned-log rounding.
    QueryDef("dq_mutual_info", {
      val inner = PinnedLogSql.chain(
        """SELECT event_type, bucket, n,
          |  CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS r,
          |  CAST(SUM(n) OVER (PARTITION BY bucket) AS BIGINT) AS c,
          |  CAST(SUM(n) OVER () AS BIGINT) AS nn
          |FROM (
          |  SELECT event_type, LEAST(CAST(floor(value / 20) AS BIGINT), 9) AS bucket,
          |    CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2)""".stripMargin,
        Seq("event_type", "bucket", "n", "r", "c", "nn"),
        Seq(("n", "1", "ln_n"), ("r", "1", "ln_r"),
          ("c", "1", "ln_c"), ("nn", "1", "ln_nn")))
      s"""SELECT event_type, bucket, n, r, c, nn,
         |  CAST(ln_n + ln_nn - ln_r - ln_c AS BIGINT) AS pmi_nanos,
         |  CAST(SUM(CAST(n AS DECIMAL(38,0)) * (ln_n + ln_nn - ln_r - ln_c)) OVER ()
         |       AS DOUBLE) / nn / 1000000000 AS mi_total
         |FROM ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val cells = events(s, dir)
        .groupBy(col("event_type"),
          least(floor(col("value") / 20).cast("long"), lit(9L)).as("bucket"))
        .agg(count(lit(1)).cast("long").as("n"))
        .withColumn("r", sum("n").over(Window.partitionBy("event_type")).cast("long"))
        .withColumn("c", sum("n").over(Window.partitionBy("bucket")).cast("long"))
        .withColumn("nn", sum("n").over(Window.partitionBy()).cast("long"))
        .withColumn("ln_n", expr("ln_nanos(n, 1L)"))
        .withColumn("ln_r", expr("ln_nanos(r, 1L)"))
        .withColumn("ln_c", expr("ln_nanos(c, 1L)"))
        .withColumn("ln_nn", expr("ln_nanos(nn, 1L)"))
      val pmi = col("ln_n") + col("ln_nn") - col("ln_r") - col("ln_c")
      cells.select(col("event_type"), col("bucket"), col("n"), col("r"),
        col("c"), col("nn"),
        pmi.cast("long").as("pmi_nanos"),
        (sum(col("n").cast(dec) * pmi).over(Window.partitionBy())
          .cast("double") / col("nn") / 1000000000L).as("mi_total"))
    }
  )
}
