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

  /** The shared drift spine of dq_psi / dq_kl: the dq_drift_tvd window
    * split (first two weeks = reference) and value buckets, ADD-ONE
    * smoothed counts with window totals, and the four pinned
    * single-count logs — as the oracle chain (SQL) and the Spark frame.
    * The two queries differ only in the per-bucket weight ((p−q) vs p). */
  private val driftChainSql: String = PinnedLogSql.chain(
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

  /** ln(p/q) decomposed into the four pinned single-count logs (the
    * product form would overflow BIGINT at ~3e9 rows) — SQL text. */
  private val lnRatioSql = "(ln_ncur + ln_tref - ln_nref - ln_tcur)"

  private def driftCounts(s: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(s)
    val e = events(s, dir).select(
      least(floor(col("value") / 20).cast("long"), lit(9L)).as("bucket"),
      expr("ts_us div 604800000000").as("week"))
    val wk = e.agg(min("week").as("w0"))
    e.crossJoin(broadcast(wk))
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
  }

  private def lnRatio: org.apache.spark.sql.Column =
    col("ln_ncur") + col("ln_tref") - col("ln_nref") - col("ln_tcur")

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
    QueryDef("dq_psi",
      s"""SELECT bucket, n_ref, n_cur,
         |  CAST((CAST(n_cur AS DECIMAL(38,0)) * t_ref - CAST(n_ref AS DECIMAL(38,0)) * t_cur)
         |       * $lnRatioSql AS DOUBLE)
         |    / CAST(CAST(t_ref AS DECIMAL(38,0)) * t_cur AS DOUBLE) / 1000000000 AS psi_term,
         |  CAST(SUM((CAST(n_cur AS DECIMAL(38,0)) * t_ref - CAST(n_ref AS DECIMAL(38,0)) * t_cur)
         |           * $lnRatioSql) OVER () AS DOUBLE)
         |    / CAST(CAST(t_ref AS DECIMAL(38,0)) * t_cur AS DOUBLE) / 1000000000 AS psi_total
         |FROM ($driftChainSql)""".stripMargin) { (s, dir) =>
      val counts = driftCounts(s, dir)
      val num = (col("n_cur").cast(dec) * col("t_ref")
        - col("n_ref").cast(dec) * col("t_cur")) * lnRatio
      val den = (col("t_ref").cast(dec) * col("t_cur")).cast("double")
      counts.select(col("bucket"), col("n_ref"), col("n_cur"),
        (num.cast("double") / den / 1000000000L).as("psi_term"),
        (sum(num).over(Window.partitionBy()).cast("double") / den / 1000000000L)
          .as("psi_total"))
    },

    // --------------------------------------------------------------- DQ-10b
    // Directional KL divergence KL(cur ‖ ref) on the same smoothed
    // spine — the asymmetric question PSI symmetrizes away: "how
    // surprised is the REFERENCE model by current data" (the monitoring
    // direction: train distribution as ref, production as cur). Weight
    // is p alone: Σ pᵢ·ln(pᵢ/qᵢ) = Σ n_cur·ln-ratio / t_cur — per-bucket
    // DECIMAL product, ONE window sum, two fixed IEEE divisions. ≥ 0 up
    // to pinned-log rounding by Gibbs' inequality.
    QueryDef("dq_kl",
      s"""SELECT bucket, n_ref, n_cur,
         |  CAST(CAST(n_cur AS DECIMAL(38,0)) * $lnRatioSql AS DOUBLE)
         |    / t_cur / 1000000000 AS kl_term,
         |  CAST(SUM(CAST(n_cur AS DECIMAL(38,0)) * $lnRatioSql) OVER () AS DOUBLE)
         |    / t_cur / 1000000000 AS kl_total
         |FROM ($driftChainSql)""".stripMargin) { (s, dir) =>
      val counts = driftCounts(s, dir)
      val num = col("n_cur").cast(dec) * lnRatio
      counts.select(col("bucket"), col("n_ref"), col("n_cur"),
        (num.cast("double") / col("t_cur") / 1000000000L).as("kl_term"),
        (sum(num).over(Window.partitionBy()).cast("double")
          / col("t_cur") / 1000000000L).as("kl_total"))
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
    },

    // ------------------------------------------------------------------ A-43
    // Pairwise covariance/correlation matrix over lineitem's four
    // numeric measures — the feature-preprocessing pass every training
    // pipeline runs before scaling/decorrelating (and the input to
    // a44_pca2). ONE aggregation pass computes all 4 first moments, 4
    // second moments, and 6 cross moments over exact cents (decimal-
    // widened products — price-cents² is ~1e16 per row, the sum is past
    // BIGINT immediately); the 10 (i ≤ j) matrix cells then unpivot from
    // the 1-row moment relation via a literal explode — no second scan,
    // no join. cov and corr are the fixed a29 IEEE tail per cell.
    QueryDef("a43_cov_matrix", {
      val cols = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
        "disc" -> "l_discount", "tax" -> "l_tax")
      val moments = cols.map { case (a, c) =>
        s"CAST(SUM(CAST(floor($c * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s_$a"
      } ++ (for ((a, ca) <- cols; (b, cb) <- cols if a <= b) yield
        s"""SUM(CAST(CAST(floor($ca * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))
           |    * CAST(floor($cb * 100 + 0.5) AS BIGINT)) AS s_${a}_$b""".stripMargin)
      val cells = (for ((a, _) <- cols; (b, _) <- cols if a <= b) yield
        s"""SELECT '$a' AS v1, '$b' AS v2, n, s_$a AS sx, s_$b AS sy,
           |  s_${a}_$b AS sxy, s_${a}_$a AS sxx, s_${b}_$b AS syy FROM m""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, ${moments.mkString(", ")}
         |  FROM lineitem)
         |SELECT v1, v2, n,
         |  CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * n) AS cov_cents2,
         |  CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         |    / sqrt(CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
         |           * CAST(CAST(syy AS DECIMAL(38,0)) * n - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
         |    AS corr
         |FROM ($cells)""".stripMargin
    }) { (s, dir) =>
      val cols = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
        "disc" -> "l_discount", "tax" -> "l_tax")
      def cents(c: String) = floor(col(c) * 100 + 0.5).cast("long")
      val momentCols =
        cols.map { case (a, c) => sum(cents(c)).cast("long").as(s"s_$a") } ++
          (for ((a, ca) <- cols; (b, cb) <- cols if a <= b)
            yield sum(cents(ca).cast(dec) * cents(cb)).as(s"s_${a}_$b"))
      val m = Graft.table(s, dir, "lineitem")
        .agg(count(lit(1)).cast("long").as("n"), momentCols: _*)
      val cells = (for ((a, _) <- cols; (b, _) <- cols if a <= b) yield
        m.select(lit(a).as("v1"), lit(b).as("v2"), col("n"),
          col(s"s_$a").as("sx"), col(s"s_$b").as("sy"),
          col(s"s_${a}_$b").as("sxy"), col(s"s_${a}_$a").as("sxx"),
          col(s"s_${b}_$b").as("syy"))).reduce(_ unionAll _)
      val num = (col("sxy").cast(dec) * col("n")
        - col("sx").cast(dec) * col("sy")).cast("double")
      cells.select(col("v1"), col("v2"), col("n"),
        (num / (col("n").cast("double") * col("n"))).as("cov_cents2"),
        (num / sqrt((col("sxx").cast(dec) * col("n")
          - col("sx").cast(dec) * col("sx")).cast("double") *
          (col("syy").cast(dec) * col("n")
            - col("sy").cast(dec) * col("sy")).cast("double"))).as("corr"))
    },

    // ------------------------------------------------------------------ A-44
    // Closed-form 2-D PCA over (quantity, price) — the decorrelation /
    // dimensionality screen on the a43 moments: eigenvalues of the 2×2
    // covariance matrix via the quadratic formula, λ± = ((vx+vy) ±
    // √((vx−vy)²+4c²))/2, and the explained-variance ratio λ₊/(λ₊+λ₋).
    // Everything transcendental-free: moments are exact DECIMALs, the
    // discriminant is two exact products, and sqrt is a correctly-
    // rounded IEEE op in both engines (the ONLY non-rational step) — so
    // the whole spectrum is parity-safe without the pinned log. One
    // map-side-combinable scan; the spectrum math runs on one row.
    QueryDef("a44_pca2",
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
        |    SUM(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))
        |        * CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sxx,
        |    SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))
        |        * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS syy,
        |    SUM(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))
        |        * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sxy
        |  FROM lineitem),
        |v AS (
        |  SELECT n,
        |    CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n) AS vx,
        |    CAST(CAST(syy AS DECIMAL(38,0)) * n - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n) AS vy,
        |    CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n) AS cxy
        |  FROM m)
        |SELECT n, vx, vy, cxy,
        |  ((vx + vy) + sqrt((vx - vy) * (vx - vy) + 4 * (cxy * cxy))) / 2 AS lambda1,
        |  ((vx + vy) - sqrt((vx - vy) * (vx - vy) + 4 * (cxy * cxy))) / 2 AS lambda2,
        |  (((vx + vy) + sqrt((vx - vy) * (vx - vy) + 4 * (cxy * cxy))) / 2)
        |    / (vx + vy) AS explained_ratio
        |FROM v""".stripMargin) { (s, dir) =>
      def cents(c: String) = floor(col(c) * 100 + 0.5).cast("long")
      val m = Graft.table(s, dir, "lineitem").agg(
        count(lit(1)).cast("long").as("n"),
        sum(cents("l_quantity")).cast("long").as("sx"),
        sum(cents("l_extendedprice")).cast("long").as("sy"),
        sum(cents("l_quantity").cast(dec) * cents("l_quantity")).as("sxx"),
        sum(cents("l_extendedprice").cast(dec) * cents("l_extendedprice")).as("syy"),
        sum(cents("l_quantity").cast(dec) * cents("l_extendedprice")).as("sxy"))
      val nD = col("n").cast("double") * col("n")
      val v = m.select(col("n"),
        ((col("sxx").cast(dec) * col("n") - col("sx").cast(dec) * col("sx"))
          .cast("double") / nD).as("vx"),
        ((col("syy").cast(dec) * col("n") - col("sy").cast(dec) * col("sy"))
          .cast("double") / nD).as("vy"),
        ((col("sxy").cast(dec) * col("n") - col("sx").cast(dec) * col("sy"))
          .cast("double") / nD).as("cxy"))
      val disc = sqrt((col("vx") - col("vy")) * (col("vx") - col("vy"))
        + lit(4) * (col("cxy") * col("cxy")))
      v.select(col("n"), col("vx"), col("vy"), col("cxy"),
        ((col("vx") + col("vy") + disc) / 2).as("lambda1"),
        ((col("vx") + col("vy") - disc) / 2).as("lambda2"),
        (((col("vx") + col("vy") + disc) / 2) / (col("vx") + col("vy")))
          .as("explained_ratio"))
    },

    // --------------------------------------------------------------- TEXT-T
    // TF·IDF with the TRUE logarithmic idf — the textbook relevance
    // weighting t_bm25 had to approximate with a rational idf ("same
    // ranking as the log form without trusting two libm ln()
    // implementations"). With the pinned ln the log form itself is
    // parity-safe, and — better — the scores become EXACT BIGINTS:
    // tfidf_nanos = Σ_t tf_t · ln_nanos(N, df_t), integer end to end, no
    // doubles anywhere in the result. Two corpus passes (the bm25
    // shape): a 1-row df/N stats rollup (its three logs computed once,
    // broadcast), then the per-doc tf scoring — a pure map. Zero-df
    // probe terms are branchless: tf is 0 wherever df is, so
    // GREATEST(df,1) never changes a nonzero product.
    QueryDef("t_tfidf_log", {
      val inner = PinnedLogSql.chain(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '), x -> x = 'join')) > 0
          |           THEN 1 ELSE 0 END) AS BIGINT) AS df1,
          |  CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '), x -> x = 'vector')) > 0
          |           THEN 1 ELSE 0 END) AS BIGINT) AS df2,
          |  CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '), x -> x = 'stream')) > 0
          |           THEN 1 ELSE 0 END) AS BIGINT) AS df3
          |FROM documents""".stripMargin,
        Seq("n_docs", "df1", "df2", "df3"),
        Seq(("n_docs", "GREATEST(df1, 1)", "idf1"),
          ("n_docs", "GREATEST(df2, 1)", "idf2"),
          ("n_docs", "GREATEST(df3, 1)", "idf3")))
      s"""SELECT doc_id, tf1, tf2, tf3,
         |  CAST(tf1 * idf1 + tf2 * idf2 + tf3 * idf3 AS BIGINT) AS tfidf_nanos
         |FROM (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'join')) AS BIGINT) AS tf1,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS BIGINT) AS tf2,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'stream')) AS BIGINT) AS tf3
         |  FROM documents), ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val t = Graft.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      def tf(term: String) =
        expr(s"cast(size(filter(tk, x -> x = '$term')) as bigint)")
      val stats = t.agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(tf("join") > 0, 1).otherwise(0)).cast("long").as("df1"),
        sum(when(tf("vector") > 0, 1).otherwise(0)).cast("long").as("df2"),
        sum(when(tf("stream") > 0, 1).otherwise(0)).cast("long").as("df3"))
        .withColumn("idf1", expr("ln_nanos(n_docs, greatest(df1, 1L))"))
        .withColumn("idf2", expr("ln_nanos(n_docs, greatest(df2, 1L))"))
        .withColumn("idf3", expr("ln_nanos(n_docs, greatest(df3, 1L))"))
      t.crossJoin(broadcast(stats))
        .select(col("doc_id"),
          tf("join").as("tf1"), tf("vector").as("tf2"), tf("stream").as("tf3"),
          col("idf1"), col("idf2"), col("idf3"))
        .select(col("doc_id"), col("tf1"), col("tf2"), col("tf3"),
          (col("tf1") * col("idf1") + col("tf2") * col("idf2")
            + col("tf3") * col("idf3")).cast("long").as("tfidf_nanos"))
    },

    // --------------------------------------------------------------- TEXT-E
    // Per-document character-class entropy — the gibberish/boilerplate
    // screen beside t_quality_score's ratio features (near-zero entropy
    // = one repeated class, e.g. digit dumps or padding; natural text
    // sits in a narrow band). Demonstrates the pinned ln at ROW scale:
    // five ln_nanos calls per document, all inside whole-stage codegen,
    // zero shuffles — a pure map over the corpus at any scale. Class
    // counts are exact integer lengths (regexp strip + length); zero
    // counts need no branch because n·ln(GREATEST(n,1)) is exactly 0 at
    // n=0; the per-doc weighted sum is DECIMAL-exact and the entropy one
    // IEEE division.
    QueryDef("t_char_entropy", {
      val inner = PinnedLogSql.chain(
        """SELECT doc_id, len, n_lower, n_digit, n_space,
          |  len - n_lower - n_digit - n_space AS n_other
          |FROM (
          |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
          |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower,
          |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
          |    CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_space
          |  FROM documents WHERE length(text) > 0)""".stripMargin,
        Seq("doc_id", "len", "n_lower", "n_digit", "n_space", "n_other"),
        Seq(("GREATEST(n_lower, 1)", "1", "ln_lo"),
          ("GREATEST(n_digit, 1)", "1", "ln_di"),
          ("GREATEST(n_space, 1)", "1", "ln_sp"),
          ("GREATEST(n_other, 1)", "1", "ln_ot"),
          ("len", "1", "ln_len")))
      s"""SELECT doc_id, len, n_lower, n_digit, n_space, n_other,
         |  CAST(CAST(len AS DECIMAL(38,0)) * ln_len
         |       - (CAST(n_lower AS DECIMAL(38,0)) * ln_lo
         |          + CAST(n_digit AS DECIMAL(38,0)) * ln_di
         |          + CAST(n_space AS DECIMAL(38,0)) * ln_sp
         |          + CAST(n_other AS DECIMAL(38,0)) * ln_ot) AS DOUBLE)
         |    / len AS entropy_nanos
         |FROM ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val counts = Graft.table(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len"),
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("n_lower"),
          length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("n_digit"),
          length(regexp_replace(col("text"), "[^ ]", "")).cast("long").as("n_space"))
        .withColumn("n_other",
          col("len") - col("n_lower") - col("n_digit") - col("n_space"))
        .withColumn("ln_lo", expr("ln_nanos(greatest(n_lower, 1L), 1L)"))
        .withColumn("ln_di", expr("ln_nanos(greatest(n_digit, 1L), 1L)"))
        .withColumn("ln_sp", expr("ln_nanos(greatest(n_space, 1L), 1L)"))
        .withColumn("ln_ot", expr("ln_nanos(greatest(n_other, 1L), 1L)"))
        .withColumn("ln_len", expr("ln_nanos(len, 1L)"))
      counts.select(col("doc_id"), col("len"), col("n_lower"), col("n_digit"),
        col("n_space"), col("n_other"),
        ((col("len").cast(dec) * col("ln_len")
          - (col("n_lower").cast(dec) * col("ln_lo")
            + col("n_digit").cast(dec) * col("ln_di")
            + col("n_space").cast(dec) * col("ln_sp")
            + col("n_other").cast(dec) * col("ln_ot"))).cast("double")
          / col("len")).as("entropy_nanos"))
    },

    // --------------------------------------------------------------- TEXT-Z
    // Zipf log-log fit over the corpus vocabulary — the distributional
    // health check a curation pipeline runs on a text source (natural
    // language sits near slope −1; machine-generated or boilerplate-heavy
    // corpora drift off it; cf. t_freq_spectrum's Good-Turing view of the
    // same table). OLS of ln(freq) on ln(rank) over the top-1000 tokens
    // (deterministic (freq DESC, token) ranking): both lns are PINNED
    // fixed-point nanos, every moment cross product DECIMAL(38,0)-exact
    // with each multiply decimal×BIGINT (per-row x·y is ~5e20 — past
    // BIGINT even at test scale), and slope/intercept/r² a fixed IEEE
    // tail. Cost: one token-count shuffle (map-side combinable) + a
    // vocabulary-sized top-k (TakeOrdered) — the t_bpe_pairs shape.
    QueryDef("t_zipf_slope", {
      val inner = PinnedLogSql.chain(
        """SELECT w, freq, rank FROM (
          |  SELECT w, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, w) AS rank
          |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
          |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          |        GROUP BY w))
          |WHERE rank <= 1000""".stripMargin,
        Seq("rank"), Seq(("rank", "1", "x"), ("freq", "1", "y")))
      s"""WITH m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         |    SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
         |  FROM ($inner))
         |SELECT n, sx, sy,
         |  CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         |    / CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
         |    AS slope,
         |  CAST(sy AS DOUBLE) / n
         |    - (CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         |       / CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
         |      * (CAST(sx AS DOUBLE) / n) AS intercept_nanos,
         |  (CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         |    / CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
         |  * (CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         |    / CAST(CAST(syy AS DECIMAL(38,0)) * n - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
         |    AS r2
         |FROM m""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val rankOrder = Seq(col("freq").desc, col("w"))
      val top = Graft.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).cast("long").as("freq"))
        .orderBy(rankOrder: _*).limit(1000)
        .withColumn("rank",
          row_number().over(Window.orderBy(rankOrder: _*)).cast("long"))
        .withColumn("x", expr("ln_nanos(rank, 1L)"))
        .withColumn("y", expr("ln_nanos(freq, 1L)"))
      val m = top.agg(count(lit(1)).cast("long").as("n"),
        sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
      val num = (col("sxy").cast(dec) * col("n")
        - col("sx").cast(dec) * col("sy")).cast("double")
      val den = (col("sxx").cast(dec) * col("n")
        - col("sx").cast(dec) * col("sx")).cast("double")
      val deny = (col("syy").cast(dec) * col("n")
        - col("sy").cast(dec) * col("sy")).cast("double")
      m.select(col("n"), col("sx"), col("sy"),
        (num / den).as("slope"),
        (col("sy").cast("double") / col("n")
          - (num / den) * (col("sx").cast("double") / col("n")))
          .as("intercept_nanos"),
        ((num / den) * (num / deny)).as("r2"))
    },

    // ------------------------------------------------------------------ A-38
    // Per-type OLS trend of the daily event-count series — the "is this
    // signal growing or decaying, and how linearly" screen beside
    // a29_acf's "is yesterday predictive" (same daily rollup, different
    // statistic: slope per day + fit quality instead of lag correlation).
    // x = epoch day, y = daily count; moments BIGINT with every cross
    // product widened decimal×BIGINT (y² is ~9e18 at ~3e9 rows/day — the
    // a29 overflow lesson); slope/intercept/r² the fixed IEEE tail, with
    // degenerate fits (a single day, or a constant series) NULL via
    // exact DECIMAL zero tests, never a NaN from 0/0.
    QueryDef("a38_regression",
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS x,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |        SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
        |        SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        |      FROM daily GROUP BY event_type)
        |SELECT event_type, n, sx, sy,
        |  CASE WHEN CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx = 0
        |    THEN NULL ELSE
        |    CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |      / CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |  END AS slope,
        |  CASE WHEN CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx = 0
        |    THEN NULL ELSE
        |    CAST(sy AS DOUBLE) / n
        |      - (CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |         / CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
        |        * (CAST(sx AS DOUBLE) / n)
        |  END AS intercept,
        |  CASE WHEN CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx = 0
        |         OR CAST(syy AS DECIMAL(38,0)) * n - CAST(sy AS DECIMAL(38,0)) * sy = 0
        |    THEN NULL ELSE
        |    (CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |      / CAST(CAST(sxx AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
        |    * (CAST(CAST(sxy AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |      / CAST(CAST(syy AS DECIMAL(38,0)) * n - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
        |  END AS r2
        |FROM m""".stripMargin) { (s, dir) =>
      val daily = events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("x"))
        .agg(count(lit(1)).cast("long").as("y"))
      val m = daily.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"),
          sum(col("y").cast(dec) * col("y")).as("syy"))
      val denD = col("sxx").cast(dec) * col("n") - col("sx").cast(dec) * col("sx")
      val denyD = col("syy").cast(dec) * col("n") - col("sy").cast(dec) * col("sy")
      val num = (col("sxy").cast(dec) * col("n")
        - col("sx").cast(dec) * col("sy")).cast("double")
      val slope = num / denD.cast("double")
      m.select(col("event_type"), col("n"), col("sx"), col("sy"),
        when(denD === 0, lit(null)).otherwise(slope).as("slope"),
        when(denD === 0, lit(null))
          .otherwise(col("sy").cast("double") / col("n")
            - slope * (col("sx").cast("double") / col("n"))).as("intercept"),
        when(denD === 0 || denyD === 0, lit(null))
          .otherwise(slope * (num / denyD.cast("double"))).as("r2"))
    },

    // ------------------------------------------------------------------ A-39
    // Herfindahl–Hirschman concentration of customer balances per nation
    // — the "is this segment dominated by a few whales" statistic behind
    // both risk scoring (t_source_gini's Lorenz view, as an index) and
    // skew planning (a high-HHI key IS a salting candidate). HHI in ppm
    // = Σ shareᵢ² · 1e6 = Σ bᵢ² / T² · 1e6 — numerator Σbᵢ² exact via
    // per-row decimal×BIGINT squares (cents² ~1e14 each; the sum
    // overflows BIGINT at ~10⁵ customers/nation), ONE fixed IEEE tail.
    // One map-side-combinable rollup; no window, no sort.
    QueryDef("a39_hhi",
      """WITH b AS (
        |  SELECT c_nationkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer WHERE c_acctbal > 0),
        |g AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |        CAST(SUM(cents) AS BIGINT) AS t_cents,
        |        SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
        |      FROM b GROUP BY c_nationkey)
        |SELECT c_nationkey, n_cust, t_cents,
        |  CAST(ss AS DOUBLE) * 1000000
        |    / (CAST(t_cents AS DOUBLE) * CAST(t_cents AS DOUBLE)) AS hhi_ppm
        |FROM g""".stripMargin) { (s, dir) =>
      Graft.table(s, dir, "customer")
        .filter(col("c_acctbal") > 0)
        .select(col("c_nationkey"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).cast("long").as("n_cust"),
          sum("cents").cast("long").as("t_cents"),
          sum(col("cents").cast(dec) * col("cents")).as("ss"))
        .select(col("c_nationkey"), col("n_cust"), col("t_cents"),
          (col("ss").cast("double") * 1000000L
            / (col("t_cents").cast("double") * col("t_cents").cast("double")))
            .as("hhi_ppm"))
    },

    // ------------------------------------------------------------------ W-22
    // Bollinger-band breakout flags over each user's event-value series —
    // the volatility-normalized anomaly marker beside w18_ewma's level
    // smoother: z = (x−μ₂₀)/σ₂₀ over a 20-row lookback (population σ,
    // ddof=0). Parity the integer way: the window emits BIGINT/DECIMAL
    // moments (n, s1, Σx² decimal-widened), the BREAKOUT FLAGS are pure
    // integer comparisons — (n·x−s1)² vs 4·n·(n·Σx²−s1²) decides |z|>2
    // EXACTLY, no float in the decision — and z itself is two IEEE steps
    // emitted for inspection (NULL on a zero-variance window, never
    // 0/0). Constant state per row at any scale: the frame is a fixed
    // 20-row lookback, one window program per user partition.
    QueryDef("w22_bollinger",
      """WITH c AS (SELECT user_id, event_id, ts,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |w AS (SELECT user_id, event_id, cents,
        |    CAST(COUNT(*) OVER win AS BIGINT) AS n,
        |    CAST(SUM(cents) OVER win AS BIGINT) AS s1,
        |    SUM(CAST(cents AS DECIMAL(38,0)) * cents) OVER win AS s2
        |  FROM c WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, cents, n, s1,
        |  CASE WHEN CAST(s2 AS DECIMAL(38,0)) * n - CAST(s1 AS DECIMAL(38,0)) * s1 = 0
        |    THEN NULL ELSE
        |    CAST(n * cents - s1 AS DOUBLE)
        |      / sqrt(CAST(CAST(s2 AS DECIMAL(38,0)) * n
        |                  - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE))
        |  END AS z,
        |  CASE
        |    WHEN n * cents - s1 > 0
        |     AND CAST(n * cents - s1 AS DECIMAL(38,0)) * (n * cents - s1)
        |         > 4 * (CAST(s2 AS DECIMAL(38,0)) * n - CAST(s1 AS DECIMAL(38,0)) * s1)
        |      THEN 1
        |    WHEN n * cents - s1 < 0
        |     AND CAST(n * cents - s1 AS DECIMAL(38,0)) * (n * cents - s1)
        |         > 4 * (CAST(s2 AS DECIMAL(38,0)) * n - CAST(s1 AS DECIMAL(38,0)) * s1)
        |      THEN -1
        |    ELSE 0 END AS breakout
        |FROM w""".stripMargin) { (s, dir) =>
      val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
      val c = events(s, dir).select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("n", count(lit(1)).over(win).cast("long"))
        .withColumn("s1", sum("cents").over(win).cast("long"))
        .withColumn("s2", sum(col("cents").cast(dec) * col("cents")).over(win))
      val dev = col("n") * col("cents") - col("s1")
      val v = col("s2").cast(dec) * col("n") - col("s1").cast(dec) * col("s1")
      val devSq = dev.cast(dec) * dev
      c.select(col("user_id"), col("event_id"), col("cents"), col("n"), col("s1"),
        when(v === 0, lit(null))
          .otherwise(dev.cast("double") / sqrt(v.cast("double"))).as("z"),
        when(dev > 0 && devSq > lit(4) * v, 1)
          .when(dev < 0 && devSq > lit(4) * v, -1)
          .otherwise(0).as("breakout"))
    },

    // ------------------------------------------------------------------ A-41
    // Lag-2 PARTIAL autocorrelation of the daily series — a29_acf's
    // companion: "does the day before yesterday add signal once
    // yesterday is accounted for" (the AR-order probe, Durbin–Levinson:
    // φ₂₂ = (r₂ − r₁²)/(1 − r₁²)). r₁ and r₂ are Pearson estimates over
    // the lag-1/lag-2 pair sets, each from BIGINT moments with
    // DECIMAL(38,0)-widened cross products (the a29 discipline); the
    // Durbin–Levinson step is four more fixed IEEE ops on the two
    // doubles. Same |rows|→|days| rollup cost as a29, two lag columns
    // off one window pass.
    QueryDef("a41_pacf", {
      def rSql(k: Int): String =
        s"""CAST(CAST(n$k AS DECIMAL(38,0)) * sxy$k
           |     - CAST(sx$k AS DECIMAL(38,0)) * sy$k AS DOUBLE)
           |  / sqrt(CAST(CAST(n$k AS DECIMAL(38,0)) * sxx$k
           |              - CAST(sx$k AS DECIMAL(38,0)) * sx$k AS DOUBLE)
           |         * CAST(CAST(n$k AS DECIMAL(38,0)) * syy$k
           |                - CAST(sy$k AS DECIMAL(38,0)) * sy$k AS DOUBLE))""".stripMargin
      s"""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, cnt AS y,
        |    lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
        |    lag(cnt, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2
        |  FROM daily),
        |m AS (SELECT event_type,
        |        CAST(COUNT(x1) AS BIGINT) AS n1,
        |        CAST(SUM(x1) AS BIGINT) AS sx1,
        |        CAST(SUM(CASE WHEN x1 IS NOT NULL THEN y END) AS BIGINT) AS sy1,
        |        SUM(CAST(x1 AS DECIMAL(38,0)) * y) AS sxy1,
        |        SUM(CAST(x1 AS DECIMAL(38,0)) * x1) AS sxx1,
        |        SUM(CASE WHEN x1 IS NOT NULL THEN CAST(y AS DECIMAL(38,0)) * y END) AS syy1,
        |        CAST(COUNT(x2) AS BIGINT) AS n2,
        |        CAST(SUM(x2) AS BIGINT) AS sx2,
        |        CAST(SUM(CASE WHEN x2 IS NOT NULL THEN y END) AS BIGINT) AS sy2,
        |        SUM(CAST(x2 AS DECIMAL(38,0)) * y) AS sxy2,
        |        SUM(CAST(x2 AS DECIMAL(38,0)) * x2) AS sxx2,
        |        SUM(CASE WHEN x2 IS NOT NULL THEN CAST(y AS DECIMAL(38,0)) * y END) AS syy2
        |      FROM lagged GROUP BY event_type)
        |SELECT event_type, n1, n2,
        |  ${rSql(1)} AS r1,
        |  ${rSql(2)} AS r2,
        |  ((${rSql(2)}) - (${rSql(1)}) * (${rSql(1)}))
        |    / (1 - (${rSql(1)}) * (${rSql(1)})) AS pacf2
        |FROM m""".stripMargin
    }) { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("day")
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val lagged = daily.select(col("event_type"), col("cnt").as("y"),
        lag("cnt", 1).over(w).as("x1"), lag("cnt", 2).over(w).as("x2"))
      def moments(k: Int) = {
        val x = col(s"x$k")
        Seq(count(x).cast("long").as(s"n$k"),
          sum(x).cast("long").as(s"sx$k"),
          sum(when(x.isNotNull, col("y"))).cast("long").as(s"sy$k"),
          sum(x.cast(dec) * col("y")).as(s"sxy$k"),
          sum(x.cast(dec) * x).as(s"sxx$k"),
          sum(when(x.isNotNull, col("y").cast(dec) * col("y"))).as(s"syy$k"))
      }
      val m = lagged.groupBy("event_type")
        .agg(moments(1).head, (moments(1).tail ++ moments(2)): _*)
      def r(k: Int) =
        (col(s"n$k").cast(dec) * col(s"sxy$k")
          - col(s"sx$k").cast(dec) * col(s"sy$k")).cast("double") /
          sqrt((col(s"n$k").cast(dec) * col(s"sxx$k")
            - col(s"sx$k").cast(dec) * col(s"sx$k")).cast("double") *
            (col(s"n$k").cast(dec) * col(s"syy$k")
              - col(s"sy$k").cast(dec) * col(s"sy$k")).cast("double"))
      m.select(col("event_type"), col("n1"), col("n2"),
        r(1).as("r1"), r(2).as("r2"),
        ((r(2) - r(1) * r(1)) / (lit(1) - r(1) * r(1))).as("pacf2"))
    },

    // ------------------------------------------------------------------ A-42
    // Day-of-week seasonal indices per event type — the multiplicative
    // seasonal decomposition a rolling-feature pipeline divides out
    // before trend features are trustworthy (a29/a38 quantify trend and
    // memory; this isolates the weekly cycle). Index = (mean on that
    // dow)/(overall daily mean) = (n_dow·D_total)/(days_dow·N) — exact
    // integer cross products (decimal-widened; n·D is past BIGINT at
    // ~3e9 rows), ONE IEEE division. Day-of-week derives from the epoch
    // day as (day+4) % 7 (1970-01-01 was a Thursday; 0=Sunday) — pure
    // integer arithmetic, no engine calendar functions in the parity
    // path. Per-dow day counts are exact because dows partition days.
    QueryDef("a42_seasonal_dow",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS ed FROM events),
        |cells AS (
        |  SELECT event_type, (ed + 4) % 7 AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT ed) AS BIGINT) AS days
        |  FROM e GROUP BY 1, 2),
        |t AS (SELECT *,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_total,
        |    CAST(SUM(days) OVER (PARTITION BY event_type) AS BIGINT) AS d_total
        |  FROM cells)
        |SELECT event_type, dow, n, days, n_total, d_total,
        |  CAST(CAST(n AS DECIMAL(38,0)) * d_total AS DOUBLE)
        |    / CAST(CAST(days AS DECIMAL(38,0)) * n_total AS DOUBLE) AS seasonal_idx
        |FROM t""".stripMargin) { (s, dir) =>
      val cells = events(s, dir)
        .select(col("event_type"), expr("ts_us div 86400000000").as("ed"))
        .groupBy(col("event_type"), pmod(col("ed") + 4, lit(7)).as("dow"))
        .agg(count(lit(1)).cast("long").as("n"),
          countDistinct("ed").cast("long").as("days"))
        .withColumn("n_total",
          sum("n").over(Window.partitionBy("event_type")).cast("long"))
        .withColumn("d_total",
          sum("days").over(Window.partitionBy("event_type")).cast("long"))
      cells.select(col("event_type"), col("dow"), col("n"), col("days"),
        col("n_total"), col("d_total"),
        ((col("n").cast(dec) * col("d_total")).cast("double")
          / (col("days").cast(dec) * col("n_total")).cast("double"))
          .as("seasonal_idx"))
    },

    // ---------------------------------------------------------------- A-56
    // Kaplan–Meier time-to-conversion survival — the censoring-aware
    // answer to "how long until a user's first high-value purchase"
    // (a53's percentile bands silently DROP the users who never
    // convert; KM keeps them as right-censored mass, which is the whole
    // point of survival analysis). Event = first purchase with value >
    // 90; lifetime = days from the user's first activity to that event,
    // or to the corpus max for the censored. The curve is emitted as
    // ln S(t) in 1e-9 nats — EXACT BIGINT: Σ ln((nᵢ−dᵢ)/nᵢ) over death
    // times is a cumulative sum of pinned single-ratio logs, so the
    // hash check covers the whole curve bit-for-bit (emitting S itself
    // would need libm exp, which is not pinned across engines — the
    // PinnedLog doc's rule). At-risk counts ride one DESC cumulative
    // over the BOUNDED distinct-lifetime relation (days domain); the
    // only fact-scale pass is the per-user first/last rollup. If a
    // death time ever exhausts the risk set (S hits exactly 0, ln
    // undefined) the curve emits NULL from that point — the flag is a
    // running MAX, not a filter, so earlier rows stay exact.
    QueryDef("a56_kaplan_meier", {
      val inner = PinnedLogSql.chain(
        """SELECT lt, d, n_risk FROM (
          |  SELECT lt, CAST(SUM(death) AS BIGINT) AS d,
          |    CAST(SUM(COUNT(*)) OVER (ORDER BY lt DESC) AS BIGINT) AS n_risk
          |  FROM (
          |    SELECT user_id,
          |      (COALESCE(MIN(CASE WHEN event_type = 'purchase' AND value > 90
          |                  THEN epoch_us(ts) END),
          |                (SELECT MAX(epoch_us(ts)) FROM events))
          |       - MIN(epoch_us(ts))) // 86400000000 AS lt,
          |      CASE WHEN MIN(CASE WHEN event_type = 'purchase' AND value > 90
          |                  THEN epoch_us(ts) END) IS NULL
          |        THEN 0 ELSE 1 END AS death
          |    FROM events GROUP BY user_id) u
          |  GROUP BY lt) c
          |WHERE d > 0""".stripMargin,
        Seq("lt", "d", "n_risk"),
        Seq(("GREATEST(n_risk - d, 1)", "n_risk", "ln_t")))
      s"""SELECT lt, d, n_risk,
         |  CASE WHEN MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
         |             OVER (ORDER BY lt) = 1 THEN NULL
         |    ELSE CAST(SUM(ln_t) OVER (ORDER BY lt) AS BIGINT)
         |  END AS ln_surv_nanos
         |FROM ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val ev = events(s, dir)
      // global max as a broadcast scalar (the J13 pattern, same as the
      // oracle's scalar subquery) — not an eager head.getLong, which NPEs
      // on an empty events table instead of yielding the empty result
      val gmaxDf = ev.agg(max("ts_us").as("gmax_us"))
      val hit = min(when(col("event_type") === "purchase"
        && col("value") > 90, col("ts_us")))
      val u = ev.crossJoin(broadcast(gmaxDf)).groupBy("user_id")
        .agg(((coalesce(hit, max("gmax_us")) - min("ts_us"))
          .cast("long")).as("us_lt"),
          when(hit.isNull, 0).otherwise(1).as("death"))
        .select(expr("us_lt div 86400000000L").as("lt"), col("death"))
      val wRisk = Window.orderBy(col("lt").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = u.groupBy("lt")
        .agg(sum("death").cast("long").as("d"), count(lit(1)).as("cnt"))
        .withColumn("n_risk", sum("cnt").over(wRisk).cast("long"))
        .filter(col("d") > 0)
        .withColumn("ln_t", expr("ln_nanos(GREATEST(n_risk - d, 1L), n_risk)"))
      val wCum = Window.orderBy("lt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.select(col("lt"), col("d"), col("n_risk"),
        when(max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(wCum) === 1,
          lit(null))
          .otherwise(sum("ln_t").over(wCum).cast("long")).as("ln_surv_nanos"))
    },

    // ---------------------------------------------------------------- A-51
    // Entropy rate of the user-journey Markov chain — "how predictable
    // is the next event given the current one", the sequence-level
    // signal beside a25_transitions' raw matrix (a journey model is
    // only worth training when this is well below the marginal
    // entropy). Empirical rate weighted by row occupancy:
    // H = −Σ_ij (n_ij/T)·ln(n_ij/r_i) = Σ_ij n_ij·ln(r_i/n_ij) / T,
    // ONE pinned log per OBSERVED cell (the |types|²-bounded relation),
    // exact DECIMAL cell products, and two fixed IEEE steps. The only
    // fact-scale work is a25's lag window + cell rollup.
    QueryDef("a51_markov_entropy", {
      val inner = PinnedLogSql.chain(
        """SELECT prev_type, next_type, n,
          |  CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS r,
          |  CAST(SUM(n) OVER () AS BIGINT) AS t
          |FROM (
          |  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM (SELECT user_id, event_type,
          |          LAG(event_type) OVER (PARTITION BY user_id
          |            ORDER BY epoch_us(ts), event_id) AS prev_type
          |        FROM events) seq
          |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)""".stripMargin,
        Seq("prev_type", "next_type", "n", "r", "t"),
        Seq(("r", "n", "ln_rn")))
      s"""SELECT prev_type, next_type, n, r,
         |  CAST(CAST(n AS DECIMAL(38,0)) * ln_rn AS DOUBLE) / r / 1000000000
         |    AS cell_nats,
         |  CAST(SUM(CAST(n AS DECIMAL(38,0)) * ln_rn) OVER () AS DOUBLE)
         |    / t / 1000000000 AS h_rate
         |FROM ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val wSeq = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val cells = events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
        .withColumn("prev_type", lag("event_type", 1).over(wSeq))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .withColumn("r",
          sum("n").over(Window.partitionBy("prev_type")).cast("long"))
        .withColumn("t", sum("n").over(Window.partitionBy()).cast("long"))
        .withColumn("ln_rn", expr("ln_nanos(r, n)"))
      cells.select(col("prev_type"), col("next_type"), col("n"), col("r"),
        ((col("n").cast(dec) * col("ln_rn")).cast("double")
          / col("r") / 1000000000L).as("cell_nats"),
        (sum(col("n").cast(dec) * col("ln_rn")).over(Window.partitionBy())
          .cast("double") / col("t") / 1000000000L).as("h_rate"))
    },

    // ---------------------------------------------------------------- TEXT-J
    // Jensen–Shannon divergence between two sources' unigram
    // distributions — the SYMMETRIC, bounded (≤ ln 2) corpus-mixing
    // distance a data-mixture designer reads where KL would blow up on
    // disjoint support (JS never does). Distributions quantize to
    // add-one-smoothed ppm FIRST (truncating integer, bit-identical in
    // both engines; the statistic is DEFINED over the quantized
    // distributions, the quantization error is a deterministic ≤1e-6
    // per mass point), so the pinned-log arguments stay small products:
    // ln(p/m) = ln(2·pa·Pb / (pa·Pb + pb·Pa)) with pa ≤ 1e6+1 and
    // Pb ≤ 1e6 + |vocab| — BIGINT-safe to a trillion-type vocabulary.
    // ONE (token × source-pair) rollup is the only fact-scale pass; the
    // log chain and the two window sums run on the vocabulary-bounded
    // relation. Terms are exact DECIMAL products; the total is four
    // fixed IEEE steps.
    QueryDef("t_js_sources", {
      val inner = PinnedLogSql.chain(
        """SELECT token, na, nb, pa, pb,
          |  CAST(SUM(pa) OVER () AS BIGINT) AS pta,
          |  CAST(SUM(pb) OVER () AS BIGINT) AS ptb
          |FROM (
          |  SELECT token, na, nb,
          |    (na * 1000000) // ta + 1 AS pa, (nb * 1000000) // tb + 1 AS pb
          |  FROM (
          |    SELECT token, na, nb,
          |      CAST(SUM(na) OVER () AS BIGINT) AS ta,
          |      CAST(SUM(nb) OVER () AS BIGINT) AS tb
          |    FROM (SELECT t.token,
          |            CAST(SUM(CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS na,
          |            CAST(SUM(CASE WHEN d.source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS nb
          |          FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
          |          WHERE d.source IN ('src0', 'src1')
          |          GROUP BY 1) c0) c1)""".stripMargin,
        Seq("token", "na", "nb", "pa", "pb", "pta", "ptb"),
        Seq(("2 * pa * ptb", "pa * ptb + pb * pta", "ln_a"),
          ("2 * pb * pta", "pa * ptb + pb * pta", "ln_b")))
      s"""SELECT token, na, nb, pa, pb,
         |  (CAST(CAST(pa AS DECIMAL(38,0)) * ln_a AS DOUBLE) / pta
         |   + CAST(CAST(pb AS DECIMAL(38,0)) * ln_b AS DOUBLE) / ptb)
         |    / 2 / 1000000000 AS js_term,
         |  (CAST(SUM(CAST(pa AS DECIMAL(38,0)) * ln_a) OVER () AS DOUBLE) / pta
         |   + CAST(SUM(CAST(pb AS DECIMAL(38,0)) * ln_b) OVER () AS DOUBLE) / ptb)
         |    / 2 / 1000000000 AS js_total
         |FROM ($inner)""".stripMargin
    }) { (s, dir) =>
      VectorExprs.register(s)
      val wAll = Window.partitionBy()
      val c0 = Graft.table(s, dir, "documents")
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(sum(when(col("source") === "src0", 1).otherwise(0)).cast("long").as("na"),
          sum(when(col("source") === "src1", 1).otherwise(0)).cast("long").as("nb"))
      val c1 = c0
        .withColumn("ta", sum("na").over(wAll).cast("long"))
        .withColumn("tb", sum("nb").over(wAll).cast("long"))
        .select(col("token"), col("na"), col("nb"),
          expr("(na * 1000000) div ta + 1").as("pa"),
          expr("(nb * 1000000) div tb + 1").as("pb"))
      val withLogs = c1
        .withColumn("pta", sum("pa").over(wAll).cast("long"))
        .withColumn("ptb", sum("pb").over(wAll).cast("long"))
        .withColumn("ln_a", expr("ln_nanos(2 * pa * ptb, pa * ptb + pb * pta)"))
        .withColumn("ln_b", expr("ln_nanos(2 * pb * pta, pa * ptb + pb * pta)"))
      withLogs.select(col("token"), col("na"), col("nb"), col("pa"), col("pb"),
        (((col("pa").cast(dec) * col("ln_a")).cast("double") / col("pta")
          + (col("pb").cast(dec) * col("ln_b")).cast("double") / col("ptb"))
          / 2 / 1000000000L).as("js_term"),
        ((sum(col("pa").cast(dec) * col("ln_a")).over(wAll).cast("double") / col("pta")
          + sum(col("pb").cast(dec) * col("ln_b")).over(wAll).cast("double") / col("ptb"))
          / 2 / 1000000000L).as("js_total"))
    }
  )
}
