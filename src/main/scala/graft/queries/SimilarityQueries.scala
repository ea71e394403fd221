package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - `ann_bruteforce_topk`: exact baseline — broadcast the (small) query
  *    set against every candidate, rank by cosine. The probe side is a
  *    broadcast so the scan of the big side stays shuffle-free; top-k is a
  *    per-query window.
  *  - `ann_lsh_bucket`: the scale path — a coordinate-sign LSH code buckets
  *    both sides, the join shuffles on the bucket key only, and each query
  *    compares against its bucket instead of the full corpus. At 100 TB the
  *    same plan holds: bucket cardinality bounds the pair count.
  *
  * Cosine parity: vectors are quantized to BIGINT (floor(x*1e6)); dot and
  * norms are exact integer arithmetic, then exactly three IEEE double ops
  * (sqrt, mul, div) — bit-identical across engines and across parallelism.
  */
object SimilarityQueries {

  private val quantSql = EmbeddingParity.quantSql
  private val quantExpr = EmbeddingParity.quantExpr

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExprs.register(s)
    Graft.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"), quantExpr.as("qv"))
      .withColumn("nq", expr("long_dot(qv, qv)"))
  }

  /** Integer dot product via the native codegen'd [[graft.functions.LongDot]]
    * expression — the candidate-pair hot path (see DedupQueries.qdot). */
  private def cosCol: Column =
    expr("long_dot(q_qv, c_qv)").cast("double") /
      (sqrt(col("q_nq").cast("double")) * sqrt(col("c_nq").cast("double")))

  /** LSH code width scaled to the corpus: W = clamp(ceil(log2(N/32)), 4, 32)
    * keeps expected bucket occupancy near 32 at ANY N — 4 bits at the test
    * scale, ~25 bits at 10^9 vectors — instead of a fixed width whose
    * bucket count ceilings the parallelism at 100 TB. Both engines derive
    * W from COUNT(*) (identical IEEE log2/ceil), so the oracle stays
    * bit-exact. */
  def codeWidth(n: Long): Int = {
    // exact ceil(log2(n / 32)) = ceil(log2 n) - 5 in integer arithmetic:
    // ln(x)/ln(2) is off by an ulp at exact powers of two (2^34, 2^36, ...)
    // where DuckDB's native log2 is exact, which would flip W by 1 and
    // desync every LSH code from the oracle
    val ceilLog2 = if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(4, math.min(32, ceilLog2 - 5))
  }

  /** IVF centroid sampling stride: every floor(sqrt(N))-th vec_id is a
    * centroid — ~sqrt(N) cells, so cell size ~ sqrt(N) (the classic IVF
    * balance point) rather than a fixed 16-cell toy codebook. */
  def centroidStride(n: Long): Long =
    math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)

  /** W-bit coordinate-sign code over dims 1, 1+64/W, ... (1-based). */
  private def lshExpr(w: Int): Column = {
    val step = 64 / w
    concat((0 until w).map(i =>
      when(element_at(col("embedding"), 1 + i * step) >= 0, lit("1")).otherwise(lit("0"))): _*)
  }

  /** The query's multiprobe set: its own code plus every Hamming-1
    * neighbor — each candidate lives in exactly one bucket, so probing W+1
    * buckets recovers most of the recall a wider code costs, with no
    * duplicate pairs to dedup. */
  private def probeCodes(w: Int): Column = explode(array(
    col("code") +: (1 to w).map(i => concat(
      substring(col("code"), 1, i - 1),
      when(substring(col("code"), i, 1) === "1", lit("0")).otherwise(lit("1")),
      substring(col("code"), i + 1, w))): _*))

  /** DuckDB mirror of [[codeWidth]]/[[lshExpr]]/[[probeCodes]] — the code
    * and probe list built dynamically from the same COUNT(*). (`w` rides
    * along as a CROSS JOINed column: DuckDB lambdas cannot host
    * subqueries, but they can capture row columns.) */
  private val lshParamsSql =
    """wp AS (
      |  SELECT GREATEST(4, LEAST(32,
      |    CAST(ceil(log2(COUNT(*) / 32.0)) AS INT))) AS w FROM embeddings)""".stripMargin
  private val lshCodeSql =
    """list_aggregate(list_transform(generate_series(0, w - 1),
      |    i -> CASE WHEN embedding[1 + i * (64 // w)] >= 0
      |         THEN '1' ELSE '0' END), 'string_agg', '')""".stripMargin

  /** Centroid-assignment primitives shared by ann_ivf_kmeans, c_kmeans
    * and c_silhouette. argmaxCell: rank the codebook per vector by
    * exact-integer cosine and keep the top k cells. kmeansFrames: one
    * Lloyd round — stride-sampled seed codebook, assignment, exact
    * element-wise floor-mean update (one LongVecSum aggregate pass, no
    * explode), final assignment. cent/assign are persisted: each feeds
    * 2+ consumers. */

  private def vcCos: Column = expr("long_dot(qv, c_qv)").cast("double") /
    (sqrt(col("nq").cast("double")) * sqrt(col("c_nq").cast("double")))

  /** Rank the (broadcast) codebook per vector by exact-integer cosine and
    * keep the top k cells — the bounded-input form (ann_ivf_kmeans'
    * 8-query probe list): the window sorts |queries| × K rows, never a
    * corpus-sized product. Corpus-wide assignment goes through
    * [[argmaxAssign]] instead. */
  private[graft] def argmaxCell(vs: DataFrame, cents: DataFrame,
      k: Int): DataFrame = {
    val wAssign =
      Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cid"))
    vs.crossJoin(broadcast(cents))
      .withColumn("c_cos", vcCos)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= k)
  }

  /** Seal `result` (materialize + release the plain persisted
    * `persisted`), then free the eager checkpoints kmeansFrames left
    * behind — unpersist alone would strand their RDD blocks until the
    * ContextCleaner ran (the CacheScope.freeCheckpoint contract). */
  private def sealWithCheckpoints(result: DataFrame, ckpts: Seq[DataFrame],
      persisted: DataFrame*): DataFrame = {
    val out = graft.queries.CacheScope.sealResult(result, persisted: _*)
    ckpts.foreach(graft.queries.CacheScope.freeCheckpoint)
    out
  }

  /** Top-1 centroid per vector as a MAP-SIDE-COMBINABLE aggregate — the
    * shipped Lloyd-assignment shape, and the fix for the r15 weak item
    * (c_silhouette family, 100× exponent 0.49). The windowed form
    * shuffles the whole N × K corpus-codebook product into per-vector
    * sort windows, and THAT exchange — 11M rows at ScaleBench's 100×
    * corpus — was the measured cost, not the dot products (N·K 64-dim
    * dots are <1 s of pure compute at that scale). A
    * max(struct(cos, −cid)) hash aggregate computes the identical
    * (cos DESC, cid ASC) argmax — struct ordering is lexicographic, and
    * negating the id turns the ASC tie-break into a max — while the
    * product never leaves the map side: the codebook is broadcast, each
    * task folds its vectors' K candidates down to one running max, and
    * only N one-row partials reach the exchange. The N·K dot-product
    * FLOP term remains (the exact semantics demand every cosine), but
    * it is embarrassingly parallel and shuffle-free.
    *
    * Measured NEGATIVE result, r16 (the g_kcore discipline — measure the
    * obvious alternative before shipping it): an exact bound-pruned
    * two-level search (√K coarse reps, per-cell max angular radius,
    * spherical-triangle-inequality upper bounds, probe-then-candidates
    * with a certified k-th-best threshold) was built, spec-proven
    * equivalent on tie-dense corpora, and benchmarked — it admitted
    * 225/225 cells per vector on the 100× corpus: one-Lloyd-round cells
    * on 64-dim embeddings have near-90° radii, so angular bounds are
    * vacuous, and the machinery only added fixed job overhead (2-3×
    * slower at sf0.1) plus a driver-side plan-explosion hazard in the
    * chained searches. Removed in favor of this aggregate, which attacks
    * the exchange the measurements actually blamed. */
  private def argmaxAssign(vs: DataFrame, cents: DataFrame): DataFrame =
    vs.crossJoin(broadcast(cents))
      .withColumn("c_cos", vcCos)
      .groupBy("vec_id")
      .agg(max(struct(col("c_cos").as("c"), (-col("cid")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cid"))

  /** The ann_ivf_kmeans program: 4-probe IVF top-5 over the Lloyd-round
    * codebook — (result frame, kmeans checkpoints for the caller to
    * free). Shared with ann_recall so the graded ranking and the grading
    * query cannot drift. */
  private def ivfKmeansTop5(s: SparkSession,
      dir: String): (DataFrame, Seq[DataFrame]) = {
    val (n, cent, assign, kmCached) = kmeansFrames(s, dir)
    // 8 query vectors × K codebook rows: the windowed top-4 is bounded
    // by the query list, not the corpus — no aggregate rewrite needed
    val probes = argmaxCell(n.filter(col("vec_id") < 8), cent, 4)
      .select(col("vec_id").as("q_id"), col("cid"))
    val cells = assign.join(n, "vec_id")
      .select(col("cid").as("a_cid"), col("vec_id").as("n_id"),
        col("qv").as("c_qv2"), col("nq").as("c_nq2"))
    val qv = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qq_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
    val pairCos = expr("long_dot(q_qv, c_qv2)").cast("double") /
      (sqrt(col("q_nq").cast("double")) * sqrt(col("c_nq2").cast("double")))
    val wRank = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    (broadcast(probes)
      .join(cells, col("a_cid") === col("cid") && col("n_id") =!= col("q_id"))
      .join(broadcast(qv), col("qq_id") === col("q_id"))
      .withColumn("cos_sim", pairCos)
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "n_id", "cos_sim"), kmCached)
  }

  /** Exact brute-force cosine top-5 for the 8-query probe set — the
    * ann_bruteforce_topk program, shared with ann_recall as the ground
    * truth. */
  private def bruteTop5(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir)
    val q = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
    val c = n.select(col("vec_id").as("n_id"), col("qv").as("c_qv"), col("nq").as("c_nq"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    broadcast(q).join(c, col("n_id") =!= col("q_id"))
      .withColumn("cos_sim", cosCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "n_id", "cos_sim")
  }

  /** (vectors, refined codebook, final assignment, checkpointed frames)
    * after one Lloyd round. `cent` and `assign` come back as EAGER
    * localCheckpoints (cent is √N rows, assign N slim rows — the same
    * bytes a persist would hold, with the chained stages' plan growth
    * cut at each boundary; the d_dup_clusters lesson, where lazy chained
    * stages re-embed every upstream tree per reference and the cost
    * lands in the driver's optimizer); the CALLER seals its result and
    * releases both via sealWithCheckpoints. */
  private def kmeansFrames(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame, Seq[DataFrame]) = {
    val n = emb(s, dir).select("vec_id", "qv", "nq")
    // |N| from parquet footer metadata (no count job, no scan) — the
    // codebook stride needs it before the plan can be built
    val stride = centroidStride(
      Graft.parquetRowCount(s, s"$dir/embeddings.parquet"))
    val cent0 = n.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("cid"), col("qv").as("c_qv"), col("nq").as("c_nq"))
    val assign0 = argmaxAssign(n, cent0)
    // Lloyd update: exact element-wise floor-mean, one aggregate pass
    val cent = assign0.join(n, "vec_id").groupBy("cid")
      .agg(graft.functions.VectorExprs.longVecSum(col("qv")).as("s"),
        count(lit(1)).as("c"))
      .select(col("cid"),
        expr("transform(s, x -> (x - ((x % c) + c) % c) div c)").as("c_qv"))
      .withColumn("c_nq", expr("long_dot(c_qv, c_qv)"))
      .localCheckpoint(true)
    val assign = argmaxAssign(n, cent).localCheckpoint(true)
    (n, cent, assign, Seq(cent, assign))
  }

  /** Shared k-means CTE chain (quantize -> stride-sampled seed codebook
    * -> assign -> exact floor-mean Lloyd update -> final assignment):
    * the textual prefix of BOTH the ann_ivf_kmeans oracle and the
    * c_kmeans cluster-summary oracle, so the two cannot drift apart. */
  private val kmeansAssignSql: String =
    s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |sp AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS stride FROM n),
         |cent0 AS (SELECT vec_id AS cid, qv AS cqv, nq AS cnq FROM n
         |          WHERE vec_id % (SELECT stride FROM sp) = 0),
         |assign0 AS (
         |  SELECT vec_id, cid, qv FROM (
         |    SELECT v.vec_id, c.cid, v.qv,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
         |    FROM n v CROSS JOIN cent0 c)
         |  WHERE rn = 1),
         |sums AS (
         |  SELECT a.cid, t.pos, SUM(a.qv[t.pos]) AS s, COUNT(*) AS c
         |  FROM assign0 a, UNNEST(generate_series(1, len(a.qv))) AS t(pos)
         |  GROUP BY a.cid, t.pos),
         |cent1 AS (
         |  SELECT cid, list((s - ((s % c) + c) % c) // c ORDER BY pos) AS cqv
         |  FROM sums GROUP BY cid),
         |cent AS (
         |  SELECT cid, cqv,
         |    CAST(list_sum(list_transform(cqv, x -> x * x)) AS BIGINT) AS cnq
         |  FROM cent1),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT v.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
         |    FROM n v CROSS JOIN cent c)
         |  WHERE rn = 1)"""
      .stripMargin

  private val core: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------- ANN-1
    // Brute-force cosine top-k: the exact baseline every ANN variant is
    // measured against. Queries = vec_id < 8, k = 5.
    QueryDef("ann_bruteforce_topk",
      s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |  FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs)
         |SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
      bruteTop5(s, dir)
    },

    // ---------------------------------------------------------------- ANN-1c
    // kNN label-consistency audit — mislabeled-example detection by
    // neighborhood vote: a deterministic 10% sample of vectors is checked
    // against the majority label of its 5 nearest neighbors; disagreement
    // flags probable label noise (the cleanlab-style gate a labeled
    // training set runs before fine-tuning). Exact-cosine kNN against the
    // full corpus for the AUDITED SAMPLE only, so cost is |sample|·N with
    // the sample broadcast and the corpus scan shuffle-free — and the
    // sample is a fixed BUDGET (≤ ~512, stride-derived from the corpus
    // size), so the audit is linear in N at 100 TB (the IVF cell route
    // of ann_ivf composes here if even that is too hot). Majority
    // pick is deterministic: count desc, label asc; cosine ties break on
    // n_id like ann_bruteforce_topk.
    QueryDef("ann_label_consistency",
      s"""WITH n AS (
         |  SELECT vec_id, label, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |sp AS (SELECT GREATEST(10, (COUNT(*) + 511) // 512) AS astride FROM n),
         |nn AS (
         |  SELECT * FROM (
         |    SELECT q.vec_id AS q_id, q.label AS q_label, c.label AS n_label,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) DESC,
         |        c.vec_id) AS rank
         |    FROM n q JOIN n c ON q.vec_id % (SELECT astride FROM sp) = 0
         |      AND c.vec_id <> q.vec_id)
         |  WHERE rank <= 5),
         |votes AS (
         |  SELECT q_id, q_label, n_label, COUNT(*) AS cnt
         |  FROM nn GROUP BY 1, 2, 3),
         |maj AS (
         |  SELECT q_id, q_label, n_label AS maj_label, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cnt DESC, n_label) AS r
         |  FROM votes)
         |SELECT m.q_id, m.q_label, m.maj_label, CAST(m.cnt AS BIGINT) AS maj_cnt,
         |  CAST(COALESCE(a.agree, 0) AS BIGINT) AS n_agree,
         |  CASE WHEN m.maj_label <> m.q_label THEN 1 ELSE 0 END AS noisy
         |FROM maj m LEFT JOIN (
         |  SELECT q_id, cnt AS agree FROM votes WHERE n_label = q_label) a
         |  ON a.q_id = m.q_id
         |WHERE m.r = 1""".stripMargin) { (s, dir) =>
      val n = emb(s, dir)
      // fixed audit BUDGET, not a fixed fraction (r16): vec_id % 10 made
      // the sample 10% of N, so the |sample|·N brute pass was quadratic
      // by construction — the full-registry sweep's worst exponent (0.88,
      // 0.45 → 25.6 s at 100×). The stride now grows with N so at most
      // ~512 vectors are audited (exactly the old 10% at the sf0.01/sf0.1
      // gate scales, so hashes are unchanged there), making the audit
      // linear in N — the production shape, where the label-noise audit
      // spends a fixed example budget regardless of corpus size.
      val astride = math.max(10L,
        (Graft.parquetRowCount(s, s"$dir/embeddings.parquet") + 511) / 512)
      val q = n.filter(col("vec_id") % astride === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("qv").as("q_qv"), col("nq").as("q_nq"))
      val c = n.select(col("vec_id").as("n_id"), col("label").as("n_label"),
        col("qv").as("c_qv"), col("nq").as("c_nq"))
      val wq = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      val nn = broadcast(q).join(c, col("n_id") =!= col("q_id"))
        .withColumn("cos_sim", cosCol)
        .withColumn("rank", row_number().over(wq))
        .filter(col("rank") <= 5)
        .select("q_id", "q_label", "n_label")
      // two consumers below (majority pick + agreement count): persist the
      // vote rollup so the |sample|·N pair scan runs once
      val votes = nn.groupBy("q_id", "q_label", "n_label")
        .agg(count(lit(1)).as("cnt")).persist()
      val wv = Window.partitionBy("q_id").orderBy(col("cnt").desc, col("n_label"))
      val maj = votes.withColumn("r", row_number().over(wv)).filter(col("r") === 1)
        .select(col("q_id"), col("q_label"), col("n_label").as("maj_label"),
          col("cnt").cast("long").as("maj_cnt"))
      val agree = votes.filter(col("n_label") === col("q_label"))
        .select(col("q_id"), col("cnt").cast("long").as("agree"))
      val out = maj.join(agree, Seq("q_id"), "left")
        .select(col("q_id"), col("q_label"), col("maj_label"), col("maj_cnt"),
          coalesce(col("agree"), lit(0L)).as("n_agree"),
          when(col("maj_label") =!= col("q_label"), 1).otherwise(0).as("noisy"))
      graft.queries.CacheScope.sealResult(out, votes)
    },

    // ---------------------------------------------------------------- ANN-1b
    // Hybrid retrieval with reciprocal-rank fusion: the RAG-serving shape —
    // per query doc, a LEXICAL ranking (distinct-token overlap, the native
    // sorted_intersect_count over hashed token sets) and a VECTOR ranking
    // (exact-int cosine) are fused as 1/(60+r_lex) + 1/(60+r_vec), the
    // standard RRF with k=60. Every rank uses a (score DESC, id) total
    // order and the fused score is two IEEE divisions in fixed order, so
    // the fusion is bit-identical across engines and parallelism. Scale
    // shape: the query side broadcasts (scan of the corpus stays
    // shuffle-free, one window shuffle on q_id); at 100 TB each ranking's
    // candidate set comes from its index (ann_ivfs / t_bm25s) instead of
    // the full corpus — the fusion math is unchanged.
    QueryDef("ann_hybrid_rrf",
      s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |tok AS (
         |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tks
         |  FROM documents),
         |base AS (
         |  SELECT n.vec_id AS id, qv, nq, tks
         |  FROM n JOIN tok ON tok.doc_id = n.vec_id),
         |pairs AS (
         |  SELECT q.id AS q_id, c.id AS n_id,
         |    len(list_intersect(q.tks, c.tks)) AS lex,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |  FROM base q JOIN base c ON q.id < 8 AND c.id <> q.id),
         |ranked AS (
         |  SELECT q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY lex DESC, n_id) AS lex_rank,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS vec_rank
         |  FROM pairs),
         |fused AS (
         |  SELECT q_id, n_id,
         |    CAST(lex_rank AS BIGINT) AS lex_rank, CAST(vec_rank AS BIGINT) AS vec_rank,
         |    (CAST(1 AS DOUBLE) / (60 + lex_rank)) + (CAST(1 AS DOUBLE) / (60 + vec_rank)) AS rrf
         |  FROM ranked)
         |SELECT q_id, rank, n_id, lex_rank, vec_rank, rrf FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rrf DESC, n_id) AS rank
         |  FROM fused)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val n = emb(s, dir)
      val tok = Graft.table(s, dir, "documents")
        .select(col("doc_id"),
          expr("array_sort(transform(array_distinct(split(text, ' ')), t -> xxhash64(t)))").as("ht"))
      val base = n.join(tok, n("vec_id") === tok("doc_id"))
        .select(col("vec_id").as("id"), col("qv"), col("nq"), col("ht"))
      val q = base.filter(col("id") < 8).select(col("id").as("q_id"),
        col("qv").as("q_qv"), col("nq").as("q_nq"), col("ht").as("q_ht"))
      val c = base.select(col("id").as("n_id"),
        col("qv").as("c_qv"), col("nq").as("c_nq"), col("ht").as("c_ht"))
      val wl = Window.partitionBy("q_id").orderBy(col("lex").desc, col("n_id"))
      val wv = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      val wr = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("n_id"))
      broadcast(q).join(c, col("n_id") =!= col("q_id"))
        .withColumn("lex", expr("sorted_intersect_count(q_ht, c_ht)"))
        .withColumn("cos_sim", cosCol)
        .withColumn("lex_rank", row_number().over(wl).cast("long"))
        .withColumn("vec_rank", row_number().over(wv).cast("long"))
        .withColumn("rrf",
          (lit(1.0) / (lit(60) + col("lex_rank"))) + (lit(1.0) / (lit(60) + col("vec_rank"))))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "n_id", "lex_rank", "vec_rank", "rrf")
    },

    // ---------------------------------------------------------------- ANN-1c
    // Contrastive triplet mining — the training-pair generation step for
    // embedding models: per anchor, the nearest SAME-label vector (the
    // positive) and the nearest DIFFERENT-label vector (the hard negative,
    // the pair that most needs margin), plus the current margin. ONE
    // window pass does both sides — rank partitioned by (anchor, same?) —
    // then a per-anchor conditional-max pivot, so the corpus is scanned
    // once (at 100 TB the candidate set per side comes from the ANN
    // serving store; the mining math is unchanged). Exact-int cosine,
    // (cos DESC, id) total order, margin = one IEEE subtraction.
    QueryDef("ann_triplet_mine",
      s"""WITH n AS (
         |  SELECT vec_id, label, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |pairs AS (
         |  SELECT q.vec_id AS a_id, c.vec_id AS c_id,
         |    (c.label = q.label) AS same,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |  FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |best AS (
         |  SELECT a_id, c_id, same, cos_sim FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id, same
         |      ORDER BY cos_sim DESC, c_id) AS r FROM pairs) WHERE r = 1)
         |SELECT a_id AS anchor_id,
         |  MAX(CASE WHEN same THEN c_id END) AS pos_id,
         |  MAX(CASE WHEN same THEN cos_sim END) AS pos_cos,
         |  MAX(CASE WHEN NOT same THEN c_id END) AS neg_id,
         |  MAX(CASE WHEN NOT same THEN cos_sim END) AS neg_cos,
         |  MAX(CASE WHEN same THEN cos_sim END)
         |    - MAX(CASE WHEN NOT same THEN cos_sim END) AS margin
         |FROM best GROUP BY a_id""".stripMargin) { (s, dir) =>
      val n = emb(s, dir)
      val q = n.filter(col("vec_id") < 8).select(col("vec_id").as("a_id"),
        col("label").as("a_label"), col("qv").as("q_qv"), col("nq").as("q_nq"))
      val c = n.select(col("vec_id").as("c_id"), col("label").as("c_label"),
        col("qv").as("c_qv"), col("nq").as("c_nq"))
      val w = Window.partitionBy("a_id", "same").orderBy(col("cos_sim").desc, col("c_id"))
      broadcast(q).join(c, col("c_id") =!= col("a_id"))
        .withColumn("same", col("c_label") === col("a_label"))
        .withColumn("cos_sim", cosCol)
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .groupBy(col("a_id").as("anchor_id"))
        .agg(
          max(when(col("same"), col("c_id"))).as("pos_id"),
          max(when(col("same"), col("cos_sim"))).as("pos_cos"),
          max(when(!col("same"), col("c_id"))).as("neg_id"),
          max(when(!col("same"), col("cos_sim"))).as("neg_cos"),
          (max(when(col("same"), col("cos_sim")))
            - max(when(!col("same"), col("cos_sim")))).as("margin"))
    },

    // ---------------------------------------------------------------- ANN-1d
    // Corpus diversity in O(n) — mean pairwise squared distance WITHOUT a
    // pair join, via the moment identity Σ_{x,y}||x−y||² =
    // 2(n·Σ||x||² − Σ_d (Σ_x x_d)²): the before/after-dedup diversity
    // gauge a curation pipeline reports, computable at any corpus size for
    // the cost of one scan + a per-(label, dim) rollup. All moments are
    // EXACT: quantized ints, with the overflow-prone products (n·Σ||x||²
    // and the squared dimension sums — past 10^19 at modest corpus sizes)
    // carried in DECIMAL(38,0) in BOTH engines; one double division at the
    // end (÷ n² and the 10^12 quantization scale).
    QueryDef("ann_diversity",
      s"""WITH n AS (
         |  SELECT vec_id, label, $quantSql AS qv FROM embeddings),
         |ex AS (
         |  SELECT label, g.i AS dim, qv[g.i] AS v
         |  FROM n, UNNEST(generate_series(1, len(qv))) AS g(i)),
         |dimsum AS (
         |  SELECT label, dim, CAST(SUM(v) AS BIGINT) AS sd,
         |    CAST(SUM(v * v) AS BIGINT) AS sq
         |  FROM ex GROUP BY label, dim),
         |agg AS (
         |  SELECT label,
         |    CAST(SUM(CAST(sq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
         |    CAST(SUM(CAST(sd AS DECIMAL(38,0)) * sd) AS DECIMAL(38,0)) AS sumsd2
         |  FROM dimsum GROUP BY label),
         |cnt AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nv FROM n GROUP BY label)
         |SELECT c.label, c.nv,
         |  CAST(2 * (c.nv * a.s2 - a.sumsd2) AS DOUBLE)
         |    / (CAST(c.nv AS DOUBLE) * c.nv * 1e12) AS mean_sq_dist
         |FROM cnt c JOIN agg a ON a.label = c.label""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), col("label"), col("qv"))
      val ex = n.select(col("label"), posexplode(col("qv")).as(Seq("dim0", "v")))
      val dimsum = ex.groupBy(col("label"), col("dim0"))
        .agg(sum("v").cast("long").as("sd"),
          sum(col("v") * col("v")).cast("long").as("sq"))
      val agg = dimsum.groupBy("label").agg(
        sum(col("sq").cast("decimal(38,0)")).cast("decimal(38,0)").as("s2"),
        sum(col("sd").cast("decimal(38,0)") * col("sd")).cast("decimal(38,0)")
          .as("sumsd2"))
      val cnt = n.groupBy("label").agg(count(lit(1)).cast("long").as("nv"))
      cnt.join(agg, "label")
        .select(col("label"), col("nv"),
          ((lit(2) * (col("nv") * col("s2") - col("sumsd2"))).cast("double")
            / (col("nv").cast("double") * col("nv") * lit(1e12))).as("mean_sq_dist"))
    },

    // ----------------------------------------------------------------- ANN-2
    // LSH-bucketed ANN with multiprobe: both sides carry a W-bit sign code
    // (W from the corpus size — see codeWidth); the candidate join is equi
    // on the code; each query probes its own bucket plus every Hamming-1
    // bucket. At 100 TB the same plan holds with W ≈ 25: ~2^25 uniform
    // buckets bound the pair count and the shuffle key cardinality scales
    // WITH the data instead of ceiling at 16.
    QueryDef("ann_lsh_bucket",
      s"""WITH $lshParamsSql,
         |n AS (
         |  SELECT vec_id, w, $lshCodeSql AS code, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings CROSS JOIN wp),
         |probes AS (
         |  SELECT vec_id, qv, nq,
         |    unnest(list_prepend(code,
         |      list_transform(generate_series(1, w),
         |        i -> substr(code, 1, i - 1)
         |          || (CASE WHEN substr(code, i, 1) = '1' THEN '0' ELSE '1' END)
         |          || substr(code, i + 1)))) AS pcode
         |  FROM n WHERE vec_id < 8),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |  FROM probes q JOIN n c ON q.pcode = c.code AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs)
         |SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val w = codeWidth(Graft.parquetRowCount(s, s"$dir/embeddings.parquet"))
      val n = emb(s, dir).withColumn("code", lshExpr(w))
      val q = n.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nq").as("q_nq"),
          probeCodes(w).as("pcode"))
      val c = n.select(col("vec_id").as("n_id"), col("code").as("c_code"),
        col("qv").as("c_qv"), col("nq").as("c_nq"))
      val win = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      broadcast(q).join(c, col("pcode") === col("c_code") && col("n_id") =!= col("q_id"))
        .withColumn("cos_sim", cosCol)
        .withColumn("rank", row_number().over(win))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "n_id", "cos_sim")
    },

    // ----------------------------------------------------------------- ANN-3
    // IVF-style ANN: ~sqrt(N) centroids sampled deterministically (every
    // floor(sqrt(N))-th vec_id — a real pipeline would k-means them, but
    // the sampling already scales the codebook with the corpus so cells
    // stay ~sqrt(N)-sized at any N); every vector is assigned to its
    // nearest-centroid cell, queries probe their top-4 cells (nprobe=4:
    // recall at cell boundaries comes from probing the neighboring cells,
    // and the probe set stays a broadcast-sized queries x 4 list). The
    // inverted-file layout is the 100 TB path: the corpus is partitioned
    // BY CELL on disk, a query touches probe/cells of the data, and the
    // candidate join is equi on cell id. Centroids broadcast everywhere.
    QueryDef("ann_ivf",
      s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |sp AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS stride FROM n),
         |cent AS (SELECT vec_id AS cid, qv AS cqv, nq AS cnq FROM n
         |         WHERE vec_id % (SELECT stride FROM sp) = 0),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT v.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
         |    FROM n v CROSS JOIN cent c)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, cid FROM (
         |    SELECT q.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
         |    FROM n q CROSS JOIN cent c WHERE q.vec_id < 8)
         |  WHERE rn <= 4),
         |pairs AS (
         |  SELECT p.q_id, a.vec_id AS n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, v.qv), x -> x[1] * x[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(v.nq AS DOUBLE))) AS cos_sim
         |  FROM probes p
         |  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
         |  JOIN n q ON q.vec_id = p.q_id
         |  JOIN n v ON v.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs)
         |SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select("vec_id", "qv", "nq")
      // |N| from parquet footer metadata (no count job, no scan)
      val stride = centroidStride(Graft.parquetRowCount(s, s"$dir/embeddings.parquet"))
      val cent = n.filter(pmod(col("vec_id"), lit(stride)) === 0)
        .select(col("vec_id").as("cid"), col("qv").as("c_qv"), col("nq").as("c_nq"))
      val centCos = expr("long_dot(qv, c_qv)").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("c_nq").cast("double")))
      val wAssign = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cid"))
      val assign = n.crossJoin(broadcast(cent))
        .withColumn("c_cos", centCos)
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"))
      val probes = n.filter(col("vec_id") < 8).crossJoin(broadcast(cent))
        .withColumn("c_cos", centCos)
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") <= 4)
        .select(col("vec_id").as("q_id"), col("cid"))
      val cells = assign.join(n, "vec_id")
        .select(col("cid").as("a_cid"), col("vec_id").as("n_id"),
          col("qv").as("c_qv2"), col("nq").as("c_nq2"))
      // only the probe set's vectors ride the broadcast — without the
      // filter this would broadcast the ENTIRE corpus's vectors (the join
      // key restricts matches to the 8 queries, but the shipped table
      // would still be all N rows)
      val qv = n.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qq_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
      val pairCos = expr("long_dot(q_qv, c_qv2)").cast("double") /
        (sqrt(col("q_nq").cast("double")) * sqrt(col("c_nq2").cast("double")))
      val wRank = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      broadcast(probes)
        .join(cells, col("a_cid") === col("cid") && col("n_id") =!= col("q_id"))
        .join(broadcast(qv), col("qq_id") === col("q_id"))
        .withColumn("cos_sim", pairCos)
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "n_id", "cos_sim")
    },

    // ----------------------------------------------------------------- ANN-4
    // IVF with a k-means-refined codebook: the sampled centroids of ann_ivf
    // are the Lloyd INIT; one refinement round recomputes each cell's
    // centroid as the exact element-wise floor-mean of its members, then
    // re-assigns. All arithmetic stays integral (sum of quantized longs,
    // floor division spelled sign-safely), so the refined codebook — and
    // therefore every downstream assignment and ranking — is bit-identical
    // across engines and at any parallelism, which is what makes a
    // DETERMINISTIC k-means oracle possible at all. The centroid update is
    // ONE hash-aggregate pass with the LongVecSum typed Aggregator — no
    // per-element explode (the explode formulation the oracle uses would
    // shuffle dim x N rows, a 64x write amplification at 100 TB). More
    // Lloyd rounds repeat the same two steps; one round already separates
    // refined from sampled behavior for the gate.
    QueryDef("ann_ivf_kmeans",
      s"""$kmeansAssignSql,
         |probes AS (
         |  SELECT vec_id AS q_id, cid FROM (
         |    SELECT q.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
         |    FROM n q CROSS JOIN cent c WHERE q.vec_id < 8)
         |  WHERE rn <= 4),
         |pairs AS (
         |  SELECT p.q_id, a.vec_id AS n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, v.qv), x -> x[1] * x[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(v.nq AS DOUBLE))) AS cos_sim
         |  FROM probes p
         |  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
         |  JOIN n q ON q.vec_id = p.q_id
         |  JOIN n v ON v.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs)
         |SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val (top5, kmCached) = ivfKmeansTop5(s, dir)
      sealWithCheckpoints(top5, kmCached)
    },

    // ---------------------------------------------------------------- ANN-2b
    // IVF recall@5 — the evaluation query every deployed ANN index runs
    // before its parameters ship: the 4-probe IVF ranking of
    // ann_ivf_kmeans scored against the exact brute-force top-5 of
    // ann_bruteforce_topk, per query. Both rankings are the SAME shared
    // programs (ivfKmeansTop5 / bruteTop5 — oracle and plan cannot drift
    // from the queries they grade), the intersection is an integer count
    // over the two deterministic top-5 sets, and recall lands as exact
    // ppm (n_hits·10⁶ div 5) — no float ratios to drift. Cost: the IVF
    // probe side is cell-bounded; the truth side is the |queries|·N
    // brute pass with the 8-row query set broadcast — the audit
    // fraction, not the corpus, is the 100 TB knob (sample the queries).
    QueryDef("ann_recall",
      s"""$kmeansAssignSql,
         |probes AS (
         |  SELECT vec_id AS q_id, cid FROM (
         |    SELECT q.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
         |    FROM n q CROSS JOIN cent c WHERE q.vec_id < 8)
         |  WHERE rn <= 4),
         |pairs AS (
         |  SELECT p.q_id, a.vec_id AS n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, v.qv), x -> x[1] * x[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(v.nq AS DOUBLE))) AS cos_sim
         |  FROM probes p
         |  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
         |  JOIN n q ON q.vec_id = p.q_id
         |  JOIN n v ON v.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs),
         |approx AS (SELECT q_id, n_id FROM ranked WHERE rank <= 5),
         |truth0 AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |  FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |truth AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, n_id) AS rank FROM truth0) WHERE rank <= 5)
         |SELECT t.q_id, CAST(COUNT(a.n_id) AS BIGINT) AS n_hits,
         |  CAST(COUNT(a.n_id) * 1000000 // 5 AS BIGINT) AS recall_ppm
         |FROM truth t LEFT JOIN approx a ON a.q_id = t.q_id AND a.n_id = t.n_id
         |GROUP BY t.q_id""".stripMargin) { (s, dir) =>
      val (approx, kmCached) = ivfKmeansTop5(s, dir)
      val truth = bruteTop5(s, dir)
      sealWithCheckpoints(
        truth.select(col("q_id"), col("n_id"))
          .join(approx.select(col("q_id"), col("n_id"), lit(1).as("hit")),
            Seq("q_id", "n_id"), "left")
          .groupBy("q_id")
          .agg(count(col("hit")).cast("long").as("n_hits"))
          .withColumn("recall_ppm", expr("n_hits * 1000000 div 5")),
        kmCached)
    },

    // --------------------------------------------------------------- CLUST-1
    // K-means document clustering as a DELIVERABLE (topic-bucketing the
    // corpus for mixture design / per-cluster sampling) rather than as an
    // ANN index: same exact-integral Lloyd round as ann_ivf_kmeans (shared
    // kmeansFrames/kmeansAssignSql — the queries cannot drift), summarized
    // per cluster. The integer membership fingerprints (SUM/MIN of
    // vec_id) make the oracle sensitive to ANY assignment difference, not
    // just size drift. Scale: the summary is a map-side-combinable hash
    // agg over the |V|-row assignment — the Lloyd round's cost dominates,
    // and that is one broadcast cross-join + one LongVecSum aggregate per
    // iteration (no per-element explode).
    QueryDef("c_kmeans",
      s"""$kmeansAssignSql
         |SELECT a.cid, COUNT(*) AS n_vecs,
         |  CAST(SUM(a.vec_id) AS BIGINT) AS sum_vec,
         |  MIN(a.vec_id) AS min_vec
         |FROM assign a GROUP BY a.cid""".stripMargin) { (s, dir) =>
      val (_, cent, assign, kmCached) = kmeansFrames(s, dir)
      sealWithCheckpoints(
        assign.groupBy("cid")
          .agg(count(lit(1)).as("n_vecs"),
            sum("vec_id").as("sum_vec"),
            min("vec_id").as("min_vec"))
          .select("cid", "n_vecs", "sum_vec", "min_vec"),
        kmCached)
    },

    // --------------------------------------------------------------- CLUST-2
    // Simplified silhouette over the k-means clustering — the quality
    // gate a curation pipeline reads before trusting cluster-balanced
    // sampling: per vector, cohesion is the cosine to its OWN centroid
    // and separation the best cosine to any OTHER centroid (the
    // centroid-based simplified silhouette — the member-pairwise form is
    // O(N²) and adds nothing at this granularity; MLlib's
    // ClusteringEvaluator makes the same trade). The oracle states the
    // separation as a flat corpus × codebook max over per-vector
    // windows; the Spark plan computes the identical values WITHOUT
    // shuffling that product (the r15 weak item, 100× exponent 0.49):
    // cohesion and separation are ONE when-split max aggregate over the
    // broadcast codebook — fully map-side-combined, so only N one-row
    // partials reach the exchange (see argmaxAssign for the A/B and the
    // measured negative result on the bound-pruned alternative).
    // Parity: the aggregate's maxes see the same exact-int dot +
    // 3-IEEE-step cosines the window form sorted, and max-of-doubles is
    // order-free; the per-vector score quantizes to ppm BEFORE the
    // per-cluster sum, so the rollup is integer (never a float sum whose
    // order could drift), with one final division for the mean.
    QueryDef("c_silhouette",
      s"""$kmeansAssignSql,
         |allcos AS (
         |  SELECT v.vec_id, c.cid,
         |    CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) AS cos
         |  FROM n v CROSS JOIN cent c),
         |own AS (SELECT o.vec_id, a.cid, o.cos AS a_cos FROM allcos o
         |        JOIN assign a ON a.vec_id = o.vec_id AND a.cid = o.cid),
         |oth AS (SELECT o.vec_id, MAX(o.cos) AS b_cos FROM allcos o
         |        JOIN assign a ON a.vec_id = o.vec_id AND a.cid <> o.cid
         |        GROUP BY o.vec_id),
         |sil AS (SELECT own.vec_id, own.cid,
         |          CAST(floor((a_cos - b_cos) * 1000000) AS BIGINT) AS sil_ppm
         |        FROM own JOIN oth ON oth.vec_id = own.vec_id)
         |SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(SUM(sil_ppm) AS BIGINT) AS sum_sil_ppm,
         |  CAST(CAST(SUM(sil_ppm) AS BIGINT) AS DOUBLE) / (COUNT(*) * 1000000)
         |    AS mean_sil
         |FROM sil GROUP BY cid""".stripMargin) { (s, dir) =>
      val (n, cent, assign, kmCached) = kmeansFrames(s, dir)
      // own cid rides ALONG the corpus rows into the codebook pass, so
      // cohesion and separation come out of ONE when-split aggregate —
      // the N × K product never shuffles (map-side partial maxes only),
      // and the old own-pick/best-other split (two consumers over a
      // persisted N × K frame) disappears entirely
      val withOwn = n.join(assign.withColumnRenamed("cid", "own_cid"), "vec_id")
      val scores = withOwn.crossJoin(broadcast(cent))
        .withColumn("c_cos", vcCos)
        .groupBy("vec_id", "own_cid")
        .agg(
          max(when(col("cid") === col("own_cid"), col("c_cos"))).as("a_cos"),
          max(when(col("cid") =!= col("own_cid"), col("c_cos"))).as("b_cos"))
        // a single-centroid codebook has no "other": the oracle's inner
        // join drops such vectors, so the null b_cos must drop here too
        .filter(col("b_cos").isNotNull)
      sealWithCheckpoints(
        scores
          .withColumn("sil_ppm",
            floor((col("a_cos") - col("b_cos")) * 1000000).cast("long"))
          .groupBy(col("own_cid").as("cid"))
          .agg(count(lit(1)).cast("long").as("n_vecs"),
            sum("sil_ppm").cast("long").as("sum_sil_ppm"))
          .withColumn("mean_sil", col("sum_sil_ppm").cast("double") /
            (col("n_vecs") * 1000000)),
        kmCached)
    },

    // ----------------------------------------------------------------- ANN-5
    // Product quantization + asymmetric distance (ADC): the memory-bound
    // 100 TB scan path. The corpus is compressed to m=8 one-byte codes per
    // vector (argmin-L2 against a 16-centroid codebook per subspace — a
    // 64-dim float vector becomes 8 bytes, 32x), and a query scans CODES,
    // not vectors: its distance table (m x 16 exact subvector distances)
    // broadcasts, the scan is a code lookup + sum. Everything stays in
    // exact int64 (quantized subvectors, squared L2, LongDot for the cross
    // terms), so codes, distance tables, and the final ranking are
    // bit-identical across engines and at any parallelism.
    //
    // Scale notes: the encode argmin is min(struct(d2, cid)) — a map-side
    // combinable hash aggregate over the (vector x subspace x centroid)
    // candidates, NOT a row_number window (no N x m x k sort, no skew).
    // The ADC join broadcasts only LUT rows (queries x m x 16); the one
    // shuffle is the per-(query, candidate) sum of 8 partial distances.
    QueryDef("ann_ivf_pq",
      s"""WITH n0 AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, list_transform(qv, x ->
         |    CAST(floor(CAST(x AS DOUBLE) * 1000000
         |      / sqrt(CAST(GREATEST(nq, 1) AS DOUBLE))) AS BIGINT)) AS qv
         |  FROM n0),
         |sp AS (SELECT GREATEST(1, COUNT(*) // 16) AS stride FROM n),
         |sub AS (
         |  SELECT vec_id, t.j,
         |    qv[1 + t.j * (len(qv) // 8) : (t.j + 1) * (len(qv) // 8)] AS subv
         |  FROM n, UNNEST(generate_series(0, 7)) AS t(j)),
         |cb AS (
         |  SELECT vec_id // (SELECT stride FROM sp) AS cid, j, subv AS cqv,
         |    CAST(list_sum(list_transform(subv, x -> x * x)) AS BIGINT) AS cnq
         |  FROM sub
         |  WHERE vec_id % (SELECT stride FROM sp) = 0
         |    AND vec_id // (SELECT stride FROM sp) < 16),
         |enc AS (
         |  SELECT vec_id, j, cid AS code FROM (
         |    SELECT s.vec_id, s.j, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
         |        c.cnq - 2 * CAST(list_sum(list_transform(
         |          list_zip(s.subv, c.cqv), p -> p[1] * p[2])) AS BIGINT),
         |        c.cid) AS rn
         |    FROM sub s JOIN cb c ON s.j = c.j)
         |  WHERE rn = 1),
         |lut AS (
         |  SELECT s.vec_id AS q_id, s.j, c.cid,
         |    CAST(list_sum(list_transform(s.subv, x -> x * x)) AS BIGINT)
         |      - 2 * CAST(list_sum(list_transform(
         |          list_zip(s.subv, c.cqv), p -> p[1] * p[2])) AS BIGINT)
         |      + c.cnq AS d
         |  FROM sub s JOIN cb c ON s.j = c.j WHERE s.vec_id < 8),
         |adc AS (
         |  SELECT l.q_id, e.vec_id AS n_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist
         |  FROM enc e JOIN lut l ON l.j = e.j AND l.cid = e.code
         |    AND e.vec_id <> l.q_id
         |  GROUP BY l.q_id, e.vec_id),
         |short AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adc_dist, n_id) AS srank FROM adc)
         |  WHERE srank <= 50),
         |pairs AS (
         |  SELECT s.q_id, s.n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |  FROM short s JOIN n0 q ON q.vec_id = s.q_id
         |  JOIN n0 c ON c.vec_id = s.n_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs)
         |SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
      // L2 on UNIT vectors is a monotone transform of cosine, so the PQ
      // ranking approximates the same metric the exact baseline uses.
      // Normalization stays cross-engine exact: int*1e6 is exact below
      // 2^53, then one correctly-rounded div+sqrt+floor each (IEEE).
      val base = emb(s, dir)
        .select(col("vec_id"), expr("transform(qv, x -> bigint(floor(" +
          "cast(x as double) * 1000000 / sqrt(cast(greatest(nq, 1) as double)))))")
          .as("qv"))
      // |N| from parquet footer metadata (no count job, no scan): the
      // codebook stride needs it before the subspace explode it sizes
      val stride = math.max(1L, Graft.parquetRowCount(s, s"$dir/embeddings.parquet") / 16)
      // subspace explode: 8 rows per vector, each an exact-int subvector
      val sub = base
        .select(col("vec_id"), col("qv"), explode(expr("sequence(0, 7)")).as("j"))
        .withColumn("subv",
          expr("slice(qv, 1 + j * (size(qv) div 8), size(qv) div 8)"))
        .drop("qv")
      val cb = sub
        .filter(col("vec_id") % stride === 0 && expr(s"vec_id div $stride") < 16)
        .select(expr(s"vec_id div $stride").as("cid"), col("j").as("c_j"),
          col("subv").as("cqv"))
        .withColumn("cnq", expr("long_dot(cqv, cqv)"))
      // encode: argmin over centroids of ||subv - cqv||^2; the subv norm is
      // constant per (vector, subspace), so the argmin key is cnq - 2*dot.
      // min(struct(...)) is partial-aggregatable (map-side combine), unlike
      // a ROW_NUMBER window — the shuffle carries N x 8 combined rows, not
      // N x 8 x 16 sorted candidates.
      val codes = sub.join(broadcast(cb), col("j") === col("c_j"))
        .withColumn("d2", col("cnq") - lit(2L) * expr("long_dot(subv, cqv)"))
        .groupBy("vec_id", "j")
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("j").as("e_j"), col("m.cid").as("code"))
      // the query-side distance table: TRUE subspace L2 (norm included) so
      // the summed ADC distance is the real ||q - reconstruction||^2
      val lut = sub.filter(col("vec_id") < 8)
        .join(broadcast(cb), col("j") === col("c_j"))
        .withColumn("d", expr("long_dot(subv, subv)")
          - lit(2L) * expr("long_dot(subv, cqv)") + col("cnq"))
        .select(col("vec_id").as("q_id"), col("j").as("l_j"),
          col("cid").as("l_cid"), col("d"))
      // stage 1: the compressed scan — ADC shortlist of 50 per query.
      // stage 2: exact re-rank of the shortlist only (the production IR
      // shape: full-precision math touches 50 rows/query, never the corpus).
      val wS = Window.partitionBy("q_id").orderBy(col("adc_dist").asc, col("n_id").asc)
      val short = codes.join(broadcast(lut),
          col("e_j") === col("l_j") && col("code") === col("l_cid") &&
            col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id").as("n_id"))
        .agg(sum(col("d")).as("adc_dist"))
        .withColumn("srank", row_number().over(wS))
        .filter(col("srank") <= 50)
        .select("q_id", "n_id")
      val exact = emb(s, dir).select("vec_id", "qv", "nq")
      val wR = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id").asc)
      broadcast(short)
        .join(exact, col("n_id") === col("vec_id")) // corpus side: no shuffle
        .select(col("q_id"), col("n_id"), col("qv").as("c_qv"), col("nq").as("c_nq"))
        .join(broadcast(exact.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qq_id"), col("qv").as("q_qv"),
            col("nq").as("q_nq"))), col("qq_id") === col("q_id"))
        .withColumn("cos_sim", cosCol)
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "n_id", "cos_sim")
    }
  )

  // ------------------------------------------------------------------ ANN-6
  // The PERSISTED serving-index form of ann_ivf: codebook + cell-bucketed
  // inverted file as lake tables (pipeline/AnnStore), probe = broadcast
  // cell pick + bucket-PRUNED scan of only the probed cells. Same oracle
  // as ann_ivf — the index changes WHERE the compute happens, not the
  // answer (all math exact-integral, so stored ≡ inline bit-for-bit).
  // Store cache keyed on the source data version (Graft.dataFingerprint —
  // ordered-tuple hash), like the dedup store: a regenerated
  // embeddings.parquet must rebuild.
  val all: Seq[QueryDef] = core :+
    QueryDef("ann_ivfs", core.find(_.name == "ann_ivf").get.oracle.get) { (s, dir) =>
      val fp = Graft.dataFingerprint(s, s"$dir/embeddings.parquet")
      val root = graft.core.StoreRoots.rootFor("graft_ann_store", "v2", dir, fp)
      val emb = Graft.table(s, dir, "embeddings")
      graft.pipeline.AnnStore.ensureBuilt(s, root, emb)
      graft.pipeline.AnnStore.probe(s, root,
        emb.filter(col("vec_id") < 8), nprobe = 4, k = 5)
    } :+
    // ---------------------------------------------------------------- ANN-7
    // Radius (range) search — "everything within cosine τ of these
    // queries", the retrieval shape dedup-verification and contamination
    // scans want (top-k truncates; a radius query must not). Exact over
    // the full corpus: the bounded query set broadcasts, the corpus scan
    // stays shuffle-free, and cost is |Q|·N with the native long_dot in
    // the hot loop — the ann_bruteforce economics, where |Q| (not N) is
    // the knob at 100 TB. The IVF route (ann_ivf/ann_ivfs) composes when
    // the query set itself is large; at τ this low the exact scan IS the
    // recall guarantee.
    QueryDef("ann_range_search",
      s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings)
         |SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |  CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |FROM n q JOIN n c ON q.vec_id % 97 = 0 AND c.vec_id <> q.vec_id
         |WHERE CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) >= 0.3""".stripMargin) { (s, dir) =>
      val n = emb(s, dir)
      val q = n.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
      val c = n.select(col("vec_id").as("n_id"), col("qv").as("c_qv"), col("nq").as("c_nq"))
      broadcast(q).join(c, col("n_id") =!= col("q_id"))
        .withColumn("cos_sim", cosCol)
        .filter(col("cos_sim") >= 0.3)
        .select("q_id", "n_id", "cos_sim")
    }
}
