package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact hash dedup,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the point of each variant):
  *  - exact: one hash-shuffle on the content key — embarrassingly scalable.
  *  - n-gram Jaccard: pairwise comparison is bounded by a blocking key so the
  *    self-join shuffles on the block, never materializing the full N² pairs.
  *  - MinHash+LSH: the scale path — per-doc signatures (map-side), band
  *    buckets as the join key; candidate pairs are only same-bucket docs.
  *  - SimHash: per-doc 16-bit signature via one explode+groupBy; collisions
  *    group near-identical token multisets.
  *  - embedding cosine: label-blocked pair join over integer-quantized
  *    vectors (floor(x*1e6)) so the dot product is exact int arithmetic —
  *    bit-identical across engines AND order-independent (no float-sum drift
  *    at any parallelism).
  *
  * Hash parity: md5 is the one hash both Spark and DuckDB implement
  * identically (hex string over UTF-8 bytes) — all signature hashing goes
  * through md5, never engine-specific hash().
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "documents").withColumn("tk", split(col("text"), " "))

  /** Distinct word-3-gram shingles (Spark side). */
  private val shinglesSqlSpark =
    """array_distinct(transform(sequence(1, size(tk) - 2),
      |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))))""".stripMargin
  private[graft] val shinglesExpr = expr(shinglesSqlSpark)

  /** Shingle set as a sorted xxhash64 array — set sizes and intersection
    * sizes are preserved (64-bit collisions over a ~10^4-shingle vocabulary
    * are ~10^-11-probable), but the pairwise intersection becomes a
    * primitive merge ([[graft.functions.SortedIntersectCount]]) instead of a
    * per-pair boxed hash set. */
  private[graft] val hashedShinglesExpr =
    expr(s"array_sort(transform($shinglesSqlSpark, s -> xxhash64(s)))")

  /** Distinct word-3-gram shingles (DuckDB side). */
  private val shinglesSql =
    """list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |  i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))""".stripMargin

  private val quantSql = EmbeddingParity.quantSql
  private val quantExpr = EmbeddingParity.quantExpr

  // ---- MinHash signature/band construction shared by d_minhash_lsh and
  // d_lsh_verified (k=8 salted md5 "permutations" folded into 4 bands) ----

  /** Oracle-side CTE body: per-doc signature columns h0..h7. */
  private val sigSqlCols = (0 until 8).map(i => s"min(md5('$i:' || s)) AS h$i").mkString(", ")

  /** Oracle-side band rows from a `sig` CTE. */
  private val bandsSqlUnion = (0 until 4).map(bnd =>
    s"SELECT doc_id, $bnd AS band, md5(h${2 * bnd} || h${2 * bnd + 1}) AS bh FROM sig")
    .mkString("\n  UNION ALL ")

  /** Spark side: (doc_id, band, bh) rows from exploded shingles. */
  private[graft] def minhashBands(shingleRows: DataFrame): DataFrame = {
    val sig = shingleRows.groupBy("doc_id").agg(
      (0 until 8).map(i => min(md5(concat(lit(s"$i:"), col("s")))).as(s"h$i")).head,
      (1 until 8).map(i => min(md5(concat(lit(s"$i:"), col("s")))).as(s"h$i")): _*)
    sig.select(col("doc_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Spark side: distinct candidate (a_id < b_id) pairs sharing any band.
    * The input is persisted before the self-join — both join sides consume
    * it, and without the persist the whole signature pass (explode +
    * 8-way min groupBy, the expensive stage) executes twice. Returns the
    * persisted bands handle alongside the pairs: the CALLER owns the
    * release (CacheScope.sealResult once its result is materialized) —
    * the pairs frame is lazy, so releasing here would undo the persist. */
  private def candidatePairs(bands0: DataFrame): (DataFrame, DataFrame) = {
    val bands = bands0.persist()
    val pairs = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("b_id"), col("band").as("band2"), col("bh").as("bh2")),
        col("band") === col("band2") && col("bh") === col("bh2") && col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    (pairs, bands)
  }

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExprs.register(s)
    Graft.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), quantExpr.as("qv"))
      .withColumn("nq", expr("long_dot(qv, qv)"))
  }

  /** Exact integer dot product of two quantized vectors — the native
    * codegen'd [[graft.functions.LongDot]] expression (the pair-join hot
    * path; HOF lambdas and unrolled element_at chains both measured 10-25×
    * slower at sf0.1). */
  private def qdot(a: String, b: String): Column = expr(s"long_dot($a, $b)")

  /** The bounded-block-guarded embedding pair join shared by
    * `d_embedding_dup` (conf-driven knobs, guarded-exact on the fixture)
    * and `d_embedding_dup_rerouted` (cap pinned low so the reroute is
    * oracle-checked). Census → loud fail or LSH sub-bucket → exact
    * within-(label, subcode) cosine pairs. Bit widths are INTEGER
    * threshold indicators Σ_j [bsz > cap·2^j] = ceil(log2(bsz/cap))
    * clamped to 16 — no floating log whose 1-ulp engine drift at powers
    * of two (ln x/ln 2 vs native log2) could flip a ceil and change the
    * bucketing between engines. */
  private def embeddingDupGuarded(s: SparkSession, dir: String,
      cap: Long, mode: String): DataFrame = {
    val n = emb(s, dir).persist()
    // the census: one count rollup on the block key, O(N) with
    // map-side combine — negligible next to the pair join it guards
    val sizes = n.groupBy("label").agg(count(lit(1)).as("bsz"))
    val coded = if (mode != "reroute") {
      val hot = sizes.filter(col("bsz") > cap)
        .orderBy(col("bsz").desc).limit(8).collect()
      if (hot.nonEmpty) {
        n.unpersist()
        throw new IllegalStateException(
          "d_embedding_dup: exact within-block pairs cost |block|² and " +
            s"these blocks exceed blockCap=$cap: " +
            hot.map(r => s"${r.get(0)}→${r.get(1)} rows").mkString(", ") +
            " — choose a finer block key, raise spark.graft.dedup.blockCap," +
            " or set spark.graft.dedup.blockMode=reroute (LSH sub-bucketing," +
            " recall-traded)")
      }
      n.withColumn("subcode", lit(""))
    } else {
      // sub-bucket ONLY the oversized blocks; bounded blocks keep
      // subcode = '' and therefore the exact semantics bit for bit
      val wMax = 16
      val step = 64 / wMax
      val code16 = concat((0 until wMax).map(i =>
        when(element_at(col("qv"), 1 + i * step) >= 0, lit("1"))
          .otherwise(lit("0"))): _*)
      val bits = (0 until wMax).map(j =>
        when(col("bsz") > cap * (1L << j), 1).otherwise(0)).reduce(_ + _)
      n.join(sizes, "label")
        .withColumn("bits", bits)
        .withColumn("code16", code16)
        .withColumn("subcode", expr("substring(code16, 1, bits)"))
    }
    val a = coded.select(col("vec_id").as("a_id"), col("label"), col("subcode"), col("qv").as("a_qv"), col("nq").as("a_nq"))
    val b = coded.select(col("vec_id").as("b_id"), col("label").as("b_label"), col("subcode").as("b_subcode"), col("qv").as("b_qv"), col("nq").as("b_nq"))
    val cos = qdot("a_qv", "b_qv") / (sqrt(col("a_nq").cast("double")) * sqrt(col("b_nq").cast("double")))
    val out = a.join(b, col("label") === col("b_label")
        && col("subcode") === col("b_subcode") && col("a_id") < col("b_id"))
      .withColumn("cos_sim", cos)
      .filter(col("cos_sim") >= 0.35)
      .select("a_id", "b_id", "cos_sim")
    CacheScope.sealResult(out, n)
  }

  /** Oracle for BOTH incremental-dedup forms (the self-contained demo and
    * the persisted-signature-store production form): the admitted set is
    * defined by the data, not by where the signatures live. */
  private val incrementalDedupSql =
    s"""WITH cut AS (SELECT MAX(doc_id) * 4 // 5 AS c FROM documents),
       |sh AS (
       |  SELECT doc_id, $shinglesSql AS sh
       |  FROM documents WHERE len(string_split(text,' ')) >= 3),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |sig AS (SELECT doc_id, $sigSqlCols FROM ex GROUP BY doc_id),
       |bands AS (
       |  $bandsSqlUnion),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |  WHERE b.doc_id >= (SELECT c FROM cut)),
       |ver AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a_id
       |  JOIN sh sb ON sb.doc_id = c.b_id
       |  WHERE len(list_intersect(sa.sh, sb.sh))
       |      / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.1),
       |agg AS (
       |  SELECT b_id AS doc_id,
       |    COUNT(CASE WHEN a_id < (SELECT c FROM cut) THEN 1 END) AS n_dups_stored,
       |    COUNT(CASE WHEN a_id >= (SELECT c FROM cut) THEN 1 END) AS n_dups_batch
       |  FROM ver GROUP BY b_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_dups_stored, 0) AS n_dups_stored,
       |  COALESCE(a.n_dups_batch, 0) AS n_dups_batch,
       |  a.doc_id IS NULL AS admitted
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= (SELECT c FROM cut)) d
       |LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- DEDUP-1
    // Exact dedup: hash-groupBy on the content hash, keep the lowest id.
    // One shuffle on md5(text); at 100 TB this is the cheapest possible
    // full-corpus dedup (map-side partial agg collapses per-partition dups).
    QueryDef("d_exact_dedup",
      """SELECT md5(text) AS content_key, MIN(doc_id) AS kept_doc_id,
        |       COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, dir) =>
      Graft.table(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_key"))
        .agg(min("doc_id").as("kept_doc_id"), count(lit(1)).as("n_copies"))
    },

    // -------------------------------------------------------------- DEDUP-1b
    // C4-style LINE-level dedup: sub-document granularity. Every doc splits
    // into fixed 3-word segments (this corpus has no newlines; a real one
    // would split on '\n'), any segment occurring >= 3 times ACROSS THE
    // CORPUS is boilerplate and is removed from every doc, and docs are
    // reassembled from their surviving segments in original order (docs
    // left empty are dropped, as C4 does).
    //
    // Scale shape: the removal set (segments with corpus freq >= 3) is a
    // tiny fraction of distinct segments — build it with one map-side-
    // combinable groupBy, then LEFT-join the exploded segments against it
    // (deliberately un-hinted: AQE elects broadcast when the boilerplate
    // set is small, falls back to a shuffle join when it is not), and one
    // groupBy(doc_id) reassembles. No pairwise anything — this is the
    // dedup that stays linear at 100 TB. At that scale the join key would
    // be xxhash64(seg) to cut shuffle width; kept as the string here so
    // the oracle compares the identical grouping.
    QueryDef("d_lines",
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pos AS (
        |  SELECT doc_id, w, unnest(range(0, (len(w) + 2) // 3)) AS pos FROM tk),
        |segs AS (
        |  SELECT doc_id, pos, array_to_string(w[3*pos+1:3*pos+3], ' ') AS seg
        |  FROM pos),
        |bad AS (
        |  SELECT seg, COUNT(*) AS c FROM segs GROUP BY seg HAVING COUNT(*) >= 3)
        |SELECT doc_id,
        |  string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE c IS NULL) AS text,
        |  COUNT(*) FILTER (WHERE c IS NULL) AS n_kept,
        |  COUNT(*) FILTER (WHERE c IS NOT NULL) AS n_drop
        |FROM segs LEFT JOIN bad USING (seg)
        |GROUP BY doc_id
        |HAVING COUNT(*) FILTER (WHERE c IS NULL) > 0""".stripMargin) { (s, dir) =>
      val segs = docs(s, dir).select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, (size(tk) + 2) div 3 - 1),
          |  i -> concat_ws(' ', slice(tk, 3*i + 1, 3)))""".stripMargin))
        .as(Seq("pos", "seg")))
      val bad = segs.groupBy("seg").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
      segs.join(bad, Seq("seg"), "left")
        .groupBy("doc_id")
        .agg(
          concat_ws(" ", expr(
            """transform(array_sort(collect_list(
              |  CASE WHEN c IS NULL THEN struct(pos, seg) END)), x -> x.seg)""".stripMargin))
            .as("text"),
          count(when(col("c").isNull, lit(1))).as("n_kept"),
          count(when(col("c").isNotNull, lit(1))).as("n_drop"))
        .filter(col("n_kept") > 0)
    },

    // -------------------------------------------------------------- SKETCH-1
    // KMV (k-minimum-values) cardinality sketch: per-source distinct-shingle
    // estimate from only the k=64 smallest hash values — THE way to count
    // distincts at 100 TB, where exact per-group COUNT(DISTINCT) shuffles
    // every distinct value and a sketch shuffles 64 rows per group (and
    // merges associatively across partitions/days). Estimator:
    // (k-1) / frac(h_k) with frac from the hash's first 48 bits. All
    // integer until one final IEEE division, so both engines emit the
    // identical double; the rank filter compiles to WindowGroupLimit (a
    // bounded 64-row heap per group, never a full partition sort). The
    // exact count rides along from the same distinct frame so the estimate
    // is verifiable in-row (and spec-bounded to ±50%).
    QueryDef("a11_kmv", {
      val hex12 = (1 to 12).map { i =>
        val c = 1L << (4 * (12 - i))
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * $c"
      }.mkString("(", " + ", ")")
      s"""WITH sh AS (
         |  SELECT DISTINCT source, seg FROM (
         |    SELECT source, unnest($shinglesSql) AS seg FROM documents
         |    WHERE len(string_split(text, ' ')) >= 3)),
         |h AS (SELECT source, seg, md5(seg) AS h FROM sh),
         |r AS (SELECT source, h, seg,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, seg) AS rn FROM h),
         |n AS (SELECT source, COUNT(*) AS n_exact FROM h GROUP BY source),
         |k AS (SELECT source, MAX(rn) AS k_used,
         |    MAX(CASE WHEN rn = 64 THEN $hex12 END) AS kth
         |  FROM r WHERE rn <= 64 GROUP BY source)
         |SELECT k.source, n_exact, k_used,
         |  CASE WHEN k_used < 64 THEN CAST(n_exact AS DOUBLE)
         |       ELSE CAST(17732923532771328 AS DOUBLE) / kth END AS est_distinct
         |FROM k JOIN n ON k.source = n.source""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hex12 = (1 to 12).map { i =>
        val c = 1L << (4 * (12 - i))
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * ${c}L"
      }.mkString("(", " + ", ")")
      // persist: the sketch branch AND the exact-count verification branch
      // both consume the distinct frame (the production sketch has no
      // n_exact branch at all — it exists to make the estimate checkable)
      val sh = docs(s, dir).filter(size(col("tk")) >= 3)
        .select(col("source"), explode(shinglesExpr).as("seg")).distinct()
        .withColumn("h", md5(col("seg"))).persist()
      val n = sh.groupBy("source").agg(count(lit(1)).as("n_exact"))
      val k = sh
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy("h", "seg")))
        .filter(col("rn") <= 64)
        .groupBy("source").agg(
          max("rn").as("k_used"),
          max(when(col("rn") === 64, expr(hex12))).as("kth"))
      CacheScope.sealResult(
        k.join(n, "source").select(col("source"), col("n_exact"), col("k_used"),
          when(col("k_used") < 64, col("n_exact").cast("double"))
            .otherwise(lit(17732923532771328.0) / col("kth")).as("est_distinct")),
        sh)
    },

    // ------------------------------------------------------------- SKETCH-1b
    // KMV set operations: union / intersection / Jaccard estimates for
    // every source PAIR computed from the per-source sketches alone —
    // never from the data. This is the mergeability argument made
    // concrete: at 100 TB the per-source sketches are 64 rows each, so
    // all O(S^2) pairwise comparisons run over S*64 rows total (here
    // 20 sources -> 1,280 sketch rows feed 190 pair estimates; the
    // corpus is scanned exactly once, to build the sketches). Estimators
    // (Beyer et al.): merge two sketches, keep the k smallest; union =
    // (k-1)/frac(h_k) as in a11; Jaccard = fraction of the merged
    // sketch present in BOTH source sketches; intersection = J * U. A
    // merged sketch under k elements means both inputs were complete, so
    // the union is exact. All integer/hex until the final IEEE
    // divisions — hash-exact across engines.
    QueryDef("a16_kx", {
      val hex12 = (1 to 12).map { i =>
        val c = 1L << (4 * (12 - i))
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * $c"
      }.mkString("(", " + ", ")")
      s"""WITH sh AS (
         |  SELECT DISTINCT source, seg FROM (
         |    SELECT source, unnest($shinglesSql) AS seg FROM documents
         |    WHERE len(string_split(text, ' ')) >= 3)),
         |hh AS (SELECT source, md5(seg) AS h, seg FROM sh),
         |r AS (SELECT source, h,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, seg) AS rn FROM hh),
         |sk AS (SELECT source, h FROM r WHERE rn <= 64),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |p AS (SELECT a.source AS sa, b.source AS sb
         |      FROM srcs a JOIN srcs b ON a.source < b.source),
         |m0 AS (
         |  SELECT p.sa, p.sb, s.h,
         |    MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
         |    MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
         |  FROM p JOIN sk s ON s.source = p.sa OR s.source = p.sb
         |  GROUP BY p.sa, p.sb, s.h),
         |r2 AS (SELECT sa, sb, h, in_a, in_b,
         |    ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn FROM m0),
         |k2 AS (
         |  SELECT sa, sb, COUNT(*) AS k_used,
         |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |    MAX(CASE WHEN rn = 64 THEN $hex12 END) AS kth
         |  FROM r2 WHERE rn <= 64 GROUP BY sa, sb),
         |e AS (
         |  SELECT sa, sb, k_used, n_both,
         |    CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
         |         ELSE CAST(17732923532771328 AS DOUBLE) / kth END AS est_union
         |  FROM k2)
         |SELECT sa, sb, k_used, n_both, est_union,
         |  n_both / CAST(k_used AS DOUBLE) AS est_j,
         |  (n_both / CAST(k_used AS DOUBLE)) * est_union AS est_i
         |FROM e""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hex12 = (1 to 12).map { i =>
        val c = 1L << (4 * (12 - i))
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * ${c}L"
      }.mkString("(", " + ", ")")
      val sk = docs(s, dir).filter(size(col("tk")) >= 3)
        .select(col("source"), explode(shinglesExpr).as("seg")).distinct()
        .withColumn("h", md5(col("seg")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy("h", "seg")))
        .filter(col("rn") <= 64)
        .select(col("source"), col("h"))
        .persist()
      val srcs = sk.select(col("source")).distinct()
      val pairs = srcs.select(col("source").as("sa"))
        .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
      // per pair, each side's sketch rows with origin flags (two equi
      // joins on tiny frames instead of an OR-condition join)
      val rowsA = pairs.join(sk, col("source") === col("sa"))
        .select(col("sa"), col("sb"), col("h"), lit(1).as("ia"), lit(0).as("ib"))
      val rowsB = pairs.join(sk, col("source") === col("sb"))
        .select(col("sa"), col("sb"), col("h"), lit(0).as("ia"), lit(1).as("ib"))
      val merged = rowsA.unionAll(rowsB)
        .groupBy("sa", "sb", "h")
        .agg(max("ia").as("in_a"), max("ib").as("in_b"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("sa", "sb").orderBy("h")))
        .filter(col("rn") <= 64)
      val k2 = merged.groupBy("sa", "sb").agg(
        count(lit(1)).as("k_used"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1).otherwise(0)).as("n_both"),
        max(when(col("rn") === 64, expr(hex12))).as("kth"))
      CacheScope.sealResult(
        k2.withColumn("est_union",
            when(col("k_used") < 64, col("k_used").cast("double"))
              .otherwise(lit(17732923532771328.0) / col("kth")))
          .select(col("sa"), col("sb"), col("k_used"), col("n_both"), col("est_union"),
            (col("n_both") / col("k_used").cast("double")).as("est_j"),
            ((col("n_both") / col("k_used").cast("double")) * col("est_union")).as("est_i")),
        sk)
    },

    // -------------------------------------------------------------- SKETCH-2
    // Count-Min frequency sketch: word-frequency estimates from a fixed
    // d=2 × w=256 counter grid. The scale property: the groupBy key space
    // is 512 CELLS, so map-side partial aggregation collapses every
    // partition to ≤512 rows before the shuffle — corpus-size-independent
    // shuffle bytes, where a per-word count shuffles the whole vocabulary.
    // Verification joins the top-20 true words against the sketch (truth
    // exists only to check the estimate); est = min over rows, which can
    // only OVERcount (collisions add) — the spec pins est ≥ truth. All
    // integer → hash-exact.
    QueryDef("a13_cm", {
      def bucket(salt: Int) =
        s"""((instr('0123456789abcdef', substr(md5('$salt:' || w), 1, 1)) - 1) * 16
           | + instr('0123456789abcdef', substr(md5('$salt:' || w), 2, 1)) - 1)""".stripMargin
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |cm AS (
         |  SELECT j, CASE WHEN j = 1 THEN ${bucket(1)} ELSE ${bucket(2)} END AS b,
         |         COUNT(*) AS c
         |  FROM tok CROSS JOIN (VALUES (1), (2)) AS t(j) GROUP BY 1, 2),
         |truth AS (
         |  SELECT w, COUNT(*) AS true_cnt FROM tok GROUP BY w
         |  ORDER BY COUNT(*) DESC, w LIMIT 20)
         |SELECT w, true_cnt, LEAST(c1.c, c2.c) AS est_cnt,
         |  LEAST(c1.c, c2.c) - true_cnt AS overcount
         |FROM truth
         |JOIN cm c1 ON c1.j = 1 AND c1.b = ${bucket(1)}
         |JOIN cm c2 ON c2.j = 2 AND c2.b = ${bucket(2)}""".stripMargin
    }) { (s, dir) =>
      def bucketC(salt: Int): Column =
        (expr(s"instr('0123456789abcdef', substr(md5('$salt:' || w), 1, 1)) - 1") * 16) +
          expr(s"instr('0123456789abcdef', substr(md5('$salt:' || w), 2, 1)) - 1")
      // persist: the sketch AND the truth (verification-only) branch both
      // consume the token stream; the production sketch is the cm branch
      val tok = docs(s, dir).select(explode(col("tk")).as("w")).persist()
      val cm = tok
        .select(explode(array(
          struct(lit(1).as("j"), bucketC(1).as("b")),
          struct(lit(2).as("j"), bucketC(2).as("b")))).as("jb"))
        .select(col("jb.j").as("j"), col("jb.b").as("b"))
        .groupBy("j", "b").agg(count(lit(1)).as("c"))
        .persist() // ≤512 cells; both row-filters read it, build it once
      val truth = tok.groupBy("w").agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("w")).limit(20)
      val c1 = cm.filter(col("j") === 1).select(col("b").as("b1"), col("c").as("ec1"))
      val c2 = cm.filter(col("j") === 2).select(col("b").as("b2"), col("c").as("ec2"))
      CacheScope.sealResult(
        truth
          .join(c1, bucketC(1) === col("b1"))
          .join(c2, bucketC(2) === col("b2"))
          .select(col("w"), col("true_cnt"),
            least(col("ec1"), col("ec2")).as("est_cnt"),
            (least(col("ec1"), col("ec2")) - col("true_cnt")).as("overcount")),
        tok, cm)
    },

    // ------------------------------------------------------------- SKETCH-2b
    // Sketch-FILTERED exact heavy hitters — the two-pass pattern a13's
    // sketch exists to enable: pass 1 builds the 512-cell Count-Min grid
    // (corpus-size-independent shuffle), pass 2 re-scans tokens, keeps
    // only those whose CM estimate clears the n/32 threshold (a 512-row
    // broadcast lookup, map-side), and exact-counts the SURVIVORS only.
    // CM can only OVERcount, so the filter admits every true heavy
    // hitter — the final exact-count ≥ threshold cut makes the output
    // IDENTICAL to the naive full-vocabulary rollup (which is the
    // oracle), while the exact-count shuffle carries candidate tokens
    // instead of the whole vocabulary. That asymmetry is the 100 TB
    // story: a web-scale token stream has billions of distinct keys, of
    // which a few hundred clear any heavy-hitter threshold.
    QueryDef("a58_heavy_hitters",
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
        |SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM tok, n GROUP BY w, n.n
        |HAVING COUNT(*) > n // 32""".stripMargin) { (s, dir) =>
      def bucketC(salt: Int): Column =
        (expr(s"instr('0123456789abcdef', substr(md5('$salt:' || w), 1, 1)) - 1") * 16) +
          expr(s"instr('0123456789abcdef', substr(md5('$salt:' || w), 2, 1)) - 1")
      val tok = docs(s, dir).select(explode(col("tk")).as("w")).persist()
      val nDf = tok.agg(count(lit(1)).cast("long").as("n"))
      val cm = tok
        .select(explode(array(
          struct(lit(1).as("j"), bucketC(1).as("b")),
          struct(lit(2).as("j"), bucketC(2).as("b")))).as("jb"))
        .select(col("jb.j").as("j"), col("jb.b").as("b"))
        .groupBy("j", "b").agg(count(lit(1)).as("c"))
      val c1 = cm.filter(col("j") === 1).select(col("b").as("b1"), col("c").as("ec1"))
      val c2 = cm.filter(col("j") === 2).select(col("b").as("b2"), col("c").as("ec2"))
      val out = tok
        .join(broadcast(c1), bucketC(1) === col("b1"))
        .join(broadcast(c2), bucketC(2) === col("b2"))
        .crossJoin(broadcast(nDf))
        .filter(least(col("ec1"), col("ec2")) > expr("n div 32"))
        .groupBy("w", "n").agg(count(lit(1)).cast("long").as("cnt"))
        .filter(col("cnt") > expr("n div 32"))
        .select("w", "cnt")
      CacheScope.sealResult(out, tok)
    },

    // -------------------------------------------------------------- SKETCH-3
    // Quantile estimation by deterministic hash sampling: p50/p90/p99 of
    // the value distribution per event type from the ~1/4 of rows whose
    // md5(event_id) first nibble < 4 — reproducible at any parallelism
    // (the sample is a pure row predicate, no RNG, no global coordination),
    // then the EXACT positional quantile of the sample (ceil(q·n), a10's
    // selection form). At 100 TB only the sample is ever sorted; tightening
    // the threshold trades accuracy for cost. Integer ranks, one value
    // pick per quantile → hash-exact.
    QueryDef("a14_qs",
      """WITH s AS (
        |  SELECT event_type, value, event_id
        |  FROM events
        |  WHERE instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1 < 4),
        |r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM s)
        |SELECT event_type, MAX(n) AS n_sample,
        |  MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN value END) AS p50,
        |  MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN value END) AS p90,
        |  MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN value END) AS p99
        |FROM r GROUP BY event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val sample = Graft.table(s, dir, "events")
        .filter(expr(
          "instr('0123456789abcdef', substr(md5(cast(event_id AS string)), 1, 1)) - 1 < 4"))
        .select(col("event_type"), col("value"), col("event_id"))
      val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      val wAll = Window.partitionBy("event_type")
      sample
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("event_type").agg(
          max("n").as("n_sample"),
          max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("value"))).as("p50"),
          max(when(col("rn") === expr("(n * 90 + 99) div 100"), col("value"))).as("p90"),
          max(when(col("rn") === expr("(n * 99 + 99) div 100"), col("value"))).as("p99"))
    },

    // --------------------------------------------------------------- DEDUP-2
    // N-gram Jaccard near-dup: 3-gram shingle sets compared pairwise within a
    // blocking key (first token) — the self-join shuffles on the block key,
    // so the pair space is Σ block² not N². NOTE the first-token block key
    // has bounded cardinality (a parallelism ceiling on a large cluster) —
    // it demos the blocked-pairwise shape; the production-scale composition
    // is d_lsh_verified below (LSH candidates → Jaccard verify).
    QueryDef("d_ngram_jaccard",
      s"""WITH sh AS (
         |  SELECT doc_id, string_split(text,' ')[1] AS blk, $shinglesSql AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 3)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  len(list_intersect(a.sh, b.sh))
         |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh))
         |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.1""".stripMargin) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      // persist: both self-join sides consume the hashed-shingle rows —
      // the per-row shingle hash+sort would otherwise run twice
      val sh = docs(s, dir).filter(size(col("tk")) >= 3)
        .select(col("doc_id"), element_at(col("tk"), 1).as("blk"), hashedShinglesExpr.as("sh"))
        .persist()
      val a = sh.select(col("doc_id").as("a_id"), col("blk"), col("sh").as("a_sh"))
      val b = sh.select(col("doc_id").as("b_id"), col("blk").as("b_blk"), col("sh").as("b_sh"))
      // |A∩B| via the native sorted-merge expression; |A∪B| = |A|+|B|-|A∩B|
      // on already-distinct sets — the pair loop is the sf-scaling hot path.
      val inter = expr("sorted_intersect_count(a_sh, b_sh)")
      val jac = inter / (size(col("a_sh")) + size(col("b_sh")) - inter)
      CacheScope.sealResult(
        a.join(b, col("blk") === col("b_blk") && col("a_id") < col("b_id"))
          .withColumn("jaccard", jac)
          .filter(col("jaccard") >= 0.1)
          .select("a_id", "b_id", "jaccard"),
        sh)
    },

    // -------------------------------------------------------------- DEDUP-2b
    // Cross-source duplication matrix — the dataset-card stat a corpus mix
    // ships with: for every unordered source pair, how many near-dup pairs
    // cross it (and how many are outright dups at ≥0.5), so mix design
    // sees WHICH feeds copy from which before weighting them (two mirrors
    // of the same crawl must not both get full budget). Rides the exact
    // blk-blocked jaccard spine of d_ngram_jaccard, rolled up by the
    // LEAST/GREATEST-normalized source pair; aggregate outputs are counts
    // and a MAX (order-independent — never a cross-engine double SUM).
    QueryDef("d_source_overlap",
      s"""WITH sh AS (
         |  SELECT doc_id, source, string_split(text,' ')[1] AS blk, $shinglesSql AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |p AS (
         |  SELECT LEAST(a.source, b.source) AS source_a,
         |    GREATEST(a.source, b.source) AS source_b,
         |    len(list_intersect(a.sh, b.sh))
         |      / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh))
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.1)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_near,
         |  CAST(SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  MAX(jaccard) AS max_jaccard
         |FROM p GROUP BY source_a, source_b""".stripMargin) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      val sh = docs(s, dir).filter(size(col("tk")) >= 3)
        .select(col("doc_id"), col("source"),
          element_at(col("tk"), 1).as("blk"), hashedShinglesExpr.as("sh"))
        .persist()
      val a = sh.select(col("doc_id").as("a_id"), col("source").as("a_src"),
        col("blk"), col("sh").as("a_sh"))
      val b = sh.select(col("doc_id").as("b_id"), col("source").as("b_src"),
        col("blk").as("b_blk"), col("sh").as("b_sh"))
      val inter = expr("sorted_intersect_count(a_sh, b_sh)")
      val jac = inter / (size(col("a_sh")) + size(col("b_sh")) - inter)
      CacheScope.sealResult(
        a.join(b, col("blk") === col("b_blk") && col("a_id") < col("b_id"))
          .withColumn("jaccard", jac)
          .filter(col("jaccard") >= 0.1)
          .select(least(col("a_src"), col("b_src")).as("source_a"),
            greatest(col("a_src"), col("b_src")).as("source_b"), col("jaccard"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_near"),
            sum(when(col("jaccard") >= 0.5, 1).otherwise(0)).cast("long").as("n_dup"),
            max("jaccard").as("max_jaccard")),
        sh)
    },

    // --------------------------------------------------------------- DEDUP-3
    // MinHash + LSH: k=8 signature (min of md5 under 8 salted "permutations")
    // folded into 4 bands of 2; docs sharing any band bucket are candidate
    // pairs. This is the 100 TB dedup path: signatures are one explode +
    // groupBy, the candidate join shuffles on (band, hash) buckets only.
    QueryDef("d_minhash_lsh",
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |sig AS (SELECT doc_id, $sigSqlCols FROM ex GROUP BY doc_id),
         |bands AS (
         |  $bandsSqlUnion),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id FROM pairs""".stripMargin) { (s, dir) =>
      // Direct per-instance hashing: md5 is cheap enough that map-side
      // hashing beats a distinct+join-back rewrite (measured — the join
      // shuffle on string shingle keys costs more than the saved md5 calls).
      val sh = docs(s, dir).filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(shinglesExpr).as("s"))
      val (pairs, bands) = candidatePairs(minhashBands(sh))
      CacheScope.sealResult(pairs, bands)
    },

    // ------------------------------------------------------------- DEDUP-3b
    // The production dedup pipeline: MinHash-LSH candidate generation
    // (bucket keys have ~uniform high cardinality — shuffles scale out)
    // followed by exact Jaccard verification on just the candidate pairs.
    // This is how near-dedup runs at 100 TB: no bounded blocking key, no
    // N² pair space, and the expensive set comparison only on pairs the
    // signatures already voted for.
    QueryDef("d_lsh_verified",
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |sig AS (SELECT doc_id, $sigSqlCols FROM ex GROUP BY doc_id),
         |bands AS (
         |  $bandsSqlUnion),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT c.a_id, c.b_id,
         |  len(list_intersect(sa.sh, sb.sh))
         |    / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
         |FROM cand c
         |JOIN sh sa ON sa.doc_id = c.a_id
         |JOIN sh sb ON sb.doc_id = c.b_id
         |WHERE len(list_intersect(sa.sh, sb.sh))
         |    / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.1""".stripMargin) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      val base = docs(s, dir).filter(size(col("tk")) >= 3)
      val sh = base.select(col("doc_id"), explode(shinglesExpr).as("s"))
      val (cand, bands) = candidatePairs(minhashBands(sh))
      // verify on hashed sorted shingle sets via the native merge intersect
      val hsh = base.select(col("doc_id"), hashedShinglesExpr.as("hs"))
      val verified = cand
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      val inter = expr("sorted_intersect_count(a_hs, b_hs)")
      CacheScope.sealResult(
        verified
          .withColumn("jaccard", inter / (size(col("a_hs")) + size(col("b_hs")) - inter))
          .filter(col("jaccard") >= 0.1)
          .select("a_id", "b_id", "jaccard"),
        bands)
    },

    // ------------------------------------------------------------- DEDUP-3c
    // Cross-split leakage sweep: deterministic train/val/test assignment
    // (md5(doc_id) first-two-hex bucket — the t_stratified_sample trick, so
    // the split is reproducible at any parallelism with no global state) +
    // the MinHash-LSH candidate spine, keeping only verified near-dup pairs
    // that CROSS the train/eval boundary — the held-out docs a training run
    // has effectively memorized via their train-side twins. This is the
    // split-hygiene audit every train/val/test cut needs (t_contamination
    // covers external benchmarks; this covers the pipeline's own split).
    // Scale shape: the split is computed INLINE on the pair columns (a pure
    // function of doc_id — zero extra joins or shuffles over d_lsh_verified);
    // the eval side is ~20% of docs so the boundary filter prunes ~68% of
    // candidate pairs before the shingle-set verify join.
    QueryDef("d_split_leakage", {
      def splitSql(c: String) =
        s"""CASE WHEN (instr('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 1, 1)) - 1) * 16
           |     + (instr('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 2, 1)) - 1) < 204 THEN 'train'
           |     WHEN (instr('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 1, 1)) - 1) * 16
           |     + (instr('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 2, 1)) - 1) < 230 THEN 'val'
           |     ELSE 'test' END""".stripMargin
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |sig AS (SELECT doc_id, $sigSqlCols FROM ex GROUP BY doc_id),
         |bands AS (
         |  $bandsSqlUnion),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |xsplit AS (
         |  SELECT CASE WHEN a_split = 'train' THEN b_id ELSE a_id END AS eval_id,
         |         CASE WHEN a_split = 'train' THEN a_id ELSE b_id END AS train_id,
         |         CASE WHEN a_split = 'train' THEN b_split ELSE a_split END AS split
         |  FROM (SELECT a_id, b_id, ${splitSql("a_id")} AS a_split, ${splitSql("b_id")} AS b_split
         |        FROM cand)
         |  WHERE (a_split = 'train') <> (b_split = 'train')),
         |ver AS (
         |  SELECT x.eval_id, x.split, x.train_id,
         |    len(list_intersect(se.sh, st.sh))
         |      / len(list_distinct(list_concat(se.sh, st.sh))) AS jaccard
         |  FROM xsplit x
         |  JOIN sh se ON se.doc_id = x.eval_id
         |  JOIN sh st ON st.doc_id = x.train_id
         |  WHERE len(list_intersect(se.sh, st.sh))
         |      / len(list_distinct(list_concat(se.sh, st.sh))) >= 0.1)
         |SELECT eval_id, split, CAST(COUNT(*) AS BIGINT) AS n_train_dups,
         |  MAX(jaccard) AS max_jaccard
         |FROM ver GROUP BY eval_id, split""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      def splitOf(c: String) = {
        val b = (expr(s"instr('0123456789abcdef', substr(md5(cast($c AS string)), 1, 1)) - 1") * 16) +
          expr(s"instr('0123456789abcdef', substr(md5(cast($c AS string)), 2, 1)) - 1")
        when(b < 204, "train").when(b < 230, "val").otherwise("test")
      }
      val base = docs(s, dir).filter(size(col("tk")) >= 3)
      val sh = base.select(col("doc_id"), explode(shinglesExpr).as("s"))
      val (cand, bands) = candidatePairs(minhashBands(sh))
      val x = cand
        .withColumn("a_split", splitOf("a_id")).withColumn("b_split", splitOf("b_id"))
        .filter((col("a_split") === "train") =!= (col("b_split") === "train"))
        .select(
          when(col("a_split") === "train", col("b_id")).otherwise(col("a_id")).as("eval_id"),
          when(col("a_split") === "train", col("a_id")).otherwise(col("b_id")).as("train_id"),
          when(col("a_split") === "train", col("b_split")).otherwise(col("a_split")).as("split"))
      val hsh = base.select(col("doc_id"), hashedShinglesExpr.as("hs"))
      val verified = x
        .join(hsh.select(col("doc_id").as("eval_id"), col("hs").as("e_hs")), "eval_id")
        .join(hsh.select(col("doc_id").as("train_id"), col("hs").as("t_hs")), "train_id")
      val inter = expr("sorted_intersect_count(e_hs, t_hs)")
      CacheScope.sealResult(
        verified
          .withColumn("jaccard", inter / (size(col("e_hs")) + size(col("t_hs")) - inter))
          .filter(col("jaccard") >= 0.1)
          .groupBy("eval_id", "split")
          .agg(count(lit(1)).cast("long").as("n_train_dups"),
            max("jaccard").as("max_jaccard")),
        bands)
    },

    // --------------------------------------------------------------- DEDUP-4
    // SimHash: 16-bit signature — per distinct token take 16 bits of its md5,
    // sum ±1 votes per bit position over the doc, sign-pack into an int.
    // One explode + one groupBy; signature collisions = near-identical token
    // sets. Bits are decoded from md5 hex digits with pure int arithmetic
    // (instr on a hex alphabet), identical in both engines.
    QueryDef("d_simhash", {
      val voteSqls = (0 until 16).map { j =>
        val di = j / 4 + 1; val p = 1 << (3 - j % 4)
        s"SUM(CASE WHEN ((instr('0123456789abcdef', substr(hx, $di, 1)) - 1) // $p) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
      }
      val packSql = (0 until 16).map(j => s"CASE WHEN s$j >= 0 THEN ${1 << j} ELSE 0 END").mkString(" + ")
      s"""WITH ex AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
         |  FROM documents),
         |h AS (SELECT doc_id, md5(t) AS hx FROM ex),
         |votes AS (SELECT doc_id, ${voteSqls.mkString(", ")} FROM h GROUP BY doc_id),
         |sig AS (SELECT doc_id, $packSql AS simhash FROM votes)
         |SELECT doc_id, simhash, COUNT(*) OVER (PARTITION BY simhash) AS n_bucket
         |FROM sig""".stripMargin
    }) { (s, dir) =>
      val ex = docs(s, dir)
        .select(col("doc_id"), explode(array_distinct(col("tk"))).as("t"))
        .withColumn("hx", md5(col("t")))
      def vote(j: Int): Column = {
        val di = j / 4 + 1; val p = 1 << (3 - j % 4)
        sum(when(expr(s"((instr('0123456789abcdef', substring(hx, $di, 1)) - 1) div $p) % 2") === 1,
          lit(1)).otherwise(lit(-1))).as(s"s$j")
      }
      val votes = ex.groupBy("doc_id").agg(vote(0), (1 until 16).map(vote): _*)
      val pack = (0 until 16).map(j =>
        when(col(s"s$j") >= 0, lit(1 << j)).otherwise(lit(0))).reduce(_ + _)
      import org.apache.spark.sql.expressions.Window
      votes.select(col("doc_id"), pack.as("simhash"))
        .withColumn("n_bucket", count(lit(1)).over(Window.partitionBy("simhash")))
    },

    // ------------------------------------------------------------- DEDUP-3d
    // Containment near-dup (Broder's asymmetric metric): |A∩B| / min(|A|,|B|)
    // flags a document ENGULFED by another — the quote-a-whole-article case
    // symmetric Jaccard under-scores whenever the host is much larger
    // (inter/union shrinks with the host's size; inter/min does not). Same
    // LSH band candidates and native sorted-set intersection as
    // d_lsh_verified; the output names the contained side (fewer shingles,
    // min id on ties) so the curation step knows WHICH doc to drop. Both
    // metrics are reported — the (containment ≥ 0.8, jaccard ≪ 1) corner
    // is exactly the engulfing signature. Honest limit: MinHash bands
    // estimate JACCARD, so candidate recall for an engulfed pair decays
    // with the size ratio (P[min of the host's set lands in the contained
    // subset] = |A|/|B| per hash) — at extreme ratios the production
    // answer is d_substr's positional-fingerprint census, which finds
    // embedded spans regardless of host size.
    QueryDef("d_containment",
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |sig AS (SELECT doc_id, $sigSqlCols FROM ex GROUP BY doc_id),
         |bands AS (
         |  $bandsSqlUnion),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |ver AS (
         |  SELECT c.a_id, c.b_id,
         |    len(list_intersect(sa.sh, sb.sh)) AS inter,
         |    len(sa.sh) AS na, len(sb.sh) AS nb
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a_id
         |  JOIN sh sb ON sb.doc_id = c.b_id)
         |SELECT a_id, b_id,
         |  CASE WHEN na < nb OR (na = nb AND a_id < b_id) THEN a_id ELSE b_id END
         |    AS contained_id,
         |  CAST(inter AS DOUBLE) / LEAST(na, nb) AS containment,
         |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
         |FROM ver
         |WHERE CAST(inter AS DOUBLE) / LEAST(na, nb) >= 0.8""".stripMargin) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      val base = docs(s, dir).filter(size(col("tk")) >= 3)
      val sh = base.select(col("doc_id"), explode(shinglesExpr).as("s"))
      val (cand, bands) = candidatePairs(minhashBands(sh))
      val hsh = base.select(col("doc_id"), hashedShinglesExpr.as("hs"))
      val ver = cand
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
        .select(col("a_id"), col("b_id"),
          expr("sorted_intersect_count(a_hs, b_hs)").as("inter"),
          size(col("a_hs")).as("na"), size(col("b_hs")).as("nb"))
      CacheScope.sealResult(
        ver
          .withColumn("contained_id",
            when(col("na") < col("nb") ||
              (col("na") === col("nb") && col("a_id") < col("b_id")), col("a_id"))
              .otherwise(col("b_id")))
          .withColumn("containment",
            col("inter").cast("double") / least(col("na"), col("nb")))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .filter(col("containment") >= 0.8)
          .select("a_id", "b_id", "contained_id", "containment", "jaccard"),
        bands)
    },

    // -------------------------------------------------------------- DEDUP-4b
    // SimHash near-dup at Hamming distance ≤ 3 — the Manku et al. (WWW'07)
    // web-dedup scheme: a 32-bit signature split into 4 byte pieces; any
    // pair within Hamming 3 differs in at most 3 pieces, so it MUST agree
    // on at least one (pigeonhole) — candidates come from a piece-value
    // bucket join, never an all-pairs scan. Two scale moves on top:
    // (1) the pair space is over DISTINCT signatures, not docs — exact
    // collisions (the bulk of a template-heavy corpus) collapse into one
    // sig row before any join; (2) the output is the per-doc DROP LIST
    // (keeper = min doc id over own-sig docs ∪ verified neighbor sigs'
    // reps, a unique total order), not the O(cluster²) pair list. One-hop
    // keeper only — transitive closure is d_dup_clusters' job. At 100 TB
    // the signature widens to 64 bits / 8 pieces; the shape is unchanged.
    QueryDef("d_simhash_hamming", {
      val voteSqls = (0 until 32).map { j =>
        val di = j / 4 + 1; val p = 1 << (3 - j % 4)
        s"SUM(CASE WHEN ((instr('0123456789abcdef', substr(hx, $di, 1)) - 1) // $p) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
      }
      val packSql = (0 until 32).map(j =>
        s"CASE WHEN s$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END").mkString(" + ")
      s"""WITH ex AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
         |  FROM documents),
         |h AS (SELECT doc_id, md5(t) AS hx FROM ex),
         |votes AS (SELECT doc_id, ${voteSqls.mkString(", ")} FROM h GROUP BY doc_id),
         |sig AS (SELECT doc_id, $packSql AS simhash FROM votes),
         |sigs AS (SELECT simhash, MIN(doc_id) AS rep FROM sig GROUP BY simhash),
         |pieces AS (
         |  SELECT simhash, p, (simhash >> (8 * p)) & 255 AS pv
         |  FROM sigs, range(4) t(p)),
         |spairs AS (
         |  SELECT DISTINCT a.simhash AS s1, b.simhash AS s2
         |  FROM pieces a JOIN pieces b
         |    ON a.p = b.p AND a.pv = b.pv AND a.simhash <> b.simhash),
         |cands AS (
         |  SELECT simhash, rep AS krep, CAST(0 AS BIGINT) AS hamming FROM sigs
         |  UNION ALL
         |  SELECT p.s1 AS simhash, g.rep AS krep,
         |    CAST(bit_count(xor(p.s1, p.s2)) AS BIGINT) AS hamming
         |  FROM spairs p JOIN sigs g ON g.simhash = p.s2
         |  WHERE bit_count(xor(p.s1, p.s2)) <= 3),
         |best AS (SELECT simhash, krep, hamming FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY simhash ORDER BY krep) AS rn
         |  FROM cands) WHERE rn = 1)
         |SELECT d.doc_id, b.krep AS keeper_id, b.hamming
         |FROM sig d JOIN best b ON b.simhash = d.simhash
         |WHERE b.krep < d.doc_id""".stripMargin
    }) { (s, dir) =>
      val ex = docs(s, dir)
        .select(col("doc_id"), explode(array_distinct(col("tk"))).as("t"))
        .withColumn("hx", md5(col("t")))
      def vote(j: Int): Column = {
        val di = j / 4 + 1; val p = 1 << (3 - j % 4)
        sum(when(expr(s"((instr('0123456789abcdef', substring(hx, $di, 1)) - 1) div $p) % 2") === 1,
          lit(1)).otherwise(lit(-1))).as(s"s$j")
      }
      val votes = ex.groupBy("doc_id").agg(vote(0), (1 until 32).map(vote): _*)
      val pack = (0 until 32).map(j =>
        when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
      val sig = votes.select(col("doc_id"), pack.as("simhash")).persist()
      val sigs = sig.groupBy("simhash").agg(min("doc_id").as("rep")).persist()
      val pieces = sigs.select(col("simhash"), explode(expr("sequence(0, 3)")).as("p"))
        .withColumn("pv", expr("shiftright(simhash, 8 * p) & 255"))
      val spairs = pieces.select(col("simhash").as("s1"), col("p"), col("pv"))
        .join(pieces.select(col("simhash").as("s2"), col("p").as("p2"), col("pv").as("pv2")),
          col("p") === col("p2") && col("pv") === col("pv2") && col("s1") =!= col("s2"))
        .select("s1", "s2").distinct()
      val cands = sigs.select(col("simhash"), col("rep").as("krep"), lit(0L).as("hamming"))
        .unionAll(spairs
          .filter(expr("bit_count(s1 ^ s2)") <= 3)
          .join(sigs.select(col("simhash").as("s2"), col("rep").as("krep")), "s2")
          .select(col("s1").as("simhash"), col("krep"),
            expr("cast(bit_count(s1 ^ s2) AS bigint)").as("hamming")))
      import org.apache.spark.sql.expressions.Window
      val best = cands
        .withColumn("rn", row_number().over(
          Window.partitionBy("simhash").orderBy("krep")))
        .filter(col("rn") === 1).drop("rn")
      CacheScope.sealResult(
        sig.join(best, "simhash")
          .filter(col("krep") < col("doc_id"))
          .select(col("doc_id"), col("krep").as("keeper_id"), col("hamming")),
        sig, sigs)
    },

    // --------------------------------------------------------------- DEDUP-5
    // Embedding-cosine near-dup: label-blocked pair join over quantized
    // vectors; cosine = int dot / (sqrt·sqrt) — exact ints then three IEEE
    // ops, so parallelism cannot change the result.
    //
    // BOUNDED-BLOCK contract (the r16 full-registry sweep measured 0.71
    // at 100×, the N²/|labels| term of a fixture whose label has ~10
    // values): this operator is the EXACT within-block pair audit, and
    // its cost is Σ_blocks |block|² by definition — sound blocking of an
    // exact cosine threshold does not exist (any partition can separate
    // a ≥0.35 pair), so the scale knob is the BLOCK KEY, not the plan.
    // In production the key is a fine-grained bucket (an LSH code —
    // ann_lsh_bucket — or a shard id) with bounded occupancy, making the
    // pair space linear; when no bounded key exists, the centroid-blocked
    // RECALL-traded semantics are d_semantic_dedup / mm_embed_dup
    // (sweep exponents 0.38 / 0.37). The low-cardinality class label
    // here stands in to keep the oracle's pair list verifiable.
    //
    // ENFORCED (r17): a block-size census runs BEFORE the pair join.
    // Blocks over `spark.graft.dedup.blockCap` (default 1024) either
    // fail LOUDLY (`spark.graft.dedup.blockMode=fail`, the default — a
    // hot key degenerating to all-pairs is an operator error, not a
    // slow day) or, with blockMode=reroute, are LSH-sub-bucketed: each
    // oversized block's rows take ceil(log2(bsz/cap)) sign-projection
    // bits (≤16) as a refinement key, bounding EXPECTED occupancy at
    // cap while bounded blocks keep the empty subcode and therefore the
    // exact semantics bit for bit. Reroute trades recall exactly like
    // ann_lsh_bucket (pairs split across sub-buckets are missed) and is
    // spec-pinned as a subset of the exact pair list that stays
    // complete within every sub-bucket.
    QueryDef("d_embedding_dup",
      s"""WITH n AS (
         |  SELECT vec_id, label, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT)
         |    / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS cos_sim
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT)
         |    / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) >= 0.35""".stripMargin) { (s, dir) =>
      embeddingDupGuarded(s, dir,
        s.conf.get("spark.graft.dedup.blockCap", "1024").toLong,
        s.conf.get("spark.graft.dedup.blockMode", "fail"))
    },

    // -------------------------------------------------------------- DEDUP-5r
    // The REROUTE path of the bounded-block guard, oracle-checked (the
    // registered d_embedding_dup exercises the guarded-exact path — the
    // fixture's blocks sit under the default cap; this variant pins the
    // cap at 16 so the fixture's ~50-row blocks genuinely sub-bucket at
    // the correctness gate). The DuckDB oracle implements the identical
    // semantics — census, integer-threshold bit widths, sign-bit subcode,
    // within-(label, subcode) exact pairs — so the recall-traded form is
    // engine-parity-checked, not just spec-checked.
    QueryDef("d_embedding_dup_rerouted",
      s"""WITH n AS (
         |  SELECT vec_id, label, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |s AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS bsz FROM n GROUP BY 1),
         |c AS (
         |  SELECT n.*, ${(0 until 16).map(j => s"(CASE WHEN s.bsz > ${16L * (1L << j)} THEN 1 ELSE 0 END)").mkString(" + ")} AS bits,
         |    list_aggregate(list_transform(generate_series(0, 15),
         |      i -> CASE WHEN n.qv[1 + i * 4] >= 0 THEN '1' ELSE '0' END),
         |      'string_agg', '') AS code16
         |  FROM n JOIN s USING (label)),
         |k AS (SELECT vec_id, label, qv, nq, substr(code16, 1, bits) AS subcode FROM c)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT)
         |    / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS cos_sim
         |FROM k a JOIN k b ON a.label = b.label AND a.subcode = b.subcode
         |  AND a.vec_id < b.vec_id
         |WHERE CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT)
         |    / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) >= 0.35""".stripMargin) { (s, dir) =>
      embeddingDupGuarded(s, dir, cap = 16L, mode = "reroute")
    },

    // --------------------------------------------------------------- DEDUP-6
    // Near-dup CLUSTERING: the step after pair generation — connected
    // components over the LSH-verified pair graph turn pairwise matches
    // into dedup groups keyed by their canonical (minimum) doc id, which is
    // what a training-data pipeline actually deletes against (keep one per
    // group, not one per pair). Spark side: min-label propagation with
    // POINTER JUMPING — each round takes the min over (own label, neighbor
    // labels via one join + map-side-combinable min agg on the EDGE set,
    // label-of-own-label via a self-join on the tiny label table), so label
    // chains halve every round and convergence is O(log diameter) rounds
    // instead of O(diameter) — at 100 TB each saved round is a full
    // edge-set shuffle plus a driver scheduling round-trip. The driver only
    // counts changed labels per round, and lineage is truncated per round
    // so the final plan stays flat. Oracle: recursive-CTE transitive closure —
    // fine at oracle scale, unusable at 100 TB, which is the point of the
    // iterative formulation.
    QueryDef("d_dup_clusters",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |sig AS (SELECT doc_id, $sigSqlCols FROM ex GROUP BY doc_id),
         |bands AS (
         |  $bandsSqlUnion),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT c.a_id, c.b_id
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a_id
         |  JOIN sh sb ON sb.doc_id = c.b_id
         |  WHERE len(list_intersect(sa.sh, sb.sh))
         |      / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.1),
         |sym AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION SELECT b_id, a_id FROM edges),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
         |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |FROM reach GROUP BY src""".stripMargin) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      val base = docs(s, dir).filter(size(col("tk")) >= 3)
      val sh = base.select(col("doc_id"), explode(shinglesExpr).as("s"))
      val (cand, bands) = candidatePairs(minhashBands(sh))
      val hsh = base.select(col("doc_id"), hashedShinglesExpr.as("hs"))
      val inter = expr("sorted_intersect_count(a_hs, b_hs)")
      val edges = cand
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
        .filter(inter / (size(col("a_hs")) + size(col("b_hs")) - inter) >= 0.1)
        .select("a_id", "b_id")
      val adj = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
        .persist()
      // seed already folds the first neighbor-min round in: one groupBy on
      // the symmetric edge set instead of a distinct + a propagation round
      var labels = adj.groupBy(col("src")).agg(min("dst").as("m"))
        .select(col("src").as("doc_id"),
          least(col("src"), col("m")).as("cluster_id"))
        .localCheckpoint(true)
      // the eager seed checkpoint has materialized adj (and through it the
      // band rows): the signature-pass cache is dead from here on
      bands.unpersist()
      var changed = 1L
      while (changed > 0) {
        val nmin = adj.join(labels, adj("dst") === labels("doc_id"))
          .groupBy(col("src")).agg(min("cluster_id").as("nmin"))
        // pointer jump: labels(cluster_id) — every cluster_id is a doc id
        // inside the same component (symmetric adj), so the lookup hits
        val jump = labels.select(col("doc_id").as("jd"), col("cluster_id").as("jc"))
        val updated = labels
          .join(nmin, labels("doc_id") === nmin("src"), "left_outer")
          .join(jump, labels("cluster_id") === col("jd"), "left_outer")
          .select(col("doc_id"), col("cluster_id"),
            least(col("cluster_id"),
              least(coalesce(col("nmin"), col("cluster_id")),
                coalesce(col("jc"), col("cluster_id")))).as("next_id"))
          .localCheckpoint(true)
        // `updated` is checkpointed eagerly, so the PREVIOUS round's
        // checkpoint is dead — release its blocks now instead of stacking
        // one |V|-row checkpoint per round until the ContextCleaner runs
        CacheScope.freeCheckpoint(labels)
        changed = updated.filter(col("next_id") < col("cluster_id")).count()
        labels = updated.select(col("doc_id"), col("next_id").as("cluster_id"))
      }
      // re-home the converged labels into a result-sized CacheManager cache
      // and drop the final round's checkpoint: the escaping frame's storage
      // is then releasable by the caller's plain unpersist()
      val out = labels.persist()
      out.count()
      CacheScope.freeCheckpoint(labels)
      adj.unpersist()
      out
    },

    // -------------------------------------------------------------- DEDUP-6b
    // INCREMENTAL dedup: admit a new batch against an already-deduped
    // stored corpus — the O(delta) composition a GROWING corpus needs.
    // The batch's band rows probe the full band index; candidates verify
    // by exact Jaccard, and a batch doc is admitted iff it has NO verified
    // partner among stored docs or earlier batch docs. The last quintile
    // of doc_ids stands in for the arriving batch. This form re-signs the
    // whole corpus per run (self-contained demo); d_incremental_dedup_stored
    // below is the production form over the persisted signature index.
    QueryDef("d_incremental_dedup", incrementalDedupSql) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      val all = Graft.table(s, dir, "documents")
      // scalar watermark fetch — the same 1-row driver scalar as the
      // incremental load's MAX(block_number) (A1), not a data collect
      val cut = all.agg(max("doc_id")).head.getLong(0) * 4 / 5
      val base = docs(s, dir).filter(size(col("tk")) >= 3)
      val sh = base.select(col("doc_id"), explode(shinglesExpr).as("s"))
      // persist: both sides of the bucket join consume the band rows —
      // without it the full signature pass (the expensive explode+groupBy)
      // executes twice
      val bands = minhashBands(sh).persist()
      // asymmetric probe: ONLY the batch's bands drive the bucket join
      val bb = bands.filter(col("doc_id") >= cut)
        .select(col("doc_id").as("b_id"), col("band").as("band2"), col("bh").as("bh2"))
      val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
        .join(bb, col("band") === col("band2") && col("bh") === col("bh2") &&
          col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val hsh = base.select(col("doc_id"), hashedShinglesExpr.as("hs"))
      val inter = expr("sorted_intersect_count(a_hs, b_hs)")
      val ver = cand
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
        .withColumn("jaccard", inter / (size(col("a_hs")) + size(col("b_hs")) - inter))
        .filter(col("jaccard") >= 0.1)
      val agg = ver.groupBy(col("b_id").as("doc_id")).agg(
        count(when(col("a_id") < cut, lit(1))).as("n_dups_stored"),
        count(when(col("a_id") >= cut, lit(1))).as("n_dups_batch"))
      CacheScope.sealResult(
        all.filter(col("doc_id") >= cut).select(col("doc_id"))
          .join(agg.withColumnRenamed("doc_id", "agg_id"),
            col("doc_id") === col("agg_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_dups_stored"), lit(0L)).as("n_dups_stored"),
            coalesce(col("n_dups_batch"), lit(0L)).as("n_dups_batch"),
            col("agg_id").isNull.as("admitted")),
        bands)
    },

    // -------------------------------------------------------------- DEDUP-6c
    // INCREMENTAL dedup over the PERSISTED signature index
    // ([[graft.pipeline.DedupStore]]): the corpus's band rows and hashed
    // shingle sets are bucketed lake tables written once, so this run signs
    // ONLY the batch and bucket-joins it against the stored index — per-
    // batch work is O(delta), independent of corpus size (the demo above
    // re-signs everything). Same oracle: where signatures live cannot
    // change who is admitted. The store bootstraps on first use and is
    // reused by every later run — exactly a production admission cycle.
    QueryDef("d_incremental_dedup_stored", incrementalDedupSql) { (s, dir) =>
      val all = Graft.table(s, dir, "documents")
      val cut = all.agg(max("doc_id")).head.getLong(0) * 4 / 5
      // the cached store must key on the SOURCE DATA VERSION, not just the
      // path: a regenerated documents.parquet with the same shape would
      // otherwise admit against a stale index (Graft.dataFingerprint —
      // ordered (name, len, mtime) tuple hash, metadata-only, no data scan)
      val fp = Graft.dataFingerprint(s, s"$dir/documents.parquet")
      val root = graft.core.StoreRoots.rootFor("graft_dedup_store", "v2", dir,
        s"${cut}_$fp")
      graft.pipeline.DedupStore.ensureBuilt(s, root, all.filter(col("doc_id") < cut))
      graft.pipeline.DedupStore.admit(s, root, all.filter(col("doc_id") >= cut), cut)
    },

    // --------------------------------------------------------------- DEDUP-7
    // SemDeDup-style semantic dedup: embeddings are blocked by their
    // nearest-centroid IVF cell (~sqrt(N) sampled centroids, broadcast),
    // pairwise cosine runs ONLY within a cell, and the lowest vec_id of a
    // near-dup pair is the kept representative. This is the published
    // recipe for embedding-level corpus dedup at scale: the all-pairs
    // O(N^2) never happens — the equi-join on cell id shuffles on a key
    // whose cardinality grows with the corpus, and cells stay ~sqrt(N)
    // rows. Keep-decision is per-row (a vector is dropped iff SOME
    // smaller-id cell-mate sits above the threshold) — no connected
    // components needed for the keep-one-per-group semantics.
    QueryDef("d_semantic_dedup",
      s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |sp AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS stride FROM n),
         |cent AS (SELECT vec_id AS cid, qv AS cqv, nq AS cnq FROM n
         |         WHERE vec_id % (SELECT stride FROM sp) = 0),
         |assign AS (
         |  SELECT vec_id, cid, qv, nq FROM (
         |    SELECT v.vec_id, c.cid, v.qv, v.nq,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
         |    FROM n v CROSS JOIN cent c)
         |  WHERE rn = 1),
         |dups AS (
         |  SELECT DISTINCT b.vec_id AS dup_id
         |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE CAST(CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) >= 0.3)
         |SELECT s.vec_id, s.cid AS cell_id, d.dup_id IS NULL AS is_kept
         |FROM assign s LEFT JOIN dups d ON s.vec_id = d.dup_id""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select("vec_id", "qv", "nq")
      // row count from parquet footer metadata, not a count() scan job —
      // same stride the hierarchical variant and SimilarityQueries use
      val stride = SimilarityQueries.centroidStride(
        Graft.parquetRowCount(s, s"$dir/embeddings.parquet"))
      // the single-sourced flat spine (QueryDef.CentroidBlockDedup) —
      // mm_embed_dup rides the identical machinery over media vectors
      CentroidBlockDedup(n, "vec_id", stride, tau = 0.3)
    },

    // -------------------------------------------------------------- DEDUP-7b
    // HIERARCHICAL semantic dedup — the extreme-N form of DEDUP-7. The flat
    // form broadcasts all ~sqrt(N) centroids to every task, which stops
    // fitting at extreme corpus sizes (10^12 vectors -> 10^6 centroids x
    // dim floats per executor). Two levels bound it: only the ~N^(1/4)
    // COARSE centroids broadcast (10^12 -> ~10^3 rows); the sqrt(N) FINE
    // centroids are grouped by their own nearest coarse cell and reach the
    // vectors through an EQUI-JOIN on coarse_id — a shuffle whose key
    // cardinality grows with the corpus, never a broadcast. Assignment =
    // nearest coarse, then nearest fine within that coarse group; the
    // within-cell dedup tail is identical to DEDUP-7. All math stays exact
    // integral dot products + one IEEE division, so the two-level cell ids
    // and keep flags hash-match DuckDB exactly.
    QueryDef("d_semantic_dedup_hier",
      s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |sp AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS s1,
         |              COUNT(*) AS n_all FROM n),
         |sp2 AS (SELECT s1, s1 * GREATEST(1, CAST(floor(sqrt(
         |          CAST((n_all + s1 - 1) // s1 AS DOUBLE))) AS BIGINT)) AS s2 FROM sp),
         |fine AS (SELECT vec_id AS fid, qv AS fqv, nq AS fnq FROM n
         |         WHERE vec_id % (SELECT s1 FROM sp2) = 0),
         |coarse AS (SELECT vec_id AS ccid, qv AS cqv, nq AS cnq FROM n
         |           WHERE vec_id % (SELECT s2 FROM sp2) = 0),
         |f2c AS (
         |  SELECT fid, ccid, fqv, fnq FROM (
         |    SELECT f.fid, c.ccid, f.fqv, f.fnq,
         |      ROW_NUMBER() OVER (PARTITION BY f.fid ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(f.fqv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(f.fnq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.ccid) AS rn
         |    FROM fine f CROSS JOIN coarse c)
         |  WHERE rn = 1),
         |v2c AS (
         |  SELECT vec_id, ccid, qv, nq FROM (
         |    SELECT v.vec_id, c.ccid, v.qv, v.nq,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.ccid) AS rn
         |    FROM n v CROSS JOIN coarse c)
         |  WHERE rn = 1),
         |assign AS (
         |  SELECT vec_id, fid AS cid, qv, nq FROM (
         |    SELECT v.vec_id, f.fid, v.qv, v.nq,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, f.fqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(f.fnq AS DOUBLE))) DESC, f.fid) AS rn
         |    FROM v2c v JOIN f2c f ON v.ccid = f.ccid)
         |  WHERE rn = 1),
         |dups AS (
         |  SELECT DISTINCT b.vec_id AS dup_id
         |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE CAST(CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) >= 0.3)
         |SELECT s.vec_id, s.cid AS cell_id, d.dup_id IS NULL AS is_kept
         |FROM assign s LEFT JOIN dups d ON s.vec_id = d.dup_id""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select("vec_id", "qv", "nq")
      // |N| from parquet footer metadata — stride sizing costs no scan
      val nAll = Graft.parquetRowCount(s, s"$dir/embeddings.parquet")
      val s1 = SimilarityQueries.centroidStride(nAll)
      val nFine = (nAll + s1 - 1) / s1
      val s2 = s1 * math.max(1L, math.floor(math.sqrt(nFine.toDouble)).toLong)
      val fine = n.filter(pmod(col("vec_id"), lit(s1)) === 0)
        .select(col("vec_id").as("fid"), col("qv").as("f_qv"), col("nq").as("f_nq"))
      val coarse = n.filter(pmod(col("vec_id"), lit(s2)) === 0)
        .select(col("vec_id").as("ccid"), col("qv").as("c_qv"), col("nq").as("c_nq"))
      def cos(aq: String, an: String, bq: String, bn: String) =
        qdot(aq, bq).cast("double") /
          (sqrt(col(an).cast("double")) * sqrt(col(bn).cast("double")))
      val W = org.apache.spark.sql.expressions.Window
      // duplicate-vector safety: ties in cosine break on the centroid id
      // in EVERY assignment, so a vector and the fine centroids it could
      // reach always agree on which of two identical coarse cells wins
      val f2c = fine.crossJoin(broadcast(coarse))
        .withColumn("c_cos", cos("f_qv", "f_nq", "c_qv", "c_nq"))
        .withColumn("rn", row_number().over(
          W.partitionBy("fid").orderBy(col("c_cos").desc, col("ccid"))))
        .filter(col("rn") === 1)
        .select(col("fid"), col("ccid").as("f_ccid"), col("f_qv"), col("f_nq"))
      // ONLY the N^(1/4) coarse table broadcasts
      val v2c = n.crossJoin(broadcast(coarse))
        .withColumn("c_cos", cos("qv", "nq", "c_qv", "c_nq"))
        .withColumn("rn", row_number().over(
          W.partitionBy("vec_id").orderBy(col("c_cos").desc, col("ccid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("ccid"), col("qv"), col("nq"))
      // the sqrt(N) fine table arrives via an equi-join on the coarse cell
      // — deliberately NOT hinted broadcast: at extreme N it can't be, and
      // AQE still elects broadcast whenever it genuinely fits
      val assign = v2c.join(f2c, col("ccid") === col("f_ccid"))
        .withColumn("f_cos", cos("qv", "nq", "f_qv", "f_nq"))
        .withColumn("rn", row_number().over(
          W.partitionBy("vec_id").orderBy(col("f_cos").desc, col("fid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("fid").as("cid"), col("qv"), col("nq"))
        .persist()
      val a = assign.select(col("vec_id").as("a_id"), col("cid"),
        col("qv").as("a_qv"), col("nq").as("a_nq"))
      val b = assign.select(col("vec_id").as("b_id"), col("cid").as("b_cid"),
        col("qv").as("b_qv"), col("nq").as("b_nq"))
      val pcos = qdot("a_qv", "b_qv").cast("double") /
        (sqrt(col("a_nq").cast("double")) * sqrt(col("b_nq").cast("double")))
      val dups = a.join(b, col("cid") === col("b_cid") && col("a_id") < col("b_id"))
        .filter(pcos >= 0.3)
        .select(col("b_id").as("dup_id")).distinct()
      CacheScope.sealResult(
        assign.join(dups, assign("vec_id") === dups("dup_id"), "left_outer")
          .select(col("vec_id"), col("cid").as("cell_id"),
            col("dup_id").isNull.as("is_kept")),
        assign)
    },

    // --------------------------------------------------------------- DEDUP-8
    // The COMPOSED curation funnel (pipeline/Curation.curate) under the
    // oracle gate: quality rules → exact dedup → LSH-verified near-dup →
    // per-source cap, with the dataset-card drop accounting as output. The
    // oracle recomputes all stages over the same corpus, so the stage
    // ORDER and hand-offs — not just each operator — are hash-checked.
    QueryDef("curation_funnel",
      s"""WITH base AS (
         |  SELECT doc_id, text, source, string_split(text, ' ') AS tk FROM documents),
         |judged AS (
         |  SELECT *, CASE
         |    WHEN len(tk) < 20 THEN 'too_short'
         |    WHEN length(text) / len(tk) > 5.8 THEN 'tokens_too_long'
         |    WHEN len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is','it','for','on')))
         |         / len(tk) > 0.15 THEN 'stopword_soup'
         |    ELSE 'pass' END AS verdict
         |  FROM base),
         |q AS (SELECT * FROM judged WHERE verdict = 'pass'),
         |dropq AS (SELECT doc_id, 'quality' AS stage, verdict AS reason
         |          FROM judged WHERE verdict <> 'pass'),
         |keyed AS (SELECT *, md5(text) AS ck FROM q),
         |keeper AS (SELECT ck, MIN(doc_id) AS keep_id FROM keyed GROUP BY ck),
         |exact AS (SELECT k.doc_id, k.text, k.source, k.tk, kp.keep_id
         |          FROM keyed k JOIN keeper kp ON k.ck = kp.ck),
         |ae AS (SELECT doc_id, text, source, tk FROM exact WHERE doc_id = keep_id),
         |dropx AS (SELECT doc_id, 'exact_dedup' AS stage, 'duplicate' AS reason
         |          FROM exact WHERE doc_id <> keep_id),
         |sh AS (SELECT doc_id, $shinglesSql AS sh
         |       FROM (SELECT doc_id, text FROM ae) WHERE len(string_split(text,' ')) >= 3),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |sig AS (SELECT doc_id, $sigSqlCols FROM ex GROUP BY doc_id),
         |bands AS (
         |  $bandsSqlUnion),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |ver AS (
         |  SELECT DISTINCT c.b_id AS doc_id
         |  FROM cand c JOIN sh sa ON sa.doc_id = c.a_id JOIN sh sb ON sb.doc_id = c.b_id
         |  WHERE len(list_intersect(sa.sh, sb.sh))
         |      / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5),
         |an AS (SELECT ae.* FROM ae LEFT JOIN ver ON ae.doc_id = ver.doc_id
         |       WHERE ver.doc_id IS NULL),
         |dropn AS (SELECT doc_id, 'near_dedup' AS stage, 'near_duplicate' AS reason FROM ver),
         |bench AS (
         |  SELECT DISTINCT unnest(sh) AS s FROM (
         |    SELECT doc_id, $shinglesSql AS sh
         |    FROM (SELECT doc_id, text FROM documents WHERE doc_id < 25)
         |    WHERE len(string_split(text, ' ')) >= 3)),
         |cont AS (
         |  SELECT e.doc_id FROM (
         |    SELECT a.doc_id, unnest(s.sh) AS s
         |    FROM an a JOIN sh s ON s.doc_id = a.doc_id) e
         |  JOIN bench b ON e.s = b.s
         |  GROUP BY e.doc_id HAVING COUNT(DISTINCT e.s) >= 3),
         |ad AS (SELECT an.* FROM an LEFT JOIN cont ON an.doc_id = cont.doc_id
         |       WHERE cont.doc_id IS NULL),
         |dropt AS (SELECT doc_id, 'contamination' AS stage,
         |                 'benchmark_overlap' AS reason FROM cont),
         |ranked AS (
         |  SELECT doc_id, source,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY length(text) DESC, doc_id) AS rn
         |  FROM ad),
         |ac AS (SELECT doc_id FROM ranked WHERE rn <= 15),
         |dropc AS (SELECT doc_id, 'domain_cap' AS stage, 'over_cap' AS reason
         |          FROM ranked WHERE rn > 15),
         |dropped AS (
         |  SELECT * FROM dropq UNION ALL SELECT * FROM dropx
         |  UNION ALL SELECT * FROM dropn UNION ALL SELECT * FROM dropt
         |  UNION ALL SELECT * FROM dropc)
         |SELECT stage, reason, COUNT(*) AS n_docs FROM dropped GROUP BY stage, reason
         |UNION ALL
         |SELECT 'kept' AS stage, 'kept' AS reason, COUNT(*) AS n_docs FROM ac""".stripMargin) { (s, dir) =>
      val d = Graft.table(s, dir, "documents")
      val r = graft.pipeline.Curation
        .curate(d, maxPerSource = 15,
          benchmark = Some(d.filter(col("doc_id") < 25)))
      val out = CacheScope.sealResult(r.report)
      r.release()
      out
    },

    // -------------------------------------------------------------- DEDUP-13
    // EXACT SUBSTRING dedup (the Lee et al. 2022 "Deduplicating Training
    // Data Makes Language Models Better" operator, word-shingle form): a
    // span of >= k consecutive words that occurs more than once ANYWHERE in
    // the corpus is a duplicated span, and overlapping/adjacent duplicated
    // shingle positions merge into maximal spans — the statistic the paper's
    // suffix-array pass computes, re-expressed relationally:
    //   1. every k-word shingle WITH ITS POSITION (posexplode — map-side);
    //   2. global occurrence count >= 2 marks duplicated shingles (one
    //      count shuffle on the shingle, map-side partial agg, then a
    //      LEFT SEMI probe back — never materializes pair space);
    //   3. per-doc merged-interval islands: a new span starts when the gap
    //      to the previous duplicated position >= k (spans [p, p+k-1] and
    //      [q, q+k-1] overlap iff q - p < k), via lag + running sum over
    //      ONE doc_id window shuffle;
    //   4. per-island MAX(pos)-MIN(pos)+k = merged span length in words.
    // All outputs integral -> hash-exact. At 100 TB the shingle table is
    // O(total tokens) rows, so the census/probe key is the xxhash64
    // FINGERPRINT of the shingle, not its text — the shingle never reaches
    // the output, and a 64-bit collision over a ~10^7-shingle corpus is
    // ~10^-5-probable (the same argument as hashedShinglesExpr above);
    // shuffle bytes drop ~6x vs shipping ~50-char shingle strings. The
    // exploded frame feeds both the duplicate census and the probe, so it
    // is persisted once (same multi-consumer idiom as d_lsh_verified).
    QueryDef("d_substr",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |flat AS (
        |  SELECT doc_id, n_tokens, u.pos AS pos, u.sgl AS sgl FROM (
        |    SELECT doc_id, len(tk) AS n_tokens,
        |      unnest(list_transform(range(0, greatest(len(tk) - 7, 0)),
        |        i -> struct_pack(pos := i, sgl := array_to_string(tk[i+1:i+8], ' ')))) AS u
        |    FROM t)),
        |dup AS (SELECT sgl FROM flat GROUP BY sgl HAVING COUNT(*) >= 2),
        |dpos AS (SELECT doc_id, n_tokens, pos FROM flat JOIN dup USING (sgl)),
        |isl AS (
        |  SELECT doc_id, n_tokens, pos,
        |    SUM(CASE WHEN prev IS NULL OR pos - prev >= 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, n_tokens, pos,
        |          LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM dpos)),
        |spans AS (
        |  SELECT doc_id, n_tokens, island,
        |    MAX(pos) - MIN(pos) + 8 AS span_words, COUNT(*) AS n_positions
        |  FROM isl GROUP BY doc_id, n_tokens, island)
        |SELECT doc_id, n_tokens,
        |  CAST(SUM(n_positions) AS BIGINT) AS n_dup_positions,
        |  CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
        |  CAST(SUM(span_words) AS BIGINT) AS dup_span_words
        |FROM spans GROUP BY doc_id, n_tokens""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val k = 8
      val flat = docs(s, dir)
        .select(col("doc_id"), size(col("tk")).as("n_tokens"), col("tk"))
        .filter(col("n_tokens") >= k)
        .select(col("doc_id"), col("n_tokens"),
          posexplode(expr(
            s"transform(sequence(0, size(tk) - $k), i -> xxhash64(concat_ws(' ', slice(tk, i + 1, $k))))")))
        .withColumnRenamed("col", "sgl")
        .persist()
      val dup = flat.groupBy("sgl").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("sgl")
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      val spans = flat.join(dup, Seq("sgl"), "left_semi")
        .select("doc_id", "n_tokens", "pos")
        .withColumn("prev", lag("pos", 1).over(byPos))
        .withColumn("island",
          sum(when(col("prev").isNull || col("pos") - col("prev") >= k, 1).otherwise(0))
            .over(byPos))
        .groupBy("doc_id", "n_tokens", "island")
        .agg((max("pos") - min("pos") + lit(k)).as("span_words"),
          count(lit(1)).as("n_positions"))
      CacheScope.sealResult(
        spans.groupBy("doc_id", "n_tokens")
          .agg(
            sum("n_positions").cast("long").as("n_dup_positions"),
            count(lit(1)).cast("long").as("n_dup_spans"),
            sum("span_words").cast("long").as("dup_span_words")),
        flat)
    },

    // ---------------------------------------------------------------- DUP-14
    // Prefix-duplicate clustering — the crawl-corpus screen for shared
    // boilerplate HEADS (mirror pages, templated intros, licence
    // preambles all share their first tokens while the tails diverge, so
    // whole-document hashing misses them). The key is the exact first-5-
    // token prefix; clusters keep their MIN doc_id as the canonical
    // survivor — the d_exact_dedup keep rule, applied to a prefix key.
    // One key shuffle on the prefix; at 100 TB the prefix string is a
    // fixed small projection of each document (the scan never carries
    // full text past the substring), and the join back is key-to-key.
    QueryDef("d_prefix_cluster",
      """WITH pref AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS prefix
        |  FROM documents),
        |cl AS (SELECT prefix, MIN(doc_id) AS cluster_id,
        |         CAST(COUNT(*) AS BIGINT) AS cluster_size
        |       FROM pref GROUP BY prefix HAVING COUNT(*) >= 2)
        |SELECT p.doc_id, cl.cluster_id, cl.cluster_size,
        |  p.doc_id = cl.cluster_id AS is_kept
        |FROM pref p JOIN cl ON cl.prefix = p.prefix""".stripMargin) { (s, dir) =>
      val pref = Graft.table(s, dir, "documents")
        .select(col("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("prefix"))
        .persist() // feeds the cluster rollup AND the membership join
      val cl = pref.groupBy("prefix")
        .agg(min("doc_id").as("cluster_id"), count(lit(1)).cast("long").as("cluster_size"))
        .filter(col("cluster_size") >= 2)
      CacheScope.sealResult(
        pref.join(cl, "prefix")
          .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
            (col("doc_id") === col("cluster_id")).as("is_kept")),
        pref)
    },

    // -------------------------------------------------------------- DEDUP-13
    // Typo-pair mining via SymSpell deletion-key blocking: vocabulary
    // tokens within edit distance 1 — the spell-normalization primitive a
    // token-level dedup/cleanup pass keys on. The blocking is LOSSLESS
    // for ED ≤ 1 (a substitution pair shares the delete-at-i variant; an
    // insert/delete pair has the short word AMONG the long word's
    // deletions; identity covers ED 0), so the |V|² all-pairs scan never
    // happens: |V|·(L+1) deletion keys, one equi-join, exact levenshtein
    // verify on candidates only — vocabulary-bounded at any corpus size,
    // the same census→block→verify shape as the MinHash family. The
    // fixture vocabulary is typo-free (31 machine words), so each doc
    // first injects ONE deterministic mutant of its leading token
    // ('x' + tail — the t_pii_scrub injection discipline: the corpus
    // carries no positives, the operator under test must find the
    // injected ones). Candidate false positives (two deletions meeting at
    // the same string with ED 2, e.g. ab↔ba) are killed by the verify.
    QueryDef("d_typo_pairs",
      """WITH w AS (
        |  SELECT DISTINCT t.t AS w
        |  FROM documents, unnest(string_split(text, ' ')) AS t(t)),
        |m AS (
        |  SELECT DISTINCT 'x' || substr(string_split(text, ' ')[1], 2) AS w
        |  FROM documents WHERE length(string_split(text, ' ')[1]) >= 3),
        |v AS (SELECT w FROM w UNION SELECT w FROM m),
        |k AS (
        |  SELECT w, unnest(list_prepend(w,
        |    list_transform(generate_series(1, length(w)),
        |      i -> substr(w, 1, i - 1) || substr(w, i + 1)))) AS key
        |  FROM v),
        |cand AS (
        |  SELECT DISTINCT a.w AS w_a, b.w AS w_b
        |  FROM k a JOIN k b ON a.key = b.key AND a.w < b.w)
        |SELECT w_a, w_b, CAST(levenshtein(w_a, w_b) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(w_a, w_b) <= 1""".stripMargin) { (s, dir) =>
      val toks = Graft.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w")).distinct()
      val mut = Graft.table(s, dir, "documents")
        .select(element_at(split(col("text"), " "), 1).as("f"))
        .filter(length(col("f")) >= 3)
        .select(concat(lit("x"), expr("substring(f, 2, length(f))")).as("w"))
        .distinct()
      val v = toks.unionByName(mut).distinct()
      val k = v.select(col("w"), explode(expr(
        """concat(array(w), transform(sequence(1, length(w)),
          |  i -> concat(substring(w, 1, i - 1),
          |              substring(w, i + 1, length(w)))))""".stripMargin))
        .as("key"))
      val cand = k.select(col("w").as("w_a"), col("key"))
        .join(k.select(col("w").as("w_b"), col("key").as("key2")),
          col("key") === col("key2") && col("w_a") < col("w_b"))
        .select("w_a", "w_b").distinct()
      cand.withColumn("dist", levenshtein(col("w_a"), col("w_b")).cast("long"))
        .filter(col("dist") <= 1)
    },

    // -------------------------------------------------------------- DEDUP-14
    // Typo CORRECTION — the rollup on top of d_typo_pairs' candidate
    // machinery that a token-normalization pass actually applies: each
    // out-of-vocabulary mutant maps to its highest-corpus-frequency ED≤1
    // vocabulary neighbor (tie → lexicographically smallest, both engines
    // agree). Same lossless deletion-key blocking, but ASYMMETRIC: mutant
    // keys probe vocabulary keys only, so the join is |typos|-sided — at
    // 100 TB the vocabulary key table is built once per batch and the
    // probe side is the (tiny) OOV set.
    QueryDef("d_typo_correct",
      """WITH tf AS (
        |  SELECT t.t AS w, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents, unnest(string_split(text, ' ')) AS t(t) GROUP BY 1),
        |m AS (
        |  SELECT 'x' || substr(string_split(text, ' ')[1], 2) AS typo,
        |    CAST(COUNT(*) AS BIGINT) AS n_injected
        |  FROM documents WHERE length(string_split(text, ' ')[1]) >= 3
        |  GROUP BY 1),
        |km AS (
        |  SELECT typo, unnest(list_prepend(typo,
        |    list_transform(generate_series(1, length(typo)),
        |      i -> substr(typo, 1, i - 1) || substr(typo, i + 1)))) AS key
        |  FROM m),
        |kv AS (
        |  SELECT w, n, unnest(list_prepend(w,
        |    list_transform(generate_series(1, length(w)),
        |      i -> substr(w, 1, i - 1) || substr(w, i + 1)))) AS key
        |  FROM tf),
        |ver AS (
        |  SELECT DISTINCT km.typo, kv.w, kv.n
        |  FROM km JOIN kv ON km.key = kv.key
        |  WHERE levenshtein(km.typo, kv.w) <= 1),
        |best AS (
        |  SELECT typo, w AS correction, n AS corr_freq,
        |    ROW_NUMBER() OVER (PARTITION BY typo ORDER BY n DESC, w) AS rn
        |  FROM ver)
        |SELECT m.typo, b.correction, m.n_injected, b.corr_freq
        |FROM m JOIN best b ON b.typo = m.typo AND b.rn = 1""".stripMargin) { (s, dir) =>
      def delKeys(c: String) = explode(expr(
        s"""concat(array($c), transform(sequence(1, length($c)),
           |  i -> concat(substring($c, 1, i - 1),
           |              substring($c, i + 1, length($c)))))""".stripMargin))
      val tf = Graft.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
      val m = Graft.table(s, dir, "documents")
        .select(element_at(split(col("text"), " "), 1).as("f"))
        .filter(length(col("f")) >= 3)
        .select(concat(lit("x"), expr("substring(f, 2, length(f))")).as("typo"))
        .groupBy("typo").agg(count(lit(1)).cast("long").as("n_injected"))
      val km = m.select(col("typo"), delKeys("typo").as("key"))
      val kv = tf.select(col("w"), col("n"), delKeys("w").as("key"))
      val ver = km.join(kv, "key")
        .filter(levenshtein(col("typo"), col("w")) <= 1)
        .select("typo", "w", "n").distinct()
      val wBest = org.apache.spark.sql.expressions.Window
        .partitionBy("typo").orderBy(col("n").desc, col("w"))
      val best = ver.withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("typo"), col("w").as("correction"), col("n").as("corr_freq"))
      m.join(best, "typo")
        .select("typo", "correction", "n_injected", "corr_freq")
    }
  )
}
