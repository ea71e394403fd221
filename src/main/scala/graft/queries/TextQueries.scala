package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline:
  * token counting, language-ID heuristics, quality scoring, and document
  * fingerprinting over the `documents` table.
  *
  * All are narrow per-row transforms (no shuffle except the final dup-count
  * window/groupBy) — at 100 TB they run map-side inside whole-stage codegen
  * with only `doc_id`/`text` read from parquet (column pruning).
  *
  * Float parity: ratios are int/int divisions evaluated as one IEEE double
  * division in both engines; weighted scores use an identical expression
  * tree so both engines execute the same sequence of IEEE ops.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "documents").withColumn("tk", split(col("text"), " "))

  /** English stopword list for the n-gram/stopword language heuristic. */
  private val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
  private val stopsSqlList = stops.map(w => s"'$w'").mkString(", ")

  /** The BM25 scoring SQL (3 literal probe terms, fixed association
    * t1 + (t2 + t3)) — shared by t_bm25 (full-corpus scan) and
    * t_bm25s (stored inverted-index probe), which must agree. */
  private val bm25Sql: String =
    """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(len(tk)) AS BIGINT) AS total_len,
        |    CAST(SUM(CASE WHEN len(list_filter(tk, x -> x = 'join')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(SUM(CASE WHEN len(list_filter(tk, x -> x = 'vector')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
        |    CAST(SUM(CASE WHEN len(list_filter(tk, x -> x = 'stream')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
        |  FROM t)
        |SELECT doc_id,
        |  tf1 * 2.2::DOUBLE / (tf1 + 1.2::DOUBLE * bden) * ((n_docs - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE))
        |  + (tf2 * 2.2::DOUBLE / (tf2 + 1.2::DOUBLE * bden) * ((n_docs - df2 + 0.5::DOUBLE) / (df2 + 0.5::DOUBLE))
        |  + tf3 * 2.2::DOUBLE / (tf3 + 1.2::DOUBLE * bden) * ((n_docs - df3 + 0.5::DOUBLE) / (df3 + 0.5::DOUBLE))) AS bm25
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(tk, x -> x = 'join')) AS tf1,
        |    len(list_filter(tk, x -> x = 'vector')) AS tf2,
        |    len(list_filter(tk, x -> x = 'stream')) AS tf3,
        |    0.25::DOUBLE + 0.75::DOUBLE * len(tk) * (SELECT n_docs FROM stats)
        |      / (SELECT total_len FROM stats) AS bden,
        |    (SELECT n_docs FROM stats) AS n_docs,
        |    (SELECT df1 FROM stats) AS df1,
        |    (SELECT df2 FROM stats) AS df2,
        |    (SELECT df3 FROM stats) AS df3
        |  FROM t)""".stripMargin

  /** Train three BPE merges on the corpus VOCABULARY — the shared spine
    * of t_bpe3 (the trainer demo, which reports the merges) and
    * t_bpe_apply (train → tokenize the corpus). Words pre-aggregate to
    * (word, count); each round is one vocabulary-sized pair count with a
    * 1-row broadcast argmax (count DESC, then lexicographic — total
    * order, both engines agree) and a greedy left-to-right merge via the
    * double-separator replace trick. Returns the three 1-row top-pair
    * frames in merge order plus the persisted intermediates the caller
    * must release (CacheScope.sealResult). */
  private def bpeMerges3(s: SparkSession, dir: String): (Seq[DataFrame], Seq[DataFrame]) = {
    val words = Graft.table(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // per-char '||' separators via regex (split(w, "") keeps a trailing
    // empty token in Java regex semantics — regexp_replace avoids it)
    val e1 = words.select(
      concat(lit("||"), regexp_replace(col("w"), "(.)", "$1||")).as("enc"),
      col("cnt"))
    // one merge round: pair counts -> 1-row argmax -> broadcast merge
    def mergeRound(e: DataFrame): (DataFrame, DataFrame) = {
      // sequence(1, n-1) infers step -1 when n < 2 — guard like t_repetition
      val withTk = e.withColumn("tk",
        split(expr("trim(BOTH '|' FROM enc)"), "\\|\\|"))
      val pairs = withTk
        .withColumn("u", explode(when(size(col("tk")) >= 2,
          expr("""transform(sequence(1, size(tk) - 1),
                 |  i -> named_struct('l', element_at(tk, i), 'r', element_at(tk, i + 1)))""".stripMargin))
          .otherwise(expr("cast(array() as array<struct<l: string, r: string>>)"))))
        .select(col("u.l").as("l"), col("u.r").as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("n"))
      val top = pairs.orderBy(col("n").desc, col("l"), col("r")).limit(1)
      val merged = e.crossJoin(broadcast(top))
        .select(
          expr("replace(enc, '|' || l || '||' || r || '|', '|' || l || r || '|')").as("enc"),
          col("cnt"))
      (merged, top)
    }
    val e1p = e1.persist()
    val (e2, t1) = mergeRound(e1p)
    val e2p = e2.persist()
    val (e3, t2) = mergeRound(e2p)
    val (_, t3) = mergeRound(e3)
    (Seq(t1, t2, t3), Seq(e1p, e2p))
  }

  /** Oracle-side shared BPE training CTEs (w0..t3) — the three-merge
    * trainer in DuckDB SQL, shared by t_bpe_apply and t_bpe_fertility the
    * way bpeMerges3 is shared on the Spark side. */
  private val bpeTrainCtesSql: String =
    """w0 AS (
          |  SELECT w, COUNT(*) AS cnt FROM (
          |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          |  WHERE length(w) >= 1 GROUP BY w),
          |e1 AS (
          |  SELECT '||' || regexp_replace(w, '(.)', '\1||', 'g') AS enc, cnt
          |  FROM w0),
          |p1 AS (
          |  SELECT u.l AS l, u.r AS r, SUM(cnt) AS n FROM (
          |    SELECT cnt, unnest(list_transform(range(1, len(tk)),
          |      i -> struct_pack(l := tk[i], r := tk[i+1]))) AS u
          |    FROM (SELECT string_split(trim(enc, '|'), '||') AS tk, cnt FROM e1))
          |  GROUP BY u.l, u.r),
          |t1 AS (SELECT l, r FROM p1 ORDER BY n DESC, l, r LIMIT 1),
          |e2 AS (
          |  SELECT replace(enc, '|' || t.l || '||' || t.r || '|',
          |                      '|' || t.l || t.r || '|') AS enc, cnt
          |  FROM e1, t1 t),
          |p2 AS (
          |  SELECT u.l AS l, u.r AS r, SUM(cnt) AS n FROM (
          |    SELECT cnt, unnest(list_transform(range(1, len(tk)),
          |      i -> struct_pack(l := tk[i], r := tk[i+1]))) AS u
          |    FROM (SELECT string_split(trim(enc, '|'), '||') AS tk, cnt FROM e2))
          |  GROUP BY u.l, u.r),
          |t2 AS (SELECT l, r FROM p2 ORDER BY n DESC, l, r LIMIT 1),
          |e3 AS (
          |  SELECT replace(enc, '|' || t.l || '||' || t.r || '|',
          |                      '|' || t.l || t.r || '|') AS enc, cnt
          |  FROM e2, t2 t),
          |p3 AS (
          |  SELECT u.l AS l, u.r AS r, SUM(cnt) AS n FROM (
          |    SELECT cnt, unnest(list_transform(range(1, len(tk)),
          |      i -> struct_pack(l := tk[i], r := tk[i+1]))) AS u
          |    FROM (SELECT string_split(trim(enc, '|'), '||') AS tk, cnt FROM e3))
          |  GROUP BY u.l, u.r),
          |t3 AS (SELECT l, r FROM p3 ORDER BY n DESC, l, r LIMIT 1)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- TEXT-1
    // Token counting: whitespace tokens plus a BPE-ish budget (each word
    // contributes ceil(len/4) subword units — the 1-token-per-~4-chars rule
    // of thumb), entirely inside codegen via higher-order array functions.
    QueryDef("t_token_count",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |       w -> (length(w) + 3) // 4)) AS BIGINT) AS n_bpe_tokens,
        |  length(text) / len(string_split(text, ' ')) AS chars_per_token
        |FROM documents""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_ws_tokens"),
        expr("aggregate(transform(tk, w -> bigint((length(w) + 3) div 4)), 0L, (a, x) -> a + x)")
          .as("n_bpe_tokens"),
        (length(col("text")) / size(col("tk"))).as("chars_per_token"))
    },

    // ---------------------------------------------------------------- TEXT-2
    // Language-ID heuristic: stopword hit-ratio thresholded to a label.
    // (Real lang-id would use char n-gram profiles; the relational shape —
    // per-row array filter + ratio + threshold — is identical.)
    QueryDef("t_lang_id",
      s"""SELECT doc_id, lang,
         |  len(list_filter(string_split(text, ' '), t -> t IN ($stopsSqlList)))
         |    / len(string_split(text, ' ')) AS stop_ratio,
         |  CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ($stopsSqlList)))
         |    / len(string_split(text, ' ')) >= 0.12 THEN 'en' ELSE 'other' END AS lang_pred
         |FROM documents""".stripMargin) { (s, dir) =>
      val nStop = expr(s"size(filter(tk, t -> t IN ($stopsSqlList)))")
      val ratio = nStop / size(col("tk"))
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        ratio.as("stop_ratio"),
        when(ratio >= 0.12, "en").otherwise("other").as("lang_pred"))
    },

    // ---------------------------------------------------------------- TEXT-3
    // Quality scoring: length, type-token ratio, stopword balance, and mean
    // word length combined into one bounded score — the standard cheap
    // pre-training quality filter shape.
    QueryDef("t_quality_score",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |    len(list_filter(string_split(text, ' '), t -> t IN ($stopsSqlList))) AS n_stop,
         |    length(text) AS n_chars
         |  FROM documents)
         |SELECT doc_id,
         |  n_tokens, n_distinct / n_tokens AS ttr, n_stop / n_tokens AS stop_ratio,
         |  0.25 * least(n_tokens / 100.0, 1.0)
         |    + 0.25 * (n_distinct / n_tokens)
         |    + 0.3 * (1.0 - abs(n_stop / n_tokens - 0.4))
         |    + 0.2 * least(((n_chars - n_tokens + 1) / n_tokens) / 8.0, 1.0) AS quality
         |FROM t""".stripMargin) { (s, dir) =>
      val t = docs(s, dir).select(
        col("doc_id"),
        size(col("tk")).as("n_tokens"),
        size(array_distinct(col("tk"))).as("n_distinct"),
        expr(s"size(filter(tk, t -> t IN ($stopsSqlList)))").as("n_stop"),
        length(col("text")).as("n_chars"))
      t.select(
        col("doc_id"), col("n_tokens"),
        (col("n_distinct") / col("n_tokens")).as("ttr"),
        (col("n_stop") / col("n_tokens")).as("stop_ratio"),
        (lit(0.25) * least(col("n_tokens") / lit(100.0), lit(1.0))
          + lit(0.25) * (col("n_distinct") / col("n_tokens"))
          + lit(0.3) * (lit(1.0) - abs(col("n_stop") / col("n_tokens") - lit(0.4)))
          + lit(0.2) * least(((col("n_chars") - col("n_tokens") + 1) / col("n_tokens")) / lit(8.0), lit(1.0)))
          .as("quality"))
    },

    // ---------------------------------------------------------------- TEXT-5
    // Normalization for dedup keying: lowercase, strip non-alphanumerics,
    // collapse whitespace — the canonical form exact/near dedup keys on.
    // Output includes the cluster size per normalized form.
    QueryDef("t_normalize",
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |         ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS norm_key, length(norm) AS norm_len,
        |  COUNT(*) OVER (PARTITION BY md5(norm)) AS cluster_size
        |FROM n""".stripMargin) { (s, dir) =>
      // ONE generated byte scan (graft.functions.AsciiNormalize) instead
      // of lower + two regex passes + trim — same bytes on the ASCII
      // corpus contract, ~4 fewer string walks per row; norm is projected
      // once and feeds both md5 and length
      graft.functions.VectorExprs.register(s)
      Graft.table(s, dir, "documents")
        .select(col("doc_id"), expr("ascii_normalize(text)").as("norm"))
        .select(col("doc_id"), md5(col("norm")).as("norm_key"),
          length(col("norm")).as("norm_len"))
        .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("norm_key")))
    },

    // ---------------------------------------------------------------- TEXT-4
    // Document fingerprinting: a bag-of-words content fingerprint (md5 of the
    // sorted distinct token set — md5 is byte-identical across engines) plus
    // a polynomial rolling hash folded over the token stream, and the
    // duplicate-cluster size per fingerprint.
    QueryDef("t_fingerprint",
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp,
        |    list_reduce(
        |      list_concat([CAST(0 AS BIGINT)],
        |        list_transform(string_split(text, ' '),
        |          t -> CAST(ascii(t) * 7 + length(t) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS roll_fp
        |  FROM documents)
        |SELECT doc_id, bow_fp, roll_fp,
        |  COUNT(*) OVER (PARTITION BY bow_fp) AS n_dups
        |FROM f""".stripMargin) { (s, dir) =>
      val f = docs(s, dir).select(
        col("doc_id"),
        md5(array_join(sort_array(array_distinct(col("tk"))), " ")).as("bow_fp"),
        expr("""aggregate(transform(tk, t -> bigint(ascii(t) * 7 + length(t))),
               |0L, (a, x) -> (a * 31 + x) % 1000000007)""".stripMargin).as("roll_fp"))
      f.withColumn("n_dups", count(lit(1)).over(Window.partitionBy("bow_fp")))
    },

    // ---------------------------------------------------------------- TEXT-6
    // Deterministic stratified sampling — the training-mix step: each
    // language stratum keeps a configured fraction, decided per document by
    // a hash threshold (md5's first two hex digits → 0..255), so the sample
    // is reproducible at any parallelism, needs no global count, and
    // rebalances the mix (downsample the dominant 'en', upsample-keep the
    // rest). Map-side only at 100 TB.
    QueryDef("t_stratified_sample", {
      val hx = "instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1"
      val hx2 = "instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1"
      s"""SELECT doc_id, lang,
         |  ($hx) * 16 + ($hx2) AS bucket
         |FROM documents
         |WHERE ($hx) * 16 + ($hx2) <
         |  CASE lang WHEN 'en' THEN 64 WHEN 'zh' THEN 192 ELSE 128 END""".stripMargin
    }) { (s, dir) =>
      val b = (expr("instr('0123456789abcdef', substr(md5(cast(doc_id AS string)), 1, 1)) - 1")
        * 16) +
        (expr("instr('0123456789abcdef', substr(md5(cast(doc_id AS string)), 2, 1)) - 1"))
      val rate = when(col("lang") === "en", 64).when(col("lang") === "zh", 192)
        .otherwise(128)
      Graft.table(s, dir, "documents")
        .withColumn("bucket", b)
        .filter(col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    },

    // ---------------------------------------------------------------- TEXT-6b
    // Deterministic WEIGHTED systematic sampling — the size-aware sibling
    // of t_stratified_sample: pick ~K documents with probability
    // proportional to length (n_chars), by laying the corpus on a weight
    // line and taking every total/K-th tick. Entirely integer arithmetic
    // ((cum·K) div total crossings), so the draw is exact, reproducible,
    // and engine-identical — no RNG, no float thresholds. A long document
    // spanning several ticks reports its multiplicity in `times` (the
    // standard PPS-with-replacement accounting). The prefix sum is the
    // scale story: computed as per-shard partials + an exclusive offset
    // pass over the SHARD TOTALS (bounded metadata, broadcast back), never
    // one global ORDER BY window that would serialize the corpus onto a
    // single task at 100 TB. The oracle states the same sum globally —
    // semantically identical, oracle-side scale irrelevant.
    QueryDef("t_weighted_sample",
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    SUM(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents),
        |t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM documents)
        |SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum,
        |  CAST((cum * 64) // total - ((cum - n_chars) * 64) // total AS BIGINT) AS times
        |FROM c, t
        |WHERE (cum * 64) // total > ((cum - n_chars) * 64) // total""".stripMargin) { (s, dir) =>
      val d = Graft.table(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val ds = d.withColumn("shard", expr("doc_id div 64"))
      val wIn = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = ds.withColumn("local_cum", sum("n_chars").over(wIn))
      // exclusive prefix over the per-shard totals: one window over
      // #shards rows — bounded driver-scale metadata, like a27's histogram
      val wSh = Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ds.groupBy("shard").agg(sum("n_chars").as("st"))
        .withColumn("off", coalesce(sum("st").over(wSh), lit(0L)))
        .select(col("shard"), col("off"))
      val tot = d.agg(sum("n_chars").cast("long").as("total"))
      within.join(broadcast(offsets), "shard")
        .withColumn("cum", (col("local_cum") + col("off")).cast("long"))
        .crossJoin(broadcast(tot))
        .withColumn("hi", expr("(cum * 64) div total"))
        .withColumn("lo", expr("((cum - n_chars) * 64) div total"))
        .filter(col("hi") > col("lo"))
        .select(col("doc_id"), col("n_chars"), col("cum"),
          (col("hi") - col("lo")).cast("long").as("times"))
    },

    // ---------------------------------------------------------------- TEXT-6c
    // Exact per-stratum k-sample — the third sampling shape beside
    // rate-based (t_stratified_sample) and size-proportional
    // (t_weighted_sample): every language keeps EXACTLY min(k, n) docs,
    // picked by md5-hash priority — the balanced-eval-set draw ("200 docs
    // per language, reproducibly") a rate can't express when strata sizes
    // differ by orders of magnitude. One window per stratum (parallel
    // across strata; rank ≤ k compiles to WindowGroupLimit, so each
    // partition keeps a bounded k-heap, never a full sort at 100 TB).
    QueryDef("t_group_sample_k",
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
        |  FROM documents)
        |WHERE r <= 8""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Graft.table(s, dir, "documents")
        .select(col("lang"), col("doc_id"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= 8)
        .select("lang", "doc_id")
    },

    // ---------------------------------------------------------------- TEXT-6d
    // Corpus concentration (Gini over per-source token mass) — the
    // one-number inequality stat a dataset card reports beside the mix
    // table: 0 = every source contributes equally, →1 = one source IS the
    // corpus (and the mix needs re-weighting before training). Exact
    // parity by construction: Gini = Σ(2i−n−1)·w_i / (n·Σw) over
    // ascending-sorted integer masses — every term integer, ONE double
    // division at the end (never a libm detour). The global window runs
    // over the SOURCE rollup (#sources rows — bounded metadata, the a27
    // argument), not the corpus; the only corpus-sized work is the
    // map-side-combinable per-source sum.
    QueryDef("t_source_gini",
      """WITH s AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT w,
        |    ROW_NUMBER() OVER (ORDER BY w, source) AS i,
        |    COUNT(*) OVER () AS n,
        |    CAST(SUM(w) OVER () AS BIGINT) AS tot
        |  FROM s)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_sources,
        |  CAST(MAX(tot) AS BIGINT) AS total_chars,
        |  CAST(SUM((2 * i - n - 1) * w) AS DOUBLE)
        |    / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(tot) AS DOUBLE)) AS gini
        |FROM r""".stripMargin) { (s, dir) =>
      val masses = Graft.table(s, dir, "documents")
        .groupBy("source").agg(sum("n_chars").cast("long").as("w"))
      val wRank = Window.orderBy(col("w"), col("source"))
      val wAll = Window.partitionBy()
      masses
        .withColumn("i", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tot", sum("w").over(wAll).cast("long"))
        .agg(max("n").cast("long").as("n_sources"),
          max("tot").cast("long").as("total_chars"),
          (sum((lit(2) * col("i") - col("n") - 1) * col("w")).cast("double") /
            (max("n").cast("double") * max("tot").cast("double"))).as("gini"))
    },

    // ---------------------------------------------------------------- TEXT-7
    // Quality-filter funnel with reason codes: every document gets its
    // FIRST failing rule (or 'pass'), and the funnel reports per-reason
    // drop counts — the accounting a curation pipeline ships with its
    // dataset card. One map-side CASE cascade + one tiny groupBy.
    QueryDef("t_filter_funnel",
      s"""WITH v AS (
         |  SELECT doc_id,
         |    CASE
         |      WHEN len(string_split(text, ' ')) < 20 THEN 'too_short'
         |      WHEN length(text) / len(string_split(text, ' ')) > 5.8 THEN 'tokens_too_long'
         |      WHEN len(list_filter(string_split(text, ' '), t -> t IN ($stopsSqlList)))
         |           / len(string_split(text, ' ')) > 0.15 THEN 'stopword_soup'
         |      ELSE 'pass'
         |    END AS verdict
         |  FROM documents)
         |SELECT verdict, COUNT(*) AS n_docs, MIN(doc_id) AS example_doc
         |FROM v GROUP BY verdict""".stripMargin) { (s, dir) =>
      val stopHits = expr(s"size(filter(tk, t -> t IN ($stopsSqlList)))")
      val verdict = when(size(col("tk")) < 20, "too_short")
        .when(length(col("text")) / size(col("tk")) > 5.8, "tokens_too_long")
        .when(stopHits / size(col("tk")) > 0.15, "stopword_soup")
        .otherwise("pass")
      docs(s, dir).select(col("doc_id"), verdict.as("verdict"))
        .groupBy("verdict")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("example_doc"))
    },

    // ---------------------------------------------------------------- TEXT-8
    // Benchmark-contamination check: corpus documents sharing any word
    // 3-gram with the held-out set (doc_id < 25 stands in for a benchmark)
    // are flagged with their overlap count — the decontamination sweep
    // every training corpus needs. Shuffle key = the shingle (uniform,
    // high-cardinality); the benchmark side is tiny and broadcasts.
    QueryDef("t_contamination",
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |      || ' ' || string_split(text,' ')[i+2]))) AS s
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 25)
        |SELECT c.doc_id, COUNT(DISTINCT c.s) AS n_shared_ngrams
        |FROM sh c JOIN bench b ON c.s = b.s
        |WHERE c.doc_id >= 25
        |GROUP BY c.doc_id""".stripMargin) { (s, dir) =>
      // persist: the benchmark side and the corpus side both explode the
      // same shingle rows — one materialization serves both
      val shingles = docs(s, dir).filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(sequence(1, size(tk) - 2),
            |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
            |                 element_at(tk, i + 2))))""".stripMargin)).as("s"))
        .persist()
      val bench = shingles.filter(col("doc_id") < 25).select("s").distinct()
      CacheScope.sealResult(
        shingles.filter(col("doc_id") >= 25)
          .join(broadcast(bench), "s")
          .groupBy("doc_id")
          .agg(countDistinct(col("s")).as("n_shared_ngrams")),
        shingles)
    },

    // ---------------------------------------------------------------- TEXT-9
    // Token-budget packing: per language, documents fill 4096-token context
    // chunks in doc_id order — chunk_id = the running token count's bin,
    // each doc assigned to the chunk its FIRST token lands in (sequential
    // greedy fill). The oracle states the naive per-language unbounded
    // cumsum window; the Spark side computes the SAME prefix sums
    // distributively (TokenPacking: doc_id range buckets + broadcast
    // cumulative offsets + bucket-local window) so no language ever packs
    // in a single task — at training scale the dominant language is most
    // of the corpus, and the one-window form would serialize it on one
    // core. PlanSpec pins the bucketed window shape.
    QueryDef("t_token_pack",
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 4096
        |    AS BIGINT) AS chunk_id
        |FROM t""".stripMargin) { (s, dir) =>
      val t = docs(s, dir).select(col("doc_id"), col("lang"),
        expr("aggregate(transform(tk, w -> bigint((length(w) + 3) div 4)), 0L, (a, x) -> a + x)")
          .as("n_tokens"))
      graft.functions.TokenPacking.packChunks(t, "lang", "doc_id", "n_tokens", 4096L)
        .select("doc_id", "lang", "n_tokens", "chunk_id")
    },

    // --------------------------------------------------------------- TEXT-10
    // Repetition signals (the Gopher-style quality heuristics): the
    // most-frequent-word share and the duplicate-2-gram share of each
    // document — boilerplate and degenerate generations score high on both.
    // Entirely per-row array math (no shuffle), and LINEARITHMIC per row:
    // sort the tokens once, then a single aggregate() pass over the sorted
    // array computes both the longest equal-run (= the max word frequency)
    // and the run count (= the distinct count). The naive
    // distinct×filter form is O(len²) per document — a 100k-token document
    // costs ~10^10 comparisons in one task, a per-row CPU scale-killer for
    // exactly the long documents a repetition filter targets; sorted-run
    // counting is O(len·log len) and never leaves the mapper.
    QueryDef("t_repetition",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, tk,
        |    list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS g2
        |  FROM t)
        |SELECT doc_id,
        |  list_max(list_transform(list_distinct(tk),
        |    w -> len(list_filter(tk, x -> x = w)))) / len(tk) AS top_word_frac,
        |  CASE WHEN len(g2) = 0 THEN 0.0
        |       ELSE (len(g2) - len(list_distinct(g2))) / len(g2)
        |  END AS dup_2gram_frac
        |FROM g""".stripMargin) { (s, dir) =>
      // sequence(1, n) infers step -1 when n < 1 (never empty) — guard the
      // single-token case explicitly so the 2-gram list is [] as in DuckDB
      val g2 = when(size(col("tk")) >= 2,
        expr("""transform(sequence(1, size(tk) - 1),
                |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))""".stripMargin))
        .otherwise(expr("cast(array() as array<string>)"))
      // longest equal-run in the sorted array == max element frequency
      val maxRun = expr(
        """aggregate(array_sort(tk),
          |  named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
          |  (a, x) -> named_struct(
          |    'prev', x,
          |    'run',  if(x <=> a.prev, a.run + 1, 1),
          |    'best', greatest(a.best, if(x <=> a.prev, a.run + 1, 1))),
          |  a -> a.best)""".stripMargin)
      // run count in the sorted array == distinct element count
      val g2Runs = expr(
        """aggregate(array_sort(g2),
          |  named_struct('prev', cast(null as string), 'n', 0),
          |  (a, x) -> named_struct('prev', x, 'n', a.n + if(x <=> a.prev, 0, 1)),
          |  a -> a.n)""".stripMargin)
      docs(s, dir).select(col("doc_id"), col("tk")).withColumn("g2", g2)
        .select(col("doc_id"),
          (maxRun / size(col("tk"))).as("top_word_frac"),
          when(size(col("g2")) === 0, lit(0.0))
            .otherwise((size(col("g2")) - g2Runs) / size(col("g2")))
            .as("dup_2gram_frac"))
    },

    // --------------------------------------------------------------- TEXT-11
    // Per-domain cap (domain balancing): keep at most 15 documents per
    // source, preferring longer ones — the standard guard against one
    // domain flooding the training mix. ONE shuffle on source; the rank
    // filter compiles to WindowGroupLimit (Spark 4), so each partition
    // keeps a 15-row heap instead of sorting every group — the 100 TB
    // shape for top-k-per-key. Skewed mega-domains are exactly the rows
    // the cap discards, and AQE splits any skewed source partition.
    QueryDef("t_domain_cap",
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS source_rank,
        |    COUNT(*) OVER (PARTITION BY source) AS n_source_docs
        |  FROM documents)
        |SELECT doc_id, source, n_chars, source_rank, n_source_docs
        |FROM r WHERE source_rank <= 15""".stripMargin) { (s, dir) =>
      // the per-source total comes from a groupBy dim joined back onto the
      // capped rows, NOT a second whole-partition window: a count window
      // between the rank filter and the rank window would block the
      // WindowGroupLimit rewrite (full sort of every group). No broadcast
      // hint — one row per source can still be 100M rows for a web corpus,
      // so AQE picks broadcast only when the dim actually fits
      val d = Graft.table(s, dir, "documents")
      val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
      val totals = d.groupBy("source").agg(count(lit(1)).as("n_source_docs"))
      d.select(col("doc_id"), col("source"), col("n_chars"),
          row_number().over(w).as("source_rank"))
        .filter(col("source_rank") <= 15)
        .join(totals, "source")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("source_rank"), col("n_source_docs"))
    },

    // --------------------------------------------------------------- TEXT-13
    // Corpus-statistics quality score (the CCNet/LM-filter shape): a
    // corpus-wide unigram frequency table scores each document by the
    // mean and minimum frequency of its words — low mean ≈ unusual text,
    // low min ≈ contains near-OOV tokens. TWO passes over the corpus
    // (vocab aggregate, then a words⋈vocab join back), the
    // statistics-driven filter shape heuristic scores can't express.
    // Frequencies are exact scaled integers (floor(1e6*cnt/total) in pure
    // int arithmetic) because libm log/ln differs by ulps across engines —
    // the ranking is the same, the hashes stay bit-exact.
    QueryDef("t_unigram_score",
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tot AS (SELECT COUNT(*) AS n FROM words),
        |vocab AS (
        |  SELECT w, (COUNT(*) * 1000000) // (SELECT n FROM tot) AS freq_ppm
        |  FROM words GROUP BY w)
        |SELECT d.doc_id,
        |  CAST(SUM(v.freq_ppm) AS DOUBLE) / COUNT(*) AS mean_freq_ppm,
        |  MIN(v.freq_ppm) AS min_freq_ppm,
        |  COUNT(CASE WHEN v.freq_ppm < 10 THEN 1 END) AS n_rare_words
        |FROM words d JOIN vocab v ON d.w = v.w
        |GROUP BY d.doc_id""".stripMargin) { (s, dir) =>
      val words = Graft.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val totRow = words.agg(count(lit(1)).as("n"))
      // corpus totals ride along as a 1-row broadcast (j13 scalar shape);
      // freq in ppm via exact integer floor-div — counts are non-negative
      // so `div` == floor here
      val vocab = words.groupBy("w").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(totRow))
        .select(col("w"), expr("(cnt * 1000000) div n").as("freq_ppm"))
      words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
          (sum("freq_ppm").cast("double") / count(lit(1))).as("mean_freq_ppm"),
          min("freq_ppm").as("min_freq_ppm"),
          count(when(col("freq_ppm") < 10, lit(1))).as("n_rare_words"))
    },

    // --------------------------------------------------------------- TEXT-12
    // PII scrubbing: emails / IPv4s / phone-shaped tokens replaced with
    // typed placeholders, with per-category match counts — the redaction
    // pass every published-corpus pipeline runs before training. The
    // synthetic corpus carries no PII, so each doc gets a deterministic
    // injected contact line first; the scrub itself is the operator under
    // test. Pure per-row regex work: map-side, zero shuffles, and the
    // patterns stay in the common RE2/Java-regex dialect so both engines
    // match identically.
    QueryDef("t_pii_scrub",
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.1 call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS raw
        |  FROM documents),
        |scr AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(raw,
        |      '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |      '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g'),
        |      '555-[0-9]+', '<PHONE>', 'g') AS scrubbed
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(scrubbed, '<EMAIL>')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(scrubbed, '<IP>')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(scrubbed, '<PHONE>')) AS BIGINT) AS n_phones,
        |  scrubbed
        |FROM scr""".stripMargin) { (s, dir) =>
      val raw = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.com or 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".1 call 555-"),
        (lit(1000) + col("doc_id") % 9000).cast("string"))
      val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val ip = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
      val phone = "555-[0-9]+"
      // half the regex passes of the naive form: scrub once (the three
      // class-pattern replaces), then COUNT the placeholders in the
      // scrubbed output with literal patterns. The counts are DEFINED as
      // replacements-applied-by-the-sequential-chain — the oracle counts
      // the same placeholders on the same scrubbed string, so parity
      // holds under ANY corpus, including cross-class overlaps where a
      // raw-match count would diverge (an IP eaten by an earlier email
      // replacement is not a replacement and is not counted — which is
      // also the operationally meaningful number: what the redaction
      // actually did)
      Graft.table(s, dir, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(col("raw"),
            email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("scrubbed"))
        .select(col("doc_id"),
          regexp_count(col("scrubbed"), lit("<EMAIL>")).cast("long").as("n_emails"),
          regexp_count(col("scrubbed"), lit("<IP>")).cast("long").as("n_ips"),
          regexp_count(col("scrubbed"), lit("<PHONE>")).cast("long").as("n_phones"),
          col("scrubbed"))
    },

    // --------------------------------------------------------------- TEXT-15
    // BM25-style relevance scoring against a fixed query — the curation
    // shape for selecting domain-relevant documents out of a web corpus.
    // TWO corpus passes (df/length statistics, then the per-doc score),
    // like the unigram scorer. Float parity: idf is the RATIONAL
    // (N - df + 0.5)/(df + 0.5) — same ranking as the log form without
    // trusting two libm ln() implementations to agree bit-for-bit — and
    // the score is built from the identical expression tree in both
    // engines (each * and / a single correctly-rounded IEEE op), with the
    // three per-term scores added in fixed order, never via SUM.
    QueryDef("t_bm25",
      bm25Sql) { (s, dir) =>
      val terms = Seq("join", "vector", "stream")
      val t = docs(s, dir).select(col("doc_id"), col("tk"))
      def tf(term: String) = expr(s"size(filter(tk, x -> x = '$term'))")
      val statCols =
        count(lit(1)).as("n_docs") +:
          sum(size(col("tk"))).cast("long").as("total_len") +:
          terms.zipWithIndex.map { case (w, i) =>
            sum(when(tf(w) > 0, 1).otherwise(0)).cast("long").as(s"df${i + 1}")
          }
      val stats = t.agg(statCols.head, statCols.tail: _*)
      val withTf = terms.zipWithIndex
        .foldLeft(t) { case (df, (w, i)) => df.withColumn(s"tf${i + 1}", tf(w)) }
        .crossJoin(broadcast(stats))
        .withColumn("bden",
          lit(0.25) + lit(0.75) * size(col("tk")) * col("n_docs") / col("total_len"))
      def term(i: Int) =
        col(s"tf$i") * lit(2.2) / (col(s"tf$i") + lit(1.2) * col("bden")) *
          ((col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      // fixed association: t1 + (t2 + t3), mirroring the oracle exactly
      withTf.select(col("doc_id"), (term(1) + (term(2) + term(3))).as("bm25"))
    },

    // --------------------------------------------------------------- TEXT-16
    // BPE vocabulary induction, first merge round: corpus-wide counts of
    // adjacent character pairs within words — the exact statistic byte-pair
    // encoding greedily merges on. One explode cascade (words, then char
    // bigrams) into ONE count shuffle with map-side partial aggregation;
    // top-20 with a deterministic tie-break. At 100 TB the pair-count table
    // is vocabulary-sized (tiny), so iterating merge rounds keeps the same
    // single-shuffle shape per round.
    QueryDef("t_bpe_pairs",
      """WITH pairs AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substr(w, i, 2))) AS pair
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 2),
        |counted AS (
        |  SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair)
        |SELECT pair, n, merge_rank FROM (
        |  SELECT pair, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS merge_rank
        |  FROM counted)
        |WHERE merge_rank <= 20""".stripMargin) { (s, dir) =>
      // top-20 as TakeOrderedAndProject (the g_butterfly idiom, r19):
      // the pair vocabulary is alphabet-bounded, but rank-then-filter
      // still planned a single-partition global window over it — the
      // orderBy().limit() form reduces map-side and ranks 20 rows
      val rankOrder = Seq(col("n").desc, col("pair"))
      docs(s, dir)
        .select(explode(col("tk")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(rankOrder: _*).limit(20)
        .withColumn("merge_rank", row_number().over(Window.orderBy(rankOrder: _*)))
        .select("pair", "n", "merge_rank")
    },

    // --------------------------------------------------------------- TEXT-19
    // BPE vocabulary induction, THREE DATA-DEPENDENT MERGE ROUNDS — the
    // iterative loop t_bpe_pairs computes one step of. Each round counts
    // adjacent token pairs corpus-wide, picks the argmax pair (count DESC,
    // then lexicographic — total order, both engines agree), and merges it
    // greedily left-to-right into every word. The merge is pure relational
    // string algebra: words are encoded with DOUBLE separators
    // ('||a||b||c||'), so replace(enc, '|a||b|', '|ab|') performs exactly
    // the greedy non-overlapping merge — consecutive occurrences keep their
    // shared boundary because each match leaves a trailing '|' for the next
    // (replace semantics are identical in Spark and DuckDB). The top pair
    // stays a 1-row broadcast (the j13 scalar shape) — never collected.
    // Words are pre-aggregated to (word, count), so each round is ONE
    // vocabulary-sized pass + a pair-count shuffle: the production BPE
    // trainer loop's exact cost shape, one shuffle per merge round.
    QueryDef("t_bpe3",
      """WITH w0 AS (
        |  SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 1 GROUP BY w),
        |e1 AS (
        |  SELECT '||' || regexp_replace(w, '(.)', '\1||', 'g') AS enc, cnt
        |  FROM w0),
        |p1 AS (
        |  SELECT u.l AS l, u.r AS r, SUM(cnt) AS n FROM (
        |    SELECT cnt, unnest(list_transform(range(1, len(tk)),
        |      i -> struct_pack(l := tk[i], r := tk[i+1]))) AS u
        |    FROM (SELECT string_split(trim(enc, '|'), '||') AS tk, cnt FROM e1))
        |  GROUP BY u.l, u.r),
        |t1 AS (SELECT l, r, n FROM p1 ORDER BY n DESC, l, r LIMIT 1),
        |e2 AS (
        |  SELECT replace(enc, '|' || t.l || '||' || t.r || '|',
        |                      '|' || t.l || t.r || '|') AS enc, cnt
        |  FROM e1, t1 t),
        |p2 AS (
        |  SELECT u.l AS l, u.r AS r, SUM(cnt) AS n FROM (
        |    SELECT cnt, unnest(list_transform(range(1, len(tk)),
        |      i -> struct_pack(l := tk[i], r := tk[i+1]))) AS u
        |    FROM (SELECT string_split(trim(enc, '|'), '||') AS tk, cnt FROM e2))
        |  GROUP BY u.l, u.r),
        |t2 AS (SELECT l, r, n FROM p2 ORDER BY n DESC, l, r LIMIT 1),
        |e3 AS (
        |  SELECT replace(enc, '|' || t.l || '||' || t.r || '|',
        |                      '|' || t.l || t.r || '|') AS enc, cnt
        |  FROM e2, t2 t),
        |p3 AS (
        |  SELECT u.l AS l, u.r AS r, SUM(cnt) AS n FROM (
        |    SELECT cnt, unnest(list_transform(range(1, len(tk)),
        |      i -> struct_pack(l := tk[i], r := tk[i+1]))) AS u
        |    FROM (SELECT string_split(trim(enc, '|'), '||') AS tk, cnt FROM e3))
        |  GROUP BY u.l, u.r),
        |t3 AS (SELECT l, r, n FROM p3 ORDER BY n DESC, l, r LIMIT 1)
        |SELECT 1 AS merge_round, l, r, l || r AS merged, CAST(n AS BIGINT) AS n FROM t1
        |UNION ALL
        |SELECT 2 AS merge_round, l, r, l || r AS merged, CAST(n AS BIGINT) AS n FROM t2
        |UNION ALL
        |SELECT 3 AS merge_round, l, r, l || r AS merged, CAST(n AS BIGINT) AS n
        |FROM t3""".stripMargin) { (s, dir) =>
      val (tops, caches) = bpeMerges3(s, dir)
      def row(k: Int, t: DataFrame) = t.select(
        lit(k).as("merge_round"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("n").cast("long").as("n"))
      CacheScope.sealResult(
        row(1, tops(0)).unionAll(row(2, tops(1))).unionAll(row(3, tops(2))),
        caches: _*)
    },

    // --------------------------------------------------------------- TEXT-25
    // BPE APPLICATION — the deploy-time half t_bpe3 trains for: the three
    // learned merges, applied IN ORDER to every word instance of the
    // corpus, i.e. "tokenize 100 TB with the trained tokenizer". Each
    // merge is the same double-separator replace the trainer used (exact
    // greedy non-overlapping semantics, identical in both engines), and
    // each trained pair stays a 1-row broadcast — so the application is
    // three map-side replaces over the corpus, no shuffle until the
    // per-doc rollup (one doc_id aggregation). The per-doc token digest
    // (md5 over the position-ordered encodings) pins the tokenization
    // byte-for-byte, not just the counts.
    QueryDef("t_bpe_apply", {
      val trainCtes = bpeTrainCtesSql
      s"""WITH $trainCtes,
         |inst AS (
         |  SELECT doc_id, g.i AS i,
         |    '||' || regexp_replace(tk[g.i], '(.)', '\\1||', 'g') AS enc,
         |    length(tk[g.i]) AS wlen
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t,
         |    UNNEST(generate_series(1, len(tk))) AS g(i)),
         |a1 AS (SELECT doc_id, i, wlen,
         |  replace(enc, '|' || t.l || '||' || t.r || '|',
         |               '|' || t.l || t.r || '|') AS enc FROM inst, t1 t),
         |a2 AS (SELECT doc_id, i, wlen,
         |  replace(enc, '|' || t.l || '||' || t.r || '|',
         |               '|' || t.l || t.r || '|') AS enc FROM a1, t2 t),
         |a3 AS (SELECT doc_id, i, wlen,
         |  replace(enc, '|' || t.l || '||' || t.r || '|',
         |               '|' || t.l || t.r || '|') AS enc FROM a2, t3 t)
         |SELECT doc_id,
         |  CAST(SUM(len(string_split(trim(enc, '|'), '||'))) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(wlen) AS BIGINT) AS n_chars,
         |  md5(string_agg(enc, ' ' ORDER BY i)) AS tok_md5
         |FROM a3 GROUP BY doc_id""".stripMargin
    }) { (s, dir) =>
      val (tops, caches) = bpeMerges3(s, dir)
      val inst = docs(s, dir)
        .select(col("doc_id"), posexplode(col("tk")).as(Seq("i0", "w")))
        .select(col("doc_id"), (col("i0") + 1).as("i"),
          concat(lit("||"), regexp_replace(col("w"), "(.)", "$1||")).as("enc"),
          length(col("w")).as("wlen"))
      val applied = tops.foldLeft(inst) { (e, top) =>
        e.crossJoin(broadcast(top.select("l", "r")))
          .withColumn("enc",
            expr("replace(enc, '|' || l || '||' || r || '|', '|' || l || r || '|')"))
          .drop("l", "r")
      }
      CacheScope.sealResult(
        applied
          .groupBy("doc_id")
          .agg(
            sum(expr("size(split(trim(BOTH '|' FROM enc), '\\\\|\\\\|'))"))
              .cast("long").as("n_bpe_tokens"),
            sum("wlen").cast("long").as("n_chars"),
            md5(concat_ws(" ", expr(
              "transform(array_sort(collect_list(struct(i, enc))), p -> p.enc)")))
              .as("tok_md5")),
        caches: _*)
    },

    // -------------------------------------------------------------- TEXT-25b
    // Tokenizer fertility by language — chars per BPE token under the
    // corpus-trained merges: THE multilingual tokenizer-quality metric (a
    // language with low chars-per-token burns more of the context window
    // per character; mix design reads this table before fixing per-lang
    // budgets). Same trained merges and application semantics as
    // t_bpe_apply (shared bpeMerges3 spine / bpeTrainCtesSql oracle CTEs),
    // rolled up per language; fertility = one IEEE division of exact
    // integer sums.
    QueryDef("t_bpe_fertility",
      s"""WITH $bpeTrainCtesSql,
         |inst AS (
         |  SELECT lang, '||' || regexp_replace(tk[g.i], '(.)', '\\1||', 'g') AS enc,
         |    length(tk[g.i]) AS wlen
         |  FROM (SELECT lang, string_split(text, ' ') AS tk FROM documents) t,
         |    UNNEST(generate_series(1, len(tk))) AS g(i)),
         |a1 AS (SELECT lang, wlen,
         |  replace(enc, '|' || t.l || '||' || t.r || '|',
         |               '|' || t.l || t.r || '|') AS enc FROM inst, t1 t),
         |a2 AS (SELECT lang, wlen,
         |  replace(enc, '|' || t.l || '||' || t.r || '|',
         |               '|' || t.l || t.r || '|') AS enc FROM a1, t2 t),
         |a3 AS (SELECT lang, wlen,
         |  replace(enc, '|' || t.l || '||' || t.r || '|',
         |               '|' || t.l || t.r || '|') AS enc FROM a2, t3 t)
         |SELECT lang,
         |  CAST(SUM(len(string_split(trim(enc, '|'), '||'))) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(wlen) AS BIGINT) AS n_chars,
         |  CAST(SUM(wlen) AS DOUBLE)
         |    / CAST(SUM(len(string_split(trim(enc, '|'), '||'))) AS BIGINT)
         |    AS chars_per_token
         |FROM a3 GROUP BY lang""".stripMargin) { (s, dir) =>
      val (tops, caches) = bpeMerges3(s, dir)
      val inst = docs(s, dir)
        .select(col("lang"), explode(col("tk")).as("w"))
        .select(col("lang"),
          concat(lit("||"), regexp_replace(col("w"), "(.)", "$1||")).as("enc"),
          length(col("w")).as("wlen"))
      val applied = tops.foldLeft(inst) { (e, top) =>
        e.crossJoin(broadcast(top.select("l", "r")))
          .withColumn("enc",
            expr("replace(enc, '|' || l || '||' || r || '|', '|' || l || r || '|')"))
          .drop("l", "r")
      }
      CacheScope.sealResult(
        applied
          .groupBy("lang")
          .agg(
            sum(expr("size(split(trim(BOTH '|' FROM enc), '\\\\|\\\\|'))"))
              .cast("long").as("n_bpe_tokens"),
            sum("wlen").cast("long").as("n_chars"))
          .withColumn("chars_per_token",
            col("n_chars").cast("double") / col("n_bpe_tokens")),
        caches: _*)
    },

    // --------------------------------------------------------------- TEXT-17
    // CCNet-style perplexity bucketing: score each document with the
    // corpus-statistics LM proxy (the exact-integer unigram frequency of
    // t_unigram_score), then split EACH LANGUAGE into head/middle/tail
    // thirds by score percentile — CCNet computes its perplexity cutoffs
    // per language precisely because fluency scores are not comparable
    // across languages. NTILE over a per-lang window with a total-order
    // tie-break (score DESC, doc_id) so the split is deterministic in both
    // engines. Two corpus passes + one lang-window shuffle; the vocab join
    // rides the same plan as t_unigram_score. At 100 TB the per-lang window
    // is the only full-data shuffle, and a language is a coarse partition —
    // CCNet's own production shape (per-lang files) has the same property.
    QueryDef("t_ppl",
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tot AS (SELECT COUNT(*) AS n FROM words),
        |vocab AS (
        |  SELECT w, (COUNT(*) * 1000000) // (SELECT n FROM tot) AS freq_ppm
        |  FROM words GROUP BY w),
        |scored AS (
        |  SELECT d.doc_id, CAST(SUM(v.freq_ppm) AS DOUBLE) / COUNT(*) AS mean_freq_ppm
        |  FROM words d JOIN vocab v ON d.w = v.w GROUP BY d.doc_id),
        |tiled AS (
        |  SELECT s.doc_id, m.lang, s.mean_freq_ppm,
        |    NTILE(3) OVER (PARTITION BY m.lang
        |      ORDER BY s.mean_freq_ppm DESC, s.doc_id) AS tile
        |  FROM scored s JOIN documents m ON s.doc_id = m.doc_id)
        |SELECT doc_id, lang, mean_freq_ppm,
        |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
        |    AS ppl_bucket
        |FROM tiled""".stripMargin) { (s, dir) =>
      // the exploded words feed the total, the vocab, and the probe join —
      // deliberately NOT persisted: the explode is map-side-free codegen,
      // while materializing the token table at corpus scale is a real
      // memory/disk cost (same trade as t_unigram_score; measured equal)
      val words = Graft.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val totRow = words.agg(count(lit(1)).as("n"))
      val vocab = words.groupBy("w").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(totRow))
        .select(col("w"), expr("(cnt * 1000000) div n").as("freq_ppm"))
      val scored = words.join(vocab, "w")
        .groupBy("doc_id")
        .agg((sum("freq_ppm").cast("double") / count(lit(1))).as("mean_freq_ppm"))
      val byLang = Window.partitionBy("lang")
        .orderBy(col("mean_freq_ppm").desc, col("doc_id"))
      scored
        .join(Graft.table(s, dir, "documents").select("doc_id", "lang"), "doc_id")
        .withColumn("tile", ntile(3).over(byLang))
        .select(col("doc_id"), col("lang"), col("mean_freq_ppm"),
          when(col("tile") === 1, "head").when(col("tile") === 2, "middle")
            .otherwise("tail").as("ppl_bucket"))
    },

    // --------------------------------------------------------------- TEXT-18
    // Deterministic global shuffle + fixed-size sharding — the final stage
    // of training prep: order the corpus by a stable content-independent
    // hash (reproducible "random" order), then cut it into equal shards
    // with a position within each shard. The naive form is
    // ROW_NUMBER() OVER (ORDER BY hash) — a GLOBAL sort that Spark executes
    // in ONE partition, the canonical scale-killer. Instead the global rank
    // is computed distributively, bit-identically: the hash's first hex
    // char defines 16 range buckets (bucket-major order == hash order);
    // per-bucket counts make a 16-row offsets dim (broadcast); the rank is
    // the bucket-local ROW_NUMBER plus the bucket's cumulative offset. One
    // bucket-window shuffle over the data, never a single-partition sort —
    // at 100 TB widen the prefix (2 hex chars = 256 buckets, 3 = 4096) to
    // match the cluster. The oracle states the SAME result with the naive
    // global window, proving the distributed form exact.
    QueryDef("t_shards",
      """WITH r AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents),
        |g AS (
        |  SELECT doc_id, hk,
        |    ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1 AS grank FROM r)
        |SELECT doc_id, hk,
        |  CAST(grank // 64 AS BIGINT) AS shard,
        |  CAST(grank % 64 AS BIGINT) AS pos_in_shard
        |FROM g""".stripMargin) { (s, dir) =>
      val shardSize = 64
      val r = Graft.table(s, dir, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hk"))
        .withColumn("bkt", substring(col("hk"), 1, 1))
      // 16-row bucket dim; the no-partition window is over 16 rows, not data
      val offsets = r.groupBy("bkt").agg(count(lit(1)).as("c"))
        .withColumn("off",
          coalesce(
            sum("c").over(Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select("bkt", "off")
      val byBkt = Window.partitionBy("bkt").orderBy(col("hk"), col("doc_id"))
      r.join(broadcast(offsets), "bkt")
        .withColumn("grank", col("off") + row_number().over(byBkt) - 1)
        .select(col("doc_id"), col("hk"),
          expr(s"grank div $shardSize").cast("long").as("shard"),
          (col("grank") % shardSize).cast("long").as("pos_in_shard"))
    },

    // --------------------------------------------------------------- TEXT-20
    // Temperature-weighted mixture sampling (the DoReMi / multilingual-
    // upsampling shape): source s gets budget share ∝ count^τ with τ=0.5 —
    // sqrt flattening upsamples low-resource sources relative to
    // proportional sampling (t_stratified_sample) and, unlike the hard
    // per-source cap (t_domain_cap), still scales with source size. All
    // weight arithmetic is exact integral: w_s = floor(sqrt(c_s)) (IEEE
    // sqrt is correctly rounded in both engines), allocation is integer
    // floor-div against the broadcast weight total, and the per-source
    // pick is the n_keep smallest md5(doc_id) — a reproducible pseudo-
    // random sample, engine-portable. ONE source-window shuffle over the
    // data + two tiny source-sized dims; the dynamic per-group limit is
    // the data-dependent generalization of the domain cap.
    QueryDef("t_mix",
      """WITH c AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
        |w AS (SELECT source, c, CAST(floor(sqrt(c)) AS BIGINT) AS w FROM c),
        |tot AS (SELECT SUM(w) AS wt FROM w),
        |alloc AS (
        |  SELECT source, w AS source_weight,
        |    CAST((200 * w) // (SELECT wt FROM tot) AS BIGINT) AS n_keep
        |  FROM w),
        |r AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
        |  FROM documents)
        |SELECT r.doc_id, r.source, r.pick_rank, a.n_keep, a.source_weight
        |FROM r JOIN alloc a ON r.source = a.source
        |WHERE r.pick_rank <= a.n_keep""".stripMargin) { (s, dir) =>
      val d = Graft.table(s, dir, "documents")
      val w = d.groupBy("source").agg(count(lit(1)).as("c"))
        .select(col("source"), floor(sqrt(col("c"))).cast("long").as("w"))
      val tot = w.agg(sum("w").as("wt"))
      val alloc = w.crossJoin(broadcast(tot))
        .select(col("source"), col("w").as("source_weight"),
          expr("(200 * w) div wt").as("n_keep"))
      val bySrc = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      // no broadcast hint on alloc: one row per source can be a wide dim
      // for a web corpus — AQE elects broadcast when it actually fits
      // (same reasoning as t_domain_cap's totals join)
      d.select(col("doc_id"), col("source"))
        .withColumn("pick_rank", row_number().over(bySrc))
        .join(alloc, "source")
        .filter(col("pick_rank") <= col("n_keep"))
        .select("doc_id", "source", "pick_rank", "n_keep", "source_weight")
    },

    // --------------------------------------------------------------- TEXT-21
    // Bigram language model estimation (the KenLM counting core): adjacent
    // word pairs → count c12, predecessor mass c1, conditional probability
    // P(w2|w1) = c12/c1; top-100 bigrams. The adjacency expansion happens
    // INSIDE codegen (indexed transform over the token array — no
    // positional self-join of an exploded corpus, which would shuffle
    // |tokens| rows twice); the only corpus-sized exchange is the
    // map-side-combinable (w1,w2) count. c1 comes from a window over the
    // aggregated bigram VOCABULARY (≪ corpus), not a second scan, and the
    // top-k is TakeOrderedAndProject — no global sort materialization.
    // P is one int/int IEEE division: bit-identical across engines.
    QueryDef("t_bigram_lm",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pairs AS (
        |  SELECT t[g.i] AS w1, t[g.i + 1] AS w2
        |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
        |c AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
        |p AS (SELECT w1, w2, c12,
        |  CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1 FROM c)
        |SELECT w1, w2, c12, c1, c12 / c1 AS p_cond
        |FROM p ORDER BY c12 DESC, w1, w2 LIMIT 100""".stripMargin) { (s, dir) =>
      val pairs = docs(s, dir)
        .select(explode(expr(
          """transform(slice(tk, 1, size(tk) - 1),
            |  (w, i) -> struct(w AS w1, element_at(tk, i + 2) AS w2))"""
            .stripMargin)).as("pr"))
        .select("pr.w1", "pr.w2")
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .withColumn("c1", sum("c12").over(Window.partitionBy("w1")))
        .withColumn("p_cond", col("c12") / col("c1"))
        .orderBy(col("c12").desc, col("w1"), col("w2"))
        .limit(100)
        .select("w1", "w2", "c12", "c1", "p_cond")
    },

    // --------------------------------------------------------------- TEXT-22
    // The PERSISTED inverted-index form of t_bm25 (pipeline/TextIndexStore —
    // AnnStore's stored-serving idiom applied to lexical retrieval): the
    // postings table is bucketed on term, a probe's `term IN (...)` prunes
    // buckets at planning time, per-term df is a window over the PRUNED
    // posting lists, and scoring reproduces t_bm25's arithmetic exactly —
    // so the stored path sits under the same oracle restricted to documents
    // containing at least one probe term (bm25 > 0 ⟺ some tf > 0: every
    // present-term contribution is strictly positive in this non-log idf
    // variant), top-20. Store cache keyed on the source data version, like
    // the dedup and ANN stores: a regenerated documents.parquet rebuilds.
    QueryDef("t_bm25s",
      s"""WITH base AS ($bm25Sql)
         |SELECT doc_id, bm25 FROM base WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      val fp = graft.core.Graft.dataFingerprint(s, s"$dir/documents.parquet")
      val root = graft.core.StoreRoots.rootFor("graft_text_store", "v2", dir, fp)
      graft.pipeline.TextIndexStore.ensureBuilt(s, root,
        Graft.table(s, dir, "documents"))
      graft.pipeline.TextIndexStore.probe(s, root,
        Seq("join", "vector", "stream"), k = 20)
    },

    // -------------------------------------------------------------- TEXT-22b
    // Per-document keyword extraction — top-3 TF-IDF terms per doc, the
    // tagging/indexing step a corpus card or faceted search needs. The idf
    // is the RATIONAL N/df (one exact-int product, one IEEE division —
    // libm log is never trusted across engines; same ranking), stopwords
    // and 1-char tokens drop before counting, and the per-doc top-3 uses a
    // (score DESC, term) total order. Cost shape: one (doc, term) count
    // shuffle (map-side combinable), a vocabulary-sized df join, a 1-row
    // broadcast N, and a per-doc window whose partitions are doc-sized —
    // nothing global, everything keyed, scales with the corpus.
    QueryDef("t_keywords",
      s"""WITH tf AS (
         |  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
         |  WHERE length(t) >= 2 AND t NOT IN ($stopsSqlList)
         |  GROUP BY doc_id, t),
         |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS tfidf
         |  FROM tf JOIN df ON df.term = tf.term, n)
         |SELECT doc_id, rank, term, tf, df, tfidf FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term) AS rank
         |  FROM scored)
         |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      // tf feeds BOTH the scored join and the df rollup — one persisted
      // materialization instead of two explode+count passes
      val tf = Graft.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) >= 2 && !col("term").isin(stops: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).cast("long").as("tf"))
        .persist()
      val df = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
      val n = Graft.table(s, dir, "documents")
        .agg(count(lit(1)).cast("long").as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      CacheScope.sealResult(
        tf.join(df, "term")
          .crossJoin(broadcast(n))
          .withColumn("tfidf", (col("tf") * col("n_docs")).cast("double") / col("df"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("doc_id", "rank", "term", "tf", "df", "tfidf"),
        tf)
    },

    // --------------------------------------------------------------- TEXT-23
    // Sliding-window document chunking — the RAG/embedding prep step: each
    // document splits into 32-token windows on a 24-token stride (25%
    // overlap), each chunk carrying its provenance (doc_id, chunk ordinal,
    // 1-based token offset) and a content digest. Pure per-row generator
    // arithmetic (sequence → explode → slice), so at 100 TB it runs
    // map-side inside whole-stage codegen with zero shuffles — the chunk
    // stream feeds the embedding/ANN spine partitioned however its consumer
    // wants. Spark `slice`/DuckDB `list_slice` both cap at the array end,
    // so the ragged tail chunk needs no special case.
    QueryDef("t_chunk",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |  CAST((g.i - 1) // 24 AS INT) AS chunk_idx,
        |  CAST(g.i AS INT) AS start_tok,
        |  CAST(len(list_slice(tk, CAST(g.i AS INT), CAST(g.i AS INT) + 31)) AS INT) AS n_tok,
        |  length(array_to_string(list_slice(tk, CAST(g.i AS INT), CAST(g.i AS INT) + 31), ' ')) AS n_chars,
        |  md5(array_to_string(list_slice(tk, CAST(g.i AS INT), CAST(g.i AS INT) + 31), ' ')) AS chunk_md5
        |FROM t, UNNEST(generate_series(1, len(tk), 24)) AS g(i)""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("tk"),
          explode(expr("sequence(1, size(tk), 24)")).as("i"))
        .withColumn("chunk", expr("slice(tk, i, 32)"))
        .select(
          col("doc_id"),
          expr("cast((i - 1) div 24 as int)").as("chunk_idx"),
          col("i").cast("int").as("start_tok"),
          size(col("chunk")).as("n_tok"),
          length(array_join(col("chunk"), " ")).as("n_chars"),
          md5(array_join(col("chunk"), " ")).as("chunk_md5"))
    },

    // --------------------------------------------------------------- TEXT-24
    // Hashed-n-gram importance scoring for data selection — the DSIR shape
    // (Xie et al. 2023, "Data Selection for Language Models via Importance
    // Resampling"): featurize every token into one of 256 hash buckets,
    // estimate the bucket distribution of a TARGET slice (here the de/fr
    // strata) and of the RAW corpus with add-one smoothing, score each
    // document by its mean per-token importance ratio, and keep the top
    // 100. Two deviations from the paper, both deliberate: the per-bucket
    // statistic is the smoothed probability RATIO summed per token rather
    // than its log (log-sum needs libm `ln`, whose last-ulp rounding is not
    // pinned across engines — the ratio is one exact-int division, so the
    // score is bit-identical in Spark and DuckDB), and selection is
    // deterministic top-k rather than Gumbel sampling (reproducibility at
    // any parallelism). Cost shape at 100 TB: ONE pass over the exploded
    // token stream into a (doc_id, lang, bucket) partial-agg (the only
    // corpus-sized shuffle — map-side combinable), bucket stats reduce to
    // ≤256 rows broadcast back over the per-doc rollup, the per-doc sum
    // folds a ≤256-entry sorted list (deterministic IEEE order), and the
    // top-k is TakeOrderedAndProject, never a global sort.
    QueryDef("t_dsir", {
      val bucket = (c: String) =>
        s"(instr('0123456789abcdef', substr(md5($c), 1, 1)) - 1) * 16" +
          s" + (instr('0123456789abcdef', substr(md5($c), 2, 1)) - 1)"
      s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents),
         |db AS (
         |  SELECT doc_id, lang, ${bucket("t")} AS bucket, COUNT(*) AS n_b
         |  FROM tok GROUP BY doc_id, lang, bucket),
         |stats AS (
         |  SELECT bucket,
         |    CAST(COALESCE(SUM(n_b) FILTER (WHERE lang IN ('de', 'fr')), 0) AS BIGINT) AS ct,
         |    CAST(SUM(n_b) AS BIGINT) AS cr
         |  FROM db GROUP BY bucket),
         |tot AS (
         |  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr FROM stats),
         |w AS (
         |  SELECT bucket,
         |    CAST((ct + 1) * (SELECT nr + 256 FROM tot) AS DOUBLE)
         |      / CAST((cr + 1) * (SELECT nt + 256 FROM tot) AS DOUBLE) AS ratio
         |  FROM stats),
         |score AS (
         |  SELECT doc_id, lang,
         |    list_reduce(
         |      list_prepend(0.0::DOUBLE, list(n_b * ratio ORDER BY bucket)),
         |      (a, x) -> a + x) / CAST(SUM(n_b) AS DOUBLE) AS dsir_score
         |  FROM db JOIN w USING (bucket) GROUP BY doc_id, lang)
         |SELECT doc_id, lang, dsir_score
         |FROM score ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin
    }) { (s, dir) =>
      val bucketCol = expr(
        "(instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16" +
          " + (instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1)")
      // one corpus pass: the (doc, bucket) rollup feeds the bucket stats
      // AND the per-doc scoring — cached (≤256 rows per doc, ≪ the
      // exploded token stream) so neither branch re-reads the corpus
      val db = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(col("tk")).as("t"))
        .withColumn("bucket", bucketCol)
        .groupBy("doc_id", "lang", "bucket")
        .agg(count(lit(1)).as("n_b"))
        .persist()
      val stats = db.groupBy("bucket").agg(
        coalesce(sum(when(col("lang").isin("de", "fr"), col("n_b"))), lit(0L)).as("ct"),
        sum("n_b").cast("long").as("cr"))
      val tot = stats.agg(
        sum("ct").cast("long").as("nt"), sum("cr").cast("long").as("nr"))
      val w = stats.crossJoin(broadcast(tot)).select(
        col("bucket"),
        (((col("ct") + 1) * (col("nr") + 256)).cast("double") /
          ((col("cr") + 1) * (col("nt") + 256)).cast("double")).as("ratio"))
      CacheScope.sealResult(
        db.join(broadcast(w), "bucket")
          .groupBy("doc_id", "lang")
          .agg(
            collect_list(struct(col("bucket"), (col("n_b") * col("ratio")).as("contrib"))).as("lst"),
            sum("n_b").cast("long").as("ntok"))
          .select(col("doc_id"), col("lang"),
            (expr("aggregate(transform(array_sort(lst), p -> p.contrib), cast(0 as double), (a, x) -> a + x)")
              / col("ntok").cast("double")).as("dsir_score"))
          .orderBy(col("dsir_score").desc, col("doc_id"))
          .limit(100),
        db)
    },

    // ----------------------------------------------------------------- T-23
    // Frequency-of-frequencies spectrum per source (Good-Turing's N_c
    // table, decimal-bucketed) — the corpus-health profile behind
    // smoothing choices and "is this source natural language?" checks: a
    // natural corpus has a fat hapax band and a long magnitude tail; a
    // templated/bot source collapses to a few magnitude buckets. The
    // bucket is the count's DIGIT LENGTH (⌊log10⌋+1) — exact integer
    // string length in both engines, no libm log whose ulp isn't pinned.
    // Cost: one token rollup (the t_unigram shuffle), then a
    // vocabulary-sized regroup — scale-free above the first shuffle.
    QueryDef("t_freq_spectrum",
      """WITH words AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |freq AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
        |         FROM words GROUP BY 1, 2)
        |SELECT source, CAST(length(CAST(cnt AS VARCHAR)) AS INT) AS mag,
        |  CAST(COUNT(*) AS BIGINT) AS n_types, CAST(SUM(cnt) AS BIGINT) AS n_tokens
        |FROM freq GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Graft.table(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).cast("long").as("cnt"))
        .groupBy(col("source"),
          length(col("cnt").cast("string")).cast("int").as("mag"))
        .agg(count(lit(1)).cast("long").as("n_types"),
          sum("cnt").cast("long").as("n_tokens"))
    },

    // ----------------------------------------------------------------- T-24
    // First-seen novelty rate — per document, the fraction of its distinct
    // bigrams no EARLIER document (by ingestion order = doc_id) has
    // contributed: the marginal-information score a crawl pipeline uses to
    // decide whether a feed is still adding content or re-serving what the
    // corpus already holds (novelty decays to ~0 as a template saturates).
    // Global first-seen is one MIN-by-shingle rollup; the probe back is a
    // key join — exactly the d_exact_dedup economics on the bigram space.
    // Integer counts, one final exact bigint/bigint IEEE division.
    QueryDef("t_novelty",
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))) AS s
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
        |per AS (
        |  SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |    CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM sh JOIN first f ON f.s = sh.s GROUP BY sh.doc_id)
        |SELECT doc_id, n_shingles, n_novel,
        |  CAST(n_novel AS DOUBLE) / n_shingles AS novelty
        |FROM per""".stripMargin) { (s, dir) =>
      val sh = Graft.table(s, dir, "documents")
        .withColumn("tk", split(col("text"), " "))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(sequence(1, size(tk) - 1),
            |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1))))""".stripMargin))
          .as("s"))
        .persist() // feeds the first-seen rollup AND the probe join
      val first = sh.groupBy("s").agg(min("doc_id").as("first_doc"))
      CacheScope.sealResult(
        sh.join(first, "s")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1).otherwise(0))
              .cast("long").as("n_novel"))
          .withColumn("novelty",
            col("n_novel").cast("double") / col("n_shingles")),
        sh)
    }
  )
}
