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
      val norm = trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " "))
      Graft.table(s, dir, "documents")
        .select(col("doc_id"), md5(norm).as("norm_key"), length(norm).as("norm_len"))
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
    }
  )
}
