package graft.pipeline

import graft.core.Lakehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED inverted index that makes lexical (BM25) retrieval
  * O(probed terms) instead of O(corpus) per query — [[AnnStore]]'s stored-
  * serving idiom applied to text. `t_bm25` recomputes term statistics by
  * scanning every document per query batch; a serving deployment builds the
  * index ONCE and each query touches only its terms' posting lists:
  *
  *   - stats    (n_docs, total_len)            1-row parquet, broadcast.
  *   - postings (term, doc_id, tf, dl)         [[Lakehouse.ctasBucketed]]
  *     on `term`, sorted by term — a probe's `term IN (...)` filter prunes
  *     whole buckets at planning time (SelectedBucketsCount), so the scan
  *     reads the probed terms' files, never the corpus.
  *
  * Per-term document frequency is NOT a third table: the pruned postings
  * scan of a term is exactly its posting list, so `df = COUNT(*) OVER
  * (PARTITION BY term)` on the already-pruned rows — one window over
  * O(probed postings), and it can never drift from the list it counts.
  * Document length rides inside each posting (dl), so scoring needs no
  * document-table join.
  *
  * Scoring matches `t_bm25`'s arithmetic exactly (k1=1.2, b=0.75 in the
  * same fixed association), and a document's BM25 only receives
  * contributions from terms it contains — absent terms contribute 0 — so
  * the stored path stays under the same oracle restricted to documents
  * with at least one probe term.
  *
  * At 100 TB: postings is the one corpus-sized artifact (|tokens| rows
  * before aggregation, |distinct (term,doc)| after — built with one
  * explode + map-side-combinable count); stop-word-like mega-terms skew
  * their buckets, which is why the bucket count scales with the corpus
  * and the probe path never groups BY term across buckets (the window
  * stays inside the pruned scan's partitioning).
  */
object TextIndexStore {

  val Buckets = 32

  private def ident(root: String): String =
    root.replaceAll("[^a-zA-Z0-9]", "_").toLowerCase
  def postingsTable(root: String): String = "text_postings_" + ident(root)
  def postingsPath(root: String): String = s"$root/text/postings"
  def statsPath(root: String): String = s"$root/text/stats"

  /** documents(doc_id, text) → postings rows (term, doc_id, tf, dl). */
  def toPostings(documents: DataFrame): DataFrame = {
    val tk = documents
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("dl", size(col("tk")).cast("long"))
    tk.select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "tf", "dl")
  }

  /** Idempotent bootstrap: re-register an existing on-disk index on a fresh
    * session; build from `documents` only when absent. Returns true when
    * (re)built. */
  def ensureBuilt(spark: SparkSession, root: String,
      documents: => DataFrame): Boolean = {
    val havePostings = Lakehouse.ensureBucketedTable(spark, postingsTable(root),
      postingsPath(root), "term", Buckets, sortCols = Seq("term"))
    if (havePostings && Lakehouse.tableExists(spark, statsPath(root)))
      return false
    val docs = documents.select(col("doc_id"), col("text"))
    val stats = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
      // coalesce: a stream bootstraps the store from an EMPTY frame (sum
      // over nothing is null, and a null total_len would poison the first
      // real stats merge)
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("dl"), lit(0L)).as("total_len"))
    Lakehouse.ctas(stats, statsPath(root))
    Lakehouse.ctasBucketed(toPostings(docs), postingsTable(root), "term", Buckets,
      sortCols = Seq("term"), path = Some(postingsPath(root)))
    true
  }

  /** O(delta) document admission: tokenize ONLY the new documents,
    * bucket-append their postings, and fold their counts into stats.
    * Replay-safe: a re-delivered doc_id must not double its postings (a
    * duplicated posting would double the doc's tf in every probe). */
  def appendDocuments(spark: SparkSession, root: String, newDocs: DataFrame): Unit = {
    val fresh = newDocs.join(
      spark.table(postingsTable(root)).select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
    // Collect the stats delta BEFORE the postings insert: `fresh` is a lazy
    // anti-join AGAINST the postings table, and the insert invalidates any
    // cache of plans reading that table — a post-insert re-evaluation would
    // see every delta doc as already present and fold in a zero delta
    // (while the postings write, running first, would have admitted them:
    // stats and postings silently diverge).
    val Seq(d) = fresh
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("d_docs"), coalesce(sum("dl"), lit(0L)).as("d_len"))
      .collect().toSeq
    Lakehouse.appendBucketed(toPostings(fresh), postingsTable(root), "term",
      Buckets, sortCols = Seq("term"))
    val Seq(o) = Lakehouse.read(spark, statsPath(root)).collect().toSeq
    val spark2 = spark
    import spark2.implicits._
    Lakehouse.ctas(
      Seq((o.getLong(0) + d.getLong(0), o.getLong(1) + d.getLong(1)))
        .toDF("n_docs", "total_len"),
      statsPath(root))
  }

  /** BM25 top-k over the stored index for a literal term set: bucket-pruned
    * postings scan → per-term df window → per-doc score sum → top-k.
    * Exactly `t_bm25`'s arithmetic for every returned document. */
  def probe(spark: SparkSession, root: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    val stats = Lakehouse.read(spark, statsPath(root))
    val posts = spark.table(postingsTable(root))
      .filter(col("term").isin(terms: _*))
    val withDf = posts
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .crossJoin(broadcast(stats))
    val scored = withDf
      .withColumn("bden",
        lit(0.25) + lit(0.75) * col("dl") * col("n_docs") / col("total_len"))
      .withColumn("contrib",
        col("tf") * lit(2.2) / (col("tf") + lit(1.2) * col("bden")) *
          ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    // per-doc sum: terms are scored left-to-right in the probe's term order
    // via a pivot-style conditional sum so the float association matches
    // the oracle's fixed t1 + (t2 + t3) exactly
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("contrib")).otherwise(lit(0.0))).as(s"c$i")
    }
    val byDoc = scored.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
    val assoc = terms.indices.reverse
      .map(i => col(s"c$i"))
      .reduce((r, l) => l + r) // builds c0 + (c1 + (c2 ...))
    byDoc.select(col("doc_id"), assoc.as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
