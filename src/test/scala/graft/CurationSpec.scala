package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

/** The composed corpus-curation funnel: quality gate → exact dedup →
  * near-dup dedup → per-source cap → token packing, with dataset-card
  * accounting. Invariants, not goldens: the stages are individually
  * oracle-checked in `graft.queries`; this pins their COMPOSITION. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val result = Curation.curate(docs, maxPerSource = 15)

  test("accounting: kept + dropped = input, with no doc in both") {
    val n = docs.count()
    val kept = result.kept.select("doc_id")
    val dropped = result.dropped.select("doc_id")
    assert(kept.count() + dropped.count() == n)
    assert(kept.intersect(dropped).count() == 0)
    // the report sums back to the input count
    assert(result.report.agg(sum("n_docs")).head.getLong(0) == n)
  }

  test("every stage drops something on this corpus and reasons are typed") {
    val stages = result.dropped.select("stage").distinct()
      .as[String].collect().toSet
    assert(stages.contains("quality"))
    assert(stages.contains("domain_cap"))
    // dedup stages exist on the synthetic corpus (it carries planted dups)
    assert(stages.contains("exact_dedup") || stages.contains("near_dedup"), stages.toString)
  }

  test("kept set has no exact duplicates and respects the source cap") {
    val dupKeys = result.kept.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupKeys == 0)
    val overCap = result.kept.groupBy("source").count().filter(col("count") > 15).count()
    assert(overCap == 0)
  }

  test("chunks respect the token budget for multi-doc chunks") {
    // a chunk may exceed the budget only via its LAST doc (greedy fill
    // assigns a doc to the chunk its first token lands in); every chunk's
    // PRIOR docs fit the budget by construction
    val bad = result.kept
      .groupBy("lang", "chunk_id")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"), count(lit(1)).as("c"))
      .filter(col("c") > 1 && col("t") - col("m") > 4096L)
      .count()
    assert(bad == 0)
  }

  test("decontamination: no kept doc shares >= 3 distinct 3-grams with the benchmark") {
    val bench = docs.filter(col("doc_id") < 25)
    val r = Curation.curate(docs, maxPerSource = 15, benchmark = Some(bench))
    assert(r.dropped.filter(col("stage") === "contamination").count() > 0)
    // verify the kept set independently: recompute the overlap from scratch
    val shingles = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("tk", split(col("text"), " "))
        .filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(sequence(1, size(tk) - 2),
            |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
            |                 element_at(tk, i + 2))))""".stripMargin)).as("s"))
    val benchS = shingles(bench).select("s").distinct()
    val bad = shingles(docs.join(r.kept.select("doc_id"), "doc_id"))
      .join(benchS, "s")
      .groupBy("doc_id").agg(countDistinct(col("s")).as("n"))
      .filter(col("n") >= 3).count()
    assert(bad == 0)
    // accounting still closes with the extra stage
    assert(r.kept.count() + r.dropped.count() == docs.count())
  }

  test("curate is deterministic: two runs produce identical kept sets") {
    val again = Curation.curate(docs, maxPerSource = 15)
    assert(result.kept.exceptAll(again.kept).count() == 0)
    assert(again.kept.exceptAll(result.kept).count() == 0)
  }

  test("funnel over the persisted dedup store ≡ funnel with inline dedup, " +
      "and a second batch dedups against the first without re-signing it") {
    import graft.pipeline.DedupStore
    val root = tmpDir("curation-store")
    // one batch against an EMPTY store: verdicts must equal the inline
    // LSH pass exactly (same shingle/band construction, same verify)
    val stored = Curation.curate(docs, maxPerSource = 15, dedupStore = Some(root))
    assert(stored.kept.select("doc_id").exceptAll(result.kept.select("doc_id")).count() == 0)
    assert(result.kept.select("doc_id").exceptAll(stored.kept.select("doc_id")).count() == 0)
    val dropsOf = (r: Curation.CurationResult) => r.dropped
      .groupBy("stage").count().as[(String, Long)].collect().toMap
    assert(dropsOf(stored) == dropsOf(result))

    // batch 2: fresh ids above batch 1, one doc duplicating a KEPT
    // batch-1 doc verbatim — only the stored index can catch it (inline
    // batch-local dedup has nothing to compare against)
    val keeper = result.kept.orderBy("doc_id")
      .select("text", "lang", "source").head()
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val batch2 = Seq(
      (maxId + 1, keeper.getString(0), keeper.getString(1), keeper.getString(2)),
      (maxId + 2, (0 until 30).map(i => s"zq$i").mkString(" "), "en", "siteZ"))
      .toDF("doc_id", "text", "lang", "source")
    // snapshot the index BEFORE: batch 2 must only APPEND to it
    val bandFiles = new java.io.File(DedupStore.bandsPath(root))
      .listFiles().filter(_.getName.startsWith("part-"))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val r2 = Curation.curate(batch2, maxPerSource = 15, dedupStore = Some(root))
    val nearDropped = r2.dropped.filter(col("stage") === "near_dedup")
      .select("doc_id").as[Long].collect().toSet
    assert(nearDropped == Set(maxId + 1),
      s"the cross-batch duplicate must drop against the stored index: $nearDropped")
    assert(r2.kept.filter(col("doc_id") === maxId + 2).count() == 1)
    // batch 1's signature files were probed in place, never rewritten
    val bandFilesAfter = new java.io.File(DedupStore.bandsPath(root))
      .listFiles().filter(_.getName.startsWith("part-"))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    assert(bandFiles.subsetOf(bandFilesAfter),
      "admitting batch 2 must not rewrite batch 1's stored signatures")
  }

  test("a doc dropped by a later stage is not indexed: its near-dup can still enter") {
    import graft.pipeline.Curation
    val root = tmpDir("curation-capdrop")
    def words(seed: String, n: Int) = (0 until n).map(i => s"$seed$i").mkString(" ")
    // source 'flood' floods past cap=2: doc 3 (shortest) is capped out
    val b1 = Seq(
      (1L, words("aa", 40), "en", "flood"),
      (2L, words("bb", 35), "en", "flood"),
      (3L, words("cc", 25), "en", "flood"),
      (4L, words("dd", 30), "en", "solo"))
      .toDF("doc_id", "text", "lang", "source")
    val r1 = Curation.curate(b1, maxPerSource = 2, dedupStore = Some(root))
    assert(r1.dropped.filter(col("stage") === "domain_cap")
      .select("doc_id").as[Long].collect().toSeq == Seq(3L))
    // batch 2 re-submits the capped doc's content from an uncrowded
    // source. That content is in NO admitted document — indexing it at
    // the near-dup stage (instead of after the cap) would make it vanish
    // from the funnel forever even though the cap was the only objection.
    val b2 = Seq((10L, words("cc", 25), "en", "fresh"))
      .toDF("doc_id", "text", "lang", "source")
    val r2 = Curation.curate(b2, maxPerSource = 2, dedupStore = Some(root))
    assert(r2.dropped.filter(col("stage") === "near_dedup").count() == 0,
      "capped doc's signature leaked into the index")
    assert(r2.kept.filter(col("doc_id") === 10L).count() == 1)
  }
}
