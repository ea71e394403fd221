package graft

import graft.queries.CacheScope
import org.apache.spark.sql.functions._

/** Structural enforcement of the repo's cache discipline (round-8 verdict
  * items 2 & 3): every query body that `persist()`s an intermediate must
  * seal its result (materialize into a result-sized cache) and release the
  * intermediates before returning — `CacheScope.sealResult` — so a long
  * session (the 119-query bench runs every query at least twice) never
  * accumulates cached blocks until LRU-eviction pressure distorts timings.
  *
  * The contract checked here: after running a query, materializing its
  * result, and dropping the result's own cache, the session holds NO
  * cached RDDs beyond what existed before the query ran. The only standing
  * exemption is the flagship family's wallet_transactions stand-in
  * (PipelineQueries.pricedFixture), a deliberate cross-query shared
  * fixture keyed by logical plan — its queries are not in this list, and
  * the before/after snapshot discipline would tolerate it anyway.
  */
class CacheDisciplineSpec extends SparkSpec {

  /** Queries with internal persists (every one named in the round-8 audit)
    * plus the sealed sketch family that already followed the discipline. */
  private val checked = Seq(
    "d_minhash_lsh", "d_lsh_verified", "d_split_leakage", "d_containment", "d_dup_clusters", "d_ngram_jaccard",
    "d_incremental_dedup", "d_semantic_dedup", "d_semantic_dedup_hier", "d_simhash_hamming",
    "d_substr", "a13_cm", "a11_kmv", "a16_kx", "a15_hll",
    "ann_ivf_kmeans", "c_kmeans", "t_contamination", "t_bpe3", "t_bpe_apply", "t_bpe_fertility", "t_keywords",
    "g_pr", "g_cc", "g_butterfly", "g_kcore", "curation_funnel", "t_dsir", "mm_phash", "a23_funnel", "a24_cohort",
    "ann_label_consistency", "dq_chi2_cells", "d_source_overlap")

  for (name <- checked) {
    test(s"$name leaves no cached RDD blocks behind") {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val out = SparkEntry.queries(name)(spark, sf)
      out.count() // the caller's terminal action
      out.unpersist(blocking = true) // drop the query's own result cache
      val leaked = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} cached RDD(s): " +
          leaked.values.map(r => s"[${r.id}] ${r.name}").mkString("; "))
    }
  }

  test("CacheScope.freeCheckpoint releases a localCheckpoint's blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = spark.range(100).select(col("id"), (col("id") * 2).as("v"))
      .localCheckpoint(true)
    assert(sc.getPersistentRDDs.exists { case (id, _) => !before(id) },
      "eager localCheckpoint should register a persistent RDD")
    CacheScope.freeCheckpoint(df.select(col("v"))) // works through projections
    assert(sc.getPersistentRDDs.forall { case (id, _) => before(id) },
      "freeCheckpoint should unregister the checkpointed RDD")
  }
}
