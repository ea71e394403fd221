package graft

/** Registry-wide smoke: every declared operator query runs at sf0.001,
  * returns rows, and the contract between `queries` and `oracleSql` holds
  * (names line up; per-query value parity is the driver's DuckDB diff —
  * tools/verify_local.py — not re-implemented here). */
class QueriesSpec extends SparkSpec {

  test("registry has no duplicate names and oracles only for declared queries") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // all but the explicitly nondeterministic ops carry an oracle
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) == Set("f_uuid_tag"))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs non-empty at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows — trivially passes the oracle")
    }
  }

  test("dedup semantics: d_exact_dedup keeps one representative per content key") {
    val out = SparkEntry.queries("d_exact_dedup")(spark, sf)
    import org.apache.spark.sql.functions._
    val dupKeys = out.groupBy("content_key").count().filter(col("count") > 1).count()
    assert(dupKeys == 0)
  }

  test("ann recall: lsh bucket results are a subset of brute-force candidates' quality") {
    // for each query id, the lsh top-1 cosine can never exceed brute-force top-1
    import org.apache.spark.sql.functions._
    val bf = SparkEntry.queries("ann_bruteforce_topk")(spark, sf)
      .filter(col("rank") === 1).select(col("q_id"), col("cos_sim").as("bf_cos"))
    val lsh = SparkEntry.queries("ann_lsh_bucket")(spark, sf)
      .filter(col("rank") === 1).select(col("q_id"), col("cos_sim").as("lsh_cos"))
    val bad = bf.join(lsh, "q_id").filter(col("lsh_cos") > col("bf_cos") + 1e-12).count()
    assert(bad == 0)
  }

  test("repetition fractions are valid ratios and a degenerate doc maxes out") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_repetition")(spark, sf)
    val bad = out.filter(
      col("top_word_frac") < 0 || col("top_word_frac") > 1 ||
        col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1).count()
    assert(bad == 0)
    // every doc's most-frequent-word share is at least 1/n_words > 0
    assert(out.filter(col("top_word_frac") <= 0).count() == 0)
  }

  test("domain cap: at most 15 docs per source, longest preferred") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_domain_cap")(spark, sf)
    val over = out.groupBy("source").count().filter(col("count") > 15).count()
    assert(over == 0)
    // a dropped doc is never longer than a kept doc of the same source
    // (ties on n_chars can fall either side — doc_id breaks them)
    val docs = graft.core.Graft.table(spark, sf, "documents")
    val dropped = docs.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(max("n_chars").as("max_dropped"))
    val minKept = out.groupBy("source").agg(min("n_chars").as("min_kept"))
    val bad = minKept.join(dropped, "source")
      .filter(col("max_dropped") > col("min_kept")).count()
    assert(bad == 0)
  }

  test("incremental dedup ≡ full-corpus verified pairs restricted to the batch") {
    import org.apache.spark.sql.functions._
    // a batch doc is rejected by the incremental path iff the FULL
    // d_lsh_verified pair list has a verified pair whose larger id is that
    // doc — the asymmetric batch-side probe must lose no candidates
    val inc = SparkEntry.queries("d_incremental_dedup")(spark, sf)
    val cut = spark.read.parquet(s"$sf/documents.parquet")
      .agg(max("doc_id")).head.getLong(0) * 4 / 5
    val rejectedByFull = SparkEntry.queries("d_lsh_verified")(spark, sf)
      .filter(col("b_id") >= cut).select(col("b_id").as("doc_id")).distinct()
    val incRejected = inc.filter(!col("admitted")).select("doc_id")
    val diff = incRejected.except(rejectedByFull)
      .union(rejectedByFull.except(incRejected)).count()
    assert(diff == 0)
  }

  test("semantic dedup: every cell keeps its minimum vec_id") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("d_semantic_dedup")(spark, sf)
    // the smallest id in a cell has no smaller cell-mate, so it can never
    // be a dup victim — if this fails the keep-decision direction flipped
    val bad = out.groupBy("cell_id").agg(min("vec_id").as("lo"))
      .join(out, col("lo") === col("vec_id"))
      .filter(!col("is_kept")).count()
    assert(bad == 0)
  }

  test("pii scrub: no residual matches and every doc had injected pii found") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_pii_scrub")(spark, sf)
    val residual = out.filter(
      regexp_count(col("scrubbed"), lit("[a-z0-9]+@[a-z]+\\.[a-z]+")) > 0 ||
        regexp_count(col("scrubbed"), lit("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+")) > 0 ||
        regexp_count(col("scrubbed"), lit("555-[0-9]+")) > 0).count()
    assert(residual == 0)
    assert(out.filter(col("n_emails") < 1 || col("n_ips") < 1 || col("n_phones") < 1)
      .count() == 0)
  }

  test("dup clusters: labels are component-consistent (a cluster id is its own label)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("d_dup_clusters")(spark, sf)
    // pointer-jumping must fully converge: the canonical doc of every
    // cluster labels itself, and no member carries a label below it
    val canon = out.select(col("cluster_id").as("doc_id")).distinct()
      .join(out, "doc_id").filter(col("cluster_id") =!= col("doc_id")).count()
    assert(canon == 0)
  }
}
