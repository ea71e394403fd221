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
}
