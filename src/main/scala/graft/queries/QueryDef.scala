package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark implementation over the synthetic
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle query.
  * Names key into SURVEY.md §2's operator inventory.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
}

/** The repo-wide cache discipline for query bodies that `persist()`
  * intermediates consumed by several branches of the result plan (self-join
  * sides, sketch + verification branches, funnel forks): a query function
  * returns a LAZY frame, so an intermediate cache cannot be released before
  * the caller's terminal action — unless the result is materialized EAGERLY
  * into its own (result-sized) cache first. `sealResult` is that
  * materialize-then-release idiom in one place; CacheDisciplineSpec asserts
  * that after running each such query and dropping its result cache, zero
  * cached blocks remain in the session. The only exemptions are declared
  * shared fixtures (the flagship queries' wallet_transactions stand-in,
  * which deliberately persists across queries keyed by logical plan) and
  * the returned result caches themselves, which the caller releases.
  */
private[graft] object CacheScope {

  /** Materialize `result` into its own cache (one eager count), then
    * release the intermediate caches it was derived from. The extra count
    * is a pass over the RESULT (already small by construction for these
    * queries), not over the inputs — the intermediates are read exactly
    * once, and long sessions (the 119-query bench) no longer accumulate
    * per-invocation cached blocks until LRU pressure. */
  def sealResult(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist()
    out.count()
    intermediates.foreach(_.unpersist())
    out
  }

  /** An eager `localCheckpoint` as the stage boundary of an iterative or
    * multi-stage query (r19, guide §5): unlike persist+count, every
    * downstream plan then starts from a FLAT `LogicalRDD` instead of
    * re-embedding (and re-analyzing, re-optimizing and re-codegen-ing)
    * the full upstream lineage under each consumer — the growth that
    * made the unrolled-superstep family's round-k plans carry k copies
    * of the graph build (and g_bfs's union-bearing rounds 2^k copies).
    * The traded-away property is recompute-on-block-loss, which the
    * single-JVM bench/oracle execution model never exercises; on a
    * cluster a lost executor re-runs the query.
    *
    * Constraint propagation is disabled around the cut: Spark 4.1's
    * `LogicalRDD.fromDataset` rewrites the optimized plan's constraints
    * through a union's attribute map and throws NoSuchElementException
    * on union-bearing superstep plans (the g_bfs/g_ppr shape). The
    * checkpoint boundary keeps no constraints either way. */
  def stageCheckpoint(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.constraintPropagation.enabled"
    val old = conf.get(key)
    conf.set(key, "false")
    try df.localCheckpoint(eager = true) finally conf.set(key, old)
  }

  /** sealResult for checkpoint-staged queries: materialize the result
    * into its own (small) cache, then free every stage checkpoint's
    * blocks so the long bench session accumulates nothing. */
  def sealCheckpoints(result: DataFrame, checkpointed: DataFrame*): DataFrame = {
    val out = result.persist()
    out.count()
    checkpointed.foreach(freeCheckpoint)
    out
  }

  /** Release the storage behind an (eager) `localCheckpoint`ed frame — or
    * any frame derived from one. `DataFrame.unpersist` only clears
    * CacheManager entries; a local checkpoint's RDD blocks are otherwise
    * held until the ContextCleaner notices the dropped reference, so an
    * iterative query (pointer-jumping label propagation) would stack one
    * dead |V|-row checkpoint per round for the rest of the session. */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}


/** The reference's deterministic event-order key: timestamp, then a CASE
  * priority on type, then id (ethereum_wallet_features.sql:16-39) — ONE
  * home for the Column and SQL forms, which must stay byte-equivalent
  * for the window family and the flagship programs to tie-break
  * identically. */
private[graft] object EventOrder {
  val typePriority: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, when}
    when(col("event_type") === "signup", 1)
      .when(col("event_type") === "purchase", 2)
      .when(col("event_type") === "click", 3)
      .otherwise(4)
  }
  val typePrioritySql: String =
    """CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2
      |              WHEN 'click' THEN 3 ELSE 4 END""".stripMargin
}

/** Shared embedding-parity primitives (used by the dedup and ANN queries):
  * quantize float vectors to BIGINT (floor(x*1e6)) so dot products and
  * norms are exact integer arithmetic — bit-identical across engines and
  * order-independent at any parallelism. */
private[graft] object EmbeddingParity {
  val quantSql: String =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  val quantExpr: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions
      .expr("transform(embedding, x -> bigint(floor(cast(x as double) * 1000000)))")
}

/** The FLAT centroid-blocking semantic-dedup spine, single-sourced for
  * every vector family that rides it (text embeddings in
  * `d_semantic_dedup`, media vectors in `mm_embed_dup`): stride-sampled
  * codebook → broadcast argmax cell assignment (deterministic
  * (cosine DESC, cid) order) → within-cell pairwise exact-integer cosine
  * at `tau` → per-id keep flag. One broadcast cross-join + per-cell
  * pairs, never all-pairs; the hierarchical variant for extreme N lives
  * in `d_semantic_dedup_hier`. */
private[graft] object CentroidBlockDedup {
  import org.apache.spark.sql.functions._

  /** `n` must carry (`idCol`, qv: array<bigint>, nq: bigint) and the
    * session must have `long_dot` registered. Returns (`idCol`, cell_id,
    * is_kept), sealed — no intermediate caches survive the call. */
  def apply(n: org.apache.spark.sql.DataFrame, idCol: String, stride: Long,
      tau: Double): org.apache.spark.sql.DataFrame = {
    val cent = n.filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("cid"), col("qv").as("c_qv"), col("nq").as("c_nq"))
    val centCos = expr("long_dot(qv, c_qv)").cast("double") /
      (sqrt(col("nq").cast("double")) * sqrt(col("c_nq").cast("double")))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("c_cos").desc, col("cid"))
    // persist(): the assignment feeds both pair sides and the final
    // keep-flag projection — three consumers of the corpus x centroid
    // cross-join + window otherwise re-executed per consumer
    val assign = n.crossJoin(broadcast(cent))
      .withColumn("c_cos", centCos)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cid"), col("qv"), col("nq"))
      .persist()
    val a = assign.select(col(idCol).as("a_id"), col("cid"),
      col("qv").as("a_qv"), col("nq").as("a_nq"))
    val b = assign.select(col(idCol).as("b_id"), col("cid").as("b_cid"),
      col("qv").as("b_qv"), col("nq").as("b_nq"))
    val cos = expr("long_dot(a_qv, b_qv)").cast("double") /
      (sqrt(col("a_nq").cast("double")) * sqrt(col("b_nq").cast("double")))
    val dups = a.join(b, col("cid") === col("b_cid") && col("a_id") < col("b_id"))
      .filter(cos >= tau)
      .select(col("b_id").as("dup_id")).distinct()
    CacheScope.sealResult(
      assign.join(dups, assign(idCol) === dups("dup_id"), "left_outer")
        .select(col(idCol), col("cid").as("cell_id"),
          col("dup_id").isNull.as("is_kept")),
      assign)
  }
}
