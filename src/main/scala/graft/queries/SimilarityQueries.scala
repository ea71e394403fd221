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

  /** 4-bit coordinate-sign LSH code over dims 1, 17, 33, 49 (1-based). */
  private val lshDims = Seq(1, 17, 33, 49)
  private val lshSql = lshDims
    .map(d => s"CASE WHEN embedding[$d] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
  private val lshExpr: Column = concat(lshDims.map(d =>
    when(element_at(col("embedding"), d) >= 0, lit("1")).otherwise(lit("0"))): _*)

  val all: Seq[QueryDef] = Seq(

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
    },

    // ----------------------------------------------------------------- ANN-2
    // LSH-bucketed ANN: both sides carry a 4-bit sign code; the candidate
    // join is equi on the code, so each query only scans ~1/16 of the corpus.
    // Same queries/k as the brute force — diffing the two shows the recall
    // loss the bucketing trades for the 16× candidate reduction.
    QueryDef("ann_lsh_bucket",
      s"""WITH n AS (
         |  SELECT vec_id, $lshSql AS code, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE))) AS cos_sim
         |  FROM n q JOIN n c ON q.code = c.code AND q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs)
         |SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).withColumn("code", lshExpr)
      val q = n.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("code"), col("qv").as("q_qv"), col("nq").as("q_nq"))
      val c = n.select(col("vec_id").as("n_id"), col("code").as("c_code"),
        col("qv").as("c_qv"), col("nq").as("c_nq"))
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      broadcast(q).join(c, col("code") === col("c_code") && col("n_id") =!= col("q_id"))
        .withColumn("cos_sim", cosCol)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "n_id", "cos_sim")
    },

    // ----------------------------------------------------------------- ANN-3
    // IVF-style ANN: 16 fixed centroids (vec_id < 16 — a real pipeline
    // would k-means them); every vector is assigned to its nearest-centroid
    // cell, queries probe their top-2 cells. The inverted-file layout is
    // the 100 TB path: the corpus is partitioned BY CELL on disk, a query
    // touches probe/cells of the data, and the candidate join is equi on
    // cell id. Centroids broadcast everywhere.
    QueryDef("ann_ivf",
      s"""WITH n AS (
         |  SELECT vec_id, $quantSql AS qv,
         |    CAST(list_sum(list_transform($quantSql, x -> x * x)) AS BIGINT) AS nq
         |  FROM embeddings),
         |cent AS (SELECT vec_id AS cid, qv AS cqv, nq AS cnq FROM n WHERE vec_id < 16),
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
         |  WHERE rn <= 2),
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
      val cent = n.filter(col("vec_id") < 16)
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
        .filter(col("rn") <= 2)
        .select(col("vec_id").as("q_id"), col("cid"))
      val cells = assign.join(n, "vec_id")
        .select(col("cid").as("a_cid"), col("vec_id").as("n_id"),
          col("qv").as("c_qv2"), col("nq").as("c_nq2"))
      val qv = n.select(col("vec_id").as("qq_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
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
    }
  )
}
