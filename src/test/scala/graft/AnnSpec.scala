package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

/** ANN parameterization + recall: the LSH code width and IVF codebook
  * scale with the corpus (no fixed 16-bucket/16-centroid toys), and the
  * approximate variants recover a useful fraction of the exact top-k. */
class AnnSpec extends SparkSpec {

  test("LSH code width and IVF stride scale with corpus size") {
    assert(SimilarityQueries.codeWidth(500) == 4)
    assert(SimilarityQueries.codeWidth(2000) == 6)
    assert(SimilarityQueries.codeWidth(1000000) == 15)
    assert(SimilarityQueries.codeWidth(1000000000L) == 25)
    assert(SimilarityQueries.codeWidth(10) == 4) // floor
    assert(SimilarityQueries.codeWidth(Long.MaxValue / 2) == 32) // ceiling
    // exact powers of two — where a ln/ln double path is off by an ulp
    // vs DuckDB's native log2 (regression guard for the integer version)
    assert(SimilarityQueries.codeWidth(1L << 34) == 29)
    assert(SimilarityQueries.codeWidth((1L << 34) + 1) == 30)
    assert(SimilarityQueries.codeWidth(1L << 36) == 31)
    assert(SimilarityQueries.centroidStride(500) == 22)
    assert(SimilarityQueries.centroidStride(1000000) == 1000)
  }

  private def topSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .groupBy("q_id").agg(collect_set(col("n_id")).as("ids"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("ids").toSet)
      .toMap

  test("multiprobe LSH and IVF recall a useful fraction of the exact top-5") {
    val exact = topSets("ann_bruteforce_topk")
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ids) =>
        approx.get(q).fold(0.0)(a => (a & ids).size.toDouble / ids.size) }
      per.sum / per.size
    }
    val lsh = recall(topSets("ann_lsh_bucket"))
    val ivf = recall(topSets("ann_ivf"))
    val kmeans = recall(topSets("ann_ivf_kmeans"))
    val pq = recall(topSets("ann_ivf_pq"))
    // floors below observed values — these fail only if the
    // parameterization collapses (e.g. empty buckets / lost probes).
    // IVF probes nprobe=4 cells: boundary recall comes from the extra
    // probes (observed 0.50 plain / 0.63 k-means at 500 vectors, up from
    // 0.38 / 0.43 at nprobe=2 — the floor pins the multi-cell gain).
    // PQ shortlists on normalized-vector ADC then re-ranks exactly, so its
    // recall measures shortlist coverage (observed 0.63 at 500 vectors).
    assert(lsh >= 0.3, s"LSH multiprobe recall $lsh")
    assert(ivf >= 0.45, s"IVF 4-probe recall $ivf")
    assert(kmeans >= 0.45, s"k-means IVF 4-probe recall $kmeans")
    assert(pq >= 0.3, s"PQ/ADC shortlist recall $pq")
    info(f"recall@5: lsh=$lsh%.2f ivf=$ivf%.2f ivf_kmeans=$kmeans%.2f pq=$pq%.2f")
  }

  test("PQ re-rank output is exact cosine, monotone with rank, 5 per query") {
    val out = SparkEntry.queries("ann_ivf_pq")(spark, sf)
      .select("q_id", "rank", "n_id", "cos_sim").collect()
      .groupBy(_.getLong(0))
    out.values.foreach { rows =>
      assert(rows.length == 5)
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"re-ranked cosines not monotone with rank: ${byRank.mkString(",")}")
    }
    assert(out.size == 8)
  }
}
