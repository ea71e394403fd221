package graft

import org.apache.spark.sql.functions._

/** The bounded-block contract of `d_embedding_dup`, ENFORCED (r17): a
  * block-size census runs before the exact Σ|block|² pair join, and
  * blocks over `spark.graft.dedup.blockCap` either fail loudly
  * (default) or — with blockMode=reroute — are LSH-sub-bucketed with
  * ceil(log2(bsz/cap)) sign bits. Pins, against a brute pure-Scala
  * recompute of the quantized-integer cosine pairs:
  *  (1) default knobs on the fixture = the EXACT pair list (the census
  *      is an observer — hashes unchanged),
  *  (2) fail mode with an exceeded cap throws and NAMES the hot blocks,
  *  (3) reroute mode = exactly the within-(label, subcode) pair list —
  *      a subset of the exact pairs, complete inside every sub-bucket,
  *      with identical cosines on the surviving pairs.
  */
class EmbeddingBlockGuardSpec extends SparkSpec {

  private val CapKey = "spark.graft.dedup.blockCap"
  private val ModeKey = "spark.graft.dedup.blockMode"

  private def run(): Set[(Long, Long, Double)] =
    SparkEntry.queries("d_embedding_dup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def withKnobs[T](cap: Option[String], mode: Option[String])(f: => T): T =
    try {
      cap.foreach(spark.conf.set(CapKey, _))
      mode.foreach(spark.conf.set(ModeKey, _))
      f
    } finally {
      spark.conf.unset(CapKey)
      spark.conf.unset(ModeKey)
    }

  /** (vec_id, label, quantized vector) — the same 1e6 fixed-point
    * quantization the query and its oracle share. */
  private lazy val vecs: Seq[(Long, Long, Array[Long])] =
    graft.core.Graft.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        graft.queries.EmbeddingParity.quantExpr.as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toArray))

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Brute within-group ≥0.35 pairs under an arbitrary grouping key. */
  private def brutePairs(key: ((Long, Long, Array[Long])) => Any): Set[(Long, Long, Double)] =
    vecs.groupBy(key).values.flatMap { g =>
      for {
        x <- g; y <- g if x._1 < y._1
        c = cos(x._3, y._3) if c >= 0.35
      } yield (x._1, y._1, c)
    }.toSet

  private def sameSet(got: Set[(Long, Long, Double)],
      want: Set[(Long, Long, Double)], what: String): Unit = {
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)),
      s"$what: pair ids diverge (got ${got.size}, want ${want.size})")
    val byId = want.map(t => (t._1, t._2) -> t._3).toMap
    got.foreach { case (a, b, c) =>
      assert(math.abs(c - byId((a, b))) < 1e-12, s"$what: cos drift on ($a,$b)")
    }
  }

  test("default knobs: census passes and the result IS the exact pair list") {
    val exact = brutePairs(v => v._2)
    assert(exact.nonEmpty)
    sameSet(run(), exact, "default/exact")
  }

  test("fail mode with an exceeded cap throws loudly and names the blocks") {
    val ex = intercept[IllegalStateException] {
      withKnobs(Some("8"), None)(run())
    }
    assert(ex.getMessage.contains("blockCap=8"), ex.getMessage)
    assert(ex.getMessage.contains("rows"), "must name block sizes: " + ex.getMessage)
    assert(ex.getMessage.contains("reroute"), "must advertise the escape hatch")
  }

  test("reroute mode = the within-(label, subcode) pairs exactly: subset of " +
    "exact, complete inside every sub-bucket") {
    val cap = 8L
    val bsz = vecs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // the implementation's integer-threshold form: Σ_j [bsz > cap·2^j]
    // (= ceil(log2(bsz/cap)) clamped to 16, with no floating log)
    def bits(l: Long): Int = (0 until 16).count(j => bsz(l) > cap * (1L << j))
    def subcode(v: (Long, Long, Array[Long])): String =
      (0 until bits(v._2)).map(i => if (v._3(i * 4) >= 0) '1' else '0').mkString
    val want = brutePairs(v => (v._2, subcode(v)))
    val got = withKnobs(Some(cap.toString), Some("reroute"))(run())
    sameSet(got, want, "reroute")
    val exact = brutePairs(v => v._2)
    assert(got.map(t => (t._1, t._2)).subsetOf(exact.map(t => (t._1, t._2))),
      "reroute must never invent a pair")
    assert(got.size < exact.size,
      "with cap=8 on ~50-row blocks the recall trade must actually bite")
    assert(got.nonEmpty, "sub-buckets must retain their internal pairs")
  }
}
