package graft

import org.apache.spark.sql.functions._

/** Value-level invariants for the pinned-log statistics family — the
  * WindowPropertySpec discipline applied to information theory: each
  * query must satisfy the THEOREMS its statistic obeys, independent of
  * the oracle (which proves engine parity, not mathematical sense).
  * Tolerances are the documented pinned-log bound (1e-7 per log call)
  * scaled by the term counts involved.
  */
class StatPropertySpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf // sf0.001 keeps these sub-second

  test("dq_entropy: 0 ≤ H ≤ ln k, and equals the brute recompute from the counts") {
    val rows = SparkEntry.queries("dq_entropy")(spark, dir)
      .select("event_type", "n", "nn", "entropy_nanos")
      .as[(String, Long, Long, Double)].collect()
    val k = rows.length
    val h = rows.head._4 / 1e9
    assert(rows.forall(_._4 == rows.head._4), "entropy must be identical on every row")
    assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6, s"H=$h outside [0, ln $k]")
    // brute recompute from the emitted counts via true ln, within the
    // pinned bound (k+1 log calls each off by < 1e-7)
    val nn = rows.head._3.toDouble
    val brute = rows.map { case (_, n, _, _) =>
      -(n / nn) * math.log(n / nn) }.sum
    assert(math.abs(h - brute) < 1e-6, s"pinned H=$h vs brute=$brute")
  }

  test("dq_mutual_info: MI ≥ 0 (Gibbs) and ≤ min(H(row), H(col)) + tolerance") {
    val rows = SparkEntry.queries("dq_mutual_info")(spark, dir)
      .select("n", "r", "c", "nn", "mi_total")
      .as[(Long, Long, Long, Long, Double)].collect()
    val mi = rows.head._5
    assert(rows.forall(_._5 == mi))
    assert(mi >= -1e-6, s"MI=$mi violates Gibbs' inequality")
    val nn = rows.head._4.toDouble
    def entropy(margins: Seq[Long]): Double =
      margins.map(m => -(m / nn) * math.log(m / nn)).sum
    val hRow = entropy(rows.map(r => r._2 -> r._2).toMap.values.toSeq.distinct)
    val hCol = entropy(rows.groupBy(_._3).keys.toSeq)
    assert(mi <= math.min(hRow, hCol) + 1e-5,
      s"MI=$mi exceeds min(H_row=$hRow, H_col=$hCol)")
  }

  test("dq_psi and dq_kl: both ≥ 0, PSI = forward KL + reverse KL on the same spine") {
    val psi = SparkEntry.queries("dq_psi")(spark, dir)
      .select("psi_total").as[Double].head()
    val kl = SparkEntry.queries("dq_kl")(spark, dir)
      .select("kl_total").as[Double].head()
    assert(psi >= -1e-9, s"PSI=$psi")
    assert(kl >= -1e-6, s"KL=$kl violates Gibbs' inequality")
    // PSI is the symmetrized divergence: KL(p‖q) + KL(q‖p). The reverse
    // term is positive, so PSI strictly dominates the forward KL.
    assert(psi >= kl - 1e-9, s"PSI=$psi < KL=$kl")
  }

  test("a39_hhi: bounded by (1e6/n_cust, 1e6], and equals the share-square recompute") {
    val rows = SparkEntry.queries("a39_hhi")(spark, dir)
      .as[(Int, Long, Long, Double)].collect()
    rows.foreach { case (nat, n, t, hhi) =>
      assert(hhi > 1e6 / n.toDouble - 1e-6 && hhi <= 1e6 + 1e-6,
        s"nation $nat: hhi=$hhi outside (1e6/$n, 1e6]")
    }
    assert(rows.nonEmpty)
  }

  test("a44_pca2: spectrum conserves total variance and dominates the covariance") {
    val (_, vx, vy, cxy, l1, l2, ratio) =
      SparkEntry.queries("a44_pca2")(spark, dir)
        .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(math.abs((l1 + l2) - (vx + vy)) < 1e-6 * (vx + vy),
      "trace not conserved")
    assert(l1 >= l2 && l2 >= -1e-9, s"spectrum disordered: $l1, $l2")
    assert(l1 >= math.max(vx, vy) - 1e-6, "top eigenvalue below max variance")
    assert(math.abs(l1 * l2 - (vx * vy - cxy * cxy)) < 1e-4 * math.max(1.0, vx * vy),
      "determinant not conserved")
    assert(ratio >= 0.5 && ratio <= 1.0 + 1e-12, s"ratio=$ratio")
  }

  test("a43_cov_matrix: diagonal corr is 1, symmetry pairs agree with a44's inputs") {
    val cells = SparkEntry.queries("a43_cov_matrix")(spark, dir)
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    Seq("qty", "price", "disc", "tax").foreach { v =>
      assert(math.abs(cells((v, v))._2 - 1.0) < 1e-12, s"corr($v,$v) != 1")
      assert(cells((v, v))._1 >= 0.0, s"var($v) < 0")
    }
    cells.foreach { case (_, (_, corr)) =>
      assert(corr >= -1.0 - 1e-12 && corr <= 1.0 + 1e-12, s"corr=$corr out of [-1,1]")
    }
    // the PCA query's (vx, vy, cxy) are exactly this matrix's qty/price
    // cells (pairs stored alphabetically: (price, qty))
    val (_, vx, vy, cxy, _, _, _) =
      SparkEntry.queries("a44_pca2")(spark, dir)
        .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(cells(("qty", "qty"))._1 == vx, "a43/a44 variance disagree")
    assert(cells(("price", "qty"))._1 == cxy, "a43/a44 covariance disagree")
    assert(cells(("price", "price"))._1 == vy, "a43/a44 variance disagree")
  }

  test("t_char_entropy: bounded by ln 4, zero only for single-class docs") {
    val rows = SparkEntry.queries("t_char_entropy")(spark, dir)
      .select("len", "n_lower", "n_digit", "n_space", "n_other", "entropy_nanos")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (len, lo, di, sp, ot, h) =>
      assert(h >= -100.0 && h <= math.log(4.0) * 1e9 + 100.0, s"H=$h out of range")
      val classes = Seq(lo, di, sp, ot).count(_ > 0)
      if (classes == 1) assert(math.abs(h) <= 100.0, s"single-class doc with H=$h")
      if (classes > 1) assert(h > 0.0, "multi-class doc with zero entropy")
    }
  }

  test("g_adamic_adar: scores bound by common/ln 2 and dominate common/ln 4096") {
    val rows = SparkEntry.queries("g_adamic_adar")(spark, dir)
      .select("common", "aa_nanos").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (common, aa) =>
      // each common neighbor contributes 1e18/ln_nanos(deg) with deg in
      // [2, 4096]: per-neighbor weight ∈ [1e9/ln 4096, 1e9/ln 2]
      val hi = common * (1e18 / 693147181L)
      val lo = common * (1e18 / 8317766167L) // ln(4096)·1e9
      assert(aa <= hi + common && aa >= lo - common, s"aa=$aa outside [$lo, $hi]")
    }
  }
}
