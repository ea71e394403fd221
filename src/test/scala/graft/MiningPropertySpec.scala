package graft

import org.apache.spark.sql.functions._

/** Value-level invariants for the mining/attribution wave — each query
  * must satisfy the theorems its statistic obeys (bounds, conservation
  * laws) AND agree exactly with a brute pure-Scala recompute from the
  * same inputs, independent of the DuckDB oracle (which proves engine
  * parity, not mathematical sense). The trend tests recompute on the
  * locally-collected daily series — bounded by construction, so the
  * brute O(d²) loops are trivial here.
  */
class MiningPropertySpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf // sf0.001 keeps these sub-second

  /** The daily count series the three trend tests share, recomputed
    * independently of the query under test (plain groupBy). */
  private lazy val daily: Map[String, Seq[(Long, Long)]] =
    graft.core.Graft.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq)
      .toMap

  test("a45_mann_kendall: S matches the brute pair loop, |S| ≤ n(n−1)/2, z sign = sign(S)") {
    val rows = SparkEntry.queries("a45_mann_kendall")(spark, dir)
      .select("event_type", "n", "s_stat", "var18", "z")
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, s, var18, z) =>
      val series = daily(t).map(_._2)
      assert(n == series.length, s"$t: n=$n vs ${series.length} days")
      val brute = (for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield java.lang.Long.signum(series(j) - series(i)).toLong).sum
      assert(s == brute, s"$t: S=$s vs brute=$brute")
      assert(math.abs(s) <= n * (n - 1) / 2, s"$t: |S| exceeds pair count")
      assert(var18 <= n * (n - 1) * (2 * n + 5), s"$t: var18 over the no-tie bound")
      z.foreach { zv =>
        assert(s == 0 || java.lang.Long.signum(s) == math.signum(zv).toInt,
          s"$t: z=$zv disagrees with S=$s in sign")
      }
    }
  }

  test("a46_theil_sen: median equals the brute quantized-slope median exactly") {
    val rows = SparkEntry.queries("a46_theil_sen")(spark, dir)
      .select("event_type", "n_pairs", "median_slope_fp")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, nPairs, med) =>
      val s = daily(t)
      val slopes = (for {
        i <- s.indices; j <- (i + 1) until s.length
      } yield ((s(j)._2 - s(i)._2) * 1000000000L) / (s(j)._1 - s(i)._1)).sorted
      assert(nPairs == slopes.length, s"$t: pair count")
      // rank (n+1)/2 over the sorted quantized slopes, 1-indexed
      assert(med == slopes(((slopes.length + 1) / 2 - 1).toInt),
        s"$t: median_fp=$med vs brute=${slopes(((slopes.length + 1) / 2 - 1).toInt)}")
    }
  }

  test("a46_theil_sen: EVEN pair count takes the lower median (div, not true /)") {
    // The sf fixture's per-type C(d,2) pair counts all happen to be odd, so
    // the oracle parity above never exercises the even branch — the exact
    // branch where a true-division rank ((n+1)/2 = half-integer) would match
    // NO row and return NULL. Pin it on a 4-day series: C(4,2) = 6 pairs,
    // rank (6+1) div 2 = 3 → the 3rd-smallest quantized slope, never NULL.
    val dir4 = tmpDir("theil-even")
    val days = Seq(0L, 1L, 2L, 3L) // counts 1,2,4,3 below → distinct slopes
    val rows = for {
      (d, c) <- days.zip(Seq(1, 2, 4, 3)); i <- 0 until c
    } yield (d * 100 + i, new java.sql.Timestamp(d * 86400000L), 1L, "click",
      1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir4/events.parquet")
    val out = SparkEntry.queries("a46_theil_sen")(spark, dir4)
      .select("event_type", "n_pairs", "median_slope_fp")
      .as[(String, Long, Long)].collect()
    assert(out.length == 1)
    val (_, nPairs, med) = out.head
    assert(nPairs == 6L, s"expected the even pair count 6, got $nPairs")
    val cnts = Seq(1L, 2L, 4L, 3L)
    val slopes = (for {
      i <- 0 until 4; j <- (i + 1) until 4
    } yield ((cnts(j) - cnts(i)) * 1000000000L) / (days(j) - days(i))).sorted
    assert(med == slopes((slopes.length + 1) / 2 - 1),
      s"even-count lower median: got $med, want ${slopes((slopes.length + 1) / 2 - 1)}")
  }

  test("a57_kendall_tau: τ ∈ [−1, 1], equals the brute pair loop with tie terms") {
    val row = SparkEntry.queries("a57_kendall_tau")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    val (c, d, n, n1, n2, tau) = row
    val byday = graft.core.Graft.events(spark, dir)
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(count(when(col("event_type") === "purchase", 1)).cast("long").as("pc"),
        count(when(col("event_type") === "click", 1)).cast("long").as("cc"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val pairs = for { i <- byday.indices; j <- (i + 1) until byday.length }
      yield (byday(i)._2 - byday(j)._2) * (byday(i)._3 - byday(j)._3)
    assert(n == byday.length)
    assert(c == pairs.count(_ > 0), s"concordant: $c vs brute ${pairs.count(_ > 0)}")
    assert(d == pairs.count(_ < 0), s"discordant: $d vs brute ${pairs.count(_ < 0)}")
    def tieTerm(xs: Seq[Long]): Long =
      xs.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(n1 == tieTerm(byday.map(_._2).toSeq) && n2 == tieTerm(byday.map(_._3).toSeq))
    val n0 = n * (n - 1) / 2
    assert(c + d <= n0, "C + D cannot exceed the pair count")
    tau.foreach { t =>
      assert(math.abs(t) <= 1.0 + 1e-12, s"|tau|=$t out of range")
      val brute = (c - d).toDouble / math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
      assert(t == brute, s"tau=$t vs brute=$brute (must be the identical IEEE tail)")
    }
  }

  test("a59_durbin_watson: DW ∈ [0, 4], equals the brute residual walk exactly") {
    val (nDays, _, _, dw) = SparkEntry.queries("a59_durbin_watson")(spark, dir)
      .as[(Long, Double, Double, Option[Double])].head()
    val y = graft.core.Graft.events(spark, dir)
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(nDays == y.length)
    val n = y.length.toLong; val s = y.sum
    val e = y.map(v => BigInt(n * v - s))
    val num = e.sliding(2).collect { case Array(a, b) => (b - a) * (b - a) }.sum
    val den = e.map(v => v * v).sum
    dw.foreach { v =>
      assert(v >= 0.0 && v <= 4.0 + 1e-12, s"DW=$v out of [0,4]")
      val brute = num.doubleValue / den.doubleValue
      assert(v == brute, s"DW=$v vs brute=$brute (identical IEEE tail expected)")
    }
  }

  test("a47_spearman: ρ ∈ [−1, 1] and equals the brute average-rank Pearson") {
    val (n, _, _, rho) = SparkEntry.queries("a47_spearman")(spark, dir)
      .as[(Long, Long, Long, Option[Double])].head()
    val byday = graft.core.Graft.events(spark, dir)
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long").as("pc"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).cast("long").as("cc"))
      .as[(Long, Long, Long)].collect()
    assert(n == byday.length)
    def avgRanks(xs: Seq[Long]): Seq[Double] = {
      val sorted = xs.sorted.zipWithIndex // 0-indexed
      val avg = sorted.groupBy(_._1).view
        .mapValues(g => g.map(_._2 + 1.0).sum / g.size).toMap
      xs.map(avg)
    }
    val rx = avgRanks(byday.map(_._2).toSeq)
    val ry = avgRanks(byday.map(_._3).toSeq)
    val nn = rx.length.toDouble
    val mx = rx.sum / nn; val my = ry.sum / nn
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    rho match {
      case Some(r) =>
        assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12, s"rho=$r out of bounds")
        val brute = cov / math.sqrt(vx * vy)
        assert(math.abs(r - brute) < 1e-9, s"rho=$r vs brute=$brute")
      case None => assert(vx == 0.0 || vy == 0.0, "NULL rho without a degenerate margin")
    }
  }

  test("w23_rsi: bounded [0, 1e6], self-consistent with the emitted gain/loss sums") {
    val rows = SparkEntry.queries("w23_rsi")(spark, dir)
      .select("gains", "losses", "rsi_ppm")
      .as[(Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, l, r) =>
      assert(g >= 0 && l >= 0, "negative gain/loss sum")
      r match {
        case Some(v) =>
          assert(v >= 0 && v <= 1000000, s"rsi_ppm=$v out of [0, 1e6]")
          assert(v == g * 1000000L / (g + l), "rsi_ppm != truncated ratio")
        case None => assert(g + l == 0, "NULL rsi on a moving window")
      }
    }
  }

  test("g_bipartite_proj: canonical pair order, descending weights, top pair verified") {
    val rows = SparkEntry.queries("g_bipartite_proj")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, _) => a < b }, "pair not canonical (a < b)")
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "weights not descending")
    val (ta, tb, tw) = rows.head
    val brute = graft.core.Graft.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_orderkey").agg(collect_set("l_partkey").as("parts"))
      .as[(Long, Seq[Long])].collect()
      .count { case (_, ps) => ps.contains(ta) && ps.contains(tb) }
    assert(tw == brute, s"top pair ($ta,$tb): weight=$tw vs brute=$brute")
  }

  test("a48_attribution: revenue and purchase counts conserve exactly") {
    val rows = SparkEntry.queries("a48_attribution")(spark, dir)
      .as[(String, Long, Long)].collect()
    val (totN, totCents) = graft.core.Graft.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).cast("long"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).cast("long"))
      .as[(Long, Long)].head()
    assert(rows.map(_._2).sum == totN, "purchase count not conserved")
    assert(rows.map(_._3).sum == totCents, "revenue cents not conserved")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate channel rows")
  }

  test("a49_target_encode: shrinkage pulls every category toward the prior") {
    val rows = SparkEntry.queries("a49_target_encode")(spark, dir)
      .select("n", "ret", "prior_ppm", "te_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, ret, prior, te) =>
      val rate = ret * 1000000L / n
      // the encoded value lies between the raw rate and the prior, and
      // is closer to the prior than the raw rate is (m > 0 shrinkage) —
      // ±1 for the two independent truncations
      assert(te >= math.min(rate, prior) - 1 && te <= math.max(rate, prior) + 1,
        s"te=$te outside [$rate, $prior]")
      assert(math.abs(te - prior) <= math.abs(rate - prior) + 1,
        s"te=$te further from prior=$prior than rate=$rate")
    }
  }

  test("a50_mase: positive where defined, exact deltas vs the brute series walk") {
    val rows = SparkEntry.queries("a50_mase")(spark, dir)
      .select("event_type", "n1", "s1", "n7", "s7")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n1, s1, n7, s7) =>
      val series = daily(t).map(_._2)
      val b1 = series.sliding(2).map(w => math.abs(w(1) - w(0))).sum
      val b7 = series.indices.drop(7).map(i => math.abs(series(i) - series(i - 7))).sum
      assert(n1 == series.length - 1 && s1 == b1, s"$t: lag-1 MAE mismatch")
      assert(n7 == math.max(series.length - 7, 0) && s7 == b7, s"$t: lag-7 MAE mismatch")
    }
  }

  test("g_degree_gini: G ∈ [0, 1) and equals the brute sorted-degree recompute") {
    val (n, t, _, gini) = SparkEntry.queries("g_degree_gini")(spark, dir)
      .as[(Long, Long, Double, Double)].head()
    val orders = graft.core.Graft.table(spark, dir, "orders")
    val li = graft.core.Graft.table(spark, dir, "lineitem")
    val e0 = orders.join(li, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val degs = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy("src").agg(count(lit(1)).cast("long").as("d"))
      .as[(Long, Long)].collect().map(_._2).sorted
    assert(n == degs.length && t == degs.sum)
    val a = degs.zipWithIndex.map { case (d, i) => (i + 1).toDouble * d }.sum
    val brute = 2 * a / (n.toDouble * t.toDouble) - (n + 1.0) / n
    assert(math.abs(gini - brute) < 1e-9, s"gini=$gini vs brute=$brute")
    assert(gini >= 0.0 && gini < 1.0, s"gini=$gini out of [0,1)")
  }

  test("t_js_sources: 0 ≤ JS ≤ ln 2, equal to the brute recompute on the quantized masses") {
    val rows = SparkEntry.queries("t_js_sources")(spark, dir)
      .select("pa", "pb", "js_term", "js_total")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val js = rows.head._4
    assert(rows.forall(_._4 == js), "js_total must be identical on every row")
    assert(js >= -1e-6 && js <= math.log(2.0) + 1e-6, s"JS=$js outside [0, ln 2]")
    val pta = rows.map(_._1).sum.toDouble
    val ptb = rows.map(_._2).sum.toDouble
    // brute on the SAME quantized masses via true ln, within the pinned
    // bound (2 log calls per token, each < 1e-7 off)
    val brute = rows.map { case (pa, pb, _, _) =>
      val p = pa / pta; val q = pb / ptb; val m = (p + q) / 2
      (p * math.log(p / m) + q * math.log(q / m)) / 2
    }.sum
    assert(math.abs(js - brute) < 1e-5, s"pinned JS=$js vs brute=$brute")
  }

  test("a51_markov_entropy: 0 ≤ H ≤ ln k, equals the brute recompute from the cells") {
    val rows = SparkEntry.queries("a51_markov_entropy")(spark, dir)
      .select("prev_type", "n", "r", "h_rate")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val h = rows.head._4
    assert(rows.forall(_._4 == h), "h_rate must be identical on every row")
    val k = rows.map(_._1).distinct.length
    assert(h >= -1e-6 && h <= math.log(k.toDouble) + 1e-6, s"H=$h outside [0, ln $k]")
    val t = rows.map(_._2).sum.toDouble
    val brute = rows.map { case (_, n, r, _) => n * math.log(r.toDouble / n) }.sum / t
    assert(math.abs(h - brute) < 1e-5, s"pinned H=$h vs brute=$brute")
  }

  test("g_rich_club: φ ∈ [0, 1e6], e_hub matches the brute hub-edge count") {
    val (nc, ns, eHub, phi) = SparkEntry.queries("g_rich_club")(spark, dir)
      .as[(Long, Long, Long, Option[Long])].head()
    assert(nc <= 10 && ns <= 10)
    assert(eHub <= nc * ns, "more hub edges than possible pairs")
    phi.foreach(p => assert(p >= 0 && p <= 1000000L, s"phi_ppm=$p"))
    phi.foreach(p => assert(p == eHub * 1000000L / (nc * ns), "phi != truncated ratio"))
    // brute: recompute hubs and the hub-edge count from the raw edges
    val e0 = graft.core.Graft.table(spark, dir, "orders")
      .join(graft.core.Graft.table(spark, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().as[(Long, Long)].collect()
    val degs = (e0.map(_._1) ++ e0.map(_._2)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    def topSide(par: Int) = degs.filter(_._1 % 2 == par).toSeq
      .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet
    val hubs = topSide(0) ++ topSide(1)
    val brute = e0.count { case (s0, d0) => hubs(s0) && hubs(d0) }
    assert(eHub == brute, s"e_hub=$eHub vs brute=$brute")
  }

  test("a52_decay_attribution: credit conserves up to per-purchase truncation slack") {
    val rows = SparkEntry.queries("a52_decay_attribution")(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0), "negative channel credit")
    // brute walk of the same banded pair space in pure Scala
    val evs = graft.core.Graft.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .as[(Long, Long, String, Long, Long)].collect()
    val dayUs = 86400000000L
    val byUser = evs.groupBy(_._1)
    var credit = Map.empty[String, Double].withDefaultValue(0.0)
    var touches = Map.empty[String, Long].withDefaultValue(0L)
    byUser.values.foreach { ue =>
      val ps = ue.filter(_._3 == "purchase")
      val ts = ue.filter(_._3 != "purchase")
      ps.foreach { case (_, _, _, pTs, cents) =>
        val win = ts.filter(t => t._4 < pTs && pTs - t._4 <= 7 * dayUs)
          .map(t => (t._3, 1000000L >> ((pTs - t._4) / dayUs).toInt))
        val swt = win.map(_._2).sum
        win.foreach { case (ch, wt) =>
          credit += ch -> (credit(ch) + cents.toDouble * (wt * 1000000L / swt))
          touches += ch -> (touches(ch) + 1)
        }
      }
    }
    rows.foreach { case (ch, n, c) =>
      assert(n == touches(ch), s"$ch: n_touch=$n vs brute=${touches(ch)}")
      assert(math.abs(c - credit(ch)) < 1e-6 * math.max(1.0, credit(ch)),
        s"$ch: credit=$c vs brute=${credit(ch)}")
    }
  }

  test("a53_time_to_convert: ordered bands, exact positional values vs the brute sort") {
    val (n, mn, p50, p90, mx) = SparkEntry.queries("a53_time_to_convert")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(mn <= p50 && p50 <= p90 && p90 <= mx, s"bands disordered: $mn $p50 $p90 $mx")
    val ev = graft.core.Graft.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .as[(Long, String, Long)].collect()
    val lags = ev.groupBy(_._1).flatMap { case (_, ue) =>
      val s = ue.filter(_._2 == "signup").map(_._3).minOption
      s.flatMap { sTs =>
        ue.filter(e => e._2 == "purchase" && e._3 >= sTs).map(_._3).minOption
          .map(p => (p - sTs) / 86400000000L)
      }
    }.toSeq.sorted
    assert(n == lags.length)
    assert(mn == lags.head && mx == lags.last)
    assert(p50 == lags(((n + 1) / 2 - 1).toInt), "median not the positional value")
    assert(p90 == lags(((9 * n + 9) / 10 - 1).toInt), "p90 not the positional value")
  }

  test("a54_cohort_ltv: cumulative monotone per cohort, total conserves purchase cents") {
    val rows = SparkEntry.queries("a54_cohort_ltv")(spark, dir)
      .select("cohort", "offs", "rev", "n_users", "cum_rev", "ltv_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { cohort =>
      val byOff = cohort.sortBy(_._2)
      assert(byOff.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        "cum_rev not monotone")
      assert(byOff.last._5 == byOff.map(_._3).sum, "cum != running total of cells")
      byOff.foreach { r => assert(r._6 == r._5 / r._4, "ltv != truncated cum/users") }
    }
    val totCents = graft.core.Graft.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).cast("long"))
      .as[Long].head()
    assert(rows.map(_._3).sum == totCents, "cells do not conserve purchase cents")
  }

  test("a55_rfm: scores in 1..5, users and cents conserve, scores match brute thresholds") {
    val rows = SparkEntry.queries("a55_rfm")(spark, dir)
      .as[(Int, Int, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (r, f, m, _, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5) }
    val ev = graft.core.Graft.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .as[(Long, String, Long, Long)].collect()
    val gmax = ev.map(_._3).max
    val ms = ev.groupBy(_._1).map { case (_, ue) =>
      ((gmax - ue.map(_._3).max) / 86400000000L,
        ue.count(_._2 == "purchase").toLong,
        ue.filter(_._2 == "purchase").map(_._4).sum)
    }.toSeq
    assert(rows.map(_._4).sum == ms.length, "user count not conserved")
    assert(rows.map(_._5).sum == ms.map(_._3).sum, "monetary cents not conserved")
    // brute score distribution from positional thresholds must match
    def qs(vs: Seq[Long]): Seq[Long] = {
      val s = vs.sorted; val n = s.length.toLong
      (1 to 4).map(i => s(((i * n + 4) / 5 - 1).toInt))
    }
    val (rq, fq, mq) = (qs(ms.map(_._1)), qs(ms.map(_._2)), qs(ms.map(_._3)))
    def sc(v: Long, q: Seq[Long]) = 1 + q.count(v > _)
    val brute = ms.groupBy(u => (sc(u._1, rq), sc(u._2, fq), sc(u._3, mq)))
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { case (r, f, m, n, _) =>
      assert(brute.getOrElse((r, f, m), 0L) == n,
        s"cell ($r,$f,$m): n=$n vs brute=${brute.getOrElse((r, f, m), 0L)}")
    }
  }

  test("a56_kaplan_meier: ln S ≤ 0, non-increasing, within pinned bound of brute KM") {
    val rows = SparkEntry.queries("a56_kaplan_meier")(spark, dir)
      .select("lt", "d", "n_risk", "ln_surv_nanos")
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "risk set must shrink with time")
    val defined = rows.takeWhile(_._4.isDefined)
    assert(defined.map(_._4.get).forall(_ <= 0), "ln S must be ≤ 0")
    assert(defined.map(_._4.get).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "survival must be non-increasing")
    // brute KM on the same (d, n_risk) pairs via true ln, within the
    // pinned bound (one log per death time, each < 1e-7 nats off)
    var acc = 0.0
    defined.foreach { case (_, d, n, Some(lnS)) =>
      acc += math.log((n - d).toDouble / n)
      assert(math.abs(lnS / 1e9 - acc) < 1e-6 * defined.length,
        s"pinned lnS=${lnS / 1e9} vs brute=$acc")
    case _ => ()
    }
  }

  test("t_burstiness: burst ≥ 1e6 (cf ≥ df), nonneg variance, df bounded by corpus") {
    val nDocs = graft.core.Graft.table(spark, dir, "documents").count()
    val rows = SparkEntry.queries("t_burstiness")(spark, dir)
      .select("df", "cf", "burst_ppm", "tf_var")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (df, cf, burst, tfVar) =>
      assert(cf >= df, "collection frequency below doc frequency")
      assert(burst >= 1000000L, s"burst_ppm=$burst < 1e6")
      assert(burst == cf * 1000000L / df, "burst_ppm != truncated cf/df")
      assert(tfVar >= -1e-9, s"negative tf variance $tfVar")
      assert(df <= nDocs, "df exceeds corpus size")
    }
  }
}
