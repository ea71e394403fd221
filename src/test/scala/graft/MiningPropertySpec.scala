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
