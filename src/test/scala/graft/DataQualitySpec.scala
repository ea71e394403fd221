package graft

import graft.core.Lakehouse
import graft.pipeline.Medallion
import graft.quality.DataQuality
import org.apache.spark.sql.functions._

/** The reference's DQ gate semantics over our pipeline output. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = graft.core.Graft.events(spark, sf)

  test("orphanedKeys: referential-integrity violations fail the run; NULL fks are not orphans") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val clean = Seq(Some(1L), Some(2L), Some(2L), None).toDF("fk_col")
    // NULL is an optional relationship, duplicates collapse — clean passes
    DataQuality.gate(Seq("fk" ->
      DataQuality.orphanedKeys(clean, "fk_col", parent, "pk", "child_parent")))
    // two orphaned values → the gate throws, naming the failed check
    val dirty = Seq(Some(1L), Some(9L), Some(9L), None).toDF("fk_col")
    val viol = DataQuality.orphanedKeys(dirty, "fk_col", parent, "pk", "child_parent")
    val row = viol.collect().toSeq
    assert(row.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("orphaned_child_parent", 2L)))
    val ex = intercept[IllegalArgumentException] {
      DataQuality.gate(Seq("fk orphans" -> viol))
    }
    assert(ex.getMessage.contains("fk orphans"))
  }

  test("the domain pipeline's final task is the DQ gate: orphans fail the run") {
    // DomainPipeline.run ends in qualityGate (the reference's DAG shape);
    // a healthy lake passes inside run() itself — here the ORPHAN path is
    // driven directly: amputate the fact, keep the features, re-gate
    val lake = tmpDir("dq-domain-lake")
    val csv = tmpDir("dq-domain-csv")
    DomainFixtures.writeCsvFixture(spark, csv)
    graft.pipeline.DomainPipeline.run(spark, csv, lake) // gate passes here
    val feats = graft.pipeline.DomainPipeline.readFeatures(spark, lake)
    val wtx = graft.pipeline.DomainPipeline.readWalletTx(spark, lake)
    // amputation: a fact missing some feature wallets → orphans
    val someWallet = feats.select("wallet_address").head.getString(0)
    val cut = wtx.filter(col("wallet_address") =!= someWallet)
    val ex = intercept[IllegalArgumentException] {
      DataQuality.gate(Seq("features->wallet_tx orphans" ->
        DataQuality.orphanedKeys(feats, "wallet_address", cut,
          "wallet_address", "features_wallet_address")))
    }
    assert(ex.getMessage.contains("features->wallet_tx orphans"))
  }

  test("missingIds finds exactly the dropped ids") {
    val dropped = events.filter(!col("event_id").isin(3L, 7L))
    val missing = DataQuality.missingIds(spark, dropped, "event_id", 0L, 9L)
      .as[Long].collect().toSet
    assert(missing == Set(3L, 7L))
    // intact range -> no violations
    assert(DataQuality.missingIds(spark, events, "event_id", 0L, 9L).count() == 0)
  }

  test("incompleteGroups flags groups not matching their declared count") {
    val df = Seq((1L, 3L), (1L, 3L), (1L, 3L), (2L, 2L)).toDF("g", "declared")
    val bad = DataQuality.incompleteGroups(df, "g", "declared")
      .as[(Long, Long, Long)].collect()
    assert(bad.toSeq == Seq((2L, 1L, 2L)))
  }

  test("featureConstraints + gate over medallion features") {
    val root = tmpDir("dq-root"); val csv = tmpDir("dq-csv")
    events
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csv)
    Medallion.runCycle(spark, csv, root)
    val feats = Lakehouse.read(spark, Medallion.featuresPath(root))
    // healthy output passes the gate
    DataQuality.gate(Seq(
      "features" -> DataQuality.featureConstraints(
        feats, Seq("n_events"), "n_events", maxZeroRatio = 0.2)))
    // corrupt a counter -> gate throws
    val corrupt = feats.withColumn("n_events",
      when(col("user_id") === feats.select(min("user_id")).head.getLong(0), lit(-1L))
        .otherwise(col("n_events")))
    val ex = intercept[IllegalArgumentException] {
      DataQuality.gate(Seq(
        "features" -> DataQuality.featureConstraints(
          corrupt, Seq("n_events"), "n_events", maxZeroRatio = 0.2)))
    }
    assert(ex.getMessage.contains("features"))
  }

  test("driftGate: seeds, passes on stability, fails on shift keeping the exposing baseline") {
    val root = tmpDir("dq-drift-root")
    def frame(lowN: Int, highN: Int) = {
      val rows = (1 to lowN).map(_ => 5.0) ++ (1 to highN).map(_ => 25.0)
      rows.toDF("value")
    }
    // first run seeds — nothing to compare against
    assert(DataQuality.driftGate(spark, frame(40, 40), "value",
      root, "v", maxTvd = 0.2).isEmpty)
    // same distribution at a different size: TVD exactly 0, passes (the
    // smoothed PSI is near-zero but not exactly 0 — add-one smoothing
    // shifts unequal-size histograms slightly)
    assert(DataQuality.driftGate(spark, frame(10, 10), "value",
      root, "v", maxTvd = 0.2).exists(_._1 == 0.0))
    // shifted distribution (50/50 -> 10/90): TVD 0.4 > 0.2, throws
    val ex = intercept[IllegalArgumentException] {
      DataQuality.driftGate(spark, frame(8, 72), "value",
        root, "v", maxTvd = 0.2)
    }
    assert(ex.getMessage.contains("tvd=0.4"), ex.getMessage)
    // the failing run did NOT advance the reference: the original
    // distribution still passes against the kept baseline
    assert(DataQuality.driftGate(spark, frame(20, 20), "value",
      root, "v", maxTvd = 0.2).exists(_._1 == 0.0))
    // an empty current frame is maximal drift, never a vacuous pass
    assert(DataQuality.tvd(Map(0L -> 10L), Map.empty) == 1.0)
  }

  test("driftGate PSI threshold: the divergence fires where TVD is lenient") {
    val root = tmpDir("dq-psi-root")
    def frame(lowN: Int, highN: Int) = {
      val rows = (1 to lowN).map(_ => 5.0) ++ (1 to highN).map(_ => 25.0)
      rows.toDF("value")
    }
    assert(DataQuality.driftGate(spark, frame(50, 50), "value",
      root, "v", maxTvd = 0.5, maxPsi = Some(0.25)).isEmpty)
    // identical histogram: PSI exactly 0 (every smoothed cross product
    // cancels), both thresholds pass
    val m = DataQuality.driftGate(spark, frame(50, 50), "value",
      root, "v", maxTvd = 0.5, maxPsi = Some(0.25))
    assert(m.exists { case (d, p) => d == 0.0 && p == 0.0 }, m.toString)
    // 50/50 -> 20/80 is TVD 0.3 (inside a lenient 0.5 bar) but PSI ~0.8:
    // the industry 0.25 action threshold fires where TVD was tuned loose
    val ex = intercept[IllegalArgumentException] {
      DataQuality.driftGate(spark, frame(20, 80), "value",
        root, "v", maxTvd = 0.5, maxPsi = Some(0.25))
    }
    assert(ex.getMessage.contains("psi="), ex.getMessage)
    // PSI equals the dq_psi/driftPsi arithmetic on the same counts: the
    // gate, the batch query, and the streaming twin share one definition
    import graft.functions.PinnedLog.lnNanos
    val (refH, curH) = (Map(0L -> 50L, 1L -> 50L), Map(0L -> 20L, 1L -> 80L))
    val refS = (0 until 10).map(b => refH.getOrElse(b.toLong, 0L) + 1L)
    val curS = (0 until 10).map(b => curH.getOrElse(b.toLong, 0L) + 1L)
    val (tRef, tCur) = (refS.sum, curS.sum)
    val num = (0 until 10).map { b =>
      (BigInt(curS(b)) * tRef - BigInt(refS(b)) * tCur) *
        (lnNanos(curS(b), 1L) + lnNanos(tRef, 1L)
          - lnNanos(refS(b), 1L) - lnNanos(tCur, 1L))
    }.sum
    val want = num.doubleValue / (tRef.toDouble * tCur.toDouble) / 1e9
    assert(DataQuality.psi(refH, curH) == want)
    // silence is maximal drift here too
    assert(DataQuality.psi(Map(0L -> 10L), Map.empty).isPosInfinity)
  }

  test("trendGate: warms up, passes noise, fails a monotone ramp keeping the series; idempotent days") {
    val root = tmpDir("dq-trend-root")
    // warmup: below minDays nothing is measured
    (0 until 13).zip(Seq(5L, 7, 4, 6, 5, 8, 3, 6, 5, 7, 4, 6, 5)).foreach {
      case (d, v) =>
        assert(DataQuality.trendGate(spark, d.toLong, v, root, "m",
          maxAbsZ = 2.0).isEmpty, s"day $d must be warmup")
    }
    // 14th noisy point: measured, small |z|, passes
    val z0 = DataQuality.trendGate(spark, 13L, 6L, root, "m", maxAbsZ = 2.0)
    assert(z0.exists(z => math.abs(z) < 2.0), z0.toString)
    // re-running the SAME day with the same value replaces, not appends:
    // the statistic is unchanged (idempotent DAG retries)
    val z1 = DataQuality.trendGate(spark, 13L, 6L, root, "m", maxAbsZ = 2.0)
    assert(z1 == z0, s"same-day retry moved z: $z0 -> $z1")
    // a secular ramp pushes z past the bar — every windowed check of a
    // slowly ratcheting metric would still pass; the trend gate fires
    val ex = intercept[IllegalArgumentException] {
      (14 until 28).foreach { d =>
        DataQuality.trendGate(spark, d.toLong, 10L + d, root, "m",
          maxAbsZ = 2.0): Unit
      }
    }
    assert(ex.getMessage.contains("trend gate 'm' failed"), ex.getMessage)
    // the failing day was NOT absorbed: the kept series re-exposes the
    // failure on retry (the driftGate reference-kept contract)
    val ex2 = intercept[IllegalArgumentException] {
      DataQuality.trendGate(spark, 27L, 37L, root, "m", maxAbsZ = 2.0)
    }
    assert(ex2.getMessage.contains("trend gate 'm' failed"), ex2.getMessage)
    // the gate's z IS the a45_mann_kendall arithmetic: same statistic,
    // one definition (here: strictly increasing 14-point series)
    val (s, var18, z) = DataQuality.mannKendall((1L to 14L))
    assert(s == 14 * 13 / 2 && var18 == 14L * 13 * 33)
    assert(z == (s - 1).toDouble / math.sqrt(var18.toDouble / 18))
  }

  test("walletFeatureConstraints mirror the reference's three checks (data_quality_ethereum_wallet_features.sql)") {
    def feats(rows: (String, Long, Long, Double)*) =
      rows.toDF("wallet_address", "wallet_total_incoming_tx",
        "wallet_total_outgoing_tx", "wallet_min_eth_ever")
    // healthy: all three rows present, none failing
    val ok = DataQuality.walletFeatureConstraints(feats(
      ("a", 2L, 1L, 0.5), ("b", 1L, 1L, 1.0), ("c", 3L, 2L, 2.0), ("d", 1L, 0L, 3.0),
      ("e", 1L, 0L, 4.0)))
    assert(ok.count() == 3)
    assert(ok.filter(col("is_fail")).count() == 0)
    DataQuality.gate(Seq("wallet" -> ok.filter(col("is_fail"))))
    // one negative outgoing counter -> that constraint fails
    val neg = DataQuality.walletFeatureConstraints(feats(("a", 2L, -1L, 0.5)))
      .filter(col("is_fail")).select("constraint_name").as[String].collect().toSeq
    assert(neg == Seq("outgoing_tx_negative_counts_check"))
    // 2 of 5 wallets at min_eth_ever = 0 (40% > 20%) -> ratio check fails
    val zero = DataQuality.walletFeatureConstraints(feats(
      ("a", 1L, 1L, 0.0), ("b", 1L, 1L, 0.0), ("c", 1L, 1L, 1.0),
      ("d", 1L, 1L, 2.0), ("e", 1L, 1L, 3.0)))
      .filter(col("is_fail")).select("constraint_name").as[String].collect().toSeq
    assert(zero == Seq("zero_min_eth_ever_for_20%_addresses_check"))
  }

  test("weeklyCompact runs only on Sundays and preserves content (features_pipeline.py:128-138)") {
    val root = tmpDir("wk")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "p")
    Lakehouse.ctas(df, s"$root/t", Seq("p"))
    val monday = java.time.LocalDate.of(2026, 8, 10)
    val sunday = java.time.LocalDate.of(2026, 8, 9)
    assert(!Lakehouse.weeklyCompact(spark, s"$root/t", Seq("p"), monday))
    assert(Lakehouse.weeklyCompact(spark, s"$root/t", Seq("p"), sunday))
    val after = Lakehouse.read(spark, s"$root/t")
    assert(after.count() == 2)
    assert(after.filter(col("id") === 1L).head.getAs[String]("p") == "a")
  }
}
