package graft

import graft.core.ManifestSnapshots
import graft.pipeline.JoinMaterializedView
import graft.pipeline.JoinMaterializedView.JoinMvSpec
import graft.pipeline.MaterializedView.MvSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-join view maintenance (pipeline/JoinMaterializedView): pins
  *  (1) incremental ≡ full — a join view refreshed across appends ON
  *      BOTH SIDES (including the ΔA⋈ΔB cross term) equals a one-shot
  *      recompute of the full join EXACTLY,
  *  (2) delta-leg-only processing — RefreshStats accounts the two legs'
  *      delta rows, never the tables,
  *  (3) the prune arithmetic — on a key-clustered stored side, the
  *      A_old ⋈ ΔB leg reads only the files the delta's join keys can
  *      touch (readVersionMatchingKeys' zone-map tier),
  *  (4) the per-side soundness gate — a rewriting version on EITHER
  *      base forces a full restate, and
  *  (5) noop on an already-current view.
  */
class JoinMaterializedViewSpec extends SparkSpec {

  import spark.implicits._

  // facts reference dim keys; the view is per-group (g = dk % 5) sums
  private val jm = JoinMvSpec("fk", "dk",
    MvSpec(keys = Seq("g"), sums = Seq("v")))

  private def facts(ids: Range, dimMod: Int): DataFrame =
    ids.toDF("id").select(col("id").as("fact_id"),
      (col("id") % dimMod).cast("long").as("fk"),
      (col("id") * 0.5 + 1.0).as("v"))

  private def dims(keys: Range): DataFrame =
    keys.toDF("k").select(col("k").cast("long").as("dk"),
      (col("k") % 5).cast("long").as("g"))

  private def fullRecompute(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, col("fk") === col("dk"))
      .groupBy("g")
      .agg(sum(col("v").cast("decimal(38,6)")).as("sum_v"),
        count(lit(1)).as("n_rows"))

  private def assertSame(x: DataFrame, y: DataFrame): Unit = {
    val cols = x.columns.sorted.map(col(_))
    assert(x.select(cols: _*).except(y.select(cols: _*)).isEmpty &&
      y.select(cols: _*).except(x.select(cols: _*)).isEmpty,
      "join view diverged from the full recompute")
  }

  test("incremental across two-sided appends ≡ one-shot; cross term lands; noop") {
    val aDir = tmpDir("jmva") + "/a"
    val bDir = tmpDir("jmvb") + "/b"
    val view = tmpDir("jmvv") + "/v"
    // v1: facts referencing dims 0..39 only; dims 0..39
    ManifestSnapshots.writeFull(facts(0 until 400, 40), aDir)
    ManifestSnapshots.writeFull(dims(0 until 40), bDir)
    val s1 = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(s1.mode == "full")

    // ΔA: 100 facts spanning dims 0..49 — fk 40..49 exist ONLY in ΔB
    // (the cross term); ΔB: dims 40..49
    ManifestSnapshots.appendDelta(facts(400 until 500, 50), aDir)
    ManifestSnapshots.appendDelta(dims(40 until 50), bDir)
    val s2 = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(s2.mode == "incremental", s"expected incremental, got ${s2.mode}")
    assert(s2.deltaRowsA == 100 && s2.deltaRowsB == 10,
      s"delta legs must carry 100/10 rows, saw ${s2.deltaRowsA}/${s2.deltaRowsB}")

    assertSame(JoinMaterializedView.serve(spark, view),
      fullRecompute(facts(0 until 500, 50), dims(0 until 50)))

    val s3 = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(s3.mode == "noop")
  }

  test("A_old ⋈ ΔB reads only the zone-map-matched files of the clustered fact side") {
    val aDir = tmpDir("jmvpa") + "/a"
    val bDir = tmpDir("jmvpb") + "/b"
    val view = tmpDir("jmvpv") + "/v"
    // fact side key-clustered into 8 disjoint fk ranges (8 files with
    // tight zone maps); dims complete
    ManifestSnapshots.writeFull(
      facts(0 until 800, 80).repartitionByRange(8, col("fk")), aDir)
    ManifestSnapshots.writeFull(dims(0 until 70), bDir)
    JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)

    // ΔB: the LAST dim decile only — its fk band lives in ~1 of A's 8 files
    ManifestSnapshots.appendDelta(dims(70 until 80), bDir)
    val s = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(s.mode == "incremental" && s.deltaRowsB == 10)
    assert(s.aFilesTotal == 8, s"expected 8 clustered fact files, saw ${s.aFilesTotal}")
    assert(s.aFilesRead < s.aFilesTotal,
      s"the old-side read must prune: ${s.aFilesRead} of ${s.aFilesTotal}")
    assertSame(JoinMaterializedView.serve(spark, view),
      fullRecompute(facts(0 until 800, 80), dims(0 until 80)))
  }

  test("refresh races concurrent two-sided deltas from another PROCESS: " +
    "every refresh lands or demotes loudly, and the final state is the ∪-identity") {
    // A second JVM appends ΔA (facts) and ΔB (dims) batches through the
    // public API while THIS process refreshes the join view in a loop.
    // Version resolution is per-side and non-atomic (curA and curB are
    // read at different instants), so refreshes run against snapshot
    // pairs the appender is actively outpacing — the delta-join identity
    // A@va'⋈B@vb' = A@va⋈B@vb ∪ ΔA⋈B@vb' ∪ A@va⋈ΔB must hold for EVERY
    // such pair, and a refresh must never wedge (throw) or double-count.
    val aDir = tmpDir("jmvrca") + "/a"
    val bDir = tmpDir("jmvrcb") + "/b"
    val view = tmpDir("jmvrcv") + "/v"
    ManifestSnapshots.writeFull(facts(0 until 200, 20).coalesce(2), aDir)
    ManifestSnapshots.writeFull(dims(0 until 20).coalesce(1), bDir)
    JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)

    val n = 6
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
    val jvmArgs = inArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports") Seq(a, inArgs(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports="))
        Seq(a)
      else Nil
    }
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.ForkedBaseAppenderMain", aDir, bDir, n.toString, "200", "20")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(
      new java.io.File(tmpDir("jmvrc-log"), "child.log")))
    val child = pb.start()
    // refresh continuously while the appender runs — every call must
    // return a stats record (incremental, full, or noop), never throw
    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    while (child.isAlive) {
      modes += JoinMaterializedView.refresh(spark, aDir, bDir, view, jm).mode
    }
    assert(child.waitFor(5, java.util.concurrent.TimeUnit.MINUTES) &&
      child.exitValue() == 0, "forked appender failed — see child.log")
    // quiesced: one final refresh converges to the one-shot recompute
    val fin = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(Seq("incremental", "noop", "full").contains(fin.mode))
    assertSame(JoinMaterializedView.serve(spark, view),
      fullRecompute(ManifestSnapshots.readLatest(spark, aDir),
        ManifestSnapshots.readLatest(spark, bDir)))
    // the race actually exercised the maintenance path, not just noops
    assert(modes.nonEmpty)
    assert((modes :+ fin.mode).exists(_ == "incremental"),
      s"race never took the incremental path: $modes")
  }

  test("a schema change on a base between refreshes demotes to a full restate") {
    // The two delta legs union frames read at DIFFERENT versions (ΔA at
    // the current schema, A@va at the stored schema); a column declared
    // between them would make that unionByName throw mid-refresh and
    // wedge the view. The gate must demote to full instead — loudly
    // correct, never stuck.
    val aDir = tmpDir("jmvsca") + "/a"
    val bDir = tmpDir("jmvscb") + "/b"
    val view = tmpDir("jmvscv") + "/v"
    ManifestSnapshots.writeFull(facts(0 until 200, 20), aDir)
    ManifestSnapshots.writeFull(dims(0 until 20), bDir)
    JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)

    // declare a column on the fact side, then append deltas on BOTH sides
    ManifestSnapshots.addColumn(spark, aDir, "tag", "STRING")
    ManifestSnapshots.appendDelta(
      facts(200 until 260, 20).withColumn("tag", lit("late")), aDir)
    ManifestSnapshots.appendDelta(dims(20 until 25), bDir)
    val s = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(s.mode == "full",
      s"schema moved on A since va; refresh must restate, got ${s.mode}")
    assertSame(JoinMaterializedView.serve(spark, view),
      fullRecompute(
        ManifestSnapshots.readLatest(spark, aDir).select("fact_id", "fk", "v"),
        dims(0 until 25)))

    // and once restated at the new schema, incremental resumes
    ManifestSnapshots.appendDelta(
      facts(260 until 300, 25).withColumn("tag", lit("later")), aDir)
    val s2 = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(s2.mode == "incremental",
      s"stable schema after the restate must go back to incremental, got ${s2.mode}")
    assertSame(JoinMaterializedView.serve(spark, view),
      fullRecompute(
        ManifestSnapshots.readLatest(spark, aDir).select("fact_id", "fk", "v"),
        dims(0 until 25)))
  }

  test("a rewriting version on either base forces a full restate") {
    val aDir = tmpDir("jmvrwa") + "/a"
    val bDir = tmpDir("jmvrwb") + "/b"
    val view = tmpDir("jmvrwv") + "/v"
    ManifestSnapshots.writeFull(
      facts(0 until 200, 20).withColumn("p", col("fk") % 2),
      aDir, partitionCols = Seq("p"))
    ManifestSnapshots.writeFull(dims(0 until 20), bDir)
    JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)

    // copy-on-write restate of fact partition p=0 with different values
    ManifestSnapshots.replacePartitions(
      facts(0 until 200, 20).withColumn("p", col("fk") % 2)
        .filter(col("p") === 0).withColumn("v", col("v") * 3),
      aDir, Seq("p"))
    val s = JoinMaterializedView.refresh(spark, aDir, bDir, view, jm)
    assert(s.mode == "full",
      s"fact-side entries were removed; refresh must restate, got ${s.mode}")
    assertSame(JoinMaterializedView.serve(spark, view),
      fullRecompute(ManifestSnapshots.readLatest(spark, aDir).drop("p"),
        dims(0 until 20)))
  }
}
