package graft

import graft.core.ManifestSnapshots
import graft.pipeline.MaterializedView
import graft.pipeline.MaterializedView.MvSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance (pipeline/MaterializedView): pins
  *  (1) incremental ≡ full — a view refreshed across appends equals a
  *      one-shot recompute EXACTLY (decimal partials, no float drift),
  *  (2) O(delta) refresh — the incremental pass processes only the
  *      delta's files/rows (RefreshStats), never the table,
  *  (3) the soundness gate — a rewriting base version (partition
  *      copy-on-write) forces a full restate instead of double-counting,
  *  (4) crash safety — a torn refresh leaves the previous committed
  *      view state serving (inherited from ManifestSnapshots' commit
  *      order), and
  *  (5) noop — refreshing an already-current view does nothing.
  */
class MaterializedViewSpec extends SparkSpec {

  import spark.implicits._

  private val spec = MvSpec(keys = Seq("k"),
    sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))

  private def rows(ids: Range): DataFrame =
    ids.toDF("id").select(
      (col("id") % 7).as("k"),
      (col("id") * 1.25 - 3.0).as("v"))

  private def fullRecompute(df: DataFrame): DataFrame =
    df.groupBy("k").agg(
      sum(col("v").cast("decimal(38,6)")).as("sum_v"),
      min("v").as("min_v"), max("v").as("max_v"),
      count(lit(1)).as("n_rows"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.sorted.map(col(_))
    assert(a.select(cols: _*).except(b.select(cols: _*)).isEmpty &&
      b.select(cols: _*).except(a.select(cols: _*)).isEmpty,
      "view state diverged from the full recompute")
  }

  test("incremental across appends ≡ one-shot recompute; delta-only processing; noop") {
    val base = tmpDir("mvbase") + "/t"
    val view = tmpDir("mvview") + "/v"
    ManifestSnapshots.writeFull(rows(0 until 400), base)
    val s1 = MaterializedView.refresh(spark, base, view, spec)
    assert(s1.mode == "full" && s1.deltaRows == 400)

    ManifestSnapshots.appendDelta(rows(400 until 450), base)
    ManifestSnapshots.appendDelta(rows(450 until 470), base)
    val s2 = MaterializedView.refresh(spark, base, view, spec)
    assert(s2.mode == "incremental", s"expected incremental, got ${s2.mode}")
    assert(s2.deltaRows == 70,
      s"incremental refresh must process the 70 delta rows, not the table; saw ${s2.deltaRows}")

    assertSame(MaterializedView.serve(spark, view), fullRecompute(rows(0 until 470)))

    val s3 = MaterializedView.refresh(spark, base, view, spec)
    assert(s3.mode == "noop" && s3.deltaRows == 0)

    // view-store retention: refreshes must not accrete one full copy of
    // the partials per refresh (a stream refreshes per micro-batch)
    (0 until 4).foreach { i =>
      ManifestSnapshots.appendDelta(rows(470 + i * 10 until 480 + i * 10), base)
      MaterializedView.refresh(spark, base, view, spec)
    }
    assert(ManifestSnapshots.versions(spark, view).size <= 2,
      "the view store must keep committed + one rollback step, not every refresh")
    assertSame(MaterializedView.serve(spark, view), fullRecompute(rows(0 until 510)))
  }

  test("a rewriting base version forces a full restate, never a double count") {
    val base = tmpDir("mvrw") + "/t"
    val view = tmpDir("mvrwv") + "/v"
    def part(ids: Range): DataFrame = rows(ids).withColumn("p", col("k") % 2)
    val pspec = MvSpec(keys = Seq("k"), sums = Seq("v"))
    ManifestSnapshots.writeFull(part(0 until 300), base, partitionCols = Seq("p"))
    MaterializedView.refresh(spark, base, view, pspec)

    // copy-on-write: restate partition p=0 with DIFFERENT rows — an
    // incremental consumer that only read added files would double-count
    ManifestSnapshots.replacePartitions(
      part(0 until 300).filter(col("p") === 0)
        .withColumn("v", col("v") * 2), base, Seq("p"))
    val s = MaterializedView.refresh(spark, base, view, pspec)
    assert(s.mode == "full",
      s"entries were removed upstream; refresh must restate, got ${s.mode}")
    val expect = fullRecompute(
      ManifestSnapshots.readLatest(spark, base).drop("p"))
      .select("k", "sum_v", "n_rows")
    assertSame(MaterializedView.serve(spark, view).select("k", "sum_v", "n_rows"),
      expect)
  }

  test("asOf pins the refresh target; catching up later is incremental") {
    val base = tmpDir("mvasof") + "/t"
    val view = tmpDir("mvasofv") + "/v"
    ManifestSnapshots.writeFull(rows(0 until 100), base)
    ManifestSnapshots.appendDelta(rows(100 until 160), base)
    val s1 = MaterializedView.refresh(spark, base, view, spec, asOf = Some(1L))
    assert(s1.mode == "full" && s1.baseVersion == 1L && s1.deltaRows == 100)
    assertSame(MaterializedView.serve(spark, view), fullRecompute(rows(0 until 100)))
    val s2 = MaterializedView.refresh(spark, base, view, spec)
    assert(s2.mode == "incremental" && s2.deltaRows == 60)
    assertSame(MaterializedView.serve(spark, view), fullRecompute(rows(0 until 160)))
  }

  test("a torn refresh leaves the previous committed state serving") {
    val base = tmpDir("mvcrash") + "/t"
    val view = tmpDir("mvcrashv") + "/v"
    ManifestSnapshots.writeFull(rows(0 until 50), base)
    MaterializedView.refresh(spark, base, view, spec)
    ManifestSnapshots.appendDelta(rows(50 until 80), base)

    // simulate the crash window: the new view version's data files land
    // but neither its manifest nor the pointer move (ManifestSnapshots
    // commit order) — fabricate by writing orphan data under the view
    val hfs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(view + "/data/d-99")
    hfs.mkdirs(orphan)
    rows(0 until 5).write.mode("overwrite").parquet(orphan.toString + "/junk")

    assert(MaterializedView.refreshedBaseVersion(spark, view).contains(1L),
      "orphaned data files must not advance the committed view state")
    assertSame(MaterializedView.serve(spark, view), fullRecompute(rows(0 until 50)))
    // the retry completes normally
    val s = MaterializedView.refresh(spark, base, view, spec)
    assert(s.mode == "incremental")
    assertSame(MaterializedView.serve(spark, view), fullRecompute(rows(0 until 80)))
  }

  test("a vacuumed-away diff base demotes refresh to a full restate, not a throw") {
    val base = tmpDir("mvvac") + "/t"
    val view = tmpDir("mvvacv") + "/v"
    ManifestSnapshots.writeFull(rows(0 until 40), base)
    MaterializedView.refresh(spark, base, view, spec) // view @ base v1
    ManifestSnapshots.appendDelta(rows(40 until 60), base)
    ManifestSnapshots.appendDelta(rows(60 until 90), base)
    // retention drops v1's manifest (keep v2,v3) — the view's diff base
    val (dropped, _) = ManifestSnapshots.vacuum(spark, base, keep = 2)
    assert(dropped == Seq(1L))
    val s = MaterializedView.refresh(spark, base, view, spec)
    assert(s.mode == "full",
      s"diff base vacuumed away; refresh must restate, got ${s.mode}")
    assertSame(MaterializedView.serve(spark, view), fullRecompute(rows(0 until 90)))
  }

  test("CDC read: manifest diff yields exactly the appended rows, empty when nothing changed") {
    val base = tmpDir("mvcdc") + "/t"
    ManifestSnapshots.writeFull(rows(0 until 30), base)
    ManifestSnapshots.appendDelta(rows(30 until 45), base)
    val changes = ManifestSnapshots.readChanges(spark, base, 1L, 2L)
    assertSame(
      changes.groupBy("k").agg(sum(col("v").cast("decimal(38,6)")).as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"), count(lit(1)).as("n_rows")),
      fullRecompute(rows(30 until 45)))
    assert(ManifestSnapshots.readChanges(spark, base, 2L, 2L).isEmpty)
    assert(ManifestSnapshots.removedEntries(spark, base, 1L, 2L).isEmpty)
    assert(ManifestSnapshots.addedEntries(spark, base, 1L, 2L).map(_.rows).sum == 15)
  }
}
