package graft

import graft.pipeline.BasketStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted basket/degree view store behind the `_mv` graph family:
  *  (1) stored-view serving ≡ the from-scratch recompute for all three
  *      queries (same oracle SQL backs both registry entries),
  *  (2) O(delta) maintenance — a second admission folds ONLY the batch
  *      (stats account the rows), and a replayed batch is a no-op on
  *      every rollup (watermark guards),
  *  (3) the serving plans read VIEW files only — `lineitem` never
  *      appears in a serving scan,
  *  (4) distinct-edge admission is idempotent (anti-join), and degrees
  *      stay exactly the distinct-edge degrees across batches.
  */
class BasketStoreSpec extends SparkSpec {

  private def ol(upTo: Option[Long] = None, from: Option[Long] = None): DataFrame = {
    val o = graft.core.Graft.table(spark, sf, "orders")
    val l = graft.core.Graft.table(spark, sf, "lineitem")
    val j = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("o_custkey"), col("l_suppkey"))
    val lo = upTo.map(c => j.filter(col("l_orderkey") < c)).getOrElse(j)
    from.map(c => lo.filter(col("l_orderkey") >= c)).getOrElse(lo)
  }

  private def freshRoot(): String = tmpDir("basket-store") + "/s"

  test("stored degrees equal the distinct-edge degrees after a two-batch build") {
    val root = freshRoot()
    val cut = graft.core.Graft.table(spark, sf, "orders")
      .agg(max("o_orderkey")).head.getLong(0) * 4 / 5
    assert(BasketStore.ensureBuilt(spark, root, ol(upTo = Some(cut))))
    val stats = BasketStore.admitBatch(spark, root, ol(from = Some(cut)))
    assert(stats.mode == "admitted" && stats.batchRows > 0, stats.toString)
    assert(stats.newEdges > 0, "the batch must contribute new edges: " + stats)

    val full = ol()
    val e0 = full.select((col("o_custkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    val want = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src").as("node")).agg(count(lit(1)).cast("long").as("d"))
    val got = BasketStore.serveDegrees(spark, root)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"degrees diverge: got ${got.count()} nodes, want ${want.count()}")

    // pairs too: stored ≡ recompute
    val wantPairs = BasketStore.pairCounts(full)
    val gotPairs = BasketStore.servePairs(spark, root)
    assert(gotPairs.except(wantPairs).isEmpty && wantPairs.except(gotPairs).isEmpty,
      "pair rollup diverges from the one-shot recompute")
    assert(BasketStore.serveNOrders(spark, root)
      == full.select("l_orderkey").distinct().count())
  }

  test("replayed batch is a no-op on every rollup; third delta folds incrementally") {
    val root = freshRoot()
    val cut1 = 800L; val cut2 = 1200L // sf0.001 orderkeys run 1..1499
    BasketStore.ensureBuilt(spark, root, ol(upTo = Some(cut1)))
    val s1 = BasketStore.admitBatch(spark, root,
      ol(upTo = Some(cut2), from = Some(cut1)))
    assert(s1.mode == "admitted" && s1.batchRows > 0)

    // exact replay: watermark guard melts it to an empty admission
    val s2 = BasketStore.admitBatch(spark, root,
      ol(upTo = Some(cut2), from = Some(cut1)))
    assert(s2.mode == "empty" && s2.batchRows == 0, s2.toString)

    // third batch folds on top; state equals the one-shot over everything
    val s3 = BasketStore.admitBatch(spark, root, ol(from = Some(cut2)))
    assert(s3.mode == "admitted")
    val wantPairs = BasketStore.pairCounts(ol())
    val gotPairs = BasketStore.servePairs(spark, root)
    assert(gotPairs.except(wantPairs).isEmpty && wantPairs.except(gotPairs).isEmpty,
      "pair rollup diverges after replay + third batch")
  }

  test("serving plans never scan lineitem — the fact table is ingest-only") {
    Seq("g_bipartite_proj_mv", "g_basket_lift_mv", "g_degree_gini_mv").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val scans = df.queryExecution.executedPlan.toString
      assert(!scans.contains("lineitem.parquet"),
        s"$q serving plan scans the fact table:\n$scans")
    }
  }

  test("the canonical ServingStore lifecycle keeps whole baskets: ingestBatch " +
    "bootstrap + delta ≡ one-shot (the rule-2 dedup must NOT collapse orders)") {
    // Regression pin for the trait-contract hazard: the default rule-2
    // dedup keys on ingestKey (l_orderkey) and would keep ONE arbitrary
    // line per order — zero pairs, garbage degrees — inside the canonical
    // ingestBatch path. BasketStore overrides dedupBatch to identity
    // (every rollup is distinct-based); this drives the PUBLIC lifecycle
    // end-to-end, with an intra-batch duplicated row to prove rule 2
    // still holds.
    val root = freshRoot()
    val first = ol(upTo = Some(1000L))
    val dupRow = first.limit(1)
    val i1 = BasketStore.ingestBatch(spark, root, first.unionAll(dupRow))
    assert(i1.bootstrapped)
    val i2 = BasketStore.ingestBatch(spark, root, ol(from = Some(1000L)))
    assert(!i2.bootstrapped)
    val wantPairs = BasketStore.pairCounts(ol())
    val gotPairs = BasketStore.servePairs(spark, root)
    assert(gotPairs.except(wantPairs).isEmpty && wantPairs.except(gotPairs).isEmpty,
      "lifecycle-ingested pair view diverged — the rule-2 dedup ate basket rows")
    assert(BasketStore.serveNOrders(spark, root)
      == ol().select("l_orderkey").distinct().count())
    // warm-path accessor: the committed watermark covers the whole table
    assert(BasketStore.watermark(spark, root)
      .contains(ol().agg(max("l_orderkey")).head.getLong(0)))
  }

  test("maintenance compacts the edge buckets without changing served state") {
    val root = freshRoot()
    BasketStore.ensureBuilt(spark, root, ol(upTo = Some(200L)))
    // many small admissions: each with new edges appends a file per
    // touched bucket, inflating the anti-join's stored-side read
    (200L until 1400L by 100L).foreach { c =>
      BasketStore.admitBatch(spark, root,
        ol(upTo = Some(c + 100L), from = Some(c))): Unit
    }
    val before = BasketStore.servePairs(spark, root).collect().toSet
    val degBefore = BasketStore.serveDegrees(spark, root).collect().toSet
    val edgesBefore = spark.table(BasketStore.edgesTable(root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(BasketStore.shouldMaintain(spark, root),
      "12 appended batches must trip the files-per-bucket trigger")
    BasketStore.maintain(spark, root)
    assert(!BasketStore.shouldMaintain(spark, root), "compaction must reset the trigger")
    assert(spark.table(BasketStore.edgesTable(root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == edgesBefore,
      "compaction changed the edge set")
    assert(BasketStore.servePairs(spark, root).collect().toSet == before)
    assert(BasketStore.serveDegrees(spark, root).collect().toSet == degBefore)
    // and admissions still work against the compacted layout
    val s = BasketStore.admitBatch(spark, root, ol(from = Some(1400L)))
    assert(s.mode == "admitted", s.toString)
    val wantPairs = BasketStore.pairCounts(ol())
    val gotPairs = BasketStore.servePairs(spark, root)
    assert(gotPairs.except(wantPairs).isEmpty && wantPairs.except(gotPairs).isEmpty)
  }

  test("streaming admission ≡ batch build: two micro-batches + a redelivery " +
    "land once; mixed overlap is surfaced, not silently eaten") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = freshRoot()
    val cut1 = 800L; val cut2 = 1200L
    BasketStore.ensureBuilt(spark, root, ol(upTo = Some(cut1)))

    def rows(lo: Long, hi: Long): Seq[(Long, Long, Long, Long)] =
      ol(upTo = Some(hi), from = Some(lo))
        .select("l_orderkey", "l_partkey", "o_custkey", "l_suppkey")
        .as[(Long, Long, Long, Long)].collect().toSeq

    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = graft.streaming.Streams.foreachBatchBasketMaintenance(
      mem.toDF().toDF("l_orderkey", "l_partkey", "o_custkey", "l_suppkey"),
      root, tmpDir("basket-ck"))
    try {
      mem.addData(rows(cut1, cut2): _*)
      q.processAllAvailable()
      // batch 2 REDELIVERS the tail of batch 1 (overlap) plus the rest —
      // the watermark guard folds only the genuinely new orders
      mem.addData(rows(cut2 - 50, 10000L): _*)
      q.processAllAvailable()
    } finally q.stop()

    val wantPairs = BasketStore.pairCounts(ol())
    val gotPairs = BasketStore.servePairs(spark, root)
    assert(gotPairs.except(wantPairs).isEmpty && wantPairs.except(gotPairs).isEmpty,
      "stream-maintained pair view diverged from the one-shot build")
    assert(BasketStore.serveNOrders(spark, root)
      == ol().select("l_orderkey").distinct().count())

    // an exact redelivery through the BATCH api melts to empty, with the
    // skipped rows accounted — the contract violation signal is visible
    val s = BasketStore.admitBatch(spark, root, ol(from = Some(cut2)))
    assert(s.mode == "empty" && s.skippedRows > 0, s.toString)
  }

  test("pair explode guard: an over-cap basket fails loudly naming the order; " +
    "exclude mode drops exactly the mega-baskets; small baskets stay exact") {
    import spark.implicits._
    // one 12-part mega-basket (order 99) next to two small ones
    val mega = (1L to 12L).map(p => (99L, p, 1L, 1L))
    val small = Seq((1L, 10L, 1L, 1L), (1L, 11L, 1L, 1L),
      (2L, 10L, 1L, 1L), (2L, 12L, 1L, 1L), (2L, 13L, 1L, 1L))
    val df = (mega ++ small)
      .toDF("l_orderkey", "l_partkey", "o_custkey", "l_suppkey")
    val capKey = "spark.graft.basket.orderCap"
    val modeKey = "spark.graft.basket.blockMode"
    try {
      spark.conf.set(capKey, "8")
      // default mode = fail: the job dies before one pair is emitted, and
      // the error names the hot order, its size, and the conf knob
      val e = intercept[Throwable] { BasketStore.pairCounts(df).collect() }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => String.valueOf(t.getMessage)).mkString(" | ")
      assert(msgs.contains("orderCap") && msgs.contains("99"),
        s"guard must name the knob and the hot order, got: $msgs")

      // exclude mode: the mega-basket vanishes from the pair space, the
      // small baskets' pairs are bit-identical to the unguarded explode
      spark.conf.set(modeKey, "exclude")
      val got = BasketStore.pairCounts(df).collect().toSet
      spark.conf.set(capKey, "1000000")
      val want = BasketStore.pairCounts(
        df.filter(col("l_orderkey") =!= 99L)).collect().toSet
      assert(got == want, s"exclude-mode pairs diverge: got $got want $want")

      // and over-cap baskets keep the default guard pure insurance on the
      // fixture: guarded ≡ unguarded arithmetic at the default cap
      spark.conf.set(capKey, BasketStore.DefaultOrderCap.toString)
      spark.conf.set(modeKey, "fail")
      val fixture = BasketStore.pairCounts(ol(upTo = Some(400L))).collect().toSet
      spark.conf.set(capKey, "1000000")
      assert(BasketStore.pairCounts(ol(upTo = Some(400L))).collect().toSet
        == fixture, "default-cap guard changed fixture pair arithmetic")
    } finally {
      spark.conf.unset(capKey); spark.conf.unset(modeKey)
    }
  }

  test("strict admission throws BEFORE any rollup merge — on a mixed batch " +
    "AND on a remainder-only batch — leaving stored state untouched") {
    val root = freshRoot()
    val cut = 1000L
    BasketStore.ensureBuilt(spark, root, ol(upTo = Some(cut)))
    val wantPairs = BasketStore.pairCounts(ol(upTo = Some(cut))).collect().toSet
    // mixed: stale rows (below the watermark) next to fresh ones
    intercept[IllegalStateException] {
      BasketStore.admitBatch(spark, root, ol(from = Some(cut - 50)), strict = true)
    }
    // remainder-only: every row at/below the watermark, zero fresh — the
    // old post-hoc check melted this to mode=empty and dropped it silently
    intercept[IllegalStateException] {
      BasketStore.admitBatch(spark, root,
        ol(upTo = Some(cut), from = Some(cut - 50)), strict = true)
    }
    assert(BasketStore.servePairs(spark, root).collect().toSet == wantPairs,
      "a strict violation must prevent the commit, not detect it afterwards")
    // the same batches are fine under the default lenient contract
    val s = BasketStore.admitBatch(spark, root, ol(from = Some(cut - 50)))
    assert(s.mode == "admitted" && s.skippedRows > 0, s.toString)
  }

  test("half-built store (crash before the meta write) self-heals: ensureBuilt " +
    "falls through to a rebuild instead of serving missing rollups") {
    val root = freshRoot()
    assert(BasketStore.ensureBuilt(spark, root, ol(upTo = Some(1000L))))
    // simulate the crash window: edges CTAS landed, meta (written LAST)
    // did not — the pre-fix gate keyed on edges+pairs and treated this
    // half-built store as built forever
    val metaPath = new org.apache.hadoop.fs.Path(BasketStore.metaDir(root))
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(metaPath, true))
    assert(BasketStore.ensureBuilt(spark, root, ol(upTo = Some(1000L))),
      "missing meta must trigger a rebuild")
    val wantPairs = BasketStore.pairCounts(ol(upTo = Some(1000L)))
    val gotPairs = BasketStore.servePairs(spark, root)
    assert(gotPairs.except(wantPairs).isEmpty && wantPairs.except(gotPairs).isEmpty)
    assert(BasketStore.serveNOrders(spark, root)
      == ol(upTo = Some(1000L)).select("l_orderkey").distinct().count())
    // and the healed store admits deltas normally
    assert(BasketStore.admitBatch(spark, root, ol(from = Some(1000L))).mode
      == "admitted")
  }

  test("mv registry twins equal their recompute forms exactly") {
    Seq("g_bipartite_proj", "g_basket_lift", "g_degree_gini").foreach { q =>
      val a = SparkEntry.queries(q)(spark, sf)
      val b = SparkEntry.queries(q + "_mv")(spark, sf)
      assert(a.except(b).isEmpty && b.except(a).isEmpty, s"$q vs ${q}_mv diverge")
    }
  }
}
