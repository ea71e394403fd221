package graft

import graft.pipeline.{AnnStore, DedupStore, ServingStore, TextIndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The [[graft.pipeline.ServingStore]] contract, exercised through the
  * GENERIC surface for every store at once: bootstrap-on-first-contact,
  * O(delta) admission, and replay safety (an at-least-once redelivery of
  * an already-ingested batch must not change the index) — the rules each
  * store's own spec pins individually, proven here to hold behind the one
  * shared lifecycle a pipeline actually calls. */
class ServingStoreSpec extends SparkSpec {

  private def docs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"alpha beta gamma delta token$i tail${i % 3}"))
      .toDF("doc_id", "text")
  }
  private def vecs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 19).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private case class Case(store: ServingStore, b1: DataFrame, b2: DataFrame,
      indexedRows: String => Long)

  private lazy val cases = Seq(
    Case(DedupStore, docs(0 until 20), docs(20 until 30),
      root => spark.table(DedupStore.shinglesTable(root)).count()),
    Case(TextIndexStore, docs(0 until 20), docs(20 until 30),
      root => spark.table(TextIndexStore.postingsTable(root))
        .select("doc_id").distinct().count()),
    Case(AnnStore, vecs(0 until 40), vecs(40 until 60),
      root => spark.table(
        AnnStore.assignTableCurrent(spark, root)).count()))

  test("generic lifecycle: bootstrap, delta admission, replay safety") {
    for (c <- cases) {
      val root = tmpDir(s"svstore_${c.store.storeName}_")
      val r1 = c.store.ingestBatch(spark, root, c.b1)
      assert(r1.bootstrapped, s"${c.store.storeName}: first contact must build")
      val afterBuild = c.indexedRows(root)
      assert(afterBuild > 0, c.store.storeName)

      // REPLAY of the same batch: admission must be a no-op
      val r2 = c.store.ingestBatch(spark, root, c.b1)
      assert(!r2.bootstrapped, c.store.storeName)
      assert(c.indexedRows(root) == afterBuild,
        s"${c.store.storeName}: replayed batch changed the index")

      // a genuinely new batch folds in (and only it — intra-batch dup
      // included once)
      c.store.ingestBatch(spark, root, c.b2.union(c.b2.limit(1)))
      val afterDelta = c.indexedRows(root)
      assert(afterDelta > afterBuild, c.store.storeName)

      // and replaying the SECOND batch is again a no-op
      c.store.ingestBatch(spark, root, c.b2)
      assert(c.indexedRows(root) == afterDelta,
        s"${c.store.storeName}: replayed delta changed the index")
    }
  }

  test("maintenance trigger is store policy: only the ANN store decays") {
    // dedup + text indexes do not degrade under appends — their trigger
    // never fires through the generic surface; the ANN store's trigger is
    // live (AnnStoreSpec pins when it fires; here: it ANSWERS, and a fresh
    // just-built store must not demand a retrain)
    val root = tmpDir("svstore_maint_")
    DedupStore.ingestBatch(spark, root, docs(0 until 10))
    TextIndexStore.ingestBatch(spark, root, docs(0 until 10))
    AnnStore.ingestBatch(spark, root, vecs(0 until 40))
    assert(!DedupStore.shouldMaintain(spark, root))
    assert(!TextIndexStore.shouldMaintain(spark, root))
    assert(!AnnStore.shouldMaintain(spark, root),
      "a freshly built ANN store reports no drift")
    assert(ServingStore.all.map(_.storeName).toSet ==
      Set("dedup", "text-index", "ann"))
  }

  test("one generic streaming sink serves every store: ANN stream == batch build") {
    // servingStoreIngestion is the lifecycle as a foreachBatch sink — the
    // at-least-once delivery Structured Streaming guarantees is exactly
    // the replay the admission discipline absorbs. Proven on the store
    // with the most moving parts (generations + drift trigger): a vector
    // stream with a redelivered batch must end bit-identical to a
    // one-shot batch build of the same vectors.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val root = tmpDir("svstore_stream_")
    val ckpt = tmpDir("svstore_stream_ck_")
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 19).toFloat)))
    val q = graft.streaming.Streams.servingStoreIngestion(
      AnnStore, mem.toDF().toDF("vec_id", "embedding"), root, ckpt)
    try {
      mem.addData(rows.take(40): _*); q.processAllAvailable()
      mem.addData(rows.drop(40): _*); q.processAllAvailable()
      val before = spark.table(AnnStore.assignTableCurrent(spark, root)).count()
      mem.addData(rows.drop(40): _*); q.processAllAvailable() // redelivery
      assert(spark.table(AnnStore.assignTableCurrent(spark, root)).count() == before,
        "replayed micro-batch changed the inverted file")
    } finally q.stop()

    // equivalence target: the SAME lifecycle run as batch calls (build on
    // batch 1, append batch 2) — the codebook is seeded from the first
    // batch in both paths, so probes must match bit-identically. (A
    // one-shot build over all 60 would train a different codebook and
    // legitimately probe different cells.)
    val batchRoot = tmpDir("svstore_batch_")
    AnnStore.ensureBuilt(spark, batchRoot, vecs(0 until 40))
    AnnStore.appendVectors(spark, batchRoot, vecs(40 until 60))
    val queries = vecs(0 until 5)
    val streamed = AnnStore.probe(spark, root, queries, nprobe = 2, k = 3)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(1)))
    val batch = AnnStore.probe(spark, batchRoot, queries, nprobe = 2, k = 3)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(1)))
    assert(streamed == batch, "streamed store diverged from the batch lifecycle")
  }
}
