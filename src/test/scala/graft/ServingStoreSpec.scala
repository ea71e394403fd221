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
}
