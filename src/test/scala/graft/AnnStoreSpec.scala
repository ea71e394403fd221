package graft

import graft.pipeline.AnnStore
import org.apache.spark.sql.functions._

/** The persisted IVF serving index: a stored-index probe must be
  * indistinguishable from the from-scratch ann_ivf query, the probe scan
  * must plan with bucket pruning (the point of the cell-bucketed layout),
  * and vector admission must be O(delta) and replay-safe. */
class AnnStoreSpec extends SparkSpec {
  import spark.implicits._

  test("stored-index probe == from-scratch ann_ivf, and rebuild is a no-op") {
    val inline = SparkEntry.queries("ann_ivf")(spark, sf)
      .orderBy("q_id", "rank").collect().toSeq
    val root = tmpDir("ann-store-eq")
    val emb = graft.core.Graft.table(spark, sf, "embeddings")
    assert(AnnStore.ensureBuilt(spark, root, emb))
    val stored = AnnStore.probe(spark, root, emb.filter(col("vec_id") < 8))
      .orderBy("q_id", "rank").collect().toSeq
    assert(stored == inline,
      "persisted-index probe diverged from the from-scratch query")
    assert(!AnnStore.ensureBuilt(spark, root,
      { fail("corpus must not be re-assigned when the store exists"); emb }))
  }

  test("probe scan is bucket-pruned to the probed cells") {
    val root = tmpDir("ann-store-prune")
    val emb = graft.core.Graft.table(spark, sf, "embeddings")
    AnnStore.ensureBuilt(spark, root, emb)
    val out = AnnStore.probe(spark, root, emb.filter(col("vec_id") < 2))
    val plan = out.queryExecution.executedPlan.toString
    val m = """SelectedBucketsCount: (\d+) out of (\d+)""".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in probe plan:\n$plan")
    val (sel, tot) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(sel < tot, s"probe scanned every bucket ($sel of $tot)")
    // and the pruned probe still answers: top-5 per query
    assert(out.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
  }

  test("appendVectors is O(delta), visible to probes, and replay-safe") {
    val root = tmpDir("ann-store-append")
    val emb = graft.core.Graft.table(spark, sf, "embeddings")
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    val cut = maxId * 4 / 5
    AnnStore.ensureBuilt(spark, root, emb.filter(col("vec_id") <= cut))
    val before = spark.table(AnnStore.assignTable(root)).count()
    val delta = emb.filter(col("vec_id") > cut)
    AnnStore.appendVectors(spark, root, delta)
    val after = spark.table(AnnStore.assignTable(root)).count()
    assert(after == before + delta.count(), "delta rows must all land")
    // replayed delivery: no duplicate inverted-file rows
    AnnStore.appendVectors(spark, root, delta)
    assert(spark.table(AnnStore.assignTable(root)).count() == after,
      "replayed append must be a no-op")
    // INTRA-batch duplicate: both copies are absent from the store, so
    // the stored-table anti join alone cannot catch them
    val root2 = tmpDir("ann-store-intra")
    AnnStore.ensureBuilt(spark, root2, emb.filter(col("vec_id") <= cut))
    val before2 = spark.table(AnnStore.assignTable(root2)).count()
    AnnStore.appendVectors(spark, root2, delta.unionByName(delta.limit(3)))
    assert(spark.table(AnnStore.assignTable(root2)).count() == before2 + delta.count(),
      "an intra-batch duplicate vec_id landed twice in the inverted file")
    // restart shape: a fresh session re-registers the on-disk layout
    // (including the sort spec — a mismatch would fail the next append)
    spark.sql(s"DROP TABLE ${AnnStore.assignTable(root)}")
    assert(!AnnStore.ensureBuilt(spark, root,
      { fail("restart must re-register, not rebuild"); emb }))
    AnnStore.appendVectors(spark, root, delta) // replay after restart: no-op
    assert(spark.table(AnnStore.assignTable(root)).count() == after)
    // appended vectors are probe candidates: probing an appended vector
    // against itself-excluded corpus returns its cell-mates, and the
    // appended ids can appear as neighbors
    val probeOut = AnnStore.probe(spark, root, emb.filter(col("vec_id") > cut))
    assert(probeOut.filter(col("n_id") > cut).count() > 0,
      "appended vectors never surface as neighbors")
  }
}
