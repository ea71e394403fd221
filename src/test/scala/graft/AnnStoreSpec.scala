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

  // ---------------------------------------------------------------- DRIFT

  /** Synthetic drift corpus. Base: 200 vectors in 4 tight axis clusters
    * (ids 0-199, 50 per axis — block layout so the √N stride codebook
    * samples every axis). Shifted batch: 200 vectors (ids 1000-1199) in
    * 10 tight sub-clusters of 20, each centered BETWEEN two axes
    * (cosine-equidistant), members tipped ±toward either axis — so under
    * the FROZEN base codebook every sub-cluster straddles a Voronoi
    * boundary and splits across cells, while a codebook retrained on the
    * full corpus gives each sub-cluster its own cell. */
  private val dim = 8
  private def vecs(ids: Range, mk: Int => Array[Float]) =
    ids.map(i => (i.toLong, mk(i)))
  private def noise(rng: scala.util.Random, amp: Float): Float =
    (rng.nextFloat() * 2 - 1) * amp
  private def baseCorpus(rng: scala.util.Random) =
    vecs(0 until 200, { i =>
      val a = Array.fill(dim)(noise(rng, 0.03f))
      a(i / 50) += 1f; a
    })
  // ten DISTINCT between-axes directions (e_p + w·e_q): intra-sub-cluster
  // cosine ~0.997 dominates the closest inter-sub-cluster cosine ~0.976,
  // so each query's true top-5 stays within its own sub-cluster
  private val pairs = Seq((0, 1, 1f), (0, 2, 1f), (0, 3, 1f), (1, 2, 1f),
    (1, 3, 1f), (2, 3, 1f), (0, 1, 0.6f), (0, 2, 0.6f), (1, 3, 0.6f), (2, 3, 0.6f))
  private def shiftedBatch(rng: scala.util.Random) =
    vecs(1000 until 1200, { i =>
      val j = (i - 1000) / 20; val m = (i - 1000) % 20
      val (p, q, w) = pairs(j)
      val t = if (m % 2 == 0) 0.08f else -0.08f
      val a = Array.fill(dim)(noise(rng, 0.03f))
      a(p) += 1f + t; a(q) += w * (1f - t); a
    })
  private def queryBatch(rng: scala.util.Random) =
    vecs(2000 until 2010, { i =>
      val (p, q, w) = pairs(i - 2000)
      val a = Array.fill(dim)(noise(rng, 0.01f))
      a(p) += 1f; a(q) += w; a
    })

  /** Exact top-5 per query over `corpus` by the store's own quantized
    * cosine — the ground truth a probe's recall is measured against. */
  private def bruteTop5(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
    val c = AnnStore.quantized(corpus)
      .select(col("vec_id").as("n_id"), col("qv").as("c_qv2"), col("nq").as("c_nq2"))
    val q = AnnStore.quantized(queries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
    val cos = expr("long_dot(q_qv, c_qv2)").cast("double") /
      (sqrt(col("q_nq").cast("double")) * sqrt(col("c_nq2").cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    q.crossJoin(c).withColumn("cos_sim", cos)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
  }

  private def recallOf(res: org.apache.spark.sql.DataFrame,
      truth: Map[Long, Set[Long]]): Double = {
    val got = res.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    truth.map { case (q, t) => got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      .sum / truth.size
  }

  test("drift: refresh retrains the codebook, restoring recall and clearing the triggers") {
    val rng = new scala.util.Random(42)
    val root = tmpDir("ann-store-drift")
    val base = baseCorpus(rng).toDF("vec_id", "embedding")
    val shifted = shiftedBatch(rng).toDF("vec_id", "embedding")
    val queries = queryBatch(rng).toDF("vec_id", "embedding")
    AnnStore.ensureBuilt(spark, root, base)
    assert(!AnnStore.shouldRefresh(spark, root),
      "a freshly built store must not demand a refresh")
    AnnStore.appendVectors(spark, root, shifted)
    // the appended fraction (footer metadata vs the BASE_ROWS marker)
    // fires: 100% of the codebook's training size arrived since build
    assert(AnnStore.appendedFraction(spark, root) >= 0.9,
      s"appended fraction: ${AnnStore.appendedFraction(spark, root)}")
    assert(AnnStore.shouldRefresh(spark, root), "drift undetected")

    val truth = bruteTop5(base.unionByName(shifted), queries)
    val frozenRecall = recallOf(
      AnnStore.probe(spark, root, queries, nprobe = 1, k = 5), truth)
    val gen = AnnStore.refresh(spark, root)
    assert(gen >= 1, "refresh must publish a new generation")
    assert(AnnStore.currentGen(spark, root) == gen)
    val refreshedRecall = recallOf(
      AnnStore.probe(spark, root, queries, nprobe = 1, k = 5), truth)
    // boundary-straddling sub-clusters split across frozen cells; the
    // retrained codebook owns them whole
    assert(frozenRecall <= 0.8,
      f"frozen codebook unexpectedly good (recall $frozenRecall%.2f) — drift scenario lost its teeth")
    assert(refreshedRecall >= 0.9,
      f"refresh did not restore recall: $refreshedRecall%.2f (frozen was $frozenRecall%.2f)")
    assert(refreshedRecall > frozenRecall,
      f"refresh did not improve recall: $refreshedRecall%.2f vs $frozenRecall%.2f")
    // triggers cleared: the new codebook was trained on everything stored
    assert(AnnStore.appendedFraction(spark, root) == 0.0)
    assert(!AnnStore.shouldRefresh(spark, root),
      "refresh did not clear its own trigger")
    // no lost vectors across the swap
    assert(spark.table(AnnStore.assignTableCurrent(spark, root)).count() == 400)

    // append + probe keep working against the refreshed generation
    // draws continue from the test's single seeded rng — one generator,
    // one deterministic draw order
    val more = vecs(3000 until 3020, { _ =>
      val a = Array.fill(dim)(noise(rng, 0.03f)); a(0) += 1f; a
    }).toDF("vec_id", "embedding")
    AnnStore.appendVectors(spark, root, more)
    assert(spark.table(AnnStore.assignTableCurrent(spark, root)).count() == 420)

    // restart shape: a dropped registration re-resolves from disk
    spark.sql(s"DROP TABLE ${AnnStore.assignTable(root, gen)}")
    assert(AnnStore.probe(spark, root, queries, nprobe = 1, k = 5)
      .groupBy("q_id").count().filter(col("count") =!= 5).count() == 0,
      "post-restart probe against the refreshed generation failed")

    // crash-safety of the publish: a half-built next generation (no READY
    // marker) is invisible — the live generation keeps serving
    val fsPath = new org.apache.hadoop.fs.Path(s"$root/ann/gen-${gen + 1}")
    val hfs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.mkdirs(fsPath)
    assert(AnnStore.currentGen(spark, root) == gen,
      "a torn refresh dir must not become the live generation")
  }
}
