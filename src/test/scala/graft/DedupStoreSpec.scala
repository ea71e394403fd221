package graft

import graft.pipeline.DedupStore
import org.apache.spark.sql.functions._

/** The persisted MinHash signature index: admission against stored
  * signatures must be indistinguishable from the from-scratch recompute,
  * across single batches and multi-batch append cycles. */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  test("stored-index admission == full-recompute admission on the test corpus") {
    // fresh store root per run: the equivalence must hold for a store built
    // by THIS code, not a cached one from an earlier session
    val demo = SparkEntry.queries("d_incremental_dedup")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    val root = tmpDir("dedup-store-eq")
    val all = graft.core.Graft.table(spark, sf, "documents")
    val cut = all.agg(max("doc_id")).head.getLong(0) * 4 / 5
    assert(DedupStore.ensureBuilt(spark, root, all.filter(col("doc_id") < cut)))
    val stored = DedupStore.admit(spark, root, all.filter(col("doc_id") >= cut), cut)
      .orderBy("doc_id").collect().toSeq
    assert(stored == demo,
      "persisted-index admission diverged from the self-contained recompute")
    // second call is a no-op bootstrap (the index is found, not rebuilt)
    assert(!DedupStore.ensureBuilt(spark, root,
      { fail("corpus must not be re-signed when the store exists"); all }))
  }

  test("property: stored-index admission matches an independent MinHash model") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    // plain-Scala model of the whole signature pipeline — an oracle
    // independent of Spark AND of the sibling demo query
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shingleSet(text: String): Seq[String] = {
      val tk = text.split(" ", -1).toSeq
      if (tk.length < 3) Nil
      else (0 to tk.length - 3).map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").distinct
    }
    def bandSet(sh: Seq[String]): Set[(Int, String)] = {
      val hs = (0 until 8).map(i => sh.map(s => md5hex(s"$i:" + s)).min)
      (0 until 4).map(b => b -> md5hex(hs(2 * b) + hs(2 * b + 1))).toSet
    }
    def jaccard(a: Seq[String], b: Seq[String]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    def modelAdmit(docs: Map[Long, String], cut: Long): Map[Long, (Long, Long, Boolean)] = {
      val sig = docs.collect { case (id, t) if shingleSet(t).nonEmpty =>
        id -> ((bandSet(shingleSet(t)), shingleSet(t)))
      }
      docs.keys.filter(_ >= cut).map { b =>
        val partners =
          if (!sig.contains(b)) Seq.empty[Long]
          else sig.keys.filter { a =>
            a < b && sig(a)._1.intersect(sig(b)._1).nonEmpty &&
              jaccard(sig(a)._2, sig(b)._2) >= 0.1
          }.toSeq
        val stored = partners.count(_ < cut).toLong
        val inBatch = partners.count(_ >= cut).toLong
        b -> ((stored, inBatch, partners.isEmpty))
      }.toMap
    }

    val vocab = Seq("ape", "bat", "cow", "dog", "eel", "fox", "gnu", "hen")
    val docGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val prop = forAll(Gen.listOfN(8, docGen), Gen.listOfN(4, docGen)) { (corpus, batch) =>
      val cut = corpus.length.toLong
      val docs = (corpus ++ batch).zipWithIndex
        .map { case (t, i) => i.toLong -> t }.toMap
      val root = tmpDir("dedup-store-prop")
      DedupStore.ensureBuilt(spark, root,
        docs.filter(_._1 < cut).toSeq.toDF("doc_id", "text"))
      val got = DedupStore.admit(spark, root,
          docs.filter(_._1 >= cut).toSeq.toDF("doc_id", "text"), cut)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap
      got == modelAdmit(docs, cut)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("multi-batch cycle: admit, append admitted, next batch dedups against them") {
    val mk = (id: Long, text: String) => (id, text)
    // corpus: 0 and 1 near-identical, 2 distinct
    val corpus = Seq(
      mk(0L, "alpha beta gamma delta epsilon zeta"),
      mk(1L, "alpha beta gamma delta epsilon eta"),
      mk(2L, "one two three four five six seven")).toDF("doc_id", "text")
    val root = tmpDir("dedup-store-seq")
    DedupStore.ensureBuilt(spark, root, corpus)

    // batch 1: 10 dups corpus doc 0; 11 is new; 12 dups 11 (earlier batch doc)
    val b1 = Seq(
      mk(10L, "alpha beta gamma delta epsilon zeta"),
      mk(11L, "red orange yellow green blue indigo"),
      mk(12L, "red orange yellow green blue violet")).toDF("doc_id", "text")
    val r1 = DedupStore.admit(spark, root, b1, storedIdUpperBound = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // 10 matches BOTH stored docs: 0 exactly, and 1 via the 3 shared
    // shingles (Jaccard 3/5 over the threshold)
    assert(r1(10L) == ((2L, 0L, false)), "dup of a stored doc")
    assert(r1(11L) == ((0L, 0L, true)), "genuinely new")
    assert(r1(12L) == ((0L, 1L, false)), "dup of an earlier batch doc")

    // fold ONLY the admitted doc into the index
    DedupStore.appendAdmitted(spark, root, b1.filter(col("doc_id") === 11L))

    // batch 2: 20 dups the batch-1 ADMITTED doc (now stored); 21 dups the
    // batch-1 REJECTED doc's content — which never entered the index, so
    // it only matches via doc 11 too
    val b2 = Seq(
      mk(20L, "red orange yellow green blue indigo"),
      mk(21L, "completely different words entirely here now")).toDF("doc_id", "text")
    val r2 = DedupStore.admit(spark, root, b2, storedIdUpperBound = 20L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(r2(20L)._1 >= 1L && !r2(20L)._3, "dup of a previously admitted doc")
    assert(r2(21L) == ((0L, 0L, true)))
  }
}
