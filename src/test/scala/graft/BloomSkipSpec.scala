package graft

import graft.core.{BloomSkipping, Lakehouse}
import org.apache.spark.sql.functions._

/** Bloom-filter data skipping (core/BloomSkipping): the point-set
  * complement to ZOrderSpec's range skipping. Pins
  *  (1) semantic transparency — a sidecar-pruned read returns EXACTLY the
  *      full scan + filter result,
  *  (2) pruning power — a narrow probe band touches few of the clustered
  *      files,
  *  (3) the membership advantage — probes inside every file's [min,max]
  *      hull but inside NO file's key set prune everything, where a
  *      zone-map range check prunes nothing (this case is WHY blooms
  *      exist next to zone maps),
  *  (4) safety — a data file the sidecar does not know is never pruned,
  *      and the bloom semi-join admits every true match (no false
  *      negatives; the exact join removes false positives).
  */
class BloomSkipSpec extends SparkSpec {

  import spark.implicits._

  test("pruned read ≡ full filter, few files touched for a narrow band") {
    val path = tmpDir("bloomidx") + "/t"
    val df = (0L until 10000L).toDF("id")
      .withColumn("payload", col("id") * 3 + 1)
    BloomSkipping.writeBloomIndexed(df, path, "id", numFiles = 16)

    val probes = (1000L to 1200L by 7L)
    val pruned = BloomSkipping.readBloomPruned(spark, path, "id", probes)
    val full = spark.read.parquet(path).filter(col("id").isin(probes: _*))
    assert(pruned.columns.toSeq == full.columns.toSeq)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    assert(full.count() == probes.size, "every probe id exists by construction")

    val (kept, total) = BloomSkipping.pruneDecision(spark, path, "id", probes)
    assert(total == 16)
    assert(kept.size <= 3,
      s"a 2%-of-domain band should touch ≤3 of 16 range-clustered files, kept ${kept.size}")
  }

  test("membership pruning beats range pruning: absent in-hull probes skip everything") {
    val path = tmpDir("bloomgap") + "/t"
    // even ids only: every file's [min,max] hull is dense in RANGE but
    // covers only half the ids in SET
    val df = (0L until 20000L by 2L).toDF("id")
    BloomSkipping.writeBloomIndexed(df, path, "id", numFiles = 16)

    val oddProbes = (501L until 19000L by 1000L).toSeq // all absent, all in-hull
    val (kept, total) = BloomSkipping.pruneDecision(spark, path, "id", oddProbes)
    assert(total == 16)
    assert(kept.size <= 1, // fpp 0.01 x 16 files: allow one false-positive file
      s"absent probes should bloom-prune ~all files, kept ${kept.size}")

    // the zone-map range check over the same files would keep nearly all:
    // the probes intersect almost every file's hull
    val hulls = Lakehouse.zoneMapK(spark, path, Seq("id"))
    val rangeKept = hulls.count { case (_, Seq((mn, mx))) =>
      oddProbes.exists(p => p >= mn && p <= mx) }
    assert(rangeKept >= 12,
      s"control: min/max pruning keeps ~all files here (kept $rangeKept of 16)")

    // and the pruned read is still exactly the (empty) filter result
    val pruned = BloomSkipping.readBloomPruned(spark, path, "id", oddProbes)
    assert(pruned.count() == 0)
  }

  test("a data file the sidecar does not know is never pruned") {
    val path = tmpDir("bloomapp") + "/t"
    BloomSkipping.writeBloomIndexed((0L until 1000L).toDF("id"), path, "id",
      numFiles = 4)
    // an append the sidecar has not indexed (new part- files, stale sidecar)
    (100000L until 100010L).toDF("id")
      .coalesce(1).write.mode("append").parquet(path)

    val probes = Seq(100003L, 100007L)
    val pruned = BloomSkipping.readBloomPruned(spark, path, "id", probes)
    assert(pruned.as[Long].collect().sorted.toSeq == Seq(100003L, 100007L),
      "rows in unindexed files must survive pruning")
  }

  test("bloom semi-join ≡ exact semi join, prefilter in the plan, no false negatives") {
    // parquet-backed fact: over a LocalRelation the optimizer evaluates
    // the prefilter eagerly (ConvertToLocalRelation) and the plan
    // assertion below would see no Filter node — the real shape is a scan
    val factPath = tmpDir("bloomfact") + "/t"
    (0L until 20000L).toDF("k").withColumn("v", col("k") % 97)
      .write.parquet(factPath)
    val fact = spark.read.parquet(factPath)
    val keys = (0L until 20000L by 137L).toDF("k")

    val viaBloom = BloomSkipping.bloomSemiJoin(fact, keys, "k", "k",
      expectedItems = 200L)
    val exact = fact.join(keys, Seq("k"), "left_semi")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
    assert(exact.count() > 0)

    // the bloom prefilter must sit in the fact scan's stage (a Filter on
    // might_contain BELOW the join), not as post-join decoration
    viaBloom.collect()
    val plan = viaBloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "native BloomFilterMightContain prefilter missing from the physical plan")
  }

  test("bloom anti-join ≡ exact anti join (provably-new branch + checked sliver)") {
    val fact = (0L until 20000L).toDF("k").withColumn("v", col("k") % 97)
    val keys = (0L until 20000L by 137L).toDF("k")

    val viaBloom = BloomSkipping.bloomAntiJoin(fact, keys, "k", "k",
      expectedItems = 200L)
    val exact = fact.join(keys, Seq("k"), "left_anti")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
    // both branches are exercised: result strictly between 0 and |fact|
    val n = viaBloom.count()
    assert(n > 0 && n < 20000L)
  }

  private def guardBatch(lo: Long, hi: Long) =
    (lo until hi).toDF("id")
      .withColumn("pcol", (col("id") % 4).cast("string"))
      .withColumn("payload", col("id") * 7)

  test("bloom-guarded anti-join append ≡ plain path across overlapping batches") {
    val base = tmpDir("bloomguard")
    val plainP = base + "/plain"
    val guardP = base + "/guarded"
    val batches = Seq(
      guardBatch(0, 500),
      guardBatch(400, 900), // overlap
      guardBatch(0, 900),   // full replay
      guardBatch(850, 1000))
    batches.foreach { b =>
      Lakehouse.antiJoinAppend(spark, b, plainP, Seq("id"), Seq("pcol"))
      Lakehouse.antiJoinAppendBloomGuarded(spark, b, guardP, Seq("id"), Seq("pcol"))
    }
    val plain = spark.read.parquet(plainP)
    val guarded = spark.read.parquet(guardP)
    assert(guarded.count() == 1000)
    assert(guarded.exceptAll(plain).isEmpty && plain.exceptAll(guarded).isEmpty)
  }

  test("guard running ahead of the data (crash between bloom write and append) stays safe") {
    val p = tmpDir("bloomcrash") + "/t"
    Lakehouse.antiJoinAppendBloomGuarded(spark, guardBatch(0, 100), p, Seq("id"), Seq("pcol"))
    // simulate the crash window: keys 100..200 merged into the guard but
    // their data append never happened
    BloomSkipping.mergeKeyBloom(spark, p,
      (100L until 200L).toDF("id").select(xxhash64(col("id")).as("h")), 4000000L)
    // the replayed admission must still land those rows — exactly once
    Lakehouse.antiJoinAppendBloomGuarded(spark, guardBatch(100, 200), p, Seq("id"), Seq("pcol"))
    Lakehouse.antiJoinAppendBloomGuarded(spark, guardBatch(100, 200), p, Seq("id"), Seq("pcol"))
    val ids = spark.read.parquet(p).select("id").as[Long].collect().sorted
    assert(ids.toSeq == (0L until 200L).toSeq, "ahead-running guard lost or duplicated rows")
  }

  test("a lost guard self-heals from the store, preserving the superset invariant") {
    val p = tmpDir("bloomlost") + "/t"
    Lakehouse.antiJoinAppendBloomGuarded(spark, guardBatch(0, 300), p, Seq("id"), Seq("pcol"))
    // the guard file vanishes (operator deletion, copy that dropped
    // underscore files, torn write)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val guards = fs.globStatus(new org.apache.hadoop.fs.Path(p, "_key_bloom*"))
    assert(guards.nonEmpty && guards.forall(g => fs.delete(g.getPath, false)))
    // next batch takes the exact path AND rebuilds the guard from the store
    Lakehouse.antiJoinAppendBloomGuarded(spark, guardBatch(250, 400), p, Seq("id"), Seq("pcol"))
    assert(BloomSkipping.loadKeyBloom(spark, p).isDefined, "guard not rebuilt")
    // the rebuilt guard must know batch-1 keys: a replay of them may not re-admit
    Lakehouse.antiJoinAppendBloomGuarded(spark, guardBatch(0, 400), p, Seq("id"), Seq("pcol"))
    assert(spark.read.parquet(p).count() == 400,
      "rebuilt guard broke the superset invariant and re-admitted stored rows")
  }

  test("null key tuples stay replay-safe through the guard (<=> semantics)") {
    val p = tmpDir("bloomnull") + "/t"
    val rows = Seq[(java.lang.Long, Long)]((1L, 10L), (null, 20L))
      .toDF("k", "v").withColumn("pcol", lit("a"))
    Lakehouse.antiJoinAppendBloomGuarded(spark, rows, p, Seq("k", "v"), Seq("pcol"))
    Lakehouse.antiJoinAppendBloomGuarded(spark, rows, p, Seq("k", "v"), Seq("pcol"))
    assert(spark.read.parquet(p).count() == 2,
      "NULL-keyed row duplicated or dropped on replay")
  }

  test("sidecar pruning is type-faithful: an INT key column never false-negative-prunes") {
    // regression: the sidecar blooms hash the column's OWN type via
    // xxhash64; probing with LongType-hashed values against an
    // IntegerType-built sidecar yields different hashes, the blooms
    // report false negatives, and files holding probe keys get pruned —
    // silent wrong results. pruneDecision must hash with the key's type.
    val path = tmpDir("bloomint") + "/t"
    val df = (0 until 10000).toDF("id") // IntegerType key
      .withColumn("payload", col("id") * 3 + 1)
    BloomSkipping.writeBloomIndexed(df, path, "id", numFiles = 16)
    val probes = (1000L to 1200L by 7L)
    val pruned = BloomSkipping.readBloomPruned(spark, path, "id", probes)
    assert(pruned.count() == probes.size,
      "present INT keys must never be pruned away (type-mismatched probe hash)")
    // and pruning still has power on the int-typed sidecar
    val (kept, total) = BloomSkipping.pruneDecision(spark, path, "id", probes)
    assert(total == 16 && kept.size <= 3,
      s"int-keyed sidecar should still prune (kept ${kept.size}/16)")
    // unsupported key types disable pruning, never break it
    val spath = tmpDir("bloomstr") + "/t"
    BloomSkipping.writeBloomIndexed(
      (0 until 100).toDF("n").select(col("n").cast("string").as("id"), col("n")),
      spath, "id", numFiles = 2)
    val (keptS, totalS) = BloomSkipping.pruneDecision(spark, spath, "id", Seq(1L, 2L))
    assert(keptS.size == totalS, "non-integral key type must keep every file")
  }

  test("readBloomPrunedWhere: closed-form residual ≡ literal-In residual") {
    val path = tmpDir("bloomresid") + "/t"
    BloomSkipping.writeBloomIndexed(
      (0L until 20000L).toDF("id").withColumn("v", col("id") % 7),
      path, "id", numFiles = 16)
    val (lo, hi) = (5000L, 7000L)
    val first = lo + ((3 - lo % 13) + 13) % 13
    val probes = first to hi by 13
    val viaWhere = BloomSkipping.readBloomPrunedWhere(spark, path, "id", probes,
      col("id") % 13 === 3 && col("id").between(lo, hi))
    val viaIn = BloomSkipping.readBloomPruned(spark, path, "id", probes)
    assert(viaWhere.exceptAll(viaIn).isEmpty && viaIn.exceptAll(viaWhere).isEmpty)
    assert(viaIn.count() == probes.size)
  }

  test("concurrent guard merges converge to the union (no lost keys)") {
    val p = tmpDir("bloomrace") + "/t"
    // 8 writers, disjoint key ranges, all racing the generation chain
    val threads = (0 until 8).map { i =>
      new Thread(() =>
        BloomSkipping.mergeKeyBloom(spark, p,
          (i * 1000L until (i + 1) * 1000L).toDF("id")
            .select(xxhash64(col("id")).as("h")),
          expectedItems = 100000L))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val (_, _, guard) = BloomSkipping.loadKeyBloom(spark, p).get
    // every writer's keys must be present — a lost RMW would drop a range
    val hashes = (0L until 8000L).toDF("id").select(xxhash64(col("id")).as("h"))
      .collect().map(_.getLong(0))
    assert(hashes.forall(guard.mightContainLong),
      "a concurrent merge lost another writer's keys (superset invariant broken)")
  }

  test("empty probe set is refused, empty build side matches nothing") {
    val path = tmpDir("bloomempty") + "/t"
    BloomSkipping.writeBloomIndexed((0L until 100L).toDF("id"), path, "id",
      numFiles = 2)
    intercept[IllegalArgumentException] {
      BloomSkipping.readBloomPruned(spark, path, "id", Seq.empty)
    }
    // empty delta: the semi join result is empty, not a crash
    val fact = (0L until 100L).toDF("k")
    val none = fact.filter(col("k") < 0).select("k")
    assert(BloomSkipping.bloomSemiJoin(fact, none, "k", "k", 1L).count() == 0)
  }
}
