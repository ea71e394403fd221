package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter data skipping — the point-set complement to the zone-map /
  * z-order machinery in [[Lakehouse]].
  *
  * Zone maps prune by [min, max] RANGE intersection, so they are blind to
  * membership: a probe key inside a file's hull keeps the file even when
  * the key is absent from it (sparse ids, gappy sequences, deletes). A
  * per-file Bloom filter answers "might this file contain THIS key" in
  * constant space with no false negatives, which is exactly the shape of
  * the two big-cluster problems this module serves:
  *
  *  1. '''Row-level semi-join prefilter''' ([[bloomSemiJoin]]): joining a
  *     100 TB fact against a delta whose exact key set is too large to
  *     broadcast (GBs) normally forces a full shuffle of the fact. A Bloom
  *     filter over the delta keys is `numBits/8` bytes (1 MB default)
  *     REGARDLESS of key count; built in one map-side-combinable pass,
  *     shipped as a literal into a codegen'd scan-side predicate, it drops
  *     ~all non-matching fact rows BEFORE the exchange. This is Spark's own
  *     AQE runtime-filter design (`InjectRuntimeFilter`) made explicit and
  *     deterministic — same native expressions, same xxhash64 key
  *     normalization — so the plan shape does not depend on optimizer
  *     thresholds. False positives are removed by the exact semi join that
  *     follows; false negatives are impossible.
  *
  *  2. '''File-level sidecar pruning''' ([[writeBloomIndexed]] /
  *     [[readBloomPruned]]): a key-clustered table gets one serialized
  *     Bloom filter per data file, persisted as a `_bloom_index` sidecar
  *     (hidden from table scans by the underscore convention, KB–MB scale —
  *     the manifest-free analog of Iceberg/Delta file-stats rows, like
  *     [[Lakehouse.zoneMapK]]). A point-set probe consults the sidecar on
  *     the driver (numFiles rows of bounded metadata) and reads only the
  *     files that might contain a probe key. Pruning is a file-list
  *     optimization, never a semantic one: an exact residual filter is
  *     always applied, a data file missing from the sidecar is never
  *     pruned, and the `bf_pruned_scan` oracle pins pruned ≡ full scan.
  *
  * Reference behavior served: the reference's incremental loads probe the
  * lake for already-ingested ids before appending
  * (`raw_data_ingestion_pipeline.py` exists-checks, the anti-join-guarded
  * INSERTs of `insert_*.sql`) — at 100 TB both sides of that probe want
  * skipping, not scanning.
  */
object BloomSkipping {

  /** Seed of Spark's `xxhash64` SQL function — both sides of every bloom
    * (build and probe, executor and driver) normalize keys through
    * xxhash64 with this seed, so any key type hashes identically
    * everywhere. */
  private val XxSeed = 42L

  /** Register Spark's native bloom expressions under SQL-callable names
    * (idempotent, session-scoped — the same per-use discipline as
    * [[graft.functions.VectorExprs.register]]). These are the exact
    * expressions behind AQE runtime filters: `BloomFilterAggregate` is a
    * TypedImperativeAggregate with map-side partials, and
    * `BloomFilterMightContain` carries codegen, so the prefilter stays
    * inside the scan's WholeStageCodegen span. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => new org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)),
      "built-in")
  }

  private def confLong(spark: SparkSession, key: String, default: Long): Long =
    try spark.conf.get(key).toLong catch { case _: Exception => default }

  /** The session's runtime-filter size ceilings (SQLConf defaults: 4M
    * items / 64M bits = 8 MB). `BloomFilterAggregate.checkInputDataTypes`
    * rejects parameters above them, so sizing clamps here: beyond the
    * ceiling a bloom saturates toward a higher false-positive rate —
    * still CORRECT (no false negatives), just less selective. */
  private def maxItems(spark: SparkSession): Long =
    confLong(spark, "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
  private def maxBits(spark: SparkSession): Long =
    confLong(spark, "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)

  private def sizing(spark: SparkSession, expectedItems: Long, fpp: Double): (Long, Long) = {
    val items = math.min(math.max(1L, expectedItems), maxItems(spark))
    val bits = math.min(math.max(64L, BloomFilter.optimalNumOfBits(items, fpp)),
      maxBits(spark))
    (items, bits)
  }

  /** `bloom_agg(xxhash64(key))` as a Column — one-pass, map-side-combinable
    * bloom build sized for `expectedItems` at `fpp`. */
  def bloomAgg(spark: SparkSession, key: Column, expectedItems: Long,
      fpp: Double = 0.03): Column = {
    register(spark)
    val (items, bits) = sizing(spark, expectedItems, fpp)
    call_function("bloom_agg", xxhash64(key), lit(items), lit(bits))
  }

  /** Build a bloom over `keys(key)` and return the serialized filter.
    * Driver-held bounded metadata: `numBits/8` bytes (≤ 8 MB at the conf
    * ceiling) independent of key count — the whole point vs collecting the
    * exact key set. */
  def buildBloom(keys: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    val spark = keys.sparkSession
    val row = keys.agg(bloomAgg(spark, col(key), expectedItems, fpp).as("bf")).head()
    if (row.isNullAt(0))
      // empty build side: an empty V1 bloom (matches nothing)
      serialize(BloomFilter.create(1L))
    else row.getAs[Array[Byte]](0)
  }

  /** `bloom_might_contain(<literal bloom>, xxhash64(key))` — a codegen'd
    * scan-side predicate with no false negatives. The serialized filter
    * rides into every task as a literal, exactly how `InjectRuntimeFilter`
    * ships its subquery result. */
  def mightContain(spark: SparkSession, bloom: Array[Byte], key: Column): Column =
    mightContainHashed(spark, bloom, xxhash64(key))

  /** Probe with an already-xxhash64'd key (multi-column keys hash their
    * tuple with one `xxhash64(k1, k2, ...)` on both sides). */
  def mightContainHashed(spark: SparkSession, bloom: Array[Byte],
      hashedKey: Column): Column = {
    register(spark)
    call_function("bloom_might_contain", lit(bloom), hashedKey)
  }

  /** Exact left-semi join of `fact` against `keys`, with a bloom prefilter
    * on the fact side so the fact exchange carries only probable matches.
    * Semantics are IDENTICAL to the plain semi join (bf_semi_join's oracle
    * pins it): the bloom admits false positives, the semi join removes
    * them; false negatives cannot occur. At scale this turns a
    * full-fact shuffle into a shuffle of the ~matching rows, for the price
    * of one aggregate pass over the (much smaller) delta. */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
      keysKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val spark = fact.sparkSession
    val bf = buildBloom(keys.select(col(keysKey)), keysKey, expectedItems, fpp)
    fact.filter(mightContain(spark, bf, col(factKey)))
      .join(keys.select(col(keysKey).as(factKey)), Seq(factKey), "left_semi")
  }

  /** Exact left-anti join of `fact` against `keys`, bloom-accelerated —
    * the dedup-admission shape (the reference's anti-join-guarded INSERT,
    * `insert_transactions.sql`-family, at 100 TB).
    *
    * No false negatives means `might_contain = false` PROVES a fact key is
    * absent from `keys`: those rows are admitted straight from the scan,
    * no shuffle at all. Only the probable-duplicate sliver (true matches +
    * fpp of the rest) pays the exact anti join. The two branches are
    * disjoint by the predicate, so their union is exactly the plain anti
    * join — bf_anti_join's oracle pins it. Cost shape: two map-side scan
    * passes over the fact (columnar, pushdown intact) in exchange for
    * shrinking the anti join's fact-side exchange from |fact| to
    * ~|matches| — at scale the shuffle, not the scan, is the bottleneck. */
  def bloomAntiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
      keysKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val spark = fact.sparkSession
    val bf = buildBloom(keys.select(col(keysKey)), keysKey, expectedItems, fpp)
    val probable = mightContain(spark, bf, col(factKey))
    val provablyNew = fact.filter(!probable)
    val checked = fact.filter(probable)
      .join(keys.select(col(keysKey).as(factKey)), Seq(factKey), "left_anti")
    provablyNew.unionByName(checked)
  }

  // ------------------------------------------------------------- FILE LEVEL

  /** Hidden sidecar directory (underscore prefix: invisible to parquet
    * table scans, same convention as `_SUCCESS`/`_metadata`). One row per
    * data file: (file name, serialized bloom over the key, row count). */
  private val SidecarDir = "_bloom_index"

  private def fileName(uriOrPath: String): String =
    uriOrPath.substring(uriOrPath.lastIndexOf('/') + 1)

  /** Key-clustered write plus a per-file bloom sidecar.
    *
    * The data files are range-clustered on `key` (tight per-file key
    * locality is what gives a point-probe a small file set to hit); the
    * sidecar is then built in ONE distributed pass over the fresh files —
    * `groupBy(input_file_name())` with the native bloom aggregate — and
    * persisted as parquet next to them. Per-file capacity is sized from
    * the actual row count with 2× slack (range partitions are balanced by
    * construction; the clamp documents the conf ceiling, not a hope). At
    * 100 TB the same rows live in the table format's manifests; this is
    * the manifest-free expression, like [[Lakehouse.zoneMapK]]. */
  def writeBloomIndexed(df: DataFrame, path: String, key: String,
      numFiles: Int = 32, fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    register(spark)
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).option("compression", "snappy").parquet(path)
    val back = spark.read.parquet(path)
    val total = back.count()
    val (items, bits) = sizing(spark,
      math.max(1024L, 2L * total / math.max(1, numFiles)), fpp)
    back
      .groupBy(input_file_name().as("file"))
      .agg(
        call_function("bloom_agg", xxhash64(col(key)), lit(items), lit(bits))
          .as("bloom"),
        count(lit(1)).as("n_rows"))
      .withColumn("file", element_at(split(col("file"), "/"), -1))
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"${path.stripSuffix("/")}/$SidecarDir")
  }

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Point-set probe through the sidecar: keep only the data files whose
    * bloom might contain at least one probe key, then apply the exact
    * `isin` residual — pruning is semantically invisible by construction.
    *
    * Driver work is bounded metadata: numFiles sidecar rows, |probes|
    * driver-hashed keys (the probe set is the SMALL side by assumption —
    * the same boundedness argument as [[Lakehouse.readZPrunedK]]'s box and
    * AnnStore's probed bucket ids). Safety: a data file ABSENT from the
    * sidecar is never pruned (stats-missing discipline shared with the
    * zone maps — correctness cannot depend on sidecar freshness). */
  def readBloomPruned(spark: SparkSession, path: String, key: String,
      probes: Seq[Long]): DataFrame =
    readBloomPrunedWhere(spark, path, key, probes, col(key).isin(probes: _*))

  /** [[readBloomPruned]] with a caller-supplied residual predicate — for
    * probe sets with a compact closed form (`key % 13 = 3 AND key BETWEEN
    * lo AND hi`): the sidecar decision still tests every probe key, but
    * the scan-side residual stays a bounded expression instead of a
    * |probes|-literal `In`, so the plan size (and codegen) is independent
    * of the probe count. CONTRACT: `residual` must hold exactly on the
    * probe set — rows outside it may be pruned at file granularity. */
  def readBloomPrunedWhere(spark: SparkSession, path: String, key: String,
      probes: Seq[Long], residual: Column): DataFrame = {
    require(probes.nonEmpty, "readBloomPruned needs a non-empty probe set")
    val (kept, _) = pruneDecision(spark, path, key, probes)
    if (kept.isEmpty) Lakehouse.read(spark, path).filter(lit(false))
    else {
      // pin the schema from the directory so a subset read cannot drop
      // columns that happen to be all-null in the kept files
      val schema = spark.read.parquet(path).schema
      spark.read.schema(schema).parquet(kept: _*).filter(residual)
    }
  }

  // ---------------------------------------------------------- KEY-SET GUARD
  // A persistent whole-table Bloom filter over the table's key tuples,
  // maintained incrementally so the anti-join-guarded INSERT (S6) stops
  // scanning the store for batches that are mostly new — the common
  // ingestion case. Invariant: the guard's key set is a SUPERSET of the
  // stored keys (it may run ahead — see the commit order below — but never
  // behind), so `might_contain = false` proves a row is fresh and skips
  // the exact anti join entirely; only probable duplicates pay it.
  //
  // Crash safety is an ORDER, not a transaction: the guard merges the
  // batch's keys and persists BEFORE the data append. A crash between the
  // two leaves extra keys in the guard — pure false positives, which only
  // route rows to the exact check (safe); the reverse order could leave
  // stored rows unknown to the guard and silently re-admit duplicates.
  // A missing/unreadable guard file degrades to the plain exact anti join
  // (never trusted, always rebuildable by deletion). The file carries its
  // (expectedItems, numBits) header so every batch bloom is built with
  // identical geometry — `mergeInPlace` requires it.

  private val KeyBloomFile = "_key_bloom"

  /** Guard generation number from a file name: the legacy single file is
    * generation 0, `_key_bloom.g<N>` is generation N. None for anything
    * else (tmp droppings from pre-generation writers). */
  private def guardGen(name: String): Option[Long] =
    if (name == KeyBloomFile) Some(0L)
    else if (name.startsWith(KeyBloomFile + ".g"))
      scala.util.Try(name.stripPrefix(KeyBloomFile + ".g").toLong).toOption
    else None

  /** All guard generation files under the table root, newest first. */
  private def guardFiles(spark: SparkSession,
      path: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .flatMap(st => guardGen(st.getPath.getName).map(_ -> st.getPath))
      .sortBy(-_._1)
  }

  /** (expectedItems, numBits, filter) from the newest PARSEABLE guard
    * generation, or None when absent/torn (safe fallback: the exact anti
    * join). Generations are complete by construction (tmp + rename
    * commit), so falling through past an unparseable file only happens
    * for legacy/corrupted state; and because every caller merges the
    * guard BEFORE appending data (guard-ahead order), a crashed writer
    * leaves no generation AND no data — the surviving guard is never
    * behind the committed rows, which is the invariant that matters:
    * a guard missing committed keys would silently re-admit them. */
  def loadKeyBloom(spark: SparkSession, path: String): Option[(Long, Long, BloomFilter)] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    guardFiles(spark, path).iterator
      .flatMap { case (_, p) =>
        try {
          val in = new java.io.DataInputStream(fs.open(p))
          try Some((in.readLong(), in.readLong(), BloomFilter.readFrom(in)))
          finally in.close()
        } catch { case _: Exception => None }
      }
      .nextOption()
  }

  /** The newest parseable guard generation's SERIALIZED filter bytes —
    * for callers that only feed [[mightContainHashed]] (which ships the
    * bytes to executors and deserializes there): [[loadKeyBloom]] plus
    * a `writeTo` would deserialize AND re-serialize the multi-MB filter
    * on the driver every micro-batch for nothing. The stored bytes past
    * the two header longs ARE the `writeTo` encoding, so they stream out
    * raw; parseability is still validated (same fall-through-to-older-
    * generation contract as loadKeyBloom) by one readFrom over the
    * in-memory copy. */
  def loadKeyBloomBytes(spark: SparkSession, path: String): Option[Array[Byte]] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    guardFiles(spark, path).iterator
      .flatMap { case (_, p) =>
        try {
          val in = new java.io.DataInputStream(fs.open(p))
          val bytes =
            try {
              in.readLong(); in.readLong()
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](1 << 16)
              var n = in.read(buf)
              while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
              bos.toByteArray
            } finally in.close()
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          Some(bytes)
        } catch { case _: Exception => None }
      }
      .nextOption()
  }

  /** Merge `hashedKeys` (a single LongType column of xxhash64'd key
    * tuples) into the table's guard, creating it at `expectedItems`/`fpp`
    * geometry if absent. One aggregate pass over the batch; the stored
    * filter is OR-merged on the driver (bit arrays of identical
    * geometry).
    *
    * CONCURRENCY: the guard commit is OPTIMISTIC, not last-writer-wins.
    * Generations are immutable files (`_key_bloom.g<N>`); a merge loads
    * the newest parseable generation, ORs the batch in, and commits as
    * generation max+1 with CREATE-IF-ABSENT — a concurrent committer
    * racing the same slot makes the create FAIL, and the loser reloads
    * (now seeing the winner's keys) and retries at the next slot, so the
    * chain converges to the union of all writers' key sets and the
    * guard-superset invariant survives concurrency. The filesystem's
    * exclusive-create is the arbiter (atomic on HDFS/ABFS; on S3 use a
    * conditional-PUT-enabled client); same-JVM writers additionally
    * serialize on a process lock so local-FS create races cannot occur
    * in tests. Older generations are swept down to the previous one
    * (kept for in-flight readers). After bounded retries the call FAILS
    * rather than clobbering. */
  def mergeKeyBloom(spark: SparkSession, path: String, hashedKeys: DataFrame,
      expectedItems: Long, fpp: Double = 0.03): Unit = {
    val (defItems, defBits) = sizing(spark, expectedItems, fpp)
    register(spark)
    val kc = hashedKeys.columns.head
    // the batch bloom is built ONCE per geometry; retries reuse it
    var batchGeom: Option[(Long, Long)] = None
    var batchBloom: Option[BloomFilter] = None
    def batchAt(items: Long, bits: Long): Option[BloomFilter] = {
      if (!batchGeom.contains((items, bits))) {
        val row = hashedKeys
          .agg(call_function("bloom_agg", col(kc), lit(items), lit(bits)).as("bf"))
          .head()
        batchBloom =
          if (row.isNullAt(0)) None
          else Some(BloomFilter.readFrom(row.getAs[Array[Byte]](0)))
        batchGeom = Some((items, bits))
      }
      batchBloom
    }
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    jvmLock(fs.makeQualified(dir).toString).synchronized {
      var attempt = 0
      while (attempt < 8) {
        attempt += 1
        val gens = guardFiles(spark, path)
        val (items, bits, existing) = loadKeyBloom(spark, path)
          .map { case (i, b, bf) => (i, b, Some(bf)) }
          .getOrElse((defItems, defBits, None))
        // `existing` is parsed fresh each attempt, so merging in place
        // mutates a private copy; the batch bloom stays pristine
        val merged = (existing, batchAt(items, bits)) match {
          case (Some(a), Some(b)) => a.mergeInPlace(b); a
          case (Some(a), None) => a
          case (None, Some(b)) => b
          case (None, None) => return
        }
        val nextGen = gens.headOption.map(_._1 + 1).getOrElse(1L)
        val target = new org.apache.hadoop.fs.Path(dir,
          s"$KeyBloomFile.g$nextGen")
        // full content to a hidden tmp, then rename into the generation
        // slot — the commit point must not precede content durability
        // (a concurrent merger reading a mid-write generation as torn
        // would fall back a generation and commit a successor missing
        // our keys: a guard BEHIND the data silently re-admits
        // duplicates). Rename semantics contract as in
        // [[ManifestSnapshots]]: atomic fail-on-existing on HDFS-like
        // stores; same-process writers serialize on the lock.
        val tmp = new org.apache.hadoop.fs.Path(dir,
          s".$KeyBloomFile.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        val committed =
          try {
            fs.mkdirs(dir)
            val out = new java.io.DataOutputStream(fs.create(tmp, true))
            try { out.writeLong(items); out.writeLong(bits); merged.writeTo(out) }
            finally out.close()
            val ok = !fs.exists(target) && fs.rename(tmp, target)
            if (!ok) fs.delete(tmp, false): Unit
            ok
          } catch {
            case _: java.io.IOException =>
              fs.delete(tmp, false): Unit
              false
          }
        if (committed) {
          // sweep generations older than the PREVIOUS one: an in-flight
          // reader of the prior newest generation keeps its file
          gens.drop(1).foreach { case (_, p) => fs.delete(p, false): Unit }
          return
        }
        // lost the slot to a concurrent committer: reload and retry
      }
      throw new IllegalStateException(
        s"mergeKeyBloom: lost the guard-commit race 8 times under $path — " +
          "pathological contention; serialize ingest through one committer")
    }
  }

  /** Same-process commit lock per (qualified) table root — makes the
    * exclusive-create protocol race-free within one JVM even on local
    * filesystems whose create(overwrite=false) is check-then-act. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[core] def jvmLock(key: String): Object =
    jvmLocks.computeIfAbsent(key, _ => new Object)

  /** The pruning decision itself — (kept data files, total data files) for
    * a probe set — exposed so specs and diagnostics can assert skipping
    * power without re-deriving it. A file the sidecar does not know is
    * always kept.
    *
    * The decision is computed DISTRIBUTED over the sidecar table: per-file
    * bloom bytes scale with rows-per-file, so at 100 TB the sidecar as a
    * whole is ~bits-per-row × |table| — far too big to collect. Each
    * executor deserializes its partition's blooms, tests the (small,
    * broadcast-by-closure) hashed probe set, and only FILE NAMES travel to
    * the driver: O(|files|) strings, the same boundedness class as any
    * file listing. mapPartitions is justified here the same way the image
    * decode is — amortizing object (bloom) deserialization per batch over
    * opaque binary, not expressible as a Catalyst predicate without a
    * per-row re-parse. */
  def pruneDecision(spark: SparkSession, path: String, key: String,
      probes: Seq[Long]): (Seq[String], Int) = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    // Hash the driver-side probes with the KEY COLUMN'S type, not an
    // assumed LongType: the sidecar blooms were built with
    // `xxhash64(col(key))`, which hashes the column's own physical type
    // (xxhash64 folds an Int's 4 bytes, a Long's 8 — different values for
    // the same number). A LongType-hashed probe against an IntegerType
    // sidecar would make the bloom report FALSE NEGATIVES and silently
    // prune files that contain probe keys. A probe value outside the
    // column type's range provably matches no stored key and drops from
    // the sidecar test (its residual row set is empty anyway); a
    // non-integral key type disables pruning entirely (every file kept —
    // correct, just unskipped) rather than guessing a hash encoding.
    val keyType = spark.read.parquet(path).schema
      .find(_.name == key)
      .getOrElse(throw new IllegalArgumentException(
        s"pruneDecision: no column '$key' under $path"))
      .dataType
    val hashedOpt: Option[Array[Long]] = keyType match {
      case LongType =>
        Some(probes.map(v => XxHash64Function.hash(v, LongType, XxSeed)).toArray)
      case IntegerType =>
        Some(probes.collect { case v if v >= Int.MinValue && v <= Int.MaxValue =>
          XxHash64Function.hash(v.toInt, IntegerType, XxSeed) }.toArray)
      case ShortType =>
        Some(probes.collect { case v if v >= Short.MinValue && v <= Short.MaxValue =>
          XxHash64Function.hash(v.toShort, ShortType, XxSeed) }.toArray)
      case ByteType =>
        Some(probes.collect { case v if v >= Byte.MinValue && v <= Byte.MaxValue =>
          XxHash64Function.hash(v.toByte, ByteType, XxSeed) }.toArray)
      case _ => None
    }
    hashedOpt match {
      case Some(hashed) => pruneDecisionHashed(spark, path, hashed)
      case None => // unsupported key type: keep everything, prune nothing
        val all = listDataFiles(spark, path)
        (all.map(_.toString), all.size)
    }
  }

  private def listDataFiles(spark: SparkSession,
      path: String): Seq[org.apache.hadoop.fs.Path] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(hp).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getPath)
  }

  private def pruneDecisionHashed(spark: SparkSession, path: String,
      hashed: Array[Long]): (Seq[String], Int) = {
    import spark.implicits._
    val decisions: Array[(String, Boolean)] =
      spark.read.parquet(s"${path.stripSuffix("/")}/$SidecarDir")
        .select("file", "bloom").as[(String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (file, bytes) =>
            val bf = BloomFilter.readFrom(bytes)
            (file, hashed.exists(bf.mightContainLong))
          }
        }.collect()
    val admitted = decisions.iterator.collect {
      case (f, true) => fileName(f) }.toSet
    val indexed = decisions.iterator.map { case (f, _) => fileName(f) }.toSet

    val dataFiles = listDataFiles(spark, path)
    val kept = dataFiles.filter { p =>
      val n = p.getName
      admitted.contains(n) || !indexed.contains(n) // unindexed: never pruned
    }
    (kept.map(_.toString), dataFiles.size)
  }
}
