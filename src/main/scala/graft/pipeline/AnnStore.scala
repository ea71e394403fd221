package graft.pipeline

import graft.core.{Graft, Lakehouse, StoreRoots}
import graft.queries.{EmbeddingParity, SimilarityQueries}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PERSISTED IVF serving index that makes similarity search O(probe)
  * instead of O(corpus) per query batch: the codebook (centroids) and the
  * cell-bucketed inverted file (assignments) are lake tables written once,
  * so serving a query batch costs
  *
  *   |queries| × |centroids| broadcast assignments (pick nprobe cells)
  *   + a bucket-PRUNED scan of only the probed cells' files
  *   + exact re-ranking of the candidates in those cells
  *
  * and NEVER a corpus re-scan or re-assignment — [[DedupStore]]'s stored-
  * index idiom applied to ANN. The reference keeps embeddings in plain
  * object storage and brute-forces matches offline; this is the engine's
  * forward-looking serving path at 100 TB: cells ~√N rows, the probe set a
  * driver-bounded `IN` list over the bucket column, so the scan touches
  * nprobe·|queries| buckets of data, not N.
  *
  * Layout (GENERATIONS — drift maintenance, see [[refresh]]):
  *  - generation 0 (the initial build):
  *      centroids   `$root/ann/centroids`          plain parquet, ~√N rows
  *      assign      `$root/ann/assign`             [[Lakehouse.ctasBucketed]]
  *                                                 on `cid`, sorted by cid
  *  - generation g>0 (each refresh):  `$root/ann/gen-<g>/{centroids,assign}`
  *    published atomically through [[StoreRoots.ensure]] (build in a
  *    private sibling, `_STORE_READY` written last, rename-publish), so a
  *    crashed refresh is invisible and the previous generation keeps
  *    serving. The live generation is the max READY one.
  *
  * DRIFT: [[appendVectors]] assigns new vectors against the live FROZEN
  * codebook (standard IVF practice — the codebook samples the
  * distribution, not every row). Under sustained appends from a SHIFTED
  * distribution the frozen codebook stops resembling the corpus: appended
  * mass crowds into few cells (probe cost grows toward O(append batch))
  * and semantic clusters straddle stale Voronoi boundaries (recall at
  * fixed nprobe decays). [[shouldRefresh]] detects both — appended
  * fraction from parquet FOOTER metadata alone, then cell skew
  * (max/median cell size) from one column-pruned aggregate — and
  * [[refresh]] retrains the codebook on the CURRENT stored corpus
  * (stride seed + one exact floor-mean Lloyd round, the ann_ivf_kmeans
  * math) and reassigns, as the next generation. Mirrors the reference's
  * continuously re-upserted serving store (features_pipeline.py:203-256),
  * which never lets the serving layer drift from the corpus it serves.
  *
  * All math inherits the engine's exact-integer embedding convention
  * (floor(x·1e6) quantization, native long_dot, one IEEE division at the
  * end), so a stored-index probe returns bit-identically what the
  * from-scratch `ann_ivf` query computes — which is how the stored path
  * stays under the same DuckDB oracle.
  *
  * Lifecycle contract: [[ServingStore]] — this store is the contract's
  * fullest instance (generational publish, replay-safe admission AND a
  * live maintenance trigger). [[VectorPipeline.ingest]] is the
  * parameterized lifecycle (policy thresholds exposed); the trait's
  * [[ServingStore.ingestBatch]] runs the same shape at the defaults.
  */
object AnnStore extends ServingStore {

  override def storeName: String = "ann"

  override def ingestKey: String = "vec_id"

  /** [[ServingStore.appendBatch]] = [[appendVectors]]. */
  override def appendBatch(spark: SparkSession, root: String,
      batch: DataFrame): Unit = appendVectors(spark, root, batch)

  /** [[ServingStore.shouldMaintain]] = [[shouldRefresh]] at the default
    * drift thresholds. */
  override def shouldMaintain(spark: SparkSession, root: String): Boolean =
    shouldRefresh(spark, root)

  /** [[ServingStore.maintain]] = [[refresh]] (generational retrain). */
  override def maintain(spark: SparkSession, root: String): Unit = {
    refresh(spark, root); ()
  }

  val Buckets = 32

  private def ident(root: String): String =
    root.replaceAll("[^a-zA-Z0-9]", "_").toLowerCase
  def assignTable(root: String): String = "ann_assign_" + ident(root)
  def centroidsPath(root: String): String = s"$root/ann/centroids"
  def assignPath(root: String): String = s"$root/ann/assign"

  // ---------------------------------------------------------- GENERATIONS

  private def annBase(root: String): String = s"${root.stripSuffix("/")}/ann"
  private def genDir(root: String, g: Long): String = s"${annBase(root)}/gen-$g"
  def assignTable(root: String, g: Long): String =
    if (g == 0L) assignTable(root) else s"${assignTable(root)}_g$g"
  def centroidsPath(root: String, g: Long): String =
    if (g == 0L) centroidsPath(root) else s"${genDir(root, g)}/centroids"
  def assignPath(root: String, g: Long): String =
    if (g == 0L) assignPath(root) else s"${genDir(root, g)}/assign"

  /** The live generation: the max gen-<g> dir with a completed
    * [[StoreRoots]] publish, 0 (the initial layout) when none. */
  def currentGen(spark: SparkSession, root: String): Long = {
    val base = new Path(annBase(root))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return 0L
    Option(fs.globStatus(new Path(base, "gen-*"))).map(_.toSeq).getOrElse(Nil)
      .flatMap(st => st.getPath.getName.stripPrefix("gen-").toLongOption)
      .filter(g => StoreRoots.isReady(spark, genDir(root, g)))
      .sorted.lastOption.getOrElse(0L)
  }

  /** Resolve the live generation AND make its assign table usable on this
    * session (a restart loses the in-memory catalog; re-register from the
    * on-disk layout marker, [[Lakehouse.ensureBucketedTable]]). */
  private def resolve(spark: SparkSession, root: String): Long = {
    val g = currentGen(spark, root)
    Lakehouse.ensureBucketedTable(spark, assignTable(root, g),
      assignPath(root, g), "cid", Buckets, sortCols = Seq("cid"))
    g
  }

  /** The live generation's assign table name, registered on this session. */
  def assignTableCurrent(spark: SparkSession, root: String): String =
    assignTable(root, resolve(spark, root))

  // -------------------------------------------------------------- BUILD

  /** Vectors → the exact-integer form (vec_id, qv, nq). Accepts either
    * raw float embeddings (an `embedding` column, quantized floor(x·1e6))
    * or ALREADY-integral vectors (a `qv` array<bigint> column — the media
    * encoders emit exact integer histograms directly), so every vector
    * family rides the same store. */
  def quantized(embeddings: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val base =
      if (embeddings.columns.contains("qv"))
        embeddings.select(col("vec_id"), col("qv"))
      else embeddings.select(col("vec_id"), EmbeddingParity.quantExpr.as("qv"))
    base.withColumn("nq", expr("long_dot(qv, qv)"))
  }

  /** Exact cosine of (qv, nq) against centroid columns (c_qv, c_nq). */
  private val centCos: Column =
    expr("long_dot(qv, c_qv)").cast("double") /
      (sqrt(col("nq").cast("double")) * sqrt(col("c_nq").cast("double")))

  /** Nearest-cell ranking of `vecs` against a broadcast codebook; keeps
    * ranks 1..nprobe. Deterministic: (cosine DESC, cid) total order. */
  private def rankCells(vecs: DataFrame, cent: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cid"))
    vecs.crossJoin(broadcast(cent))
      .withColumn("c_cos", centCos)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
  }

  /** Idempotent store bootstrap: re-register an existing on-disk index on a
    * fresh session, build from `embeddings` only when absent. The codebook
    * is the engine's deterministic √N stride sample (the k-means-refined
    * variant is what [[refresh]] produces — the store contract only needs
    * SOME frozen codebook per generation). Returns true when (re)built.
    *
    * Repairing a generation g>0 that lost its artifacts goes through the
    * SAME private-build/rename-publish discipline as [[refresh]] (as
    * generation g+1): writing into the already-READY gen-g dir in place
    * would let a concurrent reader of that generation observe a partial
    * index mid-repair. Generation 0 (the initial layout) builds in place
    * only when the store has never existed — there is no published
    * generation for a reader to be holding. */
  def ensureBuilt(spark: SparkSession, root: String,
      embeddings: => DataFrame): Boolean = {
    val g = currentGen(spark, root)
    // sortCols must match the CTAS layout: a post-restart re-registration
    // without them would make the next appendBucketed (which sorts) fail
    // on a bucketing-spec mismatch
    val haveAssign = Lakehouse.ensureBucketedTable(spark, assignTable(root, g),
      assignPath(root, g), "cid", Buckets, sortCols = Seq("cid"))
    if (haveAssign && Lakehouse.tableExists(spark, centroidsPath(root, g)))
      return false
    val n = quantized(embeddings).persist()
    try {
      // the count doubles as cache materialization: `n` is an arbitrary
      // (possibly non-parquet-backed) plan scanned twice more below
      val total = n.count()
      val stride = SimilarityQueries.centroidStride(total)
      def build(centPath: String, assignTbl: String, assignDir: String,
          markerDir: String): Unit = {
        val cent = n.filter(pmod(col("vec_id"), lit(stride)) === 0)
          .select(col("vec_id").as("cid"), col("qv").as("c_qv"), col("nq").as("c_nq"))
        Lakehouse.ctas(cent, centPath)
        val assign = rankCells(n, Lakehouse.read(spark, centPath), 1)
          .select(col("cid"), col("vec_id"), col("qv"), col("nq"))
        Lakehouse.ctasBucketed(assign, assignTbl, "cid", Buckets,
          sortCols = Seq("cid"), path = Some(assignDir))
        writeBaseRows(spark, markerDir, total)
      }
      if (g == 0L)
        build(centroidsPath(root, 0L), assignTable(root, 0L),
          assignPath(root, 0L), baseDirOf(root, 0L))
      else {
        val next = g + 1
        val buildTbl = assignTable(root, next) + "_build"
        StoreRoots.ensure(spark, genDir(root, next)) { tmp =>
          build(s"$tmp/centroids", buildTbl, s"$tmp/assign", tmp)
          // the build registration points at the PRIVATE dir — drop it
          // (external table, files stay); re-registered post-rename
          spark.sql(s"DROP TABLE IF EXISTS $buildTbl")
          ()
        }
        resolve(spark, root)
        ()
      }
      true
    } finally { n.unpersist(); () }
  }

  def centroids(spark: SparkSession, root: String): DataFrame =
    centroids(spark, root, currentGen(spark, root))

  /** Generation-pinned codebook read: every internal caller that resolved
    * a generation for the assign table must read THIS codebook, not
    * re-resolve — a refresh flipping generations between the two reads
    * would otherwise mix cid spaces across codebooks. */
  private def centroids(spark: SparkSession, root: String, g: Long): DataFrame =
    Lakehouse.read(spark, centroidsPath(root, g))

  // -------------------------------------------------------------- APPEND

  /** O(delta) vector admission: assign ONLY the new vectors against the
    * live generation's FROZEN codebook and bucket-append them into its
    * inverted file. The next probe sees them with no rebuild. Sustained
    * appends drift the corpus away from the frozen codebook — that is
    * [[shouldRefresh]]/[[refresh]]'s job, not this call's. */
  def appendVectors(spark: SparkSession, root: String, newEmbeddings: DataFrame): Unit = {
    val g = resolve(spark, root)
    // replay-safe (same contract as the dedup index): a re-delivered batch
    // must not duplicate inverted-file rows — a duplicated vector would
    // surface twice in every probe of its cell. dropDuplicates covers the
    // INTRA-batch copy the stored-table anti join cannot see (both copies
    // are absent from the store, both would pass the guard).
    val fresh = newEmbeddings.dropDuplicates("vec_id").join(
      spark.table(assignTable(root, g)).select("vec_id"), Seq("vec_id"), "left_anti")
    val assign = rankCells(quantized(fresh), centroids(spark, root, g), 1)
      .select(col("cid"), col("vec_id"), col("qv"), col("nq"))
    Lakehouse.appendBucketed(assign, assignTable(root, g), "cid", Buckets,
      sortCols = Seq("cid"))
  }

  // ------------------------------------------------------------- REFRESH

  /** Rows the live codebook was trained on, recorded beside it at build /
    * refresh time — the denominator of the appended-fraction trigger. */
  private val BaseRowsFile = "_BASE_ROWS"

  private def writeBaseRows(spark: SparkSession, dir: String, rows: Long): Unit =
    graft.core.Markers.write(spark, new Path(dir, BaseRowsFile), rows.toString)

  private def readBaseRows(spark: SparkSession, dir: String): Option[Long] =
    graft.core.Markers.read(spark, new Path(dir, BaseRowsFile))
      .flatMap(_.trim.toLongOption)

  private def baseDirOf(root: String, g: Long): String =
    if (g == 0L) annBase(root) else genDir(root, g)

  /** Fraction of the inverted file appended since the live codebook was
    * trained: (rowsNow − rowsAtTrain) / rowsAtTrain. METADATA-ONLY — rows
    * now comes from the assign files' parquet footers, rowsAtTrain from
    * the marker beside the codebook; no job, no scan. A store predating
    * the marker reports the conservative maximum (refresh-worthy). */
  def appendedFraction(spark: SparkSession, root: String): Double = {
    val g = currentGen(spark, root)
    readBaseRows(spark, baseDirOf(root, g)) match {
      case None => Double.MaxValue
      case Some(base) if base <= 0 => Double.MaxValue
      case Some(base) =>
        val now = Graft.parquetRowCount(spark, assignPath(root, g))
        math.max(0.0, (now - base).toDouble / base.toDouble)
    }
  }

  /** max/median cell size of the live inverted file — the probe-cost shape
    * of the index (a probe scans whole cells, so the worst cell bounds the
    * worst probe). One column-pruned aggregate over `cid` (map-side
    * partial → ~√N cells on the driver); the ONLY refresh signal that
    * needs a job, so [[shouldRefresh]] checks it last. */
  def cellSkew(spark: SparkSession, root: String): Double = {
    val g = resolve(spark, root)
    val sizes = spark.table(assignTable(root, g))
      .groupBy("cid").count().select("count")
      .collect().map(_.getLong(0)).sorted
    if (sizes.isEmpty) 0.0
    else sizes.last.toDouble / math.max(1L, sizes(sizes.length / 2)).toDouble
  }

  /** Should the codebook be retrained? True when sustained appends have
    * outgrown it (appended fraction — footer metadata only, checked
    * first) or when cell sizes have skewed past `maxSkew` (shifted
    * appends crowding stale cells). Thresholds are maintenance policy,
    * not correctness: a probe is exact over whatever cells it scans at
    * ANY skew — refresh restores the ~√N cost/recall shape.
    *
    * The cellSkew aggregate (the ONLY trigger signal that needs a job)
    * runs only once appends since the last train clear
    * `minAppendedForSkew`: skew can only MOVE when rows land (the
    * trained assignment's own skew is the published shape, already
    * judged healthy), so a steady-state ingest loop over a quiet index
    * pays footer metadata per batch, never an O(index) aggregate —
    * ServingStore contract rule 3's "metadata-cheap trigger" made
    * literal. */
  def shouldRefresh(spark: SparkSession, root: String,
      maxAppendedFraction: Double = 0.5, maxSkew: Double = 8.0,
      minAppendedForSkew: Double = 0.05): Boolean = {
    val af = appendedFraction(spark, root)
    af >= maxAppendedFraction ||
      (af >= minAppendedForSkew && cellSkew(spark, root) >= maxSkew)
  }

  /** Generations whose assign data is still present on disk (gen 0's
    * initial layout plus every READY gen-<g>), ascending — the pre-carry
    * sweep surface. A generation whose artifacts were lost (a repaired
    * store) simply has nothing to carry and is skipped. */
  private def onDiskGens(spark: SparkSession, root: String): Seq[Long] = {
    val base = new Path(annBase(root))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    val g0 = if (Lakehouse.tableExists(spark, assignPath(root))) Seq(0L) else Nil
    val gs = Option(fs.globStatus(new Path(base, "gen-*"))).map(_.toSeq).getOrElse(Nil)
      .flatMap(st => st.getPath.getName.stripPrefix("gen-").toLongOption)
      .filter(g => StoreRoots.isReady(spark, genDir(root, g)) &&
        Lakehouse.tableExists(spark, assignPath(root, g)))
    (g0 ++ gs).distinct.sorted
  }

  /** Admit every vector present in generation `from` but absent from
    * generation `to` against `to`'s codebook — LOOPED until the anti-join
    * drains, so an append racing one carry pass is caught by the next
    * (an append exactly concurrent with the LAST pass is left for the
    * next refresh's pre-carry, which runs before `from` is ever swept). */
  private def carryInto(spark: SparkSession, root: String,
      from: Long, to: Long): Unit = {
    if (!Lakehouse.ensureBucketedTable(spark, assignTable(root, from),
        assignPath(root, from), "cid", Buckets, sortCols = Seq("cid"))) return
    var pass = 0
    var drained = false
    while (!drained && pass < 4) {
      val missed = spark.table(assignTable(root, from))
        .select("vec_id", "qv", "nq")
        .join(spark.table(assignTable(root, to)).select("vec_id"),
          Seq("vec_id"), "left_anti")
      if (missed.isEmpty) drained = true
      else {
        val carried = rankCells(missed, centroids(spark, root, to), 1)
          .select(col("cid"), col("vec_id"), col("qv"), col("nq"))
        Lakehouse.appendBucketed(carried, assignTable(root, to), "cid",
          Buckets, sortCols = Seq("cid"))
      }
      pass += 1
    }
  }

  /** Retrain the codebook on the CURRENT stored corpus and republish the
    * index as the next generation: stride-sampled seed → one exact
    * floor-mean Lloyd round (the ann_ivf_kmeans update — integer
    * element-wise floor mean via one LongVecSum pass) → full
    * reassignment. Built in a PRIVATE sibling and published by rename
    * ([[StoreRoots.ensure]]): a crash mid-refresh leaves the previous
    * generation serving and an orphan the next refresh sweeps; readers
    * never see a partial index.
    *
    * CONCURRENT SERVING/INGEST (refresh itself is single-maintenance-
    * writer, like OPTIMIZE, but appends and probes are not quiesced):
    *  - appends that land in the OLD generation while the retrain runs
    *    are CARRIED after the flip — an anti-join of the old inverted
    *    file against the new one finds them (looped until it drains),
    *    and they admit against the NEW codebook like any delta;
    *  - a generation is only DELETED after a LATER refresh has carried
    *    from it: each refresh starts with a PRE-CARRY pass over every
    *    older generation still on disk (an append that resolved the old
    *    generation and landed after the previous refresh's carry — or a
    *    crash between the publish and the carry — left rows only there;
    *    the pre-carry admits them into the live generation before the
    *    retrain snapshots it, so they survive into the new codebook);
    *  - the sweep keeps the PREVIOUS generation on disk (deletes only
    *    generations before it, all of which this call just pre-carried
    *    from), so a probe that resolved the old generation just before
    *    the flip still scans live files; the previous generation is
    *    reclaimed by the NEXT refresh — after ITS pre-carry.
    * Returns the live generation id. */
  def refresh(spark: SparkSession, root: String): Long = {
    val g = resolve(spark, root)
    // PRE-CARRY: drain every older on-disk generation into the live one
    // BEFORE the retrain reads its snapshot — vectors stranded there by a
    // previous refresh's carry race (or a crash before its carry) rejoin
    // the corpus and train into the new codebook
    onDiskGens(spark, root).filter(_ < g).foreach(carryInto(spark, root, _, g))
    val next = g + 1
    val stored = spark.table(assignTable(root, g)).select("vec_id", "qv", "nq")
    val buildTable = assignTable(root, next) + "_build"
    StoreRoots.ensure(spark, genDir(root, next)) { tmp =>
      val n = stored.persist()
      try {
        val total = n.count()
        val stride = SimilarityQueries.centroidStride(total)
        val seed = n.filter(pmod(col("vec_id"), lit(stride)) === 0)
          .select(col("vec_id").as("cid"), col("qv").as("c_qv"), col("nq").as("c_nq"))
        val assign0 = rankCells(n, seed, 1).select("vec_id", "cid")
        // Lloyd update: exact element-wise floor-mean, one aggregate pass
        // (identical math to SimilarityQueries.kmeansFrames, so a
        // refreshed codebook is the ann_ivf_kmeans codebook of the
        // current corpus)
        val cent = assign0.join(n, "vec_id").groupBy("cid")
          .agg(graft.functions.VectorExprs.longVecSum(col("qv")).as("s"),
            count(lit(1)).as("c"))
          .select(col("cid"),
            expr("transform(s, x -> (x - ((x % c) + c) % c) div c)").as("c_qv"))
          .withColumn("c_nq", expr("long_dot(c_qv, c_qv)"))
        Lakehouse.ctas(cent, s"$tmp/centroids")
        val centStored = Lakehouse.read(spark, s"$tmp/centroids")
        val assign = rankCells(n, centStored, 1)
          .select(col("cid"), col("vec_id"), col("qv"), col("nq"))
        Lakehouse.ctasBucketed(assign, buildTable, "cid", Buckets,
          sortCols = Seq("cid"), path = Some(s"$tmp/assign"))
        // the build registration points at the PRIVATE dir — drop it (the
        // table is external, the files stay); the published location is
        // re-registered from its layout marker after the rename
        spark.sql(s"DROP TABLE IF EXISTS $buildTable")
        writeBaseRows(spark, tmp, total)
      } finally { n.unpersist(); () }
    }
    val live = resolve(spark, root)
    // CARRY: vectors appended into the old generation while the retrain
    // was reading its snapshot are absent from the new inverted file —
    // admit them against the new codebook (O(carried), usually zero)
    if (live > g) carryInto(spark, root, g, live)
    // sweep generations BEFORE the previous one: the previous generation
    // stays on disk for probes that resolved it just before the flip
    // (reclaimed by the next refresh, AFTER its pre-carry drains it);
    // older ones were all pre-carried by THIS call, are invisible to
    // every resolution path, and only hold storage
    val fs = new Path(annBase(root))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L until math.max(0L, live - 1)).foreach { old =>
      spark.sql(s"DROP TABLE IF EXISTS ${assignTable(root, old)}")
      if (old == 0L) {
        fs.delete(new Path(centroidsPath(root)), true)
        fs.delete(new Path(assignPath(root)), true)
        fs.delete(new Path(annBase(root), BaseRowsFile), false)
      } else fs.delete(new Path(genDir(root, old)), true)
      ()
    }
    live
  }

  // -------------------------------------------------------------- PROBE

  /** Max probed-cell ids pushed as a literal `IN` — the planning-time
    * form bucket pruning needs. A batch probing more distinct cells than
    * this switches to a broadcast semi join on `cid` (no bucket pruning,
    * but a batch touching >4096 cells was going to read most buckets
    * anyway, and the plan size stays bounded). */
  val ProbeCellCap = 4096

  /** Serve a query batch from the stored index: top-k neighbors per query
    * by exact cosine, searching only the nprobe nearest cells per query.
    *
    * Under [[ProbeCellCap]] distinct probed cells, the cell ids are
    * collected to the driver and pushed as an `IN` filter on the bucket
    * column, so the inverted-file scan plans with bucket pruning: at
    * 100 TB the scan reads the probed cells' files, never the corpus.
    * A larger batch (bulk re-scoring, not serving) switches to a
    * broadcast semi join on `cid` — the plan no longer grows with the
    * probe set, removing the old small-batch-contract reliance. */
  def probe(spark: SparkSession, root: String, queries: DataFrame,
      nprobe: Int = 4, k: Int = 5): DataFrame = {
    val g = resolve(spark, root)
    val cent = centroids(spark, root, g)
    val q = quantized(queries)
      .select(col("vec_id"), col("qv"), col("nq"))
    val probes = rankCells(q, cent, nprobe)
      .select(col("vec_id").as("q_id"), col("cid"),
        col("qv").as("q_qv"), col("nq").as("q_nq"))
      .persist()
    try {
      val cellIds = probes.select("cid").distinct()
        .limit(ProbeCellCap + 1).collect().map(_.getLong(0)).sorted
      val assignDf = spark.table(assignTable(root, g))
      val pruned =
        if (cellIds.length <= ProbeCellCap)
          assignDf.filter(col("cid").isin(cellIds: _*))
        else assignDf.join(
          broadcast(probes.select("cid").distinct()), Seq("cid"), "left_semi")
      val cells = pruned
        .select(col("cid").as("a_cid"), col("vec_id").as("n_id"),
          col("qv").as("c_qv2"), col("nq").as("c_nq2"))
      val pairCos = expr("long_dot(q_qv, c_qv2)").cast("double") /
        (sqrt(col("q_nq").cast("double")) * sqrt(col("c_nq2").cast("double")))
      val wRank = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      val out = broadcast(probes)
        .join(cells, col("a_cid") === col("cid") && col("n_id") =!= col("q_id"))
        .withColumn("cos_sim", pairCos)
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
      // materialize before releasing the probe cache (same lifecycle
      // contract as DedupStore.admit: no leaked per-call caches)
      out.persist().count()
      out
    } finally { probes.unpersist(); () }
  }
}
