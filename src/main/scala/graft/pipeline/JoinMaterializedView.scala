package graft.pipeline

import graft.core.ManifestSnapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregates over an EQUI-JOIN of two
  * manifest-snapshot tables — [[MaterializedView]]'s single-table
  * maintenance extended with the classical delta-join identity:
  *
  *   A_new ⋈ B_new  =  A_old ⋈ B_old  ∪  ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
  *
  * (ΔA ⋈ B_new absorbs the ΔA ⋈ ΔB cross term — B_new ⊇ ΔB), so a
  * refresh aggregates ONLY the two delta legs and merges into the
  * stored partials.
  *
  * The 100 TB problem with the second leg: A_old ⋈ ΔB naively reads
  * ALL of A_old — the whole point of incremental maintenance collapses
  * if one side's daily 0.1% delta forces a full scan of the other. The
  * fix is [[ManifestSnapshots.readVersionMatchingKeys]]: the stored
  * side's read is pruned at FILE granularity by the delta's join-key
  * zone maps + bloom sidecars (mergeByKey's two-tier discovery, exposed
  * as a read), and the equi-join itself removes the file-granular
  * survivors' non-matching rows. On a key-clustered layout the old-side
  * I/O is proportional to the files the delta's keys actually touch;
  * the spec pins both the delta-leg-only processing AND the prune
  * arithmetic. Both legs prune: ΔA ⋈ B_new reads B_new the same way.
  *
  * State: the view's partials carry BOTH incorporated base versions in
  * the hive partition spec (`_base_va=<v>/_base_vb=<v>`) —
  * metadata-only recovery, [[MaterializedView]]'s convention doubled.
  * Numeric discipline and crash safety are inherited unchanged
  * (DECIMAL(38,6) sums, data → manifest → pointer commits). The
  * append-only guard applies PER SIDE: a rewriting version on either
  * base demotes that refresh to a full restate (never double-counts).
  *
  * Reference behavior served: the priced/enriched feature families
  * (SURVEY §3) are all fact ⋈ dimension rollups recomputed per run;
  * this maintains them O(Δfact + Δdim-matched-files).
  */
object JoinMaterializedView {

  /** An equi-join aggregate view: A ⋈ B ON a.`leftKey` = b.`rightKey`,
    * then GROUP BY `spec.keys` with `spec`'s mergeable measures (column
    * names resolve against the JOINED relation). */
  final case class JoinMvSpec(
      leftKey: String,
      rightKey: String,
      spec: MaterializedView.MvSpec)

  final case class JoinRefreshStats(
      mode: String, // "full" | "incremental" | "noop"
      baseVersionA: Long,
      baseVersionB: Long,
      deltaRowsA: Long,
      deltaRowsB: Long,
      // prune arithmetic of the two stored-side reads (candidate/total)
      bFilesRead: Long, bFilesTotal: Long,
      aFilesRead: Long, aFilesTotal: Long)

  private val VaCol = "_base_va"
  private val VbCol = "_base_vb"

  private def joined(a: DataFrame, b: DataFrame, jm: JoinMvSpec): DataFrame =
    a.join(b, a(jm.leftKey) === b(jm.rightKey))

  /** The (va, vb) the committed view state incorporates — recovered from
    * the partition spec, metadata-only. */
  def refreshedBaseVersions(spark: SparkSession,
      viewDir: String): Option[(Long, Long)] =
    ManifestSnapshots.latestVersion(spark, viewDir).flatMap { vv =>
      val parts = ManifestSnapshots.entriesOf(spark, viewDir, vv)
        .flatMap(_.partition).flatMap(_.split('/'))
      def of(c: String): Option[Long] =
        parts.find(_.startsWith(c + "=")).map(_.stripPrefix(c + "=").toLong)
      for (va <- of(VaCol); vb <- of(VbCol)) yield (va, vb)
    }

  private def commit(partials: DataFrame, viewDir: String,
      va: Long, vb: Long): Unit = {
    ManifestSnapshots.writeFull(
      partials.withColumn(VaCol, lit(va)).withColumn(VbCol, lit(vb)),
      viewDir, partitionCols = Seq(VaCol, VbCol))
    ManifestSnapshots.vacuum(partials.sparkSession, viewDir, keep = 2): Unit
  }

  /** True when `dir` grew append-only from `from` to `to` AND version
    * `from`'s manifest is still resolvable (the diff base). */
  private def appendOnly(spark: SparkSession, dir: String,
      from: Long, to: Long): Boolean =
    scala.util.Try(ManifestSnapshots.removedEntries(spark, dir, from, to))
      .toOption.exists(_.isEmpty)

  /** True when no column was declared (addColumn) or dropped on `dir`
    * with `since` in (from, to]. The two delta legs union frames read at
    * DIFFERENT versions (ΔA at the current schema vs A@va's schema); a
    * schema change between them would make that union throw mid-refresh,
    * wedging the view — so schema movement demotes to a full restate the
    * same way a rewriting version does. */
  private def schemaStable(spark: SparkSession, dir: String,
      from: Long, to: Long): Boolean =
    ManifestSnapshots.declaredColumns(spark, dir)
      .forall(c => c.since <= from || c.since > to) &&
      ManifestSnapshots.droppedColumns(spark, dir)
        .forall(c => c.since <= from || c.since > to)

  /** Bring the view up to both bases' committed versions (or pinned
    * `asOfA`/`asOfB`). Incremental when stored state exists and BOTH
    * bases grew append-only since; full otherwise; no-op when current. */
  def refresh(spark: SparkSession, aDir: String, bDir: String,
      viewDir: String, jm: JoinMvSpec,
      asOfA: Option[Long] = None, asOfB: Option[Long] = None): JoinRefreshStats = {
    def cur(dir: String, asOf: Option[Long]): Long =
      asOf.getOrElse(ManifestSnapshots.latestVersion(spark, dir).getOrElse(
        throw new IllegalStateException(s"no committed base snapshot under $dir")))
    val curA = cur(aDir, asOfA)
    val curB = cur(bDir, asOfB)
    refreshedBaseVersions(spark, viewDir) match {
      case Some((va, vb)) if va == curA && vb == curB =>
        JoinRefreshStats("noop", curA, curB, 0L, 0L, 0L, 0L, 0L, 0L)
      case Some((va, vb)) if va <= curA && vb <= curB
          && appendOnly(spark, aDir, va, curA)
          && appendOnly(spark, bDir, vb, curB)
          && schemaStable(spark, aDir, va, curA)
          && schemaStable(spark, bDir, vb, curB) =>
        val addedA = ManifestSnapshots.addedEntries(spark, aDir, va, curA)
        val addedB = ManifestSnapshots.addedEntries(spark, bDir, vb, curB)
        val prior = ManifestSnapshots.readLatest(spark, viewDir)
          .drop(VaCol, VbCol)
        if (addedA.isEmpty && addedB.isEmpty) {
          commit(prior, viewDir, curA, curB)
          JoinRefreshStats("incremental", curA, curB, 0L, 0L, 0L, 0L, 0L, 0L)
        } else {
          // leg 1: ΔA ⋈ B_new — B's read pruned by ΔA's join keys
          val (leg1, bRead, bTotal, dRowsA) =
            if (addedA.isEmpty) (None, 0L, 0L, 0L)
            else {
              val dA = ManifestSnapshots.readFiles(spark, aDir, addedA)
              val pr = ManifestSnapshots.readVersionMatchingKeys(
                spark, bDir, curB, dA.select(col(jm.leftKey).as(jm.rightKey)),
                Seq(jm.rightKey))
              (Some(joined(dA, pr.df, jm)), pr.candidateFiles, pr.totalFiles,
                addedA.map(_.rows).sum)
            }
          // leg 2: A_old ⋈ ΔB — A@va's read pruned by ΔB's join keys
          val (leg2, aRead, aTotal, dRowsB) =
            if (addedB.isEmpty) (None, 0L, 0L, 0L)
            else {
              val dB = ManifestSnapshots.readFiles(spark, bDir, addedB)
              val pr = ManifestSnapshots.readVersionMatchingKeys(
                spark, aDir, va, dB.select(col(jm.rightKey).as(jm.leftKey)),
                Seq(jm.leftKey))
              (Some(joined(pr.df, dB, jm)), pr.candidateFiles, pr.totalFiles,
                addedB.map(_.rows).sum)
            }
          val deltaJoin = (leg1.toSeq ++ leg2.toSeq)
            .reduce(_.unionByName(_))
          val partials = MaterializedView.merge(prior,
            MaterializedView.aggregate(deltaJoin, jm.spec), jm.spec)
          commit(partials, viewDir, curA, curB)
          JoinRefreshStats("incremental", curA, curB, dRowsA, dRowsB,
            bRead, bTotal, aRead, aTotal)
        }
      case _ =>
        val a = ManifestSnapshots.read(spark, aDir, curA)
        val b = ManifestSnapshots.read(spark, bDir, curB)
        commit(MaterializedView.aggregate(joined(a, b, jm), jm.spec),
          viewDir, curA, curB)
        val ea = ManifestSnapshots.entriesOf(spark, aDir, curA)
        val eb = ManifestSnapshots.entriesOf(spark, bDir, curB)
        JoinRefreshStats("full", curA, curB, ea.map(_.rows).sum,
          eb.map(_.rows).sum, eb.size.toLong, eb.size.toLong,
          ea.size.toLong, ea.size.toLong)
    }
  }

  /** Serve the committed view minus the bookkeeping columns. */
  def serve(spark: SparkSession, viewDir: String): DataFrame =
    ManifestSnapshots.readLatest(spark, viewDir).drop(VaCol, VbCol)
}
