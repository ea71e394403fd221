package graft.pipeline

import graft.core.ManifestSnapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views over a
  * manifest-snapshot base table.
  *
  * The 100 TB problem: a serving aggregate (per-wallet feature rollup,
  * per-key quality stats) recomputed from scratch on every base-table
  * append pays O(table) per refresh — at a daily delta of 0.1% that is
  * 1000x more I/O than the data that changed. The classical fix is
  * incremental view maintenance over MERGEABLE partial aggregates:
  * SUM/COUNT/MIN/MAX partials merge associatively, so
  *
  *   refresh = aggregate(delta) ⊎ stored partials
  *
  * reads only the delta. [[ManifestSnapshots]] makes the delta FREE to
  * identify: versions are complete file lists over immutable files, so
  * "what changed since the view's last refresh" is a manifest path-set
  * diff ([[ManifestSnapshots.readChanges]]) resolved on KB-scale
  * metadata, and the delta read touches only the new files.
  *
  * Numeric discipline: double sums are not associative, so an
  * incremental sum would drift from a one-shot recompute by float
  * reassociation. Partials therefore store sums as DECIMAL(38,6)
  * (exact, associative — the repo-wide exact-sum convention) and
  * [[serve]] casts to double at the end; incremental ≡ full recompute
  * EXACTLY, not approximately, which is what the oracle hash-checks.
  *
  * View state commit: the partials land in the view's OWN manifest
  * store via a full-restatement version (the view is O(|keys|), tiny
  * next to the base — restating IT is cheap; the O(delta) claim is
  * about reading the BASE). The base version the state incorporates
  * rides in the hive partition spec (`_base_version=<v>`) of the view's
  * data files, so recovering it is manifest-metadata-only. Crash safety
  * is inherited: ManifestSnapshots commits data → manifest → pointer,
  * so a torn refresh leaves the previous view state serving.
  *
  * Append discipline: the incremental path is sound only while the base
  * grows by appends. A [[ManifestSnapshots.replacePartitions]] or
  * compaction version REMOVES manifest entries; [[refresh]] detects
  * that (any prior-version path absent from the current list) and falls
  * back to a full recompute for that refresh rather than double-count.
  *
  * Reference behavior served: the wallet-features serving export
  * (SURVEY §3.3) — the reference recomputes its feature tables per run;
  * at lake scale the same rollups maintain themselves O(delta).
  */
object MaterializedView {

  /** A mergeable aggregate view definition: GROUP BY `keys`, with exact
    * decimal sums over `sums`, min/max over `mins`/`maxs`, and a row
    * count. Output columns: `sum_<c>`, `min_<c>`, `max_<c>`, `n_rows`. */
  final case class MvSpec(
      keys: Seq[String],
      sums: Seq[String] = Nil,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil) {
    require(keys.nonEmpty, "a view needs at least one group key")
    def measureCols: Seq[String] =
      sums.map("sum_" + _) ++ mins.map("min_" + _) ++ maxs.map("max_" + _) :+ "n_rows"
  }

  /** How a [[refresh]] ran — lets callers (and the spec) PIN that the
    * incremental path processed only the delta. */
  final case class RefreshStats(
      mode: String, // "full" | "incremental" | "noop"
      baseVersion: Long,
      deltaFiles: Long,
      deltaRows: Long)

  private val BaseVersionCol = "_base_version"

  /** Aggregate raw base rows into partials (used for both the full and
    * the delta sides — same shape, so merge is closed). */
  private[pipeline] def aggregate(df: DataFrame, spec: MvSpec): DataFrame = {
    val aggs: Seq[Column] =
      spec.sums.map(c => sum(col(c).cast("decimal(38,6)")).as(s"sum_$c")) ++
        spec.mins.map(c => min(col(c)).as(s"min_$c")) ++
        spec.maxs.map(c => max(col(c)).as(s"max_$c")) :+
        count(lit(1)).as("n_rows")
    df.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two partial frames: SUM partials add, MIN/MAX re-extremize,
    * counts add — one shuffle on the keys, map-side combinable. */
  private[pipeline] def merge(a: DataFrame, b: DataFrame, spec: MvSpec): DataFrame = {
    val aggs: Seq[Column] =
      spec.sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        spec.mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        spec.maxs.map(c => max(col(s"max_$c")).as(s"max_$c")) :+
        sum(col("n_rows")).as("n_rows")
    a.unionByName(b).groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The base version the committed view state incorporates — recovered
    * from the `_base_version=<v>` partition spec in the view store's
    * manifest: metadata-only, no data I/O. */
  def refreshedBaseVersion(spark: SparkSession, viewDir: String): Option[Long] =
    ManifestSnapshots.latestVersion(spark, viewDir).flatMap { vv =>
      ManifestSnapshots.entriesOf(spark, viewDir, vv)
        .flatMap(_.partition)
        .flatMap(_.split('/').find(_.startsWith(BaseVersionCol + "=")))
        .map(_.stripPrefix(BaseVersionCol + "=").toLong)
        .maxOption
    }

  private def commit(partials: DataFrame, viewDir: String, baseV: Long): Unit = {
    ManifestSnapshots.writeFull(
      partials.withColumn(BaseVersionCol, lit(baseV)),
      viewDir, partitionCols = Seq(BaseVersionCol))
    // every refresh is a full restatement of the (tiny) view, and a
    // long-running stream refreshes once per micro-batch — without
    // retention the view store would accrete one complete copy per
    // batch. Keep the committed state plus one rollback step.
    ManifestSnapshots.vacuum(partials.sparkSession, viewDir, keep = 2): Unit
  }

  /** Bring the view up to the base's committed version (or to `asOf`, a
    * pinned earlier version — manifests are self-contained, so a
    * refresh-to-v is exact whatever has landed since; the replay knob
    * for backfills and for proving the incremental path). Incremental
    * when the stored state exists and the base grew append-only since;
    * full-recompute on first refresh or after a rewriting base version;
    * no-op when already current. */
  def refresh(spark: SparkSession, baseDir: String, viewDir: String,
      spec: MvSpec, asOf: Option[Long] = None): RefreshStats = {
    val curV = asOf.getOrElse(ManifestSnapshots.latestVersion(spark, baseDir).getOrElse(
      throw new IllegalStateException(s"no committed base snapshot under $baseDir")))
    refreshedBaseVersion(spark, viewDir) match {
      case Some(bv) if bv == curV =>
        RefreshStats("noop", curV, 0L, 0L)
      case Some(bv) if bv < curV
          // the incremental path needs version bv's manifest (the diff
          // base) AND an append-only range; a vacuumed-away manifest or
          // a rewriting version both demote to the full restate below
          && scala.util.Try(
            ManifestSnapshots.removedEntries(spark, baseDir, bv, curV))
            .toOption.exists(_.isEmpty) =>
        val added = ManifestSnapshots.addedEntries(spark, baseDir, bv, curV)
        val prior = ManifestSnapshots.readLatest(spark, viewDir).drop(BaseVersionCol)
        if (added.isEmpty) {
          // versions advanced without adding files (possible via an
          // empty-delta append): just restamp the state at curV
          commit(prior, viewDir, curV)
          RefreshStats("incremental", curV, 0L, 0L)
        } else {
          val delta = ManifestSnapshots.readFiles(spark, baseDir, added)
          commit(merge(prior, aggregate(delta, spec), spec), viewDir, curV)
          RefreshStats("incremental", curV, added.size.toLong, added.map(_.rows).sum)
        }
      case _ =>
        // first refresh, a rewriting base version (entries removed), or a
        // view state AHEAD of the base (base rolled back): restate fully
        val full = ManifestSnapshots.read(spark, baseDir, curV)
        val entries = ManifestSnapshots.entriesOf(spark, baseDir, curV)
        commit(aggregate(full, spec), viewDir, curV)
        RefreshStats("full", curV, entries.size.toLong, entries.map(_.rows).sum)
    }
  }

  /** Serve the committed view: finalized columns (decimal sums cast back
    * to double where the source column was double at aggregate time is
    * the CALLER's concern — serve exposes the exact partials minus the
    * bookkeeping column, so downstream can both finalize and continue
    * merging). */
  def serve(spark: SparkSession, viewDir: String): DataFrame =
    ManifestSnapshots.readLatest(spark, viewDir).drop(BaseVersionCol)
}
