package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-table primitives: the reference's ingestion idioms re-expressed as
  * Spark writers/readers over partitioned parquet.
  *
  * Reference semantics covered (SURVEY.md §2.1):
  *  - S4  partitioned parquet append            -> [[appendPartitioned]]
  *  - S5  CTAS                                  -> [[ctas]]
  *  - S6  INSERT INTO guarded by NOT EXISTS     -> [[antiJoinAppend]]
  *  - S7  MERGE INTO keyed upsert (Iceberg)     -> [[mergeUpsert]]
  *  - S8  table-exists probe -> full vs incremental plan
  *                                              -> [[tableExists]], [[loadIncremental]]
  *  - S11 OPTIMIZE bin_pack compaction          -> [[compact]]
  *  - A1  partition-pruned MAX watermark        -> [[watermark]]
  *
  * All tables are directories of parquet files, optionally hive-partitioned.
  * At cluster scale the same code runs unchanged: the writers shuffle by the
  * partition column so each task owns whole output partitions (no
  * thousands-of-small-files problem), and the readers rely on Catalyst
  * partition pruning for the `date_partition` predicates.
  *
  * Reference: src/helpers/athena.py:44-203, src/pipelines/stage/queries
  * (e.g. ethereum_blocks.sql:38-72 for the anti-join guard,
  * ethereum_wallet_features.sql:760-833 for MERGE).
  */
object Lakehouse {

  /** A table "exists" when it holds at least one data file — a directory
    * left by an all-filtered-out write (only _SUCCESS, or empty partition
    * dirs) reads as absent, so the next load takes the full-load path
    * instead of failing schema inference. Early-exits on the first data
    * file; descends one level for hive-partitioned layouts. */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasDataFile(dir: org.apache.hadoop.fs.Path, depth: Int): Boolean =
      fs.listStatus(dir).exists { st =>
        val n = st.getPath.getName
        if (st.isFile) !(n.startsWith("_") || n.startsWith("."))
        else depth > 0 && hasDataFile(st.getPath, depth - 1)
      }
    fs.exists(p) && hasDataFile(p, 2)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S5: CREATE TABLE AS SELECT — full (re)materialization, snappy parquet,
    * hive-partitioned. Repartition by the partition columns first so each
    * output partition is written by few tasks (bounded file count at 100 TB).
    */
  def ctas(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val out = if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*) else df
    val w = out.write.mode(SaveMode.Overwrite).option("compression", "snappy")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Bucketed CTAS — the reference's `address_partition` idiom (a hash
    * bucket carried as a data column and re-derived by every consumer,
    * ethereum_wallet_transactions.sql:107,157) made PLANNER-VISIBLE: Spark
    * catalog bucketing records the layout, so every later equi-join or
    * aggregation on the bucket key between same-bucketed tables plans with
    * ZERO exchanges — the shuffle is paid once at write time, not once per
    * downstream query. At 100 TB this is the difference between re-shuffling
    * the wallet-transactions fact for every feature program that joins it
    * and scanning co-located buckets in place. `sortCols` additionally
    * sorts within buckets (drops the join's sort too, and gives parquet
    * row-group min/max pruning on the sort key). */
  def ctasBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("compression", "snappy")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** S4: plain partitioned append. */
  def appendPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val out = if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*) else df
    val w = out.write.mode(SaveMode.Append).option("compression", "snappy")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** S6/J3: incremental append deduplicated against the existing table —
    * `INSERT INTO t SELECT ... WHERE NOT EXISTS (SELECT 1 FROM t ...)`.
    *
    * Scale note: the target side is pruned to only the key columns (column
    * pruning reaches the parquet scan) and, when `prunePartitions` holds a
    * predicate, to only the partitions new data can collide with — at 100 TB
    * the anti-join never scans the whole table, just the hot months.
    */
  def antiJoinAppend(
      spark: SparkSession,
      newRows: DataFrame,
      path: String,
      keys: Seq[String],
      partitionCols: Seq[String],
      prunePartitions: Option[Column] = None): Unit = {
    if (!tableExists(spark, path)) {
      ctas(newRows, path, partitionCols)
    } else {
      val target0 = read(spark, path)
      val target = prunePartitions.fold(target0)(target0.filter).select(keys.map(col): _*)
      // null-safe key equality: a USING-style join compares with EqualTo,
      // under which a NULL key column (e.g. a NULL amount in the wallet-tx
      // identity) never matches its stored copy — the same row would then
      // re-append on EVERY incremental cycle that re-selects the boundary
      // block, growing the table unboundedly
      val t = target.alias("t")
      val cond = keys.map(k => newRows(k) <=> col(s"t.$k")).reduce(_ && _)
      val fresh = newRows.join(t, cond, "left_anti")
      appendPartitioned(fresh, path, partitionCols)
    }
  }

  /** S7: MERGE INTO emulation on plain parquet — keyed UPDATE-or-INSERT.
    *
    * Semantics of the reference's Iceberg MERGE (WHEN MATCHED UPDATE SET all
    * columns / WHEN NOT MATCHED INSERT): rows in `updates` replace target rows
    * with the same key; unmatched target rows carry forward.
    *
    * Implementation: updates ⋈ target `full_outer` on keys, prefer the update
    * side per column, rewrite. When `touchedPartitions` is given (derivable
    * from the updates), only those hive partitions are rewritten — a true
    * partition-overwrite MERGE. A 100 TB features table with a 0.1% daily
    * delta rewrites only the touched address partitions.
    */
  def mergeUpsert(
      spark: SparkSession,
      updates: DataFrame,
      path: String,
      keys: Seq[String],
      partitionCols: Seq[String] = Nil,
      touchedPartitions: Option[Column] = None,
      keepFromTarget: Set[String] = Set.empty): Unit = {
    if (!tableExists(spark, path)) { ctas(updates, path, partitionCols); return }
    val target = read(spark, path)
    val cols = target.columns.toSeq
    require(updates.columns.toSeq.sorted == cols.sorted,
      s"merge schema mismatch: ${updates.columns.mkString(",")} vs ${cols.mkString(",")}")

    val scopeTarget = touchedPartitions.fold(target)(target.filter)
    val merged = mergeFrames(scopeTarget, updates, keys, keepFromTarget)

    // Materialize BEFORE overwriting: the merged plan reads the files the
    // overwrite is about to delete. Localized via a staging directory so the
    // commit is an atomic-ish directory swap rather than a cached recompute.
    val staging = path.stripSuffix("/") + ".staging"
    ctas(merged, staging, partitionCols)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    touchedPartitions match {
      case None =>
        fs.delete(hp, true)
        fs.rename(new org.apache.hadoop.fs.Path(staging), hp)
      case Some(_) =>
        // rewrite only touched partitions: move each staged partition dir in
        val staged = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
        staged.foreach { st =>
          if (st.isDirectory) {
            val dest = new org.apache.hadoop.fs.Path(hp, st.getPath.getName)
            if (fs.exists(dest)) fs.delete(dest, true)
            fs.rename(st.getPath, dest)
          }
        }
        fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    }
  }

  /** The MERGE semantics as a pure DataFrame transform (shared by
    * [[mergeUpsert]] and the feature modules' in-memory merges): updates
    * replace matched target rows, unmatched target rows carry forward,
    * unmatched updates insert.
    *
    * Membership marker instead of per-column coalesce: Iceberg's
    * `WHEN MATCHED UPDATE SET c = u.c` overwrites with NULL when the update
    * row carries NULL — coalesce(u.c, t.c) would silently resurrect the old
    * value the first time a nullable feature column is legitimately nulled.
    * `keepFromTarget` covers MERGEs whose UPDATE SET omits columns (e.g.
    * coin balances' token_symbol): matched rows keep the stored value. */
  def mergeFrames(target: DataFrame, updates: DataFrame, keys: Seq[String],
      keepFromTarget: Set[String] = Set.empty): DataFrame = {
    val cols = target.columns.toSeq
    val u = updates.withColumn("__is_update", lit(true)).alias("u")
    // membership marker on BOTH sides: keepFromTarget must hold the stored
    // value even when it is NULL (coalesce would let the update overwrite a
    // legitimately-NULL stored value), so "row exists in target" is decided
    // by the marker, never by a data column's nullness
    val t = target.withColumn("__in_target", lit(true)).alias("t")
    val cond = keys.map(k => col(s"u.$k") <=> col(s"t.$k")).reduce(_ && _)
    u.join(t, cond, "full_outer").select(
      cols.map { c =>
        val v =
          if (keepFromTarget(c))
            when(col("t.__in_target"), col(s"t.$c")).otherwise(col(s"u.$c"))
          else when(col("u.__is_update"), col(s"u.$c")).otherwise(col(s"t.$c"))
        v.as(c)
      }: _*)
  }

  /** A1: partition-pruned watermark — `MAX(col)` restricted to the lexic-max
    * `date_partition`, mirroring the reference's two-phase max
    * (stage_data_ingestion_pipeline.py:50-57). One scan of one partition.
    */
  def watermark(spark: SparkSession, path: String, watermarkCol: String,
      partitionCol: String = "date_partition"): Option[Any] = {
    if (!tableExists(spark, path)) return None
    val t = read(spark, path)
    val maxPart = t.agg(max(col(partitionCol))).head.get(0)
    if (maxPart == null) None
    else Option(t.filter(col(partitionCol) === lit(maxPart))
      .agg(max(col(watermarkCol))).head.get(0))
  }

  /** S8: choose full vs incremental. `full` builds the initial table;
    * `incremental` receives the watermark value and must return only-new rows.
    */
  def loadIncremental(
      spark: SparkSession,
      path: String,
      watermarkCol: String,
      partitionCols: Seq[String],
      keys: Seq[String],
      full: () => DataFrame,
      incremental: Any => DataFrame): Unit = {
    watermark(spark, path, watermarkCol, partitionCols.headOption.getOrElse(watermarkCol)) match {
      case None    => ctas(full(), path, partitionCols)
      case Some(w) => antiJoinAppend(spark, incremental(w), path, keys, partitionCols)
    }
  }

  /** The reference's weekly OPTIMIZE schedule (features_pipeline.py:
    * 128-138): compaction runs only on Sundays, riding along the normal
    * incremental cycle instead of a separate maintenance DAG. Returns
    * whether it ran. */
  def weeklyCompact(spark: SparkSession, path: String, partitionCols: Seq[String],
      today: java.time.LocalDate): Boolean =
    if (today.getDayOfWeek == java.time.DayOfWeek.SUNDAY) {
      compact(spark, path, partitionCols); true
    } else false

  /** S11: bin-pack compaction — rewrite a table (or a partition subset) into
    * ~`targetFileMB`-sized files. The reference runs Iceberg OPTIMIZE weekly;
    * on plain parquet this is a repartition-and-rewrite sized from the actual
    * on-disk bytes, so it scales with the data rather than a fixed N.
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
      targetFileMB: Int = 256): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) return
    val bytes = fs.getContentSummary(hp).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt)
    // size-derived task count, hash-clustered on the partition columns so
    // each task holds whole hive partitions. Written directly — routing
    // through ctas would re-repartition by the partition columns alone and
    // discard the nFiles sizing (file count would then track
    // shuffle.partitions, not on-disk bytes).
    val df0 = read(spark, path)
    val df = if (partitionCols.nonEmpty)
      df0.repartition(nFiles, partitionCols.map(col): _*)
    else df0.repartition(nFiles)
    val staging = path.stripSuffix("/") + ".compact"
    val w = df.write.mode(SaveMode.Overwrite).option("compression", "snappy")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(staging)
    fs.delete(hp, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), hp)
  }
}
