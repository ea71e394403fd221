package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-based snapshots: time travel WITHOUT per-version data copies.
  *
  * [[Lakehouse.writeSnapshot]] versions a table by rewriting it whole —
  * correct, but at 100 TB a daily snapshot cadence would copy the table
  * daily (O(table) write amplification). Here a version is a MANIFEST: a
  * small self-contained file list over immutable, shared data files —
  * the Iceberg/Delta snapshot idea expressed on plain parquet + JSON:
  *
  *   dir/
  *     data/d-<v>/...          immutable parquet, written once by version v
  *     manifests/m-<v>.json    the COMPLETE file list of version v
  *     _latest                 committed-version pointer (written last)
  *
  *  - [[appendDelta]] writes ONLY the delta's files and a manifest that
  *    extends the previous list — O(delta) bytes per version.
  *  - [[replacePartitions]] is copy-on-write at partition granularity:
  *    the new manifest drops the predecessor's files for the touched
  *    partitions and adds the delta's — the MERGE-shaped snapshot.
  *  - Manifests are SELF-CONTAINED (every version lists every file it
  *    reads), so there is no log replay and no manifest-chain compaction
  *    problem: each manifest is its own checkpoint, and reading version v
  *    touches exactly one KB-scale JSON before the data. At extreme file
  *    counts the same listing would live in parquet manifests; JSON keeps
  *    the recovery story greppable.
  *  - [[compactData]] is OPTIMIZE as a new version: bin-pack the current
  *    file list into target-sized files; older versions keep reading
  *    their original files until [[vacuum]] reference-counts data files
  *    across the kept manifests and deletes only the unreachable ones —
  *    a file shared by a kept version is never deleted.
  *
  * Commit protocol (optimistic concurrency, Iceberg's contract): data
  * files land first in a per-writer directory, then the manifest is
  * created at the next free version slot with CREATE-IF-ABSENT — that
  * exclusive create IS the commit point, so two concurrent committers
  * cannot lose a commit: exactly one wins the slot, the loser rebases
  * (appends/replaces re-extend the winner's list and retry at the next
  * slot; rewriting ops fail with ConcurrentModificationException, their
  * touched-file analysis being stale). A crash leaves either the old
  * committed state (orphaned data dir / torn manifest — both invisible)
  * or the new one — readers never observe a half version. Torn
  * manifests are ignored by recovery (newest PARSEABLE manifest wins)
  * and their slots are burned, never reused. `_latest` is a best-effort
  * hint, not the source of truth.
  *
  * Reference behavior served: the features_db export pin-by-version
  * discipline (SURVEY §3.3) — a training run records the snapshot
  * version it read; incremental exports stop paying full-table copies.
  */
object ManifestSnapshots {

  /** One data file of a version: lake-relative path, optional hive-style
    * partition spec ("k=v", string-valued like the lake's hive
    * partitions), row count, per-column numeric (min, max) zone maps,
    * and per-column STRING (min, max) zone maps (`sstats` — the
    * address-shaped key ranges numeric stats cannot carry; compared in
    * unsigned UTF-8 byte order, Spark's own string order) — all
    * manifest-only statistics, harvested from the parquet footer during
    * the write's existing footer pass. Either map may be empty
    * (pre-stats manifests, unsupported or stat-less columns): absence
    * only disables pruning, never correctness. */
  final case class Entry(path: String, partition: Option[String], rows: Long,
      stats: Map[String, (Double, Double)] = Map.empty,
      sstats: Map[String, (String, String)] = Map.empty)

  private val LatestMarker = "_latest"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ----------------------------------------------------------- MANIFEST I/O

  private def manifestPath(dir: String, v: Long): Path =
    new Path(s"${dir.stripSuffix("/")}/manifests/m-$v.json")

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Strict escaper for string-statistic VALUES: anything outside a safe
    * alphabet becomes \uXXXX, so braces/quotes/brackets in arbitrary key
    * bytes can never confuse the flat-object manifest parse. Surrogate
    * pairs escape as two \u units and reassemble on [[readManifest]]'s
    * unesc. */
  private def escStat(s: String): String = s.flatMap {
    case c if (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '-' || c == '.' || c == ' ' =>
      c.toString
    case c => f"\\u${c.toInt}%04x"
  }

  /** Attempt to commit version `v`'s manifest with CREATE-IF-ABSENT —
    * the optimistic-concurrency arbiter (Iceberg's commit contract): the
    * manifest file's exclusive creation IS the commit, so two writers
    * racing the same version slot cannot interleave a delete+rename and
    * silently lose a commit — exactly one create succeeds, the loser
    * sees `false` and rebases onto the winner. A crash mid-write leaves
    * a TORN manifest in the slot: readers skip it (fail-closed parse)
    * and writers burn the slot ([[nextSlot]] counts names, not
    * parseability). Same-JVM writers additionally serialize on the
    * process lock so local filesystems' check-then-act create cannot
    * race within one process; across JVMs the filesystem's atomic
    * exclusive-create is the contract (HDFS/ABFS native; S3 via
    * conditional PUT). */
  /** The manifest wire form for version `v` — shared by the committed
    * slots AND the branch markers (a branch body is the same format at
    * its parent version, so [[parseManifest]] serves both). */
  private def manifestBody(v: Long, entries: Seq[Entry]): String =
    entries.map { e =>
      val part = e.partition.map(p => "\"" + esc(p) + "\"").getOrElse("null")
      // stat column NAMES and string VALUES both go through the STRICT
      // escaper (everything outside a safe alphabet as \uXXXX): the
      // flat-object stats parse requires a brace-free object, and a
      // column legally named `a{b` under plain esc would write a
      // manifest the fail-closed parser rejects — an invisible commit
      val stats =
        if (e.stats.isEmpty) ""
        else e.stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
          s""""${escStat(c)}":[$mn,$mx]"""
        }.mkString(""","stats":{""", ",", "}")
      val sstats =
        if (e.sstats.isEmpty) ""
        else e.sstats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
          s""""${escStat(c)}":["${escStat(mn)}","${escStat(mx)}"]"""
        }.mkString(""","sstats":{""", ",", "}")
      s"""{"path":"${esc(e.path)}","partition":$part,"rows":${e.rows}$stats$sstats}"""
    }.mkString(s"""{"version":$v,"files":[""", ",", "]}")

  private def tryCommitManifest(hfs: FileSystem, dir: String, v: Long,
      entries: Seq[Entry]): Boolean = {
    val body = manifestBody(v, entries)
    val dst = manifestPath(dir, v)
    hfs.mkdirs(dst.getParent)
    // Write the COMPLETE body to a hidden tmp name first, then RENAME
    // into the slot: the commit point must not precede content
    // durability, or a concurrent committer could read our in-progress
    // slot as torn, burn it, and commit a successor that silently drops
    // our rows (create-then-write had exactly that window). Rename of a
    // closed file is atomic and fails on an occupied slot on HDFS-like
    // stores (the multi-writer target — same contract as Iceberg's
    // HadoopTableOperations); on POSIX local filesystems rename
    // overwrites, so cross-PROCESS writers there are serialized by
    // [[withLocalCommitLock]]'s O_CREAT|O_EXCL table lock around the
    // whole commit section (same-process writers additionally by the
    // JVM lock). The hidden "." prefix keeps tmp names out of
    // [[versionNames]], so an abandoned tmp can never look like a slot.
    val tmp = new Path(dst.getParent,
      s".m-$v.json.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val out = hfs.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val committed = !hfs.exists(dst) && hfs.rename(tmp, dst)
      if (!committed) hfs.delete(tmp, false): Unit
      committed
    } catch {
      case _: java.io.IOException =>
        hfs.delete(tmp, false): Unit
        false
    }
  }

  /** A manifest slot's observed state. The three non-Parsed cases are
    * NOT interchangeable: `Torn` is a positive observation (the bytes
    * were read in full and are garbage — a crashed writer's debris,
    * safe to reclaim), while `Unreadable` is the ABSENCE of an
    * observation (the read itself failed — object-store throttling, a
    * flaky NFS mount) and the slot may hold a perfectly committed
    * version. Vacuum deletes only on `Torn`; conflating the two would
    * let one transient IO error permanently destroy a committed — even
    * tagged — version. */
  private sealed trait ManifestState
  private object ManifestState {
    final case class Parsed(entries: Seq[Entry]) extends ManifestState
    case object Absent extends ManifestState
    case object Torn extends ManifestState
    case object Unreadable extends ManifestState
  }

  /** Read a manifest slot and classify it (see [[ManifestState]]). The
    * IO layer retries once — one transient failure must not degrade a
    * committed version to "unknown" on paths that can tolerate a
    * second round-trip — and NEVER classifies an exception as torn:
    * only content that was fully read and fails to parse is. */
  private def readManifestState(hfs: FileSystem, dir: String, v: Long): ManifestState = {
    val p = manifestPath(dir, v)
    def fetch(): Either[Unit, Option[String]] =
      try {
        if (!hfs.exists(p)) Right(None)
        else {
          val in = hfs.open(p)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          Right(Some(txt))
        }
      } catch { case _: Exception => Left(()) }
    (fetch() match { case Left(_) => fetch(); case ok => ok }) match {
      case Left(_)          => ManifestState.Unreadable
      case Right(None)      => ManifestState.Absent
      case Right(Some(txt)) =>
        parseManifest(txt, v) match {
          case Some(entries) => ManifestState.Parsed(entries)
          case None          => ManifestState.Torn
        }
    }
  }

  /** Parse a manifest; None when absent, torn, or unreadable (recovery
    * skips it — only [[vacuum]] needs the finer [[readManifestState]]
    * distinction, because only vacuum DELETES based on the answer). */
  private def readManifest(hfs: FileSystem, dir: String, v: Long): Option[Seq[Entry]] =
    readManifestState(hfs, dir, v) match {
      case ManifestState.Parsed(entries) => Some(entries)
      case _ => None
    }

  /** Parse manifest CONTENT (already read in full). None = confirmed
    * garbage. The format is this object's own flat JSON — a hand-rolled
    * parser keeps the zero-dependency rule and fails closed on any
    * malformation. */
  private def parseManifest(txt: String, v: Long): Option[Seq[Entry]] =
    try {
      {
        // "stats" is optional: manifests written before zone maps (and
        // entries whose files had no numeric stats) parse identically —
        // the stats object holds only "col":[min,max] pairs, so a
        // no-inner-brace match is exact, not an approximation
        val entry =
          """\{"path":"((?:[^"\\]|\\.)*)","partition":(null|"(?:[^"\\]|\\.)*"),"rows":(\d+)(?:,"stats":(\{[^{}]*\}))?(?:,"sstats":(\{[^{}]*\}))?\}""".r
        val statPair = """"((?:[^"\\]|\\.)*)":\[([^,\]"]+),([^,\]"]+)\]""".r
        val sstatPair =
          """"((?:[^"\\]|\\.)*)":\["((?:[^"\\]|\\.)*)","((?:[^"\\]|\\.)*)"\]""".r
        def unesc(s: String): String = {
          val b = new StringBuilder
          var i = 0
          while (i < s.length) {
            if (s(i) == '\\' && i + 1 < s.length) {
              s(i + 1) match {
                case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
                case c => b.append(c); i += 2
              }
            } else { b.append(s(i)); i += 1 }
          }
          b.toString
        }
        if (!txt.startsWith(s"""{"version":$v,"files":[""") || !txt.endsWith("]}"))
          None
        // fail CLOSED on per-entry corruption: the regex silently skips a
        // mangled entry, which would read back as a SUBSET of the version's
        // files — so the number of matches must equal the number of entry
        // openers, or the whole manifest is treated as torn
        else if (entry.findAllMatchIn(txt).size !=
            """\{"path":"""".r.findAllMatchIn(txt).size)
          None
        else Some(entry.findAllMatchIn(txt).map { m =>
          val part = m.group(2) match {
            case "null" => None
            case quoted => Some(unesc(quoted.substring(1, quoted.length - 1)))
          }
          val stats = Option(m.group(4)).map { s =>
            statPair.findAllMatchIn(s).map { p =>
              unesc(p.group(1)) -> ((p.group(2).toDouble, p.group(3).toDouble))
            }.toMap
          }.getOrElse(Map.empty[String, (Double, Double)])
          val sstats = Option(m.group(5)).map { s =>
            sstatPair.findAllMatchIn(s).map { p =>
              unesc(p.group(1)) -> ((unesc(p.group(2)), unesc(p.group(3))))
            }.toMap
          }.getOrElse(Map.empty[String, (String, String)])
          Entry(unesc(m.group(1)), part, m.group(3).toLong, stats, sstats)
        }.toSeq)
      }
    } catch { case _: Exception => None }

  /** Version numbers present by manifest file NAME, ascending — a pure
    * listing, no manifest is opened. */
  private def versionNames(hfs: FileSystem, dir: String): Seq[Long] = {
    val mdir = new Path(s"${dir.stripSuffix("/")}/manifests")
    if (!hfs.exists(mdir)) Nil
    else hfs.listStatus(mdir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("m-") && n.endsWith(".json") =>
        n.stripPrefix("m-").stripSuffix(".json") }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .sorted
  }

  /** Newest version whose manifest parses — names walked DESCENDING,
    * parsing stops at the first valid one, so commit-path metadata cost
    * is O(torn + 1) manifest reads, not O(chain length). */
  private def newestParseable(hfs: FileSystem, dir: String): Option[Long] =
    versionNames(hfs, dir).reverseIterator
      .find(v => readManifest(hfs, dir, v).isDefined)

  /** All versions with a parseable manifest, ascending. (Opens every
    * manifest — the audit/maintenance surface; the commit path uses
    * the bounded [[newestParseable]] walk instead.) */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val hfs = fs(spark, dir)
    versionNames(hfs, dir).filter(v => readManifest(hfs, dir, v).isDefined)
  }

  /** The committed version: the newest PARSEABLE manifest. Under the
    * optimistic commit protocol the manifest's exclusive creation IS the
    * commit point, so the file list is the single source of truth;
    * `_latest` is a best-effort HINT for humans and external tooling
    * (it can lag when two committers' pointer writes interleave), never
    * consulted for correctness — which also makes stale/torn pointers a
    * non-event for recovery. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    newestParseable(fs(spark, dir), dir)

  /** Advance the `_latest` hint, best-effort: never moved BACKWARDS
    * (a slower committer of an older version must not shadow a newer
    * one), written via tmp+rename so readers see old-or-new. The WHOLE
    * body swallows failures: this runs AFTER the manifest committed,
    * and a hint-write IOException propagating out of the commit path
    * would trip the caller's failed-commit cleanup and delete data
    * files a committed manifest references — the hint must never be
    * able to damage the commit it annotates. */
  private def commitPointer(hfs: FileSystem, dir: String, v: Long): Unit =
    try {
      val dst = new Path(s"${dir.stripSuffix("/")}/$LatestMarker")
      val current =
        if (!hfs.exists(dst)) None
        else {
          val in = hfs.open(dst)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
          scala.util.Try(txt.toLong).toOption
        }
      if (current.forall(_ < v)) {
        val tmp = new Path(s"${dir.stripSuffix("/")}/$LatestMarker.tmp")
        val out = hfs.create(tmp, true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        hfs.delete(dst, false)
        hfs.rename(tmp, dst): Unit
      }
    } catch { case _: Exception => () }

  // -------------------------------------------------------------- WRITERS

  /** Write `df` into this WRITER'S own immutable directory and return its
    * manifest entries. Partitioned layouts nest hive dirs under the
    * version dir; entries carry the "k=v" spec parsed from the path.
    *
    * The directory name carries the slot the writer FIRST aimed at plus
    * a per-writer token (`d-<v>-<tok>`): two committers racing the same
    * slot then write disjoint directories, so losing the manifest race
    * costs a retry of the KB-scale manifest only — the data files are
    * written once and re-referenced by the rebased commit (whose final
    * version may exceed the dir-name slot; the name is an opaque label,
    * manifests are the truth). A writer that dies before committing
    * leaves an orphaned dir no manifest references — invisible to every
    * reader. */
  private def writeDataFiles(df: DataFrame, dir: String, v: Long,
      partitionCols: Seq[String]): Seq[Entry] = {
    val spark = df.sparkSession
    val tok = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"${dir.stripSuffix("/")}/data/d-$v-$tok"
    val w = df.write.mode(SaveMode.Overwrite).option("compression", "snappy")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dataDir)
    val hfs = fs(spark, dir)
    val root = hfs.makeQualified(new Path(dataDir))
    def walk(p: Path): Seq[Path] =
      hfs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("part-")) Seq(st.getPath)
        else Nil
      }
    val entries = walk(root).map { p =>
      val rel = hfs.makeQualified(p).toString
        .stripPrefix(root.toString).stripPrefix("/")
      val part = rel.split('/').dropRight(1).mkString("/") match {
        case "" => None
        case spec => Some(spec)
      }
      // rows + per-column numeric zone maps: manifest statistics, read
      // from the parquet footer the write just produced (metadata-only,
      // like zoneMapK) — one footer open serves both
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(p, spark.sparkContext.hadoopConfiguration)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val (rows, (stats, sstats)) =
        try (reader.getRecordCount, footerZoneMaps(reader))
        finally reader.close()
      Entry(s"data/d-$v-$tok/$rel", part, rows, stats, sstats)
    }
    writeBloomSidecar(spark, dir, entries)
    entries
  }

  /** Per-column (min, max) over a file's row groups — numeric primitives
    * into `stats`, UTF-8 string primitives into `sstats` (bounded: a
    * value longer than [[MaxStrStat]] drops the column — a truncated max
    * is NOT an upper bound, so truncation cannot be used safely without
    * the increment-last-code-point trick; addresses are 42 chars and fit
    * whole). A column is dropped the moment any row group lacks usable
    * stats (all-null chunk, NaN bounds, unsupported type) — an absent
    * zone map only disables pruning for that column. */
  private def footerZoneMaps(
      reader: org.apache.parquet.hadoop.ParquetFileReader)
      : (Map[String, (Double, Double)], Map[String, (String, String)]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val perCol = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val perStr = scala.collection.mutable.LinkedHashMap[String, (String, String)]()
    val dropped = scala.collection.mutable.Set[String]()
    val droppedStr = scala.collection.mutable.Set[String]()
    for (block <- reader.getFooter.getBlocks.asScala;
         cc <- block.getColumns.asScala) {
      val name = cc.getPath.toDotString
      val st = cc.getStatistics
      val usable = st != null && !st.isEmpty && st.hasNonNullValue
      val ptype = cc.getPrimitiveType
      val isString = ptype.getPrimitiveTypeName == BINARY &&
        ptype.getLogicalTypeAnnotation != null &&
        ptype.getLogicalTypeAnnotation.isInstanceOf[
          org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      if (isString) {
        if (!droppedStr(name)) {
          val mm: Option[(String, String)] =
            if (!usable) None
            else {
              val mn = st.genericGetMin
                .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
              val mx = st.genericGetMax
                .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
              if (mn.length > MaxStrStat || mx.length > MaxStrStat) None
              else Some((mn, mx))
            }
          mm match {
            case Some((mn, mx)) =>
              perStr(name) = perStr.get(name) match {
                case Some((a, b)) => (
                  if (utf8Compare(mn, a) < 0) mn else a,
                  if (utf8Compare(mx, b) > 0) mx else b)
                case None => (mn, mx)
              }
            case None =>
              droppedStr += name
              perStr.remove(name): Unit
          }
        }
      } else if (!dropped(name)) {
        // only PLAIN ints/floats: an INT32/INT64 carrying a logical type
        // stores a different unit than the read-side value (decimal
        // unscaled, timestamp micros, date days) — zone maps in the
        // wrong unit would prune files that CONTAIN matching rows, a
        // silent wrong answer. Those columns get no stats (no pruning,
        // always correct) until a typed bounds surface exists.
        val logical = ptype.getLogicalTypeAnnotation
        val plainInt = logical == null ||
          logical.isInstanceOf[
            org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation]
        val mm: Option[(Double, Double)] =
          if (!usable) None
          else ptype.getPrimitiveTypeName match {
            case INT64 if plainInt => Some((
              st.genericGetMin.asInstanceOf[java.lang.Long].toDouble,
              st.genericGetMax.asInstanceOf[java.lang.Long].toDouble))
            case INT32 if plainInt => Some((
              st.genericGetMin.asInstanceOf[java.lang.Integer].toDouble,
              st.genericGetMax.asInstanceOf[java.lang.Integer].toDouble))
            case DOUBLE => Some((
              st.genericGetMin.asInstanceOf[java.lang.Double].toDouble,
              st.genericGetMax.asInstanceOf[java.lang.Double].toDouble))
            case FLOAT => Some((
              st.genericGetMin.asInstanceOf[java.lang.Float].toDouble,
              st.genericGetMax.asInstanceOf[java.lang.Float].toDouble))
            case _ => None
          }
        mm match {
          case Some((mn, mx)) if !mn.isNaN && !mx.isNaN =>
            perCol(name) = perCol.get(name) match {
              case Some((a, b)) => (math.min(a, mn), math.max(b, mx))
              case None => (mn, mx)
            }
          case _ =>
            dropped += name
            perCol.remove(name): Unit
        }
      }
    }
    (perCol.toMap, perStr.toMap)
  }

  /** Longest string value kept in `sstats`. */
  private val MaxStrStat = 128

  /** Unsigned UTF-8 byte order — Spark's own string comparison (binary
    * UnsafeRow compare), and the sort order parquet writes string stats
    * in. Java's String.compareTo (UTF-16 code units) disagrees for
    * supplementary characters, so pruning must NOT use it. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** The next commit SLOT: one past the highest manifest OR declaration
    * NAME present — parseable or torn. A torn slot (crashed writer) is
    * burned, never reused: reusing it would need a delete+recreate,
    * which reopens the lost-commit window the exclusive create exists
    * to close. Declaration names burn their slot for the same reason:
    * [[addColumn]]/[[dropColumn]] write `decl-<v>` BEFORE committing
    * manifest v, so a crash between the two leaves an orphan decl-<v> —
    * if a later committer could still claim slot v, the orphan would
    * spring to life as that unrelated commit's schema change. Burning
    * the slot keeps the orphan permanently manifest-less, which is
    * exactly the state [[schemaLines]] ignores. */
  private def nextSlot(hfs: FileSystem, dir: String): Long = {
    val sdir = new Path(s"${dir.stripSuffix("/")}/$SchemaDirName")
    val declMax =
      if (!hfs.exists(sdir)) 0L
      else Option(hfs.globStatus(new Path(sdir, "decl-*")))
        .map(_.toSeq).getOrElse(Nil)
        .flatMap(_.getPath.getName.stripPrefix("decl-").toLongOption)
        .maxOption.getOrElse(0L)
    math.max(versionNames(hfs, dir).lastOption.getOrElse(0L), declMax) + 1
  }

  // ----------------------------------------- LOCAL CROSS-PROCESS ARBITRATION

  /** Cross-PROCESS commit arbitration for `file://` stores. The HDFS-like
    * protocol relies on rename failing into an occupied slot; POSIX
    * rename OVERWRITES, so on local filesystems two processes could both
    * "win" a slot and one commit would vanish. Per-slot exclusive claims
    * don't fix it either — a loser that skips past a claimed-but-not-yet-
    * visible slot commits a successor that omits the owner's rows (the
    * same lost-commit shape). So local commits serialize the WHOLE
    * manifest section (base check → slot re-read → write → rename) under
    * one table-level OS FILE LOCK (`FileChannel.tryLock` — fcntl/flock):
    * the KERNEL releases it when the holding process exits for any
    * reason, so there is no staleness heuristic and no
    * check-mtime-then-steal window (a delete-after-age takeover is a
    * TOCTOU: two waiters can free the same "stale" path twice and the
    * second steals the first's fresh claim). The lock FILE persists
    * empty between commits — only the kernel lock state matters.
    * Same-JVM re-entry cannot happen (callers already serialize on the
    * per-table JVM lock, and OverlappingFileLockException would surface
    * loudly if that ever changed). Non-local filesystems return to the
    * rename-arbitrated protocol untouched; the commit lock makes the
    * optimistic contract hold everywhere the tests run, including two
    * JVMs on one machine (ManifestSnapshotSpec races it with a forked
    * JVM). */
  private def withLocalCommitLock[T](hfs: FileSystem, dir: String)(body: => T): T = {
    // getUri.getScheme, NOT FileSystem.getScheme: the base-class getScheme
    // throws UnsupportedOperationException, so a third-party FS that never
    // overrides it would fail every commit instead of skipping the lock
    if (hfs.getUri.getScheme != "file") return body
    val mdir = new Path(s"${dir.stripSuffix("/")}/manifests")
    hfs.mkdirs(mdir)
    val nio = java.nio.file.Paths.get(
      hfs.makeQualified(mdir).toUri.getPath, ".commit.lock")
    val ch = java.nio.channels.FileChannel.open(nio,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      var lock: java.nio.channels.FileLock = null
      var waitedMs = 0L
      while (lock == null) {
        lock = ch.tryLock()
        if (lock == null) {
          Thread.sleep(5L)
          waitedMs += 5
          if (waitedMs > 120000L)
            throw new IllegalStateException(
              s"local commit lock under $dir held for >120s — the locked " +
                "section is KB-scale manifest I/O; a holder this slow is stuck")
        }
      }
      try body finally lock.release()
    } finally ch.close()
  }

  private def qualified(hfs: FileSystem, dir: String): String =
    hfs.makeQualified(new Path(dir)).toString

  /** Commit `entriesAt(v)` as a new version, retrying on slot conflicts.
    * `entriesAt` is re-evaluated per attempt so append-shaped writers
    * rebase onto the winner's file list. Rewrite-shaped writers instead
    * pass `expectedBase`: their kept/rewritten split is only valid
    * against that exact committed state, so ANY base movement — a
    * concurrent append included, whose files a stale rewrite manifest
    * would silently drop — raises ConcurrentModificationException for
    * the caller to re-run. The base check, entry evaluation, and
    * exclusive create run under the per-table process lock (same-JVM
    * determinism on local filesystems whose create(overwrite=false) is
    * check-then-act); across JVMs the exclusive create arbitrates slots
    * and the base check closes the append-vs-rewrite interleaving
    * (an append that wins the slot fails our create → CME; an append
    * that loses the slot rebases onto our committed list). */
  private def commitLoop(hfs: FileSystem, dir: String,
      entriesAt: Long => Seq[Entry],
      expectedBase: Option[Long] = None): Long = {
    val lock = BloomSkipping.jvmLock(qualified(hfs, dir) + "#manifest")
    var v = nextSlot(hfs, dir)
    var attempts = 0
    while (true) {
      val committed = lock.synchronized { withLocalCommitLock(hfs, dir) {
        expectedBase.foreach { b =>
          // Some(0) = "computed against an EMPTY table": versions start
          // at 1, so the fast-forward check degenerates to emptiness —
          // held under the same cross-process lock as the create, closing
          // the check-then-commit window a pre-lock emptiness require()
          // would leave open (a concurrent v1 landing between them would
          // be silently superseded, dropping its files from table state)
          val cur = newestParseable(hfs, dir)
          if (if (b == 0L) cur.nonEmpty else !cur.contains(b))
            throw new java.util.ConcurrentModificationException(
              s"snapshot commit conflict under $dir: the table moved past " +
                s"version $b while a rewriting operation (MERGE/DELETE/" +
                "UPDATE/OPTIMIZE/publish) was computing its touched files — " +
                "re-run it against the new committed state")
        }
        v = math.max(v, nextSlot(hfs, dir))
        tryCommitManifest(hfs, dir, v, entriesAt(v))
      } }
      if (committed) {
        commitPointer(hfs, dir, v)
        return v
      }
      attempts += 1
      if (attempts >= 64)
        throw new IllegalStateException(
          s"snapshot commit lost $attempts slot races under $dir — " +
            "pathological contention")
      v = v + 1
    }
    -1L // unreachable
  }

  /** Full snapshot: version 1 of a table, or a complete re-statement.
    * Safe to retry under concurrency (content independent of the
    * predecessor). A re-statement stays bound by the table's evolution
    * metadata: a frame carrying a DROPPED name is refused (its bytes
    * would land but every reader hides the column — the operator
    * believes the re-statement restored it, and the right-to-be-
    * forgotten story silently keeps the data), and retyping a DECLARED
    * column is refused like every other writer. */
  def writeFull(df: DataFrame, dir: String,
      partitionCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val hfs = fs(spark, dir)
    val droppedNow = droppedColumns(spark, dir).map(_.name).toSet
    val bad = df.schema.map(_.name).filter(droppedNow.contains)
    require(bad.isEmpty,
      s"writeFull refuses dropped column(s) ${bad.mkString(", ")}: readers " +
        "hide them, so the bytes would persist invisibly — re-add is not " +
        "supported; use a fresh name")
    declaredColumns(spark, dir).foreach { c =>
      df.schema.find(_.name == c.name).foreach { f =>
        val dt = org.apache.spark.sql.types.DataType.fromDDL(c.ddl)
        require(f.dataType == dt,
          s"writeFull refuses to retype declared column '${c.name}': " +
            s"declared $dt, frame ${f.dataType}")
      }
    }
    val entries = writeDataFiles(df, dir, nextSlot(hfs, dir), partitionCols)
    commitCleanly(hfs, dir, entries)(commitLoop(hfs, dir, _ => entries))
  }

  /** O(delta) append version: the new manifest = predecessor's list +
    * the delta's fresh files. Nothing is rewritten or copied.
    *
    * Schema evolution: a delta may ADD columns (older versions read them
    * as NULL — [[readEntries]]'s missing-column union), but RETYPING a
    * column is refused before any data lands: a type change under a
    * union read would corrupt or fail every consumer, and at lake scale
    * that class of break must die at the writer, not in a reader
    * minutes later. */
  def appendDelta(df: DataFrame, dir: String,
      partitionCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val hfs = fs(spark, dir)
    def prevEntries: Seq[Entry] = latestVersion(spark, dir)
      .flatMap(v => readManifest(hfs, dir, v)).getOrElse(Nil)
    def guard(prev: Seq[Entry]): Seq[Entry] = {
      requireShape(prev, partitionCols, "appendDelta")
      // unconditional: the metadata checks (dropped names, declared
      // types) hold even when the predecessor manifest is EMPTY — only
      // the stored-footer comparison inside needs entries, and
      // requireNoRetype itself gates that part
      requireNoRetype(spark, dir, prev, df.schema, partitionCols.toSet, "appendDelta")
      prev
    }
    // both guards run BEFORE any data lands: a refused append must leave
    // nothing behind, not an orphaned data dir
    var guardedAt: Option[Long] = None
    def guardIfMoved(): Seq[Entry] = {
      val v = latestVersion(spark, dir)
      val prev = v.flatMap(readManifest(hfs, dir, _)).getOrElse(Nil)
      if (guardedAt != Some(v.getOrElse(-1L))) {
        guard(prev)
        guardedAt = Some(v.getOrElse(-1L))
      }
      prev
    }
    guardIfMoved()
    val entries = writeDataFiles(df, dir, nextSlot(hfs, dir), partitionCols)
    // per-attempt rebase: a lost slot race re-reads the winner's list (and
    // re-guards against it — the winner may have evolved the schema), then
    // re-extends it with OUR files; appends commute, so this is the
    // serializable outcome at the cost of re-trying the KB-scale manifest.
    // The schema guard re-runs ONLY when the table moved since it last
    // passed (guardIfMoved): requireNoRetype's storedSchema is a Spark
    // footer job, and running it unconditionally inside the commit lock
    // would hold the cross-process lock for a job's duration — the
    // watchdog's KB-scale-manifest-I/O assumption must stay true
    commitCleanly(hfs, dir, entries)(
      commitLoop(hfs, dir, _ => guardIfMoved() ++ entries))
  }

  /** [[appendDelta]] behind the row-identity replay guard — the
    * streaming chain's admission shape at 100 TB, where the plain
    * anti join against the committed chain costs O(table) per batch.
    * Composes two bounded pieces:
    *
    *  - the PERSISTENT key bloom ([[BloomSkipping]]'s `_key_bloom` at
    *    the chain root): a mostly-new batch proves itself fresh at the
    *    guard (O(batch), no chain scan) and only probable duplicates
    *    (true matches + fpp of the rest) pay the exact anti join;
    *  - guard-AHEAD commit order: the guard merges the admitted keys
    *    BEFORE the version commits, so a crash between the two leaves
    *    a guard claiming keys the chain lacks — replay routes exactly
    *    those rows through the exact probe (false positives only),
    *    which re-admits them: exactly once, as an ordering. A torn or
    *    missing guard degrades to the exact path and self-heals from
    *    the whole chain's keys — never re-seeded from one batch, which
    *    would claim older stored rows fresh.
    *
    * Returns the committed version (unchanged when the whole batch was
    * a replay). First write seeds data-then-guard, like the lake's
    * bloom-guarded ingest: a crash between leaves no guard, and the
    * next batch takes the exact path. */
  def appendDeltaGuarded(spark: SparkSession, dir: String, batch: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil,
      expectedKeys: Long = 4000000L): Long = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val keyHash = xxhash64(keys.map(col): _*)
    // The admission CHECK and the version COMMIT are two steps, so two
    // concurrent guarded appends of overlapping batches could both pass
    // the check before either commits. Same-JVM callers serialize here
    // (the streaming micro-batch loop is single-threaded anyway); across
    // JVMs run one guarded committer per chain — plain appendDelta and
    // the read paths stay fully concurrent under the manifest OCC.
    BloomSkipping.jvmLock(
      qualified(fs(spark, dir), dir) + "#guarded").synchronized {
    latestVersion(spark, dir) match {
      case None =>
        val v = appendDelta(batch, dir, partitionCols)
        BloomSkipping.mergeKeyBloom(spark, dir,
          batch.select(keyHash.as("h")), expectedKeys)
        v
      case Some(cur) =>
        val chainKeys = readLatest(spark, dir).select(keys.map(col): _*)
        // NULL-SAFE exact probe (<=>): a plain USING anti join never
        // matches a NULL key against its stored copy, so a NULL-keyed
        // row would be re-admitted on EVERY replay — the exact failure
        // Lakehouse.antiJoinAppend documents and guards against.
        def exactAnti(b: DataFrame): DataFrame = {
          val t = chainKeys.alias("t")
          val cond = keys.map(k => b(k) <=> col(s"t.$k")).reduce(_ && _)
          b.join(t, cond, "left_anti")
        }
        // raw stored bytes, not deserialize-then-reserialize: this runs
        // once per micro-batch and the guard is multi-MB
        val guardOpt = BloomSkipping.loadKeyBloomBytes(spark, dir)
        val fresh = guardOpt match {
          case Some(guardBytes) =>
            val probable = BloomSkipping.mightContainHashed(spark, guardBytes, keyHash)
            batch.filter(!probable).unionByName(exactAnti(batch.filter(probable)))
          case None =>
            exactAnti(batch)
        }
        val admitted = fresh.persist()
        try {
          if (admitted.isEmpty) cur
          else {
            guardOpt match {
              case Some(_) =>
                BloomSkipping.mergeKeyBloom(spark, dir,
                  admitted.select(keyHash.as("h")), expectedKeys)
              case None => // self-heal from ground truth, not the batch
                BloomSkipping.mergeKeyBloom(spark, dir,
                  chainKeys.select(keyHash.as("h"))
                    .unionByName(admitted.select(keyHash.as("h"))),
                  expectedKeys)
            }
            appendDelta(admitted, dir, partitionCols)
          }
        } finally { admitted.unpersist(): Unit }
    }
    }
  }

  /** The chain's merged schema from ONE representative file per version
    * dir (files written together share a schema) — O(version dirs)
    * footer reads, not O(files), so the per-append guard cost stays
    * bounded by compaction cadence on a long chain. Partition columns
    * are not in file schemas and are excluded by callers anyway. */
  private def storedSchema(spark: SparkSession, base: String,
      entries: Seq[Entry]): org.apache.spark.sql.types.StructType = {
    val reps = entries.groupBy(_.path.split('/').take(2).mkString("/"))
      .values.map(_.head).toSeq.sortBy(_.path)
    spark.read.option("mergeSchema", "true")
      .parquet(reps.map(e => s"$base/${e.path}"): _*).schema
  }

  /** Refuse a delta that RETYPES a stored column: a type change under
    * the union read would corrupt or fail every consumer, and at lake
    * scale that class of break must die at the writer, not in a reader
    * minutes later. Partition columns are excluded: their read-side
    * type is a session convention (path inference), not a property of
    * the stored files. */
  private def requireNoRetype(spark: SparkSession, dir: String,
      entries: Seq[Entry], delta: org.apache.spark.sql.types.StructType,
      exclude: Set[String], op: String): Unit = {
    // declared (metadata-only) columns guard like stored ones: a delta
    // materializing a declared column must carry its declared type.
    // The dropped/declared checks are metadata-only and need no stored
    // entries, so they run even against an EMPTY predecessor manifest
    // (e.g. a deleteWhere that removed every row): a delta resurrecting
    // a dropped name, or retyping a declared column, is exactly as
    // unsound on an empty table — the bytes would land and every read
    // of current versions would project them out or coerce them.
    val stored = (if (entries.isEmpty) Map.empty[String, org.apache.spark.sql.types.DataType]
      else storedSchema(spark, dir.stripSuffix("/"), entries)
        .map(f => f.name -> f.dataType).toMap) ++
      declaredColumns(spark, dir)
        .map(c => c.name -> org.apache.spark.sql.types.DataType.fromDDL(c.ddl))
        .toMap
    val droppedNow = droppedColumns(spark, dir).map(_.name).toSet
    delta.filterNot(f => exclude.contains(f.name)).foreach { f =>
      if (droppedNow.contains(f.name))
        throw new IllegalArgumentException(
          s"$op refuses column '${f.name}': dropped from this table's " +
            "schema (a delta resurrecting it would shadow the old groups' " +
            "retired values)")
      stored.get(f.name).filter(_ != f.dataType).foreach { was =>
        throw new IllegalArgumentException(
          s"$op refuses to retype column '${f.name}': stored $was, delta ${f.dataType}")
      }
    }
  }

  // ------------------------------------------------------ SCHEMA EVOLUTION

  /** One metadata-declared column: added by [[addColumn]] at version
    * `since`; physically present only in files written afterwards.
    * Reads of version ≥ since materialize it — `defaultSql` (or NULL)
    * fills file GROUPS that predate the declaration; stored values,
    * NULLs included, are never overwritten. */
  final case class DeclaredColumn(name: String, ddl: String,
      defaultSql: Option[String], since: Long)

  private val SchemaColsFile = "_schema_cols"
  private val SchemaDirName = "_schema"

  private def encMarker(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def decMarker(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** One metadata-declared column DROP: reads of version ≥ `since`
    * project the column out; earlier versions keep it (time travel). */
  final case class DroppedColumn(name: String, since: Long)

  /** A drop line's sentinel first field — '!' URL-encodes to %21, so no
    * encoded column name can collide with it. */
  private val DropKind = "!drop"

  /** Schema-evolution declarations live as ONE IMMUTABLE FILE PER
    * DECLARING COMMIT under `_schema/` (`decl-<version>`), written by
    * create-tmp-then-rename to a never-occupied name: there is no
    * delete-then-rename window in which a concurrent reader would see
    * NO metadata (and silently read every declared column away / admit
    * a retyping delta past the guard), and two concurrent declarations
    * cannot lose each other's line — they write different files. The
    * legacy single `_schema_cols` marker is still read for stores
    * declared before this layout. Lines sort by `since`, so column
    * order is commit order whatever the listing order. */
  private def schemaLines(spark: SparkSession, dir: String): Seq[Array[String]] = {
    val base = dir.stripSuffix("/")
    val legacy = Markers.read(spark, new Path(base, SchemaColsFile))
      .map(_.linesIterator.filter(_.nonEmpty).toSeq.map(_.split('\t')))
      .getOrElse(Nil)
    val sdir = new Path(base, SchemaDirName)
    val hfs = sdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // decl-<v> is written BEFORE manifest v commits (same critical
    // section — see commitDeclaration), so a declaration whose version
    // has no manifest NAME is either a crashed declaration (its slot is
    // burned by nextSlot, so it stays manifest-less forever — ignore)
    // or one mid-commit (invisible until its manifest appears, which is
    // the commit point — exactly the read-side contract we want). The
    // check is by NAME (a pure listing): torn-vs-parseable doesn't
    // matter here because a torn slot at the declaration's own version
    // means the declaring commit itself never completed.
    val perVersion =
      if (!hfs.exists(sdir)) Nil
      else {
        val committedNames = versionNames(hfs, dir).toSet
        Option(hfs.globStatus(new Path(sdir, "decl-*"))).map(_.toSeq).getOrElse(Nil)
          .filter(_.getPath.getName.stripPrefix("decl-").toLongOption
            .exists(committedNames.contains))
          .flatMap(st => Markers.read(spark, st.getPath))
          .flatMap(_.linesIterator.filter(_.nonEmpty).toSeq.map(_.split('\t')))
      }
    // the since-version is field 2 in both line kinds
    (legacy ++ perVersion).sortBy(f =>
      if (f.length == 4) f(2).toLongOption.getOrElse(Long.MaxValue)
      else Long.MaxValue)
  }

  /** The table's metadata-declared columns, oldest first. */
  def declaredColumns(spark: SparkSession, dir: String): Seq[DeclaredColumn] =
    schemaLines(spark, dir).flatMap {
      case Array(n, t, since, d) if n != DropKind =>
        Some(DeclaredColumn(decMarker(n), decMarker(t),
          if (d.startsWith("=")) Some(decMarker(d.drop(1))) else None,
          since.toLong))
      case _ => None
    }

  /** The table's metadata-dropped columns, oldest first. */
  def droppedColumns(spark: SparkSession, dir: String): Seq[DroppedColumn] =
    schemaLines(spark, dir).flatMap {
      case Array(DropKind, n, since, _) =>
        Some(DroppedColumn(decMarker(n), since.toLong))
      case _ => None
    }

  /** Declare a NEW column as a METADATA-ONLY commit — Iceberg's
    * add-column-with-default: no data file is touched (the new manifest
    * carries the predecessor's entries verbatim), and the declaration
    * becomes visible to reads of the returned version ONWARD. Time
    * travel keeps old schemas: `read(v)` for v before this commit does
    * not carry the column. Files written after the declaration store it
    * physically (their own values, stored NULLs preserved — the default
    * fills only file groups that PREDATE the column). The default
    * literal is validated against the declared type HERE, writer-side,
    * not in a reader minutes later; retyping the declared column in a
    * later delta is refused by the same guard that protects stored
    * columns. Like OPTIMIZE/refresh, addColumn is single-maintenance-
    * writer: two concurrent declarations can lose one marker line. */
  def addColumn(spark: SparkSession, dir: String, name: String,
      ddlType: String, defaultSql: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.expr
    val hfs = fs(spark, dir)
    val dt = org.apache.spark.sql.types.DataType.fromDDL(ddlType)
    // the default is FROZEN at declaration: evaluated once, stored as a
    // plain CAST literal. Re-evaluating the caller's expression at every
    // read would give pre-declaration rows a DIFFERENT value per read
    // for non-deterministic defaults (current_timestamp()), breaking the
    // pin-by-version reproducibility the store exists for. Freezing
    // needs an atomic declared type (the literal round-trips through its
    // string form); non-atomic defaults are refused.
    val frozen: Option[String] = defaultSql.map { d =>
      val atomicOk = dt match {
        case _: org.apache.spark.sql.types.ArrayType => false
        case _: org.apache.spark.sql.types.MapType => false
        case _: org.apache.spark.sql.types.StructType => false
        case org.apache.spark.sql.types.BinaryType => false
        case _ => true
      }
      require(atomicOk,
        s"addColumn: a DEFAULT needs an atomic declared type, got $ddlType " +
          "(declare without a default to read NULL for old groups)")
      val v = spark.range(1).select(expr(d).cast(dt)).head.get(0)
      require(v != null || d.trim.equalsIgnoreCase("null"),
        s"addColumn default `$d` does not cast to $ddlType")
      if (v == null) "NULL"
      else s"CAST('${v.toString.replace("'", "''")}' AS $ddlType)"
    }
    val prev = latestVersion(spark, dir).getOrElse(throw new IllegalStateException(
      s"addColumn needs a committed snapshot under $dir"))
    val entries = entriesOf(spark, dir, prev)
    val physical: Set[String] =
      if (entries.isEmpty) Set.empty
      else storedSchema(spark, dir.stripSuffix("/"), entries).map(_.name).toSet
    val declared = declaredColumns(spark, dir).map(_.name).toSet
    require(!physical.contains(name) && !declared.contains(name),
      s"addColumn: column '$name' already exists on $dir")
    require(!droppedColumns(spark, dir).exists(_.name == name),
      s"addColumn: '$name' was dropped — old file groups still store " +
        "values under that name and a re-add would resurface them; " +
        "use a fresh name (field-id-free evolution cannot re-add)")
    commitDeclaration(spark, hfs, dir, prev, entries,
      v => Seq(encMarker(name), encMarker(ddlType),
        v.toString, frozen.map("=" + encMarker(_)).getOrElse("-")))
  }

  /** Commit a schema declaration ATOMICALLY with its no-op metadata
    * version: the `decl-<v>` file is written BEFORE manifest v, inside
    * the same commit-lock critical section as the manifest create, so
    * no reader can ever observe the committed version without its
    * declaration. (The old commit-then-declare order had a window in
    * which a concurrent appendDelta's re-guard saw the moved version
    * but not yet the declaration — it could admit a delta retyping the
    * just-declared column or resurrecting the just-dropped name.)
    *
    * Failure shapes, all benign:
    *  - crash AFTER decl, BEFORE manifest: the orphan decl's slot is
    *    burned by [[nextSlot]] (no manifest will ever be named v) and
    *    [[schemaLines]] ignores manifest-less declarations — the
    *    declaration simply never happened;
    *  - slot lost to a concurrent committer (HDFS-like stores, where
    *    the exclusive create arbitrates): the decl is deleted and
    *    ConcurrentModificationException surfaces for a re-run, same as
    *    every expectedBase-guarded rewrite. On `file://` stores the
    *    process lock makes this unreachable.
    * One immutable declaration file per declaring commit (the version
    * is unique), so declarations are never rewritten and readers never
    * observe an absent-metadata window. */
  private def commitDeclaration(spark: SparkSession, hfs: FileSystem,
      dir: String, prev: Long, entries: Seq[Entry],
      fields: Long => Seq[String]): Long = {
    val lock = BloomSkipping.jvmLock(qualified(hfs, dir) + "#manifest")
    lock.synchronized { withLocalCommitLock(hfs, dir) {
      if (!newestParseable(hfs, dir).contains(prev))
        throw new java.util.ConcurrentModificationException(
          s"schema declaration conflict under $dir: the table moved past " +
            s"version $prev while the declaration was being prepared — " +
            "re-run it against the new committed state")
      val v = nextSlot(hfs, dir)
      val declPath = new Path(
        new Path(dir.stripSuffix("/"), SchemaDirName), s"decl-$v")
      Markers.write(spark, declPath, fields(v).mkString("\t") + "\n")
      require(Markers.read(spark, declPath).isDefined,
        s"declaration write failed under $dir — refusing to commit a " +
          "schema-change version whose declaration is absent")
      val committed =
        try tryCommitManifest(hfs, dir, v, entries)
        catch { case e: Throwable => hfs.delete(declPath, false); throw e }
      if (!committed) {
        hfs.delete(declPath, false)
        throw new java.util.ConcurrentModificationException(
          s"schema declaration under $dir lost slot $v to a concurrent " +
            "committer — re-run it against the new committed state")
      }
      commitPointer(hfs, dir, v)
      v
    } }
  }

  /** Drop a column as a METADATA-ONLY commit: no data file is touched —
    * reads of the returned version onward project the column out; time
    * travel before it keeps the column (old manifests, old schema). The
    * name leaves the writer surface too: a later delta carrying it is
    * refused (the files under old versions still store the bytes until
    * their versions are vacuumed — this is schema removal, not data
    * erasure; [[deleteWhere]] is the data-erasure path). Re-adding a
    * dropped name is refused: the old groups still store values under
    * that name, and a re-add would resurface them as the "new" column's
    * data (Iceberg separates the two by field id; a name-keyed model
    * must refuse instead). Single-maintenance-writer, like addColumn. */
  def dropColumn(spark: SparkSession, dir: String, name: String): Long = {
    val hfs = fs(spark, dir)
    val prev = latestVersion(spark, dir).getOrElse(throw new IllegalStateException(
      s"dropColumn needs a committed snapshot under $dir"))
    val entries = entriesOf(spark, dir, prev)
    val physical: Set[String] =
      if (entries.isEmpty) Set.empty
      else storedSchema(spark, dir.stripSuffix("/"), entries).map(_.name).toSet
    val declared = declaredColumns(spark, dir).map(_.name).toSet
    val droppedNow = droppedColumns(spark, dir).map(_.name).toSet
    require((physical.contains(name) || declared.contains(name)) &&
        !droppedNow.contains(name),
      s"dropColumn: no live column '$name' on $dir")
    require((physical ++ declared -- droppedNow - name).nonEmpty,
      s"dropColumn: '$name' is the table's last live column")
    commitDeclaration(spark, hfs, dir, prev, entries,
      v => Seq(DropKind, encMarker(name), v.toString, "-"))
  }

  /** Copy-on-write at partition granularity: the delta's partitions
    * replace the predecessor's files for EXACTLY those partitions;
    * untouched partitions keep their existing files by reference. The
    * MERGE-shaped snapshot — a 0.1% daily delta writes 0.1% of the
    * table and one manifest. */
  def replacePartitions(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Long = {
    require(partitionCols.nonEmpty, "replacePartitions needs partition columns")
    val spark = df.sparkSession
    val hfs = fs(spark, dir)
    // same writer guards as appendDelta, BEFORE any data lands: a
    // replacement must keep the partitioned shape and may not retype a
    // stored column (the union read would coerce or fail downstream)
    val prev0 = latestVersion(spark, dir)
      .flatMap(v => readManifest(hfs, dir, v)).getOrElse(Nil)
    require(prev0.isEmpty || prev0.forall(_.partition.isDefined),
      "replacePartitions must target a partitioned table: the committed " +
        "versions are unpartitioned and the union read would break")
    requireShape(prev0, partitionCols, "replacePartitions")
    requireNoRetype(spark, dir, prev0, df.schema, partitionCols.toSet,
      "replacePartitions")
    val entries = writeDataFiles(df, dir, nextSlot(hfs, dir), partitionCols)
    val touched = entries.flatMap(_.partition).toSet
    // rebase on conflict: partition replacement is declarative ("these
    // partitions now read THIS"), so re-deriving kept from the winner's
    // list is the serialized outcome — concurrent appends to untouched
    // partitions survive, concurrent writes to the touched ones are
    // replaced exactly as if this commit had run second
    commitCleanly(hfs, dir, entries)(commitLoop(hfs, dir, _ => {
      val prev = latestVersion(spark, dir)
        .flatMap(v => readManifest(hfs, dir, v)).getOrElse(Nil)
      prev.filterNot(_.partition.exists(touched.contains)) ++ entries
    }))
  }

  // --------------------------------------------------------------- READERS

  /** Assemble a frame from manifest entries, tolerant of ADDED columns
    * (they read as NULL for versions written before they existed;
    * [[appendDelta]] refuses the unsound case — retyping — at write
    * time). Unpartitioned chains are ONE scan over the explicit file
    * list with parquet schema merging (footer reads parallelize on the
    * driver; a single FileSourceScan keeps planning O(1) in the version
    * count — a long-lived chain is hundreds of versions even with
    * compaction). Partitioned layouts need one read per contributing
    * version-dir (each is its own hive basePath), unioned by name —
    * there the version count is bounded by [[compactData]] cadence. */
  private def readEntries(spark: SparkSession, base: String,
      entries: Seq[Entry], declared: Seq[DeclaredColumn] = Nil): DataFrame = {
    // Declared-column fill is applied PER WRITE GROUP (one d-<v>-<tok>
    // dir = one physical schema): a group that physically lacks the
    // column predates its declaration and gets the typed default; a
    // group that stores it keeps its values — INCLUDING stored NULLs,
    // which a frame-wide coalesce would silently overwrite.
    def fill(df: DataFrame): DataFrame = declared.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c.name)) d
      else d.withColumn(c.name,
        c.defaultSql.map(org.apache.spark.sql.functions.expr)
          .getOrElse(org.apache.spark.sql.functions.lit(null))
          .cast(org.apache.spark.sql.types.DataType.fromDDL(c.ddl)))
    }
    if (declared.isEmpty && entries.forall(_.partition.isEmpty))
      spark.read.option("mergeSchema", "true")
        .parquet(entries.map(e => s"$base/${e.path}"): _*)
    else
      entries.groupBy(_.path.split('/').take(2).mkString("/")).toSeq
        .sortBy(_._1)
        .map { case (vdir, es) =>
          fill(spark.read.option("basePath", s"$base/$vdir")
            .parquet(es.map(e => s"$base/${e.path}"): _*))
        }
        .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Read one version: exactly its manifest's files. Partitioned layouts
    * recover the partition columns from the hive paths via basePath
    * (string-typed, the lake's hive-partition convention). The schema
    * travels with the version: columns declared by [[addColumn]] AT OR
    * BEFORE `version` are materialized (default-filled for file groups
    * that predate them); a read of an earlier version keeps the earlier
    * schema. */
  def read(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val entries = entriesOf(spark, dir, version)
    val declared = declaredColumns(spark, dir).filter(_.since <= version)
    val dropped = droppedColumns(spark, dir).filter(_.since <= version).map(_.name)
    val base =
      if (entries.isEmpty) emptyVersion(spark, dir, version, declared)
      else readEntries(spark, dir.stripSuffix("/"), entries, declared)
    if (dropped.isEmpty) base else base.drop(dropped: _*)
  }

  /** An EMPTY version (a deleteWhere that removed every row commits a
    * zero-file manifest — the right-to-be-forgotten end state) reads as
    * an empty frame in the table's schema, recovered from the newest
    * earlier version that still has files. A chain whose every
    * schema-bearing version was vacuumed away has no recoverable schema
    * and fails with that diagnosis rather than a bare require. */
  private def emptyVersion(spark: SparkSession, dir: String,
      version: Long, declared: Seq[DeclaredColumn] = Nil): DataFrame = {
    val donor = versions(spark, dir)
      .filter(_ < version).sorted.reverse
      .map(v => entriesOf(spark, dir, v))
      .find(_.nonEmpty)
      .getOrElse(throw new IllegalStateException(
        s"version $version of $dir is empty and no earlier version " +
          "retains files to recover the schema from (vacuumed away) — " +
          "re-seed the chain with a writeFull/appendDelta"))
    readEntries(spark, dir.stripSuffix("/"), donor, declared).limit(0)
  }

  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed manifest snapshot under $dir"))
    read(spark, dir, v)
  }

  /** A version's complete manifest entry list (metadata-only). */
  def entriesOf(spark: SparkSession, dir: String, v: Long): Seq[Entry] =
    readManifest(fs(spark, dir), dir, v).getOrElse(
      throw new IllegalStateException(s"no parseable manifest for version $v under $dir"))

  /** The manifest entries version `toV` ADDS over `fromV` — a pure
    * file-list set difference, zero data I/O. */
  def addedEntries(spark: SparkSession, dir: String,
      fromV: Long, toV: Long): Seq[Entry] = {
    require(fromV <= toV, s"changes need fromV <= toV, got $fromV > $toV")
    val before = entriesOf(spark, dir, fromV).map(_.path).toSet
    entriesOf(spark, dir, toV).filterNot(e => before.contains(e.path))
  }

  /** The entries `fromV` had that `toV` DROPPED — nonempty exactly when
    * a rewriting version ([[replacePartitions]], [[compactData]]) sits
    * in the range, i.e. when the range is NOT append-only. Incremental
    * consumers use this as their soundness gate. */
  def removedEntries(spark: SparkSession, dir: String,
      fromV: Long, toV: Long): Seq[Entry] = {
    require(fromV <= toV, s"changes need fromV <= toV, got $fromV > $toV")
    val after = entriesOf(spark, dir, toV).map(_.path).toSet
    entriesOf(spark, dir, fromV).filterNot(e => after.contains(e.path))
  }

  /** CDC read: the rows versions (fromV, toV] added, recovered from the
    * manifest DIFF — because data files are immutable and manifests are
    * complete file lists, "what changed" is a path-set difference
    * resolved entirely on KB-scale metadata, and the read touches ONLY
    * the delta's files: O(delta) whatever the table size. For an
    * append-only chain this is exactly the inserted rows; a
    * [[replacePartitions]] version surfaces the touched partitions'
    * full new content (file-granular CDC, the Iceberg/Delta
    * incremental-read semantics without a per-row change log). Returns
    * an empty frame in the table's schema when nothing changed. */
  def readChanges(spark: SparkSession, dir: String,
      fromV: Long, toV: Long): DataFrame = {
    val added = addedEntries(spark, dir, fromV, toV)
    if (added.isEmpty) {
      val schema = read(spark, dir, toV).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else readFiles(spark, dir, added)
  }

  /** Read an explicit entry subset of a store — for callers that
    * already hold a manifest diff ([[addedEntries]]) and must not pay
    * a second one. Served at the CURRENT schema (declared columns
    * filled, dropped columns projected out) so CDC consumers see the
    * same shape [[read]] serves — a physical-schema read here would
    * hand a materialized view a frame missing a declared column its
    * spec aggregates, or resurrect a dropped one. */
  def readFiles(spark: SparkSession, dir: String, entries: Seq[Entry]): DataFrame = {
    require(entries.nonEmpty, "readFiles needs at least one entry")
    readEntriesCurrent(spark, dir, entries)
  }

  /** Evolution-aware physical read of `entries` at the CURRENT schema.
    * Every COW REWRITE reads its pre-image through this: a rewrite that
    * read raw physical files would physically store NULL where the
    * declared default belonged (the survivors' new file group carries
    * whatever the frame held), silently shadowing the default for rows
    * the operation never touched. */
  private def readEntriesCurrent(spark: SparkSession, dir: String,
      entries: Seq[Entry]): DataFrame = {
    val dropped = droppedColumns(spark, dir).map(_.name)
    val df = readEntries(spark, dir.stripSuffix("/"), entries,
      declaredColumns(spark, dir))
    if (dropped.isEmpty) df else df.drop(dropped: _*)
  }

  /** Write-default fill for an EXTERNAL delta frame (mergeByKey): a
    * delta omitting a declared column gets the declared default
    * materialized, matching what a read of an [[appendDelta]]-shaped
    * column-less group would show — without this, the union with the
    * (filled) stored side would store NULL for the delta's rows. */
  private def fillDeclaredCols(spark: SparkSession, dir: String,
      df: DataFrame): DataFrame =
    declaredColumns(spark, dir).foldLeft(df) { (d, c) =>
      if (d.columns.contains(c.name)) d
      else d.withColumn(c.name,
        c.defaultSql.map(org.apache.spark.sql.functions.expr)
          .getOrElse(org.apache.spark.sql.functions.lit(null))
          .cast(org.apache.spark.sql.types.DataType.fromDDL(c.ddl)))
    }

  /** Box-predicate read with MANIFEST-level data skipping: files whose
    * zone maps are disjoint from `bounds` (inclusive [lo, hi] per
    * column) are pruned before the scan is even planned — the file list
    * shrinks on KB-scale metadata, no footer I/O, composing with time
    * travel ("version v, where k in box" reads only v's matching
    * files). The residual filter is applied to the survivors, so the
    * result EQUALS the unpruned filtered read whatever the stats say —
    * an entry without a zone map for a bound column simply always
    * survives pruning. Iceberg's manifest-stats skipping on plain
    * parquet; the footer-level twin is Lakehouse.readZPrunedK. */
  def readWhere(spark: SparkSession, dir: String, version: Long,
      bounds: Seq[(String, Double, Double)],
      strBounds: Seq[(String, String, String)] = Nil): DataFrame = {
    require(bounds.nonEmpty || strBounds.nonEmpty,
      "readWhere needs at least one column bound")
    import org.apache.spark.sql.functions.{col, lit}
    val entries = entriesOf(spark, dir, version)
    val hit = entries.filter { e =>
      bounds.forall { case (c, lo, hi) =>
        e.stats.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
      } && strBounds.forall { case (c, lo, hi) =>
        e.sstats.get(c).forall { case (mn, mx) =>
          utf8Compare(mx, lo) >= 0 && utf8Compare(mn, hi) <= 0 }
      }
    }
    if (hit.isEmpty) {
      val schema = read(spark, dir, version).schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      val dropped = droppedColumns(spark, dir)
        .filter(_.since <= version).map(_.name)
      val df0 = readEntries(spark, dir.stripSuffix("/"), hit,
        declaredColumns(spark, dir).filter(_.since <= version))
      val df = if (dropped.isEmpty) df0 else df0.drop(dropped: _*)
      // residual typing shared with readZPrunedK (ZoneResidual): typed
      // bound literals keep parquet pushdown, saturating conversions
      // are refused — two pruning tiers, one plan
      val types = df.schema.map(f => f.name -> f.dataType).toMap
      val residual = (ZoneResidual.numeric(types, bounds) ++
        strBounds.map { case (c, lo, hi) =>
          // Spark string comparison is binary UTF-8 — the same order the
          // sstats pruning above used, so residual and pruning agree
          col(c) >= lit(lo) && col(c) <= lit(hi)
        }).reduce(_ && _)
      df.filter(residual)
    }
  }

  /** A [[readVersionMatchingKeys]] result: the surviving frame plus the
    * prune arithmetic the caller can pin ("the old-side read touched
    * candidateFiles of totalFiles"). */
  final case class KeyPrunedRead(df: DataFrame, candidateFiles: Long,
      totalFiles: Long)

  /** Version-pinned read KEEPING ONLY the files that may contain key
    * tuples from `probe` — mergeByKey's two-tier discovery pruning
    * (manifest zone maps on the probe's per-key [min, max], then the
    * per-file bloom sidecars when the store indexes exactly `keys`)
    * exposed as a read, for consumers that join a small delta against a
    * big stored side (incremental join-view maintenance: the classic
    * A_old ⋈ ΔB leg must NOT read all of A_old). File-granular and
    * conservative: the result may contain non-matching ROWS (the
    * caller's equi-join applies the exact predicate — bloom false
    * positives and zone-map survivors wash out there), never misses a
    * matching one, and an entry without stats or sidecar always
    * survives. Composes with time travel: `version`'s manifest is the
    * file universe, so the read is exact against that snapshot. */
  def readVersionMatchingKeys(spark: SparkSession, dir: String,
      version: Long, probe: DataFrame, keys: Seq[String]): KeyPrunedRead = {
    require(keys.nonEmpty, "readVersionMatchingKeys needs key columns")
    val entries = entriesOf(spark, dir, version)
    val bounds = deltaKeyBounds(probe, keys)
    val strBounds = deltaKeyStrBounds(probe, keys)
    val zm = entries.filter(e =>
      !statsDisjoint(e, bounds) && !sstatsDisjoint(e, strBounds))
    val candidates =
      if (bloomIndexKeys(spark, dir).contains(keys))
        deltaKeyHashes(probe, keys).map(bloomPrune(spark, dir, zm, _))
          .getOrElse(zm)
      else zm
    val declared = declaredColumns(spark, dir).filter(_.since <= version)
    val dropped = droppedColumns(spark, dir).filter(_.since <= version).map(_.name)
    val base =
      if (candidates.nonEmpty)
        readEntries(spark, dir.stripSuffix("/"), candidates, declared)
      else if (entries.nonEmpty) // all pruned: empty frame in THIS version's schema
        readEntries(spark, dir.stripSuffix("/"), entries, declared).limit(0)
      else emptyVersion(spark, dir, version, declared)
    val df = if (dropped.isEmpty) base else base.drop(dropped: _*)
    KeyPrunedRead(df, candidates.size.toLong, entries.size.toLong)
  }

  /** The table's commit history as a metadata frame — (version, n_files,
    * n_rows, committed), resolved entirely from manifests plus the
    * pointer: zero data I/O, the DESCRIBE HISTORY surface a snapshot
    * consumer audits retention and pin-by-version decisions against. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val committed = latestVersion(spark, dir)
    versions(spark, dir)
      .map { v =>
        val es = entriesOf(spark, dir, v)
        (v, es.size.toLong, es.map(_.rows).sum, committed.contains(v))
      }
      .toDF("version", "n_files", "n_rows", "committed")
  }

  /** Manifest-only row count — the statistic a planner would use; zero
    * data I/O. */
  def rowCount(spark: SparkSession, dir: String, version: Long): Long =
    readManifest(fs(spark, dir), dir, version)
      .map(_.map(_.rows).sum)
      .getOrElse(throw new IllegalStateException(s"no manifest for $version"))

  /** Row-level DELETE as copy-on-write at FILE granularity — the
    * right-to-be-forgotten operation a 100 TB lake needs without
    * rewriting the table. Two passes:
    *
    *   1. one column-pruned, predicate-pushed scan finds WHICH files
    *      contain matching rows (`input_file_name` + distinct — for a
    *      selective predicate over a clustered layout this prunes to a
    *      handful of files via row-group stats);
    *   2. only those files are rewritten minus the matching rows; every
    *      untouched file is carried into the new manifest BY REFERENCE.
    *
    * The new version's manifest drops the rewritten files' old entries,
    * so [[removedEntries]] is nonempty across the delete — incremental
    * consumers (the materialized views) detect the rewrite and restate
    * rather than double-count, with no coupling to this code. Older
    * versions keep reading the pre-image files until [[vacuum]].
    * Returns the current version unchanged when nothing matches (no
    * empty commit). */
  def deleteWhere(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column,
      partitionCols: Seq[String] = Nil,
      pruneBounds: Seq[(String, Double, Double)] = Nil,
      pruneStrBounds: Seq[(String, String, String)] = Nil): Long = {
    val cur = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"nothing to delete under $dir"))
    val entries = entriesOf(spark, dir, cur)
    requireShape(entries, partitionCols, "deleteWhere")
    // `pruneBounds`/`pruneStrBounds` are the caller's PROMISE that every
    // predicate-matching row lies inside the box (e.g. the predicate IS a
    // range on a clustered key): files whose manifest zone maps are
    // disjoint from it skip the discovery scan entirely, so a selective
    // DELETE reads candidate files only — KB-scale metadata decides, like
    // readWhere. Empty bounds (default) preserve the exact full discovery.
    val (candidates, skipped) = entries.partition(e =>
      !statsDisjoint(e, pruneBounds) && !sstatsDisjoint(e, pruneStrBounds))
    lastDiscoveryCandidates = candidates
    // discovery and the survivor read run at the CURRENT schema
    // (readEntriesCurrent): the predicate may target a declared column,
    // and the rewritten files must materialize the declared defaults —
    // a raw physical read here would store NULL where the default
    // belonged for every surviving pre-declaration row
    val (rewritten, keptCand) =
      if (candidates.isEmpty) (Nil, Nil)
      else splitTouched(candidates,
        touchedFiles(readEntriesCurrent(spark, dir, candidates).filter(predicate)))
    val kept = skipped ++ keptCand
    if (rewritten.isEmpty) return cur
    // delete exactly where the predicate is TRUE: a NULL evaluation must
    // KEEP the row (plain !predicate would silently drop it)
    val survivors = readEntriesCurrent(spark, dir, rewritten).filter(
      org.apache.spark.sql.functions.not(org.apache.spark.sql.functions.coalesce(
        predicate, org.apache.spark.sql.functions.lit(false))))
    commitRewrite(spark, dir, cur, kept, survivors, partitionCols)
  }

  /** The partitioning-shape guard every writer shares ([[appendDelta]]'s
    * rule applied to the rewriting DML too): a rewrite called without
    * the table's partitionCols would commit a manifest mixing
    * partitioned and unpartitioned entries — bricking every later
    * partition-shaped writer — and one called WITH partitionCols on an
    * unpartitioned table would do the inverse. */
  private def requireShape(entries: Seq[Entry], partitionCols: Seq[String],
      op: String): Unit = {
    require(entries.isEmpty ||
        entries.forall(_.partition.isDefined) == partitionCols.nonEmpty,
      s"$op must keep the table's partitioning shape: pass the table's " +
        "partitionCols for a partitioned store (and none for an " +
        "unpartitioned one) — a mixed-shape manifest breaks the union read")
    // COLUMN-level check: the stored hive specs carry the partition
    // column NAMES (`p=0/q=1`), so a writer partitioning by different
    // columns than the table's is refused outright — admitted, its rows
    // would read the table's partition column as NULL through the
    // allowMissingColumns union (hive escaping never puts '=' in the
    // name side, so the prefix parse is exact)
    entries.flatMap(_.partition)
      .map(_.split('/').toSeq.map(_.takeWhile(_ != '=')))
      .distinct.foreach { cols =>
        require(cols == partitionCols,
          s"$op must keep the table's partition columns " +
            s"(${cols.mkString(", ")}); got (${partitionCols.mkString(", ")}) " +
            "— evolve the layout explicitly with repartitionData instead")
      }
  }

  /** The qualified file names `df`'s rows come from — the COW
    * touched-file discovery (one predicate-pushed / semi-joined scan). */
  private def touchedFiles(df: DataFrame): Set[String] =
    df.select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().collect().map(_.getString(0)).toSet

  /** True when `e`'s manifest zone maps PROVE no row can satisfy every
    * bound: some bound column has stats on the file and the ranges are
    * disjoint. An entry lacking stats for a bound column is never
    * excluded — stats-missing discipline shared with [[readWhere]]. */
  private def statsDisjoint(e: Entry,
      bounds: Seq[(String, Double, Double)]): Boolean =
    bounds.exists { case (c, lo, hi) =>
      e.stats.get(c).exists { case (mn, mx) => mx < lo || mn > hi }
    }

  /** String twin of [[statsDisjoint]] over the `sstats` zone maps,
    * compared in unsigned UTF-8 order (Spark's string order). */
  private def sstatsDisjoint(e: Entry,
      bounds: Seq[(String, String, String)]): Boolean =
    bounds.exists { case (c, lo, hi) =>
      e.sstats.get(c).exists { case (mn, mx) =>
        utf8Compare(mx, lo) < 0 || utf8Compare(mn, hi) > 0 }
    }

  /** Per-key-column string [min, max] of the delta for StringType keys —
    * the sstats-side twin of [[deltaKeyBounds]]. Spark's min/max on
    * strings use the same binary UTF-8 order the sstats carry. */
  private def deltaKeyStrBounds(delta: DataFrame,
      keys: Seq[String]): Seq[(String, String, String)] = {
    import org.apache.spark.sql.functions.{col, max, min}
    val strKeys = delta.schema
      .filter(f => keys.contains(f.name))
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name)
    if (strKeys.isEmpty) Nil
    else {
      val aggs = strKeys.flatMap(k =>
        Seq(min(col(k)).as(s"mn_$k"), max(col(k)).as(s"mx_$k")))
      val row = delta.agg(aggs.head, aggs.tail: _*).head()
      strKeys.flatMap { k =>
        val mn = row.getAs[String](s"mn_$k")
        val mx = row.getAs[String](s"mx_$k")
        if (mn == null || mx == null) None else Some((k, mn, mx))
      }
    }
  }

  /** Per-key-column [min, max] of the delta, for the numeric key types
    * the zone maps cover — one tiny aggregate over the (small by
    * construction) delta side. Bounds are widened a ULP each way: the
    * long→double conversion both here and in the manifests rounds to
    * nearest, and pruning must never exclude a file on a rounding
    * artifact. Non-numeric keys contribute no bound (those columns
    * simply cannot prune). */
  private def deltaKeyBounds(delta: DataFrame,
      keys: Seq[String]): Seq[(String, Double, Double)] = {
    import org.apache.spark.sql.functions.{col, max, min}
    import org.apache.spark.sql.types._
    val numericKeys = delta.schema
      .filter(f => keys.contains(f.name))
      .filter(_.dataType match {
        case LongType | IntegerType | ShortType | ByteType |
             DoubleType | FloatType => true
        case _ => false
      })
      .map(_.name)
    if (numericKeys.isEmpty) Nil
    else {
      val aggs = numericKeys.flatMap(k => Seq(
        min(col(k).cast("double")).as(s"mn_$k"),
        max(col(k).cast("double")).as(s"mx_$k")))
      val row = delta.agg(aggs.head, aggs.tail: _*).head()
      numericKeys.flatMap { k =>
        val mn = row.getAs[Any](s"mn_$k")
        val mx = row.getAs[Any](s"mx_$k")
        if (mn == null || mx == null) None
        else Some((k,
          math.nextDown(mn.asInstanceOf[Double]),
          math.nextUp(mx.asInstanceOf[Double])))
      }
    }
  }

  /** Diagnostics: the manifest entries the LAST rewriting operation's
    * touched-file discovery actually scanned (after metadata pruning) —
    * lets specs pin that a selective DML read candidate files only,
    * never the whole table. Same-thread read-after-call use only. */
  private[graft] var lastDiscoveryCandidates: Seq[Entry] = Nil

  // -------------------------------------------------------- BLOOM SIDECARS
  // Zone maps prune DML discovery by numeric RANGE; a string-keyed table
  // (wallet addresses — the reference's primary key shape) gets nothing
  // from them. Per-FILE Bloom filters answer "might this file contain
  // THIS key" for any type: enabling the index on a store makes every
  // subsequent version write one bloom row per fresh data file (a
  // `_bloom/` parquet sidecar, one distributed aggregate pass over the
  // files just written), and mergeByKey consults the sidecars to drop
  // files that provably contain none of the delta's keys BEFORE the
  // discovery scan. The high-value case is the chain-shaped one: an
  // append chain keeps each batch's keys in that batch's files, so a
  // MERGE updating recent entities prunes to the recent versions'
  // files — undoable by any range statistic. Safety mirrors the zone
  // maps: a file without a sidecar row is never pruned, an oversized
  // delta key set (> the driver-probe cap) skips bloom pruning, and the
  // exact semi join downstream removes bloom false positives.

  private val BloomKeysFile = "_bloom_keys"
  private val BloomDirName = "_bloom"

  /** Driver-side probe cap: above this many distinct delta keys the
    * bloom pruning pass is skipped (the probe set rides in the task
    * closure; a huge delta also touches ~everything anyway). */
  private val BloomProbeCap = 1 << 16

  /** Declare the store's bloom-indexed key columns. Versions written
    * AFTER this call carry sidecars; earlier files simply never prune
    * (stats-missing discipline). One declaration per store — re-calls
    * must agree (changing the key set would silently disable pruning
    * for mismatched merges, so it fails loudly instead). */
  def enableBloomIndex(spark: SparkSession, dir: String, keys: Seq[String],
      expectedKeysPerFile: Long = 1 << 20, fpp: Double = 0.01): Unit = {
    require(keys.nonEmpty, "enableBloomIndex needs at least one key column")
    val hfs = fs(spark, dir)
    bloomIndexKeys(spark, dir).foreach { existing =>
      require(existing == keys,
        s"bloom index already declared on $existing; cannot redeclare as $keys")
      return
    }
    val p = new Path(s"${dir.stripSuffix("/")}/$BloomKeysFile")
    hfs.mkdirs(p.getParent)
    val body = keys.map(k => "\"" + esc(k) + "\"")
      .mkString(s"""{"keys":[""", ",", s"""],"items":$expectedKeysPerFile,"fpp":$fpp}""")
    val out = hfs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** The declared bloom key columns, or None (no index). */
  def bloomIndexKeys(spark: SparkSession, dir: String): Option[Seq[String]] =
    bloomIndexDecl(spark, dir).map(_._1)

  private def bloomIndexDecl(spark: SparkSession,
      dir: String): Option[(Seq[String], Long, Double)] = {
    val hfs = fs(spark, dir)
    val p = new Path(s"${dir.stripSuffix("/")}/$BloomKeysFile")
    if (!hfs.exists(p)) None
    else try {
      val in = hfs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val keys = """"((?:[^"\\]|\\.)+)"""".r.findAllMatchIn(
        txt.substring(txt.indexOf('['), txt.indexOf(']'))).map(_.group(1)).toSeq
      val items = """"items":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        .getOrElse(1L << 20)
      val fpp = """"fpp":([0-9.]+)""".r.findFirstMatchIn(txt).map(_.group(1).toDouble)
        .getOrElse(0.01)
      if (keys.isEmpty) None else Some((keys, items, fpp))
    } catch { case _: Exception => None } // torn declaration: no pruning
  }

  /** Build the bloom sidecar for a freshly written version dir: one row
    * per data file — (lake-relative path, serialized bloom over the
    * xxhash64'd key tuple). Skipped silently when any declared key
    * column is absent from the files (a schema-evolution delta written
    * before the column existed cannot be indexed — those files just
    * never prune). */
  private def writeBloomSidecar(spark: SparkSession, dir: String,
      entries: Seq[Entry]): Unit =
    bloomIndexDecl(spark, dir).foreach { case (keys, items, fpp) =>
      if (entries.isEmpty) return
      val base = dir.stripSuffix("/")
      val df = readEntries(spark, base, entries)
      if (!keys.forall(df.columns.contains(_))) return
      BloomSkipping.register(spark)
      import org.apache.spark.sql.functions.{col => c, input_file_name, xxhash64, substring_index, concat, lit => flit}
      val vdir = entries.head.path.split('/').take(2).mkString("/")
      // Sidecar rows key by the LAKE-RELATIVE entry path, not the bare
      // part-file name: a dynamically-partitioned write emits the SAME
      // part-NNNNN-<uuid> name into every partition dir it touches, so a
      // bare-name key would let one file's bloom reject prune its
      // same-named sibling that does hold probe keys (silent duplicate
      // keys after mergeByKey). input_file_name()'s URI qualification
      // varies by filesystem; the suffix after the store's own
      // "/data/d-" marker is qualification-independent and (hive
      // partition values being escaped) unambiguous.
      val sidecar = df
        .groupBy(input_file_name().as("file"))
        .agg(org.apache.spark.sql.functions.call_function("bloom_agg",
          xxhash64(keys.map(c): _*),
          org.apache.spark.sql.functions.lit(items),
          org.apache.spark.sql.functions.lit(
            org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp)))
          .as("bloom"))
        .withColumn("file",
          concat(flit("data/d-"), substring_index(c("file"), "/data/d-", -1)))
      sidecar.write.mode(SaveMode.Overwrite)
        .parquet(s"$base/$BloomDirName/${vdir.split('/').last}.parquet")
    }

  /** Bloom-sidecar candidate pruning for a key-tuple probe: drop entries
    * whose sidecar bloom provably contains none of `hashedProbes`.
    * Entries without a sidecar row are always kept. The decision runs
    * DISTRIBUTED over the sidecar rows (per-file blooms deserialize in
    * tasks, only file names travel back), same shape as
    * [[BloomSkipping.pruneDecision]]. */
  private def bloomPrune(spark: SparkSession, dir: String,
      entries: Seq[Entry], hashedProbes: Array[Long]): Seq[Entry] = {
    val base = dir.stripSuffix("/")
    val hfs = fs(spark, dir)
    val bdir = new Path(s"$base/$BloomDirName")
    if (!hfs.exists(bdir)) return entries
    import spark.implicits._
    val rejected: Set[String] =
      try {
        spark.read.parquet(s"$base/$BloomDirName/*.parquet")
          .select("file", "bloom").as[(String, Array[Byte])]
          .mapPartitions { it =>
            it.flatMap { case (file, bytes) =>
              val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
                new java.io.ByteArrayInputStream(bytes))
              if (hashedProbes.exists(bf.mightContainLong)) None else Some(file)
            }
          }.collect().toSet
      } catch { case _: Exception => return entries } // torn sidecar: keep all
    // New sidecars key by lake-relative path (exact match); sidecars
    // written before the path-keying fix hold bare part-file names — a
    // bare-name rejection is honored only when the name maps to exactly
    // ONE live entry (ambiguous names stay un-pruned: keeping a file the
    // bloom could have dropped costs a scan, pruning the wrong sibling
    // costs silent duplicate keys).
    val bareCounts = entries.groupBy(_.path.split('/').last)
      .view.mapValues(_.size).toMap
    entries.filterNot { e =>
      val bare = e.path.split('/').last
      rejected.contains(e.path) ||
        (rejected.contains(bare) && bareCounts(bare) == 1)
    }
  }

  /** The delta's distinct xxhash64'd key tuples, when they fit the
    * driver-probe cap — None (skip bloom pruning) beyond it. */
  private def deltaKeyHashes(delta: DataFrame,
      keys: Seq[String]): Option[Array[Long]] = {
    import org.apache.spark.sql.functions.{col => c, xxhash64}
    val rows = delta.select(xxhash64(keys.map(c): _*).as("h"))
      .distinct().limit(BloomProbeCap + 1).collect()
    if (rows.length > BloomProbeCap) None
    else Some(rows.map(_.getLong(0)))
  }

  /** Split a manifest on membership in a touched-file set: (rewritten,
    * kept-by-reference). Matching is by lake-relative path suffix —
    * unique within a store. */
  private def splitTouched(entries: Seq[Entry],
      touched: Set[String]): (Seq[Entry], Seq[Entry]) =
    entries.partition(e => touched.exists(_.endsWith("/" + e.path)))

  /** The shared COW commit tail: write `data` as the new version's
    * files, manifest = kept-by-reference ++ fresh entries. Rewriting
    * versions must NOT rebase — their kept/rewritten split was derived
    * from a specific committed state — so a slot conflict surfaces as a
    * ConcurrentModificationException for the caller to re-run. */
  private def commitRewrite(spark: SparkSession, dir: String, base: Long,
      kept: Seq[Entry], data: DataFrame, partitionCols: Seq[String]): Long = {
    onBeforeRewriteCommit()
    val hfs = fs(spark, dir)
    val newEntries = writeDataFiles(data, dir, nextSlot(hfs, dir), partitionCols)
    // the COW output is uncommitted and uniquely OURS until the loop
    // returns: a refused rewrite (the DESIGNED conflict path) or an
    // exhausted loop must reclaim it rather than leak a table-scale
    // orphan per retry
    commitCleanly(hfs, dir, newEntries)(
      commitLoop(hfs, dir, _ => kept ++ newEntries, expectedBase = Some(base)))
  }

  /** Run a commit loop; if it THROWS (conflict, exhausted slots), the
    * fresh data files were never referenced by any manifest — delete the
    * writer's own version dir (and sidecar) before propagating, so
    * failed commits cannot leak storage. */
  private def commitCleanly(hfs: FileSystem, dir: String,
      fresh: Seq[Entry])(commit: => Long): Long =
    try commit
    catch { case e: Throwable => deleteWriterDir(hfs, dir, fresh); throw e }

  /** Remove one writer's uncommitted version dir and its bloom sidecar. */
  private def deleteWriterDir(hfs: FileSystem, dir: String,
      entries: Seq[Entry]): Unit =
    entries.headOption.foreach { e =>
      val vdir = e.path.split('/').take(2).mkString("/")
      val base = dir.stripSuffix("/")
      hfs.delete(new Path(s"$base/$vdir"), true)
      hfs.delete(new Path(
        s"$base/$BloomDirName/${vdir.split('/').last}.parquet"), true): Unit
    }

  /** Test seam: runs after a rewriting operation finished its
    * touched-file discovery and before its commit — lets specs land a
    * concurrent commit deterministically inside the conflict window. */
  private[graft] var onBeforeRewriteCommit: () => Unit = () => ()

  /** Row-level UPDATE as copy-on-write at file granularity — same
    * touched-file discovery as [[deleteWhere]], but the rewritten files
    * keep every row, applying `sets` where the predicate is TRUE. All
    * set expressions read the PRE-image (simultaneous assignment, the
    * SQL UPDATE semantics — one select, not a fold of withColumns), so
    * `a -> b, b -> a` swaps. Set columns must already exist (UPDATE
    * never changes the schema — that is [[appendDelta]]'s evolution
    * path). Returns the current version when nothing matches. */
  def updateWhere(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      partitionCols: Seq[String] = Nil,
      pruneBounds: Seq[(String, Double, Double)] = Nil,
      pruneStrBounds: Seq[(String, String, String)] = Nil): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, when, col}
    val cur = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"nothing to update under $dir"))
    val entries = entriesOf(spark, dir, cur)
    requireShape(entries, partitionCols, "updateWhere")
    // same caller contract as deleteWhere's pruneBounds: predicate ⇒ box
    val (candidates, skipped) = entries.partition(e =>
      !statsDisjoint(e, pruneBounds) && !sstatsDisjoint(e, pruneStrBounds))
    lastDiscoveryCandidates = candidates
    // current-schema reads, like deleteWhere: sets/predicate may target
    // declared columns, and the rewrite must materialize defaults
    val (rewritten, keptCand) =
      if (candidates.isEmpty) (Nil, Nil)
      else splitTouched(candidates,
        touchedFiles(readEntriesCurrent(spark, dir, candidates).filter(predicate)))
    val kept = skipped ++ keptCand
    if (rewritten.isEmpty) return cur
    val src = readEntriesCurrent(spark, dir, rewritten)
    val setMap = sets.toMap
    val unknown = setMap.keySet -- src.columns.toSet
    require(unknown.isEmpty, s"updateWhere sets unknown columns: $unknown")
    val cond = coalesce(predicate, lit(false))
    val updated = src.select(src.columns.toSeq.map { c =>
      setMap.get(c).map(e => when(cond, e).otherwise(col(c)).as(c)).getOrElse(col(c))
    }: _*)
    // UPDATE never changes the schema: a set expression that COERCES the
    // column (when/otherwise widening long -> double, say) would commit a
    // version whose files disagree with the kept ones and brick the
    // union read — the retype class appendDelta refuses, refused here too
    src.schema.zip(updated.schema).foreach { case (a, b) =>
      if (a.dataType != b.dataType)
        throw new IllegalArgumentException(
          s"updateWhere refuses to retype column '${a.name}': " +
            s"stored ${a.dataType}, set expression yields ${b.dataType}")
    }
    commitRewrite(spark, dir, cur, kept, updated, partitionCols)
  }

  /** MERGE by key as copy-on-write — the Iceberg/Delta MERGE INTO shape
    * on the snapshot store: rows whose `keys` appear in `delta` are
    * REPLACED by the delta's row, unseen keys are INSERTED, and only
    * the files that contain a matched key are rewritten (touched-file
    * discovery is a semi join against the delta's distinct key set —
    * at scale the runtime filter the optimizer derives from the small
    * side prunes the probe scan). Untouched files carry by reference;
    * a pure-insert delta rewrites nothing and appends like
    * [[appendDelta]]. The rewritten pre-image entries make
    * [[removedEntries]] nonempty, so incremental consumers restate —
    * the same soundness gate every rewriting version trips. */
  def mergeByKey(spark: SparkSession, dir: String, delta: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): Long = {
    require(keys.nonEmpty, "mergeByKey needs at least one key column")
    import org.apache.spark.sql.functions.{col, input_file_name}
    val cur = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"nothing to merge into under $dir"))
    val entries = entriesOf(spark, dir, cur)
    requireShape(entries, partitionCols, "mergeByKey")
    // a delta that RETYPES a stored column would coerce the union below
    // (unionByName inserts widening casts) and commit files disagreeing
    // with the kept ones — refused before anything lands, like appendDelta
    requireNoRetype(spark, dir, entries, delta.schema, partitionCols.toSet, "mergeByKey")
    val keyDf = delta.select(keys.map(col): _*).distinct()
    // Metadata pruning BEFORE the discovery scan: the delta's per-key
    // [min, max] (one tiny aggregate — the delta is the small side by
    // construction) is checked against each file's manifest zone maps,
    // and stats-disjoint files PROVABLY contain no matching key tuple —
    // a disjoint range on ANY key column rules the whole tuple out. On a
    // key-clustered table (compactDataSorted) a narrow-band MERGE then
    // reads candidate files only instead of the whole table; derived
    // internally from the delta, the bounds are always sound (unlike
    // deleteWhere's caller-promised box). Files without stats for a key
    // column always remain candidates.
    val bounds = deltaKeyBounds(delta, keys)
    val strBounds = deltaKeyStrBounds(delta, keys)
    val zmCandidates = entries.filter(e =>
      !statsDisjoint(e, bounds) && !sstatsDisjoint(e, strBounds))
    // second pruning tier, for the key shapes zone maps are blind to
    // (string keys, sparse point sets inside every file's hull): the
    // per-file bloom sidecars, when the store declared this key set.
    // Bounded-driver contract: the probe set is the delta's DISTINCT key
    // hashes up to a cap — an over-cap delta skips this tier (it touches
    // ~everything anyway). The exact semi join below removes bloom false
    // positives; false negatives are impossible, and files without a
    // sidecar row are never pruned.
    val candidates =
      if (bloomIndexKeys(spark, dir).contains(keys))
        deltaKeyHashes(delta, keys)
          .map(bloomPrune(spark, dir, zmCandidates, _))
          .getOrElse(zmCandidates)
      else zmCandidates
    val candidatePaths = candidates.map(_.path).toSet
    val skipped = entries.filterNot(e => candidatePaths.contains(e.path))
    lastDiscoveryCandidates = candidates
    // input_file_name() must be captured ON the scan lineage, BEFORE the
    // join (after a shuffle it evaluates empty), so the semi-join path
    // carries the file name through as a column
    val touched =
      if (candidates.isEmpty) Set.empty[String]
      else readEntriesCurrent(spark, dir, candidates)
        .withColumn("_gf", input_file_name())
        .join(keyDf, keys, "left_semi")
        .select("_gf").distinct().collect().map(_.getString(0)).toSet
    val (rewritten, keptCand) = splitTouched(candidates, touched)
    val kept = skipped ++ keptCand
    // both union sides carry the CURRENT schema: the stored side reads
    // through readEntriesCurrent (declared defaults materialized for
    // survivors — a raw read would store NULL where the default
    // belonged), and a delta OMITTING a declared column gets the
    // write-default fill (matching what an appendDelta of the same rows
    // would show at read time)
    val deltaFilled = fillDeclaredCols(spark, dir, delta)
    val newData =
      if (rewritten.isEmpty) deltaFilled
      else readEntriesCurrent(spark, dir, rewritten).join(keyDf, keys, "left_anti")
        .unionByName(deltaFilled, allowMissingColumns = true)
    commitRewrite(spark, dir, cur, kept, newData, partitionCols)
  }

  // ----------------------------------------------------------- MAINTENANCE

  /** OPTIMIZE as a new version: bin-pack the committed file list into
    * ~targetFileMB files (count from actual referenced bytes, like
    * [[Lakehouse.compact]]). Previous versions keep reading their
    * original files; nothing is deleted here.
    *
    * Partitioned tables compact at PARTITION granularity: only
    * partitions fragmented across >1 file are rewritten (coalesced to
    * one file per partition); single-file partitions — the already-
    * compact bulk of a large table — carry by reference, so the write
    * amplification is proportional to the fragmentation, not the
    * table. Returns the current version when nothing is fragmented. */
  def compactData(spark: SparkSession, dir: String,
      targetFileMB: Int = 256, partitionCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.col
    val hfs = fs(spark, dir)
    val cur = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"nothing to compact under $dir"))
    val entries = entriesOf(spark, dir, cur)
    val base = dir.stripSuffix("/")
    if (partitionCols.nonEmpty) {
      val byPart = entries.groupBy(_.partition)
      val fragmented = byPart.filter(_._2.size > 1).values.flatten.toSeq
      if (fragmented.isEmpty) return cur
      val kept = byPart.filter(_._2.size <= 1).values.flatten.toSeq
      // current-schema read, like the unpartitioned branch's read():
      // compaction materializes declared defaults and drops dropped
      // columns' bytes for the rewritten partitions
      val packed = readEntriesCurrent(spark, dir, fragmented)
        .repartition(partitionCols.map(col): _*)
      commitRewrite(spark, dir, cur, kept, packed, partitionCols)
    } else {
      // refuse the silent layout change: compacting a PARTITIONED store
      // without partitionCols would flatten its hive partition columns
      // into plain data columns and break every later partition-shaped
      // writer — the same guard compactDataSorted carries
      require(entries.forall(_.partition.isEmpty),
        "compactData without partitionCols applies to unpartitioned " +
          "tables; pass the table's partitionCols to compact a " +
          "partitioned store")
      val bytes = entries.map(e => hfs.getFileStatus(new Path(s"$base/${e.path}")).getLen).sum
      val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt)
      val packed = read(spark, dir, cur).repartition(nFiles)
      commitRewrite(spark, dir, cur, Nil, packed, Nil)
    }
  }

  /** RESTORE (Delta's RESTORE TABLE / Iceberg's rollback) as a FORWARD
    * commit: the new version's manifest is the target version's file
    * list verbatim — metadata-only, no data moves, O(manifest) cost.
    * History is preserved (the bad versions stay time-travelable until
    * vacuum; an undo of the undo is another restore), which is why this
    * is not a pointer rewind: rewinding would re-open the slots the bad
    * versions burned and lose the audit trail. The target's files must
    * still exist (vacuum may have reclaimed an expired version — checked
    * against the live reference set here, fail-before-commit).
    * expectedBase semantics like every rewrite-shaped commit: the table
    * moving underneath raises ConcurrentModificationException.
    * Incremental (CDC) consumers see a rewriting version and restate. */
  def restore(spark: SparkSession, dir: String, toVersion: Long): Long = {
    val hfs = fs(spark, dir)
    val cur = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"nothing to restore under $dir"))
    require(toVersion <= cur, s"restore target $toVersion is ahead of $cur")
    if (toVersion == cur) return cur
    val target = readManifest(hfs, dir, toVersion).getOrElse(
      sys.error(s"restore target version $toVersion has no parseable " +
        s"manifest under $dir (vacuumed or never committed)"))
    val base = dir.stripSuffix("/")
    val missing = target.filterNot(e => hfs.exists(new Path(s"$base/${e.path}")))
    require(missing.isEmpty,
      s"restore target $toVersion references ${missing.size} reclaimed " +
        s"file(s) (e.g. ${missing.head.path}) — the version expired; " +
        "restore from a tagged or retained version instead")
    commitLoop(hfs, dir, _ => target, expectedBase = Some(cur))
  }

  /** PARTITION EVOLUTION as a version: rewrite the committed snapshot
    * into a new hive-partition layout — including to or from
    * unpartitioned — Iceberg's partition-spec change, realized as a full
    * copy-on-write rewrite because this lake's layout lives in PATHS
    * (there is no field-id indirection to relabel in place). Content is
    * identical (any read is the oracle); TIME TRAVEL keeps old layouts
    * because every version reads exactly its own manifest, so no union
    * ever mixes shapes. The cross-version shape guard binds WRITERS to
    * the current layout, which is precisely what changes here: appends
    * after this commit must carry the NEW partitionCols and old-shape
    * deltas are refused — the partition-pruning contract downstream
    * consumers plan against moves atomically with the data.
    *
    * Going partitioned → unpartitioned (or changing columns) keeps the
    * old partition column as a DATA column: [[read]] recovers partition
    * values from the hive paths before the rewrite, so nothing is lost —
    * with the documented convention that a path-recovered column is
    * string-typed. Same conflict contract as every rewrite: expectedBase
    * CME when the table moved; like OPTIMIZE, the rewrite also
    * materializes declared defaults and drops dropped columns' bytes.
    * Incremental (CDC) consumers see a rewriting version (removedEntries
    * nonempty) and restate, exactly as they do across compaction. */
  def repartitionData(spark: SparkSession, dir: String,
      newPartitionCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    val cur = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"nothing to repartition under $dir"))
    val df = read(spark, dir, cur)
    val missing = newPartitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"repartitionData: partition column(s) ${missing.mkString(", ")} " +
        s"not in the table's schema (${df.columns.mkString(", ")})")
    require(newPartitionCols.size < df.columns.length,
      "repartitionData: at least one data column must remain")
    val packed =
      if (newPartitionCols.nonEmpty) df.repartition(newPartitionCols.map(col): _*)
      else df
    commitRewrite(spark, dir, cur, Nil, packed, newPartitionCols)
  }

  /** OPTIMIZE + CLUSTER as a version: bin-pack the committed file list
    * into ~targetFileMB files RANGE-CLUSTERED on `sortCols` — after an
    * append chain scatters a key across every delta's files, one sorted
    * compaction restores the layout where [[readWhere]]'s manifest zone
    * maps (and the engine's footer pruning) skip almost everything.
    * Same versioning contract as [[compactData]]: content identical
    * (the oracle for any read), older versions keep their files until
    * [[vacuum]]. Unpartitioned tables only — partition dirs already
    * bound file shape. */
  def compactDataSorted(spark: SparkSession, dir: String,
      sortCols: Seq[String], targetFileMB: Int = 256,
      numFiles: Option[Int] = None): Long = {
    require(sortCols.nonEmpty, "sorted compaction needs cluster columns")
    import org.apache.spark.sql.functions.col
    val hfs = fs(spark, dir)
    val cur = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"nothing to compact under $dir"))
    val entries = entriesOf(spark, dir, cur)
    require(entries.forall(_.partition.isEmpty),
      "sorted compaction applies to unpartitioned tables")
    val base = dir.stripSuffix("/")
    val bytes = entries.map(e => hfs.getFileStatus(new Path(s"$base/${e.path}")).getLen).sum
    val nFiles = numFiles.getOrElse(
      math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt))
    val packed = read(spark, dir, cur)
      .repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val newEntries = writeDataFiles(packed, dir, nextSlot(hfs, dir), Nil)
    commitCleanly(hfs, dir, newEntries)(
      commitLoop(hfs, dir, _ => newEntries, expectedBase = Some(cur)))
  }

  /** Reclaim: drop all but the newest `keep` versions' manifests, then
    * delete the data files no KEPT manifest references — reference
    * counting across manifests, so a file shared by any kept version
    * survives. Returns (dropped versions, deleted data files). */
  // ------------------------------------------------------------------ TAGS

  private def tagPath(dir: String, name: String): Path =
    new Path(s"${dir.stripSuffix("/")}/tags/$name")

  private def validTagName(name: String): Boolean =
    name.nonEmpty && name.length <= 64 &&
      name.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-')

  /** Pin `version` under an immutable name (Iceberg-style tag — "the
    * snapshot run X trained on"). A tag is one marker file naming the
    * version; tagged versions are EXEMPT from [[vacuum]]'s retention
    * window, so the pin means something: the bytes a tag names stay
    * readable until [[untag]]. Tags are immutable by design — re-tagging
    * an existing name is refused (a release pin that silently moves is
    * worse than no pin); delete-then-retag is the explicit two-step. */
  def tag(spark: SparkSession, dir: String, name: String, version: Long): Unit = {
    require(validTagName(name),
      s"tag name must be 1-64 chars of [A-Za-z0-9._-]: '$name'")
    val hfs = fs(spark, dir)
    require(readManifest(hfs, dir, version).isDefined,
      s"cannot tag version $version: no parseable manifest")
    require(Markers.read(spark, tagPath(dir, name)).isEmpty,
      s"tag '$name' already exists (tags are immutable; untag first)")
    Markers.write(spark, tagPath(dir, name), version.toString)
  }

  /** Resolve a tag to its pinned version (None if absent/torn). */
  def tagVersion(spark: SparkSession, dir: String, name: String): Option[Long] =
    Markers.read(spark, tagPath(dir, name)).flatMap(_.trim.toLongOption)

  /** Read the snapshot a tag pins — exactly [[read]] at the tag's version. */
  def readTag(spark: SparkSession, dir: String, name: String): DataFrame = {
    val v = tagVersion(spark, dir, name)
      .getOrElse(sys.error(s"unknown tag '$name'"))
    read(spark, dir, v)
  }

  /** Drop a tag; the version it pinned becomes vacuumable again. */
  def untag(spark: SparkSession, dir: String, name: String): Unit =
    fs(spark, dir).delete(tagPath(dir, name), false): Unit

  /** All tags as (name, version), torn markers skipped. */
  def tags(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val hfs = fs(spark, dir)
    val root = new Path(s"${dir.stripSuffix("/")}/tags")
    if (!hfs.exists(root)) Seq.empty
    else hfs.listStatus(root).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .flatMap(n => tagVersion(spark, dir, n).map(n -> _))
      .sortBy(_._1)
  }

  // -------------------------------------------- WRITE-AUDIT-PUBLISH BRANCHES

  private def branchPath(dir: String, name: String): Path =
    new Path(s"${dir.stripSuffix("/")}/branches/$name")

  /** Stage `df` as an append on an isolated branch — the WRITE half of
    * write-audit-publish: the data files land in the table's data layout
    * (written once — publish moves METADATA only), but the branch's
    * manifest lives OUTSIDE the version chain, so `readLatest`, time
    * travel, CDC and every other main-line reader cannot see the rows
    * until [[publishBranch]]. The branch marker records the parent
    * version it extends plus the full entry list (parent's entries + the
    * staged files) in the standard manifest wire form.
    *
    * Same writer guards as [[appendDelta]] — a branch must not be the
    * side door past partition-shape, dropped-name, or declared-type
    * contracts (the audit step would pass and publish would land the
    * violation on main). */
  def stageBranch(spark: SparkSession, dir: String, name: String,
      df: DataFrame, partitionCols: Seq[String] = Nil): Long = {
    require(validTagName(name),
      s"branch name must be 1-64 chars of [A-Za-z0-9._-]: '$name'")
    require(Markers.read(spark, branchPath(dir, name)).isEmpty,
      s"branch '$name' already exists (drop or publish it first)")
    val hfs = fs(spark, dir)
    val parent = latestVersion(spark, dir).getOrElse(0L)
    val prev =
      if (parent == 0L) Nil
      else readManifest(hfs, dir, parent).getOrElse(
        sys.error(s"branch parent version $parent is unreadable under $dir"))
    requireShape(prev, partitionCols, "stageBranch")
    requireNoRetype(spark, dir, prev, df.schema, partitionCols.toSet, "stageBranch")
    val fresh = writeDataFiles(df, dir, nextSlot(hfs, dir), partitionCols)
    Markers.write(spark, branchPath(dir, name),
      s"$parent\n${manifestBody(parent, prev ++ fresh)}")
    parent
  }

  /** A branch's (parent version, full entry list); None if absent/torn.
    * Torn markers fail closed like torn manifests — an audit must never
    * pass on a half-written branch. */
  private def branchState(spark: SparkSession, dir: String,
      name: String): Option[(Long, Seq[Entry])] =
    Markers.read(spark, branchPath(dir, name)).flatMap { txt =>
      txt.split("\n", 2) match {
        case Array(p, body) => for {
          parent <- p.trim.toLongOption
          entries <- parseManifest(body, parent)
        } yield (parent, entries)
        case _ => None
      }
    }

  /** (parent version, full staged entry list) of a live branch — the
    * replay-recovery surface for idempotent admission (a crashed
    * publisher's successor decides "did my publish land?" by checking
    * the staged paths against the committed manifest). */
  def branchInfo(spark: SparkSession, dir: String,
      name: String): Option[(Long, Seq[Entry])] =
    branchState(spark, dir, name)

  /** Did a crashed publish of this live branch LAND? The sound replay
    * discriminator behind exactly-once admission
    * (Streams.foreachBatchWapAppend): a subset-of-head probe alone is
    * defeated by a post-publish rewrite (OPTIMIZE/MERGE) that compacted
    * the staged files out of head — the r16 advice's silent-duplicate
    * window. This walks every manifest slot in (parent, head] instead;
    * a staged-FRESH path can enter main ONLY via this branch's publish,
    * so any committed manifest referencing one is positive proof.
    *
    *  - Some(true)  — a committed manifest in (parent, head] references
    *    a fresh path: the publish landed (even if later compacted away).
    *  - Some(false) — every slot in the range is accounted for (Parsed
    *    without fresh paths, Torn = a crashed writer's non-commit, or
    *    Absent-but-burnt by a decl-<v> schema slot) and none references
    *    a fresh path: provably unpublished.
    *  - None — evidence is INCOMPLETE: the branch's parent manifest or a
    *    slot in the range was vacuumed, or a read failed. The caller
    *    must fail loudly, not guess — republishing on a guess is the
    *    duplicate-rows outcome this method exists to prevent.
    *
    * Cost: |head − parent| KB-scale manifest reads, on the replay path
    * only — a crash-recovery window, never the steady-state ingest. */
  def branchPublishEvidence(spark: SparkSession, dir: String,
      name: String): Option[Boolean] = {
    val hfs = fs(spark, dir)
    val (parent, entries) = branchState(spark, dir, name)
      .getOrElse(sys.error(s"unknown or torn branch '$name' under $dir"))
    val parentPaths =
      if (parent == 0L) Some(Set.empty[String])
      else readManifest(hfs, dir, parent).map(_.map(_.path).toSet)
    parentPaths match {
      case None => None // parent manifest gone: fresh is inseparable
      case Some(pp) =>
        val fresh = entries.map(_.path).filterNot(pp).toSet
        if (fresh.isEmpty) return Some(false) // nothing at stake to duplicate
        val head = newestParseable(hfs, dir).getOrElse(0L)
        val sdir = new Path(s"${dir.stripSuffix("/")}/$SchemaDirName")
        var v = parent + 1
        while (v <= head) {
          readManifestState(hfs, dir, v) match {
            case ManifestState.Parsed(es) =>
              if (es.exists(e => fresh(e.path))) return Some(true)
            case ManifestState.Torn => () // fully read garbage: never a commit
            case ManifestState.Absent =>
              // slots are dense except decl-burnt ones (nextSlot skips
              // past decl-<v> schema slots, which never carry a manifest)
              if (!hfs.exists(new Path(sdir, s"decl-$v"))) return None
            case ManifestState.Unreadable => return None
          }
          v += 1
        }
        Some(false)
    }
  }

  /** Read the branch's staged table state — the AUDIT surface: quality
    * gates run their checks against exactly the rows publish would make
    * visible, with main untouched. */
  def readBranch(spark: SparkSession, dir: String, name: String): DataFrame = {
    val (_, entries) = branchState(spark, dir, name)
      .getOrElse(sys.error(s"unknown or torn branch '$name' under $dir"))
    fillDeclaredCols(spark, dir, readFiles(spark, dir, entries))
  }

  /** The PUBLISH half: commit the branch's entry list as the next main
    * version — fast-forward ONLY. The commit loop's expected-base check
    * holds the cross-process commit lock, so a concurrent main-line
    * writer either lands before us (we throw
    * ConcurrentModificationException — the audit ran against a stale
    * base, re-stage against the new head) or after (it rebases onto our
    * published version). No data moves: the staged files are already in
    * place, the publish is one KB-scale manifest commit — the O(1)
    * promotion that makes WAP viable at 100 TB. The branch marker is
    * dropped after the commit by default; a crash between the two leaves
    * a published branch whose marker still exists — re-publishing throws
    * the conflict error (main moved past the parent), and the stale
    * marker is dropped explicitly. Replayable callers that keep their
    * own published-ledger (Streams.foreachBatchWapAppend) pass
    * `dropMarker = false` so the marker outlives the commit until the
    * ledger records the decision — the surviving marker is what lets a
    * replay DETECT the publish instead of duplicating it. */
  def publishBranch(spark: SparkSession, dir: String, name: String,
      dropMarker: Boolean = true): Long = {
    val hfs = fs(spark, dir)
    val (parent, entries) = branchState(spark, dir, name)
      .getOrElse(sys.error(s"unknown or torn branch '$name' under $dir"))
    // parent==0 is NOT exempt from fast-forward: Some(0) makes commitLoop
    // verify the table is STILL empty inside the commit lock, so a
    // concurrent writeFull/appendDelta landing v1 raises the same CME as
    // any base movement instead of being silently superseded (r16 advice)
    val v = commitLoop(hfs, dir, _ => entries, expectedBase = Some(parent))
    if (dropMarker) hfs.delete(branchPath(dir, name), false): Unit
    v
  }

  /** Re-stage a conflicted branch onto the CURRENT head WITHOUT touching
    * its data files — the recovery from a fast-forward publish conflict
    * that doesn't re-run the load: fresh files (the branch's entries
    * minus its recorded parent's) are carried onto the new head's entry
    * list and the branch marker re-written at the new parent. Metadata
    * only, like publish itself. Preconditions fail loudly: the old
    * parent manifest must still parse (otherwise fresh can't be
    * separated from inherited — drop and re-stage from source), and a
    * branch whose fresh files ALREADY sit in the head was published (a
    * crash-surviving marker) — rebasing it would double-reference the
    * rows. No new schema guard is needed: stage checked the fresh files
    * against the declared/dropped contracts, and every main-line writer
    * refuses retypes, so head's schema cannot have diverged in a way the
    * union read doesn't absorb (a column dropped after staging is hidden
    * by readers, the same as any pre-drop version's files). Re-auditing
    * after a rebase is the CALLER's decision — the staged rows are
    * unchanged, but an audit that reads the whole branch state (e.g.
    * drift vs the head) may now see a different base. */
  def rebaseBranch(spark: SparkSession, dir: String, name: String): Long = {
    val hfs = fs(spark, dir)
    val (parent, entries) = branchState(spark, dir, name)
      .getOrElse(sys.error(s"unknown or torn branch '$name' under $dir"))
    val head = latestVersion(spark, dir).getOrElse(0L)
    if (head == parent) return parent
    val parentPaths =
      if (parent == 0L) Set.empty[String]
      else readManifest(hfs, dir, parent).getOrElse(
        sys.error(s"branch '$name' parent manifest $parent is gone " +
          s"(vacuumed?) — cannot separate staged files; drop and re-stage"))
        .map(_.path).toSet
    val fresh = entries.filterNot(e => parentPaths(e.path))
    val headEntries = readManifest(hfs, dir, head).getOrElse(
      sys.error(s"head manifest $head unreadable under $dir"))
    val headPaths = headEntries.map(_.path).toSet
    // ANY fresh path in head proves the branch was published (fresh
    // files enter main only via this branch's publish) — the r15 form
    // required ALL to remain, which a post-publish compaction of just
    // one staged file defeated, letting a rebase double-reference the
    // surviving rows (r16 advice)
    require(!fresh.exists(e => headPaths(e.path)),
      s"branch '$name' was already published (staged file(s) of its are " +
        s"in version $head) — drop the stale marker instead of rebasing")
    Markers.write(spark, branchPath(dir, name),
      s"$head\n${manifestBody(head, headEntries ++ fresh)}")
    head
  }

  /** Abandon a staged branch: the AUDIT-FAILED exit. Metadata-only —
    * the staged data dirs become unreferenced and [[vacuum]]'s age-gated
    * orphan sweep reclaims them (exactly the crashed-writer cleanup
    * path; an explicit eager delete would race a concurrent publish of
    * the same branch). */
  def dropBranch(spark: SparkSession, dir: String, name: String): Unit =
    fs(spark, dir).delete(branchPath(dir, name), false): Unit

  /** All branches as (name, parent version), torn markers skipped. */
  def branches(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val hfs = fs(spark, dir)
    val root = new Path(s"${dir.stripSuffix("/")}/branches")
    if (!hfs.exists(root)) Seq.empty
    else hfs.listStatus(root).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .flatMap(n => branchState(spark, dir, n).map(s => n -> s._1))
      .sortBy(_._1)
  }

  /** Every file path a live branch references — vacuum's extra live set
    * (staged-but-unpublished data must survive both the doomed-version
    * file delete and the data-dir orphan sweep). */
  private def branchReferencedPaths(spark: SparkSession, dir: String): Set[String] = {
    val hfs = fs(spark, dir)
    val root = new Path(s"${dir.stripSuffix("/")}/branches")
    if (!hfs.exists(root)) Set.empty
    else hfs.listStatus(root).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .flatMap(n => branchState(spark, dir, n).toSeq.flatMap(_._2.map(_.path)))
      .toSet
  }

  /** Reclaim unreferenced versions. Retention is COUNT-based (`keep`
    * newest always survive) and, when `maxAgeHours` is set, ALSO
    * time-based: a version outside the keep window still survives while
    * its manifest is younger than the cutoff — Iceberg's
    * expire_snapshots(olderThan, retainLast) and the reference's own
    * 3-day snapshot retention (features_pipeline.py:128-138,
    * ethereum_wallet_features.sql:5-6) expressed on this store. Tagged
    * and declaring versions are exempt from both policies. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 2,
      orphanGraceHours: Int = 6,
      maxAgeHours: Option[Int] = None): (Seq[Long], Int) = {
    require(keep >= 1, "keep at least the committed version")
    val hfs = fs(spark, dir)
    // ONE parse per manifest, shared by every consumer below (the
    // reference set, the doomed list, and the orphan sweep previously
    // re-read each manifest up to four times). Vacuum is the one caller
    // that DELETES based on manifest state, so it reads the classified
    // form: a slot whose read FAILED (vs. read-and-garbage) aborts the
    // whole run — its version may be committed and its files referenced,
    // and proceeding would both compute a reference set missing them
    // (the data-orphan sweep would reap live files) and classify the
    // slot itself as torn debris. Failing loudly costs one maintenance
    // re-run; guessing costs a committed version.
    val states: Seq[(Long, ManifestState)] = versionNames(hfs, dir)
      .map(v => v -> readManifestState(hfs, dir, v))
    val unreadable = states.collect { case (v, ManifestState.Unreadable) => v }
    if (unreadable.nonEmpty)
      throw new IllegalStateException(
        s"vacuum aborted under $dir: manifest slot(s) " +
          s"${unreadable.mkString(", ")} could not be READ (transient IO?) — " +
          "their versions may be committed, so nothing was deleted; re-run " +
          "when the store is reachable")
    val tornSlots = states.collect { case (v, ManifestState.Torn) => v }.toSet
    val manifests: Seq[(Long, Seq[Entry])] =
      states.collect { case (v, ManifestState.Parsed(e)) => v -> e }
    val byV = manifests.toMap
    val all = manifests.map(_._1)
    val pinned = all.lastOption // committed = newest parseable
    // tagged versions are retention-exempt: the whole point of a tag is
    // that the snapshot it names outlives the rolling keep window.
    // DECLARING versions (those named by a decl-<v> schema file) are
    // exempt too: schemaLines honors a declaration only while manifest v
    // exists by name (the crashed-declaration guard), so vacuuming a
    // declaring manifest would silently revert the table's schema — the
    // manifest is KB-scale and schema changes are rare, so keeping it
    // forever costs nothing next to that failure
    val tagged = tags(spark, dir).map(_._2).toSet
    val declaring: Set[Long] = {
      val sdir = new Path(s"${dir.stripSuffix("/")}/$SchemaDirName")
      if (!hfs.exists(sdir)) Set.empty
      else Option(hfs.globStatus(new Path(sdir, "decl-*")))
        .map(_.toSeq).getOrElse(Nil)
        .flatMap(_.getPath.getName.stripPrefix("decl-").toLongOption).toSet
    }
    // time-based retention composes with the count floor: outside the
    // keep window AND (when configured) older than the cutoff — a young
    // version beyond the window still survives until it ages out
    val youngEnough: Long => Boolean = maxAgeHours match {
      case None => _ => false
      case Some(h) =>
        val cutoff = System.currentTimeMillis() - h.toLong * 3600 * 1000
        v => (try hfs.getFileStatus(manifestPath(dir, v)).getModificationTime
          catch { case _: Exception => Long.MaxValue }) >= cutoff
    }
    val doomed = all.dropRight(keep)
      .filterNot(pinned.contains).filterNot(tagged.contains)
      .filterNot(declaring.contains)
      .filterNot(youngEnough)
    val keptVersions = all.filterNot(doomed.contains)
    // live WAP branches extend the reference set: their staged files are
    // unreferenced by any committed manifest by design, and a branch's
    // inherited parent files must stay readable even after the parent
    // version ages out of the keep window
    val branchPaths = branchReferencedPaths(spark, dir)
    val referenced = keptVersions.flatMap(byV(_)).map(_.path).toSet ++ branchPaths
    val base = dir.stripSuffix("/")
    // delete unreferenced files from the DOOMED versions' lists, then
    // their manifests; empty d-<v> dirs go last
    val doomedFiles = doomed
      .flatMap(byV(_))
      .map(_.path).distinct
      .filterNot(referenced.contains)
    doomedFiles.foreach(p => hfs.delete(new Path(s"$base/$p"), false))
    doomed.foreach(v => hfs.delete(manifestPath(dir, v), false))
    val dataRoot = new Path(s"$base/data")
    if (hfs.exists(dataRoot)) {
      // crash-shaped orphans: a writer that died before its commit (or
      // whose cleanup-on-conflict itself crashed) leaves a version dir
      // no manifest references — without a sweep, storage grows
      // unboundedly under concurrency. Referenced = any KEPT manifest's
      // dirs; the sweep is AGE-GATED so an in-flight writer's dir
      // (written, commit pending) is never yanked from under it.
      val referencedDirs = (keptVersions.flatMap(byV(_)).map(_.path) ++
        branchPaths).map(_.split('/')(1)).toSet
      val staleBefore =
        System.currentTimeMillis() - orphanGraceHours.toLong * 3600 * 1000
      hfs.listStatus(dataRoot).foreach { st =>
        val orphan = st.isDirectory &&
          !referencedDirs.contains(st.getPath.getName) &&
          st.getModificationTime < staleBefore
        if (orphan) hfs.delete(st.getPath, true)
        else if (st.isDirectory && hfs.listStatus(st.getPath).isEmpty)
          hfs.delete(st.getPath, false): Unit
      }
    }
    // bloom sidecars of version dirs that no longer exist are unreachable
    // (pruning keys off entry paths) — reclaim them with the data
    val bloomRoot = new Path(s"$base/$BloomDirName")
    if (hfs.exists(bloomRoot))
      hfs.listStatus(bloomRoot).foreach { st =>
        val vdirName = st.getPath.getName.stripSuffix(".parquet")
        if (!hfs.exists(new Path(dataRoot, vdirName)))
          hfs.delete(st.getPath, true)
      }
    // the manifests dir accumulates its own crash debris: abandoned
    // hidden tmp files (a writer that died with a non-IO error before
    // its rename) and TORN manifest slots (unparseable, so never in the
    // doomed list above — versionNames lists them forever and every
    // listing slows). Both are age-gated like the data-dir orphan sweep:
    // an in-flight writer's fresh tmp, or a slot a concurrent committer
    // is mid-renaming into, is never yanked. A slot is torn ONLY when
    // the classified read above POSITIVELY observed garbage content
    // (ManifestState.Torn) — never by mere absence from the parsed set,
    // which the pre-sweep abort on Unreadable guarantees anyway, and
    // never for names that appeared after the classification pass
    // (a fresh concurrent commit is excluded by construction here, not
    // just by the age gate).
    val manifestRoot = new Path(s"$base/manifests")
    if (hfs.exists(manifestRoot)) {
      val staleBefore =
        System.currentTimeMillis() - orphanGraceHours.toLong * 3600 * 1000
      hfs.listStatus(manifestRoot).foreach { st =>
        val n = st.getPath.getName
        val aged = st.getModificationTime < staleBefore
        val tornSlot = n.startsWith("m-") && n.endsWith(".json") &&
          n.stripPrefix("m-").stripSuffix(".json").toLongOption
            .exists(tornSlots.contains)
        if (aged && (n.startsWith(".m-") || tornSlot))
          hfs.delete(st.getPath, false): Unit
      }
    }
    // crashed DECLARATIONS (decl-<v> with no manifest named v — the
    // writer died between the decl write and the manifest create) are
    // ignored by readers and their slot is burned by nextSlot, so they
    // are pure debris; age-gated like the tmp sweep so an in-flight
    // declaration (decl written, manifest rename pending) is never
    // yanked. Sweeping one un-burns its slot, which is safe EXACTLY
    // because the decl no longer exists to spring to life. Successful
    // declarations can never match: their versions are vacuum-exempt
    // above, so their manifests always exist by name.
    val schemaRoot = new Path(s"$base/$SchemaDirName")
    if (hfs.exists(schemaRoot)) {
      val staleBefore =
        System.currentTimeMillis() - orphanGraceHours.toLong * 3600 * 1000
      val liveNames = versionNames(hfs, dir).toSet
      hfs.listStatus(schemaRoot).foreach { st =>
        val n = st.getPath.getName
        val orphanDecl = n.startsWith("decl-") &&
          n.stripPrefix("decl-").toLongOption.exists(v => !liveNames.contains(v))
        if (orphanDecl && st.getModificationTime < staleBefore)
          hfs.delete(st.getPath, false): Unit
      }
    }
    (doomed, doomedFiles.size)
  }
}
