package graft

import graft.core.ManifestSnapshots
import org.apache.spark.sql.functions._

/** Manifest-based snapshots (core/ManifestSnapshots): time travel with
  * shared immutable data files. Pins
  *  (1) the append chain — every version reads exactly its manifest,
  *      O(delta) bytes written per version,
  *  (2) partition-granular copy-on-write — untouched partitions are
  *      SHARED by reference, old versions keep their pre-image,
  *  (3) compaction as a version — readers see identical content, old
  *      versions stay readable,
  *  (4) vacuum reference counting — only files unreachable from every
  *      kept manifest are deleted,
  *  (5) crash recovery — torn manifests and stale pointers are ignored,
  *      orphaned data dirs are re-writable.
  */
class ManifestSnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def slice(lo: Long, hi: Long) =
    (lo until hi).toDF("id").withColumn("v", col("id") * 3)

  test("append chain: O(delta) versions, each version reads its own manifest") {
    val dir = tmpDir("msnap") + "/t"
    val v1 = ManifestSnapshots.writeFull(slice(0, 300), dir)
    val v2 = ManifestSnapshots.appendDelta(slice(300, 500), dir)
    val v3 = ManifestSnapshots.appendDelta(slice(500, 600), dir)
    assert(Seq(v1, v2, v3) == Seq(1L, 2L, 3L))

    assert(ManifestSnapshots.read(spark, dir, 1).count() == 300)
    assert(ManifestSnapshots.read(spark, dir, 2).count() == 500)
    val latest = ManifestSnapshots.readLatest(spark, dir)
    assert(latest.count() == 600)
    assert(latest.exceptAll(slice(0, 600)).isEmpty &&
      slice(0, 600).exceptAll(latest).isEmpty)

    // manifest-only statistics agree with the data (zero data I/O)
    assert(ManifestSnapshots.rowCount(spark, dir, 2) == 500)

    // O(delta): version 2 ADDS only the delta's rows (its own files)
    val added = ManifestSnapshots.addedEntries(spark, dir, 1L, 2L)
    assert(added.nonEmpty && added.map(_.rows).sum == 200,
      "appendDelta must write the delta only, never restate the table")
    assert(ManifestSnapshots.readFiles(spark, dir, added).count() == 200)
  }

  test("tags: vacuum-exempt pin, immutable name, untag reclaims") {
    val dir = tmpDir("msnaptag") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    ManifestSnapshots.appendDelta(slice(100, 200), dir)
    ManifestSnapshots.appendDelta(slice(200, 300), dir)
    ManifestSnapshots.tag(spark, dir, "baseline", 1L)
    assert(ManifestSnapshots.tags(spark, dir) == Seq("baseline" -> 1L))
    assert(ManifestSnapshots.readTag(spark, dir, "baseline").count() == 100)

    // vacuum keep=1 would normally doom v1 and v2 — the tag pins v1
    ManifestSnapshots.vacuum(spark, dir, keep = 1, orphanGraceHours = 9999)
    assert(ManifestSnapshots.readTag(spark, dir, "baseline").count() == 100,
      "tagged version must survive vacuum's retention window")
    intercept[Exception](ManifestSnapshots.read(spark, dir, 2L)) // v2 reclaimed

    // immutable: re-tagging the name is refused, even to the same version
    intercept[IllegalArgumentException](
      ManifestSnapshots.tag(spark, dir, "baseline", 3L))
    // unknown version refused
    intercept[IllegalArgumentException](
      ManifestSnapshots.tag(spark, dir, "nope", 42L))
    // bad name refused before touching storage
    intercept[IllegalArgumentException](
      ManifestSnapshots.tag(spark, dir, "bad/name", 3L))

    // untag releases the pin; the next vacuum reclaims v1
    ManifestSnapshots.untag(spark, dir, "baseline")
    ManifestSnapshots.vacuum(spark, dir, keep = 1, orphanGraceHours = 9999)
    intercept[Exception](ManifestSnapshots.read(spark, dir, 1L))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 300)
  }

  test("replacePartitions: copy-on-write shares untouched partitions by reference") {
    val dir = tmpDir("msnapcow") + "/t"
    val base = slice(0, 300).withColumn("p",
      when(col("id") < 100, "a").when(col("id") < 200, "b").otherwise("c"))
    ManifestSnapshots.writeFull(base, dir, Seq("p"))

    // rewrite partition b only (values change)
    val newB = (100L until 200L).toDF("id")
      .withColumn("v", col("id") * 1000).withColumn("p", lit("b"))
    val v2 = ManifestSnapshots.replacePartitions(newB, dir, Seq("p"))

    val latest = ManifestSnapshots.read(spark, dir, v2)
    assert(latest.count() == 300)
    assert(latest.filter(col("p") === "b" && col("v") === col("id") * 1000).count() == 100,
      "touched partition must carry the new image")
    assert(latest.filter(col("p") === "a" && col("v") === col("id") * 3).count() == 100,
      "untouched partition must carry the old image")
    // time travel: version 1 still shows the pre-image of b
    val old = ManifestSnapshots.read(spark, dir, 1)
    assert(old.filter(col("p") === "b" && col("v") === col("id") * 3).count() == 100)
    // sharing is by reference: v2 keeps a/c entries from v1 and writes
    // ONLY the touched partition's rows as fresh files
    val v1Paths = ManifestSnapshots.entriesOf(spark, dir, 1L).map(_.path).toSet
    val v2Entries = ManifestSnapshots.entriesOf(spark, dir, v2)
    val fresh = v2Entries.filterNot(e => v1Paths.contains(e.path))
    assert(fresh.nonEmpty && fresh.map(_.rows).sum == 100,
      "only the touched partition's rows are written")
    assert(v2Entries.count(e => v1Paths.contains(e.path)) > 0,
      "untouched partitions must carry by reference")
  }

  test("compactData is a version: content identical, older versions intact; vacuum refcounts") {
    val dir = tmpDir("msnapopt") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    (1 to 5).foreach(i => ManifestSnapshots.appendDelta(slice(i * 100L, i * 100L + 100L), dir))
    val before = ManifestSnapshots.readLatest(spark, dir)
    val beforeRows = before.collect().toSet

    val vC = ManifestSnapshots.compactData(spark, dir, targetFileMB = 256)
    val after = ManifestSnapshots.readLatest(spark, dir)
    assert(after.collect().toSet == beforeRows, "compaction changed content")
    // pre-compaction version still readable (its files untouched)
    assert(ManifestSnapshots.read(spark, dir, vC - 1).count() == 600)

    // vacuum to the compacted version only: every pre-compaction file is
    // unreferenced and goes; the compacted files stay
    val (dropped, deleted) = ManifestSnapshots.vacuum(spark, dir, keep = 1)
    assert(dropped.nonEmpty && deleted > 0)
    assert(ManifestSnapshots.readLatest(spark, dir).collect().toSet == beforeRows,
      "vacuum deleted a file the committed version references")
    assert(ManifestSnapshots.versions(spark, dir) == Seq(vC))
  }

  test("vacuum never deletes a file shared with a kept version") {
    val dir = tmpDir("msnapshare") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)   // v1: files F1
    ManifestSnapshots.appendDelta(slice(100, 200), dir) // v2: F1 + F2
    ManifestSnapshots.appendDelta(slice(200, 300), dir) // v3: F1 + F2 + F3
    // keep v2 and v3 — v1's manifest goes, but F1 is shared by BOTH kept
    // versions and must survive
    val (dropped, deleted) = ManifestSnapshots.vacuum(spark, dir, keep = 2)
    assert(dropped == Seq(1L))
    assert(deleted == 0, s"shared files must survive, deleted $deleted")
    assert(ManifestSnapshots.read(spark, dir, 2).count() == 200)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 300)
  }

  test("torn manifest and stale pointer are ignored; orphaned data dir is re-writable") {
    val dir = tmpDir("msnapcrash") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a torn manifest for v2 (crash mid-write) + a pointer that reached it
    val torn = new org.apache.hadoop.fs.Path(s"$dir/manifests/m-2.json")
    val out = fs.create(torn, true)
    out.write("""{"version":2,"files":[{"path":"data/d-2/part-x""".getBytes("UTF-8"))
    out.close()
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_latest")
    val mo = fs.create(marker, true); mo.write("2".getBytes("UTF-8")); mo.close()

    // recovery: the torn version does not exist; v1 is the committed state
    assert(ManifestSnapshots.versions(spark, dir) == Seq(1L))
    assert(ManifestSnapshots.latestVersion(spark, dir).contains(1L))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 100)

    // the next writer BURNS the torn slot (reusing it would reopen the
    // lost-commit window the exclusive create closes) and lands on v3
    val v3 = ManifestSnapshots.appendDelta(slice(100, 150), dir)
    assert(v3 == 3L)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 150)
  }

  test("reads touch ONLY their manifest's files: time travel stays in its version, CDC in the delta") {
    val dir = tmpDir("msnapio") + "/t"
    ManifestSnapshots.writeFull(slice(0, 200), dir)
    ManifestSnapshots.appendDelta(slice(200, 260), dir)
    val v1Paths = ManifestSnapshots.entriesOf(spark, dir, 1L).map(_.path).toSet
    val tt = ManifestSnapshots.read(spark, dir, 1L)
    assert(tt.inputFiles.nonEmpty &&
      tt.inputFiles.forall(f => v1Paths.exists(p => f.endsWith(p))),
      s"time-travel read leaked outside v1's manifest: ${tt.inputFiles.toSeq}")
    val addedPaths = ManifestSnapshots.addedEntries(spark, dir, 1L, 2L).map(_.path).toSet
    val cdc = ManifestSnapshots.readChanges(spark, dir, 1L, 2L)
    assert(cdc.inputFiles.nonEmpty &&
      cdc.inputFiles.forall(f => addedPaths.exists(p => f.endsWith(p))),
      s"CDC read touched pre-image files: ${cdc.inputFiles.toSeq}")
  }

  test("schema evolution: added column reads as NULL for old versions; retyping refused before data lands") {
    val dir = tmpDir("msnapevo") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    ManifestSnapshots.appendDelta(
      slice(100, 140).withColumn("w", col("id") + 1000), dir)
    val out = ManifestSnapshots.readLatest(spark, dir)
    assert(out.columns.toSet == Set("id", "v", "w"))
    assert(out.filter(col("w").isNull).count() == 100,
      "pre-evolution rows must read the added column as NULL")
    assert(out.filter(col("w") === col("id") + 1000).count() == 40)

    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirsBefore = hfs.listStatus(
      new org.apache.hadoop.fs.Path(dir + "/data")).length
    intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(
        slice(140, 150).withColumn("v", col("v").cast("string")), dir)
    }
    assert(hfs.listStatus(new org.apache.hadoop.fs.Path(dir + "/data")).length
        == dataDirsBefore,
      "a refused retype must not leave a new data dir behind")
    assert(ManifestSnapshots.latestVersion(spark, dir).contains(2L))
  }

  test("addColumn: metadata-only declaration — defaults fill old groups, stored NULLs survive, schema travels with the version") {
    val dir = tmpDir("msnapaddcol") + "/t"
    val v1 = ManifestSnapshots.writeFull(slice(0, 100), dir)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirsBefore = hfs.listStatus(
      new org.apache.hadoop.fs.Path(dir + "/data")).length

    val vDecl = ManifestSnapshots.addColumn(spark, dir, "tag", "string",
      Some("'legacy'"))
    assert(vDecl == 2L)
    assert(hfs.listStatus(new org.apache.hadoop.fs.Path(dir + "/data")).length
        == dataDirsBefore, "addColumn must not write any data file")

    // the declaring version reads all-default; the PRE-declaration
    // version keeps the old schema (time travel)
    val atDecl = ManifestSnapshots.read(spark, dir, vDecl)
    assert(atDecl.filter(col("tag") === "legacy").count() == 100)
    assert(!ManifestSnapshots.read(spark, dir, v1).columns.contains("tag"))

    // a post-declaration delta STORES the column — its values, genuine
    // NULLs included, are never overwritten by the default
    ManifestSnapshots.appendDelta(
      slice(100, 140).withColumn("tag",
        when(col("id") % 2 === 0, lit(null).cast("string"))
          .otherwise(lit("new"))), dir)
    val out = ManifestSnapshots.readLatest(spark, dir)
    assert(out.filter(col("tag") === "legacy").count() == 100)
    assert(out.filter(col("tag").isNull).count() == 20)
    assert(out.filter(col("tag") === "new").count() == 20)

    // writer guards: retyping the declared column, re-declaring any
    // existing name, and a default that does not cast all die before
    // anything lands
    intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(
        slice(140, 150).withColumn("tag", lit(7)), dir)
    }
    intercept[IllegalArgumentException] {
      ManifestSnapshots.addColumn(spark, dir, "tag", "string")
    }
    intercept[IllegalArgumentException] {
      ManifestSnapshots.addColumn(spark, dir, "v", "bigint")
    }
    intercept[Exception] {
      ManifestSnapshots.addColumn(spark, dir, "bad", "int", Some("'zz'"))
    }

    // DML and pruned reads compose with the declaration: a rewrite of a
    // pre-declaration file still default-fills (the rewritten group
    // remains physically column-less), and readWhere carries the column
    ManifestSnapshots.deleteWhere(spark, dir, col("id") === 5)
    val after = ManifestSnapshots.readLatest(spark, dir)
    assert(after.count() == 139)
    assert(after.filter(col("tag") === "legacy").count() == 99)
    val rw = ManifestSnapshots.readWhere(spark, dir,
      ManifestSnapshots.latestVersion(spark, dir).get, Seq(("id", 0.0, 10.0)))
    assert(rw.columns.contains("tag") &&
      rw.filter(col("tag") =!= "legacy").count() == 0)
  }

  test("dropColumn: metadata-only removal — projected out from the drop version on, writer refusals, no re-add") {
    val dir = tmpDir("msnapdropcol") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir) // v1: (id, v)
    val vDrop = ManifestSnapshots.dropColumn(spark, dir, "v")
    assert(!ManifestSnapshots.read(spark, dir, vDrop).columns.contains("v"))
    assert(ManifestSnapshots.read(spark, dir, 1L).columns.contains("v"),
      "time travel before the drop keeps the column")

    // the writer surface refuses a delta resurrecting the dropped name
    intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(slice(100, 110), dir)
    }
    ManifestSnapshots.appendDelta(slice(100, 110).drop("v"), dir)
    assert(ManifestSnapshots.readLatest(spark, dir).columns.toSeq == Seq("id"))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 110)

    // no re-add under the retired name (old groups still store bytes
    // under it); a fresh name declares fine and default-fills everywhere
    intercept[IllegalArgumentException] {
      ManifestSnapshots.addColumn(spark, dir, "v", "bigint")
    }
    ManifestSnapshots.addColumn(spark, dir, "v2", "bigint", Some("7"))
    assert(ManifestSnapshots.readLatest(spark, dir)
      .filter(col("v2") === 7).count() == 110)

    // declared columns drop too; the last live column cannot
    ManifestSnapshots.dropColumn(spark, dir, "v2")
    assert(ManifestSnapshots.readLatest(spark, dir).columns.toSeq == Seq("id"))
    intercept[IllegalArgumentException] {
      ManifestSnapshots.dropColumn(spark, dir, "id")
    }
  }

  test("COW rewrites materialize declared defaults — survivors never shadow the default with NULL") {
    val dir = tmpDir("msnapevorw") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir) // (id, v)
    ManifestSnapshots.addColumn(spark, dir, "score", "int", Some("7"))
    // a merge rewriting files that PREDATE the declaration: the
    // survivors' rewritten group must store the default, not NULL
    val delta = (0L until 10L).toDF("id").withColumn("v", col("id") * 3)
      .withColumn("score", lit(99))
    ManifestSnapshots.mergeByKey(spark, dir, delta, Seq("id"))
    val out = ManifestSnapshots.readLatest(spark, dir)
    assert(out.count() == 100)
    assert(out.filter(col("score").isNull).count() == 0,
      "merge survivors shadowed the declared default with stored NULLs")
    assert(out.filter(col("id") < 10 && col("score") === 99).count() == 10)
    assert(out.filter(col("id") >= 10 && col("score") === 7).count() == 90)
    // a delta OMITTING the declared column takes the write-default
    val delta2 = (200L until 205L).toDF("id").withColumn("v", col("id") * 3)
    ManifestSnapshots.mergeByKey(spark, dir, delta2, Seq("id"))
    assert(ManifestSnapshots.readLatest(spark, dir)
      .filter(col("id") >= 200 && col("score") === 7).count() == 5)
    // DML predicates can target the declared column, and delete
    // survivors keep their defaults through the rewrite
    ManifestSnapshots.deleteWhere(spark, dir, col("score") === 99 && col("id") === 0)
    val after = ManifestSnapshots.readLatest(spark, dir)
    assert(after.count() == 104)
    assert(after.filter(col("score").isNull).count() == 0)
    // updateWhere can SET a declared column
    ManifestSnapshots.updateWhere(spark, dir, col("id") === 42,
      Seq("score" -> lit(1000)))
    assert(ManifestSnapshots.readLatest(spark, dir)
      .filter(col("score") === 1000).count() == 1)
  }

  test("CDC reads serve the current schema: declared columns reach readChanges/readFiles") {
    val dir = tmpDir("msnapevocdc") + "/t"
    ManifestSnapshots.writeFull(slice(0, 50), dir)
    ManifestSnapshots.addColumn(spark, dir, "flag", "int", Some("1"))
    ManifestSnapshots.appendDelta(slice(50, 60), dir) // delta omits flag
    val latest = ManifestSnapshots.latestVersion(spark, dir).get
    val ch = ManifestSnapshots.readChanges(spark, dir, 1L, latest)
    assert(ch.columns.contains("flag"),
      "an incremental consumer would union a flag-less frame into a flagged view")
    assert(ch.filter(col("flag") === 1).count() == 10)
  }

  test("rewriting DML keeps the partitioning shape or is refused") {
    val dir = tmpDir("msnapshape") + "/t"
    val base = slice(0, 100).withColumn("p",
      when(col("id") < 50, "a").otherwise("b"))
    ManifestSnapshots.writeFull(base, dir, Seq("p"))
    intercept[IllegalArgumentException] {
      ManifestSnapshots.deleteWhere(spark, dir, col("id") === 1)
    }
    intercept[IllegalArgumentException] {
      ManifestSnapshots.updateWhere(spark, dir, col("id") === 1, Seq("v" -> lit(0L)))
    }
    intercept[IllegalArgumentException] {
      ManifestSnapshots.mergeByKey(spark, dir,
        base.filter(col("id") === 1), Seq("id"))
    }
    // with the partitionCols passed, the same delete commits fine
    ManifestSnapshots.deleteWhere(spark, dir, col("id") === 1, Seq("p"))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 99)
  }

  test("writeFull re-statements obey the evolution metadata") {
    val dir = tmpDir("msnapevowf") + "/t"
    ManifestSnapshots.writeFull(slice(0, 50), dir)
    ManifestSnapshots.dropColumn(spark, dir, "v")
    // a re-statement carrying the dropped name would store bytes every
    // reader hides — refused
    intercept[IllegalArgumentException] {
      ManifestSnapshots.writeFull(slice(0, 50), dir)
    }
    ManifestSnapshots.writeFull(slice(0, 60).drop("v"), dir)
    assert(ManifestSnapshots.readLatest(spark, dir).columns.toSeq == Seq("id"))
    // retyping a declared column in a re-statement is refused too
    ManifestSnapshots.addColumn(spark, dir, "s", "string", Some("'x'"))
    intercept[IllegalArgumentException] {
      ManifestSnapshots.writeFull(
        (0L until 10L).toDF("id").withColumn("s", lit(5)), dir)
    }
  }

  test("declared defaults are frozen at declaration: non-deterministic expressions read stably") {
    val dir = tmpDir("msnapevofrz") + "/t"
    ManifestSnapshots.writeFull(slice(0, 20), dir)
    ManifestSnapshots.addColumn(spark, dir, "r", "double", Some("rand()"))
    val a = ManifestSnapshots.readLatest(spark, dir)
      .select("r").distinct().collect().map(_.getDouble(0)).toSeq
    val b = ManifestSnapshots.readLatest(spark, dir)
      .select("r").distinct().collect().map(_.getDouble(0)).toSeq
    assert(a.size == 1 && a == b,
      "a re-evaluated default would give pinned versions different values per read")
  }

  test("deleteWhere: only files with matches rewritten, rest shared by reference; pre-image time-travels") {
    val dir = tmpDir("msnapdel") + "/t"
    // range-clustered layout: matches land in few files, like a real lake
    ManifestSnapshots.writeFull(
      slice(0, 400).repartitionByRange(4, col("id")), dir)
    val before = ManifestSnapshots.entriesOf(spark, dir, 1L)
    assert(before.size == 4)

    val v = ManifestSnapshots.deleteWhere(spark, dir, col("id").between(10, 30))
    assert(v == 2L)
    val after = ManifestSnapshots.entriesOf(spark, dir, 2L)
    val shared = after.map(_.path).toSet intersect before.map(_.path).toSet
    assert(shared.size == 3,
      s"3 of 4 range-clustered files contain no matches and must carry by reference: $after")

    val now = ManifestSnapshots.readLatest(spark, dir)
    assert(now.count() == 379)
    assert(now.filter(col("id").between(10, 30)).isEmpty)
    // the pre-image is still one time travel away
    assert(ManifestSnapshots.read(spark, dir, 1L).count() == 400)

    // no-match delete is a no-op, not an empty commit
    assert(ManifestSnapshots.deleteWhere(spark, dir, col("id") > 10000) == 2L)
    assert(ManifestSnapshots.versions(spark, dir) == Seq(1L, 2L))

    // the IVM soundness gate sees the rewrite
    assert(ManifestSnapshots.removedEntries(spark, dir, 1L, 2L).nonEmpty)
  }

  test("every DML writer refuses a retyping change before data lands") {
    val dir = tmpDir("msnaprt") + "/t"
    ManifestSnapshots.writeFull(slice(0, 50), dir)
    intercept[IllegalArgumentException] {
      ManifestSnapshots.mergeByKey(spark, dir,
        slice(0, 5).withColumn("v", col("v").cast("double")), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      // when/otherwise coerces the long column to double — refused, not
      // committed as a version that bricks the union read
      ManifestSnapshots.updateWhere(spark, dir,
        col("id") < 5, Seq("v" -> (col("v") / 2.0)))
    }
    assert(ManifestSnapshots.versions(spark, dir) == Seq(1L),
      "a refused retype must not commit anything")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 50)
  }

  test("updateWhere: pre-image simultaneous assignment, file sharing, noop on no match") {
    val dir = tmpDir("msnapupd") + "/t"
    ManifestSnapshots.writeFull(
      slice(0, 400).repartitionByRange(4, col("id")), dir)
    val v = ManifestSnapshots.updateWhere(spark, dir,
      col("id").between(10, 30), Seq("v" -> (col("v") * 10)))
    assert(v == 2L)
    val now = ManifestSnapshots.readLatest(spark, dir)
    assert(now.count() == 400, "UPDATE never changes the row count")
    assert(now.filter(col("id").between(10, 30) && col("v") =!= col("id") * 30).isEmpty)
    assert(now.filter(!col("id").between(10, 30) && col("v") =!= col("id") * 3).isEmpty)
    val shared = ManifestSnapshots.entriesOf(spark, dir, 2L).map(_.path).toSet
      .intersect(ManifestSnapshots.entriesOf(spark, dir, 1L).map(_.path).toSet)
    assert(shared.size == 3, "files without matches must carry by reference")
    assert(ManifestSnapshots.read(spark, dir, 1L)
      .filter(col("v") =!= col("id") * 3).isEmpty, "pre-image intact")
    assert(ManifestSnapshots.updateWhere(spark, dir,
      col("id") > 10000, Seq("v" -> lit(0L))) == 2L)

    // simultaneous assignment: a<->b swap reads the PRE-image on both sides
    val sw = tmpDir("msnapswap") + "/t"
    ManifestSnapshots.writeFull(
      (0L until 10L).toDF("a").withColumn("b", col("a") * 2), sw)
    ManifestSnapshots.updateWhere(spark, sw, lit(true),
      Seq("a" -> col("b"), "b" -> col("a")))
    val s2 = ManifestSnapshots.readLatest(spark, sw)
    assert(s2.filter(col("a") =!= col("b") * 2).isEmpty, s"swap broke: ${s2.collect().toSeq}")
  }

  test("mergeByKey: matched keys replaced, new keys inserted, untouched files shared") {
    val dir = tmpDir("msnapmrg") + "/t"
    ManifestSnapshots.writeFull(
      slice(0, 400).repartitionByRange(4, col("id")), dir)
    val delta = (20L until 26L).toDF("id").withColumn("v", lit(999L))
      .unionByName((1000L until 1005L).toDF("id").withColumn("v", lit(-1L)))
    val v = ManifestSnapshots.mergeByKey(spark, dir, delta, Seq("id"))
    assert(v == 2L)
    val now = ManifestSnapshots.readLatest(spark, dir)
    assert(now.count() == 405, "6 replaced in place + 5 inserted")
    assert(now.filter(col("id").between(20, 25) && col("v") =!= 999).isEmpty)
    assert(now.filter(col("id") >= 1000).count() == 5)
    val shared = ManifestSnapshots.entriesOf(spark, dir, 2L).map(_.path).toSet
      .intersect(ManifestSnapshots.entriesOf(spark, dir, 1L).map(_.path).toSet)
    assert(shared.size == 3,
      "only the file holding ids 20-25 is rewritten; inserts touch nothing")
    assert(ManifestSnapshots.removedEntries(spark, dir, 1L, 2L).nonEmpty)

    // pure-insert delta: no file qualifies for rewrite — append-shaped
    val v3 = ManifestSnapshots.mergeByKey(spark, dir,
      (2000L until 2003L).toDF("id").withColumn("v", lit(5L)), Seq("id"))
    assert(v3 == 3L)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 408)
    assert(ManifestSnapshots.removedEntries(spark, dir, 2L, 3L).isEmpty,
      "a pure insert must not trip the incremental consumers' restate gate")
  }

  test("manifest zone maps: readWhere prunes files on metadata alone, result ≡ full filter") {
    val dir = tmpDir("msnapzm") + "/t"
    ManifestSnapshots.writeFull(
      slice(0, 400).repartitionByRange(4, col("id")), dir)
    val entries = ManifestSnapshots.entriesOf(spark, dir, 1L)
    assert(entries.forall(e => e.stats.contains("id") && e.stats.contains("v")),
      s"numeric zone maps must be harvested at write time: $entries")

    val pruned = ManifestSnapshots.readWhere(spark, dir, 1L,
      Seq(("id", 50.0, 120.0)))
    val full = ManifestSnapshots.read(spark, dir, 1L)
      .filter(col("id") >= 50 && col("id") <= 120)
    assert(pruned.inputFiles.length < entries.size,
      "a range-clustered box read must skip disjoint files from the manifest")
    assert(pruned.count() == full.count() && pruned.except(full).isEmpty)

    // empty box: zero files, empty frame in the table's schema
    val none = ManifestSnapshots.readWhere(spark, dir, 1L, Seq(("id", 5000.0, 6000.0)))
    assert(none.isEmpty && none.columns.toSet == Set("id", "v"))
  }

  test("pre-zone-map manifests (no stats) parse, read, and never mis-prune") {
    val dir = tmpDir("msnapold") + "/t"
    ManifestSnapshots.writeFull(
      slice(0, 200).repartitionByRange(2, col("id")), dir)
    // strip the stats objects in place: the on-disk format rounds 1-8 wrote
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(dir + "/manifests/m-1.json")
    val txt = {
      val in = hfs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val stripped = txt.replaceAll(""","stats":\{[^}]*\}""", "")
    assert(stripped != txt, "fixture must actually exercise the old format")
    val out = hfs.create(mp, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()

    val entries = ManifestSnapshots.entriesOf(spark, dir, 1L)
    assert(entries.nonEmpty && entries.forall(_.stats.isEmpty))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 200)
    // no stats -> no pruning, still the right answer
    val r = ManifestSnapshots.readWhere(spark, dir, 1L, Seq(("id", 0.0, 10.0)))
    assert(r.count() == 11 && r.inputFiles.length == entries.size)

    // a delta over the old-format manifest writes a MIXED manifest that
    // round-trips: old entries stay stats-less, new ones carry zone maps
    ManifestSnapshots.appendDelta(slice(200, 250), dir)
    val mixed = ManifestSnapshots.entriesOf(spark, dir, 2L)
    assert(mixed.exists(_.stats.isEmpty) && mixed.exists(_.stats.nonEmpty))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 250)
  }

  test("sorted compaction restores pruning power an append chain scattered") {
    val dir = tmpDir("msnapsc") + "/t"
    // three deltas, each spanning the WHOLE id domain: every file's zone
    // map covers everything, so a box read can prune nothing
    def scattered(seed: Long) =
      slice(0, 300).withColumn("id", (col("id") * 7919 + seed) % 300)
    ManifestSnapshots.writeFull(scattered(0).repartition(3), dir)
    ManifestSnapshots.appendDelta(scattered(1).repartition(3), dir)
    ManifestSnapshots.appendDelta(scattered(2).repartition(3), dir)
    val before = ManifestSnapshots.readWhere(spark, dir, 3L, Seq(("id", 0.0, 30.0)))
    assert(before.inputFiles.length == 9, "scattered layout prunes nothing")

    val v = ManifestSnapshots.compactDataSorted(spark, dir, Seq("id"), numFiles = Some(6))
    val after = ManifestSnapshots.readWhere(spark, dir, v, Seq(("id", 0.0, 30.0)))
    assert(after.inputFiles.length < ManifestSnapshots.entriesOf(spark, dir, v).size,
      "after sorted compaction the box read must skip files")
    // content identical across the rewrite, and the pre-image intact
    assert(ManifestSnapshots.read(spark, dir, v).orderBy("id", "v").collect().toSeq
      == ManifestSnapshots.read(spark, dir, 3L).orderBy("id", "v").collect().toSeq)
  }

  test("guarded append: replay lands exactly once; a guard ahead of the chain never loses rows") {
    import graft.core.BloomSkipping
    import org.apache.spark.sql.functions.xxhash64
    val dir = tmpDir("msnapguard") + "/t"
    val b1 = slice(0, 100)
    assert(ManifestSnapshots.appendDeltaGuarded(spark, dir, b1, Seq("id")) == 1L)
    assert(BloomSkipping.loadKeyBloom(spark, dir).isDefined, "first write seeds the guard")

    // full replay of batch 1: nothing admitted, NO new version
    assert(ManifestSnapshots.appendDeltaGuarded(spark, dir, b1, Seq("id")) == 1L)
    assert(ManifestSnapshots.versions(spark, dir) == Seq(1L))

    // partial overlap: only the new half lands
    assert(ManifestSnapshots.appendDeltaGuarded(spark, dir, slice(50, 150), Seq("id")) == 2L)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 150)

    // crash window: guard merged but the version never committed — the
    // guard now claims keys the chain lacks. The replay must route those
    // rows through the exact probe and ADMIT them (guard-ahead = false
    // positives only, never lost rows).
    val b3 = slice(150, 180)
    BloomSkipping.mergeKeyBloom(spark, dir,
      b3.select(xxhash64(col("id")).as("h")), 4000000L)
    assert(ManifestSnapshots.appendDeltaGuarded(spark, dir, b3, Seq("id")) == 3L)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 180)

    // torn guard degrades to the exact path and self-heals
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val guardFiles = hfs.globStatus(new org.apache.hadoop.fs.Path(dir, "_key_bloom*"))
    assert(guardFiles.nonEmpty)
    guardFiles.foreach(g => hfs.delete(g.getPath, false))
    assert(ManifestSnapshots.appendDeltaGuarded(spark, dir, slice(170, 200), Seq("id")) == 4L)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 200)
    assert(BloomSkipping.loadKeyBloom(spark, dir).isDefined, "guard self-healed")
    // and the healed guard is a SUPERSET guard: a full replay admits nothing
    assert(ManifestSnapshots.appendDeltaGuarded(spark, dir, slice(0, 200), Seq("id")) == 4L)
  }

  test("DML discovery prunes on manifest zone maps: candidates are a strict stats-subset") {
    val dir = tmpDir("msnapdmlp") + "/t"
    // key-clustered layout: 8 range files over ids 0..799
    ManifestSnapshots.writeFull(
      slice(0, 800).repartitionByRange(8, col("id")), dir)
    val all = ManifestSnapshots.entriesOf(spark, dir,
      ManifestSnapshots.latestVersion(spark, dir).get)
    assert(all.size == 8)

    // MERGE with a narrow top-band delta: bounds derive from the delta
    val delta = slice(780, 800).withColumn("v", col("id") * 7)
    ManifestSnapshots.mergeByKey(spark, dir, delta, Seq("id"))
    val mergeCand = ManifestSnapshots.lastDiscoveryCandidates
    assert(mergeCand.size < all.size,
      s"merge discovery scanned ${mergeCand.size}/${all.size} files — no pruning")
    assert(mergeCand.forall(e => e.stats.get("id").exists(_._2 >= 780.0)),
      "a stats-disjoint file survived merge discovery pruning")
    val afterMerge = ManifestSnapshots.readLatest(spark, dir)
    assert(afterMerge.count() == 800)
    assert(afterMerge.filter(col("id") >= 780 && col("v") =!= col("id") * 7).count() == 0,
      "pruned merge missed a matching row")
    assert(afterMerge.filter(col("id") < 780 && col("v") =!= col("id") * 3).count() == 0,
      "pruned merge corrupted an untouched row")

    // DELETE with a caller-promised box on the clustered key
    ManifestSnapshots.deleteWhere(spark, dir, col("id").between(10, 20),
      pruneBounds = Seq(("id", 10.0, 20.0)))
    val delCand = ManifestSnapshots.lastDiscoveryCandidates
    assert(delCand.size < all.size, "delete discovery did not prune")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 789)

    // UPDATE likewise
    ManifestSnapshots.updateWhere(spark, dir, col("id").between(700, 710),
      Seq("v" -> (col("v") + 1)), pruneBounds = Seq(("id", 700.0, 710.0)))
    val updCand = ManifestSnapshots.lastDiscoveryCandidates
    assert(updCand.size < all.size, "update discovery did not prune")
    val afterUpd = ManifestSnapshots.readLatest(spark, dir)
    assert(afterUpd.filter(col("id").between(700, 710)).count() == 11)

    // soundness backstop: stats-less entries are NEVER pruned — strip the
    // stats from the committed manifest and re-run a pruned delete
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vNow = ManifestSnapshots.latestVersion(spark, dir).get
    val mp = new org.apache.hadoop.fs.Path(dir + s"/manifests/m-$vNow.json")
    val txt = {
      val in = hfs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val out = hfs.create(mp, true)
    try out.write(txt.replaceAll(""","stats":\{[^}]*\}""", "").getBytes("UTF-8"))
    finally out.close()
    ManifestSnapshots.deleteWhere(spark, dir, col("id").between(30, 40),
      pruneBounds = Seq(("id", 30.0, 40.0)))
    assert(ManifestSnapshots.lastDiscoveryCandidates.size ==
      ManifestSnapshots.entriesOf(spark, dir, vNow).size,
      "stats-less entries must all stay candidates")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 778)
  }

  test("string zone maps: readWhere and MERGE discovery prune on sstats ranges") {
    val dir = tmpDir("msnapsstat") + "/t"
    // address-shaped string keys, range-clustered: sstats are the ONLY
    // statistic that can range-prune this layout (numeric stats blind)
    val rows = (0 until 1000).toDF("n")
      .select(format_string("0xadd%06d", col("n")).as("addr"),
        (col("n") * 3L).as("v"))
    ManifestSnapshots.writeFull(
      rows.repartitionByRange(8, col("addr")), dir)
    val entries = ManifestSnapshots.entriesOf(spark, dir, 1L)
    assert(entries.forall(_.sstats.contains("addr")),
      "string zone maps missing from the manifest")

    // box read on a narrow key range: few files planned, result exact
    val pruned = ManifestSnapshots.readWhere(spark, dir, 1L, Nil,
      strBounds = Seq(("addr", "0xadd000100", "0xadd000199")))
    assert(pruned.inputFiles.length < entries.size,
      "sstats pruning planned every file")
    assert(pruned.count() == 100)
    val full = ManifestSnapshots.read(spark, dir, 1L)
      .filter(col("addr") >= "0xadd000100" && col("addr") <= "0xadd000199")
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)

    // string-keyed MERGE: delta bounds derive from the delta's own
    // min/max addr, discovery scans the overlapping files only
    val delta = (990 until 1000).toDF("n")
      .select(format_string("0xadd%06d", col("n")).as("addr"), lit(-1L).as("v"))
    ManifestSnapshots.mergeByKey(spark, dir, delta, Seq("addr"))
    val cand = ManifestSnapshots.lastDiscoveryCandidates
    assert(cand.size < entries.size,
      s"string-bounds merge discovery scanned ${cand.size}/${entries.size}")
    val after = ManifestSnapshots.readLatest(spark, dir)
    assert(after.filter(col("v") === -1L).count() == 10)
    assert(after.count() == 1000)

    // caller-promised string box on DELETE
    ManifestSnapshots.deleteWhere(spark, dir,
      col("addr").between("0xadd000000", "0xadd000009"),
      pruneStrBounds = Seq(("addr", "0xadd000000", "0xadd000009")))
    assert(ManifestSnapshots.lastDiscoveryCandidates.size < entries.size)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 990)
  }

  test("hostile string-stat bytes round-trip the manifest format (strict escaping)") {
    val dir = tmpDir("msnapsesc") + "/t"
    // keys containing every character that could confuse a flat JSON
    // parse: braces, quotes, backslashes, brackets, commas, newlines,
    // non-ASCII — the manifest must round-trip them and stay parseable
    val nasty = Seq("""a{"}][\,x""", "b\nnewline", "cé漢字🎉", "d plain")
    val rows = nasty.zipWithIndex.toDF("k", "v")
    ManifestSnapshots.writeFull(rows.coalesce(1), dir)
    val es = ManifestSnapshots.entriesOf(spark, dir, 1L)
    assert(es.nonEmpty && es.forall(_.sstats.contains("k")),
      "hostile keys dropped the string stats entirely")
    val (mn, mx) = es.head.sstats("k")
    assert(nasty.contains(mn) && nasty.contains(mx),
      s"string stats corrupted by escaping: ($mn, $mx)")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 4)
    // and the chain still extends (parse survived the round-trip)
    ManifestSnapshots.appendDelta(Seq(("e", 9)).toDF("k", "v"), dir)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 5)
  }

  test("string-keyed MERGE prunes discovery with bloom sidecars over an append chain") {
    val dir = tmpDir("msnapbloomk") + "/t"
    // zone maps are BLIND here: the key is a string, so deltaKeyBounds
    // yields nothing and every file stays a candidate — the bloom
    // sidecars are the only statistic that can prune this shape
    ManifestSnapshots.enableBloomIndex(spark, dir, Seq("k"))
    def batch(lo: Int, hi: Int) = (lo until hi).toDF("n")
      .select(format_string("key_%06d", col("n")).as("k"),
        (col("n") * 3L).as("v"))
      .coalesce(2)
    ManifestSnapshots.writeFull(batch(0, 200), dir)
    (1 to 4).foreach(i =>
      ManifestSnapshots.appendDelta(batch(i * 200, (i + 1) * 200), dir): Unit)
    val all = ManifestSnapshots.entriesOf(spark, dir,
      ManifestSnapshots.latestVersion(spark, dir).get)
    assert(all.size >= 5)

    // the delta updates only the LAST batch's keys — an append chain
    // keeps each batch's keys in its own files, so the older versions'
    // blooms must reject the probe set
    val delta = batch(900, 1000).withColumn("v", lit(-1L))
    ManifestSnapshots.mergeByKey(spark, dir, delta, Seq("k"))
    val cand = ManifestSnapshots.lastDiscoveryCandidates
    assert(cand.size < all.size,
      s"bloom sidecars pruned nothing: scanned ${cand.size}/${all.size} files")
    assert(cand.size <= 3, // the last batch's ≤2 files + possible fp
      s"expected ~the last batch's files as candidates, got ${cand.size}")
    val after = ManifestSnapshots.readLatest(spark, dir)
    assert(after.count() == 1000)
    assert(after.filter(col("k") >= "key_000900").filter(col("v") =!= -1L).count() == 0,
      "bloom-pruned merge missed a matching row")
    assert(after.filter(col("k") < "key_000900").filter(col("v") === -1L).count() == 0,
      "bloom-pruned merge corrupted an untouched row")

    // vacuum after compaction reclaims unreachable sidecars with the data
    ManifestSnapshots.compactData(spark, dir)
    ManifestSnapshots.vacuum(spark, dir, keep = 1)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecars = hfs.listStatus(new org.apache.hadoop.fs.Path(dir + "/_bloom"))
      .map(_.getPath.getName.stripSuffix(".parquet")).toSet
    val liveDirs = hfs.listStatus(new org.apache.hadoop.fs.Path(dir + "/data"))
      .map(_.getPath.getName).toSet
    assert(sidecars.subsetOf(liveDirs),
      s"orphaned sidecars survived vacuum: ${sidecars -- liveDirs}")
    // and the compacted store still merges correctly through its sidecar
    ManifestSnapshots.mergeByKey(spark, dir,
      batch(0, 10).withColumn("v", lit(-7L)), Seq("k"))
    assert(ManifestSnapshots.readLatest(spark, dir)
      .filter(col("v") === -7L).count() == 10)
  }

  test("two PROCESSES race appends on a local store: no lost commit (O_EXCL commit lock)") {
    val dir = tmpDir("msnapxproc") + "/t"
    ManifestSnapshots.writeFull(Seq(("seed", 0L)).toDF("k", "v").coalesce(1), dir)
    val n = 6
    // a SECOND JVM (own FileSystem/lock instances — only the on-disk
    // O_CREAT|O_EXCL arbiter is shared) appends `n` tagged rows through
    // the public API while this process appends its own `n`
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // re-emit this JVM's --add-opens flags (Spark-on-JDK17 needs them);
    // they arrive as SEPARATE (flag, value) argument pairs
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
    val jvmArgs = inArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports")
        Seq(a, inArgs(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports="))
        Seq(a)
      else Nil
    }
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.ForkedCommitterMain", dir, "child", n.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(
      new java.io.File(tmpDir("msnapxproc-log"), "child.log")))
    val child = pb.start()
    (0 until n).foreach { i =>
      ManifestSnapshots.appendDelta(
        Seq((s"parent-$i", i.toLong)).toDF("k", "v").coalesce(1), dir): Unit
    }
    assert(child.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
      "forked committer did not finish")
    assert(child.exitValue() == 0, "forked committer failed — see child.log")
    val rows = ManifestSnapshots.readLatest(spark, dir)
    assert(rows.count() == 1 + 2L * n,
      s"lost commit across processes: ${rows.count()} of ${1 + 2 * n} rows")
    assert(rows.filter(col("k").startsWith("child-")).count() == n)
    assert(rows.filter(col("k").startsWith("parent-")).count() == n)
    // every committed version parses and the chain is gap-free enough to
    // serve history (burned slots allowed, lost manifests are not):
    // 1 full + 2n appends = 2n+1 parseable versions
    assert(ManifestSnapshots.versions(spark, dir).size == 1 + 2 * n,
      "a racing committer's manifest vanished")
  }

  test("declarations race appends across PROCESSES: every success is atomic, every loss is loud") {
    val dir = tmpDir("msnapxdecl") + "/t"
    ManifestSnapshots.writeFull(Seq(("seed", 0L)).toDF("k", "v").coalesce(1), dir)
    val n = 6
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
    val jvmArgs = inArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports")
        Seq(a, inArgs(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports="))
        Seq(a)
      else Nil
    }
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.ForkedCommitterMain", dir, "child", n.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(
      new java.io.File(tmpDir("msnapxdecl-log"), "child.log")))
    val child = pb.start()
    // the maintenance writer declares 3 columns while the other PROCESS
    // appends: each attempt either commits atomically (decl + manifest in
    // one critical section) or fails loudly with CME when the child moved
    // the base — there is no third outcome, and a CME'd attempt leaves no
    // live declaration behind (its decl slot is burned, manifest-less)
    val declared = (0 until 3).map { i =>
      var v = -1L; var attempts = 0
      while (v < 0 && attempts < 80) {
        try v = ManifestSnapshots.addColumn(spark, dir, s"extra$i", "double", Some(s"$i.5"))
        catch { case _: java.util.ConcurrentModificationException =>
          attempts += 1; Thread.sleep(20L) }
      }
      assert(v > 0, s"addColumn extra$i never won a commit in $attempts retries")
      v
    }
    assert(child.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
      "forked committer did not finish")
    assert(child.exitValue() == 0, "forked committer failed — see child.log")
    // no lost append despite the interleaved metadata commits
    val rows = ManifestSnapshots.readLatest(spark, dir)
    assert(rows.filter(col("k").startsWith("child-")).count() == n,
      "a child append vanished under racing declarations")
    // every successful declaration is visible at exactly its version
    assert(ManifestSnapshots.declaredColumns(spark, dir).map(_.name).sorted ==
      Seq("extra0", "extra1", "extra2"))
    declared.foreach { v =>
      assert(ManifestSnapshots.versions(spark, dir).contains(v),
        s"declaring version $v lost its manifest")
    }
    // defaults fill the pre-declaration rows; the guard the declarations
    // installed holds for the next writer
    assert(rows.filter(col("extra1") === 1.5).count() == rows.count())
    intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(
        Seq(("late", 9L, 7)).toDF("k", "v", "extra0").coalesce(1), dir)
    }
  }

  test("bloom pruning keys by lake-relative path: same-named partitioned siblings stay independent") {
    val dir = tmpDir("msnapbloompart") + "/t"
    // A single-task dynamically-partitioned write emits the SAME
    // part-00000-<uuid> file name into EVERY partition dir it touches.
    // Keys interleave across partitions (evens in pt=a, odds in pt=b)
    // so both files span the full key range — string zone maps cannot
    // separate them and the bloom sidecar is the deciding statistic.
    // Under bare-name sidecar keying, pt=b's bloom reject would prune
    // its same-named pt=a sibling that DOES hold the delta's keys,
    // keeping the old rows by reference while appending the delta —
    // silent duplicate keys.
    ManifestSnapshots.enableBloomIndex(spark, dir, Seq("k"))
    val rows = (0 until 200).toDF("n")
      .select(format_string("key_%06d", col("n")).as("k"),
        (col("n") * 3L).as("v"),
        when(col("n") % 2 === 0, "a").otherwise("b").as("pt"))
      .coalesce(1)
    ManifestSnapshots.writeFull(rows, dir, partitionCols = Seq("pt"))
    val all = ManifestSnapshots.entriesOf(spark, dir, 1L)
    val bares = all.map(_.path.split('/').last)
    assert(bares.distinct.size < bares.size,
      "precondition lost: partitioned write no longer shares part-file names")

    // ten EVEN keys — present only in pt=a's file
    val delta = (0 until 20 by 2).toDF("n")
      .select(format_string("key_%06d", col("n")).as("k"), lit(-1L).as("v"),
        lit("a").as("pt"))
    ManifestSnapshots.mergeByKey(spark, dir, delta, Seq("k"),
      partitionCols = Seq("pt"))
    val after = ManifestSnapshots.readLatest(spark, dir)
    assert(after.count() == 200,
      s"duplicate keys after partitioned bloom-pruned merge: ${after.count()}")
    assert(after.filter(col("v") === -1L).count() == 10,
      "merge missed (or duplicated) the delta's rows")
    assert(after.groupBy(col("k")).count().filter(col("count") > 1).count() == 0,
      "same-named sibling was wrongly bloom-pruned: keys duplicated")
  }

  test("NULL-keyed rows land exactly once through the guarded append (<=> probe)") {
    val dir = tmpDir("msnapnullk") + "/t"
    val rows = Seq[(java.lang.Long, Long)]((1L, 10L), (null, 20L), (2L, 30L))
      .toDF("k", "v")
    ManifestSnapshots.appendDeltaGuarded(spark, dir, rows, Seq("k"))
    // full replays: the NULL-keyed row must not re-admit (a plain USING
    // anti join never matches NULL against its stored copy)
    ManifestSnapshots.appendDeltaGuarded(spark, dir, rows, Seq("k"))
    ManifestSnapshots.appendDeltaGuarded(spark, dir, rows, Seq("k"))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 3,
      "NULL-keyed row duplicated (or dropped) across replays")
  }

  test("logically-typed INT columns get NO zone maps — never wrong-unit pruning") {
    val dir = tmpDir("msnaplogic") + "/t"
    // DecimalType(10,2) stores INT64 UNSCALED in parquet: stats say
    // 15000 for value 150.00 — a zone map in that unit would prune a
    // file whose every row matches bounds like [100, 200]
    val rows = (0 until 400).toDF("id")
      .select(col("id").cast("long").as("id"),
        (col("id").cast("decimal(10,2)") / 2).cast("decimal(10,2)").as("dec"),
        to_date(lit("2024-01-01")).as("d"))
    ManifestSnapshots.writeFull(rows.repartitionByRange(4, col("id")), dir)
    val es = ManifestSnapshots.entriesOf(spark, dir, 1L)
    assert(es.forall(e => !e.stats.contains("dec") && !e.stats.contains("d")),
      s"logical-typed column leaked a wrong-unit zone map: ${es.head.stats}")
    assert(es.forall(_.stats.contains("id")), "plain long column lost its stats")
    // bounds on the stat-less column: no pruning, exact result
    val r = ManifestSnapshots.readWhere(spark, dir, 1L, Seq(("dec", 50.0, 60.0)))
    assert(r.count() ==
      ManifestSnapshots.read(spark, dir, 1L)
        .filter(col("dec") >= 50.0 && col("dec") <= 60.0).count())
  }

  test("replacePartitions refuses retypes and unpartitioned targets") {
    val dir = tmpDir("msnaprpg") + "/t"
    val base = slice(0, 100).withColumn("p", (col("id") % 2).cast("string"))
    ManifestSnapshots.writeFull(base, dir, Seq("p"))
    intercept[IllegalArgumentException] {
      ManifestSnapshots.replacePartitions(
        base.withColumn("v", col("v").cast("double")), dir, Seq("p"))
    }
    val udir = tmpDir("msnaprpg2") + "/t"
    ManifestSnapshots.writeFull(slice(0, 50), udir) // unpartitioned
    intercept[IllegalArgumentException] {
      ManifestSnapshots.replacePartitions(
        slice(0, 10).withColumn("p", lit("a")), udir, Seq("p"))
    }
  }

  test("compactData refuses to flatten a partitioned store") {
    val dir = tmpDir("msnapflat") + "/t"
    ManifestSnapshots.writeFull(
      slice(0, 100).withColumn("p", (col("id") % 2).cast("string")),
      dir, Seq("p"))
    intercept[IllegalArgumentException] {
      ManifestSnapshots.compactData(spark, dir) // no partitionCols
    }
    // with the partition columns it compacts fine
    ManifestSnapshots.appendDelta(
      slice(100, 150).withColumn("p", lit("0")), dir, Seq("p"))
    ManifestSnapshots.compactData(spark, dir, partitionCols = Seq("p"))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 150)
  }

  test("deleting every row leaves an EMPTY but readable store") {
    val dir = tmpDir("msnapempty") + "/t"
    ManifestSnapshots.writeFull(
      slice(0, 60).withColumn("p", (col("id") % 3).cast("string")),
      dir, Seq("p"))
    val v2 = ManifestSnapshots.deleteWhere(spark, dir, lit(true), Seq("p"))
    val latest = ManifestSnapshots.readLatest(spark, dir)
    assert(latest.count() == 0, "full delete left rows behind")
    assert(latest.columns.toSet == Set("id", "v", "p"),
      "empty store lost its schema")
    // CDC across the wipe reports the rewrite, doesn't crash
    assert(ManifestSnapshots.removedEntries(spark, dir, 1L, v2).nonEmpty)
    assert(ManifestSnapshots.readChanges(spark, dir, 1L, v2).count() == 0)
    // and the chain continues
    ManifestSnapshots.appendDelta(
      slice(0, 10).withColumn("p", lit("0")), dir, Seq("p"))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 10)
  }

  test("brace-and-quote column names round-trip the manifest stats") {
    val dir = tmpDir("msnapbrace") + "/t"
    val rows = (0 until 50).toDF("n")
      .select(col("n").cast("long").as("""a{b"c}"""),
        format_string("s%03d", col("n")).as("""x{y"""))
    ManifestSnapshots.writeFull(rows.coalesce(1), dir)
    val es = ManifestSnapshots.entriesOf(spark, dir, 1L)
    assert(es.nonEmpty, "brace-named columns made the manifest unparseable")
    assert(es.head.stats.contains("""a{b"c}"""),
      s"numeric stats lost the hostile name: ${es.head.stats.keySet}")
    assert(es.head.sstats.contains("""x{y"""),
      s"string stats lost the hostile name: ${es.head.sstats.keySet}")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 50)
    ManifestSnapshots.appendDelta(rows.limit(5), dir)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 55)
  }

  test("two racing appenders both commit, serialized: no lost rows, no lost versions") {
    val dir = tmpDir("msnaprace") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    // 8 concurrent appenders with disjoint deltas race the commit slots;
    // the exclusive-create protocol must serialize them with every delta
    // surviving — the silent-lost-commit mode of delete+rename commits
    import scala.jdk.CollectionConverters._
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 8).map { i =>
      new Thread(() =>
        try results.add(ManifestSnapshots.appendDelta(
          slice(100L + i * 50L, 100L + (i + 1) * 50L), dir)): Unit
        catch { case t: Throwable => errors.add(t): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"appender died: ${errors.asScala.headOption}")
    val vs = results.asScala.toSeq
    assert(vs.size == 8 && vs.distinct.size == 8,
      s"two appenders claimed the same version: $vs")
    val latest = ManifestSnapshots.readLatest(spark, dir)
    assert(latest.count() == 500, "a racing append lost rows")
    assert(latest.exceptAll(slice(0, 500)).isEmpty &&
      slice(0, 500).exceptAll(latest).isEmpty)
    // every intermediate version is a parseable superset chain
    val committed = ManifestSnapshots.versions(spark, dir)
    assert(committed.size == 9, s"expected 9 committed versions, got $committed")
  }

  test("a rewriting commit on a moved base fails loudly instead of losing the race") {
    val dir = tmpDir("msnapconf") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    // land a concurrent APPEND deterministically inside the conflict
    // window — after deleteWhere's touched-file discovery, before its
    // commit. A stale rewrite that committed anyway would carry a file
    // list WITHOUT the appended delta: silent row loss.
    ManifestSnapshots.onBeforeRewriteCommit = () => {
      ManifestSnapshots.onBeforeRewriteCommit = () => () // fire once
      ManifestSnapshots.appendDelta(slice(100, 140), dir): Unit
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        ManifestSnapshots.deleteWhere(spark, dir, col("id") < 10)
      }
    } finally ManifestSnapshots.onBeforeRewriteCommit = () => ()
    // nothing was committed by the failed rewrite; the append's rows live
    assert(ManifestSnapshots.latestVersion(spark, dir).contains(2L))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 140)
    // and the refused rewrite reclaimed its own COW output: every data
    // dir on disk is referenced by some manifest (no orphan leak per
    // conflict — the conflict is the designed retry path)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced = ManifestSnapshots.versions(spark, dir)
      .flatMap(v => ManifestSnapshots.entriesOf(spark, dir, v))
      .map(_.path.split('/')(1)).toSet
    val onDisk = hfs.listStatus(new org.apache.hadoop.fs.Path(dir + "/data"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(onDisk.subsetOf(referenced),
      s"refused rewrite leaked uncommitted data dirs: ${onDisk -- referenced}")
    // and a fresh rewrite against the new state succeeds, keeping them
    val v3 = ManifestSnapshots.deleteWhere(spark, dir, col("id") < 10)
    assert(v3 == 3L && ManifestSnapshots.readLatest(spark, dir).count() == 130)
  }

  test("vacuum sweeps crash-orphaned data dirs, age-gated") {
    val dir = tmpDir("msnaporph") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fabricate a crashed writer's dir: data landed, no manifest ever
    val orphan = new org.apache.hadoop.fs.Path(dir + "/data/d-9-dead")
    slice(0, 10).write.parquet(orphan.toString)
    // fresh orphan: inside the grace window, must survive (it could be a
    // LIVE writer between data write and commit)
    ManifestSnapshots.vacuum(spark, dir, keep = 2)
    assert(hfs.exists(orphan), "grace window violated: live-writer dir swept")
    // age it past the grace window: swept
    hfs.setTimes(orphan, System.currentTimeMillis() - 7L * 3600 * 1000, -1)
    ManifestSnapshots.vacuum(spark, dir, keep = 2)
    assert(!hfs.exists(orphan), "stale orphan survived vacuum")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 100)
  }

  test("vacuum reclaims aged TORN slots but ABORTS on unreadable ones") {
    val dir = tmpDir("msnapvactorn") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    ManifestSnapshots.appendDelta(slice(100, 120), dir)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 7L * 3600 * 1000
    // a confirmed-garbage slot (crashed writer), aged past the grace
    // window: positively observed torn → reclaimed
    val torn = new org.apache.hadoop.fs.Path(s"$dir/manifests/m-50.json")
    val o = hfs.create(torn, true)
    o.write("""{"version":50,"files":[{"path":"data/d-50/part""".getBytes("UTF-8"))
    o.close()
    hfs.setTimes(torn, old, -1)
    // an UNREADABLE slot: exists by name but the read itself fails (a
    // directory stands in for object-store throttling — open() throws).
    // Its version may be committed, so vacuum must refuse to touch
    // ANYTHING rather than classify it as debris.
    val unreadable = new org.apache.hadoop.fs.Path(s"$dir/manifests/m-60.json")
    hfs.mkdirs(unreadable)
    hfs.setTimes(unreadable, old, -1)
    val ex = intercept[IllegalStateException] {
      ManifestSnapshots.vacuum(spark, dir, keep = 1)
    }
    assert(ex.getMessage.contains("could not be READ"), ex.getMessage)
    assert(hfs.exists(torn),
      "vacuum deleted the torn slot despite aborting on an unreadable one")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 120)
    // the blockage cleared: the aged torn slot is now reclaimed, the
    // kept manifests and data survive
    hfs.delete(unreadable, true)
    ManifestSnapshots.vacuum(spark, dir, keep = 1)
    assert(!hfs.exists(torn), "aged torn slot survived a clean vacuum")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 120)
  }

  test("orphan declaration (crash between decl and manifest) is ignored and its slot burned") {
    val dir = tmpDir("msnapdeclorph") + "/t"
    ManifestSnapshots.writeFull(slice(0, 50), dir)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fabricate addColumn dying between its decl write and manifest
    // commit: decl-2 exists, manifest m-2.json never will
    val decl = new org.apache.hadoop.fs.Path(s"$dir/_schema/decl-2")
    hfs.mkdirs(decl.getParent)
    val o = hfs.create(decl, true)
    o.write("ghost\tint\t2\t-\n".getBytes("UTF-8"))
    o.close()
    // manifest-less declaration: invisible to every reader
    assert(ManifestSnapshots.declaredColumns(spark, dir).isEmpty,
      "a declaration with no committed manifest version leaked into the schema")
    assert(ManifestSnapshots.readLatest(spark, dir).columns.toSeq == Seq("id", "v"))
    // the next committer BURNS slot 2 — if it landed there, the ghost
    // declaration would spring to life as that commit's schema change
    val v = ManifestSnapshots.appendDelta(slice(50, 80), dir)
    assert(v == 3L, s"slot 2 was not burned: appendDelta landed at $v")
    assert(ManifestSnapshots.declaredColumns(spark, dir).isEmpty)
    assert(ManifestSnapshots.readLatest(spark, dir).columns.toSeq == Seq("id", "v"))
    // a real declaration afterwards works and is visible with its version
    val dv = ManifestSnapshots.addColumn(spark, dir, "bonus", "int", Some("7"))
    assert(dv == 4L)
    assert(ManifestSnapshots.declaredColumns(spark, dir).map(_.name) == Seq("bonus"))
    assert(ManifestSnapshots.readLatest(spark, dir).columns.contains("bonus"))
  }

  test("declaration is never visible without its manifest, nor the manifest without it") {
    val dir = tmpDir("msnapdeclatom") + "/t"
    ManifestSnapshots.writeFull(slice(0, 40), dir)
    val v = ManifestSnapshots.dropColumn(spark, dir, "v")
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // both artifacts of the declaring commit exist the moment it returns:
    // decl-<v> was written BEFORE the manifest inside the same critical
    // section, so no reader interleaving can see the version without the
    // declaration (the r13 race: a concurrent append's re-guard saw the
    // moved version, missed the declaration, and admitted a resurrecting
    // delta)
    assert(hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/_schema/decl-$v")))
    assert(hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/manifests/m-$v.json")))
    assert(ManifestSnapshots.droppedColumns(spark, dir).map(_.name) == Seq("v"))
    // and the guard the race would have bypassed holds
    intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(slice(100, 110), dir)
    }
  }

  test("metadata guards hold against an EMPTY predecessor manifest") {
    val dir = tmpDir("msnapemptyguard") + "/t"
    ManifestSnapshots.writeFull(slice(0, 30), dir)
    ManifestSnapshots.addColumn(spark, dir, "score", "double", None)
    ManifestSnapshots.dropColumn(spark, dir, "v")
    // wipe every row: the latest manifest is EMPTY, but the evolution
    // metadata still governs writers — a delta resurrecting the dropped
    // name (or retyping the declared column) is exactly as unsound here
    ManifestSnapshots.deleteWhere(spark, dir, lit(true))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 0)
    val resurrect = intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(slice(0, 5), dir) // carries dropped "v"
    }
    assert(resurrect.getMessage.contains("dropped"), resurrect.getMessage)
    val retype = intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(
        (0L until 5L).toDF("id").withColumn("score", lit(1)), dir) // int, declared double
    }
    assert(retype.getMessage.contains("retype"), retype.getMessage)
    // the sound shapes still land on the empty table
    ManifestSnapshots.appendDelta(
      (0L until 5L).toDF("id").withColumn("score", lit(1.5)), dir)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 5)
  }

  test("repartitionData: layout evolves as a version, old layouts time-travel, writers rebind") {
    val dir = tmpDir("msnaprepart") + "/t"
    val df = slice(0, 120)
      .withColumn("p", (col("id") % 3).cast("string"))
      .withColumn("q", (col("id") % 2).cast("string"))
    ManifestSnapshots.writeFull(df, dir, Seq("p"))
    val before = ManifestSnapshots.readLatest(spark, dir)
      .select("id", "v", "p", "q").collect().toSet
    // unknown partition column refused before anything lands
    intercept[IllegalArgumentException] {
      ManifestSnapshots.repartitionData(spark, dir, Seq("nope"))
    }
    // evolve p-layout -> q-layout: content identical under the new paths
    val v2 = ManifestSnapshots.repartitionData(spark, dir, Seq("q"))
    assert(ManifestSnapshots.readLatest(spark, dir)
      .select("id", "v", "p", "q").collect().toSet == before,
      "partition evolution changed content")
    // time travel: the pre-evolution version still reads its own layout
    assert(ManifestSnapshots.read(spark, dir, v2 - 1)
      .select("id", "v", "p", "q").collect().toSet == before)
    // writers REBIND to the new layout atomically with the commit: the
    // old column (and any other wrong column) is refused by name — not
    // silently admitted to read back as NULLs through the union
    val wrongCol = intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(
        slice(200, 210).withColumn("p", lit("9")).withColumn("q", lit("0")),
        dir, Seq("p"))
    }
    assert(wrongCol.getMessage.contains("partition columns"), wrongCol.getMessage)
    intercept[IllegalArgumentException] { // unpartitioned delta: shape guard
      ManifestSnapshots.appendDelta(slice(200, 210)
        .withColumn("p", lit("9")).withColumn("q", lit("0")), dir)
    }
    ManifestSnapshots.appendDelta(
      slice(200, 210).withColumn("p", lit("9")).withColumn("q", lit("0")),
      dir, Seq("q"))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 130)
    // and the evolution composes the other way: back to unpartitioned,
    // the partition column surviving as a data column
    ManifestSnapshots.repartitionData(spark, dir, Nil)
    val flat = ManifestSnapshots.readLatest(spark, dir)
    assert(flat.count() == 130 && flat.columns.contains("q"))
    intercept[IllegalArgumentException] { // partitioned delta now refused
      ManifestSnapshots.appendDelta(slice(300, 305)
        .withColumn("p", lit("9")).withColumn("q", lit("0")), dir, Seq("q"))
    }
  }

  test("restore: forward-commit undo — content rewinds, history and slots don't") {
    val dir = tmpDir("msnaprestore") + "/t"
    ManifestSnapshots.writeFull(slice(0, 40), dir)          // v1 (good)
    ManifestSnapshots.appendDelta(slice(40, 500), dir)      // v2 (bad load)
    ManifestSnapshots.appendDelta(slice(500, 510), dir)     // v3 (bad load)
    val v4 = ManifestSnapshots.restore(spark, dir, 1L)
    assert(v4 == 4L, "restore must be a FORWARD commit, not a rewind")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 40)
    // history preserved: the bad versions still time-travel until vacuum
    assert(ManifestSnapshots.read(spark, dir, 3L).count() == 510)
    // CDC across the restore reports a rewrite, not silent row loss
    assert(ManifestSnapshots.removedEntries(spark, dir, 3L, v4).nonEmpty)
    // the chain continues from the restored content
    ManifestSnapshots.appendDelta(slice(40, 50), dir)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 50)
    // restoring to the current version is a no-op; ahead-of-head refused
    assert(ManifestSnapshots.restore(spark, dir, 5L) == 5L)
    intercept[IllegalArgumentException] {
      ManifestSnapshots.restore(spark, dir, 99L)
    }
    // a vacuumed target fails BEFORE committing anything
    ManifestSnapshots.vacuum(spark, dir, keep = 1)
    val ex = intercept[RuntimeException] {
      ManifestSnapshots.restore(spark, dir, 2L)
    }
    assert(ex.getMessage.contains("vacuumed") ||
      ex.getMessage.contains("reclaimed"), ex.getMessage)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 50,
      "failed restore must leave the table untouched")
  }

  test("restore across a partition evolution rebinds writers to the restored layout") {
    val dir = tmpDir("msnaprestoreevo") + "/t"
    val df = slice(0, 60)
      .withColumn("p", (col("id") % 3).cast("string"))
      .withColumn("q", (col("id") % 2).cast("string"))
    ManifestSnapshots.writeFull(df, dir, Seq("p"))                 // v1: p-layout
    ManifestSnapshots.repartitionData(spark, dir, Seq("q"))       // v2: q-layout
    ManifestSnapshots.appendDelta(
      slice(60, 70).withColumn("p", lit("9")).withColumn("q", lit("0")),
      dir, Seq("q"))                                              // v3
    // undo the evolution era entirely: back to v1's files and layout
    val v4 = ManifestSnapshots.restore(spark, dir, 1L)
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 60)
    // writers now rebind to the RESTORED layout: q-shaped deltas refused,
    // p-shaped land — the shape contract follows the manifest, not history
    intercept[IllegalArgumentException] {
      ManifestSnapshots.appendDelta(slice(100, 105)
        .withColumn("p", lit("9")).withColumn("q", lit("0")), dir, Seq("q"))
    }
    ManifestSnapshots.appendDelta(slice(100, 105)
      .withColumn("p", lit("9")).withColumn("q", lit("0")), dir, Seq("p"))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 65)
    // and the evolution era still time-travels intact
    assert(ManifestSnapshots.read(spark, dir, 3L).count() == 70)
    assert(v4 == 4L)
  }

  test("vacuum maxAgeHours: young versions survive past the keep window until they age out") {
    val dir = tmpDir("msnapvacage") + "/t"
    ManifestSnapshots.writeFull(slice(0, 30), dir)     // v1
    ManifestSnapshots.appendDelta(slice(30, 40), dir)  // v2
    ManifestSnapshots.appendDelta(slice(40, 50), dir)  // v3
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mpath(v: Long) = new org.apache.hadoop.fs.Path(s"$dir/manifests/m-$v.json")
    // time-based retention: all fresh -> NOTHING reclaimed even at keep=1
    val (d0, _) = ManifestSnapshots.vacuum(spark, dir, keep = 1,
      maxAgeHours = Some(72))
    assert(d0.isEmpty, s"fresh versions expired: $d0")
    assert(ManifestSnapshots.versions(spark, dir) == Seq(1L, 2L, 3L))
    // age v1 past the 72h cutoff; v2 stays young -> only v1 expires
    hfs.setTimes(mpath(1L), System.currentTimeMillis() - 73L * 3600 * 1000, -1)
    val (d1, _) = ManifestSnapshots.vacuum(spark, dir, keep = 1,
      maxAgeHours = Some(72))
    assert(d1 == Seq(1L), s"expected exactly v1 expired: $d1")
    assert(ManifestSnapshots.versions(spark, dir) == Seq(2L, 3L))
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 50)
    // count-based floor still binds: aged-but-within-keep survives
    hfs.setTimes(mpath(3L), System.currentTimeMillis() - 90L * 3600 * 1000, -1)
    val (d2, _) = ManifestSnapshots.vacuum(spark, dir, keep = 2,
      maxAgeHours = Some(72))
    assert(d2.isEmpty, "keep floor violated by age-based expiry")
  }

  test("vacuum: declaring versions are retention-exempt; crashed decls sweep once aged") {
    val dir = tmpDir("msnapvacdecl") + "/t"
    ManifestSnapshots.writeFull(slice(0, 50), dir)                    // v1
    val dv = ManifestSnapshots.addColumn(spark, dir, "bonus", "int", Some("7")) // v2
    ManifestSnapshots.appendDelta(slice(50, 60), dir)                 // v3
    ManifestSnapshots.appendDelta(slice(60, 70), dir)                 // v4
    ManifestSnapshots.vacuum(spark, dir, keep = 1)
    // the declaring version outlives the keep window: vacuuming its
    // manifest would make schemaLines drop the declaration (the
    // crashed-decl guard keys on the manifest name) and silently revert
    // the schema
    assert(ManifestSnapshots.versions(spark, dir).contains(dv),
      "declaring version was vacuumed; its declaration would vanish")
    assert(ManifestSnapshots.declaredColumns(spark, dir).map(_.name) == Seq("bonus"))
    val out = ManifestSnapshots.readLatest(spark, dir)
    assert(out.count() == 70 && out.filter(col("bonus") === 7).count() == 70)
    // a crashed declaration (no manifest ever) is debris: kept fresh,
    // swept once aged, un-burning its slot
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ghost = new org.apache.hadoop.fs.Path(s"$dir/_schema/decl-90")
    val o = hfs.create(ghost, true)
    o.write("ghost\tint\t90\t-\n".getBytes("UTF-8"))
    o.close()
    ManifestSnapshots.vacuum(spark, dir, keep = 1)
    assert(hfs.exists(ghost), "fresh crashed decl swept inside the grace window")
    hfs.setTimes(ghost, System.currentTimeMillis() - 7L * 3600 * 1000, -1)
    ManifestSnapshots.vacuum(spark, dir, keep = 1)
    assert(!hfs.exists(ghost), "aged crashed decl survived vacuum")
    assert(ManifestSnapshots.declaredColumns(spark, dir).map(_.name) == Seq("bonus"))
  }

  test("history: versions, file and row counts from manifests alone") {
    val dir = tmpDir("msnaphist") + "/t"
    ManifestSnapshots.writeFull(slice(0, 120), dir)
    ManifestSnapshots.appendDelta(slice(120, 150), dir)
    val h = ManifestSnapshots.history(spark, dir)
      .orderBy("version")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(h.map(_._1).toSeq == Seq(1L, 2L))
    assert(h(0)._3 == 120 && h(1)._3 == 150,
      s"manifest row-count statistics wrong: ${h.toSeq}")
    assert(!h(0)._4 && h(1)._4, "only the pointer's version is committed")
  }

  test("WAP publish races appends across PROCESSES: fast-forward only, no lost rows") {
    val dir = tmpDir("msnapxwap") + "/t"
    ManifestSnapshots.writeFull(Seq(("seed", 0L)).toDF("k", "v").coalesce(1), dir)
    val n = 8
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
    val jvmArgs = inArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports")
        Seq(a, inArgs(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports="))
        Seq(a)
      else Nil
    }
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.ForkedCommitterMain", dir, "child", n.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(
      new java.io.File(tmpDir("msnapxwap-log"), "child.log")))
    val child = pb.start()
    // this process runs WAP loads while the child appends: a publish
    // whose base moved fails with CME (fast-forward only — never a
    // silent merge that could drop the child's rows), and the load
    // RE-STAGES against the new head. Exactly 3 loads must land exactly
    // once each.
    var published = 0
    var attempt = 0
    while (published < 3 && attempt < 200) {
      val name = s"wapx-$published-$attempt"
      attempt += 1
      ManifestSnapshots.stageBranch(spark, dir, name,
        Seq((s"wap-$published", published.toLong)).toDF("k", "v").coalesce(1))
      try {
        ManifestSnapshots.publishBranch(spark, dir, name)
        published += 1
      } catch {
        case _: java.util.ConcurrentModificationException =>
          ManifestSnapshots.dropBranch(spark, dir, name)
      }
    }
    assert(published == 3, s"WAP loads starved after $attempt attempts")
    assert(child.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
      "forked committer did not finish")
    assert(child.exitValue() == 0, "forked committer failed — see child.log")
    val rows = ManifestSnapshots.readLatest(spark, dir)
    assert(rows.filter(col("k").startsWith("child-")).count() == n,
      "a WAP publish overwrote a concurrent append")
    assert(rows.filter(col("k").startsWith("wap-")).count() == 3,
      "a WAP load was lost or duplicated")
    assert(ManifestSnapshots.branches(spark, dir).isEmpty,
      "every decided branch marker must be gone")
  }

  test("WAP branch: staged rows invisible on main, audit reads them, publish is O(metadata)") {
    val dir = tmpDir("msnapwap") + "/t"
    val v1 = ManifestSnapshots.writeFull(slice(0, 100), dir)
    val parent = ManifestSnapshots.stageBranch(spark, dir, "audit1", slice(100, 160))
    assert(parent == v1)
    // WRITE landed, main blind to it
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 100)
    assert(ManifestSnapshots.versions(spark, dir) == Seq(v1))
    assert(ManifestSnapshots.branches(spark, dir) == Seq("audit1" -> v1))
    // AUDIT surface = parent + staged rows, exactly
    assert(ManifestSnapshots.readBranch(spark, dir, "audit1").count() == 160)
    // PUBLISH: one manifest commit, no data rewrite — the staged files'
    // paths appear verbatim in the published version
    val before = ManifestSnapshots.readBranch(spark, dir, "audit1")
      .select("id").as[Long].collect().toSet
    val v2 = ManifestSnapshots.publishBranch(spark, dir, "audit1")
    assert(ManifestSnapshots.readLatest(spark, dir)
      .select("id").as[Long].collect().toSet == before)
    assert(ManifestSnapshots.branches(spark, dir).isEmpty,
      "published branch marker must be dropped")
    // time travel: the parent version still reads its pre-publish image
    assert(ManifestSnapshots.read(spark, dir, v1).count() == 100)
    assert(ManifestSnapshots.read(spark, dir, v2).count() == 160)
  }

  test("WAP publish is fast-forward only: a main commit after staging forces re-stage") {
    val dir = tmpDir("msnapwapff") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    ManifestSnapshots.stageBranch(spark, dir, "b", slice(100, 150))
    // main moves while the audit runs
    ManifestSnapshots.appendDelta(slice(1000, 1010), dir)
    intercept[java.util.ConcurrentModificationException] {
      ManifestSnapshots.publishBranch(spark, dir, "b")
    }
    // the staged branch is intact for inspection; dropping it abandons
    // the rows without touching main
    assert(ManifestSnapshots.readBranch(spark, dir, "b").count() == 150)
    ManifestSnapshots.dropBranch(spark, dir, "b")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 110)
    assert(ManifestSnapshots.branches(spark, dir).isEmpty)
  }

  test("WAP rebase: a conflicted branch re-parents onto the head, data files untouched") {
    val dir = tmpDir("msnapwapreb") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    ManifestSnapshots.stageBranch(spark, dir, "b", slice(100, 150))
    val stagedPaths = ManifestSnapshots.branchInfo(spark, dir, "b").get._2
      .map(_.path).toSet
    // main moves: publish conflicts, rebase recovers WITHOUT a re-stage
    ManifestSnapshots.appendDelta(slice(1000, 1010), dir)
    intercept[java.util.ConcurrentModificationException] {
      ManifestSnapshots.publishBranch(spark, dir, "b")
    }
    val newParent = ManifestSnapshots.rebaseBranch(spark, dir, "b")
    assert(newParent == ManifestSnapshots.latestVersion(spark, dir).get)
    // the branch's fresh files are the SAME paths — no data rewrite
    val rebasedPaths = ManifestSnapshots.branchInfo(spark, dir, "b").get._2
      .map(_.path).toSet
    assert(stagedPaths.subsetOf(rebasedPaths), "rebase rewrote staged files")
    // the rebased state now includes the interleaved append
    assert(ManifestSnapshots.readBranch(spark, dir, "b").count() == 160)
    val v = ManifestSnapshots.publishBranch(spark, dir, "b")
    assert(ManifestSnapshots.read(spark, dir, v).count() == 160)
    // a published-but-marker-surviving branch is refused (no double refs)
    ManifestSnapshots.stageBranch(spark, dir, "c", slice(2000, 2010))
    ManifestSnapshots.publishBranch(spark, dir, "c", dropMarker = false)
    intercept[IllegalArgumentException] {
      ManifestSnapshots.rebaseBranch(spark, dir, "c")
    }
    ManifestSnapshots.dropBranch(spark, dir, "c")
  }

  test("vacuum spares a live branch's staged files AND its aged-out parent; drop releases them") {
    val dir = tmpDir("msnapwapvac") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    ManifestSnapshots.stageBranch(spark, dir, "keepme", slice(100, 130))
    // push the parent out of the keep window
    ManifestSnapshots.appendDelta(slice(200, 210), dir)
    ManifestSnapshots.appendDelta(slice(210, 220), dir)
    ManifestSnapshots.vacuum(spark, dir, keep = 1, orphanGraceHours = 0)
    // the branch still reads every row it staged — inherited parent
    // files and its own data dirs both survived the sweep
    assert(ManifestSnapshots.readBranch(spark, dir, "keepme").count() == 130)
    // audit failed: drop, then the same sweep reclaims the staged dirs
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs() = hfs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .count(_.isDirectory)
    val withBranch = dataDirs()
    ManifestSnapshots.dropBranch(spark, dir, "keepme")
    ManifestSnapshots.vacuum(spark, dir, keep = 1, orphanGraceHours = 0)
    assert(dataDirs() < withBranch,
      "dropped branch's staged data dirs must be orphan-swept")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 120)
  }

  test("stageBranch enforces the writer contracts; torn branch markers fail closed") {
    val dir = tmpDir("msnapwapguard") + "/t"
    ManifestSnapshots.writeFull(slice(0, 50), dir)
    // retype refused BEFORE any data lands
    intercept[IllegalArgumentException] {
      ManifestSnapshots.stageBranch(spark, dir, "bad",
        (50 until 60).toDF("id").withColumn("v", lit("not a long")))
    }
    assert(ManifestSnapshots.branches(spark, dir).isEmpty)
    // a torn marker (half-written crash debris) is invisible and unreadable
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(s"$dir/branches/torn1")
    val out = hfs.create(torn, true)
    out.write("1\n{\"version\":1,\"files\":[{\"path".getBytes("UTF-8")); out.close()
    assert(ManifestSnapshots.branches(spark, dir).isEmpty)
    intercept[RuntimeException] {
      ManifestSnapshots.readBranch(spark, dir, "torn1")
    }
  }

  test("publishBranch of an empty-table branch fast-forward-checks under the commit lock") {
    val dir = tmpDir("msnapwap0") + "/t"
    // stage against the EMPTY table: parent version 0
    ManifestSnapshots.stageBranch(spark, dir, "first", slice(0, 40))
    // a concurrent writer lands v1 between stage and publish — the
    // publish must raise the SAME fast-forward conflict as any base
    // movement (committing would supersede v1, silently dropping its
    // files from table state); expectedBase=Some(0) carries the
    // emptiness check INSIDE commitLoop's locked section
    ManifestSnapshots.writeFull(slice(100, 150), dir)
    intercept[java.util.ConcurrentModificationException] {
      ManifestSnapshots.publishBranch(spark, dir, "first")
    }
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 50,
      "the conflicting publish must leave the winner's commit intact")
    // standard conflict recovery applies: rebase, then publish lands both
    ManifestSnapshots.rebaseBranch(spark, dir, "first")
    ManifestSnapshots.publishBranch(spark, dir, "first")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 90)
    // and the uncontended empty-table publish still fast-forwards to v1
    val dir2 = tmpDir("msnapwap0b") + "/t"
    ManifestSnapshots.stageBranch(spark, dir2, "first", slice(0, 10))
    assert(ManifestSnapshots.publishBranch(spark, dir2, "first") >= 1L)
    assert(ManifestSnapshots.readLatest(spark, dir2).count() == 10)
  }

  test("rebaseBranch refuses when ANY staged file survives in head (partial rewrite)") {
    val dir = tmpDir("msnapwapany") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    // stage TWO files with a known id split so a pruned MERGE can later
    // rewrite exactly one of them
    val parentPaths = ManifestSnapshots.entriesOf(spark, dir,
      ManifestSnapshots.latestVersion(spark, dir).get).map(_.path).toSet
    ManifestSnapshots.stageBranch(spark, dir, "b",
      slice(100, 150).repartitionByRange(2, col("id")))
    val staged = ManifestSnapshots.branchInfo(spark, dir, "b").get._2
      .map(_.path).toSet -- parentPaths
    assert(staged.size == 2, s"expected 2 staged files, got $staged")
    // crash shape: published, marker survives
    ManifestSnapshots.publishBranch(spark, dir, "b", dropMarker = false)
    // a zone-map-pruned MERGE rewrites only the file holding id 100 —
    // the OTHER staged file stays in head by reference
    ManifestSnapshots.mergeByKey(spark, dir,
      Seq((100L, 999L)).toDF("id", "v"), Seq("id"))
    val head = ManifestSnapshots.latestVersion(spark, dir).get
    val headPaths = ManifestSnapshots.entriesOf(spark, dir, head).map(_.path).toSet
    assert(!staged.subsetOf(headPaths) && staged.exists(headPaths),
      "setup: exactly a PROPER subset of staged files should survive the merge")
    // the r15 all-present guard missed this shape and would have rebased —
    // double-referencing the surviving file's rows; ANY-present refuses
    intercept[IllegalArgumentException] {
      ManifestSnapshots.rebaseBranch(spark, dir, "b")
    }
    ManifestSnapshots.dropBranch(spark, dir, "b")
    assert(ManifestSnapshots.readLatest(spark, dir).count() == 150)
  }

  test("branchPublishEvidence: history walk survives compaction, fails closed on vacuumed slots") {
    val dir = tmpDir("msnapwapev") + "/t"
    ManifestSnapshots.writeFull(slice(0, 100), dir)
    ManifestSnapshots.stageBranch(spark, dir, "b", slice(100, 150))
    // unpublished + head moved by an append: provably NOT published
    ManifestSnapshots.appendDelta(slice(200, 220), dir)
    assert(ManifestSnapshots.branchPublishEvidence(spark, dir, "b")
      .contains(false))
    // publish (marker kept), then compact EVERYTHING: no staged path
    // remains in head, so a subset-of-head probe would answer
    // "unpublished" — the manifest-history walk still finds the publish
    ManifestSnapshots.rebaseBranch(spark, dir, "b")
    ManifestSnapshots.publishBranch(spark, dir, "b", dropMarker = false)
    ManifestSnapshots.compactData(spark, dir)
    val head = ManifestSnapshots.latestVersion(spark, dir).get
    val headPaths = ManifestSnapshots.entriesOf(spark, dir, head).map(_.path).toSet
    val staged = ManifestSnapshots.branchInfo(spark, dir, "b").get._2
      .map(_.path).toSet
    assert(!staged.exists(headPaths),
      "setup: compaction should have rewritten every staged file out of head")
    assert(ManifestSnapshots.branchPublishEvidence(spark, dir, "b")
      .contains(true))
    // a DECL-BURNT slot in the range is accounted for, not ambiguous:
    // nextSlot skips past decl-<v> schema slots, which never carry a
    // manifest — the walk must treat Absent-with-decl as a non-commit
    // and keep walking (here: still Some(true), the publish evidence
    // lives in a later slot)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = ManifestSnapshots.branchInfo(spark, dir, "b").get._1
    val declBurnt = new org.apache.hadoop.fs.Path(
      s"$dir/_schema/decl-${ManifestSnapshots.latestVersion(spark, dir).get + 1}")
    val out = hfs.create(declBurnt, true); out.write("x".getBytes); out.close()
    ManifestSnapshots.appendDelta(slice(300, 310), dir) // lands PAST the burn
    assert(ManifestSnapshots.branchPublishEvidence(spark, dir, "b")
      .contains(true), "a decl-burnt slot must not degrade the evidence")
    hfs.delete(declBurnt, false)
    // a vacuumed slot inside (parent, head] makes the answer UNPROVABLE:
    // the walk must return None (fail closed), never guess either way
    hfs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/manifests/m-${parent + 1}.json"), false)
    assert(ManifestSnapshots.branchPublishEvidence(spark, dir, "b").isEmpty)
    ManifestSnapshots.dropBranch(spark, dir, "b")
  }
}
