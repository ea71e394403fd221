package graft

import graft.core.Lakehouse
import org.apache.spark.sql.functions._

/** Versioned snapshots (Lakehouse.writeSnapshot / readSnapshot /
  * readLatestSnapshot / vacuumSnapshots): time travel on plain parquet.
  * Pins the commit protocol — an uncommitted (crashed) write is invisible
  * to readers, the pointer wins when present, newest-complete wins when
  * it is not — and vacuum's never-the-committed-version contract. */
class SnapshotSpec extends SparkSpec {

  private def docs(n: Int) = spark.range(n).select(
    col("id"), (col("id") * 2).as("val"))

  test("write/read/time-travel: each commit is a new readable version") {
    val dir = tmpDir("snap") + "/t"
    val v1 = Lakehouse.writeSnapshot(docs(100), dir)
    val v2 = Lakehouse.writeSnapshot(docs(250), dir)
    assert(v1 == 1 && v2 == 2)
    assert(Lakehouse.latestSnapshotVersion(spark, dir).contains(2L))
    assert(Lakehouse.readLatestSnapshot(spark, dir).count() == 250)
    assert(Lakehouse.readSnapshot(spark, dir, 1).count() == 100)
  }

  test("a crashed (uncommitted) write is invisible; pointer-loss recovery picks newest complete") {
    val dir = tmpDir("snap") + "/t2"
    Lakehouse.writeSnapshot(docs(10), dir)
    Lakehouse.writeSnapshot(docs(20), dir)
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a writer that died mid-write: data dir without _SUCCESS
    docs(999).write.parquet(s"$dir/v=3")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v=3/_SUCCESS"), false)
    assert(Lakehouse.latestSnapshotVersion(spark, dir).contains(2L))
    assert(Lakehouse.readLatestSnapshot(spark, dir).count() == 20)
    // the next successful write does NOT reuse the crashed version number's
    // commit: it lands above it and the pointer moves only on completion
    val vNext = Lakehouse.writeSnapshot(docs(30), dir)
    assert(vNext >= 3)
    assert(Lakehouse.readLatestSnapshot(spark, dir).count() == 30)
    // pointer loss: delete _latest — readers fall back to newest complete
    fs.delete(new org.apache.hadoop.fs.Path(hp, "_latest"), false)
    assert(Lakehouse.readLatestSnapshot(spark, dir).count() == 30)
  }

  test("vacuum keeps the newest k and never the committed version") {
    val dir = tmpDir("snap") + "/t3"
    (1 to 4).foreach(i => Lakehouse.writeSnapshot(docs(i * 10), dir))
    val deleted = Lakehouse.vacuumSnapshots(spark, dir, keep = 2)
    assert(deleted == Seq(1L, 2L))
    assert(Lakehouse.readLatestSnapshot(spark, dir).count() == 40)
    assert(Lakehouse.readSnapshot(spark, dir, 3).count() == 30)
    intercept[Exception] { Lakehouse.readSnapshot(spark, dir, 1).count() }
    intercept[IllegalArgumentException] {
      Lakehouse.vacuumSnapshots(spark, dir, keep = 0)
    }
  }

  test("schema evolution: new columns appear as NULL for old rows; type changes refused") {
    import spark.implicits._
    val dir = tmpDir("evolve") + "/t"
    Lakehouse.appendEvolved(Seq((1L, "a")).toDF("id", "x"), dir)
    Lakehouse.appendEvolved(Seq((2L, "b", 9.5)).toDF("id", "x", "score"), dir)
    val all = Lakehouse.readEvolved(spark, dir)
    assert(all.columns.sorted.toSeq == Seq("id", "score", "x"))
    assert(all.count() == 2)
    assert(all.filter(col("id") === 1 && col("score").isNull).count() == 1)
    assert(all.filter(col("id") === 2 && col("score") === 9.5).count() == 1)
    // widening x to a different type on a SHARED column is refused loudly
    val ex = intercept[IllegalArgumentException] {
      Lakehouse.appendEvolved(Seq((3L, 7)).toDF("id", "x"), dir)
    }
    assert(ex.getMessage.contains("type changes"))
    // the refused write left the table intact
    assert(Lakehouse.readEvolved(spark, dir).count() == 2)
  }
}
