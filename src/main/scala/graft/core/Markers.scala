package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny single-value marker files (row-count records, file-set ledgers,
  * pointer hints): ONE home for the write-tmp-then-rename / read-or-None
  * idiom instead of a copy per store. Writes are atomic-visible (hidden
  * tmp beside the target, then rename — readers see old or new, never a
  * torn body on HDFS-like stores; POSIX rename overwrites, same
  * old-or-new result). Reads fail soft: absent, torn, or unreadable
  * markers return None — every caller treats that as "no record"
  * (conservative fallback), never as an error. */
object Markers {

  def write(spark: SparkSession, path: Path, body: String): Unit = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val tmp = new Path(path.getParent,
      s".${path.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // rename FIRST (POSIX overwrites in place — the old marker is never
    // destroyed ahead of its replacement); HDFS-like stores refuse an
    // occupied destination, so only then drop the old marker and retry
    // (readers between the delete and rename see "absent" = the
    // conservative no-record). A rename that STILL fails is logged: a
    // persistent marker-write failure silently demotes its consumers
    // (CDC discovery to watermark scans, appendedFraction pinned to
    // refresh-worthy) — an invisible performance regression otherwise.
    if (!fs.rename(tmp, path)) {
      if (fs.exists(path)) fs.delete(path, false)
      if (!fs.rename(tmp, path)) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"marker write failed: rename $tmp -> $path refused twice; " +
            "consumers of this marker fall back to their conservative " +
            "no-record path until a later write succeeds")
        fs.delete(tmp, false): Unit
      }
    }
  }

  def read(spark: SparkSession, path: Path): Option[String] = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else
      try {
        val in = fs.open(path)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      } catch { case _: Exception => None }
  }
}
