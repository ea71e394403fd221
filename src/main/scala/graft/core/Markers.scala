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
    // HDFS-like rename refuses an occupied destination: drop the old
    // marker first (readers between the delete and rename see "absent",
    // which every marker consumer treats as the conservative no-record)
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path)) fs.delete(tmp, false): Unit
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
