package graft

import graft.core.StoreRoots
import org.apache.spark.sql.functions._

/** Atomic store-root publication (core/StoreRoots): the serving stores'
  * build-then-rename discipline. Pins
  *  (1) idempotence — a published root is never rebuilt,
  *  (2) rebuild of unmarked roots — a directory without the readiness
  *      marker (pre-discipline build, torn publish) is not trusted,
  *  (3) crash safety — a builder that dies mid-build leaves nothing a
  *      reader consults; the retry rebuilds cleanly,
  *  (4) the publish race — concurrent builders end with exactly one
  *      complete store and no leftover build directories.
  */
class StoreRootsSpec extends SparkSpec {

  import spark.implicits._

  private def hfs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("published root is never rebuilt; unmarked root is") {
    val root = tmpDir("storeroots") + "/s1"
    var builds = 0
    def build(tmp: String): Unit = {
      builds += 1
      (0L until 10L).toDF("id").write.parquet(tmp)
    }
    assert(StoreRoots.ensure(spark, root)(build))
    assert(!StoreRoots.ensure(spark, root)(build))
    assert(builds == 1)
    assert(spark.read.parquet(root).count() == 10)

    // drop the marker: the directory is no longer trusted and rebuilds
    hfs(root).delete(new org.apache.hadoop.fs.Path(root, "_STORE_READY"), false)
    assert(StoreRoots.ensure(spark, root)(build))
    assert(builds == 2)
    assert(StoreRoots.isReady(spark, root))
  }

  test("a crashed build publishes nothing; the retry rebuilds") {
    val root = tmpDir("storecrash") + "/s1"
    intercept[RuntimeException] {
      StoreRoots.ensure(spark, root) { tmp =>
        (0L until 5L).toDF("id").write.parquet(tmp) // half a build...
        throw new RuntimeException("builder died")
      }
    }
    assert(!StoreRoots.isReady(spark, root))
    assert(!hfs(root).exists(new org.apache.hadoop.fs.Path(root)),
      "a crashed build must not leave a root a reader would list")

    assert(StoreRoots.ensure(spark, root)(tmp =>
      (0L until 7L).toDF("id").write.parquet(tmp)))
    assert(spark.read.parquet(root).count() == 7)
  }

  test("concurrent builders: one complete store, no build-dir leftovers") {
    val parent = tmpDir("storerace")
    val root = parent + "/s1"
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        start.await()
        try results.add(StoreRoots.ensure(spark, root) { tmp =>
          (0L until 20L).toDF("id").withColumn("builder", lit(i))
            .write.parquet(tmp)
          Thread.sleep(200) // widen the overlap window
        })
        catch { case _: Throwable => results.add(false) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(60000))

    assert(StoreRoots.isReady(spark, root))
    // exactly ONE call may report having published (the nested-rename
    // racer must not also claim the win)
    assert(results.toArray(Array.empty[java.lang.Boolean]).count(_ == true) == 1,
      s"exactly one builder must win: $results")
    val out = spark.read.parquet(root)
    assert(out.count() == 20)
    // one builder's content, never a mix
    assert(out.select("builder").distinct().count() == 1)
    // no leftover build dirs beside or nested inside the root
    val leftovers = hfs(parent).globStatus(
      new org.apache.hadoop.fs.Path(parent, "s1.build-*"))
    assert(leftovers.isEmpty, s"sibling build dirs left: ${leftovers.toSeq}")
    val nested = hfs(root).listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.getPath.getName.startsWith("s1.build-"))
    assert(nested.isEmpty, s"nested build dirs left: ${nested.toSeq}")
  }
}
