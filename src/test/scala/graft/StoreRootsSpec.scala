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

  test("two PROCESSES race the publish: one winner, no orphan marker, loser swept") {
    // The in-JVM race above shares one FileSystem instance; two real
    // processes share only the directory — rename arbitration, the
    // takeover path and the nested-rename detection must all hold with
    // nothing but the on-disk state in common (the same promotion
    // ManifestSnapshotSpec gives the commit lock via ForkedCommitterMain).
    val parent = tmpDir("storexproc")
    val root = parent + "/s1"
    val sync = tmpDir("storexproc-sync")
    val resultFile = s"$sync/child-result"

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
    val jvmArgs = inArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports") Seq(a, inArgs(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports="))
        Seq(a)
      else Nil
    }
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.ForkedStoreBuilderMain", root, "child", sync, resultFile)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(
      new java.io.File(sync, "child.log")))
    val child = pb.start()

    // wait until the child is PAST JVM startup and poised at the build,
    // then release both sides into the race together
    val deadline = System.currentTimeMillis() + 120000
    while (!new java.io.File(sync, "ready-child").exists() &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(new java.io.File(sync, "ready-child").exists(),
      "forked builder never came up — see child.log")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(sync, "go"))

    val parentWon =
      try StoreRoots.ensure(spark, root) { tmp =>
        (0L until 20L).toDF("id").withColumn("builder", lit("parent"))
          .write.parquet(tmp)
        Thread.sleep(300)
      } catch { case _: Throwable => false }

    assert(child.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
      "forked builder did not finish")
    assert(child.exitValue() == 0,
      "forked builder saw an unREADY store — see child.log")
    val childWon = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(resultFile)), "UTF-8").trim.toBoolean

    // exactly one process may claim the publish
    assert(Seq(parentWon, childWon).count(identity) == 1,
      s"publish arbitration across processes: parent=$parentWon child=$childWon")
    assert(StoreRoots.isReady(spark, root))
    val out = spark.read.parquet(root)
    assert(out.count() == 20)
    // one builder's content end-to-end, never a mix of both processes
    assert(out.select("builder").distinct().count() == 1)
    val winner = out.select("builder").head().getString(0)
    assert((winner == "parent") == parentWon,
      s"content is $winner's but the win was claimed by the other process")
    // the loser's copy is swept: no sibling build dirs, none nested, and
    // exactly one READY marker (the winner's)
    val leftovers = hfs(parent).globStatus(
      new org.apache.hadoop.fs.Path(parent, "s1.build-*"))
    assert(leftovers.isEmpty, s"sibling build dirs left: ${leftovers.toSeq}")
    val nested = hfs(root).listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.getPath.getName.startsWith("s1.build-"))
    assert(nested.isEmpty, s"nested build dirs left: ${nested.toSeq}")
    val markers = hfs(root).listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.getPath.getName == "_STORE_READY")
    assert(markers.length == 1)
  }
}
