ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "walletandriskyfeaturesdatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify mains print a machine-parsed JSON line; sbt's default
// LoggedOutput strategy prefixes every forked-stdout line with "[info] ",
// which breaks a strict JSON parse of the captured tail. Pass the child's
// stdout through verbatim, and drop the "[success] Total time ..." epilogue
// so the JSON line stays the LAST line of output.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap + collector for the forked local[N] JVM (driver AND all executor
// task slots share it). The old 8g default left ~150 MB of execution
// memory per concurrent task at 32 cores and G1's region bookkeeping
// dominated allocation-heavy stages; 24g + the throughput collector
// measured -20% wall on the 12 heaviest bench queries (r18 A/B: 34.1 s
// -> 27.4 s best-of-3, every query improved; 48g was no better, 8g with
// ParallelGC full-GC'd g_kcore to 9.2 s). Host has 128 GiB. On a real
// cluster this is executor sizing (spark.executor.memory), not a query
// change. SPARK_DRIVER_MEM / SPARK_GRAFT_JVM_OPTS still override.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))

// r19 (VERDICT item 2): the suite ran 26.5 min sequentially in ONE forked
// local[4] JVM on a 32-core host, so the driver's test budget killed it
// mid-run (r18 `tests_ok:false` with zero failures). Suites are
// independent — per-suite temp dirs, and the cross-process serving-store
// roots publish atomically by design (StoreRootsSpec pins that race with a
// real second JVM) — so split them into 4 forked JVMs run in parallel.
// The known-heavy suites are seeded first so no two share a group; each
// group JVM gets a modest heap (the fixtures are sf0.001) and its own
// derby home.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val n = 6
  val heavy = Seq("StreamingSpec", "QueriesSpec", "ManifestSnapshotSpec",
    "DomainPipelineSpec", "PlanSpec", "BasketStoreSpec", "MiningPropertySpec",
    "CacheDisciplineSpec").zipWithIndex.toMap
  val sorted = tests.sortBy(t => (heavy.getOrElse(t.name.split('.').last, 999), t.name))
  val opts = (Test / javaOptions).value.toVector
  sorted.zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1).map { case (i, ts) =>
    Tests.Group(s"group$i", ts.map(_._1).toSeq,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(
        opts ++ Vector("-Xmx12g",
          // shuffle/spill files on tmpfs: /tmp is disk-backed here and six
          // concurrent JVMs' tiny shuffle files turn into seek-bound sys
          // time (measured 59 min sys on the 4-group run)
          "-Dspark.local.dir=/dev/shm/graft-test-local",
          s"-Dderby.system.home=/tmp/graft-test-derby-$i"))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6), Tags.limitAll(10))
