package graft

import scala.sys.process._

/** Catalog definitions must survive a driver restart (the reference's Glue
  * catalog contract): phase `write` registers a managed bucketed table and
  * an external table in a Hive/Derby metastore, then the JVM EXITS; phase
  * `read` runs in a brand-new JVM and must resolve both by name — with the
  * bucketing spec intact (bucket-key self-join plans zero shuffles). */
class CatalogPersistenceSpec extends SparkSpec {

  private def runPhase(phase: String, wh: String, ms: String): String = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val out = new StringBuilder
    // Spark's standard JDK17 module options (JavaModuleOptions) — Hive's
    // metastore client additionally reflects into java.net/java.io
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/jdk.internal.ref", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar"
    ).flatMap(m => Seq("--add-opens", s"$m=ALL-UNNAMED"))
    val cmd = Seq(java, "-cp", cp, "-Xmx2g",
      "--add-exports", "java.base/sun.nio.ch=ALL-UNNAMED") ++ opens ++
      Seq("graft.tools.CatalogCheck", phase, wh, ms, sf)
    val code = cmd ! ProcessLogger(l => out.append(l).append('\n'), _ => ())
    assert(code == 0, s"phase $phase exited $code:\n$out")
    out.toString
  }

  test("catalog (tables, location, bucketing) survives a JVM restart") {
    val wh = tmpDir("cat-wh")
    val ms = tmpDir("cat-ms") + "/metastore" // derby wants to create it
    val w = runPhase("write", wh, ms)
    assert(w.contains("WRITE_OK"), w)
    val r = runPhase("read", wh, ms)
    val ok = r.linesIterator.find(_.startsWith("CATALOG_OK"))
    assert(ok.isDefined, r)
    val Array(_, managed, external, shuffles) = ok.get.split(" ")
    assert(managed.toLong > 0, s"managed table empty after restart")
    assert(external.toLong > 0, s"external table empty after restart")
    assert(shuffles.toInt == 0,
      s"bucket metadata lost across restart: $shuffles shuffle(s) in bucket-key self-join")
  }
}
