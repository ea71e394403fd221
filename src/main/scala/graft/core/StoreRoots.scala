package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic publication for fingerprint-keyed serving-store roots (the
  * z-order / bloom-index / manifest-snapshot stores under the shared
  * tmpdir).
  *
  * The naive `if (!exists(root)) build(root)` has two failure modes the
  * r8 advice called out: a crash mid-build leaves a half-written root
  * that every later session trusts, and two concurrent JVMs on the same
  * fixture race the build with one reading the other's partial output.
  * Here a build always goes to a PRIVATE sibling directory and is
  * published by rename — the unit of visibility is the completed store:
  *
  *   - `_STORE_READY` is written inside the build dir LAST, so even a
  *     torn rename target is distinguishable from a completed one;
  *   - the loser of a publish race (or a builder whose rename landed
  *     NESTED inside the winner's root — Hadoop rename moves src INTO an
  *     existing dst directory) deletes its copy and reads the winner's;
  *   - a crashed build leaves only an orphaned `.build-*` sibling that no
  *     reader ever consults and any later builder sweeps.
  *
  * The bucketed catalog-backed stores (ANN / dedup / text index) publish
  * differently — their location is a catalog registration and their
  * partial states self-heal (TextIndexStore's stats snapshot) — so they
  * keep their own discipline; this helper is for plain-directory stores
  * whose readers trust the directory contents as a whole.
  */
object StoreRoots {

  private val ReadyMarker = "_STORE_READY"

  /** Canonical root for a fingerprint-keyed serving store under the
    * shared tmpdir — ONE home for the sanitization / format-version /
    * content-fingerprint keying every such store shares (a change to the
    * keying scheme must not need 14 call-site edits). */
  def rootFor(store: String, version: String, dir: String, fp: String): String =
    s"${System.getProperty("java.io.tmpdir")}/$store/$version/" +
      dir.replaceAll("[^a-zA-Z0-9]", "_") + s"_$fp"


  /** True when `root` holds a completely published store. */
  def isReady(spark: SparkSession, root: String): Boolean = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(rp, ReadyMarker))
  }

  /** Ensure `root` holds a completed store, running `build` against a
    * private directory and publishing atomically if nobody has yet.
    * Returns true when THIS call performed the build-and-publish. */
  def ensure(spark: SparkSession, root: String)(build: String => Unit): Boolean = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ready = fs.exists(new Path(rp, ReadyMarker))
    if (ready) return false
    // A root that exists WITHOUT the marker is a pre-discipline or torn
    // publish: rebuild it rather than trust partial contents. The
    // takeover is RENAME-BASED, not a delete — between our `ready` check
    // and the removal a racer may have completed a publish into rp, and
    // a plain delete would destroy that finished store (and fail its
    // in-flight readers). Renaming the suspect root aside first makes
    // the marker re-check atomic with the removal: if the moved-aside
    // copy turns out completed, it is put back (or, if yet another
    // publish landed meanwhile, simply dropped — rp is complete either
    // way) and no build runs.
    if (fs.exists(rp) && !ready) {
      val doomed = new Path(rp.getParent, rp.getName + ".doomed-" +
        java.util.UUID.randomUUID().toString.take(8))
      if (fs.rename(rp, doomed)) {
        if (fs.exists(new Path(doomed, ReadyMarker))) {
          // put the completed copy back — but Hadoop rename moves src
          // INTO an existing dst dir, so if a racer republished rp in
          // the meantime our rename "succeeds" by NESTING the doomed
          // copy inside the published root: detect and drop the nested
          // junk (rp is complete either way)
          val renamedBack = fs.rename(doomed, rp)
          val nested = new Path(rp, doomed.getName)
          if (fs.exists(nested)) fs.delete(nested, true): Unit
          if (renamedBack && ready) return false
          if (ready) { fs.delete(doomed, true); return false }
          // neither copy serves: fall through and rebuild from scratch
          fs.delete(doomed, true): Unit
        } else fs.delete(doomed, true): Unit // truly partial: discard
      }
      // rename failure: a concurrent takeover owns the suspect root;
      // proceed to build privately — publish arbitration below decides
    }
    fs.mkdirs(rp.getParent)
    // sweep orphaned tmp dirs of crashed builders (never consulted by
    // readers, reclaimed here so the shared tmpdir stays bounded) —
    // age-gated so a CONCURRENT builder's live tmp dir is never swept
    val staleBefore = System.currentTimeMillis() - 6L * 3600 * 1000
    // .build-* = crashed builders' private dirs; .doomed-* = takeover
    // dirs whose owner died between the rename-aside and the
    // delete/put-back — both never consulted by readers, both swept
    // age-gated so a LIVE racer's dir is never touched
    for (pat <- Seq(".build-*", ".doomed-*"))
      fs.globStatus(new Path(rp.getParent, rp.getName + pat))
        .filter(_.getModificationTime < staleBefore)
        .foreach(st => fs.delete(st.getPath, true))
    val tmpName = rp.getName + ".build-" +
      java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(rp.getParent, tmpName)
    build(tmp.toString)
    // the marker carries THIS builder's token so "did my rename publish"
    // is decidable after the fact — rename's return value alone cannot
    // distinguish a clean publish from a rename that landed NESTED
    // inside a racer's just-published root (Hadoop moves src INTO an
    // existing dst directory and still returns true)
    val mk = fs.create(new Path(tmp, ReadyMarker), true)
    try mk.write(tmpName.getBytes("UTF-8")) finally mk.close()
    val renamed = !fs.exists(rp) && fs.rename(tmp, rp)
    // Unconditionally drop any copy that did not BECOME the root: the
    // lost-race tmp still sitting beside it, or a nested rename target.
    // When we won cleanly both paths are gone and these are no-ops.
    fs.delete(tmp, true)
    fs.delete(new Path(rp, tmpName), true)
    require(ready, s"store publish failed for $root")
    val publishedToken =
      try {
        val in = fs.open(new Path(rp, ReadyMarker))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      } catch { case _: Exception => "" }
    renamed && publishedToken == tmpName
  }
}
