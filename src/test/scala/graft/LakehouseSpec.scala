package graft

import graft.core.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake-table primitives (SURVEY.md §2.1 S4-S8, S11, A1): anti-join append
  * dedup, MERGE upsert, watermarks, full-vs-incremental planning, and the
  * invariant the whole reference design exists to preserve — incremental
  * load ≡ full recompute. */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private def events: DataFrame =
    graft.core.Graft.events(spark, sf)

  test("antiJoinAppend deduplicates on keys across appends") {
    val path = tmpDir("aja")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Lakehouse.antiJoinAppend(spark, df, path, Seq("id"), Nil)
    // second batch overlaps on id=2; only id=3 should append
    val df2 = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    Lakehouse.antiJoinAppend(spark, df2, path, Seq("id"), Nil)
    val out = Lakehouse.read(spark, path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("antiJoinAppend dedups rows whose key columns contain NULL") {
    // plain EqualTo never matches NULL = NULL, so a NULL key column (e.g.
    // a NULL amount in the wallet-tx identity) would re-append on every
    // incremental cycle that re-selects the boundary block — the keys must
    // compare null-safely
    val path = tmpDir("aja-null")
    val df = Seq((1L, Option(2.0)), (2L, Option.empty[Double])).toDF("id", "amt")
    Lakehouse.antiJoinAppend(spark, df, path, Seq("id", "amt"), Nil)
    Lakehouse.antiJoinAppend(spark, df, path, Seq("id", "amt"), Nil)
    assert(Lakehouse.read(spark, path).count() == 2)
  }

  test("mergeUpsert updates matched keys and inserts new ones") {
    val path = tmpDir("merge")
    Lakehouse.ctas(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"), path)
    Lakehouse.mergeUpsert(spark, Seq((2L, 99.0), (3L, 30.0)).toDF("id", "bal"),
      path, Seq("id"))
    val out = Lakehouse.read(spark, path).as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
  }

  test("mergeUpsert NULL update survives (no coalesce resurrection)") {
    // Iceberg MERGE semantics: an update that legitimately sets a column to
    // NULL must win over the stored value.
    val path = tmpDir("mergenull")
    Lakehouse.ctas(Seq((1L, Option("keep")), (2L, Option("stale"))).toDF("id", "tag"), path)
    Lakehouse.mergeUpsert(spark,
      Seq((2L, Option.empty[String]), (3L, Option("new"))).toDF("id", "tag"),
      path, Seq("id"))
    val out = Lakehouse.read(spark, path).as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("keep"), 2L -> None, 3L -> Some("new")))
  }

  test("mergeFrames keepFromTarget holds a stored NULL against an update") {
    // a MERGE whose UPDATE SET omits a column keeps the stored value even
    // when that stored value is NULL — membership decides, not nullness
    // (coalesce(t.c, u.c) would resurrect the update's value)
    val target = Seq((1L, Option.empty[String], 1.0), (2L, Option("sym"), 2.0))
      .toDF("id", "token_symbol", "bal")
    val updates = Seq((1L, Option("overwrite"), 10.0), (3L, Option("new"), 3.0))
      .toDF("id", "token_symbol", "bal")
    val out = Lakehouse.mergeFrames(target, updates, Seq("id"),
        keepFromTarget = Set("token_symbol"))
      .as[(Long, Option[String], Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> ((None, 10.0)),        // matched: bal updated, stored NULL symbol kept
      2L -> ((Some("sym"), 2.0)),  // untouched target row
      3L -> ((Some("new"), 3.0)))) // insert takes the update's symbol
  }

  test("mergeUpsert with touchedPartitions rewrites only touched partitions") {
    val path = tmpDir("mergep")
    Lakehouse.ctas(
      Seq((1L, "p1", 1.0), (2L, "p2", 2.0)).toDF("id", "part", "bal"),
      path, Seq("part"))
    Lakehouse.mergeUpsert(spark,
      Seq((2L, "p2", 22.0)).toDF("id", "part", "bal"),
      path, Seq("id"), Seq("part"), touchedPartitions = Some(col("part") === "p2"))
    val out = Lakehouse.read(spark, path).select("id", "bal")
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 1.0, 2L -> 22.0))
  }

  test("watermark returns partition-pruned max") {
    val path = tmpDir("wm")
    val df = Seq((1L, "2024-01"), (5L, "2024-02"), (3L, "2024-02"))
      .toDF("id", "date_partition")
    Lakehouse.ctas(df, path, Seq("date_partition"))
    assert(Lakehouse.watermark(spark, path, "id").contains(5L))
    assert(Lakehouse.watermark(spark, tmpDir("missing") + "/nope", "id").isEmpty)
  }

  test("incremental load ≡ full recompute (the reference's core invariant)") {
    val full = events.select("event_id", "user_id", "value", "ts_us")
    // split at 3 different watermarks; loadIncremental(full half) then
    // incremental(rest) must equal one-shot ctas of everything
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val cut = full.stat.approxQuantile("ts_us", Array(q), 0.0).head.toLong
      val path = tmpDir(s"inc$q")
      // initial: table absent -> full() branch with only old rows
      Lakehouse.loadIncremental(spark, path, "ts_us", Nil, Seq("event_id"),
        full = () => full.filter(col("ts_us") <= cut),
        incremental = _ => fail("must take full branch"))
      // second run: table exists -> incremental() branch from the watermark,
      // overlapping 10% below the cut to exercise the anti-join dedup
      Lakehouse.loadIncremental(spark, path, "ts_us", Nil, Seq("event_id"),
        full = () => fail("must take incremental branch"),
        incremental = wm =>
          full.filter(col("ts_us") > lit(wm.toString.toLong - 86400000000L)))
      val got = Lakehouse.read(spark, path).as[(Long, Long, Double, Long)]
        .collect().toSet
      val want = full.as[(Long, Long, Double, Long)].collect().toSet
      assert(got == want, s"incremental != full at q=$q")
    }
  }

  test("compact preserves content while bounding file count") {
    val path = tmpDir("cmp")
    val df = events.select("event_id", "user_id").repartition(16)
    Lakehouse.ctas(df, path)
    val before = Lakehouse.read(spark, path).as[(Long, Long)].collect().toSet
    Lakehouse.compact(spark, path, Nil, targetFileMB = 256)
    val after = Lakehouse.read(spark, path).as[(Long, Long)].collect().toSet
    assert(after == before)
    val files = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 compacted file, got $files")
  }
}
