package graft

import org.apache.spark.sql.functions.{expr, lit}

/** Registry-wide smoke: every declared operator query runs at sf0.001,
  * returns rows, and the contract between `queries` and `oracleSql` holds
  * (names line up; per-query value parity is the driver's DuckDB diff —
  * tools/verify_local.py — not re-implemented here). */
class QueriesSpec extends SparkSpec {

  test("registry has no duplicate names and oracles only for declared queries") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every registered query carries an oracle — including f_uuid_tag,
    // whose oracle pins the uuid contract (format + uniqueness) rather
    // than the nondeterministic draws
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).isEmpty)
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs non-empty at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows — trivially passes the oracle")
    }
  }

  test("split leakage: crossing twin flagged once, in-split twins and singletons not") {
    import spark.implicits._
    // pick doc_ids whose md5 bucket lands each side of the 204/230 cuts so
    // the constructed corpus has a known split: one train/val twin pair
    // (must be flagged, exactly once, with jaccard 1.0), one train/train
    // twin pair (in-split dup — NOT leakage), and a val singleton.
    def bucket(id: Long): Int = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hx.substring(0, 2), 16)
    }
    val ids = (0L until 200L)
    val train = ids.filter(bucket(_) < 204)
    val eval = ids.filter(b => bucket(b) >= 204 && bucket(b) < 230)
    assert(train.size >= 3 && eval.size >= 2)
    val twin = "alpha beta gamma delta epsilon zeta"
    val other = "one two three four five six seven"
    val corpus = Seq(
      (train(0), twin), (eval(0), twin),    // crossing pair -> flagged
      (train(1), other), (train(2), other), // in-split pair -> silent
      (eval(1), "lone wolf text nothing shared here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("splitleak").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d_split_leakage")(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == Seq((eval(0), "val", 1L, 1.0)))
  }

  test("simhash hamming: exact twins drop to the min id, disjoint-vocab docs survive") {
    import spark.implicits._
    // three identical docs collapse to one signature -> the two higher ids
    // drop to keeper 10 at hamming 0; the disjoint-vocabulary docs sit ~16
    // bits away (deterministic md5 votes, same every run) and are kept
    val corpus = Seq(
      (0L, "zebra quark nimbus fjord waltz vex"),
      (1L, "apple orange banana cherry mango plum"),
      (10L, "the quick brown fox jumps over the lazy dog"),
      (20L, "the quick brown fox jumps over the lazy dog"),
      (30L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("simhham").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d_simhash_hamming")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((20L, 10L, 0L), (30L, 10L, 0L)))
  }

  test("hybrid rrf: a doc topping both rankings tops the fusion with rrf 2/61") {
    import spark.implicits._
    // query doc 0; candidate 10 is its exact twin in BOTH modalities
    // (same text, same embedding) -> lex_rank 1 and vec_rank 1, so fusion
    // MUST put it first with the maximum possible score 1/61 + 1/61
    val docRows = Seq(
      (0L, "alpha beta gamma delta"),
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta unrelated words"),
      (12L, "totally disjoint vocabulary here")).toDF("doc_id", "text")
    val embRows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (10L, Array(1.0f, 0.0f, 0.0f), 0),
      (11L, Array(0.0f, 1.0f, 0.0f), 0),
      (12L, Array(0.0f, 0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("hybrid").toString
    docRows.write.parquet(s"$dir/documents.parquet")
    embRows.write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann_hybrid_rrf")(spark, dir)
      .as[(Long, Int, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.head == (0L, 1, 10L, 1L, 1L, 1.0 / 61 + 1.0 / 61))
    assert(out.map(_._3).toSet == Set(10L, 11L, 12L))
  }

  test("butterfly count: hand-countable co-purchase graph, repeat purchases deduped") {
    import spark.implicits._
    // c1 buys {A,B} (A twice — the edge set must dedup), c2 buys {A,B},
    // c3 buys {A}: pair (1,2) shares 2 parts -> C(2,2)=1 butterfly;
    // (1,3) and (2,3) share 1 -> 0. Global total = 1 on every row.
    val orders = Seq((100L, 1L), (200L, 2L), (300L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((100L, 11L), (100L, 11L), (100L, 12L),
      (200L, 11L), (200L, 12L), (300L, 11L)).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("butterfly").toString
    orders.write.parquet(s"$dir/orders.parquet")
    lineitem.write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("g_butterfly")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Int)].collect().sortBy(_._6)
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1L, 1L, 1),
      (1L, 3L, 1L, 0L, 1L, 2),
      (2L, 3L, 1L, 0L, 1L, 3)))
  }

  test("keywords: rational tf-idf ranks doc-specific terms over shared ones") {
    import spark.implicits._
    // N=2: 'apple'/'cherry' are doc-unique (idf 2), 'banana' shared
    // (idf 1), 'the' is a stopword and must never appear
    val corpus = Seq(
      (0L, "apple apple banana the"),
      (1L, "banana cherry cherry the")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("keywords").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_keywords")(spark, dir)
      .as[(Long, Int, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (0L, 1, "apple", 2L, 1L, 4.0), (0L, 2, "banana", 1L, 2L, 1.0),
      (1L, 1, "cherry", 2L, 1L, 4.0), (1L, 2, "banana", 1L, 2L, 1.0)))
  }

  test("winsorize: exact integer-rank p5/p95 bounds, dup-heavy user uncapped") {
    import spark.implicits._
    // user 1: values 1..100 -> lo = 5th smallest = 5, hi = 95th = 95;
    // clamp 1..4 up (4 rows) and 96..100 down (5 rows):
    // sum = 4*5 + sum(5..95) + 5*95 = 20 + 4550 + 475 = 5045.
    // user 2: nine 1s + one 100 -> ceil(10/20)=1 keeps lo=1,
    // ceil(190/20)=10 keeps hi=100 — nothing clipped (rank math over the
    // cumulative counts, not distinct-value positions)
    val rows = (1 to 100).map(v => (v.toLong, 1L, v.toDouble)) ++
      (101 to 109).map(i => (i.toLong, 2L, 1.0)) :+ (110L, 2L, 100.0)
    val ev = rows.toDF("event_id", "user_id", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(event_id * 1000000)"))
      .withColumn("event_type", org.apache.spark.sql.functions.lit("t"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("winsor").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a22_winsorize")(spark, dir)
      .as[(Long, Double, Double, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 5.0, 95.0, 4L, 5L, 5045.0),
      (2L, 1.0, 100.0, 0L, 0L, 109.0)))
  }

  test("funnel: strict event order — a click before the first view never counts") {
    import spark.implicits._
    // user 1: click@10s, view@20s, click@30s, purchase@40s — stage 2 must
    // pick the 30s click (after the first view), NOT the 10s one;
    // user 2: purchase then view only — reaches stage 1, converts no further
    val rows = Seq(
      (1L, 1L, "click", 10L), (2L, 1L, "view", 20L),
      (3L, 1L, "click", 30L), (4L, 1L, "purchase", 40L),
      (5L, 2L, "purchase", 5L), (6L, 2L, "view", 15L))
    import org.apache.spark.sql.functions.{expr, lit}
    val ev = rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("sec")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a23_funnel")(spark, dir)
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1, "view", 2L, 0.0),
      (2, "click", 1L, 1.0e7),
      (3, "purchase", 1L, 1.0e7)))
  }

  test("cohort retention: offsets anchor to each user's own first week") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    // weeks via day offsets: u1 active weeks {0,1,3}, u2 {1,3} (cohort 1,
    // so offsets {0,2}), u3 {0} — cells (0,0):2 (0,1):1 (0,3):1 (1,0):1 (1,2):1
    val rows = Seq(
      (1L, 1L, 0L), (2L, 1L, 8L), (3L, 1L, 22L), (4L, 1L, 22L),
      (5L, 2L, 8L), (6L, 2L, 25L),
      (7L, 3L, 1L))
    val ev = rows.toDF("event_id", "user_id", "day")
      .withColumn("ts", expr("timestamp_micros(day * 86400000000)"))
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("day")
    val dir = java.nio.file.Files.createTempDirectory("cohort").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a24_cohort")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("triplet mining: nearest same-label positive, hardest cross-label negative") {
    import spark.implicits._
    // anchor 0 (label 0, x-axis): 10 is the aligned same-label positive,
    // 12 is a DIFFERENT-label vector aligned even closer — the hard
    // negative the miner exists to find — so the margin must be negative;
    // 11 (same label, orthogonal) and 13 (other label, orthogonal) lose
    val embRows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (10L, Array(0.9f, 0.1f, 0.0f), 0),
      (11L, Array(0.0f, 1.0f, 0.0f), 0),
      (12L, Array(0.95f, 0.05f, 0.0f), 1),
      (13L, Array(0.0f, 0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("triplet").toString
    embRows.write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann_triplet_mine")(spark, dir)
      .as[(Long, Long, Double, Long, Double, Double)].collect()
      .filter(_._1 == 0L)
    assert(out.length == 1)
    val (_, posId, posCos, negId, negCos, margin) = out.head
    assert(posId == 10L && negId == 12L)
    assert(posCos > 0.9 && negCos > posCos && margin < 0)
    assert(math.abs(margin - (posCos - negCos)) == 0.0)
  }

  test("transition matrix: per-user order, row-stochastic, no cross-user edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    // u1: a->b->a ; u2: b->a — transitions (a,b):1 (b,a):2; the u1->u2
    // boundary must NOT create an edge; each row's p = n / row total
    val rows = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "a", 30L),
      (4L, 2L, "b", 5L), (5L, 2L, "a", 15L))
    val ev = rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("sec")
    val dir = java.nio.file.Files.createTempDirectory("trans").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a25_transitions")(spark, dir)
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(("a", "b", 1L, 1.0), ("b", "a", 2L, 1.0)))
  }

  test("zscore: textbook moments, strict outlier threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    // u1: the classic 2,4,4,4,5,5,7,9 -> mean 5, std 2, no |z|>2 outliers;
    // u2: five 0s and a 12 -> mean 2, std sqrt(20), exactly one outlier
    val vals = Seq(1L -> 2.0, 1L -> 4.0, 1L -> 4.0, 1L -> 4.0, 1L -> 5.0,
      1L -> 5.0, 1L -> 7.0, 1L -> 9.0,
      2L -> 0.0, 2L -> 0.0, 2L -> 0.0, 2L -> 0.0, 2L -> 0.0, 2L -> 12.0)
    val ev = vals.zipWithIndex
      .map { case ((u, v), i) => (i.toLong, u, v) }
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("zscore").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a26_zscore")(spark, dir)
      .as[(Long, Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 8L, 5.0, 2.0, 0L),
      (2L, 6L, 2.0, math.sqrt(20.0), 1L)))
  }

  test("containment: an engulfed doc scores 1.0 with jaccard well below it") {
    import spark.implicits._
    // doc 9 = doc 5's full text plus a suffix: every shingle of 5 is in 9,
    // so containment(5 in 9) = 1.0 while jaccard = 10/13 — the asymmetry
    // the metric exists for; the disjoint doc 20 pairs with nothing.
    // (Band recall for engulfed pairs is size-ratio dependent; this
    // fixture's 10/13 ratio collides on the fixed md5 bands.)
    val small = (1 to 12).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (5L, small),
      (9L, small + " x1 x2 x3"),
      (20L, "totally different vocabulary in this document here now")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("containment").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d_containment")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((5L, 9L, 5L, 1.0, 10.0 / 13.0)))
  }

  test("drift tvd: hand-computed histogram shift, exact cross-product form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    // ref window (weeks 0-1): 4+4 events across buckets 0/1 (p = .5/.5);
    // current (week 2+): 2+6 (q = .25/.75) -> TVD = (.25+.25)/2 = 0.25
    val rows =
      (1 to 4).map(i => (i.toLong, 5.0, 0L)) ++      // ref bucket 0
      (5 to 8).map(i => (i.toLong, 25.0, 0L)) ++     // ref bucket 1
      (9 to 10).map(i => (i.toLong, 5.0, 15L)) ++    // cur bucket 0
      (11 to 16).map(i => (i.toLong, 25.0, 15L))     // cur bucket 1
    val ev = rows.toDF("event_id", "value", "day")
      .withColumn("ts", expr("timestamp_micros(day * 86400000000)"))
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
      .drop("day")
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_drift_tvd")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 4L, 2L, 0.125, 0.25),
      (1L, 4L, 6L, 0.125, 0.25)))
  }

  test("global median: distributed selection matches positional definition") {
    import spark.implicits._
    def run(vals: Seq[Double]): (Long, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("gmed").toString
      vals.toDF("l_extendedprice").write.parquet(s"$dir/lineitem.parquet")
      SparkEntry.queries("a27_global_median")(spark, dir)
        .as[(Long, Double)].collect().head
    }
    assert(run(Seq(5.0, 1.0, 3.0, 2.0, 4.0)) == (5L, 3.0))          // odd n
    assert(run(Seq(4.0, 1.0, 3.0, 2.0)) == (4L, 2.5))               // even n
    assert(run(Seq(1.0, 9.0, 1.0, 1.0)) == (4L, 1.0))               // dup-heavy
    assert(run(Seq(7.0, 7.0, 7.0)) == (3L, 7.0))                    // degenerate range
  }

  test("diversity: moment identity equals brute-force pairwise on a tiny set") {
    import spark.implicits._
    // (1,0), (0,1), (1,1): ordered-pair squared distances sum to
    // 2*(2+1+1) = 8 over n² = 9 -> mean 8/9, reproduced via the O(n)
    // moments (s2 = 4e12, sum of squared dim-sums = 8e12, quant scale 1e12)
    val embRows = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("diversity").toString
    embRows.write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann_diversity")(spark, dir)
      .as[(Int, Long, Double)].collect().toSeq
    val expected = (2L * (3L * 4000000000000L - 8000000000000L)).toDouble /
      (3.0 * 3 * 1e12)
    assert(out == Seq((0, 3L, expected)))
    assert(math.abs(expected - 8.0 / 9.0) < 1e-12)
  }

  test("bpe fertility: per-language chars-per-token under the trained merges") {
    import spark.implicits._
    // same merges as the trainer golden (aa, ab, aaab): 'aaab' -> 1 token
    // of 4 chars, 'ab' -> 1 token of 2 chars; en carries both words,
    // de only 'aaab' -> fertility 3.0 vs 4.0
    val corpus = Seq((0L, "aaab ab", "en"), (1L, "aaab", "de"))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("fertility").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_bpe_fertility")(spark, dir)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("de", 1L, 4L, 4.0), ("en", 2L, 6L, 3.0)))
  }

  test("kcore: the peel cascades — a leaf's removal drags its k-degree neighbor") {
    import spark.implicits._
    // core: complete 8x8 bipartite (every node degree 8 — a stable
    // 8-core). Appendage: customer X buys from 7 core suppliers plus a
    // private supplier Y. X starts AT degree 8 — a plain threshold keeps
    // it — but Y (degree 1) peels in round 1, dropping X to 7, X peels
    // in round 2, and the core suppliers fall back to exactly 8.
    val coreOrders = (1 to 8).map(c => (c.toLong, c.toLong))
    val xOrder = Seq((100L, 100L))
    val orders = (coreOrders ++ xOrder).toDF("o_orderkey", "o_custkey")
    val coreLines = for { c <- 1 to 8; s <- 1 to 8 } yield (c.toLong, s.toLong)
    val xLines = (1 to 7).map(s => (100L, s.toLong)) :+ (100L, 99L)
    val lineitem = (coreLines ++ xLines).toDF("l_orderkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("kcore").toString
    orders.write.parquet(s"$dir/orders.parquet")
    lineitem.write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("g_kcore")(spark, dir)
      .as[(Long, Long)].collect().toSet
    val expected = ((1 to 8).map(c => (c * 2L, 8L)) ++
      (1 to 8).map(s => (s * 2L + 1, 8L))).toSet
    assert(out == expected)
  }

  test("dedup semantics: d_exact_dedup keeps one representative per content key") {
    val out = SparkEntry.queries("d_exact_dedup")(spark, sf)
    import org.apache.spark.sql.functions._
    val dupKeys = out.groupBy("content_key").count().filter(col("count") > 1).count()
    assert(dupKeys == 0)
  }

  test("d_lines conserves segments and strips exactly the corpus-frequent ones") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("d_lines")(spark, sf)
    val docs = graft.core.Graft.table(spark, sf, "documents")
      .select(col("doc_id"), ((size(split(col("text"), " ")) + 2)
        .cast("long")).as("w3"))
      .withColumn("n_segs", expr("w3 div 3"))
    // conservation: every kept doc accounts for all of its segments
    val broken = out.join(docs, "doc_id")
      .filter(col("n_kept") + col("n_drop") =!= col("n_segs")).count()
    assert(broken == 0, "n_kept + n_drop must equal the doc's segment count")
    // the reassembled text is exactly the kept segments: 3 words each,
    // except possibly a shorter final segment
    val badLen = out.filter(
      size(split(col("text"), " ")) > col("n_kept") * 3 ||
        size(split(col("text"), " ")) <= (col("n_kept") - 1) * 3).count()
    assert(badLen == 0)
    // independent count path: recompute removals with a window count
    // instead of the agg+join and compare the per-doc drop totals
    val raw = graft.core.Graft.table(spark, sf, "documents")
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, (size(tk) + 2) div 3 - 1),
          |  i -> concat_ws(' ', slice(tk, 3*i + 1, 3)))""".stripMargin))
        .as(Seq("pos", "seg")))
    val expectDrop = raw
      .withColumn("c", count(lit(1)).over(Window.partitionBy("seg")))
      .groupBy("doc_id")
      .agg(count(when(col("c") >= 3, lit(1))).as("exp_drop"))
    val mismatch = out.join(expectDrop, "doc_id")
      .filter(col("n_drop") =!= col("exp_drop")).count()
    assert(mismatch == 0, "join-based removal must equal window-based removal")
  }

  test("w15_sess sessions are gap-consistent and conserve events") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("w15_sess")(spark, sf)
    val totalEvents = graft.core.Graft.table(spark, sf, "events").count()
    assert(out.agg(sum("n_events")).head.getLong(0) == totalEvents)
    // consecutive sessions of a user are separated by > 12 h (else they
    // would have been one session), and session ids are dense from 1
    val w = Window.partitionBy("user_id").orderBy("session_id")
    val bad = out
      .withColumn("prev_end", lag("session_end_us", 1).over(w))
      .withColumn("prev_id", lag("session_id", 1).over(w))
      .filter(
        (col("prev_end").isNotNull &&
          col("session_start_us") - col("prev_end") <= 43200000000L) ||
        (col("prev_id").isNotNull && col("session_id") =!= col("prev_id") + 1) ||
        (col("prev_id").isNull && col("session_id") =!= 1))
      .count()
    assert(bad == 0)
    assert(out.filter(col("session_dur_us") < 0).count() == 0)
  }

  test("a11_kmv: estimate is exact under k, within ±50% of truth at k") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("a11_kmv")(spark, sf)
    // sources with fewer than k distincts report the exact count
    assert(out.filter(col("k_used") < 64 &&
      col("est_distinct") =!= col("n_exact").cast("double")).count() == 0)
    // sketched sources: KMV with k=64 has σ ≈ n/√63 ≈ 12.6% — 50% is a
    // >3σ bound, loose enough to be deterministic on this fixture
    val bad = out.filter(col("k_used") === 64 &&
      abs(col("est_distinct") - col("n_exact")) > col("n_exact") * 0.5).count()
    assert(bad == 0)
  }

  test("a12_roll: rollup levels are consistent with the base cells") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("a12_roll")(spark, sf)
    val cells = out.filter(col("lvl") === 0)
    val grand = out.filter(col("lvl") === 3)
    assert(grand.count() == 1)
    assert(grand.head.getLong(3) == cells.agg(sum("n_docs")).head.getLong(0))
    // each lang subtotal equals the sum of its cells
    val langTotals = cells.groupBy("lang").agg(sum("n_docs").as("s"))
    val mismatch = out.filter(col("lvl") === 1).join(langTotals, "lang")
      .filter(col("n_docs") =!= col("s")).count()
    assert(mismatch == 0)
  }

  test("a13_cm: the Count-Min estimate never undercounts") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("a13_cm")(spark, sf)
    // est = min over rows; collisions only ADD, so est >= truth always
    assert(out.filter(col("overcount") < 0).count() == 0)
    assert(out.filter(col("est_cnt") < col("true_cnt")).count() == 0)
    assert(out.count() == 20)
  }

  test("a14_qs: sampled quantiles are ordered and the sample is a real subset") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("a14_qs")(spark, sf)
    assert(out.filter(col("p50") > col("p90") || col("p90") > col("p99")).count() == 0)
    val totalBySample = out.agg(sum("n_sample")).head.getLong(0)
    val total = graft.core.Graft.table(spark, sf, "events").count()
    assert(totalBySample > 0 && totalBySample < total,
      s"~1/4 hash sample expected, got $totalBySample of $total")
  }

  test("ann recall: lsh bucket results are a subset of brute-force candidates' quality") {
    // for each query id, the lsh top-1 cosine can never exceed brute-force top-1
    import org.apache.spark.sql.functions._
    val bf = SparkEntry.queries("ann_bruteforce_topk")(spark, sf)
      .filter(col("rank") === 1).select(col("q_id"), col("cos_sim").as("bf_cos"))
    val lsh = SparkEntry.queries("ann_lsh_bucket")(spark, sf)
      .filter(col("rank") === 1).select(col("q_id"), col("cos_sim").as("lsh_cos"))
    val bad = bf.join(lsh, "q_id").filter(col("lsh_cos") > col("bf_cos") + 1e-12).count()
    assert(bad == 0)
  }

  test("repetition fractions are valid ratios and a degenerate doc maxes out") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_repetition")(spark, sf)
    val bad = out.filter(
      col("top_word_frac") < 0 || col("top_word_frac") > 1 ||
        col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1).count()
    assert(bad == 0)
    // every doc's most-frequent-word share is at least 1/n_words > 0
    assert(out.filter(col("top_word_frac") <= 0).count() == 0)
  }

  test("domain cap: at most 15 docs per source, longest preferred") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_domain_cap")(spark, sf)
    val over = out.groupBy("source").count().filter(col("count") > 15).count()
    assert(over == 0)
    // a dropped doc is never longer than a kept doc of the same source
    // (ties on n_chars can fall either side — doc_id breaks them)
    val docs = graft.core.Graft.table(spark, sf, "documents")
    val dropped = docs.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(max("n_chars").as("max_dropped"))
    val minKept = out.groupBy("source").agg(min("n_chars").as("min_kept"))
    val bad = minKept.join(dropped, "source")
      .filter(col("max_dropped") > col("min_kept")).count()
    assert(bad == 0)
  }

  test("incremental dedup ≡ full-corpus verified pairs restricted to the batch") {
    import org.apache.spark.sql.functions._
    // a batch doc is rejected by the incremental path iff the FULL
    // d_lsh_verified pair list has a verified pair whose larger id is that
    // doc — the asymmetric batch-side probe must lose no candidates
    val inc = SparkEntry.queries("d_incremental_dedup")(spark, sf)
    val cut = spark.read.parquet(s"$sf/documents.parquet")
      .agg(max("doc_id")).head.getLong(0) * 4 / 5
    val rejectedByFull = SparkEntry.queries("d_lsh_verified")(spark, sf)
      .filter(col("b_id") >= cut).select(col("b_id").as("doc_id")).distinct()
    val incRejected = inc.filter(!col("admitted")).select("doc_id")
    val diff = incRejected.except(rejectedByFull)
      .union(rejectedByFull.except(incRejected)).count()
    assert(diff == 0)
  }

  test("semantic dedup: every cell keeps its minimum vec_id") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("d_semantic_dedup")(spark, sf)
    // the smallest id in a cell has no smaller cell-mate, so it can never
    // be a dup victim — if this fails the keep-decision direction flipped
    val bad = out.groupBy("cell_id").agg(min("vec_id").as("lo"))
      .join(out, col("lo") === col("vec_id"))
      .filter(!col("is_kept")).count()
    assert(bad == 0)
  }

  test("pii scrub: no residual matches and every doc had injected pii found") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_pii_scrub")(spark, sf)
    val residual = out.filter(
      regexp_count(col("scrubbed"), lit("[a-z0-9]+@[a-z]+\\.[a-z]+")) > 0 ||
        regexp_count(col("scrubbed"), lit("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+")) > 0 ||
        regexp_count(col("scrubbed"), lit("555-[0-9]+")) > 0).count()
    assert(residual == 0)
    assert(out.filter(col("n_emails") < 1 || col("n_ips") < 1 || col("n_phones") < 1)
      .count() == 0)
  }

  test("dup clusters: labels are component-consistent (a cluster id is its own label)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("d_dup_clusters")(spark, sf)
    // pointer-jumping must fully converge: the canonical doc of every
    // cluster labels itself, and no member carries a label below it
    val canon = out.select(col("cluster_id").as("doc_id")).distinct()
      .join(out, "doc_id").filter(col("cluster_id") =!= col("doc_id")).count()
    assert(canon == 0)
  }

  test("substring dedup: span accounting is interval-consistent") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("d_substr")(spark, sf)
    // merged spans never exceed the document, each span is >= k=8 words,
    // and spans can't outnumber the duplicated positions they merge
    val bad = out.filter(
      col("dup_span_words") > col("n_tokens") ||
        col("dup_span_words") < col("n_dup_spans") * 8 ||
        col("n_dup_spans") > col("n_dup_positions") ||
        col("n_dup_positions") < 1).count()
    assert(bad == 0)
  }

  test("substring dedup: golden spans on a constructed corpus") {
    import spark.implicits._
    // docs 0/1 identical (every shingle duplicated -> ONE full-doc span);
    // docs 2/3 share exactly one 8-token window (single-position span);
    // doc 4 is clean and must be absent
    val twin = "a b c d e f g h i j k l"
    val run = "z1 z2 z3 z4 z5 z6 z7 z8"
    val corpus = Seq(
      (0L, twin), (1L, twin),
      (2L, s"$run q r s t u v w x y zz"),
      (3L, s"p1 p2 $run p3 p4 p5 p6 p7 p8 p9 p10"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ssdedup").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d_substr")(spark, dir)
      .orderBy("doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 12, 5L, 1L, 12L), // 5 dup positions merge to one 12-word span
      (1L, 12, 5L, 1L, 12L),
      (2L, 18, 1L, 1L, 8L),  // the shared window, nothing else
      (3L, 18, 1L, 1L, 8L)))
  }

  test("bpe merges: golden greedy merge chain on a constructed corpus") {
    import spark.implicits._
    // 'aaab' x2 + 'ab' x1: round 1 must merge (a,a) n=4 (greedy LEFT-to-
    // right: aaab -> [aa, a, b], not [a, aa, b]), round 2 (a,b) n=3,
    // round 3 (aa, ab) n=2 — exercising merged tokens as pair members
    val corpus = Seq((0L, "aaab ab"), (1L, "aaab")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_bpe3")(spark, dir)
      .orderBy("merge_round")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("bpe apply: trained merges tokenize a constructed corpus exactly") {
    import spark.implicits._
    // same corpus as the trainer golden: learned merges (a,a) -> aa,
    // (a,b) -> ab, (aa,ab) -> aaab. Applying them in order collapses
    // every 'aaab' instance to ONE token and every 'ab' to one token —
    // and the md5 digest pins the exact final encodings, so a merge-order
    // or greedy-overlap bug can't hide behind matching token counts.
    val corpus = Seq((0L, "aaab ab"), (1L, "aaab")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpeapply").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val out = SparkEntry.queries("t_bpe_apply")(spark, dir)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 6L, md5hex("||aaab|| ||ab||")),
      (1L, 1L, 4L, md5hex("||aaab||"))))
  }

  test("perplexity buckets: per-lang thirds are balanced and exhaustive") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_ppl")(spark, sf)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == total)
    assert(out.filter(!col("ppl_bucket").isin("head", "middle", "tail")).count() == 0)
    // NTILE(3): within a language the three buckets differ by at most 1 doc
    val spread = out.groupBy("lang", "ppl_bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("d"))
      .filter(col("d") > 1).count()
    assert(spread == 0)
    // head docs score >= tail docs within every language
    val langMin = out.filter(col("ppl_bucket") === "head")
      .groupBy("lang").agg(min("mean_freq_ppm").as("head_min"))
    val crossed = out.filter(col("ppl_bucket") === "tail")
      .join(langMin, "lang")
      .filter(col("mean_freq_ppm") > col("head_min")).count()
    assert(crossed == 0)
  }

  test("mix sampling: sqrt temperature upsamples the small source") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 400 docs of 'big' vs 16 of 'small': weights 20 vs 4 -> the small
    // source keeps ~4x its proportional share, and an allocation larger
    // than the source itself keeps the whole source, never duplicates
    val corpus = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 416).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val dir = java.nio.file.Files.createTempDirectory("mix").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_mix")(spark, dir)
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    // W = 24; big: 200*20/24 = 166, small: 200*4/24 = 33 > 16 -> all 16
    assert(kept == Map("big" -> 166L, "small" -> 16L))
    assert(out.select("doc_id").distinct().count() == out.count())
    // keep-RATE: small 100% vs big ~41% — the flattening the op exists for
    assert(kept("small") * 400 > kept("big") * 16 * 2)
  }

  test("shard assign: distributed rank equals the naive global window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("t_shards")(spark, sf)
      .withColumn("grank", col("shard") * 64 + col("pos_in_shard"))
    // exact equivalence with the single-partition form the operator avoids
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hk"))
      .withColumn("grank_naive",
        row_number().over(Window.orderBy(col("hk"), col("doc_id"))).cast("long") - 1)
    val mismatch = out.join(naive, Seq("doc_id"))
      .filter(col("grank") =!= col("grank_naive")).count()
    assert(mismatch == 0)
    // every shard but the last is exactly full
    val total = naive.count()
    val partial = out.groupBy("shard").count()
      .filter(col("count") =!= 64 && col("shard") =!= (total - 1) / 64).count()
    assert(partial == 0)
  }

  test("a15_hll: estimate within ±50% of truth; registers bounded") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("a15_hll")(spark, sf)
    // m=64 raw σ ≈ 13%, linear-counting regime comparable — 50% is a
    // conservative multi-σ bound, deterministic on this fixture
    val bad = out.filter(
      abs(col("est_distinct") - col("n_exact")) > col("n_exact") * 0.5).count()
    assert(bad == 0)
    assert(out.filter(col("v_empty") < 0 || col("v_empty") > 64).count() == 0)
    assert(out.filter(col("est_distinct") <= 0).count() == 0)
  }

  test("a16_kx: sketch-only set estimates track the exact union and Jaccard") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("a16_kx")(spark, sf)
    // exact per-pair truth from the full shingle sets (fixture-sized)
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(split(text,' ')) - 2), " +
          "i -> concat_ws(' ', slice(split(text,' '), i, 3)))")).as("seg"))
      .distinct()
    val a = sh.select(col("source").as("sa"), col("seg"))
    val b = sh.select(col("source").as("sb"), col("seg").as("seg_b"))
    val inter = a.join(b, col("seg") === col("seg_b") && col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("n_inter"))
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val truth = out.select("sa", "sb", "est_union", "est_j")
      .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
      .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
      .join(inter, Seq("sa", "sb"), "left")
      .withColumn("ni", coalesce(col("n_inter"), lit(0L)))
      .withColumn("true_union", col("na") + col("nb") - col("ni"))
      .withColumn("true_j", col("ni") / col("true_union").cast("double"))
    // union within 50% (k=64 sketch), Jaccard within 0.35 absolute
    assert(truth.filter(
      abs(col("est_union") - col("true_union")) > col("true_union") * 0.5).count() == 0)
    assert(truth.filter(abs(col("est_j") - col("true_j")) > 0.35).count() == 0)
  }

  test("g_cc: labels only decrease, components are edge-consistent after convergence") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("g_cc")(spark, sf)
    // a label is the min id over the ≤3-hop neighborhood: never above own id
    assert(out.filter(col("cc") > col("node")).count() == 0)
    // the global min node id labels itself
    val mn = out.agg(min("node")).head.getLong(0)
    assert(out.filter(col("node") === mn).head.getAs[Long]("cc") == mn)
    // structure survives the sparsified fixture: more than one component
    assert(out.select("cc").distinct().count() > 1)
  }

  test("g_pr: rank mass is conserved (minus integer-division dust) and degree-concentrated") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("g_pr")(spark, sf)
    val nodes = out.count()
    // every node in the graph survives all three supersteps with positive rank
    val edges = spark.read.parquet(s"$sf/orders.parquet").as("o")
      .join(spark.read.parquet(s"$sf/lineitem.parquet").as("l"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val nNodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct().count()
    assert(nodes == nNodes)
    assert(out.filter(col("pr") <= 0).count() == 0)
    // total mass starts at nNodes*1e6; each superstep only loses the
    // sub-unit remainders of the two integer divisions (bounded well
    // under 1% on this graph) — a wrong join/degree would blow this up
    val mass = out.agg(sum("pr")).head.getLong(0)
    assert(mass <= nNodes * 1000000L)
    assert(mass > (nNodes * 1000000L * 99) / 100)
    // the 10 suppliers absorb rank from ~150 customers each: the mean
    // supplier (odd node) rank must dominate the mean customer rank
    val bySide = out.groupBy((col("node") % 2).as("side"))
      .agg(avg(col("pr")).as("m")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bySide(1L) > 10 * bySide(0L))
  }

  test("t_chunk: chunks tile every document — full coverage, exact stride, ragged tail only at the end") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_chunk")(spark, sf)
    val docs = graft.core.Graft.table(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok_doc"))
    // per-chunk length law: every chunk holds exactly the tokens from its
    // start to min(start+31, end of doc)
    val badLen = out.join(docs, "doc_id")
      .filter(col("n_tok") =!= least(lit(32), col("n_tok_doc") - col("start_tok") + 1))
      .count()
    assert(badLen == 0)
    // coverage: chunks start at token 1, the furthest chunk reaches the
    // last token, and starts advance by exactly the stride (count matches)
    val j = out.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("start_tok") + col("n_tok") - 1).as("last_tok"),
      min("start_tok").as("first_tok")).join(docs, "doc_id")
    val bad = j.filter(
      col("first_tok") =!= 1 ||
        col("last_tok") =!= col("n_tok_doc") ||
        col("n_chunks") =!= expr("bigint((n_tok_doc + 23) div 24)")).count()
    assert(bad == 0)
  }

  test("t_dsir: scores equal an independent per-token join path; target slice is up-weighted on average") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t_dsir")(spark, sf)
    // independent recomputation: per-token explode + bucket stats via SQL,
    // score = mean ratio over token INSTANCES (same math, join-per-token
    // instead of the rollup+ordered-fold the query uses)
    val tok = graft.core.Graft.table(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("t"))
      .withColumn("bucket", expr(
        "(instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16" +
          " + (instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1)"))
    val stats = tok.groupBy("bucket").agg(
      coalesce(sum(when(col("lang").isin("de", "fr"), lit(1L))), lit(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val Array(nt, nr) = stats.agg(sum("ct"), sum("cr")).head
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val scored = tok.join(stats, "bucket")
      .groupBy("doc_id")
      .agg((sum(((col("ct") + 1) * (nr + 256)).cast("double") /
        ((col("cr") + 1) * (nt + 256)).cast("double")) / count(lit(1))).as("ref_score"))
    // per-doc equality within IEEE reassociation noise of the reference sum
    val drift = out.join(scored, "doc_id")
      .filter(abs(col("dsir_score") - col("ref_score")) > 1e-9).count()
    assert(drift == 0)
    // the selection tilts toward the target slice: de/fr share of the top
    // 100 strictly exceeds their corpus share
    val total = graft.core.Graft.table(spark, sf, "documents").count().toDouble
    val targetShare = graft.core.Graft.table(spark, sf, "documents")
      .filter(col("lang").isin("de", "fr")).count() / total
    val pickedShare = out.filter(col("lang").isin("de", "fr")).count() / 100.0
    assert(pickedShare > targetShare,
      s"top-100 target share $pickedShare should exceed corpus share $targetShare")
  }

  test("mm_phash: banded candidate generation finds EVERY Hamming<=3 pair (pigeonhole completeness)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("mm_phash")(spark, sf)
      .select("doc_a", "doc_b", "hamming")
    // brute-force reference: all-pairs over the same signatures
    val sig = graft.functions.Multimodal
      .withMedia(graft.core.Graft.table(spark, sf, "documents"))
      .withColumn("p", expr(
        """transform(sequence(0, 71),
          |  i -> ascii(cast(substring(media, cast(i % length(media) as int) + 1, 1) as string)))"""
          .stripMargin))
      .select(col("doc_id") +: (0 until 4).map { k =>
        (0 until 16).map { j =>
          val b = 16 * k + j; val r = b / 8; val c = b % 8
          val l = r * 9 + c + 1
          when(expr(s"element_at(p, $l) > element_at(p, ${l + 1})"), lit(1 << j))
            .otherwise(lit(0))
        }.reduce(_ + _).as(s"b$k")
      }: _*)
    val brute = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1) + " +
          "bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3)").cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
    assert(out.except(brute).isEmpty && brute.except(out).isEmpty,
      "banded pair set must equal the brute-force all-pairs set")
    assert(out.count() == brute.count())
  }

  test("mad: hand-computed median/MAD, strict 3-MAD outlier, degenerate single row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    // u1: values 1,1,2,2,4,10 -> median (2+2)/2 = 2; |x-2| sorted
    // 0,0,1,1,2,8 -> MAD (1+1)/2 = 1; outliers |x-2| > 3: only the 10.
    // u2: one row -> median = the value, MAD 0, 0 > 0 strict -> no outlier.
    val vals = Seq(1L -> 1.0, 1L -> 1.0, 1L -> 2.0, 1L -> 2.0,
      1L -> 4.0, 1L -> 10.0, 2L -> 5.0)
    val ev = vals.zipWithIndex
      .map { case ((u, v), i) => (i.toLong, u, v) }
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a28_mad")(spark, dir)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2.0, 1.0, 1L), (2L, 5.0, 0.0, 0L)))
  }

  test("weighted sample: tick multiplicity is exact PPS accounting") {
    import spark.implicits._
    // total weight 64 = K, so every unit of weight is one tick: the
    // 1-char doc takes exactly 1 tick, the 63-char doc takes 63 — the
    // with-replacement multiplicity a long doc must report
    val docs = Seq((1L, "a", 1L), (2L, "b", 63L))
      .toDF("doc_id", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("wsample").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_weighted_sample")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 1L, 1L), (2L, 63L, 64L, 63L)))
  }

  test("chi2 cells: textbook 2x2 association, exact expected/term/residual") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    // 30/10 vs 10/30 over equal marginals (40 each, n=80): every cell's
    // expected = 20, |o·n − r·c| = 800, chi² term = 800²/(80·40·40) = 5,
    // residual = ±800/√128000 = ±√5 — all fixed IEEE expressions
    val rows =
      (1 to 30).map(i => (i.toLong, "A", 5.0)) ++
      (31 to 40).map(i => (i.toLong, "A", 25.0)) ++
      (41 to 50).map(i => (i.toLong, "B", 5.0)) ++
      (51 to 80).map(i => (i.toLong, "B", 25.0))
    val ev = rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("chi2").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_chi2_cells")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2, r._6, r._7, r._8)).sortBy(t => (t._1, t._2))
    val s5 = math.sqrt(5.0)
    assert(out.toSeq == Seq(
      ("A", 0L, 20.0, 5.0, s5), ("A", 1L, 20.0, 5.0, -s5),
      ("B", 0L, 20.0, 5.0, -s5), ("B", 1L, 20.0, 5.0, s5)), out.toSeq.toString)
  }

  test("gaps: max/mean/day-gap accounting; single-event entities are silent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    // u1: events at 0s, 10s, 100000s -> gaps 10s and 99990s (the second
    // crosses the 86400s day line); mean = (1e7 + 9.999e10)/2 exactly.
    // u2: one event -> no gap rows, absent from the audit.
    val rows = Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 100000L), (4L, 2L, 5L))
    val ev = rows.toDF("event_id", "user_id", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)"))
      .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}")).drop("sec")
    val dir = java.nio.file.Files.createTempDirectory("gaps").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_gaps")(spark, dir)
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 99990000000L, 50000000000.0, 1L)), out.toString)
  }

  test("label consistency: a mislabeled vector is outvoted by its neighborhood") {
    import spark.implicits._
    // vec 0 carries label 9 in a neighborhood of five label-1 vectors —
    // its 5 NN vote 5-0 for label 1: maj_cnt 5, n_agree 0, noisy flag set
    val vecs = (0 to 5).map { i =>
      (i.toLong, Array(1.0f, 0.01f * i, 0.5f), if (i == 0) 9 else 1)
    }
    val dir = java.nio.file.Files.createTempDirectory("labelcons").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann_label_consistency")(spark, dir)
      .as[(Long, Int, Int, Long, Long, Int)].collect().toSeq
    assert(out == Seq((0L, 9, 1, 5L, 0L, 1)), out.toString)
  }

  test("group sample k: exactly min(k, n) per stratum, deterministic membership") {
    import spark.implicits._
    // lang 'aa' has 3 docs (< k=8: all kept), 'bb' has 20 (exactly 8 kept)
    val docs = ((1 to 3).map(i => (i.toLong, s"text $i", "aa")) ++
      (10 to 29).map(i => (i.toLong, s"text $i", "bb")))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("gsample").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_group_sample_k")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(out.count(_._1 == "aa") == 3 && out.count(_._1 == "bb") == 8, out.toString)
    // deterministic: md5 priority — the same draw on every run
    val again = SparkEntry.queries("t_group_sample_k")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(out.toSet == again.toSet)
  }

  test("source gini: equal masses score 0, a dominant source scores the textbook value") {
    import spark.implicits._
    def run(masses: Seq[(String, Long)]): (Long, Long, Double) = {
      val docs = masses.zipWithIndex.map { case ((src, w), i) =>
        (i.toLong, "t", src, w) }.toDF("doc_id", "text", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory("gini").toString
      docs.write.parquet(s"$dir/documents.parquet")
      SparkEntry.queries("t_source_gini")(spark, dir)
        .as[(Long, Long, Double)].collect().head
    }
    assert(run(Seq("a" -> 10L, "b" -> 10L, "c" -> 10L, "d" -> 10L)) ==
      (4L, 40L, 0.0))
    // masses 1,1,1,7: Σ(2i−n−1)w over ascending = (−3−1+1)·1 + 3·7 = 18;
    // gini = 18 / (4·10) = 0.45
    assert(run(Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 7L)) ==
      (4L, 10L, 0.45))
  }

  test("keyframes: a hand-computed energy jump keys, a static payload doesn't") {
    import spark.implicits._
    // doc 1: 256 'a' then 256 'z' — energies 97·256=24832 and 122·256=31232,
    // delta 6400; 6400·4 = 25600 > 24832 -> frame 1 keys.
    // doc 2: two identical 'm' (=109) frames — delta 0, only frame 0 keys.
    val docs = Seq(
      (1L, "a" * 256 + "z" * 256),
      (2L, "m" * 512)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("keyframes").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("mm_keyframes")(spark, dir)
      .as[(Long, Int, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 0, 24832L, None), (1L, 1, 31232L, Some(6400L)),
      (2L, 0, 27904L, None)), out.toString)
  }

  test("source overlap: one crossing near-dup pair, jaccard 0.5 on the dup line") {
    import spark.implicits._
    // doc1 (s1) and doc2 (s2) share 2 of 4 distinct shingles -> jaccard
    // exactly 0.5, which sits ON the >= 0.5 dup threshold; doc3 starts
    // with a different word (different block) and pairs with nothing
    val corpus = Seq(
      (1L, "w1 w2 w3 w4 w5", "s2"),   // sources swapped vs doc order on
      (2L, "w1 w2 w3 w4 w6", "s1"),   // purpose: LEAST/GREATEST must sort
      (3L, "z1 z2 z3 z4 z5", "s3")).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("srcoverlap").toString
    corpus.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d_source_overlap")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("s1", "s2", 1L, 1L, 0.5)), out.toString)
  }

  /** Shared co-purchase fixture writer for the graph goldens: one order
    * per customer, one lineitem row per (customer, part | supplier). */
  private def writeGraphDir(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graphgold").toString
    rows.map(_._1).distinct.map(c => (c, c)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    rows.map { case (c, p, sk) => (c, p, sk) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("triangles: one 3-shared-part triangle counted once, dangling edge silent") {
    import spark.implicits._
    // customers 1,2,3 all buy parts 101-103 (every pair shares 3 -> edges);
    // 2 and 4 share parts 104-106 (edge 2-4). Edge set = triangle {1,2,3}
    // plus the dangling 2-4: exactly ONE triangle, each corner counts 1.
    val rows = for {
      c <- Seq(1L, 2L, 3L); p <- Seq(101L, 102L, 103L)
    } yield (c, p, 0L)
    val extra = for { c <- Seq(2L, 4L); p <- Seq(104L, 105L, 106L) } yield (c, p, 0L)
    val dir = writeGraphDir(rows ++ extra)
    val out = SparkEntry.queries("g_triangles")(spark, dir)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1), (2L, 1L, 1L, 2), (3L, 1L, 1L, 3)), out.toSeq.toString)
  }

  test("clustering coefficient: triangle corners score by degree, leaf scores 0") {
    import spark.implicits._
    // same graph as the triangle golden: triangle {1,2,3} + pendant edge
    // 2-4. Degrees 2,3,2,1; coefficients 2T/d(d-1): 1.0, 1/3, 1.0, 0.
    val rows = (for {
      c <- Seq(1L, 2L, 3L); p <- Seq(101L, 102L, 103L)
    } yield (c, p, 0L)) ++
      (for { c <- Seq(2L, 4L); p <- Seq(104L, 105L, 106L) } yield (c, p, 0L))
    val dir = writeGraphDir(rows)
    val out = SparkEntry.queries("g_clustering_coef")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 1000000L), (2L, 3L, 1L, 333333L),
      (3L, 2L, 1L, 1000000L), (4L, 1L, 0L, 0L)), out.toSeq.toString)
  }

  test("orphans: a dangling foreign key is counted, intact ones read zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orphans").toString
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    // second lineitem row references order 99 (absent) and supplier 5 (absent)
    Seq((1L, 101L, 0L), (99L, 102L, 5L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L).toDF("c_custkey").write.parquet(s"$dir/customer.parquet")
    Seq(0L).toDF("s_suppkey").write.parquet(s"$dir/supplier.parquet")
    val out = SparkEntry.queries("dq_orphans")(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("lineitem->orders", 2L, 1L),
      ("lineitem->supplier", 2L, 1L), ("orders->customer", 2L, 0L)),
      out.toSeq.toString)
  }

  test("concurrency: trailing-30s sweep counts, including across a day boundary") {
    import spark.implicits._
    // seconds 0/10/29/31/70 exercise the open left edge (31 no longer
    // sees 0); 86395/86405 straddle the day boundary, so event 7's count
    // can ONLY be right if the previous-day strip carry works
    val rows = Seq((1L, 0L), (2L, 10L), (3L, 29L), (4L, 31L), (5L, 70L),
      (6L, 86395L), (7L, 86405L))
    val ev = rows.toDF("event_id", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)"))
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("t"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("sec")
    val dir = java.nio.file.Files.createTempDirectory("conc").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a35_concurrency")(spark, dir)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 3L), (5L, 1L),
      (6L, 1L), (7L, 2L)), out.toSeq.toString)
  }

  test("mode: most frequent cents wins, frequency ties break to the smaller value") {
    import spark.implicits._
    // type 'a': 100 appears twice -> mode 100 x2; type 'b': all singletons
    // -> tie broken to the smallest value 100
    val rows = Seq((1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 2.0),
      (4L, "b", 2.0), (5L, "b", 1.0))
    val ev = rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("mode").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a33_mode")(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", 100L, 2L), ("b", 100L, 1L)), out.toSeq.toString)
  }

  test("skewness: a symmetric series scores exactly 0, the moments cancel") {
    import spark.implicits._
    // cents 100/200/300: A = n²s3 - 3n*s1*s2 + 2s1³ = 0 exactly
    val rows = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))
    val ev = rows.toDF("event_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("t"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("skew").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a34_skewness")(spark, dir)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("t", 3L, 200.0, 0.0)), out.toString)
  }

  test("IQR outliers: rank-exact quartiles, only the spike crosses the fence") {
    import spark.implicits._
    // cents [1,2,3,4,100]: q1 = rank-2 value 2, q3 = rank-4 value 4,
    // IQR 2 -> high fence 4 + 3 = 7, so only the 100 trips it
    val rows = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.04), (5L, 1.0))
    val ev = rows.toDF("event_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("t"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("iqr").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_outlier_iqr")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("t", 5L, 2L, 4L, 2L, 0L, 1L)), out.toString)
  }

  test("jaccard: |{2,3}| over |{1,2,3}| is exactly 666666 ppm") {
    // supplier 11 serves customers {1,2,3}; supplier 22 serves {2,3}:
    // inter 2, degrees 3 and 2, union 3 -> floor(2e6/3) = 666666 ppm
    val rows = Seq((1L, 0L, 11L), (2L, 0L, 11L), (3L, 0L, 11L),
      (2L, 0L, 22L), (3L, 0L, 22L))
    import spark.implicits._
    val dir = writeGraphDir(rows)
    val out = SparkEntry.queries("g_jaccard")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Int)].collect().toSeq
    assert(out == Seq((11L, 22L, 2L, 3L, 2L, 666666L, 1)), out.toString)
  }

  test("hits: two-iteration L1-normalized authority is exact integer ppm") {
    import spark.implicits._
    // c1,c2 -> s11; c3 -> s22. By hand: a1n = (666666, 333333);
    // h1n = (400000, 400000, 200000) — both divisions land EXACT
    // (1666665 * 400000 = 666666000000); a2 = (800000, 200000),
    // total 1000000, so a2n is itself.
    val rows = Seq((1L, 0L, 11L), (2L, 0L, 11L), (3L, 0L, 22L))
    val dir = writeGraphDir(rows)
    val out = SparkEntry.queries("g_hits")(spark, dir)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(out.toSeq == Seq((11L, 800000L, 1), (22L, 200000L, 2)), out.toSeq.toString)
  }

  test("benford: first digits of 1.5/19/25, sub-1 price filtered out") {
    import spark.implicits._
    // digits: 1.5 -> 1, 19 -> 1, 25 -> 2, (0.5 drops). total 3:
    // obs_ppm = (666666, 333333); chi2 via the same integer formula
    val li = Seq((1L, 1.5), (2L, 19.0), (3L, 25.0), (4L, 0.5))
      .toDF("l_orderkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("benford").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("dq_benford")(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    def chi2(obs: Long, exp: Long) = (obs - exp) * (obs - exp) / exp
    assert(out.toSeq == Seq(
      (1, 2L, 666666L, 301030L, chi2(666666L, 301030L)),
      (2, 1L, 333333L, 176091L, chi2(333333L, 176091L))), out.toSeq.toString)
  }

  test("ks: sup gap of two 2-point CDFs sits at the lower support point") {
    import spark.implicits._
    // purchase {1.00, 2.00} vs click {2.00}: at v=100 cents F1=1/2,
    // F2=0 -> |c1*n2 - c2*n1| = 1; at v=200 both CDFs reach 1 -> 0.
    // D = 1/(2*1) -> 500000 ppm at v=100.
    val rows = Seq((1L, "purchase", 1.0), (2L, "purchase", 2.0), (3L, "click", 2.0))
    val ev = rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_ks")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 500000L, 100L)), out.toString)
  }

  test("ewma: 8-tap power-of-two weights renormalize over short prefixes") {
    import spark.implicits._
    // one user, values 1.00/2.00/4.00 cents 100/200/400:
    // row1 100*128/128 = 100; row2 (200*128+100*64)/192 = 166.666…;
    // row3 (400*128+200*64+100*32)/224 = 67200/224 = 300 exactly
    val rows = Seq((1L, 1.0), (2L, 2.0), (3L, 4.0))
    val ev = rows.toDF("event_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(7L)).withColumn("event_type", lit("t"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("ewma").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("w18_ewma")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (7L, 1L, 100L, 12800L, 128L, 100.0),
      (7L, 2L, 200L, 32000L, 192L, 32000.0 / 192),
      (7L, 3L, 400L, 67200L, 224L, 300.0)), out.toSeq.toString)
  }

  test("acf: a perfectly linear daily series has lag-1 correlation exactly 1") {
    import spark.implicits._
    // one event day 1, two day 2, three day 3: pairs (1,2),(2,3) ->
    // n=2 sx=3 sy=5 sxy=8 sxx=5 syy=13; num = 16-15 = 1,
    // den = sqrt((10-9)(26-25)) = 1 -> acf1 = 1.0 exactly
    val rows = (1 to 1).map(i => (i.toLong, 1L)) ++
      (2 to 3).map(i => (i.toLong + 10, 2L)) ++
      (4 to 6).map(i => (i.toLong + 20, 3L))
    val ev = rows.toDF("event_id", "day")
      .withColumn("ts", expr("timestamp_micros(day * 86400000000)"))
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("t"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("day")
    val dir = java.nio.file.Files.createTempDirectory("acf").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a29_acf")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("t", 2L, 3L, 5L, 8L, 5L, 13L, 1.0)), out.toString)
  }

  test("freq spectrum: hapax lands in mag 1, a 10-count type in mag 2") {
    import spark.implicits._
    val docs = Seq((1L, ("a " * 10).trim + " b", "s"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("spectrum").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_freq_spectrum")(spark, dir)
      .as[(String, Int, Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(("s", 1, 1L, 1L), ("s", 2, 1L, 10L)), out.toSeq.toString)
  }

  test("prefix cluster: 5-token head match clusters, keeper is min doc_id") {
    import spark.implicits._
    // docs 0 and 5 share their first five tokens (tails differ); doc 9's
    // head is unique -> silent
    val docs = Seq(
      (0L, "the terms of this licence apply broadly"),
      (5L, "the terms of this licence differ entirely after the head"),
      (9L, "completely different document body here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("prefix").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d_prefix_cluster")(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, 2L, true), (5L, 0L, 2L, false)), out.toSeq.toString)
  }

  test("novelty: a bigram seen in an earlier doc stops being novel") {
    import spark.implicits._
    // doc0 contributes {a b, b c} (both novel); doc1 {a b, b d} — "a b"
    // was first seen in doc0, so novelty = 1/2
    val docs = Seq((0L, "a b c"), (1L, "a b d")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("novelty").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 2L, 2L, 1.0), (1L, 2L, 1L, 0.5)), out.toSeq.toString)
  }

  test("drawdown: largest peak-to-trough drop, earliest event on ties") {
    import spark.implicits._
    // values 3.00 -> 1.00 -> 2.00: running peak stays 300 cents, the
    // deepest drop is 200 at event 2
    val rows = Seq((1L, 3.0), (2L, 1.0), (3L, 2.0))
    val ev = rows.toDF("event_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(7L)).withColumn("event_type", lit("t"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("drawdown").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("w19_drawdown")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((7L, 200L, 300L, 2L)), out.toString)
  }

  test("assortativity: 3-edge star-ish graph has r exactly -0.5") {
    import spark.implicits._
    // edges (c1,s1),(c2,s1),(c2,s2): degree pairs (1,2),(2,2),(2,1) ->
    // n=3 sx=5 sy=5 sxy=8 sxx=9 syy=9; r = (24-25)/sqrt(2*2) = -0.5
    val rows = Seq((1L, 0L, 11L), (2L, 0L, 11L), (2L, 0L, 22L))
    val dir = writeGraphDir(rows)
    val out = SparkEntry.queries("g_assortativity")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((3L, 5L, 5L, 8L, 9L, 9L, -0.5)), out.toString)
  }

  test("silhouette: two clean orthogonal clusters score exactly 1.0") {
    import spark.implicits._
    // stride = floor(sqrt(4)) = 2 -> seed centroids at vecs 0 and 2; the
    // Lloyd round lands exactly on [1e6,0] and [0,1e6]. Every vector has
    // own-cos 1.0 and best-other-cos 0.0 -> sil_ppm 1000000 each.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("silh").toString
    emb.write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("c_silhouette")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 2L, 2000000L, 1.0), (2L, 2L, 2000000L, 1.0)),
      out.toSeq.toString)
  }

  test("rolling median: 5-point window resists the spike EWMA would follow") {
    import spark.implicits._
    // cents 300,100,200,1000,50: the 1000 spike never becomes the median
    val rows = Seq((1L, 3.0), (2L, 1.0), (3L, 2.0), (4L, 10.0), (5L, 0.5))
    val ev = rows.toDF("event_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("user_id", lit(7L)).withColumn("event_type", lit("t"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("rollmed").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("w20_rolling_median")(spark, dir)
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (7L, 1L, 300L, 300L, 1), (7L, 2L, 100L, 100L, 2), (7L, 3L, 200L, 200L, 3),
      (7L, 4L, 1000L, 200L, 4), (7L, 5L, 50L, 200L, 5)), out.toSeq.toString)
  }

  test("patch grid: 32-byte payload -> 7x5 lattice, md5 only where bytes exist") {
    import spark.implicits._
    // len 32: width 112 (7 cols), height 80 (5 rows) -> 35 patches;
    // only offsets 0 and 16 lie inside the payload
    val text = "0123456789abcdef" * 2
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("patchgrid").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("mm_patch_grid")(spark, dir)
      .as[(Long, Int, Int, Int, Long, Option[String])].collect().sortBy(_._2)
    assert(out.length == 35)
    assert(out.forall(r => r._3 == r._2 % 7 && r._4 == r._2 / 7))
    assert(out.forall(r => r._5 == r._4.toLong * 16 * 112 + r._3 * 16))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("0123456789abcdef".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.filter(_._6.isDefined).map(r => (r._2, r._6.get)).toSeq ==
      Seq((0, md), (1, md)), "md5 must cover exactly the in-payload patches")
  }

  test("range search: exact twin at cosine 1.0 returned, antipode filtered") {
    import spark.implicits._
    // vec 0 is the only query (0 % 97 = 0); vec 1 is its exact twin
    // (cos = 1.0 in exact integer math), vec 2 the antipode (cos = -1)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(-1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("rangesearch").toString
    emb.write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann_range_search")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 1L, 1.0)), out.toString)
  }
}
