package graft

import org.apache.spark.sql.functions._

/** d_typo_pairs: the SymSpell deletion-key blocking must be LOSSLESS for
  * edit distance ≤ 1 — the query's blocked+verified pair list has to
  * equal the brute all-pairs levenshtein scan over the same vocabulary
  * (tokens ∪ injected mutants), which is feasible exactly because the
  * vocabulary is bounded. Also pins that the verify step actually kills
  * the ED-2 false positives blocking admits (ab↔ba-shaped candidates). */
class TypoPairsSpec extends SparkSpec {

  private def ed(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("blocked pairs == brute all-pairs ED<=1 over the same vocabulary") {
    val docs = graft.core.Graft.table(spark, sf, "documents")
    val toks = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0))
    val muts = docs.select(element_at(split(col("text"), " "), 1).as("f"))
      .filter(length(col("f")) >= 3)
      .collect().map(r => "x" + r.getString(0).drop(1)).distinct
    val vocab = (toks ++ muts).distinct.sorted
    val want = (for {
      i <- vocab.indices; j <- (i + 1) until vocab.length
      if ed(vocab(i), vocab(j)) <= 1
    } yield (vocab(i), vocab(j), ed(vocab(i), vocab(j)).toLong)).toSet
    val got = SparkEntry.queries("d_typo_pairs")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want,
      s"blocking lost or invented pairs: got ${got.size}, want ${want.size}; " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.nonEmpty, "the injected mutants must produce pairs")
    assert(got.forall(_._3 <= 1))
  }

  test("d_typo_correct: every mutant maps to the max-frequency ED<=1 vocab " +
    "neighbor, ties to the smallest word") {
    val docs = graft.core.Graft.table(spark, sf, "documents")
    val freq = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("d_typo_correct")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (typo, (corr, _, corrFreq)) =>
      assert(ed(typo, corr) <= 1, s"$typo -> $corr is not ED<=1")
      assert(corrFreq == freq(corr), s"$typo: stale frequency for $corr")
      val brute = freq.keys.filter(w => ed(typo, w) <= 1)
        .toSeq.sortBy(w => (-freq(w), w)).head
      assert(corr == brute, s"$typo: got $corr, brute argmax is $brute")
    }
  }
}
