package graft.tools

import graft.core.Graft

/** Throwaway local probe runner: dump formatted physical plans for the
  * queries named on the CLI (default: a representative set) at sf0.01. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(8)
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "p3_incremental_filter", "j4_join_rollup",
        "flagship_wallet_features", "d_ngram_jaccard", "ann_bruteforce_topk")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
