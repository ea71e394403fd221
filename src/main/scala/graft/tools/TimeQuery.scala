package graft.tools

import graft.core.Graft

/** Local probe: time the queries named on the CLI at the given sf dir
  * (args: sfDir name...), N=3 runs each, noop sink like Bench — for
  * iterating on one query without paying a full bench sweep. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.tail.toSeq else Seq("q1_agg")
    val spark = Graft.session(32)
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n%-32s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
