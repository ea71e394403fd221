package graft.tools

import graft.core.Graft

/** Throwaway local probe runner. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(8)
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, false)
    spark.stop()
  }
}
