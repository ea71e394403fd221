package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** The residual predicate both pruned-read tiers apply after file-level
  * skipping ([[Lakehouse.readZPrunedK]]'s footer tier and
  * [[ManifestSnapshots.readWhere]]'s manifest tier) — ONE home so the
  * bound-typing rules cannot drift between them:
  *
  *  - bound literals are typed to the COLUMN (`longCol >= 12.0` would
  *    wrap the column in a cast and block parquet filter pushdown — the
  *    residual must reach the surviving files' scan so their row groups
  *    footer-skip too: two pruning tiers, one plan);
  *  - `.toLong`/`.toInt` SATURATE out-of-range doubles (ceil(3e9).toInt
  *    == Int.MaxValue), which would turn an impossible bound into a
  *    boundary-value match — out-of-type-range bounds resolve to FALSE /
  *    no-constraint here instead of converted.
  */
private[core] object ZoneResidual {

  def numeric(types: Map[String, DataType],
      bounds: Seq[(String, Double, Double)]): Seq[Column] =
    bounds.map { case (c, lo, hi) =>
      def intish(tmin: Double, tmax: Double,
          mk: Double => Column): Column = {
        val l = math.ceil(lo); val h = math.floor(hi)
        if (l > tmax || h < tmin || l > h) lit(false)
        else {
          val lc = if (l < tmin) lit(true) else col(c) >= mk(l)
          val hc = if (h > tmax) lit(true) else col(c) <= mk(h)
          lc && hc
        }
      }
      types.get(c) match {
        case Some(LongType) =>
          intish(Long.MinValue.toDouble, Long.MaxValue.toDouble, d => lit(d.toLong))
        case Some(IntegerType) =>
          intish(Int.MinValue.toDouble, Int.MaxValue.toDouble, d => lit(d.toInt))
        case _ => col(c) >= lit(lo) && col(c) <= lit(hi)
      }
    }
}
