package graft

import graft.pipeline.{Auc, WalletFeatures}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** SURVEY §5 item 4: ScalaCheck property test for the balance recurrence —
  * the invariant the reference's whole MERGE design protects. For random
  * event sequences and a random split point, computing features
  * incrementally (old state + boundary-stitched new batch) must equal the
  * full recompute. */
class BalancePropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(wallet: String, role: String, hash: String,
      amount: Double, ts: Long)

  private val evGen: Gen[Ev] = for {
    w <- Gen.oneOf("0xaa", "0xbb", "0xcc")
    role <- Gen.oneOf("sender", "receiver")
    amount <- Gen.chooseNum(1, 9999).map(_ / 100.0) // 2-decimal amounts
    ts <- Gen.chooseNum(100L, 999L)
  } yield Ev(w, role, "", amount, ts)

  private def toDf(evs: Seq[Ev]) =
    evs.zipWithIndex.map { case (e, i) =>
      (e.wallet, e.role, s"h$i", e.amount, 0.0, e.ts, "normal", 1, "ETH")
    }.toDF("wallet_address", "role", "transaction_hash", "amount", "tx_fee",
      "block_timestamp", "transaction_type", "priority", "contract_address")
      .withColumn("block_number", lit(1L))
      .withColumn("date_partition", lit("2024-01"))
      .withColumn("address_partition", substring(col("wallet_address"), 3, 2))

  test("property: AUC incremental stitch ≡ full recompute on random sequences") {
    val prop = forAll(Gen.listOfN(24, evGen), Gen.chooseNum(200L, 900L)) { (evs, cut) =>
      val all = toDf(evs)
      val oldTx = all.filter(col("block_timestamp") <= cut)
      val newTx = all.filter(col("block_timestamp") > cut)
      if (oldTx.isEmpty || newTx.isEmpty) true
      else {
        val full = Auc.timeWeighted(WalletFeatures.enriched(all))
          .select("wallet_address", "auc_balance_days", "sec_in_positive",
            "peak_balance", "final_balance", "last_ts")
          .as[(String, Double, Long, Double, Double, Long)].collect()
          .map(r => r._1 -> r).toMap
        val prev = Auc.timeWeighted(WalletFeatures.enriched(oldTx))
        val newEnriched = WalletFeatures.enriched(newTx)
          .join(prev.select(col("wallet_address"), col("contract_address"),
            col("final_balance").as("carry")),
            Seq("wallet_address", "contract_address"), "left_outer")
          .withColumn("balance", col("balance") + coalesce(col("carry"), lit(0.0)))
          .drop("carry")
        val inc = Auc.stitch(prev, newEnriched)
          .select("wallet_address", "auc_balance_days", "sec_in_positive",
            "peak_balance", "final_balance", "last_ts")
          .as[(String, Double, Long, Double, Double, Long)].collect()
          .map(r => r._1 -> r).toMap
        full.keySet == inc.keySet && full.keySet.forall { w =>
          val (_, fAuc, fPos, fPeak, fFin, fTs) = full(w)
          val (_, iAuc, iPos, iPeak, iFin, iTs) = inc(w)
          math.abs(fAuc - iAuc) < 1e-9 && fPos == iPos &&
            math.abs(fPeak - iPeak) < 1e-9 && math.abs(fFin - iFin) < 1e-9 && fTs == iTs
        }
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: mergeFrames matches the row-by-row MERGE model (nullable columns)") {
    // model: updates replace matched rows column-wise EXCEPT keepFromTarget
    // columns (which hold the stored value even when it is NULL); unmatched
    // target rows carry forward; unmatched updates insert
    val rowGen = for {
      id <- Gen.chooseNum(0L, 9L)
      tag <- Gen.option(Gen.oneOf("x", "y", "z"))
      bal <- Gen.chooseNum(0, 999).map(_ / 10.0)
    } yield (id, tag, bal)
    def dedupById(rows: List[(Long, Option[String], Double)]) =
      rows.groupBy(_._1).map(_._2.head).toList
    val prop = forAll(Gen.listOfN(8, rowGen), Gen.listOfN(8, rowGen),
      Gen.oneOf(Set.empty[String], Set("tag"))) { (t0, u0, keep) =>
      val tRows = dedupById(t0)
      val uRows = dedupById(u0)
      val target = tRows.toDF("id", "tag", "bal")
      val updates = uRows.toDF("id", "tag", "bal")
      val out = graft.core.Lakehouse.mergeFrames(target, updates, Seq("id"), keep)
        .as[(Long, Option[String], Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val tMap = tRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val uMap = uRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val model = (tMap.keySet ++ uMap.keySet).map { id =>
        id -> ((tMap.get(id), uMap.get(id)) match {
          case (Some(t), Some(u)) => (if (keep("tag")) t._1 else u._1, u._2)
          case (Some(t), None)    => t
          case (None, Some(u))    => u
          case (None, None)       => sys.error("unreachable")
        })
      }.toMap
      out == model
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
