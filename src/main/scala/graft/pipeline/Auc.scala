package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ethereum_wallet_features_with_auc.sql:181-215,627-637 — time-weighted
  * balance features: per event, the holding gap to the next event (W8
  * LEAD), the cumulative balance-seconds area under the curve (W9), time
  * spent in positive balance, and the peak of the running balance (A8).
  *
  * [[stitch]] is the incremental variant: the first NEW event's gap is
  * measured back to the stored `last_ts` (the reference does this with a
  * correlated scalar subquery + FIRST_VALUE, W10; here the previous state
  * is a join input — the decorrelation SURVEY §4 calls for), so
  * incremental AUC accumulation is O(new events).
  */
object Auc {

  /** Full-history AUC per wallet. Input: enriched rows with a `balance`
    * column over the deterministic order (WalletFeatures.enriched). */
  def timeWeighted(enriched: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("wallet_address", "contract_address").orderBy("row_num")
    val withGap = enriched.withColumn("dt_sec",
      (coalesce(lead(col("block_timestamp"), 1).over(wOrd), col("block_timestamp"))
        - col("block_timestamp")))
    withGap.groupBy("wallet_address", "contract_address")
      .agg(
        (sum((col("balance") * col("dt_sec")).cast("decimal(38,6)")).cast("double")
          / lit(86400.0)).as("auc_balance_days"),
        sum(when(col("balance") > 0, col("dt_sec")).otherwise(lit(0L))).as("sec_in_positive"),
        max("balance").as("peak_balance"),
        max("block_timestamp").as("last_ts"),
        // state needed to stitch the next increment:
        max_by(col("balance"), col("row_num")).as("final_balance"))
  }

  /** Incremental stitch: previous per-(wallet, contract) state
    * (auc_balance_days, sec_in_positive, peak_balance, last_ts,
    * final_balance) + the new batch's enriched rows (balances already
    * continued from final_balance by the caller). The stored final balance
    * is "held" from last_ts to the first new event — the W10 boundary term
    * — then the new rows contribute as usual. */
  def stitch(prevState: DataFrame, newEnriched: DataFrame): DataFrame = {
    val newAgg = timeWeighted(newEnriched)
      .withColumnRenamed("auc_balance_days", "d_auc")
      .withColumnRenamed("sec_in_positive", "d_pos")
      .withColumnRenamed("peak_balance", "d_peak")
      .withColumnRenamed("last_ts", "d_last_ts")
      .withColumnRenamed("final_balance", "d_final")
    val firstNew = newEnriched.groupBy("wallet_address", "contract_address")
      .agg(min("block_timestamp").as("first_new_ts"))
    val n = newAgg.join(firstNew, Seq("wallet_address", "contract_address")).alias("n")
    val o = prevState.alias("o")
    val boundarySec = col("n.first_new_ts") - col("o.last_ts")
    n.join(o, Seq("wallet_address", "contract_address"), "full_outer")
      .select(
        col("wallet_address"), col("contract_address"),
        (coalesce(col("o.auc_balance_days"), lit(0.0))
          + coalesce(col("o.final_balance") * boundarySec / lit(86400.0), lit(0.0))
          + coalesce(col("n.d_auc"), lit(0.0))).as("auc_balance_days"),
        (coalesce(col("o.sec_in_positive"), lit(0L))
          + coalesce(when(col("o.final_balance") > 0, boundarySec).otherwise(lit(0L)), lit(0L))
          + coalesce(col("n.d_pos"), lit(0L))).as("sec_in_positive"),
        greatest(coalesce(col("o.peak_balance"), lit(Double.MinValue)),
          coalesce(col("n.d_peak"), lit(Double.MinValue))).as("peak_balance"),
        coalesce(col("n.d_last_ts"), col("o.last_ts")).as("last_ts"),
        coalesce(col("n.d_final"), col("o.final_balance")).as("final_balance"))
  }
}
