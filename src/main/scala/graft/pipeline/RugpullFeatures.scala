package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** rugpull_features.sql:4-204 — per-wallet rugpull-interaction features:
  * FILTER'd aggregates (A4) over rugpull-flagged wallet transactions and
  * the incremental accumulate (A7, :155-166) that merges a new batch's
  * aggregates into stored state with COALESCE-0 sums and min/max merges.
  *
  * The reference's 1.3e7 outlier guard caps the AGGREGATED per-wallet
  * total, not the per-transaction amount (`CASE WHEN total_amount_chain >
  * 1.3e+07 THEN 1.3e+07`, :75) — ten 2e6 sends cap at 1.3e7, not 2e7 —
  * and the incremental path re-caps after accumulating old + new state
  * (:169). Because amounts are non-negative, cap(cap(old) + new) =
  * cap(old + new), so incremental ≡ full holds (FeatureModulesSpec).
  */
object RugpullFeatures {

  private val Cap = 1.3e7

  private def capped(c: org.apache.spark.sql.Column) = least(c, lit(Cap))

  /** A4: one batch's per-wallet aggregates — sums UNCAPPED, then the :75
    * cap applied to the aggregate. `txFlagged` = wallet_transactions rows
    * carrying `is_rugpull`. */
  def aggregate(txFlagged: DataFrame): DataFrame = {
    val rp = col("is_rugpull")
    txFlagged.groupBy("wallet_address")
      .agg(
        count(when(rp && col("role") === "sender", lit(1))).as("n_rugpull_sent"),
        count(when(rp && col("role") === "receiver", lit(1))).as("n_rugpull_received"),
        sum(when(rp && col("role") === "sender", col("amount")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).cast("double").as("rugpull_amount_sent"),
        sum(when(rp && col("role") === "receiver", col("amount")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).cast("double").as("rugpull_amount_received"),
        min(when(rp, col("block_timestamp"))).as("first_rugpull_ts"),
        max(when(rp, col("block_timestamp"))).as("last_rugpull_ts"),
        count(lit(1)).as("n_transactions"),
        max("block_timestamp").as("last_tx_ts"))
      .withColumn("rugpull_amount_sent", capped(col("rugpull_amount_sent")))
      .withColumn("rugpull_amount_received", capped(col("rugpull_amount_received")))
  }

  /** The serving-DB export slice
    * (rugpull_features_data_to_features_db.sql): rows whose last rugpull
    * interaction is past the serving store's high-water mark. */
  def featuresDbSlice(features: DataFrame, lastInsertedTs: Long): DataFrame =
    features.filter(col("last_rugpull_ts") > lit(lastInsertedTs))

  /** A7: merge a new batch's aggregates into previous state —
    * sum += COALESCE(old, 0) then RE-CAP (:169); min/max merge with null
    * handling; counts accumulate. Full-outer so both untouched wallets and
    * brand-new wallets survive. */
  def merge(newAgg: DataFrame, oldState: DataFrame): DataFrame = {
    val n = newAgg.alias("n")
    val o = oldState.alias("o")
    def nsum(c: String) =
      (coalesce(col(s"n.$c"), lit(0.0)) + coalesce(col(s"o.$c"), lit(0.0))).as(c)
    def ncount(c: String) =
      (coalesce(col(s"n.$c"), lit(0L)) + coalesce(col(s"o.$c"), lit(0L))).as(c)
    def tmin(c: String) =
      when(col(s"n.$c").isNull, col(s"o.$c")).when(col(s"o.$c").isNull, col(s"n.$c"))
        .otherwise(least(col(s"n.$c"), col(s"o.$c"))).as(c)
    def tmax(c: String) =
      when(col(s"n.$c").isNull, col(s"o.$c")).when(col(s"o.$c").isNull, col(s"n.$c"))
        .otherwise(greatest(col(s"n.$c"), col(s"o.$c"))).as(c)
    n.join(o, col("n.wallet_address") === col("o.wallet_address"), "full_outer")
      .select(
        coalesce(col("n.wallet_address"), col("o.wallet_address")).as("wallet_address"),
        ncount("n_rugpull_sent"), ncount("n_rugpull_received"),
        nsum("rugpull_amount_sent"), nsum("rugpull_amount_received"),
        tmin("first_rugpull_ts"), tmax("last_rugpull_ts"),
        ncount("n_transactions"), tmax("last_tx_ts"))
      .withColumn("rugpull_amount_sent", capped(col("rugpull_amount_sent")))
      .withColumn("rugpull_amount_received", capped(col("rugpull_amount_received")))
  }
}
