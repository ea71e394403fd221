package graft.streaming

import graft.core.Lakehouse
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** The reference's hand-rolled micro-batch pattern (5-minute Airflow cadence
  * + monotonic watermark + dedup-on-insert anti-joins + incremental state
  * merge — SURVEY.md §2.9) expressed as Structured Streaming.
  *
  * Three pieces, each the Spark-native form of a reference idiom:
  *  - [[dedupedWindowedAgg]]: watermark + dropDuplicatesWithinWatermark =
  *    the INSERT..WHERE NOT EXISTS dedup guard (S6/J3) with BOUNDED state —
  *    late duplicates beyond the watermark age out instead of growing state
  *    forever (the property that matters at 100 TB/day).
  *  - [[runningBalance]]: mapGroupsWithState = the incremental features
  *    MERGE (A7): per-key state carried across micro-batches, exactly the
  *    old+new accumulate the reference does with Iceberg MERGE INTO.
  *  - [[foreachBatchUpsert]]: sink side — each micro-batch MERGEs into the
  *    lake table via [[Lakehouse.mergeUpsert]], so batch and streaming share
  *    one upsert implementation.
  */
object Streams {

  /** One event row as the stream sees it. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Per-user balance state carried across micro-batches. */
  case class BalanceState(balance: Double, n_events: Long)
  case class UserBalance(user_id: Long, balance: Double, n_events: Long)

  /** Watermarked, deduplicated, windowed aggregation — the streaming face of
    * the stage-layer dedup + hourly rollup. State for the dedup is bounded
    * by the watermark horizon. */
  def dedupedWindowedAgg(events: DataFrame, watermarkAge: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkAge)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("user_id"),
        col("total_value"), col("n_events"))

  /** The signed-balance recurrence (W3/A7) as keyed streaming state: each
    * micro-batch folds its events into the stored per-user balance — the
    * exact semantics of the reference's incremental MERGE, with Spark
    * managing the state store instead of an Iceberg table. */
  def runningBalance(events: Dataset[Ev]): Dataset[UserBalance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[BalanceState]) => {
          val prev = state.getOption.getOrElse(BalanceState(0.0, 0L))
          val next = evs.foldLeft(prev) { (acc, e) =>
            val delta = e.event_type match {
              case "purchase" => e.value
              case "error"    => -e.value
              case _          => 0.0
            }
            BalanceState(acc.balance + delta, acc.n_events + 1)
          }
          state.update(next)
          UserBalance(userId, next.balance, next.n_events)
        })
  }

  /** Sink: MERGE each micro-batch into a lake table by key — streaming and
    * batch share [[Lakehouse.mergeUpsert]] so the exactly-once-per-key
    * upsert semantics are identical in both modes. */
  def foreachBatchUpsert(
      stream: DataFrame,
      path: String,
      keys: Seq[String],
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) Lakehouse.mergeUpsert(batch.sparkSession, batch, path, keys)
      }
      .start()
}
