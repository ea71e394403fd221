package graft.pipeline

import graft.functions.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The vector-serving INGESTION LIFECYCLE: what a scheduled pipeline run
  * does with each arriving embedding batch, maintenance included.
  *
  * [[AnnStore]] provides the mechanisms — O(delta) admission
  * ([[AnnStore.appendVectors]]), drift detection
  * ([[AnnStore.shouldRefresh]]) and codebook retraining
  * ([[AnnStore.refresh]]) — but a mechanism nobody schedules is recall
  * decay waiting to happen: the reference bakes its serving-store
  * maintenance INTO the pipeline run (features_pipeline.py:128-138 gates
  * OPTIMIZE/VACUUM on a schedule inside the run, mirrored by
  * [[DomainPipeline.weeklyMaintain]]) rather than leaving it to an
  * operator's memory. This is that wiring for the ANN store: every
  * admitted batch is followed by the trigger check, and a firing trigger
  * retrains inline — so a sustained distribution shift costs at most one
  * drifted-probe window, not an unbounded one.
  *
  * Cost shape at 100 TB: admission is O(batch) against the frozen
  * codebook; the trigger check is footer-metadata-only until the
  * appended-fraction gate passes, then one column-pruned aggregate
  * (cell sizes); the refresh — the only corpus-sized job — runs exactly
  * when the triggers say the ~√N cost/recall shape was lost, and
  * publishes generationally so serving never pauses.
  */
object VectorPipeline {

  /** What one ingested batch did: `bootstrapped` = this run created the
    * store; `refreshed` = the drift triggers fired after admission and a
    * retrain republished; `generation` = the live generation after the
    * run. */
  final case class IngestReport(bootstrapped: Boolean, refreshed: Boolean,
      generation: Long)

  /** Ingest one embedding batch (vec_id + embedding float array, or
    * vec_id + qv exact-integer array) into the serving store at `root`:
    * bootstrap on first contact, O(delta) admission afterwards, then the
    * maintenance step — trigger check, retrain-if-fired. Thresholds are
    * maintenance policy ([[AnnStore.shouldRefresh]]): correctness never
    * depends on them, only the probe cost/recall shape. */
  def ingest(spark: SparkSession, root: String, batch: DataFrame,
      maxAppendedFraction: Double = 0.5, maxSkew: Double = 8.0): IngestReport = {
    // ONE lifecycle implementation (ServingStore.ingestBatchWith) with
    // the policy thresholds as the trigger — this wrapper used to carry
    // its own copy of the five lifecycle lines and missed the
    // bootstrap-dedup fix the trait copy got; delegation makes that
    // class of drift impossible. MAINTENANCE runs inside the batch: a
    // fired trigger retrains now — the next probe already sees the
    // re-owned cells — instead of decaying until someone notices recall
    // dropped.
    val r = AnnStore.ingestBatchWith(spark, root, batch,
      (s, rt) => AnnStore.shouldRefresh(s, rt, maxAppendedFraction, maxSkew))
    IngestReport(r.bootstrapped, r.maintained, AnnStore.currentGen(spark, root))
  }

  /** The media flank: documents with payloads → [[Multimodal.embedBatch]]
    * exact-integer vectors → the SAME serving store. Media vectors are
    * already integral (byte histograms), so they skip quantization and
    * the stored probe stays bit-identical to the from-scratch math. */
  def ingestMedia(spark: SparkSession, root: String, docs: DataFrame,
      maxAppendedFraction: Double = 0.5, maxSkew: Double = 8.0): IngestReport =
    ingest(spark, root,
      Multimodal.embedBatch(Multimodal.withMedia(docs))
        .withColumnRenamed("doc_id", "vec_id"),
      maxAppendedFraction, maxSkew)
}
