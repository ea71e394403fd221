package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE serving-store lifecycle contract — the one documented home for the
  * discipline [[DedupStore]] (MinHash index), [[TextIndexStore]] (BM25
  * postings) and [[AnnStore]] (IVF inverted file) each grew independently
  * over rounds 7–12, extracted so the next store (and the next pipeline
  * wiring) inherits it instead of re-deriving it.
  *
  * A serving store is a DERIVED structure that outlives the job that built
  * it: queries probe it in O(probe), batches fold into it in O(delta), and
  * a full rebuild is the rare, explicitly-triggered event. The reference
  * keeps equivalent structures as managed tables refreshed by its
  * scheduled pipeline (features_pipeline.py's OPTIMIZE/VACUUM gating);
  * here each store is parquet + bucketed tables under a caller-chosen
  * root. Three rules make that safe on a cluster where builders, appenders
  * and readers overlap:
  *
  *  1. '''Atomic publish''' ([[graft.core.StoreRoots]]): anything that
  *     (re)creates a readable layout builds in a PRIVATE directory and
  *     enters service by rename + READY marker. Readers either see the
  *     whole structure or none of it; concurrent builders race on the
  *     rename and exactly one wins ([[graft.core.StoreRoots.ensure]]).
  *     Repairing a published generation republishes as a NEW generation —
  *     never writes into a dir a reader may hold (AnnStore.ensureBuilt's
  *     g>0 path).
  *
  *  2. '''Replay-safe admission''': at-least-once delivery means every
  *     batch can arrive twice, and a duplicated index row silently skews
  *     every later probe (a doubled posting doubles tf; a doubled vector
  *     surfaces twice per probe). Admission therefore dedups WITHIN the
  *     batch (`dropDuplicates` on the store key — both intra-batch copies
  *     pass any store-side guard) and anti-joins AGAINST the stored keys
  *     (the cross-batch replay), before any append.
  *
  *  3. '''Maintenance as policy, not correctness''': sustained appends
  *     degrade the structure's COST shape (codebook drift, cell skew,
  *     postings fragmentation) but never its answers. The trigger check
  *     ([[shouldMaintain]]) is metadata-cheap so every ingest can afford
  *     it; the action ([[maintain]]) is the only corpus-sized job and runs
  *     exactly when the trigger fires — wired into ingestion
  *     ([[ingestBatch]], [[VectorPipeline.ingest]]) so decay is bounded by
  *     one batch window, not by an operator's memory.
  */
trait ServingStore {

  /** Short name for logs / reports. */
  def storeName: String

  /** The identity column admission dedups on (contract rule 2): a batch
    * row is one entity keyed by this column; two batch rows sharing it are
    * the same entity delivered twice. */
  def ingestKey: String

  /** Rule 2's intra-batch dedup, store-defined: the default assumes ONE
    * ROW PER ENTITY (two rows sharing `ingestKey` are the same entity
    * delivered twice — the doc/vector stores). A store whose ingest
    * entity SPANS rows ([[BasketStore]]: an order is many order lines)
    * MUST override this — keying the default on its entity id would
    * silently collapse each entity to one arbitrary row inside the
    * canonical lifecycle and corrupt the store permanently. */
  protected def dedupBatch(batch: DataFrame): DataFrame =
    batch.dropDuplicates(ingestKey)

  /** Idempotent bootstrap: re-register an existing on-disk store on a
    * fresh session; build from `corpus` (evaluated only when needed) when
    * absent. Returns true when this call performed the build. */
  def ensureBuilt(spark: SparkSession, root: String, corpus: => DataFrame): Boolean

  /** Replay-safe O(delta) admission of one batch into the live structure
    * (contract rule 2). The batch schema is the store's ingest schema —
    * the same frame [[ensureBuilt]] accepts as corpus. */
  def appendBatch(spark: SparkSession, root: String, batch: DataFrame): Unit

  /** Metadata-cheap maintenance trigger (contract rule 3). Default: the
    * store has no corpus-sized maintenance (its structure does not decay
    * under appends). */
  def shouldMaintain(spark: SparkSession, root: String): Boolean = false

  /** The corpus-sized maintenance action; must publish atomically
    * (contract rule 1) so probes never pause. Default no-op for stores
    * whose [[shouldMaintain]] never fires. */
  def maintain(spark: SparkSession, root: String): Unit = ()

  /** The canonical per-batch lifecycle a scheduled pipeline runs:
    * bootstrap on first contact, O(delta) admission afterwards, then the
    * trigger check and (if fired) inline maintenance. Stores with
    * policy knobs expose parameterized variants beside this
    * ([[VectorPipeline.ingest]]); the shape is always this one. */
  final def ingestBatch(spark: SparkSession, root: String,
      batch: DataFrame): ServingStore.Ingest =
    ingestBatchWith(spark, root, batch, shouldMaintain)

  /** [[ingestBatch]] with the maintenance trigger swapped for a
    * parameterized policy — the ONE lifecycle implementation, shared by
    * the default surface above and policy-threshold wrappers like
    * [[VectorPipeline.ingest]] (a second hand-synchronized copy of these
    * five lines has already diverged once — the bootstrap-dedup fix
    * landed only here). */
  final def ingestBatchWith(spark: SparkSession, root: String,
      batch: DataFrame,
      trigger: (SparkSession, String) => Boolean): ServingStore.Ingest = {
    // rule 2 applies to the BOOTSTRAP batch too: an at-least-once source
    // can duplicate a key inside the stream's first micro-batch, and the
    // build paths index their corpus verbatim (a doubled doc doubles its
    // tf in every posting / surfaces its vector twice per probe — and the
    // corruption is permanent, since later batches anti-join against the
    // store). appendBatch dedups internally; the build path gets the
    // dedup here, once, for every store — through the STORE'S dedup rule
    // (dedupBatch), never a blind key-dedup: a multi-row-entity store
    // would lose all but one row per entity under the default.
    val b = dedupBatch(batch)
    val bootstrapped = ensureBuilt(spark, root, b)
    if (!bootstrapped) appendBatch(spark, root, b)
    val fired = !bootstrapped && trigger(spark, root)
    if (fired) maintain(spark, root)
    ServingStore.Ingest(bootstrapped, fired)
  }
}

object ServingStore {
  /** What one [[ServingStore.ingestBatch]] did. */
  final case class Ingest(bootstrapped: Boolean, maintained: Boolean)

  /** The engine's stores, for tooling that sweeps all of them. */
  def all: Seq[ServingStore] = Seq(DedupStore, TextIndexStore, AnnStore, BasketStore)
}
