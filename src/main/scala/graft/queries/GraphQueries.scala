package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the transaction graph — the risk-propagation
  * family the reference's wallet scoring sits on top of (a wallet's risk
  * is a function of who it transacts with; cf. reference
  * `ethereum_wallet_features.sql`'s counterparty aggregates, which are
  * exactly the 1-hop special case). `g_pr` (fixed-iteration PageRank) is
  * the k-hop generalization; `g_cc` (min-label propagation) is the
  * "shared-operator cluster" primitive — the same machinery the dedup
  * family uses for duplicate clusters, applied to transaction partners.
  *
  * Scale design (the Pregel-on-DataFrames pattern, shared by both):
  *  - The graph is collapsed ONCE — the only |E|-row shuffle in either
  *    query — into a persisted |V|-row adjacency-list relation
  *    (collect_set dedupes parallel edges, so size(nbrs) IS the
  *    out-degree).
  *  - A superstep is: join the |V|-row state relation to the adjacency,
  *    explode neighbors into messages (codegen'd, no |E|-row shuffle
  *    read), and aggregate by receiver (map-side partial agg, then a
  *    |V|-group exchange). The state side's broadcast is SIZE-GUARDED,
  *    not pinned: |V| grows linearly with the data, so an unconditional
  *    broadcast hint is a driver-OOM/8 GB-limit wall at 100× scale. The
  *    query already needs |V| (the adjacency materialization count), and
  *    the superstep hints broadcast only while |V| ≤ 1M rows
  *    (~16 MB of (node, value) pairs); beyond that the join stays
  *    shuffle-based against the persisted adjacency. (A hint-free join
  *    was measured first: Catalyst's estimate for the state side — a
  *    projection of the cached adjacency — is array-inflated, so
  *    superstep 1 planned SortMergeJoin even at test scale; the explicit
  *    row-count guard gives the broadcast where it is provably safe and
  *    the shuffle where it isn't. PlanSpec pins BOTH regimes.) On a
  *    billion-node graph the shuffled joins co-partition against a
  *    src-bucketed adjacency table (Lakehouse.ctasBucketed) — the
  *    GraphX/Pregel partitioning argument re-expressed in the DataFrame
  *    layer.
  *  - All arithmetic is BIGINT (ranks: mass scaled by 1e6, damping 0.85
  *    as (85*x) div 100; labels: integer MIN): order-independent at any
  *    parallelism and exactly reproducible in the DuckDB oracle.
  *
  * Bidirectional edges (each undirected interaction contributes both
  * directions) keep the graph dangling-free: every node has out-degree
  * ≥ 1, so no rank mass leaks and no dangling-node redistribution term
  * is needed.
  */
object GraphQueries {

  private val iterations = 3

  /** Oracle-side shared graph CTEs: distinct bipartite interaction pairs
    * (nodes disambiguated as 2*custkey / 2*suppkey+1), both directions,
    * per-node out-degree. `edgePred` filters the interactions (g_cc runs
    * on the high-volume subgraph so component structure is visible —
    * the full graph is one giant component, as interaction graphs are). */
  private def graphSql(edgePred: String): String =
    s"""WITH e0 AS (
      |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE $edgePred),
      |ed AS (SELECT src, dst FROM e0
      |       UNION ALL SELECT dst AS src, src AS dst FROM e0),
      |deg AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY src),
      |edges AS (SELECT ed.src, ed.dst, deg.outdeg
      |          FROM ed JOIN deg ON deg.src = ed.src)""".stripMargin

  /** One PageRank superstep in SQL, parameterized by the previous rank
    * relation's name. Kept textually identical across the unrolled
    * iterations so Spark and DuckDB execute the same arithmetic. */
  private def prStepSql(prev: String): String =
    s"""SELECT e.dst AS node,
       |  150000 + (85 * CAST(SUM(r.pr // e.outdeg) AS BIGINT)) // 100 AS pr
       |FROM edges e JOIN $prev r ON e.src = r.node
       |GROUP BY e.dst""".stripMargin

  /** One min-label superstep: a node adopts the smallest label among its
    * neighborhood INCLUDING itself (`edges2` carries self-loops). */
  private def ccStepSql(prev: String): String =
    s"""SELECT e.dst AS node, MIN(r.cc) AS cc
       |FROM edges2 e JOIN $prev r ON e.src = r.node
       |GROUP BY e.dst""".stripMargin

  /** Spark-side shared graph build: the persisted |V|-row adjacency-list
    * relation (src, nbrs, outdeg). Caller MUST materialize everything it
    * derives before unpersisting (see the Pregel comment below). */
  private[graft] def adjacency(s: SparkSession, dir: String, edgePred: Column): DataFrame = {
    val orders = Graft.table(s, dir, "orders")
    val lineitem = Graft.table(s, dir, "lineitem")
    // No .distinct() here: collect_set below dedupes parallel edges, so
    // a pre-dedup would only add a second full |E|-row shuffle.
    val e0 = orders
      .join(lineitem.filter(edgePred), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val ed = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    // Pregel economics, DataFrame-shaped. The loop invariant GraphX
    // caches is the edge relation; caching it row-per-edge costs O(|E|)
    // storage and every superstep re-scans it. Instead the graph is
    // collapsed ONCE (the only |E|-row shuffle in the query) into a
    // |V|-row adjacency-list relation — collect_set dedupes parallel
    // edges, so size(nbrs) IS the out-degree — and THAT is what
    // persists: ~|V| rows (√-ish of |E| on interaction graphs), cheap
    // to cache and to broadcast-join. Each superstep then regenerates
    // the |E| messages with a codegen'd explode over in-memory
    // adjacency rows — no |E|-row shuffle read, no per-iteration
    // re-derivation (without the persist, superstep k's lineage embeds
    // k-1 full copies of this build; AQE reuses the shuffle writes but
    // re-runs every post-shuffle aggregation — measured 2x slower).
    ed.groupBy("src")
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(col("src"), col("nbrs"), size(col("nbrs")).cast("long").as("outdeg"))
      .persist()
  }

  /** The state relation broadcasts while it has at most this many rows:
    * 1M (node, value) pairs ≈ 16 MB serialized — comfortably inside
    * executor memory and far from the 8 GB broadcast wall. Past it, the
    * superstep join degrades to a shuffle against the persisted (at
    * extreme scale: src-bucketed) adjacency. */
  private[graft] val broadcastStateMaxRows = 1000000L

  private def stateSide(state: DataFrame, stateRows: Long): DataFrame =
    if (stateRows <= broadcastStateMaxRows) broadcast(state) else state

  /** One PageRank superstep: messages = explode the senders' neighbor
    * lists carrying rank/outdeg shares; new rank = damped sum by receiver.
    * `stateRows` (= |V|, known from the adjacency materialization) guards
    * the rank-side broadcast — see the object doc. */
  private[graft] def prSuperstep(adj: DataFrame, ranks: DataFrame,
      stateRows: Long): DataFrame =
    adj.join(stateSide(ranks, stateRows), col("src") === col("node"))
      .select(explode(col("nbrs")).as("dst"), expr("pr div outdeg").as("c"))
      .groupBy(col("dst"))
      .agg(sum(col("c")).as("contrib"))
      .select(col("dst").as("node"),
        (lit(150000L) + expr("(85 * contrib) div 100")).as("pr"))

  /** One min-label superstep over the self-looped adjacency (so a node's
    * own label competes): new label = MIN over the neighborhood. */
  private[graft] def ccSuperstep(adjSelf: DataFrame, labels: DataFrame,
      stateRows: Long): DataFrame =
    adjSelf.join(stateSide(labels, stateRows), col("src") === col("node"))
      .select(explode(col("nbrs")).as("dst"), col("cc"))
      .groupBy(col("dst"))
      .agg(min(col("cc")).as("cc"))
      .select(col("dst").as("node"), col("cc"))

  /** Eager materialization splits the Pregel phases: the supersteps run
    * inside the query function, while the |E|-scale adjacency cache is
    * alive; what escapes is the |V|-row cached RESULT (adj is released
    * before returning, closing the cached-block leak the same way
    * DedupStore.admit does; the small result cache is reclaimed by the
    * ContextCleaner when the DataFrame is dropped). localCheckpoint
    * would cut lineage more aggressively but measures ~0.9 s slower
    * here: its materialization job re-executes outside AQE's coalesced
    * shuffle reads. */
  private def materialize(result: DataFrame, adj: DataFrame): DataFrame =
    CacheScope.sealResult(result, adj)

  val all: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- GRAPH-1
    // Fixed-iteration integer PageRank over the bipartite
    // customer↔supplier graph. 3 supersteps, damping 0.85, mass 1e6.
    QueryDef("g_pr",
      s"""${graphSql("1 = 1")},
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |r1 AS (${prStepSql("r0")}),
         |r2 AS (${prStepSql("r1")}),
         |r3 AS (${prStepSql("r2")})
         |SELECT node, pr FROM r3""".stripMargin) { (s, dir) =>
      val adj = adjacency(s, dir, lit(true))
      // |V|: materializes the persisted adjacency up front AND decides the
      // state-side broadcast for every superstep
      val nV = adj.count()
      var ranks = adj.select(col("src").as("node"), lit(1000000L).as("pr"))
      for (_ <- 1 to iterations) ranks = prSuperstep(adj, ranks, nV)
      materialize(ranks, adj)
    },

    // --------------------------------------------------------------- GRAPH-2
    // Connected components by min-label propagation: after k supersteps
    // every node carries the smallest node id within k hops — the
    // transaction-cluster primitive (the dedup family's dup-cluster
    // labeling, applied to counterparty graphs). Fixed k=3 keeps the
    // result exactly oracle-reproducible whether or not the graph has
    // converged; production iterates to a fixpoint (or pointer-jumps,
    // d_dup_clusters) — each extra hop is the same superstep shape.
    QueryDef("g_cc",
      s"""${graphSql("l.l_quantity >= 50")},
         |edges2 AS (SELECT src, dst FROM ed
         |           UNION ALL SELECT src, src AS dst FROM deg),
         |c0 AS (SELECT src AS node, src AS cc FROM deg),
         |c1 AS (${ccStepSql("c0")}),
         |c2 AS (${ccStepSql("c1")}),
         |c3 AS (${ccStepSql("c2")})
         |SELECT node, cc FROM c3""".stripMargin) { (s, dir) =>
      val adj = adjacency(s, dir, col("l_quantity") >= 50)
      val nV = adj.count()
      // self-loop via array_union so MIN(label over nbrs) includes own
      val adjSelf = adj.select(col("src"),
        array_union(col("nbrs"), array(col("src"))).as("nbrs"))
      var labels = adj.select(col("src").as("node"), col("src").as("cc"))
      for (_ <- 1 to iterations) labels = ccSuperstep(adjSelf, labels, nV)
      materialize(labels, adj)
    },

    // --------------------------------------------------------------- GRAPH-2b
    // k-core peeling (3 unrolled rounds, k=8): repeatedly drop nodes whose
    // CURRENT degree is below k — each removal lowers neighbors' degrees,
    // so the peel cascades; what survives is the densely-embedded core the
    // risk family treats as "established" counterparties (a raw degree
    // threshold cannot express the cascade: a high-degree node whose
    // neighbors all get peeled goes with them). Fixed 3 rounds keeps the
    // result exactly oracle-reproducible whether or not the peel has
    // converged — the g_pr/g_cc unrolling contract; production iterates to
    // the fixpoint, each extra round the same two keyed shuffles (degree
    // rollup + two semi-join filters on the shrinking edge set).
    QueryDef("g_kcore",
      """WITH e0 AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |ed AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |d0 AS (SELECT src, COUNT(*) AS d FROM ed GROUP BY src),
        |v1 AS (SELECT src FROM d0 WHERE d >= 8),
        |e1 AS (SELECT ed.src, ed.dst FROM ed
        |       JOIN v1 a ON a.src = ed.src JOIN v1 b ON b.src = ed.dst),
        |d1 AS (SELECT src, COUNT(*) AS d FROM e1 GROUP BY src),
        |v2 AS (SELECT src FROM d1 WHERE d >= 8),
        |e2 AS (SELECT e1.src, e1.dst FROM e1
        |       JOIN v2 a ON a.src = e1.src JOIN v2 b ON b.src = e1.dst),
        |d2 AS (SELECT src, COUNT(*) AS d FROM e2 GROUP BY src),
        |v3 AS (SELECT src FROM d2 WHERE d >= 8),
        |e3 AS (SELECT e2.src, e2.dst FROM e2
        |       JOIN v3 a ON a.src = e2.src JOIN v3 b ON b.src = e2.dst)
        |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
        |FROM e3 GROUP BY src""".stripMargin) { (s, dir) =>
      val k = 8
      val e0 = Graft.table(s, dir, "orders")
        .join(Graft.table(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      var ed = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      val rounds = Seq.newBuilder[DataFrame]
      rounds += ed
      for (_ <- 1 to 3) {
        val surv = ed.groupBy("src").agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select("src")
        val next = ed
          .join(surv, "src")
          .join(surv.select(col("src").as("dst")), "dst")
          .select("src", "dst")
          .persist()
        next.count() // materialize before the previous round is released
        rounds += next
        ed = next
      }
      val all = rounds.result()
      CacheScope.sealResult(
        ed.groupBy(col("src").as("node"))
          .agg(count(lit(1)).cast("long").as("core_degree")),
        all: _*)
    },

    // --------------------------------------------------------------- GRAPH-3
    // Butterfly (bipartite 4-cycle) counting — the bipartite analog of
    // triangle counting, and the co-occurrence primitive underneath
    // "customers who bought X also bought Y": wedges join the customer-part
    // edge set to itself on the part key, per-pair shared-part counts roll
    // up map-side, and each pair contributes C(n,2) butterflies. Scale
    // controls, both mirrored in the oracle: (1) hub keys are degree-capped
    // at 4096 BEFORE the wedge join (a key of degree d contributes C(d,2)
    // wedges — one viral part must not quadratically dominate the shuffle;
    // inactive at test scale where maxdeg ≈ 53, the j_salted_skew argument
    // in cap form), and (2) the Spark top-20 is TakeOrderedAndProject —
    // never a single-partition global-window rank over the pair space; the
    // rank is assigned AFTER the limit, over 20 rows. The global butterfly
    // total rides every row via a 1-row broadcast (the j13 scalar shape).
    QueryDef("g_butterfly",
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS k
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |kd AS (SELECT k, COUNT(*) AS d FROM e GROUP BY k),
        |ek AS (SELECT e.c, e.k FROM e JOIN kd ON kd.k = e.k WHERE kd.d <= 4096),
        |pairs AS (
        |  SELECT a.c AS c1, b.c AS c2, CAST(COUNT(*) AS BIGINT) AS shared_parts
        |  FROM ek a JOIN ek b ON a.k = b.k AND a.c < b.c
        |  GROUP BY a.c, b.c),
        |tot AS (SELECT CAST(SUM(shared_parts * (shared_parts - 1) // 2) AS BIGINT)
        |        AS total_butterflies FROM pairs)
        |SELECT c1, c2, shared_parts,
        |  CAST(shared_parts * (shared_parts - 1) // 2 AS BIGINT) AS pair_butterflies,
        |  total_butterflies, rank
        |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY shared_parts DESC, c1, c2) AS rank
        |      FROM pairs), tot
        |WHERE rank <= 20""".stripMargin) { (s, dir) =>
      // ONE key-shuffle builds the capped adjacency: collect_set dedups
      // (customer, part) edges AND yields the degree (set size) in the
      // same pass — folding the oracle's e/kd/ek CTE chain (distinct +
      // degree count + cap join) into a single ObjectHashAggregate. The
      // sorted set makes c1 < c2 free, and wedge pairs generate MAP-SIDE
      // from each key's list (bounded by the cap: ≤ C(4096,2) per key)
      // instead of a second edge-set shuffle for a self-join.
      val byK = Graft.table(s, dir, "orders")
        .join(Graft.table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("k"))
        .groupBy("k").agg(sort_array(collect_set(col("c"))).as("cs"))
        .filter(size(col("cs")).between(2, 4096))
        // AQE sees a few MB of adjacency rows and coalesces the stage to
        // ~1 partition — then the ~400x wedge explode below runs on ONE
        // core. Re-spread BEFORE the amplification (the repartition moves
        // 20k tiny rows; the explode's 9M outputs then generate on all
        // cores). The explode-amplification blind spot is AQE's, not a
        // data-size problem — this line is what keeps the wedge stage
        // parallel at every scale.
        .repartition(s.sessionState.conf.numShufflePartitions, col("k"))
      // pairs feeds BOTH the global total and the top-20 — one persisted
      // materialization instead of two wedge passes. The pair key packs
      // into ONE long (custkeys < 2^31; c1 < c2 ⇒ packed order = (c1, c2)
      // order) so the 4.5M-group aggregate runs on the primitive-key fast
      // hashmap instead of UnsafeRow struct keys — measured ~2× on the
      // whole query at sf0.1.
      val pairs = byK
        .select(explode(expr(
          """flatten(transform(sequence(1, size(cs) - 1),
            |  i -> transform(sequence(i + 1, size(cs)),
            |    j -> element_at(cs, i) * 4294967296L + element_at(cs, j))))""".stripMargin))
          .as("pk"))
        .groupBy("pk").agg(count(lit(1)).cast("long").as("shared_parts"))
        .select(expr("pk div 4294967296L").as("c1"),
          expr("pk % 4294967296L").as("c2"), col("shared_parts"))
      val tot = pairs.agg(
        sum(expr("shared_parts * (shared_parts - 1) div 2")).cast("long")
          .as("total_butterflies"))
      import org.apache.spark.sql.expressions.Window
      val rankOrder = Seq(col("shared_parts").desc, col("c1"), col("c2"))
      pairs.orderBy(rankOrder: _*).limit(20)
        .withColumn("rank", row_number().over(Window.orderBy(rankOrder: _*)))
        .crossJoin(broadcast(tot))
        .select(col("c1"), col("c2"), col("shared_parts"),
          expr("cast(shared_parts * (shared_parts - 1) div 2 AS bigint)")
            .as("pair_butterflies"),
          col("total_butterflies"), col("rank"))
    }
  )
}
