package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._

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
    // materializes: ~|V| rows (√-ish of |E| on interaction graphs),
    // cheap to cache and to broadcast-join. Each superstep then
    // regenerates the |E| messages with a codegen'd explode over
    // in-memory adjacency rows — no |E|-row shuffle read, no
    // per-iteration re-derivation (fully lazy, superstep k's lineage
    // embeds k-1 full copies of this build; AQE reuses the shuffle
    // writes but re-runs every post-shuffle aggregation — measured 2x
    // slower). r19: the boundary is an eager localCheckpoint rather
    // than persist — downstream superstep plans then start from a flat
    // LogicalRDD instead of re-optimizing the adjacency build under
    // every round and broadcast subtree (g_pr A/B best-of-3: 2.47 s ->
    // 2.14 s, g_cc 1.60 -> 1.39 s, identical rows). Callers free it
    // with CacheScope.freeCheckpoint / sealCheckpoints.
    CacheScope.stageCheckpoint(
      ed.groupBy("src")
        .agg(collect_set(col("dst")).as("nbrs"))
        .select(col("src"), col("nbrs"), size(col("nbrs")).cast("long").as("outdeg")))
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

  /** One PERSONALIZED PageRank superstep: like [[prSuperstep]] but the
    * teleport mass lands only on the seed set (MAX(b) is the per-node
    * seed bonus riding the same single GROUP BY as the damped contrib
    * sum — no second join). State stays SPARSE: only nodes holding mass
    * or receiving it carry rows, so early rounds are
    * seed-neighborhood-sized, not |V|-sized (PPR is local by design). */
  private[graft] def pprSuperstep(adj: DataFrame, ranks: DataFrame,
      seeds: DataFrame, stateRows: Long): DataFrame =
    adj.join(stateSide(ranks.filter(col("pr") > 0), stateRows),
        col("src") === col("node"))
      .select(explode(col("nbrs")).as("node"),
        expr("pr div outdeg").as("c"), lit(0L).as("b"))
      .unionByName(seeds.select(col("node"), lit(0L).as("c"), lit(150000L).as("b")))
      .groupBy("node")
      .agg((max(col("b")) + expr("(85 * sum(c)) div 100")).cast("long").as("pr"))

  /** One personalized-PageRank step in SQL (the prStepSql unrolling
    * contract; `seeds` is a named CTE). */
  private def pprStepSql(prev: String): String =
    s"""SELECT node, CAST(MAX(b) + (85 * SUM(c)) // 100 AS BIGINT) AS pr FROM (
       |  SELECT e.dst AS node, r.pr // e.outdeg AS c, 0 AS b
       |  FROM edges e JOIN $prev r ON e.src = r.node AND r.pr > 0
       |  UNION ALL SELECT node, 0 AS c, 150000 AS b FROM seeds) GROUP BY node""".stripMargin

  /** One min-label superstep over the self-looped adjacency (so a node's
    * own label competes): new label = MIN over the neighborhood. */
  private[graft] def ccSuperstep(adjSelf: DataFrame, labels: DataFrame,
      stateRows: Long): DataFrame =
    adjSelf.join(stateSide(labels, stateRows), col("src") === col("node"))
      .select(explode(col("nbrs")).as("dst"), col("cc"))
      .groupBy(col("dst"))
      .agg(min(col("cc")).as("cc"))
      .select(col("dst").as("node"), col("cc"))

  /** One synchronous label-propagation superstep: a node adopts its
    * neighborhood's MOST FREQUENT label (count DESC, label ASC — the
    * argmax rides a max(struct(c, −lbl)) hash aggregate, the r16
    * map-side idiom, never a per-node sort window). ONE keyed shuffle
    * per superstep (r19, guide §2.4): the messages repartition by the
    * RECEIVER only, and both rollups — the (node, label) vote count and
    * the per-node argmax — then satisfy their required distribution
    * from that single exchange (HashPartitioning(dst) clusters every
    * (dst, lbl) group). The old two-exchange form paid a second
    * |V·labels|-row shuffle for the argmax; its first exchange's
    * map-side vote partials collapse almost nothing anyway (a mapper
    * rarely sees the same (receiver, label) twice), so the fused
    * exchange carries comparable bytes. A/B at sf0.1, both orders
    * within one JVM: 2.48/2.19 s -> 1.69/1.58 s, identical rows. */
  private[graft] def lpaSuperstep(adj: DataFrame, labels: DataFrame,
      stateRows: Long): DataFrame = {
    val shuffleP = adj.sparkSession.sessionState.conf.numShufflePartitions
    adj.join(stateSide(labels, stateRows), col("src") === col("node"))
      .select(explode(col("nbrs")).as("dst"), col("lbl"))
      .repartition(shuffleP, col("dst"))
      .groupBy(col("dst"), col("lbl"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("dst"))
      .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
      .select(col("dst").as("node"), (-col("m.nl")).as("lbl"))
  }

  /** One multi-source BFS superstep: the frontier's neighbors at d+1
    * union the already-reached set, min per node — hop distances grow
    * one level per round, and only REACHED nodes carry state (the
    * unreached majority costs nothing until the wave arrives). */
  private[graft] def bfsSuperstep(adj: DataFrame, dist: DataFrame,
      stateRows: Long): DataFrame =
    adj.join(stateSide(dist, stateRows), col("src") === col("node"))
      .select(explode(col("nbrs")).as("node"), (col("d") + 1).as("d"))
      .unionByName(dist)
      .groupBy("node").agg(min("d").cast("long").as("d"))

  /** One BFS step in SQL, parameterized by the previous distance
    * relation (the unrolling contract). */
  private def bfsStepSql(prev: String): String =
    s"""SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM (
       |  SELECT e.dst AS node, r.d + 1 AS d
       |  FROM ed e JOIN $prev r ON e.src = r.node
       |  UNION ALL SELECT node, d FROM $prev) GROUP BY node""".stripMargin

  /** One LPA step in SQL, parameterized by the previous label relation —
    * textually identical across the unrolled iterations (the
    * prStepSql/ccStepSql contract). */
  private def lpaStepSql(prev: String): String =
    s"""SELECT node, lbl FROM (
       |  SELECT e.dst AS node, r.lbl,
       |    ROW_NUMBER() OVER (PARTITION BY e.dst
       |      ORDER BY COUNT(*) DESC, r.lbl) AS rn
       |  FROM ed e JOIN $prev r ON e.src = r.node
       |  GROUP BY e.dst, r.lbl)
       |WHERE rn = 1""".stripMargin

  /** Eager materialization splits the Pregel phases: the supersteps run
    * inside the query function, while the checkpointed adjacency is
    * alive; what escapes is the |V|-row cached RESULT (the adjacency's
    * blocks are freed before returning, closing the cached-block leak
    * the same way DedupStore.admit does; the small result cache is
    * reclaimed by the ContextCleaner when the DataFrame is dropped). */
  private def materialize(result: DataFrame, adj: DataFrame): DataFrame =
    CacheScope.sealCheckpoints(result, adj)

  /** The thresholded co-purchase edge set and its degree-ordered triangle
    * enumeration, shared by g_triangles and g_clustering_coef. Edge build
    * = the butterfly pair space (one key-shuffle capped adjacency,
    * map-side pair explode, packed-long pair key) with the
    * ≥3-shared-parts threshold applied at the pair aggregate; every edge
    * then points from its lower-(deg, node) endpoint, so a node's
    * oriented out-degree is arboricity-bounded and wedges generate
    * MAP-SIDE from each node's sorted oriented-adjacency list, closing
    * against the oriented edge set on a packed one-long key. Returns
    * (edges c1<c2, oriented, tri) — ALL checkpoint-staged (r19: flat
    * plans per phase; g_triangles A/B best-of-3 3.04 s -> 2.29 s,
    * g_clustering_coef 3.00 s -> 2.47 s, identical rows); the caller
    * seals its result and frees all three. */
  private def triangleFrames(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val shuffleP = s.sessionState.conf.numShufflePartitions
    val byK = Graft.table(s, dir, "orders")
      .join(Graft.table(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("k"))
      .groupBy("k").agg(sort_array(collect_set(col("c"))).as("cs"))
      .filter(size(col("cs")).between(2, 4096))
      .repartition(shuffleP, col("k"))
    val edges = byK
      .select(explode(expr(
        """flatten(transform(sequence(1, size(cs) - 1),
          |  i -> transform(sequence(i + 1, size(cs)),
          |    j -> element_at(cs, i) * 4294967296L + element_at(cs, j))))""".stripMargin))
        .as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("sp"))
      .filter(col("sp") >= 3)
      .select(expr("pk div 4294967296L").as("c1"),
        expr("pk % 4294967296L").as("c2"))
      .pipe(CacheScope.stageCheckpoint) // feeds degree, orientation, and (via oriented) probe
    val deg = edges.select(col("c1").as("node"))
      .unionAll(edges.select(col("c2").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("deg"))
    // orient each edge from its lower (deg, node) endpoint; ordKey packs
    // (deg, node) into one long so the orientation compare, the
    // adjacency sort, and the wedge pair order are all the same compare
    val en = edges
      .join(deg.select(col("node").as("c1"), col("deg").as("d1")), "c1")
      .join(deg.select(col("node").as("c2"), col("deg").as("d2")), "c2")
      .select(expr("d1 * 4294967296L + c1").as("k1"),
        expr("d2 * 4294967296L + c2").as("k2"))
    val oriented = en
      .select(when(col("k1") < col("k2"), col("k1")).otherwise(col("k2")).as("src_k"),
        when(col("k1") < col("k2"), col("k2")).otherwise(col("k1")).as("dst_k"))
      .pipe(CacheScope.stageCheckpoint) // feeds the adjacency AND the closing-edge probe set
    val adj = oriented
      .groupBy(expr("src_k % 4294967296L").as("src"))
      .agg(sort_array(collect_list(col("dst_k"))).as("ks"))
      .filter(size(col("ks")) >= 2)
      // same AQE explode-amplification re-spread as g_butterfly
      .repartition(shuffleP, col("src"))
    // wedge (src; d1, d2) with ordKey(d1) < ordKey(d2) closes iff the
    // oriented edge d1 → d2 exists; probe key = node(d1)·2^32 + node(d2)
    val wedges = adj.select(col("src"), explode(expr(
      """flatten(transform(sequence(1, size(ks) - 1),
        |  i -> transform(sequence(i + 1, size(ks)),
        |    j -> (element_at(ks, i) % 4294967296L) * 4294967296L
        |         + (element_at(ks, j) % 4294967296L))))""".stripMargin)).as("pk2"))
    val probe = oriented.select(
      expr("(src_k % 4294967296L) * 4294967296L + (dst_k % 4294967296L)").as("pk2"))
    val tri = wedges.join(probe, "pk2")
      .select(col("src").as("a"), expr("pk2 div 4294967296L").as("b"),
        expr("pk2 % 4294967296L").as("c"))
      .pipe(CacheScope.stageCheckpoint) // feeds the per-node rollup AND the global total
    (edges, oriented, tri)
  }

  /** Per-node triangle participation counts from the (a, b, c) triples. */
  private def triPerNode(tri: DataFrame): DataFrame =
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("tri_count"))

  /** Oracle-side CTE chain for the thresholded co-purchase graph and its
    * per-node triangle counts (the a<b<c orientation — same triangle
    * set as the Spark side's degree-ordered enumeration). */
  private val triangleSql: String =
    """WITH e AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS k
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |kd AS (SELECT k, COUNT(*) AS d FROM e GROUP BY k),
      |ek AS (SELECT e.c, e.k FROM e JOIN kd ON kd.k = e.k WHERE kd.d <= 4096),
      |pairs AS (
      |  SELECT a.c AS c1, b.c AS c2 FROM ek a JOIN ek b ON a.k = b.k AND a.c < b.c
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |tri AS (
      |  SELECT p1.c1 AS a, p1.c2 AS b, p2.c2 AS c
      |  FROM pairs p1 JOIN pairs p2 ON p2.c1 = p1.c2
      |  JOIN pairs p3 ON p3.c1 = p1.c1 AND p3.c2 = p2.c2),
      |pernode AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_count FROM (
      |    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY node)""".stripMargin

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

    // --------------------------------------------------------------- GRAPH-2d
    // Multi-source BFS hop distance (3 unrolled rounds): how many hops
    // each node sits from a SEED SET (every 100th customer) — the
    // proximity-to-known-entities feature (distance to flagged wallets,
    // to exchange hubs) that degree/PageRank cannot express. Frontier
    // semantics ride the same superstep contract as g_pr/g_cc: fixed
    // k=3 keeps the result exactly oracle-reproducible mid-wave, and
    // only REACHED nodes carry state, so early rounds are frontier-sized
    // rather than |V|-sized. Output is the per-level rollup with integer
    // membership fingerprints.
    QueryDef("g_bfs",
      s"""${graphSql("1 = 1")},
         |d0 AS (SELECT src AS node, CAST(0 AS BIGINT) AS d FROM deg
         |       WHERE src % 200 = 0),
         |d1 AS (${bfsStepSql("d0")}),
         |d2 AS (${bfsStepSql("d1")}),
         |d3 AS (${bfsStepSql("d2")})
         |SELECT d AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(MIN(node) AS BIGINT) AS min_node,
         |  CAST(SUM(node) AS BIGINT) AS sum_nodes
         |FROM d3 GROUP BY d""".stripMargin) { (s, dir) =>
      val adj = adjacency(s, dir, lit(true))
      val nV = adj.count()
      var dist = adj.select(col("src").as("node"))
        .filter(pmod(col("node"), lit(200L)) === 0)
        .withColumn("d", lit(0L))
      // The BFS state is consumed TWICE per round (the frontier explode
      // AND the unionByName carry-over), so a lazy unroll embeds 2^k
      // copies of round 0 by round k. A checkpoint per superstep keeps
      // every round's plan flat (r19 A/B best-of-3: 3.70 s -> 2.26 s,
      // identical rows); blocks freed below.
      val rounds = Seq.newBuilder[DataFrame]
      for (_ <- 1 to iterations) {
        dist = CacheScope.stageCheckpoint(bfsSuperstep(adj, dist, nV))
        rounds += dist
      }
      CacheScope.sealCheckpoints(
        dist.groupBy(col("d").as("dist"))
          .agg(count(lit(1)).cast("long").as("n_nodes"),
            min("node").cast("long").as("min_node"),
            sum("node").cast("long").as("sum_nodes")),
        adj +: rounds.result(): _*)
    },

    // --------------------------------------------------------------- GRAPH-2e
    // Personalized PageRank from the g_bfs seed set (every 100th
    // customer): stationary-ish mass around KNOWN entities — the "risk
    // proximity" score a wallet pipeline propagates outward from flagged
    // addresses, where g_pr's uniform teleport answers global
    // centrality and g_bfs answers hop DISTANCE but not connection
    // STRENGTH. Same unrolled-superstep contract (fixed k=3, all-BIGINT
    // mass arithmetic, exactly oracle-reproducible mid-convergence);
    // the teleport bonus rides the SAME single GROUP BY as the damped
    // contribution sum (a MAX over unioned bonus rows — no second join
    // per round), and the state relation stays sparse: only the seed
    // k-hop neighborhood ever carries rows, so cost tracks the
    // neighborhood, not |V| — the reason PPR scales to billion-node
    // graphs where global PR must touch everything.
    QueryDef("g_ppr",
      s"""${graphSql("1 = 1")},
         |seeds AS (SELECT src AS node FROM deg WHERE src % 200 = 0),
         |p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM seeds),
         |p1 AS (${pprStepSql("p0")}),
         |p2 AS (${pprStepSql("p1")}),
         |p3 AS (${pprStepSql("p2")})
         |SELECT node, pr FROM p3""".stripMargin) { (s, dir) =>
      val adj = adjacency(s, dir, lit(true))
      val nV = adj.count()
      val seeds = adj.select(col("src").as("node"))
        .filter(pmod(col("node"), lit(200L)) === 0)
      var ranks = seeds.withColumn("pr", lit(1000000L))
      // same union-bearing state as g_bfs (the seed-bonus unionByName):
      // checkpoint per superstep so round k's plan stays flat instead of
      // doubling per round (r19 A/B best-of-3: 2.62 s -> 2.41 s)
      val rounds = Seq.newBuilder[DataFrame]
      for (_ <- 1 to iterations) {
        ranks = CacheScope.stageCheckpoint(pprSuperstep(adj, ranks, seeds, nV))
        rounds += ranks
      }
      CacheScope.sealCheckpoints(ranks, adj +: rounds.result(): _*)
    },

    // --------------------------------------------------------------- GRAPH-2c
    // Community detection by synchronous label propagation (3 unrolled
    // rounds): each node adopts its neighborhood's most frequent label,
    // ties to the smallest — the near-linear community primitive
    // (Raghavan et al.) that groups counterparties by interaction
    // DENSITY where g_cc's min-label merges by mere reachability.
    // Deterministic by construction: integer vote counts, (count DESC,
    // label ASC) argmax, and SYNCHRONOUS rounds (the asynchronous form
    // is order-dependent and could never hash-match an oracle). Fixed
    // k=3 keeps the result exactly oracle-reproducible whether or not
    // labels have stabilized — the g_pr/g_cc unrolling contract; the
    // output is the community ROLLUP (size + integer membership
    // fingerprints), the shape a risk pipeline joins back on. Scale: per
    // superstep, one adjacency-explode and two map-side-combinable keyed
    // rollups — no per-node sort anywhere (the vote argmax is the
    // max(struct) idiom, not a window).
    QueryDef("g_lpa",
      s"""${graphSql("l.l_quantity >= 45")},
         |l0 AS (SELECT src AS node, src AS lbl FROM deg),
         |l1 AS (${lpaStepSql("l0")}),
         |l2 AS (${lpaStepSql("l1")}),
         |l3 AS (${lpaStepSql("l2")})
         |SELECT CAST(lbl AS BIGINT) AS community,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(MIN(node) AS BIGINT) AS min_node,
         |  CAST(SUM(node) AS BIGINT) AS sum_nodes
         |FROM l3 GROUP BY lbl""".stripMargin) { (s, dir) =>
      val adj = adjacency(s, dir, col("l_quantity") >= 45)
      val nV = adj.count()
      var labels = adj.select(col("src").as("node"), col("src").as("lbl"))
      for (_ <- 1 to iterations) labels = lpaSuperstep(adj, labels, nV)
      materialize(
        labels.groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).cast("long").as("n_members"),
            min("node").cast("long").as("min_node"),
            sum("node").cast("long").as("sum_nodes")),
        adj)
    },

    // --------------------------------------------------------------- GRAPH-2f
    // Modularity of the g_lpa partition — the quality number that says
    // whether the communities MEAN anything (Newman's Q: intra-community
    // edge fraction minus its degree-preserving random expectation;
    // Q≈0 = no structure). Runs the identical 3-round LPA (same edge
    // predicate, same superstep text), then scores the partition: per
    // community, internal directed-edge count e_c2 and degree mass d_c —
    // each ONE |E|-row join against the |V|-row label state (the
    // superstep shape, linear at 100 TB) — and Q from exact integer
    // cross products (e_c2·m2 − d_c², DECIMAL-widened; d_c² is ~4e24 at
    // billion-edge scale) over the m2² denominator with ONE IEEE
    // division; the total rides a DECIMAL window sum, never a float sum.
    QueryDef("g_modularity",
      s"""${graphSql("l.l_quantity >= 45")},
         |l0 AS (SELECT src AS node, src AS lbl FROM deg),
         |l1 AS (${lpaStepSql("l0")}),
         |l2 AS (${lpaStepSql("l1")}),
         |l3 AS (${lpaStepSql("l2")}),
         |m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM ed),
         |dc AS (SELECT l3.lbl, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |         CAST(SUM(deg.outdeg) AS BIGINT) AS d_c
         |       FROM l3 JOIN deg ON deg.src = l3.node GROUP BY l3.lbl),
         |ec AS (SELECT a.lbl, CAST(COUNT(*) AS BIGINT) AS e_c2
         |       FROM ed JOIN l3 a ON a.node = ed.src
         |               JOIN l3 b ON b.node = ed.dst AND b.lbl = a.lbl
         |       GROUP BY a.lbl)
         |SELECT CAST(dc.lbl AS BIGINT) AS community, n_nodes, d_c,
         |  CAST(COALESCE(ec.e_c2, 0) AS BIGINT) AS e_c2,
         |  CAST(CAST(COALESCE(ec.e_c2, 0) AS DECIMAL(38,0)) * m2
         |       - CAST(d_c AS DECIMAL(38,0)) * d_c AS DOUBLE)
         |    / CAST(CAST(m2 AS DECIMAL(38,0)) * m2 AS DOUBLE) AS q_term,
         |  CAST(SUM(CAST(COALESCE(ec.e_c2, 0) AS DECIMAL(38,0)) * m2
         |           - CAST(d_c AS DECIMAL(38,0)) * d_c) OVER () AS DOUBLE)
         |    / CAST(CAST(m2 AS DECIMAL(38,0)) * m2 AS DOUBLE) AS q_total
         |FROM dc LEFT JOIN ec ON ec.lbl = dc.lbl, m2""".stripMargin) { (s, dir) =>
      val adj = adjacency(s, dir, col("l_quantity") >= 45)
      val nV = adj.count()
      var labels = adj.select(col("src").as("node"), col("src").as("lbl"))
      for (_ <- 1 to iterations) labels = lpaSuperstep(adj, labels, nV)
      // the label state feeds THREE consumers (both e_c2 endpoint joins
      // and the degree-mass rollup) — persist AND materialize it eagerly
      // so the 3-superstep lineage runs exactly once, not once per
      // consumer branch racing to populate the cache
      labels = labels.persist()
      labels.count()
      val m2 = adj.agg(sum("outdeg").cast("long").as("m2"))
      // superstep join discipline: the |V|-row label state broadcasts
      // under the same size guard (Catalyst's estimate for the cached
      // adjacency is array-inflated — an unhinted join plans SMJ even at
      // test scale, the adjacency() lesson)
      val dc = adj.join(stateSide(labels, nV), col("src") === col("node"))
        .groupBy("lbl")
        .agg(count(lit(1)).cast("long").as("n_nodes"),
          sum("outdeg").cast("long").as("d_c"))
      val msgs = adj
        .join(stateSide(labels.withColumnRenamed("lbl", "slbl"), nV),
          col("src") === col("node"))
        .select(explode(col("nbrs")).as("dnode"), col("slbl"))
      val ec = msgs
        .join(stateSide(labels.select(col("node").as("dnode"),
          col("lbl").as("dlbl")), nV), "dnode")
        .filter(col("slbl") === col("dlbl"))
        .groupBy(col("slbl").as("lbl"))
        .agg(count(lit(1)).cast("long").as("e_c2"))
      val dec = "decimal(38,0)"
      val num = coalesce(col("e_c2"), lit(0L)).cast(dec) * col("m2") -
        col("d_c").cast(dec) * col("d_c")
      val den = (col("m2").cast(dec) * col("m2")).cast("double")
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      val out = dc.join(ec, Seq("lbl"), "left").crossJoin(broadcast(m2))
        .select(col("lbl").cast("long").as("community"), col("n_nodes"),
          col("d_c"), coalesce(col("e_c2"), lit(0L)).as("e_c2"),
          (num.cast("double") / den).as("q_term"),
          (sum(num).over(wAll).cast("double") / den).as("q_total"))
      val res = CacheScope.sealResult(out, labels)
      CacheScope.freeCheckpoint(adj) // adjacency is checkpoint-staged now
      res
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
      // Round boundaries are eager localCheckpoints, not persist+count
      // (r19, guide §5): each round's plan then starts from a FLAT
      // |E|-row RDD instead of re-embedding (and re-optimizing, and
      // re-codegen-ing) every earlier round's join tree under the new
      // round — the peel only ever needs the previous round's edge set,
      // never its lineage. A/B at sf0.1 best-of-3: persist+count 5.10 s
      // -> localCheckpoint 3.62 s (1.41x), identical rows. Recompute-
      // on-block-loss (the persist fallback) is not worth the quadratic
      // plan growth here; a lost executor re-runs the query, which is
      // the bench/oracle execution model anyway. Four earlier shapes
      // measured WORSE and are kept out: lazy rounds + AQE exchange
      // reuse (14.0 s — reuse does not fire across the nested
      // semi-joins), window-degree rounds (7.2 s), peel-the-removed-set
      // anti-joins lazy (18.1 s) and persisted (5.0 s).
      var ed = CacheScope.stageCheckpoint(
        e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst"))))
      val rounds = Seq.newBuilder[DataFrame]
      rounds += ed
      for (_ <- 1 to 3) {
        // surv deliberately NOT persisted/broadcast: both endpoint joins
        // read the SAME degree-rollup exchange and AQE's shuffle reuse
        // serves the second join from the first's map output — an A/B
        // with persist(surv) + size-guarded broadcast (the g_pr idiom)
        // measured 8.3 s vs 4.5 s at sf0.1: the blocking per-round
        // count() plus two driver broadcast builds cost more than the
        // reused exchange they replace.
        val surv = ed.groupBy("src").agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select("src")
        val next = CacheScope.stageCheckpoint(ed
          .join(surv, "src")
          .join(surv.select(col("src").as("dst")), "dst")
          .select("src", "dst"))
        rounds += next
        ed = next
      }
      val out = ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("core_degree"))
        .persist()
      out.count()
      rounds.result().foreach(CacheScope.freeCheckpoint)
      out
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
    },

    // --------------------------------------------------------------- GRAPH-4
    // Triangle counting over the thresholded co-purchase graph — the
    // density primitive under community/collusion detection (a wallet ring
    // shows up as a dense triangle cluster long before any single pair is
    // suspicious). The unipartite edge set is the butterfly pair space
    // thresholded at ≥3 shared parts (sparsifies 8.5M pairs → ~15k edges
    // at sf0.1); counting then uses DEGREE-ORDERED orientation — every
    // edge points from its lower-(deg, node) endpoint, so a node's
    // oriented out-degree is bounded by O(√E) regardless of how skewed
    // the raw degree distribution is, and the wedge space (the quadratic
    // term) is arboricity-bounded instead of hub-squared. Wedges generate
    // MAP-SIDE from each node's sorted oriented-adjacency list (the
    // butterfly explode idiom) and close against the oriented edge set on
    // a packed one-long key (primitive-key hashmap, no struct keys). The
    // oracle counts the same triangle set via the simpler a<b<c
    // orientation — identical triangles, per-node counts, and total.
    QueryDef("g_triangles",
      s"""$triangleSql,
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_triangles FROM tri)
        |SELECT node, tri_count, total_triangles, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY tri_count DESC, node) AS rank
        |  FROM pernode), tot
        |WHERE rank <= 20""".stripMargin) { (s, dir) =>
      val (edges, oriented, tri) = triangleFrames(s, dir)
      val pernode = triPerNode(tri)
      // degree-ordered enumeration emits each triangle exactly once (the
      // wedge lives at the triangle's lowest-(deg, node) corner)
      val tot = tri.agg(count(lit(1)).cast("long").as("total_triangles"))
      import org.apache.spark.sql.expressions.Window
      val rankOrder = Seq(col("tri_count").desc, col("node"))
      CacheScope.sealCheckpoints(
        pernode.orderBy(rankOrder: _*).limit(20)
          .withColumn("rank", row_number().over(Window.orderBy(rankOrder: _*)))
          .crossJoin(broadcast(tot))
          .select(col("node"), col("tri_count"), col("total_triangles"), col("rank")),
        edges, oriented, tri)
    },

    // -------------------------------------------------------------- GRAPH-4b
    // Local clustering coefficient — per node, the fraction of its
    // neighbor pairs that are themselves connected (2·T / d·(d−1)): THE
    // per-node cohesion score ("is this wallet embedded in a clique or a
    // hub-and-spoke?") that separates organic communities from
    // wash-trading stars at a glance. Rides the exact triangle spine
    // g_triangles builds (same frames, one extra degree rollup + left
    // join); integer-ppm arithmetic throughout, triangle-free nodes read
    // coefficient 0 — never NULL, so the column is safely aggregable.
    QueryDef("g_clustering_coef",
      s"""$triangleSql,
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |  SELECT c1 AS node FROM pairs UNION ALL SELECT c2 FROM pairs)
        |  GROUP BY node)
        |SELECT d.node, d.deg, COALESCE(t.tri_count, 0) AS tri_count,
        |  CASE WHEN d.deg >= 2
        |    THEN (2 * COALESCE(t.tri_count, 0) * 1000000) // (d.deg * (d.deg - 1))
        |    ELSE 0 END AS coef_ppm
        |FROM deg d LEFT JOIN pernode t ON t.node = d.node""".stripMargin) { (s, dir) =>
      val (edges, oriented, tri) = triangleFrames(s, dir)
      val pernode = triPerNode(tri)
      val deg = edges.select(col("c1").as("node"))
        .unionAll(edges.select(col("c2").as("node")))
        .groupBy("node").agg(count(lit(1)).cast("long").as("deg"))
      CacheScope.sealCheckpoints(
        deg.join(pernode, Seq("node"), "left")
          .withColumn("tri_count", coalesce(col("tri_count"), lit(0L)))
          .withColumn("coef_ppm",
            when(col("deg") >= 2,
              expr("2 * tri_count * 1000000 div (deg * (deg - 1))"))
              .otherwise(0L))
          .select("node", "deg", "tri_count", "coef_ppm"),
        edges, oriented, tri)
    },

    // --------------------------------------------------------------- GRAPH-5
    // Neighbor-set Jaccard similarity between suppliers ("stores with the
    // same customer base") — the node-similarity primitive under
    // entity-resolution and substitute detection. Candidate pairs come
    // ONLY from co-occurrence (two suppliers meet a pair row iff they
    // share ≥1 customer — never |S|² all-pairs), blocked per customer
    // with the same 4096 hub cap as the butterfly (a retail-giant
    // customer connected to every supplier must not quadratically
    // dominate; inactive at test scale). |A∩B| is the pair count,
    // |A|,|B| are per-supplier degrees over the SAME capped edge set, and
    // Jaccard is exact integer ppm — no floats anywhere.
    QueryDef("g_jaccard",
      """WITH e AS (
        |  SELECT DISTINCT l.l_suppkey AS sk, o.o_custkey AS c
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |cd AS (SELECT c, COUNT(*) AS d FROM e GROUP BY c),
        |ec AS (SELECT e.sk, e.c FROM e JOIN cd ON cd.c = e.c WHERE cd.d <= 4096),
        |deg AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS deg FROM ec GROUP BY sk),
        |inter AS (
        |  SELECT a.sk AS s1, b.sk AS s2, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM ec a JOIN ec b ON a.c = b.c AND a.sk < b.sk GROUP BY 1, 2),
        |j AS (
        |  SELECT i.s1, i.s2, i.inter, d1.deg AS deg1, d2.deg AS deg2,
        |    (i.inter * 1000000) // (d1.deg + d2.deg - i.inter) AS jaccard_ppm
        |  FROM inter i JOIN deg d1 ON d1.sk = i.s1 JOIN deg d2 ON d2.sk = i.s2)
        |SELECT s1, s2, inter, deg1, deg2, jaccard_ppm, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard_ppm DESC, s1, s2) AS rank
        |  FROM j)
        |WHERE rank <= 20""".stripMargin) { (s, dir) =>
      val shuffleP = s.sessionState.conf.numShufflePartitions
      // one key-shuffle builds the capped per-customer supplier sets (the
      // cap folds into the same ObjectHashAggregate); a second projection
      // of the SAME grouped relation yields the supplier degrees, so the
      // capped edge set is materialized exactly once
      val byC = Graft.table(s, dir, "orders")
        .join(Graft.table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_suppkey").as("sk"), col("o_custkey").as("c"))
        .groupBy("c").agg(sort_array(collect_set(col("sk"))).as("ss"))
        .filter(size(col("ss")) <= 4096)
        .persist() // feeds the pair explode AND the degree rollup
      val deg = byC.select(explode(col("ss")).as("sk"))
        .groupBy("sk").agg(count(lit(1)).cast("long").as("deg"))
      val inter = byC.filter(size(col("ss")) >= 2)
        .repartition(shuffleP, col("c")) // g_butterfly's AQE re-spread
        .select(explode(expr(
          """flatten(transform(sequence(1, size(ss) - 1),
            |  i -> transform(sequence(i + 1, size(ss)),
            |    j -> element_at(ss, i) * 4294967296L + element_at(ss, j))))""".stripMargin))
          .as("pk"))
        .groupBy("pk").agg(count(lit(1)).cast("long").as("inter"))
        .select(expr("pk div 4294967296L").as("s1"),
          expr("pk % 4294967296L").as("s2"), col("inter"))
      val j = inter
        .join(deg.select(col("sk").as("s1"), col("deg").as("deg1")), "s1")
        .join(deg.select(col("sk").as("s2"), col("deg").as("deg2")), "s2")
        .withColumn("jaccard_ppm",
          expr("inter * 1000000 div (deg1 + deg2 - inter)"))
      import org.apache.spark.sql.expressions.Window
      val rankOrder = Seq(col("jaccard_ppm").desc, col("s1"), col("s2"))
      CacheScope.sealResult(
        j.orderBy(rankOrder: _*).limit(20)
          .withColumn("rank", row_number().over(Window.orderBy(rankOrder: _*)))
          .select(col("s1"), col("s2"), col("inter"), col("deg1"), col("deg2"),
            col("jaccard_ppm"), col("rank")),
        byC)
    },

    // -------------------------------------------------------------- GRAPH-5b
    // Adamic–Adar link prediction over the same capped co-occurrence
    // spine as g_jaccard — the standard "shared rare neighbors matter
    // more" refinement (a customer shared by 2 suppliers is stronger
    // evidence than one shared by 2000), and the first graph statistic
    // here that NEEDS a logarithm: AA(s1,s2) = Σ_{c∈common} 1/ln(deg c).
    // The per-neighbor weight is the PINNED fixed-point ln
    // ([[graft.functions.PinnedLog]]): w_c = 1e18 // ln_nanos(deg_c) —
    // 1/ln in 1e-9 units as pure BIGINT, so pair scores are exact
    // integer sums (order-free at any parallelism, bit-equal in the
    // oracle). Same hub cap (≤4096) and same never-all-pairs blocking;
    // degree-1 customers drop out (they witness no pair), so ln(1)=0
    // never reaches the division. One extra |customers|-row log pass
    // over g_jaccard's shape.
    QueryDef("g_adamic_adar", {
      val wChain = graft.functions.PinnedLogSql.chain(
        "SELECT c, d FROM cd WHERE d >= 2 AND d <= 4096",
        Seq("c", "d"), Seq(("d", "1", "ln_d")))
      s"""WITH e AS (
        |  SELECT DISTINCT l.l_suppkey AS sk, o.o_custkey AS c
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |cd AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY c),
        |w AS (SELECT c, d, 1000000000000000000 // ln_d AS wgt FROM ($wChain)),
        |p AS (
        |  SELECT a.sk AS s1, b.sk AS s2, CAST(COUNT(*) AS BIGINT) AS common,
        |    CAST(SUM(w.wgt) AS BIGINT) AS aa_nanos
        |  FROM e a JOIN e b ON a.c = b.c AND a.sk < b.sk JOIN w ON w.c = a.c
        |  GROUP BY 1, 2)
        |SELECT s1, s2, common, aa_nanos, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY aa_nanos DESC, s1, s2) AS rank
        |  FROM p)
        |WHERE rank <= 20""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      val shuffleP = s.sessionState.conf.numShufflePartitions
      // g_jaccard's one-shuffle capped per-customer supplier sets, plus
      // the per-customer AA weight computed once on the |customers|-row
      // grouped relation (NOT per exploded pair)
      val byC = Graft.table(s, dir, "orders")
        .join(Graft.table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_suppkey").as("sk"), col("o_custkey").as("c"))
        .groupBy("c").agg(sort_array(collect_set(col("sk"))).as("ss"))
        .filter(size(col("ss")) >= 2 && size(col("ss")) <= 4096)
        .withColumn("wgt",
          expr("1000000000000000000L div ln_nanos(cast(size(ss) as bigint), 1L)"))
        .persist()
      val pairs = byC
        .repartition(shuffleP, col("c")) // g_butterfly's AQE re-spread
        .select(col("wgt"), explode(expr(
          """flatten(transform(sequence(1, size(ss) - 1),
            |  i -> transform(sequence(i + 1, size(ss)),
            |    j -> element_at(ss, i) * 4294967296L + element_at(ss, j))))""".stripMargin))
          .as("pk"))
        .groupBy("pk").agg(count(lit(1)).cast("long").as("common"),
          sum("wgt").cast("long").as("aa_nanos"))
        .select(expr("pk div 4294967296L").as("s1"),
          expr("pk % 4294967296L").as("s2"), col("common"), col("aa_nanos"))
      import org.apache.spark.sql.expressions.Window
      val rankOrder = Seq(col("aa_nanos").desc, col("s1"), col("s2"))
      CacheScope.sealResult(
        pairs.orderBy(rankOrder: _*).limit(20)
          .withColumn("rank", row_number().over(Window.orderBy(rankOrder: _*)))
          .select(col("s1"), col("s2"), col("common"), col("aa_nanos"), col("rank")),
        byC)
    },

    // --------------------------------------------------------------- GRAPH-6
    // HITS hubs/authorities on the bipartite customer→supplier graph —
    // the natural bipartite centrality (PageRank's g_pr treats the graph
    // as unipartite): a supplier's authority is the summed hub mass of
    // its customers, a customer's hub mass the summed authority of its
    // suppliers. Two unrolled iterations with L1 (sum) normalization to
    // ppm after every half-step — all-BIGINT arithmetic (order-independent
    // at any parallelism, exact in the oracle), instead of the classic
    // L2 normalization whose sqrt would put a libm call inside the
    // iteration. Per half-step cost: one |E|-row join + |V|-group
    // aggregate — the g_pr superstep shape, linear at 100 TB. The 1-row
    // normalizer rides a broadcast cross join (the j13 scalar idiom).
    QueryDef("g_hits",
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM e),
        |a1 AS (SELECT e.sk, CAST(SUM(h0.h) AS BIGINT) AS a
        |       FROM e JOIN h0 ON h0.c = e.c GROUP BY e.sk),
        |a1n AS (SELECT sk, CAST((a * 1000000)
        |          // (SELECT CAST(SUM(a) AS BIGINT) FROM a1) AS BIGINT) AS a FROM a1),
        |h1 AS (SELECT e.c, CAST(SUM(a1n.a) AS BIGINT) AS h
        |       FROM e JOIN a1n ON a1n.sk = e.sk GROUP BY e.c),
        |h1n AS (SELECT c, CAST((h * 1000000)
        |          // (SELECT CAST(SUM(h) AS BIGINT) FROM h1) AS BIGINT) AS h FROM h1),
        |a2 AS (SELECT e.sk, CAST(SUM(h1n.h) AS BIGINT) AS a
        |       FROM e JOIN h1n ON h1n.c = e.c GROUP BY e.sk),
        |a2n AS (SELECT sk, CAST((a * 1000000)
        |          // (SELECT CAST(SUM(a) AS BIGINT) FROM a2) AS BIGINT) AS a FROM a2)
        |SELECT sk, a AS authority_ppm, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY a DESC, sk) AS rank FROM a2n)
        |WHERE rank <= 20""".stripMargin) { (s, dir) =>
      // BIGINT headroom: each un-normalized score is ≤ deg·1e6 and the
      // re-scale multiplies by 1e6 before the integer divide — safe to
      // ~9e5 edges per node at ppm scale; a trillion-edge deployment
      // drops the scale to 1e3 or widens to DECIMAL(38,0), same plan
      val e0 = Graft.table(s, dir, "orders")
        .join(Graft.table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
        .persist() // the loop-invariant edge relation: four join consumers
      // each un-normalized half-step aggregate feeds TWO consumers (its
      // own L1 total and the normalized projection) — and the chain
      // compounds: left lazy, a2n's lineage would re-execute a1 four
      // times. Persist the |V|-row aggregate at every half-step (the g_pr
      // superstep-state discipline) so each |E|-row join runs exactly once.
      val steps = Seq.newBuilder[DataFrame]
      def l1norm(df0: DataFrame, key: String, v: String): DataFrame = {
        val df = df0.persist()
        steps += df
        val tot = df.agg(sum(v).as("t"))
        df.crossJoin(broadcast(tot))
          .select(col(key), expr(s"$v * 1000000 div t").as(v))
      }
      val h0 = e0.select("c").distinct().withColumn("h", lit(1000000L))
      val a1n = l1norm(
        e0.join(h0, "c").groupBy("sk").agg(sum("h").as("a")), "sk", "a")
      val h1n = l1norm(
        e0.join(a1n, "sk").groupBy("c").agg(sum("a").as("h")), "c", "h")
      val a2n = l1norm(
        e0.join(h1n, "c").groupBy("sk").agg(sum("h").as("a")), "sk", "a")
      import org.apache.spark.sql.expressions.Window
      val rankOrder = Seq(col("a").desc, col("sk"))
      CacheScope.sealResult(
        a2n.orderBy(rankOrder: _*).limit(20)
          .withColumn("rank", row_number().over(Window.orderBy(rankOrder: _*)))
          .select(col("sk"), col("a").as("authority_ppm"), col("rank")),
        e0 +: steps.result(): _*)
    },

    // --------------------------------------------------------------- GRAPH-7
    // Degree assortativity — the Pearson correlation between endpoint
    // degrees across the bipartite edge set ("do busy customers
    // concentrate on busy suppliers?"): the one-number mixing summary a
    // risk model reads before trusting degree features (strong
    // disassortativity means hub wash-trading structure). Two degree
    // rollups + one edge join, moments in exact integers — the cross
    // products ride DECIMAL(38,0) (the dq_chi2_cells 100×-overflow
    // lesson: n·Σx² exceeds BIGINT at ~10^8 edges with 10^5-degree hubs)
    // with correctly-rounded IEEE cast/multiply/sqrt at the very end.
    QueryDef("g_assortativity",
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |dc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS dx FROM e GROUP BY c),
        |ds AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS dy FROM e GROUP BY sk),
        |xy AS (SELECT dc.dx AS x, ds.dy AS y
        |       FROM e JOIN dc USING (c) JOIN ds USING (sk)),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy,
        |        CAST(SUM(x * x) AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) AS BIGINT) AS syy FROM xy)
        |SELECT n, sx, sy, sxy, sxx, syy,
        |  CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |                - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |         * CAST(CAST(n AS DECIMAL(38,0)) * syy
        |                - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)) AS assortativity
        |FROM m""".stripMargin) { (s, dir) =>
      val e0 = Graft.table(s, dir, "orders")
        .join(Graft.table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
        .persist() // feeds both degree rollups AND the edge probe join
      val dc = e0.groupBy("c").agg(count(lit(1)).cast("long").as("dx"))
      val ds = e0.groupBy("sk").agg(count(lit(1)).cast("long").as("dy"))
      val m = e0.join(dc, "c").join(ds, "sk")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("dx").cast("long").as("sx"), sum("dy").cast("long").as("sy"),
          sum(col("dx") * col("dy")).cast("long").as("sxy"),
          sum(col("dx") * col("dx")).cast("long").as("sxx"),
          sum(col("dy") * col("dy")).cast("long").as("syy"))
      val dec = "decimal(38,0)"
      CacheScope.sealResult(
        m.withColumn("assortativity",
          (col("n").cast(dec) * col("sxy") - col("sx").cast(dec) * col("sy"))
            .cast("double") /
            sqrt((col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx"))
              .cast("double") *
              (col("n").cast(dec) * col("syy") - col("sy").cast(dec) * col("sy"))
                .cast("double"))),
        e0)
    }
  )
}
