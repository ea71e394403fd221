package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the round-15 graph family: on random small
  * bipartite purchase graphs, the packed-key / degree-ordered Spark
  * implementations must equal BRUTE-FORCE Scala enumerations of the same
  * integer definitions. This is the test the fixed goldens can't be: the
  * orientation logic, the packed-long arithmetic, and the rank
  * tie-breaks are exercised across hundreds of random shapes, and a
  * triple-count or double-count bug in the wedge close would show up as
  * a count mismatch immediately. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  // dense-ish random bipartite graph: 5 customers x 6 parts
  private val edgeGen = for {
    c <- Gen.chooseNum(1L, 5L)
    p <- Gen.chooseNum(101L, 106L)
  } yield (c, p)

  private def writeDir(rows: Seq[(Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("gprop").toString
    rows.map(_._1).distinct.map(c => (c, c)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    rows.map { case (c, p) => (c, p, p % 7 + 1) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** Co-purchase edges: customer pairs sharing ≥3 distinct parts. */
  private def coEdges(rows: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val byC = rows.distinct.groupBy(_._1).map { case (c, es) => c -> es.map(_._2).toSet }
    val cs = byC.keys.toSeq.sorted
    (for {
      i <- cs.indices; j <- (i + 1) until cs.size
      if (byC(cs(i)) & byC(cs(j))).size >= 3
    } yield (cs(i), cs(j))).toSet
  }

  test("property: g_triangles ≡ brute-force triple enumeration") {
    val prop = forAll(Gen.listOfN(22, edgeGen)) { rows =>
      val edges = coEdges(rows)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val tri = for {
        i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
        a = nodes(i); b = nodes(j); c = nodes(k)
        if edges((a, b)) && edges((b, c)) && edges((a, c))
      } yield (a, b, c)
      val per = tri.flatMap(t => Seq(t._1, t._2, t._3))
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val ranked = per.toSeq.sortBy { case (n, t) => (-t, n) }.take(20)
        .zipWithIndex.map { case ((n, t), i) => (n, t, tri.size.toLong, i + 1) }
      val got = SparkEntry.queries("g_triangles")(spark, writeDir(rows))
        .as[(Long, Long, Long, Int)].collect().toSet
      got == ranked.toSet
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: g_clustering_coef ≡ brute-force 2T/d(d-1)") {
    val prop = forAll(Gen.listOfN(22, edgeGen)) { rows =>
      val edges = coEdges(rows)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val deg = nodes.map(n => n -> edges.count(e => e._1 == n || e._2 == n).toLong).toMap
      val triOf = nodes.map { n =>
        val nbrs = edges.collect { case (a, b) if a == n => b
                                   case (a, b) if b == n => a }.toSeq.sorted
        n -> (for {
          i <- nbrs.indices; j <- (i + 1) until nbrs.size
          x = math.min(nbrs(i), nbrs(j)); y = math.max(nbrs(i), nbrs(j))
          if edges((x, y))
        } yield 1).size.toLong
      }.toMap
      val want = nodes.map { n =>
        val d = deg(n); val t = triOf(n)
        (n, d, t, if (d >= 2) 2 * t * 1000000L / (d * (d - 1)) else 0L)
      }.toSet
      val got = SparkEntry.queries("g_clustering_coef")(spark, writeDir(rows))
        .as[(Long, Long, Long, Long)].collect().toSet
      got == want
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: g_jaccard ≡ brute-force integer-ppm neighbor similarity") {
    val prop = forAll(Gen.listOfN(22, edgeGen)) { rows =>
      // supplier = part % 7 + 1 (the writeDir derivation)
      val e = rows.distinct.map { case (c, p) => (p % 7 + 1, c) }.distinct
      val byS = e.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
      val ss = byS.keys.toSeq.sorted
      val pairs = for {
        i <- ss.indices; j <- (i + 1) until ss.size
        inter = (byS(ss(i)) & byS(ss(j))).size.toLong
        if inter >= 1
      } yield {
        val (d1, d2) = (byS(ss(i)).size.toLong, byS(ss(j)).size.toLong)
        (ss(i), ss(j), inter, d1, d2, inter * 1000000L / (d1 + d2 - inter))
      }
      val ranked = pairs.sortBy(p => (-p._6, p._1, p._2)).take(20)
        .zipWithIndex.map { case (p, i) => (p._1, p._2, p._3, p._4, p._5, p._6, i + 1) }
      val got = SparkEntry.queries("g_jaccard")(spark, writeDir(rows))
        .as[(Long, Long, Long, Long, Long, Long, Int)].collect().toSet
      got == ranked.toSet
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: g_hits ≡ the exact integer two-iteration fold") {
    val prop = forAll(Gen.listOfN(22, edgeGen)) { rows =>
      val e = rows.distinct.map { case (c, p) => (c, p % 7 + 1) }.distinct
      val (cs, sks) = (e.map(_._1).distinct, e.map(_._2).distinct)
      def norm(m: Map[Long, Long]): Map[Long, Long] = {
        val t = m.values.sum
        m.map { case (k, v) => k -> v * 1000000L / t }
      }
      val h0 = cs.map(_ -> 1000000L).toMap
      val a1 = norm(sks.map(s => s -> e.filter(_._2 == s).map(x => h0(x._1)).sum).toMap)
      val h1 = norm(cs.map(c => c -> e.filter(_._1 == c).map(x => a1(x._2)).sum).toMap)
      val a2 = norm(sks.map(s => s -> e.filter(_._2 == s).map(x => h1(x._1)).sum).toMap)
      val ranked = a2.toSeq.sortBy { case (s, a) => (-a, s) }.take(20)
        .zipWithIndex.map { case ((s, a), i) => (s, a, i + 1) }
      val got = SparkEntry.queries("g_hits")(spark, writeDir(rows))
        .as[(Long, Long, Int)].collect().toSet
      got == ranked.toSet
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  // random small undirected graphs for the superstep-level properties
  // (g_lpa / g_bfs run their supersteps on the shared adjacency spine;
  // here the supersteps are driven directly against brute Scala folds)
  private val undGen = Gen.listOfN(25, for {
    a <- Gen.chooseNum(1L, 12L)
    b <- Gen.chooseNum(1L, 12L)
  } yield (a, b))

  private def undirected(raw: Seq[(Long, Long)]): Seq[(Long, Long)] =
    raw.filter(p => p._1 != p._2).flatMap(p => Seq(p, p.swap)).distinct

  test("property: lpaSuperstep ×3 ≡ brute synchronous label propagation") {
    import org.apache.spark.sql.functions.{col, collect_set}
    val prop = forAll(undGen) { raw =>
      val und = undirected(raw)
      und.isEmpty || {
        val adj = und.toDF("src", "dst")
          .groupBy("src").agg(collect_set("dst").as("nbrs"))
        var labels = adj.select(col("src").as("node"), col("src").as("lbl"))
        for (_ <- 1 to 3)
          labels = graft.queries.GraphQueries.lpaSuperstep(adj, labels, 1000L)
        val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nbrs = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
        var lab: Map[Long, Long] = nbrs.keys.map(k => k -> k).toMap
        for (_ <- 1 to 3) lab = nbrs.map { case (v, ns) =>
          val votes = ns.toSeq.map(lab).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
        got == lab
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: bfsSuperstep ×3 ≡ brute multi-source hop distances") {
    import org.apache.spark.sql.functions.{col, collect_set, lit, pmod}
    val prop = forAll(undGen) { raw =>
      val und = undirected(raw)
      und.isEmpty || {
        val adj = und.toDF("src", "dst")
          .groupBy("src").agg(collect_set("dst").as("nbrs"))
        var dist = adj.select(col("src").as("node"))
          .filter(pmod(col("node"), lit(3L)) === 0)
          .withColumn("d", lit(0L))
        for (_ <- 1 to 3)
          dist = graft.queries.GraphQueries.bfsSuperstep(adj, dist, 1000L)
        val got = dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nbrs = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
        var d: Map[Long, Long] =
          nbrs.keys.filter(_ % 3 == 0).map(k => k -> 0L).toMap
        for (_ <- 1 to 3) {
          val next = nbrs.toSeq.flatMap { case (v, ns) =>
            ns.toSeq.collect { case u if d.contains(u) => v -> (d(u) + 1) }
          } ++ d.toSeq
          d = next.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
        }
        got == d
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
