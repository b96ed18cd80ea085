package graft

import graft.ops.Graph

/** PageRank fixed-point pinned by hand on a toy bipartite graph, plus
  * the full-query shape over sfDir-shaped fixture tables.
  *
  * Toy graph: customers 1 and 2 both trade with supplier 1000001.
  * deg(1) = deg(2) = 1, deg(s) = 2; r0 = 1,000,000 everywhere.
  *   round 1: r(s) = 150000 + 85*(1e6 + 1e6) div 100   = 1,850,000
  *            r(c) = 150000 + 85*(1e6 div 2) div 100   =   575,000
  *   round 2: r(s) = 150000 + 85*(575000*2) div 100    = 1,127,500
  *            r(c) = 150000 + 85*(925000) div 100      =   936,250
  *   round 3: r(s) = 150000 + 85*(936250*2) div 100    = 1,741,625
  *            r(c) = 150000 + 85*(563750) div 100      =   629,187
  */
class GraphSpec extends SparkSpec {

  test("pageRankFromPairs: hand-computed integral ranks after 3 rounds") {
    import spark.implicits._
    val pairs = Seq((1L, 1000001L), (2L, 1000001L)).toDF("c", "s")
    val got = Graph.pageRankFromPairs(pairs, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 629187L, 2L -> 629187L, 1000001L -> 1741625L))
  }

  test("pageRank: full query shape — kind labels, order, topK") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "orders",
      Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey"))
    writeTable(dir, "lineitem",
      Seq((10L, 1L), (20L, 1L)).toDF("l_orderkey", "l_suppkey"))
    val rows = Graph.pageRank(spark, dir, iters = 3, topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // supplier hub outranks the two symmetric customers; topK=2 keeps
    // the hub + the lower-node-id customer (desc rank, asc node)
    assert(rows === Seq((1000001L, "supplier", 1741625L),
      (1L, "customer", 629187L)))
  }

  test("pageRank: deterministic under repartitioning") {
    import spark.implicits._
    // a less symmetric graph: hub supplier + a private supplier
    val pairs = Seq((1L, 1000001L), (2L, 1000001L), (3L, 1000001L),
      (3L, 1000002L)).toDF("c", "s")
    val a = Graph.pageRankFromPairs(pairs, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRankFromPairs(pairs.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    // the 2-degree customer gets more mass than the 1-degree customers
    val ranks = a.toMap
    assert(ranks(3L) > ranks(1L) && ranks(1L) === ranks(2L))
  }

  test("triangle census: oriented wedge closure and classic cc denominator") {
    import spark.implicits._
    val dir = tempSfDir()
    // order 10 ships from suppliers {1,2,3} (a triangle), order 20
    // from {3,4} (a pendant edge); a duplicate line pins the distinct
    writeTable(dir, "lineitem", Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 3L), (20L, 3L), (20L, 4L)
    ).toDF("l_orderkey", "l_suppkey"))
    // edges (1,2)(1,3)(2,3)(3,4); deg 1:2 2:2 3:3 4:1
    // wedges = 1+1+3+0 = 5; triangles = 1; cc = 3000 div 5 = 600
    val rows = Graph.triangleCensus(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows === Seq((4L, 4L, 5L, 1L, 600L)))
  }

  test("k-core peel: pendant chain drops, the clique survives with its core degrees") {
    import spark.implicits._
    val dir = tempSfDir()
    // order 1 = K4 over suppliers {1,2,3,4}; order 2 attaches 5 to 4;
    // order 3 attaches 6 to 5 -> degrees 1:3 2:3 3:3 4:4 5:2 6:1.
    // k=3 round 1 peels 5 and 6; the remaining K4 is stable at d=3.
    writeTable(dir, "lineitem", Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 4L), (2L, 5L), (3L, 5L), (3L, 6L)
    ).toDF("l_orderkey", "l_suppkey"))
    val rows = Graph.kCore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("HITS: matches an independent exact-integer replay on a toy market") {
    import spark.implicits._
    // c1 buys from {s1, s2}, c2 from {s1}, c3 from {s2, s3}
    val pairs = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 20L), (3L, 30L))
      .toDF("c", "s").localCheckpoint()
    val (hub, auth) = Graph.hitsFromPairs(pairs, 3)
    val gotH = hub.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotA = auth.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replay with BigInt maps — same formulas, no Spark
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 20L), (3L, 30L))
    var h = edges.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      val ar = edges.groupBy(_._2).map { case (s, es) =>
        s -> es.map(e => h(e._1)).sum }
      val amx = ar.values.max
      a = ar.map { case (s, v) => s -> (BigInt(1000000) * v / amx) }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum }
      val hmx = hr.values.max
      h = hr.map { case (c, v) => c -> (BigInt(1000000) * v / hmx) }
    }
    assert(gotH === h.map { case (k, v) => k -> v.toLong })
    assert(gotA === a.map { case (k, v) => k -> v.toLong })
  }

  test("LPA communities: barbell graph splits into its two triangles") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4. Hand-computed
    // synchronous rounds (most frequent neighbor label, ties to min):
    //   r1: 1->2 2->1 3->1 4->3 5->4 6->4
    //   r2: 1->1 2->1 3->1 4->4 5->3 6->3
    //   r3: 1->1 2->1 3->1 4->3 5->3 6->3
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
      .localCheckpoint()
    val rows = Graph.communitiesFromEdges(e, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
  }
}
