package graft

import graft.ops.Graph

class GraphSpec extends SparkSuite {

  test("weightedPageRank: hand-computed two-iteration trajectory") {
    import spark.implicits._
    // A -> B (w 3), A -> C (w 1), B -> A (w 1); C dangling (no out)
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    // N=3, r0 = 1/3 ≈ 0.333333333333 (round 12)
    // iter1 contributions: A→B 0.333333333333*3/4 = 0.25
    //   A→C 0.333333333333/4 = 0.083333333333 (round 12)
    //   B→A 0.333333333333
    // r1(A) = 0.05 + 0.85*0.333333333333 = 0.333333333333
    // r1(B) = 0.05 + 0.85*0.25 = 0.2625
    // r1(C) = 0.05 + 0.85*0.083333333333 ≈ 0.120833333333
    // C's mass drops (dangling, documented)
    val r1 = Graph.weightedPageRank(edges, "src", "dst", "w", nodes, "id",
      iters = 1).orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(r1(0) == ((1L, 0.333333333333)), s"A ${r1(0)}")
    assert(r1(1) == ((2L, 0.2625)), s"B ${r1(1)}")
    assert(r1(2) == ((3L, 0.120833333333)), s"C ${r1(2)}")
    // iter2: A→B 0.333333333333*0.75=0.25, A→C 0.083333333333,
    //   B→A 0.2625 → r2(A)=0.05+0.85*0.2625=0.273125
    val r2 = Graph.weightedPageRank(edges, "src", "dst", "w", nodes, "id",
      iters = 2).orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(r2(0) == ((1L, 0.273125)), s"A2 ${r2(0)}")
    assert(r2(1) == ((2L, 0.2625)), s"B2 ${r2(1)}")
    assert(r2(2) == ((3L, 0.120833333333)), s"C2 ${r2(2)}")
  }

  test("weightedPageRank: isolated node holds the base rank; guards fire") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val out = Graph.weightedPageRank(edges, "src", "dst", "w", nodes, "id",
      iters = 3).orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // node 3 never receives mass: rank = (1-d)/N = 0.05 every iteration
    assert(out(2) == ((3L, 0.05)), s"isolated ${out(2)}")
    intercept[IllegalArgumentException] {
      Graph.weightedPageRank(edges, "src", "dst", "w", nodes, "id", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.weightedPageRank(edges, "src", "dst", "w",
        nodes.filter($"id" < 0L), "id", iters = 1)
    }
  }

  test("triangleParticipation: K4 minus an edge, with noise edges") {
    import spark.implicits._
    // K4 on {1,2,3,4} minus {3,4} → triangles {1,2,3} and {1,2,4};
    // reversed duplicates, a self-loop and a dangling edge must not
    // change the count
    val edges = Seq(
      (1L, 2L), (2L, 1L), // duplicate in both directions
      (1L, 3L), (3L, 1L),
      (1L, 4L), (2L, 3L), (2L, 4L),
      (5L, 5L), // self-loop drops
      (4L, 9L) // dangling edge — no triangle
    ).toDF("src", "dst")
    val out = Graph.triangleParticipation(edges, "src", "dst")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 1L), (4L, 1L)), out.toSeq)
  }

  test("triangleParticipation: triangle-free graph returns empty") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangleParticipation(path, "src", "dst").count() == 0L)
  }

  test("rootAndDepth: pointer doubling closes a two-root forest") {
    import spark.implicits._
    // forest: 1←2←4←5←6 (depths 1..4) and 1←3; 7 a lone root
    val parents = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)),
      (5L, Some(4L)), (6L, Some(5L)), (7L, None)
    ).toDF("node", "parent")
    val out = Graph.rootAndDepth(parents, "node", "parent")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L),
      (4L, 1L, 2L), (5L, 1L, 3L), (6L, 1L, 4L), (7L, 7L, 0L)), s"got $out")
  }

  test("rootAndDepth: dangling parent pointer terminates as that chain's root") {
    import spark.implicits._
    // 99 is referenced but is not a node (the 10× gate's sf1 find:
    // inner-join doubling silently DROPPED 2, 5 and 6); chain
    // 6←5 hangs off the dangling edge 5→99 two levels deep
    val parents = Seq(
      (1L, None), (2L, Some(99L)), (3L, Some(1L)),
      (5L, Some(99L)), (6L, Some(5L))
    ).toDF("node", "parent")
    val out = Graph.rootAndDepth(parents, "node", "parent")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 0L), (2L, 99L, 1L), (3L, 1L, 1L),
      (5L, 99L, 1L), (6L, 99L, 2L)), s"got $out")
  }

  test("rootAndDepth: unclosed chain (maxDepth too small / cycle) fails fast") {
    import spark.implicits._
    val deep = Seq((1L, None), (2L, Some(1L)), (3L, Some(2L)),
      (4L, Some(3L)), (5L, Some(4L))).toDF("node", "parent")
    // maxDepth 2 → one doubling round → depth-4 chain cannot close
    val e = intercept[Exception] {
      Graph.rootAndDepth(deep, "node", "parent", maxDepth = 2).collect()
    }
    assert(e.getMessage.contains("chain not closed"), e.getMessage)
    val cycle = Seq((1L, Some(2L)), (2L, Some(1L))).toDF("node", "parent")
    val e2 = intercept[Exception] {
      Graph.rootAndDepth(cycle, "node", "parent", maxDepth = 8).collect()
    }
    assert(e2.getMessage.contains("chain not closed"), e2.getMessage)
  }

  test("labelPropagation: two cliques joined by a weak bridge separate") {
    import spark.implicits._
    // clique {1,2,3} (w=10 edges), clique {4,5,6} (w=10), bridge
    // 3–4 (w=1). After 2 rounds each side carries its min member.
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),
      (4L, 5L, 10L), (4L, 6L, 10L), (5L, 6L, 10L),
      (3L, 4L, 1L)
    ).toDF("src", "dst", "w")
    val out = Graph.labelPropagation(edges, "src", "dst", "w", rounds = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)), s"got $out")
  }

  test("labelPropagation: ties adopt the smallest label; self-loops drop") {
    import spark.implicits._
    // node 2's neighbors 1 and 3 tie at w=5 → adopts label 1;
    // the 9-weight self-loop must not override that
    val edges = Seq((1L, 2L, 5L), (3L, 2L, 5L), (2L, 2L, 9L))
      .toDF("src", "dst", "w")
    val out = Graph.labelPropagation(edges, "src", "dst", "w", rounds = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L), (2L, 1L), (3L, 2L)), s"got $out")
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(edges, "src", "dst", "w", rounds = 0)
    }
  }

  test("hits: star graph separates the hub from the authorities") {
    import spark.implicits._
    // node 1 points at 2, 3, 4 — 1 is a pure hub (authority 0),
    // 2-4 pure equal authorities (hub 0)
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val out = Graph.hits(edges, "src", "dst", "w", nodes, "id", iters = 3)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 1.0, 0.0)), s"got $out")
    (1 to 3).foreach { i =>
      assert(out(i)._2 == 0.0, s"got $out")
      assert(math.abs(out(i)._3 - 1.0 / 3) < 1e-6, s"got $out")
    }
  }

  test("hits: bipartite weights rank the heavier authority higher") {
    import spark.implicits._
    // two hubs point at a with total weight 3, at b with 1
    val edges = Seq((1L, 10L, 2L), (2L, 10L, 1L), (2L, 20L, 1L))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 10L, 20L).toDF("id")
    val m = Graph.hits(edges, "src", "dst", "w", nodes, "id", iters = 5)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(m(10L)._3 > m(20L)._3, s"got $m")
    assert(m(1L)._2 > 0.0 && m(2L)._2 > 0.0 && m(10L)._2 == 0.0)
  }

  test("kCore peels the periphery and keeps the clique") {
    import spark.implicits._
    // 4-clique {1,2,3,4} plus a tail 4-5-6: 2-core = the clique
    // (5 and 6 peel in two rounds — degree cascades matter)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val out = Graph.kCore(edges, "src", "dst", k = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), s"got $out")
    // k = 4 is impossible on 4 nodes with degree 3 → empty
    assert(Graph.kCore(edges, "src", "dst", k = 4).isEmpty)
  }

  test("kCore matches brute-force peeling on 12 random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 12).foreach { _ =>
      val nNodes = 4 + rnd.nextInt(10)
      val nEdges = 3 + rnd.nextInt(2 * nNodes)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      val k = 2 + rnd.nextInt(2)
      // brute-force: canonical undirected simple graph, peel to fixpoint
      var und = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      var changed = true
      while (changed) {
        val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (id, xs) => id -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = und.filter(e => keep(e._1) && keep(e._2))
        changed = next != und
        und = next
      }
      val expect = und.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (id, xs) => (id, xs.size.toLong) }
        .toMap
      val got = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k)
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"k=$k edges=$edges: got $got want $expect")
    }
  }

  test("kCore reads direction-free and drops self-loops/parallels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val out = Graph.kCore(edges, "src", "dst", k = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 2L)), s"got $out")
  }
}
