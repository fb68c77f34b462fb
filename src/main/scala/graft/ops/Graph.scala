package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge relations (Page & Brin 1999 for
  * the rank iteration; the implementation is the standard weighted
  * power-iteration form).
  */
object Graph {

  /** Weighted PageRank over `edges (src, dst, w)` for the node set
    * `nodes (id)`: `iters` power iterations of
    * `r'(v) = (1-d)/N + d * Σ_{u→v} r(u) · w(u,v) / W(u)`
    * where `W(u)` is u's total out-weight. Dangling mass (nodes with
    * no out-edges) is intentionally dropped — ranks then need not sum
    * to 1, which keeps the recurrence local to the edge relation (no
    * per-iteration global sum) and is the common variant for link
    * analysis where only the ordering matters.
    *
    * Determinism across engines: per-edge contributions are IEEE
    * double `round(r·w/W, 12)`, summed EXACTLY as DECIMAL(28,12)
    * (order-independent across 1000 executors), then one double
    * multiply-add and a round-12 per node — the repo's moment-ladder
    * device applied to an iterative computation.
    *
    * Scale shape: building `edges` is the caller's corpus-scale step;
    * each iteration here shuffles only the EDGE relation (join on src,
    * aggregate on dst). The rank table is |V| rows — broadcast by AQE
    * when small; for web-scale graphs co-partition edges by src
    * (bucketing) so the per-iteration join is shuffle-free and only
    * the dst aggregation exchanges data. Lineage grows linearly in
    * `iters` (≤ 32 guarded); checkpoint between blocks of iterations
    * for long runs.
    */
  def weightedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      nodes: DataFrame,
      idCol: String,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 32, "weightedPageRank: iters in [1, 32]")
    val n = nodes.count()
    require(n > 0, "weightedPageRank: empty node set")
    val outw = edges.groupBy(col(srcCol)).agg(sum(col(wCol)).as("__tw"))
    // the loop references e every round and the returned rank frame
    // is lazy, so the cache must outlive this call — queue-released
    // (Verify/Bench drain per query; library callers call
    // Robust.unpersistPersisted). A raw persist here leaked the edge
    // relation for the rest of the session (round-14 sweep).
    val e = graft.ops.Robust.registerPersisted(edges
      .join(outw, srcCol)
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(wCol).cast("double").as("__w"), col("__tw").cast("double")))
    val ids = nodes.select(col(idCol).as("__id"))
    var r = ids.select(col("__id"),
      round(lit(1.0) / n.toDouble, 12).as("__r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, col("__src") === col("__id"))
        .select(col("__dst"),
          round(col("__r") * col("__w") / col("__tw"), 12)
            .cast("decimal(28,12)").as("__c"))
      val sums = contrib.groupBy(col("__dst")).agg(sum(col("__c")).as("__s"))
      r = ids.join(sums, col("__id") === col("__dst"), "left")
        .select(col("__id"),
          round(lit((1.0 - damping)) / n.toDouble +
            lit(damping) * coalesce(col("__s"), lit(0)).cast("double"), 12)
            .as("__r"))
    }
    r.select(col("__id").as(idCol), col("__r").as("rank"))
  }

  /** Per-vertex triangle participation over a directed edge relation,
    * read as an UNDIRECTED graph: self-loops drop, each {u,v} pair
    * canonicalizes to (min, max) once, and each triangle {a<b<c} is
    * enumerated exactly once by the ordered two-hop join
    * (a,b)⋈(b,c)⋈(a,c). Returns `(id, n_triangles)` for every vertex
    * in at least one triangle — the standard clustering/cohesion
    * signal next to [[weightedPageRank]]'s centrality.
    *
    * Scale shape: the ordered join IS the compact form of the
    * node-iterator algorithm — the canonical edge list E shuffles
    * twice (on b for the wedge join, then on (a,c) for the closing
    * join), and the a<b<c constraint means every wedge and triangle
    * crosses the wire once, not 3–6×. Wedge count is Σ deg² — the
    * usual skew concern; hub vertices are exactly what AQE skew
    * splitting handles, and a degree cap upstream (drop super-hubs)
    * is the standard mitigation the caller applies to `edges`.
    */
  def triangleParticipation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    // r19: the canonical edge set is referenced THREE times (ab, bc,
    // ac) — without materialization the caller's whole edge-build
    // subtree is pasted into the plan three times (q126's plan held
    // 50 parquet scans of a 4-join pipeline) and re-planned/re-run
    // wherever exchange reuse does not fire. One eager localCheckpoint
    // runs the build + canonicalization once; E is exactly the
    // relation the op's scale shape already assumes is affordable to
    // shuffle twice, so materializing it once is strictly cheaper.
    val e = edges
      .filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .localCheckpoint(true)
    val ab = e.select(col("u").as("a"), col("v").as("b"))
    val bc = e.select(col("u").as("b2"), col("v").as("c"))
    val ac = e.select(col("u").as("a2"), col("v").as("c2"))
    val tri = ab.join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a2") && col("c") === col("c2"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Root and depth for every node of a forest given as a
    * `(node, parent)` relation (`parent` NULL ⇔ root) — the
    * org-chart / category-tree / thread-ancestry rollup. Computed by
    * POINTER DOUBLING (Wyllie 1979): the jump relation starts at one
    * parent step and composes with itself each round, so reach grows
    * as 2^i and a depth-D forest closes in ⌈log₂ D⌉ self-joins of N
    * rows — never the D sequential joins of the naive walk, and never
    * a driver-side loop over collected rows. Roots self-loop with
    * d = 0, which makes them absorbing under composition (joining a
    * closed chain with the root's entry adds nothing), so finished
    * chains stay stable while deep ones keep jumping.
    *
    * Scale shape: each round is ONE equi-join of the N-row jump
    * relation with itself on the ancestor key plus a projection.
    * Because the round composes the relation WITH ITSELF, a lazy
    * plan would double its tree every round (2^rounds join nodes —
    * the pin in PlanSpec caught exactly that); each round therefore
    * MATERIALIZES via `localCheckpoint`, the GraphX/Pregel iteration
    * pattern, keeping every round's plan one join deep and the total
    * cost at 2·⌈log₂ maxDepth⌉ shuffles of N rows. Co-partition by
    * node for shuffle-free rounds on a bucketed table. A node whose
    * chain has NOT reached a root after the rounds (depth > maxDepth,
    * or a cycle — parent relations with cycles are invalid input)
    * fails fast with `raise_error` instead of returning a wrong
    * ancestor.
    *
    * DANGLING parent pointers — an ancestor id that is not itself a
    * node — terminate their chain: the dangling id IS that chain's
    * root (the recursive-CTE walk semantics; org extracts routinely
    * reference a parent outside the snapshot). The doubling join is
    * therefore a LEFT join with the missing side coalesced to a
    * fixed point. The 10× gate caught the inner-join version
    * silently DROPPING such nodes (sf1's offset key ranges put
    * derived parents in inter-replica gaps: 135k of 150k rows
    * vanished); only an in-set, non-root terminal ancestor — a true
    * unclosed chain — raises.
    */
  def rootAndDepth(
      parents: DataFrame,
      nodeCol: String,
      parentCol: String,
      maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= (1 << 20),
      s"graft: maxDepth must be in [1, 2^20], got $maxDepth")
    val rounds =
      (math.ceil(math.log(maxDepth.toDouble) / math.log(2.0))).toInt.max(1)
    var jump = parents.select(
      col(nodeCol).as("node"),
      coalesce(col(parentCol), col(nodeCol)).as("anc"),
      when(col(parentCol).isNull, lit(0L)).otherwise(lit(1L)).as("d"))
    for (_ <- 1 to rounds) {
      // LEFT join: a dangling ancestor (id ∉ node set) is a fixed
      // point — the chain has terminated at its root
      jump = jump.as("a")
        .join(jump.as("b"), col("a.anc") === col("b.node"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("b.anc"), col("a.anc")).as("anc"),
          (col("a.d") + coalesce(col("b.d"), lit(0L))).as("d"))
        // EAGER on purpose: the round references this relation TWICE
        // (self-join) — a lazy checkpoint would let both subtree scans
        // race to materialize it, compounding per round (r18 audit)
        .localCheckpoint(true)
    }
    // terminal ancestor classes: true root (parent NULL) and dangling
    // (not in the node set) are closed; an in-set non-root ancestor
    // means the chain did NOT close within maxDepth → fail fast
    val flags = parents.select(col(nodeCol).as("__n"),
      col(parentCol).isNull.as("__isRoot"))
    jump.join(flags, col("anc") === col("__n"), "left")
      .select(col("node"),
        when(col("__isRoot").isNull || col("__isRoot"), col("anc"))
          .otherwise(raise_error(
          concat(lit(s"rootAndDepth: chain not closed after depth $maxDepth "
            + "(raise maxDepth, or the parent relation has a cycle) at node "),
            col("node").cast("string")))).as("root"),
        col("d").as("depth"))
  }

  /** Synchronous weighted label propagation (Raghavan et al. 2007) for
    * community detection: every node starts labeled with itself; each
    * round it adopts the label with the highest incident edge-weight
    * sum among its neighbors, ties broken by smallest label — a fully
    * deterministic variant of the usually-randomized LPA (synchronous
    * update + total tie order), so reruns and engines agree.
    *
    * Edges are read undirected (mirrored, self-loops dropped, parallel
    * directed pairs weight-merged). Returns `(node, label)` after
    * `rounds` rounds; nodes only ever hold labels from their
    * connected component.
    *
    * Scale shape: per round, ONE edge-scale join (neighbor labels) +
    * one map-side-combined (node, label) weight aggregate + a
    * per-node top-1 window — all keyed shuffles, nothing global.
    * Each round materializes via `localCheckpoint` so the plan stays
    * one round deep (the q160 self-composition lesson: iterative
    * plans must cut lineage or compile exponentially).
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"graft: rounds must be in [1,20], got $rounds")
    import org.apache.spark.sql.expressions.Window
    val dir0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(wCol).as("w"))
      .filter(col("a") =!= col("b"))
    val sym = dir0
      .unionAll(dir0.select(col("b").as("a"), col("a").as("b"), col("w")))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val neigh = sym
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a").as("node"), col("label"))
        .agg(sum(col("w")).as("__score"))
      val top = Window.partitionBy("node")
        .orderBy(col("__score").desc, col("label").asc)
      labels = neigh.withColumn("__rn", row_number().over(top))
        .filter(col("__rn") === 1)
        .select("node", "label")
        // EAGER on purpose: the returned frame is lazy and `sym` is
        // unpersisted right after the loop — lazy rounds would execute
        // only at the caller's action, AFTER the unpersist (r18 audit)
        .localCheckpoint(true)
    }
    sym.unpersist()
    labels
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a weighted edge
    * relation: `iters` rounds of a(v) = Σ_{u→v} h(u)·w, h(u) =
    * Σ_{u→v} a(v)·w, each side sum-normalized per round — the
    * complement of [[weightedPageRank]]: PageRank finds globally
    * endorsed nodes, HITS separates CURATORS (hubs pointing at good
    * content) from CONTENT (authorities pointed at by good curators),
    * the shape of source-catalog vs document-host graphs in crawl
    * curation.
    *
    * Determinism across engines (the weightedPageRank ladder, at 6 dp
    * because the normalizer must cast exactly to double: contributions
    * round-6 → DECIMAL(28,6) exact sums; per-round totals stay below
    * 2^53 micro units for any Σw ≤ ~9e9·max-score, documented): each
    * round is two edge-relation joins + two aggregates + two 1-row
    * normalizer broadcasts; scores round-12 after division so small
    * authorities keep resolution.
    *
    * Scale shape: per iteration only the EDGE relation shuffles; the
    * score tables are |V|-row broadcasts under AQE. `iters` ≤ 32
    * (lineage guard, same as PageRank).
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      nodes: DataFrame,
      idCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 32, "hits: iters in [1, 32]")
    val n = nodes.count()
    require(n > 0, "hits: empty node set")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(wCol).cast("double").as("__w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ids = nodes.select(col(idCol).as("__id"))
    val init = round(lit(1.0) / n.toDouble, 12)
    var h = ids.select(col("__id"), init.as("__h"))
    var a = ids.select(col("__id"), init.as("__a"))
    def normalized(raw0: DataFrame, scoreCol: String): DataFrame = {
      // raw: (__id, __raw DECIMAL(28,6)); total is an exact decimal
      // sum cast ONCE to double (≤ 2^53 micro budget). The raw table
      // is referenced TWICE (join side + normalizer) — checkpoint the
      // |V|-row aggregate so each round's plan stays LINEAR (without
      // it the doubled reference squares the subtree per half-step:
      // 2^(2·iters) analysis blowup, measured hanging at iters = 5)
      // and the per-round lineage is truncated (the labelPropagation
      // discipline).
      // EAGER on purpose: raw is referenced twice (join side +
      // normalizer) — lazy would race both scans into recomputing it,
      // compounding across half-steps (r18 audit)
      val raw = raw0.localCheckpoint(true)
      val tot = raw.agg(sum(col("__raw")).cast("decimal(38,6)").as("__tot"))
      ids.join(raw, Seq("__id"), "left").crossJoin(broadcast(tot))
        .select(col("__id"),
          when(col("__tot") > 0,
            round(coalesce(col("__raw"), lit(0)).cast("double") /
              col("__tot").cast("double"), 12))
            .otherwise(init).as(scoreCol))
    }
    for (_ <- 1 to iters) {
      val aRaw = e.join(h, col("__src") === col("__id"))
        .select(col("__dst"),
          round(col("__h") * col("__w"), 6).cast("decimal(28,6)").as("__c"))
        .groupBy(col("__dst").as("__id")).agg(sum(col("__c")).as("__raw"))
      a = normalized(aRaw, "__a")
      val hRaw = e.join(a, col("__dst") === col("__id"))
        .select(col("__src"),
          round(col("__a") * col("__w"), 6).cast("decimal(28,6)").as("__c"))
        .groupBy(col("__src").as("__id")).agg(sum(col("__c")).as("__raw"))
      h = normalized(hRaw, "__h")
    }
    val out = h.join(a, "__id")
      .select(col("__id").as(idCol),
        round(col("__h"), 6).as("hub"), round(col("__a"), 6).as("authority"))
    // h/a are eagerly localCheckpoint'd each round, so by now nothing
    // references the cached edge projection — release it here or each
    // hits() call leaks its edge blocks for the session lifetime (the
    // labelPropagation discipline)
    e.unpersist()
    out
  }

  /** k-core: the maximal subgraph in which every vertex keeps degree
    * ≥ k, by iterative peeling of sub-k vertices (Seidman 1983) —
    * the standard "dense engagement core vs periphery" cut on
    * interaction graphs (a user in the 10-core has 10 neighbours who
    * ALL also clear the bar — spam rings and drive-by accounts peel
    * away no matter how many raw edges they have).
    *
    * Input is read as an UNDIRECTED simple graph (self-loops drop,
    * parallel edges collapse). Returns `(id, core_degree)` — the
    * surviving vertices with their degree INSIDE the core.
    *
    * Scale shape: each peeling round is one degree aggregate over the
    * current edge set + two semi-joins; the edge set only SHRINKS.
    * Rounds are data-bounded (a path graph peels in O(diameter));
    * `maxRounds` guards the lineage, and the loop exits EARLY via a
    * survivor-count fixpoint check (one cheap count per round on the
    * shrinking relation). `localCheckpoint` every round truncates the
    * per-round lineage growth, the labelPropagation discipline.
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 50,
      assumeUndirected: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // `assumeUndirected`: the caller already canonicalized to distinct
    // (a, b) pairs with a < b (and typically materialized them for its
    // own reuse — q253 recounts inside-core degrees over the SAME
    // relation); skip the redundant normalize+distinct shuffle.
    val und =
      if (assumeUndirected) edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      else edges
        .select(least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    // r18: LAZY localCheckpoint + count fusion — the convergence count
    // is the materializing action, so each round runs ONE job instead
    // of [eager checkpoint job + count job] (guide §1/§2: per-round
    // fixed cost is what iterative ops pay at every scale)
    var cur = und.select(col("a"), col("b")).localCheckpoint(false)
    var prevEdges = -1L
    var curEdges = cur.count()
    var round = 0
    while (curEdges != prevEdges && curEdges > 0 && round < maxRounds) {
      val deg = cur.select(col("a").as("id"))
        .union(cur.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("__d"))
      val keep = deg.filter(col("__d") >= k).select("id")
      cur = cur
        .join(keep.select(col("id").as("a")), "a", "left_semi")
        .join(keep.select(col("id").as("b")), "b", "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(false)
      prevEdges = curEdges
      curEdges = cur.count()
      round += 1
    }
    cur.select(col("a").as("id")).union(cur.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).cast("long").as("core_degree"))
      .filter(col("core_degree") >= k)
  }
}
