package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single map + TakeOrdered
  * (no shuffle of the vectors themselves; Spark's `orderBy + limit`
  * plans as per-partition top-k then a k-sized merge on the driver).
  *
  * Scale path: random-hyperplane LSH bucketing (map-only signature, one
  * shuffle on small bucket keys) or an IVF-style coarse quantizer —
  * probe only matching buckets, turning O(N) per query into
  * O(N / buckets). All vector math is expressed with `zip_with` +
  * `aggregate` higher-order functions: codegen'd, no UDF.
  */
object Similarity {

  /** Left-to-right dot product in double precision (deterministic
    * summation order — parity with sequential oracle implementations).
    * Compiled kernel ([[graft.functions.VectorKernels]]): the HOF form
    * `aggregate(zip_with(...))` ran its lambda interpreted per element
    * and dominated every pairwise query. Bit-identical results.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(call_function("graft_dot", a, a))

  /** One-pass compiled cosine (dot and both norms in a single loop). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Brute-force top-k nearest neighbours to a constant query vector.
    * Plan shape: Scan → Project(cosine) → TakeOrderedAndProject —
    * one pass, no shuffle; at 1000 executors each task returns only k
    * rows to the driver merge.
    */
  def cosineTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    * 1998): greedily pick `k` results from the relevance top-`poolSize`
    * where each step maximizes `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`
    * — the diversity pass a retrieval pipeline runs so the answer set
    * is not five near-copies of the best hit. Returns
    * `(step 1..k, id, rel)` in selection order.
    *
    * Scale shape: the CORPUS work — scoring every vector and keeping
    * the relevance pool — is a map-only scan + distributed
    * TakeOrdered; the pool's pairwise similarity matrix
    * (≤ poolSize² round-6 cosines, compiled kernel) also computes
    * distributed. Only the ≤ poolSize² SCORED matrix collects for the
    * inherently-sequential greedy loop — a result-sized bounded
    * collect (`poolSize ≤ 1000` enforced), the same class as the
    * k-means centroid pull; the corpus never collects. All doubles
    * (round-6 cosines, the λ-combination) use the identical IEEE
    * trees the DuckDB oracle replays, so the selection is
    * engine-deterministic; ties break toward the smaller id.
    */
  def mmrSelect(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int = 5,
      poolSize: Int = 20,
      lambda: Double = 0.5): DataFrame = {
    require(poolSize >= 1 && poolSize <= 1000,
      s"graft: poolSize must be in [1, 1000], got $poolSize")
    require(k >= 1 && k <= poolSize,
      s"graft: k must be in [1, poolSize], got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"graft: lambda must be in [0,1], got $lambda")
    val spark = df.sparkSession
    val q = array(query.map(lit): _*)
    val pool = df.select(col(idCol).cast("long").as("id"),
        round(cosine(col(vecCol), q), 6).as("rel"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("rel").isNotNull)
      .orderBy(col("rel").desc, col("id"))
      .limit(poolSize)
      .persist()
    val sims = pool.as("a").join(pool.as("b"),
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        round(cosine(col("a.__v"), col("b.__v")), 6).as("sim"))
    // bounded collects: poolSize rows + poolSize² sims
    val cand = pool.select("id", "rel").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val sim = sims.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashSet(cand.toSeq: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val pick =
        if (selected.isEmpty) remaining.head // pool is (rel desc, id) sorted
        else remaining.maxBy { case (id, rel) =>
          val maxSim = selected.map(s => sim((id, s._1))).max
          // identical IEEE tree to the oracle: λ·rel − (1−λ)·maxSim
          (lambda * rel - (1.0 - lambda) * maxSim, -id)
        }
      selected += pick
      remaining -= pick
    }
    pool.unpersist()
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, rel), i) => (i + 1L, id, rel) }.toSeq
      .toDF("step", "id", "rel")
  }

  /** Random-hyperplane signature: bit i = sign of dot(vec, h_{offset+i})
    * where h_p is a deterministic pseudo-random hyperplane derived from
    * xxhash64(p, d). Map-only; vectors with equal/nearby signatures
    * land in the same bucket. `offset` selects an independent plane
    * family — the OR-amplification bands of [[cosineNearDupPairsLsh]]
    * each use their own family.
    */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, offset: Int = 0): Column = {
    val sigBits = (0 until planes).map { p =>
      // h_p[d] = centered hash in [-0.5, 0.5): deterministic pseudo-random
      val d0 = dot(vec,
        array((0 until dim).map { d =>
          (pmod(xxhash64(lit(offset + p), lit(d)), lit(1000000L)).cast("double") / 1e6) - 0.5
        }: _*))
      when(d0 > 0, 1L).otherwise(0L)
    }
    sigBits.zipWithIndex.map { case (b, i) => b * (1L << i) }.reduce(_ + _)
  }

  /** LSH-bucketed ANN: assign every vector to a hyperplane-signature
    * bucket; neighbours are searched only within the query's bucket.
    * `planes` tunes recall vs bucket size (16 planes → 65k buckets).
    */
  def lshBuckets(df: DataFrame, vecCol: String, dim: Int, planes: Int = 16): DataFrame =
    df.withColumn("bucket", hyperplaneSignature(col(vecCol), dim, planes))

  /** EXACT all-pairs near-duplicates by embedding cosine ≥ threshold.
    * Plan shape: self broadcast-nested-loop join with an id_a < id_b
    * guard — no shuffle when one side broadcasts; the compiled cosine
    * kernel makes the O(N²/2) verification CPU-bound, not
    * interpreter-bound. This is the exactness baseline; use
    * [[cosineNearDupPairsLsh]] when N² is out of reach.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxRows: Long = 1000000L): DataFrame = {
    // Fail fast above the quadratic-feasibility bound instead of
    // launching an N²/2 verification nobody can wait for: at the
    // default 10⁶ rows that is ~5·10¹¹ cosine evaluations — the
    // practical ceiling of the exactness baseline. Larger corpora must
    // use the sub-quadratic [[cosineNearDupPairsLsh]] path.
    // The projected input is materialized BEFORE the guard count so the
    // upstream pipeline executes once total — otherwise the count plus
    // the two self-join sides would re-run it three times (costly when
    // the input is itself a transform, not a bare scan). localCheckpoint
    // rather than persist: a persist would sit in the CacheManager until
    // someone calls unpersist (the returned frame pinned it forever in
    // long-lived sessions), while checkpoint blocks belong to the RDD
    // and the ContextCleaner frees them once the returned DataFrame is
    // no longer referenced.
    val base = df.select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__vec"))
      .localCheckpoint(true)
    val n = base.count()
    if (n > maxRows) {
      throw new IllegalArgumentException(
        s"cosineNearDupPairs is O(N²) and got N=$n > maxRows=$maxRows; " +
          "use cosineNearDupPairsLsh (sub-quadratic) or raise maxRows explicitly")
    }
    // Embedding tables often arrive as one file = one partition; a
    // broadcast nested-loop join would then verify all N²/2 pairs in a
    // SINGLE task. Spread the stream side across the cluster first
    // (tiny shuffle of N rows buys N-way parallel verification).
    val np = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = base.select(col("__id").as("id_a"), col("__vec").as("__va")).repartition(np)
    val b = base.select(col("__id").as("id_b"), col("__vec").as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("__va"), col("__vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** LSH-bucketed near-duplicates: verification restricted to pairs
    * sharing a hyperplane-signature bucket in ANY of `bands`
    * independent plane families — the sub-quadratic scale path.
    * Standard AND/OR amplification: `planes` per band sharpens
    * precision (smaller buckets), `bands` raises recall
    * (P(candidate) = 1 − (1 − p^planes)^bands for per-plane agreement
    * probability p = 1 − θ/π). Recall < 1 by design; every emitted
    * pair is exact-verified with the compiled cosine kernel.
    * Returns id_a < id_b.
    */
  def cosineNearDupPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      planes: Int = 8,
      bands: Int = 1,
      maxBucket: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__vec"))
    val banded = base.select(col("__id"), col("__vec"),
      posexplode(array((0 until bands).map(b =>
        hyperplaneSignature(col("__vec"), dim, planes, offset = b * planes)): _*))
        .as(Seq("band", "bucket")))
    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list(struct(col("__id"), col("__vec"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    buckets
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .filter(col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        round(cosine(col("a.__vec"), col("b.__vec")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }

  /** SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic
    * deduplication — cluster the embedding space with the IVF coarse
    * quantizer, then inside each cluster run the paper's sequential
    * greedy in id order: a vector is KEPT iff it has no already-KEPT
    * smaller-id neighbor at or above `threshold` cosine. (This keeps
    * strictly more data than "drop anything with ANY smaller-id
    * near-duplicate": for a chain x<y<z with cos(x,y)≥t, cos(y,z)≥t,
    * cos(x,z)<t the greedy keeps {x,z}, since y — the only vector
    * close to z — was itself dropped.) The kept set provably contains
    * no intra-cluster pair ≥ threshold: a kept y compared against
    * every kept x < y before surviving. Requires a numeric id column.
    *
    * Scale shape: the quadratic pass runs INSIDE clusters only, as a
    * per-cell SEQUENTIAL scan (`flatMapGroups`): one executor thread
    * holds every kept vector of its cell and pays O(B² · d) flops for
    * a B-member cell — the paper's greedy is order-dependent, so the
    * pass cannot be distributed within a cell. Both resources are
    * guarded: `maxCell` bounds rows, and `maxCellBytes` bounds the
    * kept-vector heap (rows × dims × 8B), so high-dimensional
    * embeddings tighten the row bound automatically instead of
    * silently multiplying the single-thread work. An oversized cell
    * fails fast with the fix spelled out (raise `cells`; per-cell
    * membership is corpus_size / cells in expectation, so the knob
    * keeps the bound flat at any scale — size `cells` so the expected
    * cell is well inside BOTH bounds). Assignment is a broadcast
    * map-side argmin
    * (no shuffle); the only shuffle carries (cell, id, vec) rows.
    * Cosine rounds to 6 (HALF_UP, identical to Spark `round`) before
    * the threshold compare so the drop decision and the verification
    * contract see identical values. The dropped-id set is checkpointed
    * eagerly (ids only — 8 bytes/row) and the full assigned-corpus
    * checkpoint is unpersisted before returning, so long-lived
    * sessions accumulate only the id-sized blocks. Rows with a NULL id
    * or NULL embedding pass through untouched (nothing to compare).
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int,
      threshold: Double,
      seed: Long = 42L,
      maxCell: Long = 100000L,
      maxCellBytes: Long = 1L << 30): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val index = IvfIndex.fit(df, vecCol, cells, seed)
    // checkpoint: fit already ran the upstream once for its sample; the
    // guard count and the greedy pass below would otherwise each re-run
    // it. Unpersisted before return — only the id-sized kept set lives on.
    val assigned = index.assign(df, vecCol).localCheckpoint(true)
    val biggest = assigned.groupBy("cell").count()
      .agg(max("count")).collect()(0).getLong(0)
    // the row bound alone under-guards high-dim embeddings (the greedy
    // is O(B²·d) work and B×d×8 heap in ONE task), so the byte budget
    // scales the effective bound down by the vector dimension
    val dimsRow = assigned.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    val dims = if (dimsRow.isEmpty) 0 else dimsRow(0).getInt(0)
    val effMax =
      if (dims > 0) math.min(maxCell, maxCellBytes / (dims.toLong * 8L))
      else maxCell
    require(biggest <= effMax,
      s"semDedup: largest cluster has $biggest members > effective bound " +
        s"$effMax (min of maxCell=$maxCell rows and maxCellBytes=" +
        s"$maxCellBytes / ${dims}d×8B vectors); raise `cells` so the " +
        "single-threaded per-cluster greedy pass stays bounded in both " +
        "heap and O(B²·d) work")
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"semDedup requires a numeric id column; got ${df.schema(idCol).dataType}")
    val members = assigned.select(col("cell"),
      col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    // emit the DROPPED ids (not the kept ones) and finish with a
    // left_anti: rows with a NULL id or NULL embedding have no cosine
    // to anything, can never be dropped, and so pass through — the
    // same keep-the-undecidable behavior as the round-7 anti-join
    // form (a left_semi on kept ids would silently delete them)
    val droppedIds = members.groupByKey((r: Row) => r.getInt(0))(Encoders.scalaInt)
      .flatMapGroups { (_: Int, it: Iterator[Row]) =>
        val buf = it.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
          .map(r => (r.getLong(1), r.getSeq[Double](2).toArray)).toArray
        java.util.Arrays.sort(buf, Ordering.by[(Long, Array[Double]), Long](_._1))
        val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
        buf.iterator.flatMap { case (id, v) =>
          var nrm = 0.0
          var i = 0
          while (i < v.length) { nrm += v(i) * v(i); i += 1 }
          val norm = math.sqrt(nrm)
          val nearKept = kept.exists { case (_, kv, knorm) =>
            if (kv.length != v.length) false
            else {
              var sab = 0.0; var j = 0
              while (j < v.length) { sab += kv(j) * v(j); j += 1 }
              val cos = sab / (knorm * norm)
              !java.lang.Double.isNaN(cos) &&
                java.math.BigDecimal.valueOf(cos)
                  .setScale(6, java.math.RoundingMode.HALF_UP)
                  .doubleValue() >= threshold
            }
          }
          if (nearKept) Iterator.single(id)
          else { kept += ((id, v, norm)); Iterator.empty }
        }
      }(Encoders.scalaLong)
      .toDF("__dropped_id")
      .localCheckpoint(true) // eager: ids only, 8 bytes/row
    assigned.unpersist()
    // re-derive the assignment lazily for the caller (map-side argmin,
    // one narrow pass) instead of keeping the corpus-sized checkpoint
    index.assign(df, vecCol)
      .join(droppedIds, col(idCol) === col("__dropped_id"), "left_anti")
  }

  /** Contrastive pair mining for embedding training: for each anchor,
    * the most-similar SAME-label vector (positive) and the
    * most-similar DIFFERENT-label vector (hard negative) by cosine —
    * the standard hard-negative mining pass for contrastive /
    * metric-learning data prep.
    *
    * Scale shape (the knnJoin device): the anchor side is bounded by
    * `maxAnchors` and broadcasts; the corpus streams through ONE
    * narrow pass, and because `max` is algebraic the per-anchor
    * argmax combines map-side — each partition contributes at most
    * one partial per (anchor, polarity), so the shuffle carries
    * O(anchors × partitions) structs, never the anchor×corpus score
    * relation. Cosine rounds to 6 and ties break toward the smaller
    * id (via the negated-id struct field) so the argmax is
    * engine-portable. Requires a numeric id column.
    */
  def contrastiveMine(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      maxAnchors: Int = 65536): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // null labels drop out entirely: SQL's `a.label = b.label` is NULL
    // for them (neither positive nor negative), and `null == null`
    // would silently differ here
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(labelCol).cast("string").as("__l"),
      col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__l").isNotNull)
    val aRows = base.limit(maxAnchors + 1).collect()
    require(aRows.length <= maxAnchors,
      s"contrastiveMine anchor side exceeds maxAnchors=$maxAnchors; mine " +
        "per-cluster (semDedup cells) or per-stratum batches instead")
    val anchors = aRows.filter(r => !r.isNullAt(2))
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Double](2).toArray))
    // fail fast on a mixed-dimension corpus rather than silently
    // skipping rows: every other Similarity op assumes one embedding
    // dim, and a corrupt row vanishing from mining is invisible data
    // loss (round-7 ADVICE)
    val dims = anchors.map(_._3.length).distinct
    require(dims.length <= 1,
      s"contrastiveMine: anchors have mixed embedding dimensions ${dims.sorted.mkString(",")}")
    val dim = if (anchors.nonEmpty) anchors.head._3.length else 0
    val ab = df.sparkSession.sparkContext.broadcast(anchors)
    // the knnJoin device, specialized to k=1 × two polarities: one
    // compiled pass over the corpus keeps (best cos, smallest id) per
    // (anchor, same-label?) slot — the anchor×corpus score relation
    // exists only inside this loop, and each partition emits ≤ 2
    // partial rows per anchor. (The declarative BNLJ form of the same
    // argmax spent ~6 µs/pair on row plumbing — 4.9s at sf0.1 against
    // ~0.5s for this loop.)
    val outSchema = StructType(Seq(
      StructField("anchor_id", LongType), StructField("same", BooleanType),
      StructField("c", DoubleType), StructField("cid", LongType)))
    // embedding tables often arrive one file = one partition; spread
    // the corpus so the compiled pass runs cluster-wide (the
    // cosineNearDupPairs device)
    val np = df.sparkSession.sessionState.conf.numShufflePartitions
    val partial = base.repartition(np).mapPartitions { it =>
      val as = ab.value
      if (as.isEmpty) Iterator.empty
      else {
        val bestC = Array.fill(as.length * 2)(Double.NegativeInfinity)
        val bestId = new Array[Long](as.length * 2)
        it.foreach { row =>
          if (!row.isNullAt(2)) {
            val cv = row.getSeq[Double](2).toArray
            // null vectors have an undefined (SQL-NULL) cosine and can
            // never be an argmax — skipping them matches the oracle;
            // a WRONG-dimension vector is corrupt data and throws
            if (cv.length != dim)
              throw new IllegalArgumentException(
                s"contrastiveMine: embedding dimension ${cv.length} != $dim " +
                  s"(row id ${row.getLong(0)}); clean mixed-dimension rows first")
            val cid = row.getLong(0)
            val cl = row.getString(1)
            var ai = 0
            while (ai < as.length) {
              val a = as(ai)
              val av = a._3
              if (a._1 != cid) {
                // same one-pass accumulation as VectorKernels.cosine
                var sab = 0.0; var saa = 0.0; var sbb = 0.0
                var i = 0
                while (i < av.length) {
                  val x = av(i); val y = cv(i)
                  sab += x * y; saa += x * x; sbb += y * y
                  i += 1
                }
                val cos = sab / (math.sqrt(saa) * math.sqrt(sbb))
                if (!java.lang.Double.isNaN(cos)) {
                  // round exactly like Spark's round(expr, 6): HALF_UP
                  val r = java.math.BigDecimal.valueOf(cos)
                    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                  val slot = ai * 2 + (if (a._2 == cl) 0 else 1)
                  if (r > bestC(slot) ||
                      (r == bestC(slot) && cid < bestId(slot))) {
                    bestC(slot) = r; bestId(slot) = cid
                  }
                }
              }
              ai += 1
            }
          }
        }
        as.iterator.zipWithIndex.flatMap { case (a, ai) =>
          (0 to 1).flatMap { p =>
            val s = ai * 2 + p
            if (bestC(s) == Double.NegativeInfinity) Nil
            else Seq(Row(a._1, p == 0, bestC(s), bestId(s)))
          }
        }
      }
    }(Encoders.row(outSchema))
    // cross-partition merge: max over (cos, -id) structs — identical
    // tie order (higher cos, then smaller id) to the in-partition rule.
    // Anchors missing EITHER side (a singleton label class has no
    // positive; a single-label corpus has no negative) are omitted —
    // they are unusable as contrastive examples, and this matches the
    // oracle's inner join of the pos/neg derivations.
    partial.groupBy("anchor_id")
      .agg(max(when(col("same"), struct(col("c").as("c"),
          (-col("cid")).as("nid")))).as("__p"),
        max(when(!col("same"), struct(col("c").as("c"),
          (-col("cid")).as("nid")))).as("__n"))
      .filter(col("__p").isNotNull && col("__n").isNotNull)
      .select(col("anchor_id"),
        (-col("__p.nid")).as("pos_id"), col("__p.c").as("pos_cos"),
        (-col("__n.nid")).as("neg_id"), col("__n.c").as("neg_cos"))
  }

  /** IVF (inverted-file) index: a coarse k-means quantizer assigns every
    * vector to its nearest centroid's cell; queries probe only the
    * `nprobe` nearest cells. The standard ANN scale path: search cost
    * drops from O(N) to O(N * nprobe / cells).
    *
    * Centroids are fit on a driver-side sample (spark.ml KMeans),
    * then assignment is a broadcast map-side computation — one narrow
    * pass over the corpus, no shuffle.
    */
  case class IvfIndex(centroids: Array[Array[Double]]) {
    /** cell id column for a vector column (argmin of L2 to centroids). */
    def cellCol(vec: Column): Column = {
      if (centroids.length == 1) return lit(0) // least() needs ≥2 args
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        val cCol = array(c.map(lit).toIndexedSeq: _*)
        val d2 = call_function("graft_l2sq", vec, cCol)
        (d2, i)
      }
      val best = least(dists.map(_._1).toIndexedSeq: _*)
      dists.foldLeft(lit(-1)) { case (acc, (d2, i)) =>
        when(d2 === best, lit(i)).otherwise(acc)
      }
    }

    def assign(df: DataFrame, vecCol: String): DataFrame =
      df.withColumn("cell", cellCol(col(vecCol)))

    /** [[assign]] with the plan TRUNCATED (eager `localCheckpoint`):
      * the assignment lineage carries the cells×dim literal argmin
      * tree, and every downstream probe re-ANALYZES it (~1 s of
      * driver time per probe batch at 64 cells — measured dominating
      * the probe itself in the round-10 rehearsal, SCALE.md).
      * Checkpointing materializes the cell column once and hands
      * probes a flat scan. Use this for repeated probing without a
      * persisted index; a one-shot consumer can keep the lazy
      * [[assign]], and inter-run state should go through
      * [[IvfIndex.save]] + a written-out assignment instead.
      */
    def assignForProbing(df: DataFrame, vecCol: String): DataFrame =
      assign(df, vecCol).localCheckpoint(true)

    /** nearest `nprobe` cells for a constant query vector (driver-side). */
    def probeCells(query: Seq[Double], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        (c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.sortBy(_._1).take(nprobe).map(_._2).toSeq
  }

  object IvfIndex {
    /** Persist the index (centroids) as parquet — the inter-run state
      * of an incremental ANN build, symmetric to `Dedup.digests`:
      * cells × dim doubles regardless of corpus size. `load` restores
      * an index whose assignments are bit-identical to the saved one.
      */
    def save(index: IvfIndex, spark: org.apache.spark.sql.SparkSession,
        path: String): Unit = {
      import spark.implicits._
      index.centroids.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }

    def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
      val rows = spark.read.parquet(path).select("cell", "centroid").collect()
      val cents = rows.sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
      require(cents.nonEmpty, s"no centroids found at $path")
      IvfIndex(cents)
    }

    /** Fit centroids on a bounded sample of the corpus, Lloyd-iterated
      * on the driver. A coarse quantizer needs only a representative
      * sample (standard IVF practice — FAISS trains on ~30-256 vectors
      * per cell), so the driver-side fit is O(sample × cells × iters)
      * with NO Spark jobs beyond the one sample-collect; the round-1
      * spark.ml KMeans spent seconds scheduling distributed iterations
      * over data that fits in memory by construction. `maxSample`
      * bounds driver memory at any corpus size.
      */
    def fit(df: DataFrame, vecCol: String, cells: Int, seed: Long = 42L,
        maxSample: Int = 65536): IvfIndex = {
      val n = df.count()
      val frac = math.min(1.0, maxSample.toDouble / math.max(n, 1L))
      val sampled = if (frac < 1.0) df.sample(frac, seed) else df
      // NULL vectors carry no geometry — they can't inform centroids
      // (and would NPE the collect)
      val vecs = sampled.select(col(vecCol).cast("array<double>"))
        .filter(col(vecCol).isNotNull)
        .collect().map(_.getSeq[Double](0).toArray)
      require(vecs.nonEmpty, "cannot fit IVF on an empty corpus")
      val dim = vecs.head.length
      // deterministic init: evenly strided sample points (k-means|| is
      // overkill for a coarse quantizer; strided init on a shuffled-ish
      // hash order is the usual cheap choice)
      val init = (0 until cells).map(i => vecs((i.toLong * vecs.length / cells).toInt).clone())
      val cents = init.toArray
      var iter = 0
      var moved = true
      while (iter < 20 && moved) {
        val sums = Array.fill(cells)(new Array[Double](dim))
        val counts = new Array[Long](cells)
        vecs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cells) {
            var d = 0.0; var j = 0
            while (j < dim) { val t = v(j) - cents(c)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          val s = sums(best)
          var j = 0
          while (j < dim) { s(j) += v(j); j += 1 }
        }
        moved = false
        var c = 0
        while (c < cells) {
          if (counts(c) > 0) {
            var j = 0
            while (j < dim) {
              val m = sums(c)(j) / counts(c)
              if (math.abs(m - cents(c)(j)) > 1e-9) moved = true
              cents(c)(j) = m
              j += 1
            }
          }
          c += 1
        }
        iter += 1
      }
      IvfIndex(cents)
    }
  }

  /** ANN top-k through an IVF index: restrict the brute-force pass to
    * the query's `nprobe` cells.
    */
  def ivfTopK(
      index: IvfIndex,
      assigned: DataFrame, // corpus with a `cell` column
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val cells = index.probeCells(query, nprobe)
    cosineTopK(assigned.filter(col("cell").isin(cells: _*)), idCol, vecCol, query, k)
  }

  /** Batch ANN search through an IVF index: top-k for EVERY query row
    * in ONE pass over the union of all probed cells.
    *
    * This is the default repeated-probe path the round-11 verdict asked
    * for: it routes the corpus through [[IvfIndex.assignForProbing]]
    * internally (pass `preAssigned` to reuse an existing pinned
    * assignment), so no caller composing `assign` + a probe loop pays
    * the measured ~1 s/probe lineage re-analysis — and unlike a probe
    * LOOP (Q separate jobs, Q scans of the assigned corpus), the batch
    * reads the probed-cell union ONCE: each partition keeps a bounded
    * k-heap per query, counts a corpus row only for queries that probed
    * its cell, and emits Q×k rows, so the one shuffle moves Q×k×P rows
    * regardless of corpus size (the [[knnJoin]] shape, restricted by
    * the per-query cell masks).
    *
    * Exactness contract: per query, identical to `ivfTopK` with the
    * same `nprobe` — same probed cells, same (round(cos,6) DESC, id
    * ASC) total order (q239 pins the equivalence).
    */
  def ivfSearchBatch(
      index: IvfIndex,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2,
      maxQueries: Int = 65536,
      preAssigned: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._

    val assigned = preAssigned.getOrElse(index.assignForProbing(corpus, vecCol))
    val c = assigned.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("__cv"), col("cell"))
    val idType = c.schema("corpus_id").dataType
    val qRows = queries.select(col(idCol), col(vecCol).cast("array<double>"))
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"ivfSearchBatch query side exceeds maxQueries=$maxQueries")
    val nCells = index.centroids.length
    // (query_id, vector, probed-cell mask) — masks are cells-sized
    // booleans, bounded by the index, not the corpus
    val qData: Array[(Any, Array[Double], Array[Boolean])] =
      qRows.filter(!_.isNullAt(1)).map { r =>
        val v = r.getSeq[Double](1).toArray
        val mask = new Array[Boolean](nCells)
        index.probeCells(v, nprobe).foreach(mask(_) = true)
        (r.get(0), v, mask)
      }
    val allCells = (0 until nCells).filter(ci => qData.exists(_._3(ci)))
    val restricted = c.filter(col("cell").isin(allCells: _*))
    val qb = corpus.sparkSession.sparkContext.broadcast(qData)
    val idOrd = idOrdering(idType, "ivfSearchBatch")

    val outSchema = StructType(Seq(
      StructField("query_id", idType),
      StructField("corpus_id", idType),
      StructField("cos_sim", DoubleType)))

    val partial = restricted.mapPartitions { it =>
      val qs = qb.value
      if (qs.isEmpty) Iterator.empty
      else {
        val worstFirst = new Ordering[(Double, Any)] {
          def compare(a: (Double, Any), b: (Double, Any)): Int = {
            val d = java.lang.Double.compare(b._1, a._1)
            if (d != 0) d else idOrd.compare(a._2, b._2)
          }
        }
        val heaps = Array.fill(qs.length)(
          new scala.collection.mutable.PriorityQueue[(Double, Any)]()(worstFirst))
        it.foreach { row =>
          if (!row.isNullAt(1)) {
            val cv = row.getSeq[Double](1).toArray
            val cid = row.get(0)
            val cell = row.getInt(2)
            var qi = 0
            while (qi < qs.length) {
              // the mask is the only difference from knnJoin's pass:
              // a row competes only for queries that probed its cell
              if (qs(qi)._3(cell)) {
                val qv = qs(qi)._2
                if (qv.length == cv.length) {
                  var sab = 0.0; var saa = 0.0; var sbb = 0.0
                  var i = 0
                  while (i < qv.length) {
                    val x = qv(i); val y = cv(i)
                    sab += x * y; saa += x * x; sbb += y * y
                    i += 1
                  }
                  val cos = sab / (math.sqrt(saa) * math.sqrt(sbb))
                  if (!java.lang.Double.isNaN(cos)) {
                    val r = java.math.BigDecimal.valueOf(cos)
                      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                    val h = heaps(qi)
                    if (h.size < k) h.enqueue((r, cid))
                    else if (worstFirst.compare((r, cid), h.head) < 0) {
                      h.dequeue(); h.enqueue((r, cid))
                    }
                  }
                }
              }
              qi += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, cid) => Row(qs(qi)._1, cid, cos) }
        }
      }
    }(Encoders.row(outSchema))

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** k-NN join: for EACH row of `queries`, the exact top-k neighbours
    * from `corpus` by cosine.
    *
    * Scale shape: the query set is collected and BROADCAST (bounded by
    * `maxQueries` — a k-NN *join* with a huge query side should go
    * through [[lshBuckets]]/[[IvfIndex]] cell joins instead); each
    * corpus partition keeps a bounded heap of k candidates per query
    * and emits only Q×k rows, so the one shuffle moves Q×k×P rows —
    * NOT the Q×N score matrix the naive crossJoin+window plan sorts
    * (at 10⁴ queries × 10⁸ corpus rows that was a 10¹²-row shuffle
    * for a k-row-per-query answer). A final window over the k×P
    * partials per query merges exactly.
    *
    * Exactness: the heap orders by (round(cos,6) DESC, corpus_id ASC) —
    * the same total order as the merge window — so partial top-k
    * followed by merge top-k is identical to global top-k. Similarity
    * is accumulated left-to-right in one pass, bit-identical to the
    * `graft_cosine` kernel; rows whose cosine is undefined (null vec,
    * dimension mismatch, zero norm) are dropped.
    */
  def knnJoin(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxQueries: Int = 65536): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._

    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val idType = c.schema("corpus_id").dataType
    val qRows = queries.select(col(idCol), col(vecCol).cast("array<double>"))
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"knnJoin query side exceeds maxQueries=$maxQueries; route a large " +
        "query side through lshBuckets/IvfIndex cell joins instead")
    val qData: Array[(Any, Array[Double])] =
      qRows.filter(!_.isNullAt(1)).map(r => (r.get(0), r.getSeq[Double](1).toArray))
    val qb = corpus.sparkSession.sparkContext.broadcast(qData)

    val idOrd = idOrdering(idType, "knnJoin")

    val outSchema = StructType(Seq(
      StructField("query_id", idType),
      StructField("corpus_id", idType),
      StructField("cos_sim", DoubleType)))

    val partial = c.mapPartitions { it =>
      val qs = qb.value
      if (qs.isEmpty) Iterator.empty
      else {
        // head of each heap = current WORST kept candidate
        val worstFirst = new Ordering[(Double, Any)] {
          def compare(a: (Double, Any), b: (Double, Any)): Int = {
            val d = java.lang.Double.compare(b._1, a._1) // lower cos = worse
            if (d != 0) d else idOrd.compare(a._2, b._2) // larger id = worse
          }
        }
        val heaps = Array.fill(qs.length)(
          new scala.collection.mutable.PriorityQueue[(Double, Any)]()(worstFirst))
        it.foreach { row =>
          if (!row.isNullAt(1)) {
            val cv = row.getSeq[Double](1).toArray
            val cid = row.get(0)
            var qi = 0
            while (qi < qs.length) {
              val qv = qs(qi)._2
              if (qv.length == cv.length) {
                // same one-pass left-to-right accumulation as VectorKernels.cosine
                var sab = 0.0; var saa = 0.0; var sbb = 0.0
                var i = 0
                while (i < qv.length) {
                  val x = qv(i); val y = cv(i)
                  sab += x * y; saa += x * x; sbb += y * y
                  i += 1
                }
                val cos = sab / (math.sqrt(saa) * math.sqrt(sbb))
                if (!java.lang.Double.isNaN(cos)) {
                  // round exactly like Spark's round(expr, 6): HALF_UP
                  val r = java.math.BigDecimal.valueOf(cos)
                    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                  val h = heaps(qi)
                  if (h.size < k) h.enqueue((r, cid))
                  else if (worstFirst.compare((r, cid), h.head) < 0) {
                    // strictly better than the worst kept (worse = greater
                    // under worstFirst) → replace
                    h.dequeue(); h.enqueue((r, cid))
                  }
                }
              }
              qi += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, cid) => Row(qs(qi)._1, cid, cos) }
        }
      }
    }(Encoders.row(outSchema))

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Total order on id values shared by the per-partition heaps and
    * the merge window in [[knnJoin]]/[[ivfSearchBatch]]: ids compared
    * the way the window comparator does — numerically, or unsigned
    * UTF-8 bytes for strings.
    */
  private def idOrdering(idType: org.apache.spark.sql.types.DataType,
      caller: String): Ordering[Any] = {
    import org.apache.spark.sql.types._
    idType match {
      case LongType    => Ordering.Long.on[Any](_.asInstanceOf[Long])
      case IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Int])
      case ShortType   => Ordering.Short.on[Any](_.asInstanceOf[Short])
      case DoubleType  => Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double])
      case FloatType   => Ordering.Float.TotalOrdering.on[Any](_.asInstanceOf[Float])
      case StringType => new Ordering[Any] {
        def compare(a: Any, b: Any): Int = {
          val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var i = 0
          val n = math.min(x.length, y.length)
          while (i < n) {
            val d = (x(i) & 0xff) - (y(i) & 0xff)
            if (d != 0) return d
            i += 1
          }
          x.length - y.length
        }
      }
      case t => throw new IllegalArgumentException(s"$caller: unsupported id type $t")
    }
  }

  /** Johnson–Lindenstrauss random projection of an embedding column to
    * `k` dims ([[graft.functions.VectorKernels.randomProject]]): the
    * dimensionality-reduction step before indexing/clustering when the
    * native dim is wastefully large. Map-only, one compiled k·d loop
    * per row, and the ±1 projection "matrix" is a hash function of
    * (seed, row, col) — nothing is materialized, broadcast, or
    * non-deterministic, so a 100 TB projection is restartable and
    * reproducible by construction.
    */
  def randomProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      seed: Long = 42L): DataFrame =
    df.select(col(idCol),
      call_function("graft_random_project", col(vecCol), lit(k), lit(seed))
        .as("projected"))

  /** Pairwise cosine similarity between per-label embedding
    * CENTROIDS — the cluster-confusability readout ("which classes
    * will a classifier mix up?", "which sources embed alike?") and
    * the cheap pre-check before a full SemDeDup pass: label pairs
    * with near-1 centroid cosine are where cross-label near-dups
    * live.
    *
    * Parity chain (the q97 per-dim device end-to-end): components
    * round-6 → DECIMAL(18,6) per-(label, dim) sums → round-6 IEEE
    * mean; pair terms round-12 → DECIMAL(28,12) sums; final
    * `num / (√na·√nb)` round-6 (√ is correctly-rounded IEEE).
    *
    * Scale shape: one corpus-scale posexplode feeding a map-side-
    * combined (label, dim) aggregate — the shuffle carries
    * labels × dims × partitions partials, never vectors; everything
    * after runs on the labels × dims centroid table (the pair join
    * is labels² × dims, bounded by the label alphabet).
    */
  def labelCentroidCosine(
      df: DataFrame,
      labelCol: String,
      vecCol: String): DataFrame = {
    val ex = df.select(col(labelCol).as("__l"),
      posexplode(col(vecCol)).as(Seq("__d", "__x")))
    val cen = ex.groupBy("__l", "__d")
      .agg(round(
        sum(round(col("__x").cast("double"), 6).cast("decimal(18,6)"))
          .cast("double") / count(lit(1)), 6).as("__c"))
    val a = cen.select(col("__l").as("label_a"), col("__d"),
      col("__c").as("__ca"))
    val b = cen.select(col("__l").as("label_b"), col("__d"),
      col("__c").as("__cb"))
    a.join(b, Seq("__d")).filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(
        sum(round(col("__ca") * col("__cb"), 12).cast("decimal(28,12)"))
          .cast("double").as("__num"),
        sum(round(col("__ca") * col("__ca"), 12).cast("decimal(28,12)"))
          .cast("double").as("__na"),
        sum(round(col("__cb") * col("__cb"), 12).cast("decimal(28,12)"))
          .cast("double").as("__nb"))
      .select(col("label_a"), col("label_b"),
        round(col("__num") / (sqrt(col("__na")) * sqrt(col("__nb"))), 6)
          .as("cosine"))
  }

  /** Most-correlated embedding-dimension pairs: Pearson r between
    * dimensions i < j across the corpus, top `topK` by |r| — the
    * redundancy probe before quantization/projection (two dimensions
    * at |r| ≈ 1 carry one dimension of information; random
    * projections and PCA both feed on this structure, and a healthy
    * learned embedding should show LOW pairwise correlation).
    *
    * Computed over the ROUND-6 element values in integer micro-units
    * (the quantized view — statistically identical for a redundancy
    * probe, and it makes EVERY moment exact): each element rounds
    * once (HALF_UP, = Spark/DuckDB `round`) to `micro = r6(x)·10⁶`;
    * Σmicroᵢ, Σmicroᵢ², Σmicroᵢ·microⱼ are exact integers, and each
    * pair's r is one fixed double expression + correctly-rounded √
    * over those integers. Zero-variance dimensions yield NULL r and
    * drop from the ranking; ties break (i, j).
    *
    * Scale shape: ONE imperative `mapPartitions` fold (the
    * documented last-resort case — dims²/2 products per row through
    * any declarative explode/HOF was measured 6.4 s at sf0.1 from
    * interpreted lambdas and 20M-row in-stage inflation; the fold is
    * plain long arithmetic with ZERO row inflation) emitting one
    * partial-moment row per partition; the partials (partitions ×
    * (dims²/2 + 2·dims) longs) explode to (idx, value) and reduce in
    * DECIMAL — nothing row-count-sized crosses the shuffle. Per-term
    * magnitudes: |micro| ≤ 10⁶·|x| keeps partition-local pair sums
    * inside a long up to ~10⁶ rows/partition at unit-norm inputs;
    * the cross-partition merge is DECIMAL(38,0).
    */
  def dimCorrelation(
      df: DataFrame,
      vecCol: String,
      dims: Int,
      topK: Int = 10): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val nPairs = dims * (dims - 1) / 2
    val base = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(vecCol).cast("array<double>").as("__v"))
    val partialSchema = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("s1", ArrayType(LongType, containsNull = false)),
      StructField("s2", ArrayType(LongType, containsNull = false)),
      StructField("sp", ArrayType(LongType, containsNull = false))))
    val partials = base.mapPartitions { it =>
      val s1 = new Array[Long](dims)
      val s2 = new Array[Long](dims)
      val sp = new Array[Long](nPairs)
      val micro = new Array[Long](dims)
      var n = 0L
      it.foreach { r =>
        val v = r.getSeq[Double](0)
        var i = 0
        while (i < dims) {
          // exact HALF_UP round-6 of the double's binary value, then
          // ×10⁶ — identical to round(x, 6) on both engines
          micro(i) = java.math.BigDecimal.valueOf(v(i))
            .setScale(6, java.math.RoundingMode.HALF_UP)
            .movePointRight(6).longValueExact()
          s1(i) += micro(i)
          s2(i) += micro(i) * micro(i)
          i += 1
        }
        var p = 0
        i = 0
        while (i < dims - 1) {
          var j = i + 1
          val mi = micro(i)
          while (j < dims) {
            sp(p) += mi * micro(j)
            p += 1
            j += 1
          }
          i += 1
        }
        n += 1L
      }
      if (n == 0L) Iterator.empty
      else Iterator.single(Row(n, s1.toSeq, s2.toSeq, sp.toSeq))
    }(Encoders.row(partialSchema))
    // merge the per-partition moment vectors: partitions × array rows
    // explode to (idx, value) and reduce in DECIMAL — tiny relation
    val dimAgg = partials
      .select(col("n"), posexplode(arrays_zip(col("s1"), col("s2")))
        .as(Seq("__i", "__z")))
      .groupBy(col("__i"))
      .agg(sum(col("n")).as("__n"),
        sum(col("__z.s1").cast("decimal(38,0)")).as("__s"),
        sum(col("__z.s2").cast("decimal(38,0)")).as("__ss"))
    // row-major upper-triangle index → (i, j): an exact driver-built
    // dims²/2-row lookup, broadcast (a closed-form sqrt inversion
    // risks one-ulp boundary flips)
    val idxRows = (for {
      i <- 0 until dims - 1; j <- i + 1 until dims
    } yield (i, j)).zipWithIndex.map { case ((i, j), p) => (p, i, j) }
    val spark0 = df.sparkSession
    import spark0.implicits._
    val idxDf = idxRows.toDF("__p", "i", "j")
    val pairAgg = partials
      .select(posexplode(col("sp")).as(Seq("__p", "__v")))
      .groupBy(col("__p"))
      .agg(sum(col("__v").cast("decimal(38,0)")).as("__sp"))
      .join(broadcast(idxDf), "__p")
    val a = dimAgg.select(col("__i").as("i"), col("__n").as("__na"),
      col("__s").as("__sa"), col("__ss").as("__ssa"))
    val b = dimAgg.select(col("__i").as("j"), col("__s").as("__sb"),
      col("__ss").as("__ssb"))
    val n = col("__na").cast("double")
    val num = n * col("__sp").cast("double") -
      col("__sa").cast("double") * col("__sb").cast("double")
    val va = n * col("__ssa").cast("double") -
      col("__sa").cast("double") * col("__sa").cast("double")
    val vb = n * col("__ssb").cast("double") -
      col("__sb").cast("double") * col("__sb").cast("double")
    pairAgg.join(broadcast(a), "i").join(broadcast(b), "j")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("__na").cast("long").as("n"),
        when(va > lit(0.0d) && vb > lit(0.0d),
          round(num / sqrt(va * vb), 6)).as("corr"))
      .filter(col("corr").isNotNull)
      .orderBy(abs(col("corr")).desc, col("i"), col("j"))
      .limit(topK)
  }

  /** Most label-DISCRIMINATIVE embedding dimensions: the one-way
    * ANOVA F of each dimension's values across the label classes
    * (between-class / within-class variance — the Fisher screen
    * behind LDA), top `topK` by F. The complement of
    * [[dimCorrelation]]: that one asks which dims REPEAT each other,
    * this one asks which dims SEPARATE the classes — the two screens
    * a projection/quantization pass runs before spending budget.
    *
    * Same quantized-view contract as [[dimCorrelation]]: elements
    * round once to micro units, so every per-(dim, label) moment is
    * an exact integer; each dim's F then follows q199's ANOVA ladder
    * (per-class s²/n terms rounded 6, summed as DECIMAL, one fixed
    * double expression). Degenerate dims (zero within-class
    * variance, or a single class) yield NULL and drop.
    *
    * Scale shape: ONE posexplode to (dim, label, micro) with map-side
    * combine straight down to the (dims × labels)-sized moment table;
    * everything after is dims-sized arithmetic. No pair blowup at
    * all — this is the cheap screen; run it before [[dimCorrelation]].
    */
  def dimDiscrimination(
      df: DataFrame,
      vecCol: String,
      labelCol: String,
      dims: Int,
      topK: Int = 10): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val micro = (round(col("__x"), 6).cast("decimal(18,6)") * 1000000)
      .cast("long")
    val cells = df
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull &&
        size(col(vecCol)) === dims)
      .select(col(labelCol).as("__l"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x")))
      .select(col("__l"), col("__i"), micro.as("__m"))
      .groupBy("__i", "__l")
      .agg(count(lit(1)).as("__ng"),
        // Per-term DECIMAL, not long: micro values are bounded by the
        // decimal(18,6) quantized view at |m| < 1e18, so m*m (< 1e36)
        // would silently wrap a 64-bit product for |x| >= ~3037 and the
        // long SUM itself wraps past ~9.2e18 under non-ANSI Spark.
        // decimal(19,0) terms make the product decimal(38,0) — exact for
        // the full quantized domain, matching the HUGEINT oracle.
        sum(col("__m").cast("decimal(19,0)")).cast("decimal(38,0)")
          .as("__sg"),
        sum(col("__m").cast("decimal(19,0)") *
            col("__m").cast("decimal(19,0)")).cast("decimal(38,0)")
          .as("__ssg"))
    val term = round(
      col("__sg").cast("double") * col("__sg").cast("double") /
        col("__ng").cast("double"), 6).cast("decimal(38,6)")
    val agg = cells.groupBy("__i").agg(
      count(lit(1)).as("__k"), sum(col("__ng")).as("__n"),
      sum(col("__sg")).cast("decimal(38,0)").as("__s"),
      sum(col("__ssg")).cast("decimal(38,0)").as("__ss"),
      sum(term).as("__a"))
    val (nD, kD) = (col("__n").cast("double"), col("__k").cast("double"))
    val ssb = col("__a").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD
    val ssw = col("__ss").cast("double") - col("__a").cast("double")
    agg.select(col("__i").cast("long").as("dim"),
      col("__k").cast("long").as("n_classes"),
      col("__n").cast("long").as("n"),
      when(col("__k") > 1 && col("__n") > col("__k") && ssw > lit(0.0d),
        round((ssb / (kD - lit(1.0d))) / (ssw / (nD - kD)), 6)).as("f"))
      .filter(col("f").isNotNull)
      .orderBy(col("f").desc, col("dim"))
      .limit(topK)
  }

  /** Leading eigenpair (principal component) of the embedding
    * dimension SAMPLE covariance matrix, plus the explained-variance
    * share λ₁/trace — the "is this embedding effectively
    * one-dimensional" screen a projection/quantization pass runs
    * before spending budget (a near-1 share means most dims are
    * redundant and [[randomProject]]/[[Quantize]] are nearly free).
    *
    * Computation: ONE distributed mapPartitions moment fold to
    * (n, S1[d], SP[d·(d+1)/2]) over round-6 micro units — the
    * [[dimCorrelation]] quantized-view contract, diagonal included —
    * merged on the driver by LONG addition (exact and
    * order-independent, so the merge is deterministic under any
    * partitioning); then d² driver-side power iteration from the
    * deterministic e₁ start, `iters` fixed steps with L2
    * normalization. The corpus never sees a second pass and nothing
    * corpus-sized collects (partials are partitions × O(d²) longs).
    *
    * Returns `(n, eigenvalue, explained_share, component: Seq[Double])`
    * with the sign convention component[argmax |component|] > 0.
    * Within-partition micro² accumulation carries the documented
    * |x| ≲ 3000 long budget of the dimCorrelation family.
    */
  /** Result of [[leadingEigen]]: the sample size, leading eigenvalue,
    * explained-variance share, unit eigenvector, and the full (small,
    * d×d) covariance matrix for downstream contracts/projections.
    */
  case class EigenResult(n: Long, eigenvalue: Double, share: Double,
      component: Seq[Double], cov: Array[Array[Double]])

  def leadingEigen(
      df: DataFrame,
      vecCol: String,
      dims: Int,
      iters: Int = 5000): EigenResult = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val nMoments = dims * (dims + 1) / 2
    val base = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(vecCol).cast("array<double>").as("__v"))
    val partialSchema = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("s1", ArrayType(LongType, containsNull = false)),
      StructField("sp", ArrayType(LongType, containsNull = false))))
    val partials = base.mapPartitions { it =>
      val s1 = new Array[Long](dims)
      val sp = new Array[Long](nMoments)
      val micro = new Array[Long](dims)
      var n = 0L
      it.foreach { r =>
        val v = r.getSeq[Double](0)
        var i = 0
        while (i < dims) {
          micro(i) = java.math.BigDecimal.valueOf(v(i))
            .setScale(6, java.math.RoundingMode.HALF_UP)
            .movePointRight(6).longValueExact()
          s1(i) += micro(i)
          i += 1
        }
        var p = 0
        i = 0
        while (i < dims) {
          var j = i
          val mi = micro(i)
          while (j < dims) { sp(p) += mi * micro(j); p += 1; j += 1 }
          i += 1
        }
        n += 1L
      }
      if (n == 0L) Iterator.empty
      else Iterator.single(Row(n, s1.toSeq, sp.toSeq))
    }(Encoders.row(partialSchema)).collect()
    require(partials.nonEmpty, "leadingEigen: empty corpus")
    val s1 = new Array[Long](dims)
    val sp = new Array[Long](nMoments)
    var n = 0L
    partials.foreach { r =>
      n += r.getLong(0)
      val a = r.getSeq[Long](1); val b = r.getSeq[Long](2)
      var i = 0
      while (i < dims) { s1(i) += a(i); i += 1 }
      i = 0
      while (i < nMoments) { sp(i) += b(i); i += 1 }
    }
    require(n >= 2, s"leadingEigen: needs >= 2 vectors, got $n")
    // sample covariance in VALUE units from the exact micro moments
    val cov = Array.ofDim[Double](dims, dims)
    var p = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val c = (n.toDouble * sp(p).toDouble - s1(i).toDouble * s1(j).toDouble) /
          (n.toDouble * (n - 1).toDouble) / 1e12
        cov(i)(j) = c; cov(j)(i) = c
        p += 1; j += 1
      }
      i += 1
    }
    var v = Array.tabulate(dims)(k => if (k == 0) 1.0 else 0.0)
    var lambda = 0.0
    var it2 = 0
    while (it2 < iters) {
      val next = new Array[Double](dims)
      var a = 0
      while (a < dims) {
        var s = 0.0; val row = cov(a)
        var b = 0
        while (b < dims) { s += row(b) * v(b); b += 1 }
        next(a) = s; a += 1
      }
      val norm = math.sqrt(next.map(x => x * x).sum)
      if (norm == 0.0) { it2 = iters } // null matrix: keep start vector
      else {
        var c = 0
        while (c < dims) { next(c) /= norm; c += 1 }
        lambda = norm
        v = next
        it2 += 1
      }
    }
    // Rayleigh quotient for the eigenvalue (power-iter norm converges
    // to |λ|; the quotient carries the sign)
    val cv = Array.tabulate(dims)(a => (0 until dims).map(b => cov(a)(b) * v(b)).sum)
    lambda = (0 until dims).map(a => v(a) * cv(a)).sum
    val argmax = v.indices.maxBy(k => math.abs(v(k)))
    if (v(argmax) < 0) v = v.map(-_)
    val trace = (0 until dims).map(k => cov(k)(k)).sum
    val share = if (trace > 0) lambda / trace else Double.NaN
    EigenResult(n, lambda, share, v.toSeq, cov)
  }

  /** Per-DIMENSION embedding drift: [[CorpusStats.psi]]'s population
    * stability index computed independently for every coordinate of
    * the embedding, between a reference slice and the rest — the
    * embedding-space twin of the scalar drift gate (q166). The
    * monitor that catches "the new crawl's vectors moved in dims
    * 17 and 40" long before a downstream model does.
    *
    * Values are bucketed over the FIXED [−1, 1] domain in round-6
    * micro integers — `(micro + 10⁶)·B div (2·10⁶ + 1)`, the q202
    * no-IEEE-boundary device; out-of-domain values clamp to the edge
    * buckets. Same Laplace smoothing (+1 per observed bucket) and
    * round-6 DECIMAL term ladder as the scalar op, per dim. Rows
    * with a NULL slice flag, NULL vector or wrong length are
    * excluded (the q232 length guard).
    *
    * Output: top-`topK` drifted `(dim, n_ref, n_cur, n_buckets,
    * psi)`, PSI descending (ties → dim).
    *
    * Scale shape: ONE posexplode scan → (dim, bucket)-keyed
    * map-side-combined aggregate (dims×buckets cells); totals and
    * the term sum run on the cell table (bounded windows); never a
    * corpus-sized shuffle.
    */
  def dimDrift(
      df: DataFrame,
      vecCol: String,
      isRef: Column,
      dims: Int,
      buckets: Int = 8,
      topK: Int = 10): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val base = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dims &&
        isRef.isNotNull)
      .select(isRef.as("__r"),
        posexplode(col(vecCol)).as(Seq("dim", "__v")))
    val micro = (round(col("__v").cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    val cells = base
      .withColumn("__m", micro + 1000000L)
      .groupBy(col("dim"),
        greatest(lit(0L), least(lit(buckets - 1L),
          expr(s"__m * ${buckets}L div 2000001L"))).as("__b"))
      .agg(sum(when(col("__r"), 1L).otherwise(0L)).as("cr"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("cc"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("dim")
    val p = (col("cr") + lit(1L)).cast("double") /
      (col("__nr") + col("__nb")).cast("double")
    val q = (col("cc") + lit(1L)).cast("double") /
      (col("__nc") + col("__nb")).cast("double")
    cells
      .withColumn("__nr", sum(col("cr")).over(w))
      .withColumn("__nc", sum(col("cc")).over(w))
      .withColumn("__nb", count(lit(1)).over(w))
      .select(col("dim"), col("__nr"), col("__nc"), col("__nb"),
        round((p - q) * log(p / q), 6).cast("decimal(18,6)").as("__t"))
      .groupBy("dim", "__nr", "__nc", "__nb")
      .agg(round(sum(col("__t")).cast("double"), 6).as("psi"))
      .select(col("dim").cast("long").as("dim"),
        col("__nr").cast("long").as("n_ref"),
        col("__nc").cast("long").as("n_cur"),
        col("__nb").cast("long").as("n_buckets"), col("psi"))
      .orderBy(col("psi").desc, col("dim"))
      .limit(topK)
  }

  /** Grid-density core points (the DBSCAN core-point criterion over
    * an integer cell grid — Ester et al. 1996 by way of the standard
    * grid approximation): project the embedding onto two coordinates,
    * quantize to `cellSize` cells, and call a cell CORE when its
    * 3×3 neighborhood holds ≥ `minPts` points. The cheap density map
    * that finds over-represented regions of embedding space (scraper
    * farms, template clusters) without any pairwise distance work.
    *
    * Exactness: cell ids are `floor(coord / cellSize)` longs — float
    * → double widening is exact, the division is one correctly-
    * rounded IEEE op, floor is exact — so the grid, the counts, and
    * the 9-cell sums are all integers; both engines agree bit-for-bit.
    *
    * Scale shape: ONE map-side-combined aggregate to the CELL table
    * (bounded by occupied cells, not points); the 3×3 neighborhood
    * sum explodes 9 offsets on that cell table and re-aggregates —
    * cell-sized work end to end. No pair joins, no corpus shuffle
    * beyond the count's partials. At 100 TB the cell table is the
    * only thing that moves.
    */
  def gridCorePoints(
      df: DataFrame,
      vecCol: String,
      cellSize: Double,
      minPts: Long,
      dimX: Int = 1,
      dimY: Int = 2): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val cells = df
      .select(
        floor(element_at(col(vecCol), dimX).cast("double") / cellSize)
          .as("cx"),
        floor(element_at(col(vecCol), dimY).cast("double") / cellSize)
          .as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("n_pts"))
    val offs = array((-1 to 1).map(lit): _*)
    val shifted = cells
      .select(col("cx"), col("cy"), col("n_pts"),
        explode(offs).as("__dx"))
      .select(col("cx") + col("__dx").cast("long"), col("cy"),
        col("n_pts"), explode(offs).as("__dy"))
      .toDF("__nx", "cy", "n_pts", "__dy")
      .select(col("__nx"), (col("cy") + col("__dy").cast("long")).as("__ny"),
        col("n_pts"))
      .groupBy(col("__nx").as("cx"), col("__ny").as("cy"))
      .agg(sum("n_pts").as("density"))
    cells.join(shifted, Seq("cx", "cy"))
      .select(col("cx").cast("long").as("cx"),
        col("cy").cast("long").as("cy"),
        col("n_pts").cast("long").as("n_pts"),
        col("density").cast("long").as("density"),
        (col("density") >= minPts).as("core"))
  }

  /** Confident-learning label-noise matrix (Northcutt et al. 2021,
    * simplified to centroid self-confidence): count rows by (given
    * label, confidently-assigned label), where a row is assigned to
    * the class whose centroid it is most similar to AMONG classes
    * clearing their own mean self-confidence threshold — the
    * off-diagonal mass is the estimated label-noise map ("class 3
    * examples that look like class 7"), the audit run before
    * training on weak labels.
    *
    * Parity chain: centroids are the q192 round-6 decimal means;
    * per-row class cosines ride the compiled `graft_cosine` kernel
    * (bit-matched to DuckDB's `list_inner_product` composition —
    * the q75 device); thresholds are round-6 decimal-sum means;
    * the argmax is a struct-max with (cosine DESC, class ASC)
    * tie-break — every decision on round-6 doubles both engines
    * share.
    *
    * Scale shape: one (label × dim) centroid aggregate; a CLASS-COUNT
    * sized driver collect (the IVF centroid precedent — 10×64 values
    * here); then ONE map-only corpus pass computing C cosines per row
    * with the argmax as a map-side-combined struct-max per row-group —
    * the corpus×classes relation never shuffles. The matrix is
    * C²-bounded.
    */
  def labelNoiseMatrix(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String): DataFrame = {
    val base = df
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).cast("long").as("__l"),
        col(vecCol).cast("array<double>").as("__v"))
    val ex = base.select(col("__l"), posexplode(col("__v")).as(Seq("__d", "__x")))
    val cen = ex.groupBy("__l", "__d")
      .agg(round(
        sum(round(col("__x"), 6).cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("__c"))
    // class-count-sized collect: C × dims values (bounded by the label
    // alphabet, not the corpus)
    val cents: Array[(Long, Array[Double])] = cen.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (l, rows) => (l, rows.sortBy(_._2).map(_._3)) }
      .toArray.sortBy(_._1)
    val melted = base.select(col("__id"), col("__l"),
      explode(array(cents.map { case (cls, arr) =>
        struct(lit(cls).as("cls"),
          round(cosine(col("__v"), lit(arr)), 6).as("c"))
      }: _*)).as("__e"))
      .select(col("__id"), col("__l"),
        col("__e.cls").as("__cls"), col("__e.c").as("__c"))
    val th = melted.filter(col("__cls") === col("__l"))
      .groupBy(col("__cls"))
      .agg(round(
        sum(col("__c").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("__t"))
    melted.join(broadcast(th), "__cls")
      .filter(col("__c") >= col("__t"))
      .groupBy(col("__id"), col("__l"))
      // struct-max argmax: highest cosine, then SMALLEST class
      .agg(max(struct(col("__c").as("c"),
        (-col("__cls")).as("negcls"))).as("__m"))
      .select(col("__l").as("given_label"),
        (-col("__m.negcls")).as("assigned_label"))
      .groupBy("given_label", "assigned_label")
      .agg(count(lit(1)).as("n"))
  }

  /** First-relevant rank per anchor (the per-query half of MRR):
    * for each anchor vector, the rank of the first SAME-LABEL
    * neighbor in the full (cosine DESC, id ASC) ordering of all
    * other vectors, and its reciprocal — the retrieval-quality
    * readout for an embedding space ("how deep must a user scroll
    * before a true neighbor appears").
    *
    * Parity: round-6 kernel cosines (the q75 device); the best
    * same-label neighbor is a struct-max with (cosine DESC, id ASC)
    * tie-break; the rank is 1 + the count of candidates strictly
    * above that struct — every decision on shared round-6 doubles
    * and integer ids.
    *
    * Scale shape: anchors broadcast (anchor-count bounded); TWO
    * corpus passes (best per anchor — a map-side-combined struct-max
    * — then the above-count against the broadcast best table); the
    * anchor×corpus score relation never shuffles.
    */
  def firstRelevantRank(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      anchorPred: Column): DataFrame = {
    val base = df
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(labelCol).cast("long").as("__l"),
        col(vecCol).cast("array<double>").as("__v"))
    val anchors = base.filter(anchorPred)
      .select(col("__id").as("__aid"), col("__l").as("__alab"),
        col("__v").as("__av"))
    def pairs = base.crossJoin(broadcast(anchors))
      .filter(col("__id") =!= col("__aid"))
      .select(col("__aid"), col("__alab"), col("__id"), col("__l"),
        round(cosine(col("__v"), col("__av")), 6).as("__c"))
    val best = pairs.filter(col("__l") === col("__alab"))
      .groupBy("__aid")
      .agg(max(struct(col("__c").as("c"), (-col("__id")).as("negid")))
        .as("__b"))
    pairs.join(broadcast(best), "__aid")
      .filter(struct(col("__c").as("c"), (-col("__id")).as("negid")) >
        col("__b"))
      .groupBy("__aid").agg(count(lit(1)).as("__above"))
      .join(broadcast(best.select(col("__aid"))), Seq("__aid"), "right_outer")
      .select(col("__aid").as("anchor_id"),
        (coalesce(col("__above"), lit(0L)) + 1L).as("first_rank"))
      .withColumn("rr",
        round(lit(1.0d) / col("first_rank").cast("double"), 6))
  }
}
