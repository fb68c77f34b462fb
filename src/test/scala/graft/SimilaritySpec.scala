package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions.col

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by cosine similarity") {
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), k = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 1L))
  }

  test("mmrSelect diversifies: the near-copy of the best hit is passed over") {
    // relevance order is a, b (a near-copy of a), c. Pure top-2
    // returns the two near-copies; MMR's second pick must be the
    // diverse c — b's ~0.9995 similarity to the selected a erases its
    // relevance edge at λ = 0.5. (The query must NOT be parallel to
    // a: with q ∥ a, rel(x) ≡ sim(x, a) and every MMR score
    // degenerates to exactly 0.)
    val df = Seq(
      (10L, Seq(0.95f, 0.312f)),   // a: rel ≈ 0.950
      (11L, Seq(0.94f, 0.341f)),   // b: near-copy of a, rel ≈ 0.940
      (12L, Seq(0.9f, -0.436f))    // c: diverse, rel ≈ 0.900
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(df, "vec_id", "embedding",
        query = Seq(1.0, 0.0), k = 2, poolSize = 3, lambda = 0.5)
      .select("step", "id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 10L), (2L, 12L)), s"got $out")
    // λ = 1 degenerates to pure relevance: picks the near-copy
    val pure = Similarity.mmrSelect(df, "vec_id", "embedding",
        query = Seq(1.0, 0.0), k = 2, poolSize = 3, lambda = 1.0)
      .select("step", "id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(pure == Seq((1L, 10L), (2L, 11L)), s"got $pure")
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(df, "vec_id", "embedding", Seq(1.0, 0.0),
        k = 5, poolSize = 3)
    }
  }

  test("cosine of identical vectors is 1") {
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding",
      Seq(0.0, 0.0, 1.0), k = 1)
      .as[(Long, Double)].head()
    assert(out == ((3L, 1.0)))
  }

  test("knnJoin returns k neighbours per query") {
    val out = Similarity.knnJoin(vecs.filter($"vec_id" > 0), vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 2)
    val rows = out.select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(rows.map(_._2) == Seq(1L, 2L)) // nearest then next
  }

  test("knnJoin bounded-heap partials match the naive crossJoin+window result") {
    // 40 corpus vectors across several partitions, 5 queries, with
    // engineered cosine ties (duplicate vectors) to exercise the
    // (cos DESC, corpus_id ASC) tie-break at the heap boundary
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      val v = Array.fill(4)(rnd.nextGaussian().toFloat)
      (i.toLong + 100L, (if (i % 5 == 0) Array(1.0f, 0.5f, 0.0f, 0.0f) else v).toSeq)
    }
    val corpus = base.toDF("vec_id", "embedding").repartition(8)
    val queries = Seq((0L, Seq(1.0f, 0.4f, 0.1f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)), (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)), (4L, Seq(1.0f, 0.5f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.knnJoin(corpus, queries, "vec_id", "embedding", k = 3)
      .select("query_id", "corpus_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val naive = {
      val c = corpus.select($"vec_id".as("corpus_id"), $"embedding".cast("array<double>").as("cv"))
      val q = queries.select($"vec_id".as("query_id"), $"embedding".cast("array<double>").as("qv"))
      val w = Window.partitionBy("query_id").orderBy($"cos_sim".desc, $"corpus_id")
      q.crossJoin(c)
        .select($"query_id", $"corpus_id",
          round(Similarity.cosine($"qv", $"cv"), 6).as("cos_sim"))
        .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
        .as[(Long, Long, Double, Int)].collect().toSet
    }
    assert(got == naive)
  }

  test("knnJoin rejects an oversized query side") {
    val err = intercept[IllegalArgumentException] {
      Similarity.knnJoin(vecs, vecs, "vec_id", "embedding", k = 1, maxQueries = 2)
    }
    assert(err.getMessage.contains("maxQueries"))
  }

  test("cosineNearDupPairs fails fast above the quadratic bound") {
    val err = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.9, maxRows = 2)
    }
    assert(err.getMessage.contains("cosineNearDupPairsLsh"))
  }

  test("LSH buckets put identical vectors together") {
    val b = Similarity.lshBuckets(vecs, "embedding", dim = 3, planes = 8)
    val buckets = b.select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(buckets(0L) == buckets(0L)) // deterministic
    val again = Similarity.lshBuckets(vecs, "embedding", dim = 3, planes = 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(buckets == again)
  }

  test("JL random projection: deterministic, dim k, cosine roughly preserved") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" < 80)
    val p1 = Similarity.randomProject(emb, "vec_id", "embedding", k = 32)
    assert(p1.select(org.apache.spark.sql.functions.size($"projected"))
      .distinct().as[Int].head() == 32)
    val m1 = p1.as[(Long, Array[Double])].collect().toMap
    val m2 = Similarity.randomProject(emb, "vec_id", "embedding", k = 32)
      .as[(Long, Array[Double])].collect().toMap
    assert(m1.keySet == m2.keySet
      && m1.keySet.forall(k => m1(k).sameElements(m2(k))))
    // different seed → different projection
    val m3 = Similarity.randomProject(emb, "vec_id", "embedding", k = 32, seed = 7L)
      .as[(Long, Array[Double])].collect().toMap
    assert(m1.keySet.exists(k => !m1(k).sameElements(m3(k))))
    // cosine preservation (the JL contract): measure max |Δcos| over
    // all pairs of the 80-vector sample
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val orig = emb.selectExpr("vec_id", "cast(embedding as array<double>) e")
      .as[(Long, Array[Double])].collect().toMap
    val devs = for {
      a <- orig.keys.toSeq; b <- orig.keys.toSeq if a < b
    } yield math.abs(cos(orig(a), orig(b)) - cos(m1(a), m1(b)))
    info(f"max |dcos| = ${devs.max}%.4f, mean = ${devs.sum / devs.size}%.4f")
    // k=32 sign-JL: per-pair σ ≈ 1/√k ≈ 0.18; the max over ~3k pairs
    // sits near 3.5σ (measured 0.57) — bound mean tightly, max loosely
    assert(devs.max < 0.75, f"JL cosine deviation too large: ${devs.max}%.4f")
    assert(devs.sum / devs.size < 0.2,
      f"JL mean deviation too large: ${devs.sum / devs.size}%.4f")
  }

  test("semDedup: keep-min-id inside clusters, contract holds, guard trips") {
    // single cluster (cells=1) makes the greedy rule hand-checkable:
    // 1≈2 and 3≈4 are near-dup pairs, 5 is far from everything
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.01)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.02, 1.0)),
      (5L, Seq(-1.0, -1.0))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(vecs, "vec_id", "embedding",
      cells = 1, threshold = 0.95)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L))
    // contract: no kept intra-cluster pair at/above threshold
    val k = Similarity.semDedup(vecs, "vec_id", "embedding",
      cells = 1, threshold = 0.95)
    val a = k.select($"vec_id".as("id_a"), $"cell",
      $"embedding".cast("array<double>").as("va"))
    val b = k.select($"vec_id".as("id_b"), $"cell",
      $"embedding".cast("array<double>").as("vb"))
    val viol = a.join(b, Seq("cell")).filter($"id_a" < $"id_b")
      .filter(org.apache.spark.sql.functions.round(
        Similarity.cosine($"va", $"vb"), 6) >= 0.95)
    assert(viol.count() == 0)
    // oversized-cluster guard fails fast with the remedy in the message
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedup(vecs, "vec_id", "embedding",
        cells = 1, threshold = 0.95, maxCell = 2L)
    }
    assert(e.getMessage.contains("raise `cells`"))
  }

  test("semDedup passes NULL-embedding rows through untouched (round-8 review)") {
    // a row with no vector can't be near anything — the round-7
    // anti-join form kept it, and the greedy rewrite must too
    val vecs = Seq(
      (1L, Some(Seq(1.0, 0.0))), (2L, Some(Seq(1.0, 0.001))),
      (3L, Option.empty[Seq[Double]])).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(vecs, "vec_id", "embedding",
      cells = 1, threshold = 0.95)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L), s"null-embedding row must survive, got $kept")
  }

  test("semDedup sequential greedy: a chain keeps both endpoints (paper semantics)") {
    // round-7 ADVICE: x<y<z with cos(x,y)>=t, cos(y,z)>=t, cos(x,z)<t.
    // Drop-any-smaller-id would keep only {x}; SemDeDup's sequential
    // greedy keeps {x,z} because y — z's only near neighbor — was
    // itself dropped by x and the kept set is what z compares against.
    val x = Seq(1.0, 0.0)
    val y = Seq(math.cos(0.35), math.sin(0.35)) // ~20° from x
    val z = Seq(math.cos(0.70), math.sin(0.70)) // ~20° from y, ~40° from x
    val t = 0.9 // cos(20°)≈0.9397 >= t; cos(40°)≈0.766 < t
    val vecs = Seq((1L, x), (2L, y), (3L, z)).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(vecs, "vec_id", "embedding",
      cells = 1, threshold = t)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("contrastiveMine fails fast on a dimension-mismatched vector") {
    val rows = Seq(
      (1L, "a", Seq(1.0, 0.0)), (2L, "a", Seq(0.9, 0.1)),
      (3L, "b", Seq(0.0, 1.0))).toDF("id", "label", "vec")
    val bad = rows.union(
      Seq((4L, "b", Seq(0.1, 0.2, 0.3))).toDF("id", "label", "vec"))
    // every row is an anchor here, so the mixed-dim require trips on
    // the driver; a corpus-side straggler would surface the same
    // message wrapped in a SparkException
    val e = intercept[Exception] {
      Similarity.contrastiveMine(bad, "id", "vec", "label").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimension")))
  }

  test("semDedup with real clusters only prunes within a cluster") {
    // two well-separated clusters; duplicates exist in each
    val vecs = Seq(
      (10L, Seq(5.0, 0.1)), (11L, Seq(5.0, 0.11)), (12L, Seq(4.0, 2.0)),
      (20L, Seq(-5.0, 0.1)), (21L, Seq(-5.0, 0.12))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(vecs, "vec_id", "embedding",
      cells = 2, threshold = 0.999)
      .select("vec_id").as[Long].collect().sorted.toSeq
    // 11 dropped by 10, 21 dropped by 20; 12 (same cluster as 10 but
    // not a near-dup at 0.999) survives
    assert(kept == Seq(10L, 12L, 20L))
  }

  test("contrastiveMine: per-anchor positive/negative argmax with id tie-break") {
    // label A: 1=(1,0), 2=(0.9,0.1); label B: 3=(0,1), 4=(0.1,0.9)
    val vecs = Seq(
      (1L, "A", Seq(1.0, 0.0)), (2L, "A", Seq(0.9, 0.1)),
      (3L, "B", Seq(0.0, 1.0)), (4L, "B", Seq(0.1, 0.9)))
      .toDF("vec_id", "label", "embedding")
    val m = Similarity.contrastiveMine(vecs, "vec_id", "embedding", "label")
      .orderBy("anchor_id").collect()
    // anchor 1: positive = 2 (only same-label); negative = 4
    // (cos(1,4)=0.110 > cos(1,3)=0.0)
    assert(m(0).getLong(1) == 2L && m(0).getLong(3) == 4L)
    // anchor 3: positive = 4; negative = 2 (cos(3,2)=0.110 > cos(3,1)=0)
    assert(m(2).getLong(1) == 4L && m(2).getLong(3) == 2L)
    // tie-break toward the smaller id: two equidistant same-label docs
    val tie = Seq(
      (1L, "A", Seq(1.0, 0.0)), (2L, "A", Seq(0.0, 1.0)),
      (3L, "A", Seq(0.0, 1.0)), (9L, "B", Seq(-1.0, 0.0)))
      .toDF("vec_id", "label", "embedding")
    val t1 = Similarity.contrastiveMine(tie, "vec_id", "embedding", "label")
      .filter($"anchor_id" === 1L).collect()(0)
    assert(t1.getLong(1) == 2L) // cos(1,2)=cos(1,3)=0 → smaller id wins
    // anchor-side guard
    val e = intercept[IllegalArgumentException] {
      Similarity.contrastiveMine(tie, "vec_id", "embedding", "label",
        maxAnchors = 2)
    }
    assert(e.getMessage.contains("maxAnchors"))
    // singleton label class → no positive → anchor omitted (matches
    // the oracle's inner join); null labels drop out entirely
    val singleton = Seq(
      (1L, "A", Seq(1.0, 0.0)), (2L, "A", Seq(0.9, 0.1)),
      (3L, "B", Seq(0.0, 1.0)),
      (4L, null.asInstanceOf[String], Seq(0.5, 0.5)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.contrastiveMine(singleton, "vec_id", "embedding", "label")
      .select("anchor_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L)) // 3 has no positive, 4 has no label
  }

  test("labelCentroidCosine: orthogonal, identical, and averaged centroids") {
    import spark.implicits._
    // label 0 centroid = mean([1,0],[1,0]) = [1,0]; label 1 = [0,1];
    // label 2 = mean([2,0],[0,2]) = [1,1] → cos(0,1)=0,
    // cos(0,2)=1/√2≈0.707107, cos(1,2)=0.707107
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),
      (1, Seq(0.0f, 1.0f)),
      (2, Seq(2.0f, 0.0f)), (2, Seq(0.0f, 2.0f))
    ).toDF("label", "embedding")
    val out = Similarity.labelCentroidCosine(df, "label", "embedding")
      .as[(Int, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((0, 1, 0.0), (0, 2, 0.707107), (1, 2, 0.707107)),
      s"got $out")
  }

  test("dimCorrelation: exact ±1 pairs; constant dimensions drop as NULL") {
    // dims: (x, 2x, −x) → all three pairs perfectly correlated
    val df = (1 to 4).map(x =>
      Seq(x.toDouble, 2.0 * x, -x.toDouble)).toDF("v")
    val out = Similarity.dimCorrelation(df, "v", dims = 3, topK = 3)
      .orderBy("i", "j")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 1L, 4L, 1.0), (0L, 2L, 4L, -1.0),
      (1L, 2L, 4L, -1.0)), s"got $out")
    // a constant dimension has zero variance: its pairs are NULL and
    // never reach the ranking
    val const = (1 to 4).map(x => Seq(x.toDouble, 2.0 * x, 7.0)).toDF("v")
    val out2 = Similarity.dimCorrelation(const, "v", dims = 3, topK = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out2 == Seq((0L, 1L, 4L, 1.0)), s"got $out2")
  }

  test("dimDiscrimination: hand ANOVA F per dim; constant dims drop") {
    // dim0 separates a/b (F = 32), dim1 constant (ssw = 0 → drops),
    // dim2 identical across labels (F = 0)
    val df = Seq(
      ("a", Seq(1.0, 7.0, 1.0)), ("a", Seq(2.0, 7.0, 2.0)),
      ("b", Seq(5.0, 7.0, 1.0)), ("b", Seq(6.0, 7.0, 2.0)))
      .toDF("label", "v")
    val out = Similarity.dimDiscrimination(df, "v", "label",
      dims = 3, topK = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 2L, 4L, 32.0), (2L, 2L, 4L, 0.0)), s"got $out")
  }

  test("dimDrift: the shifted dimension tops the PSI ranking") {
    import spark.implicits._
    // dim0 jumps buckets between the slices (ref ≈ −0.6 clamps to the
    // low edge, cur ≈ +0.6 clamps high), dim1 identical → PSI ~ 0
    val df = Seq(
      (true, Seq(-0.6, 0.25)), (true, Seq(-0.61, 0.25)),
      (false, Seq(0.6, 0.25)), (false, Seq(0.62, 0.25)))
      .toDF("r", "v")
    val out = Similarity.dimDrift(df, "v", col("r"), dims = 2,
      buckets = 8, topK = 2).collect().toSeq
    assert(out.size == 2)
    assert(out.head.getAs[Long]("dim") == 0L, s"got $out")
    assert(out.head.getAs[Double]("psi") >
      out(1).getAs[Double]("psi"), s"got $out")
    assert(out.head.getAs[Long]("n_ref") == 2L &&
      out.head.getAs[Long]("n_cur") == 2L)
    // identical distributions: the smoothed terms cancel exactly
    assert(out(1).getAs[Double]("psi") == 0.0, s"got $out")
    // wrong-length and NULL-flag rows are excluded
    val noisy = df.union(Seq((true, Seq(9.0)))
      .toDF("r", "v"))
    val out2 = Similarity.dimDrift(noisy, "v", col("r"), dims = 2,
      buckets = 8, topK = 2).collect().toSeq
    assert(out2.map(_.getAs[Long]("n_ref")).max == 2L)
  }

  test("gridCorePoints: 3x3 neighborhood density and the core cut by hand") {
    import spark.implicits._
    // cells (0,0)x4, (1,0)x2, (3,3)x1 with cellSize 1.0: densities
    // 6, 6, 1; minPts 5 → the two adjacent cells are core
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f)
    val df = (Seq.fill(4)(v(0.5, 0.5)) ++ Seq.fill(2)(v(1.5, 0.5)) ++
      Seq(v(3.5, 3.5))).toDF("emb")
    val r = graft.ops.Similarity.gridCorePoints(df, "emb",
      cellSize = 1.0, minPts = 5L)
      .orderBy("cx", "cy").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getBoolean(4)))
    assert(r.toSeq == Seq((0L, 0L, 4L, 6L, true), (1L, 0L, 2L, 6L, true),
      (3L, 3L, 1L, 1L, false)), s"got ${r.toSeq}")
  }

  test("labelNoiseMatrix: planted mislabels land off-diagonal") {
    import spark.implicits._
    // two tight clusters on orthogonal axes; three "label 1" rows sit
    // in cluster 0's location → they assign confidently to class 0
    def v(x: Double, y: Double) = Array(x, y)
    val clean0 = (1 to 20).map(i => (i.toLong, 0L, v(1.0 + i * 1e-4, 0.01)))
    val clean1 = (21 to 40).map(i => (i.toLong, 1L, v(0.01, 1.0 + i * 1e-4)))
    val noisy = (41 to 43).map(i => (i.toLong, 1L, v(1.0, 0.01)))
    val r = graft.ops.Similarity.labelNoiseMatrix(
      (clean0 ++ clean1 ++ noisy).toDF("vec_id", "label", "emb"),
      "vec_id", "label", "emb")
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r.getOrElse((1L, 0L), 0L) == 3L, s"got $r")   // the planted noise
    assert(r.getOrElse((0L, 0L), 0L) >= 15L, s"got $r")  // clean diagonal
    assert(r.getOrElse((1L, 1L), 0L) >= 15L, s"got $r")
    assert(r.getOrElse((0L, 1L), 0L) == 0L, s"got $r")
  }

  test("firstRelevantRank: hand-built ordering incl. the rank-1 path") {
    import spark.implicits._
    // anchor 100 (label 0) at (1,0): candidates by cosine desc —
    // id 1 (label 0, same dir) ranks FIRST → first_rank 1 (the
    // empty-above-count path); anchor 200 (label 1) at (0,1):
    // nearest is id 1/100's direction... its same-label id 2 sits at
    // 45° while two label-0 vectors are orthogonal → rank 1 as well;
    // so plant a decoy: id 3 (label 0) at (0.1, 1) beats id 2 (0.7,
    // 0.7) for anchor 200 → first_rank 2
    val rows = Seq(
      (100L, 0L, Array(1.0, 0.0)),
      (200L, 1L, Array(0.0, 1.0)),
      (1L, 0L, Array(0.9, 0.05)),
      (2L, 1L, Array(0.7, 0.7)),
      (3L, 0L, Array(0.1, 1.0)))
    val r = graft.ops.Similarity.firstRelevantRank(
      rows.toDF("vec_id", "label", "emb"), "vec_id", "label", "emb",
      col("vec_id") >= 100L)
      .orderBy("anchor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq((100L, 1L, 1.0), (200L, 2L, 0.5)),
      s"got ${r.toSeq}")
  }
}
