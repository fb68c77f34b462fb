package graft

import graft.ops.{CorpusStats, TextOps}

class CorpusStatsSpec extends SparkSuite {

  test("invertedIndex: in-doc dedup, df floor, capped ascending postings") {
    import spark.implicits._
    val docs = Seq(
      (10L, "apple apple banana"), // apple dedups within the doc
      (2L, "apple cherry"),
      (7L, "apple banana"),
      (1L, "apple")
    ).toDF("doc_id", "text")
    val out = graft.ops.CorpusStats
      .invertedIndex(docs, "doc_id", "text", cap = 3, minDf = 2L)
      .orderBy("term")
      .as[(String, Long, String)].collect().toSeq
    // apple df 4, cap 3 keeps ids 1,2,7 (ascending — numeric, so 7
    // before 10); banana df 2; cherry df 1 < minDf drops
    assert(out == Seq(("apple", 4L, "1,2,7"), ("banana", 2L, "7,10")),
      s"got $out")
    intercept[IllegalArgumentException] {
      graft.ops.CorpusStats.invertedIndex(docs, "doc_id", "text", cap = 0)
    }
  }

  test("sourceKl matches a brute-force replay; identical sources score 0") {
    import spark.implicits._
    val docs = Seq(
      ("srcA", "x x x y"),
      ("srcB", "x y y y"),
      ("srcC", "x x y y") // exactly the corpus mix? no — compute below
    ).toDF("source", "text")
    val out = graft.ops.CorpusStats.sourceKl(docs, "source", "text")
      .orderBy("source").as[(String, Double)].collect().toMap
    // corpus: x=6, y=6, T=12 -> p_c(x)=p_c(y)=0.5
    def term(cs: Long, ts: Long, cc: Long, tc: Long): BigDecimal =
      BigDecimal((cs.toDouble / ts) *
        math.log((cs.toDouble * tc) / (ts.toDouble * cc)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def kl(counts: Map[String, Long]): Double = {
      val ts = counts.values.sum
      val sum = counts.map { case (w, cs) => term(cs, ts, 6L, 12L) }.sum
      sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("srcA") == kl(Map("x" -> 3L, "y" -> 1L)), s"A ${out("srcA")}")
    assert(out("srcB") == kl(Map("x" -> 1L, "y" -> 3L)), s"B ${out("srcB")}")
    // srcC's mix (2:2) IS the corpus mix (6:6) -> every log term is 0
    assert(out("srcC") == 0.0, s"C ${out("srcC")}")
  }

  test("pmiCollocations matches a brute-force PMI computation") {
    import spark.implicits._
    val docs = Seq(
      "a b a b a b c",
      "c d c d x y",
      "x y x y x y a b"
    ).toDF("text")
    // brute force
    val tokss = Seq("a b a b a b c", "c d c d x y", "x y x y x y a b")
      .map(_.trim.split("\\s+").toSeq)
    val unis = tokss.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = tokss.flatMap(ws => ws.sliding(2).map(_.mkString(" ")).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = unis.values.sum
    val nBi = bis.values.sum
    def pmi(g: String): Double = {
      val Array(x, y) = g.split(" ")
      val v = math.log(bis(g).toDouble * nUni * nUni / (nBi.toDouble * unis(x) * unis(y)))
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = bis.filter(_._2 >= 2).keys.toSeq
      .map(g => (g, bis(g), pmi(g)))
      .sortBy { case (g, _, p) => (-p, g) }
    val out = CorpusStats.pmiCollocations(docs, "text", minCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == expect.take(10), s"got $out\nexpected $expect")
  }

  test("pmiCollocations: minCount prunes rare pairs, topK caps output") {
    import spark.implicits._
    val docs = Seq("a b a b c d").toDF("text")
    val out = CorpusStats.pmiCollocations(docs, "text", minCount = 2L, topK = 5)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a b")) // only "a b" twice
    val capped = CorpusStats.pmiCollocations(docs, "text", minCount = 1L, topK = 2)
      .collect()
    assert(capped.length == 2)
  }

  test("zipfSlope: exact slope -1 on a constructed power-law vocabulary") {
    import spark.implicits._
    // counts c_r = 12/r for ranks 1,2,3,4 -> ln c = ln 12 - 1 * ln r
    // terms named to force rank order on count ties (none here)
    val words =
      Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++ Seq.fill(4)("w3") ++
        Seq.fill(3)("w4")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val r = CorpusStats.zipfSlope(docs, "text", topV = 10).collect()(0)
    assert(r.getAs[Long]("n_terms") == 4L)
    // slope is exactly -1 up to the 6-decimal ln rounding
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 1e-5,
      s"slope ${r.getAs[Double]("slope")}")
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12)) < 1e-5)
  }

  test("zipfSlope: degenerate single-term corpus yields NULL fit") {
    import spark.implicits._
    val docs = Seq("same same same").toDF("text")
    val r = CorpusStats.zipfSlope(docs, "text", topV = 10).collect()(0)
    assert(r.getAs[Long]("n_terms") == 1L)
    assert(r.isNullAt(r.fieldIndex("slope")) && r.isNullAt(r.fieldIndex("intercept")))
  }

  test("chunkTokens: HF stride convention, exact-size chunks, tail window") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10
      (2L, "a b c"),                                  // n < size: one chunk
      (3L, "")                                        // "" -> 1 empty token
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(docs, "doc_id", "text", size = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // n=10, size=4, stride=3: regular starts 1,4 (end < 10), tail 7
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 1L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 7L, 4L, "t7 t8 t9 t10")))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 3L, "a b c")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 1L, 1L, "")))
    // every chunk except short docs has exactly `size` tokens
    intercept[IllegalArgumentException] {
      TextOps.chunkTokens(docs, "doc_id", "text", size = 4, stride = 5)
    }
  }

  test("bm25 matches a hand-computed reference; zero-score docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark window fast"), // spark x2, join, window
      (2L, "join table scan"),              // join only
      (3L, "sort merge only"),              // no query terms -> dropped
      (4L, "window window window window")   // window x4
    ).toDF("doc_id", "text")
    val out = CorpusStats.bm25(docs, "doc_id", "text",
      Seq("spark", "join", "window"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(!out.contains(3L), "doc without query terms must drop")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // reference: N=4, tdl=5+3+3+4=15, avgdl=15/4
    val n = 4.0; val avgdl = 15.0 / 4.0
    def idf(df: Int): Double = r6(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
    def c(tf: Int, df: Int, dl: Int): BigDecimal =
      if (tf == 0) BigDecimal(0).setScale(6)
      else BigDecimal(r6(idf(df) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))).setScale(6)
    val exp1 = (c(2, 1, 5) + c(1, 2, 5) + c(1, 2, 5)).toDouble
    val exp2 = (c(0, 1, 3) + c(1, 2, 3) + c(0, 2, 3)).toDouble
    val exp4 = (c(0, 1, 4) + c(0, 2, 4) + c(4, 2, 4)).toDouble
    assert(out(1L) == exp1, s"doc1 ${out(1L)} vs $exp1")
    assert(out(2L) == exp2)
    assert(out(4L) == exp4)
  }

  test("bm25Batch: metacharacter query ids don't misparse; scores match single-query bm25") {
    import spark.implicits._
    // round-9 review: temp score columns interpolated the query id
    // into a column NAME resolved via col(...) — ids with '.', '`' or
    // spaces would misparse at analysis time. Now positional.
    val docs = Seq(
      (1L, "spark join spark window fast"),
      (2L, "join table scan"),
      (4L, "window window window window")
    ).toDF("doc_id", "text")
    val out = CorpusStats.bm25Batch(docs, "doc_id", "text",
      Seq("q.dot" -> Seq("spark", "join"), "q`tick y" -> Seq("window")),
      topK = 10)
      .select("query_id", "doc_id", "score")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(out.keySet.map(_._1) == Set("q.dot", "q`tick y"), out.keySet)
    // per-query scores equal the single-query op on the same corpus
    Seq("q.dot" -> Seq("spark", "join"), "q`tick y" -> Seq("window"))
      .foreach { case (q, terms) =>
        val single = CorpusStats.bm25(docs, "doc_id", "text", terms, topK = 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
        single.foreach { case (id, s) =>
          assert(out((q, id)) == s, s"$q/$id: ${out.get((q, id))} vs $s")
        }
      }
  }

  test("reciprocalRankFusion: k=60 paper formula, overlap boosts, ties break by id") {
    import spark.implicits._
    val runA = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val runB = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "rank")
    val out = CorpusStats.reciprocalRankFusion(Seq(runA, runB), "doc_id")
      .as[(Long, Double, Long)].collect().toSeq
    def t(r: Int) = math.rint(1e9 / (60 + r)) / 1e9
    def s(rs: Int*) = math.rint(rs.map(t).sum * 1e6) / 1e6
    // doc 20: ranks 2+1; doc 10: ranks 1+3; singles 30 (rank 3), 40 (2)
    assert(out == Seq(
      (20L, s(2, 1), 2L), (10L, s(1, 3), 2L),
      (40L, s(2), 1L), (30L, s(3), 1L)), s"got $out")
    // equal-score singles order by id: two docs at the same rank in
    // different runs tie exactly (decimal sum — no fp-order wobble)
    val tie = CorpusStats.reciprocalRankFusion(
      Seq(Seq((7L, 5)).toDF("doc_id", "rank"),
        Seq((3L, 5)).toDF("doc_id", "rank")), "doc_id")
      .as[(Long, Double, Long)].collect().toSeq
    assert(tie.map(_._1) == Seq(3L, 7L), s"id tie-break: $tie")
    intercept[IllegalArgumentException] {
      CorpusStats.reciprocalRankFusion(Seq(runA), "doc_id")
    }
  }

  test("corpus stats plans: counts shuffle once, chunking is map-only") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val chunkPlan = TextOps.chunkTokens(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"),
      s"chunkTokens must be map-only:\n$chunkPlan")
  }

  test("psi: identical slices score 0; a hand-computed shift matches the ladder") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val same = Seq((true, 0L), (true, 1L), (false, 0L), (false, 1L))
      .toDF("r", "b")
    val zero = CorpusStats.psi(same, col("r"), col("b"))
      .as[(Long, Long, Long, Double)].head()
    assert(zero == ((2L, 2L, 2L, 0.0)), s"got $zero")

    // ref: bucket0×3, bucket1×1; cur: bucket0×1, bucket1×3
    val df = (Seq.fill(3)((true, 0L)) ++ Seq((true, 1L)) ++
      Seq((false, 0L)) ++ Seq.fill(3)((false, 1L))).toDF("r", "b")
    val got = CorpusStats.psi(df, col("r"), col("b"))
      .as[(Long, Long, Long, Double)].head()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val t0 = r6((4.0 / 6 - 2.0 / 6) * math.log((4.0 / 6) / (2.0 / 6)))
    val t1 = r6((2.0 / 6 - 4.0 / 6) * math.log((2.0 / 6) / (4.0 / 6)))
    assert(got == ((4L, 4L, 2L, r6(t0 + t1))), s"got $got")

    // a NULL slice tag lands in neither side
    val withNull = Seq((Some(true), 0L), (Option.empty[Boolean], 0L),
      (Some(false), 0L)).toDF("r", "b")
    val nn = CorpusStats.psi(withNull, col("r"), col("b"))
      .as[(Long, Long, Long, Double)].head()
    assert(nn._1 == 1L && nn._2 == 1L, s"got $nn")
  }

  test("woe: smoothed evidence weights by hand; balanced bucket is 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bucket 0: 3 good / 1 bad; bucket 1: 1 good / 3 bad → symmetric;
    // bucket 2: 1 good / 1 bad → woe exactly 0 under equal totals
    val df = (Seq.fill(3)((true, 0L)) ++ Seq((false, 0L)) ++
      Seq((true, 1L)) ++ Seq.fill(3)((false, 1L)) ++
      Seq((true, 2L), (false, 2L))).toDF("g", "b")
    val out = CorpusStats.woe(df, col("g"), col("b"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // G = B = 5, nb = 3 → denominator 8 on both sides
    val w0 = r6(math.log((4.0 / 8) / (2.0 / 8)))
    assert(out == Seq((0L, 3L, 1L, w0), (1L, 1L, 3L, -w0),
      (2L, 1L, 1L, 0.0)), s"got $out")
  }

  test("chiSquare: hand-computed 2x2 contingency") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // obs [[10,20],[20,10]]: all marginals 30, N = 60, exp = 15
    // every cell: (|o-15|)² / 15 = 25/15 → round-6 1.666667 × 4 cells
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val out = CorpusStats.chiSquare(rows.toDF("r", "c"), "r", "c")
      .as[(Double, Long, Long, Long, Long)].collect().head
    assert(out == (6.666668, 1L, 2L, 2L, 60L), s"got $out")
  }

  test("chiSquare: independent columns score 0") {
    import spark.implicits._
    // perfectly proportional table → every cell matches expectation
    val rows = Seq.fill(4)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(8)(("b", "x")) ++ Seq.fill(4)(("b", "y"))
    val out = CorpusStats.chiSquare(rows.toDF("r", "c"), "r", "c")
      .as[(Double, Long, Long, Long, Long)].collect().head
    assert(out._1 == 0.0 && out._5 == 18L, s"got $out")
  }

  test("sourceJsd: identical distributions are 0; disjoint reach ln 2") {
    import spark.implicits._
    // s1 and s2 share one distribution → each vs rest is 0;
    // s3's vocabulary is disjoint from s1+s2 → near ln 2 = 0.693147
    val docs = Seq(
      ("s1", "cat dog"), ("s1", "cat dog"),
      ("s2", "cat dog"), ("s2", "cat dog"),
      ("s3", "newt axolotl")
    ).toDF("source", "text")
    val out = CorpusStats.sourceJsd(docs, "source", "text")
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    // s1 vs rest: rest = s2 (same dist) + s3 (disjoint 2 of 10 tokens)
    // — not exactly 0, but small; s3 vs rest is exactly ln 2 on every
    // term (p or q zero everywhere)
    assert(out.size == 3)
    val m = out.toMap
    assert(m("s1") == m("s2"), s"symmetry: $out")
    assert(m("s1") < 0.2, s"same-dist slice should be near 0: $out")
    // s3: every word has mass on exactly one side → each term is
    // x·ln(x/(x/2)) = x·ln 2, totals 0.5·ln2 per side → jsd = ln 2
    assert(math.abs(m("s3") - math.log(2)) < 2e-6, s"s3: ${m("s3")}")
  }

  test("termBurstiness: tf/df separates repeated content from spread words") {
    import spark.implicits._
    // "topic" appears 3× in each of 2 docs (tf 6, df 2 → 3.0);
    // "the" once in each of 3 docs (tf 3, df 3 → 1.0)
    val docs = Seq(
      (1L, "topic topic topic the"), (2L, "topic topic topic the"),
      (3L, "the quiet word")
    ).toDF("doc_id", "text")
    val out = CorpusStats.termBurstiness(docs, "doc_id", "text",
        minDf = 2L, topK = 10)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("topic", 6L, 2L, 3.0), ("the", 3L, 3L, 1.0)),
      s"got $out")
  }

  test("vocabStats: types, hapax and ratios by hand") {
    import spark.implicits._
    // a: tokens the×3, cat, dog, fish → 6 tokens, 4 types, 3 hapax
    val docs = Seq(("a", "the cat the dog"), ("a", "the fish"),
      ("b", "solo")).toDF("source", "text")
    val out = CorpusStats.vocabStats(docs, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 6L, 4L, 3L, 0.666667, 0.75),
      ("b", 1L, 1L, 1L, 1.0, 1.0)), s"got $out")
  }

  test("cramersV: perfect 2×2 association → 1; independence → 0") {
    import spark.implicits._
    val perfect = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2)).toDF("r", "c")
    val p = CorpusStats.cramersV(perfect, "r", "c")
      .as[(Double, Long, Long, Option[Double])].collect().head
    assert(p == ((4.0, 1L, 4L, Some(1.0))), s"got $p")
    val indep = Seq(("x", 1), ("x", 2), ("y", 1), ("y", 2)).toDF("r", "c")
    val i = CorpusStats.cramersV(indep, "r", "c")
      .as[(Double, Long, Long, Option[Double])].collect().head
    assert(i == ((0.0, 1L, 4L, Some(0.0))), s"got $i")
  }

  test("vocabGrowth: first-occurrence buckets; no-new-word steps persist") {
    import spark.implicits._
    // docs in id order: {a b}, {a c}, {c}, {d d}, {a} — firsts:
    // a,b@1, c@2, d@4; 5 docs × 5 steps = one doc per step
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "c"), (4L, "d d"),
      (5L, "a")).toDF("doc_id", "text")
    val out = CorpusStats.vocabGrowth(docs, "doc_id", "text", steps = 5)
      .orderBy("step")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 2L, 2L), (2L, 2L, 1L, 3L), (3L, 3L, 0L, 3L),
      (4L, 4L, 1L, 4L), (5L, 5L, 0L, 4L)), s"got $out")
  }

  test("turingEstimate: hand-computed freq-of-freqs and r*") {
    import spark.implicits._
    // unigram counts: a=3, b=2, c=2, d=1 → N1=1, N2=2, N3=1
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a d")).toDF("doc_id", "text")
    val out = CorpusStats.turingEstimate(docs, "text", maxR = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // r=1: r* = 2·N2/N1 = 4; r=2: r* = 3·N3/N2 = 1.5; r=3: N4=0 → 0
    assert(out == Seq((1L, 1L, 2L, 4.0), (2L, 2L, 1L, 1.5),
      (3L, 1L, 0L, 0.0)), s"got $out")
  }

  test("turingEstimate n=2 counts bigrams") {
    import spark.implicits._
    // bigrams: "a b" ×2, "b c" ×1 → N1=1, N2=1; r=1: r*=2·1/1=2
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusStats.turingEstimate(docs, "text", maxR = 10, n = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L, 2.0), (2L, 1L, 0L, 0.0)), s"got $out")
  }

  test("vocabOverlap: intersection, union and jaccard per source pair") {
    import spark.implicits._
    val docs = Seq(("s1", "a b c"), ("s1", "a"), ("s2", "b c d"),
      ("s3", "x")).toDF("source", "text")
    val out = CorpusStats.vocabOverlap(docs, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // s1={a,b,c}, s2={b,c,d}: ∩=2, ∪=4 → 0.5; s3 shares nothing →
    // pairs with zero intersection are absent (join-on-token shape)
    assert(out == Seq(("s1", "s2", 3L, 3L, 2L, 0.5)), s"got $out")
  }

  test("vocabCoverage: hand-computed threshold cuts on a tiny corpus") {
    import spark.implicits._
    // a×6 b×3 c×1 → cumulative 6, 9, 10 of 10 total
    val df = Seq("a a a", "a a a b", "b b c").toDF("text")
    val r = graft.ops.CorpusStats.vocabCoverage(df, "text",
      Seq(50, 90, 95, 99)).orderBy("threshold_pct")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((50L, 1L, 6L), (90L, 2L, 9L),
      (95L, 3L, 10L), (99L, 3L, 10L)), s"got ${r.toSeq}")
  }
}
