package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different content about spark engines here")
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest tie-break per key") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 4L))
  }

  test("digest null-normalization: NULL position matters, null != empty, null keys dedup") {
    // round-7 ADVICE: concat_ws skipped NULLs, so ('a',NULL,'b') and
    // ('a','b',NULL) collided and a NULL single key digested as md5('')
    val rows = Seq(
      (1L, Some("a"), Option.empty[String], Some("b")),
      (2L, Some("a"), Some("b"), Option.empty[String]),
      (3L, Option.empty[String], Option.empty[String], Option.empty[String]),
      (4L, Some(""), Some(""), Some("")),
      (5L, Option.empty[String], Option.empty[String], Option.empty[String]) // dup of 3
    ).toDF("id", "k1", "k2", "k3")
    val dg = rows.select($"id", Dedup.contentDigest(Seq("k1", "k2", "k3")).as("d"))
      .as[(Long, String)].collect().toMap
    assert(dg(1L) != dg(2L), "NULL position must change the digest")
    assert(dg(3L) != dg(4L), "all-NULL must differ from all-empty")
    assert(dg(3L) == dg(5L), "identical null keys must share a digest")
    val kept = Dedup.exact(rows, Seq("k1", "k2", "k3"), "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
    // dedupAgainst sees a previously-accepted null-key row
    val seen = Dedup.digests(rows.filter($"id" === 3), Seq("k1", "k2", "k3"))
    val out = Dedup.dedupAgainst(rows, seen, Seq("k1", "k2", "k3"), "id")
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 4L), "null-key dup of the accepted corpus must drop")
  }

  test("digest encoding is injective when values contain the separator (round-8 review)") {
    // ('a\u0001v','b') and ('a','\u0001vb') built identical unescaped
    // key strings — the escaped encoding must keep them distinct
    val rows = Seq(
      (1L, "a\u0001v", "b"),
      (2L, "a", "\u0001vb"),
      (3L, "back\\slash", "x"),
      (4L, "back", "\\slash\u0001x")
    ).toDF("id", "k1", "k2")
    val dg = rows.select($"id", Dedup.contentDigest(Seq("k1", "k2")).as("d"))
      .as[(Long, String)].collect().toMap
    assert(dg.values.toSet.size == 4, s"digest collision: $dg")
    val kept = Dedup.exact(rows, Seq("k1", "k2"), "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("shingles builds distinct word n-grams; short docs collapse to whole text") {
    val sh = docs.filter($"doc_id" === 1)
      .select(explode(Dedup.shingles($"text", 3)).as("g"))
      .as[String].collect().toSet
    assert(sh.contains("the quick brown"))
    assert(sh.contains("the lazy dog"))
    val short = Seq((1L, "tiny doc")).toDF("doc_id", "text")
      .select(Dedup.shingles($"text", 5).as("g")).as[Seq[String]].head()
    assert(short == Seq("tiny doc"))
  }

  test("minhash LSH finds exact and near dups, not distinct docs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      numHashes = 32, bands = 16, shingleSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("simhash: identical docs get identical signatures; near dups are close") {
    val sigs = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val d13 = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val d14 = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(d13 < d14)
  }

  test("connected components: chains merge, islands stay separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    // {1,2,3,9} all label 1; {5,6} label 5
    assert(Set(1L, 2L, 3L, 9L).map(comps) == Set(1L))
    assert(Set(5L, 6L).map(comps) == Set(5L))
  }

  test("connected components: driver union-find and iterative path agree") {
    // a long chain (worst case for min-label diameter) plus islands
    val pairs = ((1L to 40L).sliding(2).map(s => (s(1), s.head)) ++
      Seq((100L, 101L), (200L, 200L))).toSeq.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val iterative = Dedup.connectedComponents(pairs, maxIter = 64,
      driverEdgeThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(fast == iterative)
    assert((1L to 40L).map(fast) == (1L to 40L).map(_ => 1L))
  }

  test("connected components: driver path handles non-numeric ids") {
    val pairs = Seq(("b", "a"), ("c", "b"), ("x", "y"))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(Set("a", "b", "c").map(comps) == Set("a"))
    assert(Set("x", "y").map(comps) == Set("x"))
  }

  test("connected components: null-id edges dropped; struct ids take the iterative path") {
    // null ends can't join back to a label in SQL (null != null) and
    // would NPE the driver fast path's Comparable ordering
    val withNulls = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(withNulls)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L))
    // struct ids: Row is not Comparable — must not hit the fast path
    val structPairs = Seq(((1L, "x"), (2L, "y")), ((2L, "y"), (3L, "z")))
      .toDF("id_a", "id_b")
    val sc = Dedup.connectedComponents(structPairs, maxIter = 16)
      .as[((Long, String), (Long, String))].collect().toMap
    assert(sc.values.toSet == Set((1L, "x")))
  }

  test("ngram jaccard: dup pair scores 1.0, near pair high, rest absent") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.3, maxDocFreq = 100)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out.contains((1L, 3L)))
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("decontaminate: only train docs sharing eval n-grams are flagged, with gram counts") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the dog"), // shares 2 trigrams
      (2L, "completely unrelated content here today"),
      (3L, "quick brown fox leaps high")) // shares 1 trigram
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "the quick brown fox runs")) // trigrams incl. overlap
      .toDF("doc_id", "text")
    val flagged = Dedup.decontaminate(train, evalSet, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown" + "quick brown fox"; doc 3 shares
    // "quick brown fox"; doc 2 shares nothing
    assert(flagged == Map(1L -> 2L, 3L -> 1L))
    // short eval docs (< n tokens) contribute their whole-text gram
    val shortEval = Seq((200L, "tiny doc")).toDF("doc_id", "text")
    val shortTrain = Seq((5L, "tiny doc"), (6L, "tiny dog")).toDF("doc_id", "text")
    val f2 = Dedup.decontaminate(shortTrain, shortEval, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(f2 == Map(5L -> 1L))
  }

  test("incremental dedup: digest index round-trips parquet across ingest runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val run1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("doc_id", "text")
    // first run: nothing seen yet
    val empty = Seq.empty[String].toDF("digest")
    val acc1 = Dedup.dedupAgainst(run1, empty, Seq("text"), "doc_id")
    assert(acc1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // persist the index exactly as a rolling build would
    Dedup.digests(acc1, Seq("text")).write.mode("overwrite").parquet(s"$dir/idx")
    val seen = spark.read.parquet(s"$dir/idx")
    // second run: one cross-run dup, one in-batch dup, one new doc
    val run2 = Seq((10L, "beta"), (11L, "gamma"), (12L, "gamma"))
      .toDF("doc_id", "text")
    val acc2 = Dedup.dedupAgainst(run2, seen, Seq("text"), "doc_id")
    assert(acc2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L))
  }

  test("simhashCandidates end-to-end: near-identical texts bucket, distant don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (3L, "completely different material talks about databases and query planners"))
      .toDF("doc_id", "text")
    val cands = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedupCorpus keep policies: min_id vs longest (RefinedWeb choice)") {
    // doc 2 is a superset of doc 1 (one extra token → 3-gram jaccard
    // 6/7 ≈ 0.86); doc 3 is unrelated
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h extra"),
      (3L, "totally different content lives here now")).toDF("doc_id", "text")
    val minId = Dedup.dedupCorpus(docs, "doc_id", "text",
      jaccardThreshold = 0.8, shingleSize = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(minId == Seq(1L, 3L))
    val longest = Dedup.dedupCorpus(docs, "doc_id", "text",
      jaccardThreshold = 0.8, shingleSize = 3, keep = "longest")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(longest == Seq(2L, 3L))
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupCorpus(docs, "doc_id", "text", keep = "newest")
    }
    assert(e.getMessage.contains("keep policy"))
  }

  test("substringDedup matches a brute-force sliding-window oracle") {
    // w=3 windows; corpus built so every interesting case occurs:
    // cross-doc dup at different offsets, WITHIN-doc repetition,
    // short doc (no windows), fully-covered doc, overlapping covered
    // ranges that must merge
    val corpus = Seq(
      (1L, "a b c d e f g"),       // "c d e" shared with doc 2 (offset 3 vs 1)
      (2L, "c d e x y z"),
      (3L, "p q r p q r p q"),     // within-doc repetition of "p q r"
      (4L, "one two"),             // shorter than the window: untouched
      (5L, "m n o m n o"),         // fully covered -> empty clean_text
      (6L, "m n o m n o")          // exact dup of 5
    ).toDF("doc_id", "text")
    val w = 3
    val toks = Seq(
      1L -> "a b c d e f g", 2L -> "c d e x y z", 3L -> "p q r p q r p q",
      4L -> "one two", 5L -> "m n o m n o", 6L -> "m n o m n o"
    ).map { case (id, s) => id -> s.split("\\s+").toSeq }
    val winCounts = toks.flatMap { case (_, ts) =>
      ts.sliding(w).filter(_.size == w).map(_.mkString(" "))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val expected = toks.map { case (id, ts) =>
      val starts = (0 to ts.size - w)
        .filter(i => winCounts(ts.slice(i, i + w).mkString(" ")) >= 2)
      val covered = starts.flatMap(s => s until s + w).toSet
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      (id, kept.mkString(" "), kept.size.toLong, (ts.size - kept.size).toLong)
    }.sortBy(_._1)
    val out = Dedup.substringDedup(corpus, "doc_id", "text", w = w)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == expected)
    // the fixture really exercised the edge cases it claims to
    val byId = expected.map(e => e._1 -> e).toMap
    assert(byId(4L)._4 == 0, "short doc must be untouched")
    assert(byId(5L)._2 == "" && byId(5L)._3 == 0, "fully-covered doc -> empty")
    assert(byId(3L)._4 > 0, "within-doc repetition must be removed")
  }

  test("winnowCandidates: long shared substrings pair; boilerplate fingerprints prune") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"epsilon $shared zeta"),
      (3L, "completely unrelated content with no common substrings at all here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidates(docs, "doc_id", "text",
      k = 12, window = 8, minShared = 1L, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)), pairs.toSeq)
    // boilerplate: a substring shared by MORE than maxBucket docs is
    // evidence of nothing — its fingerprints prune and no pairs emit
    val boiler = (1L to 4L).map(i => (i, s"prefix$i $shared suffix$i"))
      .toDF("doc_id", "text")
    val pruned = Dedup.winnowCandidates(boiler, "doc_id", "text",
      k = 12, window = 8, minShared = 1L, maxBucket = 2)
    assert(pruned.count() == 0L, "over-shared fingerprints must prune")
  }

  test("winnowCandidates defaults: zero exact-dup recall loss on the low-entropy corpus") {
    // replays the SCALE.md round-9 rehearsal finding that set the
    // round-10 defaults (k=20/maxBucket=20): on a 31-word-vocabulary
    // corpus — the adversarial case where short grams recur across
    // unrelated docs — the long-gram config must surface EVERY
    // exact-dup pair (identical text ⇒ identical fingerprints) whose
    // text is long enough to fingerprint at all (≥ k+window−1 cp),
    // while k=12/maxBucket=20 measured 20/84 missed
    import spark.implicits._
    val vocab = Array("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window")
    val rnd = new scala.util.Random(41)
    val texts = Array.fill(600) {
      (0 until (8 + rnd.nextInt(93)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    (0 until 25).foreach { _ =>
      val src = rnd.nextInt(600); val dst = rnd.nextInt(600)
      if (src != dst) texts(dst) = texts(src)
    }
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val dg = docs.filter(length($"text") >= 27)
      .select($"doc_id", md5($"text").as("dg"))
    val exactPairs = dg.as("a").join(dg.as("b"), "dg")
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
    val nPairs = exactPairs.count()
    assert(nPairs >= 20, s"fixture should plant >= 20 exact pairs, got $nPairs")
    val missed = exactPairs
      .join(Dedup.winnowCandidates(docs, "doc_id", "text"),
        Seq("id_a", "id_b"), "left_anti")
      .count()
    assert(missed == 0L, s"default config missed $missed / $nPairs exact-dup pairs")
  }

  test("digestsWithSeen takes the max recency per digest") {
    import spark.implicits._
    val df = Seq(("x", 10L), ("x", 30L), ("y", 5L)).toDF("text", "seen")
    val idx = Dedup.digestsWithSeen(df, Seq("text"), "seen")
      .orderBy("last_seen").collect().map(r => r.getLong(1))
    assert(idx.toSeq == Seq(5L, 30L), idx.toSeq)
  }

  test("compactIndex merges generations by max last_seen and ages out below the cutoff") {
    import spark.implicits._
    val g1 = Seq(("a", 10L), ("b", 50L)).toDF("digest", "last_seen")
    val g2 = Seq(("a", 60L), ("c", 30L)).toDF("digest", "last_seen")
    val live = Dedup.compactIndex(g1.unionByName(g2), lit(40L))
      .orderBy("digest").collect().map(r => (r.getString(0), r.getLong(1)))
    // 'a' re-seen in gen2 is fresh (60); 'c' aged out; 'b' survives
    assert(live.toSeq == Seq(("a", 60L), ("b", 50L)), live.toSeq)
  }

  test("aged-out digests make re-arriving content eligible again (q127 semantics)") {
    import spark.implicits._
    val docs = Seq((1L, "old content"), (2L, "fresh content")).toDF("doc_id", "text")
    val idx = Dedup.digestsWithSeen(
      docs.withColumn("seen", when($"doc_id" === 1L, 10L).otherwise(90L)),
      Seq("text"), "seen")
    val live = Dedup.compactIndex(idx, lit(40L))
    val out = Dedup.dedupAgainst(docs, live, Seq("text"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L), s"only the aged-out doc re-admits: ${out.toSeq}")
  }

  test("crossGroupOverlap: distinct shared contents per group pair, guard trips") {
    import spark.implicits._
    val docs = Seq(
      ("x", "a"), ("x", "b"), ("x", "b"), // dup (content, group) counts once
      ("y", "a"), ("y", "b"),
      ("z", "a"), ("z", "c"),
      ("only-b", "b")
    ).toDF("text", "src")
    val out = Dedup.crossGroupOverlap(docs, Seq("text"), "src")
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // a∩b = {x, y}; a∩c = {z}; b∩c = ∅
    assert(out == Seq(("a", "b", 2L), ("a", "c", 1L)), s"got $out")
    val everywhere = Seq(("boiler", "a"), ("boiler", "b"), ("boiler", "c"))
      .toDF("text", "src")
    val e = intercept[Exception] {
      Dedup.crossGroupOverlap(everywhere, Seq("text"), "src", maxGroups = 2)
        .collect()
    }
    assert(e.getMessage.contains("shared by more than"), e.getMessage)
  }

  test("prefixFilterJaccardPairs: exact-boundary pair survives both ε-nudges") {
    import spark.implicits._
    // unigram sets {a,b,c,d} vs {a,b,c,d,e}: J = 4/5 = τ exactly, and
    // the length filter sits at min = τ·max exactly — both the ceil
    // and the ratio product must not round the pair away
    val docs = Seq((1L, "a b c d"), (2L, "a b c d e"),
      (3L, "x y z w v")).toDF("doc_id", "text")
    val out = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
        n = 1, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.8)), s"got $out")
  }

  test("prefixFilterJaccardPairs: agrees with the all-gram bucket path") {
    import spark.implicits._
    // the prefix-filtered candidate scheme must lose NOTHING vs
    // bucketing every gram (ngramJaccardPairs) — same pairs, same
    // jaccard values, on a mixed near-dup fixture
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox leaps over the lazy dog tonight"),
      (4L, "entirely different words compose this sentence here now"),
      (5L, "entirely different words compose this sentence here today")
    ).toDF("doc_id", "text")
    for (tau <- Seq(0.3, 0.5, 0.7)) {
      val viaPrefix = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val viaAllGrams = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(viaPrefix == viaAllGrams, s"tau=$tau: $viaPrefix != $viaAllGrams")
      assert(viaPrefix.nonEmpty, s"fixture must produce pairs at tau=$tau")
    }
  }

  test("prefixFilterJaccardPairs: over-cap prefix bucket fails fast, never drops") {
    import spark.implicits._
    // identical docs: the shared gram is in every prefix → bucket = N
    val docs = (1L to 6L).map(i => (i, "same text everywhere"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", n = 1,
        threshold = 0.9, maxBucket = 4).collect()
    }
    assert(e.getMessage.contains("completeness is the contract"),
      e.getMessage)
  }

  test("bounded collect: hot key caps its buffer at cap+1; under-cap groups " +
    "are bit-identical to collect_list/collect_set (r19 skew hazard)") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    def bList(c: org.apache.spark.sql.Column, cap: Int) =
      ColumnBridge.column(graft.functions
        .BoundedCollectList(ColumnBridge.expression(c), cap)
        .toAggregateExpression())
    def bSet(c: org.apache.spark.sql.Column, cap: Int) =
      ColumnBridge.column(graft.functions
        .BoundedCollectSet(ColumnBridge.expression(c), cap)
        .toAggregateExpression())
    // one fp shared by 100k ids (the 100 TB boilerplate-fingerprint
    // shape): the aggregation buffer must cap at cap+1 elements —
    // detectable as over-cap by the callers' size guards — instead of
    // materializing the 100k-element list it is about to discard
    val hot = spark.range(100000L)
      .select(lit("fp0").as("fp"), col("id"))
    val capped = hot.groupBy("fp")
      .agg(bList(col("id"), 20).as("ids"), bSet(col("id"), 20).as("set"))
      .select(size(col("ids")), size(col("set"))).as[(Int, Int)].head()
    assert(capped == ((21, 21)), s"hot-key buffers must cap at cap+1: $capped")
    // under-cap groups: results identical to the unbounded builtins
    val mixed = spark.range(300L)
      .select((col("id") % 37).as("k"), (col("id") % 100).as("v"))
    val both = mixed.groupBy("k").agg(
      sort_array(bList(col("v"), 1000)).as("b"),
      sort_array(collect_list(col("v"))).as("u"),
      sort_array(bSet(col("v"), 1000)).as("bs"),
      sort_array(collect_set(col("v"))).as("us"))
    assert(both.filter(col("b") =!= col("u") || col("bs") =!= col("us"))
      .isEmpty, "under-cap bounded collect must equal the builtin")
    // nulls skip exactly like collect_list
    val withNulls = Seq((1L, Some(5L)), (1L, None), (1L, Some(3L)))
      .toDF("k", "v")
    val arr = withNulls.groupBy("k")
      .agg(sort_array(bList(col("v"), 10)).as("ids"))
      .select("ids").as[Seq[Long]].head()
    assert(arr == Seq(3L, 5L), s"nulls must skip: $arr")
  }

  test("winnowCandidates/minhashCandidates plans carry the bounded collect " +
    "(the pre-prune is plan-visible, r19)") {
    val w = Dedup.winnowCandidates(docs, "doc_id", "text",
      k = 12, window = 8, minShared = 1L, maxBucket = 100)
    assert(w.queryExecution.executedPlan.toString
      .contains("graft_bounded_collect_list"),
      "winnow bucket aggregate must be the bounded collect")
    val m = Dedup.minhashCandidates(docs, "doc_id", "text")
    assert(m.queryExecution.executedPlan.toString
      .contains("graft_bounded_collect_list"),
      "minhash bucket aggregate must be the bounded collect")
  }

  test("crossDocNovelty: duplicated docs score 0, unique docs 1, mixed between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), // every gram shared → 0
      (3L, "x y z w"),                  // every gram unique → 1
      (4L, "a b c q")                   // "a b c" shared, "b c q" novel
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocNovelty(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0),
      (3L, 2L, 2L, 1.0), (4L, 2L, 1L, 0.5)), s"got $out")
  }
}
