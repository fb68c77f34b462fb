package graft

import graft.ops.Bpe

class BpeSpec extends SparkSuite {

  test("learnMerges reproduces hand-computed BPE incl. greedy overlap handling") {
    import spark.implicits._
    // vocab: "aaaa" x3, "abab" x2, "ab" x5
    // chars pairs iter1: (a,a): aaaa has 3 per word x3 = 9
    //                    (a,b): abab 2x2 + ab 1x5 = 9 ; (b,a): abab 1x2 = 2
    // tie (a,a) vs (a,b) at 9 -> lex smallest right: (a,a) wins
    // merge (a,a) greedy: aaaa -> [aa, aa] (NOT [aa,a,a] or overlap)
    val docs = Seq(
      (Seq.fill(3)("aaaa") ++ Seq.fill(2)("abab") ++ Seq.fill(5)("ab"))
        .mkString(" ")).toDF("text")
    val out = Bpe.learnMerges(docs, "text", iters = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1L, "a", "a", 9L)), s"iter1 ${out(0)}")
    // after merge1: aaaa->[aa,aa]; abab/ab unchanged
    // iter2 pairs: (aa,aa): 3; (a,b): 9; (b,a): 2 -> (a,b) 9
    assert(out(1) == ((2L, "a", "b", 9L)), s"iter2 ${out(1)}")
    // after merge2: abab->[ab,ab]; ab->[ab] (word done)
    // iter3: (aa,aa): 3; (ab,ab): 2 -> (aa,aa) 3
    assert(out(2) == ((3L, "aa", "aa", 3L)), s"iter3 ${out(2)}")
  }

  test("self-pair merge over an odd repeat run is greedy leftmost") {
    import spark.implicits._
    // 'aaaaa' after merge (a,a): greedy leftmost -> [aa, aa, a], so
    // iter2 counts (aa,aa)=3 and (aa,a)=3 and the tie breaks to
    // (aa,a) — the shared-delimiter REPLACE device that fixpoints at
    // [aa, a, aa] would report (a,aa) instead (the q109 oracle runs
    // the double-space encoding for exactly this case)
    val docs = Seq("aaaaa aaaaa aaaaa").toDF("text")
    val out = Bpe.learnMerges(docs, "text", iters = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1L, "a", "a", 12L)), s"iter1 ${out(0)}")
    assert(out(1) == ((2L, "aa", "a", 3L)), s"iter2 ${out(1)}")
  }

  test("count ties break by UTF-8 byte order, not UTF-16 code units") {
    import spark.implicits._
    // U+FFFD (UTF-8 EF BF BD) vs U+10000 (UTF-8 F0 90 80 80,
    // UTF-16 surrogate D800 DC00): JVM String order puts U+10000
    // first; UTF-8 byte order puts U+FFFD first. One word of each,
    // equal counts — the learned first merge must pick the U+FFFD
    // pair, matching a binary-collation SQL ORDER BY l, r.
    val hi = new String(Character.toChars(0x10000))
    val docs = Seq(s"x� x$hi").toDF("text")
    val out = Bpe.learnMerges(docs, "text", iters = 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(out.head == (("x", "�")), s"got ${out.head}")
  }

  test("encodeStats: counts under the learned merges, hand-checked") {
    import spark.implicits._
    // learn on "aaaa"x3 "abab"x2 "ab"x5 (merges: (a,a),(a,b),(aa,aa))
    val docs = Seq(
      (1L, (Seq.fill(3)("aaaa") ++ Seq.fill(2)("abab") ++ Seq.fill(5)("ab"))
        .mkString(" ")),
      (2L, "aaaa ab"), // [aaaa] + [ab] -> 1 + 1 tokens, 6 chars
      (3L, ""),        // empty doc: 0/0, NULL compression
      (4L, "zzz")      // unseen at merge time? no — same corpus rule;
                       // here: no merge applies -> 3 singles
    ).toDF("doc_id", "text")
    val merges = Bpe.learnMergeList(docs.filter($"doc_id" === 1L), "text",
      iters = 3).map(m => (m._2, m._3))
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "aa")))
    val out = Bpe.encodeStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    // doc1: aaaa->[aaaa] x3, abab->[ab,ab] x2, ab->[ab] x5 = 3+4+5=12
    //       chars = 3*4 + 2*4 + 5*2 = 30
    assert(out(0) == ((1L, 12L, 30L, 2.5)), s"doc1 ${out(0)}")
    assert(out(1) == ((2L, 2L, 6L, 3.0)), s"doc2 ${out(1)}")
    assert(out(2) == ((3L, 0L, 0L, null)), s"doc3 ${out(2)}")
    assert(out(3) == ((4L, 3L, 3L, 1.0)), s"doc4 ${out(3)}")
  }

  test("encodeStats: null text encodes as empty; empty merge table is identity") {
    import spark.implicits._
    val docs = Seq((1L, Option("ab ba")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Bpe.encodeStats(docs, "doc_id", "text", Seq.empty)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out(0) == ((1L, 4L, 4L)), s"identity ${out(0)}")
    assert(out(1) == ((2L, 0L, 0L)), s"null-text ${out(1)}")
  }

  test("learnMerges stops when no pairs remain; vocab guard fires") {
    import spark.implicits._
    val single = Seq("a b c").toDF("text") // all 1-char words
    val out = Bpe.learnMerges(single, "text", iters = 5).collect()
    assert(out.isEmpty, "single-char vocab has no pairs after 0 merges? " +
      s"got ${out.length}")
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq("aa bb cc dd").toDF("text"), "text",
        iters = 2, maxVocab = 2)
    }
  }
}
