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
