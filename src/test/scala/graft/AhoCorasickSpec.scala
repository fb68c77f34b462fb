package graft

import graft.ops.TextOps

class AhoCorasickSpec extends SparkSuite {
  import spark.implicits._

  test("blocklistScan: overlapping patterns, ties, and misses") {
    val kws = Seq("ab", "abc", "bc", "zz")
    val docs = Seq(
      (1L, "xxabcxx"),   // ab@3, abc@3, bc@4 -> n 3, first (3, "ab")
      (2L, "bc ab"),     // bc@1, ab@4 -> n 2, first (1, "bc")
      (3L, "no hits"),   // n 0, NULLs
      (4L, ""),          // empty
      (5L, "zzz")        // zz@1 (and zz@2 — same kw counts once)
    ).toDF("doc_id", "text")
    val out = TextOps.blocklistScan(docs, "doc_id", "text", kws)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(out(0) == ((1L, 3L, 3L, "ab")), s"doc1 ${out(0)}")
    assert(out(1) == ((2L, 2L, 1L, "bc")), s"doc2 ${out(1)}")
    assert(out(2) == ((3L, 0L, null, null)), s"doc3 ${out(2)}")
    assert(out(3) == ((4L, 0L, null, null)), s"doc4 ${out(3)}")
    assert(out(4) == ((5L, 1L, 1L, "zz")), s"doc5 ${out(4)}")
  }

  test("blocklistScan: same-position tie breaks to the UTF-8-smaller keyword") {
    // both "ab" and "ax"? no — same START: "a" and "ab" both start at 1;
    // "a" < "ab" in byte order
    val docs = Seq((1L, "abq")).toDF("doc_id", "text")
    val out = TextOps.blocklistScan(docs, "doc_id", "text", Seq("ab", "a"))
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getString(3)) == ((2L, 1L, "a")))
  }

  test("blocklistScan: positions count code points (SQL position parity)") {
    val hi = new String(Character.toChars(0x1F600)) // surrogate pair
    val docs = Seq((1L, s"$hi$hi word")).toDF("doc_id", "text")
    val out = TextOps.blocklistScan(docs, "doc_id", "text", Seq("word"))
      .collect().head
    // code points: 2 emoji + space = 3, "word" starts at cp 4 (not 6)
    assert(out.getLong(2) == 4L, s"got ${out.getLong(2)}")
  }

  test("blocklistScan matches a brute-force indexOf reference") {
    val kws = Seq("the", "he", "hash", "ash table", "spark")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60).select("doc_id", "text")
    val got = TextOps.blocklistScan(docs, "doc_id", "text", kws)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    val want = docs.collect().map { r =>
      val id = r.getLong(0); val text = r.getString(1)
      val hits = kws.flatMap { k =>
        val i = text.indexOf(k)
        if (i < 0) None else Some((k, text.codePointCount(0, i) + 1L))
      }
      id -> ((hits.length.toLong,
        if (hits.isEmpty) -1L else hits.map(_._2).min))
    }.toMap
    assert(got == want)
  }

  test("AcModel guards: empty and duplicate keywords rejected") {
    intercept[IllegalArgumentException] {
      new graft.functions.AcModel(Array("a", ""))
    }
    intercept[IllegalArgumentException] {
      new graft.functions.AcModel(Array("a", "a"))
    }
  }
}
