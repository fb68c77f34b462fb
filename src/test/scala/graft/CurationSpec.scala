package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("sourceMixReport: dup fraction, volume floor and keep gate") {
    // srcA: 3 docs, two sharing the full leading segment (short docs:
    // the segment is the whole text) -> neardup_frac 2/3 > 0.3
    // srcB: 2 clean docs -> frac 0 but below the minDocs floor
    val docs = Seq(
      (1L, "alpha beta gamma", "srcA"),
      (2L, "alpha beta gamma", "srcA"),
      (3L, "delta epsilon zeta", "srcA"),
      (4L, "one two three", "srcB"),
      (5L, "four five six", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = Curation.sourceMixReport(docs, minDocs = 3L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double, Boolean)]
      .collect().toSeq
    assert(out == Seq(
      ("srcA", 3L, 9L, 2L, 0.666667, 3.0, false),
      ("srcB", 2L, 6L, 0L, 0.0, 3.0, false)))
  }

  test("sourceMixReport: a clean source above the floor is kept") {
    val docs = (1L to 12L).map(i => (i, s"unique doc number $i content", "ok"))
      .toDF("doc_id", "text", "source")
    val out = Curation.sourceMixReport(docs)
      .as[(String, Long, Long, Long, Double, Double, Boolean)]
      .collect().toSeq
    assert(out == Seq(("ok", 12L, 60L, 0L, 0.0, 5.0, true)))
  }

  test("capPerSource: quota, tie-break to smallest id, threshold reported") {
    // srcA: 4 docs, cap 2 — token counts 3,3,2,1: the two 3-token docs
    // win; the TIE between docs 1 and 2 admits both (cap 2), so the
    // threshold is 3. srcB: under quota, everything kept.
    val docs = Seq(
      (1L, "a b c", "srcA"),
      (2L, "d e f", "srcA"),
      (3L, "g h", "srcA"),
      (4L, "i", "srcA"),
      (5L, "one two", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = Curation.capPerSource(docs, cap = 2L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      ("srcA", 4L, 2L, 2L, 3L),
      ("srcB", 1L, 1L, 0L, 2L)))
    // cap 1 must break the 3-token tie to the SMALLEST doc_id: the
    // kept doc is #1, threshold still 3
    val one = Curation.capPerSource(docs.filter($"source" === "srcA"), cap = 1L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(one == (("srcA", 4L, 1L, 3L, 3L)))
    intercept[IllegalArgumentException] {
      Curation.capPerSource(docs, cap = 0L)
    }
  }

  test("dsirWeights matches a brute-force model replay; target scores above raw") {
    val buckets = 64
    val docs = Seq(
      (1L, "stock market trading price index", "en"),
      (2L, "stock price market analysis report", "en"),
      (3L, "der markt und die analyse", "de"),
      (4L, "die preise und der bericht", "de"),
      (5L, "stock market price report today", "en")
    ).toDF("doc_id", "text", "lang")
    // independent replay of the model and the ladder
    def bucket(t: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString
      Integer.parseInt(h, 16) % buckets
    }
    val toks = Seq(
      1L -> ("en", "stock market trading price index"),
      2L -> ("en", "stock price market analysis report"),
      3L -> ("de", "der markt und die analyse"),
      4L -> ("de", "die preise und der bericht"),
      5L -> ("en", "stock market price report today")
    ).map { case (id, (l, s)) => (id, l, s.split("\\s+").toSeq) }
    val tCnt = new Array[Long](buckets); val rCnt = new Array[Long](buckets)
    toks.foreach { case (_, l, ts) =>
      ts.foreach { t =>
        if (l == "en") tCnt(bucket(t)) += 1 else rCnt(bucket(t)) += 1
      }
    }
    val nt = tCnt.sum; val nr = rCnt.sum
    def lam(b: Int): BigDecimal = BigDecimal(
      math.log((tCnt(b) + 1.0) / (nt + buckets)) -
        math.log((rCnt(b) + 1.0) / (nr + buckets)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = toks.map { case (id, _, ts) =>
      val s = ts.map(t => lam(bucket(t))).sum
      (id, ts.size.toLong,
        s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        (s / ts.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val out = Curation.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = buckets)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == expected)
    // directionally: every en doc outweighs every de doc
    val w = out.map(r => r._1 -> r._3).toMap
    assert(Seq(1L, 2L, 5L).map(w).min > Seq(3L, 4L).map(w).max)
  }

  test("dsirWeights: NULL targetPred rows train neither distribution") {
    val withNull = Seq(
      (1L, "aa bb cc", Some("en")),
      (2L, "aa dd", Some("de")),
      (3L, "aa bb ee", Option.empty[String]) // lang NULL: excluded from model
    ).toDF("doc_id", "text", "lang")
    val without = Seq(
      (1L, "aa bb cc", "en"),
      (2L, "aa dd", "de")
    ).toDF("doc_id", "text", "lang")
    val a = Curation.dsirWeights(withNull, "doc_id", "text",
      col("lang") === "en", buckets = 32)
      .filter(col("doc_id") <= 2).orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val b = Curation.dsirWeights(without, "doc_id", "text",
      col("lang") === "en", buckets = 32)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(a == b,
      "a NULL-pred row must not shift the learned distributions")
  }

  test("dsirWeights rejects an unbounded bucket count") {
    val docs = Seq((1L, "x", "en")).toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      Curation.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = (1 << 20) + 1)
    }
    assert(e.getMessage.contains("config-sized"))
  }

  test("dsir scoring plan is map-only: no exchange after the model collect") {
    val docs = Seq(
      (1L, "aa bb", "en"), (2L, "cc dd", "de")
    ).toDF("doc_id", "text", "lang")
    val scored = Curation.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 16)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"dsir scoring must not shuffle the corpus:\n$plan")
  }
}
