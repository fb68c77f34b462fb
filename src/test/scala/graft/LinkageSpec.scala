package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

class LinkageSpec extends SparkSuite {
  import spark.implicits._

  private val recs = Seq(
    (1L, "acme corp", "x"),
    (2L, "acme corp.", "x"),  // distance 1 from 1
    (3L, "acme corporation", "x"), // distance 7 from 1 — over threshold
    (4L, "zenith ltd", "y"),
    (5L, "zenith ltd", "y"),  // exact dup of 4
    (6L, "acme corp", "z")    // same name, different block: never compared
  ).toDF("id", "name", "blk")

  test("blockedPairs: compares within blocks only, a<b, distance filter") {
    val out = Linkage.blockedPairs(recs, "id", "name", col("blk"),
      maxDistance = 2)
      .select("id_a", "id_b", "distance")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // (1,2) dist 1; (4,5) dist 0; (1,3)/(2,3) over threshold; 6 is
    // alone in its block; cross-block (1,6) never generated
    assert(out == Seq((1L, 2L, 1L), (4L, 5L, 0L)), s"got $out")
  }

  test("blockedPairs: oversized blocks drop via the skew cap") {
    val big = (1L to 10L).map(i => (i, s"name$i", "hot")).toDF("id", "name", "blk")
    val out = Linkage.blockedPairs(big, "id", "name", col("blk"),
      maxDistance = 99, maxBlock = 5)
    assert(out.count() == 0, "a block over the cap must be dropped whole")
    val ok = Linkage.blockedPairs(big, "id", "name", col("blk"),
      maxDistance = 99, maxBlock = 100)
    assert(ok.count() == 45, "10-record block yields C(10,2) pairs")
  }

  test("blockedPairs: compound blocking reports a shared pair once") {
    // same pair reachable through two block keys (multi-pass blocking
    // unioned upstream) — the distinct collapses it
    val two = Seq((1L, "ab", "k1"), (2L, "ab", "k1"),
      (1L, "ab", "k2"), (2L, "ab", "k2")).toDF("id", "name", "blk")
    val out = Linkage.blockedPairs(two, "id", "name", col("blk"), 0)
    assert(out.count() == 1, "compound keys must not duplicate pairs")
  }

  test("sortedNeighborhoodPairs: window pairs across bucket boundaries, rank order") {
    // names sort as n01..n12; window 3 must pair every (i, i+1..i+3)
    // including pairs that straddle the floor(rank/3) bucket edges
    val recs = (1 to 12).map(i => (i.toLong, f"n$i%02d")).toDF("id", "name")
    val out = Linkage.sortedNeighborhoodPairs(recs, "id", "name",
      col("name"), window = 3, maxDistance = 99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for (i <- 1 to 12; j <- i + 1 to math.min(12, i + 3))
      yield (i.toLong, j.toLong)).toSet
    assert(out == want,
      s"missing ${want -- out}, extra ${out -- want}")
  }

  test("sortedNeighborhoodPairs: typo'd name pairs with its clean form without a block key") {
    // the motivating case: no equality key survives the typo, but the
    // sort places the variants adjacently
    val recs = Seq((1L, "jonathan smith"), (2L, "jonathan smyth"),
      (3L, "aaron brown"), (4L, "zoe chen")).toDF("id", "name")
    val out = Linkage.sortedNeighborhoodPairs(recs, "id", "name",
      col("name"), window = 1, maxDistance = 2)
      .select("id_a", "id_b", "distance")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L)), s"got $out")
  }

  test("jaroWinklerPairs: prefix-weighted scoring finds what Levenshtein ranks weakly") {
    val recs2 = Seq(
      (1L, "b1", "martha"), (2L, "b1", "marhta"), // transposition: JW 0.9611…
      (3L, "b1", "zzzzzz"),
      (4L, "b2", "alone")
    ).toDF("id", "blk", "name")
    val out = Linkage.jaroWinklerPairs(recs2, "id", "name", col("blk"),
        minSimilarity = 0.9)
      .select("id_a", "id_b", "similarity")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.9611111111111111)), s"got $out")
    intercept[IllegalArgumentException] {
      Linkage.jaroWinklerPairs(recs2, "id", "name", col("blk"), 1.5)
    }
  }

  test("audit observation reports dropped blocks/rows on the run itself") {
    import org.apache.spark.sql.Observation
    // one hot block of 7 (over cap 5, dropped), one comparable block
    // of 2, one singleton (neither comparable nor dropped)
    val mixed = ((1L to 7L).map(i => (i, s"name$i", "hot")) ++
      Seq((8L, "acme", "ok"), (9L, "acme", "ok"), (10L, "solo", "one")))
      .toDF("id", "name", "blk")
    val obs = Observation("linkage_audit")
    val out = Linkage.blockedPairs(mixed, "id", "name", col("blk"),
      maxDistance = 99, maxBlock = 5, audit = Some(obs))
    assert(out.count() == 1, "only the ok-block pair survives")
    val m = obs.get
    assert(m("n_blocks") == 1L, s"comparable blocks: $m")
    assert(m("dropped_blocks") == 1L, s"dropped blocks: $m")
    assert(m("dropped_rows") == 7L, s"dropped rows: $m")
    // same audit surface on the JW scorer path
    val obs2 = Observation("linkage_audit_jw")
    Linkage.jaroWinklerPairs(mixed, "id", "name", col("blk"),
      minSimilarity = 0.0, maxBlock = 5, audit = Some(obs2)).count()
    val m2 = obs2.get
    assert(m2("dropped_blocks") == 1L && m2("dropped_rows") == 7L, s"$m2")
    // unaudited call: plan unchanged (no CollectMetrics node)
    val plain = Linkage.blockedPairs(mixed, "id", "name", col("blk"), 99)
    assert(!plain.queryExecution.analyzed.toString
      .contains("CollectMetrics"), "default path must not observe")
  }

  test("blockedPairs: argument validation") {
    intercept[IllegalArgumentException] {
      Linkage.blockedPairs(recs, "id", "name", col("blk"), -1)
    }
    intercept[IllegalArgumentException] {
      Linkage.blockedPairs(recs, "id", "name", col("blk"), 1, maxBlock = 1)
    }
  }

  test("blockAudit survives the all-dropped case the observation loses") {
    import spark.implicits._
    // every block over-cap → guarded result EMPTY; AQE empty-relation
    // propagation drops CollectMetrics from the final plan there
    // (round-12 find), so the audit must come from the direct
    // aggregate — and it must agree with the observation when blocks
    // DO survive
    val allBig = (1 to 30).map(i => (i.toLong, s"n$i", s"b${i % 2}"))
      .toDF("id", "name", "blk")
    val a = graft.ops.Linkage.blockAudit(allBig, "id", col("blk"), 5).head()
    assert((a.getLong(0), a.getLong(1), a.getLong(2)) == (0L, 2L, 30L))
    val mixed = ((1 to 12).map(i => (i.toLong, s"n$i", "big")) ++
      Seq((100L, "x", "ok"), (101L, "y", "ok")))
      .toDF("id", "name", "blk")
    val b = graft.ops.Linkage.blockAudit(mixed, "id", col("blk"), 5).head()
    assert((b.getLong(0), b.getLong(1), b.getLong(2)) == (1L, 1L, 12L))
  }

  test("PINNED Spark footgun: AQE empty-relation propagation drops CollectMetrics") {
    import org.apache.spark.sql.Observation
    // The round-12 bench find, pinned as a regression test: when the
    // guarded result is EMPTY (every block over-cap), AQE's
    // empty-relation propagation replaces the subtree in the final
    // adaptive plan and the CollectMetrics node vanishes —
    // Observation.get returns an EMPTY map even though the stage ran
    // and the counters accumulated. Exactly the run whose audit
    // matters most, which is why q265 publishes through
    // Linkage.blockAudit (a direct aggregate) instead.
    // If a Spark upgrade makes this assertion FAIL (metrics present on
    // the empty run), the footgun is fixed: the blockAudit workaround
    // and this pin can be retired together.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "the pin only means something under AQE")
    val allBig = (1 to 30).map(i => (i.toLong, s"n$i", s"b${i % 2}"))
      .toDF("id", "name", "blk")
    val obs = Observation("pin_aqe_empty_collectmetrics")
    val out = Linkage.blockedPairs(allBig, "id", "name", col("blk"),
      maxDistance = 99, maxBlock = 5, audit = Some(obs))
    assert(out.count() == 0, "every block is over-cap")
    assert(obs.get.isEmpty,
      "Spark now keeps CollectMetrics through empty-relation " +
        "propagation — revisit Linkage.guardedBlocks' caveat and " +
        "q265's blockAudit workaround, then retire this pin")
  }
}
