package graft

import org.apache.spark.sql.functions._

/** The round-13 verdict's structural-cache directive: ops with
  * driver-small outputs (averagePrecision, bm25Batch) must release
  * their internal persists BEFORE returning — no cached blocks may
  * survive an op call whose result was consumed, and nothing may be
  * left in the registerPersisted queue for Verify/Bench to drain.
  * Ops with unbounded outputs (winnowCandidates) instead expose the
  * madOutliers-style persist opt-out.
  */
class CacheContractSpec extends SparkSuite {
  import spark.implicits._

  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Other suites in the shared JVM may legitimately leave queued
    * persists (the documented caller contract) — drain them so the
    * zero-queue assertions below isolate THIS op's behavior. */
  private def drained(): Unit = { graft.ops.Robust.unpersistPersisted(); () }

  test("averagePrecision: no cached blocks survive, queue untouched") {
    drained()
    val before = cachedIds
    val df = Seq((1L, 0.9, 1), (2L, 0.8, 0), (3L, 0.7, 1), (4L, 0.6, 0))
      .toDF("id", "score", "y")
    val r = graft.ops.Eval.averagePrecision(df, "id", "score", col("y"))
    assert(r.collect().length == 1)
    assert((cachedIds -- before).isEmpty,
      s"cached RDDs leaked: ${cachedIds -- before}")
    assert(graft.ops.Robust.unpersistPersisted() == 0,
      "op enqueued into the caller-contract queue despite being structural")
  }

  test("bm25Batch: no cached blocks survive, queue untouched") {
    drained()
    val before = cachedIds
    val docs = Seq((1L, "spark shuffle join"), (2L, "join order spark"),
      (3L, "quantile sketch"), (4L, "sketch spark shuffle"))
      .toDF("doc_id", "text")
    val r = graft.ops.CorpusStats.bm25Batch(docs, "doc_id", "text",
      Seq("q1" -> Seq("spark", "join"), "q2" -> Seq("sketch")), topK = 2)
    assert(r.count() > 0)
    assert((cachedIds -- before).isEmpty,
      s"cached RDDs leaked: ${cachedIds -- before}")
    assert(graft.ops.Robust.unpersistPersisted() == 0,
      "op enqueued into the caller-contract queue despite being structural")
  }

  test("bm25Batch result stays transformable after the eager scope") {
    // the returned frame is a local relation; downstream relational
    // composition must still work
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val r = graft.ops.CorpusStats.bm25Batch(docs, "doc_id", "text",
      Seq("q" -> Seq("beta")), topK = 1)
    assert(r.filter(col("rank") === 1L).select("query_id")
      .as[String].collect().toSeq == Seq("q"))
    graft.ops.Robust.unpersistPersisted()
  }

  test("withPersisted: exceeding the declared bound fails loudly") {
    val before = cachedIds
    val df = (1 to 100).toDF("v")
    val e = intercept[IllegalStateException] {
      graft.ops.Robust.withPersisted(df, maxRows = 10L)(identity)
    }
    assert(e.getMessage.contains("exceeded the declared bound"))
    // the persist is released even on the failure path
    assert((cachedIds -- before).isEmpty)
  }

  test("winnowCandidates leaves no cached blocks (r18 bucket shape)") {
    // the single-consumer bucket shape needs no fingerprint persist at
    // all — the strongest cache contract: nothing cached, nothing owed
    drained()
    val before = cachedIds
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark catalyst plans"))
      .toDF("doc_id", "text")
    val r = graft.ops.Dedup.winnowCandidates(docs, "doc_id", "text",
      k = 12, window = 4, minShared = 1L, maxBucket = 100)
    assert(r.count() >= 1)
    assert((cachedIds -- before).isEmpty,
      s"cached RDDs leaked from winnowCandidates: ${cachedIds -- before}")
    assert(graft.ops.Robust.unpersistPersisted() == 0)
  }

  test("gram-table and graph-edge persists ride the queue (round-14 leak sweep)") {
    // prefixFilterJaccardPairs / crossDocNovelty / ngramJaccardPairs /
    // weightedPageRank used RAW persists with no release path — the
    // cached relations survived the whole session. They must enqueue
    // so Verify/Bench (and library callers) can drain per call.
    drained()
    val before = cachedIds
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    graft.ops.Dedup.crossDocNovelty(docs, "doc_id", "text", n = 3).count()
    assert(graft.ops.Robust.unpersistPersisted() == 1,
      "crossDocNovelty must enqueue exactly its gram table")
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    graft.ops.Graph.weightedPageRank(edges, "src", "dst", "w",
      nodes, "id", iters = 2).count()
    assert(graft.ops.Robust.unpersistPersisted() == 1,
      "weightedPageRank must enqueue exactly its edge relation")
    assert((cachedIds -- before).isEmpty,
      s"cached RDDs leaked after draining: ${cachedIds -- before}")
  }

  test("queue-contract audit: every registerPersisted site has an unbounded output") {
    // Round-14 verdict directive 6: the structural withPersisted scope
    // applies ONLY where the op's output is parameter-bounded (a stats
    // row, |queries|·topK). This round's audit of every remaining
    // queue site found each one's output is unbounded BY CONSTRUCTION
    // — so the queue + opt-out is the correct contract for all of
    // them, and this test freezes that inventory. Adding a NEW
    // registerPersisted call without re-running the audit (is the
    // output parameter-bounded? → use withPersisted instead) fails
    // here by design.
    //
    //   Dedup.scala ×3 — gram tables; outputs are candidate PAIRS or
    //     per-doc stats (corpus-sized). r18 removed winnowCandidates'
    //     fingerprint persist: the bucket shape has ONE consumer.
    //   Events.scala ×1 — RFM stage persists; output is per-user
    //   Graph.scala ×1 — pagerank edge relation; output is per-node
    //   KMeans.scala ×1 — projected vectors across Lloyd passes;
    //     output is the per-point assignment (corpus-sized)
    //   Robust.scala ×2 — spearman base/value tables (output:
    //     per-GROUP rho, group cardinality is data-dependent, not a
    //     parameter); r18 removed madOutliers' projection persist
    //     (measured loss on cheap scans) — the MAD device persists
    //     its base through Percentiles' persistBase instead
    //   Percentiles.scala ×1 — exactImpl's opt-in base persist
    //     (persistBase; output is per-group percentiles — group
    //     cardinality data-dependent, so the queue, not withPersisted)
    //
    // (MMR's pool persist and labelPropagation/HITS edge persists use
    // inline persist/unpersist scopes — already structural.)
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val expected = Map(
      "Dedup.scala" -> 3, "Events.scala" -> 1, "Graph.scala" -> 1,
      "KMeans.scala" -> 1, "Robust.scala" -> 2, "Percentiles.scala" -> 1)
    val root = Paths.get("src/main/scala/graft")
    val found = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val n = Files.readAllLines(p).asScala
          .count(l => l.contains("registerPersisted(") &&
            !l.contains("def registerPersisted") &&
            !l.trim.startsWith("//") && !l.trim.startsWith("*"))
        if (n > 0) Some(p.getFileName.toString -> n) else None
      }.toMap
    assert(found == expected,
      s"registerPersisted inventory changed — re-run the bounded-output " +
        s"audit (parameter-bounded output ⇒ Robust.withPersisted; " +
        s"unbounded ⇒ queue + opt-out) and update this test.\n" +
        s"expected: $expected\nfound:    $found")
  }

  test("source lint: every raw .persist( has an in-file release path") {
    // the round-14 leak class: a .persist( with neither an .unpersist(
    // in the same file nor the registerPersisted queue leaks cached
    // relations for the whole session. Robust.scala owns the queue and
    // the withPersisted scope (its persists ARE the release machinery).
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala/graft")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "Robust.scala")
      .flatMap { p =>
        val src = new String(Files.readAllBytes(p), "UTF-8")
        if (src.contains(".persist(") &&
            !src.contains(".unpersist(") &&
            !src.contains("registerPersisted"))
          Some(p.toString)
        else None
      }.toList
    assert(offenders.isEmpty,
      s"raw .persist( with no release path (queue it via " +
        s"Robust.registerPersisted or unpersist in scope): $offenders")
  }

  test("winnowCandidates default queues no persist (r18 bucket shape)") {
    drained()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val r = graft.ops.Dedup.winnowCandidates(docs, "doc_id", "text",
      k = 12, window = 4, minShared = 1L, maxBucket = 100)
    r.count()
    assert(graft.ops.Robust.unpersistPersisted() == 0,
      "the bucket-shape winnow reads fingerprints once; nothing may persist")
  }
}
