package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Pack, Sample, TextOps}

/** Round-7 pipeline operators: sequence packing (distributed prefix
  * sum), stratified sampling, Bloom decontamination, unigram-LM
  * scoring, segment dedup.
  */
class PipelineOpsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenOffsets is an exclusive prefix sum in id order, any partitioning") {
    val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "n")
      .repartition(13) // scramble physical layout; offsets must not care
    val out = Pack.tokenOffsets(df, "id", "n", numPartitions = 5)
      .select("id", "n", "offset").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    var run = 0L
    out.foreach { case (id, n, off) =>
      assert(off == run, s"id=$id expected offset $run got $off")
      run += n
    }
  }

  test("contiguous packing spans windows exactly like concat-and-chunk") {
    val df = Seq((1L, 300L), (2L, 300L), (3L, 500L), (4L, 0L))
      .toDF("id", "n")
    val rows = Pack.contiguous(df, "id", "n", budget = 512)
      .select("id", "offset", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // offsets: 0, 300, 600, 1100
    assert(rows(0) == (1L, 0L, 0L, 0L))      // [0, 300) in window 0
    assert(rows(1) == (2L, 300L, 0L, 1L))    // straddles 512
    assert(rows(2) == (3L, 600L, 1L, 2L))    // [600, 1100) spans 1..2
    assert(rows(3) == (4L, 1100L, 2L, 2L))   // empty doc pins to its offset window
  }

  test("stratifiedTopK: exactly k per stratum, deterministic, two-phase == naive") {
    val df = (1L to 200L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
      .repartition(7)
    val out = Sample.stratifiedTopK(df, "id", "lang", k = 5)
      .select("lang", "id", "rk").as[(String, Long, Long)].collect()
    assert(out.length == 15)
    assert(out.groupBy(_._1).forall(_._2.length == 5))
    // matches the single-window reference draw
    val naive = df.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(md5($"id".cast("string")), $"id")).cast("long"))
      .filter($"rk" <= 5)
      .select("lang", "id", "rk").as[(String, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq == naive.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("decontaminateBloom output is bit-identical to exact decontaminate") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(train, eval, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toSet
    val bloom = Dedup.decontaminateBloom(train, eval, "doc_id", "text",
      n = 5, expectedGrams = 1000L, fpp = 0.01)
      .as[(Long, Long)].collect().toSet
    assert(bloom == exact)
    assert(exact.map(_._1) == Set(1L, 3L)) // doc 2 shares nothing
  }

  test("unigramLogProb: uniform vocab gives every doc the same mean_lp") {
    // 4 tokens each appearing exactly twice → p = 1/4 for all
    val df = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "aa bb"), (4L, "cc dd"))
      .toDF("doc_id", "text")
    val out = TextOps.unigramLogProb(df, "doc_id", "text")
      .select("doc_id", "n_tokens", "mean_lp")
      .as[(Long, Long, Double)].collect()
    val expected = BigDecimal(math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (_, n, lp) =>
      assert(n == 2L)
      assert(lp == expected, s"got $lp want $expected")
    }
  }

  test("unigramLogProb ranks rare-token docs as more surprising") {
    val df = Seq(
      (1L, "the the the the the the the the"),
      (2L, "the the the the the the the zyzzyva")
    ).toDF("doc_id", "text")
    val lp = TextOps.unigramLogProb(df, "doc_id", "text")
      .select("doc_id", "mean_lp").as[(Long, Double)].collect().toMap
    assert(lp(2L) < lp(1L)) // rare token drags the mean down
  }

  test("dedupSegments removes cross-doc duplicated segments, keeps order, empties survive") {
    val seg = (1 to 10).map(i => s"w$i").mkString(" ") // one full shared segment
    val df = Seq(
      (1L, s"$seg unique one two"),
      (2L, s"$seg other words here"),
      (3L, "totally distinct text")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(df, "doc_id", "text", segTokens = 10, minDocs = 2)
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == (1L, "unique one two", 1L))
    assert(out(1) == (2L, "other words here", 1L))
    assert(out(2) == (3L, "totally distinct text", 1L))
    // fully-duplicated docs survive as empty rows
    val allDup = Seq((1L, seg), (2L, seg)).toDF("doc_id", "text")
    val empty = Dedup.dedupSegments(allDup, "doc_id", "text", 10, 2)
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(empty.toSeq == Seq((1L, "", 0L), (2L, "", 0L)))
  }

  test("packing plan: no corpus-wide single-partition window") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "n")
    val plan = Pack.tokenOffsets(df, "id", "n", numPartitions = 4)
      .queryExecution.executedPlan.toString
    // every Window node must be keyed (the P-row prefix scan windows
    // over __pid AFTER an aggregation, never over the corpus rows)
    val corpusWindow = "Window.*\\[sum\\(n".r.findFirstIn(plan)
    assert(corpusWindow.isEmpty || plan.contains("__pid"), plan)
  }

  test("stratifiedRank: two-phase == naive per-stratum window, any partitioning") {
    import graft.ops.Rank
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 120L).map(i => (i, s"s${i % 3}", (i * 37) % 50))
      .toDF("id", "g", "v").repartition(11)
    val got = Rank.stratifiedRank(df, "g", Seq("v", "id"), numPartitions = 5)
      .select("id", "rk", "n_stratum").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val w = Window.partitionBy("g").orderBy("v", "id")
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "rk", "n_stratum").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("quantileBuckets: exact integral split, stratum-local, 1-based") {
    import graft.ops.Rank
    // 10 rows in one stratum, 5 in another; 3 buckets
    val df = ((1L to 10L).map(i => (i, "a")) ++ (11L to 15L).map(i => (i, "b")))
      .toDF("id", "g")
    val out = Rank.quantileBuckets(df, "g", Seq("id"), nBuckets = 3)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    // stratum a (n=10): ranks 1-4 → 1, 5-7 → 2, 8-10 → 3
    assert((1L to 4L).forall(out(_) == 1L))
    assert((5L to 7L).forall(out(_) == 2L))
    assert((8L to 10L).forall(out(_) == 3L))
    // stratum b (n=5): 1-2 → 1, 3-4 → 2, 5 → 3
    assert(out(11L) == 1L && out(12L) == 1L && out(13L) == 2L)
    assert(out(14L) == 2L && out(15L) == 3L)
  }

  test("stratifiedPrefixSum: two-phase == naive per-stratum running sum") {
    import graft.ops.Rank
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 90L).map(i => (i, s"g${i % 4}", i % 13 + 1))
      .toDF("id", "g", "n").repartition(7)
    val got = Rank.stratifiedPrefixSum(df, "g", Seq("id"), "n", numPartitions = 5)
      .select("id", "prefix").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("prefix",
      coalesce(sum("n").over(w), lit(0L)).cast("long"))
      .select("id", "prefix").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("quantileNormalize: mid-rank quantiles by hand; ties share; nulls drop") {
    import graft.ops.Rank
    // stratum a: [1, 2, 2, 4] (n=4): 1 → (0+1+1)/8 = 0.25,
    // 2 → (2+2+1)/8 = 0.625, 4 → (6+1+1)/8 = 1.0; null excluded
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.0)),
      ("a", Some(4.0)), ("a", None), ("b", Some(7.0)))
      .toDF("g", "v")
    val out = Rank.quantileNormalize(df, "g", "v")
      .as[(String, Double, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(("a", 1.0, 1L, 0.25), ("a", 2.0, 2L, 0.625),
      ("a", 4.0, 1L, 1.0), ("b", 7.0, 1L, 1.0)), s"got $out")
  }

  test("tokenBudgetSample: greedy-inclusive per stratum, deterministic") {
    import graft.ops.Rank
    val df = (1L to 60L).map(i => (i, if (i % 2 == 0) "en" else "de", 10L))
      .toDF("doc_id", "lang", "n_tokens")
    val kept = Rank.tokenBudgetSample(df, "doc_id", "lang", "n_tokens",
      budget = 100L)
    val byLang = kept.groupBy("lang").agg(
      count(lit(1)).as("n"), sum("n_tokens").as("tok"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // 10 tokens/doc, budget 100 → exactly 10 docs per stratum
    assert(byLang == Map("en" -> ((10L, 100L)), "de" -> ((10L, 100L))))
    // deterministic: identical kept set on rerun
    val k1 = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val k2 = Rank.tokenBudgetSample(df, "doc_id", "lang", "n_tokens", 100L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(k1 == k2)
    // a stratum whose first doc exceeds the budget still contributes it
    val big = Seq((1L, "x", 500L), (2L, "x", 500L)).toDF("doc_id", "lang", "n_tokens")
    val kb = Rank.tokenBudgetSample(big, "doc_id", "lang", "n_tokens", 100L)
      .select("doc_id").as[Long].collect().toSeq
    assert(kb.size == 1)
  }

  // The 100 TB contract of the two-phase prefix-sum device, post
  // round-8: the corpus crosses exactly ONE exchange (the range
  // partition); the partition-local half is an imperative scan (no
  // window, so no Catalyst-inserted hashpartitioning(__pid, stratum)
  // corpus re-exchange); the side table rides the SAME shuffle via
  // ReuseExchange; and every hash exchange in the plan sits directly
  // above an aggregate, i.e. carries only P×S partial rows.
  // (finalPlan / assertHashExchangesAboveAggregates live in SparkSuite.)
  private def assertOneCorpusShuffle(plan: String): Unit = {
    // round-12 shape: deterministic __bkt bucketing (Prefix.bucketed)
    // — boundary LITERALS frozen at build time make the bucket a pure
    // data column, so (a) no checkpoint barrier survives in the plan
    // (lineage intact — the round-11 ADVICE fault-tolerance item),
    // (b) no sampled range partitioning anywhere, and (c) the corpus
    // crosses exactly ONE live hash exchange on __bkt; the side table
    // reads it through exchange reuse
    assert(!plan.contains("Scan ExistingRDD"),
      s"device must not checkpoint (lineage):\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"device must not sample range boundaries:\n$plan")
    val bktEx =
      "Exchange hashpartitioning\\(__bkt#\\d+, \\d+\\), REPARTITION_BY_NUM".r
        .findAllIn(plan).size
    assert(bktEx == 1, s"expected ONE live __bkt corpus exchange, got " +
      s"$bktEx:\n$plan")
    assertHashExchangesAboveAggregates(plan, "prefix-sum device")
  }

  test("prefix device over a CACHED input: pids stay aligned (round-11 regression)") {
    import graft.ops.Rank
    import org.apache.spark.sql.expressions.Window
    // the round-11 bug scenario: a persisted upstream made the two
    // executions of the device's subtree sample DIFFERENT range
    // boundaries (nondeterministic aggregate output order), so the
    // __pid join between the row side and the side table silently
    // mismatched — wrong, run-to-run-varying prefix sums. The pinned
    // checkpoint makes this impossible; replay the scenario and
    // compare against the window oracle, twice.
    val base = (1L to 400L).map(i => (i, s"g${i % 3}", (i * 7919) % 97 + 1))
      .toDF("id", "g", "n").repartition(13)
      .persist()
    try {
      val vc = base.groupBy("g", "id").agg(sum("n").cast("long").as("c"))
      (1 to 2).foreach { _ =>
        val got = Rank.stratifiedPrefixSum(vc, "g", Seq("id"), "c")
          .select("id", "prefix").as[(Long, Long)].collect().sortBy(_._1).toSeq
        val w = Window.partitionBy("g").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val want = vc.withColumn("prefix",
          coalesce(sum("c").over(w), lit(0L)).cast("long"))
          .select("id", "prefix").as[(Long, Long)].collect().sortBy(_._1).toSeq
        assert(got == want, "prefix sums must not depend on cache/AQE layout")
      }
    } finally base.unpersist()
  }

  test("prefix device: independently built plans agree (value pinning)") {
    import graft.ops.Rank
    import org.apache.spark.sql.expressions.Window
    // the round-12 value-pinning contract: buckets are a deterministic
    // function of row VALUES (boundary literals from an
    // order-independent hash sample), so two INDEPENDENTLY constructed
    // devices over the same cached, oddly-partitioned input — separate
    // sampling jobs, separate plans, nothing shared — produce
    // identical results. No execution pinning anywhere.
    val base = (1L to 300L).map(i => (i, s"g${i % 4}", (i * 31) % 17 + 1))
      .toDF("id", "g", "c").repartition(7).persist()
    try {
      val w = Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = base.withColumn("prefix",
        coalesce(sum("c").over(w), lit(0L)).cast("long"))
        .select("id", "prefix").as[(Long, Long)].collect().sortBy(_._1).toSeq
      val runs = (1 to 2).map { _ =>
        Rank.stratifiedPrefixSum(base, "g", Seq("id"), "c")
          .select("id", "prefix").as[(Long, Long)].collect().sortBy(_._1).toSeq
      }
      assert(runs.forall(_ == want),
        "independently sampled boundaries must yield identical prefix sums")
    } finally base.unpersist()
  }

  // Round-13: below the completeness window (Prefix.SmallComplete)
  // the device's boundary sample IS the whole table, and rank /
  // prefix become map-side KeyTable kernel lookups — the plan must
  // carry NO device exchange, no window, no checkpoint, no sampled
  // range partitioning.
  private def assertSmallPath(plan: String): Unit = {
    assert(plan.contains("graft_keytable"),
      s"small input must ride the KeyTable lookup:\n$plan")
    assert(!plan.contains("Scan ExistingRDD"),
      s"device must not checkpoint (lineage):\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"small path must not sample range boundaries:\n$plan")
    assert(!plan.contains("Exchange"),
      s"small path must add NO exchange:\n$plan")
    assert(!plan.contains("Window"),
      s"small path must not window:\n$plan")
  }

  test("stratifiedRank plan: small input rides the KeyTable lookup, no shuffle") {
    import graft.ops.Rank
    // range source, not a local Seq — ConvertToLocalRelation would
    // otherwise fold the whole plan into a LocalTableScan
    val df = spark.range(1L, 51L).toDF("id")
      .withColumn("g", concat(lit("s"), pmod(col("id"), lit(2))))
    val out = Rank.stratifiedRank(df, "g", Seq("id"), numPartitions = 4)
    assert(out.columns.toSeq == Seq("id", "g", "rk", "n_stratum"))
    assertSmallPath(finalPlan(out))
  }

  test("stratifiedRank plan ABOVE the completeness window: one corpus shuffle, reused exchange") {
    import graft.ops.Rank
    // past SmallComplete rows the sample is truncated and the device
    // must fall back to the distributed two-phase shape — the 100 TB
    // contract stays pinned
    val n = graft.ops.Prefix.SmallComplete + 1000
    val df = spark.range(1L, n + 1L).toDF("id")
      .withColumn("g", concat(lit("s"), pmod(col("id"), lit(2))))
    val out = Rank.stratifiedRank(df, "g", Seq("id"), numPartitions = 4)
    assertOneCorpusShuffle(finalPlan(out))
    // and the distributed ranks agree with the closed form on this
    // input (odd ids in s1, even in s0, both id-ascending: rank =
    // ⌈id/2⌉ either way)
    val bad = out.filter(col("rk") =!= expr("(id + 1) div 2")).count()
    assert(bad == 0, s"$bad distributed ranks diverged from closed form")
  }

  test("stratifiedPrefixSum/tokenOffsets plans: small path + distributed fallback; no internal columns leak") {
    import graft.ops.Rank
    val df = spark.range(1L, 51L).toDF("id")
      .withColumn("g", concat(lit("s"), pmod(col("id"), lit(2))))
      .withColumn("n", col("id"))
    val out = Rank.stratifiedPrefixSum(df, "g", Seq("id"), "n", numPartitions = 4)
    assert(out.columns.toSeq == Seq("id", "g", "n", "prefix"))
    assertSmallPath(finalPlan(out))
    // above the window: the distributed two-phase shape
    val nBig = graft.ops.Prefix.SmallComplete + 1000
    val big = spark.range(1L, nBig + 1L).toDF("id")
      .withColumn("g", concat(lit("s"), pmod(col("id"), lit(2))))
      .withColumn("n", pmod(col("id"), lit(7)) + 1)
    val outBig = Rank.stratifiedPrefixSum(big, "g", Seq("id"), "n",
      numPartitions = 4)
    assert(outBig.columns.toSeq == Seq("id", "g", "n", "prefix"))
    assertOneCorpusShuffle(finalPlan(outBig))
    // Pack's contract too: offsets add exactly one column, same shape
    // (Pack pins __bkt itself, so it keeps the bucketed device at any
    // size)
    val packed = Pack.tokenOffsets(df.select("id", "n"), "id", "n", 4)
    assert(packed.columns.toSeq == Seq("id", "n", "offset"))
    assertOneCorpusShuffle(finalPlan(packed))
  }

  test("weightedSample: A-RES keys match a driver-side replay; weight bias holds") {
    val df = (1L to 300L).map(i => (i, if (i <= 150) 5L else 500L))
      .toDF("id", "wt")
    val out = Sample.weightedSample(df, "id", "wt", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 50)
    // driver-side replay of the exact construction
    def key(id: Long, wt: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v = (0 until 8).map(i =>
        java.lang.Long.parseLong(h.substring(i, i + 1), 16) <<
          (4 * (7 - i))).sum
      val u = (v + 0.5) / 4294967296.0
      BigDecimal(math.pow(u, 1.0 / math.max(wt, 1L).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (1L to 300L).map(i => (i, if (i <= 150) 5L else 500L))
      .map { case (i, w) => (i, w, key(i, w)) }
      .sortBy { case (i, _, s) => (-s, i) }.take(50)
    assert(out.toSeq == expect,
      s"head got ${out.take(3).toSeq} expected ${expect.take(3)}")
    // heavy weights dominate the draw
    assert(out.count(_._2 == 500L) > 40)
  }

  test("neymanAllocation: N_h·s_h weighting, exact budget, zero-var excluded") {
    import spark.implicits._
    // stratum a: 4 rows spread 10..40 (s > 0); b: 4 rows all 5
    // (s = 0 → weight 0); c: 2 rows spread 0/100 (huge s, small N)
    val df = (Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0)) ++
      Seq.fill(4)(("b", 5.0)) ++ Seq(("c", 0.0), ("c", 100.0)))
      .toDF("s", "v")
    val out = Sample.neymanAllocation(df, "s", "v", totalN = 10L)
      .orderBy("s")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    // allocations sum EXACTLY to the budget
    assert(out.map(_._5).sum == 10L, s"got $out")
    val m = out.map(r => r._1 -> r).toMap
    assert(m("b")._3 == 0.0 && m("b")._5 == 0L, s"got $out")
    // a: s = sd(10,20,30,40) ≈ 12.909944, w ≈ 51.639778
    // c: s = sd(0,100) ≈ 70.710678, w ≈ 141.421356
    // shares ≈ 0.2674/0.7326 of 10 → largest remainder: a=3, c=7
    assert(m("a")._5 == 3L && m("c")._5 == 7L, s"got $out")
    assert(math.abs(m("a")._3 - 12.909944) < 1e-6)
  }
}
