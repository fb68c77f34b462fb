package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("RocksDB state store: q105/q116/q128 rows are provider-equal") {
    // the 100 TB scale path for stateful streaming (RocksDB provider +
    // changelog checkpointing — StreamPipeline.RocksDbConfs) must be a
    // pure cost-shape change: the interval-join, session-window and
    // CDC gate queries produce byte-equal rows under both providers.
    // (The gate itself keeps the default provider: tiny local state is
    // dominated by per-batch RocksDB instance spin-up.)
    Seq("q105_stream_interval_join", "q116_stream_sessions",
      "q128_stream_cdc").foreach { q =>
      val base = SparkEntry.queries(q)(spark, sfDir).collect().toSeq
      val rocks = StreamPipeline.withRocksDbStateStore(spark) {
        SparkEntry.queries(q)(spark, sfDir).collect().toSeq
      }
      assert(base.nonEmpty, s"$q: empty base result")
      assert(rocks == base,
        s"$q: provider changed the rows — base ${base.size}, rocks ${rocks.size}")
      // the session conf is restored afterwards
      assert(!spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass").exists(_.contains("RocksDB")))
    }
  }

  test("withAutoStateStore encodes the measured break-even in code") {
    // round-11 VERDICT directive 8: callers state expected key
    // cardinality; the helper picks the provider from the measured
    // ~50k-key break-even. Both branches must stay provider-equal on
    // a real stateful query, and the branch choice must be observable
    // while the body runs.
    val q = "q116_stream_sessions"
    val base = SparkEntry.queries(q)(spark, sfDir).collect().toSeq
    assert(base.nonEmpty)
    def providerIsRocks: Boolean = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB"))
    // under the break-even: default provider, same rows
    val small = StreamPipeline.withAutoStateStore(spark, 1000L) {
      assert(!providerIsRocks, "small state must keep the default provider")
      SparkEntry.queries(q)(spark, sfDir).collect().toSeq
    }
    assert(small == base)
    // at/over the break-even (and the unbounded convention): RocksDB
    val big = StreamPipeline.withAutoStateStore(spark, Long.MaxValue) {
      assert(providerIsRocks, "large state must pick RocksDB")
      SparkEntry.queries(q)(spark, sfDir).collect().toSeq
    }
    assert(big == base)
    assert(!providerIsRocks, "session conf must be restored")
    assert(StreamPipeline.StateStoreBreakEvenKeys == 50000L)
  }

  test("windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamPipeline.windowedCounts(events, "ts", "event_type",
      windowLen = "1 hour", watermark = "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      input.addData(
        (ts("2024-01-01 00:10:00"), "click", 1.5),
        (ts("2024-01-01 00:20:00"), "click", 2.5),
        (ts("2024-01-01 01:10:00"), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 4.0), ("view", 1L, 4.0)))
    } finally q.stop()
  }

  test("session windows group by gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val sess = StreamPipeline.sessionWindows(events, "ts", "user_id", gap = "30 minutes")
    val q = sess.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:10:00"), 1L), // same session
        (ts("2024-01-01 02:00:00"), 1L)) // new session
      q.processAllAvailable()
      val n = spark.table("sess_out").count()
      assert(n == 2)
    } finally q.stop()
  }

  test("session_window merging is end-inclusive: exact-gap events extend, gap+1 splits") {
    // q116 leans on this: with gap = 1800 s, a floor-second diff of
    // EXACTLY 1800 must merge (the batch q32 rule keeps diff ≤ 1800
    // in-session; only > 1800 splits) and 1801 must split. If Spark's
    // merge were end-exclusive this test fails and q116 needs 1801 s.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val sess = StreamPipeline.sessionWindows(events, "ts", "user_id",
      gap = "1800 seconds")
    val q = sess.writeStream.outputMode("complete")
      .format("memory").queryName("sess_edge").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:30:00"), 1L), // diff exactly 1800 s: merges
        (ts("2024-01-01 00:00:00"), 2L),
        (ts("2024-01-01 00:30:01"), 2L)) // diff 1801 s: splits
      q.processAllAvailable()
      val n = spark.table("sess_edge")
        .groupBy("user_id").count().orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(n == Seq((1L, 1L), (2L, 2L)), s"got $n")
    } finally q.stop()
  }

  test("foreachBatch multi-sink fan-out writes each batch to all sinks") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val df = input.toDF().toDF("n")
    val dir = Files.createTempDirectory("graft_stream").toString
    val q = StreamPipeline.multiSinkWriter(df,
      Seq(
        b => b.write.mode("append").json(s"$dir/sink1"),
        b => b.write.mode("append").parquet(s"$dir/sink2")),
      checkpoint = s"$dir/ckpt").start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      assert(spark.read.json(s"$dir/sink1").count() == 3)
      assert(spark.read.parquet(s"$dir/sink2").count() == 3)
    } finally q.stop()
  }

  test("file-drop ingest picks up new files (streaming FILE source S1)") {
    val dir = Files.createTempDirectory("graft_drop").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      "{\"id\": 1}\n{\"id\": 2}\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val stream = StreamPipeline.fileStream(spark, dir, schema)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("drop_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("drop_out").count() == 2)
      Files.writeString(java.nio.file.Paths.get(s"$dir/b.json"), "{\"id\": 3}\n")
      q.processAllAvailable()
      assert(spark.table("drop_out").count() == 3)
    } finally q.stop()
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    import graft.streaming.StreamDedup
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "key")
    val out = StreamDedup.dedupWithinWatermark(df, Seq("key"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-08-12 10:00:00")
      val t1 = Timestamp.valueOf("2026-08-12 10:01:00")
      input.addData((t0, "a"), (t1, "a"), (t0, "b")) // a duplicated in-horizon
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("key")
        .as[String].collect().sorted.toSeq == Seq("a", "b"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState tags repeats across micro-batches (custom state)") {
    import graft.streaming.StreamDedup
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val df = input.toDF().toDF("ts", "key", "v")
    val out = StreamDedup.firstSeenTagged(df, "key", "ts")
    val q = out.writeStream.format("memory").queryName("tagged_out")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2026-08-12 10:00:00")
      input.addData((t, "k1", 1L), (t, "k2", 2L))
      q.processAllAvailable()
      // second batch: k1 repeats — state must survive the batch boundary
      input.addData((Timestamp.valueOf("2026-08-12 10:05:00"), "k1", 3L))
      q.processAllAvailable()
      val rows = spark.table("tagged_out")
        .select("key", "seen_before", "seen_count")
        .as[(String, Boolean, Long)].collect().sorted.toSeq
      assert(rows == Seq(("k1", false, 1L), ("k1", true, 2L), ("k2", false, 1L)))
      // payload carries the full original record
      assert(spark.table("tagged_out").where("key = 'k2'")
        .select("payload").as[String].head().contains("\"v\":2"))
    } finally q.stop()
  }

  test("streaming token budget: per-stratum admission persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "lang", "n_tokens")
    val admitted = graft.streaming.StreamBudget.admitUntilBudget(
      docs, "doc_id", "lang", "n_tokens", budget = 100L)
    val q = admitted.writeStream.outputMode("append")
      .format("memory").queryName("budget_out").start()
    try {
      // batch 1: en spends 80 of 100; de spends 90
      input.addData((1L, "en", 50L), (2L, "en", 30L), (3L, "de", 90L))
      q.processAllAvailable()
      // batch 2: en admits one more (80 < 100, greedy-inclusive) then
      // closes; de admits 4 (90 < 100) then closes; batch 3 all dropped
      input.addData((4L, "en", 40L), (5L, "en", 10L), (6L, "de", 99L))
      q.processAllAvailable()
      input.addData((7L, "en", 1L), (8L, "de", 1L))
      q.processAllAvailable()
      val rows = spark.table("budget_out")
        .select("doc_id", "spent_before").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L, 6L))
      // state carried the batch-1 totals into batch 2
      assert(rows.toMap.apply(4L) == 80L)
      assert(rows.toMap.apply(6L) == 90L)
    } finally q.stop()
  }

  test("dedupAgainstIndex: index rows drop, min-id wins in-batch, restart keeps the marker state") {
    import graft.streaming.StreamDedup
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_incdedup").toString
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
    // persisted index already contains "indexed"
    val seen = graft.ops.Dedup.digests(
      Seq((100L, "indexed")).toDF("doc_id", "text"), Seq("text"))
    // parquet sink: the one bundled sink that supports RESTARTING from
    // a checkpoint (the memory sink refuses recovery), which is the
    // property under test
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      val q = StreamDedup.dedupAgainstIndex(stream, seen, Seq("text"), "doc_id")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // termination is observable BEFORE the manager unregisters the
      // query, so an immediate restart can trip the
      // one-active-query-per-checkpoint guard — poll the active list
      // until it drains
      val deadline = System.currentTimeMillis() + 30000
      while (spark.streams.active.exists(_.id == q.id) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
    }
    def emitted(): Seq[(Long, String)] = spark.read.schema(schema)
      .parquet(s"$dir/out")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // run 1: an index dup, an in-batch dup pair (7 < 9), a fresh row
    Seq((5L, "indexed"), (9L, "twice"), (7L, "twice"), (3L, "fresh"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in")
    runOnce()
    assert(emitted() == Seq((3L, "fresh"), (7L, "twice")))
    // restart from the checkpoint: a re-ingested dup of an emitted key
    // must NOT re-emit (marker state survives); a new key flows
    Seq((1L, "twice"), (2L, "brand_new")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/in")
    runOnce()
    assert(emitted() == Seq((2L, "brand_new"), (3L, "fresh"), (7L, "twice")),
      s"restart must add only the new key, got ${emitted()}")
  }

  test("late data beyond the watermark is dropped from q54-shaped hourly windows (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamPipeline.windowedCounts(events, "ts", "event_type",
      windowLen = "1 hour", watermark = "2 hours")
    // APPEND mode is where watermark semantics bite: a window emits
    // exactly once, when the watermark passes its end, and later rows
    // for it are dropped (complete mode — q54's gate config — keeps
    // all state and can't show the drop)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      // batch 1: two on-time clicks in [00:00,01:00) and a 04:30 view
      // that advances the watermark to 02:30 > 01:00, finalizing the
      // click window (the trailing no-data micro-batch emits it)
      input.addData(
        (ts("2024-01-01 00:10:00"), "click", 1.5),
        (ts("2024-01-01 00:20:00"), "click", 2.5),
        (ts("2024-01-01 04:30:00"), "view", 4.0))
      q.processAllAvailable()
      val afterB1 = spark.table("late_out")
        .select("event_type", "n").as[(String, Long)].collect().toSet
      assert(afterB1 == Set(("click", 2L)),
        s"click window must finalize with 2 rows, got $afterB1")
      // batch 2: a LATE click at 00:30 (event time < watermark 02:30)
      // must be dropped — the finalized window must NOT re-emit or grow
      input.addData((ts("2024-01-01 00:30:00"), "click", 99.0))
      q.processAllAvailable()
      val afterB2 = spark.table("late_out")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSeq
      assert(afterB2.filter(_._1 == "click") == Seq(("click", 2L, 4.0)),
        s"late row must be dropped, got $afterB2")
    } finally q.stop()
  }

  test("dedupAgainstIndex: mid-batch crash (offsets written, commit missing) replays exactly-once") {
    import graft.streaming.StreamDedup
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_midbatch").toString
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
    val seen = graft.ops.Dedup.digests(
      Seq((100L, "indexed")).toDF("doc_id", "text"), Seq("text"))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      val q = StreamDedup.dedupAgainstIndex(stream, seen, Seq("text"), "doc_id")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // termination is observable BEFORE the manager unregisters the
      // query, so an immediate restart can trip the
      // one-active-query-per-checkpoint guard — poll the active list
      // until it drains
      val deadline = System.currentTimeMillis() + 30000
      while (spark.streams.active.exists(_.id == q.id) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
    }
    def emitted(): Seq[(Long, String)] = spark.read.schema(schema)
      .parquet(s"$dir/out")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    Seq((5L, "indexed"), (9L, "twice"), (7L, "twice"), (3L, "fresh"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in")
    runOnce()
    val afterRun1 = emitted()
    assert(afterRun1 == Seq((3L, "fresh"), (7L, "twice")))
    // simulate the crash WINDOW inside a batch: the offset WAL entry is
    // durable but the commit marker never landed — exactly the state a
    // worker dies in after planning/while writing. Deleting the last
    // commit file reproduces it bit-for-bit.
    val commits = new java.io.File(s"$dir/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty, "expected at least one committed batch")
    assert(commits.last.delete(), "failed to remove the last commit marker")
    // Hadoop's local ChecksumFileSystem keeps a `.N.crc` sidecar; left
    // behind, the replay's rename-into-place of the rewritten commit
    // fails and surfaces as a bogus "multiple streaming queries" error
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete(), "failed to remove commit crc")
    // restart: Spark must REPLAY the planned batch against the prior
    // state-store version; the file sink's _spark_metadata transaction
    // log hides any orphaned output, so the visible rows are unchanged
    runOnce()
    assert(emitted() == afterRun1,
      s"replayed batch must be exactly-once, got ${emitted()}")
    // and the replayed state is live, not corrupted: a dup of an
    // emitted key stays suppressed, a new key flows
    Seq((1L, "twice"), (2L, "brand_new")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/in")
    runOnce()
    assert(emitted() == Seq((2L, "brand_new"), (3L, "fresh"), (7L, "twice")))
  }

  test("text kernels ride a stream: quality gate + entropy + scrub per micro-batch") {
    // the whole curation scan stage (compiled kernels, zero shuffle)
    // composes with readStream unchanged — stateless map operators are
    // streaming-safe by construction; this pins that the registered
    // graft_* functions resolve inside a streaming plan too
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val gated = docs.select(col("doc_id"),
      graft.ops.TextOps.qualityScore(col("text")).as("quality"),
      graft.ops.TextOps.charEntropy(col("text")).as("entropy"),
      graft.ops.TextOps.scrubPii(col("text")).as("clean"))
      .filter(col("quality") >= 0.5)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      input.addData(
        (1L, "the cat sat on the mat and the dog slept by the door"),
        (2L, "..........."), // punct-only: scores 0.25, fails the gate
        (3L, "mail bob@example.com about the meeting with the team"))
      q.processAllAvailable()
      val rows = spark.table("gate_out")
        .select("doc_id", "entropy", "clean")
        .as[(Long, Double, String)].collect().sortBy(_._1).toSeq
      assert(rows.map(_._1) == Seq(1L, 3L))
      assert(rows.forall(_._2 > 0.0))
      assert(rows(1)._3.contains("<EMAIL>"))
    } finally q.stop()
  }

  test("stream-stream interval join: bucketed pairs match brute force") {
    import graft.streaming.StreamJoin
    implicit val sqlCtx = spark.sqlContext
    val li = MemoryStream[(Long, Timestamp)]
    val ri = MemoryStream[Timestamp]
    val pairs = StreamJoin.intervalPairs(
      li.toDF().toDF("event_id", "ts"), "event_id", "ts",
      ri.toDF().toDF("ts"), "ts", 300L, watermarkDelay = "1 hour")
    val q = pairs.writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append").start()
    try {
      li.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:10:00")))
      ri.addData(
        ts("2024-01-01 09:55:01"), // in for 1 (299s), out for 2
        ts("2024-01-01 10:05:00"), // exactly 300s from BOTH: in for both
        ts("2024-01-01 10:20:00")) // out for 1 (1200s), out for 2 (600s)
      q.processAllAvailable()
      val got = spark.table("sjoin_out").select("__lid")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 1L, 2L), s"got $got")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched lefts null-extend after the watermark") {
    import graft.streaming.StreamJoin
    implicit val sqlCtx = spark.sqlContext
    val li = MemoryStream[(Long, Timestamp)]
    val ri = MemoryStream[Timestamp]
    val pairs = StreamJoin.intervalPairsLeftOuter(
      li.toDF().toDF("event_id", "ts"), "event_id", "ts",
      ri.toDF().toDF("ts"), "ts", 300L, watermarkDelay = "10 minutes")
    val q = pairs.writeStream.format("memory").queryName("sjoin_lo_out")
      .outputMode("append").start()
    try {
      // event 1 gets a response in-window; event 2 never does
      li.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:10:00")))
      ri.addData(ts("2024-01-01 10:02:00")) // matches 1 only (120 s)
      q.processAllAvailable()
      // event 2 must NOT have null-extended yet — a match could still
      // arrive until the watermark passes 10:15 + delay
      val early = spark.table("sjoin_lo_out")
        .select("__lid", "right_us").as[(Long, Option[Long])]
        .collect().toSeq
      assert(early.forall(_._2.nonEmpty) && early.map(_._1) == Seq(1L),
        s"premature null-extension: $early")
      // advance the watermark far past event 2's window on BOTH sides
      // (the join watermark is the min of the two input watermarks)
      li.addData((9L, ts("2024-01-01 11:30:00")))
      ri.addData(ts("2024-01-01 11:30:00"))
      q.processAllAvailable()
      // one more cycle so the aged state flushes its outer results
      li.addData((10L, ts("2024-01-01 11:40:00")))
      ri.addData(ts("2024-01-01 11:40:00"))
      q.processAllAvailable()
      val rows = spark.table("sjoin_lo_out")
        .select("__lid", "right_us").as[(Long, Option[Long])]
        .collect().toSeq
      val unmatched = rows.filter(_._2.isEmpty).map(_._1)
      assert(unmatched.contains(2L), s"event 2 must null-extend: $rows")
      assert(rows.filter(_._1 == 1L).forall(_._2.nonEmpty),
        s"matched lefts never null-extend: $rows")
    } finally q.stop()
  }

  test("streaming funnel: cursor survives batches, in-batch disorder repaired") {
    import graft.streaming.StreamFunnel
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val df = input.toDF().toDF("user_id", "ts", "event_id", "event_type")
    val out = StreamFunnel.funnelDepthUpdates(df, "user_id", "ts",
      "event_id", "event_type", Seq("view", "click", "purchase"))
    val q = out.toDF().writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // batch 1 delivered OUT of ts order within the batch: the sort
      // repairs it — user 1 reaches depth 2
      input.addData(
        (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
        (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (2L, ts("2024-01-01 10:00:00"), 3L, "purchase")) // wrong order
      q.processAllAvailable()
      val after1 = spark.table("funnel_out")
        .as[(Long, Int)].collect().sorted.toSeq
      assert(after1 == Seq((1L, 1), (1L, 2)), s"got $after1")
      // batch 2: purchase arrives later -> user 1 completes; user 2's
      // view starts their funnel (the earlier purchase cannot count)
      input.addData(
        (1L, ts("2024-01-01 10:02:00"), 4L, "purchase"),
        (2L, ts("2024-01-01 10:03:00"), 5L, "view"))
      q.processAllAvailable()
      val after2 = spark.table("funnel_out")
        .as[(Long, Int)].collect().sorted.toSeq
      assert(after2 == Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)), s"got $after2")
    } finally q.stop()
  }

  test("streaming CDC: winner state survives batches; stale updates emit nothing") {
    import graft.streaming.StreamCdc
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = StreamCdc.latestState(df, "user_id", "ts", "event_id")
    val q = out.writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "upsert", 10.0),
        (1L, ts("2024-01-01 10:05:00"), 2L, "upsert", 20.0),
        (2L, ts("2024-01-01 10:01:00"), 3L, "upsert", 5.0))
      q.processAllAvailable()
      // batch 2: a STALE row for user 1 (earlier ts) must emit nothing;
      // a fresh row for user 2 must emit the new winner
      input.addData(
        (1L, ts("2024-01-01 09:00:00"), 9L, "upsert", 99.0),
        (2L, ts("2024-01-01 10:30:00"), 4L, "delete", 0.0))
      q.processAllAvailable()
      val updates = spark.table("cdc_out")
      assert(updates.count() == 3L, s"2 first-batch winners + 1 fresh update: ${updates.count()}")
      val snap = StreamCdc.materialize(updates, df.schema)
      val rows = snap.orderBy("user_id")
        .select("user_id", "event_id", "event_type", "value")
        .as[(Long, Long, String, Double)].collect().toSeq
      // user 1 keeps event 2 (the stale 99.0 row never won); user 2's
      // final state is the delete row — the tombstone filter is the
      // caller's downstream choice, like the batch form
      assert(rows == Seq((1L, 2L, "upsert", 20.0), (2L, 4L, "delete", 0.0)), rows)
      // microsecond timestamps survive the payload JSON round-trip
      val mts = snap.where("user_id = 1").selectExpr("unix_micros(ts)")
        .as[Long].head()
      assert(mts == ts("2024-01-01 10:05:00").getTime * 1000L, s"micros: $mts")
    } finally q.stop()
  }

  test("streaming CDC: fractional order columns are rejected") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Long)]
    val df = input.toDF().toDF("k", "score", "id")
    intercept[IllegalArgumentException] {
      graft.streaming.StreamCdc.latestState(df, "k", "score", "id")
    }
  }

  test("transformWithState top-k: standings persist and merge across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val df = input.toDF().toDF("key", "id", "score")
    val snaps = graft.streaming.StreamTopK.topKPerKey(
      df, "key", "id", "score", k = 2)
    graft.streaming.StreamPipeline.withRocksDbStateStore(spark) {
      val q = snaps.toDF().writeStream.outputMode("append")
        .format("memory").queryName("topk_out").start()
      try {
        // batch 1: a's top-2 = (30, 20); b seeds with 5
        input.addData(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L),
          ("b", 4L, 5L))
        q.processAllAvailable()
        // batch 2: 25 displaces 20; an equal-score tie (id 6 vs 2)
        // breaks to the smaller id; b unchanged by a lower score
        input.addData(("a", 5L, 25L), ("a", 6L, 30L), ("b", 7L, 3L))
        q.processAllAvailable()
        val all = spark.table("topk_out")
          .as[graft.streaming.StreamTopK.Snapshot].collect()
        val finalA = all.filter(_.key == "a")
        val vmax = finalA.map(_.version).max
        val standings = finalA.filter(_.version == vmax)
          .sortBy(_.rank).map(r => (r.rank, r.id, r.score)).toSeq
        assert(standings == Seq((1, 2L, 30L), (2, 6L, 30L)),
          s"got $standings")
        // version counts batches in which the key appeared
        assert(vmax == 2L)
        val finalB = all.filter(r => r.key == "b" && r.version == 2L)
          .map(r => (r.rank, r.id, r.score)).toSeq
        assert(finalB == Seq((1, 4L, 5L), (2, 7L, 3L)), s"got $finalB")
      } finally q.stop()
    }
  }
}
