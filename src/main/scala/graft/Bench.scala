package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A `noop`-format write
  * forces full plan execution (a bare `count()` would let Catalyst
  * collapse narrow plans to metadata-only scans).
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3); the
  * reported per-query number and the total are the MEDIAN run, with the
  * first (cold) run kept in a separate `cold` map. A single cold run
  * measures per-query JIT/codegen, not the plan: round-3 cold numbers
  * overstated steady state by up to 12x (q29 15.0s cold vs 0.85s warm),
  * which made round-over-round comparison meaningless.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    // warm the JVM once with a representative mini-plan (vectorized
    // parquet read, codegen, broadcast join, hash agg) so the first
    // measured query doesn't pay one-time JIT/codegen costs
    locally {
      import org.apache.spark.sql.functions._
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1))).collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_quantity") > 49).agg(sum(col("l_extendedprice")
          .cast("decimal(18,2)"))).collect()
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // optional comma-separated query filter for local timing iteration
    // (the driver always runs with no args → full suite)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(',').toSet) else None
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var ok = true
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            ok = false
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // release projections a query opted into persisting (the
        // registerPersisted queue) so cached blocks never accumulate
        // across the suite — outside the timed region deliberately:
        // a real pipeline materializes once and releases after, so
        // the measured time reads the cache like production would
        graft.ops.Robust.unpersistPersisted()
        dt
      }
      (name, median(times), times.head, ok)
    }
    def jmap(f: ((String, Double, Double, Boolean)) => Double): String =
      results.map(r => "\"" + r._1 + "\":" + f"${f(r)}%.3f").mkString("{", ",", "}")
    // Reference-parity baseline workload (BASELINE.md): the 1M-record
    // NDJSON file→file pass-through — the reference's ONLY published
    // end-to-end number (7.319 s, 137k rec/s, single core) — run
    // through the same Pipeline path as the CLI. Input is generated
    // once (deterministic, ~45 B/record ≈ the RFC's 39 MB corpus);
    // the reported time is the MIN of two runs (same contended-box
    // methodology as the quiet bench). Skipped under a query filter
    // (local iteration; force with SPARK_GRAFT_BENCH_TRANSFER=1) or
    // SPARK_GRAFT_BENCH_TRANSFER=0.
    val transferEnv = sys.env.get("SPARK_GRAFT_BENCH_TRANSFER")
    val benchPipelines =
      !(transferEnv.contains("0") ||
        (only.isDefined && !transferEnv.contains("1")))
    val nRec = 1000000
    def transferInput(): java.nio.file.Path = {
      val dir = java.nio.file.Paths.get("target/bench_transfer")
      java.nio.file.Files.createDirectories(dir)
      val in = dir.resolve("in.json")
      if (!java.nio.file.Files.exists(in)) {
        val w = new java.io.BufferedWriter(
          new java.io.FileWriter(in.toFile), 1 << 20)
        var i = 0
        while (i < nRec) {
          w.write(s"""{"id":$i,"name":"user_${i % 100000}","age":${18 + i % 60}}""")
          w.write("\n")
          i += 1
        }
        w.close()
      }
      in
    }
    val transferJson: String =
      if (!benchPipelines) ""
      else {
        val in = transferInput()
        val dir = in.getParent
        val times = (0 until 2).map { r =>
          val out = dir.resolve(s"out$r").toString
          val t0 = System.nanoTime()
          graft.pipeline.Pipeline.run(spark, graft.pipeline.Pipeline.Spec(
            from = "FILE", to = Seq("FILE"),
            env = Map("FILE__SOURCE_URI" -> in.toString,
              "FILE__DESTINATION_URI" -> out)))
          (System.nanoTime() - t0) / 1e9
        }
        val sec = times.min
        f""","transfer":{"rows":$nRec,"sec":$sec%.3f,""" +
          s""""rec_per_sec":${(nRec / sec).toInt}}"""
      }
    // MultiSinkPipeline (D5) timed entry (round-13 verdict item 7):
    // the same 1M-record NDJSON input through persist-once → count →
    // TWO format-divergent file sinks (NDJSON + headered CSV) in one
    // Pipeline.run. The contract under test at scale: the source is
    // read and transformed ONCE (MEMORY_AND_DISK persist), each sink
    // pays only its own format/write cost — vs re-running the plan
    // per sink. min-of-2, same methodology as `transfer`.
    val multisinkJson: String =
      if (!benchPipelines) ""
      else {
        val in = transferInput()
        val dir = in.getParent
        val times = (0 until 2).map { r =>
          val t0 = System.nanoTime()
          graft.pipeline.Pipeline.run(spark, graft.pipeline.Pipeline.Spec(
            from = "FILE", to = Seq("FILE", "OSS"),
            env = Map("FILE__SOURCE_URI" -> in.toString,
              "FILE__DESTINATION_URI" -> dir.resolve(s"msink_json$r").toString,
              "OSS__DESTINATION_URI" ->
                (dir.resolve(s"msink_csv$r").toString + ".csv"))))
          (System.nanoTime() - t0) / 1e9
        }
        val sec = times.min
        f""","multisink":{"rows":$nRec,"sinks":2,"sec":$sec%.3f,""" +
          s""""rec_per_sec":${(nRec / sec).toInt}}"""
      }
    // Grouped/templated file write (D17) timed entry (round-14 verdict
    // item 7): the reference's flagship sink behavior — per-record
    // destination FILENAMES — under volume. 1M NDJSON records route to
    // 16 exact destination files via `[[ mod .id 16 ]]`; the Spark
    // shape under test is one repartition(dest) + partitionBy write +
    // finalize rename (the reference keeps a writer map per key,
    // group_writer.go) — per-key writer maps are exactly the kind of
    // thing that only misbehaves at row counts, not in a 3-row spec.
    // min-of-2, same methodology as `transfer`.
    val groupedJson: String =
      if (!benchPipelines) ""
      else {
        val in = transferInput()
        val dir = in.getParent
        val times = (0 until 2).map { r =>
          val out = dir.resolve(s"grouped$r").toString
          val t0 = System.nanoTime()
          graft.pipeline.Pipeline.run(spark, graft.pipeline.Pipeline.Spec(
            from = "FILE", to = Seq("FILE"),
            env = Map("FILE__SOURCE_URI" -> in.toString,
              "FILE__DESTINATION_URI" ->
                s"$out/dest_[[ mod .id 16 ]].json")))
          val dt = (System.nanoTime() - t0) / 1e9
          // verify EVERY run (listFiles is null on a missing dir —
          // that must surface as the count message, not an NPE)
          val nOuts = Option(new java.io.File(out)
            .listFiles(f => f.getName.matches("dest_\\d+\\.json")))
            .map(_.length).getOrElse(0)
          require(nOuts == 16,
            s"grouped write run $r produced $nOuts files, want 16")
          dt
        }
        val sec = times.min
        f""","grouped":{"rows":$nRec,"files":16,"sec":$sec%.3f,""" +
          s""""rec_per_sec":${(nRec / sec).toInt}}"""
      }
    // Archive/compress post-pass (D22) timed entry (round-15 verdict
    // item 7): zip + tar.gz assembly of the grouped entry's 16-file
    // 1M-row NDJSON output (~60 MB) through the same streaming
    // archive writers the sink post-pass uses — driver-side archive
    // assembly is the kind of thing that only misbehaves at volume,
    // and it was correctness-covered but never measured. min-of-2
    // per format, entry count validated on EVERY run.
    val archiveJson: String =
      if (!benchPipelines) ""
      else {
        val dir = transferInput().getParent
        val srcs = Option(new java.io.File(dir.resolve("grouped0").toString)
          .listFiles((f: java.io.File) => f.getName.matches("dest_\\d+\\.json")))
          .getOrElse(Array.empty[java.io.File]).map(_.toString).sorted.toSeq
        require(srcs.length == 16,
          s"archive input: ${srcs.length} grouped files, want 16")
        def zipEntries(p: String): Int = {
          val zf = new java.util.zip.ZipFile(p)
          try zf.size() finally zf.close()
        }
        def tgzEntries(p: String): Int = {
          val tin = new org.apache.commons.compress.archivers.tar
            .TarArchiveInputStream(new java.util.zip.GZIPInputStream(
              new java.io.FileInputStream(p)))
          try {
            var n = 0
            while (tin.getNextEntry != null) n += 1
            n
          } finally tin.close()
        }
        def timed(ext: String, entries: String => Int): Double =
          (0 until 2).map { r =>
            val dest = dir.resolve(s"arch$r.$ext").toString
            val t0 = System.nanoTime()
            graft.sinks.Archive.archive(srcs, dest)
            val dt = (System.nanoTime() - t0) / 1e9
            require(entries(dest) == 16,
              s"archive $ext run $r entry count != 16")
            dt
          }.min
        val zipSec = timed("zip", zipEntries)
        val tgzSec = timed("tar.gz", tgzEntries)
        f""","archive":{"rows":$nRec,"files":16,""" +
          f""""zip_sec":$zipSec%.3f,"tgz_sec":$tgzSec%.3f}"""
      }
    // jq number render (D9) timed entry (round-16 verdict item 2): the
    // compiled JqNumberString kernel under volume — 1M doubles through
    // BOTH render call sites (tojson + interpolation) in one compiled
    // jq plan. Half the rows are short-digit "price" doubles (the fast
    // spacing-pruned path), half full-17-digit-mantissa ratios (the
    // tie-selection path) — no suite query routes a double through the
    // render at runtime, so this entry is its only volume number.
    // min-of-2, same methodology as `transfer`.
    val renderJson: String =
      if (!benchPipelines) ""
      else {
        val in = spark.range(nRec).selectExpr("id",
          "CASE WHEN id % 2 = 0 THEN (id % 1000000) / 100.0 " +
            "ELSE (id - 500000.0) / (id + 7.0) END AS d")
        val prog = "{id, t: (.d | tojson), s: \"v=\\(.d)\"}"
        val sec = (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          graft.transform.Jq.compile(prog)(in)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        f""","render":{"rows":$nRec,"sec":$sec%.3f,""" +
          s""""rec_per_sec":${(nRec / sec).toInt},""" +
          s""""ns_per_row":${(sec * 1e9 / nRec).toInt}}"""
      }
    // jq ESCAPE HATCH timed entry (round-17 verdict item 5): every
    // reject-toward-the-hatch decision trades silent divergence for a
    // per-partition jq subprocess — this entry records what that
    // fallback costs at volume, the number that justifies the compile-
    // coverage program. Same 1M-row {id, t, s} shape as `render`, so
    // the compiled-vs-hatch ratio is a recorded fact (the reference's
    // own processor IS this path: ext/jq/connector.go:101-127 pipes
    // every record through the binary). min-of-2.
    val hatchJson: String =
      if (!benchPipelines) ""
      else {
        val in = spark.range(nRec).selectExpr("id",
          "CASE WHEN id % 2 = 0 THEN (id % 1000000) / 100.0 " +
            "ELSE (id - 500000.0) / (id + 7.0) END AS d")
        val prog = "{id, t: (.d | tojson), s: \"v=\\(.d)\"}"
        val sec = (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          graft.transform.JqEscapeHatch.rawApply(in.toJSON, prog)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        f""","hatch":{"rows":$nRec,"sec":$sec%.3f,""" +
          s""""rec_per_sec":${(nRec / sec).toInt},""" +
          s""""ns_per_row":${(sec * 1e9 / nRec).toInt}}"""
      }
    // HTTP batch sink (K9) timed entry (round-17 verdict item 6): the
    // partition-sink family's first volume number. 1M records against
    // an in-process JDK HttpServer, one endpoint, batch=512 like the
    // reference's K9 (ext/http/sink.go) — bounds the per-record
    // connector overhead (serialize → group → batch → POST). The
    // constant endpoint makes the writer a single task, exactly the
    // reference's serial batch-per-request shape; endpoint-templated
    // fan-out parallelism is the `grouped` entry's concern. Row count
    // validated server-side on every run. min-of-2.
    val httpsinkJson: String =
      if (!benchPipelines) ""
      else {
        val in = transferInput()
        val df = spark.read.json(in.toString)
        val received = new java.util.concurrent.atomic.AtomicLong(0)
        val requests = new java.util.concurrent.atomic.AtomicLong(0)
        val srv = com.sun.net.httpserver.HttpServer.create(
          new java.net.InetSocketAddress("127.0.0.1", 0), 0)
        srv.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          received.addAndGet(body.linesIterator.size.toLong)
          requests.incrementAndGet()
          ex.sendResponseHeaders(200, -1)
          ex.close()
        })
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        srv.setExecutor(pool)
        srv.start()
        try {
          val url = s"http://127.0.0.1:${srv.getAddress.getPort}/ingest"
          val factory = new graft.sources.Http.SinkClientFactory(
            doer = new graft.sources.Http.JdkHttpDoer())
          val sec = (0 until 2).map { r =>
            received.set(0); requests.set(0)
            val t0 = System.nanoTime()
            graft.sinks.PartitionSinks.writeGrouped(df, url, factory,
              batchSize = 512)
            val dt = (System.nanoTime() - t0) / 1e9
            require(received.get() == nRec,
              s"httpsink run $r: server saw ${received.get()} of $nRec records")
            dt
          }.min
          f""","httpsink":{"rows":$nRec,"batch":512,""" +
            s""""requests":${requests.get()},""" +
            f""""sec":$sec%.3f,"rec_per_sec":${(nRec / sec).toInt}}"""
        } finally {
          srv.stop(0)
          // the server pool's non-daemon threads would otherwise keep
          // the forked JVM alive after main returns
          pool.shutdownNow()
        }
      }
    // XLSX writer (D21) timed entry (round-16 verdict item 7): the
    // last never-measured sink post-pass. Single-partition BY DESIGN —
    // OOXML is one sequential zip stream, so the writer drains
    // toLocalIterator on the driver exactly like the reference's
    // converter drains its record channel; the entry bounds that
    // driver-side cost at volume. 1M rows × 3 cols; min-of-2, row
    // count validated on every run by streaming the sheet XML back.
    val xlsxJson: String =
      if (!benchPipelines) ""
      else {
        val in = transferInput()
        val dir = in.getParent
        val df = spark.read.json(in.toString)
        def sheetRows(p: String): Long = {
          val zf = new java.util.zip.ZipFile(p)
          try {
            val is = zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml"))
            val buf = new Array[Byte](1 << 16)
            var rows = 0L
            var carry = 0 // matched prefix of "</row>" across chunk edges
            val pat = "</row>".getBytes
            var n = is.read(buf)
            while (n > 0) {
              var i = 0
              while (i < n) {
                carry = if (buf(i) == pat(carry)) carry + 1 else if (buf(i) == pat(0)) 1 else 0
                if (carry == pat.length) { rows += 1; carry = 0 }
                i += 1
              }
              n = is.read(buf)
            }
            rows
          } finally zf.close()
        }
        val sec = (0 until 2).map { r =>
          val dest = dir.resolve(s"bench$r.xlsx").toString
          val t0 = System.nanoTime()
          graft.sinks.Xlsx.writeDataFrame(df, dest)
          val dt = (System.nanoTime() - t0) / 1e9
          require(sheetRows(dest) == nRec + 1, // +1 header row
            s"xlsx run $r sheet row count != ${nRec + 1}")
          dt
        }.min
        f""","xlsx":{"rows":$nRec,"sec":$sec%.3f,""" +
          s""""rec_per_sec":${(nRec / sec).toInt}}"""
      }
    // a query that threw must not fold its (fast-failure) wall time into
    // the headline total — broken must not read as fast round-over-round
    val total = results.filter(_._4).map(_._2).sum
    val failed = results.collect { case (n, _, _, false) => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    // The driver stores only the LAST 2,000 chars of stdout and parses
    // the JSON line out of that tail: the ~9 kB full-map line has had
    // its head (metric/total) truncated away EVERY round since r10
    // (BENCH_r10..r18 parsed:null — the per-query perf contract has
    // been dead for nine rounds). r19 measurement-bug fix (declared in
    // OPTIMIZATION_r19.md): stdout's last line is a COMPACT (<1,800
    // chars incl. sbt's trailing "[success]" line) JSON with the same
    // field names — total, runs, failed, sf, the pipeline-blob
    // entries, and the SLOWEST per-query entries that fit the budget
    // (deterministic: seconds desc, name tie-break), plus
    // n_queries/queries_omitted so truncation is explicit. The FULL
    // per-query + cold maps — the unchanged methodology and the
    // numbers of record — still go to target/bench.json, and the
    // quiet-record tooling keeps consuming that file.
    val full =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","runs":$runs,"failed":$failed,"queries":${jmap(_._2)},"cold":${jmap(_._3)},"sf":"$sfDir"$groupedJson$archiveJson$renderJson$hatchJson$httpsinkJson$xlsxJson$multisinkJson$transferJson}"""
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    val blobs =
      s"""$groupedJson$archiveJson$renderJson$hatchJson$httpsinkJson$xlsxJson$multisinkJson$transferJson"""
    val head =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","runs":$runs,"failed":$failed,"n_queries":${results.length},"full":"target/bench.json","sf":"$sfDir""""
    val lineBudget = 1800
    val fixedLen = head.length + blobs.length +
      s""","queries":{},"queries_omitted":999}""".length + 2
    val bySlowest = results.sortBy(r => (-r._2, r._1))
    val picked = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = fixedLen
    bySlowest.foreach { r =>
      val entry = "\"" + r._1 + "\":" + f"${r._2}%.3f"
      if (used + entry.length + 1 <= lineBudget) {
        picked += entry; used += entry.length + 1
      }
    }
    val json = head +
      s""","queries":${picked.mkString("{", ",", "}")}""" +
      s""","queries_omitted":${results.length - picked.size}""" +
      blobs + "}"
    println(json)
    spark.stop()
  }
}
