package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Measured scale rehearsal (round-8 VERDICT item 2): generate a
  * deterministic corpus at N× the sf0.1 shape and time the headline
  * dedup/ANN/curation chain at 1× and 10×, so the "scales linearly"
  * design notes in SCALE.md are measurements, not arguments.
  *
  * `gen <dir> <scale> [seed]` — writes documents.parquet +
  * embeddings.parquet mirroring the sf0.1 generator's shape: the same
  * 31-word vocabulary, 8–100-word documents, the same language mix,
  * ~8 exact-dup groups and ~8 near-dup (1-word-edit) groups per 5000
  * documents, and 64-dim embeddings in 10 labeled Gaussian clusters
  * with ~1% near-identical pairs. Seeded `scala.util.Random` —
  * identical bytes on every run.
  *
  * `run <dir> [runs] [q1,q2,…]` — times the chain on `dir` (median of
  * `runs`, noop-write like Bench) and prints one JSON line. Includes
  * two production-shape ops that are not SparkEntry queries:
  * `p26_minhash_only` (candidate generation without the exact-verify
  * side that q26's oracle contract needs) and relies on
  * q50_dup_components for the LSH→verify→CC production composition —
  * the exact all-pairs forms (q25/q53/q26) are expected to scale
  * super-linearly on this vocabulary and are kept to MEASURE that,
  * with the linear production paths beside them.
  */
object ScaleRehearsal {

  private val vocab = Array("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan",
    "slow", "small", "sort", "spark", "stream", "table", "the", "value",
    "vector", "window")
  private val langs = Array("en", "zh", "es", "fr", "de")

  def gen(spark: SparkSession, dir: String, scale: Int, seed: Long): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val nDocs = 5000 * scale
    val nVecs = 2000 * scale

    val texts = new Array[String](nDocs)
    var i = 0
    while (i < nDocs) {
      val nw = 8 + rnd.nextInt(93)
      val sb = new StringBuilder
      var w = 0
      while (w < nw) {
        if (w > 0) sb += ' '
        sb ++= vocab(rnd.nextInt(vocab.length))
        w += 1
      }
      texts(i) = sb.toString
      i += 1
    }
    // dup structure, proportional to corpus size: exact copies and
    // single-word edits (the near-dup signal the jaccard/minhash chain
    // must find)
    (0 until 8 * scale).foreach { _ =>
      val src = rnd.nextInt(nDocs); val dst = rnd.nextInt(nDocs)
      if (src != dst) texts(dst) = texts(src)
    }
    (0 until 8 * scale).foreach { _ =>
      val src = rnd.nextInt(nDocs); val dst = rnd.nextInt(nDocs)
      val w = texts(src).split(' ')
      if (src != dst && w.length > 3) {
        w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.length))
        texts(dst) = w.mkString(" ")
      }
    }
    val docs = (0 until nDocs).map { id =>
      val lang = { val p = rnd.nextInt(100); if (p < 40) "en" else langs(1 + p % 4) }
      (id.toLong, texts(id), lang, s"src${id % 7}", texts(id).length.toLong)
    }
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(math.max(4, 4 * scale))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val dim = 64
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = new Array[(Long, Array[Float], Int)](nVecs)
    i = 0
    while (i < nVecs) {
      val c = rnd.nextInt(10)
      vecs(i) = (i.toLong,
        centers(c).map(v => (v + 0.3 * rnd.nextGaussian()).toFloat), c)
      i += 1
    }
    // ~1% near-identical pairs — the semDedup/cosine-near-dup signal
    (0 until nVecs / 100).foreach { _ =>
      val src = rnd.nextInt(nVecs); val dst = rnd.nextInt(nVecs)
      if (src != dst)
        vecs(dst) = (vecs(dst)._1,
          vecs(src)._2.map(v => v + 0.001f * rnd.nextGaussian().toFloat),
          vecs(src)._3)
    }
    spark.createDataFrame(vecs.toIndexedSeq).toDF("vec_id", "embedding", "label")
      .repartition(math.max(2, 2 * scale))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** Production-shape extras measured beside the SparkEntry forms. */
  private val prodOps: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p26_minhash_only" -> ((s, dir) =>
      Dedup.minhashCandidates(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        numHashes = 64, bands = 32, shingleSize = 3)),
    // q50's composition with 4-row bands (64 hashes / 16 bands): band
    // false-positive probability drops from j² to j⁴, which is the
    // knob that keeps the verify stage linear on low-entropy corpora
    // where chance band collisions grow quadratically (measured: the
    // 2-row form went 62× at 10× data on the 31-word-vocab corpus)
    "p50_lsh_r4_components" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 3)
      val verified = Dedup.ngramJaccardPairs(
        Dedup.candidateDocs(docs, "doc_id", cands),
        "doc_id", "text", n = 3, threshold = 0.9,
        maxDocFreq = Long.MaxValue)
      Dedup.connectedComponents(verified)
        .groupBy("comp").agg(count(lit(1)).cast("long").as("cluster_size"),
          min(col("id")).as("representative"))
    }),
    // the exact-recall alternative to LSH: prefix-filtered Jaccard
    // self-join at the same τ = 0.9 the p50 verify stage uses — the
    // interesting measurement is the candidate count vs the all-gram
    // bucket path and whether the rarest-first prefixes stay
    // sub-quadratic on THIS low-entropy corpus
    "p170_prefix_jaccard" -> ((s, dir) =>
      Dedup.prefixFilterJaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        n = 3, threshold = 0.9, maxBucket = 100000)),
    // the selectivity knob (the winnowing k-lesson applied to exact
    // joins): longer grams shrink every prefix bucket on low-entropy
    // corpora where trigram dfs grow with N
    "p170_prefix_jaccard_n5" -> ((s, dir) =>
      Dedup.prefixFilterJaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        n = 5, threshold = 0.9, maxBucket = 100000)),
    // winnowing near-dup candidates on the rehearsal corpus: selective
    // 12-gram fingerprints, boilerplate prune, shared-fp pairs
    "p124_winnow_candidates" -> ((s, dir) =>
      Dedup.winnowCandidates(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        k = 12, window = 8, minShared = 3L, maxBucket = 100)),
    // the low-entropy guard knob: same op, maxBucket 20 — on a 31-word
    // vocabulary, 12-gram fingerprints recur across unrelated docs and
    // near-cap buckets expand quadratically; evidence-quality pairs
    // live in SMALL buckets, so tightening the cap restores linearity
    "p124_winnow_mb20" -> ((s, dir) =>
      Dedup.winnowCandidates(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        k = 12, window = 8, minShared = 3L, maxBucket = 20)),
    // recall contract for the tightened cap: every EXACT-dup pair
    // (identical text ⇒ identical fingerprints) must still surface as
    // a candidate — the pairs the cap may drop are cross-doc
    // boilerplate, not duplicates
    "p124_winnow_recall" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val dg = docs.select(col("doc_id"), md5(col("text")).as("dg"))
      val pairs = dg.as("a").join(dg.as("b"), "dg")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val tight = Dedup.winnowCandidates(docs, "doc_id", "text",
        k = 12, window = 8, minShared = 3L, maxBucket = 20)
      pairs.join(tight, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("missed_exact_pairs"))
    }))

  private val defaultChain = Seq(
    "q20_dedup_exact", "q77_incremental_dedup",
    "p26_minhash_only", "q50_dup_components",
    "q25_ngram_jaccard", "q26_minhash_candidates", "q53_jaccard_components",
    "q61_corpus_pipeline", "q66_pack_sequences", "q74_semdedup",
    "q76_quality_buckets", "q78_token_budget", "q81_curation_pipeline")

  private def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    args.toList match {
      case "gen" :: dir :: scale :: rest =>
        gen(spark, dir, scale.toInt, rest.headOption.map(_.toLong).getOrElse(42L))
        println(s"""{"gen":"$dir","scale":$scale}""")
      case "ivf" :: dir :: rest =>
        // IVF nprobe/recall×time rehearsal (round-10 VERDICT item 7):
        // ground truth = exact brute-force cosine top-k per query;
        // recall@k = |IVF ∩ brute| / k averaged over the query set.
        // Deterministic: fixed query ids, seeded index fit.
        val k = rest.headOption.map(_.toInt).getOrElse(10)
        val nQ = rest.drop(1).headOption.map(_.toInt).getOrElse(20)
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val n = emb.count()
        val qIds = (0 until nQ).map(i => i.toLong * (n / nQ))
        val queries = emb.filter(col("vec_id").isin(qIds: _*))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
        import graft.ops.Similarity
        val index = Similarity.IvfIndex.fit(emb, "v", cells = 64)
        // the truncation lives in the op now (round-11): repeated
        // probing goes through assignForProbing, which checkpoints
        // the cell column and cuts the cells×dim argmin lineage
        val assigned = index.assignForProbing(emb, "v")
        def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
          df.select(col("vec_id")).collect().map(_.getLong(0)).toSet
        val t0 = System.nanoTime()
        val truth = queries.map { case (qid, qv) =>
          qid -> topIds(Similarity.cosineTopK(emb, "vec_id", "v", qv, k))
        }.toMap
        val bruteSec = (System.nanoTime() - t0) / 1e9
        val rows = Seq(1, 2, 4, 8).map { nprobe =>
          val t1 = System.nanoTime()
          val hits = queries.map { case (qid, qv) =>
            topIds(Similarity.ivfTopK(index, assigned, "vec_id", "v",
              qv, k, nprobe)).intersect(truth(qid)).size
          }.sum
          val sec = (System.nanoTime() - t1) / 1e9
          val recall = hits.toDouble / (queries.length * k)
          f""""np$nprobe":{"recall":$recall%.4f,"sec":$sec%.2f}"""
        }
        println(s"""{"dir":"$dir","n":$n,"k":$k,"queries":${queries.length},""" +
          f""""brute_sec":$bruteSec%.2f,""" + rows.mkString(",") + "}")
      case "ivfbatch" :: dir :: rest =>
        // Batch-probe rehearsal (round-12): ivfSearchBatch (one pass
        // over the probed-cell union, per-query heaps) vs the
        // per-query ivfTopK LOOP (Q separate jobs) on the SAME pinned
        // assignment — results must be identical sets; the readout is
        // wall-clock shape vs Q and corpus size.
        val k = rest.headOption.map(_.toInt).getOrElse(10)
        val nQ = rest.drop(1).headOption.map(_.toInt).getOrElse(20)
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val n = emb.count()
        val qIds = (0 until nQ).map(i => i.toLong * (n / nQ))
        val queriesDf = emb.filter(col("vec_id").isin(qIds: _*))
        val queries = queriesDf.collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1)))
        import graft.ops.Similarity
        val index = Similarity.IvfIndex.fit(emb, "v", cells = 64)
        val assigned = index.assignForProbing(emb, "v")
        val t0 = System.nanoTime()
        val loop = queries.map { case (qid, qv) =>
          qid -> Similarity.ivfTopK(index, assigned, "vec_id", "v",
            qv, k, nprobe = 4).select(col("vec_id"))
            .collect().map(_.getLong(0)).toSet
        }.toMap
        val loopSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val batch = Similarity.ivfSearchBatch(index, emb, "vec_id", "v",
          queriesDf, k, nprobe = 4, preAssigned = Some(assigned))
          .select(col("query_id"), col("corpus_id")).collect()
          .groupBy(_.getLong(0)).map { case (q, rs) =>
            q -> rs.map(_.getLong(1)).toSet }
        val batchSec = (System.nanoTime() - t1) / 1e9
        val identical = queries.forall { case (qid, _) =>
          batch.getOrElse(qid, Set.empty) == loop(qid) }
        println(s"""{"dir":"$dir","n":$n,"k":$k,"queries":${queries.length},""" +
          f""""loop_sec":$loopSec%.2f,"batch_sec":$batchSec%.2f,""" +
          s""""identical":$identical}""")

      case "statestore" :: dir :: rest =>
        // State-store provider rehearsal (round-10): the q83-shaped
        // marker-state dedup (flatMapGroupsWithState, one marker per
        // distinct key) driven through `batches` micro-batches of
        // fresh keys, timed under the default HDFS-backed provider vs
        // RocksDB + changelog checkpointing. The claim under test
        // (StreamPipeline.RocksDbConfs): the HDFS provider keeps all
        // state on-heap and snapshots the FULL store every commit —
        // cost grows with TOTAL state × batches — while changelog
        // checkpointing uploads only each batch's delta.
        val keys = rest.headOption.map(_.toInt).getOrElse(100000)
        val batches = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
        val in = s"$dir/ss_in_$keys"
        val perBatch = keys / batches
        org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(in), true)
        (0 until batches).foreach { b =>
          spark.range(b.toLong * perBatch, (b + 1L) * perBatch)
            .select(col("id").as("doc_id"),
              concat(lit("payload_"), col("id")).as("text"))
            .coalesce(1).write.mode("append").parquet(in)
        }
        val schema = spark.read.parquet(in).schema
        val seen = graft.ops.Dedup.digests(
          spark.range(1).select(lit(-1L).as("doc_id"),
            lit("never_matches").as("text")), Seq("text"))
        def timeRun(tag: String): Double = {
          val ckpt = s"$dir/ss_ckpt_${keys}_$tag"
          org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(ckpt), true)
          val t0 = System.nanoTime()
          val stream = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(in)
          val kept = graft.streaming.StreamDedup.dedupAgainstIndex(
            stream, seen, Seq("text"), "doc_id")
          val q = kept.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          (System.nanoTime() - t0) / 1e9
        }
        val hdfsSec = timeRun("hdfs")
        val rocksSec = graft.streaming.StreamPipeline
          .withRocksDbStateStore(spark)(timeRun("rocks"))
        println(f"""{"keys":$keys,"batches":$batches,""" +
          f""""hdfs_sec":$hdfsSec%.2f,"rocks_sec":$rocksSec%.2f}""")
      case "tws" :: dir :: rest =>
        // transformWithState state-scale rehearsal (round-12 VERDICT
        // directive 6): q259's oracle run exercises thousands of
        // keys; this drives StreamTopK.topKPerKey at production key
        // cardinality (default 10⁶) through withAutoStateStore and
        // records measured input rows/s plus the state store's OWN
        // metrics (numRowsTotal, memory/SST bytes) from the final
        // StreamingQueryProgress — the evidence behind the provider
        // rule of thumb for the new API (the round-10 break-even
        // table predates transformWithState, which REQUIRES RocksDB;
        // what's under test is that the topology holds at 10⁶ keys
        // and what a key costs).
        val keys = rest.headOption.map(_.toInt).getOrElse(1000000)
        val batches = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
        val k = rest.drop(2).headOption.map(_.toInt).getOrElse(4)
        val rowsPerKey = 3
        val in = s"$dir/tws_in_${keys}"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(in), true)
        val total = keys.toLong * rowsPerKey
        val perBatch = total / batches
        // every key appears in rowsPerKey distinct batches (xxhash64
        // spreads (row, key) pairs deterministically), so state is
        // touched incrementally like a real ingest, not loaded once
        (0 until batches).foreach { b =>
          spark.range(total)
            .select(pmod(col("id"), lit(keys.toLong)).as("key_num"),
              col("id").as("ev_id"),
              pmod(xxhash64(col("id"), lit(7)), lit(1000000L)).as("score"))
            .filter(pmod(xxhash64(col("id"), lit(13)), lit(batches.toLong))
              === b)
            .select(concat(lit("k"), col("key_num")).as("lang"),
              col("ev_id"), col("score"))
            .coalesce(4).write.mode("append").parquet(in)
        }
        val schema = spark.read.parquet(in).schema
        val ckpt = s"$dir/tws_ckpt_$keys"
        fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
        // withRocksDbStateStore, NOT withAutoStateStore: the topology
        // dictates the provider here — transformWithState needs column
        // families, which only RocksDB has (the auto helper's HDFS
        // branch crashes under it; measured in this rehearsal's own
        // smoke at 20k keys). The break-even heuristic only applies to
        // provider-agnostic stateful ops.
        val (sec, lastProgress) =
          graft.streaming.StreamPipeline.withRocksDbStateStore(spark) {
            val t0 = System.nanoTime()
            val stream = spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4).parquet(in)
            val snaps = graft.streaming.StreamTopK.topKPerKey(
              stream, "lang", "ev_id", "score", k)
            val q = snaps.writeStream.format("noop")
              .option("checkpointLocation", ckpt)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
            // the trailing no-data commit can report an empty batch —
            // the state totals we want are the largest seen
            ((System.nanoTime() - t0) / 1e9,
              q.recentProgress.flatMap(_.stateOperators)
                .sortBy(_.numRowsTotal).lastOption)
          }
        val stateOp = lastProgress
        val stateRows = stateOp.map(_.numRowsTotal).getOrElse(-1L)
        val stateMem = stateOp.map(_.memoryUsedBytes).getOrElse(-1L)
        val sst = stateOp.flatMap(op =>
          Option(op.customMetrics.get("rocksdbSstFileSize"))).getOrElse(-1L)
        println(f"""{"keys":$keys,"batches":$batches,"k":$k,""" +
          f""""input_rows":$total,"sec":$sec%.2f,""" +
          f""""rows_per_sec":${(total / sec).toLong},""" +
          f""""state_rows":$stateRows,"state_mem_bytes":$stateMem,""" +
          f""""rocksdb_sst_bytes":$sst}""")
      case "run" :: dir :: rest =>
        val runs = rest.headOption.map(_.toInt).getOrElse(1)
        val names = rest.drop(1).headOption
          .map(_.split(',').toSeq).getOrElse(defaultChain)
        val results = names.map { name =>
          val fn = prodOps.getOrElse(name, SparkEntry.queries(name))
          val times = (0 until runs).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          name -> median(times)
        }
        println(results.map { case (n, t) => "\"" + n + "\":" + f"$t%.3f" }
          .mkString(s"""{"dir":"$dir","runs":$runs,"times":{""", ",", "}}"))
      case other => sys.error(s"usage: gen <dir> <scale> [seed] | run <dir> [runs] [names]; got $other")
    }
    spark.stop()
  }
}
