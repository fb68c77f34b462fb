package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Meta
import graft.ops.{Basket, Bpe, Cdc, Concentration, CorpusStats, Curation, Dedup, Eval, Events, Graph, JoinReduce, KMeans, Linkage, Ordinal, Pack, Privacy, Profile, Quality, Rank, Robust, Sample, Similarity, Skew, TextOps, TimeSeries}
import graft.transform.{Jq, Template}

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 + the LLM-pipeline extensions), each with DuckDB oracle
  * SQL where SQL-expressible.
  *
  * Engine-parity rules used throughout (Spark vs DuckDB must hash-match):
  *  - sums of doubles go through DECIMAL(18,2) (exact, order-independent)
  *    and are cast back to double only at the end;
  *  - double literals in oracle SQL use `e0` notation (DuckDB's bare
  *    decimals are DECIMAL-typed, which would change arithmetic);
  *  - double→long casts only on integral values (DuckDB rounds, Spark
  *    truncates);
  *  - integer aggregates are cast to BIGINT on both sides;
  *  - every query is deterministically ordered with full tie-breaks.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s) // idempotent, cheap
    s.read.parquet(s"$dir/$n.parquet")
  }

  /** events.parquet has shipped `ts` two ways across driver testdata
    * generations: TIMESTAMP(NANOS) (read as a nanos-since-epoch long
    * under spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
    * without UTC adjustment (read as TIMESTAMP_NTZ). Normalize both to
    * a session-zone microsecond TIMESTAMP — all entrypoints pin the
    * session zone to UTC, so the NTZ cast is value-preserving and
    * matches DuckDB's naive reading of the same file.
    */
  private def events(s: SparkSession, dir: String): DataFrame =
    normTs(t(s, dir, "events"))

  private def normTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Streaming reader for a driver-generated parquet table — the one
    * place the layout branch lives: a directory-shaped table (part-*
    * leaves inside) streams from its own path (FileStreamSource needs
    * a directory basePath); a single-file layout instead globs the
    * leaf name from the parent, because the glob alone silently reads
    * ZERO rows from a directory layout (part-* leaves don't match the
    * table name). Long `ts` columns get the same nanos→micros
    * normalization as [[events]].
    */
  private def streamT(s: SparkSession, dir: String, n: String): DataFrame = {
    val raw = t(s, dir, n)
    val tablePath = s"$dir/$n.parquet"
    val isDir = new java.io.File(tablePath.stripPrefix("file:")).isDirectory
    val reader = s.readStream.schema(raw.schema)
    val s0 =
      if (isDir) reader.parquet(tablePath)
      else reader.option("pathGlobFilter", s"$n.parquet").parquet(dir)
    normTs(s0)
  }

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------------
  // Oracle SQL builders shared with TextOps (single source of truth for
  // the arithmetic formulas so Spark and DuckDB stay in lockstep).
  // ------------------------------------------------------------------

  private def sqlWordHits(textExpr: String, w: String): String = {
    // Space-doubling makes the count EXACT: adjacent occurrences
    // ("the the") cannot share a boundary space, so non-overlapping
    // REPLACE matching counts every space-delimited token equal to w —
    // the same value the compiled WordHits kernel produces Spark-side.
    val pad = s"(' ' || REPLACE($textExpr, ' ', '  ') || ' ')"
    s"CAST((LENGTH($pad) - LENGTH(REPLACE($pad, ' $w ', ' '))) / ${w.length + 1} AS BIGINT)"
  }

  private def sqlTokenCount(textExpr: String): String =
    s"CAST(LENGTH($textExpr) - LENGTH(REPLACE($textExpr, ' ', '')) + 1 AS BIGINT)"

  private def sqlPunctCount(textExpr: String): String =
    s"CAST(LENGTH($textExpr) - LENGTH(REGEXP_REPLACE($textExpr, '[.,;:!?]', '', 'g')) AS BIGINT)"

  private def sqlStopwordHits(textExpr: String): String =
    TextOps.DefaultStopwords.map(w => sqlWordHits(textExpr, w)).mkString("(", " + ", ")")

  private def sqlQuality(textExpr: String): String = {
    val nTok = s"CAST(${sqlTokenCount(textExpr)} AS DOUBLE)"
    val nChar = s"CAST(LENGTH($textExpr) AS DOUBLE)"
    val avgTokLen = s"(($nChar - ($nTok - 1e0)) / $nTok)"
    val stopRatio = s"(CAST(${sqlStopwordHits(textExpr)} AS DOUBLE) / $nTok)"
    val punctRatio = s"(CAST(${sqlPunctCount(textExpr)} AS DOUBLE) / $nChar)"
    val lenScore = s"(CASE WHEN $nTok BETWEEN 5e0 AND 100000e0 THEN 1e0 ELSE 0e0 END)"
    val tokScore = s"(CASE WHEN $avgTokLen BETWEEN 2e0 AND 12e0 THEN 1e0 ELSE 0e0 END)"
    val stopScore = s"(CASE WHEN $stopRatio > 0.01e0 THEN 1e0 ELSE 0e0 END)"
    val punctScore = s"(CASE WHEN $punctRatio < 0.2e0 THEN 1e0 ELSE 0e0 END)"
    s"ROUND($lenScore * 0.25e0 + $tokScore * 0.25e0 + $stopScore * 0.25e0 + $punctScore * 0.25e0, 2)"
  }

  private def sqlLangId(textExpr: String): String = {
    val n = TextOps.LangMarkers.size
    val encs = TextOps.LangMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      val score = markers.map(w => sqlWordHits(textExpr, w)).mkString("(", " + ", ")")
      (s"($score * 8 + ${n - 1 - i})", lang)
    }
    val best = encs.map(_._1).mkString("GREATEST(", ", ", ")")
    encs.foldLeft("'und'") { case (acc, (enc, lang)) =>
      s"(CASE WHEN $enc = $best THEN '$lang' ELSE $acc END)"
    }
  }

  // 3-gram (word) shingle set, DuckDB side: tokens[i:i+2] is 1-based
  // inclusive slicing → 3 tokens starting at i.
  private def sqlShingles(n: Int): String =
    s"""SELECT DISTINCT doc_id, array_to_string(tokens[i:i+${n - 1}], ' ') AS gram
       |FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
       |     UNNEST(range(1, len(tokens) - ${n - 2})) AS t(i)""".stripMargin

  // ------------------------------------------------------------------
  // Queries
  // ------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core -------------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_filter_project" -> ((s, dir) => {
      // jq-class projection + predicate; filter/pruning push to the scan
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < lit(0.05))
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q03_top_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q04_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    "q05_nation_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    "q06_forecast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(lit(0.05), lit(0.07)) &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    "q07_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "q08_running_total" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q09_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    "q10_union" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val b = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      a.unionAll(b).groupBy("custkey").agg(count(lit(1)).as("n"))
        .orderBy("custkey")
    }),

    "q11_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q12_case_agg" -> ((s, dir) =>
      t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).cast("long").as("high_prio"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).cast("long").as("low_prio"))
        .orderBy("o_orderstatus")),

    "q13_monthly_revenue" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("month")),

    "q14_string_funcs" -> ((s, dir) =>
      t(s, dir, "part").groupBy("p_brand")
        .agg(
          min(upper(col("p_name"))).as("first_name_upper"),
          max(length(col("p_name")).cast("long")).as("max_name_len"),
          count(when(col("p_name").startsWith("red"), 1)).as("n_red"))
        .orderBy("p_brand")),

    "q15_having" -> ((s, dir) =>
      t(s, dir, "part").groupBy("p_type")
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("total_price"))
        .filter(col("n") > 50)
        .orderBy("p_type")),

    "q16_below_avg" -> ((s, dir) => {
      // the reference's "pre-query merge": a small aggregate joined into
      // every data record (ext/maxcompute/source.go:226-230) — here as a
      // broadcast join per part key (Q17 shape)
      val l = t(s, dir, "lineitem")
      val avgQ = l.groupBy(col("l_partkey").as("ap"))
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
      l.join(broadcast(avgQ), l("l_partkey") === avgQ("ap"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(dsum(col("l_extendedprice")).as("total_price"),
          count(lit(1)).as("n_lines"))
    }),

    "q17_explode_words" -> ((s, dir) =>
      // jq `.[]` iteration shape: 1 input → N outputs
      t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy("word")),

    "q18_json_extract" -> ((s, dir) =>
      // JSONPath selector (D11) over the events.props JSON column
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).cast("long").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")),

    "q19_record_index" -> ((s, dir) => {
      // __METADATA__record_index + connector_batch_index stamping
      // (reference source.go:86-91, connector.go:90-91; batch size 64)
      // scale form: range-partition + zipWithIndex (no global window)
      val df = Meta.withRecordIndexDistributed(
        t(s, dir, "documents"), Seq(col("doc_id")))
      Meta.withBatchIndex(df, 64)
        .select(col("doc_id"), col(Meta.RecordIndexCol), col(Meta.BatchIndexCol))
        .orderBy("doc_id")
    }),

    "q20_dedup_exact" -> ((s, dir) =>
      // exact dedup: keep smallest doc_id per md5(text)
      Dedup.exact(t(s, dir, "documents"), Seq("text"), "doc_id")
        .select("doc_id", "lang", "source").orderBy("doc_id")),

    "q21_dup_groups" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
        .filter(col("n") >= 1)
        .orderBy("h")),

    "q22_token_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        TextOps.tokenCountArith(col("text")).as("n_tokens"),
        TextOps.punctCount(col("text")).as("n_punct"),
        TextOps.stopwordHits(col("text")).as("n_stopwords"),
        TextOps.subwordCountApprox(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    }),

    "q23_quality_score" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "q24_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "q25_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.2, maxDocFreq = 1000000L)
        .orderBy("id_a", "id_b")),

    "q26_minhash_candidates" -> ((s, dir) => {
      // MinHash-LSH recall contract under the oracle gate: the banding
      // (64 hashes, 32 bands × 2 rows) must recover EVERY pair with
      // exact 3-gram jaccard ≥ 0.9 — band-miss probability is
      // (1 − j²)^32 ≈ 1e-23 at j = 0.9, so on a fixed corpus the
      // candidate set deterministically contains them all. Output =
      // exact high-jaccard pairs ∩ candidates, which equals the full
      // exact pair list (what DuckDB independently computes) iff
      // recall = 1; any miss turns the row into a count mismatch.
      val docs = t(s, dir, "documents")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 32, shingleSize = 3)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.9, maxDocFreq = 1000000L)
        .join(cands, Seq("id_a", "id_b"), "left_semi")
        .orderBy("id_a", "id_b")
    }),

    "q27_simhash_pairs" -> ((s, dir) => {
      // SimHash banding contract: with 8 bands of 8-bit chunks, the
      // pigeonhole guarantee makes the candidate set EXACTLY equal to
      // the brute-force Hamming-≤6 pair set (≤6 flipped bits cannot
      // touch all 8 chunks, and candidates verify full distance).
      // Output = symmetric difference vs the exact pairs — empty iff
      // the banding is complete AND precise; oracle pins empty.
      val docs = t(s, dir, "documents")
      // the per-text simhash kernel is the dominant cost here; compute
      // the signature table ONCE (localCheckpoint — no cache-manager
      // accumulation across bench runs) and feed candidates + both
      // sides of the exact O(N²) verification from it
      val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
        .localCheckpoint()
      val cands = Dedup.simhashCandidatesFromSigs(sigs,
        maxHamming = 6, maxBucket = 1000000)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      val a = sigs.select(col("__id").as("id_a"), col("__sig").as("__sa"))
      val b = sigs.select(col("__id").as("id_b"), col("__sig").as("__sb"))
      val exact = a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.hamming(col("__sa"), col("__sb")).cast("long").as("hamming"))
        .filter(col("hamming") <= 6)
      exact.exceptAll(cands).unionAll(cands.exceptAll(exact))
        .orderBy("id_a", "id_b")
    }),

    "q28_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      // "pre-query" pattern: tiny driver-side lookup binds the query vector
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Similarity.cosineTopK(e, "vec_id", "embedding", q, 20)
    }),

    "q29_cosine_neardup" -> ((s, dir) =>
      // EXACT all-pairs cosine ≥ threshold (oracle-checked); the
      // sub-quadratic LSH-bucketed path is q52
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.4)
        .orderBy("id_a", "id_b")),

    "q52_cosine_lsh" -> ((s, dir) => {
      // LSH near-dup contracts under the oracle gate (recall < 1 by
      // design, so the full pair set has no SQL oracle; its CONTRACTS
      // do): (1) precision — every bucketed pair must also be an exact
      // cosine-≥-threshold pair (the operator verifies with the exact
      // kernel, so false positives indicate a broken bucket join);
      // (2) recall floor — the OR-amplified buckets (3 bands × 4
      // planes; P(candidate) ≈ 40% per pair at cos 0.4) must recover
      // ≥ 15% of the exact pairs. Output = violations only; oracle
      // pins empty.
      val e = t(s, dir, "embeddings")
      val lsh = Similarity.cosineNearDupPairsLsh(e, "vec_id", "embedding",
        dim = 64, threshold = 0.4, planes = 4, bands = 3).select("id_a", "id_b")
      val exact = Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
        threshold = 0.4).select("id_a", "id_b")
      val falsePos = lsh.exceptAll(exact)
        .select(lit("false_positive").as("violation"), col("id_a"), col("id_b"))
      val stats = exact.agg(count(lit(1)).as("n_exact")).crossJoin(
        exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
          .agg(count(lit(1)).as("n_found")))
      val recallViolation = stats
        .filter(col("n_found").cast("double") < col("n_exact").cast("double") * 0.15)
        .select(lit("recall_below_floor").as("violation"),
          lit(null).cast("long").as("id_a"), lit(null).cast("long").as("id_b"))
      falsePos.unionAll(recallViolation).orderBy("violation", "id_a", "id_b")
    }),

    "q30_fingerprint" -> ((s, dir) => {
      // Fingerprint contracts under the oracle gate (xxhash64 rolling
      // hash has no DuckDB equivalent; its CONTRACTS are SQL-exact):
      // equal texts must share one fingerprint (one row per
      // duplicate-text group, n_fp pinned to 1) and distinct texts
      // must not collide (the __total row pins #distinct fingerprints
      // == #distinct texts, which DuckDB knows independently).
      val d = t(s, dir, "documents")
        .select(md5(col("text")).as("grp"), TextOps.fingerprint(col("text")).as("fp"))
      val dupGroups = d.groupBy("grp")
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_fp"))
        .filter(col("n_docs") > 1)
      val total = d
        .agg(countDistinct(col("grp")).as("n_docs"), countDistinct(col("fp")).as("n_fp"))
        .select(lit("__total").as("grp"), col("n_docs"), col("n_fp"))
      dupGroups.unionAll(total).orderBy("grp")
    }),

    "q31_events_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("hour", "event_type")),

    "q32_sessionize" -> ((s, dir) => {
      // session = gap > 1800 s; lag + cumulative-flag-sum windows
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (col("ts").cast("long") - col("prev_ts").cast("long")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id")
        .agg(max(col("session_id")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    "q33_jq_filter" -> ((s, dir) =>
      // flagship reference example: jq `select(.age > 30)` shape
      // (README "Advanced Usage") compiled by graft.transform.Jq
      Jq.compile("select(.l_quantity > 30 and .l_returnflag == \"A\")")(
        t(s, dir, "lineitem"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    "q34_jq_project" -> ((s, dir) =>
      Jq.compile("{order: .o_orderkey, cust: .o_custkey, " +
        "priority: (.o_orderpriority | ascii_downcase)} | select(.cust % 10 == 3)")(
        t(s, dir, "orders"))
        .orderBy("order")),

    "q35_template_dest" -> ((s, dir) =>
      // D10/D17: per-record templated destination → group-by-destination
      t(s, dir, "lineitem")
        .select(Template.compile(
          "out_[[ .l_returnflag ]]_[[ div .l_orderkey 1000 ]].json").as("dest"))
        .groupBy("dest").agg(count(lit(1)).as("n"))
        .orderBy("dest")),

    "q36_metadata_strip" -> ((s, dir) => {
      // D12 metadata add/strip round-trip
      val d = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val withMeta = d
        .withColumn(Meta.FilenameCol, lit("documents.parquet"))
        .withColumn(Meta.RecordTotalCountCol, lit(0L))
      Meta.stripMetadata(withMeta).orderBy("doc_id")
    }),

    "q37_intersect" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn).orderBy("nationkey")
    }),

    "q38_scalar_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        substring(col("p_name"), 1, 5).as("name5"),
        length(col("p_type")).cast("long").as("type_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        coalesce(col("p_name"), lit("?")).as("name_nn"))
        .orderBy("p_partkey")),

    "q39_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy("status", "priority")),

    "q51_asof_join" -> ((s, dir) => {
      // as-of join: each click enriched with the user's latest prior
      // view value (point-in-time correctness; AsOf composes built-ins)
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts") // unique (key, ts) for determinism
        .agg(max(dec(col("value"))).cast("double").as("view_value"))
      graft.ops.AsOf.asofJoin(clicks, views, "user_id", "ts",
        Seq("view_value"))
        .select(col("event_id"), col("user_id"), col("asof_view_value"))
        .orderBy("event_id")
    }),

    "q49_char_trigrams" -> ((s, dir) =>
      // char-n-gram extraction (language-ID profile raw material):
      // corpus-wide top trigrams, deterministic tie-break
      graft.ops.Scale.widen(t(s, dir, "documents").select(col("text")))
        .select(explode(TextOps.charNgrams(col("text"), 3)).as("trigram"))
        .groupBy("trigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("trigram"))
        .limit(20)),

    "q50_dup_components" -> ((s, dir) => {
      // THE production near-dedup path, composed and oracle-checked
      // end-to-end: sub-quadratic MinHash-LSH candidates → corpus
      // restricted to candidate ids → exact jaccard verification
      // (≥ 0.9) → connected components into complete duplicate
      // clusters (A~B, B~C ⇒ one group). Verification runs on the
      // candidate sub-corpus ONLY (Dedup.candidateDocs — the
      // dedupCorpus shape), so the gram-bucket expansion is bounded by
      // the candidate set, never the corpus: a stop-shingle shared by
      // 100k docs cannot create a quadratic bucket here. Oracle
      // parity: LSH recall at j ≥ 0.9 is deterministic-1 on a fixed
      // corpus (q26's contract), so every exact high-jaccard pair has
      // both endpoints among the candidates and survives restriction —
      // the verified edge set still equals the full-corpus exact edge
      // set that DuckDB recomputes with a recursive-CTE fixpoint.
      val docs = t(s, dir, "documents")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 32, shingleSize = 3)
      // maxDocFreq disabled explicitly: the candidate-doc restriction
      // already bounds bucket expansion, and the default 10k prune
      // would silently undercount jaccard for grams shared by >10k
      // candidates at scale (round-6 advice #3)
      val verified = Dedup.ngramJaccardPairs(
        Dedup.candidateDocs(docs, "doc_id", cands),
        "doc_id", "text", n = 3, threshold = 0.9,
        maxDocFreq = Long.MaxValue)
      Dedup.connectedComponents(verified)
        .groupBy("comp").agg(count(lit(1)).cast("long").as("cluster_size"),
          min(col("id")).as("representative"))
        .orderBy("comp")
    }),

    "q47_quality_filter" -> ((s, dir) => {
      // corpus quality gate: the cheap pre-filter a training pipeline
      // runs before dedup/classification. The lang predicate goes FIRST
      // (pushed to the parquet scan); the quality/token kernels are
      // projected behind an EvalOnce fence so the filter reads the
      // columns instead of re-deriving the kernels per row (Catalyst
      // predicate pushdown would otherwise evaluate them twice).
      val d = t(s, dir, "documents")
        .filter(col("lang").isin("en", "de", "fr"))
      d.select(col("doc_id"), col("lang"),
        TextOps.once(TextOps.qualityScore(col("text"))).as("quality"),
        TextOps.once(TextOps.tokenCountArith(col("text"))).as("n_tokens"))
        .filter(col("quality") >= 0.75 && col("n_tokens").between(20, 2000))
        .orderBy("doc_id")
    }),

    "q48_token_histogram" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy((floor(TextOps.tokenCountArith(col("text")) / 25) * 25)
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCountArith(col("text"))).cast("long").as("n_tokens"))
        .orderBy("bucket")),

    "q42_left_outer" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      l.join(o, l("l_orderkey") === o("o_orderkey"), "left_outer")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), count(col("o_orderkey")).as("n_matched"))
        .orderBy("l_returnflag")
    }),

    "q43_full_outer" -> ((s, dir) => {
      val oc = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val c = t(s, dir, "customer")
      c.join(oc, c("c_custkey") === oc("o_custkey"), "full_outer")
        .agg(count(lit(1)).as("total"),
          count(when(col("n").isNull, 1)).as("cust_no_orders"),
          count(when(col("c_custkey").isNull, 1)).as("orphan_orders"))
    }),

    "q44_date_parts" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"))
        .agg(count(lit(1)).as("n"))
        .orderBy("y", "q")),

    "q45_string_agg" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(array_join(
          slice(array_sort(collect_list(col("c_name"))), 1, 3), ",")
          .as("top_names"))
        .orderBy("c_nationkey")),

    "q46_regex" -> ((s, dir) =>
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(count(when(col("p_name").rlike("^(red|blue)"), 1)).as("n_colored"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")),

    "q41_ann_ivf" -> ((s, dir) => {
      // IVF scale path (coarse k-means cells, probe 2 of 8) under the
      // oracle gate via its recall contract: approximate top-20 must
      // overlap the exact top-20 in ≥ 12 ids (observed 15-18 on this
      // corpus; random-gaussian embeddings cap IVF recall below 1, so
      // full equality is not the operator's contract). Output = exact
      // neighbours missed BEYOND the 8 allowed — empty; oracle pins
      // empty.
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val idx = Similarity.IvfIndex.fit(e, "embedding", cells = 8)
      val ivf = Similarity.ivfTopK(idx, idx.assign(e, "embedding"),
        "vec_id", "embedding", q, k = 20, nprobe = 2)
      val exact = Similarity.cosineTopK(e, "vec_id", "embedding", q, 20)
      val misses = exact.select("vec_id")
        .join(ivf.select("vec_id"), Seq("vec_id"), "left_anti")
      misses
        .withColumn("__rk", row_number().over(Window.orderBy("vec_id")))
        .filter(col("__rk") > 8)
        .select("vec_id")
    }),

    "q40_knn_join" -> ((s, dir) => {
      // k-NN join: top-3 corpus neighbours for 10 query vectors
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
      Similarity.knnJoin(e.filter(col("vec_id") >= 10), queries,
        "vec_id", "embedding", 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "q53_jaccard_components" -> ((s, dir) => {
      // connected components over EXACT jaccard edges — unlike q50's
      // minhash edges, these are SQL-expressible, so the iterative CC
      // operator itself is oracle-checked (DuckDB recursive CTE
      // computes the same min-label fixpoint)
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 1000000L)
      Dedup.connectedComponents(pairs)
        .groupBy("comp")
        .agg(count(lit(1)).cast("long").as("n_members"),
          min(col("id")).as("representative"))
        .orderBy("comp")
    }),

    "q54_stream_hourly" -> ((s, dir) => {
      // the streaming runtime inside the correctness gate: same hourly
      // aggregation as q31, executed by Structured Streaming
      // (AvailableNow over the parquet files, complete-mode memory sink)
      val agg = streamT(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"), col("n"), col("total_value"))
      graft.streaming.StreamPipeline.runToResult(s, agg, "graft_q54")
        .orderBy("hour", "event_type")
    }),

    "q55_langid_ngram" -> ((s, dir) =>
      // the repartition materializes the map-only scoring pass into a
      // (tiny, 4-column) exchange BEFORE the presentation sort: the
      // range partitioner's boundary-sampling job would otherwise
      // recompute the whole scan+trigram-kernel chain a second time —
      // there is no shuffle below it to resample since the round-8
      // compiled-profile rework
      TextOps.langIdNgram(t(s, dir, "documents"), "doc_id", "text", "lang")
        .repartition(col("doc_id"))
        .orderBy("doc_id")),

    "q57_pii_scrub" -> ((s, dir) => {
      // PII redaction over documents; deterministic synthetic contact
      // info appended so the scrub provably fires on every row
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com see http://ex.com/d/"), col("doc_id").cast("string"),
        lit(" from 10.0.0.1 ref 5551234567"))
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.scrubPii(aug).as("clean_text"))
        .orderBy("doc_id")
    }),

    "q58_embed_quantize" -> ((s, dir) =>
      // symmetric max-abs int8 quantization, one row per (vector, dim)
      graft.ops.Quantize.int8Rows(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id", "i")),

    "q59_repetition" -> ((s, dir) =>
      // Gopher-style duplication signals: distinct-token ratio and
      // most-frequent-token share per document
      TextOps.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q60_sketch_contracts" -> ((s, dir) => {
      // sketch error contracts: HLL distinct counts (rsd 5%) and the
      // approximate median must land within bound of the exact values;
      // violations emit rows and the oracle pins EMPTY. At 100 TB the
      // sketches are the only affordable form of these statistics —
      // this query keeps their error budget honest. The audit runs on
      // a DETERMINISTIC PINNED SLICE (key % 8 = 0): est and exact are
      // computed over the same slice, so the error-bound check is
      // exact-vs-sketch on identical data while the exact side (a full
      // sort-based percentile + distinct in round 7, the slowest query
      // in the suite) touches 1/8 of the corpus. The distinct-count
      // and percentile audits stay in SEPARATE lineitem passes:
      // fusing them keys the partial phase by l_partkey (the
      // multi-distinct Expand plan), replicating object percentile
      // buffers per key — measured 12s vs ~1s as two clean sliced
      // scans. PlanSpec pins both scans to the slice predicate.
      val docs = t(s, dir, "documents").filter(col("doc_id") % 8 === 0)
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 8 === 0)
      // Per-metric tolerance — the two sketches have DIFFERENT error
      // models, so one shared bound over-loosens one of them:
      // - HLL: rsd 5% is the sketch's STANDARD DEVIATION, not a bound
      //   — a bare 5% cut flags ~1/3 of honest draws (the 10× gate
      //   caught exactly that: est 183,543 vs exact 195,370 on the
      //   sf1 slice, a −6% = 1.2σ miss). 3σ = 15% keeps false alarms
      //   at ~0.3% while a genuinely broken sketch (2×, 10× off)
      //   still trips.
      // - percentile_approx: rank-based (GK/KLL family) — accuracy
      //   10000 bounds the RANK error at 1/accuracy = 0.01% of rows,
      //   deterministic, not Gaussian. On any non-degenerate value
      //   distribution that is far tighter than 15%; 5% relative is
      //   already a generous value-space allowance, and a broken
      //   percentile sketch should not hide behind the HLL's σ.
      // The absolute floor covers slice cardinalities below ~1/rsd²
      // (= 400) where HLL sparse-mode wobble is a few counts (seen at
      // sf0.001: est 62 vs exact 63); it is value-scale noise for p50.
      val hllDocs = docs.agg(
        approx_count_distinct(col("text")).cast("double").as("est"),
        countDistinct(col("text")).cast("double").as("exact"))
        .select(lit("hll_documents_text").as("metric"), col("est"),
          col("exact"), lit(0.15).as("rel_tol"))
      val hllParts = li.agg(
        approx_count_distinct(col("l_partkey")).cast("double").as("est"),
        countDistinct(col("l_partkey")).cast("double").as("exact"))
        .select(lit("hll_lineitem_partkey").as("metric"), col("est"),
          col("exact"), lit(0.15).as("rel_tol"))
      val pct = li.agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .cast("double").as("est"),
        expr("percentile(l_extendedprice, 0.5)").cast("double").as("exact"))
        .select(lit("p50_extendedprice").as("metric"), col("est"),
          col("exact"), lit(0.05).as("rel_tol"))
      val liBoth = hllParts.union(pct)
      hllDocs.union(liBoth)
        .filter(abs(col("est") - col("exact")) >
          greatest(col("exact") * col("rel_tol"), lit(16.0)))
        .select(col("metric"))
    }),

    "q61_corpus_pipeline" -> ((s, dir) => {
      // the composed training-data flow in one plan: language gate
      // (pushed to the scan) → quality/token gate (kernels behind the
      // EvalOnce fence) → PII scrub → exact dedup keeping the smallest
      // doc_id per scrubbed digest.
      // r19: exact dedup as the Dedup.exact window (row_number = 1 per
      // digest ordered by doc_id) instead of [min-agg + join back on
      // doc_id] — doc_id is the table key, so both keep exactly the
      // smallest-id row per digest, but the window evaluates the
      // quality/token/scrub kernels ONCE (the old `gated` fed two
      // subtrees and the whole kernel chain ran twice) and at scale
      // shuffles the corpus once by digest instead of once by doc_id
      // for the join PLUS a second corpus scan. Kernel input widened
      // (guide §2): the per-row text kernels are the heavy part and a
      // single-row-group scan runs them on one task (no-op at scale).
      val gated = graft.ops.Scale.widen(
        t(s, dir, "documents").filter(col("lang").isin("en", "de", "fr")))
        .select(col("doc_id"), col("lang"),
          TextOps.once(TextOps.qualityScore(col("text"))).as("quality"),
          TextOps.once(TextOps.tokenCountArith(col("text"))).as("n_tokens"),
          col("text"))
        .filter(col("quality") >= 0.5 && col("n_tokens") >= 10)
        .withColumn("clean_text", TextOps.scrubPii(col("text")))
        .select("doc_id", "lang", "quality", "n_tokens", "clean_text")
      val w = Window.partitionBy(md5(col("clean_text")))
        .orderBy(col("doc_id"))
      gated.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .orderBy("doc_id")
    }),

    "q62_decontaminate" -> ((s, dir) => {
      // benchmark decontamination (the GPT-3/Pile n-gram pass): flag
      // training docs sharing any word 5-gram with the eval slice
      // (doc_id % 20 == 0 stands in for a benchmark set). Eval grams
      // BROADCAST; the training corpus sees one map-side explode and
      // one doc-id aggregation — no corpus-vs-corpus shuffle.
      val docs = t(s, dir, "documents")
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 5)
        .orderBy("doc_id")
    }),

    "q65_tfidf_keywords" -> ((s, dir) => {
      // per-document keyword extraction: top-3 TF-IDF terms — the
      // topic-tagging pass of corpus curation. Shape: one token
      // explode feeding both the tf and document-frequency aggregates,
      // a broadcast of the 1-row corpus count, ranks on the ROUNDED
      // score (cross-engine double parity, the q29 round(,6) device)
      // with a token tie-break.
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // document frequency FROM the tf table (it already holds one row
      // per distinct (doc, token)): count(*) == countDistinct(doc).
      // No persist: both branches share the identical shuffle exchange
      // under tf, which ReuseExchange dedupes — the explode runs once,
      // and nothing accumulates in the cache manager across bench runs
      // (round-6 advice #4)
      val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfq, "tok").crossJoin(broadcast(n))
        .select(col("doc_id"), col("tok").as("token"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("token"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("doc_id", "rank")
    }),

    "q66_pack_sequences" -> ((s, dir) => {
      // sequence packing (concat-and-chunk batch prep): global token
      // offset per doc via the DISTRIBUTED prefix sum in Pack — range
      // shuffle + partition-local running sums + a P-row prefix scan;
      // never a corpus-wide single-partition window
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
      Pack.contiguous(docs, "doc_id", "n_tokens", budget = 512)
        .select(col("doc_id"), col("n_tokens"), col("offset"),
          col("pack_first"), col("pack_last"))
        .orderBy("doc_id")
    }),

    "q67_bloom_decontaminate" -> ((s, dir) => {
      // decontamination at eval-set sizes past string broadcast: Bloom
      // bits prefilter the training gram stream map-side (no false
      // negatives), the exact join on the rare survivors kills the
      // false positives — output is bit-identical to q62's exact path,
      // which is precisely what the oracle checks
      val docs = t(s, dir, "documents")
      Dedup.decontaminateBloom(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 7, expectedGrams = 100000L, fpp = 0.01)
        .orderBy("doc_id")
    }),

    "q68_stratified_sample" -> ((s, dir) =>
      // balanced pilot corpus: exactly k docs per language, drawn by
      // the portable (md5(id), id) order; two-phase rank keeps strata
      // out of single partitions
      Sample.stratifiedTopK(t(s, dir, "documents"), "doc_id", "lang", k = 10)
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy("lang", "rk")),

    "q69_unigram_logprob" -> ((s, dir) =>
      // perplexity-proxy quality ranking under the corpus unigram LM;
      // LN rounds to 6 before the DECIMAL-weighted sum (parity memo)
      TextOps.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q70_segment_dedup" -> ((s, dir) =>
      // cross-document segment removal (RefinedWeb line dedup over
      // 10-token segments — this corpus has no newlines): duplicated
      // segments vanish, docs reassemble in order, fully-duplicated
      // docs survive as empty text
      Dedup.dedupSegments(t(s, dir, "documents"), "doc_id", "text",
        segTokens = 10, minDocs = 2)
        .orderBy("doc_id")),

    "q64_random_projection" -> ((s, dir) => {
      // JL random-projection contract (q60-style error bound): project
      // 64-dim embeddings to k=32 with the hash-derived sign matrix and
      // verify cosine preservation over a bounded pair sample — no
      // per-pair violation beyond 3.5σ-with-headroom (0.75) and a mean
      // absolute deviation within the JL expectation (< 0.25 for k=32,
      // measured ≈ 0.14). Rows only appear on violation, so the oracle
      // is the empty set.
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 60)
      val proj = Similarity.randomProject(emb, "vec_id", "embedding", k = 32)
      val joined = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .join(proj, "vec_id")
      val a = joined.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("projected").as("pa"))
      val b = joined.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("projected").as("pb"))
      val pairs = a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          abs(Similarity.cosine(col("va"), col("vb"))
            - Similarity.cosine(col("pa"), col("pb"))).as("dcos"))
      val perPair = pairs.filter(col("dcos") > 0.75)
        .select(lit("pair_dcos").as("violation"), col("id_a"), col("id_b"))
      val meanViol = pairs.agg(avg(col("dcos")).as("m"))
        .filter(col("m") > 0.25)
        .select(lit("mean_dcos").as("violation"),
          lit(null).cast("long").as("id_a"), lit(null).cast("long").as("id_b"))
      perPair.unionAll(meanViol).orderBy("violation", "id_a", "id_b")
    }),

    "q63_mixture_sample" -> ((s, dir) =>
      // corpus assembly: deterministic per-language mixture weights
      // (hash-threshold sampling — reproducible across reruns/engines,
      // shuffle-free). Count per stratum to keep the row small while
      // still pinning the exact kept set via the id checksum.
      TextOps.mixtureSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25), defaultWeight = 0.1)
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy("lang")),

    "q71_c4_rules" -> ((s, dir) =>
      // C4-style cleaning gate (Raffel et al. 2020 §2.2): per-doc
      // signals + combined keep flag, all arithmetic/regex on the scan
      // — a pure map stage that rides the parquet read at any scale
      TextOps.c4Rules(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q72_char_entropy" -> ((s, dir) => {
      // character-entropy quality gate via the compiled kernel — ONE
      // codegen'd pass per document, zero shuffles (the DuckDB oracle
      // pays a full char explode + two aggregations for the same
      // numbers; the kernel is the 100 TB shape). Parity: the q69
      // round-6-LN → exact-fixed-point-sum ladder inside the kernel.
      val docs = t(s, dir, "documents").filter(length(col("text")) > 0)
      docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n"),
        TextOps.charEntropy(col("text")).as("entropy"))
        .orderBy("doc_id")
    }),

    "q73_cms_heavy_hitters" -> ((s, dir) => {
      // heavy-hitter token counts from a CountMinSketch — the one-pass
      // mergeable sketch that replaces a full groupBy at 100 TB — held
      // to its own guarantee (q60 device): estimates never undercount,
      // and overcount ≤ eps·N with confidence 99.9%. The exact side
      // exists only to audit the sketch; violations emit rows and the
      // oracle pins EMPTY. Driver-side work is bounded: the sketch
      // (width 2/eps) and the top-20 collect.
      val toks = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      val eps = 0.001
      val cms = toks.stat.countMinSketch("tok", eps, 0.999, 42)
      val top = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("tok")).limit(20).collect()
      val budget = math.ceil(eps * cms.totalCount()).toLong
      val rows = top.toSeq.map { r =>
        (r.getString(0), cms.estimateCount(r.getString(0)), r.getLong(1))
      }
      import s.implicits._
      rows.toDF("token", "est", "exact")
        .filter(col("est") < col("exact") ||
          col("est") > col("exact") + lit(budget))
        .orderBy("token")
    }),

    "q74_semdedup" -> ((s, dir) => {
      // SemDeDup (cluster → within-cluster cosine prune, keep-min-id)
      // with its correctness contract: the kept set must contain NO
      // intra-cluster pair at/above the threshold — greedy keep-min-id
      // guarantees it (a surviving y would have been dropped by its
      // smaller-id neighbor x), so rows appear only on violation and
      // the oracle pins EMPTY. Same round-6 cosine on both sides.
      val kept = Similarity.semDedup(t(s, dir, "embeddings"), "vec_id",
        "embedding", cells = 8, threshold = 0.4)
      val a = kept.select(col("vec_id").as("id_a"), col("cell"),
        col("embedding").cast("array<double>").as("va"))
      val b = kept.select(col("vec_id").as("id_b"), col("cell"),
        col("embedding").cast("array<double>").as("vb"))
      a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("va"), col("vb")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.4)
        .orderBy("id_a", "id_b")
    }),

    "q75_contrastive_mine" -> ((s, dir) =>
      // hard-negative mining for contrastive training: per anchor, the
      // best same-label neighbor (positive) and best different-label
      // neighbor (hard negative). Anchors broadcast; the corpus makes
      // ONE narrow pass and only map-side-combined argmax partials
      // shuffle — the anchor×corpus score relation never crosses the
      // wire. Round-6 cosine + smaller-id tie-break = portable argmax.
      Similarity.contrastiveMine(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label")
        .orderBy("anchor_id")),

    "q76_quality_buckets" -> ((s, dir) => {
      // CCNet-style head/middle/tail split per language over the char-
      // entropy score — EXACT per-stratum quantile buckets through the
      // two-phase distributed rank (one range shuffle + a P×S-row side
      // table; never a one-task-per-language window). Integral bucket
      // arithmetic = engine-portable split.
      val docs = t(s, dir, "documents").filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"),
          TextOps.charEntropy(col("text")).as("score"))
      Rank.quantileBuckets(docs, "lang", Seq("score", "doc_id"), nBuckets = 3)
        .orderBy("doc_id")
    }),

    "q77_incremental_dedup" -> ((s, dir) => {
      // rolling corpus build: dedup an incoming batch against the
      // digest index of the already-accepted corpus, then within the
      // batch itself (keep-min-id). Only 16-byte digests shuffle or
      // join — the accepted corpus itself is never re-read.
      val docs = t(s, dir, "documents")
      val seen = Dedup.digests(docs.filter(col("doc_id") % 3 =!= 1), Seq("text"))
      Dedup.dedupAgainst(docs.filter(col("doc_id") % 3 === 1), seen,
        Seq("text"), "doc_id")
        .select("doc_id", "text")
        .orderBy("doc_id")
    }),

    "q78_token_budget" -> ((s, dir) => {
      // token-budget corpus assembly: each language contributes
      // documents in md5(id) order until 3000 tokens. The running
      // total is the per-stratum two-phase prefix sum — one range
      // shuffle, P×S-row side table, never a one-task-per-language
      // window.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.tokenCountArith(col("text")).as("n_tokens"))
      Rank.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens",
        budget = 3000L)
        .select("doc_id", "lang", "n_tokens", "prefix")
        .orderBy("doc_id")
    }),

    "q79_document_stats" -> ((s, dir) =>
      // the one-pass wide-stats projection (documentStats) under the
      // oracle gate — every signal lands in a single scan stage; the
      // xxhash64 fingerprint column is exercised by q30's contracts
      // and dropped here (no DuckDB equivalent to hash-compare)
      TextOps.documentStats(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("n_punct"),
          col("n_stopwords"), col("quality"), col("lang_pred"))
        .orderBy("doc_id")),

    "q80_semantic_retrieval" -> ((s, dir) => {
      // end-to-end retrieval: ANN top-k over the embedding table joined
      // back to document metadata (vec_id aligns with doc_id) — the
      // single-pass TakeOrdered search plus ONE broadcast join of the
      // k-row result against the doc table; the corpus is scanned once
      // and no score relation materializes
      val e = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val top = Similarity.cosineTopK(e, "vec_id", "embedding", q, 10)
      broadcast(top).join(docs, top("vec_id") === docs("doc_id"))
        .select(col("doc_id"), col("cos_sim"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("cos_sim").desc, col("doc_id"))
    }),

    "q81_curation_pipeline" -> ((s, dir) => {
      // the round-7 curation flow COMPOSED in one declarative plan:
      // C4 gate → char-entropy gate (both ride the scan) → per-language
      // token budget (one range shuffle + P×S side table). The q61
      // pattern applied to this round's operators.
      val sig = TextOps.c4Rules(t(s, dir, "documents"), "doc_id", "text",
        passthrough = Seq("lang", "text"))
      val gated = sig.filter(col("keep"))
        .withColumn("entropy", TextOps.charEntropy(col("text")))
        .filter(col("entropy") >= 2.6)
        .select("doc_id", "lang", "n_tokens", "entropy")
      Rank.tokenBudgetSample(gated, "doc_id", "lang", "n_tokens",
        budget = 3000L)
        .select("doc_id", "lang", "n_tokens", "entropy", "prefix")
        .orderBy("doc_id")
    }),

    "q82_event_outliers" -> ((s, dir) => {
      // per-type z-score anomaly flagging over the event stream (the
      // monitoring pass of a telemetry pipeline). Parity device: the
      // per-type moments are EXACT DECIMAL sums (2-dp values square to
      // 4-dp — both engines sum them without rounding), and the
      // mean/variance/z derivation is the same IEEE double formula in
      // the same operation order on both sides, so round-6 z-scores
      // hash-match. Shape: one map-side-combined aggregate (5 rows)
      // broadcast back over the stream — no second shuffle.
      val ev = t(s, dir, "events")
      val d = col("value").cast("decimal(18,2)")
      val stats = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(d).as("s"), sum(d * d).as("ss"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", round(
          (col("value") - col("s").cast("double") / col("n")) /
            sqrt((col("ss").cast("double") -
              col("s").cast("double") * col("s").cast("double") / col("n")) /
              (col("n") - 1)), 6))
        .filter(abs(col("z")) > 3)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    }),

    "q56_prequery_loop" -> ((s, dir) => {
      // MC pre-query × query-template loop (S2 / source.go:135-247):
      // the pre-query's rows drive one templated query each; results
      // union with pre-row fields merged in as metadata columns
      t(s, dir, "region").createOrReplaceTempView("region")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      graft.pipeline.QueryLoop.run(s, graft.pipeline.QueryLoop.Spec(
        preQuery = "SELECT r_name, r_regionkey FROM region",
        preQueryFilename = "pre_regions.sql",
        queryFiles = Seq("nations.sql" ->
          "SELECT n_name, n_nationkey FROM nation WHERE n_regionkey = [[ .__METADATA__r_regionkey ]]")))
        .data.get.orderBy("n_nationkey")
    }),

    "q83_stream_incremental_dedup" -> ((s, dir) => {
      // q77's rolling-corpus incremental dedup executed by the
      // STREAMING runtime: the incoming batch arrives as a file
      // stream, drops rows already in the persisted digest index via
      // a stream-static anti join, then exact-dedups within the
      // stream (keep-min-doc_id per digest) through the
      // flatMapGroupsWithState marker state. Same oracle as q77 —
      // batch/stream parity through the real streaming engine.
      val raw = t(s, dir, "documents")
      val seen = Dedup.digests(raw.filter(col("doc_id") % 3 =!= 1), Seq("text"))
      val stream = streamT(s, dir, "documents")
        .filter(col("doc_id") % 3 === 1)
      val kept = graft.streaming.StreamDedup.dedupAgainstIndex(
        stream, seen, Seq("text"), "doc_id")
      graft.streaming.StreamPipeline
        .runToResultAppend(s, kept, "graft_q83")
        .select("doc_id", "text")
        .orderBy("doc_id")
    }),

    "q84_lm_perplexity" -> ((s, dir) =>
      // CCNet-style LM quality scoring: bigram model learned from the
      // 'en' reference slice, compiled into the scan as literal maps;
      // scoring is map-only (no join, no shuffle). Round-6-LN ladder
      // keeps the NLL sums engine-portable.
      TextOps.bigramLmNll(t(s, dir, "documents"), "doc_id", "text",
          refFilter = col("lang") === "en")
        .orderBy("doc_id")),

    "q85_kmeans_lloyd" -> ((s, dir) =>
      // distributed Lloyd's k-means, 2 deterministic iterations:
      // assignment is map-only against compiled centroid literals;
      // the update shuffles only k × dims × partitions partial rows
      // (map-side combine). Every arithmetic step rides the round-6
      // DECIMAL ladder, so the full trajectory is oracle-checkable.
      KMeans.lloyd(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 2)
        .orderBy("vec_id")),

    "q86_temperature_mixture" -> ((s, dir) =>
      // temperature rebalancing with weights LEARNED from the stratum
      // counts (α=0.5 square-root sampling): the dominant language is
      // down-sampled toward the rarest, deterministically via the
      // md5-prefix device. Counts + checksum pin the exact kept set.
      TextOps.temperatureMixture(t(s, dir, "documents"), "doc_id", "lang",
          alpha = 0.5)
        .groupBy("lang")
        .agg(max(col("n_stratum")).cast("long").as("n_stratum"),
          max(col("weight")).as("weight"),
          count(lit(1)).cast("long").as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy("lang")),

    "q87_dup_ngram_fraction" -> ((s, dir) =>
      // Gopher duplicate-ngram gates as a ZERO-shuffle projection:
      // per-doc sorted-gram neighbor runs replace the explode +
      // (doc, gram) re-group of the textbook form
      TextOps.dupNgramStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q88_source_mix_report" -> ((s, dir) =>
      // per-source curation health: digest shuffle for the shared-
      // leading-segment signal, then one tiny source-keyed aggregate
      Curation.sourceMixReport(t(s, dir, "documents"))
        .orderBy("source")),

    "q89_dsir_weights" -> ((s, dir) =>
      // DSIR importance weights, target = the English slice: hashed
      // unigram model learned in ONE bounded aggregation, compiled
      // into a map-only scoring pass (array literal, O(1) lookups)
      Curation.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
        .orderBy("doc_id")),

    "q90_substring_dedup" -> ((s, dir) =>
      // Lee et al. exact substring dedup: sliding 15-token windows,
      // digest-only shuffle, per-doc coverage resolved with hash-set
      // array_except (no per-position scans)
      Dedup.substringDedup(t(s, dir, "documents"), "doc_id", "text", w = 15)
        .orderBy("doc_id")),

    "q91_top_ngram_fraction" -> ((s, dir) =>
      // Gopher top-gram char fractions as a ZERO-shuffle projection:
      // longest run in the sorted gram array replaces the explode +
      // per-doc count window of the textbook form
      TextOps.topNgramStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q92_funnel" -> ((s, dir) =>
      // ordered view→click→purchase funnel: scan-stage type filter,
      // ONE user shuffle, greedy subsequence fold per user
      Events.funnelStages(events(s, dir), "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
        .orderBy("stage")),

    "q93_retention_cohorts" -> ((s, dir) =>
      // weekly retention triangle: one user-keyed aggregation computes
      // cohort AND the calendar-bounded active-week set together
      Events.retentionCohorts(events(s, dir), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),

    "q94_pmi_collocations" -> ((s, dir) =>
      // collocation mining: gram-keyed map-side-combined counts,
      // heavy-hitter filter BEFORE the unigram joins, TakeOrdered top-k
      CorpusStats.pmiCollocations(t(s, dir, "documents"), "text",
        minCount = 5L, topK = 50)),

    "q95_chunk_windows" -> ((s, dir) =>
      // RAG chunking: map-only token-window explode, exact-size chunks
      // with a tail window (HF stride convention)
      TextOps.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
        size = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")),

    "q96_zipf_slope" -> ((s, dir) =>
      // vocabulary power-law fit: counts shuffle once, rank window is
      // bounded by topV, least squares on the round-6-ln DECIMAL ladder
      CorpusStats.zipfSlope(t(s, dir, "documents"), "text", topV = 500)),

    "q97_dim_standardize" -> ((s, dir) =>
      // per-dim standardization model: posexplode + map-side-combined
      // aggregate — shuffle carries dims × partitions partials only
      graft.ops.Quantize.dimStats(t(s, dir, "embeddings"), "embedding")
        .orderBy("dim")),

    "q98_pivot_revenue" -> ((s, dir) => {
      // nation × order-year revenue pivot: broadcast dims, one fact
      // shuffle on the group key; DECIMAL(18,2) sums for hash parity
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val years = 1995 to 2001
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .pivot(year(col("o_orderdate")), years.map(Integer.valueOf))
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .select(col("n_name") +:
          years.map(y => col(y.toString).as(s"y$y")): _*)
        .orderBy("n_name")
    }),

    "q99_interval_join" -> ((s, dir) => {
      // time-window proximity as a bucketed EQUI join (no nested loop):
      // errors vs purchases within ±300s across all users
      val ev = events(s, dir)
      Events.intervalJoinCount(
        ev.filter(col("event_type") === "error"), "event_id", "ts",
        ev.filter(col("event_type") === "purchase"), "ts", 300L)
        .orderBy("event_id")
    }),

    "q100_cube_revenue" -> ((s, dir) => {
      // CUBE over (nation, year) with grouping() sentinels instead of
      // NULL subtotal keys (portable ordering, no null-order divergence)
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .withColumn("__yr", year(col("o_orderdate")))
        .cube(col("n_name"), col("__yr"))
        // grouping() must be evaluated inside the cube aggregate
        .agg(dsum(col("o_totalprice")).as("revenue"),
          grouping(col("n_name")).as("__g1"),
          grouping(col("__yr")).as("__g2"))
        .select(
          when(col("__g1") === 1, lit("(all)"))
            .otherwise(col("n_name")).as("nation"),
          when(col("__g2") === 1, lit(0L))
            .otherwise(col("__yr").cast("long")).as("yr"),
          col("revenue"))
        .orderBy("nation", "yr")
    }),

    "q101_stream_funnel" -> ((s, dir) => {
      // q92's funnel executed by the STREAMING runtime: per-user stage
      // cursor in keyed state, batch/stream parity on ordered replay —
      // same oracle as q92
      val stream = streamT(s, dir, "events")
      val stages = Seq("view", "click", "purchase")
      val updates = graft.streaming.StreamFunnel.funnelDepthUpdates(
        stream, "user_id", "ts", "event_id", "event_type", stages)
      val perUser = graft.streaming.StreamPipeline
        .runToResultAppend(s, updates.toDF(), "graft_q101")
        .groupBy("user_id").agg(max(col("depth")).as("__d"))
      Events.stageCounts(perUser, "__d", stages).orderBy("stage")
    }),

    "q102_weighted_sample" -> ((s, dir) =>
      // Efraimidis-Spirakis A-RES weighted draw, md5-derived uniforms:
      // map-only keys, TakeOrdered selection
      Sample.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars",
        k = 100)
        .orderBy(col("skey").desc, col("doc_id").asc)),

    "q103_bm25" -> ((s, dir) =>
      // BM25 retrieval for a fixed query: one-row stats broadcast,
      // compiled wordHits tf, map-only scoring, TakeOrdered top-k
      CorpusStats.bm25(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "join", "window"))
        .orderBy(col("score").desc, col("doc_id").asc)),

    "q104_rank_windows" -> ((s, dir) => {
      // rank-function breadth: ntile/percent_rank/cume_dist per nation
      // over a unique (acctbal desc, custkey) order — all deterministic.
      // The unique order means rank == row_number and no peer groups,
      // so percent_rank = (rn-1)/(n-1) and cume_dist = rn/n are pure
      // integer ratios: emitted through the half-up micro device
      // (Parity.round6Ratio) instead of round(double, 6) — at sf1 the
      // per-nation n reaches 60k and rn/n lands ON .5-micro boundaries,
      // where the double round flips between engines (q271 class).
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("bal").desc, col("c_custkey"))
      val part = Window.partitionBy("c_nationkey")
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(part))
        .withColumn("pct_rank", when(col("__n") === 1, lit(0.0))
          .otherwise(graft.ops.Parity.round6Ratio(
            col("__rn") - 1, col("__n") - 1)))
        .withColumn("cume",
          graft.ops.Parity.round6Ratio(col("__rn"), col("__n")))
        .select(col("c_custkey"), col("c_nationkey"),
          col("bal").cast("double").as("bal"),
          col("quartile"), col("pct_rank"), col("cume"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    "q105_stream_interval_join" -> ((s, dir) => {
      // q99's bucketed interval join as a WATERMARKED stream-stream
      // join: two event streams, per-bucket state matching, range
      // predicate on the watermarked timestamps; zeros restored from
      // the batch table after the run. Same oracle as q99.
      val pairs = graft.streaming.StreamJoin.intervalPairs(
        streamT(s, dir, "events").filter(col("event_type") === "error"),
        "event_id", "ts",
        streamT(s, dir, "events").filter(col("event_type") === "purchase"),
        "ts", 300L)
      // LOCAL-MODE cost note: with tiny state, per-(partition × batch)
      // state-store commit overhead dominates; runToMemory bounds the
      // gate run's state partitions itself since r18
      // (spark.graft.stream.gatePartitions, default 8 — the value this
      // query used to set by hand; the redundant session-conf juggling
      // here raced other planners, r18 ADVICE). On a real cluster the
      // right lever is NOT fewer partitions — it is the RocksDB
      // provider + changelog checkpointing
      // (StreamPipeline.withRocksDbStateStore), which makes the commit
      // cost O(changed keys); StreamingSpec pins provider-equal rows.
      // noDataBatches = false: an INNER stream-stream join emits on
      // match, so the trailing watermark-advance micro-batch is a pure
      // offset/commit/state-commit cycle here (see runToMemory's
      // scaladoc; append-mode aggregations must NOT do this)
      val matchedRows = graft.streaming.StreamPipeline
        .runToResultAppend(s, pairs, "graft_q105", noDataBatches = false)
      val matched = matchedRows
        .groupBy(col("__lid")).agg(count(lit(1)).as("__n"))
      events(s, dir).filter(col("event_type") === "error")
        .select(col("event_id"))
        .join(matched, col("event_id") === col("__lid"), "left")
        .select(col("event_id"),
          coalesce(col("__n"), lit(0L)).as("n_nearby"))
        .orderBy("event_id")
    }),

    "q106_group_percentiles" -> ((s, dir) => {
      // EXACT group percentiles (interpolated, quantile_cont) — the
      // complement of q60's approx-vs-exact contract, computed by the
      // DISTRIBUTED two-pass selection (approx brackets → exact rank
      // pick, Percentiles.exact) instead of the builtin's
      // single-reducer value-buffer merge; bit-identical results
      // (PercentilesSpec), scale-safe shape
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val joined = o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          dec(col("o_totalprice")).cast("double").as("__p"))
      graft.ops.Percentiles
        .exact(
          // r18: the device reads its base 3× and here the base is a
          // 3-table join — localCheckpoint materializes it once
          // (measured 3.04 s → ~1.7 s) and keeps the device plan flat
          // (an InMemoryRelation would nest a second adaptive plan)
          joined.localCheckpoint(),
          Seq("n_name"), "__p", Seq(0.25, 0.5, 0.75),
          accuracy = 1000)
        .select(col("n_name"), col("n").as("n_orders"),
          round(element_at(col("pcts"), 1), 6).as("p25"),
          round(element_at(col("pcts"), 2), 6).as("median"),
          round(element_at(col("pcts"), 3), 6).as("p75"))
        .orderBy("n_name")
    }),

    "q107_price_histogram" -> ((s, dir) =>
      // equi-width histogram: map-only clamped bucket id, one tiny
      // 20-row aggregate — binning at scan speed
      t(s, dir, "lineitem")
        .select(
          least(greatest(floor(col("l_extendedprice").cast("double") /
            5000d), lit(0d)), lit(19d)).cast("long").as("bucket"),
          dec(col("l_extendedprice")).as("__p"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(col("__p")).cast("double").as("total"))
        .orderBy("bucket")),

    "q108_corr_moments" -> ((s, dir) => {
      // correlation/covariance from EXACT decimal moments (one
      // map-side-combined aggregate) instead of the engines' streaming
      // corr() — order-independent, engine-portable, same single pass
      val x = dec(col("l_quantity")); val y = dec(col("l_extendedprice"))
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n").cast("double") * col("n")), 6).as("cov_pop"))
        .orderBy("l_returnflag")
    }),

    "q109_bpe_merges" -> ((s, dir) =>
      // tokenizer induction: BPE merge table learned exactly on the
      // bounded word-frequency table (the only corpus-scale step is
      // the vocab aggregation)
      Bpe.learnMerges(t(s, dir, "documents"), "text", iters = 5)
        .orderBy("merge_rank")),

    "q110_bpe_encode" -> ((s, dir) => {
      // tokenizer application: the merge table learned in the q109
      // pass (bounded vocab aggregation), then every document encoded
      // map-only by the compiled kernel — the learn/apply split of a
      // production tokenizer run
      val docs = t(s, dir, "documents")
      val merges = Bpe.learnMergeList(docs, "text", iters = 5)
        .map(m => (m._2, m._3))
      Bpe.encodeStats(docs, "doc_id", "text", merges).orderBy("doc_id")
    }),

    "q111_nation_pagerank" -> ((s, dir) => {
      // link analysis over the trade graph: customer-nation →
      // supplier-nation edges weighted by lineitem count (the
      // corpus-scale aggregation), then 5 deterministic power
      // iterations on the nation-sized rank table
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .groupBy(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
        // r19: weightedPageRank references its edge relation twice
        // (out-weight aggregate + the per-iteration join side) —
        // materialize the nations²-bounded aggregate once instead of
        // running the 4-way lineitem join under both references
        .localCheckpoint()
      val ranks = Graph.weightedPageRank(edges, "src", "dst", "w",
        nat.select("n_nationkey"), "n_nationkey", iters = 5)
      nat.join(ranks, "n_nationkey")
        .select(col("n_name").as("nation"), round(col("rank"), 6).as("pagerank"))
        .orderBy("nation")
    }),

    "q112_source_cap" -> ((s, dir) =>
      // per-domain quota gate: admit the top-10 docs per source by
      // token count; one range shuffle via the stratified-rank device
      Curation.capPerSource(t(s, dir, "documents"), cap = 10L)
        .orderBy("source")),

    "q113_bloom_semi_join" -> ((s, dir) => {
      // semi-join reduction: high-value order keys become a broadcast
      // Bloom probe inside the lineitem scan; the exact semi join
      // culls the (fpp) leakage, so the result is exactly the semi
      // join while the shuffle carries only probable matches
      val li = t(s, dir, "lineitem")
      val hi = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      JoinReduce.bloomSemiJoin(li, "l_orderkey", hi, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("l_returnflag")
    }),

    "q114_blocklist_gate" -> ((s, dir) =>
      // multi-keyword content gate: one Aho-Corasick pass per doc
      // (incl. the "scan"/"scan merge" prefix-overlap pair) where k
      // contains-probes would re-scan the text k times
      TextOps.blocklistScan(t(s, dir, "documents"), "doc_id", "text",
        SparkEntry.blocklistKeywords).orderBy("doc_id")),

    "q115_inverted_index" -> ((s, dir) =>
      // retrieval artifact: per-term document frequency + the first 8
      // postings; the per-term cap rides the stratified-rank device so
      // stopword-sized posting lists never concentrate in one task
      CorpusStats.invertedIndex(t(s, dir, "documents"), "doc_id", "text",
        cap = 8, minDf = 2L).orderBy("term")),

    "q116_stream_sessions" -> ((s, dir) => {
      // q32's sessionization through the REAL streaming runtime:
      // session_window merging is end-INCLUSIVE (an event landing
      // exactly on a session's end extends it), so gap 1800 s on
      // second-truncated event time merges iff floor-second diff
      // ≤ 1800 — the batch lag/cumsum split at > 1800. State carried
      // by the session-window store across micro-batches,
      // complete-mode collect. Same oracle as q32 — batch/stream
      // parity (StreamingSpec pins the boundary semantics).
      val stream = streamT(s, dir, "events")
        .withColumn("ts", date_trunc("second", col("ts")))
      val sess = graft.streaming.StreamPipeline.sessionWindows(
        stream, "ts", "user_id", gap = "1800 seconds")
      graft.streaming.StreamPipeline.runToResult(s, sess, "graft_q116")
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_sessions"),
          sum(col("n_events")).cast("long").as("n_events"))
        .orderBy("user_id")
    }),

    "q117_snapshot_diff" -> ((s, dir) => {
      // incremental corpus maintenance: old snapshot (some docs
      // missing, some texts since edited) vs new snapshot (some docs
      // retired) — the diff joins 16-byte digests only
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          upper(col("text"))).otherwise(col("text")))
      val nw = docs.filter(col("doc_id") % 11 =!= 3)
      graft.ops.Snapshot.diff(old, nw, "doc_id", Seq("text"))
        .orderBy("doc_id")
    }),

    "q118_source_kl" -> ((s, dir) =>
      // distribution drift per source: KL(source || corpus) on
      // unigrams through the round-6-LN ladder
      CorpusStats.sourceKl(t(s, dir, "documents"), "source", "text")
        .orderBy("source")),

    "q119_salted_agg" -> ((s, dir) => {
      // the skew device through the oracle gate: two-phase salted
      // aggregation (partial keyed (flag, salt), merge keyed flag)
      // must be value-identical to the plain GROUP BY
      val li = t(s, dir, "lineitem")
      graft.ops.Skew.saltedAgg(li, Seq("l_returnflag"), 16,
        partial = Seq(count(lit(1)).as("c"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("s")),
        merge = Seq(sum(col("c")).cast("long").as("n_items"),
          sum(col("s")).cast("double").as("revenue")),
        saltSource = Seq(col("l_orderkey"), col("l_linenumber")))
        .orderBy("l_returnflag")
    }),

    "q120_grouping_sets" -> ((s, dir) => {
      // the general GROUPING SETS form (rollup q39 / cube q100 are
      // special cases): explicit set list + grouping_id sentinel
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val base = o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .select(col("n_name").as("__nat"),
          year(col("o_orderdate").cast("date")).as("__yr"),
          dec(col("o_totalprice")).as("__tp"))
      base.groupingSets(
        Seq(Seq(col("__nat"), col("__yr")), Seq(col("__nat")),
          Seq(col("__yr")), Seq.empty),
        col("__nat"), col("__yr"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).cast("long").as("n_orders"),
          sum(col("__tp")).cast("double").as("total"))
        .select(coalesce(col("__nat"), lit("__ALL__")).as("nation"),
          coalesce(col("__yr").cast("long"), lit(-1L)).as("yr"),
          col("gid"), col("n_orders"), col("total"))
        .orderBy("gid", "nation", "yr")
    }),

    "q121_range_window" -> ((s, dir) => {
      // RANGE-frame window: trailing 7-day revenue per nation — the
      // frame is value-based (calendar days), not row-based, so gap
      // days genuinely age out of the window
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val daily = o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          col("o_orderdate").cast("date").as("d"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
      val w = Window.partitionBy("nation")
        .orderBy(unix_date(col("d")))
        .rangeBetween(-6, Window.currentRow)
      daily
        .select(col("nation"), date_format(col("d"), "yyyy-MM-dd").as("day"),
          sum(col("rev")).over(w).cast("double").as("rev7"))
        .orderBy("nation", "day")
    }),

    "q122_unicode_nfc" -> ((s, dir) => {
      // canonicalization audit: decomposed text (synthesized by
      // suffixing combining acutes, identically in the oracle) must
      // compose back under NFC — changed flag + code-point lengths
      val decomposed = regexp_replace(col("text"), "e", "é")
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.once(decomposed).as("__raw"))
        .select(col("doc_id"), TextOps.once(TextOps.nfc(col("__raw"))).as("__n"),
          col("__raw"))
        .select(col("doc_id"),
          (col("__n") =!= col("__raw")).as("changed"),
          length(col("__raw")).cast("long").as("len_raw"),
          length(col("__n")).cast("long").as("len_nfc"))
        .orderBy("doc_id")
    }),

    "q123_cdc_latest_state" -> ((s, dir) => {
      // changelog compaction: events are row-level upserts of a
      // per-user value keyed by user_id, ordered by (ts, event_id); a
      // terminal 'error' event tombstones the user out of the snapshot
      val ev = events(s, dir)
      graft.ops.Cdc.applyChangelog(ev, Seq("user_id"),
        Seq("ts", "event_id"), tombstone = col("event_type") === "error")
        .select(col("user_id"), unix_micros(col("ts")).as("last_ts"),
          col("event_type").as("last_type"),
          dec(col("value")).cast("double").as("last_value"))
        .orderBy("user_id")
    }),

    "q124_winnow_fingerprints" -> ((s, dir) =>
      // MOSS winnowing: per-doc distinct leftmost-min (md5-prefix,
      // pos) selections over 4-gram windows of char 5-grams — the
      // coverage-guaranteed fingerprint set, selected inside one
      // compiled kernel pass (never an exploded gram stream)
      TextOps.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text",
        k = 5, window = 4)
        .orderBy("doc_id", "pos")),

    "q125_bm25_batch" -> ((s, dir) =>
      // batch retrieval: 3 queries scored in ONE corpus scan (stats
      // for the union of terms = one broadcast row), per-query top-5
      // via the stratified-rank range shuffle
      CorpusStats.bm25Batch(t(s, dir, "documents"), "doc_id", "text",
        Seq("q_exec" -> Seq("spark", "join", "window"),
          "q_store" -> Seq("table", "row", "scan"),
          "q_perf" -> Seq("slow", "fast")),
        topK = 5)
        .orderBy("query_id", "rank")),

    "q126_triangle_count" -> ((s, dir) => {
      // graph cohesion next to q111's centrality: the nation trade
      // graph read undirected, edges gated on a DATA-DERIVED threshold
      // (half the mean directed pair weight — scale-free, so every SF
      // exercises a non-trivial graph), then per-nation triangle
      // participation via the ordered a<b<c join
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val e0 = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .groupBy(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
        // r19: e0 feeds BOTH the threshold aggregate and the gated
        // edge set — materialize the nations²-bounded aggregate once
        // instead of pasting the 4-way lineitem join under both
        .localCheckpoint()
      val thr = e0.agg(
        (sum(col("w")).cast("double") / count(lit(1)) * lit(0.5)).as("__thr"))
      val edges = e0.crossJoin(broadcast(thr))
        .filter(col("w") >= col("__thr"))
      graft.ops.Graph.triangleParticipation(edges, "src", "dst")
        .join(nat, col("id") === nat("n_nationkey"))
        .select(col("n_name").as("nation"),
          col("n_triangles").cast("long").as("n_triangles"))
        .orderBy("nation")
    }),

    "q127_index_compaction" -> ((s, dir) => {
      // retention-aware incremental dedup: two index generations merge
      // (max last_seen per digest), TTL-compact at cutoff 40, and the
      // incoming batch anti-joins only the LIVE index — aged-out
      // content is eligible again
      val docs = t(s, dir, "documents")
      val gen1 = Dedup.digestsWithSeen(
        docs.filter(col("doc_id") % 3 =!= 0)
          .withColumn("seen", col("doc_id") % 97), Seq("text"), "seen")
      val gen2 = Dedup.digestsWithSeen(
        docs.filter(col("doc_id") % 3 === 0)
          .withColumn("seen", lit(50L) + col("doc_id") % 29), Seq("text"), "seen")
      val live = Dedup.compactIndex(gen1.unionByName(gen2), lit(40L))
      Dedup.dedupAgainst(docs, live, Seq("text"), tieBreak = "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_new"),
          min(col("doc_id")).cast("long").as("first_id"))
        .orderBy("source")
    }),

    "q128_stream_cdc" -> ((s, dir) => {
      // q123's changelog compaction through the REAL streaming
      // runtime: per-user winner state in flatMapGroupsWithState,
      // update-mode emissions reduced to the final snapshot, tombstone
      // filter downstream. Same oracle as q123 — batch/stream parity.
      val stream = streamT(s, dir, "events")
      val updates = graft.streaming.StreamCdc.latestState(
        stream, "user_id", "ts", "event_id")
      val tbl = graft.streaming.StreamPipeline
        .runToResultUpdate(s, updates, "graft_q128")
      graft.streaming.StreamCdc.materialize(tbl, stream.schema)
        .filter(col("event_type") =!= "error")
        .select(col("user_id"), unix_micros(col("ts")).as("last_ts"),
          col("event_type").as("last_type"),
          dec(col("value")).cast("double").as("last_value"))
        .orderBy("user_id")
    }),

    "q129_winnow_candidates" -> ((s, dir) =>
      // the MOSS near-dup path end-to-end: fingerprints (kernel,
      // map-only) → boilerplate prune → shared-fp pairs. Candidates
      // carry the coverage guarantee the minhash/simhash sketches
      // lack. The oracle PINS the historical k=12/maxBucket=100
      // explicitly (the gate corpus has short docs); production
      // defaults are the measured-linear k=20/maxBucket=20
      // (SCALE.md rehearsal table, DedupSpec recall replay).
      Dedup.winnowCandidates(t(s, dir, "documents"), "doc_id", "text",
        k = 12, window = 8, minShared = 3L, maxBucket = 100)
        .orderBy("id_a", "id_b")),

    "q130_attribution_asof" -> ((s, dir) => {
      // last-touch attribution: each purchase joined to the user's
      // latest prior marketing touch (click/signup) — the as-of
      // composition over the event log; touches dedupe to a unique
      // (user, ts) by max event_id for determinism
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val touches = ev.filter(col("event_type").isin("click", "signup"))
        .groupBy("user_id", "ts")
        .agg(max(col("event_id")).as("touch_id"),
          max_by(col("event_type"), col("event_id")).as("touch_type"))
      graft.ops.AsOf.asofJoin(purchases, touches, "user_id", "ts",
        Seq("touch_id", "touch_type"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("pts"),
          col("asof_touch_id"), col("asof_touch_type"))
        .orderBy("event_id")
    }),

    "q131_hll_rollup" -> ((s, dir) => {
      // MERGEABLE distinct sketches (DataSketches HLL): per-type user
      // sketches union to the global estimate WITHOUT rescanning —
      // the 100 TB rollup shape (per-partition sketches, merge-only
      // combines). Contract query: estimates must land within
      // max(5% relative, 16 absolute) of exact; violations pin empty.
      val ev = events(s, dir)
      val perType = ev.groupBy("event_type").agg(
        hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).cast("double").as("exact"))
      val typeRows = perType.select(
        concat(lit("hll_users_"), col("event_type")).as("metric"),
        hll_sketch_estimate(col("sk")).cast("double").as("est"),
        col("exact"))
      val globalRow = perType
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .cast("double").as("est"))
        .crossJoin(broadcast(
          ev.agg(countDistinct(col("user_id")).cast("double").as("exact"))))
        .select(lit("hll_users_all").as("metric"), col("est"), col("exact"))
      typeRows.union(globalRow)
        .filter(abs(col("est") - col("exact")) >
          greatest(col("exact") * 0.05, lit(16.0)))
        .select(col("metric"))
    }),

    "q132_salted_join" -> ((s, dir) => {
      // the JOIN-skew device through the oracle gate: fact salted on
      // (key, linenumber), dim replicated × salts — must be
      // value-identical to the plain join
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
      val hi = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(li, hi, "k", 8,
        bigSaltSource = Seq(col("k"), col("l_linenumber")))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("priority")
    }),

    "q133_zorder_layout" -> ((s, dir) => {
      // zone-map quality audit: the same fact laid out in arrival
      // (orderkey-range) files vs Z-ORDER files — per-file (min, max)
      // spans and the fraction of files a mid-range partkey band scan
      // must touch. Bucketing is closed-form value ranges, so the
      // audit is fully parallel (no global rank); the production
      // writer is Layout.zorderRepartition (range exchange).
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val mx = li.agg(max(col("l_partkey")).as("pm"),
        max(col("l_suppkey")).as("sm"), max(col("l_orderkey")).as("om"))
      val base = li.crossJoin(broadcast(mx))
        .select(col("l_partkey"), col("l_suppkey"), col("pm"), col("sm"),
          expr("l_partkey * 1024L div (pm + 1)").as("xb"),
          expr("l_suppkey * 1024L div (sm + 1)").as("yb"),
          expr("l_orderkey * 256L div (om + 1)").as("nb"))
        .withColumn("zk",
          shiftright(graft.ops.Layout.zValue(col("xb"), col("yb"), 10), 12))
      def layoutStats(bucketCol: String, name: String) = {
        val perFile = base
          .groupBy(col(bucketCol).as("bk"), col("pm"), col("sm"))
          .agg(min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
            min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
          .select(col("pm"), col("sm"), col("pmin"), col("pmax"),
            round((col("pmax") - col("pmin")).cast("double") / (col("pm") + 1), 6)
              .cast("decimal(18,6)").as("pspan"),
            round((col("smax") - col("smin")).cast("double") / (col("sm") + 1), 6)
              .cast("decimal(18,6)").as("sspan"),
            when(col("pmin") <= expr("(55 * (pm + 1)) div 100") &&
              col("pmax") >= expr("(45 * (pm + 1)) div 100"), 1L)
              .otherwise(0L).as("hit"))
        perFile.agg(count(lit(1)).as("__n"), sum(col("pspan")).as("__ps"),
          sum(col("sspan")).as("__ss"), sum(col("hit")).as("__h"))
          .select(lit(name).as("layout"),
            col("__n").cast("long").as("n_files"),
            round(col("__ps").cast("double") / col("__n"), 6).as("avg_pk_span"),
            round(col("__ss").cast("double") / col("__n"), 6).as("avg_sk_span"),
            round(col("__h").cast("double") / col("__n"), 6).as("band_scan_frac"))
      }
      layoutStats("nb", "natural").unionByName(layoutStats("zk", "z-order"))
        .orderBy("layout")
    }),

    "q134_winsorized_stats" -> ((s, dir) => {
      // robust per-group aggregation: clamp to the exact [p05, p95]
      // (sort-based percentiles, the q106 device), then a DECIMAL-
      // ladder winsorized mean — outlier-insensitive stats without
      // dropping rows
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          dec(col("l_extendedprice")).cast("double").as("v"))
      val bounds = graft.ops.Percentiles
        .exact(li, Seq("flag"), "v", Seq(0.05, 0.95), accuracy = 1000)
        .select(col("flag"),
          round(element_at(col("pcts"), 1), 6).as("lo"),
          round(element_at(col("pcts"), 2), 6).as("hi"))
      li.join(broadcast(bounds), "flag")
        .select(col("flag"), col("lo"), col("hi"),
          least(greatest(col("v"), col("lo")), col("hi"))
            .cast("decimal(18,6)").as("w"))
        .groupBy("flag", "lo", "hi")
        .agg(count(lit(1)).cast("long").as("n"),
          // engine-proof micro mean of the decimal(18,6) clamped
          // values (q271 class — prices run to tens of thousands)
          graft.ops.Parity.round6Ratio(sum(col("w")), count(lit(1)))
            .as("wmean"))
        .orderBy("flag")
    }),

    "q135_sliding_features" -> ((s, dir) => {
      // per-event sliding ML features: count of the user's events in
      // the STRICTLY-PRIOR hour and DECIMAL-exact value sum over the
      // prior day — RANGE frames on event-time micros, so same-instant
      // ties are handled by VALUE (both excluded), deterministic
      // regardless of row order
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), dec(col("value")).as("v"))
      val w1 = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, -1L)
      val w24 = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-86400000000L, -1L)
      ev.select(col("event_id"), col("user_id"), col("us"),
        count(lit(1)).over(w1).cast("long").as("n_1h"),
        coalesce(sum(col("v")).over(w24).cast("double"), lit(0.0))
          .as("sum_24h"))
        .orderBy("event_id")
    }),

    "q136_target_encoding" -> ((s, dir) => {
      // leave-one-out mean target encoding: enc(row) = (S_g - v) /
      // (n_g - 1) — the own-row exclusion that stops the feature
      // leaking its label; singleton groups encode null. Group sums
      // are EXACT DECIMAL broadcast back; one scan + one tiny join.
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority").as("prio"), dec(col("o_totalprice")).as("v"))
      val g = o.groupBy("prio")
        .agg(sum(col("v")).as("S"), count(lit(1)).as("n"))
      o.join(broadcast(g), "prio")
        .select(col("o_orderkey"),
          when(col("n") > 1,
            round((col("S") - col("v")).cast("double") / (col("n") - 1), 6))
            .otherwise(lit(null).cast("double")).as("loo_enc"))
        .orderBy("o_orderkey")
    }),

    "q137_dataset_split" -> ((s, dir) =>
      // deterministic 80/10/10 split: md5-prefix thresholds, map-only,
      // reproducible across engines/reruns/cluster sizes; an id keeps
      // its split forever as the corpus grows
      graft.ops.Split.assignSplit(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split", "lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min(col("doc_id")).cast("long").as("min_id"),
          max(col("doc_id")).cast("long").as("max_id"))
        .orderBy("split", "lang")),

    "q138_pareto_orders" -> ((s, dir) => {
      // skyline / Pareto frontier (maximize price, maximize recency):
      // two-phase partition-local sort-and-scan — never the textbook
      // quadratic dominance self-join; tiny frontier broadcast back
      // for the surviving rows (ties all survive)
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("price"),
        col("o_orderdate").cast("date").as("od"))
      val f = graft.ops.Skyline.frontierPoints2(o,
        col("price"), unix_date(col("od")))
      o.join(broadcast(f),
        col("price") === col("x") && unix_date(col("od")) === col("y"))
        .select(col("o_orderkey"), col("price"),
          col("od").cast("string").as("od"))
        .orderBy("o_orderkey")
    }),

    "q139_ols_regression" -> ((s, dir) => {
      // per-group closed-form OLS (price ~ quantity): slope =
      // (n·Σxy − ΣxΣy) / (n·Σxx − (Σx)²), intercept from the means —
      // the q108 exact-DECIMAL-moments device extended to regression;
      // ONE map-side-combined pass, no iterative fitting
      val x = dec(col("l_quantity")); val y = dec(col("l_extendedprice"))
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round(col("sy") / col("n") -
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) *
              (col("sx") / col("n")), 6).as("intercept"))
        .orderBy("l_returnflag")
    }),

    "q140_ab_lift" -> ((s, dir) => {
      // experiment readout: treatment = odd user_id, control = even;
      // conversion = ever purchased. Lift and the two-proportion
      // z-statistic from four counts — a 4-number driver-safe readout
      // of an arbitrarily large event log
      val ev = events(s, dir)
      val users = ev.groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .select((col("user_id") % 2 === 1).as("treat"), col("conv"))
      users.groupBy("treat")
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
        .agg(
          sum(when(col("treat"), col("n"))).as("nt"),
          sum(when(col("treat"), col("c"))).as("ct"),
          sum(when(!col("treat"), col("n"))).as("nc"),
          sum(when(!col("treat"), col("c"))).as("cc"))
        .select(col("nt").cast("long").as("n_treat"),
          col("ct").cast("long").as("conv_treat"),
          col("nc").cast("long").as("n_control"),
          col("cc").cast("long").as("conv_control"),
          round(col("ct").cast("double") / col("nt") -
            col("cc").cast("double") / col("nc"), 6).as("lift"),
          // degenerate experiment (pooled rate 0 or 1) has zero
          // standard error — z is undefined, not infinite
          when(col("ct") + col("cc") === 0 ||
            col("ct") + col("cc") === col("nt") + col("nc"),
            lit(null).cast("double"))
            .otherwise(round((col("ct").cast("double") / col("nt") -
              col("cc").cast("double") / col("nc")) /
              sqrt(((col("ct") + col("cc")).cast("double") / (col("nt") + col("nc"))) *
                (lit(1.0) - (col("ct") + col("cc")).cast("double") / (col("nt") + col("nc"))) *
                (lit(1.0) / col("nt") + lit(1.0) / col("nc"))), 6)).as("z"))
    }),

    "q141_incremental_view" -> ((s, dir) => {
      // incremental view maintenance: a materialized per-flag revenue
      // aggregate maintained by MERGING the base view with a delta
      // batch's partial aggregate — the base is NEVER rescanned. The
      // oracle is the full recompute: merge(base, delta) must be
      // value-identical because count/sum are algebraic. This is the
      // incremental form of the reference's REPLACE-table dance.
      val li = t(s, dir, "lineitem")
      def partial(df: DataFrame) = df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("rev"))
      val base = partial(li.filter(col("l_orderkey") % 10 =!= 0))
      val delta = partial(li.filter(col("l_orderkey") % 10 === 0))
      base.unionByName(delta)
        .groupBy("l_returnflag")
        .agg(sum(col("n")).cast("long").as("n_items"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy("l_returnflag")
    }),

    "q142_decay_features" -> ((s, dir) => {
      // recency-weighted user value: Σ value·w(Δ) at each user's LAST
      // event, with HYPERBOLIC decay w = 1/(1 + Δdays/7) — chosen over
      // exp(−Δ/τ) deliberately: IEEE +,/ are bit-exact across engines
      // while libm exp() differs by ulps (measured: one round-6
      // boundary flip in 20k rows at sf0.01), so the rational kernel
      // keeps the fold engine-portable; per-term round-6 → DECIMAL sum
      // keeps it order-independent
      val ev = events(s, dir)
      val last = ev.groupBy("user_id").agg(max(col("ts")).as("last_ts"))
      ev.join(last, "user_id")
        .select(col("user_id"),
          round(dec(col("value")).cast("double") *
            (lit(1.0) / (lit(1.0) +
              (unix_micros(col("last_ts")) - unix_micros(col("ts")))
                .cast("double") / lit(86400000000.0) / lit(7.0))), 6)
            .cast("decimal(18,6)").as("term"))
        .groupBy("user_id")
        .agg(round(sum(col("term")).cast("double"), 6).as("decayed_value"))
        .orderBy("user_id")
    }),

    "q143_embedding_outliers" -> ((s, dir) =>
      // embedding-space curation QA: per-label centroid, exact
      // DECIMAL-ladder distances, outliers above the exact p95
      // distance — "this vector does not belong to its group"
      graft.ops.Quantize.centroidOutliers(
        t(s, dir, "embeddings").select(col("vec_id"),
          col("embedding"), col("label").cast("long").as("label")),
        "vec_id", "embedding", "label", p = 0.95)
        .orderBy("label")),

    "q144_corpus_build" -> ((s, dir) => {
      // the round-9 capstone composition in ONE declarative plan:
      // quality gate (scan stage) → exact dedup (digest shuffle) →
      // per-source quota (stratified-rank range shuffle) → dataset
      // split (map-only hash) → per-(split, source) report. Catalyst
      // sees the whole chain; gates ride the scan, text never crosses
      // an exchange after the digest stage.
      val docs = t(s, dir, "documents")
      val gated = docs.filter(TextOps.tokenCountArith(col("text")) >= 10)
      val ded = Dedup.exact(gated, Seq("text"), "doc_id")
      val scored = ded.select(col("source"), col("doc_id"),
        TextOps.once(TextOps.tokenCountArith(col("text"))).as("__nt"))
        .withColumn("__negt", -col("__nt"))
      val capped = Rank.stratifiedRank(scored, "source", Seq("__negt", "doc_id"))
        .filter(col("rk") <= 20)
      graft.ops.Split.assignSplit(capped, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split", "source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("__nt")).cast("long").as("n_tokens"),
          min(col("doc_id")).cast("long").as("first_id"))
        .orderBy("split", "source")
    }),

    "q145_event_transitions" -> ((s, dir) => {
      // first-order Markov behavior model: per-user consecutive-event
      // pairs (lead over the (ts, event_id) total order — ONE user
      // shuffle), counts into a |types|² matrix, row-normalized
      // probabilities over the tiny aggregate
      val ev = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      pairs.select(col("from_type"), col("to_type"),
        col("n").cast("long").as("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("from_type")), 6).as("p"))
        .orderBy("from_type", "to_type")
    }),

    "q146_cluster_canonical" -> ((s, dir) => {
      // near-dup clusters with QUALITY-BASED canonical selection: the
      // q50 pipeline (LSH candidates → exact verify → components), but
      // each cluster keeps its LONGEST member (tokens desc, id asc) —
      // the RefinedWeb keep-the-longest policy lifted from exact-dup
      // pairs to whole near-dup clusters. The rank window runs per
      // component (cluster-sized groups, never the corpus).
      val docs = t(s, dir, "documents")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 32, shingleSize = 3)
      val verified = Dedup.ngramJaccardPairs(
        Dedup.candidateDocs(docs, "doc_id", cands),
        "doc_id", "text", n = 3, threshold = 0.9,
        maxDocFreq = Long.MaxValue)
      val comps = Dedup.connectedComponents(verified)
      val sized = comps.join(docs, col("id") === col("doc_id"))
        .select(col("comp"), col("id"),
          TextOps.once(TextOps.tokenCountArith(col("text"))).as("__nt"))
      val w = Window.partitionBy("comp")
        .orderBy(col("__nt").desc, col("id").asc)
      sized.withColumn("__rk", row_number().over(w))
        .groupBy("comp")
        .agg(count(lit(1)).cast("long").as("cluster_size"),
          max(when(col("__rk") === 1, col("id"))).cast("long")
            .as("canonical_id"),
          max(when(col("__rk") === 1, col("__nt"))).cast("long")
            .as("canonical_tokens"))
        .orderBy("comp")
    }),

    "q147_equidepth_histogram" -> ((s, dir) => {
      // equi-DEPTH complement of q107's equi-width bins: exact decile
      // boundaries (sort-based percentiles), then bucket counts — the
      // boundary row convention pinned as half-open [lo, hi), last
      // bucket closed
      val li = t(s, dir, "lineitem")
        .select(dec(col("l_extendedprice")).cast("double").as("v"))
      // nine decile boundaries from the DISTRIBUTED exact selection
      // (Percentiles.exact: approx brackets → exact rank pick) — the
      // round-9 array-percentile form was one pass but still merged a
      // full value-distribution buffer on ONE reducer; this shape
      // bounds every task by O(n/accuracy) while staying bit-identical
      // to the builtin (PercentilesSpec)
      val bounds = graft.ops.Percentiles
        .exact(li, Nil, "v", (1 to 9).map(_ / 10.0), accuracy = 1000)
        .select((1 to 9).map(d =>
          round(element_at(col("pcts"), d), 6).as(s"b$d")): _*)
      val bucket = (1 to 9).foldRight(lit(9L): Column) { (d, acc) =>
        when(col("v") < col(s"b$d"), lit(d - 1).cast("long")).otherwise(acc)
      }
      li.crossJoin(broadcast(bounds))
        .select(bucket.as("bucket"), col("v").cast("decimal(18,2)").as("__v"))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("__v")).cast("double").as("lo"),
          max(col("__v")).cast("double").as("hi"))
        .orderBy("bucket")
    }),

    "q148_source_ks_drift" -> ((s, dir) => {
      // distribution drift beyond q118's KL: two-sample
      // Kolmogorov–Smirnov statistic between each source's doc-length
      // distribution and the whole corpus — max |ECDF difference| over
      // the observed support. ECDFs come from cumulative counts over
      // the (source × distinct length) grid, so the whole computation
      // is counts + windows over a grid bounded by |sources| ×
      // |distinct lengths|, never corpus-sized state.
      val docs = t(s, dir, "documents")
        .select(col("source"), col("n_chars").cast("long").as("len"))
      val grid = docs.select("source").distinct()
        .crossJoin(docs.select("len").distinct())
      val perSrc = docs.groupBy("source", "len").agg(count(lit(1)).as("c"))
      val srcTot = docs.groupBy("source").agg(count(lit(1)).as("ns"))
      val corpus = docs.groupBy("len").agg(count(lit(1)).as("cc"))
      val nTot = docs.agg(count(lit(1)).as("nc"))
      val wcum = Window.partitionBy("source").orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(perSrc, Seq("source", "len"), "left")
        .join(broadcast(corpus), Seq("len"))
        .join(broadcast(srcTot), Seq("source"))
        .crossJoin(broadcast(nTot))
        .select(col("source"), col("len"),
          coalesce(col("c"), lit(0L)).as("c"),
          col("cc"), col("ns"), col("nc"))
        .withColumn("fs", sum(col("c")).over(wcum).cast("double") / col("ns"))
        .withColumn("fc", sum(col("cc")).over(wcum).cast("double") / col("nc"))
        .groupBy("source")
        .agg(round(max(abs(col("fs") - col("fc"))), 6).as("ks"))
        .orderBy("source")
    }),

    "q149_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: lexical BM25 (q103's scorer) and dense
      // cosine ANN (q28's scorer) fused by reciprocal-rank fusion —
      // rank-based, so the two systems' incomparable scores never
      // need calibration. Both runs are top-20 TakeOrdered outputs,
      // so the rank windows and the fusion aggregate run on ≤ 40 rows;
      // the corpus-scale work keeps q103/q28's scan shapes.
      val docs = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val bm = CorpusStats.bm25(docs, "doc_id", "text",
        Seq("spark", "join", "window"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
      val cs = Similarity.cosineTopK(e, "vec_id", "embedding", qv, 20)
        .select(col("vec_id").as("doc_id"), col("cos_sim"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cos_sim").desc, col("doc_id"))))
      CorpusStats.reciprocalRankFusion(
        Seq(bm.select("doc_id", "rank"), cs.select("doc_id", "rank")),
        "doc_id")
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }),

    "q150_blocked_er" -> ((s, dir) =>
      // blocked entity resolution over product listings: compare only
      // within (brand × name-noun) blocks, match at Levenshtein ≤ 5 —
      // one hash shuffle on the block key, Σ|block|² comparisons
      // instead of N²/2, skew-capped (ops/Linkage.scala)
      Linkage.blockedPairs(t(s, dir, "part"), "p_partkey", "p_name",
        struct(col("p_brand"),
          regexp_extract(col("p_name"), "(\\S+)$", 1)),
        maxDistance = 5)
        .orderBy("id_a", "id_b")),

    "q151_gap_fill" -> ((s, dir) =>
      // resample the sparse high-value event stream to a DENSE hourly
      // grid per type: gap hours appear with n=0 and the last observed
      // hourly total carried forward (LOCF) — the regularization step
      // before any fixed-step time-series model. Grid generation is
      // map-side from per-key (min, max) rows; windows run over the
      // aggregated series, never the corpus.
      TimeSeries.gapFillHourly(
        events(s, dir).filter(col("value") > 300),
        "event_type", "ts", "value")
        .orderBy("event_type", "hr")),

    "q152_column_profile" -> ((s, dir) =>
      // per-column completeness/cardinality profile in long format —
      // the pre-ingest data-quality report. Oracle mode uses exact
      // distinct counts; the 100 TB mode is the same call with
      // exact=false (one pass, HLL counters, no Expand) — ProfileSpec
      // pins both modes agree on this corpus.
      Profile.columnProfile(t(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("column_name")),

    "q153_mean_shift" -> ((s, dir) =>
      // two-window mean-shift changepoint score on the daily revenue
      // series per event type: recent-7-day mean vs the prior 7 days,
      // emitted only where both windows are full — pure window algebra
      // over the (type × day) aggregate, no recursive state
      TimeSeries.meanShiftDaily(events(s, dir), "event_type", "ts",
        "value", w = 7)
        .orderBy("event_type", "day")),

    "q154_scd2_history" -> ((s, dir) =>
      // SCD Type-2 dimension history from the event changelog: every
      // change becomes a [valid_from, valid_to) version, open version
      // flagged current — q123's compaction minus the keep-only-winner
      // filter, same one-shuffle window plan
      Cdc.scd2History(
        events(s, dir)
          .select("event_id", "user_id", "ts", "event_type"),
        Seq("user_id"), "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
        .orderBy("user_id", "valid_from_us", "event_id")),

    "q155_sorted_neighborhood" -> ((s, dir) =>
      // the ER path when no equality blocking key exists: global sort
      // by name, compare each record with its 10 successors — rank
      // rides the stratified-rank device (one range shuffle, no
      // single-task window), pairing buckets by floor(rank/window)
      Linkage.sortedNeighborhoodPairs(t(s, dir, "part"),
        "p_partkey", "p_name", col("p_name"),
        window = 10, maxDistance = 4)
        .orderBy("id_a", "id_b")),

    "q156_market_basket" -> ((s, dir) =>
      // pair supports for association mining: items co-bought in ≥ 2
      // orders; one basket shuffle + bounded per-basket explode — no
      // corpus self-join
      Basket.cooccurrence(t(s, dir, "lineitem"), "l_orderkey",
        "l_partkey", minSupport = 2L)
        .orderBy("item_a", "item_b")),

    "q157_association_rules" -> ((s, dir) =>
      // confidence/lift rules over the q156 pair supports; lift in
      // the factored overflow-free form (conf · N / n_cons) so the
      // doubles are two IEEE ops both engines evaluate identically
      Basket.associationRules(t(s, dir, "lineitem"), "l_orderkey",
        "l_partkey", minSupport = 2L, minConfidence = 0.10)
        .orderBy("antecedent", "consequent")),

    "q158_mad_outliers" -> ((s, dir) =>
      // robust outliers: |v − median| > 3·1.4826·MAD per event type —
      // the 50%-breakdown-point complement of q82's z-scores; both
      // selections run the distributed exact-percentile path
      Robust.madOutliers(t(s, dir, "events"), Seq("event_type"), "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"))
        .orderBy("event_id")),

    "q159_fk_audit" -> ((s, dir) =>
      // cross-table data-quality audit: rows/null-keys/orphans per
      // declared FK relation; parent keys deduped so the left join
      // never multiplies, AQE broadcasts dimension-sized parents
      Quality.fkAudit(Seq(
        ("lineitem.l_orderkey->orders.o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        ("orders.o_custkey->customer.c_custkey",
          t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        ("customer.c_nationkey->nation.n_nationkey",
          t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        ("events.user_id->customer.c_custkey",
          t(s, dir, "events"), "user_id",
          t(s, dir, "customer"), "c_custkey")))
        .orderBy("relation")),

    "q160_tree_closure" -> ((s, dir) =>
      // hierarchy rollup by pointer doubling: a depth-D forest closes
      // in ceil(log2 D) self-joins of the N-row jump relation, never
      // D sequential joins and never a driver loop; the oracle walks
      // the same derived forest with a recursive CTE
      Graph.rootAndDepth(
        t(s, dir, "customer").select(col("c_custkey").as("node"),
          when(col("c_custkey") === 1, lit(null).cast("long"))
            .otherwise(greatest(lit(1L),
              expr("c_custkey div (2 + c_custkey % 5)"))).as("parent")),
        "node", "parent", maxDepth = 64)
        .orderBy("node")),

    "q161_gini_concentration" -> ((s, dir) =>
      // per-source char-mass inequality: exact DECIMAL rank-identity
      // sums over the stratified-rank device, one range shuffle
      Concentration.gini(t(s, dir, "documents"), "source", "n_chars",
        "doc_id")
        .withColumnRenamed("n", "n_docs")
        .withColumnRenamed("total", "total_chars")
        .orderBy("source")),

    "q162_jaro_winkler_pairs" -> ((s, dir) =>
      // name-comparator ER: brand-blocked pairs scored by the compiled
      // graft_jaro_winkler kernel — bit-parity with DuckDB's
      // jaro_winkler_similarity (pinned on 5000 randomized cases), so
      // the ≥ τ cut selects identical pairs in both engines
      Linkage.jaroWinklerPairs(t(s, dir, "part"),
        "p_partkey", "p_name", col("p_brand"), minSimilarity = 0.90)
        .orderBy("id_a", "id_b")),

    "q163_funnel_latency" -> ((s, dir) => {
      // time-to-convert: first signup → first subsequent purchase per
      // user, exact p50/p90 of the latency via the distributed
      // bracketed selection (no single-reducer percentile buffer).
      // exactTenths, not exact: the outputs are RAW integer
      // microseconds (~10⁹ — far past the |x| ≈ 2³³ point where
      // round-6 itself diverges), so the only engine-proof emission
      // is the all-integer interpolation; the oracle mirrors it with
      // a ROW_NUMBER rank pick + the same ((10−d)·vlo + d·vhi)/10
      val ev = events(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("su_us"))
      val lat = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pu_us"))
        .join(su, "user_id")
        .filter(col("pu_us") >= col("su_us"))
        .groupBy("user_id", "su_us").agg(min("pu_us").as("pu_us"))
        .select((col("pu_us") - col("su_us")).cast("double").as("lat_us"))
      graft.ops.Percentiles.exactTenths(lat, Seq.empty, "lat_us",
        Seq(0.5, 0.9))
        .select(col("n").as("n_converted"),
          element_at(col("pcts"), 1).as("p50_us"),
          element_at(col("pcts"), 2).as("p90_us"))
    }),

    "q164_sliding_distinct_users" -> ((s, dir) =>
      // trailing-7-day active users, EXACT without per-day
      // count_distinct: contribution explode over the deduped
      // (user, day) relation, then plain map-side-combined counts
      Events.slidingDistinctUsers(events(s, dir), "user_id", "ts",
        windowDays = 7)
        .orderBy("day")),

    "q165_rolling_median" -> ((s, dir) =>
      // rolling robust smoothing: exact trailing-7 median per user —
      // ROWS-bounded frame, so the percentile buffer is constant-sized
      // (the bounded-frame complement of the Percentiles.exact family).
      // round-6 both sides: the raw median interpolates cents doubles
      // at frac 0.5 — bitwise-equal on the CURRENT DuckDB build
      // ((1−f)·lo + f·hi form), but the lo + f·(hi−lo) form flips
      // ~13% of cents pairs (measured), so the raw emission is
      // build-fragile the way q271 was; exact values have ≤ 3
      // decimals at cents magnitude, far from any .5-micro boundary
      TimeSeries.rollingMedian(events(s, dir), "user_id",
        Seq("ts", "event_id"), "value", window = 7)
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("med_7"), 6).as("med_7"))
        .orderBy("event_id")),

    "q166_psi_drift" -> ((s, dir) => {
      // population-stability drift gate: first-half vs second-half
      // event values over fixed-width buckets; round-6-LN ladder term
      // sum keeps the statistic engine-portable
      val ev = events(s, dir)
        .select(unix_micros(col("ts")).as("us"), col("value"))
      val mm = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      val tagged = ev.crossJoin(broadcast(mm))
      CorpusStats.psi(tagged,
        col("us") <= expr("(lo + hi) div 2"),
        least(lit(19L), floor(col("value") / lit(25.0)).cast("long")))
    }),

    "q167_linear_attribution" -> ((s, dir) =>
      // multi-touch credit: each purchase splits one unit across the
      // user's click/view touches in the prior 7 days; untouched
      // purchases credit '(none)' whole; round-6 DECIMAL credit sums
      Events.linearAttribution(events(s, dir), "user_id", "ts",
        "event_id", "event_type", conversionType = "purchase",
        touchTypes = Seq("click", "view"), windowUs = 604800000000L)
        .orderBy("channel")),

    "q168_source_overlap" -> ((s, dir) =>
      // corpus-provenance audit: which sources share identical
      // leading-64-char segments — digest-only shuffle, group sets
      // bounded by actual sharers, maxGroups fail-fast
      Dedup.crossGroupOverlap(
        t(s, dir, "documents")
          .withColumn("seg", substring(col("text"), 1, 64)),
        Seq("seg"), "source")
        .orderBy("group_a", "group_b")),

    "q169_woe_encoding" -> ((s, dir) =>
      // weight-of-evidence table: error-vs-ok label over the q166
      // value buckets, Laplace-smoothed; the IV statistic is q166's
      // psi with slices = label classes
      CorpusStats.woe(events(s, dir),
        col("event_type") =!= "error",
        least(lit(19L), floor(col("value") / lit(25.0)).cast("long")))
        .orderBy("bucket")),

    "q170_prefix_filter_jaccard" -> ((s, dir) =>
      // EXACT set-similarity self-join via prefix filtering (PPJoin
      // family): candidates only where rarest-first prefixes collide,
      // fail-fast bucket guard (completeness is the contract — no
      // silent drops); oracle is the brute-force all-pairs spec
      Dedup.prefixFilterJaccardPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")),

    "q171_heavy_hitters" -> ((s, dir) =>
      // join-key skew diagnosis: exact top-20 keys with share and
      // cumulative share; distinct-key-sized count shuffle, K-row
      // window only
      Skew.heavyHitterReport(t(s, dir, "lineitem"), "l_partkey",
        topK = 20)
        .orderBy("rank")),

    "q172_peak_concurrency" -> ((s, dir) =>
      // capacity planning by sweep line: max simultaneously-open
      // 30-min event intervals per type + first instant of the peak;
      // running concurrency rides the two-phase prefix-sum device
      Events.peakConcurrency(events(s, dir), "event_type", "ts",
        "event_id", durationUs = 1800000000L)
        .orderBy("event_type")),

    "q173_theil_sen_trend" -> ((s, dir) =>
      // robust daily trend: median of pairwise slopes (29.3%
      // breakdown) — the complement of q139's outlier-following OLS;
      // slope median runs the distributed exact selection
      TimeSeries.theilSenDaily(events(s, dir), "event_type", "ts")
        .orderBy("event_type")),

    "q174_twap" -> ((s, dir) =>
      // time-weighted average value per type: each observation holds
      // until the next; round-6 DECIMAL(28,6) term ladder, one key
      // shuffle
      TimeSeries.twap(events(s, dir), "event_type", "ts", "event_id",
        "value")
        .orderBy("event_type")),

    "q175_sla_percentiles" -> ((s, dir) =>
      // SLA matrix: exact p95/p99 of value per (type, day) — the
      // exact-percentile path exercised at ~150-group granularity,
      // small groups taking the full-range bracket regime. round-6
      // on both sides: Spark interpolates (hi-pos)·vlo+(pos-lo)·vhi,
      // DuckDB vlo+frac·(vhi-vlo) — one ulp apart at sf1 group sizes
      // (the 10× gate caught 230.33 vs …29999999999998); the exact
      // value has ≤4 decimals (cents values × 2-decimal fractions),
      // so round-6 absorbs the formula-order gap (q106 precedent)
      graft.ops.Percentiles.exact(
        events(s, dir).select(col("event_type"),
          TimeSeries.epochDay(col("ts")).as("day"), col("value")),
        Seq("event_type", "day"), "value", Seq(0.95, 0.99))
        .select(col("event_type"), col("day"), col("n"),
          round(element_at(col("pcts"), 1), 6).as("p95"),
          round(element_at(col("pcts"), 2), 6).as("p99"))
        .orderBy("event_type", "day")),

    "q176_diff_in_diff" -> ((s, dir) => {
      // difference-in-differences readout: derived treatment
      // (even user_id) × period (corpus midpoint); four exact
      // DECIMAL(18,2) means, one fixed IEEE closing tree
      val ev = events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("value"))
      val mm = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      val tagged = ev.crossJoin(broadcast(mm))
        .select((col("user_id") % 2 === 0).as("tr"),
          (col("us") > expr("(lo + hi) div 2")).as("post"), col("value"))
      def mean(t: Boolean, p: Boolean) =
        sum(when(col("tr") === t && col("post") === p,
          col("value").cast("decimal(18,2)"))).cast("double") /
          sum(when(col("tr") === t && col("post") === p, 1L)).cast("double")
      tagged.agg(
        mean(true, false).as("mean_treat_pre"),
        mean(true, true).as("mean_treat_post"),
        mean(false, false).as("mean_ctrl_pre"),
        mean(false, true).as("mean_ctrl_post"))
        .withColumn("did",
          (col("mean_treat_post") - col("mean_treat_pre")) -
            (col("mean_ctrl_post") - col("mean_ctrl_pre")))
    }),

    "q177_mmr_rerank" -> ((s, dir) => {
      // diversity re-ranking: corpus scoring + pool stay distributed;
      // only the ≤ pool² scored matrix collects for the inherently
      // sequential greedy (oracle unrolls the same 5 steps in SQL)
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Similarity.mmrSelect(e, "vec_id", "embedding", q,
        k = 5, poolSize = 20, lambda = 0.5)
        .withColumnRenamed("id", "vec_id")
        .orderBy("step")
    }),

    "q178_temporal_split" -> ((s, dir) => {
      // leakage-safe ML eval split: everything after the exact p90
      // timestamp is holdout (id-hash splits like q137 leak future
      // events into training for time-series models); the boundary
      // runs the distributed exact selection
      val ev = events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val bnd = graft.ops.Percentiles.exactOne(ev, Seq.empty, "us", 0.9)
        .select(col("pct").as("cut"))
      ev.crossJoin(broadcast(bnd))
        .groupBy(col("event_type"),
          when(col("us").cast("double") <= col("cut"), "train")
            .otherwise("holdout").as("split"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("event_type", "split")
    }),

    "q179_homoglyph_fold" -> ((s, dir) => {
      // adversarial dedup: deterministically corrupt a third of the
      // corpus with Cyrillic confusables, then show the fold restores
      // byte-equality with the clean text — counts only, per source
      val docs = t(s, dir, "documents")
        .withColumn("adv", when(col("doc_id") % 3 === 0,
          translate(col("text"), "aeo", "аео"))
          .otherwise(col("text")))
      docs.groupBy("source").agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("adv") =!= col("text"), 1L).otherwise(0L))
          .cast("long").as("n_corrupted"),
        sum(when(TextOps.foldHomoglyphs(col("adv")) === col("text"), 1L)
          .otherwise(0L)).cast("long").as("n_restored"))
        .orderBy("source")
    }),

    "q180_kaplan_meier" -> ((s, dir) =>
      // survival analysis: time to first purchase per user, users who
      // never purchase right-censored at the corpus horizon; the life
      // table after the per-user aggregate is span-days-sized
      Events.kaplanMeier(events(s, dir), "user_id", "ts",
        col("event_type") === "purchase")
        .orderBy("day")),

    "q181_chi_square" -> ((s, dir) =>
      // corpus-composition gate: is language independent of source?
      // cells-sized aggregate, one-row readout
      CorpusStats.chiSquare(t(s, dir, "documents"), "lang", "source")),

    "q182_mann_whitney" -> ((s, dir) =>
      // nonparametric slice comparison: do purchase events carry
      // stochastically larger values than the rest? rank sums in
      // doubled-integer units on the distributed prefix device
      Robust.mannWhitneyU(events(s, dir), "value",
        col("event_type") === "purchase")),

    "q183_source_jsd" -> ((s, dir) =>
      // bounded symmetric drift: JSD(source || rest) on unigrams —
      // finite even for vocabulary no other source shares, unlike
      // q118's KL against the corpus
      CorpusStats.sourceJsd(t(s, dir, "documents"), "source", "text")
        .orderBy("source")),

    "q184_readability" -> ((s, dir) =>
      // Flesch–Kincaid grade per doc from regex-countable proxies —
      // map-only scan-stage counters, the fluency gate next to q22's
      // ratio gates
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCountArith(col("text")).as("n_words"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"),
          lit(0))), lit(1)).cast("long").as("n_sentences"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"),
          lit(0))).cast("long").as("n_syllables"),
        TextOps.readability(col("text")).as("fk_grade"))
        .orderBy("doc_id")),

    "q185_gram_novelty" -> ((s, dir) =>
      // per-doc cross-corpus novelty: the N-way boilerplate readout
      // pairwise dedup can't see; linear in grams, no pair join
      Dedup.crossDocNovelty(t(s, dir, "documents"), "doc_id", "text",
        n = 3)
        .orderBy("doc_id")),

    "q186_label_propagation" -> ((s, dir) => {
      // community detection on the nation trade graph (q111's edges
      // read undirected): 2 deterministic synchronous LPA rounds
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .groupBy(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
        // r19: labelPropagation mirrors its edge relation (unionAll of
        // both directions) — materialize the nations²-bounded
        // aggregate once instead of relying on exchange reuse to
        // dedupe the 4-way lineitem join under both union branches
        .localCheckpoint()
      Graph.labelPropagation(edges, "src", "dst", "w", rounds = 2)
        .select(col("node").cast("long").as("node"),
          col("label").cast("long").as("label"))
        .orderBy("node")
    }),

    "q187_sequence_patterns" -> ((s, dir) =>
      // GSP-style support for every ordered event-type triple via the
      // greedy min-chain (three subject-keyed joins, alphabet-bounded
      // blow-up — never a cubic self-join)
      Events.subsequenceSupport(events(s, dir), "user_id", "ts",
        "event_type", minSupport = 5L)
        .orderBy(col("n_subjects").desc, col("step1"), col("step2"),
          col("step3"))),

    "q188_quantile_normalize" -> ((s, dir) =>
      // rank-uniform feature scaling per market segment: the
      // normalization table (value → mid-rank quantile), integral
      // numerator on the distributed prefix device
      Rank.quantileNormalize(t(s, dir, "customer"), "c_mktsegment",
        "c_acctbal")
        .orderBy("c_mktsegment", "c_acctbal")),

    "q189_rfm_segments" -> ((s, dir) =>
      // behavioral segmentation: recency/frequency/monetary quintiles
      // by the exact integral split, subject-id tie-breaks — the
      // segmentation is a pure function of the data
      Events.rfmSegments(events(s, dir), "user_id", "ts",
        col("event_type") === "purchase", "value")
        .orderBy("user_id")),

    "q190_term_burstiness" -> ((s, dir) =>
      // Church–Gale tf/df: within-doc repetition vs corpus spread —
      // the boilerplate/content-word separator next to q65's tf-idf
      CorpusStats.termBurstiness(t(s, dir, "documents"), "doc_id",
        "text", minDf = 5L, topK = 50)),

    "q191_benford" -> ((s, dir) =>
      // first-digit law audit on order totals; expected shares are
      // fixed round-6 constants so neither engine's log10 is compared
      Profile.benford(t(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")),

    "q192_centroid_cosine" -> ((s, dir) =>
      // cluster-confusability matrix: pairwise cosine of per-label
      // centroids — the shuffle carries (label, dim) partials, never
      // vectors; the pair join is label-alphabet-bounded
      Similarity.labelCentroidCosine(t(s, dir, "embeddings"), "label",
        "embedding")
        .select(col("label_a").cast("long").as("label_a"),
          col("label_b").cast("long").as("label_b"), col("cosine"))
        .orderBy("label_a", "label_b")),

    "q193_holt_forecast" -> ((s, dir) =>
      // double exponential smoothing per event type over daily
      // DECIMAL totals; round-6 per step, (1-α) shared with the
      // oracle as ONE Scala double (1 ulp from the 0.7 literal)
      TimeSeries.holtLinear(events(s, dir), "event_type", "ts", "value",
        alpha = 0.3, beta = 0.1, horizon = 7)
        .orderBy("event_type")),

    "q194_feature_hashing" -> ((s, dir) =>
      // vocabulary-free signed sparse vectorization (the hashing
      // trick) on the portable md5 device — map-only hash, one
      // (doc, dim) aggregate, no fitted state
      TextOps.featureHash(t(s, dir, "documents"), "doc_id", "text",
        dims = 256)
        .orderBy("doc_id", "dim")),

    "q195_spearman" -> ((s, dir) =>
      // monotone association per return flag on the doubled-mid-rank
      // integral device — the whale-proof complement of q108's
      // moment-exact Pearson. persistProjection: the two value tables
      // are corpus aggregates the value-pinned device reads 3× each
      // (measured +1.8 s without it at sf0.1, round 12)
      Robust.spearman(t(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", "l_extendedprice", persistProjection = true)
        .orderBy("l_returnflag")),

    "q196_autocorrelation" -> ((s, dir) =>
      // lag-1..7 ACF of daily totals per event type: exact decimal
      // moments + one fixed double expression — decides whether
      // q193's trend smoothing is warranted
      TimeSeries.autocorr(events(s, dir), "event_type", "ts", "value",
        maxLag = 7)
        .orderBy("event_type", "lag")),

    "q197_key_skew_audit" -> ((s, dir) =>
      // pre-join skew audit of the orders→customer key: multiplicity
      // percentiles ride the bracketed two-pass exact selection;
      // `skew` is the q132 salting trigger
      Profile.keySkew(t(s, dir, "orders"), "o_custkey")),

    "q198_cramers_v" -> ((s, dir) => {
      // association STRENGTH across three differently-sized
      // contingency tables — χ² alone grows with n and cannot rank
      // them; V is the [0,1] readout that can
      def one(pair: String, df: DataFrame, r: String, c: String) =
        CorpusStats.cramersV(df, r, c).select(lit(pair).as("pair"),
          col("chi2"), col("dof"), col("n"), col("v"))
      one("docs_lang_source", t(s, dir, "documents"), "lang", "source")
        .unionByName(one("orders_status_priority", t(s, dir, "orders"),
          "o_orderstatus", "o_orderpriority"))
        .unionByName(one("customer_segment_nation", t(s, dir, "customer"),
          "c_mktsegment", "c_nationkey"))
        .orderBy("pair")
    }),

    "q199_anova_f" -> ((s, dir) =>
      // one-way ANOVA over event values by type — the k-sample
      // extension of q140's two-arm readout, one map-side-combined
      // aggregate to the k-row table
      Robust.anovaF(events(s, dir), "event_type", "value")),

    "q200_dow_profile" -> ((s, dir) =>
      // day-of-week seasonality shares from the portable epoch-day
      // weekday (never an engine DOW builtin — Spark and DuckDB
      // disagree on week origin)
      TimeSeries.dowProfile(events(s, dir), "event_type", "ts", "value")
        .orderBy("event_type", "isodow")),

    "q201_cohort_ltv" -> ((s, dir) =>
      // the monetary extension of q93's retention: cumulative
      // per-user revenue by acquisition week × age — decimal-exact
      // up to the final per-user division
      Events.cohortLtv(events(s, dir), "user_id", "ts", "value")
        .orderBy("cohort_week", "age_week")),

    "q202_equal_width_histogram" -> ((s, dir) =>
      // fixed-grid complement of q147's equi-depth: bin index in
      // integer cents (never an IEEE division on a bin boundary)
      Profile.equalWidthHistogram(t(s, dir, "orders"), "o_totalprice",
        bins = 20)
        .orderBy("bin")),

    "q203_debounce" -> ((s, dir) =>
      // one-hour per-user throttle before sessionization — retry
      // storms and double-fires drop out on the q32 floor-seconds
      // device; (ts, event_type) is a total per-user order here
      Events.debounce(events(s, dir), Seq("user_id"), "ts",
        Seq("event_type"), minGapSeconds = 3600L)
        .select(col("user_id"), col("ts").cast("long").as("ts_sec"),
          col("event_type"))
        .orderBy("user_id", "ts_sec", "event_type")),

    "q204_length_entropy_spearman" -> ((s, dir) => {
      // composition capstone: does character diversity scale with
      // length per source? The compiled entropy kernel (q72) feeds
      // the doubled-mid-rank Spearman device (q195) — ranks consume
      // only the ORDER of the round-6 entropy values, which the q72
      // oracle already pins value-exact
      val docs = t(s, dir, "documents").filter(length(col("text")) > 0)
      val scored = docs.select(col("source"),
        length(col("text")).cast("long").as("len"),
        TextOps.charEntropy(col("text")).as("ent"))
      Robust.spearman(scored, "source", "len", "ent",
        widenBase = false) // 5k-doc base: the widen exchange is pure
                           // overhead here (r18 A/B)
        .orderBy("source")
    }),

    "q205_robust_shape" -> ((s, dir) =>
      // whale-immune distribution shape per priority class: Bowley
      // skew + Moors kurtosis from the seven exact octiles (one
      // bracketed-selection pass serves all seven boundaries)
      Robust.robustShape(
        t(s, dir, "orders").select(col("o_orderpriority"),
          dec(col("o_totalprice")).cast("double").as("__p")),
        Seq("o_orderpriority"), "__p")
        .orderBy("o_orderpriority")),

    "q206_lorenz_curve" -> ((s, dir) =>
      // the curve behind q161's Gini scalar: cumulative value share
      // at each population decile, integer-cents exact up to the two
      // closing share divisions
      Concentration.lorenzDeciles(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice", "o_orderkey")
        .orderBy("o_orderpriority", "bucket")),

    "q207_vocab_stats" -> ((s, dir) =>
      // vocabulary richness per source: TTR + hapax share — the
      // low-TTR boilerplate smell next to q96's Zipf slope, one
      // vocabulary-sized aggregate
      CorpusStats.vocabStats(t(s, dir, "documents"), "source", "text")
        .orderBy("source")),

    "q208_growth_accounting" -> ((s, dir) =>
      // weekly new/retained/resurrected/churned ledger — the
      // decomposition behind q93's retention; churn bounded to the
      // observed weeks
      Events.growthAccounting(events(s, dir), "user_id", "ts")
        .orderBy("week")),

    "q209_session_stats" -> ((s, dir) => {
      // composition: the q32 sessionize device feeds per-session
      // durations (floor-seconds, exact longs) into the bracketed
      // exact-percentile selection — the session-quality readout
      // (p50/p90 duration, events/session) product teams watch
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val sess = events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (col("ts").cast("long") - col("prev_ts").cast("long")) > 1800,
            1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg((max(col("ts").cast("long")) - min(col("ts").cast("long")))
          .as("dur"), count(lit(1)).as("ne"))
        // r18: the sessionize window + aggregate feeds the percentile
        // device (three passes) AND the final totals — materialize the
        // session-sized relation once
        .localCheckpoint()
      val pct = graft.ops.Percentiles
        .exact(sess.select(col("dur").cast("double").as("dur")),
          Seq.empty, "dur", Seq(0.5, 0.9))
        .select(round(element_at(col("pcts"), 1), 6).as("p50_duration_s"),
          round(element_at(col("pcts"), 2), 6).as("p90_duration_s"))
      sess.agg(count(lit(1)).as("n_sessions"),
        sum(col("ne")).as("n_events"), sum(col("dur")).as("sum_dur"))
        .crossJoin(broadcast(pct))
        .select(col("n_sessions").cast("long").as("n_sessions"),
          col("n_events").cast("long").as("n_events"),
          // engine-proof micro means (q271 class — durations run to
          // thousands of seconds)
          graft.ops.Parity.round6Ratio(col("n_events"), col("n_sessions"))
            .as("events_per_session"),
          graft.ops.Parity.round6Ratio(col("sum_dur"), col("n_sessions"))
            .as("mean_duration_s"),
          col("p50_duration_s"), col("p90_duration_s"))
    }),

    "q210_prefix_cluster_sizes" -> ((s, dir) =>
      // how templated is the corpus? — boilerplate-opening clusters:
      // documents sharing their first five lowercased tokens, sized
      // and summed into the rows a prefix-dedup pass would shed
      // (md5(text) clusters are all singletons in this corpus — the
      // PREFIX key is what catches templated openings); two keyed
      // map-side-combined aggregates
      t(s, dir, "documents")
        .groupBy(array_join(
          slice(TextOps.tokens(lower(col("text"))), 1, 5), " ").as("__p"))
        .agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size").cast("long").as("cluster_size"),
          col("n_clusters").cast("long").as("n_clusters"),
          ((col("cluster_size") - 1) * col("n_clusters")).cast("long")
            .as("n_removable"))
        .orderBy("cluster_size")),

    "q211_cross_source_prefix_dups" -> ((s, dir) => {
      // cross-source boilerplate leakage: the same five-token opening
      // under TWO sources — the contamination count that decides
      // whether source-level splits are independent. The pair join
      // runs on the DISTINCT (prefix, source) relation, bounded by
      // sources² per prefix, never |docs|²
      val ds = t(s, dir, "documents")
        .select(array_join(
          slice(TextOps.tokens(lower(col("text"))), 1, 5), " ").as("__p"),
          col("source")).distinct()
      val a = ds.select(col("__p"), col("source").as("source_a"))
      val b = ds.select(col("__p"), col("source").as("source_b"))
      a.join(b, Seq("__p"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_shared_prefixes"))
        .orderBy("source_a", "source_b")
    }),

    "q212_norm_profile" -> ((s, dir) =>
      // are the embeddings normalized, and uniformly so per label? —
      // the sanity gate before any cosine/IVF work (an unnormalized
      // slice silently reweights every dot product). Per-row norms
      // via the compiled dot kernel, round-6 into DECIMAL so the
      // mean's summation is order-free
      t(s, dir, "embeddings")
        .select(col("label"),
          round(graft.ops.Similarity.norm(
            col("embedding").cast("array<double>")), 6)
            .cast("decimal(18,6)").as("__nm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), min(col("__nm")).as("__mn"),
          max(col("__nm")).as("__mx"),
          sum(col("__nm")).as("__s"))
        .select(col("label").cast("long").as("label"),
          col("n").cast("long").as("n"),
          col("__mn").cast("double").as("min_norm"),
          col("__mx").cast("double").as("max_norm"),
          // mean of round-6 decimal norms through the engine-proof
          // micro device (q271 class)
          graft.ops.Parity.round6Ratio(col("__s"), col("n"))
            .as("mean_norm"))
        .orderBy("label")),

    "q213_winnow_default" -> ((s, dir) =>
      // the PRODUCTION winnow path: shipped defaults only (k=20,
      // window=8, minShared=3, maxBucket=20 — the measured-linear
      // config from the SCALE.md round-9/10 rehearsals), no pinned
      // args. q129 keeps the historical k=12/maxBucket=100 pinned for
      // its short-doc reading; THIS row is the one a user copies.
      Dedup.winnowCandidates(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    "q214_gate_agreement" -> ((s, dir) => {
      // do the two cheap curation gates agree beyond chance? — the
      // C4 rule gate (q71) vs the heuristic quality gate (q76 score
      // ≥ 0.75), audited with Cohen's κ and McNemar's χ² on the
      // discordant cells; one map-side-combined corpus aggregate
      val gated = TextOps.c4Rules(t(s, dir, "documents"), "doc_id",
        "text", passthrough = Seq("text"))
      graft.ops.Eval.gateAgreement(gated, col("keep"),
        TextOps.qualityScore(col("text")) >= 0.75)
    }),

    "q215_roc_curve" -> ((s, dir) => {
      // stopword share as an is-English detector: the binned ROC
      // curve (10 equal-width score bands, q202 integer device);
      // exact tie-averaged AUC is q182's cles — this is the SHAPE
      val scored = t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.stopwordHits(col("text")).cast("double") /
          TextOps.tokenCountArith(col("text")).cast("double"), 6)
          .as("score"),
        col("lang"))
      graft.ops.Eval.rocCurve(scored, "score", col("lang") === "en",
        points = 10).orderBy(col("band").desc)
    }),

    "q216_calibration_bins" -> ((s, dir) => {
      // does a stopword share of 0.3 MEAN P(en) ≈ 0.3? — the
      // reliability table behind ECE; fixed [0,1] bands in integer
      // micro-units, confidence summed as DECIMAL
      val scored = t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.stopwordHits(col("text")).cast("double") /
          TextOps.tokenCountArith(col("text")).cast("double"), 6)
          .as("score"),
        col("lang"))
      graft.ops.Eval.calibrationBins(scored, "score",
        col("lang") === "en", bins = 10).orderBy("bin")
    }),

    "q217_cusum_shift" -> ((s, dir) =>
      // largest sustained level shift of daily revenue per event
      // type (Page's CUSUM via the exact running-min/max identity —
      // n-scaled integer-cents walk, zero libm); the changepoint
      // screen before trusting q148-style drift stats
      TimeSeries.cusum(events(s, dir), "event_type", "ts", "value")
        .orderBy("event_type")),

    "q218_cross_correlation" -> ((s, dir) =>
      // do clicks lead purchases? CCF at lags −7..7 between the two
      // daily revenue series — exact decimal pair moments per lag,
      // one fixed double expression each
      TimeSeries.crossCorr(events(s, dir), "ts", "value",
        col("event_type") === "click", col("event_type") === "purchase",
        maxLag = 7).orderBy("lag")),

    "q219_vocab_growth" -> ((s, dir) =>
      // Heaps-law read: cumulative vocabulary at 10 equal-document
      // checkpoints in doc_id order — flattening = boilerplate/dup
      // smell; document positions ride the stratified-rank device,
      // first-occurrence buckets are pure integer arithmetic
      CorpusStats.vocabGrowth(t(s, dir, "documents"), "doc_id", "text",
        steps = 10).orderBy("step")),

    "q220_jq_group_by" -> ((s, dir) =>
      // the round-11 compiled jq group_by/unique_by forms end-to-end:
      // distinct-word count and top word-run per document, entirely
      // inside codegen HOFs (sorted-distinct keys × order-preserving
      // filter — no escape hatch, byte-matched vs real jq in JqSpec)
      graft.transform.Jq.compile(
        """{id: .doc_id,
          |  n_uniq: (.text | split(" ") | unique_by(.) | length),
          |  top_run: (.text | split(" ") | group_by(.) | map(length) | max)}"""
          .stripMargin.replaceAll("\n\\s*", " "))(
        t(s, dir, "documents").filter(length(col("text")) > 0))
        .select(col("id"), col("n_uniq").cast("long").as("n_uniq"),
          col("top_run").cast("long").as("top_run"))
        .orderBy("id")),

    "q221_gain_curve" -> ((s, dir) => {
      // "keep only the top-scored X% — how much English survives?":
      // cumulative gains/lift by score decile, the rank-based
      // complement of q215's threshold view; deciles via the exact
      // integral quantileBuckets cuts on the two-phase rank device
      val scored = t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.stopwordHits(col("text")).cast("double") /
          TextOps.tokenCountArith(col("text")).cast("double"), 6)
          .as("score"),
        col("lang"))
      graft.ops.Eval.gainCurve(scored, "score", col("lang") === "en",
        "doc_id", buckets = 10).orderBy("bucket")
    }),

    "q222_fd_audit" -> ((s, dir) => {
      // functional-dependency audit: the key FD custkey → nationkey
      // must be clean (violations 0); custkey → orderpriority is a
      // false assumption the audit should expose. One det-key
      // shuffle each.
      val clean = graft.ops.Profile.fdAudit(
        t(s, dir, "customer"), "c_custkey", "c_nationkey")
        .select(lit("c_custkey->c_nationkey").as("fd"), col("*"))
      val dirty = graft.ops.Profile.fdAudit(
        t(s, dir, "orders"), "o_custkey", "o_orderpriority")
        .select(lit("o_custkey->o_orderpriority").as("fd"), col("*"))
      clean.unionByName(dirty).orderBy("fd")
    }),

    "q223_interarrival" -> ((s, dir) => {
      // inter-event gap profile per event type (retry-storm /
      // bot-cadence smell): floor-seconds gaps per (type, user) via
      // the q32 device, then count/mean + exact p50/p90 through the
      // distributed bracketed selection
      val ev = events(s, dir).filter(col("user_id").isNotNull)
      val w = Window.partitionBy("event_type", "user_id")
        .orderBy(col("ts"), col("event_id"))
      val gaps = ev
        .withColumn("__gap",
          col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(w))
        .filter(col("__gap").isNotNull)
        .select(col("event_type"), col("__gap"))
        // r18: the lag window feeds the stats aggregate AND the
        // three-pass percentile device — materialize the slim gap
        // relation once instead of re-running the window per pass
        .localCheckpoint()
      val stats = gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("__gap")).cast("decimal(28,0)").as("__s"))
      val pcts = graft.ops.Percentiles.exact(
        gaps, Seq("event_type"), "__gap", Seq(0.5, 0.9))
        .select(col("event_type"),
          round(element_at(col("pcts"), 1), 6).as("p50"),
          round(element_at(col("pcts"), 2), 6).as("p90"))
      stats.join(pcts, "event_type")
        .select(col("event_type"), col("n_gaps").cast("long").as("n_gaps"),
          // engine-proof micro mean (q271 class — gaps in seconds)
          graft.ops.Parity.round6Ratio(col("__s"), col("n_gaps"))
            .as("mean_gap"),
          col("p50"), col("p90"))
        .orderBy("event_type")
    }),

    "q224_dim_correlation" -> ((s, dir) =>
      // embedding redundancy probe: top-10 most-correlated dimension
      // pairs — ONE imperative mapPartitions fold over integral
      // micro-units (zero row inflation; partials are 2144 longs per
      // partition merged in DECIMAL)
      Similarity.dimCorrelation(t(s, dir, "embeddings"), "embedding",
        dims = 64, topK = 10)
        .orderBy("i", "j")),

    "q225_session_paths" -> ((s, dir) => {
      // path analysis: top-10 event-type TRIGRAMS inside sessions
      // (the q32 gap device) — the "what do users actually do"
      // readout behind funnel design; leads stay inside the
      // (user, session) window, so no trigram crosses a session edge
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val sess = events(s, dir)
        .filter(col("event_type").isNotNull)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (col("ts").cast("long") - col("prev_ts").cast("long")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bySess = Window.partitionBy("user_id", "session_id")
        .orderBy(col("ts"), col("event_id"))
      sess
        .withColumn("e2", lead(col("event_type"), 1).over(bySess))
        .withColumn("e3", lead(col("event_type"), 2).over(bySess))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
        .select(col("path"), col("n").cast("long").as("n"))
    }),

    "q226_stream_dedup_watermark" -> ((s, dir) => {
      // the BUILT-IN streaming dedup surface next to q83's custom
      // marker state: dropDuplicatesWithinWatermark through the real
      // runtime (RocksDB-compatible state, watermark-bounded); the
      // emitted KEY SET is arrival-order-free, so batch parity pins
      // on the distinct keys. The trailing .distinct() keeps that
      // contract EXPLICIT: keys whose duplicates arrive more than the
      // watermark apart are legitimately re-emitted by the operator
      // (state expired), so the raw append stream is only
      // duplicate-free per batching accident — the pinned invariant
      // is the key SET, robust to corpus/microbatch changes.
      val stream = streamT(s, dir, "events")
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      graft.streaming.StreamPipeline
        .runToResultAppend(s, stream, "graft_q226")
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    }),

    "q227_info_gain" -> ((s, dir) => {
      // does source predict language? information gain of the source
      // split over the lang label — the feature-selection screen for
      // stratified curation. The q72 entropy ladder (round-6 LN
      // carried as DECIMAL term sums) twice: marginal and
      // source-conditional.
      val d = t(s, dir, "documents")
        .filter(col("lang").isNotNull && col("source").isNotNull)
      val cells = d.groupBy("source", "lang").agg(count(lit(1)).as("__c"))
      val srcTot = cells.groupBy("source").agg(sum(col("__c")).as("__ns"))
      val hCond = cells.join(broadcast(srcTot), "source")
        .agg(sum(col("__c").cast("decimal(18,0)") *
          round(log(col("__c").cast("double") / col("__ns").cast("double")),
            6).cast("decimal(18,6)")).as("__hc"))
      val byLang = d.groupBy("lang").agg(count(lit(1)).as("__cl"))
      val nTot = byLang.agg(sum(col("__cl")).as("__n"))
      val hTot = byLang.crossJoin(broadcast(nTot))
        .agg(max(col("__n")).as("__n"),
          sum(col("__cl").cast("decimal(18,0)") *
            round(log(col("__cl").cast("double") / col("__n").cast("double")),
              6).cast("decimal(18,6)")).as("__hl"))
      hTot.crossJoin(hCond)
        .select(col("__n").cast("long").as("n"),
          round(-(col("__hl").cast("double")) / col("__n").cast("double"), 6)
            .as("h_label"),
          round(-(col("__hc").cast("double")) / col("__n").cast("double"), 6)
            .as("h_conditional"),
          round(-(col("__hl").cast("double")) / col("__n").cast("double") -
            (-(col("__hc").cast("double")) / col("__n").cast("double")), 6)
            .as("info_gain"))
    }),

    "q228_cross_source_neardups" -> ((s, dir) => {
      // which sources copy from each other? near-dup LEAKAGE matrix:
      // q213's production winnow candidates mapped back to their
      // sources — the contamination ledger that decides whether
      // source-level splits are independent (the sketch-level
      // complement of q211's exact prefix match)
      val docs = t(s, dir, "documents")
      val cands = Dedup.winnowCandidates(docs, "doc_id", "text")
      val src = docs.select(col("doc_id"), col("source"))
      cands
        .join(src.select(col("doc_id").as("id_a"),
          col("source").as("__sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"),
          col("source").as("__sb")), "id_b")
        .select(least(col("__sa"), col("__sb")).as("source_a"),
          greatest(col("__sa"), col("__sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    }),

    "q229_confusion_matrix" -> ((s, dir) =>
      // the q55 language detector audited as a classifier: actual ×
      // predicted confusion counts — one map-only kernel pass + one
      // 25-cell aggregate
      t(s, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(col("lang").as("actual"),
          TextOps.langId(col("text")).as("predicted"))
        .groupBy("actual", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("actual", "predicted")),

    "q230_class_prf" -> ((s, dir) => {
      // per-class precision/recall/F1 of the q55 detector — the
      // eval-family readout over the q229 cells (never the corpus
      // twice: both marginals derive from the tiny cell table)
      val cells = t(s, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(col("lang").as("actual"),
          TextOps.langId(col("text")).as("predicted"))
        .groupBy("actual", "predicted")
        .agg(count(lit(1)).as("__n"))
      val tp = cells.filter(col("actual") === col("predicted"))
        .select(col("actual").as("cls"), col("__n").as("__tp"))
      val act = cells.groupBy(col("actual").as("cls"))
        .agg(sum(col("__n")).as("__a"))
      val pred = cells.groupBy(col("predicted").as("cls"))
        .agg(sum(col("__n")).as("__p"))
      act.join(pred, Seq("cls"), "full_outer")
        .join(tp, Seq("cls"), "left_outer")
        .select(col("cls"),
          coalesce(col("__tp"), lit(0L)).cast("long").as("tp"),
          coalesce(col("__a"), lit(0L)).cast("long").as("n_actual"),
          coalesce(col("__p"), lit(0L)).cast("long").as("n_predicted"))
        .withColumn("precision",
          when(col("n_predicted") > 0,
            round(col("tp").cast("double") /
              col("n_predicted").cast("double"), 6)))
        .withColumn("recall",
          when(col("n_actual") > 0,
            round(col("tp").cast("double") /
              col("n_actual").cast("double"), 6)))
        .withColumn("f1",
          when(col("precision").isNotNull && col("recall").isNotNull &&
            (col("precision") + col("recall")) > 0,
            round(lit(2.0d) * col("precision") * col("recall") /
              (col("precision") + col("recall")), 6)))
        .orderBy("cls")
    }),

    "q231_deseasonalized_acf" -> ((s, dir) => {
      // is there autocorrelation BEYOND the weekly cycle? q200's DOW
      // means removed from the daily series (2-dp decimal residuals),
      // then q196's ACF over the residual — the composition that
      // separates "weekends repeat" from genuine momentum
      val daily = events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type").as("__g"),
          to_date(date_trunc("day", col("ts"))).as("__d"))
        .agg((sum(col("value").cast("decimal(18,2)")) * 100)
          .cast("long").as("__c"))
        .withColumn("__dow",
          (datediff(col("__d"), to_date(lit("1970-01-01"))) + lit(3)) % 7)
      // EVERYTHING in integer cents: the DOW mean rounds to a whole
      // cent via round(double, 0) — the only rounding in the chain,
      // and a .5-of-integer boundary is exactly representable so both
      // engines decide it identically (round-2 of a wide decimal mean
      // flipped a half boundary between the engines); the residual is
      // then an exact integer and every ACF moment stays integral
      val dowMean = daily.groupBy("__g", "__dow")
        .agg(round(sum(col("__c")).cast("double") /
          count(lit(1)).cast("double"), 0).cast("long").as("__dm"))
      val resid = daily.join(dowMean, Seq("__g", "__dow"))
        .select(col("__g").as("event_type"),
          col("__d").cast("timestamp").as("ts"),
          (col("__c") - col("__dm")).cast("decimal(18,2)").as("resid"))
      TimeSeries.autocorr(resid, "event_type", "ts", "resid", maxLag = 7)
        .orderBy("event_type", "lag")
    }),

    "q232_dim_discrimination" -> ((s, dir) =>
      // which embedding dimensions SEPARATE the labels? per-dim ANOVA
      // F on the quantized view — the Fisher screen run before
      // projection spends budget (the complement of q224's
      // redundancy probe); one posexplode to a 640-cell moment table
      Similarity.dimDiscrimination(t(s, dir, "embeddings"), "embedding",
        "label", dims = 64, topK = 10)
        .orderBy("dim")),

    "q233_readability" -> ((s, dir) =>
      // Coleman–Liau reading level per source (no syllable dictionary
      // — pure letter/word/sentence arithmetic on the scan); the
      // register profile next to q207's vocabulary stats
      TextOps.colemanLiau(t(s, dir, "documents"), Seq("source"), "text")
        .orderBy("source")),

    "q234_table_checksums" -> ((s, dir) => {
      // transfer-validation fingerprints (the reference's job IS
      // moving tables between systems): per table — row count,
      // distinct keys, and an order-free md5-prefix checksum of the
      // key column (sum of the first 8 hex digits as an integer);
      // one scan per table, nothing but the digest sum shuffles
      val tables = Seq(
        ("region", "r_regionkey"), ("nation", "n_nationkey"),
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"))
      tables.map { case (tbl, key) =>
        t(s, dir, tbl).agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col(key)).as("n_keys"),
          sum(conv(substring(md5(col(key).cast("string")), 1, 8), 16, 10)
            .cast("decimal(18,0)")).cast("decimal(28,0)").as("__ck"))
          .select(lit(tbl).as("table_name"),
            col("n_rows").cast("long").as("n_rows"),
            col("n_keys").cast("long").as("n_keys"),
            col("__ck").cast("long").as("key_checksum"))
      }.reduce(_ unionByName _).orderBy("table_name")
    }),

    "q235_weekly_value_profile" -> ((s, dir) => {
      // distribution drift over time: weekly n/mean/p50/p90 of order
      // totals — "are orders getting bigger, or just more skewed" —
      // exact percentiles per week through the bracketed selection
      val o = t(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull)
        .withColumn("week",
          date_trunc("week", col("o_orderdate")).cast("date"))
        .withColumn("__v",
          col("o_totalprice").cast("decimal(18,2)").cast("double"))
      // the mean's numerator enters as integer CENTS — a wide-decimal
      // sum cast to double double-rounds in DuckDB and flipped a
      // round-6 half boundary at sf0.01 (the q231 hazard)
      val stats = o.groupBy("week")
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("__sc"))
      val pcts = graft.ops.Percentiles.exact(
        o, Seq("week"), "__v", Seq(0.5, 0.9))
        .select(col("week"),
          round(element_at(col("pcts"), 1), 6).as("p50"),
          round(element_at(col("pcts"), 2), 6).as("p90"))
      // the 6-dp mean rounds in INTEGERS: mean divisions land on
      // exact .5 micro boundaries (n divides binary-friendly cents),
      // where DuckDB's double ROUND and Spark's decimal-expansion
      // ROUND disagree — half-up integer division
      // `(2a + b) div (2b)` is boundary-exact on both engines
      stats.join(pcts, "week")
        .select(col("week"), col("n_orders").cast("long").as("n_orders"),
          (expr("(2L * __sc * 10000L + n_orders) div (2L * n_orders)")
            .cast("double") / lit(1000000.0d)).as("mean_price"),
          col("p50"), col("p90"))
        .orderBy("week")
    }),

    "q236_curriculum_interleave" -> ((s, dir) => {
      // mixture-preserving training order: every prefix of the
      // serialized corpus carries each source in ≈ its corpus share
      // (mid-quantile interleave over two rank-device passes — a
      // plain sort clumps, a shuffle is non-reproducible). Readout:
      // source counts per position decile — the mixture must be FLAT
      // down the schedule.
      val ordered = graft.ops.Layout.proportionalInterleave(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", Seq("doc_id"))
      ordered
        .select(col("source"),
          expr("(position - 1L) * 10L div n_total").as("decile"))
        .groupBy("decile", "source")
        .agg(count(lit(1)).as("n"))
        .select(col("decile").cast("long").as("decile"), col("source"),
          col("n").cast("long").as("n"))
        .orderBy("decile", "source")
    }),

    "q237_packing_efficiency" -> ((s, dir) => {
      // the efficiency audit of q66's concat-and-chunk packer: how
      // full is the last pack, and how many documents straddle a
      // pack boundary (a split doc pays cross-chunk attention loss) —
      // per budget, from pure offset arithmetic on the prefix device
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
      Seq(256L, 512L, 1024L).map { budget =>
        Pack.contiguous(docs, "doc_id", "n_tokens", budget)
          .agg(count(lit(1)).as("__n"),
            sum(col("n_tokens")).as("__tok"),
            max(col("pack_last")).as("__lastpack"),
            sum(when(col("pack_last") > col("pack_first"), 1L)
              .otherwise(0L)).as("__split"))
          .select(lit(budget).as("budget"),
            col("__n").cast("long").as("n_docs"),
            col("__tok").cast("long").as("n_tokens"),
            (col("__lastpack") + 1).cast("long").as("n_packs"),
            col("__split").cast("long").as("n_docs_split"),
            // engine-proof micro ratio (q271 class — the power-of-two
            // budget denominator makes exact .5 micro boundaries
            // reachable)
            graft.ops.Parity.round6Ratio(col("__tok"),
              (col("__lastpack") + 1) * lit(budget)).as("fill_rate"))
      }.reduce(_ unionByName _).orderBy("budget")
    }),

    "q238_contamination_report" -> ((s, dir) => {
      // q67's Bloom decontamination turned into the per-source LEDGER:
      // which sources leak eval content, and how much — the report a
      // curation run publishes next to the filtered corpus
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val contam = Dedup.decontaminateBloom(train,
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 7, expectedGrams = 100000L, fpp = 0.01)
        .select(col("doc_id"))
      val tot = train.groupBy("source").agg(count(lit(1)).as("__n"))
      val con = train.join(contam, "doc_id")
        .groupBy("source").agg(count(lit(1)).as("__c"))
      tot.join(con, Seq("source"), "left_outer")
        .select(col("source"), col("__n").cast("long").as("n_docs"),
          coalesce(col("__c"), lit(0L)).cast("long").as("n_contaminated"),
          round(coalesce(col("__c"), lit(0L)).cast("double") /
            col("__n").cast("double"), 6).as("contamination_rate"))
        .orderBy("source")
    }),

    "q239_ivf_batch" -> ((s, dir) => {
      // Batch-probe equivalence contract: ivfSearchBatch (ONE pass
      // over the probed-cell union, default assignForProbing wiring)
      // must return EXACTLY what a per-query ivfTopK loop returns for
      // the same index/nprobe/k — same ids, same round-6 cosines,
      // same ranks. Violations = symmetric difference; oracle pins
      // empty.
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 5)
      val idx = Similarity.IvfIndex.fit(e, "embedding", cells = 8)
      val batch = Similarity.ivfSearchBatch(idx, e, "vec_id", "embedding",
        queries, k = 10, nprobe = 2)
        .select(col("query_id"), col("corpus_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
        // r19: each side of the symmetric difference below is
        // referenced TWICE (both exceptAll directions) — an eager
        // checkpoint computes batch and loop ONCE instead of twice
        // each (guide §1/§5: materialize a twice-read intermediate)
        .localCheckpoint(true)
      // r19: assignForProbing (eager, plan-truncated) instead of the
      // lazy assign — the 5-query loop otherwise re-analyzed and
      // re-ran the cells×dim argmin tree per probe (the documented
      // repeated-probe contract of IvfIndex; cell values identical)
      val assigned = idx.assignForProbing(e, "embedding")
      val loop = queries.select(col("vec_id"),
          col("embedding").cast("array<double>").as("__q")).collect()
        .map { r =>
          Similarity.ivfTopK(idx, assigned, "vec_id", "embedding",
            r.getSeq[Double](1), k = 10, nprobe = 2)
            .select(lit(r.getLong(0)).as("query_id"),
              col("vec_id").as("corpus_id"), col("cos_sim"),
              row_number().over(Window.orderBy(col("cos_sim").desc,
                col("vec_id"))).cast("long").as("rank"))
        }.reduce(_.union(_)).localCheckpoint(true)
      batch.exceptAll(loop).withColumn("side", lit("batch_only"))
        .union(loop.exceptAll(batch).withColumn("side", lit("loop_only")))
        .orderBy("side", "query_id", "rank")
    }),

    "q240_ordinal_assoc" -> ((s, dir) => {
      // Kendall tau-b / gamma / Somers' D between quantity band and
      // discount step — monotone association for graded levels, from
      // the contingency cells alone (one corpus pass)
      Ordinal.association(t(s, dir, "lineitem"),
        col("l_quantity").cast("int"),
        round(col("l_discount") * 100, 0).cast("int"))
        .select(col("n"), col("c_pairs").cast("double").as("c_pairs"),
          col("d_pairs").cast("double").as("d_pairs"),
          col("tau_b"), col("gamma"), col("somers_d"))
    }),

    "q241_markov_transitions" -> ((s, dir) =>
      Events.transitionMatrix(events(s, dir),
        "user_id", "ts", "event_type", "event_id")
        .orderBy("prev_type", "next_type")),

    "q242_markov_stationary" -> ((s, dir) => {
      // fixpoint contract on the power-iterated stationary vector:
      // π must be a probability vector (Σπ = 1 ± 1e-9) satisfying
      // πP = π to 1e-8 sup-norm under the SAME stochastic completion
      // the operator documents; violations surface with their
      // residual — empty when the iteration converged
      val trans = Events.transitionMatrix(events(s, dir),
        "user_id", "ts", "event_type", "event_id")
      val pi = Events.stationaryDistribution(trans, roundOutput = false)
      val piM = pi.select(col("state"), col("pi")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val cnt = trans.select("prev_type", "next_type", "n_steps").collect()
      val states = piM.keys.toSeq.sorted
      val outTot = cnt.groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum.toDouble }
      val flow = states.map { j =>
        val inflow = cnt.filter(_.getString(1) == j)
          .map(r => piM(r.getString(0)) * r.getLong(2).toDouble /
            outTot(r.getString(0))).sum +
          // stochastic completion: states with no outgoing steps self-loop
          (if (!outTot.contains(j)) piM(j) else 0.0)
        (j, math.abs(inflow - piM(j)))
      }
      val massErr = math.abs(piM.values.sum - 1.0)
      import s.implicits._
      flow.filter { case (_, res) => res > 1e-8 }
        .map { case (st, res) => (st, res, "residual") }
        .++(if (massErr > 1e-9) Seq(("__mass", massErr, "mass")) else Nil)
        .toDF("state", "residual", "violation")
        .orderBy("state")
    }),

    "q243_turing_estimate" -> ((s, dir) =>
      // bigram event space: the synthetic corpus has a closed ~31-word
      // vocabulary (no rare unigrams anywhere), so the smoothing
      // regime lives in the n-gram tail — as it does for real LMs
      CorpusStats.turingEstimate(t(s, dir, "documents"), "text",
        maxR = 15, n = 2)),

    "q244_vocab_overlap" -> ((s, dir) =>
      CorpusStats.vocabOverlap(t(s, dir, "documents"), "source", "text")),

    "q245_kanonymity" -> ((s, dir) =>
      // quasi-identifiers: nation × segment × account-balance band;
      // sensitive attribute: the exact balance. Violating groups
      // (size < 5 or < 3 distinct balances) surface for review.
      Privacy.kAnonymityAudit(t(s, dir, "customer"),
        Seq(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band")),
        col("c_acctbal"), k = 5L, l = 3L)
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"), col("bal_band"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_sensitive").cast("long").as("n_sensitive"), col("violation"))
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")),

    "q246_changepoint" -> ((s, dir) =>
      TimeSeries.changepoint(events(s, dir), "ts", "value")),

    "q247_jackknife_ratio" -> ((s, dir) =>
      // standard error of revenue-per-unit (Σ price / Σ qty) by
      // closed-form leave-one-out replicates — variance for a
      // NONLINEAR estimator without resampling passes
      Robust.jackknifeRatio(t(s, dir, "lineitem"),
        "l_extendedprice", "l_quantity")),

    "q248_neyman_allocation" -> ((s, dir) =>
      // optimal sample design: where should 1000 audit samples go
      // across order-priority strata — N_h·s_h weighting with exact
      // largest-remainder integerization
      Sample.neymanAllocation(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice", totalN = 1000L)),

    "q249_brown_forsythe" -> ((s, dir) =>
      // are price spreads homogeneous across return flags — the
      // robust (median-centered) Levene gate before pooling variances
      Robust.brownForsythe(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")),

    "q250_leading_eigen" -> ((s, dir) => {
      // eigenpair contract: the power-iterated principal component
      // must satisfy ‖Cv − λv‖∞ ≤ 1e-8·max(1,|λ|), ‖v‖₂ = 1 ± 1e-9,
      // λ ≤ trace, share ∈ (0, 1] — computed against the SAME
      // covariance the operator folded; violations surface, empty
      // when the iteration converged
      val r = Similarity.leadingEigen(t(s, dir, "embeddings"),
        "embedding", dims = 64)
      val d = r.component.length
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => r.cov(i)(j) * r.component(j)).sum)
      val resid = (0 until d)
        .map(i => math.abs(cv(i) - r.eigenvalue * r.component(i))).max
      val norm = math.sqrt(r.component.map(x => x * x).sum)
      val trace = (0 until d).map(i => r.cov(i)(i)).sum
      val tol = 1e-8 * math.max(1.0, math.abs(r.eigenvalue))
      import s.implicits._
      Seq(
        (if (resid > tol) Some(("residual", resid)) else None),
        (if (math.abs(norm - 1.0) > 1e-9) Some(("norm", norm)) else None),
        (if (r.eigenvalue > trace + 1e-9) Some(("lambda_gt_trace",
          r.eigenvalue)) else None),
        (if (!(r.share > 0.0 && r.share <= 1.0 + 1e-12))
          Some(("share_domain", r.share)) else None))
        .flatten.toDF("violation", "value").orderBy("violation")
    }),

    "q251_isotonic_calibration" -> ((s, dir) => {
      // PAV contract over the q216 stopword-share calibration bins:
      // fitted must be non-decreasing, inside [0,1], and conserve the
      // positive mass (Σ n·fitted = Σ n_pos to micro-rounding);
      // violations surface with their detail — empty = the isotonic
      // fit holds
      val scored = t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.stopwordHits(col("text")).cast("double") /
          TextOps.tokenCountArith(col("text")).cast("double"), 6)
          .as("score"),
        col("lang"))
      val iso = graft.ops.Eval.isotonicCalibration(scored, "score",
        col("lang") === "en", bins = 10).orderBy("bin").collect()
      import s.implicits._
      val mono = iso.sliding(2).collect {
        case Array(a, b) if a.getDouble(4) > b.getDouble(4) + 1e-12 =>
          ("non_monotone", a.getLong(0).toDouble)
      }.toSeq
      val domain = iso.collect {
        case r if r.getDouble(4) < 0.0 || r.getDouble(4) > 1.0 =>
          ("domain", r.getLong(0).toDouble)
      }.toSeq
      val massFit = iso.map(r => r.getLong(1) * r.getDouble(4)).sum
      val massPos = iso.map(_.getLong(2)).sum.toDouble
      val totN = iso.map(_.getLong(1)).sum.toDouble
      val mass = if (math.abs(massFit - massPos) > 0.5e-6 * totN + 1e-9)
        Seq(("mass", massFit - massPos)) else Nil
      (mono ++ domain ++ mass).toDF("violation", "detail")
        .orderBy("violation", "detail")
    }),

    "q252_hits" -> ((s, dir) => {
      // hubs vs authorities on the nation trade graph (customer
      // nation → supplier nation, weight = lineitem count): which
      // nations BUY from good sellers vs SELL to good buyers — the
      // directional split q111's PageRank cannot see
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val e = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      Graph.hits(e, "src", "dst", "w", nat.select("n_nationkey"),
        "n_nationkey", iters = 5)
        .join(nat, "n_nationkey")
        .select(col("n_name").as("nation"), col("hub"), col("authority"))
        .orderBy("nation")
    }),

    "q253_kcore" -> ((s, dir) => {
      // dense-core contract on the customer–supplier interaction
      // graph: every vertex the 4-core keeps must have ≥ 4 kept
      // neighbours (so one more peel round removes nothing) — the
      // fixpoint property that DEFINES the core; violations empty
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 10000000L).as("dst"))
      // r18: canonicalize the undirected edge set ONCE and share it
      // between the peel (assumeUndirected) and the recount below —
      // previously the lineitem⋈orders join + distinct ran twice
      // (localCheckpoint doubles as the peel loop's lineage base)
      val und = edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint()
      val core = Graph.kCore(und, "a", "b", k = 4, assumeUndirected = true)
      val kept = core.select(col("id"))
      val keptEdges = und
        .join(kept.select(col("id").as("a")), "a", "left_semi")
        .join(kept.select(col("id").as("b")), "b", "left_semi")
      val keptDeg = keptEdges.select(col("a").as("id"))
        .union(keptEdges.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      // (a) degree-inside-core < k; (b) reported core_degree must BE
      // the inside-degree
      core.join(keptDeg, Seq("id"), "left")
        .filter(coalesce(col("deg"), lit(0L)) < 4 ||
          coalesce(col("deg"), lit(0L)) =!= col("core_degree"))
        .select(col("id").cast("long").as("id"),
          col("core_degree"),
          coalesce(col("deg"), lit(0L)).cast("long").as("recount"))
        .orderBy("id")
    }),

    "q254_calibration_error" -> ((s, dir) => {
      // one-number model-card summary of q216's reliability table —
      // exact integer numerators end-to-end
      val scored = t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.stopwordHits(col("text")).cast("double") /
          TextOps.tokenCountArith(col("text")).cast("double"), 6)
          .as("score"),
        col("lang"))
      graft.ops.Eval.calibrationError(scored, "score",
        col("lang") === "en", bins = 10)
    }),

    "q255_mann_kendall" -> ((s, dir) =>
      TimeSeries.mannKendall(events(s, dir), "ts", "value")),

    "q256_ols_influence" -> ((s, dir) =>
      // which line items OWN the price~quantity fit: top-20 by
      // Cook's distance (leverage × residual)
      Robust.olsInfluence(
        t(s, dir, "lineitem").withColumn("li_id",
          col("l_orderkey") * 8 + col("l_linenumber")),
        "li_id", "l_quantity", "l_extendedprice", topK = 20)),

    "q257_partial_correlation" -> ((s, dir) =>
      // does quantity↔price survive controlling for discount?
      Robust.partialCorrelation(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", "l_discount")),

    "q258_seasonality_strength" -> ((s, dir) =>
      TimeSeries.seasonalityStrength(events(s, dir), "ts", "value")),

    "q259_stream_topk" -> ((s, dir) => {
      // Spark-4 transformWithState through the real streaming
      // runtime: best-10 events per type by value across micro-batches
      // in bounded keyed state; the final standings must equal the
      // batch row_number() ≤ 10 — arrival-order-free by construction.
      // transformWithState requires the RocksDB state store.
      val stream = streamT(s, dir, "events")
        .withColumn("__score",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
      val snaps = graft.streaming.StreamPipeline.withRocksDbStateStore(s) {
        graft.streaming.StreamPipeline.runToResultAppend(s,
          graft.streaming.StreamTopK.topKPerKey(stream,
            "event_type", "event_id", "__score", k = 10).toDF(),
          "graft_q259")
      }
      val latest = Window.partitionBy("key")
      snaps.withColumn("__mv", max(col("version")).over(latest))
        .filter(col("version") === col("__mv"))
        .select(col("key").as("event_type"), col("rank").cast("long").as("rank"),
          col("id").as("event_id"), col("score").as("value_cents"))
        .orderBy("event_type", "rank")
    }),

    "q260_loo_impact" -> ((s, dir) =>
      // which source drags the corpus mean document length — all G
      // leave-one-out replicates from ONE group-sum table
      Profile.leaveOneGroupOut(t(s, dir, "documents"),
        "source", "n_chars")),

    "q261_cliffs_delta" -> ((s, dir) =>
      // effect size for q182's purchase-vs-rest value shift, with
      // magnitude bands — "how big", not just "is it there"
      Robust.cliffsDelta(events(s, dir), "value",
        col("event_type") === "purchase")),

    "q262_winsorized_corr" -> ((s, dir) =>
      // quantity↔price association with both tails clamped at
      // [p05, p95] — the whale-immune complement of q257's raw r
      Robust.winsorizedCorrelation(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice")),

    "q263_two_proportion" -> ((s, dir) =>
      // are RETURNED items deep-discounted more often? binary-rate
      // A/B gate: R-flag vs rest, success = discount > 5%
      graft.ops.Eval.twoProportionZ(t(s, dir, "lineitem"),
        col("l_returnflag") === "R", col("l_discount") > 0.05)),

    "q264_daily_mix_anomaly" -> ((s, dir) =>
      // which days have a WEIRD event-type mix: JSD(day || rest) with
      // the event type as a one-token document — q183's sourceJsd
      // reused verbatim on a categorical distribution; top-10 weird
      CorpusStats.sourceJsd(
        events(s, dir).select(
          to_date(date_trunc("day", col("ts"))).as("day"),
          col("event_type").as("text")),
        "day", "text")
        .withColumnRenamed("source", "day")
        .orderBy(col("jsd").desc, col("day"))
        .limit(10)),

    "q265_er_block_audit" -> ((s, dir) => {
      // the 100 TB auditability story for blocked ER (round-11 VERDICT
      // directive 6): run the q150 matcher under a DELIBERATELY tight
      // skew cap (brand-only blocking, maxBlock 80 — at sf0.01 eleven
      // of 25 brand blocks over-cap; at sf0.1 ALL of them) and PUBLISH
      // the recall trade the guard took. The counters come from
      // Linkage.blockAudit (one block-sized count aggregate): the
      // Dataset.observe device stays spec-pinned for live runs
      // (LinkageSpec), but AQE's empty-relation propagation drops the
      // CollectMetrics node from the final plan when EVERY block is
      // over-cap and the result is empty — found by the round-12
      // sf0.1 bench — and the all-dropped run is exactly the one
      // whose audit must not vanish.
      val pairs = Linkage.blockedPairs(t(s, dir, "part"), "p_partkey",
        "p_name", col("p_brand"), maxDistance = 5, maxBlock = 80)
      val nPairs = pairs.count()
      val audit = Linkage.blockAudit(t(s, dir, "part"), "p_partkey",
        col("p_brand"), maxBlock = 80)
      audit.select(col("n_blocks").cast("long").as("n_blocks"),
        col("dropped_blocks").cast("long").as("dropped_blocks"),
        col("dropped_rows").cast("long").as("dropped_rows"),
        lit(nPairs).as("n_pairs"))
    }),

    "q266_brier_decomposition" -> ((s, dir) => {
      // Murphy's reliability − resolution + uncertainty split of the
      // q216 stopword-share "P(en)" score: is the gate's problem
      // calibration or discrimination? All numerators exact integers,
      // per-bin terms round-6 decimals (ops/Eval.scala)
      val scored = t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.stopwordHits(col("text")).cast("double") /
          TextOps.tokenCountArith(col("text")).cast("double"), 6)
          .as("score"),
        col("lang"))
      graft.ops.Eval.brierDecomposition(scored, "score",
        col("lang") === "en", bins = 10)
    }),

    "q267_sign_trend_bh" -> ((s, dir) =>
      // which event types are REALLY trending up over the last 28
      // days, FDR-corrected for asking once per type: exact
      // binomial sign test (no Φ, no libm — the tail numerator is a
      // broadcast Pascal-triangle sum, 2ⁿ division is exact) + an
      // all-integer Benjamini–Hochberg step-up (ops/TimeSeries.scala)
      TimeSeries.signTrendBH(events(s, dir), "event_type", "ts", "value")
        .orderBy("bh_rank")),

    "q268_jq_fanout" -> ((s, dir) =>
      // the round-12 single-generator jq compile ON REAL DATA:
      // `{id: .doc_id, tok: .toks[]}` is ONE explode — never the
      // per-partition escape hatch — emitting a (doc, token) stream
      // row per element, 1→N with zero-output empties exactly like
      // jq (transform/Jq.scala; byte-matched vs real jq in JqSpec)
      Jq.compile("{id: .doc_id, tok: .toks[]}")(
        t(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(97L)) === 0)
          .select(col("doc_id"), split(col("text"), " ").as("toks")))),

    "q269_dim_drift" -> ((s, dir) =>
      // which embedding DIMENSIONS moved between the first and second
      // half of the label space — per-coordinate PSI over fixed [-1,1]
      // micro-unit buckets, the embedding-space twin of q166's scalar
      // drift gate; top-10 drifted dims (ops/Similarity.scala)
      Similarity.dimDrift(t(s, dir, "embeddings"), "embedding",
        col("label") < 5, dims = 64, buckets = 8, topK = 10)),

    "q270_quantile_lift" -> ((s, dir) =>
      // WHERE in the distribution segments differ from BUILDING —
      // per-quantile EXACT lift on the bracketed selection (a whale
      // cannot fabricate a lift at any quantile below its own);
      // differences taken in DECIMAL(18,6), never double subtraction
      Robust.quantileLift(t(s, dir, "customer"), "c_mktsegment",
        "BUILDING", "c_acctbal", Seq(0.25, 0.5, 0.75, 0.9))
        .orderBy("arm", "fraction")),

    "q271_effective_sample_size" -> ((s, dir) =>
      // how much statistical power each source actually carries under
      // length weighting — Kish ESS + design effect, exact decimal
      // moments with per-term squared casts (ops/Profile.scala)
      Profile.effectiveSampleSize(t(s, dir, "documents"), "source",
        "n_chars").orderBy("source")),

    "q272_wilson_gate_rate" -> ((s, dir) =>
      // per-source C4 keep rate with Wilson 95% bounds — the release
      // readout that stays honest at small n and extreme rates where
      // the normal interval collapses (ops/Eval.scala; z shared with
      // the oracle as a Scala constant)
      Eval.wilsonRate(
        TextOps.c4Rules(t(s, dir, "documents"), "doc_id", "text",
          passthrough = Seq("source")),
        "source", col("keep"), z = wilsonZ)
        .orderBy("source")),

    "q273_grid_core_cells" -> ((s, dir) =>
      // DBSCAN-style core cells over embedding coords 1-2: integer
      // grid + 3x3 neighborhood density, cell-sized work end to end —
      // the pairless density map of embedding space
      Similarity.gridCorePoints(t(s, dir, "embeddings"), "embedding",
        cellSize = 0.05, minPts = 25L)
        .orderBy("cx", "cy")),

    "q274_label_noise_matrix" -> ((s, dir) =>
      // confident-learning label-noise map: rows counted by (given
      // label, confidently-assigned label) via centroid
      // self-confidence thresholds — off-diagonal mass estimates the
      // noise before training on weak labels (ops/Similarity.scala)
      Similarity.labelNoiseMatrix(t(s, dir, "embeddings"), "vec_id",
        "label", "embedding")
        .orderBy("given_label", "assigned_label")),

    "q275_vocab_coverage" -> ((s, dir) =>
      // tokenizer-budget readout: distinct terms (and token mass)
      // needed to cover 50/90/95/99% of occurrences — all-integer
      // threshold cuts on the value-pinned prefix device
      CorpusStats.vocabCoverage(t(s, dir, "documents"), "text",
        Seq(50, 90, 95, 99))
        .orderBy("threshold_pct")),

    "q276_fd_histogram" -> ((s, dir) =>
      // Freedman–Diaconis auto-binned histogram of extended price:
      // exact round-6 IQR, EXACT INTEGER cube root (pow(n, 1/3) is
      // libm and engine-divergent), fixed IEEE bin arithmetic
      Profile.fdHistogram(t(s, dir, "lineitem"), "l_extendedprice")
        .orderBy("bin")),

    "q277_average_precision" -> ((s, dir) =>
      // exact AP (area under the PR curve, step form) of the
      // stopword-share is-English ranker — the rare-positive
      // complement of q215's ROC; ties pin to (score DESC, id ASC)
      Eval.averagePrecision(
        t(s, dir, "documents").select(col("doc_id"),
          round(TextOps.stopwordHits(col("text")).cast("double") /
            TextOps.tokenCountArith(col("text")).cast("double"), 6)
            .as("score"),
          col("lang")),
        "doc_id", "score", col("lang") === "en")),

    "q278_first_relevant_rank" -> ((s, dir) =>
      // retrieval quality of the embedding space: rank of the first
      // same-label neighbor per sampled anchor (the per-query half of
      // MRR) — broadcast anchors, two corpus passes, round-6 kernel
      // cosines, struct-max tie-break (ops/Similarity.scala)
      Similarity.firstRelevantRank(t(s, dir, "embeddings"), "vec_id",
        "label", "embedding", col("vec_id") % 100 === 0)
        .orderBy("anchor_id")))

  /** Wilson z for q272 — shared between the operator call and the
    * oracle text so both engines fold the identical constants. */
  private val wilsonZ: Double = 1.959963984540054

  /** q267's Pascal-triangle constants, rendered into the oracle's
    * VALUES list from the SAME Scala rows the operator broadcasts. */
  private val binomValues: String =
    TimeSeries.binomialRows(27)
      .map { case (n, k, c, p2) => s"($n,$k,$c,$p2)" }.mkString(", ")

  /** Shared with the q114 oracle's VALUES list. */
  private val blocklistKeywords =
    Seq("scan merge", "batch batch", "slow", "vector", "scan", "forbidden")

  /** The gap > 1800 s sessionization oracle — shared by the batch
    * lag/cumsum form (q32) and the streaming `session_window` twin
    * (q116): `date_diff('second', ...)` is floor-difference, exactly
    * the batch side's truncated-seconds cast AND the stream side's
    * `date_trunc('second') + 1801 s gap` merge condition.
    */
  private val sessionizeOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN prev_ts IS NULL
      |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM (SELECT user_id, event_id, ts,
      |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |        FROM events)),
      |sess AS (
      |  SELECT user_id, event_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // DuckDB oracle SQL (same column names; deterministic ORDER BY)
  // ------------------------------------------------------------------

  private val rev = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($rev) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, CAST($rev AS DOUBLE) AS revenue
         |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05e0
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_top_revenue" ->
      s"""SELECT l_orderkey, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_nation_revenue" ->
      s"""SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05e0 AND 0.07e0
        |  AND l_quantity < 24""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q08_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q10_union" ->
      """SELECT custkey, COUNT(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY custkey ORDER BY custkey""".stripMargin,

    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q12_case_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_prio,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_prio
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q13_monthly_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "q14_string_funcs" ->
      """SELECT p_brand,
        |  MIN(UPPER(p_name)) AS first_name_upper,
        |  CAST(MAX(LENGTH(p_name)) AS BIGINT) AS max_name_len,
        |  COUNT(CASE WHEN p_name LIKE 'red%' THEN 1 END) AS n_red
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q15_having" ->
      """SELECT p_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM part GROUP BY p_type HAVING COUNT(*) > 50
        |ORDER BY p_type""".stripMargin,

    "q16_below_avg" ->
      """WITH avg_q AS (
        |  SELECT l_partkey AS ap,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN avg_q ON l_partkey = ap
        |WHERE l_quantity < 0.5e0 * avg_qty""".stripMargin,

    "q17_explode_words" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q19_record_index" ->
      """SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS "__METADATA__record_index",
        |  CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / 64) AS BIGINT) AS "__METADATA__connector_batch_index"
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q20_dedup_exact" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    "q21_dup_groups" ->
      """SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS first_doc
        |FROM documents GROUP BY md5(text) HAVING COUNT(*) >= 1
        |ORDER BY h""".stripMargin,

    "q22_token_stats" -> {
      val sub = s"(${sqlTokenCount("text")} + GREATEST(0, CAST((CAST(LENGTH(text) AS BIGINT) - (${sqlTokenCount("text")} - 1) - ${sqlTokenCount("text")} * 4) AS BIGINT) // 4))"
      s"""SELECT doc_id,
         |  ${sqlTokenCount("text")} AS n_tokens,
         |  ${sqlPunctCount("text")} AS n_punct,
         |  ${sqlStopwordHits("text")} AS n_stopwords,
         |  CAST($sub AS BIGINT) AS n_subwords
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q23_quality_score" ->
      s"""SELECT doc_id, ${sqlQuality("text")} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q24_lang_id" ->
      s"""SELECT doc_id, lang, ${sqlLangId("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q25_ngram_jaccard" ->
      s"""WITH sh AS (${sqlShingles(3)}),
         |freq AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 1000000),
         |pruned AS (SELECT sh.doc_id, sh.gram FROM sh JOIN freq USING (gram)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM pruned a JOIN pruned b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(i AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - i AS DOUBLE) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE CAST(i AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - i AS DOUBLE) >= 0.2e0
         |ORDER BY id_a, id_b""".stripMargin,

    // q26 recall contract: Spark outputs (exact j≥0.9 pairs ∩ minhash
    // candidates); DuckDB computes ALL exact j≥0.9 pairs. Equal sets
    // iff LSH recall = 1 — a single missed pair is a row-count red.
    "q26_minhash_candidates" ->
      s"""WITH sh AS (${sqlShingles(3)}),
         |freq AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 1000000),
         |pruned AS (SELECT sh.doc_id, sh.gram FROM sh JOIN freq USING (gram)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM pruned a JOIN pruned b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(i AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - i AS DOUBLE) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE CAST(i AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - i AS DOUBLE) >= 0.9e0
         |ORDER BY id_a, id_b""".stripMargin,

    // q27 banding contract: Spark outputs the symmetric difference
    // between banded simhash candidates and brute-force Hamming-≤6
    // pairs — the pigeonhole guarantee says it is empty.
    "q27_simhash_pairs" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
        |  CAST(NULL AS BIGINT) AS hamming WHERE FALSE""".stripMargin,

    // q30 fingerprint contracts: duplicate-text groups must share one
    // fingerprint (n_fp = 1 per group — vacuous on corpora without
    // exact dups) and distinct texts must not collide (__total row:
    // #distinct fingerprints == #distinct texts, which DuckDB knows
    // without computing any fingerprint).
    "q30_fingerprint" ->
      """SELECT md5(text) AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(1 AS BIGINT) AS n_fp
        |FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
        |UNION ALL
        |SELECT '__total' AS grp,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_fp
        |FROM documents
        |ORDER BY grp""".stripMargin,

    // q41 recall contract: misses beyond the allowed 8 (of exact
    // top-20) — empty when IVF recall ≥ 12/20.
    "q41_ann_ivf" ->
      "SELECT CAST(NULL AS BIGINT) AS vec_id WHERE FALSE",

    // q52 precision + recall-floor contracts — empty when every LSH
    // pair is exact-verified and ≥ 15% of exact pairs are recovered.
    "q52_cosine_lsh" ->
      """SELECT CAST(NULL AS VARCHAR) AS violation, CAST(NULL AS BIGINT) AS id_a,
        |  CAST(NULL AS BIGINT) AS id_b WHERE FALSE""".stripMargin,

    // q50: composed minhash → jaccard-verify(0.9) → connected
    // components; DuckDB recomputes the clusters from the exact j≥0.9
    // edge set with a recursive-CTE fixpoint.
    "q50_dup_components" ->
      s"""WITH RECURSIVE sh AS (${sqlShingles(3)}),
         |freq AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 1000000),
         |pruned AS (SELECT sh.doc_id, sh.gram FROM sh JOIN freq USING (gram)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM pruned a JOIN pruned b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE CAST(i AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - i AS DOUBLE) >= 0.9e0),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, comp) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |comps AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
         |SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size, MIN(id) AS representative
         |FROM comps GROUP BY comp ORDER BY comp""".stripMargin,

    "q29_cosine_neardup" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_inner_product(a.v, b.v) /
        |    (SQRT(list_inner_product(a.v, a.v)) *
        |     SQRT(list_inner_product(b.v, b.v))), 6) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_inner_product(a.v, b.v) /
        |    (SQRT(list_inner_product(a.v, a.v)) *
        |     SQRT(list_inner_product(b.v, b.v))), 6) >= 0.4e0
        |ORDER BY id_a, id_b""".stripMargin,

    "q40_knn_join" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    ROUND(list_inner_product(q.v, c.v) /
        |      (SQRT(list_inner_product(q.v, q.v)) *
        |       SQRT(list_inner_product(c.v, c.v))), 6) AS cos_sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id >= 10),
        |ranked AS (
        |  SELECT query_id, corpus_id, cos_sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, corpus_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT query_id, corpus_id, cos_sim, rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q53_jaccard_components" ->
      s"""WITH RECURSIVE sh AS (${sqlShingles(3)}),
         |freq AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 1000000),
         |pruned AS (SELECT sh.doc_id, sh.gram FROM sh JOIN freq USING (gram)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM pruned a JOIN pruned b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE CAST(i AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - i AS DOUBLE) >= 0.5e0),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, comp) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |comps AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
         |SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members, MIN(id) AS representative
         |FROM comps GROUP BY comp ORDER BY comp""".stripMargin,

    "q54_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q55_langid_ngram" ->
      """WITH tri AS (
        |  SELECT DISTINCT doc_id, lang, substr(text, i, 3) AS tg
        |  FROM documents, UNNEST(range(1, len(text) - 1)) AS t(i)
        |  WHERE len(text) >= 3
        |  UNION ALL
        |  -- mirror the Spark kernel's short-doc fallback: texts shorter
        |  -- than n collapse to one whole-text gram (range() above would
        |  -- yield zero rows for them)
        |  SELECT DISTINCT doc_id, lang, text AS tg
        |  FROM documents WHERE len(text) < 3),
        |prof AS (
        |  SELECT lang AS cand, tg FROM (
        |    SELECT lang, tg,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY COUNT(*) DESC, tg) AS rk
        |    FROM tri GROUP BY lang, tg) WHERE rk <= 20),
        |scores AS (
        |  SELECT d.doc_id, prof.cand, COUNT(*) AS score
        |  FROM (SELECT DISTINCT doc_id, tg FROM tri) d JOIN prof USING (tg)
        |  GROUP BY d.doc_id, prof.cand),
        |best AS (
        |  SELECT doc_id, cand, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, cand) AS rk
        |  FROM scores)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(b.cand, 'und') AS lang_pred_ngram,
        |  CAST(COALESCE(b.score, 0) AS BIGINT) AS ngram_score
        |FROM documents d
        |LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q57_pii_scrub" -> {
      // nested regexp_replace chain generated from the SAME pattern
      // list the Spark operator uses (TextOps.PiiPatterns)
      // DuckDB single-quoted literals keep backslashes verbatim, so
      // the Java-regex strings embed unchanged
      val scrubbed = TextOps.PiiPatterns.foldLeft("a") {
        case (inner, (pat, repl)) =>
          s"regexp_replace($inner, '$pat', '$repl', 'g')"
      }
      s"""WITH aug AS (
         |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@example.com see http://ex.com/d/' || CAST(doc_id AS VARCHAR) ||
         |    ' from 10.0.0.1 ref 5551234567' AS a
         |  FROM documents)
         |SELECT doc_id, $scrubbed AS clean_text
         |FROM aug ORDER BY doc_id""".stripMargin
    },

    "q58_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x,
        |    CAST(t.i AS BIGINT) AS i
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        |m AS (SELECT vec_id, MAX(ABS(x)) AS amax FROM e GROUP BY vec_id)
        |SELECT e.vec_id, e.i,
        |  CAST(CASE WHEN m.amax = 0 THEN 0
        |    ELSE round(e.x * 127 / m.amax) END AS BIGINT) AS q
        |FROM e JOIN m USING (vec_id)
        |ORDER BY e.vec_id, e.i""".stripMargin,

    "q59_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |pt AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
        |ranked AS (
        |  SELECT doc_id, tok, n,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS rk
        |  FROM pt),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_distinct
        |  FROM pt GROUP BY doc_id)
        |SELECT a.doc_id, a.n_tokens, a.n_distinct,
        |  CAST(a.n_distinct AS DOUBLE) / a.n_tokens AS distinct_ratio,
        |  t.tok AS top_token, CAST(t.n AS BIGINT) AS top_token_n,
        |  CAST(t.n AS DOUBLE) / a.n_tokens AS top_token_share
        |FROM agg a JOIN (SELECT * FROM ranked WHERE rk = 1) t USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin,

    "q60_sketch_contracts" ->
      // the contract holds ⇔ no violations: the oracle is the empty
      // relation with the matching schema (same derived-contract oracle
      // pattern as q26/q27)
      "SELECT CAST(NULL AS VARCHAR) AS metric WHERE 1 = 0",

    "q61_corpus_pipeline" -> {
      val scrubbed = TextOps.PiiPatterns.foldLeft("text") {
        case (inner, (pat, repl)) =>
          s"regexp_replace($inner, '$pat', '$repl', 'g')"
      }
      s"""WITH gated AS (
         |  SELECT doc_id, lang, ${sqlQuality("text")} AS quality,
         |    ${sqlTokenCount("text")} AS n_tokens,
         |    $scrubbed AS clean_text
         |  FROM documents
         |  WHERE lang IN ('en', 'de', 'fr')
         |    AND ${sqlQuality("text")} >= 0.5e0
         |    AND ${sqlTokenCount("text")} >= 10),
         |keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(clean_text))
         |SELECT g.doc_id, g.lang, g.quality, g.n_tokens, g.clean_text
         |FROM gated g JOIN keep k ON g.doc_id = k.doc_id
         |ORDER BY g.doc_id""".stripMargin
    },

    // q62: eval grams = DISTINCT 5-grams of the doc_id%20==0 slice;
    // n_shared = distinct shared grams per training doc. Mirrors the
    // kernel's short-doc rule (< n tokens → one whole-text gram), the
    // same union device as q55's fallback.
    "q62_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, array_to_string(tokens[i:i+4], ' ') AS gram
        |    FROM toks, UNNEST(range(1, len(tokens) - 3)) AS t(i)
        |    UNION ALL
        |    SELECT doc_id, array_to_string(tokens, ' ') AS gram
        |    FROM toks WHERE len(tokens) < 5)),
        |ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 20 = 0),
        |tr AS (SELECT doc_id, gram FROM sh WHERE doc_id % 20 <> 0)
        |SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM tr JOIN ev USING (gram)
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    // q65: same tokenization as q59; LN on integer ratios rounds to 6
    // on both sides before ranking so ordering is cross-engine stable
    "q65_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        |dfq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, tok AS token,
        |    ROUND(tf * LN(CAST(n.n AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, token, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
        |  FROM scored)
        |SELECT doc_id, token, score, CAST(rk AS BIGINT) AS rank
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rank""".stripMargin,

    // q66: the oracle's single-window cumsum is the SEMANTIC spec the
    // distributed prefix sum must reproduce; `//` is DuckDB integral
    // division (Spark side uses DIV)
    "q66_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS "offset"
        |  FROM d)
        |SELECT doc_id, n_tokens, "offset",
        |  CAST("offset" // 512 AS BIGINT) AS pack_first,
        |  CAST(("offset" + greatest(n_tokens, 1) - 1) // 512 AS BIGINT) AS pack_last
        |FROM o ORDER BY doc_id""".stripMargin,

    // q67: the oracle is q62's EXACT shape at n=7 — the Bloom prefilter
    // must be invisible in the answer (no false negatives; positives
    // removed by the verify join)
    "q67_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, array_to_string(tokens[i:i+6], ' ') AS gram
        |    FROM toks, UNNEST(range(1, len(tokens) - 5)) AS t(i)
        |    UNION ALL
        |    SELECT doc_id, array_to_string(tokens, ' ') AS gram
        |    FROM toks WHERE len(tokens) < 7)),
        |ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, gram FROM sh WHERE doc_id % 10 <> 0)
        |SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM tr JOIN ev USING (gram)
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    // q68: md5-hex order is engine-portable (q63 memo); id tie-break
    // makes the draw total
    "q68_stratified_sample" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,

    // q69: LN rounds to 6 pre-sum, weighted sum in DECIMAL (order-
    // independent), final mean rounds to 6 — the q65 parity ladder
    "q69_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        |freq AS (SELECT tok, SUM(tf) AS freq FROM tf GROUP BY tok),
        |total AS (SELECT SUM(freq) AS total FROM freq),
        |j AS (
        |  SELECT doc_id, tf.tf,
        |    CAST(ROUND(LN(CAST(freq AS DOUBLE) / total), 6) AS DECIMAL(18,6)) AS lp
        |  FROM tf JOIN freq USING (tok) CROSS JOIN total)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  -(CAST((2 * CAST(-SUM(tf * lp) * 1000000 AS HUGEINT)
        |        + CAST(SUM(tf) AS HUGEINT))
        |      // (2 * CAST(SUM(tf) AS HUGEINT)) AS DOUBLE) / 1e6) AS mean_lp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q70: 1-based inclusive list slices (parity memo); docs whose
    // every segment is duplicated must survive with empty clean_text
    "q70_segment_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id, i, array_to_string(tokens[(i*10+1):(i*10+10)], ' ') AS seg
        |  FROM toks,
        |    UNNEST(range(0, CAST(ceil(len(tokens) / 10.0) AS BIGINT))) AS t(i)),
        |dup AS (
        |  SELECT seg FROM segs GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 2),
        |kept AS (
        |  SELECT s.doc_id, s.i, s.seg FROM segs s ANTI JOIN dup d USING (seg)),
        |reasm AS (
        |  SELECT doc_id, string_agg(seg, ' ' ORDER BY i) AS clean_text,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text,
        |  COALESCE(r.n_kept, 0) AS n_kept
        |FROM documents d LEFT JOIN reasm r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // q64: JL projection contract — empty when cosine preservation
    // bounds hold (the q52/q60 device for non-SQL-expressible ops)
    "q64_random_projection" ->
      """SELECT CAST(NULL AS VARCHAR) AS violation, CAST(NULL AS BIGINT) AS id_a,
        |  CAST(NULL AS BIGINT) AS id_b WHERE FALSE""".stripMargin,

    // q63: identical md5-prefix threshold sampling; hex strings compare
    // lexicographically in both engines, id_sum pins the exact kept set
    "q63_mixture_sample" ->
      """WITH kept AS (
        |  SELECT doc_id, lang FROM documents
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        |    CASE lang WHEN 'en' THEN '80000000' WHEN 'de' THEN 'g'
        |              WHEN 'fr' THEN '40000000' ELSE '19999999' END)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,

    "q56_prequery_loop" ->
      // the loop's net semantics: every (pre-row, templated query) pair
      // unioned = the join of the template's body with the pre-query,
      // pre-row fields carried as metadata columns, filename stamped
      """SELECT n_name, n_nationkey,
        |  r_name AS "__METADATA__r_name",
        |  r_regionkey AS "__METADATA__r_regionkey",
        |  'nations.sql' AS "__METADATA__filename"
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q28_ann_topk" ->
      """WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |           FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, ROUND(
        |  list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv) /
        |  (SQRT(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                           list_transform(embedding, x -> CAST(x AS DOUBLE)))) *
        |   SQRT(list_inner_product(qv, qv))), 6) AS cos_sim
        |FROM embeddings, q
        |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    "q31_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q32_sessionize" -> sessionizeOracle,

    "q33_jq_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q34_jq_project" ->
      """SELECT o_orderkey AS "order", o_custkey AS cust,
        |  LOWER(o_orderpriority) AS priority
        |FROM orders WHERE o_custkey % 10 = 3
        |ORDER BY "order"""".stripMargin,

    "q35_template_dest" ->
      """SELECT 'out_' || l_returnflag || '_' ||
        |  CAST(CAST(FLOOR(l_orderkey / 1000) AS BIGINT) AS VARCHAR) || '.json' AS dest,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY dest""".stripMargin,

    "q36_metadata_strip" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    "q37_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q38_scalar_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_up,
        |  SUBSTRING(p_name, 1, 5) AS name5,
        |  CAST(LENGTH(p_type) AS BIGINT) AS type_len,
        |  CONCAT_WS('-', p_brand, p_type) AS brand_type,
        |  COALESCE(p_name, '?') AS name_nn
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q51_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts,
        |    CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, v.view_value AS asof_view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "q49_char_trigrams" ->
      """SELECT trigram, COUNT(*) AS n FROM (
        |  SELECT substr(text, i, 3) AS trigram
        |  FROM documents, UNNEST(range(1, len(text) - 1)) AS t(i))
        |GROUP BY trigram ORDER BY n DESC, trigram LIMIT 20""".stripMargin,

    "q47_quality_filter" ->
      s"""SELECT doc_id, lang, ${sqlQuality("text")} AS quality,
         |  ${sqlTokenCount("text")} AS n_tokens
         |FROM documents
         |WHERE ${sqlQuality("text")} >= 0.75e0
         |  AND ${sqlTokenCount("text")} BETWEEN 20 AND 2000
         |  AND lang IN ('en', 'de', 'fr')
         |ORDER BY doc_id""".stripMargin,

    "q48_token_histogram" ->
      s"""SELECT CAST(FLOOR(${sqlTokenCount("text")} / 25) * 25 AS BIGINT) AS bucket,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(${sqlTokenCount("text")}) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q42_left_outer" ->
      """SELECT l_returnflag, COUNT(*) AS n, COUNT(o_orderkey) AS n_matched
        |FROM lineitem LEFT JOIN (
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P') o
        |  ON l_orderkey = o.o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q43_full_outer" ->
      """WITH oc AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
        |SELECT COUNT(*) AS total,
        |  COUNT(CASE WHEN n IS NULL THEN 1 END) AS cust_no_orders,
        |  COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS orphan_orders
        |FROM customer FULL OUTER JOIN oc ON c_custkey = o_custkey""".stripMargin,

    "q44_date_parts" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY y, q""".stripMargin,

    "q45_string_agg" ->
      """SELECT c_nationkey,
        |  array_to_string((list_sort(list(c_name)))[1:3], ',') AS top_names
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q46_regex" ->
      """SELECT p_brand,
        |  COUNT(CASE WHEN regexp_matches(p_name, '^(red|blue)') THEN 1 END) AS n_colored,
        |  COUNT(*) AS n
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q39_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    // q71: token-count arithmetic is the single-space formula (q22
    // memo); mean word length rounds to 6 on both sides
    "q71_c4_rules" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |    CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |    ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS DOUBLE) /
        |      (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 6) AS mean_word_len,
        |    CAST(LIST_MAX(LIST_TRANSFORM(string_split_regex(TRIM(text), '\s+'),
        |      w -> LENGTH(w))) AS BIGINT) AS max_word_len,
        |    RIGHT(TRIM(text), 1) IN ('.', '!', '?') AS ends_punct,
        |    (text LIKE '%{%' OR text LIKE '%}%') AS has_brace,
        |    LOWER(text) LIKE '%lorem ipsum%' AS has_lorem
        |  FROM documents)
        |SELECT *, (n_tokens >= 5 AND mean_word_len BETWEEN 3.0 AND 10.0
        |  AND max_word_len <= 30 AND NOT has_brace AND NOT has_lorem) AS keep
        |FROM sig ORDER BY doc_id""".stripMargin,

    // q72: the oracle rebuilds the kernel's ladder the expensive way —
    // char explode, per-char counts, round-6 LN carried as
    // DECIMAL(18,6) so the sum is order-independent, final round 6
    "q72_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, SUBSTR(text, CAST(i AS INT), 1) AS ch
        |  FROM documents, UNNEST(RANGE(1, CAST(LENGTH(text) AS BIGINT) + 1)) AS t(i)
        |  WHERE LENGTH(text) > 0),
        |cnts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, SUM(c) AS L FROM cnts GROUP BY doc_id),
        |terms AS (
        |  SELECT cnts.doc_id, c, L,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / L), 6) AS DECIMAL(18,6)) AS lp
        |  FROM cnts JOIN tot ON cnts.doc_id = tot.doc_id)
        |SELECT doc_id, CAST(MAX(L) AS BIGINT) AS n,
        |  ROUND(-(CAST(SUM(c * lp) AS DOUBLE) / MAX(L)), 6) AS entropy
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q73: CMS guarantee contract — the violation set is empty
    "q73_cms_heavy_hitters" ->
      """SELECT CAST(NULL AS VARCHAR) AS token, CAST(NULL AS BIGINT) AS est,
        |  CAST(NULL AS BIGINT) AS exact WHERE FALSE""".stripMargin,

    // q74: SemDeDup keep-min-id contract — the violation set is empty
    "q74_semdedup" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
        |  CAST(NULL AS DOUBLE) AS cos_sim WHERE FALSE""".stripMargin,

    // q75: per-anchor argmax re-derived via windows; round-6 cosine and
    // (score DESC, id ASC) tie order mirror the struct-max exactly
    "q75_contrastive_mine" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS anchor_id, b.vec_id AS bid,
        |    (a.label = b.label) AS same,
        |    ROUND(list_inner_product(a.v, b.v) /
        |      (SQRT(list_inner_product(a.v, a.v)) *
        |       SQRT(list_inner_product(b.v, b.v))), 6) AS c
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |pos AS (SELECT anchor_id, bid, c,
        |    ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY c DESC, bid) AS rn
        |  FROM p WHERE same),
        |neg AS (SELECT anchor_id, bid, c,
        |    ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY c DESC, bid) AS rn
        |  FROM p WHERE NOT same)
        |SELECT pos.anchor_id, pos.bid AS pos_id, pos.c AS pos_cos,
        |  neg.bid AS neg_id, neg.c AS neg_cos
        |FROM pos JOIN neg ON pos.anchor_id = neg.anchor_id
        |WHERE pos.rn = 1 AND neg.rn = 1
        |ORDER BY pos.anchor_id""".stripMargin,

    // q76: the naive window IS the semantic spec the two-phase rank
    // must equal; bucket arithmetic is integral on both engines
    "q76_quality_buckets" ->
      """WITH chars AS (
        |  SELECT doc_id, SUBSTR(text, CAST(i AS INT), 1) AS ch
        |  FROM documents, UNNEST(RANGE(1, CAST(LENGTH(text) AS BIGINT) + 1)) AS t(i)
        |  WHERE LENGTH(text) > 0),
        |cnts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, SUM(c) AS L FROM cnts GROUP BY doc_id),
        |terms AS (
        |  SELECT cnts.doc_id, c, L,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / L), 6) AS DECIMAL(18,6)) AS lp
        |  FROM cnts JOIN tot ON cnts.doc_id = tot.doc_id),
        |ent AS (
        |  SELECT doc_id, ROUND(-(CAST(SUM(c * lp) AS DOUBLE) / MAX(L)), 6) AS score
        |  FROM terms GROUP BY doc_id),
        |r AS (
        |  SELECT d.doc_id, d.lang, e.score,
        |    ROW_NUMBER() OVER (PARTITION BY d.lang ORDER BY e.score, d.doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY d.lang) AS n
        |  FROM documents d JOIN ent e ON d.doc_id = e.doc_id)
        |SELECT doc_id, lang, score, CAST(rk AS BIGINT) AS rk,
        |  CAST(n AS BIGINT) AS n_stratum,
        |  CAST((rk - 1) * 3 // n + 1 AS BIGINT) AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    // q77: anti-join on the seen digest set + keep-min-id within the
    // batch; md5 hex agrees across engines (q20 memo). The digest key
    // is the null-normalized 'v'+value / 'n' encoding of
    // Dedup.contentDigest, so NULL keys dedup identically in both
    // engines (round-7 ADVICE).
    "q77_incremental_dedup" ->
      """WITH seen AS (
        |  SELECT DISTINCT md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END)
        |    AS digest FROM documents WHERE doc_id % 3 <> 1),
        |batch AS (
        |  SELECT doc_id, text,
        |    md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END) AS dg,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END)
        |      ORDER BY doc_id) AS rn
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT doc_id, text
        |FROM batch b ANTI JOIN seen s ON b.dg = s.digest
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // q78: the naive per-stratum running-sum window is the semantic
    // spec; md5-hex order is engine-portable (q63 memo)
    "q78_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM d)
        |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(prefix AS BIGINT) AS prefix
        |FROM p WHERE prefix < 3000 ORDER BY doc_id""".stripMargin,

    // q79: the one-pass stats projection, each signal via the shared
    // SQL builder (single source of truth with the Spark kernels)
    "q79_document_stats" ->
      s"""SELECT doc_id,
         |  ${sqlTokenCount("text")} AS n_tokens,
         |  ${sqlPunctCount("text")} AS n_punct,
         |  ${sqlStopwordHits("text")} AS n_stopwords,
         |  ${sqlQuality("text")} AS quality,
         |  ${sqlLangId("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,

    // q80: the q28 cosine top-k joined to document metadata
    "q80_semantic_retrieval" ->
      """WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |           FROM embeddings WHERE vec_id = 0),
        |top AS (
        |  SELECT vec_id, ROUND(
        |    list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv) /
        |    (SQRT(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                             list_transform(embedding, x -> CAST(x AS DOUBLE)))) *
        |     SQRT(list_inner_product(qv, qv))), 6) AS cos_sim
        |  FROM embeddings, q
        |  ORDER BY cos_sim DESC, vec_id LIMIT 10)
        |SELECT d.doc_id, t.cos_sim, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
        |FROM top t JOIN documents d ON t.vec_id = d.doc_id
        |ORDER BY t.cos_sim DESC, d.doc_id""".stripMargin,

    // q81: q71's gate ∘ q72's ladder ∘ q78's budget, composed
    "q81_curation_pipeline" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |    CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |    ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS DOUBLE) /
        |      (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 6) AS mean_word_len,
        |    CAST(LIST_MAX(LIST_TRANSFORM(string_split_regex(TRIM(text), '\s+'),
        |      w -> LENGTH(w))) AS BIGINT) AS max_word_len,
        |    (text LIKE '%{%' OR text LIKE '%}%') AS has_brace,
        |    LOWER(text) LIKE '%lorem ipsum%' AS has_lorem
        |  FROM documents),
        |chars AS (
        |  SELECT doc_id, SUBSTR(text, CAST(i AS INT), 1) AS ch
        |  FROM documents, UNNEST(RANGE(1, CAST(LENGTH(text) AS BIGINT) + 1)) AS t(i)
        |  WHERE LENGTH(text) > 0),
        |cnts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, SUM(c) AS L FROM cnts GROUP BY doc_id),
        |terms AS (
        |  SELECT cnts.doc_id, c, L,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / L), 6) AS DECIMAL(18,6)) AS lp
        |  FROM cnts JOIN tot ON cnts.doc_id = tot.doc_id),
        |ent AS (
        |  SELECT doc_id, ROUND(-(CAST(SUM(c * lp) AS DOUBLE) / MAX(L)), 6) AS entropy
        |  FROM terms GROUP BY doc_id),
        |base AS (
        |  SELECT d.doc_id, d.lang, s.n_tokens, e.entropy,
        |    md5(CAST(d.doc_id AS VARCHAR)) AS h
        |  FROM documents d
        |  JOIN sig s ON d.doc_id = s.doc_id
        |  JOIN ent e ON d.doc_id = e.doc_id
        |  WHERE s.n_tokens >= 5 AND s.mean_word_len BETWEEN 3.0 AND 10.0
        |    AND s.max_word_len <= 30 AND NOT s.has_brace AND NOT s.has_lorem
        |    AND e.entropy >= 2.6e0),
        |p AS (
        |  SELECT doc_id, lang, n_tokens, entropy,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM base)
        |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, entropy,
        |  CAST(prefix AS BIGINT) AS prefix
        |FROM p WHERE prefix < 3000 ORDER BY doc_id""".stripMargin,

    // q82: exact DECIMAL moments, then the identical IEEE double
    // mean/var/z formula in the same operation order on both engines
    "q82_event_outliers" ->
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS s,
        |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS ss
        |  FROM events GROUP BY event_type),
        |z AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    ROUND((e.value - CAST(st.s AS DOUBLE) / st.n) /
        |      SQRT((CAST(st.ss AS DOUBLE) -
        |        CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE) / st.n) /
        |        (st.n - 1)), 6) AS z
        |  FROM events e JOIN st USING (event_type))
        |SELECT event_id, event_type, value, z
        |FROM z WHERE ABS(z) > 3 ORDER BY event_id""".stripMargin,

    // q83: identical semantics to q77 — the streaming runtime must
    // reproduce the batch rolling-corpus dedup exactly (same
    // null-normalized digest key)
    "q83_stream_incremental_dedup" ->
      """WITH seen AS (
        |  SELECT DISTINCT md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END)
        |    AS digest FROM documents WHERE doc_id % 3 <> 1),
        |batch AS (
        |  SELECT doc_id, text,
        |    md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END) AS dg,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END)
        |      ORDER BY doc_id) AS rn
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT doc_id, text
        |FROM batch b ANTI JOIN seen s ON b.dg = s.digest
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // q84: add-one-smoothed bigram NLL vs the 'en' reference slice;
    // term = ln(c(w1)+V) - ln(c(w1 w2)+1), rounded to 6 decimals and
    // summed as DECIMAL(18,6) (round-6-LN ladder). Docs with <2 tokens
    // score NULL.
    "q84_lm_perplexity" ->
      """WITH rt AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents WHERE lang = 'en'),
        |uni AS (
        |  SELECT w, COUNT(*) AS cu
        |  FROM (SELECT UNNEST(ws) AS w FROM rt) GROUP BY w),
        |vocab AS (SELECT COUNT(*) AS v FROM uni),
        |bi AS (
        |  SELECT ws[i] AS w1, ws[i+1] AS w2, COUNT(*) AS cb
        |  FROM rt, UNNEST(range(1, len(ws))) AS t(i)
        |  GROUP BY 1, 2),
        |db AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |        FROM documents),
        |       UNNEST(range(1, len(ws))) AS t(i)),
        |terms AS (
        |  SELECT doc_id,
        |    CAST(ROUND(LN(COALESCE(u.cu, 0) + v.v) - LN(COALESCE(b.cb, 0) + 1), 6)
        |      AS DECIMAL(18,6)) AS term
        |  FROM db
        |  LEFT JOIN uni u ON u.w = db.w1
        |  LEFT JOIN bi b ON b.w1 = db.w1 AND b.w2 = db.w2
        |  CROSS JOIN vocab v),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    SUM(term) AS nll_sum
        |  FROM terms GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  ROUND(CAST(a.nll_sum AS DOUBLE), 6) AS nll,
        |  CAST((2 * CAST(a.nll_sum * 1000000 AS HUGEINT)
        |      + CAST(a.n_bigrams AS HUGEINT))
        |    // (2 * CAST(a.n_bigrams AS HUGEINT)) AS DOUBLE) / 1e6 AS avg_nll
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // q85: the oracle replays the SAME deterministic 2-iteration Lloyd
    // trajectory — init = first k by id, round-6 elements, DECIMAL
    // distance sums, argmin tie-break on cluster id, round-6 centroid
    // means — so assignment and distance hash-match across engines
    "q85_kmeans_lloyd" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS xe
        |  FROM embeddings),
        |c0 AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl, xe AS c
        |  FROM e ORDER BY vec_id LIMIT 8),
        |d1 AS (
        |  SELECT e.vec_id, c0.cl,
        |    SUM(CAST(ROUND((e.xe[i] - c0.c[i]) * (e.xe[i] - c0.c[i]), 6)
        |      AS DECIMAL(18,6))) AS dist
        |  FROM e CROSS JOIN c0, UNNEST(range(1, 65)) AS t(i)
        |  GROUP BY 1, 2),
        |a1 AS (
        |  SELECT vec_id, cl FROM (
        |    SELECT vec_id, cl,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
        |    FROM d1) WHERE rn = 1),
        |s1 AS (
        |  SELECT a1.cl, t.i, SUM(CAST(e.xe[t.i] AS DECIMAL(18,6))) AS s,
        |    COUNT(*) AS n
        |  FROM e JOIN a1 USING (vec_id), UNNEST(range(1, 65)) AS t(i)
        |  GROUP BY 1, 2),
        |c1 AS (
        |  SELECT cl, list(round(CAST(s AS DOUBLE) / n, 6) ORDER BY i) AS c
        |  FROM s1 GROUP BY cl),
        |d2 AS (
        |  SELECT e.vec_id, c1.cl,
        |    SUM(CAST(ROUND((e.xe[i] - c1.c[i]) * (e.xe[i] - c1.c[i]), 6)
        |      AS DECIMAL(18,6))) AS dist
        |  FROM e CROSS JOIN c1, UNNEST(range(1, 65)) AS t(i)
        |  GROUP BY 1, 2)
        |SELECT vec_id, cl AS cluster, ROUND(CAST(dist AS DOUBLE), 6) AS dist2
        |FROM (SELECT vec_id, cl, dist,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
        |      FROM d2) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,

    // q86: same md5-prefix device as q63, with the per-stratum weight
    // DERIVED in SQL: w = round((nmin/ns)^0.5, 6), threshold =
    // floor(w * 2^32) as 8 lowercase hex digits ('g' when w >= 1)
    "q86_temperature_mixture" ->
      """WITH c AS (SELECT lang, COUNT(*) AS ns FROM documents GROUP BY lang),
        |m AS (SELECT MIN(ns) AS nmin FROM c),
        |thr AS (
        |  SELECT lang, ns, w,
        |    CASE WHEN w >= 1 THEN 'g'
        |         ELSE lower(lpad(to_hex(CAST(FLOOR(w * 4294967296) AS BIGINT)),
        |                         8, '0'))
        |    END AS t
        |  FROM (SELECT lang, ns,
        |          ROUND(POW(CAST(nmin AS DOUBLE) / ns, 0.5e0), 6) AS w
        |        FROM c CROSS JOIN m))
        |SELECT d.lang, CAST(MAX(thr.ns) AS BIGINT) AS n_stratum,
        |  MAX(thr.w) AS weight,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
        |FROM documents d JOIN thr USING (lang)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.t
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // q87: the oracle uses the textbook explode + (doc, gram) group —
    // the Spark side's sorted-neighbor-run projection must reproduce
    // it exactly (an occurrence is duplicated iff its gram count >= 2
    // iff it touches an equal gram in sorted order)
    "q87_dup_ngram_fraction" ->
      """WITH dt AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |c2 AS (
        |  SELECT doc_id, gram, COUNT(*) AS n FROM (
        |    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
        |    FROM dt, UNNEST(range(1, len(ws))) AS t(i))
        |  GROUP BY 1, 2),
        |a2 AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS bi_total,
        |    CAST(COALESCE(SUM(n) FILTER (n >= 2), 0) AS BIGINT) AS bi_dup
        |  FROM c2 GROUP BY 1),
        |c3 AS (
        |  SELECT doc_id, gram, COUNT(*) AS n FROM (
        |    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
        |    FROM dt, UNNEST(range(1, len(ws) - 1)) AS t(i))
        |  GROUP BY 1, 2),
        |a3 AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS tri_total,
        |    CAST(COALESCE(SUM(n) FILTER (n >= 2), 0) AS BIGINT) AS tri_dup
        |  FROM c3 GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a2.bi_total, 0) AS BIGINT) AS bi_total,
        |  CAST(COALESCE(a2.bi_dup, 0) AS BIGINT) AS bi_dup,
        |  CASE WHEN COALESCE(a2.bi_total, 0) = 0 THEN NULL
        |       ELSE ROUND(CAST(a2.bi_dup AS DOUBLE) / a2.bi_total, 6)
        |  END AS bi_frac,
        |  CAST(COALESCE(a3.tri_total, 0) AS BIGINT) AS tri_total,
        |  CAST(COALESCE(a3.tri_dup, 0) AS BIGINT) AS tri_dup,
        |  CASE WHEN COALESCE(a3.tri_total, 0) = 0 THEN NULL
        |       ELSE ROUND(CAST(a3.tri_dup AS DOUBLE) / a3.tri_total, 6)
        |  END AS tri_frac
        |FROM documents d LEFT JOIN a2 USING (doc_id)
        |               LEFT JOIN a3 USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // q88: leading-10-token-segment digests; shared segment across any
    // two docs marks both as near-dup candidates
    "q88_source_mix_report" ->
      ("""WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS tokens
        |  FROM documents),
        |seg AS (
        |  SELECT doc_id, source, len(tokens) AS n_tok,
        |    md5(array_to_string(tokens[1:10], ' ')) AS sd
        |  FROM toks),
        |dup AS (SELECT sd FROM seg GROUP BY sd HAVING COUNT(*) >= 2),
        |fl AS (
        |  SELECT s.source, s.n_tok, (d.sd IS NOT NULL) AS nd
        |  FROM seg s LEFT JOIN dup d USING (sd))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN nd THEN 1 ELSE 0 END) AS BIGINT) AS neardup_docs,
        |  """.stripMargin +
      huRatio6("SUM(CASE WHEN nd THEN 1 ELSE 0 END)", "COUNT(*)") +
      """ AS neardup_frac,
        |  """.stripMargin +
      huRatio6("SUM(n_tok)", "COUNT(*)") + """ AS mean_tokens,
        |  ((2 * CAST(SUM(CASE WHEN nd THEN 1 ELSE 0 END) AS HUGEINT)
        |      * 1000000 + CAST(COUNT(*) AS HUGEINT))
        |      // (2 * CAST(COUNT(*) AS HUGEINT)) <= 300000
        |    AND COUNT(*) >= 10) AS keep
        |FROM fl GROUP BY source ORDER BY source""".stripMargin),

    // q89: the portable bucket hash is ('0x'||substr(md5,1,4))::INT %
    // 1024 = Spark's conv(substring(md5,1,4),16,10) % 1024; per-bucket
    // log-ratios round to 6 pre-sum and accumulate as DECIMAL(18,6)
    // (the round-6-LN ladder). NULL-lang rows would count toward
    // neither distribution on both engines (CASE WHEN three-valued).
    "q89_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang,
        |    (('0x' || substr(md5(tok), 1, 4))::INT % 1024) AS bk
        |  FROM toks),
        |cnt AS (
        |  SELECT bk,
        |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt,
        |    SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS r_cnt
        |  FROM b GROUP BY bk),
        |tot AS (SELECT SUM(t_cnt) AS nt, SUM(r_cnt) AS nr FROM cnt),
        |lam AS (
        |  SELECT bk, CAST(ROUND(
        |    LN((t_cnt + 1.0) / (nt + 1024)) - LN((r_cnt + 1.0) / (nr + 1024)), 6)
        |    AS DECIMAL(18,6)) AS lam
        |  FROM cnt CROSS JOIN tot),
        |score AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens, SUM(lam) AS s
        |  FROM b JOIN lam USING (bk) GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  ROUND(CAST(s AS DOUBLE), 6) AS logw,
        |  CASE WHEN s < 0 THEN
        |    -(CAST((2 * CAST(-s * 1000000 AS HUGEINT)
        |          + CAST(n_tokens AS HUGEINT))
        |        // (2 * CAST(n_tokens AS HUGEINT)) AS DOUBLE) / 1e6)
        |  ELSE
        |    CAST((2 * CAST(s * 1000000 AS HUGEINT)
        |          + CAST(n_tokens AS HUGEINT))
        |        // (2 * CAST(n_tokens AS HUGEINT)) AS DOUBLE) / 1e6
        |  END AS avg_logw
        |FROM score ORDER BY doc_id""".stripMargin,

    // q90: 15-token sliding windows (1-based inclusive slices); a
    // window duplicated anywhere (>= 2 occurrences corpus-wide,
    // within-doc included) covers its 15 positions; docs shorter than
    // the window pass through untouched
    "q90_substring_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, i, md5(array_to_string(tokens[i:i+14], ' ')) AS h
        |  FROM toks, UNNEST(range(1, len(tokens) - 13)) AS t(i)),
        |dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) >= 2),
        |dwin AS (SELECT w.doc_id, w.i FROM win w JOIN dup USING (h)),
        |cov AS (SELECT DISTINCT doc_id, i + o AS p
        |  FROM dwin, UNNEST(range(0, 15)) AS t(o)),
        |pos AS (
        |  SELECT doc_id, i AS p, tokens[i] AS tok
        |  FROM toks, UNNEST(range(1, len(tokens) + 1)) AS t(i)),
        |keptpos AS (
        |  SELECT pos.doc_id, p, tok FROM pos ANTI JOIN cov USING (doc_id, p)),
        |reasm AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept
        |  FROM keptpos GROUP BY doc_id),
        |full_len AS (SELECT doc_id, len(tokens) AS n_tok FROM toks)
        |SELECT f.doc_id, COALESCE(r.clean_text, '') AS clean_text,
        |  COALESCE(r.n_kept, 0) AS n_kept,
        |  CAST(f.n_tok - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
        |FROM full_len f LEFT JOIN reasm r USING (doc_id)
        |ORDER BY f.doc_id""".stripMargin,

    // q91: textbook derivation — explode grams, count per (doc, gram),
    // ROW_NUMBER by (count DESC, gram ASC) picks the same top gram as
    // the Spark side's longest-sorted-run fold; char denominator is
    // the single-space-joined token text on both engines
    "q91_top_ngram_fraction" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |chars AS (SELECT doc_id, len(array_to_string(ws, ' ')) AS n_chars FROM toks),
        |g2 AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
        |c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
        |t2 AS (SELECT doc_id, c, gram FROM (
        |  SELECT doc_id, c, gram, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY c DESC, gram ASC) AS rk FROM c2) WHERE rk = 1),
        |g3 AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |c3 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
        |t3 AS (SELECT doc_id, c, gram FROM (
        |  SELECT doc_id, c, gram, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY c DESC, gram ASC) AS rk FROM c3) WHERE rk = 1),
        |g4 AS (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 2)) AS t(i) WHERE len(ws) >= 4),
        |c4 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g4 GROUP BY 1, 2),
        |t4 AS (SELECT doc_id, c, gram FROM (
        |  SELECT doc_id, c, gram, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY c DESC, gram ASC) AS rk FROM c4) WHERE rk = 1)
        |SELECT ch.doc_id,
        |  CAST(COALESCE(t2.c, 0) AS BIGINT) AS top2_count,
        |  CASE WHEN t2.c IS NULL OR ch.n_chars = 0 THEN NULL
        |       ELSE ROUND(CAST(t2.c * len(t2.gram) AS DOUBLE) / ch.n_chars, 6)
        |  END AS top2_frac,
        |  CAST(COALESCE(t3.c, 0) AS BIGINT) AS top3_count,
        |  CASE WHEN t3.c IS NULL OR ch.n_chars = 0 THEN NULL
        |       ELSE ROUND(CAST(t3.c * len(t3.gram) AS DOUBLE) / ch.n_chars, 6)
        |  END AS top3_frac,
        |  CAST(COALESCE(t4.c, 0) AS BIGINT) AS top4_count,
        |  CASE WHEN t4.c IS NULL OR ch.n_chars = 0 THEN NULL
        |       ELSE ROUND(CAST(t4.c * len(t4.gram) AS DOUBLE) / ch.n_chars, 6)
        |  END AS top4_frac
        |FROM chars ch LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |  LEFT JOIN t4 USING (doc_id)
        |ORDER BY ch.doc_id""".stripMargin,

    // q92: min-position chain derivation — stage k's earliest match is
    // the min ROW_NUMBER (by ts, event_id) strictly after stage k-1's;
    // equivalent to the Spark side's greedy subsequence fold
    "q92_funnel" ->
      """WITH pos AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
        |  FROM events WHERE event_type IN ('view','click','purchase')),
        |u1 AS (SELECT user_id, MIN(p) AS p1 FROM pos
        |  WHERE event_type='view' GROUP BY 1),
        |u2 AS (SELECT pos.user_id, MIN(p) AS p2 FROM pos JOIN u1 USING (user_id)
        |  WHERE event_type='click' AND p > p1 GROUP BY 1),
        |u3 AS (SELECT pos.user_id, MIN(p) AS p3 FROM pos JOIN u2 USING (user_id)
        |  WHERE event_type='purchase' AND p > p2 GROUP BY 1),
        |c AS (SELECT (SELECT COUNT(*) FROM u1) AS c1,
        |             (SELECT COUNT(*) FROM u2) AS c2,
        |             (SELECT COUNT(*) FROM u3) AS c3)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |    c1 AS n_users, CAST(NULL AS DOUBLE) AS conversion FROM c
        |  UNION ALL
        |  SELECT 2, 'click', c2,
        |    ROUND(CAST(c2 AS DOUBLE)/NULLIF(c1,0), 6) FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', c3,
        |    ROUND(CAST(c3 AS DOUBLE)/NULLIF(c2,0), 6) FROM c)
        |ORDER BY stage""".stripMargin,

    "q93_retention_cohorts" ->
      """WITH w AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |u AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY 1),
        |a AS (SELECT DISTINCT w.user_id, u.cohort,
        |        CAST(date_diff('day', u.cohort, w.wk) // 7 AS BIGINT)
        |          AS week_offset
        |      FROM w JOIN u USING (user_id))
        |SELECT cohort AS cohort_week, week_offset, COUNT(*) AS n_users
        |FROM a GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // q94: PMI arithmetic is the same left-associated double expression
    // on both engines; ln rounds to 6 decimals (round-6-LN device)
    "q94_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |uni AS (SELECT w AS term, COUNT(*) AS c
        |  FROM toks, UNNEST(ws) AS t(w) GROUP BY 1),
        |nu AS (SELECT SUM(c) AS n_uni FROM uni),
        |big AS (SELECT array_to_string(ws[i:i+1], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
        |bcall AS (SELECT gram, COUNT(*) AS cxy FROM big GROUP BY 1),
        |nb AS (SELECT SUM(cxy) AS n_bi FROM bcall),
        |bc AS (SELECT gram, cxy, split_part(gram, ' ', 1) AS x,
        |         split_part(gram, ' ', 2) AS y
        |       FROM bcall WHERE cxy >= 5)
        |SELECT gram, cxy AS n_pair,
        |  ROUND(LN(CAST(cxy AS DOUBLE) * nu.n_uni * nu.n_uni /
        |    (CAST(nb.n_bi AS DOUBLE) * ux.c * uy.c)), 6) AS pmi
        |FROM bc, nu, nb
        |JOIN uni ux ON ux.term = bc.x
        |JOIN uni uy ON uy.term = bc.y
        |ORDER BY pmi DESC, gram ASC LIMIT 50""".stripMargin,

    // q95: same start-position construction (regular strides whose
    // window fits strictly inside, plus the tail window at n-size+1)
    "q95_chunk_windows" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |st AS (SELECT doc_id, ws,
        |  CASE WHEN len(ws) <= 32 THEN [1]
        |       ELSE list_filter(range(1, len(ws)+1, 24),
        |              st -> st + 31 < len(ws)) || [len(ws) - 31]
        |  END AS starts FROM toks)
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_id,
        |  CAST(starts[i] AS BIGINT) AS start_tok,
        |  CAST(len(ws[starts[i]:least(starts[i]+31, len(ws))]) AS BIGINT)
        |    AS n_tok,
        |  array_to_string(ws[starts[i]:least(starts[i]+31, len(ws))], ' ')
        |    AS chunk_text
        |FROM st, UNNEST(range(1, len(starts)+1)) AS t(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // q96: least squares on round-6-ln DECIMAL sums; the final slope/
    // intercept divisions run on exact decimal-derived doubles
    "q96_zipf_slope" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |uni AS (SELECT w AS term, COUNT(*) AS c
        |  FROM toks, UNNEST(ws) AS t(w) GROUP BY 1),
        |top AS (SELECT term, c,
        |    ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS rk
        |  FROM uni ORDER BY c DESC, term ASC LIMIT 500),
        |pts AS (SELECT
        |    CAST(ROUND(LN(CAST(rk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |  FROM top),
        |s AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |  CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |  CAST(SUM(x * x) AS DOUBLE) AS sxx
        |  FROM pts)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  CASE WHEN n * sxx - sx * sx = 0e0 THEN NULL
        |    ELSE ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |  END AS slope,
        |  CASE WHEN n * sxx - sx * sx = 0e0 THEN NULL
        |    ELSE ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
        |      / n, 6)
        |  END AS intercept
        |FROM s""".stripMargin,

    // q97: same DECIMAL ladder (round-6 values, round-12 squares,
    // exact sums) and the same fixed double mean/std expressions
    "q97_dim_standardize" ->
      """WITH ex AS (
        |  SELECT CAST(i AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
        |agg AS (SELECT dim, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(ROUND(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sq
        |  FROM ex GROUP BY dim)
        |SELECT dim, CAST(n AS BIGINT) AS n, ROUND(sx / n, 6) AS mean,
        |  ROUND(SQRT(GREATEST(sq / n - (sx / n) * (sx / n), 0e0)), 6) AS std
        |FROM agg ORDER BY dim""".stripMargin,

    "q98_pivot_revenue" ->
      """SELECT n.n_name,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE year(o.o_orderdate)=1995) AS DOUBLE) AS y1995,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE year(o.o_orderdate)=1996) AS DOUBLE) AS y1996,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE year(o.o_orderdate)=1997) AS DOUBLE) AS y1997,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE year(o.o_orderdate)=1998) AS DOUBLE) AS y1998,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE year(o.o_orderdate)=1999) AS DOUBLE) AS y1999,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE year(o.o_orderdate)=2000) AS DOUBLE) AS y2000,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE year(o.o_orderdate)=2001) AS DOUBLE) AS y2001
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q99: textbook range-join derivation (DuckDB's IEJoin handles the
    // non-equi predicate); proximity on exact epoch microseconds
    "q99_interval_join" ->
      """WITH l AS (SELECT event_id, epoch_us(ts) AS lus FROM events
        |  WHERE event_type='error'),
        |r AS (SELECT epoch_us(ts) AS rus FROM events
        |  WHERE event_type='purchase')
        |SELECT l.event_id, CAST(COUNT(r.rus) AS BIGINT) AS n_nearby
        |FROM l LEFT JOIN r ON ABS(r.rus - l.lus) <= 300000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q100_cube_revenue" ->
      """SELECT
        |  CASE WHEN GROUPING(n.n_name)=1 THEN '(all)' ELSE n.n_name END
        |    AS nation,
        |  CASE WHEN GROUPING(year(o.o_orderdate))=1 THEN 0
        |       ELSE year(o.o_orderdate) END AS yr,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
        |JOIN nation n ON c.c_nationkey=n.n_nationkey
        |GROUP BY CUBE(n.n_name, year(o.o_orderdate))
        |ORDER BY 1, 2""".stripMargin,

    // q101: batch/stream parity — the streaming funnel must reproduce
    // q92's batch result on an ordered replay, so the oracle is q92's
    "q101_stream_funnel" ->
      """WITH pos AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
        |  FROM events WHERE event_type IN ('view','click','purchase')),
        |u1 AS (SELECT user_id, MIN(p) AS p1 FROM pos
        |  WHERE event_type='view' GROUP BY 1),
        |u2 AS (SELECT pos.user_id, MIN(p) AS p2 FROM pos JOIN u1 USING (user_id)
        |  WHERE event_type='click' AND p > p1 GROUP BY 1),
        |u3 AS (SELECT pos.user_id, MIN(p) AS p3 FROM pos JOIN u2 USING (user_id)
        |  WHERE event_type='purchase' AND p > p2 GROUP BY 1),
        |c AS (SELECT (SELECT COUNT(*) FROM u1) AS c1,
        |             (SELECT COUNT(*) FROM u2) AS c2,
        |             (SELECT COUNT(*) FROM u3) AS c3)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |    c1 AS n_users, CAST(NULL AS DOUBLE) AS conversion FROM c
        |  UNION ALL
        |  SELECT 2, 'click', c2,
        |    ROUND(CAST(c2 AS DOUBLE)/NULLIF(c1,0), 6) FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', c3,
        |    ROUND(CAST(c3 AS DOUBLE)/NULLIF(c2,0), 6) FROM c)
        |ORDER BY stage""".stripMargin,

    // q102: identical A-RES construction — exact integer uniform from
    // the first 8 md5 hex digits, pow is the only libm call (round-6)
    "q102_weighted_sample" -> {
      val vv = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr(h,$i,1))-1)*${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH b AS (SELECT doc_id, n_chars,
         |  md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |v AS (SELECT doc_id, n_chars, $vv AS vv,
         |  GREATEST(n_chars, 1) AS w FROM b)
         |SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         |  ROUND(POW((vv + 0.5e0)/4294967296e0, 1e0/w), 6) AS skey
         |FROM v ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin
    },

    "q103_bm25" -> {
      val terms = Seq("spark", "join", "window")
      val dfs = terms.zipWithIndex.map { case (t, i) =>
        s"SUM(CASE WHEN ${sqlWordHits("text", t)} > 0 THEN 1 ELSE 0 END) AS df$i"
      }.mkString(",\n  ")
      val contribs = terms.zipWithIndex.map { case (t, i) =>
        s"""CAST(CASE WHEN ${sqlWordHits("d.text", t)} > 0 THEN ROUND(
           |ROUND(LN((s.n - s.df$i + 0.5e0) / (s.df$i + 0.5e0) + 1e0), 6) *
           |(CAST(${sqlWordHits("d.text", t)} AS DOUBLE) * (1.2e0 + 1e0)) /
           |(CAST(${sqlWordHits("d.text", t)} AS DOUBLE) + 1.2e0 * (0.25e0 +
           |0.75e0 * (CAST(${sqlTokenCount("d.text")} AS DOUBLE) /
           |(CAST(s.tdl AS DOUBLE) / s.n)))), 6)
           |ELSE 0 END AS DECIMAL(18,6))""".stripMargin
      }.mkString(" + ")
      s"""WITH s AS (SELECT COUNT(*) AS n, SUM(${sqlTokenCount("text")}) AS tdl,
         |  $dfs FROM documents),
         |sc AS (SELECT d.doc_id, CAST(($contribs) AS DOUBLE) AS score
         |  FROM documents d, s)
         |SELECT doc_id, score FROM sc WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },

    "q104_rank_windows" ->
      """WITH r AS (SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |    CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |    CAST(ROW_NUMBER() OVER w AS HUGEINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS HUGEINT) AS n
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |    ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey))
        |SELECT c_custkey, c_nationkey, bal, quartile,
        |  CASE WHEN n = 1 THEN 0.0 ELSE
        |    CAST((2 * (rn - 1) * 1000000 + (n - 1)) // (2 * (n - 1))
        |      AS DOUBLE) / 1e6 END AS pct_rank,
        |  CAST((2 * rn * 1000000 + n) // (2 * n) AS DOUBLE) / 1e6 AS cume
        |FROM r
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    // q105: the streaming interval join must reproduce the batch
    // result on a full replay, so the oracle is q99's
    "q105_stream_interval_join" ->
      """WITH l AS (SELECT event_id, epoch_us(ts) AS lus FROM events
        |  WHERE event_type='error'),
        |r AS (SELECT epoch_us(ts) AS rus FROM events
        |  WHERE event_type='purchase')
        |SELECT l.event_id, CAST(COUNT(r.rus) AS BIGINT) AS n_nearby
        |FROM l LEFT JOIN r ON ABS(r.rus - l.lus) <= 300000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q106: quantile_cont == Spark's exact interpolated percentile on
    // identical DECIMAL(18,2)-derived doubles
    "q106_group_percentiles" ->
      """SELECT n.n_name, COUNT(*) AS n_orders,
        |  ROUND(quantile_cont(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
        |    AS DOUBLE), 0.25e0), 6) AS p25,
        |  ROUND(quantile_cont(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
        |    AS DOUBLE), 0.5e0), 6) AS median,
        |  ROUND(quantile_cont(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
        |    AS DOUBLE), 0.75e0), 6) AS p75
        |FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
        |JOIN nation n ON c.c_nationkey=n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q107_price_histogram" ->
      """WITH b AS (SELECT
        |  CAST(LEAST(GREATEST(FLOOR(CAST(l_extendedprice AS DOUBLE) / 5000e0),
        |    0e0), 19e0) AS BIGINT) AS bucket,
        |  CAST(l_extendedprice AS DECIMAL(18,2)) AS p FROM lineitem)
        |SELECT bucket, COUNT(*) AS n, CAST(SUM(p) AS DOUBLE) AS total
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // q108: moments are exact DECIMAL sums; corr/cov derive in fixed
    // double expressions — order-independent unlike streaming corr()
    "q108_corr_moments" ->
      """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |    CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |    CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  ROUND((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) *
        |    SQRT(n * syy - sy * sy)), 6) AS corr_qty_price,
        |  ROUND((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n), 6) AS cov_pop
        |FROM m ORDER BY 1""".stripMargin,

    // q109: each merge replayed over a DOUBLE-space token encoding
    // ('  a  b  c  '): the pattern ' l  r ' consumes only the inner
    // space of each boundary and the replacement ' lr ' restores it,
    // so one left-to-right non-overlapping REPLACE pass IS the greedy
    // leftmost merge — including self-pair chains ('a a a a a' ->
    // 'aa aa a'), where a shared-delimiter single-space encoding
    // skips every other match and fixpoints at the wrong tokens
    "q109_bpe_merges" -> {
      val iters = 5
      val sel = (1 to iters)
        .map(i => s"SELECT $i AS merge_rank, l, r, c FROM m$i")
        .mkString(" UNION ALL ")
      bpeChainSql(iters) +
        s"""
           |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, l AS lhs,
           |  r AS rhs, CAST(c AS BIGINT) AS pair_count
           |FROM ($sel) ORDER BY merge_rank""".stripMargin
    },

    // q110: the q109 chain re-applied to every document — the encoded
    // vocab table w{iters} carries each word's final tokenization, so
    // per-doc stats are a word join + sum (the oracle mirror of the
    // kernel's map-only pass); empty words count zero tokens
    "q110_bpe_encode" -> {
      val iters = 5
      bpeChainSql(iters) +
        s""",
           |enc AS (SELECT w, CASE WHEN len(w) = 0 THEN 0
           |    ELSE len(string_split_regex(trim(s), ' +')) END AS nt
           |  FROM w$iters)
           |SELECT t.doc_id, CAST(SUM(enc.nt) AS BIGINT) AS n_tokens,
           |  CAST(SUM(len(t.w)) AS BIGINT) AS n_chars,
           |  CASE WHEN SUM(enc.nt) > 0
           |    THEN ROUND(CAST(SUM(len(t.w)) AS DOUBLE) / SUM(enc.nt), 6)
           |  END AS compression
           |FROM (SELECT doc_id, w FROM toks, UNNEST(ws) AS u(w)) t
           |JOIN enc USING (w) GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q111: power iterations unrolled as CTEs; every float literal is
    // e0-suffixed (bare decimals are DECIMAL-typed in DuckDB and
    // would switch the base term to decimal division), contributions
    // round-12 doubles summed exactly as DECIMAL(28,12) — the same
    // ladder the Spark side runs
    "q111_nation_pagerank" -> {
      val iters = 5
      val head =
        """WITH e0 AS (
          |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
          |  FROM lineitem l
          |  JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  GROUP BY 1, 2),
          |outw AS (SELECT src, SUM(w) AS tw FROM e0 GROUP BY 1),
          |e AS (SELECT e0.src, e0.dst, e0.w, outw.tw FROM e0 JOIN outw USING (src)),
          |nn AS (SELECT COUNT(*) AS n FROM nation),
          |r0 AS (SELECT n_nationkey AS id,
          |  ROUND(1.0e0 / (SELECT n FROM nn), 12) AS r FROM nation)""".stripMargin
      val its = (1 to iters).map { k =>
        s"""s$k AS (SELECT e.dst AS id,
           |    SUM(CAST(ROUND(r.r * e.w / e.tw, 12) AS DECIMAL(28,12))) AS s
           |  FROM e JOIN r${k - 1} r ON e.src = r.id GROUP BY 1),
           |r$k AS (SELECT n.n_nationkey AS id,
           |    ROUND((1.0e0 - 0.85e0) / (SELECT n FROM nn) +
           |      0.85e0 * CAST(COALESCE(s$k.s, 0) AS DOUBLE), 12) AS r
           |  FROM nation n LEFT JOIN s$k ON n.n_nationkey = s$k.id)""".stripMargin
      }
      (head +: its).mkString(",\n") +
        s"""
           |SELECT n.n_name AS nation, ROUND(r$iters.r, 6) AS pagerank
           |FROM nation n JOIN r$iters ON n.n_nationkey = r$iters.id
           |ORDER BY 1""".stripMargin
    },

    "q112_source_cap" ->
      s"""WITH r AS (SELECT source, doc_id, ${sqlTokenCount("text")} AS nt,
         |  ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY ${sqlTokenCount("text")} DESC, doc_id) AS rk
         |  FROM documents)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN rk > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(MIN(CASE WHEN rk <= 10 THEN nt END) AS BIGINT) AS min_kept_tokens
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q113_bloom_semi_join" ->
      s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
         |  WHERE o_totalprice > 400000)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q114: position() is 1-based character (code-point) position —
    // the kernel counts code points for exactly this parity; the
    // first-hit tie breaks ORDER BY p, k under binary collation
    "q114_blocklist_gate" -> {
      val vals = blocklistKeywords.map(k => s"('$k')").mkString(", ")
      s"""WITH kw(k) AS (VALUES $vals),
         |hit AS (SELECT d.doc_id, kw.k, position(kw.k IN d.text) AS p
         |  FROM documents d CROSS JOIN kw
         |  WHERE position(kw.k IN d.text) > 0),
         |agg AS (SELECT doc_id, COUNT(*) AS n FROM hit GROUP BY 1),
         |frst AS (SELECT doc_id, k, p FROM (
         |  SELECT doc_id, k, p,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p, k) AS rn
         |  FROM hit) WHERE rn = 1)
         |SELECT d.doc_id, CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_kw,
         |  CAST(frst.p AS BIGINT) AS first_pos, frst.k AS first_kw
         |FROM documents d
         |LEFT JOIN agg USING (doc_id) LEFT JOIN frst USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "q115_inverted_index" ->
      """WITH td AS (SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE w <> ''),
        |agg AS (SELECT w AS term, COUNT(*) AS df FROM td GROUP BY 1),
        |top AS (SELECT w, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id) AS rk FROM td),
        |post AS (SELECT w AS term,
        |    array_to_string(list_sort(list(doc_id)), ',') AS postings
        |  FROM top WHERE rk <= 8 GROUP BY 1)
        |SELECT agg.term, CAST(agg.df AS BIGINT) AS df, post.postings
        |FROM agg JOIN post USING (term) WHERE agg.df >= 2
        |ORDER BY term""".stripMargin,

    "q116_stream_sessions" -> sessionizeOracle,

    "q117_snapshot_diff" ->
      """WITH old AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN UPPER(text) ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0),
        |nw AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id
        |ORDER BY 1""".stripMargin,

    // q118: term = (cs/ts) · ln((cs·tc)/(ts·cc)) with fixed
    // left-associated double arithmetic, round-6, exact DECIMAL sum
    "q118_source_kl" ->
      """WITH tok AS (SELECT source, w FROM (
        |    SELECT source, UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE w <> ''),
        |sw AS (SELECT source, w, COUNT(*) AS cs FROM tok GROUP BY 1, 2),
        |st AS (SELECT source, SUM(cs) AS ts FROM sw GROUP BY 1),
        |cw AS (SELECT w, COUNT(*) AS cc FROM tok GROUP BY 1),
        |ct AS (SELECT SUM(cc) AS tc FROM cw),
        |term AS (SELECT sw.source,
        |    CAST(ROUND((CAST(cs AS DOUBLE) / ts) *
        |      LN((CAST(cs AS DOUBLE) * tc) / (CAST(ts AS DOUBLE) * cc)), 6)
        |      AS DECIMAL(18,6)) AS t
        |  FROM sw JOIN st USING (source) JOIN cw USING (w) CROSS JOIN ct)
        |SELECT source, ROUND(CAST(SUM(t) AS DOUBLE), 6) AS kl
        |FROM term GROUP BY 1 ORDER BY 1""".stripMargin,

    "q119_salted_agg" ->
      s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // q120: gid = GROUPING(nation)·2 + GROUPING(year) — DuckDB's
    // GROUPING() bits composed in Spark's grouping_id() MSB-first order
    "q120_grouping_sets" ->
      """SELECT COALESCE(n.n_name, '__ALL__') AS nation,
        |  COALESCE(CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS BIGINT), -1) AS yr,
        |  CAST(GROUPING(n.n_name) * 2 +
        |    GROUPING(EXTRACT(year FROM CAST(o.o_orderdate AS DATE))) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY GROUPING SETS (
        |  (n.n_name, EXTRACT(year FROM CAST(o.o_orderdate AS DATE))),
        |  (n.n_name),
        |  (EXTRACT(year FROM CAST(o.o_orderdate AS DATE))),
        |  ())
        |ORDER BY gid, nation, yr""".stripMargin,

    "q121_range_window" ->
      """WITH daily AS (
        |  SELECT n.n_name AS nation, CAST(o.o_orderdate AS DATE) AS d,
        |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2)
        |SELECT nation, CAST(d AS VARCHAR) AS day,
        |  CAST(SUM(rev) OVER (PARTITION BY nation ORDER BY d
        |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev7
        |FROM daily ORDER BY nation, day""".stripMargin,

    "q122_unicode_nfc" ->
      """WITH raw AS (SELECT doc_id,
        |    REPLACE(text, 'e', 'e' || chr(769)) AS t FROM documents)
        |SELECT doc_id, nfc_normalize(t) <> t AS changed,
        |  CAST(LENGTH(t) AS BIGINT) AS len_raw,
        |  CAST(LENGTH(nfc_normalize(t)) AS BIGINT) AS len_nfc
        |FROM raw ORDER BY doc_id""".stripMargin,

    "q123_cdc_latest_state" ->
      """WITH r AS (SELECT user_id, ts, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS last_ts,
        |  event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
        |FROM r WHERE rk = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // q124: the winnowing selection replayed declaratively — per-gram
    // md5-prefix hashes, window min over the fixed-width (hash ‖ pos)
    // key (= leftmost-min on hash ties), full windows only except the
    // m < w single-window document
    "q124_winnow_fingerprints" ->
      """WITH g AS (
        |  SELECT doc_id, i,
        |    substr(md5(substr(text, CAST(i AS INT), 5)), 1, 15) AS h,
        |    length(text) - 4 AS m
        |  FROM documents, UNNEST(range(1, length(text) - 3)) AS t(i)
        |  WHERE length(text) >= 5),
        |sel AS (
        |  SELECT doc_id, i, m,
        |    MIN(h || lpad(CAST(i AS VARCHAR), 9, '0'))
        |      OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk
        |  FROM g)
        |SELECT DISTINCT doc_id,
        |  CAST(substr(mk, 16, 9) AS BIGINT) AS pos,
        |  substr(mk, 1, 15) AS fp
        |FROM sel WHERE i <= GREATEST(1, m - 3)
        |ORDER BY doc_id, pos""".stripMargin,

    "q125_bm25_batch" -> {
      val queries = Seq(
        "q_exec" -> Seq("spark", "join", "window"),
        "q_store" -> Seq("table", "row", "scan"),
        "q_perf" -> Seq("slow", "fast"))
      val allTerms = queries.flatMap(_._2).distinct
      val idx = allTerms.zipWithIndex.toMap
      val dfs = allTerms.zipWithIndex.map { case (t, i) =>
        s"SUM(CASE WHEN ${sqlWordHits("text", t)} > 0 THEN 1 ELSE 0 END) AS df$i"
      }.mkString(",\n  ")
      def contrib(t: String): String = {
        val i = idx(t)
        s"""CAST(CASE WHEN ${sqlWordHits("d.text", t)} > 0 THEN ROUND(
           |ROUND(LN((s.n - s.df$i + 0.5e0) / (s.df$i + 0.5e0) + 1e0), 6) *
           |(CAST(${sqlWordHits("d.text", t)} AS DOUBLE) * (1.2e0 + 1e0)) /
           |(CAST(${sqlWordHits("d.text", t)} AS DOUBLE) + 1.2e0 * (0.25e0 +
           |0.75e0 * (CAST(${sqlTokenCount("d.text")} AS DOUBLE) /
           |(CAST(s.tdl AS DOUBLE) / s.n)))), 6)
           |ELSE 0 END AS DECIMAL(18,6))""".stripMargin
      }
      val scores = queries.map { case (q, ts) =>
        s"CAST((${ts.map(contrib).mkString(" + ")}) AS DOUBLE) AS s_$q"
      }.mkString(",\n  ")
      val branches = queries.map { case (q, _) =>
        s"SELECT doc_id, '$q' AS query_id, s_$q AS score FROM sc WHERE s_$q > 0"
      }.mkString("\nUNION ALL\n")
      s"""WITH s AS (SELECT COUNT(*) AS n, SUM(${sqlTokenCount("text")}) AS tdl,
         |  $dfs FROM documents),
         |sc AS (SELECT d.doc_id, $scores FROM documents d, s),
         |st AS ($branches),
         |rnk AS (SELECT query_id, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rn
         |  FROM st)
         |SELECT query_id, doc_id, score, CAST(rn AS BIGINT) AS "rank"
         |FROM rnk WHERE rn <= 5
         |ORDER BY query_id, "rank"""".stripMargin
    },

    // q126: undirected edge iff EITHER direction clears the
    // data-derived threshold (half the mean directed pair weight —
    // scale-free, so every SF exercises a non-trivial graph)
    "q126_triangle_count" ->
      """WITH e0 AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |e AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |  FROM e0 WHERE src <> dst
        |    AND w >= (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) * 0.5e0 FROM e0)),
        |tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
        |  FROM e ab JOIN e bc ON ab.v = bc.u
        |  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
        |part AS (SELECT x AS id FROM tri, UNNEST([a, b, c]) AS t(x))
        |SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM part p JOIN nation n ON p.id = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q127_index_compaction" ->
      """WITH g1 AS (
        |  SELECT md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END) AS digest,
        |    MAX(doc_id % 97) AS last_seen
        |  FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1),
        |g2 AS (
        |  SELECT md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END) AS digest,
        |    MAX(50 + doc_id % 29) AS last_seen
        |  FROM documents WHERE doc_id % 3 = 0 GROUP BY 1),
        |live AS (SELECT digest, MAX(last_seen) AS ls
        |  FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
        |  GROUP BY 1 HAVING MAX(last_seen) >= 40),
        |batch AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END) AS dg,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END)
        |      ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_id
        |FROM batch b ANTI JOIN live s ON b.dg = s.digest
        |WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    // q128: batch/stream parity — same oracle as q123
    "q128_stream_cdc" ->
      """WITH r AS (SELECT user_id, ts, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS last_ts,
        |  event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
        |FROM r WHERE rk = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "q129_winnow_candidates" ->
      """WITH g AS (
        |  SELECT doc_id, i,
        |    substr(md5(substr(text, CAST(i AS INT), 12)), 1, 15) AS h,
        |    length(text) - 11 AS m
        |  FROM documents, UNNEST(range(1, length(text) - 10)) AS t(i)
        |  WHERE length(text) >= 12),
        |sel AS (
        |  SELECT doc_id, i, m,
        |    MIN(h || lpad(CAST(i AS VARCHAR), 9, '0'))
        |      OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mk
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, substr(mk, 1, 15) AS fp
        |  FROM sel WHERE i <= GREATEST(1, m - 7)),
        |keep AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 100),
        |pr AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(COUNT(*) AS BIGINT) AS shared
        |FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY 1, 2""".stripMargin,

    "q130_attribution_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, MAX(event_id) AS touch_id,
        |    arg_max(event_type, event_id) AS touch_type
        |  FROM events WHERE event_type IN ('click', 'signup')
        |  GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, CAST(epoch_us(p.ts) AS BIGINT) AS pts,
        |  t.touch_id AS asof_touch_id, t.touch_type AS asof_touch_type
        |FROM p ASOF LEFT JOIN t
        |  ON p.user_id = t.user_id AND p.ts >= t.ts
        |ORDER BY p.event_id""".stripMargin,

    // q131: derived-contract oracle (the q60 pattern) — the sketch
    // union must land within bound, so violations pin empty
    "q131_hll_rollup" ->
      "SELECT CAST(NULL AS VARCHAR) AS metric WHERE 1 = 0",

    "q132_salted_join" ->
      s"""SELECT o.o_orderpriority AS priority,
         |  CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_totalprice > 300000
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q133_zorder_layout" -> {
      val zsql = graft.ops.Layout.zValueSql("xb", "yb", 10)
      def layer(src: String, name: String) =
        s"""SELECT '$name' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           |  ROUND(CAST(SUM(CAST(ROUND(CAST(pmax - pmin AS DOUBLE) / (pm + 1), 6)
           |    AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_pk_span,
           |  ROUND(CAST(SUM(CAST(ROUND(CAST(smax - smin AS DOUBLE) / (sm + 1), 6)
           |    AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_sk_span,
           |  ROUND(CAST(SUM(CASE WHEN pmin <= (55 * (pm + 1)) // 100
           |    AND pmax >= (45 * (pm + 1)) // 100 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / COUNT(*), 6) AS band_scan_frac
           |FROM $src""".stripMargin
      s"""WITH mx AS (SELECT MAX(l_partkey) AS pm, MAX(l_suppkey) AS sm,
         |    MAX(l_orderkey) AS om FROM lineitem),
         |b AS (SELECT l_partkey, l_suppkey, pm, sm,
         |    (l_partkey * 1024) // (pm + 1) AS xb,
         |    (l_suppkey * 1024) // (sm + 1) AS yb,
         |    (l_orderkey * 256) // (om + 1) AS nb
         |  FROM lineitem, mx),
         |zb AS (SELECT *, ($zsql >> 12) AS zk FROM b),
         |pz AS (SELECT zk, pm, sm, MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         |    MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
         |  FROM zb GROUP BY 1, 2, 3),
         |pn AS (SELECT nb, pm, sm, MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         |    MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
         |  FROM zb GROUP BY 1, 2, 3)
         |${layer("pn", "natural")}
         |UNION ALL
         |${layer("pz", "z-order")}
         |ORDER BY layout""".stripMargin
    },

    "q134_winsorized_stats" ->
      ("""WITH v AS (SELECT l_returnflag AS flag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS v
        |  FROM lineitem),
        |b AS (SELECT flag, ROUND(quantile_cont(v, 0.05), 6) AS lo,
        |    ROUND(quantile_cont(v, 0.95), 6) AS hi
        |  FROM v GROUP BY 1),
        |w AS (SELECT v.flag, b.lo, b.hi,
        |    CAST(LEAST(GREATEST(v.v, b.lo), b.hi) AS DECIMAL(18,6)) AS w
        |  FROM v JOIN b USING (flag))
        |SELECT flag, lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
        |  """.stripMargin +
      huRatio6(huMicro("SUM(w)"), "COUNT(*)", scaled = true) +
      """ AS wmean
        |FROM w GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),

    "q135_sliding_features" ->
      """SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
        |  CAST(COUNT(*) OVER w1 AS BIGINT) AS n_1h,
        |  COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w24
        |    AS DOUBLE), 0) AS sum_24h
        |FROM events
        |WINDOW w1 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING),
        |  w24 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin,

    "q136_target_encoding" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority AS prio,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders),
        |g AS (SELECT prio, SUM(v) AS s, COUNT(*) AS n FROM o GROUP BY 1)
        |SELECT o.o_orderkey,
        |  CASE WHEN g.n > 1
        |    THEN ROUND(CAST(g.s - o.v AS DOUBLE) / (g.n - 1), 6)
        |    ELSE NULL END AS loo_enc
        |FROM o JOIN g USING (prio)
        |ORDER BY o.o_orderkey""".stripMargin,

    "q137_dataset_split" -> {
      val splitSql = graft.ops.Split.splitSql("doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s"""SELECT $splitSql AS split, lang,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
         |  CAST(MAX(doc_id) AS BIGINT) AS max_id
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // q138: the frontier replayed declaratively — group max per x,
    // running strictly-higher-x max over the distinct-x relation
    "q138_pareto_orders" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS x,
        |    CAST(o_orderdate AS DATE) AS y FROM orders),
        |g AS (SELECT x, MAX(y) AS gy FROM o GROUP BY 1),
        |w AS (SELECT x, gy, MAX(gy) OVER (ORDER BY x DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
        |  FROM g)
        |SELECT o.o_orderkey, o.x AS price, CAST(o.y AS VARCHAR) AS od
        |FROM o JOIN w USING (x)
        |WHERE o.y = w.gy AND (w.mprev IS NULL OR w.mprev < o.y)
        |ORDER BY o.o_orderkey""".stripMargin,

    "q139_ols_regression" ->
      """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |      CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  ROUND(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
        |    * (sx / n), 6) AS intercept
        |FROM m ORDER BY 1""".stripMargin,

    "q140_ab_lift" ->
      """WITH u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |t AS (SELECT (user_id % 2 = 1) AS treat, COUNT(*) AS n,
        |    SUM(conv) AS c FROM u GROUP BY 1),
        |f AS (SELECT
        |    SUM(CASE WHEN treat THEN n END) AS nt,
        |    SUM(CASE WHEN treat THEN c END) AS ct,
        |    SUM(CASE WHEN NOT treat THEN n END) AS nc,
        |    SUM(CASE WHEN NOT treat THEN c END) AS cc
        |  FROM t)
        |SELECT CAST(nt AS BIGINT) AS n_treat, CAST(ct AS BIGINT) AS conv_treat,
        |  CAST(nc AS BIGINT) AS n_control, CAST(cc AS BIGINT) AS conv_control,
        |  ROUND(CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc, 6) AS lift,
        |  CASE WHEN ct + cc = 0 OR ct + cc = nt + nc THEN NULL
        |    ELSE ROUND((CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc) /
        |      SQRT((CAST(ct + cc AS DOUBLE) / (nt + nc)) *
        |        (1e0 - CAST(ct + cc AS DOUBLE) / (nt + nc)) *
        |        (1e0 / nt + 1e0 / nc)), 6) END AS z
        |FROM f""".stripMargin,

    // q141: the oracle IS the full recompute — merge(base, delta)
    // must be value-identical because count/sum are algebraic
    "q141_incremental_view" ->
      s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q142_decay_features" ->
      """WITH last AS (SELECT user_id, MAX(ts) AS last_ts
        |  FROM events GROUP BY 1),
        |terms AS (SELECT e.user_id,
        |    CAST(ROUND(CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) *
        |      (1e0 / (1e0 +
        |        CAST(epoch_us(l.last_ts) - epoch_us(e.ts) AS DOUBLE)
        |        / 86400000000e0 / 7e0)), 6) AS DECIMAL(18,6)) AS term
        |  FROM events e JOIN last l USING (user_id))
        |SELECT user_id, ROUND(CAST(SUM(term) AS DOUBLE), 6) AS decayed_value
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,

    "q143_embedding_outliers" ->
      """WITH ex AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(i AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
        |cent AS (SELECT label, dim,
        |    ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(*), 6) AS mu
        |  FROM ex GROUP BY 1, 2),
        |d AS (SELECT e.vec_id, e.label,
        |    ROUND(CAST(SUM(CAST(ROUND((e.x - c.mu) * (e.x - c.mu), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE), 6) AS dist
        |  FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
        |  GROUP BY 1, 2),
        |thr AS (SELECT label, ROUND(quantile_cont(dist, 0.95), 6) AS thr
        |  FROM d GROUP BY 1)
        |SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(CASE WHEN d.dist > t.thr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  t.thr, ROUND(MAX(d.dist), 6) AS max_dist
        |FROM d JOIN thr t USING (label)
        |GROUP BY 1, 4 ORDER BY 1""".stripMargin,

    "q144_corpus_build" -> {
      val splitSql = graft.ops.Split.splitSql("doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val tok = sqlTokenCount("text")
      s"""WITH g AS (SELECT doc_id, source, text, $tok AS nt
         |  FROM documents WHERE $tok >= 10),
         |ded AS (SELECT * FROM (SELECT g.*, ROW_NUMBER() OVER (
         |    PARTITION BY md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || text END)
         |    ORDER BY doc_id) AS rn FROM g) WHERE rn = 1),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY nt DESC, doc_id) AS rk FROM ded),
         |sp AS (SELECT *, $splitSql AS split FROM r WHERE rk <= 20)
         |SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS first_id
         |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q145_event_transitions" ->
      """WITH nx AS (SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n
        |  FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  ROUND(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c ORDER BY 1, 2""".stripMargin,

    // q146: the q50 recursive-CTE fixpoint extended with the
    // keep-the-longest canonical pick per component
    "q146_cluster_canonical" ->
      s"""WITH RECURSIVE sh AS (${sqlShingles(3)}),
         |freq AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 1000000),
         |pruned AS (SELECT sh.doc_id, sh.gram FROM sh JOIN freq USING (gram)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM pruned a JOIN pruned b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE CAST(i AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - i AS DOUBLE) >= 0.9e0),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, comp) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |comps AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
         |sized AS (SELECT c.comp, c.id, ${sqlTokenCount("d.text")} AS nt,
         |    ROW_NUMBER() OVER (PARTITION BY c.comp
         |      ORDER BY ${sqlTokenCount("d.text")} DESC, c.id) AS rk
         |  FROM comps c JOIN documents d ON c.id = d.doc_id)
         |SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size,
         |  CAST(MAX(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS canonical_id,
         |  CAST(MAX(CASE WHEN rk = 1 THEN nt END) AS BIGINT) AS canonical_tokens
         |FROM sized GROUP BY comp ORDER BY comp""".stripMargin,

    "q147_equidepth_histogram" -> {
      val bs = (1 to 9).map(d =>
        s"ROUND(quantile_cont(v, 0.$d), 6) AS b$d").mkString(", ")
      val cases = (1 to 9).map(d =>
        s"WHEN t.v < b.b$d THEN ${d - 1}").mkString(" ")
      s"""WITH t AS (SELECT
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS v
         |  FROM lineitem),
         |b AS (SELECT $bs FROM t),
         |u AS (SELECT CAST(CASE $cases ELSE 9 END AS BIGINT) AS bucket,
         |    CAST(t.v AS DECIMAL(18,2)) AS vv
         |  FROM t, b)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(vv) AS DOUBLE) AS lo, CAST(MAX(vv) AS DOUBLE) AS hi
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q148_source_ks_drift" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS len
        |  FROM documents),
        |grid AS (SELECT s.source, l.len
        |  FROM (SELECT DISTINCT source FROM d) s,
        |       (SELECT DISTINCT len FROM d) l),
        |ps AS (SELECT source, len, COUNT(*) AS c FROM d GROUP BY 1, 2),
        |st AS (SELECT source, COUNT(*) AS ns FROM d GROUP BY 1),
        |co AS (SELECT len, COUNT(*) AS cc FROM d GROUP BY 1),
        |nt AS (SELECT COUNT(*) AS nc FROM d),
        |g AS (SELECT grid.source, grid.len, COALESCE(ps.c, 0) AS c,
        |    co.cc, st.ns, nt.nc
        |  FROM grid LEFT JOIN ps ON grid.source = ps.source AND grid.len = ps.len
        |  JOIN co ON grid.len = co.len
        |  JOIN st ON grid.source = st.source CROSS JOIN nt),
        |e AS (SELECT source,
        |    CAST(SUM(c) OVER w AS DOUBLE) / ns AS fs,
        |    CAST(SUM(cc) OVER w AS DOUBLE) / nc AS fc
        |  FROM g WINDOW w AS (PARTITION BY source ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT source, ROUND(MAX(ABS(fs - fc)), 6) AS ks
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // q149: BM25 chain = q103's oracle verbatim; cosine chain = q28's;
    // fusion terms round to 9 and sum as DECIMAL(18,9) (exact,
    // order-independent), total rounds to 6 as a double
    "q149_hybrid_rrf" -> {
      val terms = Seq("spark", "join", "window")
      val dfs = terms.zipWithIndex.map { case (t, i) =>
        s"SUM(CASE WHEN ${sqlWordHits("text", t)} > 0 THEN 1 ELSE 0 END) AS df$i"
      }.mkString(",\n  ")
      val contribs = terms.zipWithIndex.map { case (t, i) =>
        s"""CAST(CASE WHEN ${sqlWordHits("d.text", t)} > 0 THEN ROUND(
           |ROUND(LN((s.n - s.df$i + 0.5e0) / (s.df$i + 0.5e0) + 1e0), 6) *
           |(CAST(${sqlWordHits("d.text", t)} AS DOUBLE) * (1.2e0 + 1e0)) /
           |(CAST(${sqlWordHits("d.text", t)} AS DOUBLE) + 1.2e0 * (0.25e0 +
           |0.75e0 * (CAST(${sqlTokenCount("d.text")} AS DOUBLE) /
           |(CAST(s.tdl AS DOUBLE) / s.n)))), 6)
           |ELSE 0 END AS DECIMAL(18,6))""".stripMargin
      }.mkString(" + ")
      s"""WITH s AS (SELECT COUNT(*) AS n, SUM(${sqlTokenCount("text")}) AS tdl,
         |  $dfs FROM documents),
         |sc AS (SELECT d.doc_id, CAST(($contribs) AS DOUBLE) AS score
         |  FROM documents d, s),
         |bmtop AS (SELECT doc_id, score FROM sc WHERE score > 0
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |bm AS (SELECT doc_id,
         |  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM bmtop),
         |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |      FROM embeddings WHERE vec_id = 0),
         |cstop AS (SELECT vec_id AS doc_id, ROUND(
         |  list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv) /
         |  (SQRT(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
         |                           list_transform(embedding, x -> CAST(x AS DOUBLE)))) *
         |   SQRT(list_inner_product(qv, qv))), 6) AS cos_sim
         |FROM embeddings, q
         |ORDER BY cos_sim DESC, doc_id LIMIT 20),
         |cs AS (SELECT doc_id,
         |  ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rank FROM cstop),
         |u AS (SELECT doc_id,
         |    CAST(ROUND(1e0 / (60 + rank), 9) AS DECIMAL(18,9)) AS t FROM bm
         |  UNION ALL
         |  SELECT doc_id,
         |    CAST(ROUND(1e0 / (60 + rank), 9) AS DECIMAL(18,9)) AS t FROM cs)
         |SELECT doc_id, ROUND(CAST(SUM(t) AS DOUBLE), 6) AS rrf_score,
         |  CAST(COUNT(*) AS BIGINT) AS n_runs
         |FROM u GROUP BY 1 ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin
    },

    "q150_blocked_er" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand
        | AND regexp_extract(a.p_name, '(\S+)$', 1) =
        |     regexp_extract(b.p_name, '(\S+)$', 1)
        | AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 5
        |ORDER BY id_a, id_b""".stripMargin,

    "q151_gap_fill" ->
      """WITH f AS (SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS tot
        |  FROM events WHERE value > 300 GROUP BY 1, 2),
        |s AS (SELECT event_type, MIN(hr) AS mn, MAX(hr) AS mx FROM f GROUP BY 1),
        |tl AS (SELECT event_type, UNNEST(generate_series(mn, mx)) AS hr FROM s)
        |SELECT tl.event_type, tl.hr, COALESCE(f.n, 0) AS n,
        |  CAST(LAST_VALUE(f.tot IGNORE NULLS) OVER (
        |    PARTITION BY tl.event_type ORDER BY tl.hr) AS DOUBLE) AS filled_total
        |FROM tl LEFT JOIN f ON tl.event_type = f.event_type AND tl.hr = f.hr
        |ORDER BY 1, 2""".stripMargin,

    "q152_column_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_val,
           |  CAST(MAX($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    "q153_mean_shift" ->
      """WITH d AS (SELECT event_type,
        |    CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS tot
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, tot,
        |    COUNT(*) OVER wr AS nr, COUNT(*) OVER wp AS np,
        |    SUM(tot) OVER wr AS sr, SUM(tot) OVER wp AS sp
        |  FROM d
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        |    wp AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND 7 PRECEDING)),
        |m AS (SELECT event_type, day, tot, nr, np,
        |    (2 * CAST(sr * 1000000 AS HUGEINT) + 7)
        |      // 14 AS mrm,
        |    (2 * CAST(sp * 1000000 AS HUGEINT) + 7)
        |      // 14 AS mpm
        |  FROM w)
        |SELECT event_type, day, CAST(tot AS DOUBLE) AS daily_total,
        |  CAST(mrm AS DOUBLE) / 1e6 AS ma_recent,
        |  CAST(mpm AS DOUBLE) / 1e6 AS ma_prior,
        |  CAST(mrm - mpm AS DOUBLE) / 1e6 AS shift
        |FROM m WHERE nr = 7 AND np = 7
        |ORDER BY event_type, day""".stripMargin,

    "q154_scd2_history" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
        |  CAST(LEAD(epoch_us(ts)) OVER w AS BIGINT) AS valid_to_us,
        |  (LEAD(epoch_us(ts)) OVER w IS NULL) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    "q155_sorted_neighborhood" ->
      """WITH r AS (SELECT p_partkey AS id, p_name AS name,
        |    ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rk FROM part)
        |SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS distance
        |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 10
        |WHERE levenshtein(a.name, b.name) <= 4
        |ORDER BY id_a, id_b""".stripMargin,

    "q156_market_basket" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_baskets
        |FROM d a JOIN d b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY 1, 2""".stripMargin,

    "q157_association_rules" ->
      """WITH d AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |tot AS (SELECT COUNT(DISTINCT b) AS n_total FROM d),
        |isup AS (SELECT i, COUNT(*) AS ni FROM d GROUP BY 1),
        |psup AS (SELECT a.i AS x, b.i AS y, COUNT(*) AS s
        |  FROM d a JOIN d b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |rules AS (SELECT x AS antecedent, y AS consequent, s FROM psup
        |  UNION ALL SELECT y, x, s FROM psup)
        |SELECT r.antecedent, r.consequent, CAST(r.s AS BIGINT) AS n_pair,
        |  CAST(ia.ni AS BIGINT) AS n_ante, CAST(ic.ni AS BIGINT) AS n_cons,
        |  CAST(r.s AS DOUBLE) / CAST(ia.ni AS DOUBLE) AS confidence,
        |  CAST(r.s AS DOUBLE) / CAST(ia.ni AS DOUBLE)
        |    * CAST(tot.n_total AS DOUBLE) / CAST(ic.ni AS DOUBLE) AS lift
        |FROM rules r
        |JOIN isup ia ON ia.i = r.antecedent
        |JOIN isup ic ON ic.i = r.consequent
        |CROSS JOIN tot
        |WHERE CAST(r.s AS DOUBLE) / CAST(ia.ni AS DOUBLE) >= 0.10
        |ORDER BY 1, 2""".stripMargin,

    "q158_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |    ABS(e.value - m.med) AS d
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(d, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.event_id, dev.event_type, dev.value, dev.med, mad.mad
        |FROM dev JOIN mad USING (event_type)
        |WHERE dev.d > (3.0 * 1.4826) * mad.mad
        |ORDER BY event_id""".stripMargin,

    "q159_fk_audit" ->
      """WITH a AS (
        |  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
        |    COUNT(*) AS n_rows,
        |    COUNT(*) FILTER (WHERE c.l_orderkey IS NULL) AS n_null,
        |    COUNT(*) FILTER (WHERE c.l_orderkey IS NOT NULL AND p.k IS NULL) AS n_orphan
        |  FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON c.l_orderkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part.p_partkey',
        |    COUNT(*),
        |    COUNT(*) FILTER (WHERE c.l_partkey IS NULL),
        |    COUNT(*) FILTER (WHERE c.l_partkey IS NOT NULL AND p.k IS NULL)
        |  FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON c.l_partkey = p.k
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer.c_custkey',
        |    COUNT(*),
        |    COUNT(*) FILTER (WHERE c.o_custkey IS NULL),
        |    COUNT(*) FILTER (WHERE c.o_custkey IS NOT NULL AND p.k IS NULL)
        |  FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON c.o_custkey = p.k
        |  UNION ALL
        |  SELECT 'customer.c_nationkey->nation.n_nationkey',
        |    COUNT(*),
        |    COUNT(*) FILTER (WHERE c.c_nationkey IS NULL),
        |    COUNT(*) FILTER (WHERE c.c_nationkey IS NOT NULL AND p.k IS NULL)
        |  FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    ON c.c_nationkey = p.k
        |  UNION ALL
        |  SELECT 'events.user_id->customer.c_custkey',
        |    COUNT(*),
        |    COUNT(*) FILTER (WHERE c.user_id IS NULL),
        |    COUNT(*) FILTER (WHERE c.user_id IS NOT NULL AND p.k IS NULL)
        |  FROM events c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON c.user_id = p.k)
        |SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_null AS BIGINT) AS n_null, CAST(n_orphan AS BIGINT) AS n_orphan
        |FROM a ORDER BY relation""".stripMargin,

    "q160_tree_closure" ->
      """WITH RECURSIVE nodes AS (SELECT c_custkey AS node,
        |    CASE WHEN c_custkey = 1 THEN NULL
        |      ELSE GREATEST(1, c_custkey // (2 + c_custkey % 5)) END AS parent
        |  FROM customer),
        |walk AS (
        |  SELECT node, node AS cur, 0 AS depth FROM nodes
        |  UNION ALL
        |  SELECT w.node, n.parent, w.depth + 1
        |  FROM walk w JOIN nodes n ON n.node = w.cur
        |  WHERE n.parent IS NOT NULL)
        |SELECT node, cur AS root, CAST(depth AS BIGINT) AS depth FROM walk
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY depth DESC) = 1
        |ORDER BY node""".stripMargin,

    "q161_gini_concentration" ->
      """WITH r AS (SELECT source, n_chars, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(19,0))) AS BIGINT) AS total_chars,
        |  (2.0 * CAST(SUM(CAST(rk AS DECIMAL(19,0)) * CAST(n_chars AS DECIMAL(19,0))) AS DOUBLE)
        |     - CAST(COUNT(*) + 1 AS DOUBLE)
        |       * CAST(SUM(CAST(n_chars AS DECIMAL(19,0))) AS DOUBLE))
        |  / (CAST(COUNT(*) AS DOUBLE)
        |       * CAST(SUM(CAST(n_chars AS DECIMAL(19,0))) AS DOUBLE)) AS gini
        |FROM r GROUP BY source
        |ORDER BY source""".stripMargin,

    "q162_jaro_winkler_pairs" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  jaro_winkler_similarity(a.p_name, b.p_name) AS similarity
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.90
        |ORDER BY id_a, id_b""".stripMargin,

    // q163: quantile_cont replaced by the INTEGER tenths interpolation
    // (Percentiles.exactTenths twin): values at ranks ⌊k(n−1)/10⌋+1
    // and +2 picked by ROW_NUMBER, combined as ((10−d)·vlo + d·vhi)/10
    // — raw microsecond outputs have no safe rounding scale, so the
    // emission must be integer-exact on both engines
    "q163_funnel_latency" ->
      """WITH su AS (SELECT user_id, MIN(epoch_us(ts)) AS su_us
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (SELECT e.user_id, MIN(epoch_us(e.ts)) - su.su_us AS lat_us
        |  FROM events e JOIN su USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.su_us
        |  GROUP BY e.user_id, su.su_us),
        |c AS (SELECT COUNT(*) AS n FROM conv),
        |r AS (SELECT lat_us, ROW_NUMBER() OVER (ORDER BY lat_us) AS rk
        |  FROM conv),
        |pick AS (SELECT t.k, (t.k * (c.n - 1)) // 10 AS lower_,
        |    (t.k * (c.n - 1)) % 10 AS d
        |  FROM c, (VALUES (5), (9)) AS t(k)),
        |sel AS (SELECT p.k, p.d,
        |    MAX(CASE WHEN r.rk = p.lower_ + 1 THEN r.lat_us END) AS vlo,
        |    MAX(CASE WHEN r.rk = p.lower_ + 2 THEN r.lat_us END) AS vhi
        |  FROM pick p JOIN r ON r.rk IN (p.lower_ + 1, p.lower_ + 2)
        |  GROUP BY p.k, p.d),
        |v AS (SELECT k,
        |    CAST((10 - d) * vlo + d * COALESCE(vhi, vlo) AS DOUBLE) / 10
        |      AS val
        |  FROM sel)
        |SELECT CAST(c.n AS BIGINT) AS n_converted,
        |  MAX(CASE WHEN v.k = 5 THEN v.val END) AS p50_us,
        |  MAX(CASE WHEN v.k = 9 THEN v.val END) AS p90_us
        |FROM v CROSS JOIN c GROUP BY c.n""".stripMargin,

    "q164_sliding_distinct_users" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT days.day AS day,
        |  CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_active_7d
        |FROM days JOIN du ON du.day BETWEEN days.day - 6 AND days.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q165_rolling_median" ->
      """SELECT event_id, user_id, value,
        |  ROUND(quantile_cont(value, 0.5e0) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med_7
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q166_psi_drift" ->
      """WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
        |mm AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
        |tg AS (SELECT LEAST(19, CAST(FLOOR(value / 25.0e0) AS BIGINT)) AS bucket,
        |    ev.us <= (mm.lo + mm.hi) // 2 AS is_ref
        |  FROM ev, mm),
        |b AS (SELECT bucket,
        |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
        |    SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS cc
        |  FROM tg GROUP BY 1),
        |n AS (SELECT SUM(cr) AS nr, SUM(cc) AS nc, COUNT(*) AS nb FROM b),
        |t AS (SELECT nr, nc, nb,
        |    CAST(ROUND((CAST(cr + 1 AS DOUBLE) / CAST(nr + nb AS DOUBLE)
        |        - CAST(cc + 1 AS DOUBLE) / CAST(nc + nb AS DOUBLE))
        |      * LN((CAST(cr + 1 AS DOUBLE) / CAST(nr + nb AS DOUBLE))
        |          / (CAST(cc + 1 AS DOUBLE) / CAST(nc + nb AS DOUBLE))), 6)
        |      AS DECIMAL(18,6)) AS term
        |  FROM b, n)
        |SELECT CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
        |  CAST(nb AS BIGINT) AS n_buckets,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi
        |FROM t GROUP BY 1, 2, 3""".stripMargin,

    "q167_linear_attribution" ->
      """WITH conv AS (SELECT user_id AS u, epoch_us(ts) AS cus,
        |    event_id AS cid FROM events WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id AS u, epoch_us(ts) AS tus,
        |    event_type AS ch FROM events WHERE event_type IN ('click','view')),
        |j AS (SELECT conv.cid, touch.ch FROM conv LEFT JOIN touch
        |  ON conv.u = touch.u AND touch.tus >= conv.cus - 604800000000
        |    AND touch.tus < conv.cus),
        |n AS (SELECT cid, COUNT(ch) AS n FROM j GROUP BY 1),
        |cr AS (SELECT COALESCE(j.ch, '(none)') AS channel,
        |    CASE WHEN n.n > 0
        |      THEN CAST(ROUND(1.0e0 / n.n, 6) AS DECIMAL(18,6))
        |      ELSE CAST(1 AS DECIMAL(18,6)) END AS credit,
        |    CASE WHEN j.ch IS NOT NULL THEN 1 ELSE 0 END AS is_touch
        |  FROM j JOIN n USING (cid))
        |SELECT channel, CAST(SUM(is_touch) AS BIGINT) AS n_touches,
        |  ROUND(CAST(SUM(credit) AS DOUBLE), 6) AS credit
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    "q168_source_overlap" ->
      """WITH d AS (SELECT DISTINCT substr(text, 1, 64) AS seg, source
        |  FROM documents)
        |SELECT a.source AS group_a, b.source AS group_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM d a JOIN d b ON a.seg = b.seg AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q169_woe_encoding" ->
      """WITH b AS (SELECT
        |    LEAST(19, CAST(FLOOR(value / 25.0e0) AS BIGINT)) AS bucket,
        |    SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS cg,
        |    SUM(CASE WHEN NOT event_type <> 'error' THEN 1 ELSE 0 END) AS cb
        |  FROM events GROUP BY 1),
        |n AS (SELECT SUM(cg) AS ng, SUM(cb) AS nbad, COUNT(*) AS nb FROM b)
        |SELECT bucket, CAST(cg AS BIGINT) AS n_good, CAST(cb AS BIGINT) AS n_bad,
        |  ROUND(LN((CAST(cg + 1 AS DOUBLE) / CAST(ng + nb AS DOUBLE))
        |    / (CAST(cb + 1 AS DOUBLE) / CAST(nbad + nb AS DOUBLE))), 6) AS woe
        |FROM b, n ORDER BY bucket""".stripMargin,

    // the brute-force all-pairs Jaccard is the SEMANTIC spec; the
    // engine side must reproduce it exactly through prefix filtering
    "q170_prefix_filter_jaccard" ->
      s"""WITH sh AS (${sqlShingles(3)}),
        |n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ia AS id_a, ib AS id_b,
        |  CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN n na ON na.doc_id = ia
        |JOIN n nb ON nb.doc_id = ib
        |WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.8
        |ORDER BY 1, 2""".stripMargin,

    "q171_heavy_hitters" ->
      """WITH c AS (SELECT l_partkey AS key, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(n) AS tot FROM c),
        |k AS (SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank,
        |    SUM(n) OVER (ORDER BY n DESC, key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c ORDER BY n DESC, key LIMIT 20)
        |SELECT key, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank,
        |  CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share,
        |  CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE) AS cum_share
        |FROM k, t ORDER BY rank""".stripMargin,

    "q172_peak_concurrency" ->
      """WITH b AS (
        |  SELECT event_type AS g, epoch_us(ts) AS us, 1 AS d,
        |    event_id AS id FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 1800000000, -1, event_id
        |  FROM events),
        |r AS (SELECT g, us, d, SUM(d) OVER (PARTITION BY g ORDER BY us, d, id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM b),
        |m AS (SELECT g, MAX(run) AS peak FROM r GROUP BY 1)
        |SELECT r.g AS event_type, CAST(m.peak AS BIGINT) AS peak,
        |  CAST(MIN(r.us) AS BIGINT) AS peak_us
        |FROM r JOIN m ON r.g = m.g AND r.run = m.peak
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // q173: slopes quantized to half-up micro INTEGERS before the
    // median — interpolation over integer-valued doubles is exact in
    // any formula order (raw-double medians are the q163 one-ulp
    // class); the closing /1e6 is one correctly-rounded op
    "q173_theil_sen_trend" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CASE WHEN b.n < a.n THEN
        |      -((2 * CAST(a.n - b.n AS HUGEINT) * 1000000
        |          + CAST(b.day - a.day AS HUGEINT))
        |        // (2 * CAST(b.day - a.day AS HUGEINT)))
        |    ELSE
        |      ((2 * CAST(b.n - a.n AS HUGEINT) * 1000000
        |          + CAST(b.day - a.day AS HUGEINT))
        |        // (2 * CAST(b.day - a.day AS HUGEINT)))
        |    END AS sm
        |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  quantile_cont(CAST(sm AS DOUBLE), 0.5e0) / 1e6 AS slope
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q174_twap" ->
      """WITH o AS (SELECT event_type, epoch_us(ts) AS us, event_id, value
        |  FROM events),
        |l AS (SELECT event_type, us, value,
        |    LEAD(us) OVER (PARTITION BY event_type ORDER BY us, event_id)
        |      AS nxt FROM o),
        |t AS (SELECT event_type, us,
        |    CAST(ROUND(value * CAST(nxt - us AS DOUBLE), 6)
        |      AS DECIMAL(28,6)) AS term FROM l)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |  CAST(SUM(term) AS DOUBLE)
        |    / CAST(MAX(us) - MIN(us) AS DOUBLE) AS twap
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q175_sla_percentiles" ->
      """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |  CAST(COUNT(value) AS BIGINT) AS n,
        |  ROUND(quantile_cont(value, 0.95e0), 6) AS p95,
        |  ROUND(quantile_cont(value, 0.99e0), 6) AS p99
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q176_diff_in_diff" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |mm AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
        |tg AS (SELECT user_id % 2 = 0 AS tr,
        |    ev.us > (mm.lo + mm.hi) // 2 AS post, value FROM ev, mm),
        |g AS (SELECT
        |    CAST(SUM(CASE WHEN tr AND NOT post
        |        THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN tr AND NOT post THEN 1 END) AS DOUBLE)
        |      AS mean_treat_pre,
        |    CAST(SUM(CASE WHEN tr AND post
        |        THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN tr AND post THEN 1 END) AS DOUBLE)
        |      AS mean_treat_post,
        |    CAST(SUM(CASE WHEN NOT tr AND NOT post
        |        THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN NOT tr AND NOT post THEN 1 END) AS DOUBLE)
        |      AS mean_ctrl_pre,
        |    CAST(SUM(CASE WHEN NOT tr AND post
        |        THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN NOT tr AND post THEN 1 END) AS DOUBLE)
        |      AS mean_ctrl_post
        |  FROM tg)
        |SELECT mean_treat_pre, mean_treat_post, mean_ctrl_pre, mean_ctrl_post,
        |  (mean_treat_post - mean_treat_pre)
        |    - (mean_ctrl_post - mean_ctrl_pre) AS did
        |FROM g""".stripMargin,

    "q177_mmr_rerank" -> mmrChainSql(k = 5, pool = 20),

    "q178_temporal_split" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |b AS (SELECT quantile_cont(CAST(us AS DOUBLE), 0.9e0) AS cut FROM ev)
        |SELECT event_type,
        |  CASE WHEN CAST(us AS DOUBLE) <= b.cut THEN 'train'
        |    ELSE 'holdout' END AS split,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM ev, b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q179_homoglyph_fold" ->
      """WITH d AS (SELECT source, text,
        |    CASE WHEN doc_id % 3 = 0 THEN translate(text, 'aeo', 'аео')
        |      ELSE text END AS adv
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN adv <> text THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_corrupted,
        |  CAST(SUM(CASE WHEN translate(adv,
        |      'аеорсхіѕуАВЕКМНОРСТХ', 'aeopcxisyABEKMHOPCTX') = text
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_restored
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // q180: the cumulative product is a fixed left-to-right round-6
    // chain — DuckDB's list_reduce seeds with the first element, Spark
    // seeds with 1.0; equal because round-6 is idempotent on round-6
    // doubles. '//' is floor division (both operands non-negative).
    "q180_kaplan_meier" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |org AS (SELECT user_id, MIN(us) AS t0,
        |    MIN(CASE WHEN event_type = 'purchase' THEN us END) AS te
        |  FROM ev GROUP BY 1),
        |hz AS (SELECT MAX(us) AS h FROM ev),
        |subj AS (SELECT (COALESCE(te, h) - t0) // 86400000000 AS dur,
        |    CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS obs
        |  FROM org, hz),
        |lt AS (SELECT dur, SUM(obs) AS d, COUNT(*) AS c FROM subj GROUP BY 1),
        |rk AS (SELECT dur, d, c,
        |    SUM(c) OVER () - COALESCE(SUM(c) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS atrisk
        |  FROM lt),
        |f AS (SELECT dur, d, atrisk,
        |    ROUND(1e0 - CAST(d AS DOUBLE) / atrisk, 6) AS factor
        |  FROM rk WHERE d > 0),
        |sarr AS (SELECT dur, d, atrisk, list(factor) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs FROM f)
        |SELECT CAST(dur AS BIGINT) AS day, CAST(d AS BIGINT) AS deaths,
        |  CAST(atrisk AS BIGINT) AS at_risk,
        |  ROUND(list_reduce(fs, (a, b) -> ROUND(a * b, 6)), 6) AS survival
        |FROM sarr ORDER BY day""".stripMargin,

    "q181_chi_square" ->
      """WITH obs AS (SELECT lang AS r, source AS c, COUNT(*) AS o
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |rts AS (SELECT r, SUM(o) AS rt FROM obs GROUP BY 1),
        |cts AS (SELECT c, SUM(o) AS ct FROM obs GROUP BY 1),
        |cells AS (SELECT r, c, rt, ct, COALESCE(o, 0) AS o
        |  FROM rts CROSS JOIN cts LEFT JOIN obs USING (r, c)),
        |tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT r) AS nr,
        |    COUNT(DISTINCT c) AS nc FROM obs),
        |term AS (SELECT CAST(ROUND(
        |      (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n) *
        |      (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n) /
        |      (CAST(rt AS DOUBLE) * ct / n), 6) AS DECIMAL(18,6)) AS t,
        |    nr, nc, n
        |  FROM cells CROSS JOIN tot)
        |SELECT ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2,
        |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
        |  CAST(nr AS BIGINT) AS n_rows, CAST(nc AS BIGINT) AS n_cols,
        |  CAST(n AS BIGINT) AS n
        |FROM term GROUP BY nr, nc, n""".stripMargin,

    // q182: rank sums stay integral in doubled units (2·R1); decimal
    // products on both sides so nothing touches BIGINT overflow; the
    // only IEEE ops are the final divisions and the correctly-rounded
    // sqrt.
    "q182_mann_whitney" ->
      """WITH base AS (SELECT value AS v, (event_type = 'purchase') AS a
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |vc AS (SELECT v, COUNT(*) AS c,
        |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca FROM base GROUP BY 1),
        |pre AS (SELECT v, c, ca, COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl
        |  FROM vc),
        |agg AS (SELECT
        |    SUM(CAST(ca AS DECIMAL(18,0)) *
        |      CAST(2 * cl + c + 1 AS DECIMAL(18,0))) AS two_r1,
        |    SUM(ca) AS n1, SUM(c - ca) AS n2,
        |    SUM(CAST(c AS DECIMAL(12,0)) * CAST(c AS DECIMAL(12,0)) *
        |      CAST(c AS DECIMAL(12,0)) - CAST(c AS DECIMAL(12,0))) AS t
        |  FROM pre),
        |u AS (SELECT CAST(two_r1 - CAST(n1 AS DECIMAL(18,0)) *
        |      CAST(n1 + 1 AS DECIMAL(18,0)) AS DOUBLE) / 2e0 AS u1,
        |    n1, n2, t FROM agg)
        |SELECT u1, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  ROUND(u1 / (CAST(n1 AS DOUBLE) * n2), 6) AS cles,
        |  ROUND((u1 - CAST(n1 AS DOUBLE) * n2 / 2e0) /
        |    SQRT((CAST(n1 AS DOUBLE) * n2 / 12e0) *
        |      ((CAST(n1 + n2 AS DOUBLE) + 1e0) - CAST(t AS DOUBLE) /
        |        (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1e0)))),
        |    6) AS z
        |FROM u""".stripMargin,

    "q183_source_jsd" ->
      """WITH tok AS (SELECT source, w FROM (
        |    SELECT source, UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE w <> ''),
        |sw AS (SELECT source, w, COUNT(*) AS cs FROM tok GROUP BY 1, 2),
        |st AS (SELECT source, SUM(cs) AS ts FROM sw GROUP BY 1),
        |cw AS (SELECT w, SUM(cs) AS cc FROM sw GROUP BY 1),
        |ct AS (SELECT SUM(cs) AS tc FROM sw),
        |grid AS (SELECT st.source, cw.w, COALESCE(sw.cs, 0) AS cs,
        |    st.ts, cw.cc, ct.tc
        |  FROM st CROSS JOIN cw
        |  LEFT JOIN sw ON sw.source = st.source AND sw.w = cw.w
        |  CROSS JOIN ct),
        |pq AS (SELECT source,
        |    CAST(cs AS DOUBLE) / CAST(ts AS DOUBLE) AS p,
        |    CASE WHEN CAST(tc AS DOUBLE) > CAST(ts AS DOUBLE)
        |      THEN (CAST(cc AS DOUBLE) - CAST(cs AS DOUBLE)) /
        |        (CAST(tc AS DOUBLE) - CAST(ts AS DOUBLE))
        |      ELSE 0e0 END AS q
        |  FROM grid),
        |term AS (SELECT source,
        |    CAST(ROUND(CASE WHEN p > 0e0
        |      THEN p * LN(p / ((p + q) / 2e0)) ELSE 0e0 END, 6)
        |      AS DECIMAL(18,6)) AS tp,
        |    CAST(ROUND(CASE WHEN q > 0e0
        |      THEN q * LN(q / ((p + q) / 2e0)) ELSE 0e0 END, 6)
        |      AS DECIMAL(18,6)) AS tq
        |  FROM pq)
        |SELECT source, ROUND(CAST(SUM(tp) + SUM(tq) AS DOUBLE) / 2e0, 6) AS jsd
        |FROM term GROUP BY 1 ORDER BY 1""".stripMargin,

    "q184_readability" ->
      """WITH c AS (SELECT doc_id,
        |    LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS w,
        |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
        |  FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS n_words,
        |  CAST(s AS BIGINT) AS n_sentences, CAST(y AS BIGINT) AS n_syllables,
        |  ROUND(0.39e0 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE)) +
        |    11.8e0 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)) - 15.59e0, 6)
        |    AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin,

    "q185_gram_novelty" ->
      s"""WITH sh AS (${sqlShingles(3)}),
         |freq AS (SELECT gram, COUNT(*) AS df FROM sh GROUP BY 1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  ROUND(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
         |    COUNT(*), 6) AS novelty
         |FROM sh JOIN freq USING (gram)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q186: two synchronous LPA rounds unrolled as CTEs; scores are
    // exact integer weight sums, so the (score DESC, label) argmax is
    // engine-portable
    "q186_label_propagation" ->
      """WITH e0 AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |und AS (SELECT a, b, SUM(w) AS w FROM (
        |    SELECT src AS a, dst AS b, w FROM e0 WHERE src <> dst
        |    UNION ALL
        |    SELECT dst AS a, src AS b, w FROM e0 WHERE src <> dst)
        |  GROUP BY 1, 2),
        |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
        |n1 AS (SELECT und.a AS node, l0.label, SUM(und.w) AS score
        |  FROM und JOIN l0 ON l0.node = und.b GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |    SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |      ORDER BY score DESC, label) AS rn FROM n1) WHERE rn = 1),
        |n2 AS (SELECT und.a AS node, l1.label, SUM(und.w) AS score
        |  FROM und JOIN l1 ON l1.node = und.b GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |    SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |      ORDER BY score DESC, label) AS rn FROM n2) WHERE rn = 1)
        |SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
        |FROM l2 ORDER BY node""".stripMargin,

    // q187: the greedy min-chain is support-equivalent to subsequence
    // existence, so the oracle can use the same three joins
    "q187_sequence_patterns" ->
      """WITH ev AS (SELECT user_id AS s, event_type AS t, epoch_us(ts) AS us
        |  FROM events WHERE event_type IS NOT NULL),
        |s1 AS (SELECT s, t AS step1, MIN(us) AS t1 FROM ev GROUP BY 1, 2),
        |s2 AS (SELECT ev.s, s1.step1, ev.t AS step2, MIN(ev.us) AS t2
        |  FROM ev JOIN s1 ON s1.s = ev.s AND ev.us > s1.t1
        |  GROUP BY 1, 2, 3),
        |s3 AS (SELECT ev.s, s2.step1, s2.step2, ev.t AS step3,
        |    MIN(ev.us) AS t3
        |  FROM ev JOIN s2 ON s2.s = ev.s AND ev.us > s2.t2
        |  GROUP BY 1, 2, 3, 4)
        |SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_subjects
        |FROM s3 GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5
        |ORDER BY n_subjects DESC, step1, step2, step3""".stripMargin,

    "q188_quantile_normalize" ->
      """WITH vc AS (SELECT c_mktsegment, c_acctbal, COUNT(*) AS c
        |  FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1, 2),
        |pre AS (SELECT c_mktsegment, c_acctbal, c,
        |    COALESCE(SUM(c) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl,
        |    SUM(c) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM vc)
        |SELECT c_mktsegment, c_acctbal, CAST(c AS BIGINT) AS n_ties,
        |  ROUND(CAST(2 * cl + c + 1 AS DOUBLE) / CAST(2 * n AS DOUBLE), 6)
        |    AS qnorm
        |FROM pre ORDER BY 1, 2""".stripMargin,

    // q189: '//' mirrors quantileBuckets' integral DIV split; every
    // rank breaks ties by user id so both engines bucket identically
    "q189_rfm_segments" ->
      """WITH hz AS (SELECT MAX(epoch_us(ts)) AS h FROM events),
        |per AS (SELECT user_id AS u,
        |    (h - MAX(epoch_us(ts))) // 86400000000 AS recency_days,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM events, hz WHERE event_type = 'purchase' GROUP BY u, h),
        |b AS (SELECT u, recency_days, frequency, monetary,
        |    ((ROW_NUMBER() OVER (ORDER BY recency_days, u) - 1) * 5)
        |      // (COUNT(*) OVER ()) + 1 AS r_bucket,
        |    ((ROW_NUMBER() OVER (ORDER BY frequency, u) - 1) * 5)
        |      // (COUNT(*) OVER ()) + 1 AS f_bucket,
        |    ((ROW_NUMBER() OVER (ORDER BY monetary, u) - 1) * 5)
        |      // (COUNT(*) OVER ()) + 1 AS m_bucket
        |  FROM per)
        |SELECT u AS user_id, CAST(recency_days AS BIGINT) AS recency_days,
        |  CAST(frequency AS BIGINT) AS frequency, monetary,
        |  CAST(r_bucket AS BIGINT) AS r_bucket,
        |  CAST(f_bucket AS BIGINT) AS f_bucket,
        |  CAST(m_bucket AS BIGINT) AS m_bucket,
        |  'r' || CAST(r_bucket AS VARCHAR) || 'f' || CAST(f_bucket AS VARCHAR)
        |    || 'm' || CAST(m_bucket AS VARCHAR) AS segment
        |FROM b ORDER BY user_id""".stripMargin,

    "q190_term_burstiness" ->
      """WITH dw AS (SELECT doc_id, w, COUNT(*) AS tfd FROM (
        |    SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE w <> '' GROUP BY 1, 2),
        |term AS (SELECT w, SUM(tfd) AS tf, COUNT(*) AS df FROM dw GROUP BY 1)
        |SELECT w AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  ROUND(CAST(tf AS DOUBLE) / df, 6) AS burstiness
        |FROM term WHERE df >= 5
        |ORDER BY burstiness DESC, w LIMIT 50""".stripMargin,

    // q191: expected shares are the SAME Scala round-6 constants the
    // Spark side compiles in (Profile.BenfordExpected) — no log10 from
    // either engine enters the compare
    "q191_benford" -> {
      val cases = graft.ops.Profile.BenfordExpected
        .map { case (d, e) => s"WHEN digit = $d THEN ${e}e0" }
        .mkString(" ")
      s"""WITH c AS (SELECT CAST(substr(CAST(CAST(FLOOR(
         |      CAST(o_totalprice AS DOUBLE)) AS BIGINT) AS VARCHAR), 1, 1)
         |      AS INT) AS digit
         |  FROM orders WHERE CAST(o_totalprice AS DOUBLE) >= 1e0),
         |g AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY 1),
         |t AS (SELECT SUM(n) AS tt FROM g)
         |SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
         |  ROUND(CAST(n AS DOUBLE) / tt, 6) AS share,
         |  CASE $cases END AS expected,
         |  ROUND(ROUND(CAST(n AS DOUBLE) / tt, 6) - CASE $cases END, 6)
         |    AS deviation
         |FROM g, t ORDER BY digit""".stripMargin
    },

    // q192: the q97 per-dim ladder end-to-end — round-6 components,
    // DECIMAL(18,6) dim sums, round-12/DECIMAL(28,12) pair terms
    "q192_centroid_cosine" ->
      """WITH ex AS (SELECT label, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
        |cen AS (SELECT label, d,
        |    ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(*), 6) AS c
        |  FROM ex GROUP BY 1, 2),
        |pair AS (SELECT a.label AS la, b.label AS lb,
        |    CAST(SUM(CAST(ROUND(a.c * b.c, 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS num,
        |    CAST(SUM(CAST(ROUND(a.c * a.c, 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS na,
        |    CAST(SUM(CAST(ROUND(b.c * b.c, 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS nb
        |  FROM cen a JOIN cen b ON a.d = b.d AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
        |  ROUND(num / (SQRT(na) * SQRT(nb)), 6) AS cosine
        |FROM pair ORDER BY 1, 2""".stripMargin,

    // q193: the smoothing gains and their complements interpolate from
    // the SAME Scala doubles the Spark fold compiles in — `0.7e0`
    // would be one ulp off `1.0 - 0.3` and fork the chain
    "q193_holt_forecast" -> {
      import graft.ops.TimeSeries.holtOneMinus
      val (a, b) = (0.3, 0.1)
      val (a1, b1) = (holtOneMinus(a), holtOneMinus(b))
      val lNext =
        s"ROUND(${a}e0 * x[1] + ${a1}e0 * (acc[1] + COALESCE(acc[2], 0e0)), 6)"
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |ser AS (SELECT event_type, list(y ORDER BY day) AS ys,
         |    COUNT(*) AS n FROM daily GROUP BY 1),
         |f AS (SELECT event_type, n,
         |    list_reduce(list_transform(ys, y -> [y]),
         |      (acc, x) -> [$lNext,
         |        ROUND(${b}e0 * ($lNext - acc[1])
         |          + ${b1}e0 * COALESCE(acc[2], 0e0), 6)]) AS lb
         |  FROM ser)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |  lb[1] AS level, COALESCE(lb[2], 0e0) AS trend,
         |  ROUND(lb[1] + 7.0e0 * COALESCE(lb[2], 0e0), 6) AS forecast
         |FROM f ORDER BY event_type""".stripMargin
    },

    // q194: dim/sign from independent hex digits of one md5 — the q89
    // portable bucket-hash device; zero-sum cells drop on both sides
    "q194_feature_hashing" ->
      """WITH toks AS (SELECT doc_id,
        |    UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    CAST((('0x' || substr(md5(w), 1, 4))::INT % 256) AS BIGINT) AS dim,
        |    CASE WHEN ('0x' || substr(md5(w), 5, 1))::INT % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM toks WHERE w <> '')
        |SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS value
        |FROM h GROUP BY 1, 2 HAVING SUM(s) <> 0
        |ORDER BY doc_id, dim""".stripMargin,

    // q195: the q182 doubled-units device twice over — mid-ranks stay
    // integral (2·cntLess + c + 1 = 2·rank + c − 1); sums in
    // DECIMAL(19,0)-product exactness, the n·Sxy − Sx·Sy combinations
    // in HUGEINT (DuckDB sums HUGEINT to DOUBLE, so sum decimal, then
    // cast); only the final ratio and the correctly-rounded √ are
    // IEEE doubles
    "q195_spearman" ->
      """WITH base AS (SELECT l_returnflag AS g, l_quantity AS x,
        |    l_extendedprice AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_returnflag IS NOT NULL),
        |r AS (SELECT g,
        |    2 * rank() OVER (PARTITION BY g ORDER BY x)
        |      + COUNT(*) OVER (PARTITION BY g, x) - 1 AS dx,
        |    2 * rank() OVER (PARTITION BY g ORDER BY y)
        |      + COUNT(*) OVER (PARTITION BY g, y) - 1 AS dy
        |  FROM base),
        |a AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0))) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(dy AS DECIMAL(19,0))) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0)) * dx) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(dy AS DECIMAL(19,0)) * dy) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0)) * dy) AS HUGEINT) AS sxy
        |  FROM r GROUP BY 1)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |  END AS rho
        |FROM a ORDER BY 1""".stripMargin,

    // q196: daily totals / squares / lag cross-products are exact
    // DECIMALs; the estimator is ONE fixed double expression over
    // those scalars — no order-dependent double summation; the CASE
    // mirrors the constant-series NULL guard
    "q196_autocorrelation" ->
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |stats AS (SELECT g, COUNT(*) AS n,
        |    CAST(SUM(y) AS DECIMAL(28,2)) AS s,
        |    CAST(SUM(y * y) AS DECIMAL(38,4)) AS syy
        |  FROM daily GROUP BY 1),
        |pairs AS (SELECT a.g, CAST(b.d - a.d AS BIGINT) AS lag,
        |    COUNT(*) AS m,
        |    CAST(SUM(a.y * b.y) AS DECIMAL(38,4)) AS sxy,
        |    CAST(SUM(a.y) AS DECIMAL(28,2)) AS sh,
        |    CAST(SUM(b.y) AS DECIMAL(28,2)) AS st
        |  FROM daily a JOIN daily b
        |    ON a.g = b.g AND b.d - a.d BETWEEN 1 AND 7
        |  GROUP BY 1, 2)
        |SELECT p.g AS event_type, lag, CAST(n AS BIGINT) AS n_days,
        |  CAST(m AS BIGINT) AS n_pairs,
        |  CASE WHEN CAST(syy AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n > 0 THEN
        |    ROUND((CAST(sxy AS DOUBLE)
        |        - (CAST(s AS DOUBLE) / n)
        |          * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
        |        + m * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
        |      / (CAST(syy AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6)
        |  END AS acf
        |FROM pairs p JOIN stats USING (g)
        |ORDER BY 1, 2""".stripMargin,

    // q197: quantile_cont interpolates exactly like the bracketed
    // exact selection; round-6 on both sides absorbs the one-ulp
    // association gap (the q106 precedent)
    "q197_key_skew_audit" ->
      ("""WITH counts AS (SELECT o_custkey AS k, COUNT(*) AS cnt
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |agg AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    COUNT(*) AS n_keys, CAST(MAX(cnt) AS BIGINT) AS max_cnt,
        |    ROUND(quantile_cont(CAST(cnt AS DOUBLE), 0.5e0), 6) AS p50_cnt,
        |    ROUND(quantile_cont(CAST(cnt AS DOUBLE), 0.99e0), 6) AS p99_cnt
        |  FROM counts)
        |SELECT n_rows, CAST(n_keys AS BIGINT) AS n_keys, max_cnt,
        |  p50_cnt, p99_cnt,
        |  """.stripMargin +
      huRatio6("max_cnt", "n_rows") + """ AS top1_share,
        |  """.stripMargin +
      huRatio6("CAST(max_cnt AS HUGEINT) * CAST(n_keys AS HUGEINT)",
        "n_rows") + """ AS skew
        |FROM agg""".stripMargin),

    // q198: three q181 χ² blocks (decimal term sums), each normalized
    // to V = √(χ²/(n·min(r−1, c−1))) — χ² is already a round-6
    // double, so V adds one division and a correctly-rounded √
    "q198_cramers_v" -> cramersVSql(Seq(
      ("docs_lang_source", "documents", "lang", "source"),
      ("orders_status_priority", "orders", "o_orderstatus",
        "o_orderpriority"),
      ("customer_segment_nation", "customer", "c_mktsegment",
        "c_nationkey"))),

    // q199: per-group sums/squares exact decimal; each group's s²/n
    // term is a round-6 double summed as DECIMAL(28,6) (the q181
    // term-sum device); F is then a fixed function of exact scalars
    "q199_anova_f" ->
      """WITH byg AS (SELECT event_type AS g, COUNT(*) AS ng,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sg,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))
        |      * CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS ssg
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1),
        |term AS (SELECT g, ng, sg, ssg,
        |    CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng, 6)
        |      AS DECIMAL(28,6)) AS t
        |  FROM byg),
        |agg AS (SELECT COUNT(*) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(sg) AS DECIMAL(28,2)) AS s,
        |    CAST(SUM(ssg) AS DECIMAL(38,4)) AS ss,
        |    SUM(t) AS a2
        |  FROM term)
        |SELECT CAST(k AS BIGINT) AS k, n,
        |  CASE WHEN k > 1 AND n > k
        |      AND (CAST(ss AS DOUBLE) - CAST(a2 AS DOUBLE)) > 0 THEN
        |    ROUND(((CAST(a2 AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (k - 1))
        |      / ((CAST(ss AS DOUBLE) - CAST(a2 AS DOUBLE)) / (n - k)), 6)
        |  END AS f,
        |  CASE WHEN (CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) > 0 THEN
        |    ROUND((CAST(a2 AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        |      / (CAST(ss AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6)
        |  END AS eta_sq
        |FROM agg""".stripMargin,

    // q200: weekday from epoch-day arithmetic (DATE − DATE is integer
    // days in DuckDB, datediff on the Spark side) — never an engine
    // DOW builtin; shares/ratios are single divisions of exact
    // decimal totals
    "q200_dow_profile" ->
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |dd AS (SELECT g,
        |    ((CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7) + 1 AS isodow,
        |    y FROM daily),
        |bydow AS (SELECT g, isodow, COUNT(*) AS nd,
        |    CAST(SUM(y) AS DECIMAL(28,2)) AS t
        |  FROM dd GROUP BY 1, 2),
        |tot AS (SELECT g, COUNT(*) AS n,
        |    CAST(SUM(y) AS DECIMAL(28,2)) AS s FROM dd GROUP BY 1)
        |SELECT b.g AS event_type, CAST(isodow AS BIGINT) AS isodow,
        |  CAST(nd AS BIGINT) AS n_days, CAST(t AS DOUBLE) AS total,
        |  ROUND(CAST(t AS DOUBLE) / CAST(s AS DOUBLE), 6) AS share,
        |  ROUND((CAST(t AS DOUBLE) / nd) / (CAST(s AS DOUBLE) / n), 6)
        |    AS rel_mean
        |FROM bydow b JOIN tot USING (g) ORDER BY 1, 2""".stripMargin,

    // q201: weekly sums and the triangle cumulative stay DECIMAL on
    // both sides; (wk − cohort) is always a multiple of 7 (both dates
    // are week-truncated), so DuckDB's rounding int-cast and Spark's
    // truncation agree on age_week
    "q201_cohort_ltv" ->
      """WITH base AS (SELECT user_id AS u,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk,
        |    COALESCE(CAST(value AS DECIMAL(18,2)),
        |      CAST(0 AS DECIMAL(18,2))) AS v
        |  FROM events WHERE user_id IS NOT NULL),
        |coh AS (SELECT u, MIN(wk) AS cohort FROM base GROUP BY 1),
        |sizes AS (SELECT cohort, COUNT(*) AS n_users FROM coh GROUP BY 1),
        |weekly AS (SELECT cohort,
        |    CAST((b.wk - cohort) / 7 AS BIGINT) AS age_week,
        |    CAST(SUM(v) AS DECIMAL(28,2)) AS rev
        |  FROM base b JOIN coh USING (u) GROUP BY 1, 2),
        |cum AS (SELECT cohort, age_week, rev,
        |    CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age_week
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(38,2)) AS c
        |  FROM weekly)
        |SELECT cohort AS cohort_week, age_week,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(rev AS DOUBLE) AS week_rev, CAST(c AS DOUBLE) AS cum_rev,
        |  ROUND(CAST(c AS DOUBLE) / n_users, 6) AS ltv_per_user
        |FROM cum JOIN sizes USING (cohort) ORDER BY 1, 2""".stripMargin,

    // q202: the bin index runs entirely in integer cents — `div` /
    // `//` integer division on both engines; floor((v−min)/width)
    // would put a one-ulp IEEE boundary under every bin edge
    "q202_equal_width_histogram" ->
      """WITH cents AS (SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |stats AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM cents)
        |SELECT ((c - mn) * 20) // (mx - mn + 1) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n, mn AS min_cents, mx AS max_cents
        |FROM cents CROSS JOIN stats
        |GROUP BY 1, 3, 4 ORDER BY 1""".stripMargin,

    // q203: both the gap and the output timestamp ride the q32
    // floor-seconds device (date_diff counts boundary crossings =
    // Spark's timestamp→long truncation); lag-to-previous-EVENT
    // semantics, identically one row back on both engines
    "q203_debounce" ->
      """WITH w AS (SELECT user_id, ts, event_type,
        |    date_diff('second',
        |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type),
        |      ts) AS gap
        |  FROM events)
        |SELECT user_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_sec,
        |  event_type
        |FROM w WHERE gap IS NULL OR gap > 3600
        |ORDER BY 1, 2, 3""".stripMargin,

    // q204: the q72 entropy ladder feeds the q195 rank device — the
    // entropy CTE is value-pinned by q72's own oracle, and ranks
    // consume only its order
    "q204_length_entropy_spearman" ->
      """WITH chars AS (
        |  SELECT doc_id, SUBSTR(text, CAST(i AS INT), 1) AS ch
        |  FROM documents, UNNEST(RANGE(1, CAST(LENGTH(text) AS BIGINT) + 1)) AS t(i)
        |  WHERE LENGTH(text) > 0),
        |cnts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, SUM(c) AS L FROM cnts GROUP BY doc_id),
        |terms AS (
        |  SELECT cnts.doc_id, c, L,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / L), 6) AS DECIMAL(18,6)) AS lp
        |  FROM cnts JOIN tot ON cnts.doc_id = tot.doc_id),
        |ent AS (SELECT doc_id, CAST(MAX(L) AS BIGINT) AS x,
        |    ROUND(-(CAST(SUM(c * lp) AS DOUBLE) / MAX(L)), 6) AS y
        |  FROM terms GROUP BY doc_id),
        |base AS (SELECT d.source AS g, e.x, e.y
        |  FROM ent e JOIN documents d USING (doc_id)
        |  WHERE d.source IS NOT NULL),
        |r AS (SELECT g,
        |    2 * rank() OVER (PARTITION BY g ORDER BY x)
        |      + COUNT(*) OVER (PARTITION BY g, x) - 1 AS dx,
        |    2 * rank() OVER (PARTITION BY g ORDER BY y)
        |      + COUNT(*) OVER (PARTITION BY g, y) - 1 AS dy
        |  FROM base),
        |a AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0))) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(dy AS DECIMAL(19,0))) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0)) * dx) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(dy AS DECIMAL(19,0)) * dy) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0)) * dy) AS HUGEINT) AS sxy
        |  FROM r GROUP BY 1)
        |SELECT g AS source, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |  END AS rho
        |FROM a ORDER BY 1""".stripMargin,

    // q205: octiles round to 6 BEFORE the ratios (the q106 precedent
    // absorbing the interpolation-association gap); both statistics
    // are then fixed double expressions of the shared values
    "q205_robust_shape" ->
      """WITH q AS (SELECT o_orderpriority, COUNT(*) AS n,
        |    ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      AS DOUBLE), 0.125e0), 6) AS e1,
        |    ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      AS DOUBLE), 0.25e0), 6) AS e2,
        |    ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      AS DOUBLE), 0.375e0), 6) AS e3,
        |    ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      AS DOUBLE), 0.5e0), 6) AS e4,
        |    ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      AS DOUBLE), 0.625e0), 6) AS e5,
        |    ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      AS DOUBLE), 0.75e0), 6) AS e6,
        |    ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      AS DOUBLE), 0.875e0), 6) AS e7
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
        |  e2 AS q1, e4 AS median, e6 AS q3,
        |  CASE WHEN e6 - e2 > 0 THEN
        |    ROUND((e6 + e2 - 2.0e0 * e4) / (e6 - e2), 6) END AS bowley_skew,
        |  CASE WHEN e6 - e2 > 0 THEN
        |    ROUND(((e7 - e5) + (e3 - e1)) / (e6 - e2), 6)
        |  END AS moors_kurtosis
        |FROM q ORDER BY 1""".stripMargin,

    // q206: bucket cut by exact integer rank arithmetic; bucket sums
    // and cumulatives are exact integers in cents; only the two
    // closing share divisions are doubles
    "q206_lorenz_curve" ->
      """WITH base AS (SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    o_orderkey AS id
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |rk AS (SELECT g, c,
        |    row_number() OVER (PARTITION BY g ORDER BY c, id) AS rk,
        |    COUNT(*) OVER (PARTITION BY g) AS n FROM base),
        |b AS (SELECT g, ((rk - 1) * 10) // n AS bucket, COUNT(*) AS bn,
        |    SUM(c) AS bt FROM rk GROUP BY 1, 2),
        |cum AS (SELECT g, bucket, bn,
        |    SUM(bn) OVER (PARTITION BY g ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |    SUM(bt) OVER (PARTITION BY g ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
        |  FROM b),
        |tot AS (SELECT g, SUM(bn) AS tn, SUM(bt) AS ts FROM b GROUP BY 1)
        |SELECT g AS o_orderpriority, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(bn AS BIGINT) AS n,
        |  ROUND(CAST(cn AS DOUBLE) / tn, 6) AS cum_pop_share,
        |  ROUND(CAST(ct AS DOUBLE) / CAST(ts AS DOUBLE), 6) AS cum_value_share
        |FROM cum JOIN tot USING (g) ORDER BY 1, 2""".stripMargin,

    // q207: counts only (the q65 whitespace-token device); the two
    // ratios are single double divisions
    "q207_vocab_stats" ->
      """WITH toks AS (SELECT source AS g,
        |    UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |wc AS (SELECT g, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |a AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS types,
        |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax
        |  FROM wc GROUP BY 1)
        |SELECT g AS source, n_tokens, CAST(types AS BIGINT) AS n_types,
        |  CAST(hapax AS BIGINT) AS n_hapax,
        |  ROUND(CAST(types AS DOUBLE) / n_tokens, 6) AS ttr,
        |  ROUND(CAST(hapax AS DOUBLE) / types, 6) AS hapax_share
        |FROM a ORDER BY 1""".stripMargin,

    // q208: distinct (user, week) + per-user lag/lead; week-truncated
    // date differences are exact multiples of 7 on both engines;
    // churn lands on prev+7, bounded to observed weeks
    "q208_growth_accounting" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events WHERE user_id IS NOT NULL),
        |sq AS (SELECT u, wk,
        |    lag(wk) OVER (PARTITION BY u ORDER BY wk) AS prev,
        |    lead(wk) OVER (PARTITION BY u ORDER BY wk) AS next FROM uw),
        |mx AS (SELECT MAX(wk) AS maxwk FROM uw),
        |cls AS (SELECT wk,
        |    SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS n_new,
        |    SUM(CASE WHEN prev IS NOT NULL AND wk - prev = 7
        |      THEN 1 ELSE 0 END) AS n_retained,
        |    SUM(CASE WHEN prev IS NOT NULL AND wk - prev > 7
        |      THEN 1 ELSE 0 END) AS n_resurrected
        |  FROM sq GROUP BY 1),
        |churn AS (SELECT wk + 7 AS wk, COUNT(*) AS n_churned
        |  FROM sq CROSS JOIN mx
        |  WHERE (next IS NULL OR next - wk > 7) AND wk + 7 <= maxwk
        |  GROUP BY 1)
        |SELECT COALESCE(c.wk, h.wk) AS week,
        |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
        |  CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
        |  CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned
        |FROM cls c FULL OUTER JOIN churn h ON c.wk = h.wk
        |ORDER BY 1""".stripMargin,

    // q209: the q32 session CTEs; durations are floor-seconds exact
    // longs (max − min of the epoch-diff device), so the percentile
    // inputs and both means are functions of exact integers
    "q209_session_stats" ->
      ("""WITH w AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev FROM events),
        |f AS (SELECT user_id, ts, event_id,
        |    CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800
        |      THEN 1 ELSE 0 END AS ns FROM w),
        |s AS (SELECT user_id, ts,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |sess AS (SELECT user_id, sid,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', MAX(ts))
        |      - date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |          MIN(ts)) AS dur,
        |    COUNT(*) AS ne
        |  FROM s GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(ne) AS BIGINT) AS n_events,
        |  """.stripMargin +
      huRatio6("SUM(ne)", "COUNT(*)") + """ AS events_per_session,
        |  """.stripMargin +
      huRatio6("SUM(dur)", "COUNT(*)") + """ AS mean_duration_s,
        |  ROUND(quantile_cont(CAST(dur AS DOUBLE), 0.5e0), 6)
        |    AS p50_duration_s,
        |  ROUND(quantile_cont(CAST(dur AS DOUBLE), 0.9e0), 6)
        |    AS p90_duration_s
        |FROM sess""".stripMargin),

    // q210: the five-token lowercased opening is the cluster key
    // (list slice + join mirrors slice/array_join); counts only
    "q210_prefix_cluster_sizes" ->
      """WITH cl AS (SELECT array_to_string(
        |    string_split_regex(trim(lower(text)), '\s+')[1:5], ' ') AS p,
        |    COUNT(*) AS sz
        |  FROM documents GROUP BY 1)
        |SELECT CAST(sz AS BIGINT) AS cluster_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST((sz - 1) * COUNT(*) AS BIGINT) AS n_removable
        |FROM cl GROUP BY sz ORDER BY 1""".stripMargin,

    // q211: pair join on the DISTINCT (prefix, source) relation
    "q211_cross_source_prefix_dups" ->
      """WITH ds AS (SELECT DISTINCT array_to_string(
        |    string_split_regex(trim(lower(text)), '\s+')[1:5], ' ') AS p,
        |    source
        |  FROM documents)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared_prefixes
        |FROM ds a JOIN ds b ON a.p = b.p AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q212: graft_dot ≙ list_inner_product (both sequential folds,
    // the q177 precedent); round-6 norms sum as DECIMAL(18,6)
    "q212_norm_profile" ->
      ("""WITH nm AS (SELECT label,
        |    CAST(ROUND(SQRT(list_inner_product(
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6)
        |      AS DECIMAL(18,6)) AS v
        |  FROM embeddings)
        |SELECT CAST(label AS BIGINT) AS label,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(v) AS DOUBLE) AS min_norm,
        |  CAST(MAX(v) AS DOUBLE) AS max_norm,
        |  """.stripMargin +
      huRatio6(huMicro("SUM(v)"), "COUNT(*)", scaled = true) +
      """ AS mean_norm
        |FROM nm GROUP BY 1 ORDER BY 1""".stripMargin),

    // q213: the q129 winnow replay at the SHIPPED defaults — gram
    // length 20, window 8, bucket cap 20, minShared 3
    "q213_winnow_default" ->
      """WITH g AS (
        |  SELECT doc_id, i,
        |    substr(md5(substr(text, CAST(i AS INT), 20)), 1, 15) AS h,
        |    length(text) - 19 AS m
        |  FROM documents, UNNEST(range(1, length(text) - 18)) AS t(i)
        |  WHERE length(text) >= 20),
        |sel AS (
        |  SELECT doc_id, i, m,
        |    MIN(h || lpad(CAST(i AS VARCHAR), 9, '0'))
        |      OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mk
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, substr(mk, 1, 15) AS fp
        |  FROM sel WHERE i <= GREATEST(1, m - 7)),
        |keep AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 20),
        |pr AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(COUNT(*) AS BIGINT) AS shared
        |FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY 1, 2""".stripMargin,

    // q214: the 2×2 cells are exact longs; po/pe/κ/χ² are the SAME
    // double expression trees on both engines (products + divisions
    // only, no libm), rounded 6
    "q214_gate_agreement" ->
      s"""WITH sig AS (
         |  SELECT text,
         |    CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         |    ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '\\s', '', 'g')) AS DOUBLE) /
         |      (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 6) AS mean_word_len,
         |    CAST(LIST_MAX(LIST_TRANSFORM(string_split_regex(TRIM(text), '\\s+'),
         |      w -> LENGTH(w))) AS BIGINT) AS max_word_len,
         |    (text LIKE '%{%' OR text LIKE '%}%') AS has_brace,
         |    LOWER(text) LIKE '%lorem ipsum%' AS has_lorem
         |  FROM documents),
         |g AS (SELECT
         |    (n_tokens >= 5 AND mean_word_len BETWEEN 3.0 AND 10.0
         |      AND max_word_len <= 30 AND NOT has_brace AND NOT has_lorem) AS a,
         |    (${sqlQuality("text")} >= 0.75e0) AS b
         |  FROM sig),
         |c AS (SELECT
         |    SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS bp,
         |    SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS oa,
         |    SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS ob,
         |    SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS ne
         |  FROM g),
         |d AS (SELECT bp, oa, ob, ne,
         |    CAST(bp + oa + ob + ne AS DOUBLE) AS n,
         |    CAST(bp + ne AS DOUBLE) / CAST(bp + oa + ob + ne AS DOUBLE) AS po,
         |    CAST(bp + oa AS DOUBLE) / CAST(bp + oa + ob + ne AS DOUBLE) AS pa1,
         |    CAST(bp + ob AS DOUBLE) / CAST(bp + oa + ob + ne AS DOUBLE) AS pb1
         |  FROM c),
         |e AS (SELECT *, pa1 * pb1 + (1e0 - pa1) * (1e0 - pb1) AS pe FROM d)
         |SELECT CAST(n AS BIGINT) AS n, CAST(bp AS BIGINT) AS both_pass,
         |  CAST(oa AS BIGINT) AS only_a, CAST(ob AS BIGINT) AS only_b,
         |  CAST(ne AS BIGINT) AS neither,
         |  ROUND(po, 6) AS agreement,
         |  CASE WHEN pe < 1e0 THEN ROUND((po - pe) / (1e0 - pe), 6) END AS kappa,
         |  CASE WHEN CAST(oa + ob AS DOUBLE) > 0e0 THEN
         |    ROUND(CAST(oa - ob AS DOUBLE) * CAST(oa - ob AS DOUBLE) /
         |      CAST(oa + ob AS DOUBLE), 6) END AS mcnemar_chi2
         |FROM e""".stripMargin,

    // q215/q216: the round-6 score → DECIMAL(18,6) → ×10⁶ BIGINT
    // micro device (a double round-trip could truncate one ulp under
    // the integer); band/bin indices are pure integer `//`
    "q215_roc_curve" ->
      s"""WITH sc AS (SELECT
         |    ROUND(CAST(${sqlStopwordHits("text")} AS DOUBLE) /
         |      CAST(${sqlTokenCount("text")} AS DOUBLE), 6) AS s,
         |    (lang = 'en') AS y
         |  FROM documents),
         |mc AS (SELECT CAST(CAST(s AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS c, y
         |  FROM sc WHERE s IS NOT NULL AND y IS NOT NULL),
         |st AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM mc),
         |bn AS (SELECT ((c - mn) * 10) // (mx - mn + 1) AS band, mn, mx,
         |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
         |    SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS neg
         |  FROM mc CROSS JOIN st GROUP BY 1, 2, 3),
         |cum AS (SELECT band, mn, mx,
         |    SUM(pos) OVER (ORDER BY band DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         |    SUM(neg) OVER (ORDER BY band DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
         |    SUM(pos) OVER () AS p, SUM(neg) OVER () AS f
         |  FROM bn)
         |SELECT CAST(band AS BIGINT) AS band,
         |  CAST(mn + (band * (mx - mn + 1)) // 10 AS BIGINT)
         |    AS threshold_lo_micro,
         |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CASE WHEN p > 0 THEN ROUND(CAST(tp AS DOUBLE) / CAST(p AS DOUBLE), 6)
         |    END AS tpr,
         |  CASE WHEN f > 0 THEN ROUND(CAST(fp AS DOUBLE) / CAST(f AS DOUBLE), 6)
         |    END AS fpr
         |FROM cum ORDER BY band DESC""".stripMargin,

    "q216_calibration_bins" ->
      s"""WITH sc AS (SELECT
         |    ROUND(CAST(${sqlStopwordHits("text")} AS DOUBLE) /
         |      CAST(${sqlTokenCount("text")} AS DOUBLE), 6) AS s,
         |    (lang = 'en') AS y
         |  FROM documents),
         |mc AS (SELECT CAST(CAST(s AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS c, y
         |  FROM sc WHERE s IS NOT NULL AND y IS NOT NULL),
         |b AS (SELECT GREATEST(0, LEAST(9, (c * 10) // 1000001)) AS bin, COUNT(*) AS n,
         |    SUM(CAST(c AS DECIMAL(18,0))) AS sc2,
         |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos
         |  FROM mc GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
         |  ROUND(CAST(sc2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000e0), 6)
         |    AS confidence,
         |  ROUND(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy,
         |  ROUND(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) -
         |    CAST(sc2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000e0), 6) AS gap
         |FROM b ORDER BY bin""".stripMargin,

    // q217: every intermediate of the n-scaled deviation walk is an
    // exact integer (HUGEINT here, DECIMAL(38,0) Spark-side); the
    // argmax ties break on (excursion, −epoch day) struct order
    "q217_cusum_shift" ->
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      * 100 AS HUGEINT) AS c
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |st AS (SELECT g, COUNT(*) AS n, SUM(c) AS s FROM daily GROUP BY 1),
        |wk AS (SELECT g, d, c, n, s,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS t,
        |    SUM(c) OVER (PARTITION BY g ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM daily JOIN st USING (g)),
        |w2 AS (SELECT g, d, n, s, cum * n - t * s AS w FROM wk),
        |c2 AS (SELECT g, d, n, s, w,
        |    w - MIN(w) OVER (PARTITION BY g ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
        |    MAX(w) OVER (PARTITION BY g ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS cneg,
        |    CAST(d - DATE '1970-01-01' AS INTEGER) AS ed
        |  FROM w2)
        |SELECT g AS event_type, CAST(MAX(n) AS BIGINT) AS n_days,
        |  ROUND(CAST(MAX(s) AS DOUBLE) /
        |    (CAST(MAX(n) AS DOUBLE) * 100e0), 6) AS mean_daily,
        |  ROUND(CAST(MAX(cpos) AS DOUBLE) /
        |    (CAST(MAX(n) AS DOUBLE) * 100e0), 6) AS max_cusum_pos,
        |  arg_max(d, cpos * 1000000 - ed) AS day_pos,
        |  ROUND(CAST(MAX(cneg) AS DOUBLE) /
        |    (CAST(MAX(n) AS DOUBLE) * 100e0), 6) AS max_cusum_neg,
        |  arg_max(d, cneg * 1000000 - ed) AS day_neg
        |FROM c2 GROUP BY 1 ORDER BY 1""".stripMargin,

    // q218: pairwise-complete Pearson per lag — decimal pair moments,
    // one fixed double expression + correctly-rounded √ each
    "q218_cross_correlation" ->
      """WITH a AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS va
        |  FROM events WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1),
        |b AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS vb
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        |  GROUP BY 1),
        |sh AS (SELECT b.d AS db, vb, CAST(i AS INTEGER) AS lag
        |  FROM b CROSS JOIN UNNEST(range(-7, 8)) AS t(i)),
        |pr AS (SELECT lag, COUNT(*) AS m,
        |    CAST(SUM(va) AS DECIMAL(28,2)) AS sa,
        |    CAST(SUM(vb) AS DECIMAL(28,2)) AS sb,
        |    CAST(SUM(va * va) AS DECIMAL(38,4)) AS saa,
        |    CAST(SUM(vb * vb) AS DECIMAL(38,4)) AS sbb,
        |    CAST(SUM(va * vb) AS DECIMAL(38,4)) AS sab
        |  FROM a JOIN sh ON a.d = sh.db - lag GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, CAST(m AS BIGINT) AS n_pairs,
        |  CASE WHEN m > 1
        |      AND (CAST(m AS DOUBLE) * CAST(saa AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) > 0e0
        |      AND (CAST(m AS DOUBLE) * CAST(sbb AS DOUBLE)
        |        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0e0 THEN
        |    ROUND((CAST(m AS DOUBLE) * CAST(sab AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
        |      SQRT((CAST(m AS DOUBLE) * CAST(saa AS DOUBLE)
        |          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
        |        (CAST(m AS DOUBLE) * CAST(sbb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
        |  END AS ccf
        |FROM pr ORDER BY lag""".stripMargin,

    // q219: document positions are row_number by id (ranks are unique
    // — the Spark side rides the stratified-rank device); buckets are
    // pure integer `//`
    "q219_vocab_growth" ->
      """WITH rk AS (SELECT doc_id, text,
        |    ROW_NUMBER() OVER (ORDER BY doc_id) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM documents),
        |db AS (SELECT ((rk - 1) * 10) // n AS step0, COUNT(*) AS docs
        |  FROM rk GROUP BY 1),
        |wd AS (SELECT w, MIN(rk) AS fr, MAX(n) AS n FROM (
        |    SELECT rk, n,
        |      UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |    FROM rk) t
        |  WHERE w <> '' GROUP BY 1),
        |wb AS (SELECT ((fr - 1) * 10) // n AS step0, COUNT(*) AS nw
        |  FROM wd GROUP BY 1),
        |j AS (SELECT db.step0, docs, COALESCE(nw, 0) AS nw
        |  FROM db LEFT JOIN wb USING (step0))
        |SELECT CAST(step0 + 1 AS BIGINT) AS step,
        |  CAST(SUM(docs) OVER (ORDER BY step0
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS docs_cum,
        |  CAST(nw AS BIGINT) AS new_words,
        |  CAST(SUM(nw) OVER (ORDER BY step0
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS vocab_cum
        |FROM j ORDER BY step""".stripMargin,

    // q220: jq group_by/unique_by ≙ per-doc word-count relation —
    // split on the literal single space keeps empty fields on both
    // engines (empty TEXT is filtered: jq yields [], DuckDB [''])
    "q220_jq_group_by" ->
      """WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
        |  FROM documents WHERE LENGTH(text) > 0),
        |per AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2)
        |SELECT doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_uniq,
        |  CAST(MAX(c) AS BIGINT) AS top_run
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // q221: the ranking key is the NEGATED round-6 micro score (an
    // integral BIGINT — a negated double key would put ±0.0 under the
    // engines' differing float total orders); decile cuts are the
    // quantileBuckets integral arithmetic
    "q221_gain_curve" ->
      s"""WITH sc AS (SELECT doc_id,
         |    ROUND(CAST(${sqlStopwordHits("text")} AS DOUBLE) /
         |      CAST(${sqlTokenCount("text")} AS DOUBLE), 6) AS s,
         |    (lang = 'en') AS y
         |  FROM documents),
         |r AS (SELECT doc_id, y,
         |    ROW_NUMBER() OVER (ORDER BY
         |      -(CAST(CAST(s AS DECIMAL(18,6)) * 1000000 AS BIGINT)),
         |      doc_id) AS rk,
         |    COUNT(*) OVER () AS n
         |  FROM sc WHERE s IS NOT NULL AND y IS NOT NULL),
         |b AS (SELECT ((rk - 1) * 10) // n + 1 AS bucket, COUNT(*) AS nb,
         |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos
         |  FROM r GROUP BY 1),
         |c AS (SELECT bucket, nb, pos,
         |    SUM(nb) OVER (ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         |    SUM(pos) OVER (ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         |    SUM(nb) OVER () AS tn, SUM(pos) OVER () AS tp
         |  FROM b)
         |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(nb AS BIGINT) AS n,
         |  CAST(pos AS BIGINT) AS n_pos,
         |  CASE WHEN tp > 0 THEN
         |    ROUND(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE), 6)
         |  END AS cum_share_pos,
         |  CASE WHEN tp > 0 THEN
         |    ROUND((CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE)) /
         |      (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6)
         |  END AS cum_lift
         |FROM c ORDER BY bucket""".stripMargin,

    "q222_fd_audit" ->
      """WITH a AS (SELECT c_custkey AS det, COUNT(DISTINCT c_nationkey) AS d
        |  FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1),
        |ar AS (SELECT 'c_custkey->c_nationkey' AS fd,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(MAX(d) AS BIGINT) AS max_distinct,
        |    CASE WHEN COUNT(*) > 0 THEN
        |      ROUND(CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(COUNT(*) AS DOUBLE), 6) END AS violation_rate
        |  FROM a),
        |b AS (SELECT o_custkey AS det,
        |    COUNT(DISTINCT o_orderpriority) AS d
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |br AS (SELECT 'o_custkey->o_orderpriority' AS fd,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(MAX(d) AS BIGINT) AS max_distinct,
        |    CASE WHEN COUNT(*) > 0 THEN
        |      ROUND(CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(COUNT(*) AS DOUBLE), 6) END AS violation_rate
        |  FROM b)
        |SELECT * FROM ar UNION ALL SELECT * FROM br ORDER BY fd""".stripMargin,

    // q223: floor-seconds gaps (the q32 sessionize device); exact
    // p50/p90 ≙ quantile_cont (the q106 precedent)
    "q223_interarrival" ->
      ("""WITH g AS (SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) -
        |      LAG(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) OVER (
        |        PARTITION BY event_type, user_id
        |        ORDER BY ts, event_id) AS gap
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  """.stripMargin +
      huRatio6("SUM(gap)", "COUNT(*)") + """ AS mean_gap,
        |  ROUND(quantile_cont(CAST(gap AS DOUBLE), 0.5e0), 6) AS p50,
        |  ROUND(quantile_cont(CAST(gap AS DOUBLE), 0.9e0), 6) AS p90
        |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin),

    // q224: the quantized-view contract — every element rounds ONCE
    // to micro units (HALF_UP ×10⁶, exact integers), so all three
    // moment families are integral (HUGEINT here, long partials +
    // DECIMAL merge Spark-side); each pair's r is one fixed double
    // expression over those integers; top-10 by |r| with (i, j) ties,
    // re-sorted (i, j) for the differ
    "q224_dim_correlation" ->
      """WITH e AS (SELECT list_transform(embedding, x ->
        |      CAST(CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6))
        |        * 1000000 AS HUGEINT)) AS m
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |ds AS (SELECT i, COUNT(*) AS n,
        |    SUM(m[CAST(i + 1 AS INT)]) AS s,
        |    SUM(m[CAST(i + 1 AS INT)] * m[CAST(i + 1 AS INT)]) AS ss
        |  FROM e, UNNEST(range(0, 64)) AS t(i) GROUP BY 1),
        |ps AS (SELECT i, j,
        |    SUM(m[CAST(i + 1 AS INT)] * m[CAST(j + 1 AS INT)]) AS sp
        |  FROM e, UNNEST(range(0, 63)) AS t1(i),
        |    UNNEST(range(i + 1, 64)) AS t2(j)
        |  GROUP BY 1, 2),
        |r AS (SELECT ps.i, ps.j, a.n,
        |    CASE WHEN (CAST(a.n AS DOUBLE) * CAST(a.ss AS DOUBLE)
        |        - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)) > 0e0
        |      AND (CAST(a.n AS DOUBLE) * CAST(b.ss AS DOUBLE)
        |        - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)) > 0e0 THEN
        |      ROUND((CAST(a.n AS DOUBLE) * CAST(sp AS DOUBLE)
        |          - CAST(a.s AS DOUBLE) * CAST(b.s AS DOUBLE)) /
        |        SQRT((CAST(a.n AS DOUBLE) * CAST(a.ss AS DOUBLE)
        |            - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)) *
        |          (CAST(a.n AS DOUBLE) * CAST(b.ss AS DOUBLE)
        |            - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))), 6)
        |    END AS corr
        |  FROM ps JOIN ds a ON ps.i = a.i JOIN ds b ON ps.j = b.i),
        |topk AS (SELECT * FROM r WHERE corr IS NOT NULL
        |  ORDER BY ABS(corr) DESC, i, j LIMIT 10)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(n AS BIGINT) AS n, corr
        |FROM topk ORDER BY i, j""".stripMargin,

    // q225: the q32 sessionize device + in-session leads; floor-second
    // gap ≙ date_diff('second'); NULL event types excluded up front on
    // both sides so session boundaries agree
    "q225_session_paths" ->
      """WITH base AS (SELECT user_id, event_id, ts, event_type
        |  FROM events WHERE event_type IS NOT NULL),
        |flagged AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN prev_ts IS NULL
        |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0
        |    END AS ns
        |  FROM (SELECT user_id, event_id, ts, event_type,
        |      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        AS prev_ts
        |    FROM base)),
        |sess AS (SELECT user_id, event_id, ts, event_type,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged),
        |tri AS (SELECT event_type AS e1,
        |    LEAD(event_type, 1) OVER w AS e2,
        |    LEAD(event_type, 2) OVER w AS e3
        |  FROM sess
        |  WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
        |SELECT e1 || '>' || e2 || '>' || e3 AS path,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    // q226: dropDuplicatesWithinWatermark emits an arrival-order-free
    // KEY SET on this bounded corpus — batch parity is DISTINCT
    "q226_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY 1, 2""".stripMargin,

    // q227: the q72 entropy ladder twice (round-6 LN → DECIMAL term
    // sums); IG is a fixed double expression of the two ladders
    "q227_info_gain" ->
      """WITH d AS (SELECT source, lang FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cells AS (SELECT source, lang, COUNT(*) AS c FROM d GROUP BY 1, 2),
        |st AS (SELECT source, SUM(c) AS ns FROM cells GROUP BY 1),
        |hc AS (SELECT SUM(CAST(c AS DECIMAL(18,0)) *
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)), 6)
        |      AS DECIMAL(18,6))) AS hcv
        |  FROM cells JOIN st USING (source)),
        |bl AS (SELECT lang, COUNT(*) AS cl FROM d GROUP BY 1),
        |nt AS (SELECT SUM(cl) AS n FROM bl),
        |ht AS (SELECT MAX(n) AS n, SUM(CAST(cl AS DECIMAL(18,0)) *
        |    CAST(ROUND(LN(CAST(cl AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |      AS DECIMAL(18,6))) AS hlv
        |  FROM bl CROSS JOIN nt)
        |SELECT CAST(n AS BIGINT) AS n,
        |  ROUND(-(CAST(hlv AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS h_label,
        |  ROUND(-(CAST(hcv AS DOUBLE)) / CAST(n AS DOUBLE), 6)
        |    AS h_conditional,
        |  ROUND(-(CAST(hlv AS DOUBLE)) / CAST(n AS DOUBLE) -
        |    (-(CAST(hcv AS DOUBLE)) / CAST(n AS DOUBLE)), 6) AS info_gain
        |FROM ht CROSS JOIN hc""".stripMargin,

    // q228: the q213 winnow replay joined back to sources — the
    // near-dup leakage matrix
    "q228_cross_source_neardups" ->
      """WITH g AS (
        |  SELECT doc_id, i,
        |    substr(md5(substr(text, CAST(i AS INT), 20)), 1, 15) AS h,
        |    length(text) - 19 AS m
        |  FROM documents, UNNEST(range(1, length(text) - 18)) AS t(i)
        |  WHERE length(text) >= 20),
        |sel AS (
        |  SELECT doc_id, i, m,
        |    MIN(h || lpad(CAST(i AS VARCHAR), 9, '0'))
        |      OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mk
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, substr(mk, 1, 15) AS fp
        |  FROM sel WHERE i <= GREATEST(1, m - 7)),
        |keep AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 20),
        |pr AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp)),
        |wp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |m2 AS (SELECT LEAST(da.source, db.source) AS source_a,
        |    GREATEST(da.source, db.source) AS source_b
        |  FROM wp JOIN documents da ON wp.id_a = da.doc_id
        |    JOIN documents db ON wp.id_b = db.doc_id)
        |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM m2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q229_confusion_matrix" ->
      s"""SELECT lang AS actual, ${sqlLangId("text")} AS predicted,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM documents WHERE lang IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q230_class_prf" ->
      s"""WITH cells AS (SELECT lang AS actual,
         |    ${sqlLangId("text")} AS predicted, COUNT(*) AS c
         |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
         |tp AS (SELECT actual AS cls, c AS tp FROM cells
         |  WHERE actual = predicted),
         |act AS (SELECT actual AS cls, SUM(c) AS a FROM cells GROUP BY 1),
         |pred AS (SELECT predicted AS cls, SUM(c) AS p FROM cells
         |  GROUP BY 1),
         |j AS (SELECT COALESCE(act.cls, pred.cls) AS cls,
         |    COALESCE(tp.tp, 0) AS tp, COALESCE(a, 0) AS a,
         |    COALESCE(p, 0) AS p
         |  FROM act FULL OUTER JOIN pred ON act.cls = pred.cls
         |  LEFT JOIN tp ON COALESCE(act.cls, pred.cls) = tp.cls),
         |k AS (SELECT cls, tp, a, p,
         |    CASE WHEN p > 0 THEN
         |      ROUND(CAST(tp AS DOUBLE) / CAST(p AS DOUBLE), 6) END AS prc,
         |    CASE WHEN a > 0 THEN
         |      ROUND(CAST(tp AS DOUBLE) / CAST(a AS DOUBLE), 6) END AS rcl
         |  FROM j)
         |SELECT cls, CAST(tp AS BIGINT) AS tp, CAST(a AS BIGINT) AS n_actual,
         |  CAST(p AS BIGINT) AS n_predicted,
         |  prc AS "precision", rcl AS recall,
         |  CASE WHEN prc IS NOT NULL AND rcl IS NOT NULL
         |      AND (prc + rcl) > 0 THEN
         |    ROUND(2e0 * prc * rcl / (prc + rcl), 6) END AS f1
         |FROM k ORDER BY cls""".stripMargin,

    // q231: DOW means at 2 dp re-enter as DECIMAL so the residual
    // series is exact, then scale to integer CENTS — all ACF moments
    // become integral and their double casts exact on both engines
    // (wide-decimal casts double-round; one flipped a round-6 half
    // boundary); the ACF ratio is scale-invariant, the chain is
    // q196's verbatim
    "q231_deseasonalized_acf" ->
      """WITH daily0 AS (SELECT event_type AS g,
        |    CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      * 100 AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |dw AS (SELECT g, d, c,
        |    ((CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7) AS dow
        |  FROM daily0),
        |dm AS (SELECT g, dow,
        |    CAST(ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 0)
        |      AS BIGINT) AS mu
        |  FROM dw GROUP BY 1, 2),
        |daily AS (SELECT dw.g, d,
        |    CAST(dw.c - mu AS DECIMAL(18,2)) AS y
        |  FROM dw JOIN dm ON dw.g = dm.g AND dw.dow = dm.dow),
        |stats AS (SELECT g, COUNT(*) AS n,
        |    CAST(SUM(y) AS DECIMAL(28,2)) AS s,
        |    CAST(SUM(y * y) AS DECIMAL(38,4)) AS syy
        |  FROM daily GROUP BY 1),
        |pairs AS (SELECT a.g, CAST(b.d - a.d AS BIGINT) AS lag,
        |    COUNT(*) AS m,
        |    CAST(SUM(a.y * b.y) AS DECIMAL(38,4)) AS sxy,
        |    CAST(SUM(a.y) AS DECIMAL(28,2)) AS sh,
        |    CAST(SUM(b.y) AS DECIMAL(28,2)) AS st
        |  FROM daily a JOIN daily b
        |    ON a.g = b.g AND b.d - a.d BETWEEN 1 AND 7
        |  GROUP BY 1, 2)
        |SELECT p.g AS event_type, lag, CAST(n AS BIGINT) AS n_days,
        |  CAST(m AS BIGINT) AS n_pairs,
        |  CASE WHEN CAST(syy AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n > 0 THEN
        |    ROUND((CAST(sxy AS DOUBLE)
        |        - (CAST(s AS DOUBLE) / n)
        |          * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
        |        + m * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
        |      / (CAST(syy AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6)
        |  END AS acf
        |FROM pairs p JOIN stats USING (g)
        |ORDER BY 1, 2""".stripMargin,

    // q232: the q224 micro device + the q199 ANOVA ladder per dim
    "q232_dim_discrimination" ->
      """WITH e AS (SELECT label, list_transform(embedding, x ->
        |      CAST(CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6))
        |        * 1000000 AS HUGEINT)) AS m
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND label IS NOT NULL AND len(embedding) = 64),
        |cells AS (SELECT i, label, COUNT(*) AS ng,
        |    SUM(m[CAST(i + 1 AS INT)]) AS sg,
        |    SUM(m[CAST(i + 1 AS INT)] * m[CAST(i + 1 AS INT)]) AS ssg
        |  FROM e, UNNEST(range(0, 64)) AS t(i) GROUP BY 1, 2),
        |agg AS (SELECT i, COUNT(*) AS k, SUM(ng) AS n,
        |    SUM(sg) AS s, SUM(ssg) AS ss,
        |    SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE), 6) AS DECIMAL(38,6))) AS a2
        |  FROM cells GROUP BY 1),
        |f AS (SELECT i, k, n,
        |    CASE WHEN k > 1 AND n > k
        |        AND (CAST(ss AS DOUBLE) - CAST(a2 AS DOUBLE)) > 0 THEN
        |      ROUND(((CAST(a2 AS DOUBLE) - CAST(s AS DOUBLE)
        |          * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / (k - 1))
        |        / ((CAST(ss AS DOUBLE) - CAST(a2 AS DOUBLE)) / (n - k)), 6)
        |    END AS f
        |  FROM agg),
        |topk AS (SELECT * FROM f WHERE f IS NOT NULL
        |  ORDER BY f DESC, i LIMIT 10)
        |SELECT CAST(i AS BIGINT) AS dim, CAST(k AS BIGINT) AS n_classes,
        |  CAST(n AS BIGINT) AS n, f
        |FROM topk ORDER BY dim""".stripMargin,

    // q233: letter/word/sentence-run counts are pure length
    // arithmetic; CLI is one fixed double expression per doc, round-6
    // into DECIMAL so the per-source means are order-free
    "q233_readability" ->
      (s"""WITH d AS (SELECT source, text FROM documents
         |  WHERE text IS NOT NULL AND LENGTH(text) > 0),
         |per AS (SELECT source,
         |    CAST(LENGTH(text) -
         |      LENGTH(REGEXP_REPLACE(text, '[A-Za-z]', '', 'g'))
         |      AS BIGINT) AS l,
         |    ${sqlTokenCount("text")} AS w,
         |    GREATEST(CAST(LENGTH(REGEXP_REPLACE(text, '[.!?]+', '.', 'g'))
         |      - LENGTH(REGEXP_REPLACE(text, '[.!?]+', '', 'g'))
         |      AS BIGINT), 1) AS sn
         |  FROM d),
         |cli AS (SELECT source, l, w, sn,
         |    CAST(ROUND(0.0588e0 * (CAST(l AS DOUBLE) * 100e0
         |        / CAST(w AS DOUBLE))
         |      - 0.296e0 * (CAST(sn AS DOUBLE) * 100e0 / CAST(w AS DOUBLE))
         |      - 15.8e0, 6) AS DECIMAL(18,6)) AS c
         |  FROM per)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  """.stripMargin +
      huRatio6("SUM(l)", "COUNT(*)") + """ AS mean_letters,
         |  """.stripMargin +
      huRatio6("SUM(w)", "COUNT(*)") + """ AS mean_words,
         |  """.stripMargin +
      huRatio6("SUM(sn)", "COUNT(*)") + """ AS mean_sentences,
         |  """.stripMargin +
      huRatio6(huMicro("SUM(c)"), "COUNT(*)", scaled = true) +
      """ AS mean_cli
         |FROM cli GROUP BY 1 ORDER BY 1""".stripMargin),

    // q234: order-free digest checksum — DuckDB has no CONV, so the
    // 8 hex digits expand to a strpos polynomial (same integer)
    "q234_table_checksums" -> {
      val tables = Seq(
        ("region", "r_regionkey"), ("nation", "n_nationkey"),
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"))
      def hex8(keyExpr: String): String =
        (1 to 8).map { i =>
          s"(strpos('0123456789abcdef', substr(md5(CAST($keyExpr AS " +
            s"VARCHAR)), $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}"
        }.mkString("(", " + ", ")")
      tables.map { case (tbl, key) =>
        s"""SELECT '$tbl' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(DISTINCT $key) AS BIGINT) AS n_keys,
           |  CAST(SUM(${hex8(key)}) AS BIGINT) AS key_checksum
           |FROM $tbl""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    // q235: quantile_cont ≙ the bracketed exact selection (q106)
    "q235_weekly_value_profile" ->
      """WITH o AS (SELECT
        |    CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |SELECT week, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST((2 * CAST(CAST(SUM(p) AS DECIMAL(28,2)) * 100 AS BIGINT)
        |      * 10000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
        |    / 1000000e0 AS mean_price,
        |  ROUND(quantile_cont(CAST(p AS DOUBLE), 0.5e0), 6) AS p50,
        |  ROUND(quantile_cont(CAST(p AS DOUBLE), 0.9e0), 6) AS p90
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    // q236: the mid-quantile key (2r−1)/(2n_s) is the same double on
    // both engines; the global order ties through (key, source, id)
    "q236_curriculum_interleave" ->
      """WITH r1 AS (SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY source) AS ns
        |  FROM documents),
        |keyed AS (SELECT doc_id, source,
        |    CAST(2 * rk - 1 AS DOUBLE) / CAST(2 * ns AS DOUBLE) AS k
        |  FROM r1),
        |pos AS (SELECT source,
        |    ROW_NUMBER() OVER (ORDER BY k, source, doc_id) AS p,
        |    COUNT(*) OVER () AS n
        |  FROM keyed)
        |SELECT CAST((p - 1) * 10 // n AS BIGINT) AS decile, source,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM pos GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q237: pure integer offset arithmetic per budget (q66's device)
    "q237_packing_efficiency" -> {
      def block(b: Long): String =
        s"""SELECT ${b} AS budget, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n) AS BIGINT) AS n_tokens,
           |  CAST(MAX(pl) + 1 AS BIGINT) AS n_packs,
           |  CAST(SUM(CASE WHEN pl > pf THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_docs_split,
           |  ${huRatio6("SUM(n)", s"(MAX(pl) + 1) * $b")} AS fill_rate
           |FROM (SELECT n, o // ${b} AS pf,
           |    (o + GREATEST(n, 1) - 1) // ${b} AS pl
           |  FROM (SELECT n, COALESCE(SUM(n) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
           |    FROM (SELECT doc_id,
           |        CAST(len(string_split_regex(trim(text), '\\s+'))
           |          AS BIGINT) AS n
           |      FROM documents)))""".stripMargin
      Seq(256L, 512L, 1024L).map(block)
        .mkString("", "\nUNION ALL\n", "\nORDER BY budget")
    },

    // q238: the q67 exact-overlap contract rolled up per source
    "q238_contamination_report" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, array_to_string(tokens[i:i+6], ' ') AS gram
        |    FROM toks, UNNEST(range(1, len(tokens) - 5)) AS t(i)
        |    UNION ALL
        |    SELECT doc_id, array_to_string(tokens, ' ') AS gram
        |    FROM toks WHERE len(tokens) < 7)),
        |ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 10 = 0),
        |cont AS (SELECT DISTINCT tr.doc_id
        |  FROM (SELECT doc_id, gram FROM sh WHERE doc_id % 10 <> 0) tr
        |  JOIN ev USING (gram)),
        |tr2 AS (SELECT doc_id, source FROM documents WHERE doc_id % 10 <> 0),
        |tc AS (SELECT source, COUNT(*) AS n FROM tr2 GROUP BY 1),
        |cc AS (SELECT source, COUNT(*) AS c FROM tr2
        |  JOIN cont USING (doc_id) GROUP BY 1)
        |SELECT tc.source, CAST(n AS BIGINT) AS n_docs,
        |  CAST(COALESCE(c, 0) AS BIGINT) AS n_contaminated,
        |  ROUND(CAST(COALESCE(c, 0) AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS contamination_rate
        |FROM tc LEFT JOIN cc ON tc.source = cc.source
        |ORDER BY 1""".stripMargin,

    // q239 batch-probe ≡ probe-loop equivalence contract — empty.
    "q239_ivf_batch" ->
      """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS corpus_id,
        |  CAST(NULL AS DOUBLE) AS cos_sim, CAST(NULL AS BIGINT) AS rank,
        |  CAST(NULL AS VARCHAR) AS side WHERE FALSE""".stripMargin,

    // q240: pair counts from the cell self-join; DECIMAL products stay
    // ≤ 37 digits (a HUGEINT product would SUM to DOUBLE in DuckDB);
    // doubled tie terms avoid decimal division entirely
    "q240_ordinal_assoc" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS INT) AS x,
        |         CAST(ROUND(l_discount * 100, 0) AS INT) AS y, COUNT(*) AS o
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |  GROUP BY 1, 2),
        |cd AS (
        |  SELECT
        |    COALESCE(SUM(CASE WHEN a.y < b.y
        |      THEN CAST(a.o AS DECIMAL(18,0)) * CAST(b.o AS DECIMAL(18,0)) END),
        |      0) AS c_pairs,
        |    COALESCE(SUM(CASE WHEN a.y > b.y
        |      THEN CAST(a.o AS DECIMAL(18,0)) * CAST(b.o AS DECIMAL(18,0)) END),
        |      0) AS d_pairs
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |tx AS (SELECT SUM(CAST(t AS DECIMAL(18,0)) * (t - 1)) AS dn1,
        |         SUM(CAST(t AS DECIMAL(18,0))) AS nn
        |       FROM (SELECT x, SUM(o) AS t FROM cells GROUP BY 1)),
        |ty AS (SELECT SUM(CAST(t AS DECIMAL(18,0)) * (t - 1)) AS dn2
        |       FROM (SELECT y, SUM(o) AS t FROM cells GROUP BY 1))
        |SELECT CAST(nn AS BIGINT) AS n,
        |  CAST(c_pairs AS DOUBLE) AS c_pairs, CAST(d_pairs AS DOUBLE) AS d_pairs,
        |  CASE WHEN nn * (nn - 1) > dn1 AND nn * (nn - 1) > dn2 THEN
        |    ROUND(2e0 * (CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE)) /
        |      sqrt(((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1e0)) - CAST(dn1 AS DOUBLE)) *
        |           ((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1e0)) - CAST(dn2 AS DOUBLE))), 6)
        |  END AS tau_b,
        |  CASE WHEN c_pairs + d_pairs > 0 THEN
        |    ROUND((CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE)) /
        |          (CAST(c_pairs AS DOUBLE) + CAST(d_pairs AS DOUBLE)), 6)
        |  END AS gamma,
        |  CASE WHEN nn * (nn - 1) > dn1 THEN
        |    ROUND(2e0 * (CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE)) /
        |          ((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1e0)) - CAST(dn1 AS DOUBLE)), 6)
        |  END AS somers_d
        |FROM cd, tx, ty""".stripMargin,

    // q241: lag chain + half-up integer division micro-probabilities
    // (the q235 device — round(c/tot, 6) flips at .5 micro boundaries)
    "q241_markov_transitions" ->
      """WITH steps AS (
        |  SELECT LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_type,
        |         event_type AS next_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, COUNT(*) AS n_steps FROM steps
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, SUM(n_steps) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, CAST(n_steps AS BIGINT) AS n_steps,
        |  CAST((2 * n_steps * 1000000 + tot) // (2 * tot) AS DOUBLE)
        |    / 1000000e0 AS p
        |FROM c JOIN tot USING (prev_type)
        |ORDER BY 1, 2""".stripMargin,

    // q242 stationary fixpoint contract — empty when πP = π holds.
    "q242_markov_stationary" ->
      """SELECT CAST(NULL AS VARCHAR) AS state, CAST(NULL AS DOUBLE) AS residual,
        |  CAST(NULL AS VARCHAR) AS violation WHERE FALSE""".stripMargin,

    // q243: Good–Turing r* via half-up integer micro division
    "q243_turing_estimate" ->
      """WITH toks AS (
        |    SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |grams AS (SELECT array_to_string(ws[i:i+1], ' ') AS w
        |  FROM toks, UNNEST(range(1, len(ws))) AS t(i)),
        |cnts AS (SELECT w, COUNT(*) AS r FROM grams
        |  WHERE w <> '' GROUP BY 1),
        |ff AS (SELECT r, COUNT(*) AS n_r FROM cnts GROUP BY 1)
        |SELECT CAST(a.r AS BIGINT) AS r, CAST(a.n_r AS BIGINT) AS n_r,
        |  CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r_next,
        |  CAST((2 * (a.r + 1) * COALESCE(b.n_r, 0) * 1000000 + a.n_r)
        |    // (2 * a.n_r) AS DOUBLE) / 1000000e0 AS r_star
        |FROM ff a LEFT JOIN ff b ON b.r = a.r + 1
        |WHERE a.r <= 15 ORDER BY a.r""".stripMargin,

    // q244: distinct (source, token) sets; jaccard via the micro
    // division device
    "q244_vocab_overlap" ->
      """WITH sv AS (SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, string_split_regex(trim(text), '\s+') AS ws
        |    FROM documents), UNNEST(ws) AS t(w) WHERE w <> ''),
        |sizes AS (SELECT src, COUNT(*) AS n FROM sv GROUP BY 1),
        |inter AS (SELECT a.src AS source_a, b.src AS source_b,
        |    COUNT(*) AS n_common
        |  FROM sv a JOIN sv b ON a.w = b.w AND a.src < b.src GROUP BY 1, 2)
        |SELECT source_a, source_b, CAST(sa.n AS BIGINT) AS n_a,
        |  CAST(sb.n AS BIGINT) AS n_b, CAST(n_common AS BIGINT) AS n_common,
        |  CAST((2 * n_common * 1000000 + (sa.n + sb.n - n_common))
        |    // (2 * (sa.n + sb.n - n_common)) AS DOUBLE) / 1000000e0 AS jaccard
        |FROM inter JOIN sizes sa ON sa.src = source_a
        |JOIN sizes sb ON sb.src = source_b
        |ORDER BY 1, 2""".stripMargin,

    "q245_kanonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    COUNT(*) AS n_rows, COUNT(DISTINCT c_acctbal) AS n_sensitive
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
        |  bal_band, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_sensitive AS BIGINT) AS n_sensitive,
        |  CASE WHEN n_rows < 5 AND n_sensitive < 3 THEN 'k+l'
        |       WHEN n_rows < 5 THEN 'k' ELSE 'l' END AS violation
        |FROM g WHERE n_rows < 5 OR n_sensitive < 3
        |ORDER BY 1, 2, 3""".stripMargin,

    // q246: binary-segmentation split from exact integral prefix
    // moments (cents / cents², scale-0 decimals so every
    // decimal→double cast is a SINGLE correct rounding on both
    // engines); the SSE expression tree is replayed verbatim
    "q246_changepoint" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |      * 100 AS DECIMAL(18,0)) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |pre AS (SELECT day,
        |    ROW_NUMBER() OVER (ORDER BY day) AS i,
        |    SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s1,
        |    SUM(c * c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s2,
        |    LEAD(day) OVER (ORDER BY day) AS nextday
        |  FROM daily),
        |tot AS (SELECT COUNT(*) AS n, SUM(c) AS t1, SUM(c * c) AS t2 FROM daily),
        |scored AS (SELECT day, i, s1, s2, nextday, n, t1, t2,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |       / CAST(i AS DOUBLE)) +
        |    ((CAST(t2 AS DOUBLE) - CAST(s2 AS DOUBLE)) -
        |     (CAST(t1 AS DOUBLE) - CAST(s1 AS DOUBLE)) *
        |     (CAST(t1 AS DOUBLE) - CAST(s1 AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))) AS sse
        |  FROM pre, tot WHERE i < n),
        |best AS (SELECT * FROM scored ORDER BY sse, day LIMIT 1)
        |SELECT nextday AS split_day, CAST(i AS BIGINT) AS n_left,
        |  CAST(n - i AS BIGINT) AS n_right,
        |  CAST((2 * CAST(s1 AS BIGINT) * 10000 + i) // (2 * i) AS DOUBLE)
        |    / 1000000e0 AS mean_left,
        |  CAST((2 * CAST(t1 - s1 AS BIGINT) * 10000 + (n - i))
        |    // (2 * (n - i)) AS DOUBLE) / 1000000e0 AS mean_right,
        |  ROUND(((CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)
        |    / CAST(n AS DOUBLE)) - sse) / 10000e0, 6) AS sse_drop
        |FROM best""".stripMargin,

    // q247: closed-form leave-one-out replicates from exact cent
    // totals; round-6 decimal replicate sums, micro-division mean
    "q247_jackknife_ratio" ->
      """WITH b AS (SELECT
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |tot AS (SELECT SUM(y) AS sy, SUM(x) AS sx, COUNT(*) AS n FROM b),
        |p1 AS (SELECT SUM(CAST(CASE WHEN sx - x <> 0 THEN
        |      ROUND(CAST(sy - y AS DOUBLE) /
        |        CAST(sx - x AS DOUBLE), 6) END AS DECIMAL(18,6))) AS sr,
        |    COUNT(CASE WHEN sx - x <> 0 THEN 1 END) AS m FROM b, tot),
        |mm AS (SELECT m, CASE WHEN m > 0 THEN
        |    CAST((2 * CAST(sr * 1000000 AS BIGINT) + m)
        |      // (2 * m) AS DOUBLE) / 1000000e0 END AS jm FROM p1),
        |p2 AS (SELECT SUM(CAST(ROUND(
        |    (CASE WHEN sx - x <> 0 THEN ROUND(CAST(sy - y AS DOUBLE) /
        |       CAST(sx - x AS DOUBLE), 6) END - jm) *
        |    (CASE WHEN sx - x <> 0 THEN ROUND(CAST(sy - y AS DOUBLE) /
        |       CAST(sx - x AS DOUBLE), 6) END - jm),
        |    6) AS DECIMAL(18,6))) AS sd FROM b, tot, mm)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN sx <> 0 THEN
        |    ROUND(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 6) END AS ratio,
        |  ROUND(jm, 6) AS jack_mean,
        |  CASE WHEN m > 0 THEN
        |    ROUND(sqrt((CAST(m AS DOUBLE) - 1e0) / CAST(m AS DOUBLE) *
        |      CAST(sd AS DOUBLE)), 6) END AS jack_se,
        |  ROUND((CAST(m AS DOUBLE) - 1e0) *
        |    (jm - CASE WHEN sx <> 0 THEN
        |       CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) END), 6) AS jack_bias
        |FROM tot, mm, p2""".stripMargin,

    // q248: Neyman weights in round-6 doubles over exact cent
    // moments; allocation integerized in exact HUGEINT micro units
    // with largest-remainder top-up
    "q248_neyman_allocation" ->
      """WITH b AS (SELECT o_orderpriority AS s,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
        |g AS (SELECT s, COUNT(*) AS ng,
        |    SUM(CAST(c AS DECIMAL(38,0))) AS s1,
        |    SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) AS s2
        |  FROM b GROUP BY 1),
        |w AS (SELECT s, ng,
        |    CASE WHEN ng > 1 AND CAST(ng AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0e0
        |      THEN ROUND(sqrt((CAST(ng AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
        |        (CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1e0))) / 100e0, 6)
        |      ELSE 0e0 END AS sh
        |  FROM g),
        |w2 AS (SELECT s, ng, sh, ROUND(CAST(ng AS DOUBLE) * sh, 6) AS wgt
        |  FROM w),
        |wt AS (SELECT SUM(CAST(wgt AS DECIMAL(28,6))) AS wtot FROM w2),
        |am AS (SELECT s, ng, sh, wgt,
        |    CASE WHEN wtot > 0 THEN
        |      CAST((CAST(1000 AS HUGEINT) * CAST(wgt * 1000000 AS HUGEINT)
        |        * 1000000) // CAST(wtot * 1000000 AS HUGEINT) AS BIGINT)
        |    ELSE 0 END AS amic
        |  FROM w2, wt),
        |fl AS (SELECT *, amic // 1000000 AS flr, amic % 1000000 AS rem
        |  FROM am),
        |used AS (SELECT SUM(flr) AS u FROM fl),
        |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, s ASC) AS r
        |  FROM fl)
        |SELECT s AS o_orderpriority, CAST(ng AS BIGINT) AS n_rows,
        |  sh AS s_h, wgt AS weight,
        |  CAST(flr + CASE WHEN r <= 1000 - u THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_alloc
        |FROM rk, used ORDER BY 1""".stripMargin,

    // q249: exact micro-unit deviations from the round-6 bracketed
    // medians; every wide decimal stays scale-0 (single correct
    // double rounding — the q231/q246 discipline)
    "q249_brown_forsythe" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 1000000 AS BIGINT)
        |      AS xm,
        |    CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
        |med AS (SELECT g, CAST(CAST(ROUND(quantile_cont(x, 0.5e0), 6)
        |    AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS mm
        |  FROM base GROUP BY 1),
        |z AS (SELECT base.g, ABS(xm - mm) AS zm
        |  FROM base JOIN med ON base.g = med.g),
        |byg AS (SELECT g, COUNT(*) AS ng,
        |    SUM(CAST(zm AS DECIMAL(38,0))) AS sg,
        |    SUM(CAST(zm AS DECIMAL(19,0)) * CAST(zm AS DECIMAL(19,0))) AS ssg
        |  FROM z GROUP BY 1),
        |agg AS (SELECT COUNT(*) AS k, SUM(ng) AS n,
        |    CAST(SUM(sg) AS DECIMAL(38,0)) AS s,
        |    CAST(SUM(ssg) AS DECIMAL(38,0)) AS ss,
        |    CAST(SUM(CAST((CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT) * 2
        |        + CAST(ng AS HUGEINT)) // (CAST(ng AS HUGEINT) * 2)
        |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS a2
        |  FROM byg),
        |fin AS (SELECT k, n,
        |    GREATEST(CAST(a2 AS HUGEINT) - (CAST(s AS HUGEINT)
        |        * CAST(s AS HUGEINT) * 2 + CAST(n AS HUGEINT))
        |      // (CAST(n AS HUGEINT) * 2), CAST(0 AS HUGEINT)) AS ssbi,
        |    GREATEST(CAST(ss AS HUGEINT) - CAST(a2 AS HUGEINT),
        |      CAST(0 AS HUGEINT)) AS sswi
        |  FROM agg)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |  CAST((ssbi * 2 + 1000000000000) // 2000000000000 AS BIGINT)
        |    AS ss_between,
        |  CAST((sswi * 2 + 1000000000000) // 2000000000000 AS BIGINT)
        |    AS ss_within,
        |  CASE WHEN k > 1 AND n > k AND sswi > 0
        |    THEN ROUND((CAST(ssbi AS DOUBLE) / (CAST(k AS DOUBLE) - 1e0)) /
        |      (CAST(sswi AS DOUBLE) / (CAST(n AS DOUBLE)
        |      - CAST(k AS DOUBLE))), 6)
        |    ELSE NULL END AS f
        |FROM fin""".stripMargin,

    // q250/q251/q253: driver-verified fixpoint contracts — empty.
    "q250_leading_eigen" ->
      """SELECT CAST(NULL AS VARCHAR) AS violation, CAST(NULL AS DOUBLE)
        |  AS value WHERE FALSE""".stripMargin,
    "q251_isotonic_calibration" ->
      """SELECT CAST(NULL AS VARCHAR) AS violation, CAST(NULL AS DOUBLE)
        |  AS detail WHERE FALSE""".stripMargin,
    "q253_kcore" ->
      """SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT)
        |  AS core_degree, CAST(NULL AS BIGINT) AS recount
        |  WHERE FALSE""".stripMargin,

    // q252: the q111 unrolled-iteration device, doubled for the two
    // mutually-recursive HITS vectors; contributions round-6 into
    // DECIMAL(28,6), totals cast double EXACTLY (≤ 2^53 micro)
    "q252_hits" -> {
      val iters = 5
      val head =
        """WITH e AS MATERIALIZED (
          |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
          |  FROM lineitem l
          |  JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  GROUP BY 1, 2),
          |h0 AS MATERIALIZED (SELECT n_nationkey AS id,
          |  ROUND(1.0e0 / (SELECT COUNT(*) FROM nation), 12) AS v
          |  FROM nation)""".stripMargin
      val its = (1 to iters).map { k =>
        s"""araw$k AS MATERIALIZED (SELECT e.dst AS id,
           |    SUM(CAST(ROUND(p.v * e.w, 6) AS DECIMAL(28,6))) AS raw
           |  FROM e JOIN h${k - 1} p ON e.src = p.id GROUP BY 1),
           |atot$k AS MATERIALIZED (SELECT CAST(SUM(raw) AS DECIMAL(38,6)) AS tot
           |  FROM araw$k),
           |a$k AS MATERIALIZED (SELECT n.n_nationkey AS id,
           |    CASE WHEN (SELECT tot FROM atot$k) > 0
           |      THEN ROUND(CAST(COALESCE(araw$k.raw, 0) AS DOUBLE) /
           |        CAST((SELECT tot FROM atot$k) AS DOUBLE), 12)
           |      ELSE ROUND(1.0e0 / (SELECT COUNT(*) FROM nation), 12)
           |    END AS v
           |  FROM nation n LEFT JOIN araw$k ON n.n_nationkey = araw$k.id),
           |hraw$k AS MATERIALIZED (SELECT e.src AS id,
           |    SUM(CAST(ROUND(p.v * e.w, 6) AS DECIMAL(28,6))) AS raw
           |  FROM e JOIN a$k p ON e.dst = p.id GROUP BY 1),
           |htot$k AS MATERIALIZED (SELECT CAST(SUM(raw) AS DECIMAL(38,6)) AS tot
           |  FROM hraw$k),
           |h$k AS MATERIALIZED (SELECT n.n_nationkey AS id,
           |    CASE WHEN (SELECT tot FROM htot$k) > 0
           |      THEN ROUND(CAST(COALESCE(hraw$k.raw, 0) AS DOUBLE) /
           |        CAST((SELECT tot FROM htot$k) AS DOUBLE), 12)
           |      ELSE ROUND(1.0e0 / (SELECT COUNT(*) FROM nation), 12)
           |    END AS v
           |  FROM nation n LEFT JOIN hraw$k ON n.n_nationkey = hraw$k.id)"""
          .stripMargin
      }
      (head +: its).mkString(",\n") +
        s"""
           |SELECT n.n_name AS nation, ROUND(h$iters.v, 6) AS hub,
           |  ROUND(a$iters.v, 6) AS authority
           |FROM nation n JOIN h$iters ON n.n_nationkey = h$iters.id
           |JOIN a$iters ON n.n_nationkey = a$iters.id
           |ORDER BY 1""".stripMargin
    },

    // q254: per-bin numerators |pos·10⁶ − Σconf_micro| are exact
    // integers; ECE/MCE via the half-up micro division device
    "q254_calibration_error" ->
      s"""WITH sc AS (SELECT
         |    ROUND(CAST(${sqlStopwordHits("text")} AS DOUBLE) /
         |      CAST(${sqlTokenCount("text")} AS DOUBLE), 6) AS s,
         |    (lang = 'en') AS y
         |  FROM documents),
         |mc AS (SELECT CAST(CAST(s AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS c, y
         |  FROM sc WHERE s IS NOT NULL AND y IS NOT NULL),
         |b AS (SELECT GREATEST(0, LEAST(9, (c * 10) // 1000001)) AS bin,
         |    COUNT(*) AS n, SUM(CAST(c AS DECIMAL(18,0))) AS sc2,
         |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos
         |  FROM mc GROUP BY 1),
         |e AS (SELECT n,
         |    CAST(ABS(CAST(pos AS DECIMAL(18,0)) * 1000000 - sc2) AS BIGINT)
         |      AS num
         |  FROM b),
         |agg AS (SELECT COUNT(*) AS bins_used, SUM(n) AS nn,
         |    CAST(SUM(CAST(num AS DECIMAL(38,0))) AS BIGINT) AS t,
         |    MAX((2 * num + n) // (2 * n)) AS mcem
         |  FROM e)
         |SELECT CAST(nn AS BIGINT) AS n, CAST(bins_used AS BIGINT)
         |    AS bins_used,
         |  CAST((2 * t + nn) // (2 * nn) AS DOUBLE) / 1000000e0 AS ece,
         |  CAST(mcem AS DOUBLE) / 1000000e0 AS mce
         |FROM agg""".stripMargin,

    // q255: exact integer sign/tie arithmetic over the bounded daily
    // table; continuity-corrected z
    "q255_mann_kendall" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |      * 100 AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |s AS (SELECT COALESCE(SUM(CASE WHEN b.c > a.c THEN 1
        |    WHEN b.c < a.c THEN -1 ELSE 0 END), 0) AS st
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |t AS (SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tt,
        |    CAST(SUM(t) AS BIGINT) AS n
        |  FROM (SELECT c, COUNT(*) AS t FROM daily GROUP BY 1))
        |SELECT CAST(n AS BIGINT) AS n_days, CAST(st AS BIGINT) AS s_stat,
        |  ROUND(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18e0, 6)
        |    AS var_s,
        |  CASE WHEN CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18e0
        |      > 0e0 AND st <> 0
        |    THEN ROUND((CAST(st AS DOUBLE) -
        |      CASE WHEN st > 0 THEN 1e0 ELSE -1e0 END) /
        |      sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18e0), 6)
        |    ELSE 0e0 END AS z,
        |  CASE WHEN st > 0 THEN 'increasing' WHEN st < 0 THEN 'decreasing'
        |    ELSE 'none' END AS trend
        |FROM s, t""".stripMargin,

    // q256: moment ladder in cents/scale-0 decimals; the diagnostic
    // trees replayed verbatim; top-20 by (round-6 D desc, id)
    "q256_ols_influence" ->
      """WITH b AS (SELECT l_orderkey * 8 + l_linenumber AS id,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |mom AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
        |  FROM b),
        |sca AS (SELECT n, sx, sxx,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
        |      CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS bb,
        |    (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) /
        |      CAST(n AS DOUBLE) AS aa,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
        |      CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sxxc
        |  FROM mom),
        |r AS (SELECT id, x, y,
        |    CAST(CAST(ROUND((CAST(y AS DOUBLE) - (aa + bb *
        |      CAST(x AS DOUBLE))) / 100e0, 6) AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT) AS rm,
        |    ROUND((CAST(y AS DOUBLE) - (aa + bb * CAST(x AS DOUBLE)))
        |      / 100e0, 6) AS rm6,
        |    1e0 / CAST(n AS DOUBLE) + ((CAST(x AS DOUBLE) - xbar) *
        |      (CAST(x AS DOUBLE) - xbar)) / sxxc AS lev,
        |    n FROM b, sca),
        |sse AS (SELECT SUM(CAST(rm AS DECIMAL(19,0)) *
        |    CAST(rm AS DECIMAL(19,0))) AS ss FROM r)
        |SELECT id, CAST(x AS DOUBLE) / 100e0 AS x,
        |  CAST(y AS DOUBLE) / 100e0 AS y,
        |  rm6 AS resid, ROUND(lev, 6) AS leverage,
        |  CASE WHEN CAST(ss AS DOUBLE) / 1e12 / (CAST(n AS DOUBLE) - 2e0)
        |      > 0e0 AND lev < 1e0
        |    THEN ROUND(rm6 * rm6 * lev / (2e0 * (CAST(ss AS DOUBLE) / 1e12 /
        |      (CAST(n AS DOUBLE) - 2e0)) * (1e0 - lev) * (1e0 - lev)), 6)
        |    ELSE 0e0 END AS cooks_d
        |FROM r, sse
        |ORDER BY cooks_d DESC, id LIMIT 20""".stripMargin,

    // q257: nine exact moments, three Pearson trees, one partial
    "q257_partial_correlation" ->
      """WITH b AS (SELECT
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS z
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(z) AS sz,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |    SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
        |    SUM(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))) AS szz,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))) AS sxz,
        |    SUM(CAST(y AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))) AS syz
        |  FROM b),
        |rr AS (SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
        |      CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) *
        |      CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
        |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) *
        |      CAST(sz AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) *
        |      CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) -
        |      CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
        |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) *
        |      CAST(sz AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) *
        |      CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) -
        |      CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n, ROUND(rxy, 6) AS r_xy,
        |  ROUND(rxz, 6) AS r_xz, ROUND(ryz, 6) AS r_yz,
        |  ROUND((rxy - rxz * ryz) / sqrt((1e0 - rxz * rxz) *
        |    (1e0 - ryz * ryz)), 6) AS r_xy_given_z
        |FROM rr""".stripMargin,

    // q258: weekday means via epoch-day arithmetic + half-up micro
    // division; both SS in scale-0 decimals
    "q258_seasonality_strength" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |      * 1000000 AS BIGINT) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |dw AS (SELECT day, m, (day - DATE '1970-01-01') % 7 AS dow
        |  FROM daily),
        |wk AS (SELECT dow, (2 * SUM(m) + COUNT(*)) // (2 * COUNT(*)) AS mw
        |  FROM dw GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n, SUM(m) AS s,
        |    SUM(CAST(m AS DECIMAL(19,0)) * CAST(m AS DECIMAL(19,0))) AS ss
        |  FROM daily),
        |res AS (SELECT SUM(CAST(m - mw AS DECIMAL(19,0)) *
        |    CAST(m - mw AS DECIMAL(19,0))) AS ssr
        |  FROM dw JOIN wk USING (dow))
        |SELECT CAST(n AS BIGINT) AS n_days,
        |  ROUND((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |    / CAST(n AS DOUBLE)) / 1e12, 6) AS sst,
        |  ROUND(CAST(ssr AS DOUBLE) / 1e12, 6) AS ssr,
        |  CASE WHEN CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
        |      CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0e0
        |    THEN ROUND(1e0 - CAST(ssr AS DOUBLE) / (CAST(ss AS DOUBLE) -
        |      CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |    ELSE NULL END AS strength
        |FROM res, tot""".stripMargin,

    // q259: the streaming top-k standings equal the batch window —
    // top-10 per type by (value cents DESC, event_id ASC)
    "q259_stream_topk" ->
      """WITH s AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |        DESC, event_id) AS rk
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL)
        |SELECT event_type, CAST(rk AS BIGINT) AS rank, event_id,
        |  c AS value_cents
        |FROM s WHERE rk <= 10 ORDER BY 1, 2""".stripMargin,

    // q260: every leave-one-out mean by subtraction from one group
    // table; means via half-up micro division, delta an exact integer
    // difference
    "q260_loo_impact" ->
      """WITH g AS (SELECT source,
        |    COUNT(*) AS ng,
        |    SUM(CAST(CAST(CAST(n_chars AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS DECIMAL(38,0))) AS sg
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(sg) AS DECIMAL(38,0)) AS s FROM g),
        |m AS (SELECT source, ng,
        |    CAST((2 * CAST(s AS HUGEINT) * 10000 + n) // (2 * n) AS BIGINT)
        |      AS mt,
        |    CASE WHEN n > ng THEN
        |      CAST((2 * CAST(s - sg AS HUGEINT) * 10000 + (n - ng))
        |        // (2 * (n - ng)) AS BIGINT) END AS mw
        |  FROM g, t)
        |SELECT source, CAST(ng AS BIGINT) AS n_rows,
        |  CAST(mt AS DOUBLE) / 1000000e0 AS mean_total,
        |  CAST(mw AS DOUBLE) / 1000000e0 AS mean_without,
        |  CAST(mw - mt AS DOUBLE) / 1000000e0 AS delta
        |FROM m ORDER BY 1""".stripMargin,

    // q261: q182's U chain closed with 2U/(n1·n2) − 1 and the Romano
    // magnitude bands
    "q261_cliffs_delta" ->
      """WITH base AS (SELECT value AS v, (event_type = 'purchase') AS a
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |vc AS (SELECT v, COUNT(*) AS c,
        |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca FROM base GROUP BY 1),
        |pre AS (SELECT v, c, ca, COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl
        |  FROM vc),
        |agg AS (SELECT
        |    SUM(CAST(ca AS DECIMAL(18,0)) *
        |      CAST(2 * cl + c + 1 AS DECIMAL(18,0))) AS two_r1,
        |    SUM(ca) AS n1, SUM(c - ca) AS n2
        |  FROM pre),
        |u AS (SELECT CAST(two_r1 - CAST(n1 AS DECIMAL(18,0)) *
        |      CAST(n1 + 1 AS DECIMAL(18,0)) AS DOUBLE) / 2e0 AS u1,
        |    n1, n2 FROM agg),
        |d AS (SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |    ROUND(2e0 * u1 / (CAST(n1 AS DOUBLE) * n2) - 1e0, 6) AS cd
        |  FROM u)
        |SELECT n1, n2, cd AS cliffs_delta,
        |  CASE WHEN ABS(cd) < 0.147e0 THEN 'negligible'
        |       WHEN ABS(cd) < 0.33e0 THEN 'small'
        |       WHEN ABS(cd) < 0.474e0 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,

    // q262: quantile_cont bounds (q106 parity), EXACT micro-integer
    // clamps, scale-0 moment ladder
    "q262_winsorized_corr" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS xd,
        |    CAST(l_extendedprice AS DOUBLE) AS yd,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 1000000 AS BIGINT)
        |      AS xm,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 1000000 AS BIGINT)
        |      AS ym
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |bnd AS (SELECT
        |    CAST(CAST(ROUND(quantile_cont(xd, 0.05e0), 6) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS lx,
        |    CAST(CAST(ROUND(quantile_cont(xd, 0.95e0), 6) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS hx,
        |    CAST(CAST(ROUND(quantile_cont(yd, 0.05e0), 6) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS ly,
        |    CAST(CAST(ROUND(quantile_cont(yd, 0.95e0), 6) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS hy
        |  FROM base),
        |cl AS (SELECT GREATEST(lx, LEAST(hx, xm)) AS x,
        |    GREATEST(ly, LEAST(hy, ym)) AS y, lx, hx, ly, hy
        |  FROM base, bnd),
        |m AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |    SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
        |    ANY_VALUE(lx) AS lx, ANY_VALUE(hx) AS hx,
        |    ANY_VALUE(ly) AS ly, ANY_VALUE(hy) AS hy
        |  FROM cl)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(lx AS DOUBLE) / 1000000e0 AS x_lo,
        |  CAST(hx AS DOUBLE) / 1000000e0 AS x_hi,
        |  CAST(ly AS DOUBLE) / 1000000e0 AS y_lo,
        |  CAST(hy AS DOUBLE) / 1000000e0 AS y_hi,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0e0 AND
        |      CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0e0
        |    THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |        (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    ELSE NULL END AS winsorized_r
        |FROM m""".stripMargin,

    // q263: four exact counts, micro-division rates, one z tree
    "q263_two_proportion" ->
      """WITH c AS (SELECT
        |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN l_returnflag = 'R' AND l_discount > 0.05e0
        |      THEN 1 ELSE 0 END) AS x1,
        |    SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS n2,
        |    SUM(CASE WHEN l_returnflag <> 'R' AND l_discount > 0.05e0
        |      THEN 1 ELSE 0 END) AS x2
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
        |  CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
        |  CASE WHEN n1 > 0 THEN
        |    CAST((2 * x1 * 1000000 + n1) // (2 * n1) AS DOUBLE) / 1000000e0
        |    END AS p1,
        |  CASE WHEN n2 > 0 THEN
        |    CAST((2 * x2 * 1000000 + n2) // (2 * n2) AS DOUBLE) / 1000000e0
        |    END AS p2,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND
        |      (CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE)) /
        |      (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) > 0e0 AND
        |      (CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE)) /
        |      (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) < 1e0
        |    THEN ROUND((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
        |      CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |      sqrt(((CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE)) /
        |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
        |        (1e0 - (CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE)) /
        |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
        |        (1e0 / CAST(n1 AS DOUBLE) + 1e0 / CAST(n2 AS DOUBLE))), 6)
        |    END AS z
        |FROM c""".stripMargin,

    // q264: q183's JSD chain with day as the "source" and the event
    // type as a one-token document
    "q264_daily_mix_anomaly" ->
      """WITH tok AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS source,
        |    event_type AS w
        |  FROM events WHERE event_type IS NOT NULL AND event_type <> ''),
        |sw AS (SELECT source, w, COUNT(*) AS cs FROM tok GROUP BY 1, 2),
        |st AS (SELECT source, SUM(cs) AS ts FROM sw GROUP BY 1),
        |cw AS (SELECT w, SUM(cs) AS cc FROM sw GROUP BY 1),
        |ct AS (SELECT SUM(cs) AS tc FROM sw),
        |grid AS (SELECT st.source, cw.w, COALESCE(sw.cs, 0) AS cs,
        |    st.ts, cw.cc, ct.tc
        |  FROM st CROSS JOIN cw
        |  LEFT JOIN sw ON sw.source = st.source AND sw.w = cw.w
        |  CROSS JOIN ct),
        |pq AS (SELECT source,
        |    CAST(cs AS DOUBLE) / CAST(ts AS DOUBLE) AS p,
        |    CASE WHEN CAST(tc AS DOUBLE) > CAST(ts AS DOUBLE)
        |      THEN (CAST(cc AS DOUBLE) - CAST(cs AS DOUBLE)) /
        |        (CAST(tc AS DOUBLE) - CAST(ts AS DOUBLE))
        |      ELSE 0e0 END AS q
        |  FROM grid),
        |term AS (SELECT source,
        |    CAST(ROUND(CASE WHEN p > 0e0
        |      THEN p * LN(p / ((p + q) / 2e0)) ELSE 0e0 END, 6)
        |      AS DECIMAL(18,6)) AS tp,
        |    CAST(ROUND(CASE WHEN q > 0e0
        |      THEN q * LN(q / ((p + q) / 2e0)) ELSE 0e0 END, 6)
        |      AS DECIMAL(18,6)) AS tq
        |  FROM pq),
        |j AS (SELECT source,
        |    ROUND(CAST(SUM(tp) + SUM(tq) AS DOUBLE) / 2e0, 6) AS jsd
        |  FROM term GROUP BY 1)
        |SELECT source AS day, jsd FROM j
        |ORDER BY jsd DESC, day LIMIT 10""".stripMargin,

    // q265: the audited skew-guard counters are plain aggregates of
    // the block-size table; candidate pairs re-derived by the q150
    // self-join restricted to under-cap blocks
    "q265_er_block_audit" ->
      """WITH b AS (SELECT p_brand, COUNT(*) AS n FROM part GROUP BY 1),
        |ok AS (SELECT p_brand FROM b WHERE n BETWEEN 2 AND 80),
        |p AS (SELECT COUNT(*) AS np
        |  FROM part a JOIN part b2 ON a.p_brand = b2.p_brand
        |    AND a.p_partkey < b2.p_partkey
        |  JOIN ok ON ok.p_brand = a.p_brand
        |  WHERE levenshtein(a.p_name, b2.p_name) <= 5)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM b WHERE n BETWEEN 2 AND 80)
        |    AS BIGINT) AS n_blocks,
        |  CAST((SELECT COUNT(*) FROM b WHERE n > 80)
        |    AS BIGINT) AS dropped_blocks,
        |  CAST((SELECT COALESCE(SUM(n), 0) FROM b WHERE n > 80)
        |    AS BIGINT) AS dropped_rows,
        |  CAST((SELECT np FROM p) AS BIGINT) AS n_pairs""".stripMargin,

    // q266: q216's micro-unit band device; raw/reliability numerators
    // exact HUGEINT squares, resolution via the cross form
    // P_k·N − P·n_k, per-bin terms round-6 DECIMAL(18,6)
    "q266_brier_decomposition" ->
      s"""WITH sc AS (SELECT
         |    ROUND(CAST(${sqlStopwordHits("text")} AS DOUBLE) /
         |      CAST(${sqlTokenCount("text")} AS DOUBLE), 6) AS s,
         |    (lang = 'en') AS y
         |  FROM documents),
         |mc AS (SELECT CAST(CAST(s AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS c,
         |    CASE WHEN y THEN 1 ELSE 0 END AS yy
         |  FROM sc WHERE s IS NOT NULL AND y IS NOT NULL),
         |b AS (SELECT GREATEST(0, LEAST(9, (c * 10) // 1000001)) AS bin, COUNT(*) AS n,
         |    SUM(CAST(c AS DECIMAL(18,0))) AS sc2,
         |    SUM(yy) AS pos,
         |    SUM(CAST(c - yy * 1000000 AS HUGEINT) *
         |        CAST(c - yy * 1000000 AS HUGEINT)) AS raw
         |  FROM mc GROUP BY 1),
         |t AS (SELECT SUM(n) AS nn, SUM(pos) AS pp, SUM(raw) AS rawsum
         |  FROM b),
         |terms AS (SELECT
         |    CAST(ROUND(CAST(
         |      (CAST(sc2 AS HUGEINT) - CAST(pos AS HUGEINT) * 1000000) *
         |      (CAST(sc2 AS HUGEINT) - CAST(pos AS HUGEINT) * 1000000)
         |      AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6)
         |      AS DECIMAL(18,6)) AS rel,
         |    CAST(ROUND(CAST(
         |      (CAST(pos AS HUGEINT) * nn - CAST(pp AS HUGEINT) * n) *
         |      (CAST(pos AS HUGEINT) * nn - CAST(pp AS HUGEINT) * n)
         |      AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE) *
         |        CAST(nn AS DOUBLE)), 6) AS DECIMAL(18,6)) AS res
         |  FROM b CROSS JOIN t),
         |agg AS (SELECT CAST(nn AS BIGINT) AS n,
         |    ROUND(CAST(rawsum AS DOUBLE) /
         |      (CAST(nn AS DOUBLE) * 1e12), 6) AS brier,
         |    ROUND(CAST(SUM(rel) AS DOUBLE) / CAST(nn AS DOUBLE), 6)
         |      AS reliability,
         |    ROUND(CAST(SUM(res) AS DOUBLE) / CAST(nn AS DOUBLE), 6)
         |      AS resolution,
         |    ROUND((CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) *
         |      (1e0 - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)), 6)
         |      AS uncertainty
         |  FROM terms CROSS JOIN t GROUP BY nn, pp, rawsum)
         |SELECT n, brier, reliability, resolution, uncertainty,
         |  ROUND(reliability - resolution + uncertainty, 6)
         |    AS brier_binned
         |FROM agg""".stripMargin,

    // q267: the Pascal triangle is SHARED Scala data rendered into a
    // VALUES list (the blocklist-keywords convention); every p-value
    // and BH decision is exact integer arithmetic on both engines
    "q267_sign_trend_bh" ->
      s"""WITH daily AS (SELECT event_type AS g,
         |    CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
         |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |mx AS (SELECT MAX(day) AS maxd FROM daily),
         |recent AS (SELECT g, day, c FROM daily CROSS JOIN mx
         |  WHERE maxd - day < 28),
         |lagd AS (SELECT g, c,
         |    LAG(c) OVER (PARTITION BY g ORDER BY day) AS prev
         |  FROM recent),
         |st AS (SELECT g, COUNT(*) AS n,
         |    SUM(CASE WHEN c > prev THEN 1 ELSE 0 END) AS x
         |  FROM lagd WHERE prev IS NOT NULL AND c <> prev GROUP BY 1),
         |bt(bn, bk, bc, p2) AS (VALUES $binomValues),
         |tails AS (SELECT g, n, x, SUM(bc) AS num, MAX(p2) AS pow2
         |  FROM st JOIN bt ON n = bn AND bk >= x GROUP BY 1, 2, 3),
         |rk AS (SELECT g, n, x, num, pow2,
         |    COUNT(*) OVER () AS m,
         |    ROW_NUMBER() OVER (ORDER BY
         |      CAST(num AS DOUBLE) / CAST(pow2 AS DOUBLE), g) AS i
         |  FROM tails),
         |fin AS (SELECT *, MAX(CASE WHEN num * 20 * m <= pow2 * 1 * i
         |      THEN i ELSE 0 END) OVER () AS istar
         |  FROM rk)
         |SELECT g AS event_type, CAST(n AS BIGINT) AS n_days,
         |  CAST(x AS BIGINT) AS ups,
         |  CAST(num AS DOUBLE) / CAST(pow2 AS DOUBLE) AS p_value,
         |  CAST(i AS BIGINT) AS bh_rank, (i <= istar) AS rejected
         |FROM fin ORDER BY bh_rank""".stripMargin,

    // q268: the compiled explode is DuckDB's UNNEST; split on single
    // spaces keeps empty runs in BOTH engines (consecutive separators
    // → empty-string tokens, '' → one empty token)
    "q268_jq_fanout" ->
      """SELECT doc_id AS id, UNNEST(string_split(text, ' ')) AS tok
        |FROM documents WHERE doc_id % 97 = 0""".stripMargin,

    // q269: q166's LN ladder per dim over the q232 explode-by-range
    // device; bucket arithmetic all-integer in shifted micro units
    "q269_dim_drift" ->
      """WITH e AS (SELECT (label < 5) AS r, list_transform(embedding,
        |      x -> CAST(CAST(ROUND(CAST(x AS DOUBLE), 6)
        |        AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS m
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND label IS NOT NULL AND len(embedding) = 64),
        |cells AS (SELECT i AS dim,
        |    GREATEST(0, LEAST(7,
        |      ((m[CAST(i + 1 AS INT)] + 1000000) * 8) // 2000001)) AS b,
        |    SUM(CASE WHEN r THEN 1 ELSE 0 END) AS cr,
        |    SUM(CASE WHEN NOT r THEN 1 ELSE 0 END) AS cc
        |  FROM e, UNNEST(range(0, 64)) AS t(i) GROUP BY 1, 2),
        |tot AS (SELECT dim, SUM(cr) AS nr, SUM(cc) AS nc,
        |    COUNT(*) AS nb
        |  FROM cells GROUP BY 1),
        |t AS (SELECT c.dim, nr, nc, nb,
        |    CAST(ROUND((CAST(cr + 1 AS DOUBLE) / CAST(nr + nb AS DOUBLE)
        |        - CAST(cc + 1 AS DOUBLE) / CAST(nc + nb AS DOUBLE))
        |      * LN((CAST(cr + 1 AS DOUBLE) / CAST(nr + nb AS DOUBLE))
        |          / (CAST(cc + 1 AS DOUBLE) / CAST(nc + nb AS DOUBLE))), 6)
        |      AS DECIMAL(18,6)) AS term
        |  FROM cells c JOIN tot ON c.dim = tot.dim),
        |j AS (SELECT dim, nr, nc, nb,
        |    ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi
        |  FROM t GROUP BY 1, 2, 3, 4)
        |SELECT CAST(dim AS BIGINT) AS dim, CAST(nr AS BIGINT) AS n_ref,
        |  CAST(nc AS BIGINT) AS n_cur, CAST(nb AS BIGINT) AS n_buckets,
        |  psi
        |FROM j ORDER BY psi DESC, dim LIMIT 10""".stripMargin,

    // q270: quantile_cont + round-6 matches Percentiles.exact (the
    // q106 interpolation device); lifts subtract in DECIMAL(18,6)
    "q270_quantile_lift" ->
      """WITH c AS (SELECT c_mktsegment AS arm, CAST(c_acctbal AS DOUBLE)
        |    AS v FROM customer WHERE c_acctbal IS NOT NULL),
        |q AS (
        |  SELECT arm, 0.25e0 AS fraction,
        |    CAST(ROUND(quantile_cont(v, 0.25e0), 6) AS DECIMAL(18,6)) AS p6
        |  FROM c GROUP BY arm
        |  UNION ALL SELECT arm, 0.5e0,
        |    CAST(ROUND(quantile_cont(v, 0.5e0), 6) AS DECIMAL(18,6))
        |  FROM c GROUP BY arm
        |  UNION ALL SELECT arm, 0.75e0,
        |    CAST(ROUND(quantile_cont(v, 0.75e0), 6) AS DECIMAL(18,6))
        |  FROM c GROUP BY arm
        |  UNION ALL SELECT arm, 0.9e0,
        |    CAST(ROUND(quantile_cont(v, 0.9e0), 6) AS DECIMAL(18,6))
        |  FROM c GROUP BY arm),
        |b AS (SELECT fraction, p6 AS b6 FROM q WHERE arm = 'BUILDING')
        |SELECT q.arm AS arm, q.fraction AS fraction,
        |  CAST(b6 AS DOUBLE) AS base_pct, CAST(p6 AS DOUBLE) AS arm_pct,
        |  CAST(p6 - b6 AS DOUBLE) AS lift
        |FROM q JOIN b ON q.fraction = b.fraction
        |WHERE q.arm <> 'BUILDING'
        |ORDER BY arm, fraction""".stripMargin,

    // q271: per-term squared casts mirror the operator (the q249
    // overflow class); ess/deff are half-up HUGEINT divisions in
    // micro units (the q235/q249 device — round(double,6) on ratios
    // of exact decimals flipped between engine builds, round 12)
    "q271_effective_sample_size" ->
      """WITH g AS (SELECT source, COUNT(*) AS n,
        |    CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw,
        |    CAST(SUM(CAST(CAST(n_chars AS DECIMAL(19,0)) *
        |        CAST(n_chars AS DECIMAL(19,0)) AS DECIMAL(38,0)))
        |      AS DECIMAL(38,0)) AS sw2
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0 GROUP BY 1),
        |h AS (SELECT source, n, sw,
        |    (2 * CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) * 1000000
        |       + CAST(sw2 AS HUGEINT))
        |      // (2 * CAST(sw2 AS HUGEINT)) AS ess_micro,
        |    (2 * CAST(n AS HUGEINT) * CAST(sw2 AS HUGEINT) * 1000000
        |       + CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT))
        |      // (2 * CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT))
        |      AS deff_micro
        |  FROM g)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CAST(sw AS BIGINT) AS sum_w,
        |  CAST(ess_micro AS DOUBLE) / 1e6 AS ess,
        |  CAST(deff_micro AS DOUBLE) / 1e6 AS deff
        |FROM h ORDER BY source""".stripMargin,

    // q272: the q71 keep predicate verbatim + the Wilson composition
    // with the SAME association as Eval.wilsonRate; z/z² interpolated
    // from the shared Scala constants
    "q272_wilson_gate_rate" ->
      s"""WITH sig AS (
        |  SELECT source,
        |    (CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
        |        AS BIGINT) >= 5
        |     AND ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '\\s', '', 'g'))
        |         AS DOUBLE) /
        |       (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 6)
        |       BETWEEN 3.0 AND 10.0
        |     AND CAST(LIST_MAX(LIST_TRANSFORM(
        |         string_split_regex(TRIM(text), '\\s+'),
        |         w -> LENGTH(w))) AS BIGINT) <= 30
        |     AND NOT (text LIKE '%{%' OR text LIKE '%}%')
        |     AND NOT (LOWER(text) LIKE '%lorem ipsum%')) AS keep
        |  FROM documents),
        |g AS (SELECT source, COUNT(*) AS n,
        |    SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS passes
        |  FROM sig GROUP BY 1),
        |d AS (SELECT source, n, passes,
        |    CAST(passes AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |    CAST(n AS DOUBLE) AS nd FROM g)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CAST(passes AS BIGINT) AS passes,
        |  ROUND(p, 6) AS rate,
        |  ROUND((p + ${wilsonZ * wilsonZ}e0 / (2e0 * nd)) /
        |      (1e0 + ${wilsonZ * wilsonZ}e0 / nd) -
        |    ${wilsonZ}e0 * SQRT(p * (1e0 - p) / nd +
        |      ${wilsonZ * wilsonZ}e0 / (4e0 * nd * nd)) /
        |      (1e0 + ${wilsonZ * wilsonZ}e0 / nd), 6) AS wilson_lo,
        |  ROUND((p + ${wilsonZ * wilsonZ}e0 / (2e0 * nd)) /
        |      (1e0 + ${wilsonZ * wilsonZ}e0 / nd) +
        |    ${wilsonZ}e0 * SQRT(p * (1e0 - p) / nd +
        |      ${wilsonZ * wilsonZ}e0 / (4e0 * nd * nd)) /
        |      (1e0 + ${wilsonZ * wilsonZ}e0 / nd), 6) AS wilson_hi
        |FROM d ORDER BY source""".stripMargin,

    // q273: integer grid cells (float→double widening exact, one
    // correctly-rounded division, exact floor) + 3×3 neighbor join on
    // the CELL table — everything after the count is integral
    "q273_grid_core_cells" ->
      """WITH pts AS (SELECT
        |    CAST(FLOOR(CAST(embedding[1] AS DOUBLE) / 0.05e0) AS BIGINT)
        |      AS cx,
        |    CAST(FLOOR(CAST(embedding[2] AS DOUBLE) / 0.05e0) AS BIGINT)
        |      AS cy
        |  FROM embeddings),
        |cells AS (SELECT cx, cy, COUNT(*) AS n_pts FROM pts GROUP BY 1, 2),
        |dens AS (SELECT a.cx, a.cy, a.n_pts, SUM(b.n_pts) AS density
        |  FROM cells a JOIN cells b
        |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
        |   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
        |  GROUP BY 1, 2, 3)
        |SELECT cx, cy, CAST(n_pts AS BIGINT) AS n_pts,
        |  CAST(density AS BIGINT) AS density, density >= 25 AS core
        |FROM dens ORDER BY cx, cy""".stripMargin,

    // q274: q192's round-6 decimal centroids assembled into lists; the
    // q75 list_inner_product cosine composition; round-6 decimal-mean
    // thresholds; ROW_NUMBER (c DESC, cls) re-derives the struct-max
    "q274_label_noise_matrix" ->
      """WITH ex AS (SELECT label, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)
        |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
        |cen AS (SELECT label AS cls, d,
        |    ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(*), 6) AS c
        |  FROM ex GROUP BY 1, 2),
        |cl AS (SELECT cls, list(c ORDER BY d) AS cv FROM cen GROUP BY 1),
        |e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
        |cs AS (SELECT e.vec_id, e.label, cl.cls,
        |    ROUND(list_inner_product(v, cv) /
        |      (SQRT(list_inner_product(v, v)) *
        |       SQRT(list_inner_product(cv, cv))), 6) AS c
        |  FROM e CROSS JOIN cl),
        |th AS (SELECT cls,
        |    ROUND(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(*), 6) AS t
        |  FROM cs WHERE label = cls GROUP BY 1),
        |conf AS (SELECT cs.vec_id, cs.label, cs.cls,
        |    ROW_NUMBER() OVER (PARTITION BY cs.vec_id
        |      ORDER BY cs.c DESC, cs.cls) AS rn
        |  FROM cs JOIN th ON cs.cls = th.cls WHERE cs.c >= th.t)
        |SELECT label AS given_label, CAST(cls AS BIGINT) AS assigned_label,
        |  COUNT(*) AS n
        |FROM conf WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q275: cumulative token mass over (count DESC, term) order; the
    // threshold cut is pure 64-bit integer arithmetic
    "q275_vocab_coverage" ->
      """WITH toks AS (SELECT UNNEST(string_split_regex(trim(text),
        |    '\s+')) AS term FROM documents),
        |tf AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
        |cum AS (SELECT c, SUM(c) OVER (ORDER BY c DESC, term
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cov
        |  FROM tf),
        |tot AS (SELECT SUM(c) AS total FROM tf)
        |SELECT t.p AS threshold_pct,
        |  CAST(SUM(CASE WHEN cov * 100 < t.p * total THEN 1 ELSE 0 END)
        |    + 1 AS BIGINT) AS vocab_size,
        |  CAST(MIN(CASE WHEN cov * 100 >= t.p * total THEN cov END)
        |    AS BIGINT) AS tokens_covered
        |FROM cum, tot, (VALUES (50), (90), (95), (99)) AS t(p)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q276: quantile_cont round-6 quartiles (q106 device) subtract in
    // DECIMAL; the cube root is the exact integer max k: k³ ≤ n
    "q276_fd_histogram" ->
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |q AS (SELECT CAST(CAST(ROUND(quantile_cont(v, 0.75e0), 6)
        |      AS DECIMAL(18,6)) -
        |    CAST(ROUND(quantile_cont(v, 0.25e0), 6) AS DECIMAL(18,6))
        |    AS DOUBLE) AS iqr FROM b),
        |s AS (SELECT COUNT(*) AS n, MIN(v) AS mn FROM b),
        |k AS (SELECT MAX(i) AS k FROM range(1, 100001) AS t(i), s
        |  WHERE i * i * i <= s.n),
        |w AS (SELECT 2e0 * iqr / CAST(k AS DOUBLE) AS w, mn
        |  FROM q, s, k)
        |SELECT CAST(FLOOR((v - mn) / w) AS BIGINT) AS bin,
        |  COUNT(*) AS n,
        |  mn + CAST(FLOOR((v - mn) / w) AS DOUBLE) * w AS bin_lo
        |FROM b, w WHERE w > 0e0 GROUP BY 1, 3 ORDER BY 1""".stripMargin,

    // q277: the q215 micro-score device + window rank/cumsum over the
    // (score DESC, id) order; precision terms round-6 → DECIMAL sum
    "q277_average_precision" ->
      s"""WITH sc AS (SELECT doc_id,
        |    ROUND(CAST(${sqlStopwordHits("text")} AS DOUBLE) /
        |      CAST(${sqlTokenCount("text")} AS DOUBLE), 6) AS s,
        |    (lang = 'en') AS y
        |  FROM documents),
        |mc AS (SELECT doc_id,
        |    CAST(CAST(s AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS m, y
        |  FROM sc WHERE s IS NOT NULL AND y IS NOT NULL),
        |r AS (SELECT y,
        |    ROW_NUMBER() OVER (ORDER BY m DESC, doc_id) AS k,
        |    SUM(CASE WHEN y THEN 1 ELSE 0 END)
        |      OVER (ORDER BY m DESC, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM mc)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  ROUND(CAST(SUM(CASE WHEN y THEN
        |      CAST(ROUND(CAST(cum AS DOUBLE) / CAST(k AS DOUBLE), 6)
        |        AS DECIMAL(18,6)) END) AS DOUBLE) /
        |    CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE), 6) AS ap
        |FROM r""".stripMargin,

    // q278: q75's cosine composition; the best same-label neighbor via
    // ROW_NUMBER (c DESC, id) re-derives the struct-max; rank = 1 +
    // strictly-above count under the same lexicographic order
    "q278_first_relevant_rank" ->
      """WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |    CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
        |a AS (SELECT vec_id AS aid, label AS alab, v AS av FROM e
        |  WHERE vec_id % 100 = 0),
        |p AS (SELECT a.aid, a.alab, b.vec_id AS bid, b.label AS blab,
        |    ROUND(list_inner_product(b.v, av) /
        |      (SQRT(list_inner_product(b.v, b.v)) *
        |       SQRT(list_inner_product(av, av))), 6) AS c
        |  FROM a JOIN e b ON b.vec_id <> a.aid),
        |best AS (SELECT aid, c AS bc, bid AS bbid FROM (
        |    SELECT aid, c, bid, ROW_NUMBER() OVER (PARTITION BY aid
        |      ORDER BY c DESC, bid) AS rn
        |    FROM p WHERE blab = alab) WHERE rn = 1),
        |above AS (SELECT p.aid, COUNT(*) AS cnt
        |  FROM p JOIN best ON p.aid = best.aid
        |  WHERE p.c > bc OR (p.c = bc AND p.bid < bbid)
        |  GROUP BY 1)
        |SELECT best.aid AS anchor_id,
        |  CAST(COALESCE(cnt, 0) + 1 AS BIGINT) AS first_rank,
        |  ROUND(1e0 / CAST(COALESCE(cnt, 0) + 1 AS DOUBLE), 6) AS rr
        |FROM best LEFT JOIN above ON best.aid = above.aid
        |ORDER BY anchor_id""".stripMargin)

  /** DuckDB twin of [[graft.ops.Parity.round6Ratio]]: engine-proof
    * `round(num/den, 6)` as half-up HUGEINT division in micro units
    * (`//` truncates — exact floor for the non-negative operands
    * these call sites guarantee). `num`/`den` must be integral
    * expressions; pre-scale fractional decimals to micro with
    * [[huMicro]] and pass `scaled = true`.
    */
  private def huRatio6(num: String, den: String,
      scaled: Boolean = false): String = {
    val nm = if (scaled) s"CAST($num AS HUGEINT)"
      else s"CAST($num AS HUGEINT) * 1000000"
    s"CAST((2 * $nm + CAST($den AS HUGEINT)) // " +
      s"(2 * CAST($den AS HUGEINT)) AS DOUBLE) / 1e6"
  }

  /** Micro-scale a fractional DECIMAL expression (scale ≤ 6) to an
    * exact HUGEINT for [[huRatio6]]'s `scaled` numerator. */
  private def huMicro(num: String): String =
    s"CAST($num * 1000000 AS HUGEINT)"

  /** The q198 oracle: one q181-shaped χ² CTE block per contingency
    * pair (suffixed so the three WITH chains coexist), each closed
    * with the Cramér's V normalization and UNION ALL'd.
    */
  private def cramersVSql(pairs: Seq[(String, String, String, String)])
      : String = {
    val blocks = pairs.zipWithIndex.map { case ((_, tbl, r, c), i) =>
      val x = i + 1
      s"""obs$x AS (SELECT $r AS r, $c AS c, COUNT(*) AS o
         |  FROM $tbl
         |  WHERE $r IS NOT NULL AND $c IS NOT NULL GROUP BY 1, 2),
         |rts$x AS (SELECT r, SUM(o) AS rt FROM obs$x GROUP BY 1),
         |cts$x AS (SELECT c, SUM(o) AS ct FROM obs$x GROUP BY 1),
         |cells$x AS (SELECT r, c, rt, ct, COALESCE(o, 0) AS o
         |  FROM rts$x CROSS JOIN cts$x LEFT JOIN obs$x USING (r, c)),
         |tot$x AS (SELECT SUM(o) AS n, COUNT(DISTINCT r) AS nr,
         |    COUNT(DISTINCT c) AS nc FROM obs$x),
         |term$x AS (SELECT CAST(ROUND(
         |      (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n) *
         |      (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n) /
         |      (CAST(rt AS DOUBLE) * ct / n), 6) AS DECIMAL(18,6)) AS t,
         |    nr, nc, n
         |  FROM cells$x CROSS JOIN tot$x),
         |chi$x AS (SELECT ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2,
         |    CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof, nr, nc,
         |    CAST(n AS BIGINT) AS n
         |  FROM term$x GROUP BY nr, nc, n)""".stripMargin
    }
    val selects = pairs.zipWithIndex.map { case ((pair, _, _, _), i) =>
      val x = i + 1
      s"""SELECT '$pair' AS pair, chi2, dof, n,
         |  CASE WHEN n > 0 AND LEAST(nr, nc) > 1 THEN
         |    ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * (LEAST(nr, nc) - 1))), 6)
         |  END AS v
         |FROM chi$x""".stripMargin
    }
    "WITH " + blocks.mkString(",\n") + "\n" +
      selects.mkString("\nUNION ALL\n") + "\nORDER BY 1"
  }

  /** The q177 oracle: the MMR greedy unrolled as k SQL stages (the
    * q109 BPE-chain device) — step 1 is the relevance argmax, step i
    * re-scores the remaining pool as `0.5·rel − 0.5·max(sim to the
    * selected set)` and takes the (score DESC, vec_id) head.
    */
  private def mmrChainSql(k: Int, pool: Int): String = {
    val cosOf = (a: String, b: String) =>
      s"ROUND(list_inner_product($a, $b) / (SQRT(list_inner_product($a, $a))" +
        s" * SQRT(list_inner_product($b, $b))), 6)"
    val head =
      s"""WITH base AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |q AS (SELECT v AS qv FROM base WHERE vec_id = 0),
         |scored AS (SELECT vec_id, ${cosOf("v", "qv")} AS rel, v
         |  FROM base, q),
         |cand AS (SELECT * FROM scored ORDER BY rel DESC, vec_id LIMIT $pool),
         |sims AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    ${cosOf("a.v", "b.v")} AS sim
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |s1 AS (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
         |sel1 AS (SELECT vec_id FROM s1)""".stripMargin
    val stages = (2 to k).map { i =>
      s"""p$i AS (SELECT c.vec_id, c.rel,
         |    0.5e0 * c.rel - 0.5e0 * MAX(s.sim) AS score
         |  FROM cand c JOIN sims s ON s.ia = c.vec_id
         |    AND s.ib IN (SELECT vec_id FROM sel${i - 1})
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
         |  GROUP BY 1, 2),
         |s$i AS (SELECT vec_id, rel FROM p$i ORDER BY score DESC, vec_id LIMIT 1),
         |sel$i AS (SELECT vec_id FROM sel${i - 1}
         |  UNION ALL SELECT vec_id FROM s$i)""".stripMargin
    }
    val tail = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS step, vec_id, rel FROM s$i")
      .mkString("", "\nUNION ALL\n", "\nORDER BY step")
    (Seq(head) ++ stages).mkString(",\n") + "\n" + tail
  }

  /** The shared BPE WITH-chain: vocab → double-space encoding → per
    * merge k: pair count (p_k), argmax merge (m_k), replay (w_k). The
    * replay uses scalar subqueries + COALESCE so an exhausted merge
    * stage (no pairs left) passes strings through unchanged, matching
    * the learner's early stop.
    */
  private def bpeChainSql(iters: Int): String = {
    val head =
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |vocab AS (SELECT w, COUNT(*) AS freq
        |  FROM toks, UNNEST(ws) AS t(w) GROUP BY 1),
        |w0 AS (SELECT w, freq,
        |  '  ' || array_to_string(list_transform(range(1, len(w)+1),
        |    i -> substr(w, i, 1)), '  ') || '  ' AS s FROM vocab)""".stripMargin
    val stages = (1 to iters).flatMap { i =>
      val prev = s"w${i - 1}"
      val pm =
        s"""p$i AS (SELECT ws[i] AS l, ws[i+1] AS r, SUM(freq) AS c FROM (
           |    SELECT freq, string_split_regex(trim(s), ' +') AS ws FROM $prev) q,
           |  UNNEST(range(1, len(ws))) AS t(i) GROUP BY 1, 2),
           |m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1)""".stripMargin
      val w =
        s"""w$i AS (SELECT w, freq, coalesce(REPLACE(s,
           |    (SELECT ' ' || l || '  ' || r || ' ' FROM m$i),
           |    (SELECT ' ' || l || r || ' ' FROM m$i)), s) AS s FROM $prev)""".stripMargin
      Seq(pm, w)
    }
    (head +: stages).mkString(",\n")
  }
}
