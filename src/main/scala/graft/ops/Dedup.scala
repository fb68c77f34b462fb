package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for
  * 100 TB inputs:
  *
  *  - exact: one hash-shuffle on a 16-byte digest (not the full text);
  *  - MinHash + LSH: shingle → minhash signature (map-only) → band
  *    buckets (one shuffle on small keys) → candidate pairs within
  *    buckets; never an all-pairs product;
  *  - SimHash: map-only 64-bit signature; near-dup = same signature or
  *    banded Hamming buckets;
  *  - n-gram Jaccard: exact verification for candidate pairs (used after
  *    LSH at scale; standalone it prunes frequent shingles first).
  *
  * All signature computation is Catalyst expressions (xxhash64 + array
  * higher-order functions) — no UDFs, whole-stage codegen end-to-end.
  */
object Dedup {

  /** `collect_list` bounded at `cap + 1` buffer elements
    * ([[graft.functions.BoundedCollectList]]) — every bucket path
    * below groups ids by a fingerprint/band/gram key and then DROPS
    * (LSH/winnow/gram buckets) or RAISES on (prefix-filter) buckets
    * larger than its cap, so collecting a hot key's full id list
    * first was a single-buffer OOM surface at corpus scale (one
    * boilerplate fingerprint shared by 10⁶ docs = one 10⁶-element
    * aggregation buffer, discarded right after). The bound caps the
    * buffer at O(cap) while the `cap + 1` sentinel keeps the
    * existing size guards firing identically — under-cap buckets
    * collect every element, so results are bit-identical. A cap ≥
    * 2^31−2 degenerates to plain collect_list semantics (JVM arrays
    * cannot exceed that anyway).
    */
  private def boundedCollectList(c: Column, cap: Long): Column = {
    val capI = math.min(math.max(cap, 1L), (Int.MaxValue - 2).toLong).toInt
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BoundedCollectList(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), capI)
        .toAggregateExpression())
  }

  /** `collect_set` under the same bound, for the set-valued bucket
    * path ([[crossGroupOverlap]]).
    */
  private def boundedCollectSet(c: Column, cap: Long): Column = {
    val capI = math.min(math.max(cap, 1L), (Int.MaxValue - 2).toLong).toInt
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BoundedCollectSet(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), capI)
        .toAggregateExpression())
  }

  /** Exact dedup: keep the row with the smallest `tieBreak` per distinct
    * value of `keyCols` (hash of content, not content itself, travels
    * through the shuffle at scale — we group on md5 of the concatenated
    * key so a 100 TB text column shuffles 16 bytes per row).
    */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    val key = contentDigest(keyCols)
    val w = Window.partitionBy(key).orderBy(col(tieBreak))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Null-normalized, INJECTIVE key string shared by [[exact]] and
    * [[contentDigest]]: each key column is encoded `'v' + value` or
    * `'n'` when NULL, with backslash and the \u0001 separator escaped
    * inside values (`\` -> `\\`, `\u0001` -> `\1`), then joined with
    * \u0001. So ('a', NULL, 'b') and ('a', 'b', NULL) digest
    * differently, a NULL key is a first-class dedup key rather than
    * collapsing to md5('') (round-7 ADVICE: bare concat_ws skips
    * NULLs), and a value CONTAINING the separator cannot shift the
    * column boundary into a cross-tuple collision (round-8 review).
    * Oracle-portable: digests never cross engines (each side of every
    * digest comparison is computed by the same engine), so the oracle
    * keeps the simpler `md5(CASE WHEN c IS NULL THEN 'n' ELSE
    * 'v' || c END)` form — identical grouping on corpora free of
    * control characters, which the gate's corpora are.
    */
  private def keyString(keyCols: Seq[String]): Column =
    concat_ws("\u0001",
      keyCols.map { c =>
        val esc = replace(replace(col(c).cast("string"),
          lit("\\"), lit("\\\\")), lit("\u0001"), lit("\\1"))
        coalesce(concat(lit("v"), esc), lit("n"))
      }: _*)

  /** 16-byte content digest over the null-normalized key columns — the
    * unit that travels between incremental corpus-build runs.
    */
  def contentDigest(keyCols: Seq[String]): Column =
    md5(keyString(keyCols)) // same key as [[exact]]

  /** The digest index of an accepted corpus: persist this (parquet)
    * between ingest runs and feed it back to [[dedupAgainst]]. At any
    * corpus size the index is 16 bytes + overhead per distinct
    * document — the only state incremental dedup ever needs.
    */
  def digests(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.select(contentDigest(keyCols).as("digest")).distinct()

  /** Cross-group contamination matrix: for every pair of groups
    * (sources, datasets, snapshots), how many distinct documents they
    * SHARE byte-for-byte — "which sources copy from each other", the
    * corpus-provenance audit run before mixing sources into a
    * training set (shared mass inflates a source's apparent volume
    * and defeats per-source quotas).
    *
    * Output: `(group_a, group_b, n_shared)` with `group_a < group_b`,
    * pairs sharing ≥ `minShared` distinct contents.
    *
    * Scale shape: one digest shuffle dedups (digest, group) — text
    * never crosses the wire after the scan-stage md5; per-digest
    * group sets are bounded by the groups that actually share that
    * content (and the `maxGroups` fail-fast guards the
    * boilerplate-everywhere digest that would explode quadratically,
    * the q26/q150 bucket-cap device); the pair aggregate is
    * map-side-combined and groups²-bounded.
    */
  def crossGroupOverlap(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      minShared: Long = 1L,
      maxGroups: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxGroups >= 2, s"maxGroups must be >= 2, got $maxGroups")
    val ds = df.select(contentDigest(keyCols).as("digest"),
      col(groupCol).as("__g")).distinct()
    // r19: bounded collect_set — the maxGroups guard RAISES on an
    // over-cap digest, so cap the set buffer at maxGroups + 1 distinct
    // groups (the sentinel size trips the same raise_error) instead of
    // materializing the everywhere-boilerplate digest's full group set
    val sets = ds.groupBy("digest")
      .agg(boundedCollectSet(col("__g"), maxGroups).as("__gs"))
      .withColumn("__gs", when(size(col("__gs")) <= maxGroups, col("__gs"))
        .otherwise(raise_error(concat(
          lit(s"crossGroupOverlap: digest shared by more than $maxGroups "
            + "groups: "), col("digest")))))
      .filter(size(col("__gs")) >= 2)
    sets
      .select(explode(col("__gs")).as("group_a"), col("__gs"))
      .select(col("group_a"), explode(col("__gs")).as("group_b"))
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Digest index with recency: `(digest, last_seen)` where
    * `last_seen` is the max of `seenCol` over the digest's rows. The
    * retention-aware variant of [[digests]] for rolling corpus builds
    * that age content out (robots re-crawls, licensing windows,
    * freshness policies).
    */
  def digestsWithSeen(
      df: DataFrame,
      keyCols: Seq[String],
      seenCol: String): DataFrame =
    df.select(contentDigest(keyCols).as("digest"),
      col(seenCol).as("last_seen"))
      .groupBy("digest").agg(max("last_seen").as("last_seen"))

  /** TTL compaction of a digest index: merge generations (max
    * `last_seen` per digest — a digest re-seen in ANY generation is
    * fresh) and drop digests not seen since `cutoff`. Run between
    * ingest runs so the index stays O(live corpus), not O(all content
    * ever seen) — an aged-out digest makes re-arriving old content
    * eligible again, which is exactly the retention semantics.
    *
    * Scale shape: one shuffle on the 16-byte digest with map-side
    * combine; the filter rides the aggregate. Compaction cost is the
    * index size, never the corpus.
    */
  def compactIndex(index: DataFrame, cutoff: Column): DataFrame =
    index.groupBy("digest").agg(max("last_seen").as("last_seen"))
      .filter(col("last_seen") >= cutoff)

  /** Incremental dedup for rolling corpus builds: drop incoming rows
    * whose content digest is already in `seen` (a [[digests]] index
    * from previous runs), then exact-dedup the batch itself keeping
    * the smallest `tieBreak`. Returns only genuinely new rows — union
    * their digests into the index for the next run.
    *
    * Scale shape: the anti-join keys on 16-byte digests (AQE
    * broadcasts a small index; a 100 TB-corpus index still shuffles
    * only digests), and the batch-internal window groups on the same
    * digest — text never crosses the wire.
    */
  def dedupAgainst(
      df: DataFrame,
      seen: DataFrame,
      keyCols: Seq[String],
      tieBreak: String): DataFrame =
    exact(
      df.join(seen.select(col("digest")),
        contentDigest(keyCols) === col("digest"), "left_anti"),
      keyCols, tieBreak)

  /** Word-level shingles (n consecutive tokens joined by a space),
    * distinct per document. Compiled one-pass kernel
    * ([[graft.functions.WordShingles]]); the round-1 HOF form
    * (`transform` + `element_at`) ran interpreted per gram.
    */
  def shingles(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** MinHash signature straight from text: one compiled pass does
    * shingle → xxhash64 → k-family min ([[graft.functions.ShingleMinHash]]).
    * Map-only — at 100 TB the signature computation never shuffles;
    * only (id, signature) rows reach the band shuffle.
    */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column =
    call_function("graft_shingle_minhash", text, lit(shingleSize), lit(numHashes))

  /** Distinct word-n-gram rows (__id, gram): explode of the compiled
    * shingle kernel — map-only (the round-1 posexplode + window-`lead`
    * form shuffled the whole token table by doc id; the round-0 HOF
    * form ran interpreted at ~1.6 ms/doc). Distinctness is per-doc
    * inside the kernel, so no global `distinct()` shuffle is needed.
    * Documents shorter than n tokens collapse to one whole-text gram.
    */
  def gramRows(df: DataFrame, idCol: String, textCol: String, n: Int,
      widen: Boolean = true): DataFrame = {
    // widen: the shingle explode is O(L) kernel work per doc and every
    // gram-table consumer sits downstream of this one projection —
    // over a single-row-group scan it ran as one task (guide §2;
    // no-op at real scale). `widen = false` is the caller opt-out for
    // paths where the exchange is pure overhead (r18 regression: the
    // decontaminate family widened BOTH of its gram streams and ran
    // 1.7–2.8× slower at 32 cores than at 8 — eval sets are
    // benchmark-sized and the decontaminate plan is broadcast-join +
    // one aggregate, so there is no downstream per-row work heavy
    // enough to amortize the round-robin exchange).
    val proj = df.select(col(idCol).as("__id"), col(textCol).as("__t"))
    val src = if (widen) graft.ops.Scale.widen(proj) else proj
    src.select(col("__id"), explode(shingles(col("__t"), n)).as("gram"))
  }

  /** EXACT set-similarity self-join by PREFIX FILTERING (the
    * PPJoin/AllPairs family — Chaudhuri et al. 2006, Xiao et al.
    * 2008): all pairs with shingle-set Jaccard ≥ `threshold`, with a
    * deterministic completeness guarantee — the LSH-free alternative
    * to [[minhashCandidates]] when probabilistic recall is not
    * acceptable (legal dedup obligations, eval-set decontamination).
    *
    * The filter: order every document's grams by ascending global
    * document frequency (rarest first, gram string tie-break); two
    * sets with Jaccard ≥ τ must overlap within their first
    * `|x| − ⌈τ·|x|⌉ + 1` grams under ANY single global order, so only
    * documents sharing a PREFIX gram are ever candidates — and prefix
    * grams are by construction the rarest, so candidate buckets stay
    * small exactly where all-gram bucketing ([[ngramJaccardPairs]])
    * explodes on stop-shingles. A size-ratio filter
    * (`min/max ≥ τ`) prunes before verification; verification is one
    * exact intersection count per surviving candidate.
    *
    * Scale shape: gram table persists once (one corpus scan); global
    * frequencies are one map-side-combined aggregate; the bucket join
    * runs only on prefix rows. Because completeness is the CONTRACT,
    * an over-`maxBucket` prefix bucket fail-fasts with `raise_error`
    * (dropping it, as the LSH path legitimately does, would silently
    * break exactness — raise τ or n instead).
    *
    * Gram-length knob (measured, SCALE.md round-10 table): on
    * LOW-ENTROPY corpora trigram document frequencies grow with N, so
    * even rarest-first prefix buckets fatten — n=3/τ=0.9 ran 23.2× at
    * a 10× rehearsal while n=5 ran linear (8.6×) with the exactness
    * contract intact (n only moves which shingle space τ is exact
    * over). Use n≥5 for boilerplate-heavy corpora; the `maxBucket`
    * raise_error is the tripwire that the knob is set wrong.
    */
  def prefixFilterJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxBucket: Int = 1000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    // released via the registerPersisted queue (Verify/Bench drain
    // per query; library callers call Robust.unpersistPersisted) —
    // a raw persist here leaked corpus-scan-sized gram tables across
    // a whole session (round-14 sweep)
    val sh = graft.ops.Robust.registerPersisted(
      gramRows(df, idCol, textCol, n))
    val freq = sh.groupBy("gram").agg(count(lit(1)).as("__df"))
    val perDoc = sh.join(freq, "gram")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("gram"))))
        .as("__gs"), count(lit(1)).as("__n"))
    // ε-nudge: at an exactly-integral τ·n, FP rounding of the product
    // can land one ulp HIGH, making ceil one too big and the prefix
    // one too SHORT — the unsafe direction for a completeness
    // contract. Nudging down can only lengthen the prefix (safe).
    val prefixLen = (col("__n") -
      ceil(lit(threshold) * col("__n") - lit(1e-9)) + 1).cast("int")
    val prefixRows = perDoc
      .select(col("__id"), col("__n"),
        explode(slice(col("__gs"), lit(1), prefixLen)).as("__g"))
      .select(col("__id"), col("__n"), col("__g.gram").as("gram"))
    // r19: bounded collect — the completeness contract RAISES on an
    // over-cap prefix bucket, so its contents are never read: cap the
    // buffer at maxBucket + 1 (the sentinel size trips the same
    // raise_error) instead of materializing the full bucket first
    val buckets = prefixRows.groupBy("gram")
      .agg(sort_array(
        boundedCollectList(struct(col("__id"), col("__n")), maxBucket))
        .as("rs"))
      .withColumn("rs", when(size(col("rs")) <= maxBucket, col("rs"))
        .otherwise(raise_error(concat(
          lit(s"prefixFilterJaccardPairs: prefix bucket over $maxBucket " +
            "docs (completeness is the contract — raise threshold or n, " +
            "or exact-dedup boilerplate first) for gram: "), col("gram")))))
      .filter(size(col("rs")) >= 2)
    val cand = buckets
      .select(explode(col("rs")).as("a"), col("rs"))
      .select(col("a"), explode(col("rs")).as("b"))
      .filter(col("a.__id") < col("b.__id"))
      // same ε-nudge: a boundary pair (min = τ·max exactly) must not
      // be rejected because the product rounded one ulp high
      .filter(least(col("a.__n"), col("b.__n")).cast("double") >=
        lit(threshold) * greatest(col("a.__n"), col("b.__n")).cast("double")
          - lit(1e-9))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__n").as("na"), col("b.__n").as("nb"))
      .distinct()
    val shA = sh.select(col("__id").as("id_a"), col("gram"))
    val shB = sh.select(col("__id").as("id_b"), col("gram"))
    cand.join(shA, "id_a").join(shB, Seq("id_b", "gram"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-document cross-corpus novelty: how much of each document's
    * distinct word-n-gram set appears NOWHERE else in the corpus
    * (`df = 1`). The memorization-risk / boilerplate readout dual to
    * pair-level dedup: `novelty ≈ 1` → unique content;
    * `novelty ≈ 0` → the document is assembled from shared text, even
    * if no single pair crosses a dedup threshold (N-way boilerplate
    * spreads mass so thin pairwise Jaccard misses it).
    *
    * Returns `(idCol, n_grams, n_novel, novelty)` with
    * `novelty = n_novel / n_grams` round-6.
    *
    * Scale shape: the gram table (compiled kernel, per-doc distinct)
    * persists once and shuffles twice — by gram for corpus df, by doc
    * for the readout — both map-side combined; no pair join exists
    * anywhere, so unlike candidate generation there is no bucket to
    * cap: cost is linear in total grams regardless of duplication
    * structure.
    */
  def crossDocNovelty(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    // queue-released like prefixFilterJaccardPairs above
    val sh = graft.ops.Robust.registerPersisted(
      gramRows(df, idCol, textCol, n))
    val freq = sh.groupBy("gram").agg(count(lit(1)).as("__df"))
    sh.join(freq, "gram")
      .groupBy("__id")
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 6))
      .select(col("__id").as(idCol), col("n_grams"), col("n_novel"),
        col("novelty"))
  }

  /** MinHash-LSH candidate pairs.
    *
    * Signature of `numHashes` minhashes split into `bands` bands of
    * `numHashes/bands` rows each; documents sharing any band-hash are
    * candidates. Returns (id_a, id_b, n_shared_bands) with id_a < id_b.
    *
    * Scale design: the only shuffle is groupBy (band, bandHash) — keys
    * are 12 bytes. Skew guard: buckets larger than `maxBucket` are
    * dropped (a bucket with B docs yields B² pairs; giant buckets are
    * boilerplate/empty docs better handled by exact dedup first).
    *
    * Band width (rows per band = numHashes/bands) is the
    * false-positive knob: a band collides by chance with probability
    * j^rows, so LOW-ENTROPY corpora (templated text, logs — where
    * random documents share a non-trivial baseline jaccard) need
    * rows ≥ 4 or the candidate set grows quadratically. Measured in
    * the round-8 rehearsal (SCALE.md): on a 31-word-vocabulary corpus
    * at 10× data, the downstream verify stage went 62.8× with 2-row
    * bands vs 9.2× (linear) with 4-row bands, identical recall on the
    * ≥0.9-jaccard pairs. Raise rows before raising `maxBucket`.
    */
  /** Winnowing candidate pairs (the MOSS near-dup path): documents
    * sharing ≥ `minShared` winnowing fingerprints
    * ([[TextOps.winnowFingerprints]] — leftmost-min selections over
    * `window`-gram windows of char `k`-grams). Where minhash/simhash
    * SKETCH similarity, winnowing fingerprints carry a GUARANTEE: any
    * shared substring of ≥ k + window − 1 code points surfaces as a
    * shared fingerprint, so contiguous-plagiarism pairs cannot be
    * missed. Use a k large enough that grams are selective (the
    * boilerplate guard drops the rest).
    *
    * Scale shape: fingerprint selection is map-only (compiled kernel);
    * the shuffle carries (id, fp) at ~m/window rows per doc. The
    * fp-frequency prune (`maxBucket`) bounds the self-join exactly the
    * way the LSH bucket guard does — a fingerprint appearing in more
    * than `maxBucket` docs is boilerplate, not evidence.
    *
    * DEFAULTS follow the measured SCALE.md round-9 rehearsal on
    * low-entropy corpora: short grams recur across unrelated
    * documents, so near-cap buckets expand quadratically
    * (k=12/maxBucket=100 went 17.7× at 10× data), while TIGHTENING
    * the cap alone drops real duplicate pairs whose every fingerprint
    * is over-shared (k=12/maxBucket=20 missed 20 of 84 exact-dup
    * pairs). The selectivity knob is the GRAM LENGTH —
    * k=20/maxBucket=20 (the default since round 10) ran linear at 10×
    * with ZERO missed exact-dup pairs and 15× fewer candidates
    * (DedupSpec replays the recall finding). Raise `k` before
    * loosening `maxBucket`, the winnowing analogue of the LSH
    * band-width rule. Note k=20 requires documents ≥ k+window−1 = 27
    * code points to fingerprint at all; pass a smaller `k` explicitly
    * for short-text corpora (q129's oracle keeps its historical
    * k=12/maxBucket=100 pinned for exactly that reason).
    */
  def winnowCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      window: Int = 8,
      minShared: Long = 3L,
      maxBucket: Int = 20): DataFrame = {
    // Pair generation via fingerprint buckets — the ngramJaccardPairs
    // shape: one groupBy(fp) replaces the previous [occupancy
    // aggregate + prune join + fp self-join], and because the (id, fp)
    // relation now has exactly ONE consumer, the fingerprint kernel
    // runs once with no persist at all (the old shape fed three
    // subtrees and had to cache; r18 optimization — plan went
    // 4 kernel/cache scans + 3 shuffles to 1 scan + 2 shuffles, and
    // the queue contract disappears with the cache). The occupancy
    // prune folds into the bucket-size filter: a fingerprint shared by
    // 2..maxBucket docs yields exactly the pairs the keep-join
    // admitted, so results are identical. Bucket pair expansion is the
    // same skew-guarded shape as the LSH and gram-bucket paths. The
    // kernel input is widened first (guide §2): over a single-row-group
    // scan the O(L)-per-doc winnow kernel otherwise runs on one task.
    val fps = TextOps.winnowFingerprints(
      graft.ops.Scale.widen(df.select(col(idCol), col(textCol))),
      idCol, textCol, k, window)
      .select(col(idCol).as("__id"), col("fp")).distinct()
    // r19: bounded collect — an over-cap (boilerplate) fingerprint
    // caps its buffer at maxBucket + 1 ids instead of materializing
    // the full list before the size filter discards it (guide §2.5/§5)
    val buckets = fps.groupBy("fp")
      .agg(sort_array(boundedCollectList(col("__id"), maxBucket)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 5,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes, "bands must divide numHashes")
    // Signature is ONE compiled map-side pass per document (shingle →
    // hash → k-family min inside [[graft.functions.ShingleMinHash]]);
    // band hashes derive from the 64-long signature array (tiny HOF on
    // a fixed-size array). Only (id, band, band_hash) reaches the
    // shuffle — the first shuffle of the whole operator.
    val banded = graft.ops.Scale
      .widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__id"),
        minhashSignature(col(textCol), shingleSize, numHashes).as("__sig"))
      .select(col("__id"),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",",
              slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand))
                .cast("array<string>")))))
          .as(Seq("band", "band_hash")))
    // r19: bounded collect — same O(maxBucket) buffer bound as the
    // winnow path; over-cap buckets were always dropped, now they
    // never materialize either
    val buckets = banded
      .groupBy("band", "band_hash")
      .agg(boundedCollectList(col("__id"), maxBucket).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    // pairs within bucket: explode twice with a < b guard
    buckets
      .select(col("band"), explode(col("ids")).as("id_a"), col("ids"))
      .select(col("band"), col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count("*").as("n_shared_bands"))
  }

  /** SimHash: 64-bit signature = sign-aggregated token-hash bits (per
    * bit b, ±1 by bit b of xxhash64(token); bit set iff sum > 0).
    * One compiled pass ([[graft.functions.SimHash64]]), map-only.
    */
  def simhash(text: Column): Column = call_function("graft_simhash", text)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash signatures for a whole corpus: a single narrow projection
    * (no explode, no shuffle — the round-1 explode + 64-aggregate shape
    * shuffled every token hash; the kernel folds tokens in one compiled
    * pass per document). At 100 TB this is a pure map stage.
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), simhash(col(textCol)).as("__sig"))

  /** SimHash near-dup pairs: band the 64-bit signature into `bands`
    * 16-bit chunks (pigeonhole: dups within Hamming distance
    * `bands - 1` share at least one exact chunk), bucket-join on chunks,
    * verify with full Hamming distance ≤ maxHamming.
    */
  def simhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    simhashCandidatesFromSigs(
      simhashSignatures(df, idCol, textCol), maxHamming, maxBucket)

  /** Same banding over a PRECOMPUTED `(__id, __sig)` signature table —
    * lets a caller that also needs the signatures elsewhere (q27's
    * exact-verification contract) pay the per-text simhash kernel once
    * instead of once per consumer.
    */
  def simhashCandidatesFromSigs(
      sigDf: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    // Pigeonhole: distance ≤ maxHamming ⇒ some band of bands > maxHamming
    // is untouched. More bands = smaller chunks = bigger buckets, so use
    // the fewest bands that still guarantee recall (≥ 16-bit chunks for
    // maxHamming ≤ 3 — the standard near-dup operating point).
    val bands = Seq(4, 8, 16).find(_ > maxHamming).getOrElse(16)
    val chunkBits = 64 / bands
    val chunkMask = (1L << chunkBits) - 1
    val banded = sigDf.select(col("__id"), col("__sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => call_function("shiftright", col("__sig"), b * chunkBits)
          .bitwiseAND(lit(chunkMask))))
        .as(Seq("band", "chunk")))
    // r19: bounded collect (see boundedCollectList) — a hot 16-bit
    // chunk caps at maxBucket + 1 members instead of the full list
    val buckets = banded
      .groupBy("band", "chunk")
      .agg(boundedCollectList(struct(col("__id"), col("__sig")), maxBucket)
        .as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    buckets
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .filter(col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        hamming(col("a.__sig"), col("b.__sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over a duplicate-pair edge list by iterative
    * minimum-label propagation: each vertex repeatedly adopts the
    * smallest component id among itself and its neighbours; converges
    * in O(diameter) rounds (dup clusters have tiny diameters — chains
    * longer than a few hops are rare in near-dup graphs).
    *
    * Scale shape per round: one join edges⋈labels (keyed by vertex) +
    * one min-aggregate. Labels persist between rounds; convergence is
    * detected by a changed-vertex count. This is the principled
    * replacement for [[dedupCorpus]]'s greedy pair-drop when duplicate
    * clusters must be complete (A~B, B~C ⇒ {A,B,C} one group).
    */
  def connectedComponents(
      pairs: DataFrame, // columns id_a, id_b
      maxIter: Int = 10,
      driverEdgeThreshold: Long = 1000000L): DataFrame = {
    // Iterative DataFrame algorithms MUST truncate lineage each round:
    // `labels` feeds three operators per iteration, so the logical plan
    // doubles per round and Catalyst re-analysis becomes the runtime
    // (measured: minutes of plan compilation on a 4k-edge graph).
    // localCheckpoint materializes AND replaces the plan with a
    // LogicalRDD. (On a cluster with unreliable executors use
    // `checkpoint` with a reliable dir instead.)
    // null ids can never join back to a label (SQL null ≠ null), so a
    // null-end edge is dead weight in the iterative path and an NPE in
    // the driver fast path's Comparable ordering — drop them up front
    // so both paths agree
    val edges0 = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src").isNotNull.and(col("dst").isNotNull))
      .distinct()
      // r18: lazy checkpoint + count fusion — the count materializes
      // the checkpoint blocks in the same job
      .localCheckpoint(false)
    val nEdges = edges0.count()
    // The dup-pair graph is post-verify and TINY relative to the corpus
    // (a few hundred edges at sf0.01; even pathological corpora stay in
    // the low millions). Below the threshold, a driver union-find is one
    // collect instead of O(diameter) rounds x (join + agg + convergence
    // count) — the iterative path spent ~13s of stage overhead on
    // 400-edge graphs. Above it (or if a caller disables it with 0),
    // fall through to the distributed min-label iteration.
    // the fast path's union-by-minimum needs a Comparable external type
    // whose ordering matches SQL `min` — true for these atomics, not
    // for struct/array/binary ids (Row and Array[Byte] aren't
    // Comparable) — those take the SQL-semantics iterative path
    // regardless of size
    val atomicId = edges0.schema.head.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType
        | org.apache.spark.sql.types.BooleanType
        | org.apache.spark.sql.types.DateType
        | org.apache.spark.sql.types.TimestampType
        | org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    if (nEdges <= driverEdgeThreshold && atomicId) return driverUnionFind(edges0)
    // Size each round's stages to the edge count — per-round latency is
    // dominated by task count, not data (100k edges per partition).
    val np = math.max(2, math.min(
      edges0.rdd.getNumPartitions, (nEdges / 100000L).toInt + 1))
    val edges = edges0.repartition(np).localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighbourMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("n_comp"))
      val next = labels.join(neighbourMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("comp"), coalesce(col("n_comp"), col("comp"))).as("comp"))
        // r18: lazy — the convergence count below materializes it
        .localCheckpoint(false)
      val changed = next.join(labels.withColumnRenamed("comp", "old"), "id")
        .filter(col("comp") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Exact connected components on the driver: union-find with
    * union-by-minimum, so each set's root IS the component's smallest
    * id — identical (id, comp) semantics to the iterative min-label
    * fixpoint, in one collect + one local job. Only called for edge
    * lists under [[connectedComponents]]'s guarded threshold.
    */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema.head.dataType
    // ids come from ONE column, so they share an external type; every
    // atomic Catalyst external type (java.lang Long/Integer/..., String,
    // Date, Timestamp, BigDecimal) is Comparable, and this ordering
    // matches SQL `min` for those types.
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.collect().foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("comp", idType)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach { id =>
      rows.add(org.apache.spark.sql.Row(id, find(id)))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Benchmark decontamination: flag TRAINING documents that share any
    * word n-gram with an evaluation/benchmark set (the GPT-3/Pile
    * 13-gram pass; `n` configurable). Returns (idCol, n_shared) where
    * n_shared counts the DISTINCT grams a training doc shares with the
    * eval set — order by it to triage the worst leaks first.
    *
    * Scale shape: eval sets are benchmark-sized (thousands of docs),
    * so their distinct gram table BROADCASTS; the 100 TB training
    * corpus sees one map-side gram explode + broadcast semi-ish join +
    * one aggregation keyed by doc id. No corpus-vs-corpus shuffle
    * exists anywhere in the plan.
    */
  def decontaminate(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      broadcastEval: Boolean = true): DataFrame = {
    // widen = false on both gram streams (r18 lesson): the eval side
    // is benchmark-sized and the train side feeds only a broadcast
    // join + one doc-keyed aggregate — the widen exchange was pure
    // overhead (q61/q62/q67 ran 1.7–2.8× slower at 32 cores, 2×
    // FASTER at 8: the classic parallelism-overhead signature). At
    // production partition counts widen is a no-op anyway, so opting
    // out here costs nothing at scale.
    val evalGrams = gramRows(evalSet, idCol, textCol, n, widen = false)
      .select(col("gram")).distinct()
    // an eval set too big to broadcast (rare — benchmarks are small)
    // falls back to a shuffle join rather than OOMing the driver
    val ev = if (broadcastEval) broadcast(evalGrams) else evalGrams
    gramRows(train, idCol, textCol, n, widen = false)
      .join(ev, Seq("gram"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_shared"))
  }

  /** [[decontaminate]] with a Bloom-filter prefilter — the shape for
    * eval sets whose gram table is too big to broadcast as strings but
    * whose BITS still fit everywhere (a 10M-gram set ≈ 17 MB at 1%
    * fpp vs ~1 GB of gram strings).
    *
    * Two passes over the training gram stream:
    *   1. map-only Bloom probe — drops (1 - fpp) of the clean grams
    *      with zero shuffle;
    *   2. exact join of the rare survivors against the eval gram table
    *      — removes the Bloom's false positives.
    * Bloom filters have no false NEGATIVES, so the output is
    * bit-identical to [[decontaminate]]: the sketch only shrinks the
    * exact join's probe side (from the full corpus gram stream to
    * suspects), never the answer.
    */
  def decontaminateBloom(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      expectedGrams: Long = 10000000L,
      fpp: Double = 0.01): DataFrame = {
    // checkpoint: the gram explode + distinct over the eval corpus
    // feeds TWO consumers (the bloomFilter action here and the verify
    // join below) — without it the eval side computes twice per call.
    // widen = false: same rationale as [[decontaminate]] (r18
    // regression cohort q61/q62/q67).
    val evalGrams = gramRows(evalSet, idCol, textCol, n, widen = false)
      .select(col("gram")).distinct().localCheckpoint(true)
    val bloom = evalGrams.stat.bloomFilter("gram", expectedGrams, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bloom)
    // the probe is the repo's codegen'd BloomMightContain (the
    // bloomSemiJoin primitive) — same broadcast bits, but it stays
    // inside whole-stage codegen where a Scala udf would fence the
    // gram filter stage with per-row lambda dispatch
    val probe = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("gram")), bc))
    gramRows(train, idCol, textCol, n, widen = false)
      .filter(col("gram").isNotNull && probe)
      .join(evalGrams, Seq("gram")) // exact verify — kills false positives
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_shared"))
  }

  /** Cross-document SEGMENT dedup (the RefinedWeb/CCNet line-removal
    * pass, over fixed `segTokens`-token segments since this corpus has
    * no newlines): chunk each document's token stream into consecutive
    * segments, drop every segment that appears verbatim in ≥ `minDocs`
    * distinct documents, and reassemble the surviving segments in
    * order. Returns (idCol, clean_text, n_kept).
    *
    * Scale shape: segments shuffle as md5 digests with their doc/idx
    * bookkeeping; the duplicate-segment table is corpus-frequency
    * bounded and joins back as a left_anti on the digest. Reassembly
    * is one aggregation keyed by doc id over array_sort — no window,
    * no driver collect.
    */
  def dedupSegments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int = 10,
      minDocs: Int = 2): DataFrame = {
    require(segTokens > 0 && minDocs >= 2,
      s"segTokens=$segTokens minDocs=$minDocs out of range")
    val toks = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
    val segs = toks.select(col(idCol),
      posexplode(transform(
        sequence(lit(0),
          ceil(size(col("__toks")).cast("double") / segTokens).cast("int") - 1),
        i => array_join(slice(col("__toks"), i * segTokens + 1, lit(segTokens)), " ")))
        .as(Seq("__idx", "__seg")))
    val dup = segs.groupBy(md5(col("__seg")).as("__digest"))
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__digest")
    val kept = segs.join(dup,
      md5(col("__seg")) === dup("__digest"), "left_anti")
    kept.groupBy(idCol)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__idx"), col("__seg")))),
          s => s.getField("__seg")), " ").as("clean_text"),
        count(lit(1)).cast("long").as("n_kept"))
      // documents whose every segment was dropped must survive with
      // empty text, not vanish
      .join(df.select(col(idCol)), Seq(idCol), "right_outer")
      .na.fill("", Seq("clean_text")).na.fill(0L, Seq("n_kept"))
  }

  /** Exact substring-level dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): every token position
    * covered by ANY `w`-token window whose content occurs ≥ 2 times in
    * the corpus (all occurrences counted — within- and cross-document)
    * is removed, and the surviving tokens reassemble in order. Where
    * [[dedupSegments]] drops fixed non-overlapping segments duplicated
    * across documents, this is the sliding-window form: repetition at
    * ANY offset is caught, the way the paper's suffix-array pass
    * removes verbatim substrings wherever they start.
    *
    * Scale shape: window digests are built in the scan stage as an
    * array column (one md5 per start offset — O(L·w) per document,
    * the same work the oracle pays); the only corpus-sized shuffle
    * carries (digest, count) with map-side combine, and the
    * duplicated-digest set joins back by digest (AQE broadcasts it
    * when small). Coverage is resolved per document with NO
    * per-position scan of the start list: duplicated starts
    * flatten to covered positions, `array_except` (hash-set
    * lookups) keeps the rest — O(L·w) worst case, not O(L²).
    * Every intermediate (window array, coverage array, kept
    * positions) is materialized as a `once`-fenced column BEFORE a
    * lambda reads it — an inline expression would re-evaluate per
    * element (the q87 lesson).
    */
  def substringDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 15): DataFrame = {
    require(w >= 2, s"substringDedup: window must be >= 2 tokens, got $w")
    val ws = col("__ws")
    // r18: widen before the token/window/md5 kernels — over a
    // single-row-group scan the whole digest pass ran on one task
    // (guide §2; no-op at real scale)
    val docsT = graft.ops.Scale.widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.once(TextOps.tokens(col(textCol))).as("__ws"))
    val winArr = when(size(ws) >= w,
      transform(sequence(lit(1), size(ws) - (w - 1)),
        i => md5(concat_ws(" ", slice(ws, i, lit(w))))))
      .otherwise(array().cast("array<string>"))
    val wins = docsT
      .select(col(idCol), TextOps.once(winArr).as("__wins"))
      .select(col(idCol), posexplode(col("__wins")).as(Seq("__p0", "__h")))
    val dupH = wins.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("__h")
    val dstarts = wins.join(dupH, Seq("__h"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p0") + 1)).as("__starts"))
    val covArr = array_distinct(flatten(transform(
      coalesce(col("__starts"), array().cast("array<int>")),
      s => sequence(s, s + (w - 1)))))
    docsT.join(dstarts, Seq(idCol), "left")
      .select(col(idCol), ws, TextOps.once(covArr).as("__cov"))
      .select(col(idCol), ws,
        TextOps.once(array_except(sequence(lit(1), size(ws)), col("__cov")))
          .as("__kp"))
      .select(col(idCol),
        concat_ws(" ", transform(col("__kp"), p => element_at(ws, p)))
          .as("clean_text"),
        size(col("__kp")).cast("long").as("n_kept"),
        (size(ws) - size(col("__kp"))).cast("long").as("n_removed"))
  }

  /** Restrict a corpus to the documents named by a candidate-pair edge
    * list — the step that makes verification scale-safe: exact n-gram
    * Jaccard after this touches only near-dup suspects, so a
    * stop-shingle shared by 100k corpus docs can no longer create a
    * quadratic gram bucket (jaccard is pair-local, so restriction
    * never changes a surviving pair's score).
    */
  def candidateDocs(df: DataFrame, idCol: String, candidates: DataFrame): DataFrame =
    df.join(
      candidates.select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct(),
      Seq(idCol), "left_semi")

  /** End-to-end corpus dedup, the composed operator a training-data
    * pipeline runs: exact dedup first (cheap, removes byte-identical
    * docs), then MinHash-LSH candidates verified by n-gram Jaccard,
    * then keep the smallest id of each verified near-dup pair.
    *
    * Near-dup removal keeps min-id per PAIR edge greedily (a doc is
    * dropped if any verified duplicate with a smaller id exists) — the
    * one-pass approximation of connected components, which is what
    * production dedup pipelines ship (full CC needs iterative joins).
    */
  def dedupCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      jaccardThreshold: Double = 0.8,
      shingleSize: Int = 5,
      keep: String = "min_id"): DataFrame = {
    require(keep == "min_id" || keep == "longest",
      s"keep policy must be min_id or longest, got $keep")
    val exact0 = exact(df, Seq(textCol), idCol)
    val candidates = minhashCandidates(exact0, idCol, textCol,
      shingleSize = shingleSize)
    val verified = ngramJaccardPairs(
      candidateDocs(exact0, idCol, candidates),
      idCol, textCol, n = shingleSize, threshold = jaccardThreshold)
    // keep policy per verified pair: min_id drops the larger id;
    // longest (the RefinedWeb choice — the longer copy usually carries
    // the fuller context) drops the shorter, tie-broken to min_id.
    // Both are per-pair decisions joined on ids only, so the policy
    // adds at most one broadcast-size length join, never a text shuffle.
    val drop = keep match {
      case "min_id" => verified.select(col("id_b").as(idCol)).distinct()
      case "longest" =>
        val lens = exact0.select(col(idCol).as("__lid"),
          length(col(textCol)).as("__len"))
        verified
          .join(lens.select(col("__lid").as("id_a"), col("__len").as("__la")), "id_a")
          .join(lens.select(col("__lid").as("id_b"), col("__len").as("__lb")), "id_b")
          .select(when(col("__la") < col("__lb"), col("id_a"))
            .otherwise(col("id_b")).as(idCol)) // equal lengths → id_b (= min_id)
          .distinct()
    }
    exact0.join(drop, Seq(idCol), "left_anti")
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle. Standalone use prunes shingles present in more than
    * `maxDocFreq` documents first (stopword-shingles create quadratic
    * blowup; at 100 TB this pruning is what keeps the join bounded —
    * the full-fidelity path is LSH candidates → this verifier).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 10000): DataFrame = {
    // The gram table feeds four consumers (freq, both join sides,
    // sizes); without materialization Catalyst re-derives it in every
    // scan (observed: 6 duplicate scans). Persist it once — at 100 TB
    // this is the standard "materialize the shingle table" step of a
    // Jaccard pipeline.
    // queue-released like prefixFilterJaccardPairs above
    val sh = graft.ops.Robust.registerPersisted(
      gramRows(df, idCol, textCol, n))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("n_grams"))
    // Pair generation via gram buckets instead of a self-join: one
    // groupBy(gram) replaces [freq-aggregate ×2 + shuffle-join ×2].
    // The doc-frequency prune folds into the bucket-size filter (a
    // shared gram always has df ≥ 2, so results are identical). Bucket
    // pair expansion is the same skew-guarded shape as the LSH path.
    // r19: bounded collect — a stop-shingle's bucket caps at
    // maxDocFreq + 1 ids instead of materializing every holder before
    // the prune (callers that disable the prune pass Long.MaxValue,
    // which degenerates to plain collect_list semantics)
    val buckets = sh.groupBy("gram")
      .agg(sort_array(boundedCollectList(col("__id"), maxDocFreq)).as("ids"))
      .filter(size(col("ids")).between(2, maxDocFreq))
    // Pair expansion as two codegen'd generators instead of nested
    // array HOFs (interpreted per element): ids are sorted, so the
    // `<` filter yields exactly the ordered pairs the slice-based
    // expansion produced, with every operator inside WholeStageCodegen.
    val pairs = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val inter = pairs.groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
