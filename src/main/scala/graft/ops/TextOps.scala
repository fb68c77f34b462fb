package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All hot paths are pure Catalyst expressions (whole-stage codegen, no
  * UDFs), so they run inside the scan stage with zero shuffles — at
  * 100 TB these are embarrassingly parallel map operators.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Optimizer fence around an expensive per-row expression: project it
    * `once(...)` and downstream filters read the column instead of
    * re-deriving the expression (see [[graft.functions.EvalOnce]]).
    */
  def once(c: Column): Column = call_function("graft_once", c)

  /** Token count without materializing the token array:
    * count = chars - non-space chars + 1 (single-space-separated text).
    * Used in oracle-checked queries because the formula is engine-exact.
    */
  def tokenCountArith(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** Token count via split (robust to repeated whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** A BPE-ish subword count: words + extra tokens for long words
    * (every 4 chars beyond the first 4 ≈ one extra subword merge).
    * Deterministic, arithmetic-only approximation of BPE token counts.
    */
  def subwordCountApprox(text: Column): Column = {
    val words = tokenCountArith(text)
    val chars = length(text) - (words - 1) // chars excluding separators
    // ceil-ish: one token per word + one per 4 chars beyond 4 per word on average
    (words + greatest(lit(0L), (chars - words * 4) / 4).cast("long")).cast("long")
  }

  /** Character-level Shannon entropy (nats) via the compiled
    * [[graft.functions.CharEntropy]] kernel — one codegen'd pass per
    * document, no shuffle. Low entropy flags repeated-character noise;
    * near-uniform entropy flags encoded/compressed blobs. Requires
    * GraftFunctions.registerAll.
    */
  def charEntropy(text: Column): Column = call_function("graft_char_entropy", text)

  /** C4-style document cleaning signals (Raffel et al., 2020 §2.2 —
    * the rules that survive a corpus with no markup): token count,
    * mean/max word length, terminal punctuation, brace and
    * "lorem ipsum" marks, plus the combined `keep` gate. Everything is
    * arithmetic/regex on the scan — a pure map stage, so the filter
    * rides the parquet read at any corpus size.
    *
    * Gate: ≥5 tokens, mean word length in [3,10], no word longer than
    * 30 chars, no curly braces (code/templating), no boilerplate
    * "lorem ipsum".
    */
  def c4Rules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    val text = col(textCol)
    val nTok = tokenCountArith(text)
    val meanWordLen = round(
      length(regexp_replace(text, "\\s", "")).cast("double") / nTok, 6)
    val maxWordLen = array_max(transform(tokens(text), w => length(w))).cast("long")
    df.select(
      (col(idCol) +: passthrough.map(col)) ++ Seq(
        nTok.as("n_tokens"),
        meanWordLen.as("mean_word_len"),
        maxWordLen.as("max_word_len"),
        substring(trim(text), -1, 1).isin(".", "!", "?").as("ends_punct"),
        text.contains("{").or(text.contains("}")).as("has_brace"),
        lower(text).contains("lorem ipsum").as("has_lorem")): _*)
      .withColumn("keep",
        col("n_tokens") >= 5 &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("max_word_len") <= 30 &&
          !col("has_brace") && !col("has_lorem"))
  }

  /** Punctuation character count (fixed class, engine-portable). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("long")

  /** Uppercase-letter count. */
  def upperCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("long")

  /** Digit count. */
  def digitCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("long")

  /** Per-document mean token log-probability under the corpus's own
    * unigram language model — the cheap perplexity proxy used to rank
    * documents for LM-quality filtering (CCNet's perplexity bucket,
    * with the corpus standing in for the reference LM). Returns
    * (idCol, n_tokens, mean_lp); lower mean_lp = more surprising text.
    *
    * Parity device: LN rounds to 6 decimals BEFORE the weighted sum
    * (libm vs StrictMath last-ulp differences), and the sum runs in
    * DECIMAL so token order can't perturb the low bits.
    *
    * Scale shape: ONE corpus explode feeds both the per-doc tf
    * aggregate and the vocabulary frequency table (shared shuffle,
    * ReuseExchange); the vocab joins back keyed by token (AQE
    * broadcasts it when small) and the 1-row total broadcasts.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy("tok").agg(sum("tf").as("freq"))
    val total = freq.agg(sum("freq").as("total"))
    val lp = round(log(col("freq").cast("double") / col("total")), 6)
      .cast("decimal(18,6)")
    tf.join(freq, "tok").crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(sum(col("tf") * lp).as("__s"),
        sum("tf").cast("long").as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        // mean_lp is an exact-decimal ratio (6-dp lp × integer tf /
        // integer n): round(double, 6) on it is the q271 boundary
        // class — the 10× gate caught a doc landing ON a .5-micro
        // boundary. The numerator is ≤ 0 (log-probs), so negate into
        // the non-negative half-up device and negate back (both
        // engines round half-AWAY-FROM-ZERO, so -round(|x|) = round(x))
        (-graft.ops.Parity.round6Ratio(-col("__s"), col("n_tokens")))
          .as("mean_lp"))
  }

  /** Count space-delimited occurrences of a word — EXACT (adjacent
    * repeats like "the the" both count) via the compiled
    * [[graft.functions.WordHits]] kernel: one pass over the text,
    * replacing the round-1 `replace`/`length` formula that rescanned
    * the text per word and missed adjacent repeats (non-overlapping
    * matching). Oracle side uses the space-doubling trick so DuckDB
    * counts identically. Requires GraftFunctions.registerAll.
    */
  def wordHits(text: Column, word: String): Column =
    wordSetHits(text, Seq(word))

  /** Total hits of ANY word in the set — ONE compiled scan regardless
    * of set size (langId over 25 markers was 25 full-text rescans in
    * the formula form).
    */
  def wordSetHits(text: Column, words: Seq[String]): Column =
    call_function("graft_word_hits", text, lit(words.mkString(","))).cast("long")

  /** Stopword hit count over a small fixed list. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")
  def stopwordHits(text: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    wordSetHits(text, stopwords)

  /** Heuristic quality score in [0,1]: blend of token-length sanity,
    * stopword ratio, and punctuation ratio — the standard cheap quality
    * gates used before expensive dedup/classification passes.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCountArith(text).cast("double")
    val nChar = length(text).cast("double")
    val avgTokLen = (nChar - (nTok - 1)) / nTok
    val stopRatio = stopwordHits(text).cast("double") / nTok
    val punctRatio = punctCount(text).cast("double") / nChar
    val lenScore = when(nTok.between(5, 100000), lit(1.0)).otherwise(lit(0.0))
    val tokScore = when(avgTokLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val stopScore = when(stopRatio > 0.01, lit(1.0)).otherwise(lit(0.0))
    val punctScore = when(punctRatio < 0.2, lit(1.0)).otherwise(lit(0.0))
    round((lenScore * 0.25 + tokScore * 0.25 + stopScore * 0.25 + punctScore * 0.25), 2)
  }

  /** n-gram-free language ID: score each language's marker-stopword hits
    * and take the argmax (deterministic tie-break by language code).
    * A real corpus would use char-n-gram profiles; markers are the
    * portable, oracle-checkable core of that approach.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "nicht", "das", "ist"),
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "et", "les", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(text: Column): Column = {
    // argmax via greatest over (score * K + langRank) encoding; K bounds
    // scores; deterministic and expression-only.
    val scored = LangMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      val score = wordSetHits(text, markers)
      // encode: score * 8 + (7 - i) → ties resolve to SMALLEST lang index
      (score * 8 + (LangMarkers.size - 1 - i), lang)
    }
    val best = greatest(scored.map(s => s._1): _*)
    scored.foldLeft(lit("und")) { case (acc, (enc, lang)) =>
      when(enc === best, lit(lang)).otherwise(acc)
    }
  }

  /** 64-bit document fingerprint: polynomial rolling hash over tokens,
    * computed with higher-order functions (fold over the token array) —
    * no UDF, stays in codegen. Reduced mod M < 2^58 so every intermediate
    * (`acc*31 + h < 32*M`) stays inside a signed 64-bit long with no
    * overflow-wrap discrepancies across engines.
    */
  def fingerprint(text: Column): Column = {
    val m = lit(144115188075855859L) // 2^57 - 13
    aggregate(
      tokens(text),
      lit(1469598103934665603L) % m, // FNV offset basis, reduced
      (acc, tok) => (((acc * 31) % m) + pmod(xxhash64(tok), m)) % m)
  }

  /** Character n-grams (the raw material of real language-ID profiles
    * and char-level fingerprints): all n-char windows of the text.
    * Compiled kernel with `substr` semantics (1-based, code-point
    * windows — same as DuckDB's `substr` for the oracle); the
    * round-1 `transform(sequence(...), substr)` form ran the window
    * lambda interpreted per character.
    */
  def charNgrams(text: Column, n: Int): Column =
    call_function("graft_char_ngrams", text, lit(n))

  /** Char-n-gram-PROFILE language ID — the "real corpus" approach the
    * marker-word [[langId]] approximates. Profiles are learned from the
    * labeled corpus itself: the `topK` trigrams per language by
    * document frequency; a document is classified to the profile with
    * the largest distinct-trigram overlap (deterministic tie-breaks:
    * profile rank by (df DESC, trigram), winner by (score DESC, lang);
    * zero overlap → "und").
    *
    * Scale shape (round-8 rework): profiles are CONFIG-sized
    * (languages × topK strings), so after the one distributed pass
    * that learns them (explode → count → tiny per-language top-k)
    * they collect to the driver — bounded, fail-fast — and compile
    * into the scan as `array_intersect` against literal arrays.
    * Scoring is then a map-only projection: no second trigram explode,
    * no broadcast join, no (doc × language) aggregation shuffle, no
    * per-document window. The round-7 join+window form spent ~4s at
    * sf0.1; this shape measures ~3× faster and at 100 TB removes the
    * only corpus-sized shuffle the operator had. The document's
    * distinct-trigram array is computed ONCE behind an [[
    * graft.functions.EvalOnce]] fence and each language's overlap
    * reads it.
    */
  def langIdNgram(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      n: Int = 3,
      topK: Int = 20,
      maxLangs: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // widen once for BOTH passes (profile explode + kernel scoring):
    // over a single-row-group scan each ran as one task (guide §2;
    // no-op at real scale)
    val src = graft.ops.Scale.widen(df)
    val tri = src.select(col(langCol).as("__lang"),
      explode(array_distinct(charNgrams(col(textCol), n))).as("__tg"))
    val profiles = tri.groupBy("__lang", "__tg").agg(count(lit(1)).as("__n"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__lang").orderBy(col("__n").desc, col("__tg"))))
      .filter(col("__rk") <= topK)
      .select("__lang", "__tg")
    val profRows = profiles.limit(maxLangs * topK + 1).collect()
    require(profRows.length <= maxLangs * topK,
      s"langIdNgram: more than $maxLangs distinct languages in '$langCol' — " +
        "profiles are no longer config-sized; raise maxLangs or pre-bucket")
    val byLang: Seq[(String, Seq[String])] = profRows
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq)
      .toSeq.sortBy(_._1)
    if (byLang.isEmpty)
      return df.select(col(idCol), col(langCol),
        lit("und").as("lang_pred_ngram"), lit(0L).as("ngram_score"))
    // profiles broadcast once per executor as a hashed gram → langs
    // map inside the compiled LangOverlap kernel: ONE pass over each
    // document's distinct grams with O(1) lookups, replacing an
    // array_intersect (fresh hash set) per row × language — the q55
    // 3.4 s residual. NULL text scores like empty text (whole-text ""
    // gram, no overlap) → "und"/0, same as the expression form.
    val model = graft.functions.LangIdModel(byLang, n)
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val scored = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.LangOverlap(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          coalesce(col(textCol).cast("string"), lit(""))), bc))
    src.select(col(idCol), col(langCol), once(scored).as("__lo"))
      .select(col(idCol), col(langCol),
        col("__lo").getField("lang").as("lang_pred_ngram"),
        col("__lo").getField("score").as("ngram_score"))
  }

  /** CCNet-style n-gram language-model quality scoring (Wenzek et al.
    * 2020 §4.3): learn add-one-smoothed word-bigram probabilities from
    * a reference slice of the corpus, then score every document by its
    * total and per-bigram negative log-likelihood — high `avg_nll`
    * flags text unlike the reference (boilerplate, noise, wrong
    * domain), the standard perplexity-bucket filter of corpus
    * curation.
    *
    * Model: `-ln p(w2|w1) = ln(c(w1) + V) - ln(c(w1 w2) + 1)` with
    * counts from the reference slice and V its vocabulary size;
    * unseen words/bigrams fall back to counts of 0, so the score is
    * total (no OOV holes). Each term is rounded to 6 decimals and
    * summed as DECIMAL(18,6) — the round-6-LN ladder, so the sum is
    * order-independent and engine-portable. Documents with fewer than
    * two tokens score NULL (no bigrams).
    *
    * Scale shape: the model is learned in two distributed
    * aggregations over the reference slice (explode → count), then
    * collected — bounded, fail-fast — and broadcast to executors as a
    * HASHED model driving a compiled kernel ([[graft.functions.BigramNll]]):
    * scoring is a map-only projection reading each document once, with
    * no join, no shuffle, no second pass, and O(1) model lookups per
    * bigram. In a real pipeline the reference is a curated
    * sample (CCNet trains its KenLM on Wikipedia), so the model is
    * config-sized by construction; above `maxVocab`/`maxBigrams` the
    * require fires and the caller should prune the model (CCNet prunes
    * its LM too) rather than let a corpus-sized literal into the plan.
    */
  def bigramLmNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      refFilter: Column,
      maxVocab: Int = 4096,
      maxBigrams: Int = 1 << 16): DataFrame = {
    val refToks = df.filter(refFilter).select(tokens(col(textCol)).as("__ws"))
    val uniRows = refToks.select(explode(col("__ws")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cu"))
      .limit(maxVocab + 1).collect()
    require(uniRows.length <= maxVocab,
      s"bigramLmNll: reference vocabulary exceeds $maxVocab words — " +
        "prune the model (frequency cutoff) or raise maxVocab")
    val biRows = refToks.select(explode(zip_with(
        slice(col("__ws"), lit(1), size(col("__ws")) - 1),
        slice(col("__ws"), lit(2), size(col("__ws")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__cb"))
      .limit(maxBigrams + 1).collect()
    require(biRows.length <= maxBigrams,
      s"bigramLmNll: reference bigram table exceeds $maxBigrams entries — " +
        "prune the model or raise maxBigrams")
    val v = uniRows.length.toLong
    if (v == 0)
      return df.select(col(idCol), lit(0L).as("n_bigrams"),
        lit(null).cast("double").as("nll"),
        lit(null).cast("double").as("avg_nll"))
    // model counts broadcast once per executor as HASHED maps: O(1)
    // per bigram lookup, where the earlier typedlit-map form paid a
    // linear scan of the literal per lookup (Catalyst GetMapValue
    // walks ArrayBasedMapData) — tokens × |model| comparisons per doc
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val model = new graft.functions.BigramLmModel(
      uniRows.map(_.getString(0).getBytes(utf8)), uniRows.map(_.getLong(1)),
      biRows.map(_.getString(0).getBytes(utf8)), biRows.map(_.getLong(1)))
    val bc = df.sparkSession.sparkContext.broadcast(model)
    // null text scores like empty text — both have 0 bigrams — so the
    // coalesce keeps the kernel on the simple nullSafeEval path
    val score = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BigramNll(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          coalesce(col(textCol).cast("string"), lit(""))), bc))
    df.select(col(idCol), once(score).as("__s"))
      .select(col(idCol),
        col("__s").getField("n_bigrams").as("n_bigrams"),
        col("__s").getField("nll").as("nll"),
        col("__s").getField("avg_nll").as("avg_nll"))
  }

  /** Gopher-style within-document n-gram repetition signals (Rae et
    * al. 2021 table A1): for n ∈ {2,3}, the fraction of n-gram
    * occurrences whose gram appears more than once in the document —
    * the "fraction of duplicate n-grams" gates that catch looping/
    * boilerplate text that unigram stats ([[repetitionStats]]) miss.
    *
    * Scale shape: ZERO shuffles — where the textbook form explodes
    * n-grams and re-groups by (doc, gram), each document is counted in
    * one compiled [[graft.functions.TextKernels.dupGrams]] pass
    * (HashMap counts) inside the scan stage. O(L) per document. The
    * first version sorted gram arrays and counted equal sorted
    * neighbors through HOF lambdas — same quantities, but interpreted
    * per element (2.3 s at sf0.1 vs sub-second compiled; its
    * INVALID_INDEX_OF_ZERO boundary crash was round 8's only red).
    * Requires GraftFunctions.registerAll.
    */
  /** Blocklist gate: one Aho-Corasick pass per document over a
    * config-sized keyword list (substring semantics, code-point
    * positions) returning the distinct-keyword hit count, the
    * earliest match position and its keyword — where k `contains`
    * probes would re-scan the text k times, and a regex alternation
    * backtracks.
    *
    * Scale shape: map-only — the automaton is the model, rebuilt once
    * per executor; scoring rides the scan. O(L + matches) per doc.
    */
  def blocklistScan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keywords: Seq[String]): DataFrame = {
    val model = new graft.functions.AcModel(keywords.toArray)
    val scanned = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BlocklistScan(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          coalesce(col(textCol).cast("string"), lit(""))), model))
    df.select(col(idCol), once(scanned).as("__b"))
      .select(col(idCol),
        col("__b").getField("n_kw").as("n_kw"),
        col("__b").getField("first_pos").as("first_pos"),
        col("__b").getField("first_kw").as("first_kw"))
  }

  /** Column-level Unicode NFC canonical composition (compiled kernel;
    * a no-op fast path for already-normalized text). Run BEFORE
    * [[graft.ops.Dedup.contentDigest]] so visually-identical texts
    * dedup together. Map-only by construction.
    */
  def nfc(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Cyrillic look-alikes folded to their Latin forms — the
    * adversarial complement of [[nfc]]: NFC composes what Unicode
    * DEFINES as canonically equal, while a spam/contamination evader
    * swaps visually-identical but canonically-DISTINCT codepoints
    * ("рaypal" with a Cyrillic р survives NFC, exact dedup, and every
    * blocklist untouched). Covers the high-traffic Cyrillic↔Latin
    * confusable pairs (Unicode TR39's cross-script set restricted to
    * 1:1 lowercase+uppercase mappings so `translate` applies them in
    * one codegen'd pass); extend `from`/`to` for other scripts.
    */
  val HomoglyphFrom: String = "аеорсхіѕу" + "АВЕКМНОРСТХ"
  val HomoglyphTo: String = "aeopcxisy" + "ABEKMHOPCTX"
  def foldHomoglyphs(c: Column): Column =
    translate(c, HomoglyphFrom, HomoglyphTo)

  /** The hashing trick (Weinberger et al. 2009): signed sparse
    * bag-of-words in a fixed `dims`-dimensional space with NO
    * vocabulary pass — `dim = h(w) mod dims`, `sign = ±1` from an
    * independent hash bit, value = signed collision sum. The
    * vectorizer for streaming/one-pass featurization where a fitted
    * vocabulary (q65's tf-idf) is impossible; sign-summing keeps
    * collision noise zero-mean.
    *
    * Hashes ride the portable md5 device (Curation.bucketOf memo):
    * dim from hex chars 1–4, sign parity from char 5 — independent
    * digits of one md5, one hash call per token. Zero-sum cells drop
    * (exact ± cancellation), matching sparse-vector semantics.
    *
    * Scale shape: map-only hashing in the scan stage, ONE
    * (doc, dim)-keyed map-side-combined aggregate; output ≤ dims
    * rows/doc. No vocabulary state anywhere — the property that makes
    * the trick work at 100 TB.
    */
  def featureHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 1024): DataFrame = {
    require(dims >= 2, s"graft: dims must be >= 2, got $dims")
    val h = md5(col("w"))
    df.select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .select(col("__id"),
        pmod(conv(substring(h, 1, 4), 16, 10).cast("int"), lit(dims))
          .cast("long").as("dim"),
        when(pmod(conv(substring(h, 5, 1), 16, 10).cast("int"),
          lit(2)) === 0, 1L).otherwise(-1L).as("__s"))
      .groupBy("__id", "dim")
      .agg(sum(col("__s")).cast("long").as("value"))
      .filter(col("value") =!= 0)
      .select(col("__id").as(idCol), col("dim"), col("value"))
  }

  /** Flesch–Kincaid grade level (Kincaid et al. 1975) from three
    * regex-countable proxies — words (space arithmetic, the
    * [[tokenCountArith]] device), sentences (runs of `[.!?]`, floored
    * at 1 so fragments stay finite), syllables (runs of vowels incl.
    * y — the standard cheap approximation):
    * `0.39·(W/S) + 11.8·(Y/W) − 15.59`, round-6.
    *
    * The curation use: a grade-level band is a cheap fluency gate
    * (near-zero → word salad or markup; ≥ 20 → run-on boilerplate or
    * OCR noise), orthogonal to [[qualityScore]]'s ratio gates and
    * [[charEntropy]].
    *
    * Scale shape: map-only scan-stage counters (two regexp passes +
    * length arithmetic per row); nothing shuffles.
    */
  def readability(text: Column): Column = {
    val w = tokenCountArith(text).cast("double")
    val s = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("double")
    val y = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("double")
    round(lit(0.39d) * (w / s) + lit(11.8d) * (y / w) - lit(15.59d), 6)
  }

  /** MOSS winnowing fingerprints (Schleimer et al. 2003): per document,
    * the distinct leftmost-min (md5-prefix hash, position) selections
    * over every `window`-gram window of character `k`-grams — any
    * shared substring of length ≥ k + window − 1 between two documents
    * is GUARANTEED to surface as a shared fingerprint, at ~1/window
    * the density of the full gram set. The selected fingerprints feed
    * the same bucket-join near-dup path as minhash/simhash bands, with
    * a coverage guarantee those sketches lack. Requires
    * GraftFunctions.registerAll.
    *
    * Scale shape: map-only — selection happens inside the compiled
    * [[graft.functions.TextKernels.winnow]] kernel (O(L) md5 calls +
    * a monotonic deque), so the corpus never explodes to a gram stream
    * and nothing shuffles until the (id, pos, fp) rows — m/window per
    * doc — reach whatever join consumes them.
    */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      window: Int = 4): DataFrame =
    df.select(col(idCol),
      explode(call_function("graft_winnow",
        coalesce(col(textCol).cast("string"), lit("")),
        lit(k), lit(window))).as("__f"))
      .select(col(idCol),
        col("__f").getField("pos").as("pos"),
        col("__f").getField("fp").as("fp"))

  def dupNgramStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def frac(total: Column, dup: Column): Column =
      when(total === 0L, lit(null).cast("double"))
        .otherwise(round(dup.cast("double") / total, 6))
    df.select(col(idCol),
      call_function("graft_dup_grams", col(textCol), lit(2)).as("__d2"),
      call_function("graft_dup_grams", col(textCol), lit(3)).as("__d3"))
      .select(col(idCol),
        col("__d2").getField("total").as("bi_total"),
        col("__d2").getField("dup").as("bi_dup"),
        col("__d3").getField("total").as("tri_total"),
        col("__d3").getField("dup").as("tri_dup"))
      .select(col(idCol),
        col("bi_total"), col("bi_dup"),
        frac(col("bi_total"), col("bi_dup")).as("bi_frac"),
        col("tri_total"), col("tri_dup"),
        frac(col("tri_total"), col("tri_dup")).as("tri_frac"))
  }

  /** Gopher's OTHER within-document repetition family (Rae et al. 2021
    * table A1): for n ∈ {2,3,4}, the fraction of the document's
    * characters contained in occurrences of its single MOST FREQUENT
    * word n-gram — `count(top gram) × chars(top gram) / chars(doc)`.
    * Catches a document dominated by one repeated phrase, which the
    * duplicate-occurrence fractions ([[dupNgramStats]]) under-weight
    * when the rest of the text is clean. Ties on the count break to
    * the lexicographically smallest gram (deterministic,
    * oracle-checkable).
    *
    * Scale shape: ZERO shuffles — the textbook form explodes grams and
    * ranks (doc, gram) counts through a window; this scores each
    * document in one compiled [[graft.functions.TextKernels.topGram]]
    * pass (HashMap counts, binary-lex tie-break) inside the scan
    * stage. O(L) per document; the first version used an interpreted
    * sort + 4-field-struct HOF fold and was the suite's second-slowest
    * query (3.8 s at sf0.1) — same results, compiled pass. Requires
    * GraftFunctions.registerAll.
    */
  def topNgramStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def outCols(n: Int): Seq[Column] = {
      val t = col(s"__t$n")
      val cnt = t.getField("cnt")
      Seq(cnt.as(s"top${n}_count"),
        when(cnt === 0L || col("__chars") === 0, lit(null).cast("double"))
          .otherwise(round(
            (cnt * length(t.getField("gram"))).cast("double") /
              col("__chars"), 6))
          .as(s"top${n}_frac"))
    }
    df.select(col(idCol),
      length(concat_ws(" ", tokens(col(textCol)))).as("__chars"),
      call_function("graft_top_gram", col(textCol), lit(2)).as("__t2"),
      call_function("graft_top_gram", col(textCol), lit(3)).as("__t3"),
      call_function("graft_top_gram", col(textCol), lit(4)).as("__t4"))
      .select(col(idCol) +:
        ((2 to 4).flatMap(outCols)): _*)
  }

  /** RAG-style overlapping token-window chunking: windows of `size`
    * tokens every `stride` tokens, plus a tail window ending exactly at
    * the last token (the HF-tokenizers stride convention) — every
    * chunk has exactly `size` tokens unless the document itself is
    * shorter (then one chunk of the whole document). Emits
    * `(id, chunk_id, start_tok, n_tok, chunk_text)`; deterministic,
    * no degenerate sub-chunk tails.
    *
    * Scale shape: map-only — the start positions are a tiny int
    * sequence built per row and the slices are projections of the
    * token array; the only row growth is the chunk fan-out itself
    * (~n/stride per doc), which IS the output. No shuffle, no join;
    * chunk ids are per-document positions, not a corpus window.
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int = 32,
      stride: Int = 24): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      "chunkTokens: need 1 <= stride <= size")
    val ws = col("__ws")
    val n = org.apache.spark.sql.functions.size(ws)
    val starts = when(n <= size, array(lit(1)))
      .otherwise(concat(
        filter(sequence(lit(1), n, lit(stride)), st => st + (size - 1) < n),
        array(n - (size - 1))))
    df.select(col(idCol), once(tokens(col(textCol))).as("__ws"))
      .select(col(idCol), ws, posexplode(starts).as(Seq("__i", "__s")))
      .select(col(idCol),
        col("__i").cast("long").as("chunk_id"),
        col("__s").cast("long").as("start_tok"),
        org.apache.spark.sql.functions.size(slice(ws, col("__s"), lit(size)))
          .cast("long").as("n_tok"),
        concat_ws(" ", slice(ws, col("__s"), lit(size))).as("chunk_text"))
  }

  /** All per-document stats in one pass (single projection). */
  def documentStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCountArith(t))
      .withColumn("n_punct", punctCount(t))
      .withColumn("n_stopwords", stopwordHits(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  // ------------------------------------------------------------------
  // PII scrubbing — every training-data pipeline redacts contact info
  // before the corpus ships. Pure regexp_replace chain (codegen'd,
  // shuffle-free); the patterns avoid lookaround so the SAME strings
  // run under Java regex (Spark) and RE2 (DuckDB oracle) identically.
  // Replacement order matters and is part of the contract: emails
  // first (URLs may not swallow the user@host), then URLs, IPs, and
  // long digit runs (phone/account numbers).
  // ------------------------------------------------------------------

  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{7,}\\b" -> "<NUM>")

  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Repetition statistics — the Gopher/RefinedWeb-style duplication
    * signals used to drop low-quality documents: distinct-token ratio
    * and the most-frequent token's share. One explode + one grouped
    * pass per document (shuffle on doc id only); ties on the top token
    * break to the lexicographically smallest, making the output
    * deterministic and oracle-checkable.
    */
  /** Deterministic data-mixture sampling: keep each row with its
    * stratum's probability, decided by a content-stable hash of the id
    * — the "mix 50% en, 100% de…" step of corpus assembly. Exactly
    * reproducible across engines (and across reruns, unlike
    * `df.sample`): a row is kept iff the first 8 hex chars of
    * `md5(id)` sort below the stratum threshold — hex strings compare
    * lexicographically like the numbers they encode, so no
    * engine-specific hash or float rounding is involved.
    *
    * Scale shape: one codegen'd projection + filter, no shuffle, no
    * RNG state; the sample is a pure function of (id, weights), so
    * re-running a 100 TB job after a failure yields the same corpus.
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 0.0): DataFrame = {
    def hex8(w: Double): String =
      if (w >= 1.0) "g" // every 8-hex-digit prefix sorts below "g"
      else if (w <= 0.0) ""
      else f"${(w * 4294967296d).toLong}%08x"
    val thr = weights.foldLeft(lit(hex8(defaultWeight))) {
      case (acc, (k, w)) => when(col(stratumCol) === k, lit(hex8(w))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8) < thr)
  }

  /** Temperature-scaled stratum rebalancing — [[mixtureSample]] with
    * the weights LEARNED from the data instead of given: each stratum
    * keeps `w = (n_min / n_s)^(1-alpha)` of its rows (α=1 keeps the
    * natural distribution, α=0 equalizes all strata to the rarest),
    * the multinomial temperature resampling used to stop a dominant
    * language/domain from drowning the rest of a training corpus.
    *
    * The whole derivation stays IN the plan (no driver arithmetic):
    * stratum counts → broadcast → per-row md5-prefix threshold, with
    * the weight rounded to 6 decimals before the 2^32 scaling so the
    * threshold string is engine-portable (the exponent is applied to
    * a ratio of exact integers; one round(,6) absorbs libm pow
    * last-ulp differences). Same determinism as [[mixtureSample]]:
    * the kept set is a pure function of (id, counts, alpha).
    *
    * Scale shape: one map-side-combined count aggregate (strata-sized
    * result) broadcast back to a scan-stage filter — the corpus is
    * read once and never shuffles.
    */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "temperatureMixture: alpha in [0,1]")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__ns"))
    val nmin = counts.agg(min(col("__ns")).as("__nmin"))
    val w = round(pow(col("__nmin").cast("double") / col("__ns"), 1.0 - alpha), 6)
    val thr = counts.crossJoin(broadcast(nmin)).select(
      col(stratumCol).as("__stratum"),
      col("__ns").as("n_stratum"), w.as("weight"),
      when(w >= 1.0, lit("g")).otherwise(
        lower(lpad(hex(floor(w * lit(4294967296d)).cast("long")), 8, "0")))
        .as("__thr"))
    // null-SAFE equality: a null stratum is a real stratum (counted by
    // the groupBy above); a plain equi-join would silently drop every
    // null-stratum row instead of sampling it at its learned weight
    df.join(broadcast(thr), col(stratumCol) <=> col("__stratum"))
      .filter(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8) <
        col("__thr"))
      .drop("__stratum", "__thr")
  }

  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(tokens(col(textCol))).as("__tok"))
    val perTok = toks.groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__n"))
    perTok.groupBy(col(idCol))
      .agg(
        sum(col("__n")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_distinct"),
        // min over (-count, token): highest count, smallest token on ties
        min(struct((-col("__n")).as("negn"), col("__tok"))).as("__top"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
        col("__top.__tok").as("top_token"),
        (-col("__top.negn")).cast("long").as("top_token_n"),
        ((-col("__top.negn")).cast("double") / col("n_tokens")).as("top_token_share"))
  }

  /** Coleman–Liau readability index (Coleman & Liau 1975) — the
    * reading-level screen that needs NO syllable dictionary:
    * `0.0588·L − 0.296·S − 15.8` with L = letters per 100 words and
    * S = sentences per 100 words. Letters count `[A-Za-z]`,
    * sentences count terminal `[.!?]` runs collapsed to one (an
    * ellipsis is one boundary), floored at 1 so fragments still
    * grade. Per `groupCols`: document count, mean letters/words/
    * sentences and the mean index.
    *
    * Parity chain: per-document L/S/CLI are fixed double expressions
    * of exact counts rounded 6, summed as DECIMAL (order-free), one
    * final division each. Everything runs inside the scan — counts
    * are `length(regexp_replace(...))` arithmetic, no UDF, no
    * explode.
    */
  def colemanLiau(
      df: DataFrame,
      groupCols: Seq[String],
      textCol: String): DataFrame = {
    val text = col(textCol)
    val letters = (length(text) -
      length(regexp_replace(text, "[A-Za-z]", ""))).cast("long")
    val words = tokenCountArith(text)
    val sentences = greatest(
      (length(regexp_replace(text, "[.!?]+", ".")) -
        length(regexp_replace(text, "[.!?]+", ""))).cast("long"), lit(1L))
    val lPer100 = letters.cast("double") * lit(100.0d) / words.cast("double")
    val sPer100 = sentences.cast("double") * lit(100.0d) / words.cast("double")
    val cli = round(lit(0.0588d) * lPer100 - lit(0.296d) * sPer100 -
      lit(15.8d), 6)
    df.filter(text.isNotNull && length(text) > 0)
      .select(groupCols.map(col) ++ Seq(
        letters.as("__l"), words.as("__w"), sentences.as("__s"),
        cli.cast("decimal(18,6)").as("__cli")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__l")).as("__sl"), sum(col("__w")).as("__sw"),
        sum(col("__s")).as("__ss"), sum(col("__cli")).as("__scli"))
      .select(groupCols.map(col) ++ Seq(
        col("n_docs").cast("long").as("n_docs"),
        // corpus-scale means through the engine-proof micro device
        // (Parity.round6Ratio) — final round(double,6) on ratios of
        // exact sums is the q271 hazard class
        Parity.round6Ratio(col("__sl"), col("n_docs")).as("mean_letters"),
        Parity.round6Ratio(col("__sw"), col("n_docs")).as("mean_words"),
        Parity.round6Ratio(col("__ss"), col("n_docs")).as("mean_sentences"),
        Parity.round6Ratio(col("__scli"), col("n_docs")).as("mean_cli")): _*)
  }
}
