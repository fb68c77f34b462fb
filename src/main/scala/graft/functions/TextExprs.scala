package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, GenericInternalRow, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text kernels for the dedup / text-analysis operators.
  *
  * Two interpreted hot paths motivated these (measured at sf0.1):
  *   - `wordHits` built from `replace`/`length` rescans the text once
  *     PER WORD (langId = 25 scans/doc) and undercounts adjacent
  *     repeats ("the the") because `replace` matches non-overlapping;
  *   - shingling/minhash/simhash via array higher-order functions run
  *     interpreted (~µs per element), so a 64-family minhash walked
  *     every token array 64 times through closure calls.
  *
  * Each kernel is one compiled pass over the text. Tokenization is
  * byte-level on the ASCII whitespace class [ \t\n\x0B\f\r] (these
  * bytes never occur inside a multi-byte UTF-8 sequence, so this is
  * code-point safe), skipping empty runs — the same token stream as
  * `TextOps.tokens` = `split(trim(text), "\\s+")` for ASCII-spaced
  * text, so shingle/minhash/simhash agree with the rest of the
  * framework on texts containing tabs/newlines. (The DuckDB oracles
  * that split on a literal ' ' additionally assume single-space-
  * separated corpus text, which `documents.parquet` satisfies.)
  *
  * Hash parity: token/shingle hashes replicate Spark's `xxhash64`
  * exactly — `XXH64.hashUnsafeBytes(bytes, 42)` for strings and
  * `XXH64.hashLong(h, XXH64.hashInt(i, 42))` for the family remix of
  * `xxhash64(lit(i), h)` — so signatures are bit-identical to the
  * expression-built round-1 forms.
  */
object TextKernels {
  private val SEED = 42L
  /** Parsed word lists keyed by the raw CSV argument. In practice the
    * argument is a foldable literal (one distinct key per expression),
    * but `graft_word_hits` is a general SQL function, so a per-row
    * second argument must not grow this executor-lifetime map without
    * bound: beyond WORD_CACHE_MAX entries new keys are parsed per call
    * instead of cached.
    */
  private val WORD_CACHE_MAX = 256
  private val wordCache = new ConcurrentHashMap[UTF8String, Array[Array[Byte]]]()
  private val seedCache = new ConcurrentHashMap[Integer, Array[Long]]()

  private def words(csv: UTF8String): Array[Array[Byte]] = {
    var w = wordCache.get(csv)
    if (w == null) {
      w = csv.toString.split(',').filter(_.nonEmpty)
        .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (wordCache.size < WORD_CACHE_MAX) wordCache.putIfAbsent(csv.clone(), w)
    }
    w
  }

  private def familySeeds(k: Int): Array[Long] = {
    var s = seedCache.get(k)
    if (s == null) {
      s = Array.tabulate(k)(i => XXH64.hashInt(i, SEED))
      seedCache.putIfAbsent(k, s)
    }
    s
  }

  /** ASCII whitespace class of Java's `\s`: [ \t\n\x0B\f\r]. */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** Token [start, end) byte offsets; empty text yields one empty token
    * (mirroring `split(trim(""), ...)` = `[""]`, which the HOF forms
    * produced).
    */
  private def tokenize(bytes: Array[Byte]): (Array[Int], Int) = {
    val n = bytes.length
    val bounds = new Array[Int]((n + 2) * 2)
    var cnt = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !isWs(bytes(i))) i += 1
        bounds(cnt * 2) = s; bounds(cnt * 2 + 1) = i
        cnt += 1
      }
    }
    if (cnt == 0) { bounds(0) = 0; bounds(1) = 0; cnt = 1 }
    (bounds, cnt)
  }

  private def utf8Bytes(t: UTF8String): Array[Byte] = t.getBytes

  /** Exact count of space-delimited tokens equal to any word in the
    * comma-separated list (each token counted once; adjacent repeats
    * both count).
    */
  def wordHits(text: UTF8String, wordsCsv: UTF8String): Long = {
    val ws = words(wordsCsv)
    val bytes = utf8Bytes(text)
    val (bounds, cnt) = tokenize(bytes)
    var hits = 0L
    var t = 0
    while (t < cnt) {
      val s = bounds(t * 2); val e = bounds(t * 2 + 1); val len = e - s
      var wi = 0
      var matched = false
      while (wi < ws.length && !matched) {
        val w = ws(wi)
        if (w.length == len) {
          var j = 0
          while (j < len && bytes(s + j) == w(j)) j += 1
          matched = j == len
        }
        wi += 1
      }
      if (matched) hits += 1
      t += 1
    }
    hits
  }

  /** Join tokens [from, from+n) with single spaces into a fresh byte
    * array (only needed when the source text isn't single-spaced).
    */
  private def joinGram(bytes: Array[Byte], bounds: Array[Int], from: Int, n: Int): Array[Byte] = {
    var len = n - 1
    var k = 0
    while (k < n) { len += bounds((from + k) * 2 + 1) - bounds((from + k) * 2); k += 1 }
    val out = new Array[Byte](math.max(len, 0))
    var pos = 0
    k = 0
    while (k < n) {
      if (k > 0) { out(pos) = ' '; pos += 1 }
      val s = bounds((from + k) * 2); val e = bounds((from + k) * 2 + 1)
      System.arraycopy(bytes, s, out, pos, e - s)
      pos += e - s
      k += 1
    }
    out
  }

  /** True iff tokens [from, from+n) are separated by exactly one SPACE
    * byte in the source (gram == contiguous slice; zero-copy hash).
    * A single tab/newline separator is NOT contiguous — the canonical
    * gram joins with ' ', so those must go through `joinGram`.
    */
  private def contiguous(bytes: Array[Byte], bounds: Array[Int], from: Int, n: Int): Boolean = {
    var k = 0
    while (k < n - 1) {
      val e = bounds((from + k) * 2 + 1)
      if (e + 1 != bounds((from + k + 1) * 2) || bytes(e) != ' ') return false
      k += 1
    }
    true
  }

  /** Distinct word n-grams (first-occurrence order); documents shorter
    * than n tokens collapse to one whole-text gram.
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = utf8Bytes(text)
    val (bounds, cnt) = tokenize(bytes)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (cnt < n) {
      seen.add(UTF8String.fromBytes(joinGram(bytes, bounds, 0, cnt)))
    } else {
      var i = 0
      while (i <= cnt - n) {
        val g =
          if (contiguous(bytes, bounds, i, n))
            UTF8String.fromBytes(bytes, bounds(i * 2), bounds((i + n - 1) * 2 + 1) - bounds(i * 2))
          else UTF8String.fromBytes(joinGram(bytes, bounds, i, n))
        seen.add(g)
        i += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  private def gramHash(bytes: Array[Byte], bounds: Array[Int], from: Int, n: Int): Long =
    if (contiguous(bytes, bounds, from, n)) {
      val s = bounds(from * 2); val e = bounds((from + n - 1) * 2 + 1)
      XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s,
        e - s, SEED)
    } else {
      val g = joinGram(bytes, bounds, from, n)
      XXH64.hashUnsafeBytes(g, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        g.length, SEED)
    }

  /** MinHash signature over DISTINCT word n-gram hashes: one compiled
    * pass (shingle → xxhash64 → k-family min), map-only per document.
    */
  def shingleMinhash(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val bytes = utf8Bytes(text)
    val (bounds, cnt) = tokenize(bytes)
    val seeds = familySeeds(numHashes)
    val seen = new java.util.HashSet[java.lang.Long]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val grams = if (cnt < n) 1 else cnt - n + 1
    val width = if (cnt < n) cnt else n
    var i = 0
    while (i < grams) {
      val h = gramHash(bytes, bounds, i, width)
      if (seen.add(h)) {
        var f = 0
        while (f < numHashes) {
          val m = XXH64.hashLong(h, seeds(f))
          if (m < mins(f)) mins(f) = m
          f += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over token xxhash64 values (duplicates counted),
    * one compiled pass, map-only.
    */
  def simhash(text: UTF8String): Long = {
    val bytes = utf8Bytes(text)
    val (bounds, cnt) = tokenize(bytes)
    val counters = new Array[Int](64)
    var t = 0
    while (t < cnt) {
      val s = bounds(t * 2); val e = bounds(t * 2 + 1)
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, e - s, SEED)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** All n-char windows (code-point based, 1:1 with `substr`); texts
    * shorter than n collapse to a single whole-text element. NOT
    * distinct — mirrors the expression form exactly for the oracle.
    */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val chars = text.numChars()
    if (chars < n) return new GenericArrayData(Array[Any](text))
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = text.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Single most frequent word n-gram of the document: returns
    * `struct(cnt BIGINT, gram STRING)` with the count of the top gram
    * and, among max-count grams, the BINARY-lexicographically smallest
    * (UTF8String order — matching both `array_sort` and DuckDB's
    * default collation). Fewer than `n` tokens yields (0, "").
    * One pass, HashMap counts — replaces the interpreted
    * sort + 4-field-struct HOF fold that made q91 the second-slowest
    * query (3.8 s at sf0.1).
    */
  def topGram(text: UTF8String, n: Int): InternalRow = {
    val bytes = utf8Bytes(text)
    val (bounds, cnt) = tokenize(bytes)
    if (cnt < n)
      return new GenericInternalRow(Array[Any](0L, UTF8String.EMPTY_UTF8))
    val toks = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      toks(i) = UTF8String.fromBytes(bytes, bounds(i * 2),
        bounds(i * 2 + 1) - bounds(i * 2))
      i += 1
    }
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 1
    while (j < parts.length) { parts(j) = SPACE; j += 2 }
    i = 0
    while (i + n <= cnt) {
      var k = 0
      while (k < n) { parts(2 * k) = toks(i + k); k += 1 }
      val gram = UTF8String.concat(parts: _*)
      val c = counts.get(gram)
      if (c == null) counts.put(gram, Array(1L)) else c(0) += 1L
      i += 1
    }
    var bestC = 0L
    var bestG: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
        bestC = c; bestG = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](bestC, bestG))
  }

  private val UND = UTF8String.fromString("und")

  /** Language overlap scoring against a hashed [[LangIdModel]]: one
    * pass over the document's distinct character n-grams with O(1)
    * gram → languages lookups; argmax keeps the first (alphabetical)
    * language on ties, "und"/0 when nothing overlaps.
    */
  def langOverlap(text: UTF8String, model: LangIdModel): InternalRow = {
    val grams = charNgrams(text, model.n)
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Long](model.langs.length)
    var i = 0
    val ne = grams.numElements()
    while (i < ne) {
      val g = grams.getUTF8String(i)
      if (seen.add(g)) {
        val hit = model.map.get(g)
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    var maxC = 0L
    var arg = -1
    i = 0
    while (i < counts.length) {
      if (counts(i) > maxC) { maxC = counts(i); arg = i }
      i += 1
    }
    if (arg < 0) new GenericInternalRow(Array[Any](UND, 0L))
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(model.langs(arg)), maxC))
  }

  /** Gopher duplicate n-gram counts: `struct(total BIGINT, dup BIGINT)`
    * where total is the document's n-gram count and dup the number of
    * occurrences whose gram appears ≥ 2 times (HashMap counts — the
    * same quantity the sorted-neighbor HOF form computed, one compiled
    * pass instead of sort + per-index filter).
    */
  def dupGrams(text: UTF8String, n: Int): InternalRow = {
    val bytes = utf8Bytes(text)
    val (bounds, cnt) = tokenize(bytes)
    if (cnt < n) return new GenericInternalRow(Array[Any](0L, 0L))
    val total = (cnt - n + 1).toLong
    val toks = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      toks(i) = UTF8String.fromBytes(bytes, bounds(i * 2),
        bounds(i * 2 + 1) - bounds(i * 2))
      i += 1
    }
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 1
    while (j < parts.length) { parts(j) = SPACE; j += 2 }
    i = 0
    while (i + n <= cnt) {
      var k = 0
      while (k < n) { parts(2 * k) = toks(i + k); k += 1 }
      val gram = UTF8String.concat(parts: _*)
      val c = counts.get(gram)
      if (c == null) counts.put(gram, Array(1L)) else c(0) += 1L
      i += 1
    }
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c >= 2L) dup += c
    }
    new GenericInternalRow(Array[Any](total, dup))
  }

  /** Add-one-smoothed bigram NLL against a hashed LM model
    * ([[BigramLmModel]]): one compiled pass per document with O(1)
    * HashMap lookups per bigram. Term = round6(ln(c(w1)+V) −
    * ln(c(w1 w2)+1)) carried as a scale-6 fixed-point long, summed
    * exactly, then decimal→double + round6 for `nll` and `avg_nll` —
    * the same ladder the expression form used, so hashes are
    * unchanged. Returns (n_bigrams, nll, avg_nll); docs with < 2
    * tokens score (0, NULL, NULL).
    */
  def bigramNll(text: UTF8String,
      model: graft.functions.BigramLmModel): InternalRow = {
    val bytes = utf8Bytes(text)
    val (bounds, cnt) = tokenize(bytes)
    val nb = (cnt - 1).toLong
    if (nb <= 0) return new GenericInternalRow(Array[Any](0L, null, null))
    val uni = model.uniMap
    val bi = model.biMap
    val v = model.v
    var sumScaled = 0L
    var i = 0
    while (i < cnt - 1) {
      val w1 = UTF8String.fromBytes(bytes,
        bounds(i * 2), bounds(i * 2 + 1) - bounds(i * 2))
      val cuBox = uni.get(w1)
      val cu = if (cuBox == null) 0L else cuBox.longValue()
      val gram =
        if (contiguous(bytes, bounds, i, 2))
          UTF8String.fromBytes(bytes, bounds(i * 2),
            bounds(i * 2 + 3) - bounds(i * 2))
        else UTF8String.fromBytes(joinGram(bytes, bounds, i, 2))
      val cbBox = bi.get(gram)
      val cb = if (cbBox == null) 0L else cbBox.longValue()
      sumScaled += java.math.BigDecimal
        .valueOf(math.log(cu + v) - math.log(cb + 1L))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
      i += 1
    }
    val d = java.math.BigDecimal.valueOf(sumScaled, 6).doubleValue()
    val nll = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    // avg_nll in half-up INTEGER micro units (q271 class: round-6 of
    // the exact-decimal ratio flips between engines at a .5-micro
    // boundary — the 10× gate caught one; terms are ≥ 0 so the
    // non-negative floorDiv form is exact)
    val avgMicro = Math.floorDiv(2L * sumScaled + nb, 2L * nb)
    val avg = java.math.BigDecimal.valueOf(avgMicro, 6).doubleValue() + 0.0
    new GenericInternalRow(Array[Any](nb, nll, avg))
  }

  /** Character-level Shannon entropy (nats) — the cheap "is this text
    * or noise?" quality gate (machine-generated / encoded blobs score
    * near-uniform, natural language sits around 2.5-3.2 nats). One
    * compiled pass per document, no shuffle anywhere.
    *
    * Parity ladder (the q69 device, per-character instead of
    * per-token): each distinct code point contributes
    * `count * round(ln(count/L), 6)` with the rounded log carried as a
    * scale-6 fixed-point long, so the sum is EXACT and
    * order-independent; the final `-(sum/L)` rounds to 6 half-up —
    * bit-identical to the DuckDB oracle's DECIMAL(18,6) ladder
    * regardless of libm or summation order.
    */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return 0.0
    // ASCII fast path: flat count table; rare non-ASCII spills to a map
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Long] = null
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Long]()
        other.merge(cp, 1L, (a, b) => a + b)
      }
      i += Character.charCount(cp)
    }
    var sumScaled = 0L // Σ count * round6(ln(count/n)), scaled by 1e6
    def term(c: Long): Unit = if (c > 0) {
      val lp = java.math.BigDecimal.valueOf(math.log(c.toDouble / n))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
      sumScaled += c * lp
    }
    var ch = 0
    while (ch < 128) { term(ascii(ch)); ch += 1 }
    if (other != null) other.values.forEach(c => term(c))
    // CAST(DECIMAL SUM AS DOUBLE) / L, then ROUND(,6) — mirror the SQL
    val d = java.math.BigDecimal.valueOf(sumScaled, 6).doubleValue() / n
    // + 0.0 normalizes the single-character-document -0.0 to 0.0
    java.math.BigDecimal.valueOf(-d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** MOSS winnowing fingerprints (Schleimer et al. 2003, SIGMOD —
    * leftmost-min variant): character k-gram hashes `h(i)` = first 15
    * hex chars of md5(gram UTF-8 bytes); every w-gram window selects
    * its minimal `(h, i)` (lexicographic, so hash ties break to the
    * earlier position — deterministic and engine-portable, unlike the
    * original's rightmost rule which depends on scan direction); the
    * DISTINCT selections are the document's fingerprints, guaranteeing
    * a shared substring of length ≥ k + w − 1 yields a shared
    * fingerprint. Positions are 1-based CODE POINTS (= DuckDB `substr`
    * character positions). Fewer than w grams → the single
    * whole-document minimum; fewer than k code points → no
    * fingerprints. Selections are non-decreasing in position as the
    * window slides, so consecutive-dedupe = global distinct.
    * Returns `array<struct<pos BIGINT, fp STRING>>` ordered by pos.
    * One compiled pass: O(L) md5 calls + an O(m) monotonic deque.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    val m = n - k + 1
    if (m <= 0 || k <= 0 || w <= 0)
      return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n + 1)
    var ci = 0
    var off = 0
    while (ci < n) {
      starts(ci) = off
      off = s.offsetByCodePoints(off, 1)
      ci += 1
    }
    starts(n) = s.length
    val md = md5Local.get()
    val hs = new Array[String](m)
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(s.substring(starts(i), starts(i + k))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(15)
      var b = 0
      while (sb.length < 15) {
        val v = d(b) & 0xff
        sb.append(Character.forDigit(v >> 4, 16))
        if (sb.length < 15) sb.append(Character.forDigit(v & 0xf, 16))
        b += 1
      }
      hs(i) = sb.toString
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val deque = new java.util.ArrayDeque[Int]()
    // fill the first window [0, min(w, m) - 1]; strict pops keep the
    // leftmost of equal hashes at the front
    i = 0
    while (i < math.min(w, m)) {
      while (!deque.isEmpty && hs(deque.peekLast()) > hs(i)) deque.pollLast()
      deque.addLast(i)
      i += 1
    }
    var lastSel = -1
    var sIdx = 0
    val wins = math.max(1, m - w + 1)
    while (sIdx < wins) {
      while (deque.peekFirst() < sIdx) deque.pollFirst()
      val sel = deque.peekFirst()
      if (sel != lastSel) {
        out += new GenericInternalRow(
          Array[Any]((sel + 1).toLong, UTF8String.fromString(hs(sel))))
        lastSel = sel
      }
      val nxt = sIdx + w
      if (nxt < m) {
        while (!deque.isEmpty && hs(deque.peekLast()) > hs(nxt)) deque.pollLast()
        deque.addLast(nxt)
      }
      sIdx += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Jaro–Winkler similarity (Winkler 1990): Jaro matching inside the
    * ⌊max(|a|,|b|)/2⌋−1 window, transpositions halved, plus the ≤4
    * common-prefix boost `p·0.1·(1−jaro)` applied only above the
    * classic 0.7 threshold. One compiled pass per pair, O(|a|·window).
    *
    * Cross-engine parity: BYTE-level directly on the UTF8String
    * buffers (no String materialization in the 8M-pairs-per-block hot
    * path), matching DuckDB's byte-oriented
    * `jaro_winkler_similarity`; the IEEE operation order —
    * `(m/|a| + m/|b| + (m−t)/m)/3`, then `s + (p·0.1)·(1−s)` —
    * reproduces DuckDB bit-for-bit (pinned empirically on 5000
    * randomized cases incl. threshold and prefix boundaries). Empty
    * strings score 0 (DuckDB's convention, not the textbook
    * 1-for-both-empty), identical strings 1.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes; val lb = b.numBytes
    if (la == 0 || lb == 0) return 0.0
    if (a.equals(b)) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la); val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val ca = a.getByte(i)
      val hi = math.min(lb, i + window + 1)
      var j = math.max(0, i - window)
      var found = false
      while (j < hi && !found) {
        if (!bm(j) && b.getByte(j) == ca) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var j = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(j)) j += 1
        if (a.getByte(i) != b.getByte(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    var s = (md / la + md / lb + (m - t) / md) / 3.0
    if (s > 0.7) {
      val pmax = math.min(4, math.min(la, lb))
      var p = 0
      while (p < pmax && a.getByte(p) == b.getByte(p)) p += 1
      s = s + p * 0.1 * (1.0 - s)
    }
    s
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerExpr = copy(left = l, right = r)
}

case class WordHits(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_word_hits"
  override def nullSafeEval(t: Any, w: Any): Any =
    TextKernels.wordHits(t.asInstanceOf[UTF8String], w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.functions.TextKernels.wordHits($t, $w)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordHits =
    copy(left = l, right = r)
}

case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullSafeEval(t: Any, n: Any): Any =
    TextKernels.shingles(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextKernels.shingles($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordShingles =
    copy(left = l, right = r)
}

case class ShingleMinHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_minhash"
  override def nullSafeEval(t: Any, n: Any, k: Any): Any =
    TextKernels.shingleMinhash(t.asInstanceOf[UTF8String], n.asInstanceOf[Int],
      k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n, k) => s"graft.functions.TextKernels.shingleMinhash($t, $n, $k)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ShingleMinHash =
    copy(first = f, second = s, third = t)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(t: Any): Any =
    TextKernels.simhash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.simhash($t)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"
  override def nullSafeEval(t: Any): Any =
    TextKernels.charEntropy(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.charEntropy($t)")
  override protected def withNewChildInternal(c: Expression): CharEntropy = copy(child = c)
}

case class DupGramsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DupGramsExpr.schema
  override def prettyName: String = "graft_dup_grams"
  override def nullSafeEval(t: Any, n: Any): Any =
    TextKernels.dupGrams(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextKernels.dupGrams($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DupGramsExpr =
    copy(left = l, right = r)
}

object DupGramsExpr {
  val schema: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))
}

case class TopGramExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = TopGramExpr.schema
  override def prettyName: String = "graft_top_gram"
  override def nullSafeEval(t: Any, n: Any): Any =
    TextKernels.topGram(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextKernels.topGram($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopGramExpr =
    copy(left = l, right = r)
}

object TopGramExpr {
  val schema: StructType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))
}

case class CharNgramsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"
  override def nullSafeEval(t: Any, n: Any): Any =
    TextKernels.charNgrams(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextKernels.charNgrams($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharNgramsExpr =
    copy(left = l, right = r)
}

case class WinnowExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = WinnowExpr.schema
  override def prettyName: String = "graft_winnow"
  override def nullSafeEval(t: Any, k: Any, w: Any): Any =
    TextKernels.winnow(t.asInstanceOf[UTF8String], k.asInstanceOf[Int],
      w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k, w) => s"graft.functions.TextKernels.winnow($t, $k, $w)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowExpr =
    copy(first = f, second = s, third = t)
}

object WinnowExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)
}

object TextExprs {
  private def str(e: Expression): Expression = Cast(e, StringType)
  private def int(e: Expression): Expression = Cast(e, IntegerType)

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_word_hits" -> (es => WordHits(str(es(0)), str(es(1)))),
    "graft_shingles" -> (es => WordShingles(str(es(0)), int(es(1)))),
    "graft_shingle_minhash" ->
      (es => ShingleMinHash(str(es(0)), int(es(1)), int(es(2)))),
    "graft_simhash" -> (es => SimHash64(str(es(0)))),
    "graft_char_ngrams" -> (es => CharNgramsExpr(str(es(0)), int(es(1)))),
    "graft_top_gram" -> (es => TopGramExpr(str(es(0)), int(es(1)))),
    "graft_dup_grams" -> (es => DupGramsExpr(str(es(0)), int(es(1)))),
    "graft_winnow" -> (es => WinnowExpr(str(es(0)), int(es(1)), int(es(2)))),
    "graft_char_entropy" -> (es => CharEntropy(str(es(0)))),
    "graft_jaro_winkler" -> (es => JaroWinklerExpr(str(es(0)), str(es(1)))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** One-stop registration for every graft SQL function. Idempotent and
  * cheap — called by Verify/Bench/Pipeline session setup and by the
  * table readers in SparkEntry. Registration happens ONCE per session:
  * re-registering on every query call made `SimpleFunctionRegistry`
  * log a "replaced a previously registered function" WARN per function
  * per query, polluting every bench/verify artifact tail.
  */
object GraftFunctions {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def registerAll(spark: SparkSession): Unit = registered.synchronized {
    if (registered.add(spark)) {
      VectorExprs.register(spark)
      TextExprs.register(spark)
      GoFloatString.register(spark)
      JqNumberString.register(spark)
      JqText.register(spark)
      JqArith.register(spark)
      EvalOnce.register(spark)
      GroupRuns.register(spark)
    }
  }

  /** Every graft SQL function as (name, builder) — the single source
    * both [[registerAll]] and [[GraftExtensions]] draw from.
    */
  private[functions] def allBuilders
      : Seq[(String, Seq[Expression] => Expression)] =
    VectorExprs.builders ++ TextExprs.builders ++
      GoFloatString.builders ++ JqNumberString.builders ++
      JqText.builders ++ JqArith.builders ++
      EvalOnce.builders ++ GroupRuns.builders
}

/** `spark.sql.extensions`-style entry point: inject every graft
  * function at session build, the idiomatic way a Spark library ships
  * its surface —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   // or: .withExtensions(new GraftExtensions)
  * }}}
  *
  * makes `graft_simhash`, `graft_char_entropy`, `go_float_str`, …
  * resolvable from any `spark.sql`/`expr` string with no explicit
  * `GraftFunctions.registerAll` call.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.allBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
}
