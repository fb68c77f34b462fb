package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSuite {

  test("nfc composes decomposed sequences; normalized text passes through untouched") {
    import spark.implicits._
    val decomposed = "café"          // e + combining acute
    val composed = "café"             // precomposed é
    val df = Seq((1L, decomposed), (2L, composed), (3L, "ascii"), (4L, ""))
      .toDF("id", "t")
    val out = df.select($"id", graft.ops.TextOps.nfc($"t").as("n"),
        length(graft.ops.TextOps.nfc($"t")).as("len"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == composed, "decomposed must compose")
    assert(out(0).getInt(2) == 4, s"composed length ${out(0).getInt(2)}")
    assert(out(1).getString(1) == composed)
    assert(out(2).getString(1) == "ascii")
    assert(out(3).getString(1) == "")
    // null stays null
    val n = df.select(graft.ops.TextOps.nfc(lit(null).cast("string"))).head()
    assert(n.isNullAt(0))
  }

  test("PII scrubbing redacts emails, URLs, IPs and long digit runs in order") {
    import spark.implicits._
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "docs at https://ex.com/a?b=1#f end",
      "host 192.168.1.100 up",
      "call 5551234567 or 555123 short",
      "clean text stays").toDF("t")
    val out = df.select(graft.ops.TextOps.scrubPii($"t").as("c")).as[String]
      .collect().toSeq
    assert(out == Seq(
      "mail <EMAIL> now",
      "docs at <URL> end",
      "host <IP> up",
      "call <NUM> or 555123 short", // 6 digits: below the 7+ threshold
      "clean text stays"))
  }

  test("int8 quantization round-trips within one level; zero vector is all zeros") {
    import spark.implicits._
    import graft.ops.Quantize
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val packed = Quantize.int8(df, "vec_id", "embedding").orderBy("vec_id").collect()
    val q1 = packed(0).getSeq[Byte](2)
    val s1 = packed(0).getFloat(1)
    assert(q1 == Seq[Byte](64, -127, 32)) // round(x*127/amax), amax=1.0
    // dequantized values within half a level of the originals
    Seq(0.5f, -1.0f, 0.25f).zip(q1).foreach { case (x, q) =>
      assert(math.abs(x - q * s1) <= s1 / 2 + 1e-6)
    }
    assert(packed(1).getSeq[Byte](2) == Seq[Byte](0, 0, 0))
    assert(packed(1).getFloat(1) == 0f)
    // int8 cosine tracks float cosine
    val two = Quantize.int8(
      Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(2.0f, 4.0f, 6.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    val a = two.where("vec_id = 1").select("qvec", "scale").head()
    val b = two.where("vec_id = 2").select("qvec", "scale").head()
    val cos = Seq((a.getSeq[Byte](0), a.getFloat(1), b.getSeq[Byte](0), b.getFloat(1)))
      .toDF("qa", "sa", "qb", "sb")
      .select(Quantize.cosineInt8($"qa", $"sa", $"qb", $"sb").as("c"))
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 0.01) // parallel vectors
  }
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "one two, three! four."),
    (3L, "word")
  ).toDF("doc_id", "text")

  test("token counts") {
    val out = docs.select($"doc_id", TextOps.tokenCountArith($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 6L, 2L -> 4L, 3L -> 1L))
  }

  test("punct count") {
    val out = docs.select($"doc_id", TextOps.punctCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out(2L) == 3L && out(1L) == 0L)
  }

  test("wordHits counts space-delimited occurrences") {
    val out = docs.select($"doc_id", TextOps.wordHits($"text", "the").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L && out(2L) == 0L)
  }

  test("langId picks the marker-scored language deterministically") {
    val d = Seq((1L, "the cat and the dog of note"), (2L, "le chat et les chiens"))
      .toDF("doc_id", "text")
    val out = d.select($"doc_id", TextOps.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "fr")
  }

  test("fingerprint is deterministic and order-sensitive") {
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("doc_id", "text")
    val fp = d.select($"doc_id", TextOps.fingerprint($"text").as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quality score lands in [0,1]") {
    val vals = docs.select(TextOps.qualityScore($"text")).as[Double].collect()
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("mixture sampling: deterministic, weight 1 keeps all, weight 0 drops all") {
    val d = (1L to 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val keepAll = TextOps.mixtureSample(d, "doc_id", "lang", Map("en" -> 1.0, "de" -> 1.0))
    assert(keepAll.count() == 200)
    val dropEn = TextOps.mixtureSample(d, "doc_id", "lang", Map("en" -> 0.0, "de" -> 1.0))
    assert(dropEn.select("lang").distinct().as[String].collect().toSeq == Seq("de"))
    // half-weight keeps a hash-stable subset: same rows on every run
    val h1 = TextOps.mixtureSample(d, "doc_id", "lang", Map("en" -> 0.5), 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val h2 = TextOps.mixtureSample(d, "doc_id", "lang", Map("en" -> 0.5), 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(h1 == h2 && h1.nonEmpty && h1.size < 200)
    // the kept fraction tracks the weight (md5 is uniform)
    val en = h1.count(_ % 2 == 0).toDouble / 100
    assert(en > 0.3 && en < 0.7, s"en fraction $en")
  }

  test("char entropy: kernel matches the hand-computed round-6 ladder") {
    val d = Seq("aabb", "aaaa", "abcd", "aab", "hello world", "")
      .toDF("t")
    val got = d.select(TextOps.charEntropy($"t").as("e")).as[Double]
      .collect().toSeq
    // values from the same ladder computed independently (round-6 LN,
    // exact fixed-point sum, final round 6)
    assert(got == Seq(0.693147, 0.0, 1.386294, 0.636514, 1.972247, 0.0))
    // single-char docs must yield +0.0, not -0.0 (hash parity)
    assert(java.lang.Double.doubleToRawLongBits(got(1)) == 0L)
  }

  test("char entropy counts code points, not bytes (non-ASCII fallback path)") {
    // "éé" is 2 code points / 4 UTF-8 bytes; "é日" exercises the
    // HashMap fallback with a surrogate-free BMP pair
    val d = Seq("éé", "é日", "aéaé").toDF("t")
    val got = d.select(TextOps.charEntropy($"t").as("e")).as[Double]
      .collect().toSeq
    // 1 distinct cp → 0; 2 distinct of 2 → ln 2; 2 distinct of 4 (2+2) → ln 2
    assert(got == Seq(0.0, 0.693147, 0.693147))
  }

  test("C4 rules: each gate trips on its own pathology") {
    val d = Seq(
      (1L, "the quick brown fox jumps over dog"),
      (2L, "x {json} blob here here more words"),
      (3L, "Lorem Ipsum dolor sit amet friend"),
      (4L, "a b"),
      (5L, "pneumonoultramicroscopicsilicovolcanoconiosisx is a very long word test"),
      (6L, "this line ends with a period.")
    ).toDF("doc_id", "text")
    val r = TextOps.c4Rules(d, "doc_id", "text").orderBy("doc_id").collect()
    def row(i: Int) = r(i)
    assert(row(0).getAs[Boolean]("keep"))
    assert(row(0).getAs[Long]("n_tokens") == 7L)
    assert(row(0).getAs[Double]("mean_word_len") == 4.0)
    assert(row(1).getAs[Boolean]("has_brace") && !row(1).getAs[Boolean]("keep"))
    assert(row(2).getAs[Boolean]("has_lorem") && !row(2).getAs[Boolean]("keep"))
    assert(!row(3).getAs[Boolean]("keep")) // 2 tokens, mean len 1
    assert(row(4).getAs[Long]("max_word_len") == 46L)
    assert(!row(4).getAs[Boolean]("keep"))
    assert(row(5).getAs[Boolean]("ends_punct") && row(5).getAs[Boolean]("keep"))
  }

  test("bigram LM NLL: hand-computed model, OOV fallback, short-doc NULLs") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b", "en"),   // ref: bigrams ab, ba, ab
      (2L, "a b c", "en"),     // ref: ab, bc
      (3L, "a b zz", "de"),    // scored only: ab known, (b,zz) OOV bigram
      (4L, "solo", "de"),      // 1 token -> 0 bigrams, NULL scores
      (5L, "", "de")           // split("") = [""] -> 1 token, NULL scores
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.bigramLmNll(d, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect()
    // model from docs 1,2: uni a=3 b=3 c=1, V=3; bi "a b"=3 "b a"=1 "b c"=1
    def term(cu: Long, cb: Long): BigDecimal = BigDecimal(
      math.log(cu + 3.0) - math.log(cb + 1.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ab = term(3, 3); val ba = term(3, 1); val bzz = term(3, 0)
    assert(r(0).getAs[Long]("n_bigrams") == 3L)
    assert(r(0).getAs[Double]("nll") == (ab + ba + ab).toDouble)
    assert(r(0).getAs[Double]("avg_nll") ==
      BigDecimal((ab + ba + ab).toDouble / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 3: known bigram + OOV bigram with known w1
    assert(r(2).getAs[Long]("n_bigrams") == 2L)
    assert(r(2).getAs[Double]("nll") == (ab + bzz).toDouble)
    // short docs: 0 bigrams, NULL nll/avg
    assert(r(3).getAs[Long]("n_bigrams") == 0L && r(3).isNullAt(2) && r(3).isNullAt(3))
    assert(r(4).getAs[Long]("n_bigrams") == 0L && r(4).isNullAt(2))
    // empty reference slice -> all-NULL scores, no crash
    val empty = TextOps.bigramLmNll(d, "doc_id", "text", col("lang") === "xx")
      .orderBy("doc_id").collect()
    assert(empty.length == 5 && empty.forall(_.isNullAt(2)))
    // guard fires before a corpus-sized literal reaches the plan
    val ex = intercept[IllegalArgumentException] {
      TextOps.bigramLmNll(d, "doc_id", "text", col("lang") === "en", maxVocab = 2)
    }
    assert(ex.getMessage.contains("vocabulary"))
  }

  test("dupNgramStats matches brute-force dup counts incl. 0/1-token boundaries") {
    import spark.implicits._
    val d = Seq(
      (1L, ""),           // split(trim("")) = [""] -> 1 token, no grams
      (2L, "solo"),       // 1 token
      (3L, "a b c d"),    // all grams distinct
      (4L, "x x x x"),    // every gram duplicated
      (5L, "a b a b a")   // mixed: tri "a b a" dup, "b a b" unique
    ).toDF("doc_id", "text")
    // duplicate-occurrence count = total occurrences of grams appearing >= 2x
    def brute(text: String, n: Int): (Long, Long) = {
      val ws = text.trim.split("\\s+")
      val grams =
        if (ws.length >= n) ws.sliding(n).map(_.mkString(" ")).toSeq else Seq.empty
      val dup = grams.groupBy(identity).values.map(_.size).filter(_ >= 2).sum
      (grams.size.toLong, dup.toLong)
    }
    val rows = TextOps.dupNgramStats(d, "doc_id", "text").orderBy("doc_id").collect()
    val texts = Map(1L -> "", 2L -> "solo", 3L -> "a b c d", 4L -> "x x x x",
      5L -> "a b a b a")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (bt, bd) = brute(texts(id), 2)
      val (tt, td) = brute(texts(id), 3)
      assert(r.getAs[Long]("bi_total") == bt, s"doc $id bi_total")
      assert(r.getAs[Long]("bi_dup") == bd, s"doc $id bi_dup")
      assert(r.getAs[Long]("tri_total") == tt, s"doc $id tri_total")
      assert(r.getAs[Long]("tri_dup") == td, s"doc $id tri_dup")
      if (bt == 0) assert(r.isNullAt(r.fieldIndex("bi_frac")), s"doc $id bi_frac null")
      else assert(r.getAs[Double]("bi_frac") ==
        BigDecimal(bd.toDouble / bt).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      if (tt == 0) assert(r.isNullAt(r.fieldIndex("tri_frac")), s"doc $id tri_frac null")
      else assert(r.getAs[Double]("tri_frac") ==
        BigDecimal(td.toDouble / tt).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the crash mode that shipped in round 8: every non-empty doc threw
    // INVALID_INDEX_OF_ZERO -- any successful collect above covers it, but
    // pin the all-duplicate row explicitly
    val x = rows(3)
    assert(x.getAs[Long]("bi_dup") == 3L && x.getAs[Double]("bi_frac") == 1.0)
  }

  test("temperatureMixture: w>=1 clamp, alpha endpoints, null stratum") {
    import spark.implicits._
    // 40 'en' docs, 4 'de' docs, 2 null-stratum docs
    val d = ((1L to 40L).map(i => (i, "en")) ++
      (41L to 44L).map(i => (i, "de")) ++
      Seq((45L, null.asInstanceOf[String]), (46L, null.asInstanceOf[String])))
      .toDF("doc_id", "lang")

    // the rarest stratum has weight 1 -> the "g" clamp keeps ALL its rows
    // (every 8-hex md5 prefix sorts below "g")
    val half = TextOps.temperatureMixture(d, "doc_id", "lang", alpha = 0.5)
      .collect()
    val nullKept = half.filter(_.isNullAt(1))
    assert(nullKept.length == 2, "null stratum is the rarest: all rows kept")
    assert(nullKept.forall(_.getAs[Double]("weight") == 1.0))
    // dominant stratum is down-sampled: w = (2/40)^0.5 ~ 0.2236
    val en = half.filter(r => !r.isNullAt(1) && r.getString(1) == "en")
    assert(en.forall(_.getAs[Double]("weight") == 0.223607))
    assert(en.length < 40 && en.nonEmpty)
    assert(half.filter(r => !r.isNullAt(1) && r.getString(1) == "de")
      .forall(_.getAs[Double]("weight") == 0.707107))

    // alpha = 1: natural distribution, every weight clamps to 1, all kept
    val nat = TextOps.temperatureMixture(d, "doc_id", "lang", alpha = 1.0)
    assert(nat.count() == 46L)

    // alpha = 0: full equalization, weight is exactly n_min / n_s
    val eq = TextOps.temperatureMixture(d, "doc_id", "lang", alpha = 0.0)
      .select("lang", "weight").distinct().collect()
      .map(r => (if (r.isNullAt(0)) "NULL" else r.getString(0)) ->
        r.getAs[Double]("weight")).toMap
    assert(eq("en") == 0.05 && eq("de") == 0.5 && eq("NULL") == 1.0)

    intercept[IllegalArgumentException] {
      TextOps.temperatureMixture(d, "doc_id", "lang", alpha = 1.5)
    }
  }

  test("topNgramStats matches brute-force top-gram fractions with lex tie-break") {
    import spark.implicits._
    val texts = Map(
      1L -> "",                 // split(trim("")) = [""] -> 1 token, no grams
      2L -> "solo",             // 1 token
      3L -> "a b c d",          // all distinct: tie on count 1 -> smallest gram
      4L -> "x x x x",          // one gram dominates at every n
      5L -> "a b a b a c d c d" // top bigram "a b" (2) ties "c d" (2) -> "a b"
    )
    val d = texts.toSeq.sortBy(_._1).toDF("doc_id", "text")
    def brute(text: String, n: Int): (Long, Option[Double]) = {
      val ws = text.trim.split("\\s+")
      val chars = ws.mkString(" ").length
      val grams =
        if (ws.length >= n) ws.sliding(n).map(_.mkString(" ")).toSeq else Seq.empty
      if (grams.isEmpty) (0L, None)
      else {
        // max count, tie-break to the lexicographically smallest gram
        val (gram, c) = grams.groupBy(identity).view.mapValues(_.size)
          .toSeq.minBy { case (g, c) => (-c, g) }
        val frac = if (chars == 0) None else Some(
          BigDecimal(c.toDouble * gram.length / chars)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        (c.toLong, frac)
      }
    }
    val rows = TextOps.topNgramStats(d, "doc_id", "text").orderBy("doc_id").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      for (n <- Seq(2, 3, 4)) {
        val (c, frac) = brute(texts(id), n)
        assert(r.getAs[Long](s"top${n}_count") == c, s"doc $id top${n}_count")
        frac match {
          case None => assert(r.isNullAt(r.fieldIndex(s"top${n}_frac")),
            s"doc $id top${n}_frac null")
          case Some(f) => assert(r.getAs[Double](s"top${n}_frac") == f,
            s"doc $id top${n}_frac")
        }
      }
    }
    // pin the tie-break explicitly: doc 5's "a b" and "c d" both occur twice
    val r5 = rows(4)
    // top2 = "a b" x2 over chars("a b a b a c d c d")=17 -> 2*3/17
    assert(r5.getAs[Long]("top2_count") == 2L)
    assert(r5.getAs[Double]("top2_frac") ==
      BigDecimal(6.0 / 17).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private def md5p15(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)

  /** Independent brute-force winnowing (leftmost-min over every
    * window, then distinct) — no deque, no sliding state.
    */
  private def bruteWinnow(text: String, k: Int, w: Int): Seq[(Long, String)] = {
    val cps = text.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Seq.empty
    val hs = (0 until m).map(i => md5p15(new String(cps, i, k)))
    val wins = math.max(1, m - w + 1)
    (0 until wins).map { s =>
      val sel = (s until math.min(s + w, m)).minBy(i => (hs(i), i))
      ((sel + 1).toLong, hs(sel))
    }.distinct
  }

  test("winnow kernel matches the brute-force selection on varied docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaa"), // all grams identical — hash ties everywhere
      (3L, "abcde"), // exactly one gram (m=1 < w)
      (4L, "abcdefg"), // m=3 < w=4 — single whole-doc window
      (5L, "abcd"), // shorter than k — no fingerprints
      (6L, ""), // empty
      (7L, "héllo wörld çafé crème") // non-ASCII code-point positions
    )
    val out = graft.ops.TextOps.winnowFingerprints(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = 5, window = 4)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = docs.flatMap { case (id, t) =>
      bruteWinnow(t, 5, 4).map { case (p, h) => (id, p, h) }
    }.sortBy(x => (x._1, x._2))
    assert(out.toSeq == expected, s"got ${out.toSeq}\nexp $expected")
    assert(out.count(_._1 == 5L) == 0 && out.count(_._1 == 6L) == 0)
    assert(out.count(_._1 == 3L) == 1 && out.count(_._1 == 4L) == 1)
  }

  test("winnow guarantee: a shared substring of length k+w-1 shares a fingerprint") {
    import spark.implicits._
    // k=5, w=4: any common substring of length >= 8 must surface in
    // both documents' fingerprint sets
    val common = "wxyzqprs"
    val docs = Seq(
      (1L, s"first document $common and unrelated tail"),
      (2L, s"totally different head $common closing words")).toDF("doc_id", "text")
    val fps = graft.ops.TextOps.winnowFingerprints(docs, "doc_id", "text", 5, 4)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val shared = fps.filter(_._1 == 1L).map(_._2).toSet
      .intersect(fps.filter(_._1 == 2L).map(_._2).toSet)
    assert(shared.nonEmpty, s"no shared fingerprint: ${fps.toSeq}")
  }

  test("foldHomoglyphs: Cyrillic confusables fold to Latin; NFC does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "рaypal" with a Cyrillic р: canonically DISTINCT from "paypal",
    // so NFC leaves it alone — the fold is what restores equality
    val evil = "рaypal scam" // Cyrillic er + Latin rest
    val df = Seq((1L, evil), (2L, "paypal scam"), (3L, "МОСКВА"))
      .toDF("id", "t")
    val out = df.select(col("id"),
        TextOps.foldHomoglyphs(col("t")).as("f"),
        TextOps.nfc(col("t")).as("n"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out(0)._2 == "paypal scam", out(0))
    assert(out(0)._3 == evil, "NFC must NOT fold confusables")
    assert(out(1)._2 == "paypal scam")
    assert(out(2)._2 == "MOCKBA", out(2)) // uppercase set folds too
  }

  test("readability: hand-computed Flesch-Kincaid grade; fragments floor S at 1") {
    import spark.implicits._
    // "the cat sat." → W=3, S=1, Y=3 → 0.39·3 + 11.8·1 − 15.59 = −2.62
    // "no punctuation here" → W=3, S=1 (floored), Y=7:
    //   o, u-a-io (runs: u, a, io), e-e (e, e)... count runs:
    //   "no"→o; "punctuation"→u,ua,io = 3; "here"→e,e = 2; total 6
    //   → 0.39·3 + 11.8·(6/3) − 15.59 = 9.17
    val df = Seq((1L, "the cat sat."), (2L, "no punctuation here"))
      .toDF("id", "t")
    val out = df.select(col("id"), TextOps.readability(col("t")).as("fk"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out == Seq((1L, r6(0.39 * 3 + 11.8 * (3.0 / 3) - 15.59)),
      (2L, r6(0.39 * 3 + 11.8 * (6.0 / 3) - 15.59))), s"got $out")
  }

  test("featureHash: dims/signs match a JVM md5 replay; repeats sum") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def dimOf(w: String, dims: Int) =
      java.lang.Long.parseLong(md5hex(w).substring(0, 4), 16) % dims
    def signOf(w: String) =
      if (java.lang.Long.parseLong(md5hex(w).substring(4, 5), 16) % 2 == 0)
        1L else -1L
    val df = Seq((1L, "alpha alpha beta")).toDF("doc_id", "text")
    val out = TextOps.featureHash(df, "doc_id", "text", dims = 1024)
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    val want = Seq(
      (1L, dimOf("alpha", 1024), 2L * signOf("alpha")),
      (1L, dimOf("beta", 1024), signOf("beta"))).sortBy(_._2)
    assert(out == want, s"got $out want $want")
  }

  test("colemanLiau: hand counts; sentence runs collapse; fragments floor at 1") {
    import graft.ops.TextOps
    import org.apache.spark.sql.functions.col
    // "The cat. A dog!": 10 letters, 4 tokens, 2 sentence runs →
    // L=250, S=50, CLI = 0.0588*250 - 0.296*50 - 15.8 = -15.9
    val docs = Seq(("s1", "The cat. A dog!"),
      ("s2", "no terminal punctuation here")).toDF("src", "text")
    val out = TextOps.colemanLiau(docs, Seq("src"), "text")
      .orderBy("src")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out.head == (("s1", 1L, 10.0, 4.0, 2.0, -15.9)), s"got $out")
    // fragment: sentences floor at 1 so the index still grades
    val frag = out(1)
    assert(frag._5 == 1.0, s"sentence floor: $frag")
    // an ellipsis run counts once
    val ell = Seq(("s", "Wait... what")).toDF("src", "text")
    val e = TextOps.colemanLiau(ell, Seq("src"), "text")
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    assert(e._5 == 1.0, s"ellipsis run: $e")
  }
}
