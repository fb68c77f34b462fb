package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextOps}

/** Pins the compiled kernel expressions (graft.functions.TextKernels /
  * VectorKernels) to their contract: exact counts, HOF-equivalent
  * semantics, and null behavior.
  */
class KernelSpec extends SparkSuite {
  import spark.implicits._

  test("jaroWinkler kernel pins the DuckDB-parity reference values") {
    import graft.functions.TextKernels
    def jw(a: String, b: String): Double =
      TextKernels.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // values produced by DuckDB jaro_winkler_similarity, bit-exact
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334) // >0.7, prefix 0
    assert(jw("DwAyNE", "DuANE") == 0.8400000000000001) // case-sensitive
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB convention, not textbook 1
    assert(jw("a", "b") == 0.0)
    // SQL surface evaluates the same kernel
    val viaSql = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b) AS s").as[Double].head()
    assert(viaSql == 0.9611111111111111)
  }

  test("wordHits counts adjacent repeats exactly") {
    val df = Seq("the the cat", "the cat the", "a the  the b", "nothe the").toDF("t")
    val got = df.select(TextOps.wordHits($"t", "the")).as[Long].collect().toSeq
    assert(got == Seq(2L, 2L, 2L, 1L))
  }

  test("wordSetHits = sum of individual word hits for distinct words") {
    val df = Seq("the cat and the dog and a bird").toDF("t")
    val set = df.select(TextOps.wordSetHits($"t", Seq("the", "and", "a"))).as[Long].head()
    val sum = df.select(
      TextOps.wordHits($"t", "the") + TextOps.wordHits($"t", "and") +
        TextOps.wordHits($"t", "a")).as[Long].head()
    assert(set == 5L && set == sum)
  }

  test("wordHits handles utf-8 markers and empty/no-match text") {
    val df = Seq("我 是 的 的", "plain english only", "").toDF("t")
    val got = df.select(TextOps.wordHits($"t", "的")).as[Long].collect().toSeq
    assert(got == Seq(2L, 0L, 0L))
  }

  test("shingles kernel: distinct n-grams with short-doc fallback") {
    val df = Seq("a b c d", "a b", "a b a b c").toDF("t")
    val got = df.select(Dedup.shingles($"t", 3)).as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b")) // < n tokens -> whole text
    assert(got(2).toSet == Set("a b a", "b a b", "a b c")) // distinct
  }

  test("charNgrams kernel matches substr windows (incl. short text)") {
    val df = Seq("abcd", "ab", "héllo").toDF("t")
    val got = df.select(TextOps.charNgrams($"t", 3)).as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("abc", "bcd"))
    assert(got(1) == Seq("ab")) // shorter than n -> whole text
    assert(got(2) == Seq("hél", "éll", "llo")) // code-point windows
  }

  test("minhash signature: deterministic, order-insensitive in duplicate grams") {
    val df = Seq(("x", "a b c d e"), ("y", "a b c d e"), ("z", "q w e r t")).toDF("id", "t")
    val sigs = df.select($"id", Dedup.minhashSignature($"t", 2, 16).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sigs("x") == sigs("y"))
    assert(sigs("x") != sigs("z"))
    assert(sigs("x").length == 16)
  }

  test("simhash: identical docs equal; near-identical docs near in hamming") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val df = Seq(("a", base), ("b", base), ("c", base.replace("tok30", "changed")),
      ("d", (1 to 60).map(i => s"other$i").mkString(" "))).toDF("id", "t")
    val sigs = df.select($"id", Dedup.simhash($"t").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sigs("a") == sigs("b"))
    assert(java.lang.Long.bitCount(sigs("a") ^ sigs("c")) <= 16)
    assert(java.lang.Long.bitCount(sigs("a") ^ sigs("d")) > 16)
  }

  test("cosine kernel: exact value, null element -> null") {
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0))).toDF("a", "b")
    val cos = df.select(Similarity.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(cos - 0.5) < 1e-12)
    val withNull = spark.sql("SELECT graft_cosine(array(1.0, NULL), array(1.0, 1.0)) AS c")
    assert(withNull.filter($"c".isNull).count() == 1)
  }

  test("vector kernels return null on dimension mismatch (not a partial result)") {
    val out = spark.sql(
      """SELECT graft_dot(array(1.0, 2.0), array(1.0)) AS d,
        |       graft_cosine(array(1.0, 2.0), array(1.0)) AS c,
        |       graft_l2sq(array(1.0, 2.0), array(1.0)) AS l""".stripMargin)
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  test("tokenizer treats tabs/newlines/repeated spaces like TextOps.tokens") {
    // shingle stream must match split(trim(text), "\\s+") semantics:
    // tabs and newlines separate tokens, empty runs are skipped, and the
    // canonical gram joins with a single space either way
    val df = Seq("a\tb\nc  d", "a b c d").toDF("t")
    val got = df.select(Dedup.shingles($"t", 2)).as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(0) == got(1))
    // minhash/simhash agree across whitespace variants of the same text
    val sigs = Seq(("ws", "x\ty\nz"), ("sp", "x y z")).toDF("id", "t")
      .select($"id", Dedup.minhashSignature($"t", 2, 8).as("m"), Dedup.simhash($"t").as("s"))
      .as[(String, Seq[Long], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(sigs("ws") == sigs("sp"))
  }

  test("dot kernel matches interpreted fold bit-for-bit") {
    val vec = (1 to 64).map(i => math.sin(i) * i)
    val df = Seq((vec, vec.reverse)).toDF("a", "b")
    val kernel = df.select(Similarity.dot($"a", $"b")).as[Double].head()
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      .as[Double].head()
    assert(kernel == hof)
  }

  test("langIdNgram classifies by trigram-profile overlap, und on no overlap") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "en", "the quick brown fox naps under the lazy dog again and again"),
      (3L, "de", "der schnelle braune fuchs springt wieder wieder einmal vorbei"),
      (4L, "de", "der schnelle braune fuchs schlaeft wieder wieder einmal hier"),
      (5L, "en", "zzz qqq xxx")).toDF("doc_id", "lang", "text")
    val got = TextOps.langIdNgram(docs, "doc_id", "text", "lang")
      .orderBy("doc_id")
      .select("lang_pred_ngram").as[String].collect().toSeq
    assert(got(0) == "en" && got(1) == "en")
    assert(got(2) == "de" && got(3) == "de")
  }

  test("upper/digit counts (the remaining arithmetic stat kernels)") {
    val df = Seq("AbC12de3", "", "XYZ").toDF("t")
    val got = df.select(TextOps.upperCount($"t"), TextOps.digitCount($"t"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L), (0L, 0L), (3L, 0L)))
  }

  test("GraftExtensions injects every function at session build (no registerAll)") {
    import org.apache.spark.sql.SparkSession
    val old = spark
    // force a NEW session (same SparkContext) built through the
    // extensions path, exactly as a library user would configure it
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne old)
      val r = s2.sql(
        """SELECT graft_simhash('hello world') AS h,
          |  graft_char_entropy('aabb') AS e,
          |  go_float_str(CAST(1.5 AS DOUBLE)) AS f,
          |  graft_word_hits('the the cat', 'the') AS w""".stripMargin)
        .collect()(0)
      assert(r.getDouble(1) == 0.693147)
      assert(r.getString(2) == "1.5")
      assert(r.getLong(3) == 2L)
      // same kernel the registerAll path resolves
      graft.functions.GraftFunctions.registerAll(old)
      val viaRegister = old.sql("SELECT graft_simhash('hello world')")
        .collect()(0).getLong(0)
      assert(r.getLong(0) == viaRegister)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
