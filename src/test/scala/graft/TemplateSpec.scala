package graft

import graft.transform.Template

class TemplateSpec extends SparkSuite {
  import spark.implicits._

  private def rec = Seq(("group_1", 1500L, "v", "", "0"))
    .toDF("__METADATA__group_id", "idx", "x", "empty", "zeroStr")

  private def render(tpl: String): String =
    rec.select(Template.compile(tpl).as("out")).as[String].head()

  test("plain text passes through; {{ }} untouched (reference compiler_test)") {
    assert(render("file:///out/part.json") == "file:///out/part.json")
    assert(render("keep {{ .this }} alone") == "keep {{ .this }} alone")
  }

  test("field interpolation — RFC 007 grouped-destination example") {
    assert(render("file:///out/file_[[ .__METADATA__group_id ]].json")
      == "file:///out/file_group_1.json")
  }

  test("mul/div batch-step split — OSS sink legacy batch (ext/oss/sink.go:52-58)") {
    assert(render("f_[[ mul (div .idx 1000) 1000 ]].json") == "f_1000.json")
  }

  test("string functions") {
    assert(render("[[ upper .__METADATA__group_id ]]") == "GROUP_1")
    assert(render("[[ lower \"ABC\" ]]") == "abc")
    assert(render("[[ add .idx 1 ]]|[[ sub .idx 500 ]]|[[ mod .idx 7 ]]") == "1501|1000|2")
  }

  test("isDynamic detects [[ ]] sections") {
    assert(Template.isDynamic("a_[[ .x ]]"))
    assert(!Template.isDynamic("static.json"))
  }

  test("pipelines desugar with the piped value as last arg (text/template semantics)") {
    assert(render("[[ .__METADATA__group_id | upper ]]") == "GROUP_1")
    assert(render("[[ .empty | default \"fallback\" ]]") == "fallback")
    assert(render("[[ .__METADATA__group_id | default \"x\" | upper ]]") == "GROUP_1")
    // the STRING "0" is a legitimate value, not sprig's numeric zero —
    // the Column path must not swallow it
    assert(render("[[ .zeroStr | default \"swallowed\" ]]") == "0")
  }

  test("sprig subset — string functions (Column path)") {
    assert(render("[[ replace \"_\" \"-\" .__METADATA__group_id ]]") == "group-1")
    assert(render("[[ trunc 5 .__METADATA__group_id ]]") == "group")
    assert(render("[[ trunc -1 .__METADATA__group_id ]]") == "1")
    assert(render("[[ substr 0 5 .__METADATA__group_id ]]") == "group")
    assert(render("[[ .__METADATA__group_id | title ]]") == "Group_1")
    assert(render("[[ repeat 3 \"ab\" ]]") == "ababab")
    assert(render("[[ trimPrefix \"group_\" .__METADATA__group_id ]]") == "1")
    assert(render("[[ trimSuffix \"_1\" .__METADATA__group_id ]]") == "group")
    assert(render("[[ quote .__METADATA__group_id ]]") == "\"group_1\"")
    assert(render("[[ b64enc .__METADATA__group_id ]]") == "Z3JvdXBfMQ==")
    assert(render("[[ b64dec \"Z3JvdXBfMQ==\" ]]") == "group_1")
    assert(render("[[ nospace \"a b  c\" ]]") == "abc")
    assert(render("[[ abbrev 6 .__METADATA__group_id ]]") == "gro...")
    assert(render("[[ ternary \"yes\" \"no\" (hasPrefix \"group\" .__METADATA__group_id) ]]")
      == "yes")
    assert(render("[[ snakecase \"someValue X\" ]]") == "some_value_x")
    assert(render("[[ kebabcase \"someValue\" ]]") == "some-value")
  }

  test("sprig subset — math and date functions (Column path)") {
    assert(render("[[ max .idx 2000 ]]") == "2000")
    assert(render("[[ min .idx 2000 ]]") == "1500")
    assert(render("[[ date \"2006-01-02\" (toDate \"2006-01-02 15:04:05\" \"2026-08-12 10:30:00\") ]]")
      == "2026-08-12")
    assert(render(
      "[[ date \"2006-01-02 15:04\" (dateModify \"-1h30m\" (toDate \"2006-01-02 15:04:05\" \"2026-08-12 10:30:00\")) ]]")
      == "2026-08-12 09:00")
    assert(render("[[ unixEpoch (toDate \"2006-01-02\" \"1970-01-02\") ]]") == "86400")
  }

  test("sprig subset — driver render mirror") {
    val vals = Map[String, Any]("name" -> "someValue", "n" -> 0L, "s" -> "a_b")
    assert(Template.render("[[ .n | default 42 ]]", vals) == "42")
    assert(Template.render("[[ .missing | default \"d\" | upper ]]", vals) == "D")
    assert(Template.render("[[ replace \"_\" \"-\" .s ]]", vals) == "a-b")
    assert(Template.render("[[ trunc 4 .name ]]", vals) == "some")
    assert(Template.render("[[ snakecase .name ]]", vals) == "some_value")
    assert(Template.render("[[ sha256sum \"abc\" ]]", vals)
      == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(Template.render("[[ ternary \"t\" \"f\" (contains \"_\" .s) ]]", vals) == "t")
    assert(Template.render(
      "[[ date \"2006/01/02\" (toDate \"2006-01-02\" \"2026-08-12\") ]]", vals)
      == "2026/08/12")
    assert(Template.render("[[ b64enc .s | b64dec ]]", vals) == "a_b")
  }

  test("round-4 sprig breadth: Column path and driver render agree") {
    // one row whose fields exercise strings, numbers, and emptiness
    val df = Seq(("alpha_beta gamma", 6L, "", "a,b,a,,c"))
      .toDF("name", "n", "e", "csv")
    val vals = Map[String, Any](
      "name" -> "alpha_beta gamma", "n" -> 6L, "e" -> "", "csv" -> "a,b,a,,c")
    def both(tpl: String): (String, String) = (
      df.select(Template.compile(tpl).as("out")).as[String].head(),
      Template.render(tpl, vals))
    val cases = Seq(
      "[[ ternary \"y\" \"n\" (empty .e) ]]" -> "y",
      "[[ ternary \"y\" \"n\" (empty .name) ]]" -> "n",
      "[[ atoi \"42\" ]]" -> "42",
      "[[ float64 .n ]]" -> "6.0", // field ref → Column DoubleType renders 6.0; driver show() gives Go "6"
      // constant float sections FOLD through the driver evaluator →
      // Go float rendering ("6", not "6.0") on BOTH paths
      "[[ addf 1 2 3 ]]" -> "6",
      "[[ subf 10 3 2 ]]" -> "5",
      "[[ mulf 2 3 ]]" -> "6",
      "[[ divf 7 2 ]]" -> "3.5",
      "[[ maxf 2 7 ]]" -> "7",
      "[[ minf 2 7 ]]" -> "2",
      "[[ add 1 2 3 ]]" -> "6",
      "[[ add1 .n ]]" -> "7",
      "[[ splitList \",\" .csv | join \"-\" ]]" -> "a-b-a--c",
      "[[ splitList \",\" .csv | sortAlpha | join \"\" ]]" -> "aabc",
      "[[ splitList \",\" .csv | reverse | join \"\" ]]" -> "caba",
      "[[ splitList \",\" .csv | uniq | join \"/\" ]]" -> "a/b//c",
      "[[ splitList \",\" .csv | compact | join \"\" ]]" -> "abac",
      "[[ splitList \",\" .csv | first ]]" -> "a",
      "[[ splitList \",\" .csv | last ]]" -> "c",
      "[[ splitList \",\" .csv | rest | join \",\" ]]" -> "b,a,,c",
      "[[ splitList \",\" .csv | initial | join \",\" ]]" -> "a,b,a,",
      "[[ append (splitList \",\" .csv) \"z\" | join \",\" ]]" -> "a,b,a,,c,z",
      "[[ prepend (splitList \",\" .csv) \"z\" | join \",\" ]]" -> "z,a,b,a,,c",
      "[[ concat (list \"x\") (list \"y\") | join \",\" ]]" -> "x,y",
      "[[ ternary \"in\" \"out\" (has \"b\" (splitList \",\" .csv)) ]]" -> "in",
      "[[ without (splitList \",\" .csv) \"a\" \"\" | join \",\" ]]" -> "b,c",
      "[[ until 4 | join \"+\" ]]" -> "0+1+2+3",
      "[[ untilStep 2 10 3 | join \",\" ]]" -> "2,5,8",
      "[[ seq 3 ]]" -> "1 2 3",
      "[[ seq 0 2 6 ]]" -> "0 2 4 6",
      "[[ plural \"item\" \"items\" .n ]]" -> "items",
      "[[ plural \"item\" \"items\" 1 ]]" -> "item",
      "[[ cat \"a\" .n \"c\" ]]" -> "a 6 c",
      "[[ camelcase \"http_server one\" ]]" -> "HttpServerOne",
      "[[ initials .name ]]" -> "ag",
      "[[ ternary \"m\" \"x\" (regexMatch \"beta\" .name) ]]" -> "m",
      "[[ regexFind \"[a-z]+_[a-z]+\" .name ]]" -> "alpha_beta",
      "[[ regexReplaceAll \"(al)pha\" .name \"${1}PHA\" ]]" -> "alPHA_beta gamma",
      "[[ regexSplit \"[_ ]\" .name -1 | join \".\" ]]" -> "alpha.beta.gamma",
      "[[ sha1sum \"abc\" ]]" -> "a9993e364706816aba3e25717850c26c9cd0d89d",
      "[[ int64 \"7\" ]]" -> "7",
      "[[ toString .n ]]" -> "6")
    cases.foreach { case (tpl, expected) =>
      val (colOut, drvOut) = both(tpl)
      assert(colOut == expected, s"Column path: $tpl")
      // Double rendering differs by design: Column casts through Spark
      // (6.0), driver show() uses Go float formatting (6)
      val goExpected = if (expected.endsWith(".0"))
        expected.dropRight(2) else expected
      assert(drvOut == goExpected, s"driver render: $tpl")
    }
    // indent/nindent (multi-line)
    assert(Template.render("[[ indent 2 \"a\\nb\" ]]",
      Map.empty).isEmpty == false)
    val (ci, di) = both("[[ indent 2 .name ]]")
    assert(ci == "  alpha_beta gamma" && di == ci)
    val (cn, dn) = both("[[ nindent 1 .name ]]")
    assert(cn == "\n alpha_beta gamma" && dn == cn)
  }

  test("typed emptiness parity: 0/false/[] empty in BOTH paths (sprig isEmptyVal)") {
    val df = Seq((0L, 1L, false, true, "0", Seq.empty[String], Seq("a", "a", "b")))
      .toDF("zero", "one", "f", "t", "zeroStr", "emptyArr", "dups")
    val vals = Map[String, Any]("zero" -> 0L, "one" -> 1L, "f" -> false,
      "t" -> true, "zeroStr" -> "0", "emptyArr" -> Seq.empty[String],
      "dups" -> Seq("a", "a", "b"))
    def both(tpl: String): (String, String) = (
      df.select(Template.compile(tpl).as("out")).as[String].head(),
      Template.render(tpl, vals))
    val cases = Seq(
      "[[ ternary \"y\" \"n\" (empty .zero) ]]" -> "y",
      "[[ ternary \"y\" \"n\" (empty .one) ]]" -> "n",
      "[[ ternary \"y\" \"n\" (empty .f) ]]" -> "y",
      "[[ ternary \"y\" \"n\" (empty .t) ]]" -> "n",
      // the STRING "0" is a legitimate id, not sprig's numeric zero
      "[[ ternary \"y\" \"n\" (empty .zeroStr) ]]" -> "n",
      "[[ ternary \"y\" \"n\" (empty .emptyArr) ]]" -> "y",
      "[[ .zero | default 42 ]]" -> "42",
      "[[ .f | default \"d\" ]]" -> "d",
      "[[ .zeroStr | default \"d\" ]]" -> "0",
      "[[ coalesce .zero .one ]]" -> "1",
      // without filters (sprig), it does NOT set-diff: duplicate
      // survivors are preserved (array_except would dedupe to "a")
      "[[ without .dups \"b\" | join \",\" ]]" -> "a,a",
      // compact drops numeric zeros like the driver mirror
      "[[ list .zero .one .zero | compact | join \",\" ]]" -> "1")
    cases.foreach { case (tpl, expected) =>
      val (colOut, drvOut) = both(tpl)
      assert(colOut == expected, s"Column path: $tpl")
      assert(drvOut == expected, s"driver render: $tpl")
    }
  }

  test("go layout and duration conversion") {
    assert(Template.goLayoutToJava("2006-01-02T15:04:05Z07:00")
      == "yyyy-MM-dd'T'HH:mm:ssXXX")
    assert(Template.goLayoutToJava("Jan 02 2006 03:04 PM")
      == "MMM dd yyyy hh:mm a")
    assert(Template.goDurationSeconds("1h30m") == 5400L)
    assert(Template.goDurationSeconds("-15m") == -900L)
    assert(Template.goDurationSeconds("90s") == 90L)
  }

  test("driver-side render against a value map (compiler.Compile path)") {
    val vals = Map[String, Any]("name" -> "ab", "n" -> 7L, "score" -> 0.5)
    assert(Template.render("hello [[ upper .name ]]-[[ add .n 1 ]]", vals)
      == "hello AB-8")
    assert(Template.render("v=[[ .score ]]", vals) == "v=0.5")
    // Go text/template renders missing fields as <no value>
    assert(Template.render("[[ .missing ]]", vals) == "<no value>")
    assert(Template.render("[[ printf \"%s_%d\" .name .n ]]", vals) == "ab_7")
    assert(Template.render("static {{ untouched }}", vals) == "static {{ untouched }}")
  }

  test("round-6 sprig tranche: dict family, chunk/slice, case, url, sha512 — both paths agree") {
    val df = Seq(("alpha beta", "x", Seq("a", "b", "c", "d", "e"),
      "https://u1@files.example:2222/a/b?q=1#frag"))
      .toDF("name", "x", "arr", "url")
    val vals = Map[String, Any]("name" -> "alpha beta", "x" -> "x",
      "arr" -> Seq("a", "b", "c", "d", "e"),
      "url" -> "https://u1@files.example:2222/a/b?q=1#frag")
    def both(tpl: String): (String, String) = (
      df.select(Template.compile(tpl).as("out")).as[String].head(),
      Template.render(tpl, vals))
    val cases = Seq(
      // dict family (sprig dict.go); get on maps, set/unset round trips
      "[[ get (dict \"a\" .x \"b\" \"2\") \"a\" ]]" -> "x",
      "[[ get (dict \"a\" \"1\") \"missing\" ]]" -> "",
      "[[ get (set (dict \"a\" \"1\") \"a\" \"9\") \"a\" ]]" -> "9",
      "[[ get (set (dict \"a\" \"1\") \"b\" \"2\") \"b\" ]]" -> "2",
      "[[ get (unset (dict \"a\" \"1\" \"b\" \"2\") \"a\") \"b\" ]]" -> "2",
      "[[ ternary \"y\" \"n\" (hasKey (dict \"a\" \"1\") \"a\") ]]" -> "y",
      "[[ ternary \"y\" \"n\" (hasKey (dict \"a\" \"1\") \"z\") ]]" -> "n",
      "[[ sortAlpha (keys (dict \"b\" \"2\" \"a\" \"1\")) ]]" -> "[a b]",
      "[[ sortAlpha (values (dict \"b\" \"2\" \"a\" \"1\")) ]]" -> "[1 2]",
      "[[ pluck \"k\" (dict \"k\" \"v1\") (dict \"x\" \"n\") (dict \"k\" \"v2\") ]]" -> "[v1 v2]",
      // merge: dst wins on conflict
      "[[ get (merge (dict \"a\" \"dst\") (dict \"a\" \"src\" \"b\" \"2\")) \"a\" ]]" -> "dst",
      "[[ get (merge (dict \"a\" \"dst\") (dict \"a\" \"src\" \"b\" \"2\")) \"b\" ]]" -> "2",
      // lists
      "[[ chunk 2 .arr ]]" -> "[[a b] [c d] [e]]",
      "[[ slice .arr 1 3 ]]" -> "[b c]",
      "[[ slice .arr 3 ]]" -> "[d e]",
      // strings
      "[[ swapcase \"aB c9\" ]]" -> "Ab C9",
      "[[ untitle \"Alpha Beta\" ]]" -> "alpha beta",
      "[[ sha512sum \"abc\" ]]" ->
        ("ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
          "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"),
      // url parsing
      "[[ get (urlParse .url) \"scheme\" ]]" -> "https",
      "[[ get (urlParse .url) \"host\" ]]" -> "files.example",
      "[[ get (urlParse .url) \"path\" ]]" -> "/a/b",
      "[[ get (urlParse .url) \"query\" ]]" -> "q=1",
      "[[ get (urlParse .url) \"fragment\" ]]" -> "frag",
      "[[ get (urlParse .url) \"userinfo\" ]]" -> "u1")
    cases.foreach { case (tpl, want) =>
      val (c, d) = both(tpl)
      assert(c == want, s"Column path: $tpl -> '$c', want '$want'")
      assert(d == want, s"driver path: $tpl -> '$d', want '$want'")
    }
    // driver-side Go map rendering (fmt prints maps key-sorted)
    assert(Template.render("[[ dict \"b\" \"2\" \"a\" \"1\" ]]", vals)
      == "map[a:1 b:2]")
  }

  test("round-7 sprig tranche: pick/omit/mergeOverwrite/dig/all/any/fromJson/pretty/b32") {
    val df = Seq(("x", "1")).toDF("x", "one")
    val vals = Map[String, Any]("x" -> "x", "one" -> "1")
    def both(tpl: String): (String, String) = (
      df.select(Template.compile(tpl).as("out")).as[String].head(),
      Template.render(tpl, vals))
    val cases = Seq(
      "[[ pick (dict \"a\" \"1\" \"b\" \"2\" \"c\" \"3\") \"a\" \"c\" ]]" -> "map[a:1 c:3]",
      "[[ omit (dict \"a\" \"1\" \"b\" \"2\" \"c\" \"3\") \"b\" ]]" -> "map[a:1 c:3]",
      // mergeOverwrite: LAST src wins (inverse of merge)
      "[[ get (mergeOverwrite (dict \"a\" \"dst\") (dict \"a\" \"src\")) \"a\" ]]" -> "src",
      // sprig all/any go through empty(): any NON-empty string is
      // true ("false" the string included); "" and 0 are false
      "[[ ternary \"y\" \"n\" (all \"a\" \"b\") ]]" -> "y",
      "[[ ternary \"y\" \"n\" (all \"a\" \"\") ]]" -> "n",
      "[[ ternary \"y\" \"n\" (all \"false\" 1) ]]" -> "y",
      "[[ ternary \"y\" \"n\" (any \"\" \"x\") ]]" -> "y",
      "[[ ternary \"y\" \"n\" (any \"\" 0) ]]" -> "n")
    cases.foreach { case (tpl, want) =>
      val (c, d) = both(tpl)
      assert(c == want, s"Column path: $tpl -> '$c', want '$want'")
      assert(d == want, s"driver path: $tpl -> '$d', want '$want'")
    }
    // driver-complete functions (constant-fold on the Column path too,
    // because literal-only sections run the driver evaluator); the
    // JSON arrives as a record field — the template string-literal
    // grammar (like the reference's) has no escaped-quote form
    val jvals = vals + ("js" -> """{"o":{"i":"v"}}""")
    assert(Template.render("[[ dig \"o\" \"i\" \"d\" (fromJson .js) ]]", jvals) == "v")
    assert(Template.render("[[ dig \"o\" \"missing\" \"d\" (fromJson .js) ]]", jvals) == "d")
    assert(Template.render("[[ get (fromJson .js) \"o\" ]]", jvals) == "map[i:v]")
    assert(Template.render("[[ b32enc \"hi\" ]]", vals) == "NBUQ====")
    assert(Template.render("[[ b32dec \"NBUQ====\" ]]", vals) == "hi")
    assert(Template.render("[[ toPrettyJson (dict \"a\" \"1\") ]]", vals)
      == "{\n  \"a\": \"1\"\n}")
    // Column path with literal args constant-folds driver-complete fns
    assert(df.select(Template.compile("[[ b32enc \"hi\" ]]").as("o"))
      .as[String].head() == "NBUQ====")
  }

  test("semver family + adler32; literal sections constant-fold on the Column path") {
    import graft.transform.Semver
    // precedence (semver 2.0 §11)
    assert(Semver.compare(Semver.parse("1.2.3"), Semver.parse("1.2.3")) == 0)
    assert(Semver.compare(Semver.parse("1.10.0"), Semver.parse("1.9.9")) > 0)
    assert(Semver.compare(Semver.parse("1.0.0-alpha"), Semver.parse("1.0.0")) < 0)
    assert(Semver.compare(Semver.parse("1.0.0-alpha.1"), Semver.parse("1.0.0-alpha.beta")) < 0)
    assert(Semver.compare(Semver.parse("1.0.0-rc.1+build5"), Semver.parse("1.0.0-rc.1")) == 0)
    // constraint grammar
    assert(Semver.matches("^1.2.3", "1.9.9") && !Semver.matches("^1.2.3", "2.0.0"))
    assert(Semver.matches("^0.2.3", "0.2.9") && !Semver.matches("^0.2.3", "0.3.0"))
    assert(Semver.matches("^0.0.3", "0.0.3") && !Semver.matches("^0.0.3", "0.0.4"))
    assert(Semver.matches("~1.2.3", "1.2.9") && !Semver.matches("~1.2.3", "1.3.0"))
    assert(Semver.matches(">=1.2.3 <2.0.0", "1.5.0"))
    assert(!Semver.matches(">=1.2.3 <2.0.0", "2.1.0"))
    assert(Semver.matches("1.2.x", "1.2.7") && !Semver.matches("1.2.x", "1.3.0"))
    assert(Semver.matches(">=1.2.x", "1.3.0") && !Semver.matches("<1.x", "1.3.0"))
    // Masterminds prerelease exclusion: constraints without a prerelease
    // never admit prerelease versions
    assert(!Semver.matches(">=1.0.0", "1.1.0-alpha"))
    assert(!Semver.matches("*", "1.1.0-alpha"))
    assert(Semver.matches(">=1.0.0-0", "1.1.0-alpha"))
    // a hyphen in BUILD METADATA is not a prerelease marker
    assert(!Semver.matches(">=1.0.0+build-1", "1.1.0-alpha"))
    assert(Semver.matches("=1.2.3-alpha", "1.2.3-alpha"))
    assert(!Semver.matches("!=1.2.3", "1.2.4-beta"))
    assert(Semver.matches("<2 || >3.1", "1.0.0"))
    assert(Semver.matches("<2 || >3.1", "3.2.0"))
    assert(!Semver.matches("<2 || >3.1", "2.5.0"))
    assert(Semver.matches("!=1.2.3", "1.2.4") && !Semver.matches("!=1.2.3", "1.2.3"))
    // template surface, both paths (Column folds the literal section)
    val df = Seq(Tuple1("r")).toDF("x")
    def render(tpl: String): String =
      df.select(Template.compile(tpl).as("out")).as[String].head()
    assert(render("[[ semverCompare \"^1.2\" \"1.4.0\" ]]") == "true")
    assert(Template.render("[[ semverCompare \"^1.2\" \"1.4.0\" ]]", Map.empty) == "true")
    assert(render("[[ get (semver \"1.2.3-rc.1\") \"Minor\" ]]") == "2")
    assert(render("[[ get (semver \"1.2.3-rc.1\") \"Prerelease\" ]]") == "rc.1")
    assert(render("[[ adler32sum \"abc\" ]]") == "38600999")
    assert(Template.render("[[ adler32sum \"abc\" ]]", Map.empty) == "38600999")
    // folded sections compile to literals in the plan
    val plan = df.select(Template.compile("[[ adler32sum \"abc\" ]]"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("38600999"), plan)
    // per-record args keep the loud driver-only error
    val e = intercept[IllegalArgumentException](
      df.select(Template.compile("[[ adler32sum .x ]]")).collect())
    assert(e.getMessage.contains("driver-complete"))
  }

  test("round-8 sprig breadth: zones/durations/paths/regex/flow, Column-driver parity") {
    val df = Seq(("/a/b/c.tar.gz", 3723L, "x2y", "foo bar baz qux", "0755",
      java.sql.Timestamp.valueOf("2026-08-12 10:30:00"),
      "https://u@example.com/p?q=1#frag"))
      .toDF("p", "secs", "s", "words", "oct", "ts", "u")
    val vals = Map[String, Any]("p" -> "/a/b/c.tar.gz", "secs" -> 3723L,
      "s" -> "x2y", "words" -> "foo bar baz qux", "oct" -> "0755",
      "ts" -> java.time.Instant.parse("2026-08-12T10:30:00Z"),
      "u" -> "https://u@example.com/p?q=1#frag")
    def col(tpl: String): String =
      df.select(Template.compile(tpl).as("o")).as[String].head()
    def drv(tpl: String): String = Template.render(tpl, vals)
    def both(tpl: String, want: String): Unit = {
      assert(drv(tpl) == want, s"driver: $tpl")
      assert(col(tpl) == want, s"column: $tpl")
    }
    // Go path family (field args exercise the Column mirrors)
    both("[[ base .p ]]", "c.tar.gz")
    both("[[ dir .p ]]", "/a/b")
    both("[[ ext .p ]]", ".gz")
    both("[[ isAbs .p ]]", "true")
    both("[[ osBase .p ]]", "c.tar.gz")
    both("[[ clean \"/a//b/../c/.\" ]]", "/a/c") // driver-complete, folds
    both("[[ dir \"x\" ]]", ".")
    // durations (Go time.Duration forms)
    both("[[ duration .secs ]]", "1h2m3s")
    both("[[ durationRound .secs ]]", "1h")
    both("[[ duration 59 ]]", "59s")
    assert(drv("[[ durationRound \"2h10m5s\" ]]") == "2h")
    assert(col("[[ durationRound \"2h10m5s\" ]]") == "2h") // literal folds
    // date zones (session tz is UTC; Jakarta = UTC+7)
    both("[[ dateInZone \"2006-01-02 15:04\" .ts \"Asia/Jakarta\" ]]",
      "2026-08-12 17:30")
    both("[[ htmlDate .ts ]]", "2026-08-12")
    both("[[ htmlDateInZone .ts \"Asia/Jakarta\" ]]", "2026-08-12")
    // regex family
    both("[[ regexFindAll \"[0-9]\" .s -1 ]]", "[2]")
    both("[[ regexReplaceAllLiteral \"ba.\" .words \"Z\" ]]", "foo Z Z qux")
    both("[[ regexQuoteMeta \"a.b*\" ]]", "a\\.b\\*")
    // wrap (driver-complete; literals fold on the Column path)
    both("[[ wrap 7 \"foo bar baz qux\" ]]", "foo bar\nbaz qux")
    both("[[ wrapWith 7 \", \" \"foo bar baz qux\" ]]", "foo bar, baz qux")
    assert(drv("[[ wrap 7 .words ]]") == "foo bar\nbaz qux")
    // conversions / flow
    both("[[ toDecimal .oct ]]", "493")
    both("[[ required \"need p\" .p ]]", "/a/b/c.tar.gz")
    val rq = intercept[IllegalArgumentException](
      Template.render("[[ required \"need it\" \"\" ]]", vals))
    assert(rq.getMessage == "need it")
    intercept[Exception](col("[[ fail \"boom\" ]]"))
    // urlJoin inverts urlParse on both paths
    both("[[ urlJoin (urlParse .u) ]]", "https://u@example.com/p?q=1#frag")
    // split/splitn dicts, len, kind introspection
    both("[[ split \"2\" .s ]]", "map[_0:x _1:y]")
    both("[[ splitn \"-\" 2 \"a-b-c\" ]]", "map[_0:a _1:b-c]")
    both("[[ len .p ]]", "13")
    both("[[ len (splitList \"2\" .s) ]]", "2")
    // a missing value has length 0, not the length of "<no value>"
    assert(drv("[[ len .missing ]]") == "0")
    // a container-typed record FIELD fails loudly on the Column path
    // instead of silently measuring its stringified form
    val arrDf = spark.range(1).selectExpr("array('a','b') AS tags")
    val lenErr = intercept[Exception] {
      arrDf.select(Template.compile("[[ len .tags ]]")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(lenErr).exists(_.contains("driver-complete")))
    both("[[ kindOf .secs ]]", "int64")
    both("[[ kindOf .p ]]", "string")
    both("[[ kindIs \"string\" .p ]]", "true")
  }
}
