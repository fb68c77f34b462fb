package graft

import graft.transform.Jq

class JqSpec extends SparkSuite {
  import spark.implicits._

  private def people = Seq(
    (1L, "alice", 34L, true), (2L, "bob", 28L, false), (3L, "carol", 41L, true)
  ).toDF("id", "name", "age", "active")

  test("identity") {
    assert(Jq.compile(".")(people).collect().toSeq == people.collect().toSeq)
  }

  test("select(.age > 30) — the reference README flagship example") {
    val out = Jq.compile("select(.age > 30)")(people)
    assert(out.select("name").as[String].collect().toSet == Set("alice", "carol"))
  }

  test("compound predicates") {
    val out = Jq.compile("select(.age > 30 and .active == true)")(people)
    assert(out.count() == 2)
    val out2 = Jq.compile("select(.age > 40 or .name == \"bob\")")(people)
    assert(out2.select("name").as[String].collect().toSet == Set("bob", "carol"))
  }

  test("object construction with rename, arithmetic and shorthand") {
    val out = Jq.compile("{who: .name, next_age: (.age + 1), id}")(people)
    assert(out.columns.toSeq == Seq("who", "next_age", "id"))
    assert(out.filter($"who" === "bob").select("next_age").as[Long].head() == 29L)
  }

  test("del drops columns") {
    assert(Jq.compile("del(.active, .age)")(people).columns.toSeq == Seq("id", "name"))
  }

  test(". + {k: expr} merge adds a column") {
    val out = Jq.compile(". + {senior: (.age >= 40)}")(people)
    assert(out.columns.contains("senior"))
    assert(out.filter($"senior").count() == 1)
  }

  test("pipe composition — RFC 007 metadata regrouping shape") {
    val out = Jq.compile(
      "select(.active == true) | {(\"__METADATA__group_id\"): .id, name}")(people)
    assert(out.columns.toSeq == Seq("__METADATA__group_id", "name"))
    assert(out.count() == 2)
  }

  test(".field as stage projects; functions apply") {
    val out = Jq.compile("{n: (.name | ascii_upcase), l: (.name | length)}")(people)
    assert(out.filter($"n" === "ALICE").select("l").as[Int].head() == 5)
  }

  test("array indexing .arr[i] with jq 0-based/negative/out-of-range semantics") {
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("x"))).toDF("id", "tags")
    val out = Jq.compile("{id, first: .tags[0], last: .tags[-1], oob: .tags[5]}")(df)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "a" && out(0).getString(2) == "c" && out(0).isNullAt(3))
    assert(out(1).getString(1) == "x" && out(1).getString(2) == "x")
  }

  test("// alternative operator coalesces") {
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    val out = Jq.compile("{id, v: (.v // \"fallback\")}")(df).orderBy("id").collect()
    assert(out(0).getString(1) == "x")
    assert(out(1).getString(1) == "fallback")
  }

  test(".arr[] explodes scalars") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("c"))).toDF("id", "items")
    val out = Jq.compile(".items[]")(df)
    assert(out.columns.toSeq == Seq("value"))
    assert(out.count() == 3)
  }

  test(".arr[] of objects flattens to columns") {
    val df = Seq((1L, Seq((10L, "x"), (20L, "y")))).toDF("id", "pairs")
    val out = Jq.compile(".pairs[]")(df)
    assert(out.columns.toSeq == Seq("_1", "_2"))
    assert(out.count() == 2)
  }

  test("templated jq: per-record compiled program grouping (connector.go:57-95)") {
    // records route to DIFFERENT programs depending on their own fields
    val df = Seq((1L, 10L, "keep"), (2L, 20L, "keep"), (3L, 30L, "drop"))
      .toDF("id", "v", "mode")
    val out = Jq.applyTemplated(df,
      "select(.mode == \"[[ .mode ]]\") | {id: .id, tag: \"[[ .mode ]]\"}")
    // each slice ran its own program; select matches within each slice
    val rows = out.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "keep"), (2L, "keep"), (3L, "drop")))
    // non-templated program passes through the plain path
    val plain = Jq.applyTemplated(df, ".id")
    assert(plain.columns.toSeq == Seq("id"))
  }

  test("templated jq fails fast when the template is data-cardinality") {
    // a template keyed on a high-cardinality record field would collect
    // one compiled program per row to the driver — the guard bounds it
    val df = spark.range(100).selectExpr("id", "id AS v")
    val e = intercept[IllegalArgumentException] {
      Jq.applyTemplated(df, "{id: .id, k: [[ .v ]]}", maxPrograms = 16)
    }
    assert(e.getMessage.contains("JqEscapeHatch"))
  }

  test("time parsing ladder accepts the reference's formats (util.go:665-711)") {
    import graft.functions.TimeParse
    val df = Seq(
      "2026-08-12T10:30:00+07:00", // RFC3339
      "2026-08-12 10:30:00", // DateTimeFormat
      "2026-08-12", // DateFormat
      "2026-08-12T10:30:00.000-0700", // ISO non-standard
      "definitely not a time")
      .toDF("s")
    val parsed = df.select(TimeParse.parseTime(org.apache.spark.sql.functions.col("s"))
      .as("t")).collect().map(r => Option(r.getTimestamp(0)))
    assert(parsed.take(4).forall(_.isDefined))
    assert(parsed(4).isEmpty) // unparseable → null, not an ANSI throw
    assert(parsed(1).get.toString.startsWith("2026-08-12 10:30:00"))
  }

  // ------------------------------------------------------------------
  // round-8 depth: `..`, try/catch, reduce — each compiled form is
  // checked against the REAL jq binary (JqEscapeHatch) on the same
  // records
  // ------------------------------------------------------------------

  test(".. recursive descent matches real jq byte-for-byte, in order") {
    import graft.transform.JqEscapeHatch
    val one = spark.range(1).selectExpr("1 AS id",
      "named_struct('x', 3, 'tags', array('p', 'q')) AS obj",
      "array(10, 20) AS nums")
    val compiled = Jq.compile("..")(one).as[String].collect().toSeq
    val real = JqEscapeHatch.rawApply(one.toJSON, "..").collect().toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    // multi-row: per-record streams interleave across partitions —
    // compare as multisets
    val many = spark.range(5).selectExpr("id",
      "named_struct('x', id * 2, 'tags', array(concat('t', id))) AS obj",
      "array(id, id + 1) AS nums")
    val c2 = Jq.compile("..")(many).as[String].collect().sorted.toSeq
    val r2 = JqEscapeHatch.rawApply(many.toJSON, "..").collect().sorted.toSeq
    assert(c2 == r2)
  }

  test("try/catch: tonumber errors hit the handler exactly like real jq") {
    import graft.transform.JqEscapeHatch
    val df = Seq(Some("5"), Some("abc"), None, Some("7.5"))
      .toDF("s")
    val prog = "{n: (try (.s | tonumber) catch -1)}"
    val compiled = Jq.compile(prog)(df)
      .select($"n".cast("double")).as[Double].collect().sorted.toSeq
    val real = JqEscapeHatch(df, prog)
      .select($"n".cast("double")).as[Double].collect().sorted.toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    assert(compiled == Seq(-1.0, -1.0, 5.0, 7.5))
    // stage-position `try E` drops erroring records, like jq
    val stage = Jq.compile("try (.s | tonumber)")(df)
      .as[Double].collect().sorted.toSeq
    val realStage = JqEscapeHatch.rawApply(df.toJSON, "try (.s | tonumber)")
      .collect().map(_.toDouble).sorted.toSeq
    assert(stage == realStage)
    assert(stage == Seq(5.0, 7.5))
    // a non-erroring body makes try a no-op (null is a VALUE, not an
    // error — the handler must not fire)
    val noop = Jq.compile("{v: (try .s catch \"X\")}")(df)
      .select("v").as[String].collect().toSeq
    assert(noop.count(_ == null) == 1 && !noop.contains("X"))
  }

  test("try/catch rejects bodies where and/or/`//` would absorb the error marker") {
    // SQL three-valued logic: (NULL > 0) AND false = false — the
    // compiled form would return false where jq fires the catch, so
    // these programs must refuse to compile (round-8 review)
    val df = Seq(("abc", false)).toDF("s", "flag")
    val e1 = intercept[IllegalArgumentException] {
      Jq.compile("{ok: (try ((.s | tonumber) > 0 and .flag) catch \"E\")}")(df)
    }
    assert(e1.getMessage.contains("EscapeHatch"))
    val e2 = intercept[IllegalArgumentException] {
      Jq.compile("try ((.s | tonumber) // 9)")(df)
    }
    assert(e2.getMessage.contains("EscapeHatch"))
    // `+` joined the absorb class in round 18 (its compile is jq's
    // null-identity coalesce, which would turn the error marker into
    // the other operand's value) — rejected with tonumber beneath it
    val e3 = intercept[IllegalArgumentException] {
      Jq.compile("{n: (try ((.s | tonumber) + 1) catch -1)}")(df)
    }
    assert(e3.getMessage.contains("EscapeHatch"))
    // a strict-operator body still compiles: `-` propagates the
    // marker to the catch (and real jq errors tonumber("abc") before
    // the `-` runs — same handler either way)
    assert(Jq.compile("{n: (try ((.s | tonumber) - 1) catch -1)}")(df)
      .select($"n".cast("double")).as[Double].head() == -1.0)
    // division inside a try rejects: jq's zero-divisor error carries
    // no null marker the compiled catch could see
    val e4 = intercept[IllegalArgumentException] {
      Jq.compile("{n: (try (10 / (.s | length)) catch -1)}")(df)
    }
    assert(e4.getMessage.contains("EscapeHatch"))
  }

  test(".. descends into map columns like jq descends into objects") {
    import graft.transform.JqEscapeHatch
    val one = spark.range(1).selectExpr("1 AS id",
      "map('a', 1, 'b', 2) AS m")
    val compiled = Jq.compile("..")(one).as[String].collect().toSeq
    val real = JqEscapeHatch.rawApply(one.toJSON, "..").collect().toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
  }

  test("reduce folds arrays with the aggregate HOF, matching real jq") {
    import graft.transform.JqEscapeHatch
    val df = spark.range(4).selectExpr("id",
      "transform(sequence(1, cast(id + 1 AS int)), x -> cast(x AS long)) AS nums")
    val prog = "{id, total: (reduce .nums[] as $x (0; . + $x))}"
    val compiled = Jq.compile(prog)(df)
      .select($"id", $"total".cast("double"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val real = JqEscapeHatch(df, prog)
      .select($"id", $"total".cast("double"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    assert(compiled.map(_._2) == Seq(1.0, 3.0, 6.0, 10.0))
    // the variable participates in arbitrary update expressions
    val mx = Jq.compile("{m: (reduce .nums[] as $x (0; . + $x * $x))}")(df)
      .select($"m".cast("double")).as[Double].collect().sorted.toSeq
    val realMx = JqEscapeHatch(df, "{m: (reduce .nums[] as $x (0; . + $x * $x))}")
      .select($"m".cast("double")).as[Double].collect().sorted.toSeq
    assert(mx == realMx)
    // comparisons inside the update stay typeable: $x carries the
    // iterated element's type and `.` the seed's (the round-16
    // untypeable-operand rejection would otherwise kill the
    // running-max shape)
    val maxProg = "{id, mx: (reduce .nums[] as $x (0; if $x > . then $x else . end))}"
    val cMax = Jq.compile(maxProg)(df)
      .select($"id", $"mx".cast("double"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val rMax = JqEscapeHatch(df, maxProg)
      .select($"id", $"mx".cast("double"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(cMax == rMax, s"\ncompiled: $cMax\nreal jq:  $rMax")
    assert(cMax.map(_._2) == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("table sink coerces string timestamps through the ladder (K2 type coercion)") {
    val spark2 = spark
    import spark2.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_times")
    Seq(Tuple1(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("ts").write.saveAsTable("graft_times")
    graft.pipeline.TableSink.write(
      Seq("2026-08-12T10:30:00.000-0700").toDF("ts"), "graft_times", "APPEND")
    assert(spark.table("graft_times").where("ts IS NOT NULL").count() == 2)
    spark.sql("DROP TABLE graft_times")
  }

  test("string interpolation \"\\(...)\" renders like real jq") {
    import graft.transform.JqEscapeHatch
    val df = Seq(
      (1L, "alice", 34L, true, 2.5),
      (2L, "bob", 28L, false, 2.0)
    ).toDF("id", "name", "age", "active", "score")
    // strings raw, integers bare, integral doubles normalized (2.0 →
    // "2"), booleans as text, arithmetic folded — all like jq
    val prog = """{msg: "\(.name) is \(.age), next \(.age + 1), s=\(.score), a=\(.active)"}"""
    val compiled = Jq.compile(prog)(df).select("msg").as[String].collect().sorted.toSeq
    val real = JqEscapeHatch(df, prog).select("msg").as[String].collect().sorted.toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    // null fields render "null"; arrays render as compact JSON
    val df2 = Seq((Some("x"), Seq(1L, 2L)), (None, Seq.empty[Long]))
      .toDF("s", "xs")
    val prog2 = """{m: "s=\(.s) xs=\(.xs)"}"""
    val c2 = Jq.compile(prog2)(df2).select("m").as[String].collect().sorted.toSeq
    val r2 = JqEscapeHatch(df2, prog2).select("m").as[String].collect().sorted.toSeq
    assert(c2 == r2, s"\ncompiled: $c2\nreal jq:  $r2")
  }

  test("split/join pipe like real jq, incl. trailing empty fields") {
    import graft.transform.JqEscapeHatch
    val df = Seq("a,b,c", "one", "x,,y,", "").toDF("text")
    val prog = """{j: (.text | split(",") | join("-")), n: (.text | split(",") | length)}"""
    val compiled = Jq.compile(prog)(df)
      .selectExpr("concat(j, '#', n)").as[String].collect().sorted.toSeq
    val real = JqEscapeHatch(df, prog)
      .selectExpr("concat(j, '#', cast(n AS bigint))").as[String].collect().sorted.toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
  }

  test("getpath/setpath address nested fields like real jq") {
    import graft.transform.JqEscapeHatch
    val one = spark.range(1).selectExpr("id",
      "named_struct('x', 3L, 'ys', array(7L, 8L)) AS obj")
    val get = """{a: getpath(["obj","x"]), b: getpath(["obj","ys",1])}"""
    val cg = Jq.compile(get)(one).selectExpr("concat(a, '/', b)").as[String].head()
    val rg = JqEscapeHatch(one, get)
      .selectExpr("concat(cast(a AS bigint), '/', cast(b AS bigint))").as[String].head()
    assert(cg == rg && cg == "3/8")
    val set = """setpath(["obj","x"]; 99)"""
    val cs = Jq.compile(set)(one).selectExpr("obj.x").as[Long].head()
    val rs = JqEscapeHatch(one, set).selectExpr("cast(obj.x AS bigint)").as[Long].head()
    assert(cs == rs && cs == 99L)
  }

  test("paths matches real jq byte-for-byte, in order") {
    import graft.transform.JqEscapeHatch
    val one = spark.range(1).selectExpr("1 AS id",
      "named_struct('x', 3, 'tags', array('p', 'q')) AS obj",
      "array(10, 20) AS nums")
    val compiled = Jq.compile("paths")(one).as[String].collect().toSeq
    val real = JqEscapeHatch.rawApply(one.toJSON, "paths").collect().toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
  }

  test("limit/first/last over iterated arrays like real jq") {
    import graft.transform.JqEscapeHatch
    val one = spark.range(1).selectExpr("array(10L, 20L, 30L) AS nums")
    val cl = Jq.compile("limit(2; .nums[])")(one)
      .selectExpr("cast(value AS string)").as[String].collect().toSeq
    val rl = JqEscapeHatch.rawApply(one.toJSON, "limit(2; .nums[])").collect().toSeq
    assert(cl == rl && cl == Seq("10", "20"))
    val fl = """{f: first(.nums[]), l: last(.nums[]), pf: (.nums | first), pl: (.nums | last)}"""
    val cf = Jq.compile(fl)(one)
      .selectExpr("concat(f, l, pf, pl)").as[String].head()
    val rf = JqEscapeHatch(one, fl)
      .selectExpr("concat(cast(f AS bigint), cast(l AS bigint), cast(pf AS bigint), cast(pl AS bigint))")
      .as[String].head()
    assert(cf == rf && cf == "10301030")
    // empty array: first/last → null, like jq's .[0] on []
    val empty = spark.range(1).selectExpr("array() AS nums")
    assert(Jq.compile("{f: (.nums | first)}")(empty).select("f").head().isNullAt(0))
  }

  test("array construction [.a, .b] builds arrays") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val out = Jq.compile("{pair: [.a, .b], empty: []}")(df).collect()(0)
    assert(out.getSeq[Long](0) == Seq(1L, 2L))
    assert(out.getSeq[Any](1).isEmpty)
  }

  test("ltrimstr/rtrimstr/startswith/endswith/test match real jq") {
    import graft.transform.JqEscapeHatch
    val df = Seq("prefix-body-suffix", "body", "prefix-", "-suffix", "",
      "prefixprefix-x").toDF("text")
    val prog = """{l: (.text | ltrimstr("prefix-")),
      r: (.text | rtrimstr("-suffix")),
      sw: (.text | startswith("prefix")),
      ew: (.text | endswith("suffix")),
      re: (.text | test("^pre.*fix$"))}""".replaceAll("\n\\s*", " ")
    val sel = "concat(l, '#', r, '#', sw, '#', ew, '#', re)"
    val compiled = Jq.compile(prog)(df)
      .selectExpr(sel).as[String].collect().sorted.toSeq
    val real = JqEscapeHatch(df, prog)
      .selectExpr(sel).as[String].collect().sorted.toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
  }

  test("sort/unique/min/max/reverse array stages match real jq") {
    import graft.transform.JqEscapeHatch
    val df = Seq("3,1,2,3", "9", "5,5,5", "2,10,1").toDF("text")
    // numbers via split|map? map unsupported — drive with tonumber-free
    // string arrays: jq sorts strings lexicographically, as does Spark
    val prog = """{s: (.text | split(",") | sort | join("-")),
      u: (.text | split(",") | unique | join("-")),
      mn: (.text | split(",") | min),
      mx: (.text | split(",") | max),
      rv: (.text | split(",") | reverse | join("-"))}"""
      .replaceAll("\n\\s*", " ")
    val sel = "concat(s, '#', u, '#', mn, '#', mx, '#', rv)"
    val compiled = Jq.compile(prog)(df)
      .selectExpr(sel).as[String].collect().sorted.toSeq
    val real = JqEscapeHatch(df, prog)
      .selectExpr(sel).as[String].collect().sorted.toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
  }

  test("test() outside the portable regex subset is rejected toward the hatch") {
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException] {
      Jq.compile("""{m: (.text | test("(?i)x"))}""")(df)
    }
    intercept[IllegalArgumentException] {
      Jq.compile("""{m: (.text | test("(a)\\1"))}""")(df)
    }
  }

  test("map/sort_by/add/any/all/flatten on array columns match real jq") {
    import graft.transform.JqEscapeHatch
    val df = spark.range(3).selectExpr("id",
      "transform(sequence(1, cast(id + 2 AS int)), x -> cast(x * (3 - id) AS long)) AS nums")
    // head path is an array BY SCHEMA — no split needed to seed the
    // array stages; map binds `.` to the element
    val prog = """{id, dbl: (.nums | map(. * 2) | join(",")),
      tot: (.nums | add),
      srt: (.nums | sort_by(. * -1) | join(",")),
      anyBig: (.nums | map(. > 3) | any),
      allPos: (.nums | map(. > 0) | all)}""".replaceAll("\n\\s*", " ")
    val sel = Seq("id", "dbl", "cast(tot AS double) AS tot", "srt",
      "cast(anyBig AS boolean) AS a", "cast(allPos AS boolean) AS b")
    val compiled = Jq.compile(prog)(df).selectExpr(sel: _*)
      .as[(Long, String, Double, String, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    val real = JqEscapeHatch(df, prog).selectExpr(sel: _*)
      .as[(Long, String, Double, String, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    // flatten: one static nesting level
    val nested = spark.range(2).selectExpr("id",
      "array(array(id, id + 1), array(id + 2)) AS xs")
    val fProg = """{id, flat: (.xs | flatten | join("-"))}"""
    val fc = Jq.compile(fProg)(nested).selectExpr("flat")
      .as[String].collect().sorted.toSeq
    val fr = JqEscapeHatch(nested, fProg).selectExpr("flat")
      .as[String].collect().sorted.toSeq
    assert(fc == fr, s"\ncompiled: $fc\nreal jq:  $fr")
    // add on an empty array is null, like jq
    val empty = spark.range(1)
      .selectExpr("cast(array() AS array<long>) AS nums")
    assert(Jq.compile("{t: (.nums | add)}")(empty)
      .selectExpr("t IS NULL").as[Boolean].head())
  }

  test("map(.field) addresses element fields; sort_by keeps ties stable like jq") {
    import graft.transform.JqEscapeHatch
    val df = spark.range(1).selectExpr("1 AS id",
      """array(named_struct('name', 'x', 'v', 3L),
        named_struct('name', 'y', 'v', 1L),
        named_struct('name', 'z', 'v', 3L)) AS items""".replaceAll("\n\\s*", " "))
    val prog = """{names: (.items | sort_by(.v) | map(.name) | join(",")),
      vals: (.items | map(.v) | join(","))}""".replaceAll("\n\\s*", " ")
    val compiled = Jq.compile(prog)(df)
      .selectExpr("concat(names, '#', vals)").as[String].collect().toSeq
    val real = JqEscapeHatch(df, prog)
      .selectExpr("concat(names, '#', vals)").as[String].collect().toSeq
    // stable: x (v=3) stays before z (v=3) after the sort
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    assert(compiled.head == "y,x,z#3,1,3")
  }

  test("group_by/unique_by compile and match real jq, incl. null keys") {
    import graft.transform.JqEscapeHatch
    val df = spark.range(1).selectExpr("1 AS id",
      """array(named_struct('k', 2L, 'v', 'a'),
        named_struct('k', 1L, 'v', 'b'),
        named_struct('k', 2L, 'v', 'c'),
        named_struct('k', cast(null AS bigint), 'v', 'd'),
        named_struct('k', 1L, 'v', 'e')) AS items"""
        .replaceAll("\n\\s*", " "))
    // groups sorted by key null-lowest; in-group ORIGINAL order; the
    // unique_by pick = first element in original order per key
    val prog = """{gs: (.items | group_by(.k)
        | map(map(.v) | join("")) | join(",")),
      u: (.items | unique_by(.k) | map(.v) | join(","))}"""
      .replaceAll("\n\\s*", " ")
    val compiled = Jq.compile(prog)(df)
      .selectExpr("concat(gs, '#', u)").as[String].collect().toSeq
    val real = JqEscapeHatch(df, prog)
      .selectExpr("concat(gs, '#', u)").as[String].collect().toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    assert(compiled.head == "d,be,ac#d,b,a")
    // scalar elements with `.` as the key (the jq unique_by identity
    // degenerates to unique-with-first-occurrence)
    val nums = spark.range(1).selectExpr(
      "cast(array(5, 3, 5, 1) AS array<long>) AS nums")
    val prog2 = """{g: (.nums | group_by(.) | map(join("-")) | join(",")),
      u: (.nums | unique_by(.) | join(","))}""".replaceAll("\n\\s*", " ")
    val c2 = Jq.compile(prog2)(nums)
      .selectExpr("concat(g, '#', u)").as[String].collect().toSeq
    val r2 = JqEscapeHatch(nums, prog2)
      .selectExpr("concat(g, '#', u)").as[String].collect().toSeq
    assert(c2 == r2, s"\ncompiled: $c2\nreal jq:  $r2")
    assert(c2.head == "1,3,5-5#1,3,5")
  }

  test("group_by/unique_by: 30 randomized corpora byte-match real jq") {
    import graft.transform.JqEscapeHatch
    // small vocabulary forces heavy key duplication; exercises the
    // native run-splitting kernel across many run shapes
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "dd", "e", "ff", "g")
    val rows = (1 to 30).map { i =>
      (i.toLong,
        Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
          .mkString(" "))
    }
    val df = rows.toDF("id", "text")
    val prog = """{id,
      g: (.text | split(" ") | group_by(.) | map(join("-")) | join(",")),
      u: (.text | split(" ") | unique_by(.) | join(","))}"""
      .replaceAll("\n\\s*", " ")
    val sel = Seq("id", "concat(g, '#', u) AS gu")
    val compiled = Jq.compile(prog)(df).selectExpr(sel: _*)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val real = JqEscapeHatch(df, prog).selectExpr(sel: _*)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(compiled == real,
      s"\nfirst diff: ${compiled.zip(real).find(p => p._1 != p._2)}")
  }

  test("has/keys/to_entries/from_entries on map columns match real jq") {
    import graft.transform.JqEscapeHatch
    val df = spark.range(1).selectExpr("map('b', 2L, 'a', 1L) AS m")
    val prog = """{hasA: (.m | has("a")), hasZ: (.m | has("z")),
      ks: (.m | keys | join(",")),
      rt: (.m | to_entries | from_entries | keys | join(","))}"""
      .replaceAll("\n\\s*", " ")
    val sel = Seq("cast(hasA AS boolean)", "cast(hasZ AS boolean)", "ks", "rt")
    val compiled = Jq.compile(prog)(df).selectExpr(sel: _*)
      .as[(Boolean, Boolean, String, String)].collect().toSeq
    val real = JqEscapeHatch(df, prog).selectExpr(sel: _*)
      .as[(Boolean, Boolean, String, String)].collect().toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    assert(compiled.head == ((true, false, "a,b", "a,b")))
  }

  test("map_values/with_entries and value-position objects match real jq") {
    import graft.transform.JqEscapeHatch
    val df = spark.range(1).selectExpr("map('b', 2L, 'a', 1L) AS m",
      "array(1L, 2L, 3L) AS xs")
    // with_entries rebuilds each {key, value} entry; map_values
    // transforms map values in place and arrays like map
    val prog = """{doubled: (.m | map_values(. * 2) | to_entries
      | map(.value) | join(",")),
      renamed: (.m | with_entries({key: (.key | ascii_upcase),
        value: (.value + 10)}) | keys | join(",")),
      arr: (.xs | map_values(. + 1) | join(","))}"""
      .replaceAll("\n\\s*", " ")
    val sel = "concat(doubled, '#', renamed, '#', arr)"
    val compiled = Jq.compile(prog)(df).selectExpr(sel)
      .as[String].collect().toSeq
    val real = JqEscapeHatch(df, prog).selectExpr(sel)
      .as[String].collect().toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    assert(compiled.head == "4,2#A,B#2,3,4")
  }

  test("delpaths deletes nested + top-level fields like real jq; missing path is a no-op") {
    import graft.transform.JqEscapeHatch
    val one = spark.range(1).selectExpr("1 AS id",
      "named_struct('x', 3L, 'y', 7L, 'z', named_struct('k', 1L)) AS obj",
      "5L AS gone")
    val prog = """delpaths([["obj","y"],["gone"],["nope"]])"""
    val compiled = Jq.compile(prog)(one).toJSON.collect().toSeq
    val real = JqEscapeHatch.rawApply(one.toJSON, prog).collect().toSeq
    assert(compiled == real, s"\ncompiled: $compiled\nreal jq:  $real")
    assert(compiled == Seq("""{"id":1,"obj":{"x":3,"z":{"k":1}}}"""))
  }

  test("limit over the .. and paths streams matches real jq") {
    import graft.transform.JqEscapeHatch
    val one = spark.range(1).selectExpr("1 AS id",
      "named_struct('x', 3L, 'tags', array('p', 'q')) AS obj")
    Seq("limit(3; ..)", "limit(4; paths)").foreach { prog =>
      val compiled = Jq.compile(prog)(one).as[String].collect().toSeq
      val real = JqEscapeHatch.rawApply(one.toJSON, prog).collect().toSeq
      assert(compiled == real, s"$prog:\ncompiled: $compiled\nreal jq:  $real")
    }
  }

  test("lambda-relative head paths type from the bound element, not root columns") {
    import graft.transform.JqEscapeHatch
    // round-9 review: `map(.xs | sort)` seeded array-ness of the head
    // path from the ROOT schema. Here the root has a SCALAR column
    // named xs while the bound element's xs IS an array — the nested
    // pipe must sort the element field
    val one = spark.range(1).selectExpr("7L AS xs",
      "array(named_struct('xs', array(3L, 1L, 2L))) AS rows_")
    val prog = """{s: (.rows_ | map(.xs | sort))}"""
    val compiled = Jq.compile(prog)(one)
      .selectExpr("to_json(s)").as[String].head()
    assert(compiled == "[[1,2,3]]", compiled)
    val real = JqEscapeHatch.rawApply(one.toJSON, prog).collect().toSeq
    assert(real == Seq("""{"s":[[1,2,3]]}"""), real)
    // the inverse misdetection: root xs is an array, the element's xs
    // is a scalar — must reject toward the escape hatch (sort over a
    // scalar), not compile an array op against the wrong schema
    val inv = spark.range(1).selectExpr("array(9L, 8L) AS xs",
      "array(named_struct('xs', 5L)) AS rows_")
    intercept[Exception] {
      Jq.compile("""{s: (.rows_ | map(.xs | sort))}""")(inv).collect()
    }
  }

  test("single-generator object construction fans out 1→N like real jq") {
    import graft.transform.JqEscapeHatch
    // round-11 VERDICT directive 7: `{who: .name, tag: .tags[]}` was
    // the most frequent escape-hatch faller — now an explode. An empty
    // array yields ZERO outputs, exactly like jq; output object field
    // order is the program's insertion order.
    val df = Seq((1L, "alice", Seq("a", "b")), (2L, "bob", Seq("c")),
      (3L, "carol", Seq.empty[String])).toDF("id", "name", "tags")
    val prog = "{who: .name, tag: .tags[]}"
    val compiled = Jq.compile(prog)(df)
    assert(compiled.columns.toSeq == Seq("who", "tag"))
    val c = compiled.toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    // generator not in first position, computed sibling field
    val prog2 = "{tag: .tags[], n: (.id * 2)}"
    val c2 = Jq.compile(prog2)(df).toJSON.collect().sorted.toSeq
    val r2 = JqEscapeHatch.rawApply(df.toJSON, prog2).collect().sorted.toSeq
    assert(c2 == r2, s"\ncompiled: $c2\nreal jq:  $r2")
    // struct-element arrays fan out whole elements
    val sdf = spark.range(2).selectExpr("id",
      "array(named_struct('k', id), named_struct('k', id + 10)) AS es")
    val prog3 = "{i: .id, e: .es[]}"
    val c3 = Jq.compile(prog3)(sdf).toJSON.collect().sorted.toSeq
    val r3 = JqEscapeHatch.rawApply(sdf.toJSON, prog3).collect().sorted.toSeq
    assert(c3 == r3, s"\ncompiled: $c3\nreal jq:  $r3")
    // iterate nested inside a NON-pipeline expression → escape hatch
    // (generator pipelines compile since round 14 — pinned below)
    intercept[IllegalArgumentException] {
      Jq.compile("{a: (.tags[] + \"x\")}")(df).collect()
    }
  }

  test("generator pipelines compile: (.xs[] | STAGES) inside object construction") {
    import graft.transform.JqEscapeHatch
    // round-13 VERDICT directive 4: the nested-iterate pipeline was
    // the next escape-hatch faller after the multi-generator
    // cartesian. The element-1:1 pipeline compiles as a `transform`
    // BEFORE the explode — same fan-out conventions as bare
    // generators.
    val df = Seq((1L, "alice", Seq("a", "bb")), (2L, "bob", Seq("ccc")),
      (3L, "carol", Seq.empty[String])).toDF("id", "name", "tags")
    val prog = "{who: .name, tag: (.tags[] | ascii_upcase)}"
    val compiled = Jq.compile(prog)(df)
    assert(compiled.columns.toSeq == Seq("who", "tag"))
    val c = compiled.toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    // multi-stage pipeline, numeric result
    val prog2 = "{n: (.tags[] | ascii_upcase | length), id: .id}"
    val c2 = Jq.compile(prog2)(df).toJSON.collect().sorted.toSeq
    val r2 = JqEscapeHatch.rawApply(df.toJSON, prog2).collect().sorted.toSeq
    assert(c2 == r2, s"\ncompiled: $c2\nreal jq:  $r2")
    // relative field hop on struct elements: (.items[] | .name)
    val sdf = spark.range(2).selectExpr("id",
      "array(named_struct('k', concat('v', id)), " +
        "named_struct('k', concat('w', id))) AS es")
    val prog3 = "{i: .id, k: (.es[] | .k)}"
    val c3 = Jq.compile(prog3)(sdf).toJSON.collect().sorted.toSeq
    val r3 = JqEscapeHatch.rawApply(sdf.toJSON, prog3).collect().sorted.toSeq
    assert(c3 == r3, s"\ncompiled: $c3\nreal jq:  $r3")
    // pipelined generator CROSSED with a bare generator
    val xdf = Seq((1L, Seq("a", "b"), Seq(10L, 20L))).toDF("id", "xs", "ys")
    val prog4 = "{a: (.xs[] | ascii_upcase), b: .ys[]}"
    val c4 = Jq.compile(prog4)(xdf).toJSON.collect().sorted.toSeq
    val r4 = JqEscapeHatch.rawApply(xdf.toJSON, prog4).collect().sorted.toSeq
    assert(c4 == r4, s"\ncompiled: $c4\nreal jq:  $r4")
    // a cardinality-CHANGING pipeline (select) must still reject
    intercept[IllegalArgumentException] {
      Jq.compile("{a: (.tags[] | select(. != \"a\"))}")(df).collect()
    }
  }

  test("if/elif/else compiles to a when chain with jq truthiness") {
    import graft.transform.JqEscapeHatch
    val df = Seq((1L, "alice", 25L), (2L, "bob", 3L), (3L, "carol", 60L))
      .toDF("id", "name", "age")
    // value position + elif chain
    val prog = "{id: .id, band: (if .age < 10 then \"kid\" elif .age < 30 " +
      "then \"adult\" else \"senior\" end)}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    // jq truthiness: a NUMBER condition is truthy even at 0; NULL is
    // falsy — both pinned against real jq
    val ndf = Seq((1L, Some(0L)), (2L, None), (3L, Some(7L))).toDF("id", "x")
    val prog2 = "{id: .id, f: (if .x then \"has\" else \"none\" end)}"
    val c2 = Jq.compile(prog2)(ndf).toJSON.collect().sorted.toSeq
    val r2 = JqEscapeHatch.rawApply(ndf.toJSON, prog2).collect().sorted.toSeq
    assert(c2 == r2, s"\ncompiled: $c2\nreal jq:  $r2")
    // explicit else inside map, pinned vs real jq (the sandbox binary
    // is jq 1.6, which REQUIRES else)
    val adf = Seq((1L, Seq(1L, 20L, 3L))).toDF("id", "xs")
    val prog3 = "{id: .id, ys: (.xs | map(if . < 10 then . * 100 else . end))}"
    val c3 = Jq.compile(prog3)(adf).toJSON.collect().sorted.toSeq
    val r3 = JqEscapeHatch.rawApply(adf.toJSON, prog3).collect().sorted.toSeq
    assert(c3 == r3, s"\ncompiled: $c3\nreal jq:  $r3")
    // missing else = jq 1.7's implicit `else .` — compiled identically
    // to the explicit form (no 1.7 binary in the sandbox to pin against)
    val prog3b = "{id: .id, ys: (.xs | map(if . < 10 then . * 100 end))}"
    assert(Jq.compile(prog3b)(adf).toJSON.collect().sorted.toSeq == c3)
    // stage position with object branches over the same field set
    val prog4 = "if .age >= 30 then {id: .id, who: .name} " +
      "else {id: (.id * 10), who: \"minor\"} end"
    val c4 = Jq.compile(prog4)(df).toJSON.collect().sorted.toSeq
    val r4 = JqEscapeHatch.rawApply(df.toJSON, prog4).collect().sorted.toSeq
    assert(c4 == r4, s"\ncompiled: $c4\nreal jq:  $r4")
    // mismatched object field sets must reject toward the hatch
    intercept[IllegalArgumentException] {
      Jq.compile("if .age > 30 then {a: .id} else {b: .id} end")(df).collect()
    }
    // untypeable condition rejects rather than guessing truthiness
    intercept[IllegalArgumentException] {
      Jq.compile("{y: (if .nosuchfield then 1 else 2 end)}")(df).collect()
    }
  }

  test("if/until randomized corpora byte-match real jq (truthiness + convergence)") {
    import graft.transform.JqEscapeHatch
    // 40 randomized rows over nullable ints/strings/bools exercise
    // every truthiness branch (null, false, true, 0, "", positive)
    // and varied until convergence depths in one program
    val rnd = new scala.util.Random(41)
    val rows = (1 to 40).map { i =>
      (i.toLong,
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(5).toLong),
        if (rnd.nextInt(4) == 0) None
        else Some(Vector("", "x", "yy")(rnd.nextInt(3))),
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextBoolean()),
        1L + rnd.nextInt(200))
    }
    val df = rows.toDF("id", "n", "s", "b", "seed")
    val prog = ("{id, " +
      "ni: (if .n then .n * 10 else -1 end), " +
      "si: (if .s then (.s | length) else -1 end), " +
      "bi: (if .b then 1 elif .s then 2 else 3 end), " +
      "grown: (.seed | until(. > 150; . * 2))}")
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
  }

  test("until(cond; update) compiles as a bounded fold and matches real jq") {
    import graft.transform.JqEscapeHatch
    // round-13 VERDICT directive 4, second form: jq's convergence
    // loop. Doubling from n until > 100 — integer arithmetic on both
    // sides, so the jq shortest-print and Spark long rendering agree.
    val df = Seq(1L, 7L, 60L, 101L).toDF("n")
    val prog = "{n: .n, grown: (.n | until(. > 100; . * 2))}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    // counting loop with a compound update over the bound value
    val prog2 = "{k: (.n | until(. % 9 == 0; . + 1))}"
    val c2 = Jq.compile(prog2)(df).toJSON.collect().sorted.toSeq
    val r2 = JqEscapeHatch.rawApply(df.toJSON, prog2).collect().sorted.toSeq
    assert(c2 == r2, s"\ncompiled: $c2\nreal jq:  $r2")
    // inside a generator pipeline: per-element convergence
    val adf = Seq((1L, Seq(3L, 50L))).toDF("id", "xs")
    val prog3 = "{id: .id, g: (.xs[] | until(. > 10; . * 3))}"
    val c3 = Jq.compile(prog3)(adf).toJSON.collect().sorted.toSeq
    val r3 = JqEscapeHatch.rawApply(adf.toJSON, prog3).collect().sorted.toSeq
    assert(c3 == r3, s"\ncompiled: $c3\nreal jq:  $r3")
    // divergence within the cap must raise loudly, not return wrong
    val e = intercept[Exception] {
      Jq.compile("{x: (.n | until(. < 0; . + 1))}")(df).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("did not converge")), msgs(e))
  }

  test("null-operand comparisons match jq's total semantics (randomized pins)") {
    import graft.transform.JqEscapeHatch
    // round-14 ADVICE (medium): `.x == null` and ordered comparisons
    // with a null operand compiled to SQL 3VL (never-true / falsy via
    // coalesce) where jq's comparisons are TOTAL — null == null is
    // true, and null sorts LOWEST so `null < 5` is true. 40 randomized
    // rows over two nullable ints and a nullable string exercise every
    // operand-null combination in if-conditions, value position, and
    // select; byte-matched against the real jq binary.
    val rnd = new scala.util.Random(151)
    val rows = (1 to 40).map { i =>
      def oi = if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(5).toLong)
      def os = if (rnd.nextInt(3) == 0) None
               else Some(Vector("a", "b", "")(rnd.nextInt(3)))
      (i.toLong, oi, oi, os)
    }
    val df = rows.toDF("id", "x", "y", "s")
    val prog = ("{id, " +
      "en: (.x == null), nn: (.x != null), " +
      "sn: (.s == null), se: (.s == \"a\"), " +
      "lt: (.x < .y), le: (.x <= .y), gt: (.x > .y), ge: (.x >= .y), " +
      "ln: (.x < 2), rn: (2 < .x), " +
      "br: (if .x == null then \"none\" elif .x < .y then \"lt\" else \"ge\" end)}")
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    // select keeps rows where the null-safe comparison is TRUE (jq
    // keeps `.x == null` rows; the old 3VL compile dropped them)
    val sel = "select(.x == null) | {id}"
    val cs = Jq.compile(sel)(df).toJSON.collect().sorted.toSeq
    val rs = JqEscapeHatch.rawApply(df.toJSON, sel).collect().sorted.toSeq
    assert(cs == rs, s"\ncompiled: $cs\nreal jq:  $rs")
    assert(cs.nonEmpty, "corpus must include null x rows")
  }

  test("try/catch rejects comparison bodies that would absorb the error marker") {
    // the total (null-safe) comparison compile maps an error-null from
    // tonumber to an ordinary true/false instead of propagating it to
    // the catch — such bodies must refuse to compile, like and/or///
    val df = Seq(("abc", 1L)).toDF("s", "n")
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{ok: (try ((.s | tonumber) > 0) catch \"E\")}")(df)
    }
    assert(e.getMessage.contains("EscapeHatch"))
    val e2 = intercept[IllegalArgumentException] {
      Jq.compile("{ok: (try ((.s | tonumber) == 5) catch \"E\")}")(df)
    }
    assert(e2.getMessage.contains("EscapeHatch"))
  }

  test("tojson compiles for byte-exact types and matches real jq (randomized pins)") {
    import graft.transform.JqEscapeHatch
    // round-14 VERDICT directive 4. Strings draw from an
    // escaping-heavy alphabet (quotes, backslash, newline, tab,
    // unicode); doubles draw from the formatting-safe quarter grid
    // (k/4 — shortest-print equals Spark's cast rendering there, and
    // integral values drop the \".0\" on both sides).
    val rnd = new scala.util.Random(152)
    val strs = Vector("plain", "qu\"ote", "back\\slash", "new\nline",
      "tab\there", "héllo wörld", "")
    val rows = (1 to 40).map { i =>
      (i.toLong,
        if (rnd.nextInt(4) == 0) None else Some(strs(rnd.nextInt(strs.size))),
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(400).toLong - 200),
        if (rnd.nextInt(4) == 0) None
        else Some((rnd.nextInt(4000) - 2000).toDouble / 4.0),
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextBoolean()),
        Seq.fill(rnd.nextInt(3))(strs(rnd.nextInt(strs.size))),
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(100).toLong))
    }
    val df = rows.toDF("id", "s", "n", "d", "b", "tags", "nums")
    val prog = ("{id, ts: (.s | tojson), tn: (.n | tojson), " +
      "td: (.d | tojson), tb: (.b | tojson), " +
      "ta: (.tags | tojson), tm: (.nums | tojson)}")
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    // struct (object) serialization: key order preserved, like jq
    val sdf = Seq((1L, ("x", 2L))).toDF("id", "o")
    val progS = "{id, to: (.o | tojson)}"
    val cS = Jq.compile(progS)(sdf).toJSON.collect().sorted.toSeq
    val rS = JqEscapeHatch.rawApply(sdf.toJSON, progS).collect().sorted.toSeq
    assert(cS == rS, s"\ncompiled: $cS\nreal jq:  $rS")
    // value position with `.` bound (inside map) — the no-arg rewrite
    val mdf = Seq((1L, Seq(Seq("a", "b"), Seq("c")))).toDF("id", "xss")
    val progM = "{id, t: (.xss | map(tojson))}"
    val cM = Jq.compile(progM)(mdf).toJSON.collect().sorted.toSeq
    val rM = JqEscapeHatch.rawApply(mdf.toJSON, progM).collect().sorted.toSeq
    assert(cM == rM, s"\ncompiled: $cM\nreal jq:  $rM")
  }

  test("tojson rejects byte-inexact and untypeable inputs toward the hatch") {
    // a composite with DOUBLE leaves cannot byte-match (to_json keeps
    // the .0 jq 1.6 drops) — reject, never render wrong
    val df = Seq((1L, Seq(2.0, 2.5))).toDF("id", "ds")
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{id, t: (.ds | tojson)}")(df).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"))
    // untypeable current value (post-map element type is untracked)
    val e2 = intercept[IllegalArgumentException] {
      Jq.compile("{t: (.ds | map(. * 2) | tojson)}")(df).collect()
    }
    assert(e2.getMessage.contains("EscapeHatch"))
    // and the pipeline front door falls back to the hatch for these
    import graft.pipeline.Pipeline
    val out = Pipeline.transform(df, Pipeline.Spec("FILE", Nil,
      Map("JQ__QUERY" -> "{id, t: (.ds | tojson)}")))
    // (real jq 1.6 canonicalizes the integral double: 2.0 prints as 2)
    assert(out.filter($"id" === 1).select("t").as[String].head() == "[2,2.5]")
  }

  test("interpolation inside lambdas types from the bound element, not root columns") {
    import graft.transform.JqEscapeHatch
    // the round-9 lambda-shadowing rule reached truthy() in round 9
    // but inferKind (the render-kind resolver) still typed relative
    // paths from the ROOT schema — a same-named root column of a
    // different type silently picked the wrong \(...) render (a string
    // element typed as numeric renders "null" instead of its text).
    // Root `v` is LONG; the array elements' `v` is STRING.
    val df = Seq((7L, Seq(("a", 1L), ("", 2L)))).toDF("v", "xs")
      .selectExpr("v", "transform(xs, x -> named_struct('v', x._1, 'n', x._2)) AS xs")
    val prog = "{v, labels: (.xs | map(\"item \\(.v)\"))}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("item a"), c)
  }

  test("bound dots render through staticType: float reparse, composite guards") {
    import graft.transform.JqEscapeHatch
    // round-16 ADVICE (high): inferKind typed a bound `.` that
    // staticType didn't, so interpRender guessed the render — a float
    // dot printed the widened double ("0.10000000149011612" vs jq
    // "0.1") and a composite dot bypassed the byte-exact check and
    // the 2^53 long guard. staticType now owns the Identity case.
    val fdf = Seq((1L, "x")).toDF("id", "tag")
      .selectExpr("id", "array(cast(0.1 AS float), cast(2.5 AS float)) AS fs")
    val prog = "{id, labels: (.fs | map(\"v=\\(.)\"))}"
    val c = Jq.compile(prog)(fdf).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(fdf.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("v=0.1"), c)
    // a composite dot with DOUBLE leaves cannot byte-match — reject
    // toward the hatch (was: silent to_json bytes, "2.0" vs jq "2")
    val ddf = Seq((1L, Seq(2.0))).toDF("id", "ds")
      .selectExpr("id", "transform(ds, x -> named_struct('d', x)) AS os")
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{id, s: (.os | map(\"x=\\(.)\"))}")(ddf).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
    // a composite dot with LONG leaves carries the runtime 2^53 guard
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val ldf = Seq((1L, Seq(9007199254740993L))).toDF("id", "ns")
      .selectExpr("id", "transform(ns, x -> named_struct('n', x)) AS os")
    val e2 = intercept[Exception] {
      Jq.compile("{id, s: (.os | map(\"x=\\(.)\"))}")(ldf).collect()
    }
    assert(msgs(e2).exists(_.contains("beyond 2^53")), msgs(e2))
    // in-range composite dots byte-match through the guard
    val okdf = Seq((1L, Seq(7L, 9007199254740992L))).toDF("id", "ns")
      .selectExpr("id", "transform(ns, x -> named_struct('n', x)) AS os")
    val progOk = "{id, s: (.os | map(\"x=\\(.)\"))}"
    val cOk = Jq.compile(progOk)(okdf).toJSON.collect().sorted.toSeq
    val rOk = JqEscapeHatch.rawApply(okdf.toJSON, progOk).collect().sorted.toSeq
    assert(cOk == rOk, s"\ncompiled: $cOk\nreal jq:  $rOk")
  }

  test("field-path composites with inexact leaves reject in interpolation too") {
    // round-16 ADVICE (medium): the KJson interpolation branch
    // applied only the long guard — a field-path composite with
    // double leaves interpolated to_json's bytes (keeps ".0") and
    // silently diverged from jq; it now rejects like tojson does
    val df = Seq((1L, Seq(2.0, 2.5))).toDF("id", "ds")
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{id, s: \"v=\\(.ds)\"}")(df).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
  }

  test("dates and timestamps interpolate RAW like jq strings, not quoted") {
    import graft.transform.JqEscapeHatch
    // the record's JSON text for a date/timestamp is a STRING, and jq
    // interpolation renders strings raw — the quoted jsonVal render
    // would emit "v=\"2024-03-01\"" where jq says "v=2024-03-01"
    val df = Seq((1L, "2024-03-01", "2024-03-01 10:15:30.123"),
        (2L, "1999-12-31", "1999-12-31 23:59:59.0"))
      .toDF("id", "d", "ts")
      .selectExpr("id", "cast(d AS date) AS d", "cast(ts AS timestamp) AS ts")
    val prog = "{id, s: \"v=\\(.d) t=\\(.ts)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("v=2024-03-01 t=2024-03-01T10:15:30.123"), c)
  }

  test("timestamp_ntz admits to the byte-exact set: tojson, composites, interpolation") {
    import graft.transform.JqEscapeHatch
    // round-16 VERDICT directive 5: NTZ renders zone-free text from
    // the micros value alone — deterministic on both sides (to_json
    // here, the record's JSON text on jq's side) whatever physical
    // form the driver's parquet shipped, because the decision reads
    // the PLAN-TIME schema of the actual DataFrame
    val df = Seq((1L, "2024-03-01 10:15:30.123"), (2L, "1999-12-31 23:59:59"))
      .toDF("id", "t")
      .selectExpr("id", "cast(t AS timestamp_ntz) AS t",
        "array(cast(t AS timestamp_ntz)) AS ta")
    val prog = "{id, tj: (.t | tojson), ta: (.ta | tojson), s: \"v=\\(.t)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("2024-03-01T10:15:30.123")), c)
  }

  test("tostring renders jq's text, not Spark's cast") {
    import graft.transform.JqEscapeHatch
    // tostring = identity on strings (null string prints "null"),
    // tojson for everything else — the old cast("string") rendered
    // "2.0" for a double jq prints "2", "1.0E16" for jq's "1e+16",
    // "[1, 2]" (with a space) for jq's "[1,2]", and SQL NULL for a
    // null string jq prints "null". Never pinned before; now routed
    // through the same typed render as tojson/interpolation.
    val df = Seq(
        (1L, 2.0, Some("ok"), Seq(1L, 2L), "2024-03-01"),
        (2L, 1e16, None, Seq.empty[Long], "1999-12-31"))
      .toDF("id", "d", "s", "ns", "dt")
      .selectExpr("id", "d", "s", "ns", "cast(dt AS date) AS dt",
        "cast(0.1 AS float) AS f", "cast('2.50' AS decimal(5,2)) AS m")
    val prog = "{id, a: (.d | tostring), b: (.s | tostring), " +
      "c: (.ns | tostring), e: (.dt | tostring), g: (.f | tostring), " +
      "h: (.m | tostring)}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("\"a\":\"2\"")), c)       // not "2.0"
    assert(c.exists(_.contains("\"a\":\"1e+16\"")), c)   // not "1.0E16"
    assert(c.exists(_.contains("\"b\":\"null\"")), c)    // null string → "null"
    assert(c.exists(_.contains("\"c\":\"[1,2]\"")), c)   // compact, no space
    assert(c.exists(_.contains("\"e\":\"2024-03-01\"")), c) // raw date
    assert(c.exists(_.contains("\"g\":\"0.1\"")), c)     // float reparse
    assert(c.exists(_.contains("\"h\":\"2.5\"")), c)     // decimal via double
    // tostring over a statically untypeable value rejects (the old
    // cast would render Spark's text for whatever arrived)
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{x: (.ns | map(. * 2) | tostring)}")(df).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
  }

  test("length is polymorphic like jq: abs for numbers, entries for maps, 0 for null") {
    import graft.transform.JqEscapeHatch
    // jq's length: elements for arrays, entries for objects,
    // codepoints for strings, ABSOLUTE VALUE for numbers, 0 for null
    // — the old untyped Spark length() silently stringified numbers
    // (length(-2.5) = 4 where jq says 2.5)
    val df = Seq((1L, -2.5, Some("héllo"), Seq(1L, 2L, 3L)),
        (2L, 7.0, None, Seq.empty[Long]))
      .toDF("id", "d", "s", "ns")
      .selectExpr("*", "map('a', 1L, 'b', 2L) AS m")
    // numeric lengths stringify through tostring (the tracked type
    // survives the length stage) so the comparison is byte-exact —
    // a bare double OUTPUT COLUMN serializes "7.0" in OUR ndjson by
    // Spark's writer where jq's text says "7", which is the (known)
    // output-file formatting difference, not a length bug
    val prog = "{id, a: (.d | length | tostring), b: (.s | length), " +
      "c: (.ns | length), e: (.m | length)}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("\"a\":\"2.5\"")), c) // abs, not strlen
    assert(c.exists(_.contains("\"a\":\"7\"")), c)   // integral double prints plain
    assert(c.exists(_.contains("\"b\":5")), c)       // codepoints
    assert(c.exists(_.contains("\"b\":0")), c)       // null → 0
    assert(c.exists(_.contains("\"e\":2")), c)       // object entries
    // booleans have no length in jq — reject loudly, same as jq errors
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{x: (.s | startswith(\"h\") | length)}")(df).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
  }

  test("date-vs-ISO-literal comparisons compile typed and push into the scan") {
    import graft.transform.JqEscapeHatch
    // a DATE path against a valid-ISO string literal is jq-equivalent
    // to the typed compare (ISO text order IS chronological order) —
    // and the typed filter pushes into the parquet scan, where the
    // old mixed-kind rejection sent a time-windowed jq filter to the
    // subprocess hatch over the whole corpus
    val df = Seq((1L, "2024-01-15"), (2L, "2024-03-20"), (3L, "2023-12-31"))
      .toDF("id", "d").selectExpr("id", "cast(d AS date) AS dt")
    for (prog <- Seq("select(.dt > \"2024-01-01\") | {id}",
        "select(.dt == \"2024-03-20\") | {id}",
        "{id, late: (.dt >= \"2024-02-01\")}")) {
      val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
      val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
      assert(c == r, s"$prog\ncompiled: $c\nreal jq:  $r")
    }
    // the filter reaches the parquet scan as a pushed date predicate
    val dir = java.nio.file.Files.createTempDirectory("graft_jq_date")
    df.write.mode("overwrite").parquet(s"$dir/t")
    val scan = Jq.compile("select(.dt > \"2024-01-01\")")(
      spark.read.parquet(s"$dir/t"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThan(dt"),
      s"date filter not pushed:\n$plan")
    // a NON-ISO literal keeps jq's string-compare semantics via the
    // rejection (hatch): jq says false on every row, never an error
    val e = intercept[IllegalArgumentException] {
      Jq.compile("select(.dt == \"2024-3-20\")")(df).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
    // timestamps stay rejected — variable fraction width breaks the
    // lexical≡chronological equivalence
    val tdf = Seq((1L, "2024-03-01 10:15:30")).toDF("id", "t")
      .selectExpr("id", "cast(t AS timestamp) AS ts")
    val e2 = intercept[IllegalArgumentException] {
      Jq.compile("select(.ts > \"2024-01-01\")")(tdf).collect()
    }
    assert(e2.getMessage.contains("EscapeHatch"), e2.getMessage)
  }

  test("join renders elements like jq, not like Spark's cast") {
    import graft.transform.JqEscapeHatch
    // join over a double array previously cast each element to
    // Spark's text ("2.0,1.0E16" where jq says "2,1e+16"); elements
    // now render through the shortest-print kernel, typed through
    // map/map_values/with_entries/from_entries output tracking (a
    // computed numeric element is a DOUBLE in jq semantics whatever
    // Spark type carries it)
    val df = Seq((1L, Seq(2.0, 1e16, 0.1), Seq(true, false), Seq("a", "b")))
      .toDF("id", "ds", "bs", "ss")
      .selectExpr("*", "array(cast('2024-03-01' AS date)) AS dts",
        "array(cast(0.5 AS float)) AS fs")
    val prog = "{id, a: (.ds | join(\",\")), b: (.bs | join(\",\")), " +
      "c: (.ss | join(\"-\")), d: (.dts | join(\",\")), " +
      "e: (.fs | join(\",\")), f: (.ds | map(. * 2) | join(\";\"))}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("2,1e+16,0.1"), c)
    assert(c.head.contains("\"d\":\"2024-03-01\""), c)
    assert(c.head.contains("4;2e+16;0.2"), c)
    // null elements join as "" like jq (split-sourced arrays keep
    // covering the string path in the older pins)
    val ndf = Seq((1L, Seq(Some(2.5), None, Some(1.0)))).toDF("id", "ds")
    val progN = "{s: (.ds | join(\",\"))}"
    val cN = Jq.compile(progN)(ndf).toJSON.collect().sorted.toSeq
    val rN = JqEscapeHatch.rawApply(ndf.toJSON, progN).collect().sorted.toSeq
    assert(cN == rN, s"\ncompiled: $cN\nreal jq:  $rN")
    assert(cN.head.contains("2.5,,1"), cN)
    // an untyped element (post-from_entries of unknown shape) rejects
    // toward the hatch instead of rendering Spark's text
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{x: (.ds | map([.]) | join(\",\"))}")(ndf).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
  }

  test("constructed composites interpolate per-item JSON, byte-exact") {
    import graft.transform.JqEscapeHatch
    // `"\([.d])"` previously rendered to_json over a coerced array():
    // a double item printed "2.0" where jq says "2" (silent byte
    // divergence) and mixed-kind items threw an ANSI cast error where
    // jq serializes fine — the render now composes each item's JSON
    // text (strings QUOTED inside composites, numbers through the
    // same shortest-print kernel, nested composites recursively)
    val df = Seq(
        (1L, 2.0, 5L, Some("a\"b"), true),
        (2L, 0.1, 9007199254740993L, None, false))
      .toDF("id", "d", "n", "s", "b")
      .selectExpr("*", "cast(0.5 AS float) AS f", "cast(d AS decimal(5,2)) AS m",
        "cast('2024-03-01' AS date) AS dt")
    val prog = "{id, a: \"v=\\([.d, .n, .s, .b, null, 7])\", " +
      "o: \"w=\\({x: .d, y: [.f, .m], dt: .dt})\", e: \"q=\\([])\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("v=[2,5,")), c)       // double item drops .0
    assert(c.exists(_.contains("9007199254740992")), c) // long reparses as double
    assert(c.exists(_.contains("[0.5,2]")), c)       // float + decimal through doubles
    assert(c.exists(_.contains("q=[]")), c)
    // a composite ITEM with double leaves still rejects (same rule as
    // field-path composites)
    val bad = Seq((1L, Seq(2.0))).toDF("id", "ds")
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{s: \"v=\\([.ds])\"}")(bad).collect()
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
  }

  test("number rendering matches jq across all four g_fmt print forms") {
    // round-15 VERDICT directive 2: the compiled render reconstructs
    // jq's g_fmt output — scientific `m[.mmm]e±XX` (lowercase e,
    // signed ≥2-digit exponent), "0.000ddd", plain-integer with ≤15
    // pad zeros, and dotted plain — from Java's shortest-print digits,
    // instead of raising outside Java's own [1e-3, 1e7) plain window.
    // Every form byte-matched against the real jq binary, through
    // BOTH tojson and interpolation.
    import graft.transform.JqEscapeHatch
    val vals = Seq(
      1e-7,                      // jq "1e-07" vs Java "1.0E-7"
      12345678.5,                // jq plain vs Java "1.23456785E7"
      1e16,                      // 16 pad zeros → jq scientific "1e+16"
      2.5e17,                    // "2.5e+17"
      1e-4, 9.5e-5,              // the decpt=−4 cutover pair
      1.5e300, -0.000012345,     // long exponents, sign
      0.00001234567890123,       // many-digit scientific mantissa
      10000000.5,                // just past Java's 1e7 switch, jq plain
      99999999999999999999.5,    // stores as 1e20 → "1e+20"
      2.2250738585072014e-308,   // smallest normal, minimal digits
      1.7976931348623157e308,    // Double.MaxValue → "…e+308"
      0.001, 9999999.5, 123456789.0, 0.0,   // shared-plain window
      1.8e16,                    // 15 pad zeros — jq-plain boundary
      123456789012345680.0)      // 18-digit plain, 17-digit mantissa
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "d")
    val prog = "{id, t: (.d | tojson), s: \"v=\\(.d)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("1e-07")), c)
    assert(c.exists(_.contains("1e+16")), c)
    assert(c.exists(_.contains("12345678.5")), c)
    // the big LONG rounds through the double exactly as jq's reparse
    // does (...993 prints ...992)
    val big = Seq((1L, 9007199254740993L)).toDF("id", "n")
    val progB = "{id, t: (.n | tojson), s: \"\\(.n)\"}"
    val cB = Jq.compile(progB)(big).toJSON.collect().sorted.toSeq
    val rB = JqEscapeHatch.rawApply(big.toJSON, progB).collect().sorted.toSeq
    assert(cB == rB, s"\ncompiled: $cB\nreal jq:  $rB")
    assert(cB.head.contains("9007199254740992"), cB)
  }

  test("NaN and ±Inf render jq's bytes — the kernel is total over all doubles") {
    import graft.transform.JqEscapeHatch
    // round-17 VERDICT directive 1: NaN and ±Inf ARE storable in
    // parquet double columns, so the old raise was the render's last
    // data-dependent availability hazard. jq 1.6 prints nan as "null"
    // and clamps ±infinite to the extreme finite double's print —
    // byte-matched against the real binary in every render position
    // (tojson, interpolation, constructed composite, join).
    // ±Inf reaches the hatch as 1e999 JSON text (jq parses it to
    // ±infinite); NaN has no JSON input form, so the hatch side
    // computes it with jq's own `nan` builtin.
    val prog = "{id, t: (.d | tojson), s: \"v=\\(.d)\", a: \"\\([.d])\"}"
    val inf = Seq((1L, Double.PositiveInfinity),
      (2L, Double.NegativeInfinity)).toDF("id", "d")
    val c = Jq.compile(prog)(inf).toJSON.collect().sorted.toSeq
    val nd = Seq("{\"id\":1,\"d\":1e999}", "{\"id\":2,\"d\":-1e999}").toDS()
    val r = JqEscapeHatch.rawApply(nd, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("v=1.7976931348623157e+308")), c)
    assert(c.exists(_.contains("v=-1.7976931348623157e+308")), c)
    val cNan = Jq.compile(prog)(Seq((1L, Double.NaN)).toDF("id", "d"))
      .toJSON.collect().toSeq
    val progNan = "{id, t: (nan | tojson), s: \"v=\\(nan)\", a: \"\\([nan])\"}"
    val rNan = JqEscapeHatch.rawApply(Seq("{\"id\":1}").toDS(), progNan)
      .collect().toSeq
    assert(cNan == rNan, s"\ncompiled: $cNan\nreal jq:  $rNan")
    assert(cNan.head.contains("\"t\":\"null\""), cNan)
    assert(cNan.head.contains("\"a\":\"[null]\""), cNan)
    // join position: a NaN ELEMENT is a number that tostrings to
    // "null" (a true SQL NULL element joins as "" instead — the
    // null-vs-nan distinction must survive the render)
    val joinProg = "{id, j: (.ds | join(\",\"))}"
    val cJ = Jq.compile(joinProg)(
      Seq((1L, Seq(Double.NaN, 1.5), 0)).toDF("id", "ds", "z")
        .drop("z")).toJSON.collect().toSeq
    val rJ = JqEscapeHatch.rawApply(Seq("{\"id\":1}").toDS(),
      "{id, j: ([nan, 1.5] | join(\",\"))}").collect().toSeq
    assert(cJ == rJ, s"\ncompiled: $cJ\nreal jq:  $rJ")
    assert(cJ.head.contains("null,1.5"), cJ)
    val cJI = Jq.compile(joinProg)(
      Seq((1L, Seq(Double.PositiveInfinity, 1.5), 0)).toDF("id", "ds", "z")
        .drop("z")).toJSON.collect().toSeq
    val rJI = JqEscapeHatch.rawApply(
      Seq("{\"id\":1,\"ds\":[1e999,1.5]}").toDS(), joinProg)
      .collect().toSeq
    assert(cJI == rJI, s"\ncompiled: $cJI\nreal jq:  $rJI")
    // NaN PROPAGATES through double-space arithmetic and still renders
    // jq's bytes at the end of the pipe (nan * 2 prints null in jq too)
    val cA = Jq.compile("{id, s: \"v=\\(.d * 2)\"}")(
      Seq((1L, Double.NaN)).toDF("id", "d")).toJSON.collect().toSeq
    val rA = JqEscapeHatch.rawApply(Seq("{\"id\":1}").toDS(),
      "{id, s: \"v=\\(nan * 2)\"}").collect().toSeq
    assert(cA == rA, s"\ncompiled: $cA\nreal jq:  $rA")
    assert(cA.head.contains("v=null"), cA)
  }

  test("render is total over random bit-pattern doubles incl. NaN/Inf/subnormals") {
    // round-17 directive 1's done-bar: the corpus admits ALL bit
    // patterns — NaN payloads, ±Inf, subnormals, binade edges. For
    // finite values the shortest-print contract is the round-trip
    // property (the plan-level corpora pin jq's bytes); NaN/Inf pin
    // their fixed bytes; and nothing in the sweep may throw.
    import graft.functions.JqNumberString.render
    val rnd = new scala.util.Random(1808)
    var i = 0
    while (i < 20000) {
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      val s = render(d)
      if (java.lang.Double.isNaN(d)) assert(s == "null", s"$d -> $s")
      else if (d == Double.PositiveInfinity)
        assert(s == "1.7976931348623157e+308", s)
      else if (d == Double.NegativeInfinity)
        assert(s == "-1.7976931348623157e+308", s)
      else assert(java.lang.Double.parseDouble(s) == d,
        s"round-trip broke: bits=${java.lang.Double.doubleToRawLongBits(d)} -> $s")
      i += 1
    }
    for (d <- Seq(Double.NaN, java.lang.Double.longBitsToDouble(0x7ff8000000000001L),
        java.lang.Double.longBitsToDouble(0xfff8000000000000L)))
      assert(render(d) == "null", "every NaN payload prints null")
  }

  test("JDK over-printed mantissas render jq's shortest digits instead of raising") {
    import graft.transform.JqEscapeHatch
    // round-16 VERDICT directive 1: JDK 17's pre-Ryu Double.toString
    // over-prints some mantissas (JDK-4511638, fixed in 19) — the
    // kernel now reconstructs Gay's shortest digits itself, so these
    // render jq's exact bytes instead of raising: …99987E17 → the
    // 16-digit plain 999999999999999900; MIN_VALUE 4.9E-324 → 5e-324;
    // 9.99999999999999987E17 → 1e+18 (TWO digits shorter, with a
    // carry); 6.32E-322 → 6.3e-322. Java can also pick the WRONG
    // last digit at the same length (…769046E25 where jq rounds to
    // …047) — the full-length re-selection covers that too.
    val vals = Seq(999999999999999900.0, java.lang.Double.MIN_VALUE,
      9.99999999999999987e17, 6.32e-322, -3.5017826069769046e25,
      2.4779951876539562e25)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "d")
    val prog = "{id, t: (.d | tojson), s: \"v=\\(.d)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("5e-324")), c)
    assert(c.exists(_.contains("1e+18")), c)
    assert(c.exists(_.contains("999999999999999900")), c)
  }

  test("negative zero from expression intermediates renders jq's -0") {
    import graft.transform.JqEscapeHatch
    // −0.0 never arrives from STORAGE (UnsafeRow normalizes on write)
    // but an expression intermediate like `.d * -1` over 0.0 is −0.0,
    // and jq prints "-0" — round-16 directive 6 flips the old raise
    // to the byte-exact render
    val df = Seq((1L, 0.0), (2L, 2.5)).toDF("id", "d")
    val prog = "{id, s: \"v=\\(.d * -1)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("v=-0\"")), c)
  }

  test("randomized log-uniform doubles byte-match real jq in every magnitude") {
    import graft.transform.JqEscapeHatch
    // round-15 VERDICT directive 2's randomized corpus: sign ×
    // uniform mantissa × 10^exp with exp drawn across the full double
    // range, so all four print forms and both exponent widths appear.
    // NO over-print filter (round-16 directive 1: the kernel renders
    // JDK-over-printed mantissas correctly now, so the corpus draws
    // from ALL finite doubles); a 200k-value bit-random + log-uniform
    // sweep against the real binary backed the kernel change.
    val rnd = new scala.util.Random(163)
    val vals = Iterator.continually {
      val exp = rnd.nextInt(620) - 310 // 10^-310 .. 10^309
      val sign = if (rnd.nextBoolean()) 1.0 else -1.0
      sign * (rnd.nextDouble() * 9 + 1) * math.pow(10, exp)
    }.filter(v => java.lang.Double.isFinite(v) && v != 0.0)
      .take(60).toSeq
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "d")
    val prog = "{id, t: (.d | tojson), s: \"v=\\(.d)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    // the corpus must actually exercise the scientific form
    assert(c.exists(s => s.contains("e+") || s.contains("e-")), c)
  }

  test("longs beyond 2^53 inside composites raise instead of diverging from jq") {
    // round-15 ADVICE: to_json writes a big long's exact digits while
    // jq parses JSON integers into doubles and prints rounded
    // (9007199254740993 → 9007199254740992) — the byte-exact
    // composite path now guards its long leaves at runtime
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val df = Seq((1L, Seq(1L, 9007199254740993L))).toDF("id", "ns")
    for (prog <- Seq("{id, t: (.ns | tojson)}", "{id, s: \"\\(.ns)\"}")) {
      val e = intercept[Exception] { Jq.compile(prog)(df).collect() }
      assert(msgs(e).exists(_.contains("beyond 2^53")),
        s"$prog: ${msgs(e)}")
    }
    // the `..` stream guards the whole record once
    val e2 = intercept[Exception] { Jq.compile("..")(df).collect() }
    assert(msgs(e2).exists(_.contains("beyond 2^53")), msgs(e2))
    // in-range longs (boundary included) still render and byte-match
    import graft.transform.JqEscapeHatch
    val ok = Seq((1L, Seq(-9007199254740992L, 0L, 9007199254740992L)))
      .toDF("id", "ns")
    val prog = "{id, t: (.ns | tojson), s: \"\\(.ns)\"}"
    val c = Jq.compile(prog)(ok).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(ok.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    val cr = Jq.compile("..")(ok).as[String].collect().toSeq
    val rr = JqEscapeHatch.rawApply(ok.toJSON, "..").collect().toSeq
    assert(cr == rr, s"\ncompiled: $cr\nreal jq:  $rr")
  }

  test("randomized log-uniform floats byte-match real jq across the float range") {
    import graft.transform.JqEscapeHatch
    // the float path reparses through Float.toString, so the value jq
    // sees is the DOUBLE that print parses to; no over-print filter
    // (the kernel renders those correctly since round 17)
    val rnd = new scala.util.Random(164)
    val vals = Iterator.continually {
      val exp = rnd.nextInt(80) - 41 // 10^-41 .. 10^38
      val sign = if (rnd.nextBoolean()) 1.0f else -1.0f
      sign * ((rnd.nextFloat() * 9 + 1) * math.pow(10, exp).toFloat)
    }.filter(f => java.lang.Float.isFinite(f) && f != 0.0f)
      .take(50).toSeq
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "f")
    val prog = "{id, t: (.f | tojson), s: \"v=\\(.f)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(s => s.contains("e+") || s.contains("e-")), c)
  }

  test("decimal tojson renders through the double value like jq") {
    import graft.transform.JqEscapeHatch
    // the interpolation rule, now on tojson too: jq parses the
    // column's JSON decimal text into a double ("2.50" → 2.5) where
    // the decimal's own serialization keeps scale zeros
    val df = Seq((1L, "2.50"), (2L, "0.10"), (3L, "7.00"), (4L, "-123.45"))
      .toDF("id", "a").selectExpr("id", "cast(a AS decimal(7,2)) AS amount")
    val prog = "{id, t: (.amount | tojson), s: \"v=\\(.amount)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("\"t\":\"2.5\"")), c)
    assert(c.exists(_.contains("\"t\":\"7\"")), c)
  }

  test("date and timestamp tojson serialize as the quoted strings jq passes through") {
    import graft.transform.JqEscapeHatch
    // both sides (to_json here, the record's JSON text on jq's side)
    // use the same JacksonGenerator defaults, and jq passes a JSON
    // string through verbatim — byte-exact, composites included
    val df = Seq((1L, "2024-03-01", "2024-03-01 10:15:30.123"),
        (2L, "1999-12-31", "1999-12-31 23:59:59.0"))
      .toDF("id", "d", "ts")
      .selectExpr("id", "cast(d AS date) AS d", "cast(ts AS timestamp) AS ts",
        "array(cast(d AS date)) AS ds")
    val prog = "{id, td: (.d | tojson), tt: (.ts | tojson), ta: (.ds | tojson)}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("2024-03-01")), c)
  }

  test("integral floats render jq's reparse of the float's own print") {
    import graft.transform.JqEscapeHatch
    // round-15 ADVICE: 123456789f stores as 123456792f and its JSON
    // text is the float's print ("1.23456792E8") — jq renders the
    // DOUBLE that text parses to, not the widened float value. The
    // compiled path reparses (cast(cast(f AS string) AS double)) so
    // integral and fractional floats take the same route.
    val df = Seq((1L, "x")).toDF("id", "tag")
      .selectExpr("id", "cast(123456789 AS float) AS f",
        "cast(16777217 AS float) AS g") // 2^24+1, rounds to 2^24
    val prog = "{id, t: (.f | tojson), s: \"\\(.f)\", u: (.g | tojson)}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("16777216"), c)
  }

  test("untypeable comparison operands reject toward the hatch") {
    // round-15 VERDICT directive 4: a comparison whose operand kind
    // cannot be inferred compiles to a coercing Spark compare that
    // could diverge from jq's type order at runtime
    // ((.xs | map(.x) | first) == "5" over numeric data) — rejected
    // rather than guessed, like truthy
    val df = Seq((1L, Seq(5L), "a")).toDF("id", "xs", "s")
    for (prog <- Seq(
        "{x: ((.xs | map(. * 2) | first) == \"5\")}",
        "select((.xs | map(. * 2) | first) > 3)")) {
      val e = intercept[IllegalArgumentException] {
        Jq.compile(prog)(df).collect()
      }
      assert(e.getMessage.contains("untypeable"), s"$prog: ${e.getMessage}")
    }
    // null comparisons against untypeable operands stay legal — the
    // compile is isNull-shaped, no coercion
    assert(Jq.compile("select((.xs | map(. * 2) | first) != null) | {id}")(df)
      .count() == 1)
  }

  test("float paths render their own shortest print, not the widened double") {
    import graft.transform.JqEscapeHatch
    // a float's own shortest print ("0.1") matches jq's reparse of
    // the same JSON text; the double widening would print the float's
    // exact value ("0.10000000149011612"). Covers the two un-computed
    // shapes a float reaches the render through: a field and
    // first/last over a float array.
    val df = Seq((1L, "x")).toDF("id", "tag")
      .selectExpr("id", "cast(0.1 AS float) AS f",
        "array(cast(2.5 AS float), cast(7.0 AS float)) AS fs")
    val prog = "{id, s: \"f=\\(.f)\", t: (.f | tojson), " +
      "h: \"\\(first(.fs[]))\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("f=0.1"), c)
    assert(c.head.contains("\"h\":\"2.5\""), c)
  }

  test("cross-kind comparisons reject toward the hatch instead of coercing") {
    // jq compares across types by its total type order (number==string
    // is FALSE, numbers sort below strings); Spark would insert a
    // coercing cast (true where jq says false, or an ANSI cast error)
    val df = Seq((1L, "5", 5L)).toDF("id", "s", "n")
    for (prog <- Seq(
        "select(.n == \"5\")",            // predicate, raw-literal path
        "{x: (.n == \"5\")}",             // value position, total path
        "{x: (.s < 9)}",                   // ordered, mixed kinds
        "{x: (if .s == 5 then 1 else 2 end)}")) { // if-condition
      val e = intercept[IllegalArgumentException] {
        Jq.compile(prog)(df).collect()
      }
      assert(e.getMessage.contains("mixed kinds"), s"$prog: ${e.getMessage}")
    }
    // same-kind comparisons still compile
    assert(Jq.compile("select(.s == \"5\")")(df).count() == 1)
    assert(Jq.compile("select(.n == 5)")(df).count() == 1)
  }

  test("decimal fields interpolate through the double value like jq") {
    import graft.transform.JqEscapeHatch
    // a decimal(5,2) column's OWN string cast keeps scale zeros
    // ("2.50"); jq parses the JSON text into a double and prints
    // shortest ("2.5") — the render must go through the double
    val df = Seq((1L, "2.50"), (2L, "0.10"), (3L, "7.00"))
      .toDF("id", "a").selectExpr("id", "cast(a AS decimal(5,2)) AS amount")
    val prog = "{id, s: \"v=\\(.amount)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("v=2.5\"")), c)
    assert(c.exists(_.contains("v=7\"")), c)
  }

  test("rendered arithmetic evaluates in jq's double space") {
    import graft.transform.JqEscapeHatch
    // round-17 ADVICE (medium): jq parses every JSON number into an
    // IEEE double BEFORE computing, so arithmetic whose BYTES are the
    // contract must not run in Spark's native space — long arithmetic
    // past 2^53 diverges (…993 + 1: jq …992, long …994) and ANSI-
    // overflows where jq clamps; decimal arithmetic is exact where
    // jq's doubles round (0.1 + 0.2 prints 0.30000000000000004).
    val big = Seq((1L, 9007199254740993L, Seq(9007199254740993L)))
      .toDF("id", "n", "ns")
    val prog = "{id, s: \"v=\\(.n + 1)\", a: \"\\([.n + 1])\", " +
      "j: (.ns | map(. + 1) | join(\",\"))}"
    val c = Jq.compile(prog)(big).toJSON.collect().toSeq
    val r = JqEscapeHatch.rawApply(big.toJSON, prog).collect().toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("v=9007199254740992"), c)
    assert(c.head.contains("[9007199254740992]"), c)
    assert(c.head.contains("\"j\":\"9007199254740992\""), c)
    // ANSI long overflow: jq computes (and clamps) in doubles — the
    // compiled render must not raise where jq prints a number
    val huge = Seq((1L, Long.MaxValue)).toDF("id", "n")
    val progH = "{id, s: \"v=\\(.n * .n)\"}"
    val cH = Jq.compile(progH)(huge).toJSON.collect().toSeq
    val rH = JqEscapeHatch.rawApply(huge.toJSON, progH).collect().toSeq
    assert(cH == rH, s"\ncompiled: $cH\nreal jq:  $rH")
    assert(cH.head.contains("8.507059173023462e+37"), cH)
    // decimal operands: the JSON text parses into doubles on jq's
    // side, so 0.1 + 0.2 renders the double sum, not the exact
    // decimal 0.3
    val dec = Seq((1L, "0.1", "0.2")).toDF("id", "a", "b")
      .selectExpr("id", "cast(a AS decimal(5,2)) AS a",
        "cast(b AS decimal(5,2)) AS b")
    val progD = "{id, s: \"v=\\(.a + .b)\"}"
    val cD = Jq.compile(progD)(dec).toJSON.collect().toSeq
    val rD = JqEscapeHatch.rawApply(dec.toJSON, progD).collect().toSeq
    assert(cD == rD, s"\ncompiled: $cD\nreal jq:  $rD")
    assert(cD.head.contains("v=0.30000000000000004"), cD)
    // STRUCTURAL arithmetic keeps native space: the typed DataFrame
    // IS the output there, and its long digits byte-match jq below
    // 2^53 through toJSON (until/reduce results, object fields) —
    // pinned by the until and multi-generator tests
  }

  test("randomized long arithmetic around 2^53 byte-matches real jq through renders") {
    import graft.transform.JqEscapeHatch
    // the double-space rule under adversarial values: longs drawn
    // around and far past 2^53 (where long-space and jq's
    // double-space arithmetic disagree maximally), driven through
    // interpolation, composite, and map+join renders with + - *
    // against the real binary
    val rnd = new scala.util.Random(1811)
    val vals = Seq.fill(25) {
      val base = 9007199254740992L // 2^53
      rnd.nextInt(3) match {
        case 0 => base + rnd.nextLong() % 1000L
        case 1 => base * (1 + rnd.nextInt(900)) + rnd.nextLong() % 100000L
        case _ => rnd.nextLong() % (base / 3)
      }
    }
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, Seq(v)) }
      .toDF("id", "n", "ns")
    val prog = "{id, a: \"\\(.n + 7)\", b: \"\\(.n * 3)\", " +
      "c: \"\\([.n - 12345])\", j: (.ns | map(. + 1) | join(\",\"))}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
  }

  test("null-operand arithmetic follows jq: + identity, - * / error, /0 errors") {
    import graft.transform.JqEscapeHatch
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // `+` treats null as the identity in jq (null + 1 → 1) where SQL
    // `+` null-propagated — the record rendered "null" bytes jq never
    // prints. Value-level, so structural positions match too.
    val df = Seq((1L, Some(10L), Some(4L)), (2L, None, Some(4L)),
      (3L, Some(10L), None), (4L, None, None)).toDF("id", "a", "b")
    val prog = "{id, s: \"v=\\(.a + .b)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("\"s\":\"v=4\"")), c)   // null + 4
    assert(c.exists(_.contains("\"s\":\"v=10\"")), c)  // 10 + null
    assert(c.exists(_.contains("\"s\":\"v=null\"")), c) // null + null
    // structural `+` carries the same identity VALUES (toJSON's
    // null-field omission makes byte parity a harness artifact here,
    // so the structural check is by value)
    val sx = Jq.compile("{id, x: (.a + .b)}")(df)
      .orderBy("id").collect()
    assert(sx(1).getLong(1) == 4L && sx(2).getLong(1) == 10L &&
      sx(3).isNullAt(1), sx.mkString(","))
    // `- * /` ERROR on a null operand in jq; a rendered position must
    // raise rather than silently print "null" for a record jq errors
    // out of the stream (the reject-rather-than-guess convention)
    for (op <- Seq("-", "*", "/")) {
      val bad = Seq((1L, Option.empty[java.lang.Long], Some(4L)))
        .toDF("id", "a", "b")
      val e = intercept[Exception] {
        Jq.compile(s"{id, s: \"v=\\(.a $op .b)\"}")(bad).collect()
      }
      assert(msgs(e).exists(_.contains("null operand")),
        s"op $op: ${msgs(e)}")
    }
    // runtime zero divisor errors in jq; the render raises
    val dz = Seq((1L, 10L, 0L)).toDF("id", "a", "b")
    val ez = intercept[Exception] {
      Jq.compile("{id, s: \"v=\\(.a / .b)\"}")(dz).collect()
    }
    assert(msgs(ez).exists(_.contains("division by zero")), msgs(ez))
    // a LITERAL zero divisor is a jq COMPILE error ("Division by
    // zero?") — fail at compile like the binary
    val ec = intercept[IllegalArgumentException] {
      Jq.compile("{id, s: \"v=\\(.a / 0)\"}")(dz)
    }
    assert(ec.getMessage.contains("Division by zero"), ec.getMessage)
    // non-null division still renders jq's bytes
    val ok = Seq((1L, 10L, 4L)).toDF("id", "a", "b")
    val cOk = Jq.compile("{id, s: \"v=\\(.a / .b)\"}")(ok)
      .toJSON.collect().toSeq
    val rOk = JqEscapeHatch.rawApply(ok.toJSON,
      "{id, s: \"v=\\(.a / .b)\"}").collect().toSeq
    assert(cOk == rOk && cOk.head.contains("v=2.5"), s"$cOk vs $rOk")
    // STRUCTURAL `- * /` keeps SQL null-propagation BY DESIGN (the
    // typed DataFrame is the output contract there; jq would error
    // the record) — the documented structural/render line
    val sNull = Jq.compile("{id, x: (.a * .b)}")(
      Seq((1L, Option.empty[java.lang.Long], Some(4L))).toDF("id", "a", "b"))
      .collect()
    assert(sNull.head.isNullAt(1), "structural * over null stays SQL null")
    // inside try the null IS the error marker and the catch handles
    // it — a null operand of `-`/`*` fires the handler exactly like
    // jq's error does (byte-matched vs the real binary), and the
    // strict kernel stands down so the raise can't preempt the catch
    val tdf = Seq((1L, Some(10L)), (2L, Option.empty[Long])).toDF("id", "a")
    val progT = "{id, s: \"v=\\(try (.a * 2) catch -1)\"}"
    val cT = Jq.compile(progT)(tdf).toJSON.collect().sorted.toSeq
    val rT = JqEscapeHatch.rawApply(tdf.toJSON, progT).collect().sorted.toSeq
    assert(cT == rT, s"\ncompiled: $cT\nreal jq:  $rT")
    assert(cT.exists(_.contains("v=20")) && cT.exists(_.contains("v=-1")), cT)
  }

  test("randomized null-mix + chains byte-match real jq") {
    import graft.transform.JqEscapeHatch
    // the null-identity compile under chained `+` with nulls anywhere:
    // jq folds left treating null as identity at every step — 30
    // random rows × three nullable operands, rendered and compared
    val rnd = new scala.util.Random(1812)
    val rows = (0 until 30).map { i =>
      def v(): Option[Long] =
        if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(1000).toLong)
      (i.toLong, v(), v(), v())
    }
    val df = rows.toDF("id", "a", "b", "c")
    val prog = "{id, s: \"v=\\(.a + .b + .c)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
  }

  test("arithmetic over non-numeric operands rejects at compile toward the hatch") {
    // jq's + concatenates strings/arrays and merges objects — programs
    // that WORK in jq — while the compiled SQL + died with a runtime
    // ANSI cast error mid-job. The compile-time reject routes them
    // through applyTemplated's hatch fallback, where they work.
    val df = Seq((1L, "a", "b", Seq(1L), Seq(2L),
      java.sql.Date.valueOf("2024-01-01"))).toDF("id", "s", "t", "xs", "ys", "d")
    for (prog <- Seq(
        "{id, c: (.s + .t)}",           // string concat
        "{id, c: (.xs + .ys)}",         // array concat
        "{id, c: (.d + 1)}",            // date + number: jq errors
        "{id, c: ((.s | ascii_downcase) + .t)}")) { // computed string kind
      val e = intercept[IllegalArgumentException](Jq.compile(prog)(df))
      assert(e.getMessage.contains("EscapeHatch"), s"$prog: ${e.getMessage}")
    }
    // ...and applyTemplated serves the same program via the subprocess
    val served = Jq.applyTemplated(df.select("id", "s", "t"), "{id, c: (.s + .t)}")
    assert(served.select("c").collect().head.getString(0) == "ab")
  }

  test("jq % truncates like jq in renders, rejects fractional elsewhere") {
    import graft.transform.JqEscapeHatch
    // jq's % truncates both operands to integers (7.9 % 3 is 1);
    // Spark's % over fractional types is fmod (1.9) — silent wrong
    // bytes, so statically-fractional operands reject in STRUCTURAL
    // positions, while strict render positions route through the MOD
    // kernel, which truncates exactly like jq
    val df = Seq((1L, 7.9)).toDF("id", "d")
    val e = intercept[IllegalArgumentException] {
      Jq.compile("{id, m: (.d % 3)}")(df)
    }
    assert(e.getMessage.contains("truncates"), e.getMessage)
    // integral structural % stays compiled (q34's .cust % 10 shape)
    val ok = Jq.compile("{id, m: (.id % 3)}")(
      Seq((7L, 0)).toDF("id", "z").drop("z")).collect()
    assert(ok.head.getLong(1) == 1L)
    // render position: the kernel truncates fractional operands
    // (7.9 % 3 → 1) and computes the mod of the DOUBLE jq holds past
    // 2^53 (9007199254740993 % 10 → 2, the mod of the rounded …992,
    // where long-space says 3) — both byte-matched vs the binary
    val big = Seq((1L, 7.9, 9007199254740993L)).toDF("id", "d", "n")
    val prog = "{id, a: \"\\(.d % 3)\", b: \"\\(.n % 10)\"}"
    val c = Jq.compile(prog)(big).toJSON.collect().toSeq
    val r = JqEscapeHatch.rawApply(big.toJSON, prog).collect().toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.head.contains("\"a\":\"1\"") && c.head.contains("\"b\":\"2\""), c)
    // null % and % 0 error in jq — the render raises
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val eN = intercept[Exception] {
      Jq.compile("{id, s: \"v=\\(.a % 3)\"}")(
        Seq((1L, Option.empty[java.lang.Long])).toDF("id", "a")).collect()
    }
    assert(msgs(eN).exists(_.contains("null operand")), msgs(eN))
    val eZ = intercept[Exception] {
      Jq.compile("{id, s: \"v=\\(.id % .z)\"}")(
        Seq((7L, 0L)).toDF("id", "z")).collect()
    }
    assert(msgs(eZ).exists(_.contains("modulus by zero")), msgs(eZ))
    // % inside a try rejects: the zero-modulus error carries no null
    // marker the compiled catch could see
    val eT = intercept[IllegalArgumentException] {
      Jq.compile("{id, s: \"v=\\(try (.id % 3) catch -1)\"}")(
        Seq((7L, 0)).toDF("id", "z").drop("z"))
    }
    assert(eT.getMessage.contains("EscapeHatch"), eT.getMessage)
  }

  test("numeric length declares and computes the double jq holds") {
    import graft.transform.JqEscapeHatch
    // round-17 ADVICE (low): length over numbers is abs() in jq-
    // double space; the tracked type now matches the physical double
    val df = Seq((1L, -2.5, -3L), (2L, 4.0, 5L)).toDF("id", "d", "n")
    val prog = "{id, a: \"\\(.d | length)\", b: \"\\(.n | length)\"}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.exists(_.contains("\"a\":\"2.5\"")), c)
    assert(c.exists(_.contains("\"b\":\"3\"")), c)
  }

  test("expanded-year date literals stay out of the pushdown rewrite") {
    // round-17 ADVICE (low): LocalDate.parse accepts "+10000-01-01",
    // where the 10-char lexical≡chronological premise fails — the
    // rewrite now requires the fixed \d{4}-\d{2}-\d{2} form, so the
    // expanded form falls back to the mixed-kind rejection (→ hatch)
    val df = Seq((1L, java.sql.Date.valueOf("2024-03-01")))
      .toDF("id", "d")
    val e = intercept[IllegalArgumentException] {
      Jq.compile("select(.d > \"+10000-01-01\") | {id}")(df)
    }
    assert(e.getMessage.contains("EscapeHatch"), e.getMessage)
    // the normal form still compiles to the pushed typed compare
    assert(Jq.compile("select(.d > \"2024-01-01\") | {id}")(df)
      .collect().length == 1)
  }

  test("source lint: no when(X.isNull) guard re-splices its scrutinee in otherwise") {
    // the q220 regression mechanism (round-17 VERDICT directive 3):
    // Catalyst's subexpression elimination never unifies a conditional
    // BRANCH with its predicate, so when(X.isNull, …).otherwise(f(X))
    // evaluates X's subtree twice — measured +40% over a HOF-fed
    // input. Two legal escapes, both visible at the site: a scrutinee
    // named `once` (the convention for transform-lambda variables,
    // whose re-reference is a per-row slot read, not a splice) and an
    // explicit `// splice-ok: <why>` marker on the same line (bounded
    // root-struct / getField-chain scrutinees in the enumeration
    // devices). Everything else must use a single-reference form:
    // coalesce where null-propagation matches, or a kernel that makes
    // the null case a data case (JqText.unquote/strLen).
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala/graft")
    val pat = java.util.regex.Pattern.compile("when\\((\\w+)\\.isNull")
    val offenders = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).flatMap { p =>
        val src = new String(Files.readAllBytes(p), "UTF-8")
        val m = pat.matcher(src)
        val hits = scala.collection.mutable.ListBuffer.empty[String]
        while (m.find()) {
          val ident = m.group(1)
          val lineStart = src.lastIndexOf('\n', m.start) + 1
          val lineEndRaw = src.indexOf('\n', m.start)
          val lineEnd = if (lineEndRaw < 0) src.length else lineEndRaw
          val line = src.substring(lineStart, lineEnd).trim
          // the otherwise-branch text: balanced-paren scan from the
          // first .otherwise( after the match
          val window = src.substring(m.end,
            math.min(src.length, m.end + 600))
          val oIdx = window.indexOf(".otherwise(")
          val branch = if (oIdx < 0) "" else {
            val start = oIdx + ".otherwise(".length
            var depth = 1
            var i = start
            while (i < window.length && depth > 0) {
              window.charAt(i) match {
                case '(' => depth += 1
                case ')' => depth -= 1
                case _ =>
              }
              i += 1
            }
            window.substring(start, i)
          }
          val reSplices = java.util.regex.Pattern
            .compile("\\b" + java.util.regex.Pattern.quote(ident) + "\\b")
            .matcher(branch).find()
          val isComment = line.startsWith("//") || line.startsWith("*")
          if (reSplices && !isComment && ident != "once" &&
              !line.contains("splice-ok"))
            hits += s"${p.getFileName}: $ident in: ${line.take(70)}"
        }
        hits
      }.toList
    assert(offenders.isEmpty,
      "when(X.isNull) guard re-splices its scrutinee in the otherwise " +
        "branch — use coalesce / a null-propagating kernel, bind " +
        "through a transform lambda var named `once`, or justify with " +
        "// splice-ok: <why> — " + offenders.mkString("; "))
  }

  test("temporal render matrix: date/timestamp/ntz reach every render position") {
    import graft.transform.JqEscapeHatch
    // round-17 verdict item 7's hunt, systematized: the round found
    // date/timestamp gaps in interpolation and join only by hand —
    // this matrix drives EVERY temporal type through EVERY render
    // position (interpolation, tojson, tostring, length, join,
    // constructed composite) against the real binary, with fraction
    // and null variation (the timestamp JSON text has a VARIABLE
    // fraction width — both shapes must round-trip).
    val rows = Seq(
      (1L, "2024-03-01", "2024-03-01 10:20:30.125", "2024-03-01 10:20:30.125"),
      (2L, "0987-12-31", "2024-03-01 10:20:30", "2024-03-01 10:20:30"),
      (3L, null, null, null))
    val df = rows.toDF("id", "d0", "t0", "n0").selectExpr(
      "id",
      "cast(d0 AS date) AS d",
      "cast(t0 AS timestamp) AS t",
      "cast(n0 AS timestamp_ntz) AS n")
    for (c <- Seq("d", "t", "n")) {
      val prog = s"{id, i: \"v=\\(.$c)\", j: (.$c | tojson), " +
        s"s: (.$c | tostring), l: (.$c | length), a: \"\\([.$c])\"}"
      val comp = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
      val real = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
      assert(comp == real, s"column $c:\ncompiled: $comp\nreal jq:  $real")
    }
    // join position needs ARRAY columns of each temporal type
    val d1 = java.sql.Date.valueOf("2024-03-01")
    val d2 = java.sql.Date.valueOf("0987-12-31")
    val ts1 = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.125")
    val ts2 = java.sql.Timestamp.valueOf("2024-03-01 10:20:30")
    val lt1 = java.time.LocalDateTime.parse("2024-03-01T10:20:30.125")
    val lt2 = java.time.LocalDateTime.parse("2024-03-01T10:20:30")
    val adf = Seq((1L, Seq(d1, d2, null), Seq(ts1, ts2, null),
      Seq(lt1, lt2, null))).toDF("id", "ds", "ts", "ns")
    for (c <- Seq("ds", "ts", "ns")) {
      val prog = s"{id, j: (.$c | join(\",\"))}"
      val comp = Jq.compile(prog)(adf).toJSON.collect().toSeq
      val real = JqEscapeHatch.rawApply(adf.toJSON, prog).collect().toSeq
      assert(comp == real, s"array $c:\ncompiled: $comp\nreal jq:  $real")
    }
  }

  test("multi-generator object construction compiles the jq cartesian") {
    import graft.transform.JqEscapeHatch
    // round-12 VERDICT directive 4: the cross-product form was the
    // next escape-hatch faller after q268's single generator. One
    // explode per generator = one output object per combination; an
    // empty (or null) generator zeroes the whole record's output.
    val df = Seq(
      (1L, Seq("a", "b"), Seq(10L, 20L)),
      (2L, Seq("c"), Seq(30L)),
      (3L, Seq("d"), Seq.empty[Long])).toDF("id", "xs", "ys")
    val prog = "{i: .id, a: .xs[], b: .ys[]}"
    val c = Jq.compile(prog)(df).toJSON.collect().sorted.toSeq
    val r = JqEscapeHatch.rawApply(df.toJSON, prog).collect().sorted.toSeq
    assert(c == r, s"\ncompiled: $c\nreal jq:  $r")
    assert(c.size == 5, "2x2 + 1x1 + 1x0 combinations")
    // the same array iterated twice crosses with itself, like jq
    val prog2 = "{a: .xs[], b: .xs[]}"
    val c2 = Jq.compile(prog2)(df).toJSON.collect().sorted.toSeq
    val r2 = JqEscapeHatch.rawApply(df.toJSON, prog2).collect().sorted.toSeq
    assert(c2 == r2, s"\ncompiled: $c2\nreal jq:  $r2")
    // three generators with a computed sibling
    val prog3 = "{a: .xs[], b: .ys[], n: (.id + 1), c: .xs[]}"
    val c3 = Jq.compile(prog3)(df).toJSON.collect().sorted.toSeq
    val r3 = JqEscapeHatch.rawApply(df.toJSON, prog3).collect().sorted.toSeq
    assert(c3 == r3, s"\ncompiled: $c3\nreal jq:  $r3")
  }
}
