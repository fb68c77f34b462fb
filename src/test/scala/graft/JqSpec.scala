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
}
