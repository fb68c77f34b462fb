package graft

import graft.transform.JqEscapeHatch
import graft.pipeline.Pipeline
import graft.ops.Dedup
import graft.model.Meta

class JqEscapeSpec extends SparkSuite {
  import spark.implicits._

  private def people = Seq(
    (1L, "alice", Seq("a", "b")), (2L, "bob", Seq("c"))
  ).toDF("id", "name", "tags")

  test("escape hatch runs real jq: 1→N iteration with restructuring") {
    // .tags[] inside object construction — outside the compiled subset
    val out = JqEscapeHatch(people, "{who: .name, tag: .tags[]}")
    assert(out.columns.sorted.toSeq == Seq("tag", "who"))
    assert(out.count() == 3)
    assert(out.filter($"who" === "alice").count() == 2)
  }

  test("escape hatch supports 0-output filtering and jq builtins") {
    val out = JqEscapeHatch(people,
      "select((.tags | length) > 1) | {id, n: (.tags | join(\"-\"))}")
    assert(out.count() == 1)
    assert(out.select("n").as[String].head() == "a-b")
  }

  test("pipeline falls back to the escape hatch for non-subset programs") {
    // `explode` (string → codepoint array) is outside the compiled
    // function set (applyFn throws), so this program must route
    // through the real-jq hatch. (`tojson`, the previous fixture
    // here, compiles since round 15; array indexing since round 12.)
    val df = Pipeline.transform(people, Pipeline.Spec("FILE", Nil,
      Map("JQ__QUERY" -> "{id, cp: (.name | explode)}")))
    assert(df.columns.sorted.toSeq == Seq("cp", "id"))
    assert(df.filter($"id" === 2).select("cp").as[Seq[Long]].head() ==
      "bob".map(_.toLong))
    // the compiled-since-round-15 tojson form runs NATIVELY — same
    // output as the hatch used to produce here
    val df2 = Pipeline.transform(people, Pipeline.Spec("FILE", Nil,
      Map("JQ__QUERY" -> "{id, t: (.tags | tojson)}")))
    assert(df2.columns.sorted.toSeq == Seq("id", "t"))
    assert(df2.filter($"id" === 1).select("t").as[String].head() == """["a","b"]""")
    import graft.transform.Jq
    assert(Jq.compile("{id, t: (.tags | tojson)}")(people).columns.nonEmpty,
      "tojson must compile natively, not via the hatch")
    // and the compiled-since-round-12 indexing form still works inline
    val df3 = Pipeline.transform(people, Pipeline.Spec("FILE", Nil,
      Map("JQ__QUERY" -> "{id, first_tag: .tags[0]}")))
    assert(df3.filter($"id" === 1).select("first_tag").as[String].head() == "a")
  }

  test("record_total_count broadcast stamp (client_reader.go:166)") {
    val out = Meta.withRecordTotalCount(people)
    assert(out.select(Meta.RecordTotalCountCol).as[Long].collect().toSet == Set(2L))
  }

  test("dedupCorpus: exact + near-dup removal keeps one representative") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today ok"),
      (2L, "the quick brown fox jumps over the lazy dog today ok"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog today yes"), // near dup
      (4L, "entirely unrelated text about distributed query engines ok")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text",
      jaccardThreshold = 0.5, shingleSize = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"kept $kept")
  }
}
