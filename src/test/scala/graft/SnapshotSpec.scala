package graft

import graft.ops.Snapshot

class SnapshotSpec extends SparkSuite {
  import spark.implicits._

  test("diff: all four statuses, null-vs-empty counts as changed") {
    val old = Seq(
      (1L, Option("same")),
      (2L, Option("before")),
      (3L, Option("gone")),
      (5L, Option.empty[String])   // null text
    ).toDF("doc_id", "text")
    val nw = Seq(
      (1L, Option("same")),        // unchanged
      (2L, Option("after")),       // changed
      (4L, Option("fresh")),       // added
      (5L, Option(""))             // null -> empty IS a change (the
                                   // injective digest separates them)
    ).toDF("doc_id", "text")
    val out = Snapshot.diff(old, nw, "doc_id", Seq("text"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"),
      (4L, "added"), (5L, "changed")), s"got $out")
  }

  test("diff over multiple columns: any column's change flips the status") {
    val old = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "t", "u")
    val nw = Seq((1L, "a", "x"), (2L, "b", "z")).toDF("id", "t", "u")
    val out = Snapshot.diff(old, nw, "id", Seq("t", "u"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "unchanged"), (2L, "changed")), s"got $out")
  }
}
