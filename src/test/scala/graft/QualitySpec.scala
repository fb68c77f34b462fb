package graft

import graft.ops.Quality

class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("fkAudit: rows, null keys, and orphans per relation") {
    val child = Seq(
      (1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)), // 99 is an orphan
      (4L, None)                                          // null, not orphan
    ).toDF("id", "fk")
    val parent = Seq(10L, 20L, 10L).toDF("pk") // dup pk must not multiply
    val out = Quality.fkAudit(Seq(("child.fk->parent.pk", child, "fk",
        parent, "pk")))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("child.fk->parent.pk", 4L, 1L, 1L)), s"got $out")
  }

  test("fkAudit: multiple relations union in long format") {
    val a = Seq(1L).toDF("k")
    val b = Seq(1L, 2L).toDF("k")
    val out = Quality.fkAudit(Seq(
        ("a->b", a, "k", b, "k"),
        ("b->a", b, "k", a, "k")))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a->b", 1L, 0L, 0L), ("b->a", 2L, 0L, 1L)), s"got $out")
    intercept[IllegalArgumentException] { Quality.fkAudit(Seq.empty) }
  }
}
