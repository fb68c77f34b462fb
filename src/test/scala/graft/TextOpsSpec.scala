package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSuite {
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
}
