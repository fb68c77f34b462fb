package graft

import graft.ops.Similarity

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by cosine similarity") {
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), k = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 1L))
  }

  test("cosine of identical vectors is 1") {
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding",
      Seq(0.0, 0.0, 1.0), k = 1)
      .as[(Long, Double)].head()
    assert(out == ((3L, 1.0)))
  }

  test("knnJoin returns k neighbours per query") {
    val out = Similarity.knnJoin(vecs.filter($"vec_id" > 0), vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 2)
    val rows = out.select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(rows.map(_._2) == Seq(1L, 2L)) // nearest then next
  }

  test("LSH buckets put identical vectors together") {
    val b = Similarity.lshBuckets(vecs, "embedding", dim = 3, planes = 8)
    val buckets = b.select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(buckets(0L) == buckets(0L)) // deterministic
    val again = Similarity.lshBuckets(vecs, "embedding", dim = 3, planes = 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(buckets == again)
  }
}
