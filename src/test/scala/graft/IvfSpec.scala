package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class IvfSpec extends SparkSuite {
  import spark.implicits._

  test("IVF top-k achieves high recall vs brute force on real embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val brute = Similarity.cosineTopK(e, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val idx = Similarity.IvfIndex.fit(e, "embedding", cells = 4)
    val assigned = idx.assign(e, "embedding")
    // probing ALL cells must reproduce brute force exactly
    val all = Similarity.ivfTopK(idx, assigned, "vec_id", "embedding", q,
      k = 10, nprobe = 4).select("vec_id").as[Long].collect().toSet
    assert(all == brute)
    // probing 2/4 cells keeps most of the true top-k (recall ≥ 0.5 on
    // this synthetic corpus; real-world tuning trades nprobe for recall)
    val probed = Similarity.ivfTopK(idx, assigned, "vec_id", "embedding", q,
      k = 10, nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(probed.intersect(brute).size >= 5, s"recall too low: $probed vs $brute")
  }

  test("cell assignment is total and deterministic") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = Similarity.IvfIndex.fit(e, "embedding", cells = 4)
    val cells = idx.assign(e, "embedding").select("cell").as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 4))
    val again = idx.assign(e, "embedding").select("cell").as[Int].collect()
    assert(cells.toSeq == again.toSeq)
  }

  test("index save/load round-trips: restored assignments are bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = Similarity.IvfIndex.fit(e, "embedding", cells = 4)
    Similarity.IvfIndex.save(idx, spark, s"$dir/idx")
    val restored = Similarity.IvfIndex.load(spark, s"$dir/idx")
    assert(restored.centroids.map(_.toSeq).toSeq ==
      idx.centroids.map(_.toSeq).toSeq)
    val a = idx.assign(e, "embedding").select("vec_id", "cell")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val b = restored.assign(e, "embedding").select("vec_id", "cell")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("ivfSearchBatch: one pass equals the per-query probe loop exactly") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = Similarity.IvfIndex.fit(e, "embedding", cells = 4)
    val queries = e.filter($"vec_id" < 3)
    val batch = Similarity.ivfSearchBatch(idx, e, "vec_id", "embedding",
        queries, k = 5, nprobe = 2)
      .select($"query_id".as[Long], $"corpus_id".as[Long], $"cos_sim".as[Double])
      .collect().toSet
    val assigned = idx.assign(e, "embedding")
    val loop = queries
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
      .flatMap { r =>
        Similarity.ivfTopK(idx, assigned, "vec_id", "embedding",
          r.getSeq[Double](1), k = 5, nprobe = 2)
          .select($"vec_id".as[Long], $"cos_sim".as[Double]).collect()
          .map { case (cid, cos) => (r.getLong(0), cid, cos) }
      }.toSet
    assert(batch == loop, s"batch=$batch\nloop=$loop")
    // every query got exactly k results
    assert(batch.groupBy(_._1).forall(_._2.size == 5))
  }
}
