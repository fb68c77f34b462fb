package graft

import java.nio.file.Files

import graft.ops.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++
    Array.tabulate[Byte](200)(i => (i % 127).toByte)
  private def jpgMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++
    Array.tabulate[Byte](100)(i => (i % 127).toByte)

  test("binaryFile ingest: media schema + magic-byte mime sniffing") {
    val dir = Files.createTempDirectory("graft_media")
    Files.write(dir.resolve("a.png"), pngMagic)
    Files.write(dir.resolve("b.jpg"), jpgMagic)
    val df = Multimodal.fromBinaryFiles(spark, dir.toString)
    assert(df.schema.fieldNames.toSeq == Seq("media_id", "content", "meta"))
    val mimes = df.select("meta.mime").as[String].collect().toSet
    assert(mimes == Set("image/png", "image/jpeg"))
  }

  test("image feature extraction: deterministic shape and batch plumbing") {
    val df = Seq((1L, pngMagic, ("image/png", 0, 0, 0L)),
      (2L, jpgMagic, ("image/jpeg", 0, 0, 0L)))
      .toDF("media_id", "content", "meta")
      .selectExpr("media_id", "content",
        "named_struct('mime', meta._1, 'width', meta._2, 'height', meta._3, 'duration_ms', meta._4) AS meta")
    val feats = Multimodal.imageFeatures(df)
    assert(feats.columns.toSeq == Seq("media_id", "mime", "features"))
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Float](2).size == 16)
    // deterministic: re-run gives identical features
    val again = Multimodal.imageFeatures(df).orderBy("media_id").collect()
    assert(rows(0).getSeq[Float](2) == again(0).getSeq[Float](2))
  }

  test("resize keeps binary contract and stamps dims (STUB kernel)") {
    val df = Seq((1L, pngMagic, ("image/png", 0, 0, 0L)))
      .toDF("media_id", "content", "meta")
      .selectExpr("media_id", "content",
        "named_struct('mime', meta._1, 'width', meta._2, 'height', meta._3, 'duration_ms', meta._4) AS meta")
    val out = Multimodal.resize(df, 8, 8).head()
    val meta = out.getStruct(out.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 8 && meta.getAs[Int]("height") == 8)
    assert(out.getAs[Array[Byte]]("content").length <= 64)
  }

  test("frame sampling emits n rows per video (1→N)") {
    val df = Seq((7L, Array.tabulate[Byte](1000)(_.toByte), ("video/mp4", 0, 0, 0L)))
      .toDF("media_id", "content", "meta")
      .selectExpr("media_id", "content",
        "named_struct('mime', meta._1, 'width', meta._2, 'height', meta._3, 'duration_ms', meta._4) AS meta")
    val frames = Multimodal.sampleFrames(df, 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    assert(frames.count() == 4)
    assert(frames.select("frame_idx").as[Int].collect().toSet == Set(0, 1, 2, 3))
  }
}
