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

  /** Render a real image in-memory: left half black, right half white. */
  private def halfImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("REAL image features: pooled grayscale grid reflects actual pixels") {
    val df = Seq((1L, halfImage(32, 32, "png")), (2L, halfImage(16, 16, "jpg")),
      (3L, Array[Byte](1, 2, 3))) // undecodable
      .toDF("media_id", "content")
      .selectExpr("media_id", "content",
        "named_struct('mime', CAST(NULL AS STRING), 'width', CAST(NULL AS INT), " +
          "'height', CAST(NULL AS INT), 'duration_ms', CAST(NULL AS BIGINT)) AS meta")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        Multimodal.sniffMime($"content").as("mime"),
        $"meta.width", $"meta.height", $"meta.duration_ms"))
    val feats = Multimodal.imageFeatures(df)
    assert(feats.columns.toSeq == Seq("media_id", "mime", "features"))
    val rows = feats.orderBy("media_id").collect()
    // 4x4 grid row-major: columns 0-1 over the black half (~0),
    // columns 2-3 over the white half (~1) — REAL luminance statistics
    val png = rows(0).getSeq[Float](2)
    assert(png.size == 16)
    (0 until 4).foreach { gy =>
      assert(png(gy * 4) < 0.05f && png(gy * 4 + 1) < 0.05f,
        s"black cells row $gy: $png")
      assert(png(gy * 4 + 2) > 0.95f && png(gy * 4 + 3) > 0.95f,
        s"white cells row $gy: $png")
    }
    // JPEG decodes too (lossy, so looser bounds)
    val jpg = rows(1).getSeq[Float](2)
    assert(jpg(0) < 0.2f && jpg(3) > 0.8f)
    // undecodable payload → null features, not hash noise
    assert(rows(2).isNullAt(2))
    // deterministic: re-run gives identical features
    val again = Multimodal.imageFeatures(df).orderBy("media_id").collect()
    assert(png == again(0).getSeq[Float](2))
  }

  test("aHash: re-encodes collide, different images differ, dedup composes with SimHash banding") {
    // same scene at different sizes/encodings → near-identical 8×8
    // luminance → tiny Hamming distance; inverted scene → far
    def inverted(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, if (x < w / 2) 0xFFFFFF else 0x000000)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, halfImage(32, 32, "png")), (2L, halfImage(64, 64, "jpg")),
      (3L, inverted(32, 32)), (4L, Array[Byte](9, 9, 9)))
      .toDF("media_id", "content")
    val sigs = graft.ops.Multimodal.imageAHash(df)
    val m = sigs.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m(4L).isEmpty) // undecodable → null
    val d12 = java.lang.Long.bitCount(m(1L).get ^ m(2L).get)
    val d13 = java.lang.Long.bitCount(m(1L).get ^ m(3L).get)
    assert(d12 <= 3, s"re-encode distance $d12")
    assert(d13 > 30, s"inverted distance $d13") // complementary scenes
    // the signature shape feeds the text SimHash candidate machinery
    val cands = graft.ops.Dedup.simhashCandidatesFromSigs(
      sigs.na.drop(), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands == Set((1L, 2L)))
  }

  test("balanceForDecode spreads assets across the requested partitions") {
    val df = (1L to 40L).map(i => (i, Array.fill(i.toInt)(i.toByte)))
      .toDF("media_id", "content").coalesce(1)
    val balanced = graft.ops.Multimodal.balanceForDecode(df, partitions = 8)
    assert(balanced.rdd.getNumPartitions == 8)
    // no partition hoards the corpus (decode cost skew guard)
    val sizes = balanced.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.max <= 15, sizes.mkString(","))
    assert(balanced.count() == 40)
  }

  test("REAL video frames: MJPEG AVI chunk walk decodes actual sampled pixels") {
    def solidJpeg(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(x => (0 until 16).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val movi = new java.io.ByteArrayOutputStream()
      movi.write("movi".getBytes)
      frames.foreach { j =>
        movi.write("00dc".getBytes); movi.write(le32(j.length)); movi.write(j)
        if (j.length % 2 == 1) movi.write(0)
      }
      val body = new java.io.ByteArrayOutputStream()
      body.write("AVI ".getBytes)
      body.write("LIST".getBytes); body.write(le32(movi.size())); movi.writeTo(body)
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes); out.write(le32(body.size())); body.writeTo(out)
      out.toByteArray
    }
    // red, green, blue, yellow — sampling 2 of 4 must hit frames 0 and 2
    val avi = mjpegAvi(Seq(
      solidJpeg(0xFF0000), solidJpeg(0x00FF00),
      solidJpeg(0x0000FF), solidJpeg(0xFFFF00)))
    val df = Seq((1L, avi)).toDF("media_id", "content")
    val frames = graft.ops.Multimodal.sampleFrames(df, 2)
      .orderBy("frame_idx").collect()
    assert(frames.length == 2)
    def centerRgb(png: Array[Byte]): Int = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      img.getRGB(8, 8) & 0xFFFFFF
    }
    val c0 = centerRgb(frames(0).getAs[Array[Byte]](2))
    val c2 = centerRgb(frames(1).getAs[Array[Byte]](2))
    // JPEG is lossy: assert channel dominance, not exact values
    assert(((c0 >> 16) & 0xFF) > 200 && ((c0 >> 8) & 0xFF) < 80, f"$c0%06x") // red
    assert((c2 & 0xFF) > 200 && ((c2 >> 16) & 0xFF) < 80, f"$c2%06x")        // blue
  }

  test("REAL video frames: MJPEG QuickTime/MP4 sample-table walk decodes actual pixels") {
    def solidJpeg(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(x => (0 until 16).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def atom(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8 + body.length) ++ tpe.getBytes("ISO-8859-1") ++ body
    }
    // a minimal but spec-shaped QuickTime file: ftyp, mdat holding the
    // JPEG samples back-to-back, moov with the full sample-table chain
    def mov(jpegs: Seq[Array[Byte]], codec: String): Array[Byte] = {
      val ftyp = atom("ftyp", "qt  ".getBytes, be32(0))
      val mdatPayloadOff = ftyp.length + 8
      val mdat = atom("mdat", jpegs.flatten.toArray)
      val stsd = atom("stsd", be32(0), be32(1),
        be32(16), codec.getBytes("ISO-8859-1"), new Array[Byte](8))
      val stsz = atom("stsz", be32(0), be32(0), be32(jpegs.length),
        jpegs.flatMap(j => be32(j.length)).toArray)
      val stsc = atom("stsc", be32(0), be32(1), be32(1), be32(jpegs.length), be32(1))
      val stco = atom("stco", be32(0), be32(1), be32(mdatPayloadOff))
      val hdlr = atom("hdlr", be32(0), "mhlr".getBytes, "vide".getBytes,
        new Array[Byte](12))
      val moov = atom("moov", atom("trak", atom("mdia", hdlr,
        atom("minf", atom("stbl", stsd, stsz, stsc, stco)))))
      ftyp ++ mdat ++ moov
    }
    // red, green, blue, yellow — sampling 2 of 4 must hit frames 0 and 2
    val jpegs = Seq(
      solidJpeg(0xFF0000), solidJpeg(0x00FF00),
      solidJpeg(0x0000FF), solidJpeg(0xFFFF00))
    val df = Seq((1L, mov(jpegs, "jpeg"))).toDF("media_id", "content")
    val frames = graft.ops.Multimodal.sampleFrames(df, 2)
      .orderBy("frame_idx").collect()
    assert(frames.length == 2)
    def centerRgb(png: Array[Byte]): Int = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      img.getRGB(8, 8) & 0xFFFFFF
    }
    val c0 = centerRgb(frames(0).getAs[Array[Byte]](2))
    val c2 = centerRgb(frames(1).getAs[Array[Byte]](2))
    assert(((c0 >> 16) & 0xFF) > 200 && ((c0 >> 8) & 0xFF) < 80, f"$c0%06x") // red
    assert((c2 & 0xFF) > 200 && ((c2 >> 16) & 0xFF) < 80, f"$c2%06x")        // blue
    // the walker itself reports the codec + all four sample ranges
    val parsed = graft.ops.Multimodal.bmffVideoSamples(mov(jpegs, "jpeg"))
    assert(parsed.exists { case (codec, ranges) =>
      codec == "jpeg" && ranges.length == 4 &&
        ranges.map(_._2) == jpegs.map(_.length)
    }, parsed.toString)
    // a compressed codec (avc1): sample table still parses, but frame
    // decode must NOT pretend — falls to the deterministic-slice stub
    val avc = mov(jpegs, "avc1")
    assert(graft.ops.Multimodal.bmffVideoSamples(avc).exists(_._1 == "avc1"))
    val stubFrames = graft.ops.Multimodal.sampleFrames(
      Seq((2L, avc)).toDF("media_id", "content"), 2).collect()
    assert(stubFrames.length == 2)
  }

  test("audio energy hash: resamples collide, reversed envelopes differ") {
    def wav(samples: Array[Double], rate: Float): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        val v = math.max(-32768, math.min(32767, (s * 32767).toInt))
        raw(i * 2) = (v & 0xff).toByte
        raw(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def toneThenSilence(rate: Int): Array[Double] = {
      val n = rate / 2 // 0.5 s
      Array.tabulate(n)(i =>
        if (i < n / 2) 0.8 * math.sin(2 * math.Pi * 440 * i / rate) else 0.0)
    }
    val df = Seq(
      (1L, wav(toneThenSilence(8000), 8000f)),
      (2L, wav(toneThenSilence(16000), 16000f)), // same material, resampled
      (3L, wav(toneThenSilence(8000).reverse, 8000f)), // silence-then-tone
      (4L, Array[Byte](7, 7, 7))) // undecodable
      .toDF("media_id", "content")
    val sigs = graft.ops.Multimodal.audioEnergyHash(df)
    val m = sigs.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m(4L).isEmpty)
    val d12 = java.lang.Long.bitCount(m(1L).get ^ m(2L).get)
    val d13 = java.lang.Long.bitCount(m(1L).get ^ m(3L).get)
    assert(d12 <= 3, s"resample distance $d12")
    assert(d13 > 30, s"reversed distance $d13")
  }

  test("REAL resize: Graphics2D re-encode stamps dims; undecodable passes through") {
    val orig = halfImage(32, 20, "png")
    val df = Seq((1L, orig), (2L, Array[Byte](7, 7, 7)))
      .toDF("media_id", "content")
      .selectExpr("media_id", "content",
        "named_struct('mime', 'image/png', 'width', CAST(NULL AS INT), " +
          "'height', CAST(NULL AS INT), 'duration_ms', CAST(NULL AS BIGINT)) AS meta")
    val out = Multimodal.resize(df, 8, 8).orderBy("media_id").collect()
    val meta = out(0).getStruct(2)
    assert(meta.getAs[String]("mime") == "image/png")
    assert(meta.getAs[Int]("width") == 8 && meta.getAs[Int]("height") == 8)
    // output bytes are a REAL decodable 8x8 PNG preserving the pattern
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]](1)))
    assert(resized.getWidth == 8 && resized.getHeight == 8)
    assert((resized.getRGB(0, 0) & 0xFF) < 32) // left: dark
    assert((resized.getRGB(7, 0) & 0xFF) > 224) // right: bright
    // undecodable: bytes and meta untouched
    assert(out(1).getAs[Array[Byte]](1).toSeq == Seq[Byte](7, 7, 7))
    assert(out(1).getStruct(2).isNullAt(1))
  }

  test("REAL image decode: javax.imageio dims land in meta (PNG + JPEG fixtures)") {
    // render real images in-memory — no external codec needed
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = imageBytes(32, 20, "png")
    val jpg = imageBytes(11, 7, "jpg")
    val df = Seq((1L, png), (2L, jpg), (3L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "content")
      .selectExpr("media_id", "content",
        "named_struct('mime', CAST(NULL AS STRING), 'width', CAST(NULL AS INT), " +
          "'height', CAST(NULL AS INT), 'duration_ms', CAST(NULL AS BIGINT)) AS meta")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        Multimodal.sniffMime($"content").as("mime"),
        $"meta.width", $"meta.height", $"meta.duration_ms"))
    val out = Multimodal.decodeImageMeta(df).orderBy("media_id").collect()
    val m1 = out(0).getStruct(2)
    assert(m1.getAs[String]("mime") == "image/png")
    assert(m1.getAs[Int]("width") == 32 && m1.getAs[Int]("height") == 20)
    val m2 = out(1).getStruct(2)
    assert(m2.getAs[String]("mime") == "image/jpeg")
    assert(m2.getAs[Int]("width") == 11 && m2.getAs[Int]("height") == 7)
    // undecodable payload keeps its meta untouched (width stays null)
    assert(out(2).getStruct(2).isNullAt(1))
  }

  test("REAL audio decode: WAV duration lands in meta (javax.sound.sampled)") {
    // render a real 0.5s 8kHz mono WAV in-memory
    val format = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val samples = new Array[Byte](8000) // 4000 frames = 500 ms
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), format, 4000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val df = Seq((1L, wav), (2L, Array[Byte](9, 9, 9)))
      .toDF("media_id", "content")
      .selectExpr("media_id", "content",
        "named_struct('mime', CAST(NULL AS STRING), 'width', CAST(NULL AS INT), " +
          "'height', CAST(NULL AS INT), 'duration_ms', CAST(NULL AS BIGINT)) AS meta")
    val out = Multimodal.decodeAudioMeta(df).orderBy("media_id").collect()
    assert(out(0).getStruct(2).getAs[Long]("duration_ms") == 500L)
    assert(out(1).getStruct(2).isNullAt(3)) // undecodable keeps nulls
    // the RIFF sniffer recognizes the container
    assert(Multimodal.audioDurationMs(wav).isDefined)
  }

  test("frame sampling emits n rows per video (1→N); codec formats take the stub path") {
    val df = Seq((7L, Array.tabulate[Byte](1000)(_.toByte), ("video/mp4", 0, 0, 0L)))
      .toDF("media_id", "content", "meta")
      .selectExpr("media_id", "content",
        "named_struct('mime', meta._1, 'width', meta._2, 'height', meta._3, 'duration_ms', meta._4) AS meta")
    val frames = Multimodal.sampleFrames(df, 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    assert(frames.count() == 4)
    assert(frames.select("frame_idx").as[Int].collect().toSet == Set(0, 1, 2, 3))
  }

  /** Animated GIF with `colors.size` solid frames, pure ImageIO. */
  private def animatedGif(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val tpe = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val meta = writer.getDefaultImageMetadata(tpe, writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    baos.toByteArray
  }

  test("REAL video frames: animated GIF decodes to actual sampled pixels") {
    // 4 solid frames: red, green, blue, white
    val gif = animatedGif(8, 6, Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    val df = Seq((9L, gif, ("image/gif", 8, 6, 400L)))
      .toDF("media_id", "content", "meta")
      .selectExpr("media_id", "content",
        "named_struct('mime', meta._1, 'width', meta._2, 'height', meta._3, 'duration_ms', meta._4) AS meta")
    val frames = Multimodal.sampleFrames(df, 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    // every sampled frame is a real PNG whose center pixel matches the
    // frame color at that position in the stream
    val want = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    frames.zip(want).foreach { case (row, rgb) =>
      val png = row.getAs[Array[Byte]]("frame")
      assert(png.take(4).sameElements(
        Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47)), "not a PNG frame")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 8 && img.getHeight == 6)
      assert((img.getRGB(4, 3) & 0xffffff) == rgb,
        f"center pixel ${img.getRGB(4, 3) & 0xffffff}%06x != $rgb%06x")
    }
    // sampling fewer than available picks evenly spaced real frames
    val two = Multimodal.sampleFrames(df, 2).orderBy("frame_idx").collect()
    assert(two.length == 2)
    val first = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(two(0).getAs[Array[Byte]]("frame")))
    assert((first.getRGB(4, 3) & 0xffffff) == 0xff0000)
  }
}
