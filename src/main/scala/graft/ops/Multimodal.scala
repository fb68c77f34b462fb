package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column operators.
  *
  * Media are opaque `binary` columns with a typed metadata struct —
  * the 100 TB-scale layout: bytes stay columnar in parquet, metadata
  * is queryable/prunable without touching payloads.
  *
  * Image decode, metadata, FEATURES, RESIZE, and perceptual hashing
  * are REAL (JDK-native `javax.imageio` + `BufferedImage` pixel
  * access — see [[decodeImageMeta]], [[imageFeatures]], [[resize]],
  * [[imageAHash]]); audio metadata decode and energy fingerprints are
  * real via `javax.sound.sampled`. VIDEO frame sampling is REAL for
  * two containers the JDK can handle without external codecs —
  * animated GIF ([[gifFrames]]), MJPEG AVI ([[aviMjpegFrames]]), and
  * MJPEG QuickTime/MP4 ([[movMjpegFrames]], ISO-BMFF atom walk) — and
  * a clearly-marked STUB only for compressed codecs the JDK cannot
  * decode (h264/vp9 in mp4/webm: permanently out of scope — the JDK
  * ships no such codec and none can be vendored into this build).
  * Everything around the stub — schema, batch iteration, partition
  * sizing, output shapes — is the real distributed plumbing and is
  * tested; swapping in a codec changes only the fallback branch.
  */
object Multimodal {

  /** media metadata struct: mime + dims + duration. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", metaSchema)))

  /** Wrap raw binary files (spark.read.format("binaryFile")) into the
    * media schema; mime sniffed from magic bytes (real, not stubbed).
    */
  def fromBinaryFiles(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.format("binaryFile").load(path)
    df.select(
      xxhash64(col("path")).as("media_id"),
      col("content"),
      struct(
        sniffMime(col("content")).as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
  }

  /** Magic-byte mime sniffing as a Column expression (codegen'd). */
  def sniffMime(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hexPrefix = hex(substring(content, 1, 4))
    when(hexPrefix.startsWith("FFD8FF"), "image/jpeg")
      .when(hexPrefix === "89504E47", "image/png")
      .when(hexPrefix.startsWith("47494638"), "image/gif")
      .when(hexPrefix.startsWith("494433"), "audio/mpeg")
      .when(hexPrefix === "52494646", "audio/wav") // RIFF
      .otherwise("application/octet-stream")
  }

  /** Size-balanced repartition before expensive per-record decode: at
    * scale, media rows have wildly skewed byte sizes; hashing on
    * media_id balances row COUNT, so large files cluster by luck. We
    * salt by size bucket to spread heavy rows.
    */
  def balanceForDecode(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions,
      col("media_id"), (length(col("content")) / lit(1048576)).cast("int"))

  // ---------------------------------------------------------------
  // Decode/feature kernels. Batch shape: mapPartitions over rows,
  // iterator-to-iterator (no materialization of the whole partition),
  // mirroring mapInPandas batch semantics.
  // ---------------------------------------------------------------

  /** REAL image decode via JDK-native `javax.imageio` (jpeg/png/gif/
    * bmp — no external codec needed): stamps actual width/height into
    * `meta`. Header-only: the registered ImageReader reads dimensions
    * from the stream header without materializing pixel buffers, so
    * per-row cost is O(header), not O(pixels) — the right trade at
    * 100 TB where this runs once per stored asset. Non-image or
    * undecodable payloads keep their existing meta.
    */
  def decodeImageMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val idIdx = schema.fieldIndex("media_id")
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val meta = r.getAs[Row](metaIdx)
        decodeDims(bytes) match {
          case Some((w, h)) =>
            val mime = Option(meta).map(_.getAs[String]("mime")).orNull
            val dur = Option(meta).map(_.getAs[java.lang.Long]("duration_ms")).orNull
            Row(r.getLong(idIdx), bytes, Row(mime, w, h, dur))
          case None => Row(r.getLong(idIdx), bytes, meta)
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** REAL audio metadata decode via JDK-native `javax.sound.sampled`
    * (wav/aiff/au): duration from frame count / frame rate lands in
    * `meta.duration_ms`. Same header-only, mapPartitions shape as
    * [[decodeImageMeta]]; undecodable payloads keep their meta.
    */
  def decodeAudioMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val idIdx = schema.fieldIndex("media_id")
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val meta = r.getAs[Row](metaIdx)
        audioDurationMs(bytes) match {
          case Some(ms) =>
            val mime = Option(meta).map(_.getAs[String]("mime")).orNull
            val w = Option(meta).map(_.getAs[java.lang.Integer]("width")).orNull
            val h = Option(meta).map(_.getAs[java.lang.Integer]("height")).orNull
            Row(r.getLong(idIdx), bytes, Row(mime, w, h, ms))
          case None => Row(r.getLong(idIdx), bytes, meta)
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Audio energy fingerprint for near-dup detection, the audio twin
    * of [[imageAHash]]: decode to PCM (javax.sound converts any
    * JDK-supported encoding), pool RMS energy over 64 equal-TIME
    * cells, bit set iff the cell sits above the clip's mean energy.
    * Time-proportional pooling makes the signature sample-rate
    * invariant, so re-encodes/resamples of the same material land
    * within a few Hamming bits and feed
    * `Dedup.simhashCandidatesFromSigs` directly. Undecodable → null.
    */
  def audioEnergyHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("__id", LongType, nullable = false),
      StructField("__sig", LongType)))
    val idIdx = df.schema.fieldIndex("media_id")
    val contentIdx = df.schema.fieldIndex("content")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(idIdx),
          energyHash(r.getAs[Array[Byte]](contentIdx))
            .map(java.lang.Long.valueOf).orNull)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private[ops] def energyHash(bytes: Array[Byte], cells: Int = 64): Option[Long] =
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val src = in.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            src.getSampleRate, 16, src.getChannels, true, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
          val data = pcm.readAllBytes()
          val channels = target.getChannels
          val nFrames = data.length / (2 * channels)
          if (nFrames == 0) None
          else {
            val sums = new Array[Double](cells)
            val counts = new Array[Long](cells)
            var f = 0
            while (f < nFrames) {
              val cell = math.min(f.toLong * cells / nFrames, cells - 1L).toInt
              var c = 0
              var acc = 0.0
              while (c < channels) {
                val o = (f * channels + c) * 2
                val s = ((data(o + 1) << 8) | (data(o) & 0xff)).toShort / 32768.0
                acc += s * s
                c += 1
              }
              sums(cell) += acc / channels
              counts(cell) += 1
              f += 1
            }
            val rms = Array.tabulate(cells)(i =>
              if (counts(i) == 0) 0.0 else math.sqrt(sums(i) / counts(i)))
            val mean = rms.sum / cells
            var h = 0L
            var i = 0
            while (i < cells) {
              if (rms(i) > mean) h |= (1L << i)
              i += 1
            }
            Some(h)
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def audioDurationMs(bytes: Array[Byte]): Option[java.lang.Long] =
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val frames = in.getFrameLength
          val rate = in.getFormat.getFrameRate
          if (frames >= 0 && rate > 0)
            Some(java.lang.Long.valueOf((frames * 1000.0 / rate).toLong))
          else None
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Header-only (width, height) via the matching ImageReader. */
  private[ops] def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null || bytes.isEmpty) None
    else {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            Some((reader.getWidth(0), reader.getHeight(0)))
          } catch {
            case scala.util.control.NonFatal(_) => None
          } finally reader.dispose()
        }
      } finally iis.close()
    }

  private val featureGrid = 4 // 4x4 pooled luminance grid = 16 floats

  /** REAL image feature extraction (pure JDK): decode pixels with
    * `ImageIO.read`, average-pool luminance (0.299R+0.587G+0.114B,
    * normalized to [0,1]) over a `featureGrid`² cell grid — the classic
    * tiny-image descriptor; swap [[grayGridFeatures]] for a vision
    * encoder to change the embedding, not the plumbing. Undecodable or
    * non-image payloads yield null features (they'd otherwise pollute
    * nearest-neighbour queries with hash noise). Same iterator-to-
    * iterator mapPartitions shape as [[decodeImageMeta]]; callers
    * should [[balanceForDecode]] first — decode cost is O(pixels), and
    * file sizes are heavily skewed.
    */
  def imageFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("mime", StringType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex("media_id")
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        Row(r.getLong(idIdx),
          Option(r.getAs[Row](metaIdx)).map(_.getAs[String]("mime")).orNull,
          grayGridFeatures(bytes).map(_.toSeq).orNull)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Perceptual average-hash (aHash) for image dedup: decode → 8×8
    * pooled luminance ([[grayGridFeatures]] at grid 8) → 64-bit
    * signature, bit set iff the cell sits above the image's mean.
    * Re-encodes, resizes, and small edits land within a few Hamming
    * bits, so the signature feeds the SAME banded-Hamming candidate
    * machinery as text SimHash — `Dedup.simhashCandidatesFromSigs`
    * consumes the (`__id`, `__sig`) shape directly, making image
    * near-dedup a composition of existing scale paths (map-only hash,
    * one small-key shuffle, bucket-bounded pair expansion).
    * Undecodable payloads yield null signatures.
    */
  def imageAHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("__id", LongType, nullable = false),
      StructField("__sig", LongType)))
    val idIdx = df.schema.fieldIndex("media_id")
    val contentIdx = df.schema.fieldIndex("content")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val sig = grayGridFeatures(r.getAs[Array[Byte]](contentIdx), grid = 8)
          .map { cells =>
            val mean = cells.map(_.toDouble).sum / cells.length
            var h = 0L
            var i = 0
            while (i < cells.length) {
              if (cells(i) > mean) h |= (1L << i)
              i += 1
            }
            java.lang.Long.valueOf(h)
          }.orNull
        Row(r.getLong(idIdx), sig)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Average-pooled grayscale grid over the decoded image. */
  private[ops] def grayGridFeatures(
      bytes: Array[Byte], grid: Int = featureGrid): Option[Array[Float]] =
    decodeImage(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val sums = new Array[Double](grid * grid)
      val counts = new Array[Long](grid * grid)
      var y = 0
      while (y < h) {
        val gy = math.min(y * grid / h, grid - 1)
        var x = 0
        while (x < w) {
          val gx = math.min(x * grid / w, grid - 1)
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xFF) +
            0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          val cell = gy * grid + gx
          sums(cell) += lum / 255.0
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(grid * grid)(i =>
        if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
    }

  private[ops] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** REAL resize (pure JDK): decode, bilinear `Graphics2D` scale to
    * (w, h), re-encode PNG, stamp the new dims and mime. Undecodable
    * payloads pass through untouched — stamping requested dims on a
    * non-image would lie to downstream pruning. Binary-in/binary-out
    * over the same mediaSchema, mapPartitions iterator-to-iterator.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val meta = r.getAs[Row](metaIdx)
        decodeImage(bytes) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", baos)
            val dur = Option(meta).map(_.getAs[java.lang.Long]("duration_ms")).orNull
            Row(r.getLong(idIdx), baos.toByteArray, Row("image/png", w, h, dur))
          case None => Row(r.getLong(idIdx), bytes, meta)
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Video frame sampling: emits up to `n` frame rows per video
    * (media_id, frame_idx, frame bytes), evenly spaced across the
    * stream — the 1→N shape of real frame extraction.
    *
    * REAL for animated GIF (frames composited onto the logical screen
    * honoring per-frame offsets), MJPEG AVI (RIFF chunk walk →
    * per-frame JPEG decode, [[aviMjpegFrames]]), and MJPEG
    * QuickTime/MP4 (ISO-BMFF atom walk → sample table → per-sample
    * JPEG decode, [[movMjpegFrames]]) — all sampled evenly and
    * re-encoded as PNG. For compressed-codec payloads the JDK cannot
    * decode (h264/vp9 in mp4/webm — permanently out of scope here: no
    * codec ships in the JDK and none can be vendored) the per-frame
    * payload is a deterministic byte slice, clearly a STUB: swapping
    * in a codec changes only the fallback branch, never the
    * distributed shape.
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType)))

  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val contentIdx = df.schema.fieldIndex("content")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val isGif = bytes != null && bytes.length > 4 &&
          bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'
        val isAvi = bytes != null && bytes.length > 12 &&
          bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '
        val isBmff = bytes != null && bytes.length > 12 && {
          val t = new String(bytes, 4, 4,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          Set("ftyp", "moov", "mdat", "wide", "free", "skip", "pnot")(t)
        }
        val real =
          if (isGif) gifFrames(bytes, n)
          else if (isAvi) aviMjpegFrames(bytes, n)
          else if (isBmff) movMjpegFrames(bytes, n)
          else Nil
        if (real.nonEmpty)
          real.zipWithIndex.map { case (png, i) => Row(id, i, png) }
        else {
          // STUB: deterministic slices stand in for decoded frames
          val len = math.max(1, if (bytes == null) 1 else bytes.length)
          val step = math.max(1, len / n)
          (0 until n).map { i =>
            val from = math.min(i * step, len - 1)
            val slice =
              if (bytes == null) Array.empty[Byte]
              else java.util.Arrays.copyOfRange(bytes, from, math.min(from + 64, len))
            Row(id, i, slice)
          }
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Decode an animated GIF and return up to `n` evenly-spaced frames
    * as PNG bytes. Frames are drawn cumulatively onto the logical
    * screen at their ImageDescriptor offsets (disposal "none"
    * compositing — enough for sampling; full disposal handling belongs
    * to a real codec).
    */
  private[ops] def gifFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = try {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) return Nil
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val count = reader.getNumImages(true)
      if (count <= 0) return Nil
      val picks = (0 until math.min(n, count))
        .map(k => k.toLong * count / math.min(n, count)).map(_.toInt).distinct
      val first = reader.read(0)
      val canvas = new java.awt.image.BufferedImage(
        first.getWidth, first.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = canvas.createGraphics()
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var i = 0
        while (i < count && out.size < picks.size) {
          val frame = reader.read(i)
          val (x, y) = frameOffset(reader, i)
          g.drawImage(frame, x, y, null)
          if (picks.contains(i)) {
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(canvas, "png", baos)
            out += baos.toByteArray
          }
          i += 1
        }
        out.toSeq
      } finally g.dispose()
    } finally reader.dispose()
  } catch { case _: Exception => Nil }

  /** Decode an MJPEG AVI and return up to `n` evenly-spaced frames as
    * PNG bytes — the second REAL video container (after animated GIF)
    * the JDK can handle without external codecs: AVI is a RIFF chunk
    * tree, and MJPEG frames are plain JPEGs in `..db`/`..dc` chunks,
    * which `ImageIO` decodes natively. The walker is tolerant: it
    * descends RIFF/LIST nodes, collects video-frame chunks, and
    * ignores everything else (headers, index, audio).
    */
  private[ops] def aviMjpegFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = try {
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (off, len)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(p + 4)
        if (size < 0 || p + 8 + size > to) return // malformed — stop
        val body = p + 8
        if (id == "RIFF" || id == "LIST") walk(body + 4, body + size.toInt)
        else if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc")) &&
            size >= 2 && bytes(body) == 0xFF.toByte && bytes(body + 1) == 0xD8.toByte)
          frames += ((body, size.toInt)) // JPEG SOI — an MJPEG frame
        p = body + size.toInt + (size.toInt & 1) // chunks pad to even
      }
    }
    walk(0, bytes.length)
    if (frames.isEmpty) return Nil
    val count = frames.size
    val picks = (0 until math.min(n, count))
      .map(k => k.toLong * count / math.min(n, count)).map(_.toInt).distinct
    picks.flatMap { i =>
      val (off, len) = frames(i)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Arrays.copyOfRange(bytes, off, off + len)))
      if (img == null) None
      else {
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Some(baos.toByteArray)
      }
    }
  } catch { case _: Exception => Nil }

  /** QuickTime / ISO-BMFF container walk — mov and mp4 share the atom
    * grammar (ISO/IEC 14496-12, public spec): a file is a sequence of
    * [size:u32be][type:4cc] atoms, size==1 → 64-bit size follows,
    * size==0 → to end of enclosing box; moov/trak/mdia/minf/stbl are
    * pure containers. Returns the FIRST video track's
    * (codec fourcc, per-sample byte ranges), reconstructed from the
    * sample table: stsd (codec), stsz (sizes), stsc (samples per
    * chunk), stco/co64 (chunk offsets). Bounds-checked throughout;
    * malformed input → None.
    */
  private[graft] def bmffVideoSamples(
      bytes: Array[Byte]): Option[(String, IndexedSeq[(Long, Int)])] = try {
    def be32(o: Long): Long =
      ((bytes(o.toInt) & 0xffL) << 24) | ((bytes(o.toInt + 1) & 0xffL) << 16) |
        ((bytes(o.toInt + 2) & 0xffL) << 8) | (bytes(o.toInt + 3) & 0xffL)
    def fourcc(o: Long): String =
      new String(bytes, o.toInt, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    // direct children of [from, to): (type, payloadFrom, payloadEnd)
    def children(from: Long, to: Long): Seq[(String, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var o = from
      var ok = true
      while (ok && o + 8 <= to) {
        var size = be32(o)
        var hdr = 8L
        if (size == 1 && o + 16 <= to) {
          size = (be32(o + 8) << 32) | be32(o + 12); hdr = 16L
        } else if (size == 0) size = to - o
        if (size < hdr || o + size > to) ok = false
        else {
          out += ((fourcc(o + 4), o + hdr, o + size))
          o += size
        }
      }
      out.toSeq
    }
    def child(tpe: String, from: Long, to: Long): Option[(Long, Long)] =
      children(from, to).collectFirst { case (t, f, e) if t == tpe => (f, e) }
    val (moovF, moovE) = child("moov", 0L, bytes.length.toLong).getOrElse(return None)
    children(moovF, moovE).collect { case ("trak", tf, te) => (tf, te) }
      .iterator.flatMap { case (tf, te) =>
        for {
          (mdF, mdE) <- child("mdia", tf, te)
          (hdF, _) <- child("hdlr", mdF, mdE)
          // hdlr payload: ver/flags(4) pre_defined(4) handler_type(4)
          if fourcc(hdF + 8) == "vide"
          (mnF, mnE) <- child("minf", mdF, mdE)
          (sbF, sbE) <- child("stbl", mnF, mnE)
          (sdF, _) <- child("stsd", sbF, sbE)
          // stsd payload: ver/flags(4) count(4) [entrySize(4) fourcc(4) ...]
          codec = fourcc(sdF + 12)
          (szF, _) <- child("stsz", sbF, sbE)
          (scF, _) <- child("stsc", sbF, sbE)
          co <- child("stco", sbF, sbE).map((_, 4))
            .orElse(child("co64", sbF, sbE).map((_, 8)))
        } yield {
          val ((coF, _), coW) = co
          val fixedSize = be32(szF + 4)
          val nSamples = be32(szF + 8).toInt
          val sizes: Int => Int =
            if (fixedSize != 0) _ => fixedSize.toInt
            else i => be32(szF + 12 + 4L * i).toInt
          val nChunks = be32(coF + 4).toInt
          val chunkOff: Int => Long =
            if (coW == 4) i => be32(coF + 8 + 4L * i)
            else i => (be32(coF + 8 + 8L * i) << 32) | be32(coF + 12 + 8L * i)
          // stsc: (first_chunk, samples_per_chunk, desc) runs
          val nRuns = be32(scF + 4).toInt
          val runs = (0 until nRuns).map { i =>
            (be32(scF + 8 + 12L * i).toInt, be32(scF + 12 + 12L * i).toInt)
          }
          val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
          var sample = 0
          var chunk = 1
          while (chunk <= nChunks && sample < nSamples) {
            val spc = runs.takeWhile(_._1 <= chunk).lastOption.map(_._2).getOrElse(0)
            var off = chunkOff(chunk - 1)
            var k = 0
            while (k < spc && sample < nSamples) {
              val len = sizes(sample)
              ranges += ((off, len))
              off += len
              sample += 1
              k += 1
            }
            chunk += 1
          }
          (codec, ranges.toIndexedSeq)
        }
      }.nextOption()
  } catch { case _: Exception => None }

  /** Decode a QuickTime/MP4 container whose video track is
    * MOTION-JPEG coded ('jpeg'/'mjpa'/'MJPG' sample descriptions —
    * each sample is a plain JPEG the JDK decodes natively) and return
    * up to `n` evenly-spaced frames as PNG bytes: the THIRD real
    * container, via the same atom walk any mp4 tool uses. Non-JPEG
    * codecs (avc1/hev1/vp09…) have no JDK decoder — the walker still
    * parses their sample tables, but frame decode correctly yields
    * nothing here.
    */
  private[ops] def movMjpegFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
    bmffVideoSamples(bytes) match {
      case Some((codec, ranges))
          if Set("jpeg", "mjpa", "mjpb", "MJPG", "mjpg")(codec) && ranges.nonEmpty =>
        val count = ranges.length
        val take = math.min(n, count)
        val picks = (0 until take).map(k => k.toLong * count / take).map(_.toInt).distinct
        picks.flatMap { i =>
          val (off, len) = ranges(i)
          if (off >= 0 && len > 0 && off + len <= bytes.length) {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)))
            if (img == null) None
            else {
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", baos)
              Some(baos.toByteArray)
            }
          } else None
        }
      case _ => Nil
    }

  private def frameOffset(reader: javax.imageio.ImageReader, i: Int): (Int, Int) =
    try {
      val meta = reader.getImageMetadata(i)
      val tree = meta.getAsTree("javax_imageio_gif_image")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = tree.getElementsByTagName("ImageDescriptor")
      if (nodes.getLength == 0) (0, 0)
      else {
        val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        (d.getAttribute("imageLeftPosition").toInt,
          d.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Exception => (0, 0) }
}
