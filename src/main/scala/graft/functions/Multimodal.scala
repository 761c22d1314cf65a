package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque BINARY columns plus a typed metadata struct; decode and feature
  * extraction run batched per partition.
  *
  * IMAGES, AUDIO and VIDEO decode for real, all pure-JDK: `decodeImage`
  * runs the payload through `javax.imageio` (PNG/JPEG/GIF/BMP) and
  * derives the fixed-width feature vector from actual pixels;
  * `decodeAudio` runs it through `javax.sound.sampled` (WAV/AIFF/AU PCM)
  * and derives signal features from actual samples; `decodeVideo` walks
  * an AVI (RIFF) container with `aviVideoFrames` — pure offset
  * arithmetic, no codec library — and decodes each MJPEG frame chunk
  * through the same `javax.imageio` path, averaging per-frame features.
  * MJPEG-in-AVI is the one video format whose frames a stock JDK can
  * decode; payloads no JDK stack recognizes (H.264/VP9 containers,
  * arbitrary bytes) fall back to `decodeStub`, the deterministic fake
  * standing in for external codec libraries — so the Spark-side contract
  * (schema, per-partition batch shape, null failure path) is exercised
  * end-to-end for every media kind. `resize` is likewise real for images
  * (decode → integer nearest-neighbor rescale → lossless PNG re-encode);
  * non-image payloads pass through unchanged with null dims.
  */
object Multimodal {

  val FeatureDim = 8

  /** Schema contract for a media table: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** REAL image decode via pure-JDK javax.imageio: returns FeatureDim
    * pixel-derived floats, or None when no registered reader recognizes the
    * payload (then the caller falls back to the stub). Features, all in
    * [0,1] and integer-arithmetic-deterministic across JVMs:
    *   f0..f2  mean R, G, B channel intensity
    *   f3..f6  mean luma (BT.601 299/587/114 integer weights) per quadrant
    *           (top-left, top-right, bottom-left, bottom-right) — coarse
    *           spatial structure, so a flipped image embeds differently
    *   f7      aspect w/(w+h)
    * getRGB converts any source color model to sRGB, so indexed/gray PNGs
    * and JPEGs land in the same feature space.
    */
  private[functions] def decodeImage(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val rgbSum = new Array[Long](3)
    val qLuma = new Array[Long](4); val qN = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        rgbSum(0) += r; rgbSum(1) += g; rgbSum(2) += b
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        qLuma(q) += 299L * r + 587L * g + 114L * b; qN(q) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val out = new Array[Float](FeatureDim)
    out(0) = rgbSum(0).toFloat / (n * 255f)
    out(1) = rgbSum(1).toFloat / (n * 255f)
    out(2) = rgbSum(2).toFloat / (n * 255f)
    var q = 0
    while (q < 4) {
      out(3 + q) = if (qN(q) == 0) 0f else qLuma(q).toFloat / (qN(q) * 255000f)
      q += 1
    }
    out(7) = w.toFloat / (w + h)
    Some(out)
  }

  /** REAL audio decode via pure-JDK javax.sound.sampled: WAV/AIFF/AU
    * containers with 8- or 16-bit PCM payloads decode to samples and
    * yield signal-derived features; anything the sound stack doesn't
    * recognize returns None. Features, deterministic (integer sample
    * sums, fixed-order double accumulation):
    *   f0 duration sec / 100          f1 sample rate / 100 000
    *   f2 channels / 8                f3 mean |sample| (normalized)
    *   f4 RMS                         f5 zero-crossing rate
    *   f6 peak |sample|               f7 first-half energy fraction
    */
  private[functions] def decodeAudio(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val f = ais.getFormat
      val bits = f.getSampleSizeInBits
      val signed = f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      if (bits != 8 && bits != 16) return None
      val raw = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val n = raw.length / bytesPerSample
      if (n == 0) return None
      val full = if (bits == 8) 127.0 else 32767.0
      def sample(i: Int): Double =
        if (bits == 8) {
          val v = if (signed) raw(i).toDouble else ((raw(i) & 0xff) - 128).toDouble
          v
        } else {
          val lo = raw(2 * i) & 0xff; val hi = raw(2 * i + 1)
          val v = if (f.isBigEndian) ((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff))
                  else ((hi << 8) | lo)
          v.toDouble
        }
      var sumAbs = 0.0; var sumSq = 0.0; var firstHalfSq = 0.0
      var peak = 0.0; var crossings = 0L; var prevSign = 0
      var i = 0
      while (i < n) {
        val v = sample(i)
        val a = math.abs(v)
        sumAbs += a; sumSq += v * v
        if (i < n / 2) firstHalfSq += v * v
        if (a > peak) peak = a
        val sign = if (v > 0) 1 else if (v < 0) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        i += 1
      }
      val frames = n / f.getChannels
      val out = new Array[Float](FeatureDim)
      out(0) = (frames / f.getSampleRate / 100.0).toFloat
      out(1) = f.getSampleRate / 100000.0f
      out(2) = f.getChannels / 8.0f
      out(3) = (sumAbs / (n * full)).toFloat
      out(4) = (math.sqrt(sumSq / n) / full).toFloat
      out(5) = crossings.toFloat / n
      out(6) = (peak / full).toFloat
      out(7) = if (sumSq == 0.0) 0f else (firstHalfSq / sumSq).toFloat
      Some(out)
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Minimal RIFF/AVI walker: returns the video-stream frame chunks
    * (`##dc`/`##db` ids — for MJPEG each is one complete JPEG image) in
    * file order, capped at `maxFrames`. Pure offset arithmetic over the
    * byte array, no codec: the RIFF grammar is fourcc + LE32 size +
    * payload, word-aligned, with `LIST` chunks nesting (the `movi` LIST
    * holds the frames). Returns Nil unless the payload starts
    * `RIFF…AVI ` — the caller's signal to try the next decoder.
    */
  private[functions] def aviVideoFrames(bytes: Array[Byte],
      maxFrames: Int = 64): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return Nil
    def le32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end && out.size < maxFrames) {
        val id = fourcc(off)
        val sz = le32(off + 4) // 0..0xFFFFFFFF by construction (Long)
        if (off + 8 + sz > end) return // truncated/corrupt: stop
        if (id == "LIST") walk(off + 12, off + 8 + sz.toInt)
        else if (id.endsWith("dc") || id.endsWith("db"))
          out += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz.toInt)
        off += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, math.min(bytes.length.toLong, le32(4) + 8).toInt)
    out.toSeq
  }

  /** REAL video decode for MJPEG-in-AVI: frame chunks come from the pure-
    * offset `aviVideoFrames` walk and each decodes through the SAME
    * javax.imageio path as still images; the video feature vector is the
    * per-dimension mean over decoded frames (file order, fixed-order
    * accumulation — deterministic). None when the payload isn't AVI or no
    * frame decodes, so non-MJPEG video falls through to the stub.
    */
  private[functions] def decodeVideo(bytes: Array[Byte]): Option[Array[Float]] = {
    val feats = aviVideoFrames(bytes).flatMap(decodeImage)
    if (feats.isEmpty) None
    else {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < FeatureDim) {
        var s = 0.0
        feats.foreach(f => s += f(i))
        out(i) = (s / feats.size).toFloat
        i += 1
      }
      Some(out)
    }
  }

  /** Real-then-stub decode: images through javax.imageio, audio through
    * javax.sound.sampled, MJPEG-AVI video through the RIFF walk + per-
    * frame imageio; anything else (H.264-class codecs, arbitrary bytes)
    * hits the deterministic stub standing in for external codec libraries.
    */
  private[functions] def decode(bytes: Array[Byte]): Option[Array[Float]] =
    decodeImage(bytes).orElse(decodeAudio(bytes))
      .orElse(decodeVideo(bytes)).orElse(decodeStub(bytes))

  /** STUB decoder for media no JDK stack decodes (H.264/VP9 video,
    * unknown formats): a real implementation would use a codec library;
    * this deterministic fake
    * derives FeatureDim floats from an FNV hash of the payload so tests can
    * assert exact values. Null/empty payloads yield null features (the real
    * decoder's failure path).
    */
  private[functions] def decodeStub(bytes: Array[Byte]): Option[Array[Float]] =
    if (bytes == null || bytes.isEmpty) None
    else {
      var h = 2166136261L
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 16777619L; i += 1 }
      i = 0
      while (i < FeatureDim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 33).toInt % 1000) / 1000.0f
        i += 1
      }
      Some(out)
    }

  /** Sample count of a decodable PCM payload via the REAL javax.sound
    * container parse — the duration primitive AV alignment needs (samples /
    * rate = duration). None for null/undecodable payloads; channel-aware so
    * a stereo container reports frames, not interleaved samples.
    */
  def audioSampleCount(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val f = ais.getFormat
      val bytesPerSample = f.getSampleSizeInBits / 8
      if (bytesPerSample <= 0 || f.getChannels <= 0) None
      else Some(ais.readAllBytes().length.toLong / bytesPerSample / f.getChannels)
    } finally ais.close()
  }

  /** Feature extraction over a media table: mapPartitions so any per-decoder
    * setup cost (codec context, model handle) is paid once per PARTITION,
    * not per row — the Scala analog of a batched Pandas UDF. Output schema:
    * (asset_id, mime, n_bytes, feature array<float>).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = true)))
    val rdd = media.select("asset_id", "media", "meta.mime").rdd.mapPartitions { rows =>
      // per-partition decoder setup: disable ImageIO's temp-FILE cache so
      // each decode stays in-memory (one syscall-free path per image); a
      // codec/model handle for the stubbed media kinds would be opened here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        Row(
          r.getAs[Long]("asset_id"),
          r.getAs[String]("mime"),
          if (bytes == null) 0L else bytes.length.toLong,
          decode(bytes).orNull)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image resize: payloads that decode through javax.imageio are
    * scaled to w×h with NEAREST-NEIGHBOR sampling (integer source-pixel
    * selection — deterministic across JVMs, where bilinear would hinge on
    * float filtering internals) and re-encoded as PNG (lossless, so the
    * resized pixels are exactly the selected ones; the JDK PNG writer is
    * deterministic for identical pixels). The meta struct records the real
    * new dims and the re-encoded mime. Payloads that do NOT decode as
    * images (audio, video, arbitrary bytes, null) pass through fully
    * UNCHANGED — payload, meta, and all other columns — an honest
    * "couldn't resize", never a fake one; any extra caller columns (path,
    * partition keys) survive on resized rows too. mapPartitions like
    * extractFeatures: per-partition ImageIO setup, the work stays
    * distributed.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, s"target dims must be >= 1, got ${w}x$h")
    val spark = media.sparkSession
    // rewrite media/meta IN PLACE and carry every other column through
    // untouched (a caller's path/partition columns must survive resize)
    val schema = media.schema
    val mediaIdx = schema.fieldIndex("media")
    val metaIdx = schema.fieldIndex("meta")
    val rdd = media.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val img =
          if (bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
          r // pass-through: payload AND original meta untouched
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // explicit per-pixel nearest-neighbor: src = floor(dst * srcDim /
          // dstDim) in pure integer arithmetic — no Graphics2D filtering
          // heuristics in the determinism path
          var y = 0
          while (y < h) {
            val sy = (y.toLong * img.getHeight / h).toInt
            var x = 0
            while (x < w) {
              out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / w).toInt, sy))
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Row.fromSeq(r.toSeq
            .updated(mediaIdx, baos.toByteArray)
            .updated(metaIdx, Row("image/png", w, h)))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL frame sampling for MJPEG-in-AVI payloads: every `every`-th
    * frame chunk from the RIFF walk, one output row per (asset, frame_no)
    * with the frame as a standalone JPEG payload — which decodes through
    * `extractFeatures`' image path unchanged, so per-frame features are
    * one composition away. Non-AVI assets yield no rows (mirror of the
    * decoder's None). mapPartitions like extractFeatures: frame slicing
    * is per-row work, the output shape stays distributed.
    */
  def sampleVideoFrames(media: DataFrame, every: Int = 1): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = media.select("asset_id", "media").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getAs[Long]("asset_id")
        aviVideoFrames(r.getAs[Array[Byte]]("media")).zipWithIndex
          .collect { case (f, i) if i % every == 0 => Row(id, i, f) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB frame sampling for payloads with no parseable container (the
    * AVI path above is the real one): slices the payload into `frames`
    * equal chunks. The output SHAPE is the real contract — one row per
    * (asset, frame_no) via posexplode, ready for per-frame feature
    * extraction downstream.
    */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    require(frames >= 1, s"frames must be >= 1, got $frames")
    media
      .withColumn("chunk",
        expr(s"""transform(sequence(0, $frames - 1),
                |  i -> substring(media, i * greatest(length(media) div $frames, 1) + 1,
                |                 greatest(length(media) div $frames, 1)))""".stripMargin))
      .select(col("asset_id"), posexplode(col("chunk")).as(Seq("frame_no", "frame")))
      .filter(length(col("frame")) > 0)
  }

  /** Media ingest from a directory of raw files via Spark's `binaryFile`
    * source: path/length/modificationTime/content columns, mapped onto the
    * media schema (asset_id = xxhash64 of the path — deterministic,
    * arbitrary 64-bit values incl. negatives, NOT a dense 1..N id; mime
    * guessed from the extension). The source parallelizes by file and pushes
    * a `pathGlobFilter`, so a 100 TB asset lake scans like any other table.
    */
  def readMediaDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // deterministic per-path id WITHOUT a global window: a partition-less
        // row_number would funnel every binary payload through one task.
        // xxhash64(path) keeps the scan fully distributed; collisions are
        // 2^-64-scale and acceptable for an ingest id.
        xxhash64(col("path")).as("asset_id"),
        col("content").as("media"),
        struct(
          when(col("path").endsWith(".png"), "image/png")
            .when(col("path").endsWith(".jpg"), "image/jpeg")
            .otherwise("application/octet-stream").as("mime"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height")).as("meta"),
        col("path"))
  }

  /** Cosine ANN over extracted features reuses the embedding path: features
    * are just another array<float> column, so downstream dedup/similarity
    * (x11/x21) applies unchanged. This helper only bridges the schema.
    */
  def asEmbeddings(features: DataFrame): DataFrame =
    features.select(
      col("asset_id").as("vec_id"),
      col("feature").as("embedding"),
      lit(0).as("label"))
}
