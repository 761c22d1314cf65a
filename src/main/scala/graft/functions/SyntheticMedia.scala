package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic synthetic media payloads, built ON THE EXECUTORS from the
  * asset id alone — the generator behind the x106 multimodal golden query.
  *
  * The container ships no external codec/image libraries, but PNG, WAV and
  * RIFF/AVI are pure-JDK-writable, so instead of stubbing the INPUT side we
  * synthesize byte-valid payloads and drive the real decode paths in
  * [[Multimodal]] end-to-end. Everything is integer arithmetic seeded by the
  * asset id: two runs (or two JVMs with the same JDK image/PNG writer — the
  * per-round driver and this repo share one container) produce identical
  * bytes, which is what makes the query GOLDEN rather than merely non-empty.
  */
object SyntheticMedia {
  import java.io.ByteArrayOutputStream

  private def le16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** w×h RGB PNG with per-pixel channels derived from (x, y, seed) by
    * integer arithmetic; encoded by the JDK PNG writer (lossless +
    * deterministic for identical pixels).
    */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + seed * 13 + 3) % 256).toInt
        val g = ((y * 11 + seed * 5 + 7) % 256).toInt
        val b = ((x + y + seed * 3) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Mono 16-bit PCM WAV at 8 kHz, nSamples samples in ±1000 derived from
    * (i, seed) — a byte-complete RIFF/WAVE container the javax.sound stack
    * decodes for real.
    */
  def wavBytes(nSamples: Int, seed: Long): Array[Byte] = {
    val data = new ByteArrayOutputStream()
    var i = 0
    while (i < nSamples) {
      data.write(le16((((i * 13 + seed * 7) % 2001 - 1000).toInt) & 0xffff))
      i += 1
    }
    val d = data.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + d.length))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1))        // PCM, mono
    out.write(le32(8000)); out.write(le32(16000)) // sample rate, byte rate
    out.write(le16(2)); out.write(le16(16))       // block align, bits
    out.write("data".getBytes("US-ASCII")); out.write(le32(d.length))
    out.write(d)
    out.toByteArray
  }

  /** RIFF/AVI container with one `movi` LIST of `00dc` frame chunks —
    * exactly the grammar [[Multimodal.aviVideoFrames]] walks. Frames are
    * PNG payloads rather than JPEG: the walker never inspects the codec and
    * javax.imageio sniffs content, so PNG frames decode identically while
    * keeping the encode side deterministic (the JDK JPEG encoder is not).
    */
  def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      movi.write("00dc".getBytes("US-ASCII")); movi.write(le32(f.length))
      movi.write(f)
      if (f.length % 2 == 1) movi.write(0) // RIFF word alignment
    }
    val m = movi.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(4 + 8 + m.length))
    out.write("AVI ".getBytes("US-ASCII"))
    out.write("LIST".getBytes("US-ASCII")); out.write(le32(m.length))
    out.write(m)
    out.toByteArray
  }

  /** n assets cycling through the five payload classes by id%5:
    * 0 PNG image (dims vary with id), 1 WAV audio, 2 AVI video (3 PNG
    * frames), 3 opaque bytes (exercises the stub decoder), 4 null payload
    * (the failure path). Schema = [[Multimodal.mediaSchema]] + `kind`.
    * Byte-building happens in the range RDD's map — on executors, no
    * driver-side materialization, so the generator doubles as the
    * distributed-plumbing proof.
    */
  /** n audio/video PAIRS for alignment queries: pair_id → an AVI of
    * 2 + pair_id % 4 real PNG frames and a WAV of 800 + (pair_id·37 % 400)
    * samples at 8 kHz. The geometry formulas are the x204 oracle's
    * contract: the query must recover these counts from the BYTES via the
    * real container parses, so a decode regression breaks the hash.
    */
  def avPairs(spark: SparkSession, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("pair_id", LongType, nullable = false),
      StructField("video", BinaryType, nullable = true),
      StructField("audio", BinaryType, nullable = true)))
    val rdd = spark.range(0, n, 1, 4).rdd.map { id =>
      val k = 2 + (id % 4).toInt
      val s = 800 + (id * 37 % 400).toInt
      Row(id,
        aviBytes((0 until k).map(f => pngBytes(8, 6, id * 1000 + f))),
        wavBytes(s, id))
    }
    spark.createDataFrame(rdd, schema)
  }

  def assets(spark: SparkSession, n: Int): DataFrame = {
    val schema = StructType(Multimodal.mediaSchema.fields :+
      StructField("kind", StringType, nullable = false))
    val kinds = Seq("image", "audio", "video", "opaque", "missing")
    val mimes = Seq("image/png", "audio/wav", "video/avi",
      "application/octet-stream", null)
    val rdd = spark.range(0, n, 1, 4).rdd.map { id =>
      val m = (id % 5).toInt
      val media: Array[Byte] = m match {
        case 0 => pngBytes(8 + (id / 5 % 5).toInt, 6 + (id / 5 % 3).toInt, id)
        case 1 => wavBytes(400 + (id * 7 % 100).toInt, id)
        case 2 => aviBytes((0 until 3).map(f => pngBytes(8, 6, id * 100 + f)))
        case 3 => (s"opaque-payload-$id-" * 4).getBytes("UTF-8")
        case _ => null
      }
      Row(id, media, Row(mimes(m), null, null), kinds(m))
    }
    spark.createDataFrame(rdd, schema)
  }
}
