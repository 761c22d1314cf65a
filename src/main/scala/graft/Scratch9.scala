package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 scale probes (ad hoc, not part of the driver contract):
  *
  *   - x111 RRF fusion and x113 tokenize-to-ids at 100× (500k docs) — the
  *     round-8 verdict asked for one more decade on both linear claims
  *     (they were probed at 10× only in §6.1h);
  *   - x113 at 10× (never probed — declared late in round 8);
  *   - x114 stream==batch replay at 10× (new this round: per-batch cost is
  *     x13-shaped, so the 3-batch replay should track ~the x13 probe);
  *   - the GreedyPack engine (x90's >10³-step path, new this round)
  *     unbounded on real events at 1×/10×, plus a synthetic 32 users ×
  *     100k events corpus — the depth regime where the recursive-CTE form
  *     would cost 10⁵ Spark jobs and the fold costs one shuffle.
  *
  * Volumes over clocks per SURVEY §6.0; results recorded in §6.1i.
  */
object Scratch9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/probe10x_r9"
    val hundredDir = "/tmp/probe100x_r9"

    def copies(n: Int, outDir: String): Unit =
      if (!new java.io.File(s"$outDir/documents.parquet").isDirectory)
        (0 until n).map { i =>
          core.Io.table(spark, sfDir, "documents")
            .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        }.reduce(_ union _).repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    copies(10, tenDir)
    copies(100, hundredDir)
    // embeddings for x111's vector retriever at both decades
    def vecCopies(n: Int, outDir: String): Unit =
      (0 until n).map { i =>
        core.Io.table(spark, sfDir, "embeddings")
          .withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
      }.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    vecCopies(10, tenDir)
    vecCopies(100, hundredDir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())

    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      time(s"x111_$dir")(queries.LlmQueries.x111RrfFusion(spark, dir).count())
      // x113 volumes ride the timed pass: n_tokens scales with the corpus,
      // OOV rate stays density-shaped (vocab is top-25 at any size)
      var x113v = (0L, 0L)
      time(s"x113_$dir") {
        val v = queries.LlmQueries.x113TokenizeIds(spark, dir)
          .agg(count(lit(1)), sum("n_tokens"), sum("n_oov")).head()
        x113v = (v.getLong(1), v.getLong(2)); v.getLong(0)
      }
      println(s"PROBE x113vol dir=$dir toks=${x113v._1} oov=${x113v._2}")
    }
    // x114 at 1× and 10×: per-batch cost is x13-shaped (shingle + bucket
    // joins); dup counts must equal x13's on the same corpus
    for (dir <- Seq(sfDir, tenDir)) {
      var dups = 0L
      time(s"x114_$dir") {
        val v = queries.LlmQueries.x114StreamBatchParity(spark, dir)
          .agg(count(lit(1)), sum("is_dup")).head()
        dups = v.getLong(1); v.getLong(0)
      }
      println(s"PROBE x114vol dir=$dir dups=$dups")
    }

    // x115: n-fold copies multiply every chunk's doc-frequency by n, so the
    // 10×/100× corpora are boilerplate-SATURATED (virtually every repeated
    // chunk crosses df≥3) — the stress case for the broadcast blocklist:
    // the flag set grows toward distinct-repeated-chunk count, wall time
    // must stay chunk-scan-shaped
    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      var x115v = (0L, 0L)
      time(s"x115_$dir") {
        val v = queries.LlmQueries.x115BoilerplateStrip(spark, dir)
          .agg(count(lit(1)), sum("n_chunks"), sum("n_boiler")).head()
        x115v = (v.getLong(1), v.getLong(2)); v.getLong(0)
      }
      println(s"PROBE x115vol dir=$dir chunks=${x115v._1} boiler=${x115v._2}")
      // x117: output is |sources|-bounded at any corpus; one agg pass
      time(s"x117_$dir")(queries.LlmQueries.x117MixTemperature(spark, dir).count())
    }

    // GreedyPack unbounded on real events: every user packed to full
    // sequence depth (~99 events/user at sf0.1) — the horizon the CTE form
    // cannot lift (depth-bounded job count)
    def packAll(dir: String): Long =
      operators.GreedyPack.pack(
        core.Io.eventsRaw(spark, dir)
          .filter(col("value").isNotNull && col("value") >= 0)
          .select("user_id", "event_id", "value"),
        budget = 100.0).count()
    time(s"gpack_$sfDir")(packAll(sfDir))
    (0 until 10).map { i =>
      core.Io.eventsRaw(spark, sfDir)
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.reduce(_ union _).repartition(32)
      .write.mode("overwrite").parquet(s"$tenDir/events.parquet")
    time(s"gpack_$tenDir")(packAll(tenDir))
    // synthetic deep corpus: 32 users × 100k events — 10⁵ steps per key,
    // 3.2M rows. The CTE engine would need 10⁵ UnionLoop jobs (~0.2s each,
    // ~6h); the fold is one shuffle + one sorted walk.
    val deep = spark.range(3200000).select(
      (col("id") % 32).as("user_id"),
      col("id").as("event_id"),
      (pmod(hash(col("id")), lit(1000)) / lit(25.0)).as("value"))
    var deepPacks = 0L
    time("gpack_deep_32x100k") {
      deepPacks = operators.GreedyPack.pack(deep, budget = 100.0).count()
      deepPacks
    }
    println(s"PROBE gpackvol deep packs=$deepPacks")
    spark.stop()
  }
}

/** Round-9 continuation probes (second pass, after x118/x119/x120 landed):
  *
  *   - x118 CDC chunking at 10×/100× — the boundary rule is positional
  *     (pure function of 3 local tokens), so chunk volume must scale
  *     exactly linearly and wall time scan-shaped;
  *   - x119 prep_v4 at 10×/100× — the composed pipeline rides x115's
  *     saturation behavior (§6.1i): on n-fold copies every chunk crosses
  *     df≥3, virtually all docs strip to empty and fail the 30-token gate,
  *     so survivor volume COLLAPSES — the probe pins that the pipeline
  *     stays corpus-scan-shaped in wall time while output shrinks;
  *   - x120 session replay at 1×/10× events (10× users, same per-user
  *     stream) — cogroup cost is event-linear, state active-user-sized.
  *
  * Same corpora as [[Scratch9]] (shared dirs, same id-shift grammar).
  */
object Scratch9b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/probe10x_r9"
    val hundredDir = "/tmp/probe100x_r9"
    def docCopies(n: Int, outDir: String): Unit =
      if (!new java.io.File(s"$outDir/documents.parquet").isDirectory)
        (0 until n).map { i =>
          core.Io.table(spark, sfDir, "documents")
            .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        }.reduce(_ union _).repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    docCopies(10, tenDir)
    docCopies(100, hundredDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())

    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      var chunks = 0L
      time(s"x118_$dir") {
        val v = queries.LlmQueries.x118CdcChunks(spark, dir)
          .agg(count(lit(1)), countDistinct("chunk_md5")).head()
        chunks = v.getLong(1); v.getLong(0)
      }
      println(s"PROBE x118vol dir=$dir distinct_chunks=$chunks")
      var surv = (0L, 0L)
      time(s"x119_$dir") {
        // coalesce: on saturated copies every doc strips empty, the output
        // is zero rows and the sums come back NULL
        val v = queries.LlmQueries.x119PrepV4(spark, dir)
          .agg(count(lit(1)), coalesce(sum("n_docs"), lit(0L)),
            coalesce(sum("n_toks"), lit(0L))).head()
        surv = (v.getLong(1), v.getLong(2)); v.getLong(0)
      }
      println(s"PROBE x119vol dir=$dir surv_docs=${surv._1} surv_toks=${surv._2}")
    }

    // x120 on real events at 1×, then 10× (10× users via id shift — the
    // Scratch9 gpack grammar; per-user stream unchanged so sessions
    // scale exactly 10×)
    if (!new java.io.File(s"$tenDir/events.parquet").isDirectory)
      (0 until 10).map { i =>
        core.Io.eventsRaw(spark, sfDir)
          .withColumn("event_id", col("event_id") + lit(i * 10000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
      }.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(s"$tenDir/events.parquet")
    for (dir <- Seq(sfDir, tenDir)) {
      var sess = 0L
      time(s"x120_$dir") {
        val v = queries.LlmQueries.x120SessionReplay(spark, dir)
          .agg(count(lit(1)), sum("n_events")).head()
        sess = v.getLong(0); v.getLong(1)
      }
      println(s"PROBE x120vol dir=$dir sessions=$sess")
    }
    spark.stop()
  }
}

/** Round-9 third-pass probes, over the shared 10×/100× copy corpora:
  *
  *   - x122 top-k-per-key at 1×/10× events (10× users): the partial fold
  *     bounds the shuffle at ≤ partitions·keys·k regardless of row count;
  *   - x123 bloom contamination at 10×/100× docs: bench gram set constant
  *     (copies add no content), corpus gram stream linear, wall
  *     scan-shaped — the zero-corpus-shuffle claim's decade check;
  *   - x124 DSIR at 10×/100×: bucket models see the same distribution, so
  *     scores are copy-invariant; wall tracks the one tokenize scan;
  *   - x126 KS at 10×: the (sources × distinct lengths) grid is constant,
  *     wall tracks the one scan;
  *   - x127 quantize audit at 1× (embeddings corpus has no copy variant —
  *     dim stats & errors are content-determined).
  */
object Scratch9c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/probe10x_r9"
    val hundredDir = "/tmp/probe100x_r9"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())

    // x122 needs events; 10x events built by Scratch9b (same dir contract).
    // exists, not isDirectory: the sf fixtures ship events as a single FILE
    for (dir <- Seq(sfDir, tenDir) if new java.io.File(s"$dir/events.parquet").exists)
      time(s"x122_$dir")(queries.ExtendedQueries.x122TopkPerKey(spark, dir).count())

    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      var hits = 0L
      time(s"x123_$dir") {
        val v = queries.LlmQueries.x123BloomContamination(spark, dir)
          .agg(count(lit(1)), coalesce(sum("n_hit"), lit(0L))).head()
        hits = v.getLong(1); v.getLong(0)
      }
      println(s"PROBE x123vol dir=$dir hit_occurrences=$hits")
      var toks = 0L
      time(s"x124_$dir") {
        val v = queries.LlmQueries.x124DsirWeights(spark, dir)
          .agg(count(lit(1)), coalesce(sum("n_bigrams"), lit(0L))).head()
        toks = v.getLong(1); v.getLong(0)
      }
      println(s"PROBE x124vol dir=$dir bigrams=$toks")
    }
    for (dir <- Seq(sfDir, tenDir))
      time(s"x126_$dir")(queries.LlmQueries.x126KsDrift(spark, dir).count())
    time(s"x127_$sfDir")(queries.LlmQueries.x127QuantizeAudit(spark, sfDir).count())
    spark.stop()
  }
}
