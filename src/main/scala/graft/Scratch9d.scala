package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 fourth-pass scale probes for the batch-C operators (ad hoc, not
  * part of the driver contract):
  *
  *   - x132 perplexity gate, x133 weighted reservoir, x134 unicode norm at
  *     1×/10×/100× — all three claim corpus-linear cost (one scan + small
  *     aggs / constant-size top-k / pure map);
  *   - x131 dup spans timed at 1×/10×; at 100× the copy-amplified fixture
  *     makes every 100-copy family all-pairs-duplicated, so the TRUE
  *     output itself is Θ(copies²)·families — the probe reports the
  *     predicted candidate volume Σ C(df,2) from the gram df distribution
  *     (a cheap aggregate) instead of materializing 25M true pairs on this
  *     VM: the quadratic is intrinsic OUTPUT size under duplication, not a
  *     plan inefficiency (x129's probe faced the same regime).
  *
  * Volumes over clocks per SURVEY §6.0; results recorded in §6.1l.
  */
object Scratch9d {
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())

    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      time(s"x132_$dir")(queries.LlmQueries.x132PerplexityGate(spark, dir).count())
      time(s"x133_$dir")(queries.LlmQueries.x133ReservoirSample(spark, dir).count())
      // count() would prune the normalize projection away — aggregate over
      // the md5 so every row actually runs the two expressions
      time(s"x134_$dir")(queries.LlmQueries.x134UnicodeNorm(spark, dir)
        .agg(count(col("nfc_md5")), max(col("nfc_md5"))).head().getLong(0))
    }
    for (dir <- Seq(sfDir, tenDir)) {
      var spans = (0L, 0L)
      time(s"x131_$dir") {
        val v = queries.LlmQueries.x131DupSpans(spark, dir)
          .agg(count(lit(1)), max("span_tokens"), sum("n_matched_grams")).head()
        spans = (v.getLong(1), v.getLong(2)); v.getLong(0)
      }
      println(s"PROBE x131vol dir=$dir max_span=${spans._1} matched=${spans._2}")
    }
    // batch-D probes: x136 CMS gate (survivor volume + wall vs decades),
    // x137 SpaceSaving (O(m) exchange → wall should track the scan),
    // x139 text roundtrip (write+read, linear)
    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      time(s"x136_$dir")(queries.LlmQueries.x136CmsHeavyHitters(spark, dir).count())
      time(s"x137_$dir")(queries.LlmQueries.x137SpaceSavingTerms(spark, dir).count())
    }
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x139_$dir")(queries.ExtendedQueries.x139TextRoundtrip(spark, dir).count())
    }
    // batch-E probes: x141 on suppkey-shifted lineitem copies, x143/x144
    // on the shared events copies (Scratch9's construction), x145/x146 on
    // the document copies
    if (!new java.io.File(s"$tenDir/lineitem.parquet").isDirectory)
      (0 until 10).map { i =>
        core.Io.table(spark, sfDir, "lineitem")
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * 10000000L))
          .withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L))
      }.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(s"$tenDir/lineitem.parquet")
    if (!new java.io.File(s"$tenDir/events.parquet").isDirectory)
      (0 until 10).map { i =>
        core.Io.eventsRaw(spark, sfDir)
          .withColumn("event_id", col("event_id") + lit(i * 10000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
      }.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(s"$tenDir/events.parquet")
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x141_$dir")(queries.ExtendedQueries.x141IntervalMerge(spark, dir).count())
      time(s"x143_$dir")(queries.ExtendedQueries.x143Ewma(spark, dir).count())
      time(s"x144_$dir")(queries.ExtendedQueries.x144Regression(spark, dir).count())
      time(s"x145_$dir")(queries.LlmQueries.x145PackBlocks(spark, dir).count())
      time(s"x146_$dir")(queries.ExtendedQueries.x146Dsv2Read(spark, dir).count())
      time(s"x147_$dir")(queries.LlmQueries.x147Detokenize(spark, dir).count())
      time(s"x148_$dir")(queries.ExtendedQueries.x148Correlation(spark, dir).count())
    }
    // x150 on the 10× embedding copies (Scratch9's vecCopies corpus):
    // anchors constant, corpus scan linear
    for (dir <- Seq(sfDir, "/tmp/probe10x_r9")) {
      if (new java.io.File(s"$dir/embeddings.parquet").isDirectory ||
          new java.io.File(s"$dir/embeddings.parquet").isFile)
        time(s"x150_$dir")(queries.LlmQueries.x150HardNegatives(spark, dir).count())
    }
    // x151 (DSv2 write+read cycle) and x152 (generator expansion) at 10×
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x151_$dir")(queries.ExtendedQueries.x151Dsv2Write(spark, dir).count())
      time(s"x152_$dir")(queries.LlmQueries.x152CharTrigrams(spark, dir).count())
    }
    // 100×: candidate volume Σ C(df,2) from the gram df distribution — the
    // size the seed join's output WOULD be; quadratic in copy multiplicity
    // by construction (every 100-copy family is all-pairs duplicated)
    time(s"x131cand_$hundredDir") {
      val docs = core.Io.table(spark, hundredDir, "documents")
      val cand = docs.filter(col("text").isNotNull)
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(explode(sequence(lit(1), size(col("toks")) - 4)).as("i"), col("toks"))
        .select(expr("""concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3), element_at(toks, i + 4))""").as("g"))
        .groupBy("g").agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * (col("df") - 1) / 2).cast("long").as("cand"),
          count(lit(1)).as("distinct_grams")).head()
      println(s"PROBE x131cand distinct=${cand.getLong(1)}")
      cand.getLong(0)
    }
    spark.stop()
  }
}
