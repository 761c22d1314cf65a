package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 fifth-pass probes (ad hoc, not part of the driver contract):
  * x153–x157 plan audits plus 10×/100× scale runs on the copy corpora.
  * Volumes over clocks per SURVEY §6.0; results recorded in §6.1m.
  */
object Scratch9e {
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

    if (args.contains("r9j")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x192_$dir")(queries.LlmQueries.x192MultiMatch(spark, dir).count())
        time(s"x193_$dir")(queries.ExtendedQueries.x193Chi2(spark, dir).count())
      }
      // 100× for the automaton scan (documents-only corpus)
      time(s"x192_$hundredDir")(queries.LlmQueries.x192MultiMatch(spark, hundredDir).count())
      spark.stop(); return
    }
    if (args.contains("r9k")) {
      for (dir <- Seq(sfDir, sfDir, tenDir)) {
        time(s"x194_$dir")(queries.ExtendedQueries.x194TimerSessions(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9l")) {
      for (dir <- Seq(sfDir, sfDir, tenDir)) {
        time(s"x195_$dir")(queries.ExtendedQueries.x195StateProfile(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9p")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x205_$dir")(queries.ExtendedQueries.x205Spearman(spark, dir).count())
        time(s"x206_$dir")(queries.ExtendedQueries.x206KruskalWallis(spark, dir).count())
        time(s"x207_$dir")(queries.ExtendedQueries.x207Cusum(spark, dir).count())
        time(s"x208_$dir")(queries.ExtendedQueries.x208Acf(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9ab")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x240_$dir")(queries.LlmQueries.x240LangIdMetrics(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9aa")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x237_$dir")(queries.LlmQueries.x237NormHistogram(spark, dir).count())
        time(s"x238_$dir")(queries.LlmQueries.x238ComponentSizes(spark, dir).count())
        time(s"x239_$dir")(queries.LlmQueries.x239ZipfSlope(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9z")) {
      for (dir <- Seq(sfDir, sfDir)) {
        time(s"x235_$dir")(queries.MultimodalQueries.x235ImagePixels(spark, dir).count())
        time(s"x236_$dir")(queries.MultimodalQueries.x236AudioSamples(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9y")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x232_$dir")(queries.ExtendedQueries.x232ColumnDefaults(spark, dir).count())
        time(s"x233_$dir")(queries.ExtendedQueries.x233IdentifierClause(spark, dir).count())
        time(s"x234_$dir")(queries.ExtendedQueries.x234SqlScripting(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9x")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x230_$dir")(queries.ExtendedQueries.x230AnalyzeCbo(spark, dir).count())
        time(s"x231_$dir")(queries.ExtendedQueries.x231CachedReuse(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9w")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x228_$dir")(queries.ExtendedQueries.x228DynamicSessions(spark, dir).count())
        time(s"x229_$dir")(queries.ExtendedQueries.x229GroupByAll(spark, dir).count())
      }
      // one more decade for the documents-based statistical family
      // (the 100× corpus carries documents only)
      for (dir <- Seq(hundredDir)) {
        time(s"x213_$dir")(queries.LlmQueries.x213LogisticQuality(spark, dir).count())
        time(s"x215_$dir")(queries.LlmQueries.x215JsdSources(spark, dir).count())
        time(s"x216_$dir")(queries.LlmQueries.x216DupQualityCorr(spark, dir).count())
        time(s"x219_$dir")(queries.LlmQueries.x219BigramEntropyRate(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9v")) {
      for (dir <- Seq(sfDir, sfDir, tenDir)) {
        time(s"x220_$dir")(queries.ExtendedQueries.x220WindowRankFamily(spark, dir).count())
        time(s"x227_$dir")(queries.ExtendedQueries.x227RangeRank(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9u")) {
      for (dir <- Seq(sfDir, sfDir, tenDir)) {
        time(s"x225_$dir")(queries.ExtendedQueries.x225StateBootstrap(spark, dir).count())
        time(s"x226_$dir")(queries.LlmQueries.x226OuterJoinReplay(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9t")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x221_$dir")(queries.ExtendedQueries.x221PipeSql(spark, dir).count())
        time(s"x222_$dir")(queries.ExtendedQueries.x222Collation(spark, dir).count())
        time(s"x223_$dir")(queries.ExtendedQueries.x223SqlVariables(spark, dir).count())
        time(s"x224_$dir")(queries.ExtendedQueries.x224JoinHints(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9s")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x217_$dir")(queries.ExtendedQueries.x217KAnonymity(spark, dir).count())
        time(s"x218_$dir")(queries.ExtendedQueries.x218Gini(spark, dir).count())
        time(s"x219_$dir")(queries.LlmQueries.x219BigramEntropyRate(spark, dir).count())
        time(s"x220_$dir")(queries.ExtendedQueries.x220WindowRankFamily(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9r")) {
      // 10× embeddings (id-shifted copies, Scratch9d's construction)
      if (!new java.io.File(s"$tenDir/embeddings.parquet").isDirectory) {
        val e = core.Io.table(spark, sfDir, "embeddings")
        (0 until 10).map(k => e.withColumn("vec_id",
            col("vec_id") + lit(k.toLong * 10000000L)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$tenDir/embeddings.parquet")
      }
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x213_$dir")(queries.LlmQueries.x213LogisticQuality(spark, dir).count())
        time(s"x214_$dir")(queries.LlmQueries.x214EmbeddingProfile(spark, dir).count())
        time(s"x215_$dir")(queries.LlmQueries.x215JsdSources(spark, dir).count())
        time(s"x216_$dir")(queries.LlmQueries.x216DupQualityCorr(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9q")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x209_$dir")(queries.ExtendedQueries.x209LateralTopk(spark, dir).count())
        time(s"x210_$dir")(queries.ExtendedQueries.x210ParamSql(spark, dir).count())
        time(s"x211_$dir")(queries.ExtendedQueries.x211GraphBackbone(spark, dir).count())
        time(s"x212_$dir")(queries.LlmQueries.x212ConversationTemplates(spark, dir).count())
      }
      println("===== x209 decorrelated plan =====")
      println(queries.ExtendedQueries.x209LateralTopk(spark, sfDir)
        .queryExecution.executedPlan.toString.take(3000))
      spark.stop(); return
    }
    if (args.contains("r9o")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x201_$dir")(queries.ExtendedQueries.x201Benford(spark, dir).count())
        time(s"x202_$dir")(queries.ExtendedQueries.x202MannWhitney(spark, dir).count())
        time(s"x203_$dir")(queries.ExtendedQueries.x203CalendarHeatmap(spark, dir).count())
        time(s"x204_$dir")(queries.MultimodalQueries.x204AvAlign(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9n")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x198_$dir")(queries.ExtendedQueries.x198RangeWindow(spark, dir).count())
        time(s"x199_$dir")(queries.LlmQueries.x199PrepV5(spark, dir).count())
        time(s"x200_$dir")(queries.ExtendedQueries.x200StreamDedupNative(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9m")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x196_$dir")(queries.ExtendedQueries.x196Observe(spark, dir).count())
        time(s"x197_$dir")(queries.ExtendedQueries.x197TypedUdaf(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9i")) {
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x191_$dir")(queries.ExtendedQueries.x191BudgetGate(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9h")) {
      // eighth-pass probes: x187–x190 (documents + events)
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x187_$dir")(queries.LlmQueries.x187SqlUdf(spark, dir).count())
        time(s"x188_$dir")(queries.LlmQueries.x188SqlTvf(spark, dir).count())
        time(s"x189_$dir")(queries.ExtendedQueries.x189StateInspect(spark, dir).count())
        time(s"x190_$dir")(queries.ExtendedQueries.x190TakedownDelete(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9g")) {
      // seventh-pass probes: x183–x186 (10× copy corpus has documents,
      // lineitem, orders, events — all four inputs)
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x183_$dir")(queries.LlmQueries.x183RecursiveChunks(spark, dir).count())
        time(s"x184_$dir")(queries.ExtendedQueries.x184BloomJoin(spark, dir).count())
        time(s"x185_$dir")(queries.ExtendedQueries.x185Dsv2AggPushdown(spark, dir).count())
        time(s"x186_$dir")(queries.ExtendedQueries.x186JoinForecast(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("r9f")) {
      // sixth-pass probes: x178–x181 only (10× copy corpus has documents
      // and lineitem, which is all four need)
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x178_$dir")(queries.LlmQueries.x178FilterBank(spark, dir).count())
        time(s"x179_$dir")(queries.LlmQueries.x179LshScurve(spark, dir).count())
        time(s"x180_$dir")(queries.ExtendedQueries.x180RangeBalance(spark, dir).count())
        time(s"x181_$dir")(queries.LlmQueries.x181NgramNovelty(spark, dir).count())
        time(s"x182_$dir")(queries.ExtendedQueries.x182DynamicOverwrite(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.contains("plans")) {
      for ((n, q) <- Seq(
        "x153" -> queries.ExtendedQueries.x153DedupSql(spark, sfDir),
        "x155" -> queries.LlmQueries.x155Curriculum(spark, sfDir),
        "x156" -> queries.LlmQueries.x156EpochShuffle(spark, sfDir),
        "x157" -> queries.LlmQueries.x157RejectionSample(spark, sfDir))) {
        println(s"===== $n =====")
        println(q.queryExecution.executedPlan.toString.take(4000))
      }
    } else {
      // events.parquet exists at 10× only (Scratch9d's construction)
      for (dir <- Seq(sfDir, tenDir)) {
        time(s"x154_$dir")(queries.LlmQueries.x154WindowReplay(spark, dir).count())
        time(s"x160_$dir")(queries.LlmQueries.x160IntervalJoinReplay(spark, dir).count())
        time(s"x161_$dir")(queries.ExtendedQueries.x161ThrottleDedup(spark, dir).count())
        time(s"x162_$dir")(queries.ExtendedQueries.x162MvMaintain(spark, dir).count())
        time(s"x165_$dir")(queries.ExtendedQueries.x165HoppingWindow(spark, dir).count())
        time(s"x166_$dir")(queries.ExtendedQueries.x166SessionWindowNative(spark, dir).count())
        time(s"x163_$dir")(queries.LlmQueries.x163DedupStateRestart(spark, dir).count())
        time(s"x164_$dir")(queries.ExtendedQueries.x164CorruptQuarantine(spark, dir).count())
        time(s"x167_$dir")(queries.ExtendedQueries.x167LateDataAudit(spark, dir).count())
        time(s"x168_$dir")(queries.ExtendedQueries.x168CsvRoundtrip(spark, dir).count())
        time(s"x169_$dir")(queries.LlmQueries.x169FixpointRestart(spark, dir).count())
        time(s"x171_$dir")(queries.ExtendedQueries.x171BucketedAgg(spark, dir).count())
        time(s"x172_$dir")(queries.ExtendedQueries.x172UnionByName(spark, dir).count())
        time(s"x173_$dir")(queries.ExtendedQueries.x173PivotDynamic(spark, dir).count())
        time(s"x174_$dir")(queries.ExtendedQueries.x174SkewAudit(spark, dir).count())
        time(s"x175_$dir")(queries.LlmQueries.x175Collocations(spark, dir).count())
        time(s"x176_$dir")(queries.LlmQueries.x176DatasetCard(spark, dir).count())
        time(s"x177_$dir")(queries.LlmQueries.x177Bm25(spark, dir).count())
        time(s"x178_$dir")(queries.LlmQueries.x178FilterBank(spark, dir).count())
        time(s"x179_$dir")(queries.LlmQueries.x179LshScurve(spark, dir).count())
        time(s"x180_$dir")(queries.ExtendedQueries.x180RangeBalance(spark, dir).count())
        time(s"x181_$dir")(queries.LlmQueries.x181NgramNovelty(spark, dir).count())
      }
      for (dir <- Seq(sfDir, tenDir, hundredDir)) {
        time(s"x153_$dir")(queries.ExtendedQueries.x153DedupSql(spark, dir).count())
        time(s"x155_$dir")(queries.LlmQueries.x155Curriculum(spark, dir).count())
        time(s"x156_$dir")(queries.LlmQueries.x156EpochShuffle(spark, dir).count())
        time(s"x157_$dir")(queries.LlmQueries.x157RejectionSample(spark, dir).count())
        time(s"x159_$dir")(queries.LlmQueries.x159PaddingAudit(spark, dir).count())
        time(s"x170_$dir")(queries.LlmQueries.x170TextRank(spark, dir).count())
      }
      // x158 at 10×: tenDir already holds 10× lineitem (id-shifted —
      // Scratch9d); stage the six unscaled tables beside it so the audit
      // runs in the ORPHAN-HEAVY regime (9/10 of lineitem keys have no
      // parent) — the adversarial load for the anti-join side
      for (t <- Seq("customer", "part", "supplier", "nation", "region", "orders"))
        if (!new java.io.File(s"$tenDir/$t.parquet").isDirectory)
          core.Io.table(spark, sfDir, t).write.parquet(s"$tenDir/$t.parquet")
      time(s"x158_$sfDir")(queries.ExtendedQueries.x158FkAudit(spark, sfDir).count())
      time(s"x158_$tenDir")(queries.ExtendedQueries.x158FkAudit(spark, tenDir).count())
    }
  }
}
