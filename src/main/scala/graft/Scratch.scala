package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale-probe harness (not part of the driver contract): builds a
  * duplicate-heavy 10× copy of the sf0.1 corpus under /tmp and compares the
  * fixed-width (x35/x28) vs wide-signature (x35b/x28b) near-dup paths —
  * candidate VOLUME (Σ n·(n−1) over buckets: count-based, immune to this
  * VM's throttle noise) plus wall time. Results recorded in SURVEY §6.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/probe10x"
    def tenfold(table: String, idCol: String): Unit = {
      val base = core.Io.table(spark, sfDir, table)
      (0 until 10).map(i => base.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$tenDir/$table.parquet")
    }
    tenfold("documents", "doc_id")
    tenfold("embeddings", "vec_id")
    tenfold("customer", "c_custkey")
    // events via eventsRaw (the nanos ts reads as long; x61 never touches
    // it) with BOTH ids shifted, so each copy upserts its own customer slice
    (0 until 10).map { i =>
      core.Io.eventsRaw(spark, sfDir)
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$tenDir/events.parquet")
    // DISTINCT corpora: every token unique per doc (md5-derived), so
    // signatures are iid and any candidate pair is pure bucket-collision
    // tax — the quantity the N²/512 critique is about. The fixture corpus
    // can't show this: its 30-word shared vocabulary makes nearly every
    // doc pair genuinely similar, so candidates are true positives there.
    def distinctCorpus(n: Long, dir: String): Unit = {
      spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", (1 to 30).map(j =>
            md5(concat(col("id").cast("string"), lit(s"|$j")))): _*).as("text"),
          lit("xx").as("lang"), lit("probe").as("source"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    distinctCorpus(5000L, "/tmp/probe_dist1x")
    distinctCorpus(50000L, "/tmp/probe_dist10x")

    // candidate volume Σ n·(n−1) over (band, bv) buckets at a given
    // signature width — the quantity the wide signature exists to shrink
    def candVolume(dir: String, width: Int, bands: Int): Long = {
      val bandBits = width / bands
      val mask = (1L << bandBits) - 1
      val sig = queries.LlmQueries.simhashBits(
        core.Io.table(spark, dir, "documents"), width)
      val withBand = sig.select(col("doc_id"), explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), bandBits * b)
              .bitwiseAND(lit(mask)).as("bv"))): _*)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.bv"))
      withBand.groupBy("band", "bv").count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0)
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())
    for (dir <- Seq("/tmp/probe_dist1x", "/tmp/probe_dist10x")) {
      println(s"PROBE dir=$dir cand16=${candVolume(dir, 16, 2)} cand64=${candVolume(dir, 64, 4)}")
      time(s"x35_$dir")(queries.LlmQueries.x35SimhashPairs(spark, dir).count())
      time(s"x35b_$dir")(queries.LlmQueries.x35bSimhashPairsWide(spark, dir).count())
    }
    for (dir <- Seq(sfDir, tenDir)) {
      println(s"PROBE dir=$dir cand16=${candVolume(dir, 16, 2)} cand64=${candVolume(dir, 64, 4)}")
      time(s"x35_$dir")(queries.LlmQueries.x35SimhashPairs(spark, dir).count())
      time(s"x35b_$dir")(queries.LlmQueries.x35bSimhashPairsWide(spark, dir).count())
      time(s"x28_$dir")(queries.LlmQueries.x28CosineNeardup(spark, dir).count())
      time(s"x28b_$dir")(queries.LlmQueries.x28bCosineNeardupWide(spark, dir).count())
      time(s"x41_$dir")(queries.LlmQueries.x41RepetitionSignals(spark, dir).count())
      time(s"x42_$dir")(queries.LlmQueries.x42StratifiedSample(spark, dir).count())
      time(s"x43_$dir")(queries.LlmQueries.x43Contamination(spark, dir).count())
      time(s"x40_$dir")(queries.ExtendedQueries.x40JsonlRoundtrip(spark, dir).count())
      time(s"x13_$dir")(queries.LlmQueries.x13MinhashNearDedup(spark, dir).count())
      time(s"x13b_$dir")(queries.LlmQueries.x13bMinhashNative(spark, dir).count())
      time(s"x47_$dir")(queries.LlmQueries.x47DedupComponents(spark, dir).count())
      time(s"x48_$dir")(queries.LlmQueries.x48IncrementalDedup(spark, dir).count())
      time(s"x50_$dir")(queries.LlmQueries.x50TfidfTerms(spark, dir).count())
      time(s"x51_$dir")(queries.LlmQueries.x51AdaptiveQualityGate(spark, dir).count())
    }
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x49_$dir")(queries.LlmQueries.x49PqAnn(spark, dir).count())
      time(s"x52_$dir")(queries.LlmQueries.x52KmeansStep(spark, dir).count())
    }
    // round-5 queries: counts are the signal (dup-chunk rows, containment
    // pairs, rebalance output) — they must scale with dup density / strata,
    // never with corpus²
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x53_$dir")(queries.LlmQueries.x53ChunkDedup(spark, dir)
        .filter(col("n_dup_chunks") > 0).count())
      time(s"x54_$dir")(queries.LlmQueries.x54DomainRebalance(spark, dir).count())
      time(s"x55_$dir")(queries.LlmQueries.x55LexicalDiversity(spark, dir).count())
      time(s"x56_$dir")(queries.LlmQueries.x56KnnClassify(spark, dir).count())
      time(s"x57_$dir")(queries.LlmQueries.x57Containment(spark, dir).count())
      time(s"x58_$dir")(queries.ExtendedQueries.x58OrcRoundtrip(spark, dir).count())
    }
    // recall on the dup-heavy corpus: every doc has 9 exact copies, so a
    // correct near-dup pass must flag every doc
    val flagged = queries.LlmQueries.x35bSimhashPairsWide(spark, tenDir)
      .filter(col("n_near") >= 9).count()
    println(s"PROBE x35b_recall flagged=$flagged of 50000")

    // 100× probe (500k docs / 200k vectors) — one more decade for the
    // heaviest operators; opt-in (SPARK_GRAFT_PROBE_100X=1) so the default
    // probe run stays minutes, not tens of minutes
    if (sys.env.get("SPARK_GRAFT_PROBE_100X").contains("1")) {
      val hundredDir = "/tmp/probe100x"
      def hundredfold(table: String, idCol: String): Unit = {
        val base = core.Io.table(spark, sfDir, table)
        (0 until 100).map(i => base.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
          .reduce(_ union _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$hundredDir/$table.parquet")
      }
      hundredfold("documents", "doc_id")
      hundredfold("embeddings", "vec_id")
      for (dir <- Seq(hundredDir)) {
        time(s"x10_$dir")(queries.ExtendedQueries.x10ExactDedupHash(spark, dir).count())
        time(s"x13b_$dir")(queries.LlmQueries.x13bMinhashNative(spark, dir).count())
        time(s"x16_$dir")(queries.LlmQueries.x16QualityScore(spark, dir).count())
        time(s"x34_$dir")(queries.LlmQueries.x34PrepPipeline(spark, dir).count())
        time(s"x47_$dir")(queries.LlmQueries.x47DedupComponents(spark, dir).count())
        time(s"x53_$dir")(queries.LlmQueries.x53ChunkDedup(spark, dir)
          .filter(col("n_dup_chunks") > 0).count())
        time(s"x60_$dir")(queries.LlmQueries.x60SequencePack(spark, dir).count())
        time(s"x63_$dir")(queries.LlmQueries.x63RarityScore(spark, dir).count())
        time(s"x69_$dir")(queries.LlmQueries.x69PrepPipelineV3(spark, dir).count())
      }
    }

    // round-6 probes (x59-x63): volumes over clocks.
    // x59 vs x59b — within-cluster PAIR volume Σ n·(n−1)/2, the quantity
    // the k parameter exists to shrink (same argmax assignment as semDedup,
    // recomputed here so the probe reports the intermediate the query
    // consumes, not just its output rows)
    plans.GraftExtensions.register(spark)
    def semPairVolume(dir: String, k: Int): Long = {
      val nd = queries.ExtendedQueries.nativeDot _
      val emb = core.Io.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          sqrt(nd(col("embedding"), col("embedding"))).as("norm"))
      val cent = emb.filter(col("vec_id").between(1, k))
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
          col("norm").as("cnorm"))
      // stableRound6 on the assignment cosine, exactly as semDedup does —
      // without it a sub-1e-6 tie could land a vector in a different
      // cluster than the query actually uses, skewing the reported volumes
      val ac = queries.ExtendedQueries.stableRound6(
        nd(col("embedding"), col("cemb")) / (col("norm") * col("cnorm")))
      emb.crossJoin(broadcast(cent))
        .groupBy("vec_id")
        .agg(max(struct(ac.as("ac"), (-col("cid")).as("ncid"))).as("m"))
        .select((-col("m.ncid")).as("cid"))
        .groupBy("cid").count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
    }
    for (dir <- Seq(sfDir, tenDir)) {
      println(s"PROBE semdedup dir=$dir pairs_k8=${semPairVolume(dir, 8)} " +
        s"pairs_k32=${semPairVolume(dir, 32)}")
      time(s"x59_$dir")(queries.LlmQueries.x59SemDedup(spark, dir).count())
      time(s"x59b_$dir")(queries.LlmQueries.x59bSemDedupWide(spark, dir).count())
      time(s"x60_$dir")(queries.LlmQueries.x60SequencePack(spark, dir).count())
      time(s"x61_$dir")(queries.ExtendedQueries.x61MergeUpsert(spark, dir).count())
      time(s"x62_$dir")(queries.LlmQueries.x62MinhashEstimate(spark, dir).count())
      time(s"x63_$dir")(queries.LlmQueries.x63RarityScore(spark, dir).count())
      time(s"x64_$dir")(queries.LlmQueries.x64PiiScrub(spark, dir).count())
      time(s"x65_$dir")(queries.LlmQueries.x65VocabCoverage(spark, dir)
        .filter(col("n_oov") > 0).count())
      time(s"x66_$dir")(queries.LlmQueries.x66BestOfDupes(spark, dir)
        .filter(col("n_members") > 1).count())
      time(s"x56b_$dir")(queries.LlmQueries.x56bKnnAnn(spark, dir).count())
      time(s"x67_$dir")(queries.LlmQueries.x67SourceOverlap(spark, dir).count())
      time(s"x68_$dir")(queries.LlmQueries.x68DupRateBySource(spark, dir)
        .filter(col("n_dup_docs") > 0).count())
      time(s"x69_$dir")(queries.LlmQueries.x69PrepPipelineV3(spark, dir).count())
    }
    // x60 stripe balance: max/mean token skew across stripes for the
    // declared %8 form vs the split-id form (split form over the same
    // corpus read at its native partitioning)
    for (dir <- Seq(sfDir, tenDir)) {
      def skew(m: org.apache.spark.sql.DataFrame): (Long, Double, Long) = {
        val r = m.groupBy("stripe").agg(sum("bin_tokens").as("t"))
          .agg(count(lit(1)), avg("t"), max("t")).head()
        (r.getLong(0), r.getDouble(1), r.getLong(2))
      }
      val (s8, m8, x8) = skew(queries.LlmQueries.x60SequencePack(spark, dir))
      val docs = core.Io.table(spark, dir, "documents")
      val (sp, mp, xp) = skew(queries.LlmQueries.sequencePackBySplit(docs))
      println(f"PROBE x60skew dir=$dir mod8: stripes=$s8 max/mean=${x8 / m8}%.3f " +
        f"split: stripes=$sp max/mean=${xp / mp}%.3f")
    }

    // round-6 continuation probes (x70-x72): volumes over clocks. x70's
    // load is the change-row count (window state), x71's the per-status
    // doc volumes, x72's the vocabulary-vs-token-stream collapse ratio —
    // the quantity its distinct-word explode exists to exploit.
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x70_$dir")(queries.ExtendedQueries.x70Scd2History(spark, dir).count())
      time(s"x71_$dir")(queries.LlmQueries.x71SnapshotDiff(spark, dir)
        .agg(sum("n_docs")).head().getLong(0))
      time(s"x72_$dir")(queries.LlmQueries.x72BpePairs(spark, dir).count())
      time(s"x73_$dir")(queries.ExtendedQueries.x73SaltedJoin(spark, dir).count())
      time(s"x74_$dir")(queries.ExtendedQueries.x74Funnel(spark, dir)
        .agg(sum("n_users")).head().getLong(0))
      time(s"x75_$dir")(queries.ExtendedQueries.x75Retention(spark, dir)
        .agg(sum("n_users")).head().getLong(0))
      time(s"x76_$dir")(queries.ExtendedQueries.x76BucketedJoin(spark, dir).count())
      time(s"x77_$dir")(queries.ExtendedQueries.x77PartitionedPrune(spark, dir).count())
      time(s"x78_$dir")(queries.ExtendedQueries.x78CompactionRoundtrip(spark, dir).count())
      time(s"x79_$dir")(queries.LlmQueries.x79InvertedIndex(spark, dir).count())
      time(s"x80_$dir")(queries.LlmQueries.x80WeightedSample(spark, dir)
        .agg(sum("n_kept")).head().getLong(0))
      time(s"x81_$dir")(queries.ExtendedQueries.x81BurstDetect(spark, dir).count())
      time(s"x82_$dir")(queries.LlmQueries.x82QuantileNorm(spark, dir).count())
      time(s"x83_$dir")(queries.LlmQueries.x83SortedNeighborhood(spark, dir).count())
      time(s"x84_$dir")(queries.LlmQueries.x84EditGate(spark, dir).count())
      time(s"x85_$dir")(queries.LlmQueries.x85SourceDrift(spark, dir).count())
      time(s"x86_$dir")(queries.LlmQueries.x86LeakageAudit(spark, dir).count())
      time(s"x87_$dir")(queries.LlmQueries.x87BigramLm(spark, dir).count())
      time(s"x88_$dir")(queries.LlmQueries.x88TermLookup(spark, dir).count())
      time(s"x89_$dir")(queries.LlmQueries.x89DedupAgreement(spark, dir).count())
      time(s"x90_$dir")(queries.ExtendedQueries.x90GreedyPack(spark, dir).count())
      time(s"x91_$dir")(queries.ExtendedQueries.x91NearestEvent(spark, dir).count())
      time(s"x92_$dir")(queries.ExtendedQueries.x92TemporalLookup(spark, dir).count())
      time(s"x93_$dir")(queries.ExtendedQueries.x93RollingDau(spark, dir).count())
      time(s"x96_$dir")(queries.ExtendedQueries.x96TimeWeightedAvg(spark, dir).count())
      time(s"x97_$dir")(queries.ExtendedQueries.x97MadOutliers(spark, dir).count())
      time(s"x94_$dir")(queries.LlmQueries.x94RagChunks(spark, dir).count())
      time(s"x95_$dir")(queries.LlmQueries.x95ParetoFrontier(spark, dir).count())
      time(s"x98_$dir")(queries.LlmQueries.x98TableChecksum(spark, dir).count())
      time(s"x99_$dir")(queries.ExtendedQueries.x99MarkovTransitions(spark, dir).count())
      time(s"x100_$dir")(queries.LlmQueries.x100CentroidDrift(spark, dir).count())
      time(s"x101_$dir")(queries.LlmQueries.x101TokenEntropy(spark, dir).count())
      val docs = core.Io.table(spark, dir, "documents")
      val toks = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
      val nTok = toks.count()
      val nVocab = toks.distinct().count()
      println(s"PROBE x72collapse dir=$dir tokens=$nTok vocab=$nVocab " +
        f"ratio=${nTok.toDouble / nVocab}%.1f")
    }
    spark.stop()
  }
}
