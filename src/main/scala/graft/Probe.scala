package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared scale-probe main (verdict r10 #1): the SURVEY §6.1 10×/100×
  * probes as ONE `runMain graft.Probe`, emitting a machine-readable
  * `probe_last.json` (per probe: rows, candidate/pair volumes, wall, dir)
  * instead of prose tables backed by ad-hoc `Scratch*` mains. The r9→r10
  * x129 disk-kill was caught only because a human ran a scratch harness;
  * this makes that signal per-round and diffable, the same shape as
  * `bench_last.json`. Volume INVARIANTS (candidates == unique-set prefix
  * matches; LSH candidate volume derives from bucket sizes, never
  * all-pairs) are pinned by ProbeSpec against the exposed stage frames.
  *
  * Probe corpora (the pinned r9 recipe, regenerated only when missing):
  *   - 10× — every base table's documents/embeddings with N=10 exact
  *     copies under shifted ids;
  *   - 100× — documents AND embeddings (embeddings added r12, verdict
  *     r11 #4), N=100 copies: dup-SATURATED by construction (every
  *     doc/vector sits in a 100-clique), the adversarial regime for pair
  *     machinery.
  * Args: probe names to restrict (default all). Env: SPARK_GRAFT_SF_DIR
  * (organic base, default sf0.1), GRAFT_PROBE_10X / GRAFT_PROBE_100X
  * (corpus dirs, default /tmp/probe{10,100}x_r9).
  */
object Probe {

  final case class Rec(probe: String, dir: String, rows: Long,
      wall: Double, vols: Seq[(String, Long)])

  /** probe_last.json body — pure, so ProbeSpec can pin shape + parse.
    * A name-filtered run stamps itself `"partial": true` (the Verify
    * `_partial.json` discipline): a subset regeneration must never read
    * as full §6.1 coverage. */
  def renderJson(sfDir: String, recs: Seq[Rec],
      partial: Boolean = false): String = {
    def one(x: Rec): String = {
      val vols = x.vols.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      val tail = if (x.vols.isEmpty) "" else "," + vols
      s"""{"probe":"${x.probe}","dir":"${x.dir}","rows":${x.rows}""" +
        s""","wall_s":${math.round(x.wall * 1000) / 1000.0}$tail}"""
    }
    val p = if (partial) """"partial":true,""" else ""
    s"""{$p"sf":"$sfDir","probes":[${recs.map(one).mkString(",")}]}"""
  }

  /** Exact-copy corpora: N copies of the sfDir table under shifted ids.
    * Copies, not samples — volumes at 10×/100× are then EXACTLY 10×/100×
    * the base, so a probe row reads as a scaling exponent directly. */
  def ensureCorpora(spark: SparkSession, sfDir: String,
      tenDir: String, hundredDir: String): Unit = {
    def copies(n: Int, outDir: String, table: String, idCol: String): Unit =
      if (!new java.io.File(s"$outDir/$table.parquet").isDirectory) {
        // events goes through the schema-adaptive reader (ts vintages);
        // the copy lands µs-native, which every consumer reads identically
        val base =
          if (table == "events") core.Io.events(spark, sfDir)
          else core.Io.table(spark, sfDir, table)
        (0 until n).map { i =>
          base.withColumn(idCol, col(idCol) + lit(i * 10000000L))
        }.reduce(_ union _).repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      }
    copies(10, tenDir, "documents", "doc_id")
    copies(10, tenDir, "embeddings", "vec_id")
    // id shift is EVEN, so event_id parity — the x355 cal/test split and
    // x349's pairing parity — is preserved in every copy
    copies(10, tenDir, "events", "event_id")
    copies(100, hundredDir, "documents", "doc_id")
    copies(100, hundredDir, "embeddings", "vec_id")
    copies(100, hundredDir, "events", "event_id")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tuning.adaptive(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = sys.env.getOrElse("GRAFT_PROBE_10X", "/tmp/probe10x_r9")
    val hundredDir = sys.env.getOrElse("GRAFT_PROBE_100X", "/tmp/probe100x_r9")
    val only = args.toSet
    def want(n: String) = only.isEmpty || only(n)
    ensureCorpora(spark, sfDir, tenDir, hundredDir)
    spark.range(1000000).count() // JVM/codegen warmup outside all timings

    val recs = scala.collection.mutable.Buffer.empty[Rec]
    /** Honest consume for probe walls (advice r13, the Bench noop rule):
      * a bare count() lets Catalyst prune cardinality-preserving subtrees
      * — PruneAudit found 84/369 queries under-measured that way — so a
      * probe's scaling verdict could be read off a fraction of the
      * declared work. The noop sink executes the FULL plan with the full
      * output schema; the row count for the probe record is then read
      * from a cache of the (output-sized, small) frame, so the plan runs
      * ONCE and the wall prices all of it. Probes whose counts are
      * themselves the reported design volumes (x129 stage frames, x13_lsh
      * bucket math, x47's memo-pinned labels) keep their explicit counts.
      */
    def consumed(df: org.apache.spark.sql.DataFrame): Long = {
      val c = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.write.format("noop").mode("overwrite").save()
      val n = c.count()
      c.unpersist(false)
      n
    }
    def run(probe: String, dir: String)(f: => (Long, Seq[(String, Long)])): Unit =
      if (want(probe)) {
        val t0 = System.nanoTime()
        val (rows, vols) = f
        val wall = (System.nanoTime() - t0) / 1e9
        recs += Rec(probe, dir, rows, wall, vols)
        println(f"PROBE $probe dir=$dir rows=$rows%d wall=$wall%.2f " +
          vols.map { case (k, v) => s"$k=$v" }.mkString(" "))
      }

    // x129 exact set-similarity join — the round-10 scale fix under
    // per-round watch: candidate volume must track unique sets, and the
    // dup-saturated 100× must COMPLETE (pre-collapse it spilled ~80 GB
    // and died). Volumes come from the query's OWN stage frames. Each
    // regime is codegen-warmed at sf0.001 first (the Bench discipline):
    // without it the FIRST x129 run eats this query shape's whole JIT
    // bill and the collapse-vs-no-collapse walls are incomparable.
    val warmDir = "/root/testdata/sf0.001"
    if (want("x129")) queries.LlmQueries.x129Parts(spark, warmDir).out.count()
    for (dir <- Seq(sfDir, tenDir, hundredDir)) run("x129", dir) {
      val p = queries.LlmQueries.x129Parts(spark, dir)
      val u = p.setsU.count(); val c = p.cand.count()
      (p.out.count(), Seq("unique_sets" -> u, "cand_pairs" -> c))
    }
    // the adaptive collapse gate's two FORCED sides on the organic corpus
    // (verdict r10 #6): their wall gap is what the gate saves (collapse
    // skipped when <10% of sets are duplicates) and what it would cost to
    // guess wrong. The no-collapse side is never run at 100× (that is the
    // documented disk-kill regime).
    if (want("x129_collapse_forced"))
      queries.LlmQueries.x129Parts(spark, warmDir, Some(true)).out.count()
    run("x129_collapse_forced", sfDir) {
      val p = queries.LlmQueries.x129Parts(spark, sfDir, Some(true))
      val u = p.setsU.count(); val c = p.cand.count()
      (p.out.count(), Seq("unique_sets" -> u, "cand_pairs" -> c))
    }
    if (want("x129_nocollapse"))
      queries.LlmQueries.x129Parts(spark, warmDir, Some(false)).out.count()
    run("x129_nocollapse", sfDir) {
      val p = queries.LlmQueries.x129Parts(spark, sfDir, Some(false))
      val c = p.cand.count()
      (p.out.count(), Seq("cand_pairs" -> c))
    }
    // x13 MinHash-LSH: candidate volume is Σ c·(c−1)/2 over band buckets —
    // derived from bucket SIZES (one aggregate), never materialized pairs;
    // all_pairs is the bound the banded design must stay far under.
    for (dir <- Seq(sfDir, tenDir, hundredDir)) run("x13_lsh", dir) {
      val docs = core.Io.table(spark, dir, "documents")
      val n = docs.count()
      val b = queries.LlmQueries.bandBuckets(docs)
        .groupBy("band", "bh").agg(count(lit(1)).as("c"))
      val a = b.agg(count(lit(1)).as("buckets"),
        sum(expr("c * (c - 1) div 2")).as("cand")).head()
      (n, Seq("buckets" -> a.getLong(0), "cand_pairs" -> a.getLong(1),
        "all_pairs" -> n * (n - 1) / 2))
    }
    // x47 component fixpoint (memo-cold here: Probe is its own process)
    // then x261 riding the now-warm memo — separates the fixpoint cost
    // from the consumer's own machinery (the r10i probe discipline).
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x47_fixpoint", dir) {
        val rows = queries.LlmQueries.x47DedupComponents(spark, dir).count()
        (rows, Seq("rounds" -> queries.LlmQueries.x47LastRounds.get().toLong))
      }
      run("x261_coverage_warm", dir) {
        (consumed(queries.LlmQueries.x261NgramCoverage(spark, dir)), Nil)
      }
    }
    // RangeRank consumers: corpus-linear global ranks with parallelism
    // decoupled from n — walls here are the no-single-task-window proof.
    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      run("x263_quantiles", dir) {
        (consumed(queries.ExtendedQueries.x263ExactQuantiles(spark, dir)), Nil)
      }
      run("x255_hash_ks", dir) {
        (consumed(queries.ExtendedQueries.x255HashUniformity(spark, dir)), Nil)
      }
    }
    // x260 BPE trainer: corpus collapses to the vocab once — must be FLAT
    // across decades (the driver-metric class).
    for (dir <- Seq(sfDir, hundredDir)) run("x260_bpe_train", dir) {
      (consumed(queries.LlmQueries.x260BpeTrain5(spark, dir)), Nil)
    }
    // round-11 members with pair machinery or corpus-linear grams: x269's
    // fingerprint self-join at the dup-saturated 100× is sources²-bounded
    // per fingerprint BY CONSTRUCTION (docs collapse to counts first) —
    // the probe watches that bound; x267/x268 are vocabulary-sized aggs
    // whose walls must stay scan-shaped.
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x269_dup_leakage", dir) {
        (consumed(queries.Round11Queries.x269DupLeakage(spark, dir)), Nil)
      }
      run("x267_pmi", dir) {
        (consumed(queries.Round11Queries.x267PmiCollocations(spark, dir)), Nil)
      }
      run("x268_burstiness", dir) {
        (consumed(queries.Round11Queries.x268Burstiness(spark, dir)), Nil)
      }
    }

    // x271 is candidate-bounded — at the dup-saturated 100× the audit
    // itself is pair-heavy (run on a sample at corpus scale, documented),
    // so the probe stops at 10×; x273/x275 are RangeRank consumers whose
    // walls must stay FLAT to 100× like x263/x255.
    for (dir <- Seq(sfDir, tenDir)) run("x271_lsh_fp", dir) {
      (consumed(queries.Round11Queries.x271LshFpAudit(spark, dir)), Nil)
    }
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x273_fd_histogram", dir) {
        (consumed(queries.Round11Queries.x273FdHistogram(spark, dir)), Nil)
      }
      run("x275_dup_by_length", dir) {
        (consumed(queries.Round11Queries.x275DupByLength(spark, dir)), Nil)
      }
    }

    // round-11 batch 2: x276's token self-join is the x269 class
    // (sources²-bounded per token — the probe watches that bound at dup
    // saturation); x281 rides the same fingerprint collapse; x285 is two
    // vocabulary-sized aggregates + a vocab join; x278 explodes the vocab
    // 16× then collapses to 16 partials; x283 is RangeRank consumer #7
    // (must stay FLAT like x263/x255 — rank parallelism decoupled from n).
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x276_wjaccard", dir) {
        (consumed(queries.Round11Queries.x276WeightedJaccard(spark, dir)), Nil)
      }
      run("x281_data_constrained", dir) {
        (consumed(queries.Round11Queries.x281DataConstrained(spark, dir)), Nil)
      }
      run("x285_source_xent", dir) {
        (consumed(queries.Round11Queries.x285SourceXent(spark, dir)), Nil)
      }
      run("x278_ams_f2", dir) {
        (consumed(queries.Round11Queries.x278AmsF2(spark, dir)), Nil)
      }
      run("x283_systematic", dir) {
        (consumed(queries.Round11Queries.x283SystematicSample(spark, dir)), Nil)
      }
      // x287 runs TWO fingerprint collapses (text + set) — the x281 class,
      // watched at dup saturation; x290 is scan + TakeOrdered(20) and must
      // stay scan-shaped at any decade.
      run("x287_dedup_savings", dir) {
        (consumed(queries.Round11Queries.x287DedupSavings(spark, dir)), Nil)
      }
      run("x290_es_sample", dir) {
        (consumed(queries.Round11Queries.x290EsSample(spark, dir)), Nil)
      }
      // x294's window partitions by doc_id (corpus-cardinality keys — the
      // anti-x220 shape) and must scale linearly; x292 explodes the corpus
      // for stopword counts then collapses to 10 buckets; x297's windows
      // run over the value-cardinality grid only.
      run("x294_winnowing", dir) {
        (consumed(queries.Round11Queries.x294Winnowing(spark, dir)), Nil)
      }
      run("x292_calibration", dir) {
        (consumed(queries.Round11Queries.x292CalibrationEce(spark, dir)), Nil)
      }
      run("x297_wasserstein", dir) {
        (consumed(queries.Round11Queries.x297Wasserstein(spark, dir)), Nil)
      }
    }

    // embeddings family (verdict r11 #4 — previously only round-9 prose):
    // x293 k-center is k·N scans (linear), x289 JL rides a pair-bounded
    // sample, x298 purity is a cluster-sized aggregate — all three take
    // the new 100× embeddings decade. x59 SemDeDup's within-cluster pair
    // cost is Σ cluster² BY DESIGN; at the dup-saturated 100× clusters
    // grow 100× and pairs 10,000× — the documented quadratic regime (the
    // x271 class), so its probe stops at 10× like x271.
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x293_kcenter", dir) {
        (consumed(queries.Round11Queries.x293KCenter(spark, dir)), Nil)
      }
      run("x289_jl_distortion", dir) {
        (consumed(queries.Round11Queries.x289JlDistortion(spark, dir)), Nil)
      }
      run("x298_cluster_purity", dir) {
        (consumed(queries.Round11Queries.x298ClusterPurity(spark, dir)), Nil)
      }
    }
    for (dir <- Seq(sfDir, tenDir)) run("x59_semdedup", dir) {
      (consumed(queries.LlmQueries.x59SemDedup(spark, dir)), Nil)
    }

    // round-12 members with corpus-scaling machinery: x311 is RangeRank
    // consumer #8 (vocab rank — must stay FLAT like x263/x255); x320
    // explodes three gram streams (corpus-linear, the x292 class); x319
    // is pure fingerprint-collapse arithmetic (FLAT at dup saturation,
    // the x287 class); x322 is candidate-bounded like x271 (so its probe
    // stops at 10×).
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x311_vocab_lorenz", dir) {
        (consumed(queries.Round12Queries.x311VocabLorenz(spark, dir)), Nil)
      }
      run("x320_distinct_n", dir) {
        (consumed(queries.Round12Queries.x320DistinctN(spark, dir)), Nil)
      }
      run("x319_pair_completeness", dir) {
        (consumed(queries.Round12Queries.x319PairCompleteness(spark, dir)), Nil)
      }
    }
    for (dir <- Seq(sfDir, tenDir)) run("x322_bbit_minhash", dir) {
      (consumed(queries.Round12Queries.x322BbitMinhash(spark, dir)), Nil)
    }
    // round-12 batch 3/4 scale shapes: x339 rides RangeRank + the
    // fingerprint collapse (FLAT expectation); x341's source ×
    // bigram-vocabulary grid must track the VOCABULARY (unchanged under
    // exact copies — FLAT at 100×), never the corpus; x343's anchor-gated
    // successor aggregate is vocabulary-sized after one corpus scan.
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x339_novelty_decay", dir) {
        (consumed(queries.Round12Queries.x339NoveltyDecay(spark, dir)), Nil)
      }
      run("x341_bigram_kl", dir) {
        (consumed(queries.Round12Queries.x341BigramKl(spark, dir)), Nil)
      }
      run("x343_successor_entropy", dir) {
        (consumed(queries.Round12Queries.x343SuccessorEntropy(spark, dir)), Nil)
      }
    }

    // round-12 sweep family (verdict r12 #6): x332/x333 multiply LSH
    // candidate volume by their grid size (5 thresholds / 4 k values), so
    // they inherit the candidate-bounded x271 class — probed to 10× where
    // dup saturation stresses exactly the multiplied pair frames; x346
    // (vocabulary rank + adjacency) and x347 (|sources|×50 grid) are
    // vocabulary/source-bounded and must stay FLAT at 100× like x311.
    for (dir <- Seq(sfDir, tenDir)) {
      run("x332_jaccard_sweep", dir) {
        (consumed(queries.Round12Queries.x332JaccardSweep(spark, dir)), Nil)
      }
      run("x333_minhash_k_sweep", dir) {
        (consumed(queries.Round12Queries.x333MinhashKSweep(spark, dir)), Nil)
      }
    }
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x346_front_coding", dir) {
        (consumed(queries.Round12Queries.x346FrontCoding(spark, dir)), Nil)
      }
      run("x347_burrows_delta", dir) {
        (consumed(queries.Round12Queries.x347BurrowsDelta(spark, dir)), Nil)
      }
    }

    // round-13 scaling members: x348's 8-gram window count + content
    // re-join is the x292/x294 corpus-LINEAR class, probed at the
    // dup-saturated 100× where EVERY window is duplicated (marked volume
    // = corpus positions — the adversarial regime for the interval
    // merge); x352/x354 carry CAPPED probe sets (≤33 / ≤50) into
    // corpus-linear scans — walls must grow ~linearly with the scan,
    // never with probes² (x354 added its 100× decade in round 14,
    // verdict r13 #3: the decade adds scan volume, nothing structural —
    // the wall must track it linearly).
    for (dir <- Seq(sfDir, hundredDir)) {
      run("x348_exact_substr", dir) {
        (consumed(queries.Round13Queries.x348ExactSubstrCoverage(spark, dir)), Nil)
      }
      run("x352_hopkins", dir) {
        (consumed(queries.Round13Queries.x352Hopkins(spark, dir)), Nil)
      }
    }
    for (dir <- Seq(sfDir, tenDir, hundredDir)) run("x354_lof", dir) {
      (consumed(queries.Round13Queries.x354Lof(spark, dir)), Nil)
    }
    // round-13 members WITHOUT probe rows until round 14 (verdict r13
    // #3). Expected shapes: x353 is pure per-row scan CPU (65 md5s/row,
    // stateless projection) — corpus-LINEAR, and at the dup-saturated
    // decades the interesting check is that NOTHING about the shard
    // argmax is volume-dependent; x349's corpus part is one grouped sum
    // to the ≤25-cell win matrix (the MM loop rides the driver on that
    // fixed matrix) — LINEAR scan, FLAT tail; x355 is one mean
    // aggregate, one |types|-partition rank window over the calibration
    // half, and a broadcast q̂ into the test scan — LINEAR in events
    // with a vocabulary-sized window state. The 10×/100× events corpora
    // preserve event_id parity (even id shift), so the cal/test split
    // and pairing parity scale faithfully.
    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      run("x353_hrw_sharding", dir) {
        (consumed(queries.Round13Queries.x353HrwSharding(spark, dir)), Nil)
      }
      run("x349_bradley_terry", dir) {
        (consumed(queries.Round13Queries.x349BradleyTerry(spark, dir)), Nil)
      }
      run("x355_conformal", dir) {
        (consumed(queries.Round13Queries.x355ConformalCoverage(spark, dir)), Nil)
      }
    }
    // round-14 members: x356's RangeRank + adjacency equi-joins are
    // corpus-LINEAR with parallelism decoupled from the 3-epoch key
    // domain (the x311/x339 class); x357 is one prefix-sum + one
    // token-explode map-combining aggregate — corpus-TOKEN-linear, no
    // joins. The dup-saturated decades add only volume to either.
    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      run("x356_epoch_shuffle", dir) {
        (consumed(queries.Round14Queries.x356EpochShuffle(spark, dir)), Nil)
      }
      run("x357_pack_contamination", dir) {
        (consumed(queries.Round14Queries.x357PackContamination(spark, dir)), Nil)
      }
      // x358: segment explode + codegen scoring + one doc_id-keyed lag
      // window — corpus-token-linear like x357
      run("x358_code_switch", dir) {
        (consumed(queries.Round14Queries.x358CodeSwitch(spark, dir)), Nil)
      }
    }

    // round-15 members: x359 is corpus-DOC-linear (the shared x357
    // prefix-sum fold + one 4-way explode aggregate — no token explode);
    // x360 is token-linear with COLLAPSE-FIRST gram sides (the
    // dup-saturated decades share 8-grams, so the train-distinct frame
    // stays near base-vocabulary-sized at any dup factor); x361 is one
    // scan + a hash-collapsed count-product join (the x269 rule — pair
    // counts come out as products, never materialized pairs).
    for (dir <- Seq(sfDir, tenDir, hundredDir)) {
      run("x359_pack_frontier", dir) {
        (consumed(queries.Round15Queries.x359PackFrontier(spark, dir)), Nil)
      }
      run("x360_decontamination", dir) {
        (consumed(queries.Round15Queries.x360Decontamination(spark, dir)), Nil)
      }
      run("x361_fragment_stitch", dir) {
        (consumed(queries.Round15Queries.x361FragmentStitch(spark, dir)), Nil)
      }
      // x362: token explode + one doc-keyed 3-lag window + one
      // (doc,p)-keyed island window — corpus-token-linear, x358's class
      run("x362_repetition_loop", dir) {
        (consumed(queries.Round15Queries.x362RepetitionLoop(spark, dir)), Nil)
      }
      // x363: the closed-form anisotropy — corpus×64 coordinate rows into
      // three map-combining aggregates; the N²/2 cosine pairs never exist
      run("x363_anisotropy", dir) {
        (consumed(queries.Round15Queries.x363Anisotropy(spark, dir)), Nil)
      }
      // x364: RangeRank two-pass source-keyed ranking + one aggregate
      run("x364_length_gini", dir) {
        (consumed(queries.Round15Queries.x364LengthGini(spark, dir)), Nil)
      }
    }

    // x356 under PIN CONTENTION (verdict r14 #7): x356 pins a corpus×3
    // ranked frame plus its adjacency pairs while it builds; x354 pins
    // its kNN rings. The isolated 100× rows above never exercise the two
    // pins COEXISTING in the storage pool, so run both concurrently at
    // the dup-saturated 100× — the acceptance claim is graceful
    // degradation (MEMORY_AND_DISK eviction / DAG recompute), never an
    // OOM or a wall blow-up past the serial sum. Per-leg walls ride the
    // vols so the record shows which leg absorbed the contention.
    if (want("x356_contention")) {
      try { // codegen-warm both shapes outside the timing (Bench rule)
        consumed(queries.Round14Queries.x356EpochShuffle(spark, warmDir))
        consumed(queries.Round13Queries.x354Lof(spark, warmDir))
      } catch { case _: Throwable => () }
      run("x356_contention", hundredDir) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        def leg(f: => Long): scala.concurrent.Future[(Long, Long)] =
          scala.concurrent.Future {
            val t0 = System.nanoTime()
            val n = f
            (n, (System.nanoTime() - t0) / 1000000L)
          }
        val a = leg(consumed(
          queries.Round14Queries.x356EpochShuffle(spark, hundredDir)))
        val b = leg(consumed(
          queries.Round13Queries.x354Lof(spark, hundredDir)))
        import scala.concurrent.duration._
        val (rows356, ms356) = scala.concurrent.Await.result(a, 1200.seconds)
        val (rows354, ms354) = scala.concurrent.Await.result(b, 1200.seconds)
        pool.shutdown()
        (rows356, Seq("x356_ms" -> ms356, "x354_rows" -> rows354,
          "x354_ms" -> ms354))
      }
    }

    // x47 adversarial CHAIN (verdict r12 #5): a path graph A–B–…–Z of
    // diameter 64 — the worst case for plain min-label propagation (rounds
    // = diameter). The fixpoint composes the label map with itself every
    // round (the pointer jump in propagateLabels), so reach roughly
    // doubles per round and rounds must track ~log2(diameter); this probe
    // turns that claim into a per-round machine-readable number (expected
    // here: ≤ ceil(log2 64) + 2 = 8, vs 64+ for a non-doubling loop).
    if (want("x47_chain")) {
      val d = 64L
      val e0 = spark.range(0, d).select(col("id").as("a"), (col("id") + 1).as("b"))
      val chain = e0.union(e0.select(col("b").as("a"), col("a").as("b"))).persist()
      run("x47_chain", "synthetic") {
        val init = chain.select(col("a").as("doc_id")).distinct()
          .withColumn("label", col("doc_id"))
        val (labels, rounds) = queries.LlmQueries.propagateLabels(chain, init)
        val n = labels.count()
        labels.unpersist()
        (n, Seq("diameter" -> d, "rounds" -> rounds.toLong))
      }
      chain.unpersist()
    }

    val json = renderJson(sfDir, recs.toSeq, partial = only.nonEmpty)
    // A name-filtered run writes probe_partial.json, NEVER probe_last.json
    // (the Bench SPARK_GRAFT_ONLY discipline, adopted round 14 after a
    // filtered run clobbered the committed full artifact): a subset must
    // not masquerade as — or destroy — the round's §6.1 coverage record.
    val artifact = if (only.nonEmpty) "probe_partial.json" else "probe_last.json"
    try {
      val w = new java.io.PrintWriter(artifact, "UTF-8")
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () } // read-only CWD must not fail the probe
    println(json.take(4000))
    spark.stop()
  }
}
