package graft.queries

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 additions (registered in SparkEntry, oracled in Oracles):
  * mix/sampling diagnostics (x265 ESS), filter-rule agreement (x266
  * Cohen's κ), collocations (x267 PMI), term overdispersion (x268
  * burstiness), dedup governance (x269 cross-source leakage), and
  * packing economics (x270 strided windows). Split out of LlmQueries
  * only for file size; same conventions (fanOut, stableRound, md5
  * portability, map-combining aggregates).
  */
object Round11Queries {
  import LlmQueries.fanOut

  /** x265 — EFFECTIVE SAMPLE SIZE of the temperature mix (round-11): for
    * the sqrt-temperature source weighting (the x117 family's τ = 0.5),
    * ESS = (Σ w)² / Σ w² over per-doc importance weights w_d = W_s / n_s —
    * the importance-sampling diagnostic the mix-assembly queries
    * (x117/x155/x258) lack: a mix can satisfy its source shares while
    * resampling so hard that the EFFECTIVE corpus is a fraction of the
    * nominal one (ESS/N is that fraction; 1 = uniform, → 0 = degenerate).
    *
    * Exactness (the x101 per-term discipline): W_s = round6(√n_s) /
    * Σ round6(√n_s) with the denominator an exact DECIMAL sum; per-source
    * ESS contributions W_s²/n_s are round9'd (9 digits — at 6 the terms
    * quantize to 0 once n_s is large) then DECIMAL-summed; the two final
    * divisions are float, round6 at the edge, NULL-guarded when the
    * contribution sum quantizes to zero (degenerate; mirrored CASE).
    *
    * Scale shape: one map-combining source count + arithmetic on the
    * |sources|-row frame + two 1-row crosses (x117's denominator shape).
    */
  def x265MixEss(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.{stableRound, stableRound6}
    val per = Io.table(spark, sfDir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("r6",
        stableRound6(sqrt(col("n").cast("double"))).cast("decimal(18,6)"))
    val tot = per.agg(sum("r6").cast("decimal(28,6)").as("s"),
      sum("n").as("nt"))
    val w = per.crossJoin(broadcast(tot))
      .withColumn("w6", stableRound6(col("r6").cast("double") /
        col("s").cast("double")).cast("decimal(18,6)"))
      .withColumn("c9", stableRound(col("w6").cast("double") *
        col("w6").cast("double") / col("n").cast("double"), 9)
        .cast("decimal(18,9)"))
    val g = w.agg(sum("w6").cast("decimal(28,6)").as("sw"),
      sum("c9").cast("decimal(28,9)").as("sc"))
    val ess = col("sw").cast("double") * col("sw").cast("double") /
      col("sc").cast("double")
    w.crossJoin(broadcast(g))
      .select(col("source"), col("n").as("n_docs"),
        col("w6").cast("double").as("weight"),
        when(col("sc") =!= 0, stableRound6(ess)).as("ess"),
        when(col("sc") =!= 0,
          stableRound6(ess / col("nt").cast("double"))).as("ess_ratio"))
      .orderBy("source")
  }

  /** x267 — PMI COLLOCATIONS (round-11): the top-20 adjacent-token bigrams
    * by pointwise mutual information, count-gated at 5 — the collocation
    * extractor (Church & Hanks 1990) of tokenizer-vocabulary and
    * phrase-mining prep: a high-PMI bigram is a merge candidate BPE (x260)
    * will discover late and a multiword expression retrieval (x79/x88)
    * should index whole.
    *
    * Exactness: PMI = ln(c_ab·NU² / (NB·c_a·c_b)) — counts exact, products
    * in DECIMAL(38,0) (c_ab·NU² needs ~22 digits at sf0.1; decimal guard
    * documented past ~10³⁸), ONE ln of the exact-integer ratio via the
    * x244 cast-to-double rule, round6. Ties broken by the bigram string.
    *
    * Scale shape: two vocabulary-sized aggregates (map-combining), a
    * vocab-sized join-back (AQE broadcasts while it fits), two 1-row
    * crosses, TakeOrderedAndProject(20). The corpus is scanned twice
    * (unigrams + bigrams); nothing corpus-sized shuffles.
    */
  def x267PmiCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val uni = tok.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val big = tok.select(col("toks"), explode(expr(
        """CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<INT>)
          |ELSE sequence(1, size(toks) - 1) END""".stripMargin)).as("i"))
      .select(expr("concat_ws(' ', element_at(toks, i), element_at(toks, i + 1))")
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cab"))
    val nu = uni.agg(sum("cw").cast("decimal(38,0)").as("nu"))
    val nb = big.agg(sum("cab").cast("decimal(38,0)").as("nb"))
    big.filter(col("cab") >= 5)
      .withColumn("w1", split_part(col("bigram"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("bigram"), lit(" "), lit(2)))
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("bigram"), col("cab"), col("c1"), col("c2"),
        stableRound6(log(
          (col("cab").cast("decimal(38,0)") * col("nu") * col("nu"))
            .cast("double") /
          (col("nb") * col("c1").cast("decimal(38,0)") *
            col("c2").cast("decimal(38,0)")).cast("double"))).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(20)
  }

  /** x268 — TOKEN BURSTINESS (round-11): variance-to-mean ratio of the
    * per-document count of each of the 10 most frequent tokens — Church &
    * Gale's overdispersion statistic: VMR = 1 is Poisson scatter
    * ("function word"), VMR ≫ 1 is bursty ("content word" — documents
    * either ignore it or repeat it), the signal term-weighting and
    * stop-word policies need beyond raw frequency (x50's idf can't see
    * WITHIN-document clumping).
    *
    * Exactness: zero-count documents enter the moments implicitly —
    * Σc and Σc² over the docs CONTAINING the token are complete because
    * absent docs contribute 0 to both — so VMR = (N·Σc² − (Σc)²) /
    * (Σc·(N−1)) is ONE division from exact longs (N·Σc² ≲ 10¹⁰ at sf0.1;
    * decimal guard documented), round6 at the edge.
    *
    * Scale shape: one (token, doc) map-combining aggregate, one
    * vocabulary-sized moment aggregate, a 1-row corpus-count cross,
    * TakeOrderedAndProject(10).
    */
  def x268Burstiness(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val docs = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    val stats = perDoc.groupBy("w").agg(
      sum("c").as("sc"), sum(col("c") * col("c")).as("scc"),
      count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("nn"))
    stats.crossJoin(broadcast(n))
      .select(col("w").as("token"), col("sc").as("n_occurrences"),
        col("df").as("doc_freq"),
        stableRound6(col("sc").cast("double") / col("nn").cast("double"))
          .as("mean_per_doc"),
        when(col("sc") > 0 && col("nn") > 1, stableRound6(
          (col("nn") * col("scc") - col("sc") * col("sc")).cast("double") /
            (col("sc") * (col("nn") - 1)).cast("double"))).as("vmr"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(10)
  }

  /** x269 — CROSS-SOURCE DUPLICATE-LEAKAGE matrix (round-11): for every
    * source pair, how many order-insensitive content fingerprints they
    * SHARE and how many doc pairs that represents — the governance view of
    * dedup ("which crawls copy which") that the per-source rates (x68) and
    * global components (x47) both flatten. Fingerprint = md5 of the sorted
    * distinct token set: robust to token reordering (the x19 winnowing
    * theme), byte-identical in both engines.
    *
    * Exactness: counts only — n_shared_fp = shared distinct fingerprints,
    * n_doc_pairs = Σ over shared fingerprints of c_a·c_b (exact longs;
    * the pair count is the intrinsic OUTPUT of the question, x131's
    * argument).
    *
    * Scale shape: one (fingerprint, source) map-combining aggregate, one
    * self equi-join on the fingerprint whose per-key fan-out is bounded by
    * |sources|² — never doc², because docs collapsed to counts first
    * (the x129 collapse lesson applied at the aggregate level).
    */
  def x269DupLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val grp = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(md5(array_join(array_sort(array_distinct(
        split(col("text"), " "))), " ")).as("fp"), col("source"))
      .groupBy("fp", "source").agg(count(lit(1)).as("c"))
    grp.as("a").join(grp.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_fp"),
        sum(col("a.c") * col("b.c")).as("n_doc_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** x270 — STRIDED-WINDOW PACKING economics (round-11): the exact cost
    * model of sliding-window chunking (window W=64 tokens, stride S=48 —
    * the overlap-16 long-document recipe): windows per doc
    * nw = ⌈max(n−W, 0)/S⌉ + 1, emitted tokens nw·W (the last window pads
    * to W). Completes the packing family: x60/x116 pack whole docs, x53/
    * x118/x249 chunk disjointly; strided windows DUPLICATE (n−W)ᐩ
    * boundary tokens for context continuity, and this query prices that
    * duplication per source BEFORE a 100 TB tokenization pass commits it.
    *
    * Exactness: window counts are pure integer arithmetic
    * ((n−W+S−1) div S + 1); the amplification ratio is one division of
    * exact longs, round6.
    *
    * Scale shape: per-row arithmetic in the scan + one map-combining
    * source aggregate — no shuffle beyond |sources| partials.
    */
  def x270StrideWindows(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val W = 64L; val S = 48L
    Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("nw", when(col("n") <= W, lit(1L))
        .otherwise(expr(s"(n - $W + $S - 1) div $S + 1")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("raw_tokens"),
        sum("nw").as("n_windows"), sum(col("nw") * lit(W)).as("emitted_tokens"))
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("n_windows"), col("emitted_tokens"),
        stableRound6(col("emitted_tokens").cast("double") /
          col("raw_tokens").cast("double")).as("amplification"))
      .orderBy("source")
  }

  /** x266 — COHEN'S KAPPA between two weak quality rules (round-11): the
    * chance-corrected agreement of the length rule (n_chars >= 120) and
    * the token rule (>= 24 tokens) — the filter-bank audit (x178's
    * family) that raw percent-agreement overstates: two rules that both
    * pass almost everything "agree" by chance alone; kappa subtracts that
    * (1 = perfect, 0 = chance, < 0 = systematic disagreement). Before a
    * 100 TB filter sweep, kappa between a cheap rule and an expensive one
    * decides whether the cheap one can prefilter.
    *
    * Exactness: the 2x2 contingency is exact longs from one map-combining
    * aggregate; po and pe are each ONE division from exact products;
    * kappa = (N*(n11+n00) - peNum) / (N^2 - peNum) is one division of
    * exact longs (N^2 <= 3.6e11 at sf0.1; decimal guard documented past
    * N ~ 3e9). pe = 1 (all mass in one marginal cell) makes kappa 0/0 —
    * pinned to NULL in both engines (mirrored CASE).
    *
    * Scale shape: one scan, one 1-row aggregate; nothing shuffles but the
    * five partial sums.
    */
  def x266CohenKappa(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select((col("n_chars") >= 120).cast("long").as("a"),
        (size(split(col("text"), " ")) >= 24).cast("long").as("b"))
    val m = d.agg(count(lit(1)).as("n"),
      sum(col("a") * col("b")).as("n11"),
      sum(col("a") * (lit(1L) - col("b"))).as("n10"),
      sum((lit(1L) - col("a")) * col("b")).as("n01"),
      sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
    val peNum = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n01") + col("n00")) * (col("n10") + col("n00"))
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      stableRound6((col("n11") + col("n00")).cast("double") /
        col("n").cast("double")).as("po"),
      stableRound6(peNum.cast("double") /
        (col("n") * col("n")).cast("double")).as("pe"),
      when(col("n") * col("n") =!= peNum, stableRound6(
        (col("n") * (col("n11") + col("n00")) - peNum).cast("double") /
          (col("n") * col("n") - peNum).cast("double"))).as("kappa"))
  }

  /** x271 — LSH FALSE-POSITIVE AUDIT per band (round-11): of the
    * candidate pairs each of x13's 4 bands generates, how many survive
    * the exact shingle-set Jaccard >= 0.8 check — the measured
    * false-positive rate of the banding design itself (analytically a
    * pair at similarity s collides per band with probability s^4; this
    * measures the corpus's actual rate), the audit that decides whether
    * b=4/r=4 wastes verify work or misses dups BEFORE a 100 TB dedup run
    * commits to it.
    *
    * Exactness: candidates are DISTINCT (band, da, db) equi-join matches
    * on x13's band hashes (md5-portable); intersections are exact counts
    * via a shingle equi-join restricted to candidates; the threshold test
    * 5i >= 4u is integer; one division per band, round6.
    *
    * Scale shape: candidate-bounded — the verify join fans out only over
    * candidate pairs (which x13's banding keeps duplicate-density-sized,
    * §6.1o x13 row). At dup saturation the audit is itself pair-heavy:
    * at corpus scale you'd run it on a SAMPLE (documented; the fixture
    * probe runs 1×/10×).
    */
  def x271LshFpAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val raw = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
    val docs = fanOut(raw)
    // distinct 3-gram shingles per doc, x13's rule (docs under 3 tokens
    // have none and therefore no bands either)
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) < 3 THEN CAST(array() AS ARRAY<STRING>)
          |ELSE array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
          |                 element_at(toks, i + 2)))) END""".stripMargin))
        .as("shingle"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // signatures from the SAME shingle frame the verify join reads (r16,
    // guide §2.4): bandBuckets(raw) re-tokenized and re-exploded the whole
    // corpus a second time for the minhash minima, but min() over a doc's
    // distinct shingles equals min() over its multiset, so `sh` already
    // carries everything the signature needs. Interleaved floors: 2.32/2.36
    // before vs 2.30/2.39 after (calm pairs; slight win, one fewer
    // pipeline). PINNING sh was also tried — 1.9-2.4 s unpinned vs
    // 3.9-4.1 s pinned in every pair: materializing the corpus-sized
    // shingle-string frame costs far more than re-running the codegen
    // explode per consumer. Shingle recomputation stays lazy by design.
    val bands = LlmQueries.bandBucketsFromShingles(sh)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.band").as("band"), col("a.doc_id").as("da"),
        col("b.doc_id").as("db")).distinct()
    val iv = cand
      .join(sh.select(col("doc_id").as("da"), col("shingle")), Seq("da"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), Seq("db", "shingle"))
      .groupBy("band", "da", "db").agg(count(lit(1)).as("i"))
    cand.join(iv, Seq("band", "da", "db"), "left")
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .select(col("band"), coalesce(col("i"), lit(0L)).as("i"),
        (col("na") + col("nb") - coalesce(col("i"), lit(0L))).as("u"))
      .groupBy(col("band").cast("long").as("band"))
      .agg(count(lit(1)).as("n_cand"),
        sum((lit(5) * col("i") >= lit(4) * col("u")).cast("long")).as("n_true"))
      .select(col("band"), col("n_cand"), col("n_true"),
        stableRound6((col("n_cand") - col("n_true")).cast("double") /
          col("n_cand").cast("double")).as("fp_rate"))
      .orderBy("band")
  }

  /** x272 — SHARD-BALANCE AUDIT (round-11): token mass per shard under
    * the two standard 32-way sharding rules — doc_id mod (the "natural
    * key" habit) vs md5-hash mod — with the relative variance and
    * max/mean skew of each. THE partitioning decision at 100 TB: a
    * skewed shard is the straggler task, and this measures the skew a
    * rule would commit BEFORE the shuffle is written.
    *
    * Exactness: empty shards enter the moments implicitly (0 tokens);
    * rel-var = (k·Σx² − (Σx)²)/(Σx)² and skew = k·max/Σx are exact-long
    * ratios (k = 32 constant; Σx² ≲ 10¹⁵ at sf0.1 — decimal guard
    * documented), one division + one sqrt each, round6.
    *
    * Scale shape: per-row shard arithmetic in the scan, one 32-row
    * aggregate per rule, union of two 1-row finales.
    */
  def x272ShardBalance(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val k = 32L
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .select(col("nt"), pmod(col("doc_id"), lit(k)).as("shard_mod"),
        expr("""pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8),
          16, 10) as bigint), 32)""").as("shard_hash"))
    def audit(shardCol: String, name: String): DataFrame = d
      .groupBy(col(shardCol).as("shard")).agg(sum("nt").as("x"))
      .agg(sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
        max("x").as("mx"))
      .select(lit(name).as("strategy"), lit(k).as("n_shards"),
        col("sx").as("total_tokens"), col("mx").as("max_shard_tokens"),
        stableRound6(sqrt((lit(k) * col("sxx") - col("sx") * col("sx"))
          .cast("double") / (col("sx") * col("sx")).cast("double"))).as("cv"),
        stableRound6((lit(k) * col("mx")).cast("double") /
          col("sx").cast("double")).as("skew"))
    audit("shard_mod", "mod").unionAll(audit("shard_hash", "hash"))
      .orderBy("strategy")
  }

  /** x273 — FREEDMAN–DIACONIS histogram (round-11): doc-length histogram
    * whose bin width h = 2·IQR/n^(1/3) comes from the EXACT interquartile
    * range — the statistically-sized layout a fixed-width histogram (x85's
    * 100-char bins) guesses at. The IQR order statistics ride
    * [[graft.operators.RangeRank]] (FIFTH declared consumer): ranks
    * ⌈n/4⌉ and ⌈3n/4⌉ under the (x, doc_id) total order — no global
    * sort, no percentile buffer (x263's shape).
    *
    * Exactness: quartile targets are integer ceil-division; n^(1/3) is
    * exp(ln(n)/3) EXPLICITLY in both engines (cbrt's rounding is not
    * pinned cross-engine; exp/ln parity is, the x244 precedent); h is
    * round6'd then snapped to an integer char width (≥1), so bin
    * boundaries are exact integer arithmetic.
    *
    * Scale shape: one RangeRank pass for two ranks + a 2-row broadcast
    * equi-join, then one map-combining bin aggregate over a second scan;
    * the 1-row width frame crosses onto it (allow-listed).
    */
  def x273FdHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars").cast("long").as("x"))
      .withColumn("g", lit(1))
    val width = x273Pin.swapStaged {
      val ranking = graft.operators.RangeRank.rankWithinOwned(
        d, "g", Seq("x", "doc_id"), "r")
      val n = d.agg(count(lit(1)).as("n"))
      val spine = spark.range(1).crossJoin(broadcast(n))
        .select(explode(array(
          struct(lit("q1").as("ql"), expr("(n + 3) div 4").as("t")),
          struct(lit("q3").as("ql"), expr("(3 * n + 3) div 4").as("t")))).as("q"),
          col("n"))
        .select(col("q.ql").as("ql"), col("q.t").as("t"), col("n"))
      val w0 = ranking.df.join(broadcast(spine), col("r") === col("t"))
        .groupBy("n")
        .agg(min(when(col("ql") === "q1", col("x"))).as("q1"),
          min(when(col("ql") === "q3", col("x"))).as("q3"))
        .select(col("n"), col("q1"), col("q3"),
          greatest(lit(1L), floor(stableRound6(
            lit(2.0) * (col("q3") - col("q1")).cast("double") /
              exp(log(col("n").cast("double")) / lit(3.0))) + lit(0.5))
            .cast("long")).as("h"))
      (w0, () => ranking.release())
    }
    d.crossJoin(broadcast(width))
      .withColumn("bin", expr("x div h"))
      .groupBy("bin", "h", "q1", "q3")
      .agg(count(lit(1)).as("n_docs"))
      .select(col("bin"), (col("bin") * col("h")).as("bin_lo"),
        ((col("bin") + 1) * col("h")).as("bin_hi"), col("h").as("bin_width"),
        col("q1"), col("q3"), col("n_docs"))
      .orderBy("bin")
  }

  private val x273Pin = new graft.core.PinnedResult

  /** x274 — GOOD–TURING unseen mass (round-11): per source, the
    * Good–Turing estimate of the probability that the NEXT token is an
    * unseen type, P₀ = N₁/N (singleton types over total tokens), plus the
    * Turing-smoothed count for singletons r* = 2·N₂/N₁ — the
    * open-vocabulary meter next to Heaps' growth (x251) and KMV richness
    * (x241): a source whose unseen mass stays high never saturates a
    * tokenizer's vocabulary.
    *
    * Exactness: N, N₁, N₂ are exact counts from two map-combining
    * aggregates; each output is ONE division of exact longs, round6,
    * NULL-pinned when N₁ = 0 (closed vocabulary — mirrored CASE).
    *
    * Scale shape: one (source, token) count, one source aggregate over
    * the vocabulary-sized frame; nothing corpus-sized shuffles twice.
    */
  def x274GoodTuring(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tc = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    tc.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum((col("c") === 1).cast("long")).as("n1"),
        sum((col("c") === 2).cast("long")).as("n2"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n1"),
        col("n2"),
        stableRound6(col("n1").cast("double") / col("n_tokens").cast("double"))
          .as("p_unseen"),
        when(col("n1") > 0, stableRound6(
          lit(2.0) * col("n2").cast("double") / col("n1").cast("double")))
          .as("r_star_1"))
      .orderBy("source")
  }

  /** x275 — DUPLICATION BY LENGTH QUARTILE (round-11): do long documents
    * duplicate more? Exact-set duplicate rate (the x269 fingerprint:
    * md5 of sorted distinct tokens) per doc-length quartile, with the
    * quartile from the EXACT global rank — quartile = ⌈4r/n⌉, r from
    * [[graft.operators.RangeRank]] (SIXTH declared consumer). The
    * dedup-policy calibration ("trim the long tail first?") that neither
    * x68 (per source) nor x238 (per component) answers.
    *
    * Exactness: quartile is pure integer arithmetic on the exact rank;
    * dup = fingerprint multiplicity > 1 (exact counts); one division per
    * quartile, round6.
    *
    * Scale shape: RangeRank for the quartile, one fingerprint count
    * aggregate joined back (AQE-sized — fingerprint multiplicities are
    * corpus-bounded), one 4-row finale.
    */
  def x275DupByLength(spark: SparkSession, sfDir: String): DataFrame = x275Pin.swapStaged {
    import ExtendedQueries.stableRound6
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(
          split(col("text"), " "))), " ")).as("fp"),
        col("n_chars").cast("long").as("x"))
      .withColumn("g", lit(1))
    val ranking = graft.operators.RangeRank.rankWithinOwned(
      d, "g", Seq("x", "doc_id"), "r")
    val mult = d.groupBy("fp").agg(count(lit(1)).as("m"))
    val out = ranking.df.crossJoin(broadcast(
        d.agg(count(lit(1)).as("n"))))
      .withColumn("quartile", expr("(4 * r + n - 1) div n"))
      .join(mult, Seq("fp"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("m") > 1).cast("long")).as("n_dup"),
        min("x").as("min_len"), max("x").as("max_len"))
      .select(col("quartile"), col("n_docs"), col("n_dup"),
        col("min_len"), col("max_len"),
        stableRound6(col("n_dup").cast("double") / col("n_docs").cast("double"))
          .as("dup_rate"))
      .orderBy("quartile")
    (out, () => ranking.release())
  }

  private val x275Pin = new graft.core.PinnedResult

  /** x276 — WEIGHTED (multiset) JACCARD between source token profiles
    * (round-11): for every source pair, J_w = Σ_w min(c_a, c_b) /
    * Σ_w max(c_a, c_b) over per-source token COUNTS — the bag-similarity
    * member of the dedup/similarity family: x20's set Jaccard says two
    * profiles share words, weighted Jaccard says they share the same
    * DISTRIBUTION of them (Ioffe 2010's exact target; the corpus-level
    * "is source B a re-crawl of A at different volume?" screen).
    *
    * Exactness: Σmin over SHARED tokens via one token equi-join;
    * Σmax = N_a + N_b − Σmin (identity — absent tokens contribute their
    * full count to max). All exact longs; one division, round6.
    *
    * Output contract (advice r11): EVERY source pair is reported — pairs
    * sharing no token LEFT-join the pair spine and carry wjaccard = 0
    * with zero shared_types/sum_min, so a consumer of the re-crawl screen
    * can never misread an absent row as not-evaluated. (The fixture has
    * all pairs sharing tokens, so the spine is a no-op there.)
    *
    * Scale shape: one (source, token) map-combining aggregate; the token
    * self-join's per-key fan-out is bounded by |sources|² per token, never
    * docs (the x269 collapse argument); the spine is |sources|²-sized
    * arithmetic off the broadcast totals; finale is |sources|²-sized.
    */
  def x276WeightedJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val grp = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = grp.groupBy("source").agg(sum("c").as("n"))
    val spine = tot.as("ta").join(broadcast(tot.as("tb")),
        col("ta.source") < col("tb.source"))
      .select(col("ta.source").as("source_a"), col("tb.source").as("source_b"),
        col("ta.n").as("na"), col("tb.n").as("nb"))
    val shared = grp.as("a").join(grp.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_types"),
        sum(least(col("a.c"), col("b.c"))).as("sum_min"))
    spine.join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("shared_types"), lit(0L)).as("shared_types"),
        coalesce(col("sum_min"), lit(0L)).as("sum_min"),
        col("na"), col("nb"),
        stableRound6(coalesce(col("sum_min"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("sum_min"), lit(0L)))
            .cast("double"))
          .as("wjaccard"))
      .orderBy("source_a", "source_b")
  }

  /** x277 — TRIANGLE CENSUS of the term co-occurrence graph (round-11):
    * nodes = the 50 highest-document-frequency tokens, edges = pairs
    * co-occurring in ≥1 document, and the exact triangle count, wedge
    * count (paths of length 2) and global clustering coefficient
    * C = 3·triangles/wedges — the transitivity meter of the collocation
    * graph (x267 scores edges, x259 scores degree mixing; this scores
    * CLOSURE — a topical corpus closes its triangles, a random one has
    * C near edge density).
    *
    * Exactness: pure integer counting — top-50 by (df desc, token) is a
    * total order; wedges = Σ d(d−1)/2 exact longs; ONE division, round6,
    * NULL-pinned when wedges = 0 (mirrored CASE).
    *
    * Scale shape: one distinct (doc, token) aggregate, a broadcast
    * 50-row vocabulary gate, per-doc pair fan-out capped at C(50,2) by
    * the gate, then joins over the ≤1225-row edge list — constant-sized
    * regardless of corpus (the vocabulary gate IS the scale design).
    * The edge list is PINNED and forced (advice r11): five downstream
    * subtrees consume it (degree union ×2, 3-way triangle join ×3, edge
    * count), and without the pin each could recompute the corpus scan +
    * gated self-join; ownership follows the x275 swap pattern.
    */
  def x277TriangleCensus(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val dt = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(array_distinct(
        split(col("text"), " "))).as("w"))
    val top = dt.groupBy("w").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(50)
    val gated = dt.join(broadcast(top.select("w")), Seq("w"))
    val edges = x277Pin.swap(gated.as("a").join(gated.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .select(col("a.w").as("u"), col("b.w").as("v")).distinct())
    val deg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val wed = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .agg(count(lit(1)).as("n_triangles"))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(wed)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0, stableRound6(
          lit(3.0) * col("n_triangles").cast("double") /
            col("n_wedges").cast("double"))).as("transitivity"))
  }

  private val x277Pin = new graft.core.PinnedResult

  /** x278 — AMS F₂ SKETCH vs exact second moment (round-11): 16 sign-hash
    * estimators Z_j = Σ_w s_j(w)·c_w with s_j(w) = ±1 from the parity of
    * md5(j:w)'s first hex digit (the Alon–Matias–Szegedy 1996 estimator —
    * E[Z²] = F₂ = Σ c_w², the self-join/skew size the shuffle planner
    * needs), next to the exact F₂ and the sketch's relative error — the
    * streaming-sketch family's F₂ member (x12b HLL does F₀, x136 CMS does
    * point counts).
    *
    * Exactness: Z_j and F₂ are exact longs (|Z| ≤ Σc ~ 10⁷ at sf0.1,
    * F₂ ≤ (Σc)² — decimal guard documented past ~3·10⁹ tokens); the mean
    * estimate is one div-16 of an exact sum and the relative error one
    * division, both round6. md5-parity signs are byte-identical in both
    * engines (the x272 portability pattern).
    *
    * Scale shape: one vocabulary-sized count aggregate, a 16× vocabulary
    * explode collapsing immediately to 16 partial sums (map-combining;
    * the exact F₂ rides the same aggregate), one 1-row cross. The corpus
    * is scanned once and the vocab frame consumed once.
    */
  def x278AmsF2(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val cnt = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // F2 rides the SAME estimator aggregate (sum(c^2) is identical in
    // every j-group), so the vocab frame is consumed once — no second
    // corpus scan/count pass for the exact moment
    val est = cnt.select(col("w"), col("c"),
        explode(sequence(lit(0), lit(15))).as("j"))
      .select(col("j"), col("c"), (when(expr(
        "conv(substring(md5(concat(cast(j as string), ':', w)), 1, 1), 16, 10)")
        .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)) * col("c")).as("t"))
      .groupBy("j").agg(sum("t").as("z"),
        sum(col("c") * col("c")).as("f2_exact"))
      .select(col("j").cast("long").as("j"), col("z"),
        (col("z") * col("z")).as("est"), col("f2_exact"))
    val mean = est.agg(sum("est").as("se"))
    est.crossJoin(broadcast(mean))
      .select(col("j"), col("z"), col("est"), col("f2_exact"),
        stableRound6(col("se").cast("double") / 16.0).as("f2_est_mean"),
        stableRound6(abs(col("se").cast("double") / 16.0 -
          col("f2_exact").cast("double")) / col("f2_exact").cast("double"))
          .as("rel_err"))
      .orderBy("j")
  }

  /** x279 — FLESCH READING EASE per source (round-11): the classic
    * readability screen 206.835 − 1.015·(words/doc) − 84.6·(syllables/
    * word) computed at SOURCE granularity — the quality-filter-bank
    * member (x16/x178's family) that lexical stats miss: two sources with
    * equal length and stopword profiles can still differ in syllable
    * density, the strongest single predictor in readability research
    * (Flesch 1948; Kincaid 1975). The fixture corpus has no sentence
    * punctuation, so each document is one sentence — words/sentence IS
    * words/doc (documented; real corpora would split on terminators).
    *
    * Syllables ≈ vowel GROUPS per word ([aeiouy]+ runs, min 1/word) — the
    * standard dictionary-free approximation, computed per row inside the
    * scan with higher-order array functions (no explode, no shuffle).
    *
    * Exactness: word and syllable totals are exact longs; the two ratios
    * and the final score are one float sequence from exact longs, round6.
    *
    * Scale shape: per-row regex + array fold in the scan, one
    * map-combining source aggregate — |sources| rows shuffle, nothing else.
    */
  def x279FleschSource(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("nw"),
        expr("""aggregate(transform(split(text, ' '),
          w -> greatest(1, size(regexp_extract_all(w, '[aeiouy]+', 0)))),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("ny"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_words"),
        sum("ny").as("n_syllables"))
      .select(col("source"), col("n_docs"), col("n_words"), col("n_syllables"),
        stableRound6(col("n_words").cast("double") /
          col("n_docs").cast("double")).as("words_per_doc"),
        stableRound6(col("n_syllables").cast("double") /
          col("n_words").cast("double")).as("syllables_per_word"),
        stableRound6(lit(206.835) -
          lit(1.015) * col("n_words").cast("double") / col("n_docs").cast("double") -
          lit(84.6) * col("n_syllables").cast("double") / col("n_words").cast("double"))
          .as("flesch"))
      .orderBy("source")
  }

  /** x283 — SYSTEMATIC SAMPLE on a hashed frame (round-11): every 25th
    * document in (md5(doc_id), doc_id) order — the equal-interval design
    * survey statistics prefers over Bernoulli when downstream wants an
    * EXACTLY ⌈n/25⌉-sized, evenly-spread panel (x30's hash sample gets
    * binomial size jitter; reservoir x133 needs a single pass holder).
    * Hash-ordering first makes the frame pseudo-random, so the systematic
    * grid can't alias any periodicity in doc_id assignment.
    *
    * The global order rides [[graft.operators.RangeRank]] (SEVENTH
    * declared consumer): rank parallelism stays decoupled from the single
    * ordering key — no one-task window at any corpus size.
    *
    * Exactness: selection is pure integer arithmetic on the exact rank
    * ((r−1) mod 25 = 0); md5 hex strings order identically in both
    * engines (ASCII lexicographic).
    *
    * Scale shape: one RangeRank pass + a per-row modulo filter; output is
    * n/25-sized, materialized before the sort pin releases (x275's
    * ownership pattern).
    */
  def x283SystematicSample(spark: SparkSession, sfDir: String): DataFrame = x283Pin.swapStaged {
    val d = Io.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("g", lit(1))
    val ranking = graft.operators.RangeRank.rankWithinOwned(
      d, "g", Seq("h", "doc_id"), "r")
    val out = ranking.df
      .filter(pmod(col("r") - 1, lit(25L)) === 0)
      .select(col("r"), col("doc_id"), col("source"), col("h"))
      .orderBy("r")
    (out, () => ranking.release())
  }

  private val x283Pin = new graft.core.PinnedResult

  /** x286 — FLEISS' KAPPA across three weak quality raters (round-11):
    * chance-corrected agreement of the length rule (n_chars ≥ 120), the
    * token rule (≥ 24 tokens) and the language rule (lang = 'en') as
    * THREE raters of one binary category — the multi-rater generalization
    * of x266's pairwise Cohen κ (Fleiss 1971): a filter BANK's rules can
    * pairwise-agree yet collectively split the corpus; Fleiss prices the
    * bank as a whole before a 100 TB sweep.
    *
    * Exactness: with n = 3 raters and 2 categories, every quantity is
    * integer — per-doc agreement numerator a² + (3−a)² − 3 (always even),
    * P̄ = ΣP/(6N), pe = (T₁² + T₀²)/(9N²), and κ collapses to ONE
    * division of exact longs: (3N·ΣP − 2·peNum)/(18N² − 2·peNum)
    * (18N² ≤ 6.5·10¹³ at sf0.1; decimal guard documented past ~7·10⁸
    * docs). pe = 1 pins κ NULL (mirrored CASE).
    *
    * Scale shape: one scan, one 1-row map-combining aggregate.
    */
  def x286FleissKappa(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull &&
        col("lang").isNotNull)
      .select(((col("n_chars") >= 120).cast("long") +
        (size(split(col("text"), " ")) >= 24).cast("long") +
        (col("lang") === "en").cast("long")).as("a"))
      .select(col("a"),
        (col("a") * col("a") + (lit(3L) - col("a")) * (lit(3L) - col("a")) -
          lit(3L)).as("p"))
    val m = d.agg(count(lit(1)).as("n"), sum("a").as("tp"), sum("p").as("sp"))
    val peNum = col("tp") * col("tp") +
      (lit(3L) * col("n") - col("tp")) * (lit(3L) * col("n") - col("tp"))
    val den = lit(18L) * col("n") * col("n") - lit(2L) * peNum
    m.select(col("n").as("n_docs"), col("tp").as("n_pass_ratings"),
      stableRound6(col("sp").cast("double") /
        (lit(6L) * col("n")).cast("double")).as("p_bar"),
      stableRound6(peNum.cast("double") /
        (lit(9L) * col("n") * col("n")).cast("double")).as("p_e"),
      when(den =!= 0, stableRound6(
        (lit(3L) * col("n") * col("sp") - lit(2L) * peNum).cast("double") /
          den.cast("double"))).as("kappa"))
  }

  /** x287 — DEDUP SAVINGS LADDER (round-11): per source, the token mass
    * kept at each rung of the standard dedup escalation — raw → exact-text
    * dedup (md5 of the text) → exact-SET dedup (x269's order-insensitive
    * fingerprint) — and the fractional savings of each rung. The
    * economics view the per-method queries (x10 exact, x13 near) don't
    * give: how many 100 TB-scale tokens each POLICY actually buys,
    * per source, before committing a pipeline to it.
    *
    * Exactness: canonical doc per (source, fp) is min_by(nt, doc_id)
    * (deterministic — doc_id unique); all masses exact longs; two
    * divisions per source, round6.
    *
    * Scale shape: two (source, fp) map-combining aggregates (one per
    * rung) + one source-level join of three |sources|-row frames.
    */
  def x287DedupSavings(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val d = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"), md5(col("text")).as("fpx"),
        md5(array_join(array_sort(array_distinct(
          split(col("text"), " "))), " ")).as("fps"),
        size(split(col("text"), " ")).cast("long").as("nt"))
    val raw = d.groupBy("source").agg(sum("nt").as("raw_tokens"))
    val ex = d.groupBy("source", "fpx").agg(expr("min_by(nt, doc_id)").as("u"))
      .groupBy("source").agg(sum("u").as("exact_kept"))
    val st = d.groupBy("source", "fps").agg(expr("min_by(nt, doc_id)").as("u"))
      .groupBy("source").agg(sum("u").as("set_kept"))
    raw.join(ex, Seq("source")).join(st, Seq("source"))
      .select(col("source"), col("raw_tokens"), col("exact_kept"),
        col("set_kept"),
        stableRound6((col("raw_tokens") - col("exact_kept")).cast("double") /
          col("raw_tokens").cast("double")).as("save_exact"),
        stableRound6((col("raw_tokens") - col("set_kept")).cast("double") /
          col("raw_tokens").cast("double")).as("save_set"))
      .orderBy("source")
  }

  /** x288 — TEMPERATURE SWEEP of the mix design (round-11): source
    * weights and effective sample size at τ ∈ {0.25, 0.5, 0.75, 1.0} —
    * the design-space sweep x265 evaluates at ONE point: picking the
    * sampling temperature IS the diversity-vs-efficiency dial of a
    * training mix (τ = 1 keeps natural proportions and all of the corpus;
    * τ → 0 equalizes sources and resamples small ones hard), and this
    * prices all four candidates in one pass.
    *
    * Exactness: n^τ = exp(τ·ln n) EXPLICITLY in both engines (x273's
    * n^⅓ rule — pow's rounding is unpinned cross-engine), then x265's
    * full rounding chain per τ: round6 → DECIMAL sum → round6 weights →
    * round9 ESS contributions → DECIMAL sums → two final divisions,
    * NULL-pinned when the contribution sum quantizes to 0.
    *
    * Scale shape: ONE map-combining source count, then pure arithmetic
    * on a 4×|sources|-row frame (the τ spine is a 4-row literal cross,
    * allow-listed).
    */
  def x288TempSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.{stableRound, stableRound6}
    val per = Io.table(spark, sfDir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
    val taus = spark.range(1).select(explode(array(
      lit(0.25), lit(0.5), lit(0.75), lit(1.0))).as("tau"))
    val r = per.crossJoin(broadcast(taus))
      .withColumn("r6", stableRound6(
        exp(col("tau") * log(col("n").cast("double")))).cast("decimal(18,6)"))
    val s = r.groupBy("tau").agg(sum("r6").cast("decimal(28,6)").as("s"),
      sum("n").as("nt"))
    val w = r.join(broadcast(s), Seq("tau"))
      .withColumn("w6", stableRound6(col("r6").cast("double") /
        col("s").cast("double")).cast("decimal(18,6)"))
      .withColumn("c9", stableRound(col("w6").cast("double") *
        col("w6").cast("double") / col("n").cast("double"), 9)
        .cast("decimal(18,9)"))
    val g = w.groupBy("tau").agg(sum("w6").cast("decimal(28,6)").as("sw"),
      sum("c9").cast("decimal(28,9)").as("sc"))
    val ess = col("sw").cast("double") * col("sw").cast("double") /
      col("sc").cast("double")
    w.join(broadcast(g), Seq("tau"))
      .select(col("tau"), col("source"), col("n").as("n_docs"),
        col("w6").cast("double").as("weight"),
        when(col("sc") =!= 0, stableRound6(ess)).as("ess"),
        when(col("sc") =!= 0,
          stableRound6(ess / col("nt").cast("double"))).as("ess_ratio"))
      .orderBy("tau", "source")
  }

  /** 8×64 Johnson–Lindenstrauss sign matrix for [[x289JlDistortion]]:
    * signs[(k−1)·64 + d] = parity of md5("k:d")'s first hex digit,
    * generated OFFLINE and embedded as a literal so both engines read
    * the IDENTICAL matrix with no runtime hashing. */
  private[queries] val JlSigns: String =
    "0000001001100111000010111101000011000101010110111011000010100101" +
    "1011101000010011001110011011100101100101111010101110000111111000" +
    "0110110000100110001001110101111000111010111110100011100000000100" +
    "0000001010100101110101011001101000101100111100110101010011011010" +
    "0000001011101100001010111010000100110101011010001011100011100101" +
    "0111000101110110100100110001010100011011110011000100100010001110" +
    "1101110100100010100100100001100110101011010001110101011111100101" +
    "1101010000000111101000101001010110100001000110011111100011100101"

  /** x289 — JOHNSON–LINDENSTRAUSS distortion audit (round-11): project
    * the first 16 embeddings from 64 → 8 dimensions with a fixed ±1 sign
    * matrix and measure, per vector pair, the squared-distance estimate
    * (Σ_k diff²/8) against the true d² — the JL lemma's promise
    * (Achlioptas 2003: database-friendly ±1 projections), measured on
    * THIS corpus before an ANN index (x21/x32/x49) commits to a width.
    *
    * Exactness: the sign matrix is a pre-generated literal (no runtime
    * hashing); per-pair sums ride the x11 oracle pattern (64-term double
    * sums, round6 — the parity precedent holding since round 2); the
    * 16-row pair spine is a broadcast theta-join (x215's shape).
    *
    * Scale shape: the probe-pair frame is CONSTANT (16 vectors → 120
    * pairs) regardless of corpus; the projection is per-row arithmetic
    * in the scan. At 100 TB the same audit runs on the same-sized probe.
    */
  def x289JlDistortion(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val base = Io.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding"),
        expr(s"""transform(sequence(1, 8), k -> aggregate(sequence(1, 64),
          cast(0.0 as double), (acc, d) -> acc +
          (case when substring('$JlSigns', (k - 1) * 64 + d, 1) = '1'
                then 1.0 else -1.0 end)
          * cast(element_at(embedding, d) as double)))""").as("y"))
    val pairs = base.as("a").join(base.as("b"),
      col("a.vec_id") < col("b.vec_id"))
    pairs.select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
        expr("""aggregate(sequence(1, 64), cast(0.0 as double), (acc, d) ->
          acc + (cast(element_at(a.embedding, d) as double)
                 - cast(element_at(b.embedding, d) as double))
              * (cast(element_at(a.embedding, d) as double)
                 - cast(element_at(b.embedding, d) as double)))""").as("d2o"),
        expr("""aggregate(sequence(1, 8), cast(0.0 as double), (acc, k) ->
          acc + (element_at(a.y, k) - element_at(b.y, k))
              * (element_at(a.y, k) - element_at(b.y, k)))""").as("d2p"))
      .select(col("ida"), col("idb"), stableRound6(col("d2o")).as("d2_orig"),
        stableRound6(col("d2p") / 8.0).as("d2_est"),
        when(col("d2o") =!= 0.0,
          stableRound6(col("d2p") / 8.0 / col("d2o"))).as("ratio"))
      .orderBy("ida", "idb")
  }

  /** x290 — GLOBAL weighted sample without replacement (round-11): the
    * top-20 documents corpus-WIDE under Efraimidis–Spirakis keys u^(1/w),
    * w = token count, u the md5-uniform of doc_id — the single-panel
    * complement of x133's PER-SOURCE A-ES reservoir (x133 ranks ln(u)/w
    * per key through the TopKPerKey operator; u^(1/w) is the same total
    * order, and a GLOBAL panel needs no per-key machinery at all): ES
    * keys make it a plain corpus top-k — exactly the
    * TakeOrderedAndProject shape, no shuffle, no per-key state.
    *
    * Exactness: u = (h32 + 1)/2³² from md5's first 8 hex digits (exact
    * dyadic double, never 0); the key is exp(ln(u)/w) EXPLICITLY (pow
    * parity unpinned — x273's rule); both engines compute the identical
    * double chain, so the top-20 SET and the round6 keys both match.
    *
    * Scale shape: per-row arithmetic in the scan +
    * TakeOrderedAndProject(20) — no shuffle at all beyond the top-k's
    * partial reduction.
    */
  def x290EsSample(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("w"),
        ((expr("conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)")
          .cast("long") + 1L).cast("double") / lit(4294967296.0)).as("u"))
      .withColumn("k", exp(log(col("u")) / col("w").cast("double")))
      .orderBy(col("k").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("source"), col("w"),
        stableRound6(col("u")).as("u"), stableRound6(col("k")).as("es_key"))
  }

  /** x291 — KENDALL τ-b of each source's token profile vs the corpus
    * (round-11): over the top-100 corpus tokens (zero-filled grid), the
    * concordant/discordant pair census between the source's counts and
    * the corpus counts, and τ-b with tie corrections — the RANK-agreement
    * member of the profile-similarity family: x276's weighted Jaccard
    * measures shared MASS, x285's KL measures surprise, τ-b asks "does
    * the source ORDER its vocabulary like the corpus?", robust to any
    * monotone frequency distortion.
    *
    * Exactness: all pair counts are exact longs over the 100-token grid
    * (n₀ = 4950 pairs per source); τ-b = (C−D)/√((n₀−tx)(n₀−ty)) is one
    * sqrt + one division from exact longs, round6, NULL-pinned when a
    * side is all-ties (mirrored CASE).
    *
    * Scale shape: the 100-token vocabulary gate bounds EVERYTHING — the
    * zero-filled grid is |sources|×100, the pair frame |sources|×4950 —
    * regardless of corpus size (x277's gate argument); one corpus-sized
    * token count feeds it.
    */
  def x291KendallTau(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    // ONE corpus scan: global counts and the source list re-aggregate the
    // vocab-sized per-source frame (the x285 rule — ReusedExchange dedupes
    // the identical (source, w) subtrees, no cache pin needed)
    val per = tok.groupBy("source", "w").agg(count(lit(1)).as("cy"))
    val glob = per.groupBy("w").agg(sum("cy").as("cx"))
    val top = glob.orderBy(col("cx").desc, col("w")).limit(100)
    val grid = per.select("source").distinct()
      .crossJoin(broadcast(top))
      .join(per, Seq("source", "w"), "left")
      .select(col("source"), col("w"), col("cx"),
        coalesce(col("cy"), lit(0L)).as("cy"))
    val pairs = grid.as("a").join(grid.as("b"),
        col("a.source") === col("b.source") && col("a.w") < col("b.w"))
      .select(col("a.source").as("source"),
        ((col("a.cx") - col("b.cx")) * (col("a.cy") - col("b.cy"))).as("prod"),
        (col("a.cx") === col("b.cx")).cast("long").as("tx"),
        (col("a.cy") === col("b.cy")).cast("long").as("ty"))
    val out = pairs.groupBy("source")
      .agg(count(lit(1)).as("n0"),
        sum((col("prod") > 0).cast("long")).as("c"),
        sum((col("prod") < 0).cast("long")).as("d"),
        sum("tx").as("tx"), sum("ty").as("ty"))
      .select(col("source"), col("n0"), col("c"), col("d"), col("tx"),
        col("ty"),
        when((col("n0") - col("tx")) * (col("n0") - col("ty")) > 0,
          stableRound6((col("c") - col("d")).cast("double") /
            sqrt(((col("n0") - col("tx")) * (col("n0") - col("ty")))
              .cast("double")))).as("tau_b"))
      .orderBy("source")
    out
  }

  /** x292 — CALIBRATION AUDIT of the x213 logistic quality gate
    * (round-11): reliability diagram (per-decile confidence vs realized
    * accuracy against the length rule as ground truth) plus the Expected
    * Calibration Error — the applied-ML audit that decides whether x213's
    * scores can be THRESHOLDED at face value or must be recalibrated
    * before gating a 100 TB corpus (Guo et al. 2017's ECE).
    *
    * Exactness: rides x213's own integer quantization p6 =
    * ⌊p·10⁶ + 0.5⌋ — per-bucket confidence Σp6/(n·10⁶) and accuracy
    * hits/n are divisions of exact longs, and ECE collapses to ONE
    * division: Σ_b |hits_b·10⁶ − Σp6_b| / (10⁶·N), ALL integer until the
    * edge (no float sums anywhere).
    *
    * Scale shape: x213's per-doc score arithmetic in the scan, one
    * 10-row bucket aggregate, a 1-row ECE cross (allow-listed).
    */
  def x292CalibrationEce(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val docs = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
    val st = docs.select(col("doc_id"), col("n_chars"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("token").isin(LlmQueries.Stopwords: _*).cast("long"))
          .as("n_stop"),
        min("n_chars").as("n_chars"))
    val alpha = docs.select(col("doc_id"),
      length(expr("replace(text, ' ', '')")).as("n_alpha"))
    val nTok = col("n_tokens").cast("double")
    val z = lit(-1.5) + lit(0.4) * log(nTok + lit(1.0)) -
      lit(2.5) * (col("n_stop").cast("double") / nTok) +
      lit(0.05) * least(col("n_alpha").cast("double") / nTok, lit(10.0))
    val scored = st.join(alpha, "doc_id")
      .select((col("n_chars") >= 120).cast("long").as("hit"),
        floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1000000 + 0.5)
          .cast("long").as("p6"))
    val buckets = scored
      .groupBy(least(expr("p6 div 100000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("p6").as("sp6"),
        sum("hit").as("hits"))
    val ece = buckets.agg(sum(abs(col("hits") * lit(1000000L) - col("sp6")))
        .as("eceNum"), sum("n_docs").as("nn"))
    buckets.crossJoin(broadcast(ece))
      .select(col("bin"), col("n_docs"),
        stableRound6(col("sp6").cast("double") /
          (col("n_docs") * lit(1000000L)).cast("double")).as("confidence"),
        stableRound6(col("hits").cast("double") / col("n_docs").cast("double"))
          .as("accuracy"),
        stableRound6(col("eceNum").cast("double") /
          (lit(1000000L) * col("nn")).cast("double")).as("ece"))
      .orderBy("bin")
  }

  /** x293 — GREEDY k-CENTER CORESET, k = 4 (round-11): farthest-point
    * traversal over the embedding table seeded at vec_id 0 — the
    * 2-approximation (Gonzalez 1985) behind diversity-aware data
    * selection: each step adds the vector FARTHEST from the chosen set,
    * and the selected radius is the covering radius of the previous set.
    * The selection counterpart of the sampling family (x30/x133/x290
    * sample by chance or weight; this samples by COVERAGE).
    *
    * The 3 argmax steps are 1-row driver decisions (x260's driver-metric
    * class: k is a constant of the DESIGN, not the data). Distances ride
    * the deterministic per-row 64-term fold; the argmax tie-break is
    * (d² desc, vec_id) on engine-identical doubles.
    *
    * Scale shape: per step, one broadcast of ≤k centers into the scan +
    * one min-reduce per row + one TakeOrdered(1) — corpus scanned k−1
    * times, nothing shuffles but top-1 partials.
    */
  def x293KCenter(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val spark2 = spark
    import spark2.implicits._
    val emb = Io.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    var centers = Vector(0L)
    val rows = scala.collection.mutable.Buffer[(Long, Long, Option[Double])](
      (1L, 0L, None))
    for (step <- 2 to 4) {
      val c = emb.filter(col("vec_id").isin(centers: _*))
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val far = emb.crossJoin(broadcast(c))
        .select(col("vec_id"), expr(
          """aggregate(sequence(1, 64), cast(0.0 as double), (acc, d) ->
            acc + (cast(element_at(embedding, d) as double)
                   - cast(element_at(ce, d) as double))
                * (cast(element_at(embedding, d) as double)
                   - cast(element_at(ce, d) as double)))""").as("d2"))
        .groupBy("vec_id").agg(min("d2").as("dmin"))
        .orderBy(col("dmin").desc, col("vec_id")).limit(1).head()
      centers :+= far.getLong(0)
      rows += ((step.toLong, far.getLong(0), Some(far.getDouble(1))))
    }
    rows.toSeq.toDF("step", "center_id", "radius2raw")
      .select(col("step"), col("center_id"),
        stableRound6(col("radius2raw")).as("radius2"))
      .orderBy("step")
  }

  /** x294 — WINNOWING fingerprints (round-11): MOSS's guarantee-bearing
    * fingerprint selection (Schleimer, Wilkerson & Aiken 2003) — per
    * document, the DISTINCT minima of every w=4-window over the 3-gram
    * shingle hash sequence — and the realized fingerprint density per
    * source against the theoretical 2/(w+1). The selection-based member
    * of the fingerprint family: x17 hashes everything, x13 samples by
    * minhash; winnowing GUARANTEES every match of length ≥ w+2 tokens
    * shares a fingerprint, at a provable density.
    *
    * Exactness: hashes are md5 hex strings (same total order both
    * engines); window minima via the standard ROWS frame; per-doc density
    * is one division, round6'd then DECIMAL-summed for the source mean
    * (x101 discipline).
    *
    * Scale shape: the window partitions by doc_id — corpus-cardinality
    * keys, embarrassingly parallel (nothing like x220's low-cardinality
    * ceiling); one (doc) distinct-count + one source aggregate after.
    */
  def x294Winnowing(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    import org.apache.spark.sql.expressions.Window
    val docs = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 6) // m = n-2 shingles; one full w=4 window needs m >= 4
    val sh = docs.select(col("doc_id"), col("source"),
        (size(col("toks")) - 2).cast("long").as("m"),
        posexplode(expr(
          """transform(sequence(1, size(toks) - 2),
            i -> md5(concat_ws(' ', element_at(toks, i),
                 element_at(toks, i + 1), element_at(toks, i + 2))))""")))
      .select(col("doc_id"), col("source"), col("m"),
        (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
    val w = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, 3)
    val fp = sh.withColumn("mh", min("h").over(w))
      .filter(col("p") <= col("m") - 3)
      .groupBy("doc_id", "source", "m")
      .agg(countDistinct("mh").as("nfp"))
    fp.select(col("source"), col("m"), col("nfp"),
        stableRound6(col("nfp").cast("double") / col("m").cast("double"))
          .cast("decimal(18,6)").as("dens6"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nfp").as("n_fingerprints"),
        sum("m").as("n_shingles"),
        sum("dens6").cast("decimal(28,6)").as("sd"))
      .select(col("source"), col("n_docs"), col("n_fingerprints"),
        col("n_shingles"),
        stableRound6(col("sd").cast("double") / col("n_docs").cast("double"))
          .as("mean_density"),
        lit(0.4).as("theoretical_density"))
      .orderBy("source")
  }

  /** x295 — PORTABLE HYPERLOGLOG, 16 registers (round-11): the Flajolet
    * et al. 2007 estimator built from md5 — bucket = the 32-bit hash's
    * low hex digit, register = 1 + leading zeros of the top 28 bits,
    * E = α₁₆·16²/Σ2^(−M_j), with the small-range linear-counting
    * correction — next to the native-but-unoracled x12b
    * (approx_count_distinct) and the KMV alternative (x241): THIS one's
    * registers are bit-reproducible in DuckDB, so the whole sketch is
    * hash-pinned, not rows-only.
    *
    * Exactness: leading zeros via hex-string arithmetic (regexp '^0*'
    * prefix + a 4-way CASE on the first significant digit — no float
    * log2 anywhere); 2^(−M) values are exact dyadic doubles whose 16-term
    * sum is EXACT (mantissa spread ≤ 29 bits); one division (+ one ln in
    * the linear-counting branch), round6.
    *
    * Scale shape: one vocabulary-sized distinct + a 16-row register
    * aggregate; the corpus is scanned once.
    */
  def x295Hll16(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .select(col("w"), md5(col("w")).as("h"))
      .select(col("w"),
        expr("conv(substring(h, 8, 1), 16, 10)").cast("long").as("j"),
        substring(col("h"), 1, 7).as("p7"))
      .select(col("w"), col("j"),
        (length(regexp_extract(col("p7"), "^0*", 0)) * 4 +
          when(col("p7") === "0000000", lit(0)) // all-zero payload: rank caps at 29
            .otherwise(expr("""CASE
              WHEN substring(regexp_replace(p7, '^0*', ''), 1, 1)
                   IN ('8','9','a','b','c','d','e','f') THEN 0
              WHEN substring(regexp_replace(p7, '^0*', ''), 1, 1)
                   IN ('4','5','6','7') THEN 1
              WHEN substring(regexp_replace(p7, '^0*', ''), 1, 1)
                   IN ('2','3') THEN 2 ELSE 3 END""")) + 1).as("rank"))
    val regs = tok.groupBy("j").agg(max("rank").as("m"))
    // all 16 registers exist only if every bucket is hit: left-join a
    // 0..15 spine so empty buckets carry register 0 (2^0 = 1 in the sum)
    val spine = spark.range(16).select(col("id").as("j"))
    val full = spine.join(regs, Seq("j"), "left")
      .select(coalesce(col("m"), lit(0)).as("m"))
    // 2^(−M) as 1/(1<<M): the shift is exact integer, the division an
    // exact dyadic double — no libm pow in the register sum
    val s = full.agg(sum(expr(
        "1.0 / cast(shiftleft(cast(1 as bigint), m) as double)")).as("den"),
      sum((col("m") === 0).cast("long")).as("v"))
    val exact = tok.agg(count(lit(1)).as("n_exact"))
    val eRaw = lit(0.673) * lit(256.0) / col("den")
    val est = when(eRaw <= lit(40.0) && col("v") > 0,
      lit(16.0) * log(lit(16.0) / col("v").cast("double"))).otherwise(eRaw)
    s.crossJoin(broadcast(exact))
      .select(col("n_exact"), col("v").as("empty_registers"),
        stableRound6(eRaw).as("e_raw"),
        stableRound6(est).as("estimate"),
        stableRound6(abs(est - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_err"))
  }

  /** x296 — L-DIVERSITY audit (round-11): for the quasi-identifier
    * blocks (nationkey, mktsegment), the distinct-count of the sensitive
    * attribute (account-balance thousand-bucket) per block, histogrammed
    * by l — the missing half of the privacy pair: x217's k-anonymity
    * counts block SIZES (re-identification), l-diversity counts sensitive
    * VARIETY (attribute disclosure — a k-anonymous block whose members
    * all share one balance band still leaks it; Machanavajjhala 2007).
    *
    * Exactness: pure integer counting — buckets are truncating integer
    * division (mirrored div//), l is a distinct count, the histogram is a
    * count of counts; the one ratio (share of blocks at each l) is a
    * division of exact longs, round6.
    *
    * Scale shape: one (QI, bucket) distinct aggregate, one QI-block
    * aggregate, one |l-values|-row histogram + a 1-row total cross.
    */
  def x296LDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val c = Io.table(spark, sfDir, "customer")
      .filter(col("c_acctbal").isNotNull && col("c_mktsegment").isNotNull)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("cast(floor(c_acctbal) as bigint) div 1000").as("sens"))
    val l = c.distinct()
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("l"))
    val hist = l.groupBy("l").agg(count(lit(1)).as("n_blocks"))
    val tot = hist.agg(sum("n_blocks").as("nb"))
    hist.crossJoin(broadcast(tot))
      .select(col("l"), col("n_blocks"),
        stableRound6(col("n_blocks").cast("double") / col("nb").cast("double"))
          .as("share"))
      .orderBy("l")
  }

  /** x297 — WASSERSTEIN-1 length drift vs the corpus (round-11): per
    * source, the earth-mover distance W₁ = Σ_x |F_s(x) − F(x)|·gap
    * between the source's doc-length CDF and the corpus's — the
    * MAGNITUDE-bearing drift metric the sup-norm tests can't give (x126's
    * KS says "distributions differ", W₁ says "by how many characters") —
    * the standard drift number for retraining triggers.
    *
    * Exactness: both CDFs are exact rational steps over the DISTINCT
    * length grid (cumulative sums over value-cardinality frames); each
    * grid term |cumS/nS − cum/N|·gap is one float chain from exact longs,
    * round6'd to DECIMAL and summed exactly (x101 discipline).
    *
    * Scale shape: one (source, length) aggregate; cumulative sums window
    * over the VALUE grid per source (value-cardinality rows, partitioned
    * by source — x202's machinery), never the corpus; |sources| rows out.
    */
  def x297Wasserstein(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    import org.apache.spark.sql.expressions.Window
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("n_chars").isNotNull)
      .select(col("source"), col("n_chars").cast("long").as("x"))
    // per-source counts on the SHARED distinct-length grid (zero-filled
    // via the source × grid cross so every CDF steps on every grid point)
    val grid = d.groupBy("x").agg(count(lit(1)).as("c"))
    val per = d.groupBy("source", "x").agg(count(lit(1)).as("cs"))
    val full = d.select("source").distinct().crossJoin(broadcast(grid))
      .join(per, Seq("source", "x"), "left")
      .select(col("source"), col("x"), col("c"),
        coalesce(col("cs"), lit(0L)).as("cs"))
    val w = Window.partitionBy("source").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = d.groupBy("source").agg(count(lit(1)).as("ns"))
    val n = d.agg(count(lit(1)).as("nn"))
    val steps = full
      .withColumn("cum", sum("c").over(w))
      .withColumn("cums", sum("cs").over(w))
      .withColumn("gap", lead("x", 1).over(
        Window.partitionBy("source").orderBy("x")) - col("x"))
      .filter(col("gap").isNotNull)
      .join(broadcast(tot), Seq("source")).crossJoin(broadcast(n))
      .select(col("source"),
        stableRound6(abs(col("cums").cast("double") / col("ns").cast("double") -
          col("cum").cast("double") / col("nn").cast("double")) *
          col("gap").cast("double")).cast("decimal(18,6)").as("t6"))
    steps.groupBy("source")
      .agg(sum("t6").cast("decimal(28,6)").as("sw"))
      .join(broadcast(tot), Seq("source"))
      .select(col("source"), col("ns").as("n_docs"),
        col("sw").cast("double").as("w1_chars"))
      .orderBy("source")
  }

  /** x298 — DUP-CLUSTER SOURCE PURITY (round-11): of the exact-set
    * fingerprint clusters with ≥2 documents, how many live entirely
    * inside one source vs span sources — with doc mass and the
    * mean dominant-source share — the cluster-granular view of x269's
    * pair matrix: single-source clusters are crawl-internal churn (cheap
    * to dedup at ingest), cross-source clusters are syndication (need
    * the global pass), and the split decides WHERE the dedup runs.
    *
    * Exactness: pure integer counting off one (fp, source) collapse;
    * purity = max source count / cluster size round6'd per cluster to
    * DECIMAL then summed exactly (x101); two exact-long ratios.
    *
    * Scale shape: docs collapse to (fp, source, count) FIRST (the x269
    * argument), then a fingerprint-level aggregate — per-key work is
    * bounded by |sources| per fingerprint, never docs.
    */
  def x298ClusterPurity(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val grp = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(md5(array_join(array_sort(array_distinct(
        split(col("text"), " "))), " ")).as("fp"), col("source"))
      .groupBy("fp", "source").agg(count(lit(1)).as("c"))
    val cl = grp.groupBy("fp")
      .agg(sum("c").as("m"), count(lit(1)).as("nsrc"), max("c").as("cmax"))
      .filter(col("m") >= 2)
      .select(col("m"), (col("nsrc") === 1).cast("long").as("single"),
        stableRound6(col("cmax").cast("double") / col("m").cast("double"))
          .cast("decimal(18,6)").as("pur6"))
    cl.agg(count(lit(1)).as("n_clusters"),
        sum("single").as("n_single_source"),
        (count(lit(1)) - sum("single")).as("n_cross_source"),
        sum("m").as("n_docs_clustered"),
        sum(when(col("single") === 1, col("m")).otherwise(0L))
          .as("docs_single"),
        sum("pur6").cast("decimal(28,6)").as("sp"))
      .select(col("n_clusters"), col("n_single_source"), col("n_cross_source"),
        col("n_docs_clustered"), col("docs_single"),
        when(col("n_clusters") > 0, stableRound6(
          (col("n_clusters") - col("n_single_source")).cast("double") /
            col("n_clusters").cast("double"))).as("cross_share"),
        when(col("n_clusters") > 0, stableRound6(
          col("sp").cast("double") / col("n_clusters").cast("double")))
          .as("mean_purity"))
  }

  /** x299 — INTER-ARRIVAL DISPERSION per event type (round-11): the
    * coefficient of variation of per-user SAME-TYPE consecutive gaps — the
    * Poisson-ness test of the arrival process (CV = 1 memoryless, < 1
    * regular/machine-like, > 1 bursty/sessionized), the upstream sibling
    * of x81's burst detection and x268's token burstiness: it decides
    * whether rate-based alerting (x161's throttle) can assume exponential
    * gaps at all.
    *
    * Exactness: gaps are exact epoch-µs longs from the per-user event_id
    * order (x99's rule — ns ts truncate identically, event_id is the
    * exact sequence); CV = √(n·Σg² − (Σg)²)/Σg is one sqrt + one division
    * from exact longs (Σg² ≲ 10³⁰ → DECIMAL(38,0) moments, x144's
    * class), round6, NULL at n < 2 or Σg = 0.
    *
    * Scale shape: ONE corpus-sized (user_id, event_type) exchange carries
    * the lead() window (user×type-cardinality partitions — the anti-x220
    * shape, x99's plan); the moment aggregate collapses to |types| rows
    * map-side.
    */
  def x299InterArrival(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    val gaps = Io.eventsRaw(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("t"))
      .withColumn("nt", lead("t", 1).over(seq))
      .filter(col("nt").isNotNull)
      .select(col("event_type"), (col("nt") - col("t")).as("g"))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("g").cast("decimal(19,0)")).as("sg"),
        sum((col("g").cast("decimal(19,0)") * col("g").cast("decimal(19,0)")))
          .as("sgg"))
      .select(col("event_type"), col("n"),
        stableRound6(col("sg").cast("double") / col("n").cast("double"))
          .as("mean_gap_us"),
        // CV = std/mean = sqrt(n*Sgg - Sg^2) / Sg (the n's cancel)
        when(col("n") >= 2 && col("sg") =!= 0, stableRound6(
          sqrt((col("n") * col("sgg") - col("sg") * col("sg")).cast("double")) /
            col("sg").cast("double"))).as("cv"))
      .orderBy("event_type")
  }

  /** x300 — CONSISTENT-HASH RING balance (round-11): token mass per
    * shard when 32 shards project 4 virtual nodes each onto an md5 ring
    * (Karger 1997; the Dynamo/Cassandra placement), at v = 4 and v = 1 —
    * completing x272's sharding bench: mod/hash sharding reshuffles
    * EVERYTHING when the shard count changes, the ring moves only 1/n of
    * the keys, and the vnode count is what buys back the balance the
    * ring loses. The CV/skew columns are x272's, directly comparable.
    *
    * Exactness: ring positions and key hashes are 32-bit ints from md5
    * hex (the x272 pattern); assignment is a pure integer ARRAY scan of
    * the sorted 128-point ring (first position ≥ key, wrap to ring[0]) —
    * no floats until the final CV/skew divisions (round6).
    *
    * Scale shape: the ring is a 1-row sorted-array aggregate broadcast
    * into the scan (128 comparisons per row); one 32-row aggregate per
    * vnode setting; empty shards enter the moments implicitly.
    */
  def x300HashRing(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val k = 32L
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(size(split(col("text"), " ")).cast("long").as("nt"),
        expr("""cast(conv(substring(md5(cast(doc_id as string)), 1, 8),
          16, 10) as bigint)""").as("h"))
    def audit(vnodes: Int): DataFrame = {
      val ring = spark.range(k).select(col("id").as("shard"),
          explode(sequence(lit(0), lit(vnodes - 1))).as("v"))
        .select(col("shard"), expr(
          """cast(conv(substring(md5(concat(cast(shard as string), ':',
            cast(v as string))), 1, 8), 16, 10) as bigint)""").as("pos"))
        .agg(array_sort(collect_list(struct(col("pos"), col("shard"))))
          .as("ring"))
      d.crossJoin(broadcast(ring))
        .select(col("nt"), coalesce(
          // try_element_at: ANSI element_at throws on the empty filter
          // result (key past the last ring point) instead of yielding null
          expr("try_element_at(filter(ring, x -> x.pos >= h), 1).shard"),
          expr("element_at(ring, 1).shard")).as("shard"))
        .groupBy("shard").agg(sum("nt").as("x"))
        .agg(sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
          max("x").as("mx"), count(lit(1)).as("nonempty"))
        .select(lit(s"ring_v$vnodes").as("strategy"), lit(k).as("n_shards"),
          col("nonempty").as("n_nonempty_shards"),
          col("sx").as("total_tokens"), col("mx").as("max_shard_tokens"),
          stableRound6(sqrt((lit(k) * col("sxx") - col("sx") * col("sx"))
            .cast("double") / (col("sx") * col("sx")).cast("double"))).as("cv"),
          stableRound6((lit(k) * col("mx")).cast("double") /
            col("sx").cast("double")).as("skew"))
    }
    audit(4).unionAll(audit(1)).orderBy("strategy")
  }

  /** x301 — ZIPF–MANDELBROT grid fit (round-11): fit f(r) = C/(r+β)^s
    * over the top-100 token frequencies for β ∈ {0..5}, s per β by OLS on
    * (ln(r+β), ln f), reporting slope, intercept and SSE with the best β
    * flagged — the Mandelbrot 1953 refinement x239's plain-Zipf slope
    * can't express: natural corpora flatten at the head, and β is the
    * flattening; the fitted (s, β) pair is the standard corpus-shape
    * fingerprint next to Heaps (x251) and Good–Turing (x274).
    *
    * Exactness: ranks are window row_numbers over the CONSTANT 100-row
    * top frame (x254's 101-row class — never the corpus); every ln term
    * is round6'd to DECIMAL and summed exactly (x101); the OLS closed
    * form and per-row residuals are float chains from those exact sums,
    * round6 at the edges; best-β is an integer argmin on the round6'd
    * SSE with β as tie-break.
    *
    * Scale shape: one vocabulary-sized count feeds a 100-row frame; the
    * 6-point β grid is a literal cross (allow-listed); everything after
    * the top-100 cut is constant-sized.
    */
  def x301ZipfMandelbrot(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    import org.apache.spark.sql.expressions.Window
    val top = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(100)
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("w"))).cast("long"))
    val betas = spark.range(1).select(explode(sequence(lit(0L), lit(5L)))
      .as("beta"))
    val pts = top.crossJoin(broadcast(betas))
      .select(col("beta"),
        stableRound6(log((col("r") + col("beta")).cast("double")))
          .cast("decimal(18,6)").as("x"),
        stableRound6(log(col("c").cast("double")))
          .cast("decimal(18,6)").as("y"))
    val m = pts.groupBy("beta").agg(count(lit(1)).as("n"),
      sum("x").cast("decimal(28,6)").as("sx"),
      sum("y").cast("decimal(28,6)").as("sy"),
      sum((col("x") * col("x")).cast("decimal(28,12)")).as("sxx"),
      sum((col("x") * col("y")).cast("decimal(28,12)")).as("sxy"))
    val nD = col("n").cast("double")
    val fit = m.select(col("beta"),
      ((nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (nD * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))).as("b"),
      col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
      col("n"))
      .select(col("beta"), col("b"),
        ((col("syd") - col("b") * col("sxd")) / col("n").cast("double"))
          .as("a"))
    val res = pts.join(broadcast(fit), Seq("beta"))
      .select(col("beta"), col("a"), col("b"),
        stableRound6((col("y").cast("double") - col("a") -
          col("b") * col("x").cast("double")) *
          (col("y").cast("double") - col("a") -
            col("b") * col("x").cast("double")))
          .cast("decimal(18,6)").as("e6"))
      .groupBy("beta", "a", "b")
      .agg(sum("e6").cast("decimal(28,6)").as("sse"))
    val best = res.orderBy(col("sse").asc, col("beta").asc).limit(1)
      .select(col("beta").as("best_beta"))
    res.crossJoin(broadcast(best))
      .select(col("beta"), stableRound6(-col("b")).as("s_exponent"),
        stableRound6(col("a")).as("intercept"),
        col("sse").cast("double").as("sse"),
        (col("beta") === col("best_beta")).as("is_best"))
      .orderBy("beta")
  }

  /** x302 — MARKOV STATIONARY DISTRIBUTION (round-11): π for x99's
    * user-journey transition matrix by 8 unrolled power-iteration steps
    * from the uniform start — the long-run state mix that x99's one-step
    * probabilities imply but don't show: where user time actually
    * accumulates (the equilibrium the funnel x74 and retention x75 curves
    * drift toward), and the weighting a journey-aware sampler would use.
    *
    * Exactness: the transition matrix is x99's exact counts with round6
    * probabilities; each iteration computes per-term products round6'd
    * to DECIMAL, sums them EXACTLY (x101 — a 5-term float sum would be
    * engine-order-dependent), and re-rounds the new π entry to 6 digits,
    * so both engines walk the IDENTICAL quantized orbit (quantization is
    * part of the declared semantics, documented). 8 iterations contract
    * any start to well under 10⁻⁶ of equilibrium for this matrix class.
    *
    * State space: from-types ∪ to-types, with an absorbing self-loop for
    * sink types (advice r11 — a from-only state set silently leaks sink
    * mass each step and π stops summing to 1; mirrored in the oracle).
    *
    * Scale shape: ONE corpus pass builds the |types|²-row matrix (x99's
    * plan). The matrix is METADATA-sized (event-type vocabulary squared
    * — tens of rows at any corpus size), so it is collected and the 8
    * quantized iterations run as EXACT driver-side decimal arithmetic
    * (the x260 driver-metric class): the first cut expressed the loop
    * as 8 chained joins over ≤|types|-row cached frames and paid ~16
    * dimension-sized shuffle stages for it — measured 4.3 s isolated at
    * sf0.1 after the sink rework vs ~0.5 s for this form, identical
    * output (the orbit arithmetic below replicates the engine chain
    * step for step: exact decimal product → double cast → round6 →
    * exact decimal sum → double cast → round6).
    */
  def x302MarkovStationary(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy("user_id").orderBy("event_id")
    val trans = Io.eventsRaw(spark, sfDir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("f"), col("to_type").as("t"))
      .agg(count(lit(1)).as("n"))
    val mat = trans
      .withColumn("p6", stableRound6(col("n") /
        sum("n").over(Window.partitionBy("f"))).cast("decimal(18,6)"))
      .select("f", "t", "p6")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDecimal(2)))
    def r6(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(math.floor(x * 1e6 + 0.5) / 1e6)
        .setScale(6)
    // state space = from ∪ to; sinks get the absorbing self-loop
    val fromSet = mat.map(_._1).toSet
    val states = (fromSet ++ mat.map(_._2)).toSeq.sorted
    val one = java.math.BigDecimal.ONE.setScale(6)
    val edges = mat.toSeq ++
      states.filterNot(fromSet).map(s => (s, s, one))
    // the uniform start, then 8 steps of the QUANTIZED orbit — each term
    // is round6((pi · p6).doubleValue) exactly as the decimal-product →
    // double-cast → round6 engine chain, summed exactly, re-rounded
    var pi: Map[String, java.math.BigDecimal] =
      states.map(_ -> r6(1.0 / states.size)).toMap
    for (_ <- 1 to 8) {
      pi = edges
        .flatMap { case (f, t, p6) =>
          pi.get(f).map(pf => t -> r6(pf.multiply(p6).doubleValue))
        }
        .groupBy(_._1)
        .map { case (t, ts) =>
          t -> r6(ts.map(_._2).reduce(_.add(_)).doubleValue)
        }
    }
    val spark2 = spark
    import spark2.implicits._
    pi.toSeq.map { case (s, p) => (s, p.doubleValue) }
      .sortBy(_._1)
      .toDF("event_type", "pi")
  }

  /** x303 — OOV RATE vs the top-1k corpus vocabulary, per source
    * (round-11): the token mass a frequency-capped vocabulary would send
    * to <unk>/byte-fallback, per source — THE per-source tokenizer-budget
    * number: x65 scores per-document coverage against a FIXED list, x245
    * prices fertility; this prices the VOCABULARY SIZE decision against
    * each source before a tokenizer is trained.
    *
    * Exactness: the top-1k cut is the (count desc, token) total order;
    * masses exact longs; one division per source, round6.
    *
    * Scale shape: one vocabulary-sized count, a broadcast 1k-token gate
    * LEFT-joined onto the per-source vocabulary frame (AQE-sized), one
    * |sources|-row finale. Corpus scanned once.
    */
  def x303OovRate(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val per = tok.groupBy("source", "w").agg(count(lit(1)).as("c"))
    val top = per.groupBy("w").agg(sum("c").as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(1000)
      .select(col("w"), lit(1).as("in_vocab"))
    per.join(broadcast(top), Seq("w"), "left")
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(0L)).as("n_oov"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov_types"))
      .select(col("source"), col("n_tokens"), col("n_oov"), col("n_oov_types"),
        stableRound6(col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
      .orderBy("source")
  }

  /** x304 — STOPWORD-PROFILE χ² homogeneity per source (round-11): for
    * each source, the χ² statistic of its 5-stopword count vector against
    * the corpus profile — the per-source register/style drift screen
    * (function-word profiles are the classic authorship/register signal;
    * Mosteller & Wallace 1964) that x193's single global independence
    * test and x215's pairwise JSD both bracket without answering "WHICH
    * source deviates, and by how much?".
    *
    * Exactness: with E_w = N_s·c_w/N rational, each χ² term is
    * (o_w·N − N_s·c_w)²/(N_s·c_w·N) — an exact-integer numerator over an
    * exact denominator, ONE division per term, round6 → DECIMAL sum
    * (x101). All four counts are cast to DECIMAL(38,0) BEFORE any
    * multiply (advice r11): long products o·N / N_s·c_w would wrap
    * silently in non-ANSI Spark (and raise in DuckDB) past ~9.2·10¹⁸,
    * i.e. ~3·10⁹ stopword tokens — a reachable corpus. With decimal
    * products the binding guard is the SQUARED numerator's 38-digit cap
    * (diff ≤ ~10¹⁹, corpora to ~10⁹·⁵ stopword tokens — documented).
    *
    * Scale shape: one corpus scan with a per-row stopword filter into a
    * (source, stopword) map-combining count, a 5-row profile broadcast,
    * |sources|×5 arithmetic. df = 4 constant.
    */
  def x304StopwordChi2(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w").isin(LlmQueries.Stopwords: _*))
    val per = tok.groupBy("source", "w").agg(count(lit(1)).as("o"))
    val prof = per.groupBy("w").agg(sum("o").as("cw"))
    val nTot = prof.agg(sum("cw").as("nn"))
    val ns = per.groupBy("source").agg(sum("o").as("nsw"))
    // zero-filled grid: a source missing a stopword still owes its E_w
    val grid = ns.crossJoin(broadcast(prof))
      .join(per, Seq("source", "w"), "left")
      .select(col("source"), col("nsw"), col("w"), col("cw"),
        coalesce(col("o"), lit(0L)).as("o"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val diff = dec(col("o")) * dec(col("nn")) - dec(col("nsw")) * dec(col("cw"))
    grid.crossJoin(broadcast(nTot))
      .select(col("source"), col("nsw"),
        stableRound6(
          (diff * diff).cast("double") /
          (dec(col("nsw")) * dec(col("cw"))).cast("double") /
          col("nn").cast("double"))
          .cast("decimal(18,6)").as("t6"))
      .groupBy("source")
      .agg(min("nsw").as("n_stopwords"),
        sum("t6").cast("decimal(28,6)").as("chi2d"))
      .select(col("source"), col("n_stopwords"),
        col("chi2d").cast("double").as("chi2"), lit(4L).as("df"))
      .orderBy("source")
  }

  /** x305 — CHARACTER COVERAGE for the tokenizer charset (round-11): the
    * minimal character set covering 99.95% of corpus character mass (the
    * SentencePiece `character_coverage` default) plus full-coverage size
    * and the mass of the dropped tail — THE alphabet-size decision a
    * byte/char tokenizer build makes first: every character outside the
    * set costs a byte-fallback (x303 prices the same cut at the token
    * level).
    *
    * Exactness: character counts exact longs; the cumulative walk runs
    * over the CHARACTER-cardinality frame (a window over ≤ alphabet
    * rows — never the corpus); the 99.95% threshold test is the integer
    * inequality 10000·cum ≥ 9995·N (no float ratio anywhere); one
    * division for the reported coverage, round6.
    *
    * Scale shape: one corpus scan exploding to characters with an
    * immediate map-combining count; everything after is alphabet-sized.
    */
  def x305CharCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    import org.apache.spark.sql.expressions.Window
    val chars = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(explode(split(regexp_replace(col("text"), " ", ""), ""))
        .as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("ch").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("ch"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = chars.agg(sum("c").as("nn"))
    val walk = chars.withColumn("cum", sum("c").over(w))
      .withColumn("rk", row_number().over(Window.orderBy(col("c").desc,
        col("ch"))).cast("long"))
      .crossJoin(broadcast(n))
    val cut = walk.filter(lit(10000L) * col("cum") >= lit(9995L) * col("nn"))
      .agg(min("rk").as("charset_size"))
    walk.agg(count(lit(1)).as("alphabet_size"), max("nn").as("n_chars"))
      .crossJoin(broadcast(cut))
      .join(walk.select(col("rk"), col("cum")),
        col("charset_size") === col("rk"))
      .select(col("alphabet_size"), col("n_chars"), col("charset_size"),
        stableRound6(col("cum").cast("double") / col("n_chars").cast("double"))
          .as("coverage"),
        (col("n_chars") - col("cum")).as("dropped_mass"))
  }

  /** x280 — FELLEGI–SUNTER record-linkage scores (round-11): for customer
    * pairs inside a (nationkey, mktsegment) block, the probabilistic
    * match weight Σ_i ln(m_i/u_i) over three field comparisons (balance
    * bucket, name suffix digit, negative-balance flag) — the
    * Fellegi–Sunter 1969 model behind every production entity-resolution
    * stack, completing the linkage family (x83 sorted-neighborhood and
    * x84 edit-gate find CANDIDATES; this SCORES them). Top-20 by weight.
    *
    * Exactness: the six log-weights are PRE-ROUNDED literal constants
    * (round6 of ln(m/u) computed offline and hardcoded identically in
    * both engines — no runtime ln at all), the score a DECIMAL(18,6) sum
    * of three literals; agreements are pure integer/string comparisons on
    * unit-floored balances.
    *
    * Scale shape: one self equi-join on the block key — pair fan-out
    * bounded by block size² per block (at 100 TB the block key gets
    * finer, the shape is unchanged); TakeOrderedAndProject(20).
    */
  def x280FellegiSunter(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Io.table(spark, sfDir, "customer")
      .filter(col("c_acctbal").isNotNull && col("c_mktsegment").isNotNull)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        expr("floor(c_acctbal) div 100").as("bb"),
        substring(col("c_name"), -1, 1).as("nd"),
        (col("c_acctbal") < 0).as("neg"))
    val w1a = lit(BigDecimal("2.890372"));  val w1d = lit(BigDecimal("-2.251292"))
    val w2a = lit(BigDecimal("2.140066"));  val w2d = lit(BigDecimal("-1.791759"))
    val w3a = lit(BigDecimal("0.641854"));  val w3d = lit(BigDecimal("-2.302585"))
    c.as("a").join(c.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_mktsegment") === col("b.c_mktsegment") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("custkey_a"),
        col("b.c_custkey").as("custkey_b"),
        (col("a.bb") === col("b.bb")).cast("int").as("agree_balance"),
        (col("a.nd") === col("b.nd")).cast("int").as("agree_name_digit"),
        (col("a.neg") === col("b.neg")).cast("int").as("agree_sign"))
      .withColumn("score",
        (when(col("agree_balance") === 1, w1a).otherwise(w1d) +
          when(col("agree_name_digit") === 1, w2a).otherwise(w2d) +
          when(col("agree_sign") === 1, w3a).otherwise(w3d))
          .cast("decimal(18,6)").cast("double"))
      .orderBy(col("score").desc, col("custkey_a"), col("custkey_b"))
      .limit(20)
  }

  /** x281 — DATA-CONSTRAINED SCALING value of repeats (round-11): per
    * source, the repeat-discounted effective token count when every
    * source is repeated up to the BIGGEST source's raw mass — Muennighoff
    * et al. 2023's decay law D'_eff = U·(1 + R*·(1−e^(−R/R*))) with
    * R* = 15, R = budget/U − 1 epochs of repetition over the
    * exact-deduplicated unique mass U (fingerprint = md5 of the sorted
    * distinct token set, x269's; the canonical doc per (source, fp) is
    * the min-doc_id one). The mix-assembly family's missing economics:
    * x54/x117 decide SHARES, this prices how much a share is still WORTH
    * once it must repeat to fill its slot.
    *
    * Exactness: U and raw N are exact longs; the float chain
    * B/U → −1 → /15 → exp → 1− → ·15 → +1 → ·U is written in the
    * IDENTICAL operation order in both engines (the x244 exp-parity
    * rule), round6 at the three output edges.
    *
    * Scale shape: per-doc fingerprint in the scan, one (source, fp)
    * min_by aggregate, one source aggregate, a 1-row max broadcast cross
    * (allow-listed) — nothing corpus-sized shuffles twice.
    */
  def x281DataConstrained(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val d = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"),
        md5(array_join(array_sort(array_distinct(
          split(col("text"), " "))), " ")).as("fp"),
        size(split(col("text"), " ")).cast("long").as("nt"))
    val per = d.groupBy("source", "fp")
      .agg(sum("nt").as("raw"), expr("min_by(nt, doc_id)").as("u1"))
      .groupBy("source")
      .agg(sum("raw").as("n_raw"), sum("u1").as("n_unique"))
    val budget = per.agg(max("n_raw").as("b"))
    per.crossJoin(broadcast(budget))
      .withColumn("r_epochs",
        col("b").cast("double") / col("n_unique").cast("double") - lit(1.0))
      .withColumn("deff", col("n_unique").cast("double") *
        (lit(1.0) + lit(15.0) *
          (lit(1.0) - exp(-(col("r_epochs") / lit(15.0))))))
      .select(col("source"), col("n_raw"), col("n_unique"), col("b").as("budget"),
        stableRound6(col("r_epochs")).as("repeat_epochs"),
        stableRound6(col("deff")).as("d_eff"),
        stableRound6(col("deff") / col("b").cast("double")).as("efficiency"))
      .orderBy("source")
  }

  /** x282 — BROWN–FORSYTHE variance homogeneity (round-11): does the
    * SPREAD of events.value differ across event types? The robust Levene
    * variant (deviations from the group MEDIAN, Brown & Forsythe 1974) —
    * the missing sibling of the location tests (x202/x206 ask "did the
    * center move?"; a drifting pipeline often widens BEFORE it shifts).
    *
    * Exactness: values unit-rounded to longs; group medians carried
    * DOUBLED (2·percentile(v,.5) = x_lo + x_hi exactly — x202's doubling
    * trick), so z = |2v − med2| is an exact long. The two sums of squares
    * use the x206 integer-div rule: Σ(S_j² div n_j) truncates < 1 per
    * group, error ≪ round6 at any real magnitude and IDENTICAL in both
    * engines. One float division at the edge, round6, NULL when the
    * within-group SS is 0.
    *
    * Scale shape: one map-combining (type, value) collapse feeds exact
    * medians over value-cardinality frames (the x97 trade: swaps for
    * approx at corpus scale), one corpus agg for the z-moments, finale
    * over k rows.
    */
  def x282BrownForsythe(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val obs = Io.eventsRaw(spark, sfDir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        floor(col("value") + lit(0.5)).cast("long").as("v"))
    val med = obs.groupBy("event_type")
      .agg((lit(2.0) * expr("percentile(v, 0.5)")).cast("long").as("med2"))
    val z = obs.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), abs(lit(2L) * col("v") - col("med2")).as("z"))
    val grp = z.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("z").as("s"),
        sum(col("z") * col("z")).as("q"))
    val tot = grp.agg(sum("n").as("nn"), sum("s").as("ss"), sum("q").as("qq"),
      sum(expr("(s * s) div n")).as("a"), count(lit(1)).as("k"))
    grp.join(broadcast(med), Seq("event_type")).crossJoin(broadcast(tot))
      .select(col("event_type"), col("n"), col("med2"),
        col("s").as("sum_dev2"),
        when(col("qq") - col("a") > 0, stableRound6(
          ((col("nn") - col("k")) * (col("a") - expr("(ss * ss) div nn")))
            .cast("double") /
            ((col("k") - 1) * (col("qq") - col("a"))).cast("double")))
          .as("f_stat"))
      .orderBy("event_type")
  }

  /** x284 — THEIL T INDEX of token-mass inequality (round-11): per
    * source, T = (1/n)·Σ_d (x_d/μ)·ln(x_d/μ) over per-document token
    * counts — the entropy-based inequality index whose decomposability
    * made it the econometrics standard (Theil 1967), here measuring how
    * unevenly a source's token budget concentrates in its longest
    * documents (0 = uniform; ln n = one doc holds everything). Completes
    * the concentration family: x218's Gini is rank-based, Theil is
    * information-based and SUMS across sub-populations.
    *
    * Exactness: x_d·n/N is an exact-long ratio per doc; one double
    * division + ln + multiply per doc (IEEE-deterministic given exact
    * inputs), each term round6'd to DECIMAL then summed exactly (the
    * x101 per-term discipline), final /n + round6 at the edge.
    *
    * Scale shape: per-row arithmetic against a broadcast |sources|-row
    * totals frame, one map-combining source aggregate — corpus scanned
    * once, |sources| rows shuffle.
    */
  def x284TheilIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val d = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("x"))
    val tot = d.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("x").as("nt"))
    d.join(broadcast(tot), Seq("source"))
      .withColumn("ratio",
        (col("x") * col("n")).cast("double") / col("nt").cast("double"))
      .withColumn("t6",
        stableRound6(col("ratio") * log(col("ratio"))).cast("decimal(18,6)"))
      .groupBy("source")
      .agg(min("n").as("n_docs"), min("nt").as("n_tokens"),
        sum("t6").cast("decimal(28,6)").as("st"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        stableRound6(col("st").cast("double") / col("n_docs").cast("double"))
          .as("theil"))
      .orderBy("source")
  }

  /** x285 — PER-SOURCE CROSS-ENTROPY under the corpus unigram LM
    * (round-11): H(s, corpus) = Σ_w (c_sw/N_s)·ln(N/c_w) and the KL
    * divergence KL(s ‖ corpus) = Σ_w (c_sw/N_s)·ln((c_sw·N)/(N_s·c_w)) —
    * the single-number "how surprising is source s to a corpus-trained
    * model" that DSIR-style importance weighting (x124) applies per doc
    * and JSD (x215) symmetrizes per pair; cross-entropy against the
    * corpus LM is the quantity that actually prices a source's tokens in
    * a training mix. The shared corpus entropy H(corpus) rides along.
    *
    * Exactness: every ln argument is a ratio of exact longs (ONE double
    * division, then ln — the x244 parity rule); each per-token term is
    * round6'd to DECIMAL(18,6), multiplied by the exact long c_sw
    * (decimal×long is exact), summed as decimals (x101 discipline); the
    * final /N_s is one float division, round6.
    *
    * Scale shape: ONE corpus scan/explode into the (source, token)
    * aggregate (pinned); the global counts RE-AGGREGATE that vocab-sized
    * frame instead of re-reading the corpus; a vocab-sized equi-join
    * (AQE broadcasts while it fits), source-sized finale, two 1-row
    * crosses.
    */
  def x285SourceXent(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    // ONE corpus scan: the global counts re-aggregate the vocab-sized
    // per-source frame instead of re-reading (and re-exploding) the
    // corpus; the identical (source, w) exchange subtrees dedupe via
    // ReusedExchange within the one execution (PlanSpec-asserted), so no
    // cache pin is needed
    val per = tok.groupBy("source", "w").agg(count(lit(1)).as("csw"))
    val glob = per.groupBy("w").agg(sum("csw").as("cw"))
    val nTot = glob.agg(sum("cw").as("nn"))
    val ns = per.groupBy("source").agg(sum("csw").as("nsrc"))
    val terms = per.join(glob, Seq("w"))
      .join(broadcast(ns), Seq("source")).crossJoin(broadcast(nTot))
      .select(col("source"), col("nsrc"), col("csw"), col("cw"), col("nn"),
        (col("csw") * stableRound6(log(col("nn").cast("double") /
          col("cw").cast("double"))).cast("decimal(18,6)")).as("tx"),
        (col("csw") * stableRound6(log((col("csw") * col("nn")).cast("double") /
          (col("nsrc") * col("cw")).cast("double"))).cast("decimal(18,6)"))
          .as("tk"))
    val hCorp = glob.crossJoin(broadcast(nTot))
      .select((col("cw") * stableRound6(log(col("nn").cast("double") /
        col("cw").cast("double"))).cast("decimal(18,6)")).as("t"), col("nn"))
      .groupBy("nn").agg(sum("t").cast("decimal(38,6)").as("sh"))
      .select(stableRound6(col("sh").cast("double") / col("nn").cast("double"))
        .as("h_corpus"))
    val out = terms.groupBy("source")
      .agg(min("nsrc").as("n_tokens"),
        sum("tx").cast("decimal(38,6)").as("sx"),
        sum("tk").cast("decimal(38,6)").as("sk"))
      .crossJoin(broadcast(hCorp))
      .select(col("source"), col("n_tokens"),
        stableRound6(col("sx").cast("double") / col("n_tokens").cast("double"))
          .as("xent"),
        stableRound6(col("sk").cast("double") / col("n_tokens").cast("double"))
          .as("kl"),
        col("h_corpus"))
      .orderBy("source")
    out
  }
}
