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
    val bands = LlmQueries.bandBuckets(raw) // bandBuckets fans out itself
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
    val ranking = graft.operators.RangeRank.rankWithinOwned(
      d, "g", Seq("x", "doc_id"), "r")
    val n = d.agg(count(lit(1)).as("n"))
    val spine = spark.range(1).crossJoin(broadcast(n))
      .select(explode(array(
        struct(lit("q1").as("ql"), expr("(n + 3) div 4").as("t")),
        struct(lit("q3").as("ql"), expr("(3 * n + 3) div 4").as("t")))).as("q"),
        col("n"))
      .select(col("q.ql").as("ql"), col("q.t").as("t"), col("n"))
    val width = ranking.df.join(broadcast(spine), col("r") === col("t"))
      .groupBy("n")
      .agg(min(when(col("ql") === "q1", col("x"))).as("q1"),
        min(when(col("ql") === "q3", col("x"))).as("q3"))
      .select(col("n"), col("q1"), col("q3"),
        greatest(lit(1L), floor(stableRound6(
          lit(2.0) * (col("q3") - col("q1")).cast("double") /
            exp(log(col("n").cast("double")) / lit(3.0))) + lit(0.5))
          .cast("long")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    width.count()
    ranking.release()
    val prev = x273Pinned.getAndSet(width)
    if (prev != null && (prev ne width)) prev.unpersist(false)
    d.crossJoin(broadcast(width))
      .withColumn("bin", expr("x div h"))
      .groupBy("bin", "h", "q1", "q3")
      .agg(count(lit(1)).as("n_docs"))
      .select(col("bin"), (col("bin") * col("h")).as("bin_lo"),
        ((col("bin") + 1) * col("h")).as("bin_hi"), col("h").as("bin_width"),
        col("q1"), col("q3"), col("n_docs"))
      .orderBy("bin")
  }

  private val x273Pinned =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

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
  def x275DupByLength(spark: SparkSession, sfDir: String): DataFrame = {
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    ranking.release()
    val prev = x275Pinned.getAndSet(out)
    if (prev != null && (prev ne out)) prev.unpersist(false)
    out
  }

  private val x275Pinned =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

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
    * Scale shape: one (source, token) map-combining aggregate; the token
    * self-join's per-key fan-out is bounded by |sources|² per token, never
    * docs (the x269 collapse argument); finale is |sources|²-sized.
    */
  def x276WeightedJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val grp = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = grp.groupBy("source").agg(sum("c").as("n"))
    grp.as("a").join(grp.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_types"),
        sum(least(col("a.c"), col("b.c"))).as("sum_min"))
      .join(broadcast(tot.select(col("source").as("source_a"),
        col("n").as("na"))), Seq("source_a"))
      .join(broadcast(tot.select(col("source").as("source_b"),
        col("n").as("nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared_types"),
        col("sum_min"), col("na"), col("nb"),
        stableRound6(col("sum_min").cast("double") /
          (col("na") + col("nb") - col("sum_min")).cast("double"))
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
    val edges = gated.as("a").join(gated.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .select(col("a.w").as("u"), col("b.w").as("v")).distinct()
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
    * explode collapsing immediately to 16 partial sums (map-combining),
    * two 1-row crosses. The corpus is scanned once.
    */
  def x278AmsF2(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val cnt = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val est = cnt.select(col("w"), col("c"),
        explode(sequence(lit(0), lit(15))).as("j"))
      .select(col("j"), (when(expr(
        "conv(substring(md5(concat(cast(j as string), ':', w)), 1, 1), 16, 10)")
        .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)) * col("c")).as("t"))
      .groupBy("j").agg(sum("t").as("z"))
      .select(col("j").cast("long").as("j"), col("z"),
        (col("z") * col("z")).as("est"))
    val f2 = cnt.agg(sum(col("c") * col("c")).as("f2_exact"))
    val mean = est.agg(sum("est").as("se"))
    est.crossJoin(broadcast(f2)).crossJoin(broadcast(mean))
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
  def x283SystematicSample(spark: SparkSession, sfDir: String): DataFrame = {
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    ranking.release()
    val prev = x283Pinned.getAndSet(out)
    if (prev != null && (prev ne out)) prev.unpersist(false)
    out
  }

  private val x283Pinned =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

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
    * Scale shape: two vocabulary-sized map-combining aggregates, a
    * vocab-sized equi-join (AQE broadcasts while it fits), source-sized
    * finale plus two 1-row crosses. Corpus scanned once.
    */
  def x285SourceXent(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val glob = tok.groupBy("w").agg(count(lit(1)).as("cw"))
    val nTot = glob.agg(sum("cw").as("nn"))
    val per = tok.groupBy("source", "w").agg(count(lit(1)).as("csw"))
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
    terms.groupBy("source")
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
  }
}
