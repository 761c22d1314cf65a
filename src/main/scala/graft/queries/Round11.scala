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
}
