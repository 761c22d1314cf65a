package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape regression guards: the scale properties that make these
  * queries survive a 100× scale-up are asserted against the physical plan,
  * so a refactor that silently loses a pushdown or a broadcast fails CI.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("r4: not-null filter reaches the parquet scan; projection pruned to 2 columns") {
    val p = plan("r4_group_avg")
    assert(p.contains("PushedFilters: [IsNotNull(event_type)]"))
    assert(p.contains("ReadSchema: struct<event_type:string,value:double>"))
    assert(p.contains("partial_sum"), "aggregate must be two-phase (map-side partial)")
  }

  test("x1: both dimension joins broadcast — fact side never shuffles") {
    val p = plan("x1_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("x3: anti join planned as broadcast/shuffle anti, with status filter pushed") {
    val p = plan("x3_join_anti")
    assert(p.contains("LeftAnti"))
    assert(p.contains("EqualTo(o_orderstatus,P)"), "status filter must reach the scan")
  }

  test("r6/x9: top-k plans as TakeOrderedAndProject, not a full global sort") {
    assert(plan("r6_topk").contains("TakeOrderedAndProject"))
    assert(plan("x9_text_tokens").contains("TakeOrderedAndProject"))
  }

  test("x11: native float_dot expression in the plan (no higher-order zip_with)") {
    val p = plan("x11_cosine_topk")
    assert(p.contains("float_dot"))
    assert(!p.contains("zip_with"))
  }

  test("x21: bucket pruning join is a broadcast of the 1-row query side") {
    val p = plan("x21_ann_bucketed")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("x22: as-of join is one window pass — no inequality (NestedLoop/Cartesian) join") {
    val p = plan("x22_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("r2: the whole DQ profile is a single aggregation job") {
    val p = plan("r2_dq_profile")
    // one partial+final agg pair over one scan — no join, no second scan
    assert("FileScan parquet".r.findAllIn(p).size <= 1)
  }

  test("x28: one corpus shuffle on bucket, no self-join, top-1 pushed into WindowGroupLimit") {
    val p = plan("x28_cosine_neardup")
    assert("FileScan parquet".r.findAllIn(p).size == 1, "pair matrix must not rescan the corpus")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"), "NN argmax should prune below the window")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"))
  }

  test("x29: range join runs as an equi-join on (custkey, band), never a nested loop") {
    val p = plan("x29_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the join node itself must list BOTH keys — custkey/band merely
    // appearing somewhere in the plan would not prove the equi-key shape
    assert("""(?s)(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[custkey#\d+L?, band#\d+L?\]"""
      .r.findFirstIn(p).isDefined,
      s"join keys must be (custkey, band), got:\n$p")
  }

  test("x49: PQ scan is one map-combining agg into top-k; no sort-merge anywhere") {
    val p = plan("x49_pq_ann")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must not be a global sort")
    assert(p.contains("partial_min"), "code assignment agg must combine map-side")
    assert(!p.contains("SortMergeJoin"), "codebook/rerank sides are broadcast-sized")
  }

  test("x50: tf-idf top-3 capped by WindowGroupLimit; term counts combine map-side") {
    val p = plan("x50_tfidf_terms")
    assert(p.contains("WindowGroupLimit"), "rnk<=3 must prune below the window")
    // The idf join is deliberately unhinted (a forced broadcast of a real
    // vocabulary OOMs the driver) — assert the join ON TERM exists and let
    // stats/AQE pick its strategy per run, rather than pinning broadcast.
    assert("""(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[term#"""
      .r.findFirstIn(p).isDefined, "idf side must equi-join back on term")
    assert(p.contains("partial_count"), "term counts must combine map-side")
  }

  test("x51: threshold side joins back as a broadcast, never a sort-merge") {
    val p = plan("x51_adaptive_gate")
    assert(p.contains("BroadcastHashJoin"), "5-row per-lang threshold must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("x52: both k-means aggregates combine map-side; no sort-merge join") {
    val p = plan("x52_kmeans_step")
    assert(p.contains("partial_max"), "argmax assignment must partial-aggregate")
    assert(p.contains("partial_sum"), "centroid mean must partial-aggregate")
    assert(!p.contains("SortMergeJoin"), "codebook side is an 8-row broadcast")
  }

  test("x30: hash sampling is scan-only — no shuffle except the output sort") {
    val p = plan("x30_hash_sample")
    assert("Exchange".r.findAllIn(p).size == 1, "only the final rangepartitioning sort")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string>"))
  }

  test("x31: rank window sits above the bigram aggregate, capped by WindowGroupLimit") {
    val p = plan("x31_bigram_stats")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("partial_count"), "bigram counts must combine map-side")
  }

  test("x32: IVF probe joins are all broadcast — the corpus side never sort-merges") {
    val p = plan("x32_ivf_ann")
    assert(!p.contains("SortMergeJoin"),
      "codebook/probe/query sides are tiny broadcasts; a sort-merge means a planning regression")
    assert(p.contains("TakeOrderedAndProject"), "top-5 must not be a global sort")
  }

  test("whole declared set: no CartesianProduct; nested-loop joins only where a tiny side is broadcast") {
    // queries that intentionally crossJoin a broadcast ≤32-row side (query
    // vector / codebook / PQ lookup table): BroadcastNestedLoopJoin over a
    // handful of rows is the right physical plan there, and only there
    // (x50's is a 1-row corpus-size constant joined onto the vocab frame)
    // x54's is the 1-row data-dependent k; x56's is the query BATCH
    // (N/50 rows of embedding+norm) broadcasting into the brute-force
    // kNN scorer — intended in both
    // x59/x59b's is the ≤32-row SemDeDup codebook broadcasting into the
    // assignment scan (x52's shape); x63's is the 1-row corpus-size
    // constant onto the vocabulary frame (x50's shape)
    // x85's are the ≤10-row bin-margin and 1-row total frames crossing
    // onto the ≤|sources|-row grid; x87's is the 1-row vocabulary-size
    // constant onto the bigram frame (x50's shape)
    // x102's is the 3-row busy-window side under the overlap inequality;
    // x105's is x11's 1-row query vector on the brute-force truth side
    // x111's are the 1-row n_docs constant onto the term frame (x50's
    // shape) and x11's 1-row query vector onto the cosine scan
    // x112's is the 1-row dimension min/max frame broadcasting into the
    // range normalization (x50's shape)
    // x117's is the 1-row denominator/total frame crossing onto the
    // ≤|sources|-row weight frame (x50's shape); x119's mix stage reuses
    // x117's exact denominator cross (shared rule, same 1-row side)
    val broadcastCrossOk = Set("x11_cosine_topk", "x32_ivf_ann", "x49_pq_ann",
      "x50_tfidf_terms", "x52_kmeans_step", "x54_domain_rebalance",
      "x56_knn_classify", "x56b_knn_ann", "x59_semdedup", "x59b_semdedup_wide",
      "x63_rarity_score", "x85_source_drift", "x87_bigram_lm",
    // x124's is the 1-row T/R totals frame crossing onto the 128-row
    // bucket table (x117's 1-row denominator shape)
    // x126's are the |sources|-row totals frame crossing onto the distinct-
    // length frame (building the CDF step grid) and the 1-row corpus total
    // x132's is the 1-row vocabulary-size constant crossing onto the
    // observed-bigram model frame (x87's shape); x140 embeds x111's
    // retrievers wholesale, inheriting exactly x111's 1-row crosses
    // x150's is x56's anchor batch (10 rows of embedding+norm)
    // broadcasting into the brute-force cosine scan
    // x155's is the 1-row exact-quartile bounds frame crossing onto the
    // scored corpus (x117's 1-row denominator shape — the threshold
    // assignment that replaces a global ntile window)
    // x180's is the 1-row sampled-boundary array broadcasting into the
    // full-column bucket scan (x112's 1-row min/max shape)
    // x186's is the 1-row Σn²/n_keys totals frame crossing onto the
    // 10-row top-contributor frame (x117's 1-row denominator shape)
    // x206/x207/x208's are the 1-row global-stats frame crossing onto the
    // k-group / day-cardinality table (x117's 1-row denominator shape)
    // x211's are the 4-row threshold spine theta-joined (w >= t) onto the
    // support-gated backbone, and the backbone broadcast into its own
    // wedge/triangle joins — all broadcast-tiny by construction
    // x217's is the 4-row k-spine theta-joined (s < k) onto the QI-class
    // table plus the 1-row total cross (x117's shape)
    // x231's is the 1-row corpus-totals frame crossing onto the |flags|-row
    // per-flag aggregate (x117's 1-row denominator shape, both cached)
    // x215's is the |sources|² pair SPINE (self theta-join of the distinct
    // source list, ≤ 20 rows a side) that surfaces disjoint pairs as jsd=1
    // x242's is the 1-row global-moments frame crossing onto the
    // |sources|-row per-source moments (x206's 1-row global-stats shape)
    // x248's is the 64-row negative POOL broadcasting into the anchor
    // frame under the component-exclusion theta predicate — pool-bounded
    // per-anchor work is the point of the shared-pool design
    // x250's is the 1-row bigram-type total crossing onto the scoring
    // join (x50's 1-row corpus-size-constant shape)
    // x251's are the 1-row max(doc_id) frame crossing onto the shingle
    // stream / first-doc frame and the 1-row OLS moments onto the 5-row
    // prefix spine (x117's 1-row denominator shape)
    // x254's is the 1-row (x_{k+1}, m) frame crossing onto the 101-row
    // top frame; x255's is the 1-row corpus count onto the ranked stream
    // (x50's shape)
    // x257's are x11's 1-row query-vector crosses, once per truncation
    // width; x258's is the 1-row normalization sum onto the |sources|-row
    // frame (x117's 1-row denominator shape)
    // x263's is the 1-row corpus count crossing onto the 4-row quantile
    // spine; x264's is the 1-row max-timestamp cross (x50's shape)
    // x265's are the 1-row sqrt-weight denominator and the 1-row
    // (sw, sc) totals crossing onto the |sources|-row frame (x117's
    // 1-row denominator shape); x267's are the 1-row unigram/bigram
    // totals onto the gated bigram frame; x268's is the 1-row corpus
    // count onto the vocabulary-sized moment frame (x50's shape)
      "x102_interval_overlap", "x105_recall_audit", "x111_rrf_fusion",
      "x112_zorder_layout", "x117_mix_temperature", "x119_prep_v4",
      "x124_dsir_weights", "x126_ks_drift", "x132_perplexity_gate",
      "x140_retrieval_eval", "x150_hard_negatives", "x155_curriculum",
      "x180_range_balance", "x186_join_forecast",
      "x206_kruskal_wallis", "x207_cusum", "x208_acf",
      "x211_graph_backbone", "x215_jsd_sources", "x217_k_anonymity",
      "x231_cached_reuse", "x242_welch_ttest", "x248_negative_sampling",
      "x250_kneser_ney", "x251_heaps_law", "x254_hill_tail",
      "x255_hash_uniformity", "x257_matryoshka_recall", "x258_doremi_step",
      "x263_exact_quantiles", "x264_decay_volume", "x265_mix_ess",
      "x267_pmi_collocations", "x268_burstiness",
      // x273's are the 1-row corpus count onto the 2-rank spine and the
      // 1-row snapped-width frame onto the bin scan; x275's is the 1-row
      // corpus count onto the ranked stream (x263's shapes)
      "x273_fd_histogram", "x275_dup_by_length",
      // x276's is the |sources|² pair SPINE (self theta-join of the
      // broadcast per-source totals, ≤20 rows a side — x215's shape,
      // added r12 so disjoint pairs surface as wjaccard=0 rows)
      "x276_weighted_jaccard",
      // x277's are the 1-row wedge and triangle totals crossing onto the
      // 1-row edge count (all three ≤1-row aggregates of the ≤1225-row
      // edge list); x278's are the 1-row exact-F2 and 1-row estimator-sum
      // frames onto the 16-row estimator table (x117's denominator shape)
      // x281's is the 1-row max-budget frame onto the |sources|-row decay
      // frame; x282's is the 1-row pooled-moments frame onto the k-group
      // table (x206's 1-row global-stats shape); x285's are the 1-row
      // corpus-token total onto the vocab join and the 1-row corpus-
      // entropy frame onto the |sources|-row finale (x50's shape)
      "x277_triangle_census", "x278_ams_f2", "x281_data_constrained",
      "x282_brown_forsythe", "x285_source_xent",
      // x288's is the 4-row literal tau spine crossing onto the
      // |sources|-row count frame (x117's shape); x289's is the CONSTANT
      // 16-row probe-vector spine theta-joined to itself (x215's pair
      // spine — 120 pairs regardless of corpus)
      "x288_temp_sweep", "x289_jl_distortion",
      // x291's is the 100-row vocabulary gate crossing onto the
      // |sources|-row list to zero-fill the grid (x277's gate argument);
      // x292's is the 1-row ECE totals cross (x117's shape); x293's is
      // the ≤4-row center set broadcasting into the distance scan (x52's
      // codebook shape)
      "x291_kendall_tau", "x292_calibration_ece", "x293_kcenter",
      // x295's are the 1-row register-sum and exact-count crosses (x117's
      // shape); x296's is the 1-row block-total cross; x297's are the
      // value-bounded distinct-length grid crossing onto the source list
      // (x291's zero-fill shape) and the 1-row corpus count
      "x295_hll16", "x296_l_diversity", "x297_wasserstein",
      // x300's are the two 1-row sorted-ring arrays broadcasting into the
      // assignment scan (x112's 1-row boundary-array shape); x301's are
      // the 6-row literal beta spine and the 6-row fit/1-row best frames
      // crossing onto the constant 100-row top frame (x254's class)
      "x300_hash_ring", "x301_zipf_mandelbrot",
      // x304's are the 5-row stopword profile crossing onto the
      // |sources|-row totals (the x291 zero-fill shape) and the 1-row
      // corpus total; x305's are the 1-row corpus-mass and 1-row cut
      // frames onto the alphabet-sized walk (x254's constant class)
      "x304_stopword_chi2", "x305_char_coverage",
      // round-12 members, all x117's 1-row-denominator / x215's tiny-spine
      // classes: x309/x310's are the 1-row N (and MI total) crossing onto
      // the r×c cell grid; x311's are the 1-row (V, N) totals onto the
      // vocab rank / 10-row decile frames; x313's is the 1-row day count
      // onto the 7-row ACF; x315's is the buckets×sources zero-fill spine
      // + 1-row corpus total; x316's is the 1-row corpus total onto the
      // value grid; x317's are the 1-row τ / estimator-total / true-total
      // frames onto the 50-row sample; x319's are the three 1-row pair
      // totals crossing each other; x323's are the day-pair theta spine
      // (time-range-bounded, never corpus) + the 1-row S/n/ties/median
      // frames; x324's are the 1-row day-min / fit / moment frames onto
      // the day frame; x325's are the 1-row weight total and deficit onto
      // the |sources| frame; x326's is the 8-row x52 codebook
      // broadcasting into the assignment scan (x52's shape)
      "x309_cramers_v", "x310_mutual_information", "x311_vocab_lorenz",
      "x313_ljung_box", "x315_hist_distances", "x316_cliffs_delta",
      "x317_priority_sample", "x319_pair_completeness", "x323_mann_kendall",
      "x324_durbin_watson", "x325_neyman_allocation", "x326_silhouette",
      // x331's is the constant 7-row weekday spine + the 1-row total and
      // chi2 crosses (x117's shape); x335's are the three 1-row
      // key/bit/hit counts crossing each other (x319's shape); x332's is
      // the 1-row candidate-pair total onto the ≤11-bin histogram
      // (x117's shape)
      "x331_dow_seasonality", "x332_jaccard_sweep", "x335_bloom_fpr",
      // x337's is the 1-row class-totals frame onto the value grid
      // (x316's shape); x338's are the literal 3-row split spine + the
      // 1-row total/chi2 crosses; x339's is the 1-row corpus count onto
      // the ranked stream (x283's shape); x340's is the 1-row pair total
      // onto the ≤11-bin histogram; x341's is the |sources|-row smoothed
      // totals broadcasting into the bigram-vocabulary spine (the x304
      // zero-fill at bigram scale); x342's is the 1-row rank-sum/totals
      // cross
      "x337_gini_stump", "x338_srm_check", "x339_novelty_decay",
      "x340_edit_histogram", "x341_bigram_kl", "x342_auc_rank",
      // x344's is x342's 1-row rank-sum/totals cross with the dup label;
      // x346's is the 1-row vocab-totals frame onto the adjacency
      // aggregate (x117's shape)
      "x344_rank_biserial", "x346_front_coding",
      // x347's is the broadcast 50-word list crossing the |sources|-row
      // totals to zero-fill the grid (x291's gate shape)
      "x347_burrows_delta",
      // round-13 probe-broadcast scans: x350's is the 1-row coincidence
      // marginals cross; x352's are the 64-row bounds frame and the
      // ≤66-row probe set broadcasting into one corpus scan (the x11
      // brute-force-scorer shape); x354's are its three bounded kNN
      // rings (constant-size probe frames by construction)
      "x350_krippendorff_alpha", "x352_hopkins", "x354_lof",
      // x356's is the 1-row n_docs frame crossing onto the 3-row
      // epoch-pair overlap union (x117's 1-row denominator shape)
      "x356_epoch_shuffle")
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!broadcastCrossOk(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unintended BroadcastNestedLoopJoin")
    }
  }

  test("x185: the aggregate reaches the TSV source; only pre-aggregated rows cross the scan") {
    val p = plan("x185_dsv2_agg_pushdown")
    assert(p.contains("PushedAggregates: [COUNT(*), MIN(n_chars), MAX(n_chars), SUM(n_chars)]"),
      s"aggregates must push into the connector:\n$p")
    assert(p.contains("PushedGroupBy: [source]"), s"group-by must push:\n$p")
    // what crosses the boundary is the agg schema, not document rows
    assert(!p.contains("text#"), s"the scan must not materialize text:\n$p")
  }

  test("x186: forecast is one grouped count + TakeOrdered — no row-data join anywhere") {
    val p = plan("x186_join_forecast")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must not be a global sort")
    assert(p.contains("partial_count"), "per-key counts must combine map-side")
    assert(!p.contains("SortMergeJoin"),
      "the forecast must never join row data — that's the job it replaces")
  }

  test("x187: SQL UDFs are catalyst-inlined — no black-box UDF node in the plan") {
    val p = plan("x187_sql_udf")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"SQL-defined functions must inline, not wrap:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "the grouped profile must combine map-side")
  }

  test("x188: the SQL TVF inlines to a Generate — no per-row subquery, no join") {
    val p = plan("x188_sql_tvf")
    assert(p.contains("Generate explode"),
      s"the TVF body must plan as a Generator:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"LATERAL over a TVF must not become a join:\n$p")
  }

  test("x171: bucketed aggregation plans with zero hash Exchange") {
    val p = plan("x171_bucketed_agg")
    assert(p.contains("Bucketed: true"), "scan must read the bucketed table")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-user aggregate must be satisfied by the bucketed scan:\n$p")
  }

  test("x42: per-stratum top-k is WindowGroupLimit-capped, never a global sort") {
    val p = plan("x42_stratified_sample")
    assert(p.contains("WindowGroupLimit"),
      "rn<=3 must push into WindowGroupLimit so tasks keep only k candidates")
  }

  test("x54: two-phase literal k recovers WindowGroupLimit (verdict r12 #4)") {
    val p = plan("x54_domain_rebalance")
    assert(p.contains("WindowGroupLimit"),
      "rank cap must be a LITERAL so tasks buffer k candidates per source, " +
        "not full per-source sorts")
  }

  test("x41: both repetition aggregates combine map-side") {
    val p = plan("x41_repetition")
    assert(p.contains("partial_count"), "bigram counts must be two-phase")
    assert(p.contains("partial_max"), "per-doc top-bigram max must be two-phase")
  }

  test("x43: contamination check is an equi-join on the gram hash") {
    val p = plan("x43_contamination")
    assert(p.contains("[gh]") || p.contains("gh#"),
      s"join must key on the gram hash:\n$p")
    assert(!p.contains("SortMergeJoin") || p.contains("Exchange hashpartitioning(gh"),
      "the bench join must hash-distribute on gh, not resort to another key")
  }

  test("x44: frame window is one custkey shuffle, both frame aggs fused in a single Window") {
    val p = plan("x44_moving_avg")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      "moving avg must shuffle once on custkey")
    assert("Window \\[".r.findAllIn(p).size == 1,
      "sum and count over the same frame must fuse into one Window node")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double,o_orderdate"),
      "scan must prune to the four used columns")
  }

  test("x45: per-day pick is WindowGroupLimit-capped before its shuffle") {
    val p = plan("x45_gap_fill")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "top-1-per-(user,day) must run partially map-side, not ship all events")
  }

  test("x59: assignment pinned once — both pair sides and the output read the cache") {
    val p = plan("x59_semdedup")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      "pair sides + final select must read the pinned assignment, not re-run it")
    assert(p.contains("partial_max"), "argmax assignment must combine map-side")
  }

  test("x60: packing windows are per-stripe — exactly one hash shuffle, never a global sort") {
    val p = plan("x60_sequence_pack")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      "stripe window + bin agg must share the one stripe shuffle")
    assert(p.contains("hashpartitioning(stripe"),
      "cumsum window must partition by stripe (a global window = one reducer)")
  }

  test("x61: latest-event pick is a map-combining aggregate, not a window sort") {
    val p = plan("x61_merge_upsert")
    assert(p.contains("partial_max"), "max(struct(event_id, value)) must partial-aggregate")
    assert(p.contains("FullOuter"), "merge must plan as one full-outer join")
    assert(!p.contains("WindowGroupLimit") && !"Window \\[".r.findFirstIn(p).isDefined,
      "no per-user window sort — the sequence-number argmax is an agg")
  }

  test("x62: signature frame pinned once; candidate sides read the cache") {
    val p = plan("x62_minhash_estimate")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      "both pair sides must resolve against the pinned candidate subset")
  }

  test("x63: idf side joins back unhinted; term counts combine map-side") {
    val p = plan("x63_rarity_score")
    // Unhinted join, same reasoning as x50: strategy is stats/AQE's call,
    // but the equi-join on term itself is pinned.
    assert("""(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[term#"""
      .r.findFirstIn(p).isDefined, "idf side must equi-join back on term")
    assert(p.contains("partial_count"), "term counts must be two-phase")
  }

  test("x64: PII scrub is scan-only — per-row regexes, no shuffle except the output sort") {
    val p = plan("x64_pii_scrub")
    assert("Exchange".r.findAllIn(p).size == 1, "only the final rangepartitioning sort")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "projection must prune to the two consumed columns")
  }

  test("x65: vocab top-K is TakeOrderedAndProject; term counts combine map-side") {
    val p = plan("x65_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "global top-20 must be a distributed top-K, not a single-partition window")
    assert(p.contains("partial_count"), "term counts must be two-phase")
    assert(p.contains("BroadcastHashJoin"),
      "the 20-row vocab is a constant-size side — broadcast is legitimate here")
  }

  test("x66: per-group argmax is a map-combining aggregate, not a window sort") {
    val p = plan("x66_best_of_dupes")
    assert(p.contains("partial_max"), "max(struct) must partial-aggregate")
    assert(!p.contains("Window"), "no per-group sort window anywhere")
  }

  test("x67: pinned (hash, source) frame feeds all three consumers from the cache") {
    val p = plan("x67_source_overlap")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      "both self-join sides AND the per-source totals must read the pin, not rescan")
    assert(!p.contains("CartesianProduct"))
  }

  test("x68: hash multiplicity is a map-combining aggregate") {
    val p = plan("x68_dup_rate_source")
    assert(p.contains("partial_count"), "multiplicity agg must be two-phase")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      "projection must prune to the three consumed columns")
  }

  test("x69: the scrub stays per-row — v3 plans the same survivor pin shape as v2") {
    val p = plan("x69_prep_v3")
    assert(p.contains("InMemoryTableScan"),
      "exact/kept survivor frames must be pinned, as in x46")
    assert("WindowGroupLimit|partial_min".r.findFirstIn(p).isDefined,
      "minhash signature aggregate must partial-combine")
    assert(!p.contains("CartesianProduct"))
  }

  test("x70: all three history windows share one exchange and one sort") {
    val p = plan("x70_scd2_history")
    // lag / (row_number, lead) both partition by user_id order by event_id:
    // one hash exchange, one in-partition sort for the window stack (the
    // trailing global orderBy adds its own range exchange + sort)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "the change filter must not force a second user_id shuffle")
    assert("Sort \\[user_id".r.findAllIn(p).size <= 2,
      "windows must reuse one in-partition sort (plus the final output sort)")
  }

  test("x71: both snapshot scans prune to the diff columns; one doc_id join") {
    val p = plan("x71_snapshot_diff")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string,n_chars:bigint>") ||
           p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      "snapshot scans must prune to id/source/text(+n_chars), not the full row")
    assert(p.contains("FullOuter"), "the diff is one full-outer join on the doc key")
    assert(p.contains("partial_count"), "the (source, status) report agg must map-combine")
  }

  test("x72: pairs explode over the distinct-word frame; top-20 is distributed") {
    val p = plan("x72_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      "global top-20 must be a distributed top-K, not a single-partition window")
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2,
      "both the word count and the pair sum must be two-phase")
    assert(!p.contains("Window"))
  }

  test("x73: salt reaches the join keys; dim replicated by explode, not re-scanned per salt") {
    val p = plan("x73_salted_join")
    assert(p.contains("_salt"), "salted keys must survive into the physical join")
    assert(p.contains("Generate explode"), "dim side replicates via one explode, not a union of scans")
    assert(p.contains("partial_count"), "the report agg must map-combine")
  }

  test("x74: every funnel stage keys on user_id — no other join key anywhere") {
    val p = plan("x74_funnel")
    assert(p.contains("PushedFilters"), "stage event_type filters must reach the scan")
    // all shuffles in the funnel body hash on user_id (the final 3-row
    // sort contributes a rangepartitioning, not a hash)
    assert("hashpartitioning\\((?!user_id)".r.findAllIn(p).isEmpty,
      "funnel stages must all partition by user_id so exchanges are reusable")
  }

  test("x75: activity distinct and cohort agg share the user partitioning; report agg map-combines") {
    val p = plan("x75_retention")
    assert(p.contains("partial_min"), "first-activity agg must be two-phase")
    assert(p.contains("partial_count"), "retention counts must be two-phase")
  }

  test("x76: co-bucketed tables join with ZERO doc_id exchange") {
    val p = plan("x76_bucketed_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "the fact-to-fact join must be a shuffle-class join (not broadcast) to prove bucketing")
    assert(!p.contains("hashpartitioning(doc_id"),
      "bucketed scans must satisfy the join distribution — no doc_id shuffle allowed")
    assert(p.contains("Bucketed: true"), "both scans must actually read bucketed")
  }

  test("x77: the lang filter prunes partitions at the directory level") {
    val p = plan("x77_partitioned_prune")
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined,
      "the lang predicate must be a partition filter, not a row filter")
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"),
      "lang must not survive as a data filter — it exists only as directories")
  }

  test("x79: window and aggregate share the posting frame's term partitioning") {
    val p = plan("x79_inverted_index")
    // distinct → window(term) → agg(term): the window's term exchange must
    // be the LAST hash exchange — the term agg rides its partitioning
    assert("hashpartitioning\\(term".r.findAllIn(p).size <= 2,
      "df+head aggregate must reuse the window's term partitioning, not re-shuffle")
    assert(!p.contains("Join"), "df and posting head must ride ONE aggregate — no lineage split")
  }

  test("x80: the weighted gate is scan-level — no shuffle beyond x16's score and the report") {
    val p = plan("x80_weighted_sample")
    assert(p.contains("partial_count"), "score and report aggs must be two-phase")
    assert(!p.contains("CartesianProduct"))
    // the u-draw must be a per-row expression (conv over md5), not a join
    // against a random table
    assert(p.contains("conv"), "the deterministic draw rides the projection")
  }

  test("x81: range-frame window and peak aggregate share one user_id exchange") {
    val p = plan("x81_burst_detect")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "the peak argmax must ride the window's partitioning, not re-shuffle")
    assert(!p.contains("Join"), "peak-of-burst is one aggregate, never a max-rejoin")
  }

  test("x83: SNM is one block window — no join anywhere, one blk exchange") {
    val p = plan("x83_sorted_neighborhood")
    assert(!p.contains("Join"),
      "sorted-neighborhood pairs come from lead() in place, never a self-join")
    assert("hashpartitioning\\(blk".r.findAllIn(p).size == 1,
      "exactly one block exchange carries the neighborhood sort")
  }

  test("x84: levenshtein gate runs on LSH candidates, no cartesian/global pairing") {
    val p = plan("x84_edit_gate")
    assert(p.contains("levenshtein"), "the edit gate must price candidate pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x85: chi-square margins read the one PINNED cells frame, not re-scans") {
    val p = plan("x85_source_drift")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 4,
      "both margins, the total, and the grid join must read the pinned cells — a re-derived lineage re-scans the corpus (fresh expr ids defeat ReuseExchange)")
  }

  test("x86: one bucket exchange, pairs from collect_list explode — no join") {
    val p = plan("x86_leakage_audit")
    assert(!p.contains("Join"), "in-bucket pairs come from per-bucket lists, never a self-join")
    assert("hashpartitioning\\(bucket".r.findAllIn(p).size == 1)
    assert(p.contains("float_dot"), "cosines must use the native codegen'd dot")
  }

  test("x87: both corpus-count windows ride ONE w1 exchange") {
    val p = plan("x87_bigram_lm")
    assert("hashpartitioning\\(w1#\\d+, w2#\\d+".r.findAllIn(p).isEmpty,
      "the (w1,w2) window must reuse the w1 partitioning (subset satisfies clustering), not add an exchange")
    assert("hashpartitioning\\(w1#\\d+, \\d+\\)".r.findAllIn(p).size == 1,
      "exactly one exchange on w1 feeds both count windows")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("x88: term filter runs before the posting shuffle; lookup agg map-combines") {
    val p = plan("x88_term_lookup")
    assert(p.contains("IN (data,table,spark)"),
      "only query-term postings may reach the distinct's exchange")
    assert(p.contains("partial_count"))
    assert(!p.contains("Join"))
  }

  test("x89: six report rows read the ONE pinned agreement aggregate") {
    val p = plan("x89_dedup_agreement")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 6,
      "each unioned report row must read the cached 1-row aggregate, not re-run three dedup families")
  }

  test("x90: recursion plans as UnionLoop (linear frontier), value filter pushed to scan") {
    val p = plan("x90_greedy_pack")
    assert(p.contains("UnionLoop"), "WITH RECURSIVE must plan as the iterative UnionLoop")
    assert(p.contains("UnionLoopRef"), "the recursive branch must reference the frontier, not re-scan")
    assert("value#\\d+ >= 0\\.0".r.findFirstIn(p).nonEmpty,
      "the value gate must run below the recursion, not per iteration")
  }

  test("x91: both direction windows ride ONE user_id exchange; no inequality join") {
    val p = plan("x91_nearest_event")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "the opposite-order windows must share one user_id exchange")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), "bidirectional as-of must not plan a join")
  }

  test("x92: SCD2 lookup is one exchange, one window sort, no interval join") {
    val p = plan("x92_temporal_lookup")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "change detection, version sum, and fill must share one user_id exchange")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("BroadcastNestedLoopJoin"),
      "the point-in-time lookup must be a window pass, not a join")
  }

  test("x93: pairs collapse before the 7-day fan-out; no join anywhere") {
    val p = plan("x93_rolling_dau")
    assert(p.contains("Generate explode"), "fan-out must be a generator, not a join")
    assert("hashpartitioning\\(user_id#\\d+L, day".r.findFirstIn(p).nonEmpty,
      "the (user, day) distinct must collapse events BEFORE the ×7 expansion")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("x96: the lead window and the per-user agg share one user_id exchange") {
    val p = plan("x96_time_weighted")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "window partitioning must satisfy the groupBy clustering — no second exchange")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
  }

  test("x97: median/MAD stitch back via broadcast — the fact side never shuffles") {
    val p = plan("x97_mad_outliers")
    // 3 instances: the dev (obs⋈med) subtree appears twice — once under the
    // MAD aggregate, once as the outer fact — plus the top-level ⋈mad; a
    // deliberate re-scan (linear) instead of a cache at corpus scale.
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("x94: chunk fan-out is a generator map stage — no shuffle before the output sort") {
    val p = plan("x94_rag_chunks")
    assert(p.contains("Generate explode"))
    assert(!p.contains("hashpartitioning"),
      "chunk materialization must not shuffle; only the output sort range-partitions")
  }

  test("x95: skyline is one cummax window per source, no all-pairs anti-join") {
    val p = plan("x95_pareto_frontier")
    assert("hashpartitioning\\(source".r.findAllIn(p).size == 1)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"))
  }

  test("x98: checksum map-combines; one sources-sized exchange") {
    val p = plan("x98_table_checksum")
    assert(p.contains("partial_sum"), "per-partition fingerprint sums must combine map-side")
    assert("hashpartitioning\\(source".r.findAllIn(p).size == 1)
  }

  test("x99: one corpus-sized user_id exchange; transition agg map-combines") {
    val p = plan("x99_markov_transitions")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "the lead window is the only corpus-sized shuffle")
    assert(p.contains("partial_count"),
      "transition counts must collapse to types^2 rows map-side")
    assert(!p.contains("SortMergeJoin"))
  }

  test("x100: one corpus-sized map-combining agg; pair join never sees the corpus") {
    val p = plan("x100_centroid_drift")
    assert(p.contains("partial_sum"),
      "label x dim sums must combine in the scan stage")
    assert("hashpartitioning\\(label".r.findAllIn(p).size >= 1)
    assert(!p.contains("CartesianProduct"),
      "the label-pair join must be an equi-join on pos, not a cross product")
  }

  test("x101: (source,token) exchange + source exchange; final agg reuses the window's") {
    val p = plan("x101_token_entropy")
    assert(p.contains("partial_count"),
      "token counts must combine map-side before the vocab-sized exchange")
    // two exchanges total: (source, w) for counts, source for the window;
    // the final per-source agg subset-satisfies the window's partitioning
    assert("hashpartitioning\\(".r.findAllIn(p).size == 2,
      s"expected exactly 2 exchanges")
  }

  test("x82: one lang exchange carries the rank window; score aggs map-combine") {
    val p = plan("x82_quantile_norm")
    assert("hashpartitioning\\(lang".r.findAllIn(p).size == 1,
      "percent_rank must ride a single per-lang partitioning")
    assert(p.contains("partial_count"), "the x16 score aggregate must be two-phase")
  }

  test("x33: salted agg is two shuffle stages — (key, salt) partials then key") {
    val p = plan("x33_salted_agg")
    assert(p.contains("_salt"), "salt column must reach the first aggregate")
    // two logical groupBys → at least two hashpartitioning exchanges
    assert("hashpartitioning".r.findAllIn(p).size >= 2)
  }

  test("x102: one user_id exchange for sessionize+agg; window side is top-k then broadcast") {
    val p = plan("x102_interval_overlap")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "the lag window and the per-session min/max must share one exchange")
    assert(p.contains("TakeOrderedAndProject"),
      "top-3 busy windows must not global-sort the bucket aggregate")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the overlap predicate joins against the broadcast 3-row window side")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("x105: both top-5 sides are TakeOrderedAndProject over native-dot scans") {
    val p = plan("x105_recall_audit")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "brute and ANN sides must each cut to k without a global sort")
    assert(p.contains("float_dot"), "cosines must use the codegen'd expression")
    assert(!p.contains("SortMergeJoin"),
      "every join here is against a broadcast k-row or 1-row side")
  }

  test("x107: chunk exchange + doc_id exchange, no joins — cost linear in tokens") {
    val p = plan("x107_chunk_dedup_clean")
    assert("hashpartitioning\\(chunk".r.findAllIn(p).size >= 1,
      "keep-first window must partition on the chunk string")
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size >= 1,
      "rebuild must shuffle back on doc_id")
    assert(!p.contains("Join"), "removal is window+agg only — a join here " +
      "would make cost track candidate pairs instead of corpus tokens")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to the two columns the chunk grammar needs")
  }

  test("x110: 3-fold fan-out is one explode over one scan — no per-fold rescan") {
    val p = plan("x110_walkforward_split")
    assert("Generate explode".r.findAllIn(p).size == 1,
      "folds must fan out via a single generator, not a union of filtered scans")
    assert("Scan parquet".r.findAllIn(p).size == 1, "one events scan only")
    assert(p.contains("ReadSchema: struct<ts:timestamp"),
      "scan must prune to the three columns the split math needs")
  }

  test("x111: both retrievers cut to top-k before ranking; corpus-side joins broadcast") {
    val p = plan("x111_rrf_fusion")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "lexical and vector sides must each cut to 20 without a global sort")
    assert(p.contains("float_dot"), "cosines must use the codegen'd expression")
    // the ONLY shuffle join allowed is the 20×20 full-outer fusion (Spark
    // cannot broadcast a full outer); every corpus-sized join must broadcast
    assert("SortMergeJoin".r.findAllIn(p).size == 1 && p.contains("FullOuter"),
      "exactly one SMJ — the constant-size rank fusion")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "query-term and df joins against the corpus must broadcast")
  }

  test("x241: KMV bottom-64 executes through TopKPerKey — no per-source window sort") {
    val p = plan("x241_kmv_distinct")
    val fi = p.indexOf("TopKPerKeyFinal")
    val pa = p.indexOf("TopKPerKeyPartial")
    assert(fi >= 0 && pa >= 0,
      "the k smallest hashes per source must come from the bounded-heap operator")
    assert(!p.contains("Window"),
      "a row_number window over the distinct-hash frame is the plan this operator replaces")
  }

  test("x243: the ×B replicate explode collapses in map-side partials") {
    val p = plan("x243_bootstrap_ci")
    assert(p.contains("partial_sum"),
      "the (source, b) aggregate must combine map-side — the shuffle carries " +
        "|sources|·B partial rows, never B corpora")
  }

  test("x250: Kneser-Ney scoring has no window — type-frame counts only") {
    val p = plan("x250_kneser_ney")
    assert(!p.contains("Window"),
      "all KN counts are group-by aggregates over the bigram-type frame")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "type counts must combine map-side")
  }

  test("x256: repetition ratio is per-row codegen — only the fanOut exchange") {
    val p = plan("x256_rep_5gram")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      "the 5-gram arithmetic must ride the scan (the one allowed hash " +
        "exchange is the deliberate fanOut repartition)")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"))
  }

  test("x113: vocabulary lookup broadcasts; encode is one corpus shuffle") {
    val p = plan("x113_tokenize_ids")
    assert(p.contains("BroadcastHashJoin"),
      "the top-k vocab must broadcast into the id join")
    assert(!p.contains("SortMergeJoin"),
      "a corpus-side shuffle join for a 25-row vocab is the wrong plan")
    assert(p.contains("TakeOrderedAndProject"),
      "the vocab cut must be top-k, not a global sort")
  }

  test("x112: z-layout is one map-combining aggregate — single exchange, no UDF") {
    val p = plan("x112_zorder_layout")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "the z-bucket aggregate is the only shuffle")
    assert(p.contains("partial_count"), "bucket stats must be two-phase")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "Morton interleave must stay a codegen'd higher-order aggregate")
  }

  test("x118: CDC chunking is a generator map stage — no computed shuffle before the output sort") {
    val p = plan("x118_cdc_chunks")
    // the ONLY hash exchange allowed is the deliberate fanOut repartition
    // (REPARTITION_BY_NUM — per-position md5 CPU must not serialize onto a
    // single-file scan's one partition); a computed shuffle would show as
    // ENSURE_REQUIREMENTS hashpartitioning
    assert("""Exchange hashpartitioning\([^)]*\), ENSURE_REQUIREMENTS""".r.findFirstIn(p).isEmpty,
      "boundary rule is positional — nothing may shuffle before the sort except the range sort itself")
    assert(p.contains("REPARTITION_BY_NUM"),
      "the per-position md5 stage must fan out — one scan partition serializes the corpus onto one core")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "the rolling-window hash must stay codegen'd higher-order expressions")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to doc_id/text")
    // the round-9 regression this test exists for: a plain explode lets
    // InferFiltersFromGenerate synthesize size(ch)>0, which pushdown
    // inlines — six copies of the per-position md5 — into a Filter BELOW
    // the fan-out exchange, serializing the corpus onto the scan's one
    // partition (57 s vs 2.5 s at sf0.1). explode_outer skips inference;
    // no Filter may ever carry the md5 chunk expression.
    assert(!p.split("\n").exists { l =>
      l.replaceAll("""^[\s:+\-*()\d]*""", "").startsWith("Filter") && l.contains("md5")
    }, "the md5 boundary expression leaked into a pre-exchange Filter (InferFiltersFromGenerate)")
  }

  test("x122: per-key top-k is the custom partial/final pair around one hash exchange — not a Window") {
    val p = plan("x122_topk_per_key")
    val fi = p.indexOf("TopKPerKeyFinal")
    val pa = p.indexOf("TopKPerKeyPartial")
    val ex = p.indexOf("Exchange hashpartitioning", fi)
    assert(fi >= 0 && pa >= 0, s"expected the two-phase operator pair:\n$p")
    assert(ex >= 0 && ex < pa, "the one hash exchange sits between final (above) and partial (below)")
    assert(!p.contains("Window ") && !p.contains("WindowGroupLimit"),
      "the row_number window plan is exactly what this operator replaces")
  }

  test("x123: bloom gate is codegen'd ahead of a broadcast exact join — the corpus never shuffles on gh") {
    val p = plan("x123_bloom_contamination")
    assert(p.contains("might_contain"), "the Bloom probe must gate the corpus gram stream")
    assert(p.contains("BroadcastHashJoin"), "the exact verify joins the tiny bench set as a broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a corpus-side shuffle join is exactly what the Bloom prefilter exists to avoid")
    // every computed (ENSURE_REQUIREMENTS) hash exchange must be a BENCH-
    // side gh distinct. The corpus stream rides the fanOut partitioning
    // from scan through gate to the per-doc hit aggregate with NO further
    // shuffle — the whole point. With the bench frame PINNED, the cached
    // plan (whose internal distinct exchange executes ONCE) prints under
    // every InMemoryTableScan reference, so the string-form occurrence
    // count is unbounded and only the gh-only property is asserted.
    val computed = """Exchange hashpartitioning\([^)]*\), ENSURE_REQUIREMENTS""".r.findAllIn(p).toSeq
    assert(computed.nonEmpty && computed.forall(_.contains("(gh")),
      s"only bench-side gh distincts may shuffle, got: $computed")
    assert(p.contains("InMemoryTableScan"),
      "the bench distinct is pinned — its consumers read cache, not a re-tokenize")
  }

  test("x124: bucket models broadcast; per-doc fold rides the pinned doc-bucket frame") {
    val p = plan("x124_dsir_weights")
    assert(p.contains("InMemoryTableScan"),
      "the doc-bucket frame is pinned — consumers must read cache, not re-tokenize")
    assert(p.contains("BroadcastHashJoin"), "the 128-row term table joins as a broadcast")
    assert(!p.contains("SortMergeJoin"), "nothing here is big enough to sort-merge")
    // only the two 128-row bucket aggregates may shuffle: the per-doc fold
    // is satisfied by the pinned frame's doc_id partitioning
    val computed = """Exchange hashpartitioning\([^)]*\), ENSURE_REQUIREMENTS""".r.findAllIn(p).toSeq
    assert(computed.forall(_.contains("(b#")),
      s"only the bucket aggs may shuffle, got: $computed")
    assert(p.contains("partial_sum"), "bucket models must combine map-side")
  }

  test("x283: the systematic sample has NO window — the rank is RangeRank's") {
    val p = plan("x283_systematic_sample")
    assert(!p.contains("Window"),
      "a row_number window over the hash order would serialize in one task " +
        "at corpus scale — the rank must come from the RangeRank sweep")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("x276: weighted Jaccard joins on the token — never a pair explosion") {
    val p = plan("x276_weighted_jaccard")
    assert(p.contains("SortMergeJoin [w") || p.contains("BroadcastHashJoin [w") ||
      """(?s)Join.*\bw\b""".r.findFirstIn(p).isDefined,
      "the self-join must be the token equi-join (per-key fan-out bounded by sources²)")
    assert(!p.contains("CartesianProduct"))
    // the one nested-loop join is the r12 pair SPINE: a < b over the
    // broadcast |sources|-row totals (x215's shape) — corpus-sized data
    // must never nested-loop
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj == 1, s"exactly the sources-sized spine may nested-loop, got $bnlj")
    assert(p.contains("partial_count"), "the (source, token) counts combine map-side")
  }

  test("x294: one doc_id-partitioned window; the shingle stream shuffles once") {
    val p = plan("x294_winnowing")
    val wins = """Window \[""".r.findAllIn(p).size
    assert(wins == 1, s"exactly one window (the w=4 minimum), got $wins")
    assert(p.contains("windowspecdefinition(doc_id"),
      "the window must partition by doc_id — corpus-cardinality keys, " +
        "never a low-cardinality serialization")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("x299: the gap window partitions by (user, type); moments combine map-side") {
    val p = plan("x299_inter_arrival")
    assert(p.contains("windowspecdefinition(user_id") &&
      p.contains("event_type"),
      "the lead() window must ride user×type-cardinality partitions")
    assert(p.contains("partial_count"), "the per-type moments combine map-side")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("x285/x291: the global aggregates REUSE the per-source exchange — one corpus scan") {
    for (name <- Seq("x285_source_xent", "x291_kendall_tau")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // AQE resolves exchange reuse during execution
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange") || p.contains("ReusedSubquery") ||
        """FileScan parquet""".r.findAllIn(p).size <= 1,
        s"$name must not re-scan the corpus for the re-aggregated global counts")
    }
  }

  test("x125: merged vintage read aggregates in one exchange") {
    val p = plan("x125_schema_evolution")
    assert(p.contains("partial_count"), "the vintage-union aggregate must combine map-side")
    assert("""Exchange hashpartitioning""".r.findAllIn(p).size == 1,
      "one (lang, source) aggregate exchange — the merged read itself must not shuffle")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "union-by-name is a read-path alignment, not a join")
  }

  test("x126: CDF walk reads the pinned (source,value) frame; KS max selected on integers") {
    val p = plan("x126_ks_drift")
    assert(p.contains("InMemoryTableScan"),
      "the (source, n_chars) counts are pinned — totals/global/grid consumers read cache")
    assert(!p.contains("SortMergeJoin"), "every join side here is sources- or values-sized")
    assert(p.contains("partial_count"), "the base counts must combine map-side")
  }

  test("x127: dim stats broadcast onto the pinned exploded stream; per-vector fold rides vec_id") {
    val p = plan("x127_quantize_audit")
    assert(p.contains("InMemoryTableScan"),
      "the exploded (vec,pos,v) stream is pinned — stats and audit share one scan")
    assert(p.contains("BroadcastHashJoin"), "the 64-row dim stats join as a broadcast")
    assert(!p.contains("SortMergeJoin"), "nothing here is big enough to sort-merge")
    val computed = """Exchange hashpartitioning\([^)]*\), ENSURE_REQUIREMENTS""".r.findAllIn(p).toSeq
    assert(computed.forall(_.contains("(pos")),
      s"only the 64-row dim agg may shuffle — the per-vector fold rides the fan-out, got: $computed")
  }

  test("x128: unpivot is an Expand map stage — no shuffle before the output sort") {
    val p = plan("x128_unpivot")
    assert(p.contains("Expand"), "unpivot must plan as the Expand generator")
    assert(!p.contains("Exchange hashpartitioning"),
      "wide→long is per-row expansion — nothing may hash-shuffle")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"),
      "scan must prune to the id + measure columns")
  }

  test("x129: prefix join verifies candidates against the pinned ranked sets — no all-pairs") {
    val p = plan("x129_prefix_join")
    assert(p.contains("InMemoryTableScan"),
      "the ranked shingle sets are pinned — prefix and both verify sides read cache")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the prefix EQUI-join, never a cross")
    assert(p.contains("array_intersect"),
      "the exact verify is a codegen'd array intersection on the ranked sets")
    assert(!p.contains("Window"),
      "the rare-first vocabulary rank must NOT be a window: the frame is " +
        "the corpus-linear distinct-shingle set, so any Window over it " +
        "(partitioned or not) is the r9 scale-killer — RangeRank's " +
        "two-pass offset scheme replaces it")
  }

  test("x115: boilerplate blocklist joins back as a BROADCAST; df agg is two-phase") {
    val p = plan("x115_boilerplate_strip")
    assert(p.contains("BroadcastHashJoin"),
      "the df>=3 flag set is tiny by definition — it must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a corpus-side shuffle join for the blocklist is the wrong plan")
    assert(p.contains("partial_count"), "doc-frequency must combine map-side")
  }

  test("x116: full-horizon pack is ONE exchange (the user_id repartition) + in-partition sort") {
    val p = plan("x116_greedy_pack_full")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1,
      "exactly one global sort: the output orderBy")
    // the plan string prints outermost-first, so the output sort must
    // appear ABOVE (before) the fold's MapPartitions, never under it
    assert(p.indexOf("Exchange rangepartitioning") < p.indexOf("MapPartitions"),
      "the global sort must sit above the fold")
    assert(p.contains("PushedFilters: [IsNotNull(value), GreaterThanOrEqual(value,0.0)]"),
      "the value filter must reach the parquet scan")
  }

  test("x117: one map-combining corpus agg; denominator joins as a constant-size broadcast") {
    val p = plan("x117_mix_temperature")
    assert(p.contains("partial_sum"), "token counts must combine map-side")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 1-row denominator must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("x108: ONE source exchange carries the running sum; scan pruned to 3 columns") {
    val p = plan("x108_token_budget_mix")
    assert("hashpartitioning\\(source".r.findAllIn(p).size >= 1)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "budget fill is a single window shuffle — no self-join, no second exchange")
    assert(!p.contains("Join"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      "scan must prune to doc_id/text/source")
  }

  test("x131: seed join reads the pinned gram frame on both sides — equi-join, never a cross") {
    val p = plan("x131_dup_spans")
    assert(p.contains("InMemoryTableScan"),
      "the gram frame is pinned — both self-join sides must read cache, not re-tokenize")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates come from the gram-content EQUI-join; a cross is the all-pairs failure")
    // the join's equi-key must be the gram content (g), not positions
    assert("""(?s)(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[g#\d+\]"""
      .r.findFirstIn(p).isDefined, s"join key must be the gram string:\n$p")
  }

  test("x132: LM terms broadcast onto the pinned doc-bigram frame; per-doc fold rides doc_id") {
    val p = plan("x132_perplexity_gate")
    assert(p.contains("InMemoryTableScan"),
      "the doc-bigram counts are pinned — model subtree and scorer read cache")
    assert(p.contains("BroadcastHashJoin"), "the fixture-size LM joins as a broadcast")
    assert(!p.contains("SortMergeJoin"), "nothing here is big enough to sort-merge")
    assert(p.contains("partial_sum"), "model counts must combine map-side")
  }

  test("x133: weighted reservoir executes through the TopKPerKey operator, not a Window sort") {
    val p = plan("x133_reservoir_sample")
    val fi = p.indexOf("TopKPerKeyFinal")
    val pa = p.indexOf("TopKPerKeyPartial")
    assert(fi >= 0 && pa >= 0, s"expected the two-phase operator pair:\n$p")
    // the rank window is allowed — it runs over the operator's ≤|sources|·5
    // output — but must sit ABOVE the final fold, never under it
    val w = p.indexOf("Window")
    assert(w < fi, "the rank window applies to the operator's constant-size result")
  }

  test("x136: CMS gate sits under the one survivor exchange; stream pinned") {
    val p = plan("x136_cms_heavyhitters")
    assert(p.contains("cms_estimate"), "the codegen'd CMS probe must gate the stream")
    assert(p.contains("InMemoryTableScan"),
      "the shingle stream is pinned — sketch build and recount share one scan")
    val exchanges = """Exchange hashpartitioning\(shingle""".r.findAllIn(p).size
    assert(exchanges == 1,
      s"exactly ONE content-keyed exchange (the gated recount), got $exchanges")
    assert(p.indexOf("Exchange hashpartitioning(shingle") < p.indexOf("cms_estimate"),
      "plan prints outermost-first: the gate must sit BELOW the exchange " +
        "(filter before shuffle), so the exchange line comes first")
  }

  test("x137: space_saving aggregates map-side as an ObjectHashAggregate partial") {
    val p = plan("x137_spacesaving_terms")
    assert(p.contains("ObjectHashAggregate"),
      "a TypedImperativeAggregate plans as object-hash aggregation")
    assert(p.contains("partial_space_saving"),
      "the O(m) summary must combine map-side before the exchange")
  }

  test("x141: ONE suppkey exchange feeds both windows and the aggregate; scan pruned") {
    val p = plan("x141_interval_merge")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "windows and per-island aggregate must share the one suppkey exchange")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_shipdate:timestamp"),
      "scan must prune to the four interval columns")
    assert(!p.contains("Join"), "interval union is windows, never a pairwise join")
  }

  test("x142: the fact scan carries a runtime dynamicpruning partition filter") {
    val p = plan("x142_dpp_prune")
    assert(p.contains("dynamicpruning"),
      s"the dim filter must prune fact partitions at runtime:\n$p")
    assert(p.contains("PartitionFilters"),
      "the pruning must land in the fact scan's partition filters")
  }

  test("x149: the rewrite fires — TopKPerKey pair present, the Window node gone") {
    val p = plan("x149_topk_rewrite")
    assert(p.contains("TopKPerKeyFinal") && p.contains("TopKPerKeyPartial"),
      s"the conf-gated rule must rewrite the window form:\n$p")
    assert(!p.contains("Window "), "the row_number Window must be replaced")
  }

  test("x152: custom generator plans as Generate; one count exchange; pruned scan") {
    val p = plan("x152_char_trigrams")
    assert(p.contains("Generate") && p.contains("char_ngrams"),
      "the expansion must stream through the Generate node, not an array explode")
    assert(!p.contains("transform("),
      "no per-doc gram array may materialize ahead of the generator")
    assert("""Exchange hashpartitioning\(lang""".r.findAllIn(p).size >= 1)
    assert(p.contains("partial_count"), "(lang, gram) counts must combine map-side")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      "scan must prune to doc_id (the fanOut key) + text/lang")
  }

  test("x192: one codegen'd corpus scan — multi_match rides the plan, no join, no pre-sort shuffle") {
    val p = plan("x192_multi_match")
    assert(p.contains("multi_match"), "the native automaton expression must be in the plan")
    assert(!p.contains("Join"), "the blocklist must not become a pattern-table join")
    assert(!p.contains("Exchange hashpartitioning"),
      "per-row scanning must not shuffle before the output sort")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to doc_id/text")
    // codegen itself is pinned by MultiMatchSpec's CODEGEN_ONLY factory-mode
    // pass (the pre-AQE plan string here never shows WholeStageCodegen)
  }

  test("x193: marginal windows run over the dimension-sized cell table, not the corpus") {
    val p = plan("x193_chi2_independence")
    assert(p.contains("partial_count"), "cell counts must combine map-side")
    assert(!p.contains("Join"), "marginals must come from windows, not self-joins")
    assert(p.contains("ReadSchema: struct<lang:string,source:string>"),
      "scan must prune to the two categorical columns")
  }

  test("x198: range-frame window is one user_id exchange + window, no join") {
    val p = plan("x198_range_window")
    assert("""Exchange hashpartitioning\(user_id""".r.findAllIn(p).size == 1)
    assert(p.contains("RANGE BETWEEN") || p.contains("specifiedwindowframe(RangeFrame"),
      s"frame must be RANGE, not ROWS:\n${p.take(2000)}")
    assert(!p.contains("Join"))
  }

  test("x199: prep v5 keeps the automaton in-plan and never joins a pattern table") {
    val p = plan("x199_prep_v5")
    assert(p.contains("multi_match"), "the blocklist screen must be the native expression")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "(lang, source) aggregates must combine map-side")
  }

  test("x134: unicode normalization is pure codegen map work — no shuffle, pruned scan") {
    val p = plan("x134_unicode_norm")
    assert(p.contains("nfc_normalize") && p.contains("strip_accents"),
      "both native expressions must appear in the plan")
    assert(!p.contains("Exchange hashpartitioning"),
      "per-row normalization must not shuffle before the output sort")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to doc_id/text")
  }
}
