package graft.queries

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 additions (registered in SparkEntry, oracled in Oracles):
  * three corpus-PREPARATION audits the surface lacked — the packing
  * block-size frontier (x359), benchmark decontamination (x360), and
  * cross-document fragment stitching (x361). Same conventions as
  * Round11–14: stableRound6 at every float edge, exact integer
  * arithmetic everywhere else, md5 portability (lowercase hex both
  * engines), map-combining aggregates, collapse-before-join for any
  * pair-valued frame.
  */
object Round15Queries {

  /** x359 — PACKING block-size FRONTIER: x357 measures attention
    * contamination at ONE block size; this prices the block-size KNOB
    * itself. For B ∈ {64, 128, 256, 512}, under the same stream-concat
    * packing model (documents concatenated in doc_id order, cut every B
    * tokens): block count, documents SPLIT across a cut, and total
    * fragments — the sequence-length economics table (bigger blocks =
    * fewer pad/cut boundaries but more cross-doc attention surface;
    * x357 prices the latter, this the former) measured on the actual
    * corpus length distribution.
    *
    * Exactness: all integers — a doc spanning [s0, s0+len) fragments
    * into (s0+len−1) div B − s0 div B + 1 pieces (closed form, no
    * per-token explode); two rounded divisions per output row.
    *
    * Scale shape: document start offsets ride the SHARED
    * [[Round14Queries.docStartOffsets]] distributed prefix sum (x357's
    * fold — the packing model cannot drift between the two audits); the
    * frontier is one 4-way explode of the doc-level frame + ONE
    * map-combining aggregate. Corpus-DOC-linear — strictly cheaper than
    * x357's token explode.
    */
  def x359PackFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val starts = Round14Queries.docStartOffsets(spark, sfDir)
    val bs = Seq(64L, 128L, 256L, 512L)
    val per = starts
      .select(col("len"), col("s0"), explode(array(bs.map(lit(_)): _*)).as("b"))
      .select(col("b"), col("len"),
        (expr("(s0 + len - 1) div b") - expr("s0 div b") + 1).as("frags"))
    per.groupBy("b")
      .agg(count(lit(1)).as("n_docs"), sum("len").as("total_tokens"),
        sum((col("frags") > 1).cast("long")).as("n_split_docs"),
        sum("frags").as("total_fragments"))
      .select(col("b").as("block_size"), col("n_docs"), col("total_tokens"),
        expr("(total_tokens + b - 1) div b").as("n_blocks"),
        col("n_split_docs"), col("total_fragments"),
        stableRound6(col("n_split_docs").cast("double") /
          col("n_docs").cast("double")).as("split_rate"),
        stableRound6(col("total_fragments").cast("double") /
          col("n_docs").cast("double")).as("frag_avg"))
      .orderBy("block_size")
  }

  /** x360 — benchmark DECONTAMINATION audit: the train/test n-gram
    * leakage check every evaluation-honest pipeline runs before
    * training (the 8-gram overlap convention of the published LLM
    * decontamination procedures). A deterministic md5 split (first hex
    * nibble of md5("dc:"+doc_id) ∈ {0,1,2} → ~3/16 of docs are "test",
    * the x30 reproducible-draw convention — decorrelated from doc_id
    * ranges AND from source, unlike a modulo split, which the fixture's
    * id↔source correlation would collapse to two sources) stands in for
    * the benchmark set. Per source: test docs/8-grams, distinct test
    * 8-grams also present in ANY train doc, test docs with ≥1 leaked
    * 8-gram — the number that decides whether eval scores on this
    * corpus are trustworthy.
    *
    * Exactness: counts of exact md5(8-token window) matches on
    * per-doc-DISTINCT grams; two rounded divisions per source row.
    * Docs under 8 tokens carry no 8-gram and are excluded on both
    * engines (mirrored filter).
    *
    * Scale shape: one token-linear explode → per-doc-distinct grams
    * (one shuffle keyed by (doc, gram)); the train side collapses to
    * DISTINCT gram hashes before the probe join (the x269
    * collapse-first rule: dup-saturated corpora share grams, so the
    * train frame stays near base-vocabulary-sized at any dup factor);
    * one hash equi-join + two map-combining aggregates. Never doc×doc.
    */
  def x360Decontamination(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val toks = LlmQueries.fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .withColumn("is_test",
        substring(md5(concat(lit("dc:"), col("doc_id").cast("string"))), 1, 1)
          .isin("0", "1", "2"))
    val grams = toks
      .select(col("doc_id"), col("source"), col("is_test"), col("toks"),
        explode(expr("sequence(1, size(toks) - 7)")).as("i"))
      .select(col("doc_id"), col("source"), col("is_test"),
        md5(concat_ws(" ", expr("slice(toks, i, 8)"))).as("h"))
      .distinct()
    val train = grams.filter(!col("is_test")).select("h").distinct()
    val perDoc = grams.filter(col("is_test"))
      .join(train.withColumn("hit", lit(1L)), Seq("h"), "left")
      .groupBy("source", "doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_test_docs"),
        sum("n_grams").as("n_test_grams"),
        sum("n_hit").as("n_hit_grams"),
        sum((col("n_hit") > 0).cast("long")).as("n_contaminated_docs"))
      .select(col("source"), col("n_test_docs"), col("n_test_grams"),
        col("n_hit_grams"), col("n_contaminated_docs"),
        stableRound6(col("n_hit_grams").cast("double") /
          col("n_test_grams").cast("double")).as("gram_hit_rate"),
        stableRound6(col("n_contaminated_docs").cast("double") /
          col("n_test_docs").cast("double")).as("doc_contamination_rate"))
      .orderBy("source")
  }

  /** x362 — REPETITION-LOOP audit: per (source, period p ∈ {1,2,3}),
    * documents whose text contains a CONSECUTIVELY repeated p-gram —
    * max repeats, docs with ≥2 repeats, docs with ≥4 (the degenerate
    * "looping text" the neural-degeneration literature documents and
    * every production quality gate screens for: "the the the",
    * "very good very good …"). The WITHIN-doc repetition signal the
    * family lacked — x131 finds spans shared ACROSS docs, x345/x16
    * score character/length statistics; a looping doc passes both.
    *
    * Exactness: pure gaps-and-islands integer combinatorics — a maximal
    * run of r consecutive positions with tok[i] == tok[i−p] means the
    * p-gram repeats exactly r div p + 1 times (r < p ⇒ 1 = no full
    * repeat; both engines run the identical formula); one round6
    * division per row. max_repeats floors at 1 (a repeat-free source
    * reads 1, not 0 — "appears once").
    *
    * Scale shape: one token explode; ONE doc-keyed window pass computes
    * all three lags; the island row_number rides a (doc_id, p)-keyed
    * window (data-cardinality keys parallelize — x358's rule); two
    * map-combining aggregates; a |sources|×3 spine left-join closes
    * repeat-free groups. Corpus-token-linear, no joins on token rows.
    */
  def x362RepetitionLoop(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    import org.apache.spark.sql.expressions.Window
    val docs = LlmQueries.fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
    val tok = docs.select(col("doc_id"), col("source"),
      posexplode(col("toks")).as(Seq("pos0", "w")))
    val wDoc = Window.partitionBy("doc_id").orderBy("pos0")
    val fl = tok
      .select(col("doc_id"), col("source"), col("pos0"), col("w"),
        lag("w", 1).over(wDoc).as("l1"), lag("w", 2).over(wDoc).as("l2"),
        lag("w", 3).over(wDoc).as("l3"))
      .select(col("doc_id"), col("source"), col("pos0"),
        explode(array(
          struct(lit(1L).as("p"), (col("w") === col("l1")).as("f")),
          struct(lit(2L).as("p"), (col("w") === col("l2")).as("f")),
          struct(lit(3L).as("p"), (col("w") === col("l3")).as("f")))).as("x"))
      .select(col("doc_id"), col("source"), col("pos0"),
        col("x.p").as("p"), col("x.f").as("f"))
      .filter(col("f")) // null lag → null === → filtered, the oracle's ELSE 0
    val wp = Window.partitionBy("doc_id", "p").orderBy("pos0")
    val docmax = fl.withColumn("grp", col("pos0") - row_number().over(wp))
      .groupBy("doc_id", "source", "p", "grp")
      .agg(count(lit(1)).as("r"))
      .groupBy("doc_id", "source", "p")
      .agg(max(expr("r div p + 1")).as("max_rep"))
    val spine = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("p"))
    spine.join(docmax, Seq("source", "p"), "left")
      .groupBy("source", "p", "n_docs")
      .agg(sum((col("max_rep") >= 2).cast("long")).as("nr0"),
        sum((col("max_rep") >= 4).cast("long")).as("nl0"),
        max("max_rep").as("mr0"))
      .select(col("source"), col("p"), col("n_docs"),
        coalesce(col("nr0"), lit(0L)).as("n_repeating"),
        coalesce(col("nl0"), lit(0L)).as("n_looping"),
        greatest(coalesce(col("mr0"), lit(1L)), lit(1L)).as("max_repeats"),
        stableRound6(coalesce(col("nr0"), lit(0L)).cast("double") /
          col("n_docs").cast("double")).as("repeating_rate"))
      .orderBy("source", "p")
  }

  /** x363 — embedding ANISOTROPY (representation-collapse) audit: per
    * label, the mean pairwise cosine similarity of the unit-normalized
    * embeddings — THE published collapse metric (Ethayarajh 2019: an
    * isotropic space reads ≈0, a collapsed cone reads →1; a corpus whose
    * embeddings collapse makes every cosine-based stage — x11 top-k,
    * x28/x59 semantic dedup, x49 ANN — discriminate on noise). Exact in
    * ONE pass, no pair ever materializes: Σ_{i≠j} x̂ᵢ·x̂ⱼ =
    * ‖Σx̂‖² − Σ‖x̂ᵢ‖² — the same collapse-the-quadratic discipline as
    * x269/x361, applied to the inner-product sum.
    *
    * Exactness: xm = floor(x·1e6+0.5) exact longs; ‖x‖ =
    * floor(sqrt(Σxm²)+0.5)/1e6 (sqrt of an exact long — one IEEE op);
    * each coordinate v = round6((xm/1e6)/‖x‖) CAST DECIMAL(18,6); all
    * three quadratic sums (per-vector Σv², per-dim Σv, Σ(per-dim)²) are
    * exact DECIMAL arithmetic — order-free, so distribution cannot move
    * them; ONE double division + round6 per output row. Zero-norm
    * vectors are excluded on both engines (no unit direction exists).
    *
    * Scale shape: one corpus scan → posexplode to corpus×64 coordinate
    * rows → three map-combining aggregates keyed by (label,vec)/
    * (label,dim)/(label); the label-keyed finale joins metadata-sized
    * frames. Corpus-linear; the closed form replaces the N²/2 cosine
    * pairs a naive audit would shuffle.
    */
  def x363Anisotropy(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val base = Io.table(spark, sfDir, "embeddings")
      .filter(col("embedding").isNotNull && col("label").isNotNull)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))")
          .as("xm"))
    val unit = base
      .select(col("vec_id"), col("label"), col("xm"),
        (floor(sqrt(expr("aggregate(xm, 0L, (a, v) -> a + v * v)")
          .cast("double")) + 0.5) / 1e6).as("nr"))
      .filter(col("nr") > 0)
      .select(col("vec_id"), col("label"), col("nr"),
        posexplode(col("xm")).as(Seq("d0", "xmd")))
      .select(col("vec_id"), col("label"), (col("d0") + 1).as("dim"),
        stableRound6((col("xmd").cast("double") / 1e6) / col("nr"))
          .cast("decimal(18,6)").as("v"))
    val qn = unit.groupBy("label", "vec_id")
      .agg(sum((col("v") * col("v")).cast("decimal(38,12)")).as("q"))
      .groupBy("label")
      .agg(sum("q").cast("double").as("qq"), count(lit(1)).as("n_vecs"))
    val s2 = unit.groupBy("label", "dim")
      .agg(sum(col("v")).cast("decimal(18,6)").as("s"))
      .groupBy("label")
      .agg(sum((col("s") * col("s")).cast("decimal(38,12)"))
        .cast("double").as("s2"))
    s2.join(qn, "label")
      .filter(col("n_vecs") > 1)
      .select(col("label"), col("n_vecs"),
        stableRound6((col("s2") - col("qq")) /
          (col("n_vecs").cast("double") * (col("n_vecs") - 1).cast("double")))
          .as("mean_cos"))
      .orderBy("label")
  }

  /** x361 — cross-document FRAGMENT-STITCH audit: documents whose
    * 4-token SUFFIX equals another document's 4-token PREFIX — the
    * pagination/truncation signal (a crawl that split articles across
    * pages, or a chunker that cut mid-sentence) that none of the dedup
    * family sees: the two halves share NO content, so Jaccard/MinHash/
    * substring dedup all score them unrelated, yet a reassembly pass
    * would want them adjacent. Per (source_a, source_b): the exact
    * count of ordered stitch pairs (suffix of an a-doc == prefix of a
    * b-doc, self-pairs excluded).
    *
    * Exactness: pair counts are exact products of per-(hash, source)
    * multiplicities (Σ suffix_count·prefix_count per cell), minus the
    * exact diagonal self-pair count (docs whose own prefix == own
    * suffix); zero floats in the output. Docs under 5 tokens are
    * excluded on both engines (a 4-token doc's prefix IS its suffix —
    * every such doc would self-match trivially).
    *
    * Scale shape: ONE corpus scan emits (prefix_hash, suffix_hash) per
    * doc; both sides COLLAPSE to (hash, source, count) before the
    * equi-join (the x269/x276 rule — at the dup-saturated 100× the
    * join stays |distinct hashes|-bounded and pair counts come out as
    * count products, never materialized pairs); one keyed join + one
    * map-combining aggregate; output ≤ |sources|².
    */
  def x361FragmentStitch(spark: SparkSession, sfDir: String): DataFrame = {
    val pp = LlmQueries.fanOut(Io.table(spark, sfDir, "documents"))
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", expr("slice(toks, 1, 4)"))).as("ph"),
        md5(concat_ws(" ", expr("slice(toks, size(toks) - 3, 4)"))).as("sh"))
    val sCnt = pp.groupBy(col("sh"), col("source"))
      .agg(count(lit(1)).as("s_cnt"))
      .select(col("sh").as("h"), col("source").as("src_a"), col("s_cnt"))
    val pCnt = pp.groupBy(col("ph"), col("source"))
      .agg(count(lit(1)).as("p_cnt"))
      .select(col("ph").as("h"), col("source").as("src_b"), col("p_cnt"))
    val raw = sCnt.join(pCnt, "h")
      .groupBy("src_a", "src_b")
      .agg(sum(col("s_cnt") * col("p_cnt")).as("raw_pairs"))
    val self = pp.filter(col("ph") === col("sh"))
      .groupBy(col("source")).agg(count(lit(1)).as("self_cnt"))
    raw.join(self.select(col("source").as("src_a"), col("self_cnt")),
        Seq("src_a"), "left")
      .select(col("src_a"), col("src_b"),
        (col("raw_pairs") - when(col("src_a") === col("src_b"),
          coalesce(col("self_cnt"), lit(0L))).otherwise(lit(0L)))
          .as("n_stitch_pairs"))
      .filter(col("n_stitch_pairs") > 0)
      .orderBy("src_a", "src_b")
  }

  /** x364 — token-budget GINI per source: the Gini coefficient of the
    * per-document token-length distribution — the length-SKEW audit
    * that drives packing/batch-sizing decisions (a high-Gini source
    * concentrates its token budget in a few long docs, so fixed-size
    * packing bins fill unevenly and per-doc sampling misprices tokens);
    * x273 histograms lengths and x311 draws the Lorenz curve of VOCAB
    * mass — this is the doc-level concentration scalar per source.
    *
    * Exactness: sorted-rank identity G = (2·Σ r·xᵣ − (n+1)·Σx)/(n·Σx)
    * with ranks from a TOTAL order (len, doc_id) — the numerator and
    * denominator are exact integers, ONE round6 division per row.
    *
    * Scale shape: ranks ride [[graft.operators.RangeRank]] keyed by
    * source (the low-cardinality-key contract — a plain window would
    * sort each source's docs in ONE task), then one map-combining
    * aggregate; |sources| output rows. The ranked frame is built,
    * forced, and its sort pin released through [[graft.core.PinnedResult]].
    */
  def x364LengthGini(spark: SparkSession, sfDir: String): DataFrame =
    x364Pin.swapStaged {
      import ExtendedQueries.stableRound6
      val d = Io.table(spark, sfDir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("len"))
      val ranking = graft.operators.RangeRank.rankWithinOwned(
        d, "source", Seq("len", "doc_id"), "rn")
      val out = ranking.df.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("len").as("total_tokens"),
          sum(col("rn") * col("len")).as("s1"))
        .filter(col("total_tokens") > 0)
        .select(col("source"), col("n_docs"), col("total_tokens"),
          stableRound6((lit(2L) * col("s1") -
            (col("n_docs") + 1) * col("total_tokens")).cast("double") /
            (col("n_docs") * col("total_tokens")).cast("double")).as("gini"))
        .orderBy("source")
      (out, () => ranking.release())
    }

  private val x364Pin = new graft.core.PinnedResult
}
