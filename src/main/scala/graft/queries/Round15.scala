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
}
