package graft.queries

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-14 additions (registered in SparkEntry, oracled in Oracles):
  * the two training-ORDER audits the pipeline had no eyes on — epoch
  * shuffle quality (x356) and packed-sequence attention contamination
  * (x357). Same conventions as Round11–13: stableRound6 at every float
  * edge, exact integer/DECIMAL arithmetic everywhere else, md5
  * portability (lowercase hex both engines), map-combining aggregates,
  * RangeRank for global ranks instead of single-partition windows.
  */
object Round14Queries {

  /** x356 — EPOCH-SHUFFLE audit: three deterministic per-epoch
    * permutations of the corpus (rank by md5("<epoch>|<doc_id>"), doc_id
    * tie-break — the seeded reshuffle every multi-epoch training run
    * applies), and for each epoch pair the number of UNORDERED adjacent
    * pairs that repeat — the data-ORDER quality meter: a correct
    * reshuffle leaves ~2/(n−1) adjacency overlap between epochs, while a
    * buggy one (same seed every epoch, partial shuffle, shard-local
    * shuffle) shows up as a repeat_rate orders of magnitude above that
    * floor. Gradient noise decorrelation across epochs is exactly what
    * this audits (cf. the data-ordering sections of LLM training
    * reports; same md5-derived determinism discipline as x30/x54).
    *
    * Exactness: positions are row_number over a TOTAL order (md5 hex,
    * doc_id tie-break); pair keys are exact (least, greatest) id pairs;
    * the only double is the final rounded rate.
    *
    * Scale shape: ranks come from [[graft.operators.RangeRank]] (the
    * two-pass range-partitioned ranking — parallelism decoupled from the
    * 3-epoch key domain; a plain window would sort each epoch's corpus
    * in ONE task); adjacency is a (epoch, pos+1) equi-join of the ranked
    * frame against itself, overlap a (lo, hi)-keyed equi-join — all
    * shuffles are keyed, nothing all-pairs. The ranked frame is pinned
    * for its six consumers and released after the 3-row result is
    * forced (the x339 discipline).
    */
  def x356EpochShuffle(spark: SparkSession, sfDir: String): DataFrame = x356Pin.swapStaged {
    import ExtendedQueries.stableRound6
    // doc_id IS NOT NULL pinned on BOTH engines (advice r14): a null id
    // would make the md5 sort key null, which Spark orders NULLS FIRST but
    // DuckDB's row_number ORDER BY defaults NULLS LAST - a silent
    // permutation desync on a fixture drift the fixture stamp can't see.
    val docs = Io.table(spark, sfDir, "documents")
      .filter(col("doc_id").isNotNull).select(col("doc_id"))
    val epochs = Seq(0L, 1L, 2L)
    val keyed = docs.select(col("doc_id"), explode(array(epochs.map(e =>
        struct(lit(e).as("epoch"),
          md5(concat(lit(s"$e|"), col("doc_id").cast("string"))).as("h"))): _*))
        .as("eh"))
      .select(col("eh.epoch").as("epoch"), col("eh.h").as("h"), col("doc_id"))
    val ranking = graft.operators.RangeRank.rankWithinOwned(
      keyed, "epoch", Seq("h", "doc_id"), "pos")
    val pairs = ranking.df.select(col("epoch"), col("pos"), col("doc_id").as("da"))
      .join(ranking.df.select(col("epoch"), (col("pos") - 1).as("pos"),
        col("doc_id").as("db")), Seq("epoch", "pos"))
      .select(col("epoch"),
        least(col("da"), col("db")).as("lo"),
        greatest(col("da"), col("db")).as("hi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val overlaps = Seq((0L, 1L), (1L, 2L), (0L, 2L)).map { case (ea, eb) =>
      pairs.filter(col("epoch") === ea).select("lo", "hi")
        .join(pairs.filter(col("epoch") === eb).select("lo", "hi"),
          Seq("lo", "hi"))
        .agg(count(lit(1)).as("n_repeat"))
        .select(lit(ea).as("epoch_a"), lit(eb).as("epoch_b"), col("n_repeat"))
    }.reduce(_ unionAll _)
    val out = overlaps.crossJoin(broadcast(n))
      .select(col("epoch_a"), col("epoch_b"), col("n_docs"),
        (col("n_docs") - 1).as("n_adj"), col("n_repeat"),
        stableRound6(col("n_repeat").cast("double") /
          (col("n_docs") - 1).cast("double")).as("repeat_rate"))
      .orderBy("epoch_a", "epoch_b")
    (out, () => { pairs.unpersist(false); ranking.release() })
  }

  private val x356Pin = new graft.core.PinnedResult

  /** x357 — PACKED-SEQUENCE attention CONTAMINATION: GPT-style stream
    * packing (documents concatenated in doc_id order, cut into 256-token
    * training blocks, documents split across cuts) trains with causal
    * attention that, absent boundary masking, lets tokens attend across
    * document boundaries inside a block. Per window size W ∈ {32, 256}:
    * the exact number of (token → attended-token) pairs and the fraction
    * of them that CROSS a document boundary — the number that decides
    * whether a pipeline needs block-diagonal attention masks or
    * boundary-aware packing (x60/x116/x145's operators), measured on the
    * actual corpus length distribution rather than assumed.
    *
    * Exactness: all integers — token at stream position g in block
    * [b, b+256) attends to its min(g−b, W) in-block predecessors, of
    * which max(0, min(g−b, W) − (g − max(s0, b))) lie before its
    * document's start s0; one rounded division per output row.
    *
    * Scale shape: document start offsets are an exact distributed prefix
    * sum — per-bucket (doc_id div 1000) length sums, ONE metadata-sized
    * cumulative window over the bucket frame, then a within-bucket
    * window (parallel across buckets; bucket width is the knob that
    * keeps the bucket frame metadata-sized at larger corpora). The
    * per-token frame is one explode (corpus-token-linear, map-side
    * combining aggregate in the same stage); both W values ride ONE
    * pass, and the 2-row result explodes from the 1-row aggregate
    * (x148/x159's pattern). No join touches pairs.
    */
  def x357PackContamination(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val tok = docStartOffsets(spark, sfDir)
      .select(col("s0"), explode(expr("sequence(0, len - 1)")).as("t"))
      .select(col("s0"), (col("s0") + col("t")).as("g"))
      .withColumn("b", expr("(g div 256) * 256"))
      .select((col("g") - col("b")).as("p"),
        (col("g") - greatest(col("s0"), col("b"))).as("own"))
    val agg = tok.agg(count(lit(1)).as("n_tokens"),
      sum(least(col("p"), lit(32L))).as("att32"),
      sum(greatest(least(col("p"), lit(32L)) - col("own"), lit(0L))).as("crs32"),
      sum(col("p")).as("att256"),
      sum(greatest(col("p") - col("own"), lit(0L))).as("crs256"))
    agg.select(col("n_tokens"), explode(array(
        struct(lit(32L).as("w"), col("att32").as("att"), col("crs32").as("crs")),
        struct(lit(256L).as("w"), col("att256").as("att"), col("crs256").as("crs"))))
        .as("r"))
      .select(col("r.w").as("w"), col("n_tokens"),
        col("r.att").as("attended_pairs"), col("r.crs").as("cross_pairs"),
        stableRound6(col("r.crs").cast("double") / col("r.att").cast("double"))
          .as("contamination"))
      .orderBy("w")
  }

  /** Document start offsets (doc_id, len, s0) in the doc_id-ordered
    * stream-concat token stream — the EXACT distributed prefix sum
    * x357 and x359 both pack over (one shared fold, so the packing
    * model cannot drift between the contamination and frontier audits):
    * per-bucket (doc_id div 1000) length sums, ONE metadata-sized
    * cumulative window over the bucket frame, then a within-bucket
    * window (parallel across buckets; bucket width is the knob that
    * keeps the bucket frame metadata-sized at larger corpora).
    */
  private[queries] def docStartOffsets(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"))
    val bucketed = docs.withColumn("bkt", expr("doc_id div 1000"))
    val wB = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bktOffsets = bucketed.groupBy("bkt").agg(sum("len").as("blen"))
      .select(col("bkt"), coalesce(sum("blen").over(wB), lit(0L)).as("boff"))
    val wD = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(bktOffsets), "bkt")
      .select(col("doc_id"), col("len"),
        (col("boff") + coalesce(sum("len").over(wD), lit(0L))).as("s0"))
  }

  /** x358 — CODE-SWITCHING audit: x15's bigram language classifier run
    * over 16-TOKEN SEGMENTS instead of whole documents, then per source:
    * how many documents MIX languages (distinct segment predictions > 1)
    * and how often adjacent segments switch — the intra-document language
    * mixing signal a whole-doc langid gate (x15) is structurally blind to
    * (a half-English half-Chinese doc argmaxes to ONE label and sails
    * through), and the signal that decides whether a multilingual corpus
    * needs segment-level routing before per-language filtering. The
    * classifier is [[LlmQueries.withLangPrediction]] — the SAME fold
    * x15/x240 use, so the gate and this audit cannot drift.
    *
    * Exactness: segments are exact token slices (i·16+1 … +16, the x159
    * split convention); scores/argmax are x15's exact length-replace
    * counts with the lexicographic tie-break; switch counts are exact
    * lag comparisons; two rounded divisions per source row (switch rate
    * over the exact adjacent-pair count n_segments − n_docs, floored at
    * 1 for the all-single-segment edge — mirrored in the oracle).
    *
    * Scale shape: one segment explode (≤ ⌈tokens/16⌉ rows per doc), the
    * codegen'd scoring scan (no UDF), one hash-partitioned lag window
    * keyed by doc_id (data-cardinality keys are fine for windows — it is
    * the LOW-cardinality key that serializes), two map-combining
    * aggregates. Corpus-token-linear.
    */
  def x358CodeSwitch(spark: SparkSession, sfDir: String): DataFrame = {
    import ExtendedQueries.stableRound6
    val segs = Io.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"), col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("source"), col("doc_id"), col("toks"),
        explode(expr("sequence(0, (size(toks) + 15) div 16 - 1)")).as("i"))
      .select(col("source"), col("doc_id"), col("i"),
        concat_ws(" ", expr("slice(toks, i * 16 + 1, 16)")).as("seg"))
    val pred = LlmQueries.withLangPrediction(segs, "seg")
    val w = Window.partitionBy("doc_id").orderBy("i")
    val perDoc = pred
      .withColumn("prev", lag("predicted", 1).over(w))
      .groupBy("source", "doc_id")
      .agg(count(lit(1)).as("n_segs"),
        countDistinct("predicted").as("n_langs"),
        sum((col("prev").isNotNull && col("prev") =!= col("predicted"))
          .cast("long")).as("n_switch"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_langs") > 1).cast("long")).as("n_mixed_docs"),
        sum("n_segs").as("n_segments"),
        sum("n_switch").as("n_switches"))
      .select(col("source"), col("n_docs"), col("n_mixed_docs"),
        col("n_segments"), col("n_switches"),
        stableRound6(col("n_mixed_docs").cast("double") /
          col("n_docs").cast("double")).as("mixed_rate"),
        stableRound6(col("n_switches").cast("double") /
          greatest(col("n_segments") - col("n_docs"), lit(1L)).cast("double"))
          .as("switch_rate"))
      .orderBy("source")
  }
}
