package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup by content hash — the streaming face of the batch
  * dedup family (x10 exact / x13 MinHash / x19 SimHash / x28 cosine): an
  * ingestion stream drops documents whose text was already seen, keeping
  * state only as long as the watermark requires.
  *
  * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is the
  * scale choice: unbounded-key dedup state on a 100 TB document stream
  * grows forever, while within-watermark state is bounded by the delay
  * window — the standard trade: exact within the window, best-effort
  * across windows. Keying on md5(text) instead of text keeps per-entry
  * state at 32 bytes regardless of document size.
  */
object StreamingDedup {

  /** Deduplicate a document stream on the md5 of `textCol`, tolerating
    * events up to `delay` late. `eventTimeCol` must be a timestamp column.
    *
    * NULL-text rows bypass the dedup state entirely and pass through: md5
    * of null is null, and `dropDuplicatesWithinWatermark` treats null keys
    * as EQUAL — without the split, every null-text document after the first
    * would be silently dropped by an ingestion utility. Null payloads are
    * distinct documents (to be routed/repaired downstream), not duplicates
    * of each other.
    */
  def byContentHash(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      delay: String): DataFrame = {
    val keyed = docs.withColumn("text_md5", md5(col(textCol)))
    val deduped = keyed
      .filter(col("text_md5").isNotNull)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("text_md5")
    deduped
      .union(keyed.filter(col("text_md5").isNull))
      .drop("text_md5") // internal key — return the caller's own schema
  }
}
