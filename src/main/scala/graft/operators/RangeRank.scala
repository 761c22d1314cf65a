package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Exact per-key ranking with parallelism DECOUPLED from key cardinality —
  * the scale path for the one window shape whose hash-partitioned plan
  * serializes on low-cardinality keys (x220's documented ceiling: a
  * ranking window over 3 returnflags sorts the corpus in 3 tasks), and —
  * with a constant key — for the GLOBAL rank over an unbounded frame
  * (x129's shingle vocabulary), where `row_number() OVER (ORDER BY …)`
  * would sort the whole frame in ONE task.
  *
  * Two-pass distributed ranking (the classic global-sort offset scheme,
  * applied per key):
  *   1. range-partition on (key ++ order) — a key's rows may SPAN many
  *      partitions, each holding a contiguous run of its order — and sort
  *      within partitions;
  *   2. count rows per (partition, key): a METADATA-sized frame
  *      (≤ partitions + keys − 1 entries, because partitions hold
  *      contiguous key runs), collected and turned into per-(partition,
  *      key) starting offsets, broadcast back;
  *   3. one mapPartitions sweep assigns rank = offset + local position.
  *
  * Output ranks equal `row_number() OVER (PARTITION BY key ORDER BY
  * order)` for any TOTAL order (callers must supply a unique tie-break) —
  * independent of where the sampled range boundaries fall: boundaries move
  * rows between partitions, never offsets + positions. Wall-clock scales
  * with the partition count, not |keys|.
  *
  * CONTRACT: the key domain must be constant-or-small (a flag, a source
  * column — every declared consumer). Pass 1 counts its own entries
  * and fails fast past [[MaxKeyPartitionEntries]] with an error naming
  * the alternative (a hash-partitioned ranking window), so a future
  * caller passing doc_id gets a diagnosis instead of a driver OOM.
  *
  * The sorted RDD is persisted (MEMORY_AND_DISK) because both passes
  * consume it — the standard cache-or-double-sort trade of two-pass
  * ranking. A lazy result can't unpersist its own input (the sweep
  * executes after this returns), so ownership of the pin lives OUTSIDE
  * the result: [[rankWithinOwned]] hands the caller a [[Ranking]] whose
  * `release()` frees the sorted input — call it after the result has
  * been materialized (count/persist/write). Each ranking's pin has ONE
  * owner, so interleaved rankings can never evict each other mid-flight
  * (the r9/r10 advice hazard of the deleted rotation-pinned form, pinned
  * by RangeRankSpec's interleaving test). Releasing BEFORE materializing
  * is still correct — the sweep then recomputes the range sort from
  * deterministic shuffle replay (fixed sampling seed over deterministic
  * input) — it just pays the sort twice.
  */
object RangeRank {

  /** A ranking plus ownership of its persisted sorted input. */
  final class Ranking private[RangeRank] (
      val df: DataFrame,
      private[RangeRank] val pin: org.apache.spark.rdd.RDD[Row]) {
    /** Free the sorted input's cached blocks. Call AFTER materializing
      * `df`; afterwards re-executing `df` recomputes the sort. */
    def release(): Unit = pin.unpersist(blocking = false)
  }

  /** Pass-1 bookkeeping ceiling (entries = partitions + distinct keys − 1,
    * because range partitions hold contiguous key runs). Every declared
    * consumer passes a constant or ≤|sources| key domain, so legitimate
    * entry counts are ~partitions + tens; 1M entries is still only ~tens
    * of MB of driver tuples, far below collect-OOM, but three orders of
    * magnitude past any designed use — a caller that trips it has passed a
    * data-cardinality key (doc_id) and needs a different operator. */
  val MaxKeyPartitionEntries: Long = 1L << 20

  def rankWithinOwned(df: DataFrame, keyCol: String, orderCols: Seq[String],
      rankName: String, numPartitions: Int = 0,
      maxKeyPartitionEntries: Long = MaxKeyPartitionEntries): Ranking = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    import org.apache.spark.sql.functions.col
    val sortCols = (keyCol +: orderCols).map(col)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // key identity for the bookkeeping maps: NULL must not collide with
    // the literal string "null" (a bare String.valueOf would merge their
    // rank groups), so non-null keys carry a prefix no NULL marker shares
    def keyOf(r: Row): String =
      if (r.isNullAt(keyIdx)) "\u0000" else "v" + r.get(keyIdx)
    // pass 1: per-(partition, key) counts — metadata-sized by construction
    val countsRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        val k = keyOf(r)
        m.update(k, m.getOrElse(k, 0L) + 1L)
      }
      m.iterator.map { case (k, c) => (pid, k, c) }
    }
    // fail-fast cardinality guard (verdict r11 #2): "metadata-sized" is a
    // CONTRACT on the caller's key domain, not a property of the operator —
    // an eighth caller passing doc_id would turn the collect below into a
    // silent driver OOM with no error naming the cause. The distributed
    // count() is a cheap re-tally over the persisted sorted input; the
    // guard trips long before driver memory is at risk.
    val nEntries = countsRdd.count()
    if (nEntries > maxKeyPartitionEntries) {
      rdd.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"RangeRank.rankWithinOwned: pass-1 bookkeeping has $nEntries " +
        s"(partition, key) entries (> $maxKeyPartitionEntries). '$keyCol' " +
        "is a data-cardinality key; this operator's driver-side offset " +
        "scheme is for constant-or-small key domains (a flag, a source). " +
        "Use row_number() OVER (PARTITION BY key) instead - with many " +
        "distinct keys the hash-partitioned window already parallelizes.")
    }
    val counts = countsRdd.collect()
    val perKeyRunning = scala.collection.mutable.Map.empty[String, Long]
    val offsets: Map[(Int, String), Long] =
      counts.sortBy(_._1).map { case (pid, k, c) =>
        val start = perKeyRunning.getOrElse(k, 0L)
        perKeyRunning.update(k, start + c)
        ((pid, k), start)
      }.toMap
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: sweep each sorted partition — rank = offset + local position
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var curKey: String = null
      var pos = 0L
      it.map { r =>
        val k = keyOf(r)
        if (k != curKey) { curKey = k; pos = 0L }
        pos += 1L
        Row.fromSeq(r.toSeq :+ (bOffsets.value.getOrElse((pid, k), 0L) + pos))
      }
    }
    val outSchema = StructType(sorted.schema.fields :+
      StructField(rankName, LongType, nullable = false))
    new Ranking(spark.createDataFrame(ranked, outSchema), rdd)
  }
}
