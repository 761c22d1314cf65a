package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Exact per-key ranking with parallelism DECOUPLED from key cardinality —
  * the scale path for the one window shape whose hash-partitioned plan
  * serializes on low-cardinality keys (x220's documented ceiling: a
  * ranking window over 3 returnflags sorts the corpus in 3 tasks).
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
  * The sorted RDD is persisted (MEMORY_AND_DISK) because both passes
  * consume it — the standard cache-or-double-sort trade of two-pass
  * ranking. A lazy result can't unpersist its own input (the sweep
  * executes after this returns), so each call releases the PREVIOUS
  * call's pin instead — the leak is bounded at one ranking's sorted
  * input, not one per call (LlmQueries' repin discipline).
  */
object RangeRank {

  private val lastPinned =
    new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.rdd.RDD[Row]]()

  def rankWithin(df: DataFrame, keyCol: String, orderCols: Seq[String],
      rankName: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val sortCols = (keyCol +: orderCols).map(col)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val prev = lastPinned.getAndSet(rdd)
    if (prev != null && (prev ne rdd)) prev.unpersist(blocking = false)
    // pass 1: per-(partition, key) counts — metadata-sized by construction
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        val k = String.valueOf(r.get(keyIdx))
        m.update(k, m.getOrElse(k, 0L) + 1L)
      }
      m.iterator.map { case (k, c) => (pid, k, c) }
    }.collect()
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
        val k = String.valueOf(r.get(keyIdx))
        if (k != curKey) { curKey = k; pos = 0L }
        pos += 1L
        Row.fromSeq(r.toSeq :+ (bOffsets.value.getOrElse((pid, k), 0L) + pos))
      }
    }
    val outSchema = StructType(sorted.schema.fields :+
      StructField(rankName, LongType, nullable = false))
    spark.createDataFrame(ranked, outSchema)
  }
}
