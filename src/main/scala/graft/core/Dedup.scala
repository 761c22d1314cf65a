package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D1 — keep-FIRST deduplication on a composite key (SURVEY §2.5; reference
  * /root/reference/flows/pipeline.py:154-156, pandas
  * `drop_duplicates(keep="first")` = first in input-file order).
  *
  * Spark's `dropDuplicates` keeps an ARBITRARY row per key (whichever the
  * partial aggregate sees first), so faithful keep-first needs an explicit
  * order column stamped BEFORE any shuffle, then a ranking window.
  *
  * Scale note: the window shuffles once on the key columns — same cost as
  * `dropDuplicates` itself (also one shuffle on the keys). For skewed keys
  * use `keepFirstAgg`: a per-key `min(_ingest_id)` two-phase aggregate plus
  * a join back, which never funnels a hot key through one sorting reducer.
  * At fixture scale the plain window is the better plan.
  */
object Dedup {

  val IngestIdCol = "_ingest_id"

  /** Stamp input order as an orderable struct. `monotonically_increasing_id`
    * alone is NOT sound: Spark packs file splits into partitions sorted by
    * size descending, so partition index does not track file order. Instead we
    * order by (file path, split byte offset, within-partition row position):
    * a single split is never divided across partitions, so the within-
    * partition id only ever breaks ties inside one split, where it does
    * increase in file order. Lexicographic struct comparison then reproduces
    * byte order of the input regardless of split packing.
    *
    * Must be called directly on a file scan (the hidden `_metadata` column
    * only resolves there), before any shuffle/repartition. Non-file sources
    * (tests, in-memory frames) fall back to `monotonically_increasing_id`,
    * which is exact for a parallelized local collection.
    */
  def stampIngestOrder(df: DataFrame): DataFrame = {
    val hasFileMetadata =
      scala.util.Try(df.select(col("_metadata.file_path"))).isSuccess
    if (hasFileMetadata)
      df.withColumn(IngestIdCol,
        struct(
          col("_metadata.file_path").as("file"),
          col("_metadata.file_block_start").as("block"),
          monotonically_increasing_id().as("pos")))
    else
      df.withColumn(IngestIdCol,
        struct(lit("").as("file"), lit(0L).as("block"),
          monotonically_increasing_id().as("pos")))
  }

  /** Keep the first row (by `orderCol`) per composite key. Key list is
    * filtered to existing columns, like the reference (pipeline.py:154-155);
    * no keys present → no-op.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val present = keys.filter(df.columns.contains)
    if (present.isEmpty) df
    else {
      val w = Window.partitionBy(present.map(col): _*).orderBy(col(orderCol).asc)
      df.withColumn("_kf_rn", row_number().over(w))
        .filter(col("_kf_rn") === 1)
        .drop("_kf_rn")
    }
  }

  /** Skew-safe keep-first: per-key min(orderCol) via a two-phase hash
    * aggregate (map-side partial combine collapses a hot key BEFORE the
    * shuffle — the single-reducer sort a ranking window would funnel that
    * key through never happens), then an equi-join back on (keys, orderCol).
    * Because the join key INCLUDES the unique order column, even the join
    * probe distributes a hot key across partitions — no single task ever
    * holds a key's full row set.
    *
    * Output is identical to `keepFirst` when `orderCol` is non-null and
    * unique per row (both hold for the `_ingest_id` stamp: the struct's
    * `pos` component is per-row unique). Ties on (keys, orderCol) would keep
    * all tied rows here where the window keeps one arbitrarily — that is
    * the contract cost of skew safety, not a dedup semantics change.
    *
    * Cost: the input lineage is consumed twice (aggregate + probe), and a
    * self-join never gets ReuseExchange — reading the source twice is the
    * standard price of the pre-aggregate pattern and is cheap next to a
    * straggler task sorting a billion-row hot key. Null keys match via <=>
    * so null-keyed groups dedup exactly like the window path.
    */
  def keepFirstAgg(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val present = keys.filter(df.columns.contains)
    if (present.isEmpty) df
    else {
      // collision-proof internal prefix: a fixed "_kf_" would break (or
      // silently drop a caller column) when df itself carries _kf_-named
      // columns, e.g. preserved intermediates of an earlier dedup stage
      val existing = df.columns.toSet
      val tag = Iterator.from(0).map(i => s"_kf${i}_")
        .find(t => !existing.exists(_.startsWith(t))).get
      val minCol = s"${tag}min"
      val mins = df.groupBy(present.map(col): _*)
        .agg(min(col(orderCol)).as(minCol))
      val renamedMins = present.foldLeft(mins) { (m, k) =>
        m.withColumnRenamed(k, s"$tag$k")
      }
      val cond = present.map(k => col(k) <=> col(s"$tag$k"))
        .reduce(_ && _) && (col(orderCol) === col(minCol))
      df.join(renamedMins, cond)
        .drop(minCol +: present.map(k => s"$tag$k"): _*)
    }
  }

  /** Reference-exact composite key + stamped-order variant: dedup on
    * (timestamp, receiving_address, transaction_type, amount) keeping first
    * input row. Requires `stampIngestOrder` to have run at scan time.
    */
  def keepFirstByIngestOrder(df: DataFrame): DataFrame = {
    require(df.columns.contains(IngestIdCol),
      s"call stampIngestOrder at scan time before keepFirstByIngestOrder")
    keepFirst(df,
      Seq("timestamp", "receiving_address", "transaction_type", "amount"),
      IngestIdCol)
  }
}
