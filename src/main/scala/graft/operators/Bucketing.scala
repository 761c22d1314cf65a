package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables — the cluster-scale tool for repeated equi-joins
  * and aggregations on one key: pay the hash-distribution ONCE at write
  * time (`bucketBy` routes every row to a deterministic bucket file by
  * hash(key) % n), and afterwards any join or aggregation between tables
  * bucketed on the same key with the same bucket count plans with NO
  * shuffle Exchange at all — the scan itself already satisfies the
  * operator's required distribution. At 100 TB this converts every
  * fact-to-fact equi-join from a full-corpus shuffle into a zip of
  * co-numbered bucket files, and `sortBy` additionally pre-orders each
  * bucket so sort-merge joins skip their sort.
  *
  * This is the materialized-table analog of what x20/x32's scaladocs call
  * "the staging table a cluster run would write": dedup canonical maps,
  * IVF list assignments, and shingle inventories are all written bucketed
  * by their join key exactly so the downstream pipeline never re-shuffles
  * the corpus. BucketingSpec pins the no-Exchange property in CI.
  */
object Bucketing {

  /** Write `df` as a managed table bucketed (and in-bucket sorted) on
    * `key`. Bucket count is a physical layout constant: pick it so one
    * bucket ≈ one task's worth of data at the target scale; both sides of
    * a co-located join must use the SAME count.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // A fresh session's in-memory catalog doesn't know tables written by a
    // PREVIOUS JVM, but their warehouse directories persist — saveAsTable
    // then fails with LOCATION_ALREADY_EXISTS on a location it doesn't
    // own. Drop what the catalog knows AND delete the stale location, so
    // re-running in any session is idempotent.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    // Pre-distribute by the bucket expression so each write task holds
    // exactly one bucket: repartition(n, col) and bucketBy(n, col) share
    // HashPartitioning's pmod(murmur3, n), so without this every input
    // partition writes a file into EVERY bucket — scan splits × buckets
    // small files (256 at local[32] for an 8-bucket table), paying listing
    // + footer + task overhead on every read of the table (guide §6). With
    // it the table is exactly `buckets` files, and the write-side shuffle
    // is the hash distribution a bucketed write is supposed to pay once.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Write `df` partition-pruned by a low-cardinality column: each distinct
    * value becomes a directory, and a reader filtering on that column scans
    * ONLY its directories (PartitionFilters in the plan, zero I/O for the
    * rest). The standard layout for lang/date-keyed corpora; combine with
    * bucketing for prune-then-colocate.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)
}
