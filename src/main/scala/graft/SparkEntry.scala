package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.r4GroupAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_clean_standardize" -> (ReferenceQueries.r1CleanStandardize _),
    "r2_dq_profile"        -> (ReferenceQueries.r2DqProfile _),
    "r3_dedup_keep_first"  -> (ReferenceQueries.r3DedupKeepFirst _),
    "r4_group_avg"         -> (ReferenceQueries.r4GroupAvg _),
    "r5_latest_per_key"    -> (ReferenceQueries.r5LatestPerKey _),
    "r6_topk"              -> (ReferenceQueries.r6TopK _),
    "r7_epoch_roundtrip"   -> (ReferenceQueries.r7EpochRoundtrip _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.rGroup
}
