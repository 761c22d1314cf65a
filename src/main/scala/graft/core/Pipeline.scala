package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-equivalent end-to-end flow (SURVEY §0, §2.9; reference
  * /root/reference/flows/pipeline.py:222-265):
  *
  *   ingest CSV → DQ pre-gate (on the RAW frame, before name normalization)
  *   → clean & standardize → DQ post-gate → business transforms → publish.
  *
  * The driver program IS the orchestration (no Prefect analog needed): plain
  * function composition, with the gates' publish-before-throw ordering
  * preserved. All transforms are lazy DataFrames; jobs trigger only at the
  * same five points the reference materializes (two DQ profiles, the
  * epoch-unit median, and the writes).
  */
object Pipeline {

  final case class Result(
      staged: DataFrame,
      regionRiskAvg: DataFrame,
      lastSalePerAddress: DataFrame,
      top3RecentSales: DataFrame,
      dqPre: Quality.DqMetrics,
      dqPost: Quality.DqMetrics)

  /** S1 — headered CSV scan with schema inference (pipeline.py:41-47), with
    * input order stamped immediately so keep-first dedup stays faithful.
    * String columns get pandas' default NA tokens null-coded (the reference
    * ingests via pd.read_csv, whose na_values turn "None"/"NULL"/"NaN"/…
    * into NaN BEFORE the pre-clean DQ profile runs — see
    * Normalize.PandasNaTokens; pinned by DifferentialRefSpec).
    */
  def ingestCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    val naCoded = raw.select(raw.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        Normalize.pandasNaToNull(col(f.name)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
    Dedup.stampIngestOrder(naCoded)
  }

  /** pipeline.py:112-160 — the full clean_and_standardize task. Every access
    * is guarded on column presence; missing timestamp/amount synthesize as
    * all-null (P4).
    */
  def clean(df0: DataFrame): DataFrame = {
    var df = Normalize.normalizeNames(df0)

    if (df.columns.contains("receiving_address"))
      df = df.withColumn("receiving_address", Normalize.normAddress(col("receiving_address")))
    if (df.columns.contains("transaction_type"))
      df = df.withColumn("transaction_type", Normalize.normTransactionType(col("transaction_type")))
    if (df.columns.contains("location_region"))
      df = df.withColumn("location_region", Normalize.normRegion(col("location_region")))

    df = Timestamps.parseTimestampColumn(df, "timestamp")

    df =
      if (df.columns.contains("amount"))
        df.withColumn("amount", Normalize.tryNum(col("amount")))
      else df.withColumn("amount", lit(null).cast("double"))
    if (df.columns.contains("risk_score"))
      df = df.withColumn("risk_score", Normalize.tryNum(col("risk_score")))

    df = df.na.drop(Seq("timestamp", "transaction_type", "amount").filter(df.columns.contains))
      .filter(col("amount") >= 0)

    Dedup.keepFirstByIngestOrder(df)
  }

  /** A1/O1/F3 — avg risk per region, desc (pipeline.py:178-186). At scale
    * this is a two-phase hash aggregate (map-side partial) + a final sort.
    */
  def regionRiskAvg(staged: DataFrame): DataFrame =
    staged
      .filter(col("location_region").isNotNull)
      .groupBy("location_region")
      .agg(avg("risk_score").as("avg_risk_score"))
      .orderBy(desc("avg_risk_score"))

  /** W1/F4/F5 — latest 'sale' per receiving_address (pipeline.py:189-203).
    * The reference's `order by timestamp desc` is tie-nondeterministic; we
    * stabilize with the ingest id (first-ingested wins ties), which changes
    * nothing when timestamps are unique.
    */
  def lastSalePerAddress(staged: DataFrame): DataFrame = {
    val orderCols =
      if (staged.columns.contains(Dedup.IngestIdCol))
        Seq(col("timestamp").desc, col(Dedup.IngestIdCol).asc)
      else Seq(col("timestamp").desc)
    val w = Window.partitionBy("receiving_address").orderBy(orderCols: _*)
    staged
      .filter(col("transaction_type") === "sale")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("receiving_address", "amount", "timestamp")
  }

  /** O2 — top-3 by amount (pipeline.py:205-211). `orderBy.limit` plans as
    * TakeOrderedAndProject: per-partition top-k + driver merge, no full sort.
    */
  def top3RecentSales(lastSales: DataFrame): DataFrame =
    lastSales.orderBy(desc("amount")).limit(3)

  /** Full flow with both quality gates. `dataDir` receives the DQ JSONs and
    * parquet "tables" (our analog of the reference's results.duckdb);
    * `curatedDir` the two CSV exports (pipeline.py:214-215). Gate failures
    * throw QualityGateException AFTER publishing inspection artifacts,
    * matching pipeline.py:235-261.
    */
  def run(
      spark: SparkSession,
      inputCsv: String,
      dataDir: String,
      curatedDir: String,
      minConformityPre: Double = 0.98,
      minConformityPost: Double = 0.995): Result = {

    new java.io.File(dataDir).mkdirs()
    new java.io.File(curatedDir).mkdirs()

    val raw = ingestCsv(spark, inputCsv)

    // DQ pre-gate runs on the RAW frame — before name normalization, so a
    // CSV with "Timestamp " produces no timestamp rule (pipeline.py:232).
    val dqPre = Quality.profile(raw.drop(Dedup.IngestIdCol), "pre_clean")
    writeString(s"$dataDir/dq_metrics_pre.json", Quality.toJson(dqPre))
    if (dqPre.conformityRate < minConformityPre) {
      // publish a raw snapshot for inspection, THEN fail (pipeline.py:236-247)
      raw.drop(Dedup.IngestIdCol).write.mode("overwrite").parquet(s"$dataDir/raw_snapshot")
      Quality.gate(dqPre, minConformityPre)
    }

    val staged = clean(raw)

    val dqPost = Quality.profile(staged.drop(Dedup.IngestIdCol), "post_clean")
    writeString(s"$dataDir/dq_metrics_post.json", Quality.toJson(dqPost))

    val result = publish(staged, dataDir, curatedDir, dqPre, dqPost)
    Quality.gate(dqPost, minConformityPost) // post-gate publishes FIRST, then fails
    result
  }

  private def publish(
      staged: DataFrame,
      dataDir: String,
      curatedDir: String,
      dqPre: Quality.DqMetrics,
      dqPost: Quality.DqMetrics): Result = {
    val stg = staged.drop(Dedup.IngestIdCol)
    // Reuse the cleaned frame across the three downstream queries instead of
    // recomputing the scan+clean per query (cache is dropped by session end;
    // at 100 TB this would be a written staging table instead).
    stg.cache()
    stg.write.mode("overwrite").parquet(s"$dataDir/stg_transactions")

    val region = regionRiskAvg(stg)
    val last   = lastSalePerAddress(staged).drop(Dedup.IngestIdCol)
    val top3   = top3RecentSales(last)

    region.write.mode("overwrite").parquet(s"$dataDir/region_risk_avg")
    last.write.mode("overwrite").parquet(s"$dataDir/last_sale_per_address")
    top3.write.mode("overwrite").parquet(s"$dataDir/top3_recent_sales_by_receiving")

    // S4 — single-file headered CSV exports with the reference's exact file
    // names, order baked in (pipeline.py:214-215)
    Io.writeSingleCsv(region, s"$curatedDir/region_risk_avg.csv")
    Io.writeSingleCsv(top3, s"$curatedDir/top3_recent_sales_by_receiving.csv")

    // every consumer of the cached frame has executed; release it so
    // repeated flows in one session (tests, notebooks) don't stack cache.
    // Result's DataFrames stay valid — re-use just recomputes (or, cheaper,
    // re-reads the parquet published above).
    stg.unpersist()
    Result(stg, region, last, top3, dqPre, dqPost)
  }

  private def writeString(path: String, s: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), s)
}
