package graft.queries

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group R — reference-derived semantics on the `events` fixture (SURVEY
  * §2.10). Role mapping: ts→timestamp, event_type→transaction_type
  * ('purchase' plays 'sale'), value→amount, user_id→receiving_address,
  * event_id→explicit keep-first order key / deterministic tie-breaker.
  *
  * Determinism contract (shared with the DuckDB oracles): every query ends
  * in a total ORDER BY with a unique key, doubles are round(x, 6), and
  * timestamps are exported as epoch-millis BIGINT (`unix_millis` here,
  * `epoch_ms` in DuckDB — both truncate µs→ms identically).
  */
object ReferenceQueries {

  /** r1 — P1–P3/T4/F1/F2: clean & standardize, drop nulls and negatives. */
  def r1CleanStandardize(spark: SparkSession, sfDir: String): DataFrame =
    Io.events(spark, sfDir)
      .withColumn("event_type", Normalize.normTransactionType(col("event_type")))
      .withColumn("value", Normalize.tryNum(col("value")))
      .na.drop(Seq("ts", "event_type", "value"))
      .filter(col("value") >= 0)
      .select(
        col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("user_id"),
        col("event_type"),
        round(col("value"), 6).as("value"))
      .orderBy("event_id")

  /** r2 — A2–A5: the whole DQ profile as ONE aggregation job, role-mapped
    * onto events. Conformity keeps the reference's double-counting and
    * +1e-9 epsilon (pipeline.py:88-89).
    */
  def r2DqProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val mapped = Io.events(spark, sfDir).select(
      col("ts").as("timestamp"),
      col("event_type").as("transaction_type"),
      col("value").as("amount"),
      col("user_id").cast("string").as("receiving_address"))
    val m = Quality.profile(mapped, "events")
    import spark.implicits._
    Seq((
      m.totalRows,
      m.nulls("timestamp"),
      m.nulls("transaction_type"),
      m.nulls("amount"),
      m.nulls("receiving_address"),
      m.ruleViolations("amount_non_negative"),
      m.failedRowsEstimate,
      BigDecimal(m.conformityRate).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    )).toDF(
      "total_rows", "n_null_timestamp", "n_null_transaction_type",
      "n_null_amount", "n_null_receiving_address", "v_amount_negative",
      "failed_rows_estimate", "conformity_rate")
  }

  /** r3 — D1: keep-first dedup per (user_id, event_type), first = lowest
    * event_id (the explicit, deterministic order key).
    */
  def r3DedupKeepFirst(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.keepFirst(Io.events(spark, sfDir), Seq("user_id", "event_type"), "event_id")
      .select(
        col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("user_id"),
        col("event_type"),
        round(col("value"), 6).as("value"))
      .orderBy("event_id")

  /** r4 — A1/O1/F3: avg(value) per event_type desc (region_risk_avg
    * analog). The mean is computed from an exact decimal sum and rounded
    * bit-deterministically: a plain double avg is summation-order-dependent
    * (Spark's partial merge vs DuckDB's sequential scan), and group sizes
    * of the form 2^a·5^b make exactly-on-the-rounding-boundary means
    * reachable — the x16 divergence class.
    */
  def r4GroupAvg(spark: SparkSession, sfDir: String): DataFrame =
    Io.events(spark, sfDir)
      .filter(col("event_type").isNotNull)
      .groupBy("event_type")
      .agg(ExtendedQueries.stableRound6(ExtendedQueries.exactAvg(col("value")))
        .as("avg_value"))
      .orderBy(desc("avg_value"), col("event_type"))

  /** r5 — W1/F4/F5: latest 'purchase' per user (row_number, ts desc with
    * event_id desc tie-break — the reference's query is tie-nondeterministic;
    * ours is total).
    */
  def r5LatestPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Io.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        round(col("value"), 6).as("value"),
        unix_millis(col("ts")).as("ts_ms"),
        col("event_id"))
      .orderBy("user_id")

  }

  /** r6 — O2: top-3 of r5 by value desc (plans as TakeOrderedAndProject —
    * per-partition top-k, no full sort).
    */
  def r6TopK(spark: SparkSession, sfDir: String): DataFrame =
    r5LatestPerKey(spark, sfDir)
      .orderBy(desc("value"), col("user_id"))
      .limit(3)

  /** r7 — T1/T3: epoch-unit detection on the raw nanosecond longs (median
    * magnitude ⇒ 'ns'), conversion, and a ms→µs round trip. The detected
    * unit is emitted so the oracle asserts the detection itself.
    */
  def r7EpochRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val raw  = Io.eventsRaw(spark, sfDir)
    val unit = Timestamps.detectEpochUnit(raw, "ts")
    val ts   = Timestamps.epochToTimestamp(col("ts"), unit, raw.schema("ts").dataType)
    raw
      .withColumn("ts2", ts)
      .select(
        col("event_id"),
        lit(unit).as("detected_unit"),
        unix_millis(col("ts2")).as("ts_ms"),
        unix_micros(timestamp_millis(unix_millis(col("ts2")))).as("ts_us_roundtrip"))
      .orderBy("event_id")
  }
}
