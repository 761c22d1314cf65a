package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adaptive timestamp ingestion (SURVEY §2.3; reference
  * /root/reference/flows/pipeline.py:25-37,130-141).
  *
  * The one genuinely "custom" operator in the reference: a global statistic
  * (median magnitude) picks the epoch unit, then the column converts. The
  * Spark shape is the same: one cheap driver-side aggregation action over a
  * single column, then a declarative per-row conversion that stays in
  * codegen.
  */
object Timestamps {

  /** T1 — epoch-unit detection: median(abs(numeric values)); thresholds
    * >1e17→ns, >1e14→us, >1e11→ms, else s; empty/all-null→s
    * (pipeline.py:25-37). Approximate median (`percentile_approx`): exact
    * percentile buffers every value per partition — a scale-killer at 100 TB
    * for a statistic that only needs order-of-magnitude accuracy. The
    * approximation returns an actual data value, so it can only differ from
    * the exact median when values straddle a 1000× unit threshold, where the
    * reference's single-unit model is ill-defined anyway.
    */
  def detectEpochUnit(df: DataFrame, colName: String): String =
    detectEpochUnits(df, Seq(colName))(colName)

  /** Multi-column T1 in ONE aggregation job: when several candidate epoch
    * columns need unit detection (r7 probes all four units at once), a
    * per-column `first()` would launch one full scan each — this fuses them
    * into a single pass, which is the only acceptable shape at 100 TB.
    */
  def detectEpochUnits(df: DataFrame, colNames: Seq[String]): Map[String, String] = {
    val row = df
      .select(colNames.map(c => expr(
        s"percentile_approx(abs(try_cast(`$c` as double)), 0.5d, 10000)").as(c)): _*)
      .first()
    colNames.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(i)) "s"
            else {
              val m = row.getDouble(i)
              if (m > 1e17) "ns" else if (m > 1e14) "us" else if (m > 1e11) "ms" else "s"
            })
    }.toMap
  }

  /** T2 — "looks numeric": numeric dtype OR every non-null value matches
    * ^\d+(\.\d+)?$ (pipeline.py:133). pandas `.all()` over an empty series is
    * vacuously true → the numeric path; `isEmpty` preserves that.
    */
  def looksNumeric(df: DataFrame, colName: String): Boolean =
    df.schema(colName).dataType match {
      case _: NumericType => true
      case _ =>
        df.filter(
            col(colName).isNotNull &&
              !col(colName).cast("string").rlike("^\\d+(\\.\\d+)?$"))
          .isEmpty
    }

  /** T3 — epoch number → TimestampType at the given unit (pipeline.py:137).
    *
    * Integral inputs use exact long arithmetic (pandas keeps int64 → exact);
    * only string/float inputs go through double coercion, mirroring
    * `pd.to_numeric`. This matters for ns epochs: a double only resolves
    * ~256 ns at 2024 magnitudes, so the long path is required for
    * truncation-exact ns→µs.
    */
  def epochToTimestamp(c: Column, unit: String, dt: DataType): Column = {
    val integral = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    if (integral) {
      // Exact long arithmetic; `div` is SQL integral division (truncating),
      // matching DuckDB's ns→µs truncation bit-for-bit.
      val v = c.cast("long")
      unit match {
        case "s"  => timestamp_seconds(v)
        case "ms" => timestamp_millis(v)
        case "us" => timestamp_micros(v)
        case "ns" => timestamp_micros(call_function("div", v, lit(1000L)))
      }
    } else {
      val n = Normalize.tryNum(c)
      unit match {
        case "s"  => timestamp_seconds(n)
        case "ms" => timestamp_micros((n * 1000).cast("long"))
        case "us" => timestamp_micros(n.cast("long"))
        case "ns" => timestamp_micros((n / 1000).cast("long"))
      }
    }
  }

  /** T4 — string → timestamp with coerce-to-null (pandas
    * `to_datetime(errors="coerce")`; pipeline.py:139). `try_to_timestamp`,
    * NOT `to_timestamp`, which throws under ANSI.
    */
  def stringToTimestamp(c: Column): Column = try_to_timestamp(c)

  /** The full reference rule for a raw timestamp column
    * (pipeline.py:130-141): missing → all-null; numeric-looking → unit
    * detection + epoch conversion; otherwise string parse with coercion.
    */
  def parseTimestampColumn(df: DataFrame, colName: String = "timestamp"): DataFrame =
    if (!df.columns.contains(colName))
      df.withColumn(colName, lit(null).cast("timestamp"))
    else if (looksNumeric(df, colName)) {
      val unit = detectEpochUnit(df, colName)
      df.withColumn(colName, epochToTimestamp(col(colName), unit, df.schema(colName).dataType))
    } else
      df.withColumn(colName, stringToTimestamp(col(colName).cast("string")))
}
