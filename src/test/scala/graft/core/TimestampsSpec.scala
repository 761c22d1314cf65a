package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** T1–T4 semantics: unit thresholds at the 1e11/1e14/1e17 boundaries,
  * numeric-looking vacuity, exact long ns→µs truncation, string coercion
  * (reference /root/reference/flows/pipeline.py:25-37,130-141).
  */
class TimestampsSpec extends SparkSpec {
  import spark.implicits._

  private def unitOf(vals: Seq[java.lang.Double]): String =
    Timestamps.detectEpochUnit(vals.toDF("ts"), "ts")

  test("detectEpochUnit thresholds are strict greater-than") {
    assert(unitOf(Seq(1.7e9)) == "s")    // 2023 in seconds
    assert(unitOf(Seq(1e11)) == "s")     // boundary itself: NOT > 1e11
    assert(unitOf(Seq(1.0000001e11)) == "ms")
    assert(unitOf(Seq(1.7e12)) == "ms")  // 2023 in millis
    assert(unitOf(Seq(1e14)) == "ms")
    assert(unitOf(Seq(1.0000001e14)) == "us")
    assert(unitOf(Seq(1.7e15)) == "us")
    assert(unitOf(Seq(1e17)) == "us")
    assert(unitOf(Seq(1.0000001e17)) == "ns")
    assert(unitOf(Seq(1.7e18)) == "ns")  // 2023 in nanos
  }

  test("detectEpochUnit: median over mixed magnitudes; abs() applied") {
    assert(unitOf(Seq(1.7e9, 1.7e9, 1.7e18)) == "s")  // median picks majority
    assert(unitOf(Seq(-1.7e12, -1.7e12, 1.0)) == "ms") // abs before median
  }

  test("detectEpochUnit: empty / all-null defaults to seconds") {
    assert(unitOf(Seq.empty[java.lang.Double]) == "s")
    assert(unitOf(Seq(null.asInstanceOf[java.lang.Double])) == "s")
  }

  test("looksNumeric: numeric dtype, digit strings, vacuous empty") {
    import org.apache.spark.sql.DataFrame
    def ln(df: DataFrame) = Timestamps.looksNumeric(df, "ts")
    assert(ln(Seq(1L, 2L).toDF("ts")))
    assert(ln(Seq("1700000000", "1700000001.5").toDF("ts")))
    assert(!ln(Seq("2024-01-01", "123").toDF("ts")))
    assert(ln(Seq.empty[String].toDF("ts")))            // pandas .all() vacuity
    assert(ln(Seq(null.asInstanceOf[String]).toDF("ts")))
  }

  test("epochToTimestamp long paths are exact, ns truncates to µs") {
    val df = Seq(1700000000123456789L).toDF("v")
    def us(unit: String): Long =
      collectSingle[Long](df.select(unix_micros(
        Timestamps.epochToTimestamp(col("v"), unit, df.schema("v").dataType))))
    assert(us("ns") == 1700000000123456L) // exact integral div, not double
    val secs = Seq(1700000000L).toDF("v")
    assert(collectSingle[Long](secs.select(unix_micros(
      Timestamps.epochToTimestamp(col("v"), "s", secs.schema("v").dataType))))
      == 1700000000000000L)
    assert(collectSingle[Long](secs.select(unix_micros(
      Timestamps.epochToTimestamp(col("v"), "ms", secs.schema("v").dataType))))
      == 1700000000000L)
    assert(collectSingle[Long](secs.select(unix_micros(
      Timestamps.epochToTimestamp(col("v"), "us", secs.schema("v").dataType))))
      == 1700000000L)
  }

  test("epochToTimestamp string input goes through numeric coercion") {
    val df = Seq("1700000000", "garbage").toDF("v")
    val out = col0(df.select(unix_micros(
      Timestamps.epochToTimestamp(col("v"), "s", df.schema("v").dataType))))
    assert(out == Seq(1700000000000000L, null))
  }

  test("stringToTimestamp coerces bad strings to null") {
    val df  = Seq("2024-01-02 03:04:05", "not a time").toDF("v")
    val out = col0(df.select(Timestamps.stringToTimestamp(col("v"))))
    assert(out == Seq(Timestamp.valueOf("2024-01-02 03:04:05"), null))
  }

  test("parseTimestampColumn: missing column synthesizes all-null timestamps") {
    val out = Timestamps.parseTimestampColumn(Seq(1).toDF("x"), "timestamp")
    assert(out.schema("timestamp").dataType.typeName == "timestamp")
    assert(out.select("timestamp").collect().head.isNullAt(0))
  }

  test("parseTimestampColumn: numeric column detects unit; string column parses") {
    val num = Timestamps.parseTimestampColumn(Seq(1700000000L).toDF("timestamp"))
    assert(collectSingle[Long](num.select(unix_micros(col("timestamp"))))
      == 1700000000000000L)
    val str = Timestamps.parseTimestampColumn(
      Seq("2024-01-02 03:04:05", "bogus").toDF("timestamp"))
    assert(col0(str.select(col("timestamp")))
      == Seq(Timestamp.valueOf("2024-01-02 03:04:05"), null))
  }
}
