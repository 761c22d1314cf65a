package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift canary (round-7 postmortem): the driver's events fixture
  * has shipped `ts` as parquet TIMESTAMP(NANOS) longs AND as µs timestamps,
  * and a reader hard-coded to one vintage silently killed 24 queries. This
  * spec synthesizes BOTH vintages and proves `Io.events` / `Io.eventsRaw`
  * return the identical logical view for each:
  *
  *   - events:    ts is µs-precision TimestampType
  *   - eventsRaw: ts is the epoch-ns long, == DuckDB's epoch_ns(ts)
  *
  * The ns vintage is written as a plain INT64 column (Spark cannot author
  * TIMESTAMP(NANOS) annotations; with the nanosAsLong conf the annotated
  * fixture surfaced as exactly this LongType shape, so the reader branch
  * under test is the same one).
  */
class IoVintageSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // 2024-01-01T00:00:07.179575Z in each unit; second row exercises a
  // non-zero sub-ms µs remainder.
  private val micros = Seq(1704067207179575L, 1704067432824425L)

  // deleteOnExit can't remove a non-empty directory, so the parquet written
  // under it would leak each run — track the dirs and delete recursively.
  private val tmpDirs = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_vintage_$name")
    tmpDirs += d
    s"$d/events.parquet"
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    super.afterAll()
  }

  private def writeVintage(path: String, tsCol: org.apache.spark.sql.Column,
      tsType: DataType): Unit = {
    val base = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, micros(0), 10L, "click", 1.5, "{}"),
        Row(2L, micros(1), 11L, "purchase", 2.5, "{}")),
      StructType(Seq(
        StructField("event_id", LongType), StructField("us", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    base.select(col("event_id"), tsCol.cast(tsType).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def check(sfDir: String): Unit = {
    val ev = Io.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(col0[Long](ev.orderBy("event_id").select(unix_micros(col("ts"))))
      === micros)
    val raw = Io.eventsRaw(spark, sfDir)
    assert(raw.schema("ts").dataType === LongType)
    assert(col0[Long](raw.orderBy("event_id").select(col("ts")))
      === micros.map(_ * 1000L))
  }

  test("ns-long vintage (legacy fixture shape) reads to the same view") {
    val path = tmp("ns")
    writeVintage(path, col("us") * 1000L, LongType)
    check(path.stripSuffix("/events.parquet"))
  }

  test("µs-timestamp NTZ vintage (current fixture shape) reads to the same view") {
    val path = tmp("ntz")
    writeVintage(path, timestamp_micros(col("us")), TimestampNTZType)
    // confirm the synthesized file really is the current fixture shape:
    // NTZ round-trips through parquet as isAdjustedToUTC=false
    assert(spark.read.parquet(path).schema("ts").dataType === TimestampNTZType)
    check(path.stripSuffix("/events.parquet"))
  }

  test("µs-timestamp UTC-adjusted vintage reads to the same view") {
    val path = tmp("tz")
    writeVintage(path, timestamp_micros(col("us")), TimestampType)
    check(path.stripSuffix("/events.parquet"))
  }
}
