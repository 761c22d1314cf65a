package graft.core

import graft.SparkSpec
import java.sql.Timestamp

/** The typed Aggregator profile must agree with the untyped single-agg
  * profile on a full-schema frame.
  */
class TypedQualitySpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator profile equals Quality.profile on the same frame") {
    val rows: Seq[TypedQuality.Tx] = Seq(
      TypedQuality.Tx(Some(Timestamp.valueOf("2024-01-01 00:00:00")),
        Some("sale"), Some(10.0), Some("a"), Some("eu"), Some(0.5)),
      TypedQuality.Tx(None, Some("sale"), Some(-5.0), Some("b"), None, Some(0.1)),
      TypedQuality.Tx(Some(Timestamp.valueOf("2024-01-03 00:00:00")),
        None, None, None, Some("us"), None))
    val ds = rows.toDS().repartition(3) // exercise merge across partitions

    val typed   = TypedQuality.profile(ds, "t")
    val untyped = Quality.profile(ds.toDF(), "t")
    assert(typed.totalRows == untyped.totalRows)
    assert(typed.nulls == untyped.nulls)
    assert(typed.ruleViolations == untyped.ruleViolations)
    assert(typed.failedRowsEstimate == untyped.failedRowsEstimate)
    assert(math.abs(typed.conformityRate - untyped.conformityRate) < 1e-15)
  }

  test("typed profile on empty dataset: total=0, conformity ≈ 1") {
    val m = TypedQuality.profile(
      spark.emptyDataset[TypedQuality.Tx], "empty")
    assert(m.totalRows == 0 && m.conformityRate > 0.999999)
  }
}
