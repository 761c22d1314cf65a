package graft.queries

import graft.SparkSpec
import graft.core.Io

/** S2 — the SQL entry surface: the same declared query run through a temp
  * view + spark.sql must equal the DataFrame-API result (the reference's
  * analytical layer is literally SQL over a registered frame,
  * /root/reference/flows/pipeline.py:170-211).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("spark.sql over a temp view equals the DataFrame query (r4_group_avg)") {
    Io.events(spark, sfDir).createOrReplaceTempView("events_v")
    // same exact-decimal-sum + bit-deterministic rounding as r4 itself —
    // plain round(avg(...), 6) is the formulation r4 moved away from
    val viaSql = spark.sql(
      """SELECT event_type,
        |       floor(cast(sum(cast(value as decimal(28,6))) as double) / count(value)
        |             * 1000000 + 0.5) / 1000000 AS avg_value
        |FROM events_v
        |WHERE event_type IS NOT NULL
        |GROUP BY event_type
        |ORDER BY avg_value DESC, event_type""".stripMargin)
    val viaDf = ReferenceQueries.r4GroupAvg(spark, sfDir)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("S3 — managed-table sink: saveAsTable + catalog read-back (CTAS analog)") {
    // the reference's `create or replace table … as select * from df`
    // (/root/reference/flows/pipeline.py:172-175) — Spark's managed-table
    // path through the session catalog
    val src = Io.table(spark, sfDir, "region")
    src.write.mode("overwrite").saveAsTable("stg_region")
    try {
      assert(spark.catalog.tableExists("stg_region"))
      val back = spark.sql("SELECT r_regionkey, r_name FROM stg_region ORDER BY r_regionkey")
      assert(back.collect().toSeq ==
        src.select("r_regionkey", "r_name").orderBy("r_regionkey").collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS stg_region")
  }

  test("x14_text_stats runs through spark.sql and returns per-language rows") {
    val out = LlmQueries.x14TextStats(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[String]("lang")).toSeq.sorted
      == out.map(_.getAs[String]("lang")).toSeq) // ordered by lang
  }
}
