package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 scale probes (ad hoc, not part of the driver contract): the
  * queries added since the §6.1g sweep — x102/x104 (declared round 6, never
  * probed) and the round-8 additions x106/x107/x108 — at sf0.1 and a 10×
  * duplicate-heavy copy. Volumes over clocks, per SURVEY §6.0. Results
  * recorded in SURVEY §6.1h.
  *
  * The 10× events copy is written through `Io.eventsRaw`, so its `ts` is the
  * epoch-ns LONG vintage — probing here also exercises the legacy branch of
  * the schema-adaptive reader against a corpus-sized file (IoVintageSpec
  * covers it only at 2 rows).
  */
object Scratch8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/probe10x_r8"
    def tenfold(table: String, idCol: String): Unit = {
      val base = core.Io.table(spark, sfDir, table)
      (0 until 10).map(i => base.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$tenDir/$table.parquet")
    }
    tenfold("documents", "doc_id")
    tenfold("embeddings", "vec_id")
    (0 until 10).map { i =>
      core.Io.eventsRaw(spark, sfDir)
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$tenDir/events.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(spark.range(1000000).count())
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x102_$dir")(queries.ExtendedQueries.x102IntervalOverlap(spark, dir).count())
      time(s"x104_$dir")(queries.LlmQueries.x104SplitAssign(spark, dir).count())
      println(s"PROBE x104rounds dir=$dir rounds=${queries.LlmQueries.x47LastRounds.get()}")
      // x107 volumes ride the timed pass (ONE execution — a second run for
      // the aggregate would double the probe, incl. the 100× pipeline):
      // removal cost is chunk-linear; the DROPPED fraction tracks duplicate
      // density, never corpus size
      var x107v = (0L, 0L)
      time(s"x107_$dir") {
        val v = queries.LlmQueries.x107ChunkDedupClean(spark, dir)
          .agg(count(lit(1)), sum("n_chunks"), sum("n_kept")).head()
        x107v = (v.getLong(1), v.getLong(2)); v.getLong(0)
      }
      println(s"PROBE x107vol dir=$dir chunks=${x107v._1} kept=${x107v._2}")
      // x108's defining scale property: output is BUDGET-bound, not
      // corpus-bound — 10× the corpus, ~the same rows out
      var x108t = 0L
      time(s"x108_$dir") {
        val t = queries.LlmQueries.x108TokenBudgetMix(spark, dir)
          .agg(count(lit(1)), sum("n_toks")).head()
        x108t = t.getLong(1); t.getLong(0)
      }
      println(s"PROBE x108vol dir=$dir toks=$x108t")
    }
    // x106 is a fixed-size golden check by design — probed once, expected flat
    time("x106")(queries.MultimodalQueries.x106MultimodalGolden(spark, sfDir).count())

    // x112 pruning probe: empirical check of the z-order claim. 32
    // equal-count buckets per layout; a bucket must be SCANNED iff its
    // (min,max) box intersects the predicate box — exactly the parquet
    // row-group min/max stats rule. Expectation: a day-range predicate
    // scans ~all user-sorted buckets but only a fraction of z-ordered
    // ones; a user-range predicate scans few of either (user-sort wins its
    // own dimension, z stays bounded in BOTH).
    {
      import org.apache.spark.sql.expressions.Window
      // the declared query's OWN grammar (zorderFrame), cached once for the
      // six scanned() passes; zraw is the intentionally-divergent variant
      // documenting the pitfall normalization fixes: the day dimension's
      // ~30 distinct values leave its high interleaved bits constant, so
      // raw z degenerates to a user sort
      val ev = queries.ExtendedQueries.zorderFrame(spark, sfDir)
        .withColumn("zraw", expr(queries.ExtendedQueries.zMorton("u", "d")))
        .persist()
      def scanned(orderCol: String, dim: String, lo: Long, hi: Long): Long = {
        // global ntile = one-partition window: probe-only shape, never a
        // declared-query plan
        val boxes = ev
          .withColumn("bkt", ntile(32).over(Window.orderBy(col(orderCol))))
          .groupBy("bkt")
          .agg(min(dim).as("lo"), max(dim).as("hi"))
        boxes.filter(col("lo") <= hi && col("hi") >= lo).count()
      }
      val Row(dLo: Long, dHi: Long) =
        ev.agg(min("d"), max("d")).head()
      val dMid = (dLo + dHi) / 2
      println(s"PROBE x112prune day-range: z=${scanned("z", "d", dMid, dMid + 2)}/32 " +
        s"zraw=${scanned("zraw", "d", dMid, dMid + 2)}/32 " +
        s"userSort=${scanned("u", "d", dMid, dMid + 2)}/32")
      println(s"PROBE x112prune user-range: z=${scanned("z", "u", 100, 300)}/32 " +
        s"zraw=${scanned("zraw", "u", 100, 300)}/32 " +
        s"userSort=${scanned("u", "u", 100, 300)}/32")
      ev.unpersist()
    }
    // x110: summary rows are fold×split×type-bounded (≤45) whatever the
    // corpus; time should track the 3× exploded scan linearly.
    // x111: output is top-k-bounded (≤40 rows); both retrievers are linear
    // scans, so 10× docs ≈ 10× scan cost and nothing else moves.
    for (dir <- Seq(sfDir, tenDir)) {
      time(s"x110_$dir")(queries.LlmQueries.x110WalkForwardSplit(spark, dir)
        .agg(sum("n_events")).head().getLong(0))
      time(s"x111_$dir")(queries.LlmQueries.x111RrfFusion(spark, dir).count())
    }
    // 100× chunk-dedup removal (500k docs): the fine-grained dedup path at
    // one more decade — opt-in, like Scratch's 100× block
    if (sys.env.get("SPARK_GRAFT_PROBE_100X").contains("1")) {
      val hundredDir = "/tmp/probe100x_r8"
      (0 until 100).map { i =>
        core.Io.table(spark, sfDir, "documents")
          .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      }.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(s"$hundredDir/documents.parquet")
      var v100 = (0L, 0L)
      time(s"x107_$hundredDir") {
        val v = queries.LlmQueries.x107ChunkDedupClean(spark, hundredDir)
          .agg(count(lit(1)), sum("n_chunks"), sum("n_kept")).head()
        v100 = (v.getLong(1), v.getLong(2)); v.getLong(0)
      }
      println(s"PROBE x107vol dir=$hundredDir chunks=${v100._1} kept=${v100._2}")
      // x108 at 100×: the budget bound must hold across two decades —
      // 100× the docs, still ~quota-rows out per source
      time(s"x108_$hundredDir")(
        queries.LlmQueries.x108TokenBudgetMix(spark, hundredDir).count())
      // x110 at 100×: events 100× (ns-long vintage); summary stays
      // fold-bounded, Σn_events scales exactly 100×
      (0 until 100).map { i =>
        core.Io.eventsRaw(spark, sfDir)
          .withColumn("event_id", col("event_id") + lit(i * 10000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
      }.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(s"$hundredDir/events.parquet")
      time(s"x110_$hundredDir")(
        queries.LlmQueries.x110WalkForwardSplit(spark, hundredDir)
          .agg(sum("n_events")).head().getLong(0))
    }
    spark.stop()
  }
}
