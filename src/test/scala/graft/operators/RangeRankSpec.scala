package graft.operators

import graft.SparkSpec

/** RangeRank's two-pass offset ranking must equal the ranking window for
  * any partition count — including keys that span many range partitions
  * (the whole point: parallelism decoupled from |keys|).
  */
class RangeRankSpec extends SparkSpec {
  import spark.implicits._

  private def expect(rows: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (k, g) =>
      g.sortBy(t => (t._2, t._3)).zipWithIndex
        .map { case ((_, v, id), i) => (k, v, id, i + 1L) }
    }.toSet

  /** Owned form with the pin released BEFORE materialization — the
    * documented recompute path (deterministic shuffle replay), so every
    * fixed case here also exercises pass-1/pass-2 consistency without
    * cached blocks. */
  private def rankWithin(df: org.apache.spark.sql.DataFrame, key: String,
      order: Seq[String], name: String, parts: Int): org.apache.spark.sql.DataFrame = {
    val r = RangeRank.rankWithinOwned(df, key, order, name, parts)
    r.release()
    r.df
  }

  test("rankWithin == row_number over (key, order) with keys spanning 16 partitions") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 5000).map(i =>
      (rng.nextInt(3).toString, rng.nextInt(100000).toLong, i.toLong))
    val got = rankWithin(rows.toDF("k", "v", "id"), "k",
        Seq("v", "id"), "rnk", 16)
      .select("k", "v", "id", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expect(rows))
  }

  test("single partition and single key degenerate correctly") {
    val rows = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("a", 2L, 3L))
    val got = rankWithin(rows.toDF("k", "v", "id"), "k",
        Seq("v", "id"), "rnk", 1)
      .select("k", "v", "id", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 2L, 1L), ("a", 2L, 3L, 2L), ("a", 3L, 1L, 3L)))
  }

  test("a NULL key and the literal string \"null\" rank as SEPARATE groups") {
    val rows = Seq((null.asInstanceOf[String], 1L, 1L), ("null", 1L, 2L),
      (null.asInstanceOf[String], 2L, 3L), ("null", 2L, 4L))
    val got = rankWithin(rows.toDF("k", "v", "id"), "k",
        Seq("v", "id"), "rnk", 4)
      .select("k", "id", "rnk").collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0),
        r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("<null>", 1L, 1L), ("<null>", 3L, 2L),
      ("null", 2L, 1L), ("null", 4L, 2L)))
  }

  test("duplicate order values rank by the tie-break column") {
    val rows = Seq(("a", 5L, 2L), ("a", 5L, 1L), ("b", 5L, 9L))
    val got = rankWithin(rows.toDF("k", "v", "id"), "k",
        Seq("v", "id"), "rnk", 4)
      .select("k", "id", "rnk").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 9L, 1L)))
  }

  test("interleaved rankings own separate pins — neither evicts the other") {
    // the hazard the deleted rotation-pinned form had (advice r9/r10):
    // starting ranking B before consuming ranking A evicted A's sorted
    // input. Owned pins: build BOTH rankings, materialize A after B was
    // built and B after A was consumed — both must still be exact, and
    // both inputs must still be cached when their sweep runs.
    val rng = new scala.util.Random(11)
    val rowsA = (1 to 2000).map(i =>
      (rng.nextInt(2).toString, rng.nextInt(500).toLong, i.toLong))
    val rowsB = (1 to 1500).map(i =>
      ("z" + rng.nextInt(4), rng.nextInt(90).toLong, i.toLong))
    val ra = RangeRank.rankWithinOwned(rowsA.toDF("k", "v", "id"), "k",
      Seq("v", "id"), "rnk", 8)
    val rb = RangeRank.rankWithinOwned(rowsB.toDF("k", "v", "id"), "k",
      Seq("v", "id"), "rnk", 8)
    def got(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "v", "id", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got(ra.df) == expect(rowsA))
    assert(got(rb.df) == expect(rowsB))
    ra.release(); rb.release()
  }

  test("key-cardinality guard fails fast with a data-cardinality key (verdict r11 #2)") {
    // 200 distinct keys against a threshold of 50: the guard must throw
    // BEFORE the driver-side collect, with an error naming the fix — not
    // an OOM three frames deep. Same data under the default threshold
    // still ranks exactly (the guard is a ceiling, not a behavior change).
    val rows = (1 to 200).map(i => (s"k$i", i.toLong, i.toLong))
    val df = rows.toDF("k", "v", "id")
    val e = intercept[IllegalArgumentException] {
      RangeRank.rankWithinOwned(df, "k", Seq("v", "id"), "rnk", 4,
        maxKeyPartitionEntries = 50L)
    }
    assert(e.getMessage.contains("data-cardinality key"))
    assert(e.getMessage.contains("PARTITION BY"))
    val ok = RangeRank.rankWithinOwned(df, "k", Seq("v", "id"), "rnk", 4)
    val got = ok.df.select("k", "v", "id", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    ok.release()
    assert(got == expect(rows))
  }
}
