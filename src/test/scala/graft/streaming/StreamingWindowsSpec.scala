package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The watermarked tumbling-window face: the pure replay core (`advance`)
  * computes exactly what the REAL engine (`withWatermark` +
  * `groupBy(window)` in append mode) emits, late data is dropped by both,
  * and the window-assignment rule matches Spark's `window()` function.
  */
class StreamingWindowsSpec extends SparkSpec {
  import StreamingWindows._
  import spark.implicits._

  private val W = 60_000_000L      // 1-minute windows
  private val D = 120_000_000L     // 2-minute watermark delay
  private val T0 = 1_700_000_040_000_000L // epoch µs base, minute-aligned (÷ W exactly)

  private def batchDf(ts: Seq[Long]): DataFrame = ts.toDF("ts_us")

  private def replay(batches: Seq[Seq[Long]]): (Set[(Long, Long)], Set[(Long, Long)]) = {
    var state = emptyState(spark)
    var wm = Long.MinValue
    var emitted = Set.empty[(Long, Long)]
    batches.foreach { b =>
      val (out, next, newWm) = advance(state, batchDf(b), wm, W, D)
      emitted ++= out.collect().map(r => (r.getLong(0), r.getLong(1)))
      state = next
      wm = newWm
    }
    (emitted, state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("replay emitted set equals the real append-mode engine after a trailing batch") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(T0 + 1, T0 + 2, T0 + W + 1)          // windows 0 and 1
    val b2 = Seq(T0 + 5 * W + 1, T0 + 5 * W + 2)      // window 5 → wm closes 0..2
    val b3 = Seq(T0 + 9 * W)                          // window 9 → wm closes 0..6
    val trail = Seq(T0 + 20 * W)                      // advances wm past everything prior
    val input = MemoryStream[Long]
    val sink = s"win_${System.nanoTime()}"
    val q = input.toDF()
      .select(timestamp_micros(col("value")).as("ts"))
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute")).count()
      .select(unix_micros(col("window.start")).as("win_start_us"), col("count").as("n"))
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      Seq(b1, b2, b3, trail).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      // one more empty trigger so the engine applies the trail batch's watermark
      input.addData(Seq.empty[Long]: _*); q.processAllAvailable()
      val engine = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (emitted, _) = replay(Seq(b1, b2, b3, trail))
      assert(engine == emitted,
        s"engine=${engine.toSeq.sorted} replay=${emitted.toSeq.sorted}")
      assert(emitted.nonEmpty)
    } finally q.stop()
  }

  test("late events are dropped once their window has closed") {
    // batch 1 pushes wm to T0+8W-D = T0+6W: windows 0..5 are closed
    val b1 = Seq(T0 + 1, T0 + 8 * W)
    // batch 2 arrives with one event in closed window 2 (dropped) and one
    // in still-open window 7 (kept)
    val b2 = Seq(T0 + 2 * W + 3, T0 + 7 * W + 3)
    val (emitted, open) = replay(Seq(b1, b2))
    val all = emitted ++ open
    assert(all.find(_._1 == T0 + 2 * W).isEmpty, s"late event must not resurrect window 2: $all")
    assert(all.contains((T0 + 7 * W, 1L)))
    assert(emitted.contains((T0, 1L)), "window 0 closed with exactly its on-time count")
  }

  test("flush (emitted + open) equals the plain batch aggregation on ordered batches") {
    val ts = (0 until 200).map(i => T0 + i * 7_000_000L) // 7s apart, ordered
    val batches = ts.grouped(70).map(_.toSeq).toSeq
    val (emitted, open) = replay(batches)
    val batch = batchDf(ts)
      .select((expr(s"ts_us div ${W}L") * W).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted ++ open == batch)
    assert(emitted.nonEmpty && open.nonEmpty, "watermark must have closed some but not all")
  }

  test("pre-aggregated cells path equals the raw advance path batch by batch") {
    val batches = Seq(
      Seq(T0 + 1, T0 + 2, T0 + W + 1),
      Seq(T0 + 5 * W + 1, T0 + 2 * W + 3), // one late-ish row once wm moves
      Seq(T0 + 9 * W))
    var (sRaw, sCells) = (emptyState(spark), emptyState(spark))
    var (wmRaw, wmCells) = (Long.MinValue, Long.MinValue)
    batches.foreach { b =>
      val (outR, nextR, newWmR) = advance(sRaw, batchDf(b), wmRaw, W, D)
      val cells = cellsWithMax(batchDf(b), W)
      val merged = mergeCellFrame(sCells, cells, wmCells, W)
      val newWmC = cellsWatermark(cells, wmCells, D)
      val (outC, nextC) = splitClosed(merged, newWmC, W)
      assert(newWmR == newWmC)
      assert(outR.collect().map(_.toSeq).toSet == outC.collect().map(_.toSeq).toSet)
      assert(nextR.collect().map(_.toSeq).toSet == nextC.collect().map(_.toSeq).toSet)
      sRaw = nextR; sCells = nextC; wmRaw = newWmR; wmCells = newWmC
    }
  }

  test("window assignment matches Spark's window() rule") {
    val ts = Seq(T0 + 1, T0 + W - 1, T0 + W, T0 + 3 * W + 17)
    val viaWindow = batchDf(ts)
      .select(timestamp_micros(col("ts_us")).as("t"))
      .select(unix_micros(window(col("t"), "1 minute").getField("start")).as("w"))
      .collect().map(_.getLong(0)).toSeq
    val viaDiv = ts.map(t => t / W * W)
    assert(viaWindow == viaDiv)
  }
}
