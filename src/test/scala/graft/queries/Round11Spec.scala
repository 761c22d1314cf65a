package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Round-11 query semantics the sf fixtures alone don't pin: the ESS
  * rounding chain on a hand-computable two-source mix (x265), the kappa
  * contingency arithmetic and its pe=1 NULL pin (x266), PMI's exact-ratio
  * ln and count gate (x267), burstiness moments with implicit zero-count
  * documents (x268), the order-insensitive leakage fingerprint (x269),
  * and the strided-window ceiling arithmetic at the W/S boundaries (x270).
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("r11").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def r(x: Double, digits: Int = 6): Double = {
    val p = math.pow(10, digits)
    math.floor(x * p + 0.5) / p
  }

  test("x265: ESS chain equals the hand recompute on a 4+1 doc mix") {
    val rows = (1L to 4L).map(i => (i, "t", "en", "sa", 10L)) :+
      ((9L, "t", "en", "sb", 10L))
    val out = Round11Queries.x265MixEss(spark, docsDir(rows))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    // independent recompute of the documented rounding chain
    val r6a = r(math.sqrt(4.0)); val r6b = r(math.sqrt(1.0))
    val s = r6a + r6b // exact decimals: 2.000000 + 1.000000
    val wa = r(r6a / s); val wb = r(r6b / s)
    val ca = r(wa * wa / 4.0, 9); val cb = r(wb * wb / 1.0, 9)
    val sw = BigDecimal(wa) + BigDecimal(wb)
    val sc = BigDecimal(ca) + BigDecimal(cb)
    val ess = r(sw.toDouble * sw.toDouble / sc.toDouble)
    val essRatio = r(sw.toDouble * sw.toDouble / sc.toDouble / 5.0)
    assert(out("sa") == ((4L, wa, ess, essRatio)))
    assert(out("sb") == ((1L, wb, ess, essRatio)))
    // sanity: 4+1 under sqrt-temperature resamples the small source hard,
    // so the effective corpus must sit strictly between 1 and 5 docs
    assert(ess > 1.0 && ess < 5.0)
  }

  test("x266: kappa equals the contingency recompute; pe = 1 pins NULL") {
    def doc(id: Long, tokens: Int, chars: Long) =
      (id, Seq.fill(tokens)("w").mkString(" "), "en", "s", chars)
    // cells: n11 = 2 (long+many), n10 = 1, n01 = 1, n00 = 2
    val rows = Seq(doc(1, 30, 150), doc(2, 30, 150), doc(3, 3, 150),
      doc(4, 30, 50), doc(5, 3, 50), doc(6, 3, 50))
    val got = Round11Queries.x266CohenKappa(spark, docsDir(rows)).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((6L, 2L, 1L, 1L, 2L)))
    assert(got.getDouble(5) == r(4.0 / 6.0))        // po
    assert(got.getDouble(6) == 0.5)                 // pe = 18/36
    assert(got.getDouble(7) == r(6.0 / 18.0))       // kappa = (24-18)/(36-18)
    // degenerate: every doc in the n11 cell -> pe = 1 -> NULL kappa
    val deg = Round11Queries.x266CohenKappa(spark,
      docsDir(Seq(doc(1, 30, 150), doc(2, 30, 150)))).head()
    assert(deg.isNullAt(7))
    assert(deg.getDouble(5) == 1.0 && deg.getDouble(6) == 1.0)
  }

  test("x267: PMI is the exact-ratio ln; the count gate drops rare bigrams") {
    val rows = (1L to 5L).map(i => (i, "a b", "en", "s", 3L)) ++
      Seq((11L, "c d", "en", "s", 3L), (12L, "c d", "en", "s", 3L))
    val out = Round11Queries.x267PmiCollocations(spark, docsDir(rows)).collect()
    assert(out.length == 1, "only 'a b' passes the cab >= 5 gate")
    val row = out.head
    // NU = 14 tokens, NB = 7 bigrams, cab = ca = cb = 5
    val pmi = r(math.log(5.0 * 14 * 14 / (7.0 * 5 * 5)))
    assert(row.getString(0) == "a b" && row.getLong(1) == 5L &&
      row.getLong(2) == 5L && row.getLong(3) == 5L &&
      row.getDouble(4) == pmi)
  }

  test("x268: VMR moments include zero-count documents implicitly") {
    val rows = Seq((1L, "x x x x", "en", "s", 7L), (2L, "x", "en", "s", 1L),
      (3L, "y y", "en", "s", 3L))
    val out = Round11Queries.x268Burstiness(spark, docsDir(rows))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    // x: per-doc counts (4, 1, 0) over N = 3 docs: sc = 5, scc = 17
    //    vmr = (3*17 - 25) / (5 * 2) = 2.6
    assert(out("x") == ((5L, 2L, r(5.0 / 3.0), 2.6)))
    // y: counts (0, 0, 2): sc = 2, scc = 4, vmr = (12 - 4) / (2 * 2) = 2
    assert(out("y") == ((2L, 1L, r(2.0 / 3.0), 2.0)))
  }

  test("x269: fingerprint is order-insensitive; pair count is c_a * c_b") {
    val rows = Seq(
      (1L, "a b c", "en", "s1", 5L), (2L, "c a b", "en", "s1", 5L),
      (3L, "b c a a", "en", "s2", 7L), // duplicate token, same SET
      (4L, "z", "en", "s3", 1L))
    val out = Round11Queries.x269DupLeakage(spark, docsDir(rows)).collect()
    assert(out.length == 1, "only (s1, s2) share a fingerprint")
    val row = out.head
    assert(row.getString(0) == "s1" && row.getString(1) == "s2" &&
      row.getLong(2) == 1L && row.getLong(3) == 2L)
  }

  test("x270: window counts honor the W/S boundaries exactly") {
    val rows = Seq(
      (1L, Seq.fill(64)("w").mkString(" "), "en", "sa", 64L),  // 1 window
      (2L, Seq.fill(65)("w").mkString(" "), "en", "sb", 65L),  // 2 windows
      (3L, Seq.fill(160)("w").mkString(" "), "en", "sc", 160L), // 3 windows
      (4L, Seq.fill(161)("w").mkString(" "), "en", "sd", 161L)) // 4 windows
    val out = Round11Queries.x270StrideWindows(spark, docsDir(rows))
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))).toMap
    assert(out("sa") == ((64L, 1L, 64L, 1.0)))
    assert(out("sb") == ((65L, 2L, 128L, r(128.0 / 65.0))))
    assert(out("sc") == ((160L, 3L, 192L, 1.2)))
    assert(out("sd") == ((161L, 4L, 256L, r(256.0 / 161.0))))
  }

  test("x271: identical docs are candidates in every band, all true positives") {
    // five exact copies share all 16 minhashes -> candidates in all 4
    // bands; C(5,2) = 10 pairs per band, every one verifies at j = 1
    val rows = (1L to 5L).map(i => (i, "a b c d e f", "en", "s", 11L)) ++
      Seq((11L, "p q r s t u", "en", "s", 11L)) // disjoint, never a candidate
    val out = Round11Queries.x271LshFpAudit(spark, docsDir(rows))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3)))
    assert(out.length == 4)
    assert(out.forall { case (_, cand, tru, fp) =>
      cand == 10L && tru == 10L && fp == 0.0 })
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("x272: shard moments equal the hand recompute (incl. the md5 shards)") {
    val toks = Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4)
    val rows = toks.toSeq.sortBy(_._1).map { case (id, t) =>
      (id, Seq.fill(t)("w").mkString(" "), "en", "s", t.toLong) }
    val out = Round11Queries.x272ShardBalance(spark, docsDir(rows))
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))).toMap
    def audit(shardOf: Long => Long): (Long, Long, Double, Double) = {
      val byShard = toks.toSeq.groupBy { case (id, _) => shardOf(id) }
        .map { case (_, g) => g.map(_._2.toLong).sum }
      val sx = byShard.sum; val sxx = byShard.map(x => x * x).sum
      val mx = byShard.max
      (sx, mx, r(math.sqrt((32.0 * sxx - sx * sx) / (sx * sx).toDouble)),
        r(32.0 * mx / sx))
    }
    assert(out("mod") == audit(_ % 32))
    assert(out("hash") == audit(id =>
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 32))
  }

  test("x273: FD width from exact quartiles; integer bins at the boundaries") {
    val rows = (1L to 8L).map(i => (i, "t", "en", "s", i)) // n_chars = 1..8
    val out = Round11Queries.x273FdHistogram(spark, docsDir(rows))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    // n = 8: q1 at rank ceil(8/4) = 2 -> 2; q3 at rank ceil(24/4) = 6 -> 6
    // h = round6(2*4 / 8^(1/3)) = 4.0 -> snapped 4
    assert(out(0L) == ((0L, 4L, 4L, 2L, 6L, 3L)))  // x = 1, 2, 3
    assert(out(1L) == ((4L, 8L, 4L, 2L, 6L, 4L)))  // x = 4..7
    assert(out(2L) == ((8L, 12L, 4L, 2L, 6L, 1L))) // x = 8
  }

  test("x274: Good-Turing singleton mass and smoothed r*") {
    val rows = Seq((1L, "a a b c", "en", "s", 7L))
    val got = Round11Queries.x274GoodTuring(spark, docsDir(rows)).head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      == ((4L, 3L, 2L, 1L)))
    assert(got.getDouble(5) == 0.5)  // N1/N = 2/4
    assert(got.getDouble(6) == 1.0)  // 2*N2/N1 = 2/2
    // closed vocabulary: every type repeated -> N1 = 0 -> r* NULL
    val deg = Round11Queries.x274GoodTuring(spark,
      docsDir(Seq((1L, "a a b b", "en", "s", 7L)))).head()
    assert(deg.getLong(3) == 0L && deg.isNullAt(6))
    assert(deg.getDouble(5) == 0.0)
  }

  test("x275: duplicate rate lands in the length quartile of the dup docs") {
    // lengths 1..8 -> quartiles (1,1,2,2,3,3,4,4); docs 7 and 8 share a
    // token SET (order/multiplicity-insensitive fingerprint)
    val rows = (1L to 6L).map(i =>
      (i, s"u$i v$i", "en", "s", i)) ++ Seq(
      (7L, "dup set x", "en", "s", 7L),
      (8L, "x set dup dup", "en", "s", 8L))
    val out = Round11Queries.x275DupByLength(spark, docsDir(rows))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(5))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)) && out(2L) == ((2L, 0L, 0.0)) &&
      out(3L) == ((2L, 0L, 0.0)))
    assert(out(4L) == ((2L, 2L, 1.0)))
  }
}
