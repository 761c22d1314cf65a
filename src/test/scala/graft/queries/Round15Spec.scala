package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-recomputes for the round-15 corpus-preparation audits: each query
  * is re-derived in plain JVM Scala from the fixture rows (collected —
  * the sf0.001 corpus is 500 docs) and compared exactly, the
  * Round13/14Spec discipline.
  */
class Round15Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def haveFixture = new java.io.File(s"$sf/documents.parquet").exists()

  private def fixtureTokens: Seq[(Long, String, Array[String])] =
    graft.core.Io.table(spark, sf, "documents")
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
      .toSeq.sortBy(_._1)

  test("x359: fragment counts match a JVM walk of the packed stream") {
    assume(haveFixture)
    // JVM recompute: lens in doc_id order, running offset, closed-form
    // fragment count per (doc, B)
    val lens = graft.core.Io.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val total = lens.sum
    val expected = Seq(64L, 128L, 256L, 512L).map { b =>
      var s0 = 0L; var frags = 0L; var split = 0L
      lens.foreach { len =>
        val f = (s0 + len - 1) / b - s0 / b + 1
        frags += f; if (f > 1) split += 1
        s0 += len
      }
      (b, lens.size.toLong, total, (total + b - 1) / b, split, frags)
    }
    val got = Round15Queries.x359PackFrontier(spark, sf)
      .select("block_size", "n_docs", "total_tokens", "n_blocks",
        "n_split_docs", "total_fragments")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("x360: a planted 8-gram leak is flagged; disjoint docs are clean") {
    assume(haveFixture)
    // JVM recompute of the whole audit from the fixture: split by the
    // same md5 nibble, per-doc distinct 8-grams, train distinct set
    val docs = fixtureTokens.filter(_._3.length >= 8)
    def isTest(id: Long) = "012".contains(md5hex(s"dc:$id").charAt(0))
    def grams(t: Array[String]): Set[String] =
      t.sliding(8).map(_.mkString(" ")).toSet
    val train = docs.filter(d => !isTest(d._1)).flatMap(d => grams(d._3)).toSet
    val expected = docs.filter(d => isTest(d._1))
      .map { case (_, src, t) =>
        val g = grams(t)
        (src, g.size.toLong, g.count(train).toLong)
      }
      .groupBy(_._1).view.mapValues { xs =>
        (xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum,
          xs.count(_._3 > 0).toLong)
      }.toMap
    val got = Round15Queries.x360Decontamination(spark, sf)
      .select("source", "n_test_docs", "n_test_grams", "n_hit_grams",
        "n_contaminated_docs")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
    // the fixture's exact-duplicate docs guarantee real leakage exists
    // somewhere (a dup pair straddling the split shares every gram) —
    // if this ever reads 0 the audit lost its teeth, investigate
    assert(got.values.map(_._3).sum > 0, "no leakage found: fixture drift?")
  }

  test("x361: planted stitch pair arithmetic on a synthetic frame") {
    // synthetic: B's prefix == A's suffix; C a self-stitching doc
    // (prefix == suffix); D unrelated. Counts are exact products minus
    // the diagonal self-pair.
    import spark.implicits._
    val rows = Seq(
      (1L, "sA", "x y z w p q r s"),   // suffix "p q r s"
      (2L, "sB", "p q r s t u v w"),   // prefix "p q r s" -> stitch (sA,sB)
      (3L, "sC", "m n o k m n o k"),   // prefix == suffix -> self only
      (4L, "sD", "a b c d e f g h"))
    val df = rows.toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("x361spec").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Round15Queries.x361FragmentStitch(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // sC's self-pair is subtracted on the diagonal; sB's suffix "t u v w"
    // matches nothing; only (sA -> sB) survives
    assert(got === Seq(("sA", "sB", 1L)))
  }

  test("x361: fixture cells match a JVM recompute of the count products") {
    assume(haveFixture)
    val docs = fixtureTokens.filter(_._3.length >= 5)
    def pre(t: Array[String]) = t.take(4).mkString(" ")
    def suf(t: Array[String]) = t.takeRight(4).mkString(" ")
    val sCnt = docs.groupBy(d => (suf(d._3), d._2)).view.mapValues(_.size.toLong)
    val pCnt = docs.groupBy(d => (pre(d._3), d._2)).view.mapValues(_.size.toLong)
    val raw = scala.collection.mutable.Map.empty[(String, String), Long]
    for (((h, sa), sc) <- sCnt; ((h2, sb), pc) <- pCnt if h == h2)
      raw((sa, sb)) = raw.getOrElse((sa, sb), 0L) + sc * pc
    val self = docs.filter(d => pre(d._3) == suf(d._3))
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = raw.toSeq.map { case ((a, b), n) =>
      (a, b, n - (if (a == b) self.getOrElse(a, 0L) else 0L))
    }.filter(_._3 > 0).sortBy(t => (t._1, t._2))
    val got = Round15Queries.x361FragmentStitch(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
  }
}
