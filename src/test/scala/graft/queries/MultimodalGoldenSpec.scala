package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** x106 — the declared multimodal golden query: per-kind behavior and full
  * determinism (the property that makes the driver-side dump a golden file).
  */
class MultimodalGoldenSpec extends SparkSpec {

  private lazy val rows: Seq[Row] =
    MultimodalQueries.x106MultimodalGoldenRaw(spark, "unused").collect().toSeq

  private def byKind(k: String) = rows.filter(_.getAs[String]("kind") == k)

  test("x106: 20 assets, one row each, ordered by id") {
    assert(rows.map(_.getLong(0)) == (0L until 20L))
    assert(Seq("image", "audio", "video", "opaque", "missing")
      .forall(k => byKind(k).size == 4))
  }

  test("x106: images resize to 4x4 PNG; everything else passes through") {
    byKind("image").foreach { r =>
      assert(r.getAs[String]("mime_after") == "image/png")
      assert(r.getAs[Int]("w_after") == 4 && r.getAs[Int]("h_after") == 4)
    }
    (byKind("audio") ++ byKind("video") ++ byKind("opaque")).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("w_after")), "non-image must keep null dims")
      assert(r.getAs[String]("payload_md5") != null)
    }
  }

  test("x106: real decodes per kind — features pixel/sample-derived, stub for opaque, null for missing") {
    // image features: all in [0,1], f7 = w/(w+h) > 0 (real pixel decode)
    byKind("image").foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      assert(f.size == 8 && f.forall(v => v >= 0.0 && v <= 1.0))
    }
    // audio: f1 = rate/100000 = 0.08, f2 = channels/8 = 0.125 exactly —
    // values only the REAL javax.sound decode path produces
    byKind("audio").foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      assert(f(1) == 0.08 && f(2) == 0.125)
    }
    byKind("opaque").foreach(r => assert(r.getSeq[Double](r.fieldIndex("feature")).size == 8))
    byKind("missing").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("feature")))
      assert(r.isNullAt(r.fieldIndex("payload_md5")))
      assert(r.getAs[Long]("n_bytes") == 0L)
    }
  }

  test("x106: AVI assets sample 2 of 3 frames (every=2); no frames elsewhere") {
    byKind("video").foreach { r =>
      assert(r.getAs[Long]("n_frames_sampled") == 2L)
      assert(r.getAs[String]("frame_md5") != null)
    }
    rows.filterNot(_.getAs[String]("kind") == "video")
      .foreach(r => assert(r.getAs[Long]("n_frames_sampled") == 0L))
  }

  test("x106: fully deterministic — two independent runs are identical") {
    val again = MultimodalQueries.x106MultimodalGoldenRaw(spark, "unused").collect().toSeq
    assert(rows == again)
  }

  test("x106 declared form: feature is a sortable string matching the raw array") {
    import org.apache.spark.sql.types.StringType
    val declared = MultimodalQueries.x106MultimodalGolden(spark, "unused")
    assert(declared.schema("feature").dataType == StringType)
    // every declared column must be scalar — the driver sorts with pandas
    // sort_values over ALL columns, which dies on array/struct/map cells
    // (the round-8 x106 failure)
    declared.schema.fields.foreach { f =>
      assert(!f.dataType.typeName.matches("array|struct|map"),
        s"declared x106 column ${f.name} must be scalar, got ${f.dataType}")
    }
    val decRows = declared.collect().toSeq
    assert(decRows.size == rows.size)
    rows.zip(decRows).foreach { case (raw, dec) =>
      val want =
        if (raw.isNullAt(raw.fieldIndex("feature"))) null
        else raw.getSeq[Double](raw.fieldIndex("feature")).map(_.toString).mkString(" ")
      assert(dec.getAs[String]("feature") == want)
    }
  }

  test("x135: binaryFile roundtrip — 16 files, every payload byte-identical") {
    val out = MultimodalQueries.x135BinaryIngest(spark, "unused").collect()
    // 20 assets, 4 null payloads (kind=missing) produce no file
    assert(out.length == 16)
    assert(out.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).toSeq.sorted)
    assert(out.forall(_.getBoolean(4)), "every payload must match its generator md5+length")
    assert(out.map(r => r.getString(1)).toSet == Set("image", "audio", "video", "opaque"))
    // deterministic across invocations (fresh temp dir each run)
    val again = MultimodalQueries.x135BinaryIngest(spark, "unused").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(3))).toSeq)
  }
}
