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

  test("x106 declared form: decode checksums equal the generator formulas per kind") {
    val declared = MultimodalQueries.x106MultimodalGolden(spark, "unused")
    // every declared column must be scalar — the driver sorts with pandas
    // sort_values over ALL columns, which dies on array/struct/map cells
    // (the round-8 x106 failure)
    declared.schema.fields.foreach { f =>
      assert(!f.dataType.typeName.matches("array|struct|map"),
        s"declared x106 column ${f.name} must be scalar, got ${f.dataType}")
    }
    val m = declared.collect().map(r => r.getLong(0) -> r).toMap
    assert(m.size == 20)
    // the same closed forms the DuckDB oracle uses (SyntheticMedia.pngBytes)
    def pngSum(w: Int, h: Int, seed: Long): Long = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w)
        s += (x * 7 + seed * 13 + 3) % 256 + (y * 11 + seed * 5 + 7) % 256 +
          (x + y + seed * 3) % 256
      s
    }
    Seq(0L, 5L, 10L, 15L).foreach { id => // image: real ImageIO decode
      val w = 8 + (id / 5 % 5).toInt; val h = 6 + (id / 5 % 3).toInt
      assert(m(id).getAs[Long]("decode_checksum") == pngSum(w, h, id))
      assert(m(id).getAs[Long]("w_after") == 4L && m(id).getAs[Long]("h_after") == 4L)
      assert(m(id).getAs[String]("mime_after") == "image/png")
    }
    Seq(1L, 6L, 11L, 16L).foreach { id => // audio: real javax.sound decode
      val n = 400 + (id * 7 % 100).toInt
      val want = (0 until n).map(i => math.abs((i * 13 + id * 7) % 2001 - 1000)).sum
      assert(m(id).getAs[Long]("decode_checksum") == want)
      assert(m(id).isNullAt(m(id).fieldIndex("w_after")))
    }
    Seq(2L, 7L, 12L, 17L).foreach { id => // video: RIFF walk + frame decode
      val want = Seq(0, 2).map(f => pngSum(8, 6, id * 100 + f)).sum
      assert(m(id).getAs[Long]("decode_checksum") == want)
      assert(m(id).getAs[Long]("n_frames_sampled") == 2L)
    }
    Seq(3L, 8L, 13L, 18L).foreach { id => // opaque: exact payload length
      assert(m(id).getAs[Long]("decode_checksum") == 4L * (16 + id.toString.length))
      assert(m(id).getAs[Long]("n_frames_sampled") == 0L)
    }
    Seq(4L, 9L, 14L, 19L).foreach { id => // missing: all-null decode surface
      assert(m(id).isNullAt(m(id).fieldIndex("decode_checksum")))
      assert(m(id).getAs[String]("mime_after") == null)
    }
  }

  test("x135: binaryFile roundtrip — 16 files, every payload byte-identical") {
    val out = MultimodalQueries.x135BinaryIngest(spark, "unused").collect()
    // 20 assets, 4 null payloads (kind=missing) produce no file
    assert(out.length == 16)
    assert(out.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).toSeq.sorted)
    assert(out.forall(_.getBoolean(4)), "every payload must match its generator md5+length")
    assert(out.map(r => r.getString(1)).toSet == Set("image", "audio", "video", "opaque"))
    // deterministic across invocations (fixed dir, idempotent rewrite)
    val again = MultimodalQueries.x135BinaryIngest(spark, "unused").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(3))).toSeq)
  }
}
