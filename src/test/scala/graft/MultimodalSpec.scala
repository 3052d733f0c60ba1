package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("batched decode covers every record with valid typed metadata") {
    val feats = Multimodal.decodeFeatures(spark, sfDir).collect()
    assert(feats.length == Tables.documents(spark, sfDir).count())
    feats.foreach { f =>
      assert(Set("image", "audio", "video").contains(f.media_type))
      assert(f.byte_len > 0)
      assert(f.width >= 1 && f.width <= 1920 && f.height >= 1 && f.height <= 1080)
      assert(f.n_frames >= 1 && (f.media_type == "video" || f.n_frames == 1))
      assert(f.frame_hashes.nonEmpty && f.frame_hashes.length <= 8)
    }
  }

  test("decode is deterministic across runs (stable fake codec)") {
    val a = Multimodal.decodeFeatures(spark, sfDir).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, sfDir).collect().sortBy(_.doc_id)
    assert(a.map(f => (f.doc_id, f.width, f.height, f.n_frames, f.frame_hashes))
      .sameElements(b.map(f => (f.doc_id, f.width, f.height, f.n_frames, f.frame_hashes))))
  }

  test("media stats aggregate the decoded features") {
    val rows = Multimodal.mediaStats(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("media_type")).toSet == Set("image", "audio", "video"))
    val videoFrames = rows.find(_.getAs[String]("media_type") == "video").get
      .getAs[Long]("total_frames")
    assert(videoFrames > rows.find(_.getAs[String]("media_type") == "image").get
      .getAs[Long]("total_frames"))
  }

  test("image_search: decode -> embed -> top-5 docs per query image") {
    val rows = Multimodal.imageSearch(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    // image-typed query docs under id 10: doc_id % 3 == 0
    assert(byQ.keySet == Set(0L, 3L, 6L, 9L))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      val ranked = rs.sortBy(_.getAs[Long]("rk"))
      val cos = ranked.map(_.getAs[Double]("cos"))
      assert(cos.sameElements(cos.sortBy(-_)))
      cos.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
    }
  }

  test("a custom MediaCodec drops into the same pipeline") {
    val fixed = new Multimodal.MediaCodec {
      def open(): Multimodal.MediaDecoder = new Multimodal.MediaDecoder {
        def decode(r: graft.operators.MediaRecord): graft.operators.MediaFeatures =
          graft.operators.MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
            1, 1, 1, Seq(0L))
        def extractText(r: graft.operators.MediaRecord): String = "fixed caption"
        def extractPages(r: graft.operators.MediaRecord): Seq[String] = Seq("page")
      }
    }
    val feats = Multimodal.decodeFeatures(spark, sfDir, fixed).collect()
    assert(feats.forall(f => f.width == 1 && f.n_frames == 1))
  }
}
