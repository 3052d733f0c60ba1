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
}
