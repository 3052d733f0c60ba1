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

  test("gzip payloads are real compressed streams the codec genuinely decodes") {
    import org.apache.spark.sql.functions._
    val recs = Multimodal.gzipRecords(spark, sfDir).collect()
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(recs.length === texts.size)
    // RFC 1952 magic on every payload — these are real gzip members,
    // not text masquerading as binary
    recs.foreach { r =>
      assert((r.payload(0) & 0xff) === 0x1f && (r.payload(1) & 0xff) === 0x8b,
        s"doc ${r.doc_id}: payload is not a gzip stream")
    }
    // compression is genuinely happening on the longer docs
    val long = recs.filter(r => texts(r.doc_id).length > 400)
    assert(long.nonEmpty)
    assert(long.forall(r => r.payload.length <
      texts(r.doc_id).getBytes("UTF-8").length),
      "long docs must compress below their raw byte length")
    // and the decoder inverts it exactly
    val dec = Multimodal.GzipDocCodec.open()
    recs.take(50).foreach { r =>
      assert(dec.extractText(r) === texts(r.doc_id), s"doc ${r.doc_id} round-trip")
    }
    // a corrupted stream fails loudly, never silently passes the gate
    val bad = recs.head.copy(payload = recs.head.payload.map(b => (b ^ 0x2a).toByte))
    intercept[java.io.IOException] { dec.extractText(bad) }
  }

  test("pdf payloads are valid Flate PDFs the codec genuinely extracts") {
    import org.apache.spark.sql.functions._
    val recs = Multimodal.pdfRecords(spark, sfDir).collect()
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(recs.length === texts.size)
    val dec = Multimodal.PdfDocCodec.open()
    recs.foreach { r =>
      val latin1 = new String(r.payload, java.nio.charset.StandardCharsets.ISO_8859_1)
      // real PDF structure: header, Flate stream, xref whose recorded
      // offset actually lands on the xref table
      assert(latin1.startsWith("%PDF-1.4"), s"doc ${r.doc_id}: no PDF header")
      assert(latin1.contains("/Filter /FlateDecode"))
      val sx = """startxref\n(\d+)\n""".r.findFirstMatchIn(latin1)
        .getOrElse(fail(s"doc ${r.doc_id}: no startxref"))
      assert(latin1.startsWith("xref", sx.group(1).toInt),
        s"doc ${r.doc_id}: startxref does not point at the xref table")
    }
    // the operator walk inverts the writer exactly — including docs
    // with parens/backslashes and empty lines if any exist
    recs.take(50).foreach { r =>
      assert(dec.extractText(r) === texts(r.doc_id), s"doc ${r.doc_id} round-trip")
    }
    // a corrupted content stream fails loudly, never silently passes
    val victim = recs.head
    val streamAt = new String(victim.payload,
      java.nio.charset.StandardCharsets.ISO_8859_1).indexOf("stream\n") + 7
    val mangled = victim.payload.clone()
    (streamAt until math.min(streamAt + 16, mangled.length))
      .foreach(i => mangled(i) = (mangled(i) ^ 0x2a).toByte)
    intercept[Exception] { dec.extractText(victim.copy(payload = mangled)) }
  }

  test("pdf writer/extractor round-trips hostile strings byte-exact") {
    val hostile = Seq(
      "parens (nested (deep)) and \\backslash\\ mix",
      "trailing newline\n", "\nleading and\n\ndouble blank", "",
      "unicode: café 漢字 😀 end",
      "octal-ish \\101 literal", "carriage\rreturn kept")
    val dec = Multimodal.PdfDocCodec.open()
    hostile.foreach { t =>
      val got = Multimodal.pdfExtractText(Multimodal.buildPdf(t))
      assert(got === t, s"round-trip drifted for ${t.take(30).replace("\n", "\\n")}")
    }
  }

  test("gzip codec pages == stub codec pages over the same documents") {
    val viaGzip = Multimodal.gzipRecords(spark, sfDir).collect()
      .map { r =>
        r.doc_id -> Multimodal.GzipDocCodec.open().extractPages(r)
      }.toMap
    val viaStub = Multimodal.mediaRecords(spark, sfDir).collect()
      .map { r =>
        r.doc_id -> Multimodal.StubCodec.open().extractPages(r)
      }.toMap
    assert(viaGzip.keySet === viaStub.keySet)
    val diff = viaGzip.keys.filter(k => viaGzip(k) != viaStub(k))
    assert(diff.isEmpty, s"page split differs through the real codec: ${diff.take(3)}")
  }
}
