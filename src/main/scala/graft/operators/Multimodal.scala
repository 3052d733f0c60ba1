package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One multimodal record: an opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded media metadata + sampled frame signatures. */
case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
    width: Int, height: Int, n_frames: Int, frame_hashes: Seq[Long])

/** Multimodal column pipeline (SURVEY.md §2.F): image/audio/video
  * carried as opaque `binary` columns; decode / feature-extract /
  * frame-sample run batched per partition via `mapPartitions` — the
  * Scala analog of `mapInPandas` batch UDFs. The Spark-side plumbing
  * (schema, partition batching, typed Dataset boundary) is real;
  * the codec itself is STUBBED with a deterministic digest-derived
  * fake (`fakeDecode`) because this container ships no image/audio
  * libraries — swap `fakeDecode` for a real decoder at deployment.
  */
object Multimodal {

  /** documents.text masqueraded as binary media payloads. */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Pluggable media codec: `open()` runs once per partition (the
    * expensive codec/model init — exactly the mapInPandas batching
    * rationale); the returned decoder handles each record. Swap
    * [[StubCodec]] for a real libjpeg/ffmpeg/OCR implementation at
    * deployment without touching any pipeline code.
    */
  trait MediaCodec extends Serializable {
    def open(): MediaDecoder
  }

  trait MediaDecoder {
    def decode(r: MediaRecord): MediaFeatures
    /** OCR/caption extraction for content search (image_search). */
    def extractText(r: MediaRecord): String
    /** Per-page text extraction for binary documents (doc_extract). */
    def extractPages(r: MediaRecord): Seq[String]
  }

  val PageChars = 200

  /** STUB codec: deterministic pseudo-metadata from the payload
    * digest, and "OCR" that reads the payload's first 5 words (the
    * test payloads are text bytes). The surrounding batching, schema
    * and partitioning are what a real codec would use unchanged.
    */
  object StubCodec extends MediaCodec {
    def open(): MediaDecoder = new MediaDecoder {
      private val md = MessageDigest.getInstance("MD5")
      def decode(r: MediaRecord): MediaFeatures = fakeDecode(r, md)
      def extractText(r: MediaRecord): String =
        new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
          .split(" ").take(5).mkString(" ")
      def extractPages(r: MediaRecord): Seq[String] = {
        // split by CODEPOINTS, not UTF-16 chars: String.grouped would
        // shift page boundaries vs the oracle's substr on any non-BMP
        // text and could split a surrogate pair in half
        val cps = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
          .codePoints.toArray
        cps.grouped(PageChars).map(a => new String(a, 0, a.length)).toSeq
      }
    }
  }

  private[operators] def fakeDecode(r: MediaRecord, md: MessageDigest): MediaFeatures = {
    md.reset()
    val d = md.digest(r.payload)
    def u16(i: Int): Int = ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)
    val nFrames = if (r.media_type == "video") u16(4) % 240 + 1 else 1
    val frameHashes = (0 until math.min(nFrames, 8)).map { f =>
      // frame-sample stub: digest of (payload digest, frame index)
      (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d((f + i) % 16) & 0xffL))
    }
    MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
      u16(0) % 1920 + 1, u16(2) % 1080 + 1, nFrames, frameHashes)
  }

  /** Batched decode through the pluggable codec seam: one decoder
    * open per partition, rows streamed through it.
    */
  def decodeFeatures(spark: SparkSession, dir: String,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaRecords(spark, dir).mapPartitions { it =>
      val d = codec.open()   // per-partition codec init
      it.map(d.decode)
    }
  }

  /** Per-page text extraction from binary document payloads — the
    * reference's PDF ingestion front end (core/utils.py:38
    * `extract_text_from_pdf`, core/supabase_utils.py:193
    * `_extract_pdf_text_by_page`): decode each payload into pages
    * through the codec seam (stub: fixed-width page splits), one
    * output row per page. The downstream chunk/embed pipeline starts
    * from these rows — ingestion no longer assumes pre-extracted
    * text.
    */
  def docExtract(spark: SparkSession, dir: String,
      codec: MediaCodec = StubCodec): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, dir)
      .mapPartitions { it =>
        val d = codec.open()
        it.flatMap(r => d.extractPages(r).zipWithIndex.map {
          case (page, i) => (r.doc_id, i.toLong, page)
        })
      }
      .toDF("doc_id", "page_no", "page_text")
      .withColumn("page_chars", length(col("page_text")).cast("long"))
      .orderBy(col("doc_id"), col("page_no"))
  }

  /** Content search over image payloads — the reference's
    * image_search flow (core/views.py:499 `image_search`, :680
    * `process_image_for_search`): decode the query images (stub OCR
    * through the codec seam), embed the extracted text with the same
    * hashed-BoW model as the document index, cosine-match against
    * the cached index, top-5 docs per query image. Query set: the
    * image-typed records with doc_id < 10.
    */
  def imageSearch(spark: SparkSession, dir: String,
      codec: MediaCodec = StubCodec): DataFrame = {
    import spark.implicits._
    val q = mediaRecords(spark, dir)
      .where(col("doc_id") < 10 && col("media_type") === "image")
      .as[MediaRecord]
      .mapPartitions { it =>
        val d = codec.open()
        it.map(r => (r.doc_id, d.extractText(r)))
      }
      .toDF("q_id", "q_text")
    VectorSearch.searchByText(spark, dir, q, 5)
  }

  /** Relational view over the decoded features: per media type, size
    * and dimension stats — the shape a curation pipeline filters on.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        sum(col("n_frames").cast("long")).as("total_frames"))
      .orderBy(col("media_type"))
}
