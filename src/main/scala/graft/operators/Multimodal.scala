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

  /** STUB decoder: deterministic pseudo-metadata from the payload
    * digest. A real implementation would call the codec here — the
    * surrounding batching, schema and partitioning are unchanged.
    */
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

  /** Batched decode: one MessageDigest per partition (the expensive
    * "codec init" happens once per batch, not per row — exactly the
    * mapInPandas batching rationale).
    */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaRecords(spark, dir).mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")   // per-partition codec init
      it.map(fakeDecode(_, md))
    }
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
