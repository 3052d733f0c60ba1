package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Document row as consumed by the streaming dedup: `ts_ms` is the
  * ingestion event time in epoch millis (the engine-wide
  * representation), `text` the raw content.
  */
case class DocIn(doc_id: Long, ts_ms: Long, text: String)

/** Streaming twin of the batch exact dedup
  * (operators/Dedup.dedupApply, mirroring the reference's content
  * dedup on upload — core/utils.py checks the chunk set before
  * append): the cleaned corpus maintained INCREMENTALLY. The first
  * arrival of each content hash survives; later copies inside the
  * retention horizon are dropped. Built on the engine-native
  * `dropDuplicatesWithinWatermark` — state is the hash set of the
  * horizon only, evicted by the watermark, so an unbounded ingest
  * stream runs in bounded state (the requirement the batch
  * hash-aggregate cannot meet on a stream).
  *
  * Retention caveat (same tradeoff as the funnel's StageReach): a
  * copy arriving more than [[WatermarkSpec]] after its original
  * re-emits, because the original's state row has been evicted.
  * First-wins equals the batch min-id canonical exactly when arrival
  * order follows doc_id — the append-only ingest case; under
  * out-of-order arrival the batch pass remains the reconciler (the
  * detect→apply staging pattern).
  */
object DedupStream {

  /** State-retention horizon: duplicates within this window of their
    * original are dropped; state is O(distinct hashes per horizon).
    */
  val WatermarkSpec: String = "24 hours"

  /** (doc_id, text_md5, ts_ms) of every surviving (first-seen)
    * document — the streaming cleaned corpus, append-mode safe.
    */
  def dedupExact(docs: Dataset[DocIn]): DataFrame =
    docs
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_md5")
      .select(col("doc_id"), col("text_md5"), col("ts_ms"))
}
