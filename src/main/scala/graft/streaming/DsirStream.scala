package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Perplexity

/** Streaming twin of the DSIR importance scorer
  * (operators/Perplexity.dsirScoreAgainst) — score each arriving
  * micro-batch of documents against TWO epoch-frozen bigram LMs (the
  * raw/proposal model and the target model) and publish the per-doc
  * log-likelihood ratio.
  *
  * Why frozen (the PplxStream argument, doubled): a self-updating raw
  * model would move `log p_raw` under every previously scored
  * document, silently re-weighting the whole selection pool — and
  * DSIR's deployment is precisely offline: train both models on
  * snapshots, score the crawl as it arrives, resample at the epoch
  * boundary. Corpus drift shows up in the NEXT epoch's raw model.
  *
  * Why foreachBatch and zero state: the per-doc fold is batch-local
  * (a document's bigrams never span micro-batches), so running the
  * batch [[Perplexity.dsirScoreAgainst]] verbatim per micro-batch
  * needs no watermark and no streaming state, and the single shared
  * spelling means stream and batch ratios cannot drift
  * (DsirStreamSpec pins the parity for any micro-batch split).
  * Delivery is at-least-once: the ratio is a pure function of
  * (models, text), so re-delivery re-publishes identical rows.
  *
  * Scale shape: per micro-batch, two hash joins of the batch's
  * bigrams against the (static, typically broadcast) model tables +
  * partial aggs + one batch-sized doc_id join — the batch scorer's
  * plan at batch size, at any stream rate.
  */
object DsirStream {

  /** Score a document stream against frozen (raw, target) models,
    * publishing each scored micro-batch of
    * (doc_id, n_bigrams, log_ratio) through `publish` (the
    * CurateStream sink seam).
    */
  def scoreSink(docs: DataFrame, rawModel: DataFrame,
      targetModel: DataFrame)(publish: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(docs.columns.contains("doc_id") && docs.columns.contains("text"),
      s"stream must carry (doc_id, text), got ${docs.columns.mkString(",")}")
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          publish(Perplexity.dsirScoreAgainst(rawModel, targetModel, batch))
        }
      }
  }
}
