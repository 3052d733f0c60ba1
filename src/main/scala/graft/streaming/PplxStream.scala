package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Perplexity

/** Streaming twin of the perplexity scorer (operators/Perplexity) —
  * score each arriving micro-batch of documents against an
  * EPOCH-FROZEN bigram LM, optionally tagging the frozen
  * head/middle/tail bucket.
  *
  * Why frozen (the MixStream argument, applied to a model): a
  * self-updating LM would move every conditional `P(w2|w1)` as the
  * stream grows, making earlier scores retroactively incomparable —
  * and a trainer consumes a corpus whose quality gate was fixed when
  * the epoch started. CCNet's actual deployment is exactly this
  * shape: the LM is trained OFFLINE on a reference corpus and shipped
  * as an artifact; corpus drift shows up in the next epoch's model.
  *
  * Why foreachBatch, not a streaming aggregation: the per-doc fold
  * `-Σ ln P / n` aggregates a document's bigrams, and a document's
  * bigrams all come from its own text column — they can never span
  * micro-batches. So the fold is batch-LOCAL: running the batch
  * [[Perplexity.scoreAgainst]] verbatim inside foreachBatch needs no
  * watermark and keeps ZERO streaming state, and the single shared
  * spelling means stream and batch scores cannot drift (PplxStreamSpec
  * pins the parity for any micro-batch split). A streaming groupBy
  * (doc_id) would instead accrete unbounded state for a key that is
  * complete after its first batch.
  *
  * Scale shape: per micro-batch, one hash join of the batch's bigrams
  * against the (static, typically broadcast) model table + a partial
  * agg — the batch scorer's plan at batch size, at any stream rate.
  */
object PplxStream {

  /** Score a document stream against a frozen model, publishing each
    * scored micro-batch through `publish` (parquet append, a MERGE
    * into a curated table, a memory buffer in tests — the
    * CurateStream sink seam). When `cuts` is given (a 1-row (c1, c2)
    * frame — the batch calibration artifact), each scored row also
    * carries its frozen `bucket`.
    *
    * Delivery is at-least-once: scores are a pure function of
    * (model, text), so re-delivery re-publishes identical rows and
    * any idempotent sink (or dedup on doc_id downstream) absorbs it.
    *
    * `scorer` picks the smoothing family — [[Perplexity.scoreAgainst]]
    * (add-one, the default), [[Perplexity.scoreAgainstInterp]] or
    * [[Perplexity.scoreAgainstKn]] — all three consume the same
    * frozen [[Perplexity.modelOf]] artifact and are batch-local
    * per-doc folds, so the epoch-frozen argument is scorer-agnostic
    * (PplxStreamSpec proves stream ≡ batch for the KN pick too).
    */
  def scoreSink(docs: DataFrame, model: DataFrame,
      cuts: Option[DataFrame] = None,
      scorer: (DataFrame, DataFrame) => DataFrame =
        Perplexity.scoreAgainst(_, _))(publish: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(docs.columns.contains("doc_id") && docs.columns.contains("text"),
      s"stream must carry (doc_id, text), got ${docs.columns.mkString(",")}")
    cuts.foreach { c =>
      require(c.columns.toSet == Set("c1", "c2"),
        s"cuts must be exactly (c1, c2), got ${c.columns.mkString(",")}")
    }
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val scored = scorer(model, batch)
          // append the frozen bucket to WHATEVER the scorer emitted —
          // the count column is n_bigrams or n_trigrams depending on
          // the family, and hardcoding one would break the other
          publish(cuts.fold(scored)(c => scored.crossJoin(broadcast(c))
            .select(scored.columns.map(col) :+
              Perplexity.bucketOf(col("xent"), col("c1"), col("c2"))
                .as("bucket"): _*)))
        }
      }
  }
}
