package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.{md5Long, tokens}
import graft.operators.Pack

/** A document's packing assignment — same shape as the batch
  * operators/Pack.seqPack output.
  */
case class PackedDoc(doc_id: Long, shard: Long, seq_id: Long,
    tok_offset: Long, n_tok: Long)

/** Per-shard cursor: tokens laid down so far in this shard's
  * concatenated stream. The ENTIRE state of the packer — one long
  * per shard, forever, regardless of how many documents flow.
  */
private[streaming] case class ShardCursor(tokensSoFar: Long)

/** Pre-grouped row: the doc's shard and token count (codegen-visible
  * top-level class — Spark's encoder projection cannot access an
  * object-nested private case class).
  */
private[streaming] case class PackRow(doc_id: Long, shard: Long, n_tok: Long)

/** Streaming twin of the batch sequence packer
  * (operators/Pack.seqPack): training sequences laid out
  * INCREMENTALLY as curated documents arrive, instead of a
  * full-corpus batch pass before every training run.
  *
  * Packing is order-sensitive by nature, so the streaming semantics
  * are arrival-order packing (the contract a trainer consuming an
  * append-only stream wants): within a micro-batch each shard's
  * documents are laid down in doc_id order, across micro-batches in
  * arrival order. When the stream delivers documents in doc_id order
  * per shard — the append-only ingest case — the output is EXACTLY
  * the batch layout (PackStreamSpec pins this across micro-batch
  * splits). Under out-of-order arrival the layout is still a valid
  * zero-padding packing, just a different document order; the batch
  * pass remains the reconciler if bit-parity with it matters.
  *
  * Scale shape: one shuffle (groupBy shard), state O(nShards) longs
  * — no watermark needed because state never grows with data; a
  * 100 TB/day stream and a 1 GB/day stream hold the same 8 bytes per
  * shard. PER-BATCH memory is a separate bound: the in-batch doc_id
  * sort materializes each shard's micro-batch slice
  * (`rows.toSeq.sortBy`), so a task holds O(largest shard's rows in
  * ONE micro-batch) — sized by trigger interval × ingest rate /
  * nShards, not by corpus size. Raise nShards (or shorten the
  * trigger) if a micro-batch's per-shard slice outgrows executor
  * memory; the rows are (id, shard, count) triples, never the texts.
  */
object PackStream {

  def pack(spark: SparkSession, docs: Dataset[DocIn],
           budget: Int = Pack.DefaultSeqTokens,
           nShards: Int = Pack.DefaultPackShards): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import spark.implicits._
    docs
      // same salted coin as the batch packer — identical sharding
      .select(col("doc_id"),
        (md5Long(concat(lit("pack:"), col("doc_id").cast("string")), 1, 8)
          % nShards).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .as[PackRow]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[ShardCursor, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[PackRow], state: GroupState[ShardCursor]) =>
          // micro-batch-local doc_id sort: determinism within a batch,
          // arrival order across batches
          val sorted = rows.toSeq.sortBy(_.doc_id)
          var cursor = state.getOption.fold(0L)(_.tokensSoFar)
          val out = sorted.map { r =>
            val start = cursor
            cursor += r.n_tok
            PackedDoc(r.doc_id, shard, start / budget, start % budget, r.n_tok)
          }
          state.update(ShardCursor(cursor))
          out.iterator
      }
  }
}
