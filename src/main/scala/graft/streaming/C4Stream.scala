package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.operators.TextAnalysis

/** Streaming twins of the C4/FineWeb line-level quality family
  * (operators/TextAnalysis: c4_line_stats / c4_filter /
  * fineweb_linededup).
  *
  * The C4 rules are BATCH-LOCAL per document — every line a rule
  * inspects comes from that document's own text column, so rules can
  * never span micro-batches. Running the batch [[TextAnalysis
  * .c4MetricsOf]] verbatim inside foreachBatch therefore keeps ZERO
  * streaming state, needs no watermark, and the single shared
  * spelling means stream and batch verdicts cannot drift
  * (C4StreamSpec pins parity for any micro-batch split) — the
  * PplxStream.scoreSink shape.
  *
  * FineWeb line-dedup is CROSS-document, so its twin carries the one
  * honest piece of state an incremental line-dedup needs: an
  * APPEND-ONLY committed line index (md5 hashes of every line that
  * has already won), the SemDedupStream pattern.
  *  - WITHIN a batch, the batch spelling runs verbatim
  *    ([[TextAnalysis.lineDedupOf]] — one spelling; a batch over an
  *    empty index IS `fineweb_linededup`).
  *  - ACROSS batches, an arriving line drops iff its hash is already
  *    committed — first-winner-stays, which is exactly the batch
  *    rule's (doc_id, line_idx) order when batches arrive in doc_id
  *    order, and the documented frozen-index trade otherwise (a
  *    later arrival can never retroactively strip a committed line).
  *  - Re-delivery is idempotent across the WHOLE at-least-once
  *    window: [[detect]] is stateless in frozen inputs, and [[run]]'s
  *    sinks are epoch-scoped ([[runBatch]] — a replayed epoch reads
  *    only strictly-older index epochs and overwrites its own
  *    partitions, so it can neither see its own commits nor append
  *    duplicates).
  *
  * Scale shape per micro-batch: one explode + map-side-combined
  * min-struct winner at batch size, and ONE hash anti-join against
  * the committed index on the line hash — a boilerplate flood in the
  * stream contracts to one row per map partition before any
  * exchange, and the index side is hash-partitioned, never scanned
  * per line.
  */
object C4Stream {

  /** Stateless C4 line-rule stream: publish each arriving
    * micro-batch's rule metrics (the c4_line_stats shape — callers
    * `.where(col("keep"))` for the c4_filter apply form). `publish`
    * is the CurateStream sink seam (parquet append, MERGE, memory).
    */
  def metricsSink(docs: DataFrame)(publish: DataFrame => Unit)
      : DataStreamWriter[Row] = {
    require(docs.columns.contains("doc_id") && docs.columns.contains("text"),
      s"stream must carry (doc_id, text), got ${docs.columns.mkString(",")}")
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) publish(TextAnalysis.c4MetricsOf(batch))
      }
  }

  /** Line-dedup verdicts for ONE batch of (doc_id, text) documents
    * against the frozen committed line index — the per-batch body
    * [[run]] applies, pure in its inputs (the seam the spec drives).
    * Output is the batch query's shape (doc_id, n_lines, n_kept,
    * kept_text); the caller commits `surviving line hashes` with
    * [[linesOf]] after publishing.
    *
    * @param lineIndex STATIC `h`-column frame of committed line
    *                  hashes (may be empty)
    * @param indexKey  session-cache key / version tag for the index —
    *                  batches under one key reuse one distinct pass;
    *                  ROTATING, so an epoch that re-freezes releases
    *                  the previous slice's blocks
    */
  def detect(spark: SparkSession, batch: DataFrame, lineIndex: DataFrame,
             indexKey: String): DataFrame = {
    val lineageTag = java.lang.Integer.toHexString(
      lineIndex.queryExecution.analyzed.semanticHash())
    val idx = graft.DfCache.getOrComputeRotating(spark, "c4stream_lineidx",
      s"$indexKey-$lineageTag") {
      lineIndex.select(col("h")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    TextAnalysis.lineDedupOf(batch.select(col("doc_id"), col("text")),
      committed = Some(idx))
  }

  /** The line hashes a published batch result commits to the index:
    * every line of every `kept_text` (the batch's winners).
    */
  def linesOf(published: DataFrame): DataFrame =
    published.where(col("n_kept") > 0)
      .select(explode(split(col("kept_text"), "\n")).as("line"))
      .select(md5(col("line")).as("h")).distinct()

  /** Span-dedup verdicts for ONE batch of (doc_id, text) documents
    * against the frozen committed SPAN index — the C4 three-span
    * rule's incremental twin ([[detect]]'s shape at span grain):
    * a committed span's local occurrences are all globally non-first
    * and drop entirely; fresh spans play the within-batch
    * first-occurrence rule verbatim (one spelling:
    * [[TextAnalysis.c4SpanDedupOf]]). With in-doc_id-order batches
    * this reproduces the corpus-wide run exactly; the caller commits
    * [[spansOf]] of the RAW batch after publishing (occurrence
    * counting is over the original corpus, so removed occurrences
    * still commit their hashes — exactly the batch rule's census).
    */
  def detectSpans(spark: SparkSession, batch: DataFrame, spanIndex: DataFrame,
                  indexKey: String): DataFrame = {
    val lineageTag = java.lang.Integer.toHexString(
      spanIndex.queryExecution.analyzed.semanticHash())
    val idx = graft.DfCache.getOrComputeRotating(spark, "c4stream_spanidx",
      s"$indexKey-$lineageTag") {
      spanIndex.select(col("h")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    TextAnalysis.c4SpanDedupOf(batch.select(col("doc_id"), col("text")),
      committed = Some(idx))
  }

  /** The span hashes a batch commits to the index: every
    * [[TextAnalysis.C4SpanLines]]-line span of the batch's ORIGINAL
    * text (kept or removed — the global rule counts occurrences over
    * the raw corpus).
    */
  def spansOf(batch: DataFrame): DataFrame = {
    val n = TextAnalysis.C4SpanLines
    batch.select(split(col("text"), "\n").as("ls"))
      .where(size(col("ls")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("ls")) - n),
        i => md5(array_join(slice(col("ls"), i + 1, lit(n)), "\n")))).as("h"))
      .distinct()
  }

  /** The per-epoch body [[run]] executes — exposed so redelivery can
    * be driven directly in specs. Idempotent across the WHOLE
    * at-least-once window, not just a crash between the two writes:
    *  - the committed view is the index filtered to `epoch < this
    *    epoch`, so a replay after its own index write landed (crash
    *    before the streaming checkpoint committed) does NOT see its
    *    own winners as committed and cannot collapse `n_kept`;
    *  - both sinks are epoch-named partition directories written with
    *    Overwrite (`outDir/epoch=N`, `indexDir/epoch=N`), so a
    *    replayed epoch REPLACES its first delivery instead of
    *    appending duplicate rows — `spark.read.parquet(outDir)`
    *    surfaces `epoch` as a partition column and the `< epoch`
    *    index filter partition-prunes.
    * Directory existence resolves through the path's Hadoop
    * FileSystem, so an hdfs:// or s3a:// indexDir behaves exactly
    * like the local one `spark.read.parquet` would resolve.
    */
  def runBatch(spark: SparkSession, batch: DataFrame, epoch: Long,
               indexDir: String, outDir: String): Unit = {
    val idxPath = new org.apache.hadoop.fs.Path(indexDir)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed =
      if (fs.exists(idxPath))
        spark.read.parquet(indexDir)
          .where(col("epoch") < epoch).select(col("h"))
      else spark.range(0).select(lit("").as("h")).where(lit(false))
    val out = detect(spark, batch, committed, s"$indexDir@$epoch")
      .localCheckpoint()
    out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/epoch=$epoch")
    linesOf(out).write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/epoch=$epoch")
  }

  /** Drive a document stream through [[detect]]: each micro-batch's
    * rebuilt documents land under `outDir/epoch=N` and its surviving
    * line hashes under `indexDir/epoch=N` ([[runBatch]] — replayed
    * epochs replace rather than duplicate, and never read their own
    * commits).
    */
  def run(spark: SparkSession, docs: DataFrame, indexDir: String,
          outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        runBatch(spark, batch, epoch, indexDir, outDir)
      }
      .start()
}
