package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming twin of the INCREMENTAL leakage-aware split
  * (operators/Dedup.datasetSplitIncremental): arriving crawl
  * documents take a train/eval side CONSISTENTLY with a FROZEN base
  * manifest, per micro-batch, instead of a full re-split per refresh.
  *
  * The frozen manifest makes this STATELESS across batches (the
  * MixStream argument, one operator over): the only inputs besides
  * the batch are the committed base artifacts — the base band index
  * the probe hash-joins against and the (match_id, base_group)
  * manifest — and the only randomness is the deterministic md5 group
  * coin. Nothing accumulates, so at-least-once re-delivery reproduces
  * byte-identical rows (SplitStreamSpec), and no watermark exists to
  * tune.
  *
  * PER-BATCH SEMANTICS, same contract as the batch operator applied
  * to each arriving batch as its delta (SplitStreamSpec pins the
  * equality): matched docs inherit their best base match's group
  * side; the batch's NOVEL remainder is quotiented WITHIN THE BATCH
  * (exact-content groups + near-dup components share one coin — the
  * r13 delta-internal rule, via the same [[Dedup.deltaInternalGroups]]
  * spelling). Novel near-dups that straddle two micro-batches coin
  * independently — the same frozen-manifest trade the batch operator
  * documents for docs bridging a MATCHED neighbor, measured per batch
  * by Dedup.splitBridgeAudit; choose the trigger interval so a
  * crawl's burst of mutual near-dups lands in one batch when that
  * matters.
  *
  * Scale shape per micro-batch: delta-sized probe against the staged
  * base index (session-cached across batches under `indexKey` — one
  * build per manifest version per executor JVM lifetime), the
  * delta-internal quotient on the novel remainder only, three
  * doc-id hash joins, a scalar coin. Output is batch-sized,
  * append-only — exactly what a training-manifest consumer merges.
  */
object SplitStream {

  /** Assign split sides to ONE batch of documents against the frozen
    * base — the per-batch body [[run]] applies, pure in its inputs
    * (the seam SplitStreamSpec drives directly).
    *
    * @param batch    (doc_id, text) arriving documents
    * @param base     STATIC (doc_id, text) base corpus the probe
    *                 index derives from
    * @param baseAsg  STATIC (match_id, base_group) frozen manifest
    *                 ([[Dedup.splitBaseManifest]]'s shape)
    * @param indexKey session-cache key for the base index slots — the
    *                 manifest version tag; batches under one key
    *                 reuse one index build
    */
  def assign(spark: SparkSession, batch: DataFrame, base: DataFrame,
             baseAsg: DataFrame, indexKey: String,
             evalFrac: Double = Dedup.SplitEvalFrac,
             threshold: Double = 0.8): DataFrame = {
    val matches = Dedup.neardupIncrementalOf(base, batch, threshold,
        mat = (slot, df) => slot match {
          // the persisted index: once per (session, manifest
          // version), ROTATING so a manifest rotation releases the
          // previous version's blocks instead of pinning them
          case "base_rep_posting" | "base_rep_banded" =>
            graft.DfCache.getOrComputeRotating(spark, s"split_stream_$slot", indexKey)(
              df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          // per-batch frames: eagerly materialized, released with the
          // batch (no session persist to leak across a long stream)
          case _ => df.localCheckpoint()
        })
      .select(col("doc_id"), col("match_id"))
    val novel = batch
      .join(matches.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"))
    // the SAME jaccard floor as the matcher above — a coin group
    // built under a different near-dup definition would split sides
    // inconsistently with the requested leakage contract
    val deltaGroups = Dedup.deltaInternalGroups(spark, novel, threshold)
    Dedup.splitAssignOf(batch.select(col("doc_id")), matches, baseAsg,
      deltaGroups, evalFrac)
  }

  /** Drive a document stream through [[assign]], appending each
    * batch's assignment to `outDir` as parquet — the foreachBatch
    * sink shape; re-delivered batches append duplicate rows with
    * IDENTICAL values (stateless + deterministic coin), so any
    * downstream `dropDuplicates(doc_id)` view is exact.
    */
  def run(spark: SparkSession, docs: DataFrame, base: DataFrame,
          baseAsg: DataFrame, indexKey: String, outDir: String,
          checkpointDir: String,
          evalFrac: Double = Dedup.SplitEvalFrac,
          threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        assign(spark, batch, base, baseAsg, indexKey, evalFrac, threshold)
          .write.mode(SaveMode.Append).parquet(outDir)
      }
      .start()
}
