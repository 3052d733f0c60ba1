package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{VectorFunctions => V}
import graft.operators.VectorSearch

/** Streaming twin of the SemDeDup domination report
  * (operators/VectorSearch.semDedup): arriving embedding vectors take
  * a keep/drop verdict against a FROZEN committed survivor index, per
  * micro-batch, instead of a full-corpus re-dedup per refresh.
  *
  * Frozen inputs make this STATELESS across batches (the SplitStream
  * argument): the only inputs besides the batch are the committed
  * centroid table (assignment must not drift while verdicts
  * accumulate — an epoch-frozen artifact, the DsirStream convention)
  * and the committed kept index; the verdicts are deterministic in
  * them, so at-least-once re-delivery reproduces byte-identical rows
  * and no watermark exists to tune.
  *
  * PER-BATCH SEMANTICS (SemDedupStreamSpec pins each):
  *  - WITHIN the batch, the batch operator's spelling runs verbatim
  *    ([[VectorSearch.semReportOf]]: quotient → capped rep cell join
  *    → domination) — one batch over an empty index IS `semdedup`.
  *  - ACROSS, a batch rep also drops when some frozen kept vector in
  *    its cell is τ-close with better priority (lower ccos, ties to
  *    smaller vec_id) — the index side capped at
  *    [[VectorSearch.EmbBucketCap]] reps per cell in vec_id order,
  *    the batch build's cap contract applied to the index.
  *  - The index is APPEND-ONLY: an arrival with better priority than
  *    a τ-close committed survivor keeps itself but cannot
  *    retroactively drop the survivor — the standing frozen-manifest
  *    trade every incremental twin documents (neardup_incremental,
  *    SplitStream). A batch re-run of `semdedup` over base ∪ delta
  *    remains the reconciler when survivor revocation matters.
  *  - Batch-straddling NOVEL near-pairs coin independently per batch
  *    (each side sees neither the other nor the index) — verdicts
  *    against the FROZEN index are invariant under any micro-batch
  *    split; within-batch domination is batch-local by design.
  *
  * Scale shape per micro-batch: one batch × broadcast-⩽k assignment
  * pass, a batch-sized quotient, the capped within-batch rep join,
  * and ONE cell-blocked hash join against the session-cached capped
  * index slice (≤ cap·batch_reps intermediate BY CONSTRUCTION).
  * Output is batch-sized, append-only.
  */
object SemDedupStream {

  /** Verdicts for ONE batch of (vec_id, emb) vectors against the
    * frozen centroids + frozen kept index — the per-batch body
    * [[run]] applies, pure in its inputs (the seam the spec drives).
    *
    * @param batch     (vec_id, emb: array<double>) arriving vectors
    * @param cent      STATIC (label, c_emb) frozen centroid table
    *                  (VectorSearch.kmeansCentroids' shape)
    * @param keptIndex STATIC (vec_id, label, ccos, emb) committed
    *                  survivors (semdedup_apply joined back to its
    *                  vectors); may be empty
    * @param indexKey  session-cache key for the capped index slice —
    *                  the index version tag; batches under one key
    *                  reuse one cap pass
    */
  def detect(spark: SparkSession, batch: DataFrame, cent: DataFrame,
             keptIndex: DataFrame, indexKey: String): DataFrame = {
    // per-batch frames: eagerly materialized, released with the batch
    // (the SplitStream/CurateStream convention) — cl fans out to the
    // quotient, the rep probe, both priority joins and the report,
    // and members to three branches; without the checkpoint every
    // branch would re-run the assignment crossJoin + window
    val cl = VectorSearch.assignClustersCos(
      batch.select(col("vec_id"), col("emb")), cent).localCheckpoint()
    val members = VectorSearch.embMembersOf(cl).localCheckpoint()
    val within = VectorSearch.semReportOf(cl, members)
    // frozen side: one capped slice per (session, index version) —
    // EmbBucketCap reps per cell in vec_id order, the build-cap
    // contract applied to the committed index; ROTATING so an epoch
    // that re-freezes the index releases the previous slice's blocks.
    // The tag folds in keptIndex's ANALYZED-PLAN semantic hash: a
    // caller that re-freezes the index (new lineage — a new parquet
    // snapshot read, a different filter) but reuses indexKey gets a
    // fresh slice instead of silently serving the previous epoch's
    // verdicts. (A same-path re-read whose files changed still needs
    // a new indexKey — lineage can't see file contents; that residual
    // requirement is the documented epoch contract.)
    val lineageTag = java.lang.Integer.toHexString(
      keptIndex.queryExecution.analyzed.semanticHash())
    val idx = graft.DfCache.getOrComputeRotating(spark, "semstream_idx",
      s"$indexKey-$lineageTag") {
      val bw = Window.partitionBy(col("label")).orderBy(col("vec_id"))
      keptIndex
        .withColumn("brk", row_number().over(bw))
        .where(col("brk") <= VectorSearch.EmbBucketCap)
        .select(col("label"), col("vec_id").as("k_id"),
          col("ccos").as("k_ccos"), col("emb").as("k_emb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // only batch REPS need the cross check: a non-rep member is
    // already dropped within-batch, and its rep sees the same cosines
    val reps = cl.join(
      members.where(col("vec_id") === col("rep_id")).select(col("vec_id")),
      Seq("vec_id"), "left_semi")
    val domByBase = reps.join(idx, Seq("label"))
      .where(V.cosine4(col("emb"), col("k_emb")) >= VectorSearch.SemTau
        && (col("k_ccos") < col("ccos")
          || (col("k_ccos") === col("ccos") && col("k_id") < col("vec_id"))))
      .select(col("vec_id")).distinct()
      .withColumn("base_dom", lit(true))
    within.join(domByBase, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("ccos"),
        (col("keep") && col("base_dom").isNull).as("keep"))
  }

  /** Drive a vector stream through [[detect]], appending each batch's
    * verdicts to `outDir` as parquet — the foreachBatch sink shape;
    * re-delivered batches append duplicate rows with IDENTICAL values
    * (stateless + frozen inputs), so any downstream
    * `dropDuplicates(vec_id)` view is exact.
    */
  def run(spark: SparkSession, vecs: DataFrame, cent: DataFrame,
          keptIndex: DataFrame, indexKey: String, outDir: String,
          checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        detect(spark, batch, cent, keptIndex, indexKey)
          .write.mode(SaveMode.Append).parquet(outDir)
      }
      .start()
}
