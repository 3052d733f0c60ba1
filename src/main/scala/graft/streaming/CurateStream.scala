package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shinglePosting
import graft.operators.{Curate, Dedup}
import graft.sources.ManifestStore

/** The batch curation funnel (operators/Curate: validate → quality →
  * lang → exact-dedup → near-dup → decontaminate) maintained
  * INCREMENTALLY over an unbounded document stream — the "keep the
  * training corpus clean as the crawl arrives" flow, instead of
  * re-running the whole funnel per refresh.
  *
  * Shape: the foreachBatch MERGE pattern (the ChunkIndex
  * streamingUpsert seam). Each micro-batch runs the SAME single
  * gate spellings as the batch funnel ([[Curate.gateFlags]],
  * [[Dedup.exactKeep]], the LSH band keys of [[NearDupStream.banded]]
  * — spec-proven identical to the batch build's — and the exact
  * posting-list [[Dedup.jaccardOf]] with the same
  * [[Curate.NearDupJaccard]] floor), against ACCUMULATED state
  * tables, all published under ONE [[ManifestStore]] root:
  *
  * {{{
  *   stateDir/
  *     manifests/m-<seq>-<uuid>.txt   # the committed six-table state
  *     data/b-<uuid>/kept/…           # (doc_id, n_chars) kept docs
  *     data/b-<uuid>/revoked/…        # retroactively decontaminated
  *     data/b-<uuid>/hashes/…         # (text_md5) exact-dedup horizon
  *     data/b-<uuid>/postings/…       # (doc_id, s) shingle postings of
  *                                    #   every exact-dedup SURVIVOR
  *     data/b-<uuid>/bands/…          # (bd, band_key, doc_id)
  *     data/b-<uuid>/bench_post/…     # surviving-benchmark postings
  * }}}
  *
  * == Atomic multi-table commit ==
  *
  * A micro-batch writes its six per-table deltas as immutable segment
  * dirs under a fresh `data/b-*` prefix, then publishes ONE manifest
  * naming every table's current segments — the ChunkIndex commit
  * protocol. A crash ANYWHERE before the manifest rename leaves
  * readers on the previous fully-consistent six-table snapshot
  * (orphan segment dirs from the crashed attempt are invisible until
  * [[vacuum]] reclaims them), and [[keptCorpus]] resolves the
  * manifest ONCE, so kept and revoked are always read from the same
  * snapshot — no transient kept-but-about-to-be-revoked view.
  *
  * DELIVERY: foreachBatch is at-least-once, and the atomic commit
  * makes re-delivery all-or-nothing: a batch whose commit landed dies
  * in full at the exact-dedup gate (its hashes are in the snapshot);
  * a batch whose commit didn't land left NO visible state and
  * reprocesses from scratch. The partial-append window of the
  * previous per-table-append layout is gone. (State written by that
  * pre-manifest layout is not readable here — restart streams with a
  * fresh stateDir; see MIGRATION.md.)
  *
  * == Compaction ==
  *
  * One segment dir per table per batch accrues unbounded small dirs
  * on a long-lived stream. When a table exceeds [[CompactSegments]]
  * segments, the batch folds the table (prior segments + its own
  * delta) into ONE segment published by the same manifest commit —
  * amortized cost one table rewrite per [[CompactSegments]] batches,
  * and the file count stays bounded regardless of stream length.
  * Superseded segments are snapshots until [[vacuum]].
  *
  * The cleaned corpus is [[keptCorpus]] = kept minus revoked.
  * Near-dup state covers every exact-dedup survivor (not just final
  * keeps) — in the batch funnel a doc dropped as a near-dup can still
  * cause a LATER doc's drop, and the stream reproduces that.
  *
  * NEAR-DUP SEMANTICS: an arriving doc is dropped when it verifies at
  * the jaccard floor against ANY prior survivor (regardless of id —
  * keep-first, [[DedupStream]]'s rule) or a smaller-id batch-mate
  * (within one micro-batch "arrival order" is doc_id order, the batch
  * keep-min rule). Under ascending-id arrival the two rules coincide
  * with batch curate_apply exactly (CurateStreamSpec).
  *
  * DECONTAMINATION mirrors the batch rule: the benchmark side is the
  * benchmark-id docs (doc_id % 101 = 0) that SURVIVE the pipeline's
  * own gate+dedup stages — batch uses `shinglePosting(s6)` restricted
  * to benchmark ids, so a gate-failing or near-dup-dropped benchmark
  * doc decontaminates nothing. And because a benchmark doc can ARRIVE
  * AFTER a training doc it contains (batch, seeing the closed corpus
  * at once, would drop that doc), each new benchmark survivor
  * triggers a RETROACTIVE pass: previously-kept docs it contaminates
  * land in the append-only `revoked/` table rather than being
  * rewritten in place.
  */
object CurateStream {

  private val KeptDir      = "kept"
  private val RevokedDir   = "revoked"
  private val HashesDir    = "hashes"
  private val PostDir      = "postings"
  private val BandsDir     = "bands"
  private val BenchPostDir = "bench_post"

  /** Segments a table may accrue before the next batch folds it into
    * one — bounds on-disk dir count at CompactSegments + 1 per table.
    */
  private[graft] val CompactSegments = 12

  /** The accumulated cleaned corpus — the stream's `curate_apply`:
    * kept docs minus retroactive decontamination revocations. Both
    * tables resolve from ONE manifest, so the view is a consistent
    * snapshot even while batches commit concurrently.
    */
  def keptCorpus(spark: SparkSession, stateDir: String): DataFrame = {
    val m = ManifestStore.current(spark, stateDir)
    val kept = readState(spark, stateDir, m, KeptDir,
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType)))))
      .distinct()
    kept.join(
      readState(spark, stateDir, m, RevokedDir, kept.select(col("doc_id")).limit(0)),
      Seq("doc_id"), "left_anti")
  }

  /** Reclaim superseded manifests and unreferenced segment dirs
    * (crashed-attempt orphans, pre-compaction segments) — see
    * [[ManifestStore.vacuum]] for the concurrent-reader caveat.
    */
  def vacuum(spark: SparkSession, stateDir: String): Unit =
    ManifestStore.vacuum(spark, stateDir)

  private def readState(spark: SparkSession, stateDir: String,
      m: Option[ManifestStore.Manifest], table: String,
      empty: => DataFrame): DataFrame = {
    val dirs = m.map(_.table(table).values.toSeq.sorted.map(r => s"$stateDir/$r"))
      .getOrElse(Seq.empty)
    if (dirs.nonEmpty) spark.read.parquet(dirs: _*) else empty
  }

  def processBatch(batchIn: DataFrame, stateDir: String): Unit =
    processBatch(batchIn, stateDir, None)

  /** One micro-batch through all six incremental gates, committed as
    * one manifest. Pure batch DataFrame code — callable directly (the
    * spec does) or through [[curateUpsert]]. `abortAfter` is the
    * crash-injection seam: Some(table) throws right after that
    * table's segment write, BEFORE the commit — production passes
    * None.
    */
  private[graft] def processBatch(batchIn: DataFrame, stateDir: String,
      abortAfter: Option[String]): Unit = {
    val spark = batchIn.sparkSession
    val m = ManifestStore.current(spark, stateDir)
    // the batch feeds several stages: materialize once
    val batch = batchIn.select(col("doc_id"), col("text")).localCheckpoint()

    // 1-3. per-row gates — the batch funnel's exact expressions
    val gated = Curate.gateFlags(batch)
      .where(col("valid") && col("quality_ok") && col("lang_ok"))
      .select(col("doc_id"), col("text"))

    // 4. exact dedup: keep-min within the batch (exactKeep's rule),
    //    then drop anything whose content an earlier batch retained
    val stateHashes = readState(spark, stateDir, m, HashesDir,
      gated.select(md5(col("text")).as("text_md5")).limit(0))
    val ex = Dedup.exactKeep(gated)
      .withColumn("text_md5", md5(col("text")))
      .join(stateHashes, Seq("text_md5"), "left_anti")
      .localCheckpoint()   // feeds postings, bands, and three segments
    // a fully-redelivered (or fully-filtered) batch changes nothing:
    // skip the merge work and the empty commit it would litter
    if (ex.isEmpty) return

    // 5. near-dup: LSH band candidates against every PRIOR survivor
    //    (any id — keep-first) and smaller-id batch-mates (the batch
    //    keep-min rule), verified with the exact posting-list jaccard
    val batchPost = shinglePosting(ex, col("doc_id"), col("text"), 3)
      .localCheckpoint()
    val statePost = readState(spark, stateDir, m, PostDir, batchPost.limit(0))
    val batchBands = NearDupStream.banded(ex.withColumn("ts_ms", lit(0L)))
      .select(col("bd"), col("band_key"), col("doc_id"))
      .localCheckpoint()
    val stateBands = readState(spark, stateDir, m, BandsDir, batchBands.limit(0))
    val arriving = batchBands
      .select(col("bd"), col("band_key"), col("doc_id").as("b_id"))
    // a pair colliding in several bands yields duplicate candidate
    // rows — the distinct collapses them before the verify join
    val cand = arriving
      .join(stateBands.select(col("bd"), col("band_key"), col("doc_id").as("a_id")),
        Seq("bd", "band_key"))
      .where(col("a_id") =!= col("b_id"))
      .unionByName(arriving
        .join(batchBands.select(col("bd"), col("band_key"), col("doc_id").as("a_id")),
          Seq("bd", "band_key"))
        .where(col("a_id") < col("b_id")))
      .select(col("a_id"), col("b_id")).distinct()
      .localCheckpoint()   // feeds the id list AND the verify join
    // restrict the posting union to candidate docs BEFORE the
    // counting join — per-batch cost tracks the candidate set, not
    // the whole accumulated history; the distinct AFTER the semi-join
    // guards jaccard's row counts against any duplicate state rows
    val candIds = cand.select(col("a_id").as("doc_id"))
      .unionAll(cand.select(col("b_id").as("doc_id"))).distinct()
    val candPost = statePost.unionByName(batchPost)
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .distinct()
    val nearDropped = Dedup.jaccardOf(cand, candPost)
      .where(col("jaccard") >= Curate.NearDupJaccard)
      .select(col("b_id").as("doc_id")).distinct()
    val kept56 = ex.join(nearDropped, Seq("doc_id"), "left_anti")

    // 6. decontaminate vs the accumulated BENCH-SURVIVOR postings
    //    (batch's rule: only benchmark docs that survive gates+dedup
    //    decontaminate); benchmark docs flow through the dedup STATE
    //    (they can cause drops, as in batch) but never into the kept
    //    output
    val kept56Ck = kept56.localCheckpoint()   // feeds train + bench splits
    val trainKept = kept56Ck.where(col("doc_id") % 101 =!= 0)
    val batchBenchPost = batchPost.join(
        kept56Ck.where(col("doc_id") % 101 === 0).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .localCheckpoint()   // feeds the overlap check, revocation, segment
    val stateBenchPost = readState(spark, stateDir, m, BenchPostDir,
      batchBenchPost.limit(0))
    val contaminated = Dedup.benchMaxOverlap(
        batchPost.join(trainKept.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .unionByName(stateBenchPost).unionByName(batchBenchPost)
          .distinct())   // counting computation: keep set semantics
      .where(col("max_overlap") >= Curate.ContaminationFloor)
      .select(col("doc_id"))
    val keptFinal = trainKept.join(contaminated, Seq("doc_id"), "left_anti")

    // 6b. RETROACTIVE decontamination: docs kept in earlier batches
    //     may be contained in a benchmark doc that only now survived
    //     — batch (closed corpus) drops them, the stream revokes
    //     them. Only runs when this batch produced new bench
    //     survivors; cost is the still-kept docs' postings vs the NEW
    //     bench postings only (prior bench state was already applied
    //     when those docs arrived).
    val revoked =
      if (batchBenchPost.isEmpty) batchPost.select(col("doc_id")).limit(0)
      else {
        val priorKept = keptCorpus(spark, stateDir).select(col("doc_id"))
        Dedup.benchMaxOverlap(
            statePost.join(priorKept, Seq("doc_id"), "left_semi").distinct()
              .unionByName(batchBenchPost))
          .where(col("max_overlap") >= Curate.ContaminationFloor)
          .select(col("doc_id"))
      }

    // segment writes — all invisible until the single commit below;
    // write order is irrelevant to correctness (the abort seam uses
    // it only to place a crash between two writes)
    val writeId = s"b-${ManifestStore.newId()}"
    var tables: Map[String, Map[String, String]] =
      m.map(_.tables).getOrElse(Map.empty)
    def publish(df: DataFrame, table: String): Unit = {
      val prev = tables.getOrElse(table, Map.empty)
      val withDelta =
        if (df.isEmpty) prev
        else {
          val rel = s"data/$writeId/$table"
          df.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/$rel")
          prev + (writeId -> rel)
        }
      // threshold-triggered compaction: fold every segment (prior +
      // this delta) into one, published by the same commit — the old
      // segments stay on disk as snapshot state until vacuum
      val merged =
        if (withDelta.size <= CompactSegments) withDelta
        else {
          val rel = s"data/$writeId/${table}__c"
          spark.read.parquet(
              withDelta.values.toSeq.sorted.map(r => s"$stateDir/$r"): _*)
            .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/$rel")
          Map(s"${writeId}c" -> rel)
        }
      tables = tables + (table -> merged)
      if (abortAfter.contains(table))
        throw new RuntimeException(s"injected crash after $table segment write")
    }
    publish(keptFinal.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")), KeptDir)
    publish(revoked, RevokedDir)
    publish(batchPost, PostDir)
    publish(batchBands, BandsDir)
    publish(batchBenchPost, BenchPostDir)
    publish(ex.select(col("text_md5")), HashesDir)
    ManifestStore.commit(spark, stateDir,
      ManifestStore.Manifest(m.map(_.seq + 1).getOrElse(1L), tables))
  }

  /** The streaming entry point: each micro-batch of (doc_id, text)
    * merges into the curated-state tables via [[processBatch]] — one
    * manifest commit per batch.
    */
  def curateUpsert(docs: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) processBatch(batch, stateDir)
      }
}
