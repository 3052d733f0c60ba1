package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shinglePosting
import graft.operators.{Curate, Dedup}

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
  * tables:
  *
  * {{{
  *   stateDir/
  *     kept/       (doc_id, n_chars)  kept docs (pre-revocation)
  *     revoked/    (doc_id)           retroactively decontaminated
  *     hashes/     (text_md5)         exact-dedup horizon
  *     postings/   (doc_id, s)        shingle postings of every
  *     bands/      (bd, band_key, doc_id)  exact-dedup SURVIVOR
  *     bench_post/ (doc_id, s)        surviving-benchmark postings
  * }}}
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
  *
  * DELIVERY: foreachBatch is at-least-once. A re-delivered batch's
  * docs die at the exact-dedup gate (their hashes are recorded LAST,
  * after every other append), so reprocessing a partially-committed
  * batch completes it. Duplicate state rows a crash-rerun can leave
  * are collapsed with an explicit `distinct` at every read that feeds
  * a COUNTING computation (posting-list jaccard, benchmark overlap)
  * — duplicates there would inflate the counts, not just waste work.
  * The residual window is a partially-committed single append (a
  * non-atomic file committer can expose some files of a write);
  * closing that takes a transactional table format — the ChunkIndex
  * manifest protocol is the in-repo upgrade path.
  */
object CurateStream {

  private val KeptDir      = "kept"
  private val RevokedDir   = "revoked"
  private val HashesDir    = "hashes"
  private val PostDir      = "postings"
  private val BandsDir     = "bands"
  private val BenchPostDir = "bench_post"

  /** The accumulated cleaned corpus — the stream's `curate_apply`:
    * kept docs minus retroactive decontamination revocations.
    */
  def keptCorpus(spark: SparkSession, stateDir: String): DataFrame = {
    val kept = readState(spark, s"$stateDir/$KeptDir",
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType)))))
      .distinct()
    kept.join(
      readState(spark, s"$stateDir/$RevokedDir", kept.select(col("doc_id")).limit(0)),
      Seq("doc_id"), "left_anti")
  }

  private def readState(spark: SparkSession, path: String,
      empty: => DataFrame): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path) else empty
  }

  /** One micro-batch through all six incremental gates. Pure batch
    * DataFrame code — callable directly (the spec does) or through
    * [[curateUpsert]].
    */
  def processBatch(batchIn: DataFrame, stateDir: String): Unit = {
    val spark = batchIn.sparkSession
    // the batch feeds several stages: materialize once
    val batch = batchIn.select(col("doc_id"), col("text")).localCheckpoint()

    // 1-3. per-row gates — the batch funnel's exact expressions
    val gated = Curate.gateFlags(batch)
      .where(col("valid") && col("quality_ok") && col("lang_ok"))
      .select(col("doc_id"), col("text"))

    // 4. exact dedup: keep-min within the batch (exactKeep's rule),
    //    then drop anything whose content an earlier batch retained
    val stateHashes = readState(spark, s"$stateDir/$HashesDir",
      gated.select(md5(col("text")).as("text_md5")).limit(0))
    val ex = Dedup.exactKeep(gated)
      .withColumn("text_md5", md5(col("text")))
      .join(stateHashes, Seq("text_md5"), "left_anti")
      .localCheckpoint()   // feeds postings, bands, and three appends
    // a fully-redelivered (or fully-filtered) batch changes nothing:
    // skip the merge work and the five empty appends it would litter
    if (ex.isEmpty) return

    // 5. near-dup: LSH band candidates against every PRIOR survivor
    //    (any id — keep-first) and smaller-id batch-mates (the batch
    //    keep-min rule), verified with the exact posting-list jaccard
    val batchPost = shinglePosting(ex, col("doc_id"), col("text"), 3)
      .localCheckpoint()
    val statePost = readState(spark, s"$stateDir/$PostDir", batchPost.limit(0))
    val batchBands = NearDupStream.banded(ex.withColumn("ts_ms", lit(0L)))
      .select(col("bd"), col("band_key"), col("doc_id"))
      .localCheckpoint()
    // crash-rerun band duplicates only duplicate candidate rows,
    // which the cand distinct collapses — no distinct needed here
    val stateBands = readState(spark, s"$stateDir/$BandsDir", batchBands.limit(0))
    val arriving = batchBands
      .select(col("bd"), col("band_key"), col("doc_id").as("b_id"))
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
    // collapses crash-rerun duplicates where they would inflate
    // jaccard's row counts
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
      .localCheckpoint()   // feeds the overlap check, revocation, append
    val stateBenchPost = readState(spark, s"$stateDir/$BenchPostDir",
      batchBenchPost.limit(0))
    val contaminated = Dedup.benchMaxOverlap(
        batchPost.join(trainKept.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .unionByName(stateBenchPost).unionByName(batchBenchPost)
          .distinct())   // counting computation: collapse rerun dups
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

    // state appends — hashes LAST: a crash before the hash append
    // makes the re-delivered batch reprocess (and re-append) in full,
    // a crash after it makes re-delivery a no-op; either way nothing
    // is lost, and duplicates are collapsed where they are read
    def append(df: DataFrame, sub: String): Unit =
      df.write.mode(SaveMode.Append).parquet(s"$stateDir/$sub")
    append(keptFinal.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")), KeptDir)
    append(revoked, RevokedDir)
    append(batchPost, PostDir)
    append(batchBands, BandsDir)
    append(batchBenchPost, BenchPostDir)
    append(ex.select(col("text_md5")), HashesDir)
  }

  /** The streaming entry point: each micro-batch of (doc_id, text)
    * merges into the curated-state tables via [[processBatch]].
    */
  def curateUpsert(docs: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) processBatch(batch, stateDir)
      }
}
