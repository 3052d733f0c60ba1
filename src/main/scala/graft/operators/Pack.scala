package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Par
import graft.functions.TextFunctions.{md5Long, tokens}
import graft.sources.Tables

/** Training-batch preparation: sequence packing and dataset mixing.
  *
  * The reference stops at retrieval (core/rag_utils.py builds
  * prompt context by concatenating chunks); a pipeline that FEEDS a
  * trainer needs the two steps after curation that neither the
  * reference nor the relational core covers:
  *
  *  - '''sequence packing''' — concatenate documents into
  *    fixed-token-budget training sequences (the GPT-style
  *    concat-and-chunk layout) so no step-time is wasted on padding;
  *  - '''dataset mixing''' — downsample over-represented strata so
  *    the training stream matches a target mixture (here: uniform
  *    over languages, the classic multilingual rebalance).
  *
  * Both are pure `Column` compositions (codegen-friendly, no UDFs)
  * and both are deterministic — identical output for any partitioning
  * or cluster size — which is what makes a 100 TB run auditable and
  * resumable.
  *
  * Scale shape: packing shuffles once on the shard key and sorts
  * within shards; shard count is a parameter, so at 100 TB shards
  * stay executor-sized (thousands of shards, each a few GB) and the
  * per-shard window never sees more than `corpus / nShards` rows.
  * Mixing is a broadcast of a per-stratum rate table (|langs| rows)
  * against the corpus scan — no shuffle at all on the big side.
  */
object Pack {

  /** Tokens per training sequence (defaultable; 256 keeps the gate
    * corpora multi-sequence per shard — real runs pass 2048/4096/8192).
    */
  val DefaultSeqTokens = 256

  /** Packing shards: documents are hash-sharded, then packed in
    * doc_id order within each shard. More shards = more parallelism
    * and smaller per-shard sorts; the assignment is deterministic
    * for any value, so this is purely a throughput knob.
    */
  val DefaultPackShards = 32

  private def uniform(docId: Column, salt: String): Column =
    md5Long(concat(lit(salt), docId.cast("string")), 1, 8)

  /** Per-stratum counts with normalized target weights `w` — the
    * |strata|-row frame both mixers derive their rates from. Empty
    * `shares` means uniform over observed strata; explicit shares are
    * normalized to sum 1, and strata without a share are dropped
    * (weight 0).
    */
  private def stratumWeights(spark: SparkSession, docs: DataFrame,
      stratum: String, shares: Map[String, Double]): DataFrame = {
    require(shares.values.forall(_ > 0), "target shares must be positive")
    val counts = docs.groupBy(col(stratum)).agg(count(lit(1)).as("n"))
    if (shares.isEmpty)
      // scalar-sized frame: the single-partition window is |strata| rows
      counts.withColumn("w", lit(1.0) / count(lit(1)).over(Window.partitionBy()))
    else {
      import spark.implicits._
      val total = shares.values.sum
      val wdf = shares.toSeq.toDF(stratum, "w_raw")
        .select(col(stratum), (col("w_raw") / total).as("w"))
      counts.join(wdf, stratum)
    }
  }

  /** Concat-and-chunk sequence packing: shard documents by a content
    * hash of their id, order each shard by doc_id, lay the token
    * streams end to end, and cut a sequence boundary every `budget`
    * tokens. A document is assigned to the sequence containing its
    * first token (`seq_id`) at offset `tok_offset`; long documents
    * simply span boundaries, exactly like the standard pretraining
    * data layout — zero padding waste by construction.
    *
    * One shuffle (shard key), one within-shard sort, whole-stage
    * codegen end to end.
    */
  def seqPack(spark: SparkSession, dir: String,
              budget: Int = DefaultSeqTokens,
              nShards: Int = DefaultPackShards): DataFrame =
    seqPackOf(Tables.documents(spark, dir), budget, nShards)

  /** The packing core over ANY (doc_id, text) corpus — shared by the
    * raw-table query, [[trainPrep]]'s curated composition, and (in
    * semantics) streaming/PackStream.
    */
  private[operators] def seqPackOf(corpus: DataFrame,
      budget: Int, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    corpus
      .select(col("doc_id"),
        (uniform(col("doc_id"), "pack:") % nShards).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("shard"),
        expr(s"start_tok div $budget").as("seq_id"),
        (col("start_tok") % budget).as("tok_offset"),
        col("n_tok"))
      .orderBy("doc_id")
  }

  /** Curate → pack, end to end: the seven-gate curation funnel's
    * survivors (operators/Curate) laid out as training sequences —
    * the full raw-crawl-to-trainer-input composition in ONE
    * declarative plan. The survivor frame is the session-cached s7
    * stage the funnel already computes, so running the funnel report,
    * the apply step and this packing in one session pays the curation
    * chain once.
    */
  def trainPrep(spark: SparkSession, dir: String,
                budget: Int = DefaultSeqTokens,
                nShards: Int = DefaultPackShards): DataFrame =
    seqPackOf(Curate.survivors(spark, dir), budget, nShards)

  /** Packing efficiency audit: per shard, how many documents and
    * tokens landed there, how many sequences that cuts into, and the
    * fill ratio (tokens / capacity of the cut sequences — the only
    * under-fill in concat-and-chunk is each shard's final partial
    * sequence). The report a capacity planner reads before a 100 TB
    * packing run.
    */
  def packStats(spark: SparkSession, dir: String,
                budget: Int = DefaultSeqTokens,
                nShards: Int = DefaultPackShards): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    Tables.documents(spark, dir)
      .select((uniform(col("doc_id"), "pack:") % nShards).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"))
      .withColumn("n_seqs", expr(s"(total_tokens + ${budget - 1}) div $budget"))
      .withColumn("fill_ratio",
        Par.round4(col("total_tokens").cast("double") /
          (col("n_seqs") * budget).cast("double")))
      .orderBy("shard")
  }

  /** Target-mixture downsampling over a stratum column (default:
    * language — the classic multilingual rebalance). Given target
    * shares `w_s` (default uniform over observed strata), the largest
    * achievable corpus under downsampling-only is `T = min_s n_s/w_s`;
    * each stratum keeps `w_s·T / n_s` of its documents via the same
    * deterministic md5 coin as [[Dedup.deterministicSample]] — so the
    * smallest stratum is kept whole and every other stratum is cut to
    * match it. Rates are computed on a |strata|-row aggregate and
    * broadcast; the corpus side is a scan + filter, no shuffle.
    */
  def datasetMix(spark: SparkSession, dir: String,
                 stratum: String = "lang",
                 shares: Map[String, Double] = Map.empty): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rates = stratumWeights(spark, docs, stratum, shares)
      .withColumn("capacity",
        min(col("n").cast("double") / col("w")).over(Window.partitionBy()))
      .select(col(stratum),
        least(lit(1.0), col("w") * col("capacity") / col("n")).as("rate"))
    docs
      .join(broadcast(rates), stratum)
      .where(uniform(col("doc_id"), "mix:").cast("double") / 4294967296.0
        < col("rate"))
      .select(col("doc_id"), col(stratum), Par.round4(col("rate")).as("rate"))
      .orderBy("doc_id")
  }

  /** Hard ceiling on per-document repetition in [[datasetMixEpochs]]
    * — past a handful of epochs, repeating data hurts more than the
    * mixture helps, and an unboundedly small stratum must not blow up
    * the output volume.
    */
  val MaxEpochs = 16

  /** Target-mixture UPSAMPLING over a stratum — [[datasetMix]]'s dual.
    * Downsampling-only mixing cuts every stratum to the smallest; when
    * the under-represented strata are too precious to waste the rest,
    * the standard alternative repeats them: capacity `T = max_s
    * n_s/w_s` (the largest stratum is kept exactly once), every
    * stratum emits `need_s = w_s·T` document-copies as `floor(need/n)`
    * whole epochs plus one extra copy for documents whose
    * deterministic coin falls under the fractional epoch — capped at
    * [[MaxEpochs]]. Output: one row per emitted copy (doc_id,
    * stratum, copy_idx), the multiset a trainer's sampler consumes.
    * Same broadcast-rates / shuffle-free-scan shape as [[datasetMix]];
    * output volume ≤ min(strata·max_s n_s, MaxEpochs·corpus).
    */
  def datasetMixEpochs(spark: SparkSession, dir: String,
                       stratum: String = "lang",
                       shares: Map[String, Double] = Map.empty,
                       maxEpochs: Int = MaxEpochs): DataFrame = {
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val docs = Tables.documents(spark, dir)
    val need = col("w") * col("capacity") / col("n")
    val rates = stratumWeights(spark, docs, stratum, shares)
      .withColumn("capacity",
        max(col("n").cast("double") / col("w")).over(Window.partitionBy()))
      .select(col(stratum),
        floor(need).as("base_copies"),      // BIGINT in Spark
        (need - floor(need)).as("frac"))
    docs
      .join(broadcast(rates), stratum)
      .withColumn("n_copies", least(
        col("base_copies") +
          when(uniform(col("doc_id"), "epoch:").cast("double") / 4294967296.0
            < col("frac"), 1L).otherwise(0L),
        lit(maxEpochs.toLong)))
      .where(col("n_copies") > 0)   // always true (need/n ≥ 1); guards explode
      .select(col("doc_id"), col(stratum),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }
}
