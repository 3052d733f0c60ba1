package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DfCache
import graft.functions.TextFunctions._
import graft.sources.Tables

/** The end-to-end training-data curation pipeline as ONE declarative
  * query: the composition a pretraining data team runs over a raw
  * crawl before a single training token is cut. Seven stages, each
  * consuming the previous stage's survivors, reported as a funnel of
  * per-stage attrition counts:
  *
  *   raw → validate → quality → lang → dedup_exact → dedup_near →
  *   decontaminate
  *
  * Each stage reuses the semantics of its standalone operator
  * (validate_docs / quality_score / lang_id thresholds, dedup_exact's
  * md5 keep-min rule, dedup_minhash's verified pairs,
  * contamination_check's per-benchmark overlap) — the point of the
  * query is the COMPOSITION: cheap narrow per-row filters run first
  * so the expensive shuffling stages (minhash, posting joins) see the
  * smallest possible corpus, which is exactly the stage order that
  * matters at 100 TB where the validate/quality/lang stages are free
  * map-side work and every surviving byte costs a shuffle.
  *
  * Scale notes: the flag frame is computed once and persisted (at
  * cluster scale it would be a staging table, like the pair set —
  * which IS staged, via the detect→apply pattern shared with
  * [[Dedup.minhashPairs]]); every stage is either a narrow filter, a
  * hash-aggregate + semi/anti join, or a bounded blocking join —
  * never an all-pairs comparison. The near-dup policy here is
  * PER-PAIR (drop the greater id of every verified pair ≥ the
  * jaccard floor), the simple keep-first rule of pairwise corpus
  * dedup; the cluster-canonical variant is [[Dedup.neardupApply]].
  */
object Curate {

  /** Minimum whitespace tokens for the validity gate — the curation
    * config's stricter version of validate_docs' ≥ 3 floor.
    */
  val MinWords = 15
  /** Keep documents with composite quality (quality_score's formula)
    * at or above this.
    */
  val QualityFloor = 0.5
  /** Keep documents whose best lang_id profile overlap is at or
    * above this — "identifiable language" for the synthetic corpus's
    * three vocabulary profiles.
    */
  val LangFloor = 0.25
  /** Verified-pair jaccard floor for the near-dup drop stage (same
    * threshold as dedup_clusters' strong pairs).
    */
  val NearDupJaccard = 0.8
  /** Benchmark-overlap floor for the decontamination stage — ONE
    * spelling shared by the batch funnel, contamination_check's
    * flag, and the streaming pipeline (the oracle SQL spells the
    * same literal).
    */
  val ContaminationFloor = 0.5

  /** The tunable curation-gate surface — the constants above as
    * defaulted knobs, so a caller can run the funnel at e.g. a
    * stricter quality floor without a recompile. The defaults are
    * exactly the constants the DuckDB oracle pins, so the default
    * path is byte-identical to the historical fixed-constant one.
    */
  case class Params(
      minWords: Int = MinWords,
      qualityFloor: Double = QualityFloor,
      langFloor: Double = LangFloor,
      nearDupJaccard: Double = NearDupJaccard,
      contaminationFloor: Double = ContaminationFloor) {
    /** Cache/staging key suffix: default params keep the historical
      * un-suffixed keys (cross-round staged artifacts stay shared);
      * non-default runs get their own cache/staging namespace so
      * they can never poison the oracle-checked default chain.
      */
    private[operators] def tag: String =
      if (this == Params()) ""
      else s":p$minWords:$qualityFloor:$langFloor:$nearDupJaccard:$contaminationFloor"
  }

  /** The curation input: documents ∪ an exact copy of every 7th doc
    * (ids +100000) ∪ a first-word-dropped near-copy of every 13th
    * (ids +200000) — the synthetic corpus has no natural duplicates,
    * so the dedup stages are exercised by deterministic injections,
    * like [[Dedup.corpusWithDups]] (which injects one kind at a
    * time; curation needs both in one corpus).
    */
  private[graft] def curateCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    base
      .unionAll(base.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionAll(base.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
  }

  /** One narrow pass computing every per-row stage flag: validity,
    * quality (quality_score's exact expression tree ≥ the floor) and
    * language identifiability (lang_id's round4 profile scores).
    * Everything downstream filters on these three booleans. Exposed
    * over any (doc_id, text) frame so the streaming curation pipeline
    * (streaming/CurateStream) applies the IDENTICAL gate expressions
    * per micro-batch — one spelling, batch and stream.
    */
  private[graft] def gateFlags(docs: DataFrame,
                               p: Params = Params()): DataFrame = {
    val words = size(tokens(col("text")))
    val chars = length(col("text"))
    // the gates ARE the standalone operators' expressions —
    // TextAnalysis.compositeQuality / profileScore are the single
    // spellings shared with quality_score and lang_id
    val langBest = greatest(TextAnalysis.Profiles.map { case (_, ws) =>
      TextAnalysis.profileScore(col("text"), ws)
    }: _*)
    docs.select(col("doc_id"), col("text"),
      (trim(col("text")) =!= "" && chars <= 1000 && words >= p.minWords).as("valid"),
      (TextAnalysis.compositeQuality(col("text")) >= p.qualityFloor).as("quality_ok"),
      (langBest >= p.langFloor).as("lang_ok"))
  }

  private def flaggedOf(spark: SparkSession, dir: String, p: Params): DataFrame =
    gateFlags(curateCorpus(spark, dir), p)

  private def flaggedCached(spark: SparkSession, dir: String, p: Params): DataFrame =
    DfCache.getOrCompute(spark, s"curate_flagged:$dir${p.tag}")(
      flaggedOf(spark, dir, p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Survivors of the three per-row gates. */
  private def filteredOf(flagged: DataFrame): DataFrame =
    flagged.where(col("valid") && col("quality_ok") && col("lang_ok"))
      .select(col("doc_id"), col("text"))

  /** Exact-dedup survivors: Dedup.exactKeep's keep-min rule. */
  private def exactKeptOf(s4: DataFrame): DataFrame = Dedup.exactKeep(s4)

  /** Verified minhash pairs over the exact-dedup survivors — the
    * detect-stage artifact, staged cross-process like
    * [[Dedup.minhashPairs]] (same build, different corpus).
    */
  private def curatePairs(spark: SparkSession, dir: String, p: Params): DataFrame =
    DfCache.getOrCompute(spark, s"curate_pairs:$dir${p.tag}") {
      Dedup.minhashPairsOf(s5Cached(spark, dir, p))(
        DfCache.stagedFrame(spark, s"curate_pairs:$dir${p.tag}",
          DfCache.inputFingerprint(spark, s"$dir/documents.parquet"))(_))
    }

  /** Exact-dedup survivors cached per (session, dir): the frame is
    * read by the pair build, the near-dup anti-join AND the n5 count
    * — Spark does not dedup identical aggregate subplans across
    * branches, so without the persist each reference re-runs the
    * content-hash groupBy over the corpus.
    */
  private def s5Cached(spark: SparkSession, dir: String, p: Params): DataFrame =
    DfCache.getOrCompute(spark, s"curate_s5:$dir${p.tag}")(
      exactKeptOf(filteredOf(flaggedCached(spark, dir, p)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Deduped survivors: the near-dup drop applied to the exact-dedup
    * output, cached per (session, dir) — shared by the funnel counts
    * and [[curateApply]].
    */
  private def s6Cached(spark: SparkSession, dir: String, p: Params): DataFrame =
    DfCache.getOrCompute(spark, s"curate_s6:$dir${p.tag}")(
      s5Cached(spark, dir, p).join(
          curatePairs(spark, dir, p)
            .where(col("jaccard") >= p.nearDupJaccard)
            .select(col("b_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Final training corpus: decontamination applied to the deduped
    * survivors. Benchmark = every 101st doc (held out entirely); any
    * training doc whose shingle overlap with ANY single benchmark doc
    * reaches 0.5 is dropped — contamination_check's rule applied as a
    * filter. The benchmark posting list is broadcast (eval suites are
    * tiny by nature).
    */
  private def s7Of(spark: SparkSession, dir: String, p: Params): DataFrame = {
    val s6 = s6Cached(spark, dir, p)
    // the survivor posting list feeds the bench split and both
    // overlap joins — session-cached like the other detect artifacts
    val posting = DfCache.getOrCompute(spark, s"curate_post:$dir${p.tag}")(
      shinglePosting(s6, col("doc_id"), col("text"), 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Dedup.benchMaxOverlap is the single spelling of the %101 split
    // + per-benchmark max-overlap rule shared with contamination_check
    val contaminated = Dedup.benchMaxOverlap(posting)
      .where(col("max_overlap") >= p.contaminationFloor)
      .select(col("doc_id"))
    s6.where(col("doc_id") % 101 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** s7 cached per (session, dir): read by both the funnel's n7 count
    * and curate_apply's materialization.
    */
  private def s7Cached(spark: SparkSession, dir: String, p: Params): DataFrame =
    DfCache.getOrCompute(spark, s"curate_s7:$dir${p.tag}")(
      s7Of(spark, dir, p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The curated corpus as a (doc_id, text) frame — the survivors of
    * all seven gates, for downstream composition (Pack.trainPrep
    * packs exactly this set into training sequences).
    */
  private[graft] def survivors(spark: SparkSession, dir: String,
      p: Params = Params()): DataFrame =
    s7Cached(spark, dir, p).select(col("doc_id"), col("text"))

  /** Materialize the cleaned corpus — the apply-stage twin of the
    * funnel report, same output shape as dedup_apply: the documents
    * that survived all seven gates, with their sizes.
    */
  def curateApply(spark: SparkSession, dir: String,
                  p: Params = Params(), sorted: Boolean = true): DataFrame =
    Present.presented(
      s7Cached(spark, dir, p)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars")),
      sorted, "doc_id")

  /** The 7-row funnel report: (stage_id, stage, docs_in, docs_out,
    * dropped), each stage's input being the previous stage's output.
    */
  def corpusCurate(spark: SparkSession, dir: String,
                   p: Params = Params()): DataFrame = {
    val flagged = flaggedCached(spark, dir, p)
    val s5 = s5Cached(spark, dir, p)
    val s6 = s6Cached(spark, dir, p)
    val s7 = s7Cached(spark, dir, p)
    // stage counts: the four per-row gates fold into ONE aggregate
    // over the persisted flag frame; the three join-stage counts are
    // one aggregate each; the crossJoin of 1-row frames is free
    val nn = flagged.agg(
        count(lit(1)).as("n_raw"),
        count(when(col("valid"), 1)).as("n_valid"),
        count(when(col("valid") && col("quality_ok"), 1)).as("n_q"),
        count(when(col("valid") && col("quality_ok") && col("lang_ok"), 1)).as("n_l"))
      .crossJoin(s5.agg(count(lit(1)).as("n5")))
      .crossJoin(s6.agg(count(lit(1)).as("n6")))
      .crossJoin(s7.agg(count(lit(1)).as("n7")))
    def stageRow(id: Int, name: String, in: Column, out: Column): Column =
      struct(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
        in.as("docs_in"), out.as("docs_out"), (in - out).as("dropped"))
    // all 7 rows from ONE evaluation of the single-row count frame
    nn.select(explode(array(
        stageRow(0, "raw", col("n_raw"), col("n_raw")),
        stageRow(1, "validate", col("n_raw"), col("n_valid")),
        stageRow(2, "quality", col("n_valid"), col("n_q")),
        stageRow(3, "lang", col("n_q"), col("n_l")),
        stageRow(4, "dedup_exact", col("n_l"), col("n5")),
        stageRow(5, "dedup_near", col("n5"), col("n6")),
        stageRow(6, "decontaminate", col("n6"), col("n7")))).as("r"))
      .select(col("r.stage_id").as("stage_id"), col("r.stage").as("stage"),
        col("r.docs_in").as("docs_in"), col("r.docs_out").as("docs_out"),
        col("r.dropped").as("dropped"))
      .orderBy(col("stage_id"))
  }
}
