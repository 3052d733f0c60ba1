package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Par, TopK}
import graft.functions.TextFunctions._
import graft.sources.Tables

/** The reference's keyword + hybrid search layer
  * (core/supabase_utils.py:280 `search_similar_contributions`,
  * core/enhanced_search.py). Documents stand in for "contributions";
  * `rating` is a deterministic derived column (the synthetic corpus
  * has no rating), `usage` is n_chars.
  */
object KeywordSearch {

  val Query = "join hash table"

  /** Synthetic contribution rating — documented stand-in. */
  private val rating = (col("doc_id") % 50).cast("double") / 10.0

  /** Token-overlap scoring, exactly the reference's formula
    * (supabase_utils.py:299-:304): 1.0 on substring containment, else
    * |q_tokens ∩ doc_tokens| / |q_tokens|; keep score > 0; rank by
    * (score desc, rating desc) with id tie-break, top-5 per query.
    * Top-k via the map-side-combining TopK2Agg: the shuffle carries
    * ≤ 5 rows per query and map partition — a per-query window would
    * funnel every scored (doc × query) row into #queries partitions.
    */
  def keywordSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = Seq((1L, Query), (2L, "stream window agg"))
      .toDF("q_id", "q_text")
    val qTok = array_distinct(split(col("q_text"), " "))
    val dTok = array_distinct(tokens(col("text")))
    val score = when(col("text").contains(col("q_text")), lit(1.0))
      .otherwise(size(array_intersect(qTok, dTok)).cast("double") / size(qTok))
    Tables.documents(spark, dir).crossJoin(broadcast(queries))
      .select(col("q_id"), col("doc_id"),
        Par.round4(score).as("score"), rating.as("rating"))
      .where(col("score") > 0)
      .groupBy(col("q_id"))
      .agg(TopK.topK2(5)(col("score"), col("rating"), col("doc_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "hit")))
      .select(col("q_id"), col("hit.id").as("doc_id"), col("hit.score").as("score"),
        col("hit.score2").as("rating"), (col("i") + 1).cast("long").as("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Case-insensitive substring listing — search_qa_by_keyword
    * (supabase_utils.py:362) / the admin ilike filter
    * (supabase_utils.py:389).
    */
  def keywordSubstring(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(col("text").contains("hash join"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** keywordSearch's top-5 frame cached per (session, dir) for the
    * composed flows (context, ask, rank) — persisted via DfCache so
    * repeat consumers don't rescan the corpus and nothing leaks
    * un-unpersisted frames. keywordSearch itself stays uncached so
    * its plan remains auditable.
    */
  private def keywordTopCached(spark: SparkSession, dir: String): DataFrame =
    graft.DfCache.getOrCompute(spark, s"keyword_top:$dir")(
      keywordSearch(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Result-quality assessment per query — _assess_faiss_quality
    * (enhanced_search.py:170): avg similarity + count bonus
    * min(n/5, 0.2), capped at 1.0, over the knn_brute top-5.
    */
  def hybridQuality(spark: SparkSession, dir: String): DataFrame =
    VectorSearch.knnBrute(spark, dir)
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n"), sum(col("cos")).as("s"))
      .select(col("q_id"), col("n"),
        Par.round4(col("s") / col("n")).as("avg_sim"),
        Par.round4(least(col("s") / col("n")
          + least(col("n").cast("double") / 5.0, lit(0.2)), lit(1.0))).as("quality"))
      .orderBy(col("q_id"))

  /** Combined-context assembly — _create_combined_context
    * (enhanced_search.py:117): contributions first, each rendered as
    * a "USER CONTRIBUTION #i" block with rating and similarity, in
    * rank order. Ordered string aggregation via sort-then-join of
    * collected (rank, block) pairs; similarity is embedded as integer
    * basis points (cross-engine float formatting is not stable).
    */
  def hybridContext(spark: SparkSession, dir: String): DataFrame =
    contextOf(keywordTopCached(spark, dir), spark, dir)

  /** Context assembly over an already-computed keyword-hit frame (so
    * composed flows like askBatch score the corpus once).
    */
  private def contextOf(kw: DataFrame, spark: SparkSession, dir: String): DataFrame = {
    val hits = kw
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), Seq("doc_id"))
    val block = concat(
      lit("USER CONTRIBUTION #"), col("rk").cast("string"),
      lit(":\nAnswer: "), substring(col("text"), 1, 40),
      lit("\nRating: "), col("rating").cast("string"),
      // floor(x+0.5), not a bare cast: cast truncates, and 573 of the
      // 10001 possible round4 scores sit just UNDER their bp integer
      // in binary (0.0003*10000 = 2.9999...), where DuckDB's rounding
      // cast would disagree bitwise
      lit("/5.0 (Similarity: "), floor(col("score") * 10000 + 0.5).cast("long").cast("string"),
      lit("bp)"))
    hits
      .groupBy(col("q_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rk"), block.as("block")))),
          s => s.getField("block")), "\n\n").as("combined_context"))
      .select(col("q_id"),
        concat(lit("USER CONTRIBUTIONS AND ENHANCEMENTS:\n"), col("combined_context"))
          .as("combined_context"))
      .orderBy(col("q_id"))
  }

  /** The full `/api/ask` flow as one batch operator
    * (core/views.py:225 `ask` → enhanced_search_with_contributions,
    * enhanced_search.py:16): per query, the vector hits (knn_text)
    * and contribution hits (keyword_search) are counted, search
    * effectiveness is classified (analyze_search_effectiveness,
    * enhanced_search.py:386: ≥3 sources high, ≥1 medium, else low),
    * and the combined context is attached. Everything downstream of
    * this row (the LLM call) is an external service.
    */
  def askBatch(spark: SparkSession, dir: String): DataFrame = {
    // score each side once; counts and context derive from the same frame
    val kw = keywordTopCached(spark, dir)
    val faiss = VectorSearch.knnText(spark, dir)
      .groupBy(col("q_id")).agg(count(lit(1)).as("faiss_count"))
    val contrib = kw
      .groupBy(col("q_id")).agg(count(lit(1)).as("contribution_count"))
    val ctx = contextOf(kw, spark, dir)
    faiss.join(contrib, Seq("q_id"), "full_outer")
      .na.fill(0L, Seq("faiss_count", "contribution_count"))
      .withColumn("total_sources", col("faiss_count") + col("contribution_count"))
      .withColumn("search_effectiveness",
        when(col("total_sources") >= 3, "high")
          .when(col("total_sources") >= 1, "medium")
          .otherwise("low"))
      .join(ctx, Seq("q_id"), "left")
      .select(col("q_id"), col("faiss_count"), col("contribution_count"),
        col("total_sources"), col("search_effectiveness"), col("combined_context"))
      .orderBy(col("q_id"))
  }

  /** Prioritized merged ranking — prioritize_enhanced_results
    * (enhanced_search.py:325): top-2 contributions (by rating, usage)
    * first as 'high', then the vector hits as 'medium', then the
    * remaining contributions as 'low'.
    */
  def hybridRank(spark: SparkSession, dir: String): DataFrame = {
    val contrib = keywordTopCached(spark, dir).where(col("q_id") === 1)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("n_chars").as("usage")),
        Seq("doc_id"))
      .withColumn("crk", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("rating").desc, col("usage").desc, col("doc_id"))).cast("long"))
    val high = contrib.where(col("crk") <= 2)
      .select(col("doc_id"), lit("user_contribution").as("source_type"),
        lit("high").as("priority"), col("crk").as("ord"))
    val low = contrib.where(col("crk") > 2)
      .select(col("doc_id"), lit("user_contribution").as("source_type"),
        lit("low").as("priority"), (col("crk") + 5).as("ord"))
    val medium = VectorSearch.knnText(spark, dir).where(col("q_id") === 1)
      .select(col("doc_id"), lit("original_document").as("source_type"),
        lit("medium").as("priority"), (col("rk") + 2).as("ord"))
    high.unionAll(medium).unionAll(low).orderBy(col("ord"), col("doc_id"))
  }
}
