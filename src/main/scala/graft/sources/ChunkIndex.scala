package graft.sources

import org.apache.spark.sql.{functions, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ingest

/** The persisted index — graft's analog of FAISS `save_index` /
  * `load_index` + metadata.json (reference: core/utils.py:137-:192).
  *
  * Instead of a binary blob on one node, the index is two parquet
  * tables: `chunks` (the metadata sidecar) and `embeddings` in long
  * form, the latter PARTITIONED BY a coarse quantizer bucket — the
  * hashed-BoW dimension with the largest |weight|. A search that
  * probes buckets then becomes parquet partition PRUNING: on a
  * 100 TB corpus only probed directories are read at all.
  */
object ChunkIndex {

  /** Build and persist the index tables (embed_pdfs.py:220
    * `build_and_save_index`).
    */
  def write(spark: SparkSession, dir: String, outPath: String): Unit = {
    Ingest.docChunk(spark, dir)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/chunks")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(abs(col("weight")).desc, col("dim"))
    Ingest.docEmbed(spark, dir)
      .withColumn("bucket", first(col("dim")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$outPath/embeddings")
  }

  /** Load the persisted index (core/utils.py:150 `load_index` /
    * :178 `load_metadata`).
    */
  def readChunks(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/chunks")

  def readEmbeddings(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/embeddings")

  /** Probe-pruned search over the persisted index: only the query's
    * own dominant buckets are scanned (partition pruning), then the
    * sparse dot product ranks docs within them.
    */
  def searchBuckets(spark: SparkSession, outPath: String,
      queryBuckets: Seq[Long]): DataFrame =
    readEmbeddings(spark, outPath)
      .where(col("bucket").isin(queryBuckets: _*))

  /** End-to-end text search against the PERSISTED index: embed the
    * query (hashed BoW), probe its `nProbe` dominant buckets
    * (partition pruning on disk), sparse-dot-rank the docs inside —
    * the full `search_similar_chunks` flow (core/utils.py:194) over
    * the saved index rather than the in-session one.
    */
  def search(spark: SparkSession, outPath: String, queryText: String,
      nProbe: Int, k: Int): DataFrame = {
    import spark.implicits._
    val qemb = Ingest.normalizeLongForm(
      Ingest.rawEmbed(Seq((1L, queryText)).toDF("q_id", "q_text"),
        col("q_id"), col("q_text")), "q_id")
      .select(col("dim"), col("weight").as("qw"))
    val qRows = qemb.collect()   // one query vector: ≤ EmbedDim rows
    val buckets = qRows.sortBy(r => (-math.abs(r.getAs[Double]("qw")), r.getAs[Long]("dim")))
      .take(nProbe).map(_.getAs[Long]("dim")).toSeq
    val probed = searchBuckets(spark, outPath, buckets)
    probed.join(functions.broadcast(qemb), Seq("dim"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Par.round4(sum(col("qw") * col("weight"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
