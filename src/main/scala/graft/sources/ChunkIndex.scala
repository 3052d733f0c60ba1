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

  val ChunkShards = 8

  private def withShard(chunks: DataFrame): DataFrame =
    chunks.withColumn("shard", pmod(col("doc_id"), lit(ChunkShards.toLong)).cast("int"))

  private def withBucket(emb: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(abs(col("weight")).desc, col("dim"))
    emb.withColumn("bucket", first(col("dim")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).cast("int"))
  }

  /** Full overwrite, partitioned by `partCol` — EXCEPT for a 0-row
    * frame, which goes out flat: an empty `partitionBy` write emits
    * no schema-bearing footer at all and the table becomes unreadable
    * (UNABLE_TO_INFER_SCHEMA on the next load). The partition key is
    * also a data column, so readers are unaffected by the layout.
    */
  private def writePartitioned(df: DataFrame, partCol: String, path: String): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    if (df.isEmpty) w.parquet(path) else w.partitionBy(partCol).parquet(path)
  }

  /** Build and persist the index tables (embed_pdfs.py:220
    * `build_and_save_index`). Both tables are partitioned — `chunks`
    * by a doc_id shard, `embeddings` by the quantizer bucket — so
    * incremental upserts can rewrite only touched partitions.
    */
  def write(spark: SparkSession, dir: String, outPath: String): Unit = {
    writePartitioned(withShard(Ingest.docChunk(spark, dir)), "shard",
      s"$outPath/chunks")
    writePartitioned(withBucket(Ingest.docEmbed(spark, dir)), "bucket",
      s"$outPath/embeddings")
  }

  /** MERGE-style upsert of an incoming (doc_id, text) batch into the
    * persisted index — the reference's write-back flows
    * (core/supabase_utils.py:400 `update_contribution_status`,
    * core/views.py:1065 `admin_reindex_documents`). Plain parquet has
    * no transactional MERGE INTO; the at-scale pattern is DYNAMIC
    * partition overwrite: rewrite exactly the partitions that hold an
    * old or new version of an incoming doc (old and new may differ —
    * re-embedding can move a doc to another bucket, so both sides'
    * partitions are collected) and leave every other partition's
    * files physically untouched.
    *
    * The `chunks` side's shard is doc_id % [[ChunkShards]] — derivable
    * arithmetically from the incoming ids, so only the `embeddings`
    * side (whose bucket depends on old vector content) pays an
    * existence scan.
    *
    * CRASH WINDOW: the two-table mutation is not atomic — a crash
    * between the chunks and embeddings writes (or between a dynamic
    * overwrite and its vacated-partition delete) can leave moved docs
    * readable in both old and new partitions. A `_GRAFT_UPSERT_INPROGRESS`
    * manifest is created before the first mutation and removed after
    * the last: its presence on recovery means "re-deliver this batch"
    * — which is exactly what the streaming path does (foreachBatch
    * re-runs the micro-batch; the upsert is idempotent), and what an
    * ad-hoc caller must do before trusting reads.
    */
  def upsert(spark: SparkSession, outPath: String, incoming: DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, "_GRAFT_UPSERT_INPROGRESS")
    fs.mkdirs(root)
    fs.create(marker, true).close()
    val ids = incoming.select(col("doc_id")).distinct()
    // old chunk shards are a pure function of the ids — no table scan
    val chunkOldParts = ids
      .select(pmod(col("doc_id"), lit(ChunkShards.toLong)).cast("int").as("shard"))
      .distinct()
    overwriteAffected(spark, s"$outPath/chunks", ids,
      withShard(Ingest.chunksOf(incoming)), "shard", Some(chunkOldParts))
    overwriteAffected(spark, s"$outPath/embeddings", ids,
      withBucket(Ingest.embedOf(incoming)), "bucket", None)
    fs.delete(marker, false)
  }

  /** Live incremental indexing: a Structured Streaming sink that
    * upserts each micro-batch of (doc_id, text) into the persisted
    * index via [[upsert]] — the streaming form of the reference's
    * ingest/reindex flow (documents become searchable as they
    * arrive, and only the touched partitions are rewritten per
    * batch). `foreachBatch` is the standard exactly-once-per-batch
    * seam for sinks without native streaming support (plain parquet
    * MERGE here).
    */
  def streamingUpsert(docs: DataFrame, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) upsert(batch.sparkSession, outPath, batch)
      }

  /** Rewrite only the partitions of `path` touched by `ids`: keep
    * rows of other docs living there, drop the old versions, add the
    * fresh rows. The kept slice is locally checkpointed before the
    * overwrite — the write must not lazily re-read files it is
    * replacing. Dynamic overwrite (writer-scoped option, never a
    * session-conf mutation) only rewrites partitions PRESENT in the
    * written data, so an affected partition the output no longer
    * touches (the updated doc moved bucket, or was the partition's
    * only occupant) is deleted explicitly — its remaining rows all
    * belonged to the updated docs.
    */
  private def overwriteAffected(spark: SparkSession, path: String, ids: DataFrame,
      fresh: DataFrame, partCol: String,
      oldParts: Option[DataFrame]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      // bootstrap: nothing to merge — the first batch creates the table
      writePartitioned(fresh, partCol, path)
      return
    }
    val existing = spark.read.parquet(path)
    val freshCk = fresh.localCheckpoint()
    // partitions holding OLD versions: derived arithmetically when the
    // partition key is a function of doc_id, else an existence scan
    val oldSide = oldParts.getOrElse(
      existing.join(broadcast(ids), Seq("doc_id"), "left_semi").select(col(partCol)))
    val affected = oldSide
      .unionByName(freshCk.select(col(partCol)))
      .distinct().collect().map(_.get(0).toString.toInt)
    // localCheckpoint severs lineage from the files being overwritten —
    // keep and fresh are each materialized exactly once
    val keep = existing
      .where(col(partCol).isin(affected.map(x => x: Any): _*))   // partition-pruned scan
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val written = keep.select(col(partCol))
      .unionByName(freshCk.select(col(partCol)))
      .distinct().collect().map(_.get(0).toString.toInt).toSet
    keep.unionByName(freshCk.select(keep.columns.map(col): _*))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path)
    (affected.toSet -- written).foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$partCol=$p"), true)
    }
  }

  /** Build the persisted index for `dir` once per machine (not once
    * per session): the index lands under the fingerprinted staging
    * path, so a fresh JVM — or the correctness/bench driver — reuses
    * the on-disk tables, and regenerated input data rebuilds them.
    * A `_GRAFT_INDEX_DONE` marker distinguishes a complete two-table
    * write from a crashed partial one.
    */
  def ensureIndex(spark: SparkSession, dir: String): String = {
    val path = graft.DfCache.stagingPath(s"chunk_index:$dir",
      graft.DfCache.inputFingerprint(spark, s"$dir/documents.parquet"))
    val target = new org.apache.hadoop.fs.Path(path)
    val done = new org.apache.hadoop.fs.Path(target, "_GRAFT_INDEX_DONE")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(done)) {
      if (fs.exists(target)) fs.delete(target, true)   // crashed partial build
      // build under a tmp dir, marker included, then publish with one
      // rename: two concurrent builders never write the same files and
      // the done marker can only ever describe a complete two-table set
      val tmp = new org.apache.hadoop.fs.Path(
        path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      write(spark, dir, tmp.toString)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_GRAFT_INDEX_DONE"), true).close()
      fs.mkdirs(target.getParent)
      // LocalFileSystem renames onto an EXISTING dir by copying into it
      // (nesting) — only rename onto a free path; a concurrent winner's
      // published index is served instead
      if (fs.exists(target) || !fs.rename(tmp, target)) fs.delete(tmp, true)
    }
    path
  }

  /** Search over the PERSISTED index as an oracle-checked query: build
    * (or reuse) the on-disk index, then run the partition-pruned
    * [[search]] against it — the full save_index → load_index →
    * search_similar_chunks flow (core/utils.py:137/:150/:194) under
    * the DuckDB gate rather than ScalaTest only.
    */
  def indexSearch(spark: SparkSession, dir: String): DataFrame =
    search(spark, ensureIndex(spark, dir), "hash join", nProbe = 2, k = 5)

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
    val qRows = Ingest.normalizeLongForm(
      Ingest.rawEmbed(Seq((1L, queryText)).toDF("q_id", "q_text"),
        col("q_id"), col("q_text")), "q_id")
      .select(col("dim"), col("weight").as("qw"))
      .collect()   // one query vector: ≤ EmbedDim rows, ONE job
    val buckets = qRows.sortBy(r => (-math.abs(r.getAs[Double]("qw")), r.getAs[Long]("dim")))
      .take(nProbe).map(_.getAs[Long]("dim")).toSeq
    // rebuild the broadcast side from the collected rows — re-using the
    // uncached qemb frame would re-run the whole embed job in the join
    val qemb = qRows.map(r => (r.getAs[Long]("dim"), r.getAs[Double]("qw")))
      .toSeq.toDF("dim", "qw")
    val probed = searchBuckets(spark, outPath, buckets)
    probed.join(functions.broadcast(qemb), Seq("dim"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Par.round4(sum(col("qw") * col("weight"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
