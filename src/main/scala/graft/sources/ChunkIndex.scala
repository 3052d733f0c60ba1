package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{functions, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ingest

/** The persisted index — graft's analog of FAISS `save_index` /
  * `load_index` + metadata.json (reference: core/utils.py:137-:192).
  *
  * Instead of a binary blob on one node, the index is two parquet
  * tables: `chunks` (the metadata sidecar) and `embeddings` in long
  * form, the latter partitioned by a coarse quantizer bucket — the
  * hashed-BoW dimension with the largest |weight|. A search that
  * probes buckets reads ONLY the probed partitions' files: on a
  * 100 TB corpus only probed directories are touched at all.
  *
  * == Commit protocol (MANIFEST, not in-place mutation) ==
  *
  * Plain parquet has no atomic multi-table commit, and the previous
  * design's dynamic partition overwrite left a documented crash
  * window between the chunks and embeddings writes. This layout
  * closes it the way table formats do (cf. Iceberg's manifest lists):
  *
  * {{{
  *   root/
  *     manifests/m-<seq>-<uuid>.txt   # partition -> data dir, BOTH tables
  *     data/w-<uuid>/chunks/_p=3/…    # immutable once written
  *     data/w-<uuid>/embeddings/_p=7/…
  * }}}
  *
  * A write lands new partition directories under a fresh `data/w-*`
  * prefix (copy-on-write — existing files are NEVER modified or
  * overwritten), then publishes ONE manifest naming the current data
  * dir of every partition of both tables. The manifest is written to
  * a tmp name and renamed to its final unique name — rename onto a
  * fresh path is atomic on every real filesystem — and readers
  * resolve the HIGHEST-sequence manifest, so a crash anywhere before
  * the rename leaves readers on the previous fully-consistent
  * two-table state. There is no pointer file to corrupt and no
  * in-progress marker to honor; partitions an upsert vacates are
  * simply not referenced by the new manifest. Superseded manifests /
  * unreferenced data dirs are snapshots until [[vacuum]] reclaims
  * them.
  *
  * The partition key is kept as a DATA column too (the directory key
  * is a duplicated `_p` column): manifest-selected directories read
  * back with their full schema with no dependence on Spark partition
  * discovery.
  */
object ChunkIndex {

  val ChunkShards = 8

  /** Manifest key for a 0-row table written flat: an empty
    * `partitionBy` write emits no schema-bearing footer at all and
    * the table becomes unreadable (UNABLE_TO_INFER_SCHEMA on load),
    * so empty tables land as one flat schema-bearing dir instead.
    */
  private[sources] val FlatKey = "__flat__"
  private val PartDirCol = "_p"

  private def withShard(chunks: DataFrame): DataFrame =
    chunks.withColumn("shard", pmod(col("doc_id"), lit(ChunkShards.toLong)).cast("int"))

  private def withBucket(emb: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(abs(col("weight")).desc, col("dim"))
    emb.withColumn("bucket", first(col("dim")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).cast("int"))
  }

  // ----------------------------------------------------------------
  // Manifest IO — the shared single-manifest protocol (ManifestStore)
  // ----------------------------------------------------------------

  private type Manifest = ManifestStore.Manifest
  private def Manifest(seq: Long, tables: Map[String, Map[String, String]],
      params: Map[String, String] = Map.empty): Manifest =
    ManifestStore.Manifest(seq, tables, params)

  /** The index's FAISS-style factory identity, stamped into every
    * manifest at write time (`param factory …`): the coarse quantizer
    * is the dominant hashed-BoW dimension — [[Ingest.EmbedDim]]
    * possible buckets over flat (unquantized) sparse weights. A
    * loader asking for different parameters fails fast
    * (operators.IndexFactory.searchPersisted), exactly as a FAISS
    * index file fixes its own nlist/M at train time.
    */
  val FactoryString: String = s"IVF${Ingest.EmbedDim},Flat"

  private def indexParamDefaults: Map[String, String] = Map(
    "factory" -> FactoryString,
    "chunk_shards" -> ChunkShards.toString)

  /** The parameter block of the committed manifest: None for a
    * never-committed root (no index at all), Some(empty) for a
    * pre-parameter manifest — the two need different error messages
    * downstream.
    */
  private[graft] def indexParams(spark: SparkSession, root: String): Option[Map[String, String]] =
    currentManifest(spark, root).map(_.params)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    ManifestStore.fsOf(spark, p)

  private def newId(): String = ManifestStore.newId()

  private def currentManifest(spark: SparkSession, root: String): Option[Manifest] =
    ManifestStore.current(spark, root)

  private def commit(spark: SparkSession, root: String, m: Manifest): Unit =
    ManifestStore.commit(spark, root, m)

  /** Reclaim storage a long-lived index no longer needs — see
    * [[ManifestStore.vacuum]].
    */
  def vacuum(spark: SparkSession, root: String): Unit =
    ManifestStore.vacuum(spark, root)

  /** Write `df`'s partitions (copy-on-write) under
    * `data/<writeId>/<table>` and return the partition → relative-dir
    * mapping the manifest should carry. The partition key is
    * duplicated into the throwaway [[PartDirCol]] for the directory
    * layout, so the real column stays in the data files.
    */
  private def writeTablePartitions(spark: SparkSession, df: DataFrame,
      partCol: String, root: String, writeId: String, table: String): Map[String, String] = {
    val rel = s"data/$writeId/$table"
    val abs = s"$root/$rel"
    if (df.isEmpty) {
      df.write.mode(SaveMode.Overwrite).parquet(abs)
      Map(FlatKey -> rel)
    } else {
      df.withColumn(PartDirCol, col(partCol))
        .write.mode(SaveMode.Overwrite).partitionBy(PartDirCol).parquet(abs)
      val fs = fsOf(spark, new Path(abs))
      fs.listStatus(new Path(abs)).map(_.getPath.getName)
        .filter(_.startsWith(PartDirCol + "="))
        .map(n => n.stripPrefix(PartDirCol + "=") -> s"$rel/$n")
        .toMap
    }
  }

  /** Build and persist the index tables (embed_pdfs.py:220
    * `build_and_save_index`) as the root's first commit. Both tables
    * are partitioned — `chunks` by a doc_id shard, `embeddings` by
    * the quantizer bucket — so incremental upserts rewrite only
    * touched partitions.
    */
  def write(spark: SparkSession, dir: String, outPath: String): Unit = {
    val writeId = s"w-${newId()}"
    val ch = writeTablePartitions(spark, withShard(Ingest.docChunk(spark, dir)),
      "shard", outPath, writeId, "chunks")
    val em = writeTablePartitions(spark, withBucket(Ingest.docEmbed(spark, dir)),
      "bucket", outPath, writeId, "embeddings")
    commit(spark, outPath,
      Manifest(1L, Map("chunks" -> ch, "embeddings" -> em), indexParamDefaults))
  }

  /** MERGE-style upsert of an incoming (doc_id, text) batch into the
    * persisted index — the reference's write-back flows
    * (core/supabase_utils.py:400 `update_contribution_status`,
    * core/views.py:1065 `admin_reindex_documents`). Copy-on-write
    * MERGE: fresh versions of exactly the partitions that hold an old
    * or new version of an incoming doc (old and new may differ —
    * re-embedding can move a doc to another bucket, so both sides'
    * partitions are collected) land under a new write dir; every
    * other partition's files are untouched and carried forward by
    * reference in the new manifest.
    *
    * The `chunks` side's shard is doc_id % [[ChunkShards]] — derivable
    * arithmetically from the incoming ids, so only the `embeddings`
    * side (whose bucket depends on old vector content) pays an
    * existence scan — and that scan is manifest-pruned to the two id
    * columns.
    *
    * ATOMICITY: both tables' new partitions are fully written before
    * the single manifest commit makes any of them visible, so the
    * former crash window between the two table mutations is gone —
    * a crash at ANY point leaves readers on the previous consistent
    * two-table state, and re-delivering the batch (the streaming
    * path's natural behavior; the upsert is idempotent) completes it.
    */
  def upsert(spark: SparkSession, outPath: String, incoming: DataFrame): Unit = {
    currentManifest(spark, outPath) match {
      case None =>
        // bootstrap: nothing to merge — the first batch creates the index
        val writeId = s"w-${newId()}"
        val ch = writeTablePartitions(spark, withShard(Ingest.chunksOf(incoming)),
          "shard", outPath, writeId, "chunks")
        val em = writeTablePartitions(spark, withBucket(Ingest.embedOf(incoming)),
          "bucket", outPath, writeId, "embeddings")
        commit(spark, outPath,
          Manifest(1L, Map("chunks" -> ch, "embeddings" -> em), indexParamDefaults))
      case Some(m) =>
        val writeId = s"w-${newId()}"
        val ids = incoming.select(col("doc_id")).distinct()
        // the index's recorded identity must match THIS writer's
        // parameters BEFORE any merge work runs: merging rows bucketed
        // by a different embedding dimension (or shard count) into the
        // old layout would silently corrupt the very identity
        // searchPersisted validates against. Iterated over the
        // WRITER'S keys (not the manifest's), so a recorded-but-
        // unknown key carries forward untouched while a key the
        // manifest is missing gets back-filled below instead of
        // escaping validation forever. A pre-parameter manifest
        // (graft's own earlier format — there is no foreign writer)
        // gets stamped with the writer's parameters on this commit.
        indexParamDefaults.foreach { case (k, mine) =>
          m.params.get(k).foreach { v =>
            if (mine != v) throw new IllegalStateException(
              s"index at $outPath records $k=$v but this writer is built " +
                s"with $k=$mine — refusing to mix layouts; rebuild the index")
          }
        }
        // old chunk shards are a pure function of the ids — no table scan
        val chunkOldParts = Some(ids
          .select(pmod(col("doc_id"), lit(ChunkShards.toLong)).cast("int").as("shard"))
          .distinct().collect().map(_.get(0).toString).toSet)
        val ch = upsertTable(spark, outPath, m.table("chunks"), "shard",
          ids, withShard(Ingest.chunksOf(incoming)), chunkOldParts, writeId, "chunks")
        val em = upsertTable(spark, outPath, m.table("embeddings"), "bucket",
          ids, withBucket(Ingest.embedOf(incoming)), None, writeId, "embeddings")
        // defaults-then-recorded: validated keys keep their recorded
        // value, missing writer keys are back-filled, unknown recorded
        // keys carry forward
        commit(spark, outPath,
          Manifest(m.seq + 1, Map("chunks" -> ch, "embeddings" -> em),
            indexParamDefaults ++ m.params))
    }
  }

  /** One table's copy-on-write merge: read ONLY the affected
    * partitions' current files (manifest-selected paths — the scan
    * is pruned by construction), drop the old versions of incoming
    * docs, write survivors + fresh rows under the new write dir, and
    * return the updated mapping. A partition the merge vacates is
    * simply absent from it.
    */
  private def upsertTable(spark: SparkSession, root: String,
      mapping: Map[String, String], partCol: String, ids: DataFrame,
      fresh: DataFrame, oldParts: Option[Set[String]], writeId: String,
      table: String): Map[String, String] = {
    // fresh feeds two jobs (partition list + merged write): materialize once
    val freshCk = fresh.localCheckpoint()
    val freshParts = freshCk.select(col(partCol)).distinct()
      .collect().map(_.get(0).toString).toSet
    val olds: Set[String] = oldParts.getOrElse {
      val paths = mapping.values.toSeq.map(r => s"$root/$r")
      if (paths.isEmpty) Set.empty[String]
      else spark.read.parquet(paths: _*)
        .join(functions.broadcast(ids), Seq("doc_id"), "left_semi")
        .select(col(partCol)).distinct().collect().map(_.get(0).toString).toSet
    }
    // a flat (empty-table) dir holds no partition key: always rewrite it
    val affected = olds ++ freshParts + FlatKey
    val keepPaths = mapping.filter(kv => affected(kv._1)).values
      .toSeq.map(r => s"$root/$r")
    val keep =
      if (keepPaths.isEmpty) freshCk.limit(0)
      else spark.read.parquet(keepPaths: _*)
        .join(functions.broadcast(ids), Seq("doc_id"), "left_anti")
    // copy-on-write: keep is read from the OLD dirs and written to NEW
    // ones — no lineage-severing checkpoint needed, nothing overwrites
    // the files it reads
    val written = writeTablePartitions(spark,
      keep.unionByName(freshCk.select(keep.columns.map(col).toIndexedSeq: _*)),
      partCol, root, writeId, table)
    val carried = (mapping -- affected).filterNot(_._1 == FlatKey)
    // an all-vacated merge writes a flat empty dir; drop it if real
    // partitions survive elsewhere
    val w = if (written.keySet == Set(FlatKey) && carried.nonEmpty) Map.empty[String, String]
            else written
    carried ++ w
  }

  /** Live incremental indexing: a Structured Streaming sink that
    * upserts each micro-batch of (doc_id, text) into the persisted
    * index via [[upsert]] — the streaming form of the reference's
    * ingest/reindex flow (documents become searchable as they
    * arrive, and only the touched partitions are rewritten per
    * batch). `foreachBatch` is the standard exactly-once-per-batch
    * seam for sinks without native streaming support; each batch is
    * one manifest commit.
    */
  def streamingUpsert(docs: DataFrame, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) upsert(batch.sparkSession, outPath, batch)
      }

  /** Target data-file size [[compact]] coalesces toward — partitions
    * are rewritten into ⌈bytes / this⌉ files (≥ 1), the standard lake
    * compaction contract, so a 100 TB index compacts to executor-
    * friendly reads instead of a single giant file per partition.
    */
  val CompactTargetBytes: Long = 128L * 1024 * 1024

  /** Compact OVER-FRAGMENTED partitions of the persisted index — the
    * maintenance pass a daily-crawl upsert cadence needs: every MERGE
    * cycle rewrites its touched partitions with however many files
    * the write job's task layout produced, so a hot partition's file
    * count creeps upward and a year of micro-batches is the classic
    * small-files death (every search probing that bucket opens them
    * all).
    *
    * Manifest-aware and copy-on-write, like [[upsert]]: for each
    * table, any LIVE partition whose data dir holds more than
    * `maxFilesPerPartition` data files is re-read (that dir only —
    * explicit path selection, no discovery) and rewritten under a
    * fresh write id into ⌈bytes / [[CompactTargetBytes]]⌉ files;
    * every other partition is carried forward BY REFERENCE — its
    * files are not read, copied, or renamed (IncrementalSpec-style
    * byte-identical). One manifest commit publishes the result; a
    * crash at any point leaves readers on the previous consistent
    * state, and [[vacuum]] later reclaims the superseded dirs. Row
    * content is untouched by construction — compaction is pure
    * layout; ChunkIndexSpec pins search-result identity pre/post.
    *
    * Returns the number of partitions rewritten (0 = no commit —
    * including the case where a concurrent writer advanced the
    * manifest during the rewrite and the commit was ABORTED via
    * [[ManifestStore.commitIfCurrent]]: compact never publishes a
    * state built from a superseded snapshot).
    */
  def compact(spark: SparkSession, root: String,
              maxFilesPerPartition: Int = 8): Int = {
    require(maxFilesPerPartition > 0,
      s"maxFilesPerPartition must be positive, got $maxFilesPerPartition")
    currentManifest(spark, root) match {
      case None => 0
      case Some(m) =>
        val writeId = s"w-${newId()}"
        var rewritten = 0
        val newTables = m.tables.map { case (table, mapping) =>
          val compacted = mapping.map { case (part, rel) =>
            val dir = new Path(s"$root/$rel")
            val fs = fsOf(spark, dir)
            val dataFiles = fs.listStatus(dir)
              .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
                && !st.getPath.getName.startsWith("."))
            if (part == FlatKey || dataFiles.length <= maxFilesPerPartition)
              part -> rel   // carried forward by reference, untouched
            else {
              rewritten += 1
              val bytes = dataFiles.map(_.getLen).sum
              val nFiles = math.max(1L,
                (bytes + CompactTargetBytes - 1) / CompactTargetBytes).toInt
              val outRel = s"data/$writeId/$table/$PartDirCol=$part"
              spark.read.parquet(dir.toString)
                .coalesce(nFiles)
                .write.mode(SaveMode.Overwrite).parquet(s"$root/$outRel")
              part -> outRel
            }
          }
          table -> compacted
        }
        // optimistic commit: if a streaming/daily upsert advanced the
        // store while we rewrote, ABORT rather than publish a manifest
        // built from the pre-upsert state (last-writer-wins would
        // silently drop the upsert's rows — data loss, not a lost
        // optimization). The rewritten dirs stay orphaned for vacuum;
        // the caller sees 0 and may simply compact again.
        if (rewritten > 0 &&
            ManifestStore.commitIfCurrent(spark, root,
              Manifest(m.seq + 1, newTables, m.params))) rewritten
        else 0
    }
  }

  /** Build the persisted index for `dir` once per machine (not once
    * per session): the index lands under the fingerprinted staging
    * path, so a fresh JVM — or the correctness/bench driver — reuses
    * the on-disk tables, and regenerated input data rebuilds them.
    * A `_GRAFT_INDEX_DONE` marker distinguishes a complete build
    * from a crashed partial one (the manifest protocol already makes
    * partial states invisible; the marker just short-circuits the
    * rebuild decision). Published through DfCache.publishStaged, so
    * a superseded fingerprint's index is swept like any staged table.
    */
  def ensureIndex(spark: SparkSession, dir: String): String =
    graft.DfCache.publishStaged(spark, s"chunk_index:$dir",
      graft.DfCache.inputFingerprint(spark, s"$dir/documents.parquet"),
      "_GRAFT_INDEX_DONE") { tmp =>
        write(spark, dir, tmp)
      }

  /** Search over the PERSISTED index as an oracle-checked query: build
    * (or reuse) the on-disk index, then run the manifest-pruned
    * [[search]] against it — the full save_index → load_index →
    * search_similar_chunks flow (core/utils.py:137/:150/:194) under
    * the DuckDB gate rather than ScalaTest only.
    */
  def indexSearch(spark: SparkSession, dir: String): DataFrame =
    search(spark, ensureIndex(spark, dir), "hash join", nProbe = 2, k = 5)

  /** The same persisted search with the probed buckets read THROUGH
    * the DSv2 connector (`spark.read.format("graft-index")` with the
    * `buckets` option) instead of [[searchBuckets]]' direct path
    * selection — identical semantics (same query prep and scoring
    * spelling via [[searchImpl]]), so the connector's manifest
    * resolution + bucket pruning sits under the DuckDB gate rather
    * than under IndexSourceSpec only.
    */
  def indexSearchDsv2(spark: SparkSession, dir: String): DataFrame = {
    val root = ensureIndex(spark, dir)
    searchImpl(spark, root, "hash join", nProbe = 2, k = 5, buckets =>
      spark.read.format("graft-index")
        .option("table", "embeddings")
        .option("buckets", buckets.mkString(","))
        .load(root)
        .where(col("bucket").isin(buckets: _*)))
  }

  /** Load the persisted index (core/utils.py:150 `load_index` /
    * :178 `load_metadata`): every partition dir the current manifest
    * references.
    */
  def readChunks(spark: SparkSession, outPath: String): DataFrame =
    readTable(spark, outPath, "chunks")

  def readEmbeddings(spark: SparkSession, outPath: String): DataFrame =
    readTable(spark, outPath, "embeddings")

  /** Ops/test visibility: the committed partition → absolute-dir
    * mapping of one table (empty if the root was never committed).
    */
  private[graft] def partitionDirs(spark: SparkSession, root: String,
      table: String, snapshot: Option[Long] = None): Map[String, String] =
    ManifestStore.at(spark, root, snapshot)
      .map(_.table(table).map { case (p, rel) => p -> s"$root/$rel" })
      .getOrElse(Map.empty)

  private def readTable(spark: SparkSession, root: String, table: String): DataFrame = {
    val m = currentManifest(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed index at $root"))
    val paths = m.table(table).values.toSeq.sorted.map(r => s"$root/$r")
    spark.read.parquet(paths: _*)
  }

  /** Probe-pruned search over the persisted index: ONLY the probed
    * buckets' directories are read at all — the manifest maps bucket
    * → dir, so pruning is explicit path selection, no partition
    * discovery or scan-time filtering involved. (The residual filter
    * only matters for a flat empty-table dir.)
    */
  def searchBuckets(spark: SparkSession, outPath: String,
      queryBuckets: Seq[Long]): DataFrame = {
    val m = currentManifest(spark, outPath).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed index at $outPath"))
    val mapping = m.table("embeddings")
    val sel = queryBuckets.map(_.toString).flatMap(mapping.get) ++
      mapping.get(FlatKey)
    val paths =
      if (sel.nonEmpty) sel.map(r => s"$outPath/$r")
      // no probed bucket exists: read one real dir for schema, filter to 0
      else mapping.values.toSeq.sorted.take(1).map(r => s"$outPath/$r")
    spark.read.parquet(paths: _*)
      .where(col("bucket").isin(queryBuckets: _*))
  }

  /** End-to-end text search against the PERSISTED index: embed the
    * query (hashed BoW), probe its `nProbe` dominant buckets (read
    * only their directories), sparse-dot-rank the docs inside — the
    * full `search_similar_chunks` flow (core/utils.py:194) over the
    * saved index rather than the in-session one.
    */
  def search(spark: SparkSession, outPath: String, queryText: String,
      nProbe: Int, k: Int): DataFrame =
    searchImpl(spark, outPath, queryText, nProbe, k,
      searchBuckets(spark, outPath, _))

  /** The search body with the probed-bucket read as a seam — ONE
    * spelling of query prep and scoring serves both the direct
    * manifest path and the DSv2 connector path, so the two cannot
    * drift.
    */
  private def searchImpl(spark: SparkSession, outPath: String, queryText: String,
      nProbe: Int, k: Int, probedOf: Seq[Long] => DataFrame): DataFrame = {
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
    val probed = probedOf(buckets)
    probed.join(functions.broadcast(qemb), Seq("dim"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Par.round4(sum(col("qw") * col("weight"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
