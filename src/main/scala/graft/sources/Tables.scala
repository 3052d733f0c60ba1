package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's storage surface: the FAISS sidecar +
  * Supabase `documents`/`document_chunks` tables
  * (reference: core/supabase_utils.py:203 `ingest_document`) become
  * columnar parquet scans so Catalyst can prune columns and push
  * filters down to the scan — the 100 TB path never materializes an
  * in-memory index the way `core/utils.py:150 load_index` does.
  */
object Tables {

  /** Per-session memo of the READER frames (r17): `spark.read.parquet`
    * synchronously lists the path and reads a footer for schema
    * inference on EVERY call — measured 60–80 ms per table per query
    * build, ×1–6 tables ×133 queries on the bench board. A production
    * job reads its tables once; this memoizes the analyzed reader
    * DataFrame per (session, path) so repeated builds do too. No data
    * is cached (no persist) — only the driver-side plan object; the
    * session's own FileStatusCache/schema stay the single source of
    * truth, and a regenerated input dir is a different path key only
    * when the path changes (same-path overwrites are refreshed by
    * Spark's usual REFRESH semantics, unchanged from calling
    * spark.read.parquet once up front).
    */
  private val readers =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val m = readers.synchronized {
      var mm = readers.get(spark)
      if (mm == null) {
        mm = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        readers.put(spark, mm)
      }
      mm
    }
    val path = s"$dir/$name.parquet"
    m.computeIfAbsent(path, p => spark.read.parquet(p))
  }

  def lineitem(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads as a long via `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in Verify/Bench/test sessions). Normalized here to an
    * epoch-millis `ts_ms` column — the engine-wide event-time
    * representation (matches DuckDB's `epoch_ms(ts)`).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = apply(s, dir, "events")
    // `div` truncates toward zero; DuckDB's epoch_ms floors. Equal
    // for the post-epoch timestamps event data can contain — a
    // pre-1970 ts would disagree by 1ms (nonsensical in this domain).
    // The driver's table carries TIMESTAMP(NANOS) read as a long
    // (legacy flag); ScaleGen-replicated dirs carry a true timestamp.
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("ts div 1000000")
      // cast: unix_millis rejects TIMESTAMP_NTZ; session TZ is UTC so
      // the cast is identity for either physical timestamp type
      case _ => org.apache.spark.sql.functions.expr("unix_millis(cast(ts as timestamp))")
    }
    raw.withColumn("ts_ms", tsMs).drop("ts")
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")

  /** SCALE-ADAPTIVE spread for compute-heavy scans (r17, guide §2/§6):
    * when the table yields fewer input splits than the cluster has
    * cores — driver testdata is ONE parquet file with ONE row group,
    * so its scan can never exceed one task — a round-robin repartition
    * to defaultParallelism spreads the rows so per-document work
    * (Gopher gram stats, C4 line rules, codec decode, chunk+embed)
    * parallelizes; above `cores × maxPartitionBytes` of input the
    * scan already has a split per core and this is the IDENTITY — no
    * exchange exists in the 100 TB plan. The threshold derives from
    * the session's own `files.maxPartitionBytes` and core count, never
    * a constant tuned for either scale. Only wired into operators
    * whose per-row compute dominates their scan (receipts in
    * OPTIMIZATION_r17.md); trivial per-row paths keep the plain scan
    * (the exchange would cost more than it buys).
    */
  def documentsSpread(s: SparkSession, dir: String): DataFrame =
    spreadSmallScan(s, documents(s, dir), s"$dir/documents.parquet")

  private def spreadSmallScan(s: SparkSession, df: DataFrame,
      pathStr: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(pathStr)
    val bytes =
      try {
        val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(path)) fs.getContentSummary(path).getLength else Long.MaxValue
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    val cores = s.sparkContext.defaultParallelism.toLong
    val maxSplit =
      try s.sessionState.conf.filesMaxPartitionBytes
      catch { case scala.util.control.NonFatal(_) => 128L * 1024 * 1024 }
    if (bytes / maxSplit < cores && cores > 1) {
      import org.apache.spark.sql.functions.{lit, monotonically_increasing_id}
      // PUSHDOWN BARRIER (guide §4.4's non-determinism trick): without
      // it the optimizer pushes a caller's expensive per-row filter
      // (gopher's keep condition, C4's page rules) BELOW the spread
      // exchange onto the single-split scan — re-serializing exactly
      // the compute the spread exists to parallelize (observed: the
      // whole GopherGramStats condition as a 1-task scan filter, the
      // exchange carrying only survivors). The always-true
      // non-deterministic filter (mono ids are ≥ 0) cannot be crossed
      // by predicate pushdown and folds away at runtime; the
      // production-scale branch has no exchange and no barrier.
      df.repartition(cores.toInt)
        .where(monotonically_increasing_id() =!= lit(-1L))
    } else df
  }
}
