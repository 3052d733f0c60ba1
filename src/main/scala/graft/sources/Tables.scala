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
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
  def documentsSpread(s: SparkSession, dir: String): DataFrame = {
    val df = documents(s, dir)
    val path = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val bytes =
      try {
        val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(path)) fs.getContentSummary(path).getLength else Long.MaxValue
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    val cores = s.sparkContext.defaultParallelism.toLong
    val maxSplit =
      try s.sessionState.conf.filesMaxPartitionBytes
      catch { case scala.util.control.NonFatal(_) => 128L * 1024 * 1024 }
    if (bytes / maxSplit < cores && cores > 1) df.repartition(cores.toInt) else df
  }
}
