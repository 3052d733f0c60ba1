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
  def events(s: SparkSession, dir: String): DataFrame =
    apply(s, dir, "events")
      // `div` truncates toward zero; DuckDB's epoch_ms floors. Equal
      // for the post-epoch timestamps event data can contain — a
      // pre-1970 ts would disagree by 1ms (nonsensical in this domain)
      .withColumn("ts_ms", org.apache.spark.sql.functions.expr("ts div 1000000"))
      .drop("ts")
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
