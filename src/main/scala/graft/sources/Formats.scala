package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Multi-format source/sink round-trips. Parquet is the engine's
  * native format (Tables/ChunkIndex); JSON and CSV cover the
  * interchange surface the reference exposes through its REST layer
  * (uploads / exports). Reads always take an explicit schema —
  * schema inference is a full extra pass at 100 TB.
  */
object Formats {

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** A quarantined JSONL read: parsed good rows, rejected raw lines,
    * and a `release()` that unpersists the shared cached scan both
    * views are built on — on a large corpus the cached blocks would
    * otherwise stay pinned until application end.
    */
  final case class QuarantinedRead(good: DataFrame, quarantined: DataFrame,
      release: () => Unit)

  /** JSONL corpus reader with corrupt-line QUARANTINE — web-scale
    * corpora arrive as JSONL with a nonzero malformed-line rate, and
    * both failure modes of the naive read are wrong at 100 TB:
    * FAILFAST kills a day-long job on one bad line, and PERMISSIVE
    * with a dropped corrupt column silently loses data with no audit
    * trail. This read splits into (good rows, quarantined raw lines)
    * so the pipeline keeps running AND every rejected line is
    * inspectable. The frame is cached because Spark refuses to
    * filter on the internal corrupt-record column of a lazy scan
    * (the column only materializes during parsing); call `release()`
    * once both views are materialized.
    */
  def readJsonlQuarantine(spark: SparkSession, path: String,
      schema: StructType): QuarantinedRead = {
    val corruptCol = "_corrupt_record"
    val raw = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val good = raw.where(col(corruptCol).isNull).drop(corruptCol)
    val quarantined = raw.where(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    QuarantinedRead(good, quarantined, () => { raw.unpersist(); () })
  }

  /** Oracle-gated JSONL ingest (SURVEY.md §2.A): materialize (once,
    * fingerprint-staged like every index artifact) a JSONL mirror of
    * the documents table in which every 13th line (doc_id % 13 == 0)
    * is DELIBERATELY truncated mid-object — a deterministic stand-in
    * for the malformed-line rate of a crawled corpus — then read it
    * back through [[readJsonlQuarantine]] and report per-lang
    * good-row aggregates plus the quarantine count as a
    * `__quarantined__` row. The DuckDB oracle recomputes both sides
    * arithmetically from the parquet table, so the quarantine
    * reader's row accounting sits under the same hash-exact gate as
    * every other operator.
    */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val line = when(col("doc_id") % 13 === 0,
        concat(lit("{\"doc_id\":"), col("doc_id").cast("string"), lit(",\"text\":")))
      .otherwise(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))))
    val path = graft.DfCache.publishStaged(spark, s"jsonl_src:$dir",
      graft.DfCache.inputFingerprint(spark, s"$dir/documents.parquet"),
      "_SUCCESS") { tmp =>
        docs.select(line.as("value")).write.mode(SaveMode.Overwrite).text(tmp)
      }
    val read = readJsonlQuarantine(spark, path, docs.schema)
    val goodAgg = read.good.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val quarantineRow = read.quarantined
      .agg(count(lit(1)).as("n_docs"))
      .select(lit("__quarantined__").as("lang"), col("n_docs"),
        lit(0L).as("sum_chars"))
    goodAgg.unionByName(quarantineRow).orderBy(col("lang"))
  }
}
