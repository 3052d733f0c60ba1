package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
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

  /** JSONL corpus reader with corrupt-line QUARANTINE — web-scale
    * corpora arrive as JSONL with a nonzero malformed-line rate, and
    * both failure modes of the naive read are wrong at 100 TB:
    * FAILFAST kills a day-long job on one bad line, and PERMISSIVE
    * with a dropped corrupt column silently loses data with no audit
    * trail. This read splits into (good rows, quarantined raw lines)
    * so the pipeline keeps running AND every rejected line is
    * inspectable. The frame is cached because Spark refuses to
    * filter on the internal corrupt-record column of a lazy scan
    * (the column only materializes during parsing).
    */
  def readJsonlQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
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
    (good, quarantined)
  }
}
