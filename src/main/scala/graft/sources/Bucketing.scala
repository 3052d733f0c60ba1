package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located fact-fact joins: writing both
  * sides bucketed by the join key lets Spark join them with ZERO
  * exchange — at 100 TB the lineitem⋈orders shuffle is the single
  * biggest cost in the relational core, and bucketing removes it
  * for every downstream query that joins on the key.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets
    * so merge joins need no sort either).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // an interrupted earlier write can leave the location behind with
    // no catalog entry — clean it or saveAsTable refuses the name.
    // Hadoop FileSystem (not java.io.File) so non-local warehouses
    // work; lowercase because managed-table dirs are lowercased.
    val leftover = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = leftover.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(leftover)) fs.delete(leftover, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)   // managed table under spark.sql.warehouse.dir
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
