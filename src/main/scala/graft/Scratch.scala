package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "ngram_jaccard"
    val df = SparkEntry.queries(name)(spark, dir)
    if (sys.env.contains("EXPLAIN")) df.explain("formatted")
    var t0 = System.nanoTime()
    df.count()
    println(s"[scratch] $name run1: ${(System.nanoTime() - t0) / 1e9}s")
    t0 = System.nanoTime()
    df.count()
    println(s"[scratch] $name run2: ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
