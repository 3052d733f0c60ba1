package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-chain attribution for the incremental near-dup probe (dev
  * tool): times each stage of neardup_incremental's warm path —
  * banded delta sigs, the band-key candidate join, the jaccard
  * verify, and the full query — so the per-pass cost decomposes into
  * operator receipts. `runMain graft.operators.IncProbe <dir>`.
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[incprobe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    }
    // warm pass populates memos/staging
    t("full (cold memos)") { Dedup.neardupIncremental(spark, dir).count() }
    t("full (warm)") { Dedup.neardupIncremental(spark, dir).count() }
    t("full (warm 2)") { Dedup.neardupIncremental(spark, dir).count() }
    t("probe pieces (warm)") { Dedup.incProbePieces(spark, dir) }
    t("full (warm 3)") { Dedup.neardupIncremental(spark, dir).count() }
    spark.stop()
  }
}
