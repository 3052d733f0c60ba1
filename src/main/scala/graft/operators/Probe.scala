package graft.operators

import org.apache.spark.sql.SparkSession

/** Stage-level wall-clock profiler for the simhash pipeline (dev
  * tool, not part of the driver contract): times the staged inputs,
  * the qualifying stream, the partner cap, and the full query against
  * any corpus dir — the instrument that produced the r15 saturation-
  * trim receipts (qualifying 56.9M → 3.6M rows, ~29 s → ~7 s at the
  * 256× rung, output row count bit-identical to the r14 artifact).
  * `runMain graft.operators.Probe <dir>` with SPARK_DRIVER_MEM sized
  * for the rung.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime - s) / 1e9}%8.2f s  -> $r")
      r
    }
    val members = Dedup.minhashMembers(spark, dir)
    t("members.count")(members.count())
    val sigs = Dedup.simhashSigsCached(spark, dir)
    t("sigs.count")(sigs.count())
    val q = Dedup.simhashExpandedQualifyingOf(members, sigs)
    t("qualifying.count")(q.count())
    t("qualifying.count2")(q.count())
    t("partnerCapped.count")(Dedup.partnerCappedForTest(q).count())
    t("dedupSimhash.count")(Dedup.dedupSimhash(spark, dir).count())
    t("dedupSimhash.again")(Dedup.dedupSimhash(spark, dir).count())
    spark.stop()
  }
}
