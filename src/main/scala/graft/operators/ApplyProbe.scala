package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: the sorted-contract receipts (r15 verdict #1) — time
  * each corpus-sized apply operator MATERIALIZED (noop datasource
  * write: executes the full plan including the presentation sort —
  * `.count()` would let EliminateSorts drop the top-level order and
  * time the wrong plan) with the default sort vs `sorted = false`.
  * First run warms staging/caches; the quoted numbers are warm.
  * `runMain graft.operators.ApplyProbe <dir>` with SPARK_DRIVER_MEM
  * sized for the rung.
  */
object ApplyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      mat(df)
      println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val ops: Seq[(String, Boolean => DataFrame)] = Seq(
      "c4_filter"         -> (s => TextAnalysis.c4Filter(spark, dir, sorted = s)),
      "gopher_filter"     -> (s => TextAnalysis.gopherFilter(spark, dir, sorted = s)),
      "clean_text"        -> (s => TextAnalysis.cleanText(spark, dir, sorted = s)),
      "pii_scrub"         -> (s => TextAnalysis.piiScrub(spark, dir, sorted = s)),
      "fineweb_linededup" -> (s => TextAnalysis.finewebLineDedup(spark, dir, sorted = s)),
      "dedup_apply"       -> (s => Dedup.dedupApply(spark, dir, sorted = s)),
      "session_cleanup_apply" ->
        (s => Analytics.sessionCleanupApply(spark, dir, sorted = s)))
    ops.foreach { case (name, q) =>
      mat(q(true))   // warm staging, caches, page cache
      t(s"$name sorted=true")(q(true))
      t(s"$name sorted=false")(q(false))
    }
    spark.stop()
  }
}
