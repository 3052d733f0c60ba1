package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev probe: adjudicate the multi-pass excursions the 256× bench
  * showed on dataset_split_incremental (55.1 / 40.8 / 5.5 s across
  * warm passes in r15's ladder — a 7.4× pass-2 spike the "uniform
  * box noise" convention does not cover; r15 verdict #2). The
  * SimhashProbe discipline: force each component, then run the full
  * query over bench-shaped consecutive passes, printing the cached-
  * block storage footprint between passes — if a pass recomputes a
  * persisted chain because its blocks were evicted, the storage
  * table names the victim; if the cost is page-cache, the component
  * timings stay flat while only pass 1 pays.
  * `runMain graft.operators.SplitProbe <dir> [passes]` with
  * SPARK_DRIVER_MEM sized for the rung.
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    def storage(tag: String): Unit = {
      val info = spark.sparkContext.getRDDStorageInfo
        .filter(_.numCachedPartitions > 0)
        .sortBy(-_.memSize)
      println(s"[probe] storage@$tag: ${info.length} cached RDDs, " +
        s"mem=${info.map(_.memSize).sum / (1 << 20)}MB " +
        s"disk=${info.map(_.diskSize).sum / (1 << 20)}MB")
      info.take(8).foreach { r =>
        println(f"[probe]   ${r.memSize / (1 << 20)}%6dMB mem " +
          f"${r.diskSize / (1 << 20)}%6dMB disk  ${r.numCachedPartitions}%4d parts  " +
          r.name.take(90))
      }
    }

    // components in dependency order, forced individually — staging
    // rebuild markers around each (the bench's attribution fields)
    def marks: (Long, Long) = (graft.DfCache.stagingRebuilds, graft.DfCache.memoComputes)
    def withMarks[A](label: String)(f: => A): A = {
      val (r0, m0) = marks
      val r = t(label)(f)
      val (r1, m1) = marks
      if (r1 != r0 || m1 != m0)
        println(s"[probe]   ($label: staging_rebuilds +${r1 - r0}, memo_computes +${m1 - m0})")
      r
    }
    withMarks("corpusWithDups.count")(
      Dedup.corpusWithDups(spark, dir, perturb = true).count())
    withMarks("neardupIncremental.count")(Dedup.neardupIncremental(spark, dir).count())
    withMarks("splitBaseManifest.count")(Dedup.splitBaseManifest(spark, dir).count())
    withMarks("query pass 1 (component-warm)")(
      Dedup.datasetSplitIncremental(spark, dir).count())
    storage("after-pass-1")
    (2 to passes).foreach { p =>
      withMarks(s"query pass $p")(Dedup.datasetSplitIncremental(spark, dir).count())
      storage(s"after-pass-$p")
    }
    spark.stop()
  }
}
