package graft.operators

import org.apache.spark.sql.SparkSession

/** Attribution probe for dedup_simhash's ladder wall-time — times
  * each pipeline stage by forcing it with a count, so a rung's
  * bench number decomposes into receipts instead of needing a
  * next-round adjudication (`sbt "runMain
  * graft.operators.SimhashProbe target/scale64"`). Round-12 run at
  * 64× (16 cpus, 32g): members 3.6 s cold / 0.2 s cached, staged
  * sigs 0.5 s, rep pairs 2.2 s (151,083 hamming-≤6 edges over 9,984
  * reps), expansion 13.1 s emitting 46,288,357 rows — exactly the
  * audited partner_cap candidate volume, ≈ edges-per-group (~15) ×
  * pk (8) per participating doc — and the map-side-combining TopK
  * adds ~8 s; full query ≈ 19 s vs the 21.0 s bench median. The
  * wall-time IS the designed candidate bound (linear in distinct-
  * text edges, independent of clone count), not an accidental
  * blowup.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale64")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warm-up: JVM + codegen on unrelated query
    graft.SparkEntry.queries("dashboard_stats")(spark, dir).count()

    // stage 1: exact-content quotient (session-cached afterwards)
    time("members (quotient, cold)") { Dedup.minhashMembers(spark, dir).count() }
    time("members (cached)") { Dedup.minhashMembers(spark, dir).count() }
    // stage 2: rep signature table (staged — warm read if staging has it)
    time("sigs (staged read)") { Dedup.simhashSigsCached(spark, dir).count() }
    // stage 3: rep-level qualifying pairs (bucket join + hamming)
    time("repQ (rep pairs)") { Dedup.simhashQualifying(Dedup.simhashSigsCached(spark, dir)).count() }
    // stage 4: expansion stream (within + 2x cross halves)
    time("expanded qualifying") { Dedup.simhashExpandedQualifying(spark, dir).count() }
    // stage 5: partner cap (TopKAgg over the stream)
    time("partnerCapped") { Dedup.partnerCappedForTest(Dedup.simhashExpandedQualifying(spark, dir)).count() }
    // stage 6: the full query incl. presentation sort
    time("full dedupSimhash") { Dedup.dedupSimhash(spark, dir).count() }
    time("full dedupSimhash (again)") { Dedup.dedupSimhash(spark, dir).count() }
    spark.stop()
  }
}
