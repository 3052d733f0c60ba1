package graft

import org.apache.spark.sql.functions._

import graft.sources.{Clustering, Tables}

/** Z-order clustering: content-preserving, and the layout actually
  * enables skipping — per-file min/max ranges are tight on BOTH
  * clustered columns, so a point filter on either column excludes
  * most files by stats alone.
  */
class ClusteringSpec extends SparkSpec {

  private def fileStats(path: String, c: String) =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
      .collect().map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))

  test("zorderWrite preserves content and tightens per-file ranges on both columns") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts_ms")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString + "/ev"
    Clustering.zorderWrite(ev, Seq("user_id", "ts_ms"), out, numFiles = 8)

    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    assert(back.select(sum(col("event_id"))).head().getLong(0) ==
      ev.select(sum(col("event_id"))).head().getLong(0))

    // skipping power: the average per-file span should be a small
    // fraction of the global span, on BOTH columns at once
    for (c <- Seq("user_id", "ts_ms")) {
      val global = ev.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      val span = global.getDouble(1) - global.getDouble(0)
      val stats = fileStats(out, c)
      assert(stats.length > 1, "expected multiple files")
      val avgSpan = stats.map { case (lo, hi) => hi - lo }.sum / stats.length
      assert(avgSpan < 0.8 * span, s"$c: files not clustered (avg $avgSpan vs $span)")
      // a point lookup on this column can statically skip >= half the files
      val probe = global.getDouble(0) + span / 3
      val touched = stats.count { case (lo, hi) => lo <= probe && probe <= hi }
      assert(touched <= stats.length / 2,
        s"$c: point probe touches $touched of ${stats.length} files")
    }
  }

  test("single-column zorder degrades to a plain range layout; bad args are loud") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts_ms")
    val out = java.nio.file.Files.createTempDirectory("zorder1").toString + "/ev"
    Clustering.zorderWrite(ev, Seq("ts_ms"), out, numFiles = 4)
    val stats = fileStats(out, "ts_ms").sortBy(_._1)
    // range layout: consecutive files cover disjoint (sorted) ranges
    stats.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $stats")
      case _ =>
    }
    intercept[IllegalArgumentException] {
      Clustering.zValue(Seq("a", "b"), Map("a" -> (0.0, 1.0), "b" -> (0.0, 1.0)), 40)
    }
    intercept[IllegalArgumentException] {
      Clustering.zValue(Nil, Map.empty, 8)
    }
  }
}
