package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{Ev, Sessionize}

/** The durable streaming sink path: windowed aggregates written to
  * parquet with a checkpoint — the shape a production pipeline uses
  * (exactly-once file sink), closing the loop source → stateful
  * transform → columnar sink.
  */
class StreamingSinkSpec extends SparkSpec {

  test("windowed live counts stream to a parquet sink exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
      .as[Ev].collect().sortBy(_.ts_ms)
    val out = Files.createTempDirectory("graft_stream_sink").toString
    val input = MemoryStream[Ev]
    val q = Sessionize.liveUserCounts(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/checkpoint")
      .start()
    try {
      input.addData(events.toIndexedSeq); q.processAllAvailable()
      val sentinel = Ev(999999L, 999999L, events.map(_.ts_ms).max + 10L * 24 * 3600 * 1000, 0.0)
      input.addData(sentinel); q.processAllAvailable()
    } finally q.stop()
    val sunk = spark.read.parquet(s"$out/data")
    assert(sunk.count() > 0)
    // no duplicate windows in the exactly-once sink
    assert(sunk.select("window_start_ms").distinct().count() == sunk.count())
    val maxUsers = sunk.agg(max(col("live_users"))).collect().head.getLong(0)
    assert(maxUsers > 0 && maxUsers <= 2L * events.map(_.user_id).distinct.length)
  }

  test("streaming upsert: arriving docs become searchable in the persisted index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_stream_idx").toString
    graft.sources.ChunkIndex.write(spark, sfDir, out)
    val input = MemoryStream[(Long, String)]
    val q = graft.sources.ChunkIndex
      .streamingUpsert(input.toDS().toDF("doc_id", "text"), out)
      .option("checkpointLocation", s"$out/checkpoint")
      .start()
    try {
      input.addData((888888L, "zebra quokka streaming")); q.processAllAvailable()
      val hits1 = graft.sources.ChunkIndex
        .search(spark, out, "zebra quokka streaming", nProbe = 4, k = 5)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(hits1.contains(888888L), s"batch-1 doc not searchable: $hits1")
      // a second micro-batch REPLACES the doc (newest wins per doc_id)
      input.addData((888888L, "walrus ocelot streaming")); q.processAllAvailable()
      val hits2 = graft.sources.ChunkIndex
        .search(spark, out, "walrus ocelot streaming", nProbe = 4, k = 5)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(hits2.contains(888888L), s"batch-2 replacement not searchable: $hits2")
      assert(graft.sources.ChunkIndex.readChunks(spark, out)
        .where(col("doc_id") === 888888L).count() == 1,
        "old version not replaced")
    } finally q.stop()
  }
}
