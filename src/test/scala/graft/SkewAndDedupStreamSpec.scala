package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.Tables
import graft.streaming.{Ev, Sessionize}

class SkewAndDedupStreamSpec extends SparkSpec {

  test("salted join equals plain join") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "event_type", "value")
    val dim = Tables.events(spark, sfDir).select("event_type").distinct()
      .withColumn("type_code", length(col("event_type")))
    val plain = ev.join(dim, Seq("event_type"))
      .select("event_id", "type_code").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val salted = SkewJoin.saltedJoin(ev, dim, "event_type", 8)
      .select("event_id", "type_code").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(salted.sameElements(plain))
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
      .as[Ev].collect().sortBy(_.ts_ms).take(200)
    val withReplays = (events ++ events.take(50)).toIndexedSeq   // at-least-once source
    val input = MemoryStream[Ev]
    val q = Sessionize.dedupStream(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("deduped").start()
    try {
      input.addData(withReplays); q.processAllAvailable()
      val out = spark.table("deduped").collect().map(_.getAs[Long]("event_id"))
      assert(out.length == events.length, s"expected ${events.length}, got ${out.length}")
      assert(out.distinct.length == out.length)
    } finally q.stop()
  }
}
