package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Analytics
import graft.streaming.{DedupStream, DocIn, Ev, EvT, Sessionize}

/** Streaming sessionization must reproduce the batch operator's
  * sessions when fed the same events (SURVEY.md §2.G).
  */
class StreamingSpec extends SparkSpec {

  private def loadEvents() = {
    import spark.implicits._
    graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
      .as[Ev].collect().sortBy(e => (e.ts_ms, e.event_id))
  }

  private def loadEventsT() = {
    import spark.implicits._
    graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ms"), col("value"))
      .as[EvT].collect().sortBy(e => (e.ts_ms, e.event_id))
  }

  test("streaming sessionize matches batch sessionize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val input = MemoryStream[Ev]
    val query = Sessionize.sessionize(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      // two real batches, then a far-future sentinel to advance the
      // watermark past every open session's gap
      val (b1, b2) = events.splitAt(events.length / 2)
      input.addData(b1.toIndexedSeq); query.processAllAvailable()
      input.addData(b2.toIndexedSeq); query.processAllAvailable()
      val sentinelTs = events.map(_.ts_ms).max + 10L * 24 * 3600 * 1000
      input.addData(Ev(999999L, 999999L, sentinelTs, 0.0)); query.processAllAvailable()

      val streamed = spark.table("sessions")
        .where(col("user_id") =!= 999999L)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value")))
        .sortBy(t => (t._1, t._2))
      val batch = Analytics.sessionize(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value")))
        .sortBy(t => (t._1, t._2))
      assert(streamed.length == batch.length,
        s"streamed ${streamed.length} sessions vs batch ${batch.length}")
      val diffs = streamed.zip(batch).filter { case (s, b) => s != b }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).mkString("; ")}")
    } finally query.stop()
  }

  test("late event inside the watermark merges without corrupting the session window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val min = 60L * 1000
    val t0 = 1000L * 24 * 3600 * 1000
    val input = MemoryStream[Ev]
    val query = Sessionize.sessionize(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("late_sessions").start()
    try {
      // batch 1: events at t0 and t0+10min open the session
      input.addData(Ev(7L, 1L, t0, 1.0), Ev(7L, 2L, t0 + 10 * min, 1.0))
      query.processAllAvailable()
      // batch 2: a LATE event at t0+5min (inside the 30-min watermark)
      // plus an on-time event at t0+38min. 38-10=28min <= gap, so all
      // four belong to ONE session; a backwards-moved end (5min) would
      // see 38-5=33min > gap and wrongly split it.
      input.addData(Ev(7L, 3L, t0 + 5 * min, 1.0), Ev(7L, 4L, t0 + 38 * min, 1.0))
      query.processAllAvailable()
      input.addData(Ev(999999L, 9L, t0 + 10L * 24 * 3600 * 1000, 0.0))
      query.processAllAvailable()

      val sessions = spark.table("late_sessions")
        .where(col("user_id") === 7L).collect()
      assert(sessions.length == 1,
        s"late event split the session: ${sessions.mkString("; ")}")
      val s = sessions.head
      assert(s.getAs[Long]("n_events") == 4L)
      assert(s.getAs[Long]("start_ms") == t0)
      assert(s.getAs[Long]("end_ms") == t0 + 38 * min)
    } finally query.stop()
  }

  test("streaming windowed event counts match batch event_windows exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEventsT()
    val input = MemoryStream[EvT]
    val query = Sessionize.windowedEventCounts(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("win_counts").start()
    try {
      val (b1, b2) = events.splitAt(events.length / 2)
      input.addData(b1.toIndexedSeq); query.processAllAvailable()
      input.addData(b2.toIndexedSeq); query.processAllAvailable()
      val sentinelTs = events.map(_.ts_ms).max + 10L * 24 * 3600 * 1000
      input.addData(EvT(999999L, 999999L, "sentinel", sentinelTs, 0.0))
      query.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("window_ms"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("total_value"))
      val streamed = spark.table("win_counts")
        .where(col("event_type") =!= "sentinel").collect().map(key).sorted
      val batch = Analytics.eventWindows(spark, sfDir).collect().map(key).sorted
      assert(streamed.length == batch.length,
        s"streamed ${streamed.length} windows vs batch ${batch.length}")
      val diffs = streamed.zip(batch).filter { case (s, b) => s != b }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).mkString("; ")}")
    } finally query.stop()
  }

  test("stream-stream view attribution matches the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = loadEventsT()
    def toEv(e: EvT) = Ev(e.user_id, e.event_id, e.ts_ms, e.value)
    val views = ev.filter(_.event_type == "view").map(toEv)
    val purchases = ev.filter(_.event_type == "purchase").map(toEv)
    val vIn = MemoryStream[Ev]
    val pIn = MemoryStream[Ev]
    val query = Sessionize.attributeViews(spark, vIn.toDS(), pIn.toDS())
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    try {
      vIn.addData(views.toIndexedSeq); pIn.addData(purchases.toIndexedSeq)
      query.processAllAvailable()
      // both inputs need the sentinel: the join watermark is the min
      val sentinelTs = ev.map(_.ts_ms).max + 10L * 24 * 3600 * 1000
      vIn.addData(Ev(999999L, 999998L, sentinelTs, 0.0))
      pIn.addData(Ev(999999L, 999999L, sentinelTs, 0.0))
      query.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"))
      val streamed = spark.table("attrib")
        .where(col("user_id") =!= 999999L).collect().map(key).sorted
      val batch = (for {
        p <- purchases
        v <- views
        if v.user_id == p.user_id &&
          v.ts_ms >= p.ts_ms - Sessionize.GapMs && v.ts_ms <= p.ts_ms
      } yield (p.user_id, p.event_id, v.event_id)).sorted
      assert(batch.nonEmpty, "test data produced no attributable views")
      assert(streamed.length == batch.length,
        s"streamed ${streamed.length} pairs vs batch ${batch.length}")
      val diffs = streamed.zip(batch).filter { case (s, b) => s != b }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).mkString("; ")}")
    } finally query.stop()
  }

  test("streaming funnel stage reaches match batch funnel counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEventsT()
    val input = MemoryStream[EvT]
    val query = graft.streaming.Funnel.streamFunnel(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("funnel_s").start()
    try {
      // three batches so stage machines span micro-batch boundaries
      val third = events.length / 3
      events.grouped(third + 1).foreach { b =>
        input.addData(b.toIndexedSeq); query.processAllAvailable()
      }
      val sentinelTs = events.map(_.ts_ms).max + 10L * 24 * 3600 * 1000
      input.addData(EvT(999999L, 999999L, "noop", sentinelTs, 0.0))
      query.processAllAvailable()

      val reaches = spark.table("funnel_s").where(col("user_id") =!= 999999L).collect()
      // exactly-once per (user, stage)
      val dup = reaches.groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("stage")))
        .values.filter(_.length > 1)
      assert(dup.isEmpty, s"duplicate stage emissions: ${dup.take(2)}")
      def n(stage: String) = reaches.count(_.getAs[String]("stage") == stage).toLong
      val batch = Analytics.funnel(spark, sfDir).head()
      assert(n("view") == batch.getAs[Long]("users_view"))
      assert(n("click") == batch.getAs[Long]("users_click_after_view"))
      assert(n("purchase") == batch.getAs[Long]("users_purchase_after_click"))
    } finally query.stop()
  }

  test("streaming funnel: a late view inside the watermark still qualifies the click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val min = 60L * 1000
    val t0 = 2000L * 24 * 3600 * 1000
    val input = MemoryStream[EvT]
    val query = graft.streaming.Funnel.streamFunnel(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("funnel_late").start()
    try {
      // batch 1: the click arrives FIRST (event time t0+10min)
      input.addData(EvT(5L, 2L, "click", t0 + 10 * min, 0.0))
      query.processAllAvailable()
      // batch 2: the view that precedes it arrives late (t0+5min,
      // inside the 30-min watermark) — a naive state machine that
      // processed the click on arrival would have dropped it
      input.addData(EvT(5L, 1L, "view", t0 + 5 * min, 0.0))
      query.processAllAvailable()
      input.addData(EvT(999999L, 9L, "noop", t0 + 10L * 24 * 3600 * 1000, 0.0))
      query.processAllAvailable()
      val stages = spark.table("funnel_late").where(col("user_id") === 5L)
        .collect().map(_.getAs[String]("stage")).sorted
      assert(stages.sameElements(Array("click", "view")), stages.mkString(","))
    } finally query.stop()
  }

  test("streaming live-user window counts are emitted and bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val input = MemoryStream[Ev]
    val query = Sessionize.liveUserCounts(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("live").start()
    try {
      input.addData(events.toIndexedSeq); query.processAllAvailable()
      val sentinelTs = events.map(_.ts_ms).max + 10L * 24 * 3600 * 1000
      input.addData(Ev(999999L, 999999L, sentinelTs, 0.0)); query.processAllAvailable()
      val rows = spark.table("live").collect()
      assert(rows.nonEmpty)
      val nUsers = events.map(_.user_id).distinct.length
      rows.foreach { r =>
        assert(r.getAs[Long]("live_users") >= 0)
        // approx_count_distinct error is far under 2× on this cardinality
        assert(r.getAs[Long]("live_users") <= 2L * nUsers + 1)
      }
    } finally query.stop()
  }

  test("streaming exact dedup keeps the batch survivor set, re-emits past retention") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch corpusWithDups shape: documents ∪ copies of every-7th
    // doc at doc_id + 100000 (Dedup.scala:34), originals arriving
    // before their copies so first-wins == the batch min-id canonical
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
    val copies = base.filter(_._1 % 7 == 0)
      .map { case (id, t) => (id + 100000L, t) }
    val t0 = 1700000000000L
    val originals = base.zipWithIndex
      .map { case ((id, t), i) => DocIn(id, t0 + i * 1000L, t) }
    val dupBatch = copies.zipWithIndex
      .map { case ((id, t), i) => DocIn(id, t0 + (base.length + i) * 1000L, t) }

    val input = MemoryStream[DocIn]
    val query = DedupStream.dedupExact(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      input.addData(originals.toIndexedSeq); query.processAllAvailable()
      input.addData(dupBatch.toIndexedSeq); query.processAllAvailable()
      val streamed = spark.table("dedup").collect()
        .map(_.getAs[Long]("doc_id")).sorted
      val batch = graft.operators.Dedup.dedupApply(spark, sfDir).collect()
        .map(_.getAs[Long]("doc_id")).sorted
      assert(streamed.sameElements(batch),
        s"streamed ${streamed.length} survivors vs batch ${batch.length}")

      // retention caveat is REAL: advance the watermark past the
      // horizon, then replay a duplicate — its state row is gone, so
      // it re-emits (the documented funnel-style tradeoff)
      val farTs = t0 + 10L * 24 * 3600 * 1000
      input.addData(DocIn(999999L, farTs, "watermark sentinel"))
      query.processAllAvailable()
      val replay = DocIn(888888L, farTs + 1000L, base.head._2)
      input.addData(replay); query.processAllAvailable()
      val after = spark.table("dedup").collect().map(_.getAs[Long]("doc_id"))
      assert(after.contains(888888L),
        "a duplicate past the retention horizon must re-emit")
    } finally query.stop()
  }
}
