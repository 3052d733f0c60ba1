package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Point-in-interval (range) join — the other join Spark lacks
  * natively (AsOf.scala covers most-recent-at-or-before). A naive
  * `points.join(intervals, ts between (start, end))` has no equi
  * key, so Catalyst plans BroadcastNestedLoopJoin: O(|P|·|I|)
  * comparisons and a broadcast of a whole side — a scale killer the
  * moment neither side is tiny.
  *
  * Bucketed formulation instead: pick a bucket width W, explode each
  * interval to every W-bucket it overlaps, tag each point with its
  * single bucket, equi-join on the bucket, then re-check exact
  * containment. Each qualifying (point, interval) pair meets in
  * exactly one bucket — the point's — so no post-join dedup is
  * needed. Cost is one shuffle on the bucket key (AQE splits hot
  * buckets) plus interval replication of ceil(len/W)+1 rows; choose
  * W near the median interval length so replication stays O(1) per
  * interval. This is the interval-join strategy Flink's SQL interval
  * join and DuckDB's IEJoin papers build on, expressed as a plain
  * Catalyst-optimizable equi-join.
  *
  * Reference behavior anchored: active-session containment checks
  * (reference: core/session_utils.py:215 get_user_session_stats
  * counts sessions whose activity window covers "now") generalized
  * to a full point-in-interval join.
  */
object RangeJoin {

  /** floor(x / w) in exact long arithmetic: `pmod` turns truncating
    * division into a floor (pre-epoch timestamps), and the divide is
    * Catalyst's integral `div` — Column `/` would go through double
    * and mis-bucket |x| beyond 2^53.
    */
  private def bucketOf(x: Column, w: Long): Column = {
    import org.apache.spark.sql.graftBridge.{columnOf, expressionOf}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    columnOf(IntegralDivide(
      expressionOf((x - pmod(x, lit(w))).cast("long")),
      expressionOf(lit(w))))
  }

  /** Shared input validation: positive width, disjoint column names,
    * no reserved column on either side.
    */
  private def validateInputs(left: DataFrame, right: DataFrame,
      bucketWidth: Long): Unit = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = right.columns.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"join side column names collide: ${clash.mkString(", ")}")
    val reserved = Seq("_bucket").filter(c =>
      left.columns.contains(c) || right.columns.contains(c))
    require(reserved.isEmpty,
      s"inputs already carry reserved column(s): ${reserved.mkString(", ")}")
  }

  /** Inner point-in-interval join: every (point, interval) pair with
    * `startCol <= ptTs <= endCol`. Column names of the two inputs
    * must be disjoint; the output carries all columns of both sides.
    *
    * `bucketWidth` is in the units of the three columns (epoch ms
    * here). An interval spanning many buckets replicates into each —
    * size W near the median interval length so replication stays
    * O(1) per interval. A pathological interval/W ratio surfaces as
    * visible row growth (and a loud Spark array-size error past ~2³¹
    * buckets for a single interval) — never silent truncation.
    */
  def joinPointInInterval(points: DataFrame, ptTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    validateInputs(points, intervals, bucketWidth)
    val pB = points.withColumn("_bucket", bucketOf(col(ptTs), bucketWidth))
    val iB = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(col(startCol), bucketWidth),
        bucketOf(col(endCol), bucketWidth))))
    pB.join(iB, "_bucket")
      .where(col(ptTs) >= col(startCol) && col(ptTs) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval-overlap join: every (a, b) pair with
    * `[aStart,aEnd] ∩ [bStart,bEnd] ≠ ∅`, each pair exactly once; an
    * inverted (start > end) interval is empty and matches nothing.
    * Both sides explode to their overlapped buckets and equi-join on
    * the bucket; a pair meets in every shared bucket, so it is
    * emitted only in the FIRST one — the bucket of
    * `max(aStart, bStart)`, which both intervals contain whenever
    * they overlap. Same scale shape as [[joinPointInInterval]]: one
    * shuffle on the bucket key, replication ∝ span/W per interval,
    * no BroadcastNestedLoopJoin, no post-join dedup pass.
    */
  def joinIntervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String, bucketWidth: Long): DataFrame = {
    validateInputs(a, b, bucketWidth)
    // an inverted (start > end) interval is EMPTY — it matches
    // nothing, same as joinPointInInterval's unsatisfiable predicate.
    // Without the filter, sequence() counts DOWN for it and the
    // overlap test can still pass, emitting pairs for ∅ ∩ [s,e].
    val aB = a.where(col(aStart) <= col(aEnd)).withColumn("_bucket",
      explode(sequence(bucketOf(col(aStart), bucketWidth),
        bucketOf(col(aEnd), bucketWidth))))
    val bB = b.where(col(bStart) <= col(bEnd)).withColumn("_bucket",
      explode(sequence(bucketOf(col(bStart), bucketWidth),
        bucketOf(col(bEnd), bucketWidth))))
    aB.join(bB, "_bucket")
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("_bucket") === bucketOf(greatest(col(aStart), col(bStart)), bucketWidth))
      .drop("_bucket")
  }

  /** Query-level demo: for every purchase event, how many sessions
    * (across ALL users) were active at that instant. Sessions come
    * from the gap-based sessionizer (Analytics.sessionize); the
    * bucket width is the session gap — a session's window can exceed
    * it, but most spans stay within a few buckets.
    */
  def rangeActiveSessions(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_ms"))
    val sessions = Analytics.sessionize(spark, dir)
      .select(col("start_ms"), col("end_ms"))
    val counts = joinPointInInterval(purchases, "ts_ms",
        sessions, "start_ms", "end_ms", Analytics.SessionGapMs)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_active"))
    purchases.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("ts_ms"),
        coalesce(col("n_active"), lit(0L)).as("n_active"))
      .orderBy(col("event_id"))
  }

  /** Query-level demo of the overlap join: for every session, how
    * many OTHER users' sessions overlap it in time — the concurrency
    * profile of the workload (reference: the active-session counters
    * in core/session_utils.py generalize from "overlaps now" to
    * "overlaps each session").
    */
  def sessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    // the sessionize subtree feeds three plan branches (both overlap
    // sides + the zero-restoring left join); localCheckpoint
    // materializes it once instead of re-aggregating per branch
    val sess = Analytics.sessionize(spark, dir)
      .select(col("user_id"), col("session_id"),
        col("start_ms"), col("end_ms"))
      .localCheckpoint()
    val other = sess.select(col("user_id").as("o_user_id"),
      col("start_ms").as("o_start_ms"), col("end_ms").as("o_end_ms"))
    val overlaps = joinIntervalOverlap(sess, "start_ms", "end_ms",
        other, "o_start_ms", "o_end_ms", Analytics.SessionGapMs)
      .where(col("user_id") =!= col("o_user_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_overlap"))
    sess.join(overlaps, Seq("user_id", "session_id"), "left")
      .select(col("user_id"), col("session_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
