package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Distributed order-statistics lookup: for each row of `points`,
    * the number of `values` rows whose `valCol` is ≤ `ptCol` (or
    * strictly <, with `strict = true`) — the rank of the point in the
    * sorted value multiset. Output = `points` plus `outCol: long`.
    *
    * This is the scale-safe primitive behind COUNTING range-join
    * semantics: "how many intervals overlap X" is a difference of two
    * rank lookups (|starts ≤ X.end| − |ends < X.start|), computed
    * with ZERO pair materialization — where a pair-enumerating join's
    * intermediate is inherently quadratic in concurrency (k live
    * intervals ⇒ k²/2 join rows before the aggregate, however well
    * bucketed), this is O(n log n) total.
    *
    * Shape: both sides union into one (time, Δ) stream (values carry
    * Δ=1, points Δ=0; a tie column makes equal-time ordering encode
    * ≤ vs <), then a two-level cumulative sum — per-time-bucket
    * totals, a prefix sum over the (small, ≈ time-span/bucketWidth-
    * row) bucket-total table, broadcast back, and a window cumsum
    * WITHIN each bucket. Every per-row pass partitions on the bucket
    * key; the only unpartitioned window is over bucket totals, whose
    * cardinality is independent of row count. A hot instant with k
    * concurrent rows costs one k-row sorted partition, not k² pairs.
    *
    * With `keys` non-empty the count is per key group (values must
    * carry the key columns too) and the window partitions on the keys
    * directly — no bucketing; use for per-entity corrections where
    * group sizes are bounded (e.g. one user's sessions).
    *
    * Both columns must be integral (the stream sorts on the exact
    * long value — a silent fractional cast would corrupt the ≤/<
    * boundary). Values with NULL `valCol` are ignored; a NULL `ptCol`
    * counts 0.
    */
  def countUnder(points: DataFrame, ptCol: String,
      values: DataFrame, valCol: String, strict: Boolean,
      bucketWidth: Long, outCol: String, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!points.columns.contains(outCol),
      s"points already carries output column `$outCol`")
    val reserved = Seq("_t", "_delta", "_tie", "_bucket", "_cnt", "_prefix")
    require(!reserved.contains(outCol),
      s"output column `$outCol` is a reserved scratch name")
    val clash = reserved.filter(points.columns.contains)
    require(clash.isEmpty,
      s"points carries reserved column(s): ${clash.mkString(", ")}")
    require(keys.forall(values.columns.contains),
      s"values must carry key columns ${keys.mkString(", ")}")
    require(keys.forall(points.columns.contains),
      s"points must carry key columns ${keys.mkString(", ")}")
    def integral(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.LongType | _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType | _: org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    require(integral(points, ptCol) && integral(values, valCol),
      s"countUnder needs integral columns; got ${points.schema(ptCol).dataType} / " +
        s"${values.schema(valCol).dataType}")
    // equal-time ordering encodes the comparison: non-strict (≤) puts
    // values BEFORE points at the same t (equal values count); strict
    // (<) puts points first (equal values don't)
    val (vTie, pTie) = if (strict) (1, 0) else (0, 1)
    val ptCols = points.columns.toSeq
    val vSide = values.where(col(valCol).isNotNull).select(
      col(valCol).cast("long").as("_t") +: lit(1L).as("_delta") +:
        lit(vTie).as("_tie") +:
        (ptCols.filterNot(keys.contains).map(c =>
          lit(null).cast(points.schema(c).dataType).as(c)) ++ keys.map(col)): _*)
    val pSide = points.select(
      col(ptCol).cast("long").as("_t") +: lit(0L).as("_delta") +:
        lit(pTie).as("_tie") +: ptCols.map(col): _*)
    val u = vSide.unionByName(pSide)
    bucketedCumsum(u, keys, bucketWidth, outCol)
      .where(col("_delta") === 0L)
      .select(ptCols.map(col) :+ col(outCol).cast("long").as(outCol): _*)
  }

  /** The cumulative-sum engine shared by [[countUnder]] and
    * [[countActive]]: running Σ `_delta` over the union stream sorted
    * by (`_t`, `_tie`). The cumsum at a point row is invariant to
    * ordering among rows with equal (_t, _tie) — each tie class
    * carries one Δ value and point rows carry Δ=0 — so no further
    * tie-break column is needed for determinism.
    */
  private def bucketedCumsum(u: DataFrame, keys: Seq[String],
      bucketWidth: Long, outCol: String): DataFrame =
    if (keys.nonEmpty) {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("_t"), col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn(outCol, sum(col("_delta")).over(w))
    } else {
      val ub = u.withColumn("_bucket", bucketOf(col("_t"), bucketWidth))
      val totals = ub.groupBy(col("_bucket")).agg(sum(col("_delta")).as("_cnt"))
      // the bucket-total table has min(n, time-span/bucketWidth)
      // rows — size bucketWidth so span/width stays modest (the
      // table passes through one single-partition prefix window and
      // joins back on _bucket; AQE broadcasts it when small)
      val wPre = Window.orderBy(col("_bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prefix = totals
        .withColumn("_prefix", sum(col("_cnt")).over(wPre) - col("_cnt"))
        .select(col("_bucket"), col("_prefix"))
      val wIn = Window.partitionBy(col("_bucket"))
        .orderBy(col("_t"), col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // LEFT join: a NULL-_t point row has a NULL bucket, which an
      // inner join would silently drop — it must survive with
      // count 0 (the NULL-bucket window partition holds only Δ=0
      // point rows, so the cumsum is 0 there)
      ub.join(prefix, Seq("_bucket"), "left")
        .withColumn(outCol,
          coalesce(col("_prefix"), lit(0L)) + sum(col("_delta")).over(wIn))
        .drop("_bucket", "_prefix")
    }

  /** "How many intervals are active at each point" in ONE pass:
    * |starts ≤ t| − |ends < t| collapses to a single sweep where a
    * start contributes Δ=+1, an end Δ=−1, and the tie order at equal
    * time is starts (0) → points (1) → ends (2) — a same-instant
    * start counts (≤), a same-instant end doesn't yet subtract (<),
    * so the running sum AT the point row IS the active count. Same
    * two-level bucketed cumsum as [[countUnder]], but one union and
    * one shuffle instead of two chained passes over the same stream
    * (the r8 plan's measured constant overhead).
    *
    * Same column discipline as [[countUnder]]: integral columns,
    * NULL interval bounds ignored, NULL points count 0; inverted
    * (start > end) intervals must be pre-filtered by the caller if
    * they can occur (a start with no matching end would leak +1 into
    * every later count).
    */
  def countActive(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, outCol: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!points.columns.contains(outCol),
      s"points already carries output column `$outCol`")
    val reserved = Seq("_t", "_delta", "_tie", "_bucket", "_cnt", "_prefix")
    require(!reserved.contains(outCol),
      s"output column `$outCol` is a reserved scratch name")
    val clash = reserved.filter(points.columns.contains)
    require(clash.isEmpty,
      s"points carries reserved column(s): ${clash.mkString(", ")}")
    def integral(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.LongType | _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType | _: org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    require(integral(points, ptCol) && integral(intervals, startCol) &&
      integral(intervals, endCol),
      s"countActive needs integral columns; got ${points.schema(ptCol).dataType} / " +
        s"${intervals.schema(startCol).dataType} / ${intervals.schema(endCol).dataType}")
    val ptCols = points.columns.toSeq
    def side(c: String, delta: Long, tie: Int): DataFrame =
      intervals.where(col(startCol).isNotNull && col(endCol).isNotNull).select(
        col(c).cast("long").as("_t") +: lit(delta).as("_delta") +:
          lit(tie).as("_tie") +:
          ptCols.map(pc => lit(null).cast(points.schema(pc).dataType).as(pc)): _*)
    val pSide = points.select(
      col(ptCol).cast("long").as("_t") +: lit(0L).as("_delta") +:
        lit(1).as("_tie") +: ptCols.map(col): _*)
    val u = side(startCol, 1L, 0).unionByName(side(endCol, -1L, 2)).unionByName(pSide)
    bucketedCumsum(u, Nil, bucketWidth, outCol)
      .where(col("_tie") === 1)
      .select(ptCols.map(col) :+ col(outCol).cast("long").as(outCol): _*)
  }

  /** Query-level demo: for every purchase event, how many sessions
    * (across ALL users) were active at that instant. Sessions come
    * from the gap-based sessionizer (Analytics.sessionize); the
    * bucket width is the session gap — a session's window can exceed
    * it, but most spans stay within a few buckets.
    */
  def rangeActiveSessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Analytics.SessionGapMs
    val purchases = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_ms"))
    // "sessions active at t" is a rank difference — |starts ≤ t| −
    // |ends < t| — collapsed into ONE sweep by countActive (+1 at
    // each start, −1 after each end): one union, one shuffle, no
    // (purchase × concurrent-session) pair materialization at all;
    // joinPointInInterval stays the operator for pair-OUTPUT joins
    // sessionizeCore, NOT sessionize: the presentation range-sort
    // would cost a global exchange + sampling job only for this
    // checkpoint to discard the order (r17, guide §2.4 — an orderBy
    // used only to make output deterministic is an accidental shuffle)
    val sess = Analytics.sessionizeCore(spark, dir, w)
      .select(col("start_ms"), col("end_ms"))
      .localCheckpoint()   // feeds the start and end value sides
    countActive(purchases, "ts_ms", sess, "start_ms", "end_ms", w, "n_active")
      .select(col("event_id"), col("ts_ms"), col("n_active"))
      .orderBy(col("event_id"))
  }

  /** Query-level demo of the overlap join: for every session, how
    * many OTHER users' sessions overlap it in time — the concurrency
    * profile of the workload (reference: the active-session counters
    * in core/session_utils.py generalize from "overlaps now" to
    * "overlaps each session").
    */
  def sessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    // Counting semantics ⇒ rank-based, NOT pair enumeration: a hot
    // window with k concurrent sessions costs the overlap JOIN k²/2
    // intermediate rows however well-bucketed, while the count is a
    // difference of order statistics —
    //   overlaps(i) = |{j : start_j ≤ end_i}| − |{j : end_j < start_i}| − 1
    // (self), minus the same formula restricted to i's own user
    // (other-user semantics). Four countUnder passes, O(n log n)
    // total, zero pair materialization; joinIntervalOverlap remains
    // for genuine pair-output joins (spec-proven ≡ cross-join).
    val w = Analytics.SessionGapMs
    // the sessionize subtree feeds the point chain + four value
    // sides; localCheckpoint materializes it once
    // sessionizeCore: same no-presentation-sort argument as
    // rangeActiveSessions above (the checkpoint discards order)
    val sess = Analytics.sessionizeCore(spark, dir, w)
      .select(col("user_id"), col("session_id"),
        col("start_ms"), col("end_ms"))
      .localCheckpoint()
    val withAllLe = countUnder(sess, "end_ms",
      sess.select(col("start_ms").as("_v")), "_v",
      strict = false, w, "_all_le")
    val withAllLt = countUnder(withAllLe, "start_ms",
      sess.select(col("end_ms").as("_v")), "_v",
      strict = true, w, "_all_lt")
    val withUsrLe = countUnder(withAllLt, "end_ms",
      sess.select(col("user_id"), col("start_ms").as("_v")), "_v",
      strict = false, w, "_usr_le", keys = Seq("user_id"))
    val withUsrLt = countUnder(withUsrLe, "start_ms",
      sess.select(col("user_id"), col("end_ms").as("_v")), "_v",
      strict = true, w, "_usr_lt", keys = Seq("user_id"))
    // (all − self) − (same-user − self) = all − same-user, so the
    // two −1 self terms cancel
    withUsrLt.select(col("user_id"), col("session_id"),
        (col("_all_le") - col("_all_lt") - col("_usr_le") + col("_usr_lt"))
          .as("n_overlap"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
