package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Relational.dec

/** The reference's analytics surface (sessions, contributions,
  * dashboard rollups) re-expressed as Catalyst aggregations over the
  * `events` stream table. The reference computes these with Django
  * ORM count()/filter() chains over Postgres
  * (core/session_utils.py:200-:308, core/supabase_utils.py:315-:359,
  * core/views.py:858); here every stat is a map-side-combinable
  * aggregate so the same query runs over 100 TB of events.
  *
  * "Now" is pinned to max(ts) of the data so results are
  * deterministic (the reference uses wall-clock `datetime.now`).
  */
object Analytics {

  val SessionGapMs = 30L * 60 * 1000   // reference: 30-min activity window

  /** activity_summary's trailing window — the reference's `days=7`
    * API default (core/session_utils.py:268).
    */
  val ActivityDays = 7

  /** count + average value by type — mirror of
    * get_contribution_analytics (core/supabase_utils.py:315): total
    * contributions and average rating, here grouped by event_type.
    */
  def contributionAnalytics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("event_type"))

  /** Top-n by rating — get_top_rated_qa (core/supabase_utils.py:346):
    * `order by rating desc limit n`, with a deterministic id
    * tie-break. Bounded top-k, never a global sort. `n` mirrors the
    * reference's `limit=10` API parameter.
    */
  def topRated(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)

  /** Most-recent-n — get_recent_qa (core/supabase_utils.py:354);
    * `n` mirrors the reference's `limit=10` API parameter.
    */
  def recentN(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts_ms"),
        col("user_id"), col("event_type"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
      .limit(n)

  /** Offset/limit page listing — list_contributions
    * (core/supabase_utils.py:383) `range(start, end)` pagination:
    * 0-based `page` at `pageSize`/page (defaults: page 2 at
    * 20/page, the row the oracle pins). At scale pagination this
    * deep is cheap; deep offsets would use a keyset
    * (`doc_id > last_seen`) instead.
    */
  def paginate(spark: SparkSession, dir: String,
               page: Int = 1, pageSize: Int = 20): DataFrame = {
    // fail here with a clear message, not at Spark analysis time with
    // an opaque negative-offset error; the Long product also keeps
    // page * pageSize from overflowing Int for deep pages
    require(page >= 0 && pageSize > 0,
      s"paginate: page must be >= 0 and pageSize > 0 (got page=$page, pageSize=$pageSize)")
    val skip = page.toLong * pageSize
    // Spark folds offset + limit into one bound downstream, so the
    // guard must leave room for the page itself, not just the skip
    require(skip + pageSize <= Int.MaxValue,
      s"paginate: page $page x pageSize $pageSize overflows the maximum offset")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
      .offset(skip.toInt)
      .limit(pageSize)
  }

  /** Gap-based sessionization of the event stream — the batch twin of
    * the reference's login/logout session tracking
    * (core/session_models.py, is_active + last_activity). One shuffle
    * on user_id; lag + running conditional count assigns session ids.
    */
  def sessionize(spark: SparkSession, dir: String,
                 gapMs: Long = SessionGapMs): DataFrame =
    sessionizeCore(spark, dir, gapMs)
      .orderBy(col("user_id"), col("session_id"))

  /** [[sessionize]] without the presentation sort — the frame
    * corpus-sized consumers ([[sessionCleanupApply]] under
    * `sorted = false`) build on so no range exchange enters their
    * lineage; aggregate consumers destroy ordering anyway.
    */
  private[operators] def sessionizeCore(spark: SparkSession, dir: String,
                                        gapMs: Long): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts_ms"))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byTime))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("session_value"))
  }

  /** total / active / today session counts — get_user_session_stats
    * (core/session_utils.py:215). "Active" = session still inside the
    * 30-min gap at end-of-data; "today" = started on max(ts)'s date.
    */
  def sessionStats(spark: SparkSession, dir: String,
                   gapMs: Long = SessionGapMs): DataFrame = {
    val sess = sessionizeCore(spark, dir, gapMs)
    val nowMs = Tables.events(spark, dir)
      .agg(max(col("ts_ms")).as("now_ms"),
        (max(col("ts_ms")) - max(col("ts_ms")) % (24L * 3600 * 1000)).as("today_ms"))
    sess.crossJoin(nowMs)
      .agg(
        count(lit(1)).as("total_sessions"),
        sum(when(col("end_ms") >= col("now_ms") - gapMs, 1).otherwise(0))
          .as("active_sessions"),
        sum(when(col("start_ms") >= col("today_ms"), 1).otherwise(0))
          .as("today_sessions"))
  }

  /** Retention sweep — cleanup_old_sessions
    * (core/session_utils.py:248): delete INACTIVE sessions (outside
    * the 30-min gap at end-of-data) that ended more than 24 hours
    * before end-of-data — the reference's `is_active='inactive' AND
    * logout_time < cutoff` — via the anti-join retention pattern
    * (same shape as dedup_apply), reporting before / deleted / after
    * counts the way statusTransition reports its flip. At scale the
    * kept frame feeds a partition-overwrite write-back
    * (cf. ChunkIndex.upsert); the counts are the audit trail.
    */
  def sessionCleanup(spark: SparkSession, dir: String,
                     gapMs: Long = SessionGapMs,
                     retentionMs: Long = CleanupRetentionMs): DataFrame = {
    val nowMs = Tables.events(spark, dir).agg(max(col("ts_ms")).as("now_ms"))
    // both reference filters spelled out (is_active='inactive' AND
    // logout_time < cutoff) even though the 24h cutoff subsumes the
    // 30-min inactivity test — if either constant changed they would
    // no longer nest, and the oracle mirrors the pair
    val doomed = col("end_ms") < col("now_ms") - gapMs &&
      col("end_ms") < col("now_ms") - retentionMs
    // the audit COUNT form is ONE aggregate over the sessionized
    // frame (no materialization, no anti-join): deleted is a
    // conditional count and after = before - deleted by construction.
    // The anti-join delete itself lives in [[sessionCleanupApply]],
    // which returns the kept frame a MERGE write-back persists.
    sessionizeCore(spark, dir, gapMs)
      .select(col("end_ms"))
      .crossJoin(broadcast(nowMs))
      .agg(count(lit(1)).as("total_before"),
        count(when(doomed, 1)).as("deleted"),
        (count(lit(1)) - count(when(doomed, 1))).as("total_after"))
  }

  /** [[sessionCleanup]]'s apply form — the retained sessions after
    * the delete: the kept frame is what a partition-overwrite
    * write-back would persist (cf. ChunkIndex.upsert); the COUNT form
    * above is the audit trail over exactly this delete. The delete
    * predicate depends only on the row's own `end_ms` and the
    * broadcast end-of-data timestamp, so the delete is a ROW-LOCAL
    * filter over ONE sessionize pass — dedup_apply's anti-join shape
    * is reserved for deletes whose doomed set has foreign lineage
    * (a second table or a cross-row aggregate); spelling this one as
    * a self-anti-join would compute the sessionize shuffle + window
    * twice and pay an extra join exchange for nothing.
    */
  def sessionCleanupApply(spark: SparkSession, dir: String,
                          gapMs: Long = SessionGapMs,
                          retentionMs: Long = CleanupRetentionMs,
                          sorted: Boolean = true): DataFrame = {
    val nowMs = Tables.events(spark, dir).agg(max(col("ts_ms")).as("now_ms"))
    val doomed = col("end_ms") < col("now_ms") - gapMs &&
      col("end_ms") < col("now_ms") - retentionMs
    Present.presented(
      sessionizeCore(spark, dir, gapMs)
        .crossJoin(broadcast(nowMs))
        .where(!doomed)
        .select(col("user_id"), col("session_id"), col("start_ms"),
          col("end_ms"), col("n_events"), col("session_value")),
      sorted, "user_id", "session_id")
  }

  /** cleanup_old_sessions' 24-hour retention cutoff. */
  val CleanupRetentionMs: Long = 24L * 3600 * 1000

  /** Distinct users active in the trailing 30-min window —
    * get_live_user_count (core/session_utils.py:200).
    */
  def liveUsers(spark: SparkSession, dir: String,
                gapMs: Long = SessionGapMs): DataFrame = {
    val ev = Tables.events(spark, dir)
    val nowMs = ev.agg(max(col("ts_ms")).as("now_ms"))
    ev.select(col("user_id"), col("ts_ms"))
      .crossJoin(nowMs)
      .where(col("ts_ms") >= col("now_ms") - gapMs)
      .agg(countDistinct(col("user_id")).as("live_users"))
  }

  /** Per-user × activity-type counts over the trailing 7 days —
    * get_user_activity_summary (core/session_utils.py:268).
    */
  def activitySummary(spark: SparkSession, dir: String,
                      days: Int = ActivityDays): DataFrame = {
    val ev = Tables.events(spark, dir)
    val nowMs = ev.agg(max(col("ts_ms")).as("now_ms"))
    ev.select(col("user_id"), col("event_type"), col("ts_ms"))
      .crossJoin(nowMs)
      .where(col("ts_ms") >= col("now_ms") - days.toLong * 24 * 3600 * 1000)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Semi-structured props handling: the events table carries a JSON
    * `props` column (the reference stores activity_data as a JSON
    * text column — core/session_models.py `activity_data`,
    * session_utils.py:152 `json.dumps(activity_data)`); extract the
    * typed field and aggregate per event_type. JSON path evaluation
    * is codegen'd (`get_json_object`), no UDF.
    */
  def propsExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("distinct_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Ordered event funnel view→click→purchase: per stage, how many
    * users reached it AFTER completing the previous stage. Three
    * min-aggregations chained by conditional joins — each stage is
    * one shuffle on user_id, no window over the full stream.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"), col("ts_ms"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("v_ms"))
    val clicks = ev.where(col("event_type") === "click")
      .join(views, Seq("user_id"))
      .where(col("ts_ms") > col("v_ms"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("c_ms"))
    val purchases = ev.where(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .where(col("ts_ms") > col("c_ms"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("p_ms"))
    views.agg(count(lit(1)).as("users_view"))
      .crossJoin(clicks.agg(count(lit(1)).as("users_click_after_view")))
      .crossJoin(purchases.agg(count(lit(1)).as("users_purchase_after_click")))
  }

  /** Cohort retention: users grouped by first-active day, retained
    * count per day offset. Two aggregations — distinct (user, day)
    * activity and per-user first day — joined on user; both shuffle
    * once on user_id and the result is O(days²) regardless of event
    * volume.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val dayMs = 24L * 3600 * 1000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), (col("ts_ms") - col("ts_ms") % dayMs).as("day_ms"))
      .distinct()
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day_ms")).as("cohort_ms"))
    val cohortSize = firstDay.groupBy(col("cohort_ms")).agg(count(lit(1)).as("cohort_size"))
    ev.join(firstDay, Seq("user_id"))
      .select(col("cohort_ms"),
        ((col("day_ms") - col("cohort_ms")) / dayMs).cast("long").as("offset_days"))
      .groupBy(col("cohort_ms"), col("offset_days"))
      .agg(count(lit(1)).as("retained"))
      .join(cohortSize, Seq("cohort_ms"))
      .select(col("cohort_ms"), col("offset_days"), col("retained"), col("cohort_size"))
      .orderBy(col("cohort_ms"), col("offset_days"))
  }

  /** Exact interpolated percentiles of event value per type (both
    * engines implement the same R-7 interpolation; parity-rounded).
    * At 100 TB the approx sketch variant (approxLiveUsers pattern)
    * replaces the exact sort.
    */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        graft.functions.Par.round4(expr("percentile(value, 0.5)")).as("p50"),
        graft.functions.Par.round4(expr("percentile(value, 0.9)")).as("p90"),
        graft.functions.Par.round4(expr("percentile(value, 0.99)")).as("p99"))
      .orderBy(col("event_type"))

  /** Sketch percentiles — the 100 TB twin of the exact
    * [[valuePercentiles]]: `percentile_approx` keeps a bounded
    * mergeable sketch per group instead of buffering every value
    * (exact percentile holds the whole group in one aggregation
    * buffer — a single hot event_type at scale would OOM). No DuckDB
    * oracle (sketch implementations differ); AnalyticsSpec bounds the
    * error against the exact operator.
    */
  def approxValuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))
      .orderBy(col("event_type"))

  /** Hierarchical rollup of order revenue: (status, priority) →
    * status subtotal → grand total in one pass (partial-aggregating
    * ROLLUP, no repeated scans).
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(dec(col("o_totalprice"))).cast("double")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** The event-type domain (TESTDATA.md events.event_type). Pivoting
    * against an explicit value list keeps the plan a single-pass
    * conditional aggregate — omitting it makes Spark run an extra
    * collect-distinct job over the whole corpus first, a full scan a
    * 100 TB table cannot afford (and a nondeterministic schema).
    */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user event-type pivot — the wide activity-matrix view of
    * the dashboard's per-category counters (reference:
    * core/views.py dashboard counters per content type). Catalyst
    * rewrites `pivot` over a literal value list into one hash
    * aggregate of `count(CASE WHEN …)` columns: one shuffle on
    * user_id, no per-type scans.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("user_id"))

  /** Sketch-based distinct counting — the 100 TB replacement for the
    * exact countDistinct in liveUsers (HLL++, mergeable partial
    * aggregation). No DuckDB oracle: sketch implementations differ;
    * the spec bounds the error against the exact count instead.
    */
  def approxLiveUsers(spark: SparkSession, dir: String,
                      gapMs: Long = SessionGapMs): DataFrame = {
    val ev = Tables.events(spark, dir)
    val nowMs = ev.agg(max(col("ts_ms")).as("now_ms"))
    ev.select(col("user_id"), col("ts_ms"))
      .crossJoin(nowMs)
      .where(col("ts_ms") >= col("now_ms") - gapMs)
      .agg(approx_count_distinct(col("user_id")).as("approx_live_users"))
  }

  /** Tumbling 1-hour event-time windows per type — the batch twin of
    * the streaming windowed aggregation (window start = ts truncated
    * to the hour; map-side combinable).
    */
  def eventWindows(spark: SparkSession, dir: String): DataFrame = {
    val hourMs = 3600L * 1000
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        (col("ts_ms") - col("ts_ms") % hourMs).as("window_ms"))
      .groupBy(col("window_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("window_ms"), col("event_type"))
  }

  /** Z-score outliers per event_type. Mean and variance come from
    * DECIMAL-exact sum and sum-of-squares (var = (Σx² − (Σx)²/n)/(n−1)
    * on exact inputs), so the scores are engine-deterministic — no
    * Welford-order drift.
    */
  def valueOutliers(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("value"))).cast("double").as("s"),
        sum(dec(col("value") * col("value"), 4)).cast("double").as("ss"))
      .select(col("event_type"), (col("s") / col("n")).as("mean"),
        sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1.0)).as("std"))
    Tables.events(spark, dir)
      .join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("event_id"), col("value"),
        graft.functions.Par.round4((col("value") - col("mean")) / col("std")).as("z"))
      .where(abs(col("z")) > 3.0)
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Bulk status transition — approve_all_pending_contributions
    * (core/supabase_utils.py:368): flip every 'pending' row to
    * 'approved' and report per-status counts before and after. The
    * synthetic status derives deterministically from the doc id; the
    * transition is a pure conditional projection (at scale: the
    * transform feeding a MERGE write-back, cf. Ingest.mergeIncremental).
    */
  def statusTransition(spark: SparkSession, dir: String): DataFrame = {
    val status = when(col("doc_id") % 5 === 0, "pending")
      .when(col("doc_id") % 5 === 1, "rejected")
      .otherwise("approved")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), status.as("status"))
      .withColumn("new_status",
        when(col("status") === "pending", "approved").otherwise(col("status")))
    docs.groupBy(col("status")).agg(count(lit(1)).as("n_before"))
      .join(docs.groupBy(col("new_status").as("status"))
        .agg(count(lit(1)).as("n_after")), Seq("status"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after"))
      .orderBy(col("status"))
  }

  /** One-row corpus + users + orders rollup — admin_dashboard_stats
    * (core/views.py:858) / get_admin_dashboard_stats
    * (core/views.py:1584). Single-pass aggregates per table, joined
    * as one-row frames.
    */
  def dashboardStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val ev = Tables.events(spark, dir)
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
    val ord = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("n_orders"),
        (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_order_value"))
    docs.crossJoin(ev).crossJoin(ord)
  }
}
