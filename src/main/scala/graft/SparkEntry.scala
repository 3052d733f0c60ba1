package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7
  * (build plan). Every implemented operator has a `queries` entry and,
  * where SQL-expressible, a DuckDB `oracleSql` twin with identical
  * column names and deterministic ordering/rounding (SURVEY.md §6).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.E relational core
    "q1_pricing"      -> (Relational.q1Pricing _),
    "q3_revenue_topk" -> (Relational.q3RevenueTopK _),
    "q5_region_join"  -> (Relational.q5RegionJoin _),
    "q_window"        -> (Relational.qWindow _),
    // §2.D analytics
    "contribution_analytics" -> (Analytics.contributionAnalytics _),
    "top_rated"        -> (Analytics.topRated _),
    "recent_n"         -> (Analytics.recentN _),
    "paginate"         -> (Analytics.paginate _),
    "sessionize"       -> (Analytics.sessionize _),
    "session_stats"    -> (Analytics.sessionStats _),
    "live_users"       -> (Analytics.liveUsers _),
    "activity_summary" -> (Analytics.activitySummary _),
    "dashboard_stats"  -> (Analytics.dashboardStats _),
  )

  private val sessionizeSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL OR ts_ms - lag(ts_ms) OVER w > 1800000
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |), sess AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |), per_session AS (
      |  SELECT user_id, session_id, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
      |    COUNT(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |  FROM sess GROUP BY user_id, session_id
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_revenue_topk" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  epoch_ms(o_orderdate) AS o_orderdate_ms
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey JOIN customer ON o_custkey=c_custkey
        |WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1996-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey JOIN customer ON o_custkey=c_custkey
        |  JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        |  JOIN nation ON s_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window" ->
      """SELECT user_id, event_id, rk, run_sum, ts_ms FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk,
        |    round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS run_sum,
        |    epoch_ms(ts) AS ts_ms
        |  FROM events) t WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin,
    "contribution_analytics" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "top_rated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "recent_n" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type FROM events
        |ORDER BY ts_ms DESC, event_id DESC LIMIT 10""".stripMargin,
    "paginate" ->
      """SELECT doc_id, source, n_chars FROM documents
        |ORDER BY doc_id LIMIT 20 OFFSET 20""".stripMargin,
    "sessionize" -> (sessionizeSql +
      """
        |SELECT user_id, session_id, start_ms, end_ms, n_events, session_value
        |FROM per_session ORDER BY user_id, session_id""".stripMargin),
    "session_stats" -> (sessionizeSql +
      """,
        |now_t AS (SELECT MAX(epoch_ms(ts)) AS now_ms,
        |  MAX(epoch_ms(ts)) - MAX(epoch_ms(ts)) % 86400000 AS today_ms FROM events)
        |SELECT COUNT(*) AS total_sessions,
        |  CAST(SUM(CASE WHEN end_ms >= now_ms - 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS active_sessions,
        |  CAST(SUM(CASE WHEN start_ms >= today_ms THEN 1 ELSE 0 END) AS BIGINT) AS today_sessions
        |FROM per_session, now_t""".stripMargin),
    "live_users" ->
      """SELECT COUNT(DISTINCT user_id) AS live_users
        |FROM events, (SELECT MAX(epoch_ms(ts)) AS now_ms FROM events) n
        |WHERE epoch_ms(ts) >= now_ms - 1800000""".stripMargin,
    "activity_summary" ->
      """SELECT user_id, event_type, COUNT(*) AS n
        |FROM events, (SELECT MAX(epoch_ms(ts)) AS now_ms FROM events) n
        |WHERE epoch_ms(ts) >= now_ms - 604800000
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "dashboard_stats" ->
      """SELECT d.n_docs, d.total_chars, e.n_users, e.n_events, o.n_orders, o.avg_order_value
        |FROM (SELECT COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents) d,
        |     (SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events FROM events) e,
        |     (SELECT COUNT(*) AS n_orders,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_order_value
        |      FROM orders) o""".stripMargin,
  )
}
