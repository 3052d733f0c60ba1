package graft

import graft.operators.Analytics
import graft.sources.Tables

class AnalyticsSpec extends SparkSpec {

  test("pivot_events: one row per user, counts tie out to the event total") {
    val piv = Analytics.pivotEvents(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
    assert(piv.length == ev.select("user_id").distinct().count())
    val typeCols = Analytics.EventTypes.map(t => s"n_$t")
    val pivTotal = piv.map(r => typeCols.map(r.getAs[Long](_)).sum).sum
    assert(pivTotal == ev.count())
    // the plan is one conditional aggregate, not a scan per type
    val plan = Analytics.pivotEvents(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan)
  }

  test("sessionize covers every event exactly once with 30-min gaps") {
    val sess = Analytics.sessionize(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(sess.map(_.getAs[Long]("n_events")).sum == nEvents)
    sess.foreach { r =>
      assert(r.getAs[Long]("start_ms") <= r.getAs[Long]("end_ms"))
    }
    // sessions of one user must be separated by > 30 min
    sess.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_ms") - a.getAs[Long]("end_ms") > 30 * 60 * 1000L)
        case _ =>
      }
    }
  }

  test("session_stats counts are consistent with sessionize") {
    val stats = Analytics.sessionStats(spark, sfDir).collect().head
    val total = Analytics.sessionize(spark, sfDir).count()
    assert(stats.getAs[Long]("total_sessions") == total)
    assert(stats.getAs[Long]("active_sessions") <= total)
    assert(stats.getAs[Long]("today_sessions") <= total)
  }

  test("live_users is bounded by distinct users") {
    val live = Analytics.liveUsers(spark, sfDir).collect().head.getAs[Long]("live_users")
    val all = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(live >= 0 && live <= all)
  }

  test("contribution_analytics aggregates whole table") {
    val rows = Analytics.contributionAnalytics(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("avg_value") * r.getAs[Long]("n")
        - r.getAs[Double]("total_value")) < 1e-6)
    }
  }

  test("top_rated is sorted desc with id tie-break; paginate is stable") {
    val tr = Analytics.topRated(spark, sfDir).collect()
    assert(tr.length == 10)
    val prices = tr.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
    val p1 = Analytics.paginate(spark, sfDir).collect().map(_.getAs[Long]("doc_id"))
    val p2 = Analytics.paginate(spark, sfDir).collect().map(_.getAs[Long]("doc_id"))
    assert(p1.sameElements(p2) && p1.length == 20)
    assert(p1.head == 20)   // page 2 of doc_id-ordered listing
  }

  test("dashboard_stats single row with positive counts") {
    val r = Analytics.dashboardStats(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_docs") > 0 && r.getAs[Long]("n_events") > 0
      && r.getAs[Long]("n_orders") > 0 && r.getAs[Double]("avg_order_value") > 0)
  }

  test("approx_value_percentiles honors the sketch's RANK guarantee") {
    // percentile_approx bounds rank error (not value error — in a
    // sparse tail the nearest actual value can sit far from the
    // interpolated exact quantile), so assert the rank of each
    // returned value is within ~1% of the requested quantile
    val values = graft.sources.Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Double]("value")).sorted).toMap
    val approx = Analytics.approxValuePercentiles(spark, sfDir).collect()
    assert(approx.map(_.getAs[String]("event_type")).toSet == values.keySet)
    approx.foreach { r =>
      val vs = values(r.getAs[String]("event_type"))
      def rankOf(x: Double): Double = vs.count(_ <= x).toDouble / vs.length
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (c, q) =>
        val rk = rankOf(r.getAs[Double](c))
        // sketch rank error + the discreteness of small per-type groups
        assert(math.abs(rk - q) <= 0.02, s"$c rank $rk too far from $q")
      }
    }
  }
}
