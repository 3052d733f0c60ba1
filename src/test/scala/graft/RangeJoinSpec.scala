package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed point-in-interval join ≡ the naive cross-join filter, on
  * hand-picked edges and on seeded random data across bucket widths
  * (boundary inclusion, interval spanning many buckets, empty match).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)], ivals: Seq[(Long, Long, Long)]) =
    (for {
      (pid, ts) <- points
      (iid, s, e) <- ivals
      if ts >= s && ts <= e
    } yield (pid, iid)).sorted

  private def bucketed(points: Seq[(Long, Long)], ivals: Seq[(Long, Long, Long)], w: Long) = {
    val p = points.toDF("p_id", "ts")
    val i = ivals.toDF("i_id", "s", "e")
    RangeJoin.joinPointInInterval(p, "ts", i, "s", "e", w)
      .select($"p_id", $"i_id").as[(Long, Long)].collect().toSeq.sorted
  }

  test("edges: boundary inclusion, multi-bucket span, no match") {
    val points = Seq((1L, 0L), (2L, 5L), (3L, 10L), (4L, 15L), (5L, 100L))
    val ivals = Seq((10L, 0L, 10L), (20L, 7L, 20L), (30L, 50L, 60L), (40L, 10L, 10L))
    for (w <- Seq(1L, 3L, 4L, 100L))
      assert(bucketed(points, ivals, w) == naive(points, ivals), s"w=$w")
  }

  test("seeded random agrees with the cross-join oracle") {
    val rnd = new scala.util.Random(42)
    val points = (1L to 300L).map(id => (id, rnd.nextLong(1000)))
    val ivals = (1L to 120L).map { id =>
      val s = rnd.nextLong(1000); (id, s, s + rnd.nextLong(80))
    }
    for (w <- Seq(7L, 64L, 500L))
      assert(bucketed(points, ivals, w) == naive(points, ivals), s"w=$w")
  }

  test("interval overlap: bucketed == cross-join oracle, each pair exactly once") {
    val rnd = new scala.util.Random(11)
    val as = (1L to 150L).map { id => val s = rnd.nextLong(800); (id, s, s + rnd.nextLong(120)) }
    val bs = (1L to 150L).map { id => val s = rnd.nextLong(800); (id, s, s + rnd.nextLong(120)) }
    val naive = (for {
      (ai, as1, ae) <- as
      (bi, bs1, be) <- bs
      if as1 <= be && bs1 <= ae
    } yield (ai, bi)).sorted
    for (w <- Seq(5L, 64L, 1000L)) {
      val got = graft.operators.RangeJoin.joinIntervalOverlap(
          as.toDF("a_id", "a_s", "a_e"), "a_s", "a_e",
          bs.toDF("b_id", "b_s", "b_e"), "b_s", "b_e", w)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == naive, s"w=$w: got ${got.length} pairs vs ${naive.length}")
    }
  }

  test("interval overlap: inverted intervals are empty; guards are loud") {
    val a = Seq((1L, 10L, 2L), (2L, 1L, 5L)).toDF("a_id", "a_s", "a_e")  // 1 = inverted
    val b = Seq((1L, 1L, 20L)).toDF("b_id", "b_s", "b_e")
    val got = graft.operators.RangeJoin.joinIntervalOverlap(
        a, "a_s", "a_e", b, "b_s", "b_e", 4L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L)), s"inverted interval matched: $got")
    intercept[IllegalArgumentException] {   // column clash
      graft.operators.RangeJoin.joinIntervalOverlap(
        a, "a_s", "a_e", b.withColumnRenamed("b_id", "a_id"), "b_s", "b_e", 4L)
    }
    intercept[IllegalArgumentException] {   // bad width
      graft.operators.RangeJoin.joinIntervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 0L)
    }
  }

  test("overlap counting on a hand-built fixture (catches double-count/self-pair bugs)") {
    // user 1: s1=[0,10], s2=[100,110]; user 2: s3=[5,8], s4=[9,12]
    // cross-user overlaps: (s1,s3), (s1,s4) — each counted once per side
    val sess = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 100L, 110L),
      (2L, 1L, 5L, 8L), (2L, 2L, 9L, 12L)).toDF("user_id", "session_id", "start_ms", "end_ms")
    val other = sess.select($"user_id".as("o_user_id"),
      $"start_ms".as("o_s"), $"end_ms".as("o_e"))
    val counts = graft.operators.RangeJoin.joinIntervalOverlap(
        sess, "start_ms", "end_ms", other, "o_s", "o_e", 4L)
      .where($"user_id" =!= $"o_user_id")
      .groupBy($"user_id", $"session_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(counts == Map((1L, 1L) -> 2L, (2L, 1L) -> 1L, (2L, 2L) -> 1L), counts.toString)
  }

  test("countUnder agrees with the naive rank on seeded random data") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 200L).map(id => (id, rnd.nextLong(500)))
    val vals = (1 to 300).map(_ => rnd.nextLong(500))
    val p = pts.toDF("p_id", "t")
    val v = vals.toDF("_v")
    for (w <- Seq(3L, 50L, 1000L); strict <- Seq(false, true)) {
      val got = RangeJoin.countUnder(p, "t", v, "_v", strict, w, "n")
        .select($"p_id", $"n").as[(Long, Long)].collect().toMap
      pts.foreach { case (id, t) =>
        val want = vals.count(x => if (strict) x < t else x <= t).toLong
        assert(got(id) == want, s"w=$w strict=$strict p=$id t=$t")
      }
    }
  }

  test("countActive agrees with naive interval containment on seeded random data") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 200L).map(id => (id, rnd.nextLong(500)))
    val ivs = (1 to 300).map { _ =>
      val s = rnd.nextLong(500); (s, s + rnd.nextLong(30))
    }
    val p = pts.toDF("p_id", "t")
    val i = ivs.toDF("s", "e")
    for (w <- Seq(3L, 50L, 1000L)) {
      val got = RangeJoin.countActive(p, "t", i, "s", "e", w, "n")
        .select($"p_id", $"n").as[(Long, Long)].collect().toMap
      pts.foreach { case (id, t) =>
        val want = ivs.count { case (s, e) => s <= t && t <= e }.toLong
        assert(got(id) == want, s"w=$w p=$id t=$t")
      }
    }
    // guards mirror countUnder's
    intercept[IllegalArgumentException] {
      RangeJoin.countActive(p, "t", i, "s", "e", 0L, "n")
    }
    intercept[IllegalArgumentException] {
      RangeJoin.countActive(p, "t", i, "s", "e", 4L, "t")
    }
    intercept[IllegalArgumentException] {
      RangeJoin.countActive(p, "t", i, "s", "e", 4L, "_tie")
    }
  }

  test("countUnder keyed mode counts within the key group only") {
    val pts = Seq((1L, 10L), (1L, 3L), (2L, 10L)).toDF("k", "t")
    val vals = Seq((1L, 3L), (1L, 5L), (2L, 1L)).toDF("k", "_v")
    val got = RangeJoin.countUnder(pts, "t", vals, "_v",
        strict = false, 4L, "n", keys = Seq("k"))
      .select($"k", $"t", $"n").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 2L), (1L, 3L, 1L), (2L, 10L, 1L)), got.toString)
    val strictGot = RangeJoin.countUnder(pts, "t", vals, "_v",
        strict = true, 4L, "n", keys = Seq("k"))
      .select($"k", $"t", $"n").as[(Long, Long, Long)].collect().toSet
    assert(strictGot == Set((1L, 10L, 2L), (1L, 3L, 0L), (2L, 10L, 1L)), strictGot.toString)
  }

  test("countUnder guards: reserved/output column clash is loud; null values ignored") {
    val p = Seq((1L, 2L)).toDF("p_id", "t")
    val v = Seq(1L).toDF("_v")
    intercept[IllegalArgumentException] {
      RangeJoin.countUnder(p.withColumn("_tie", lit(1)), "t", v, "_v", false, 4L, "n")
    }
    intercept[IllegalArgumentException] {
      RangeJoin.countUnder(p, "t", v, "_v", false, 4L, "t")   // outCol collides
    }
    intercept[IllegalArgumentException] {
      RangeJoin.countUnder(p, "t", v, "_v", false, 0L, "n")   // bad width
    }
    val withNulls = Seq(Some(1L), None, Some(3L)).toDF("_v")
    val got = RangeJoin.countUnder(p, "t", withNulls, "_v", false, 4L, "n")
      .select($"n").as[Long].head()
    assert(got == 1L)
    intercept[IllegalArgumentException] {   // reserved output name
      RangeJoin.countUnder(p, "t", v, "_v", false, 4L, "_delta")
    }
    intercept[IllegalArgumentException] {   // fractional column type
      RangeJoin.countUnder(p, "t", Seq(1.5).toDF("_v"), "_v", false, 4L, "n")
    }
    // a NULL point survives with count 0 in BOTH modes (the bucketed
    // path must not inner-join it away on its NULL bucket)
    val nullPt = Seq((1L, Some(2L)), (2L, None)).toDF("p_id", "t")
    val gotNull = RangeJoin.countUnder(nullPt, "t", v, "_v", false, 4L, "n")
      .select($"p_id", $"n").as[(Long, Long)].collect().toMap
    assert(gotNull == Map(1L -> 1L, 2L -> 0L), gotNull.toString)
  }

  test("rank-based session_overlap == pair-enumeration overlap join on the fixture") {
    // same fixture as the overlap-counting test: the rank formula
    // must reproduce the pair join's counts exactly, zeros included
    val sess = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 100L, 110L),
      (2L, 1L, 5L, 8L), (2L, 2L, 9L, 12L)).toDF("user_id", "session_id", "start_ms", "end_ms")
    val withAllLe = RangeJoin.countUnder(sess, "end_ms",
      sess.select($"start_ms".as("_v")), "_v", strict = false, 4L, "_all_le")
    val withAllLt = RangeJoin.countUnder(withAllLe, "start_ms",
      sess.select($"end_ms".as("_v")), "_v", strict = true, 4L, "_all_lt")
    val withUsrLe = RangeJoin.countUnder(withAllLt, "end_ms",
      sess.select($"user_id", $"start_ms".as("_v")), "_v",
      strict = false, 4L, "_usr_le", keys = Seq("user_id"))
    val withUsrLt = RangeJoin.countUnder(withUsrLe, "start_ms",
      sess.select($"user_id", $"end_ms".as("_v")), "_v",
      strict = true, 4L, "_usr_lt", keys = Seq("user_id"))
    val got = withUsrLt
      .select($"user_id", $"session_id",
        ($"_all_le" - $"_all_lt" - $"_usr_le" + $"_usr_lt").as("n"))
      .as[(Long, Long, Long)].collect().map { case (u, s, n) => (u, s) -> n }.toMap
    assert(got == Map((1L, 1L) -> 2L, (1L, 2L) -> 0L, (2L, 1L) -> 1L, (2L, 2L) -> 1L),
      got.toString)
  }

  test("rank-based queries == pair-enumeration formulation at sf (cross-impl parity)") {
    // independent pair-join spelling of both queries, built from the
    // operators the rank versions replaced
    val sess = operators.Analytics.sessionize(spark, sfDir)
      .select($"user_id", $"session_id", $"start_ms", $"end_ms")
      .localCheckpoint()
    val other = sess.select($"user_id".as("o_user_id"),
      $"start_ms".as("o_start_ms"), $"end_ms".as("o_end_ms"))
    val pairCounts = RangeJoin.joinIntervalOverlap(sess, "start_ms", "end_ms",
        other, "o_start_ms", "o_end_ms", operators.Analytics.SessionGapMs)
      .where($"user_id" =!= $"o_user_id")
      .groupBy($"user_id", $"session_id").agg(count(lit(1)).as("n_overlap"))
    val wantOverlap = sess.join(pairCounts, Seq("user_id", "session_id"), "left")
      .select($"user_id", $"session_id",
        coalesce($"n_overlap", lit(0L)).as("n_overlap"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val gotOverlap = RangeJoin.sessionOverlap(spark, sfDir)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(gotOverlap == wantOverlap)

    val purchases = sources.Tables.events(spark, sfDir)
      .where($"event_type" === "purchase").select($"event_id", $"ts_ms")
    val activeCounts = RangeJoin.joinPointInInterval(purchases, "ts_ms",
        sess.select($"start_ms", $"end_ms"), "start_ms", "end_ms",
        operators.Analytics.SessionGapMs)
      .groupBy($"event_id").agg(count(lit(1)).as("n_active"))
    val wantActive = purchases.join(activeCounts, Seq("event_id"), "left")
      .select($"event_id", $"ts_ms", coalesce($"n_active", lit(0L)).as("n_active"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val gotActive = RangeJoin.rangeActiveSessions(spark, sfDir)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(gotActive == wantActive)
  }

  test("session_overlap: non-negative, symmetric total, plan stays equi-join") {
    val out = graft.operators.RangeJoin.sessionOverlap(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_overlap") >= 0))
    // overlap is symmetric: the total counts each unordered pair twice
    assert(rows.map(_.getAs[Long]("n_overlap")).sum % 2 == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("column-name collision and bad width are loud") {
    val p = Seq((1L, 2L)).toDF("id", "ts")
    val i = Seq((1L, 2L, 3L)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.joinPointInInterval(p, "ts", i, "s", "e", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.joinPointInInterval(p, "ts", i.withColumnRenamed("id", "i_id"), "s", "e", 0L)
    }
  }

  test("range_active_sessions: every purchase sits in >=1 session (its own)") {
    val out = RangeJoin.rangeActiveSessions(spark, sfDir)
    assert(out.count() > 0)
    assert(out.where($"n_active" < 1).isEmpty)
  }

  test("plan: equi-join on the bucket, no nested-loop join") {
    val plan = RangeJoin.rangeActiveSessions(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
