package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** The tunable-parameter surface (round-9 verdict #6): the reference
  * exposes its fixed constants as API parameters (days=7,
  * session_utils.py:268; limit=10, supabase_utils.py:346;
  * similarity_threshold, utils.py:228) — each operator family's lift
  * to defaulted arguments is exercised here at a NON-default value.
  * The default path stays byte-identical (the oracle gate pins it);
  * these tests pin the parameter actually reaching the plan.
  */
class ParamSurfaceSpec extends SparkSpec {

  // ---- Analytics: top-k, pagination, trailing windows, session gap

  test("topRated(n) / recentN(n): non-default k is a prefix of the default ranking") {
    val t3 = Analytics.topRated(spark, sfDir, n = 3).collect()
    val t10 = Analytics.topRated(spark, sfDir).collect()
    assert(t3.length === 3)
    assert(t3.toSeq === t10.take(3).toSeq)   // deterministic tie-break ⇒ prefix
    val r4 = Analytics.recentN(spark, sfDir, n = 4).collect()
    assert(r4.length === 4)
    assert(r4.toSeq === Analytics.recentN(spark, sfDir).collect().take(4).toSeq)
  }

  test("paginate(page, pageSize): pages partition the ordered listing") {
    val p0 = Analytics.paginate(spark, sfDir, page = 0, pageSize = 7)
      .collect().map(_.getAs[Long]("doc_id"))
    val p1 = Analytics.paginate(spark, sfDir, page = 1, pageSize = 7)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(p0.length === 7 && p1.length === 7)
    assert(p0.toSet.intersect(p1.toSet).isEmpty)
    assert(p0.max < p1.min)   // ordered by doc_id, consecutive pages
    // invalid shapes fail fast with a clear message, not at Spark
    // analysis time with an opaque negative-offset error
    intercept[IllegalArgumentException](Analytics.paginate(spark, sfDir, page = -1))
    intercept[IllegalArgumentException](Analytics.paginate(spark, sfDir, pageSize = 0))
    intercept[IllegalArgumentException](
      Analytics.paginate(spark, sfDir, page = Int.MaxValue, pageSize = 1000))
  }

  test("activitySummary(days): a shorter window counts a subset of events") {
    val d7 = Analytics.activitySummary(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val d1 = Analytics.activitySummary(spark, sfDir, days = 1).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(d1.nonEmpty)
    // every 1-day cell exists in the 7-day frame with a count ≥ its own
    d1.foreach { case (k, n) => assert(d7.contains(k) && d7(k) >= n) }
    // the strict narrowing is a property of the DATA (events spanning
    // more than one day), not of the operator — assert it only when
    // the corpus actually spans multiple days, so a regenerated
    // single-day corpus can't fail this spuriously
    // activitySummary anchors both windows at max(ts), so strict
    // narrowing needs an event whose age falls in (1d, 7d] exactly —
    // a span check alone misses a corpus with events only today and
    // 30 days ago (span 30d but identical 1d/7d windows)
    import spark.implicits._
    val dayMs = 24L * 3600 * 1000
    val narrowable = Tables.events(spark, sfDir)
      .withColumn("age", max($"ts_ms").over() - $"ts_ms")
      .where($"age" > dayMs && $"age" <= 7 * dayMs)
      .limit(1).count() > 0
    if (narrowable) assert(d1.values.sum < d7.values.sum)
  }

  test("sessionize(gapMs): a tighter gap can only split sessions, never merge") {
    val wide = Analytics.sessionize(spark, sfDir).count()
    val tight = Analytics.sessionize(spark, sfDir, gapMs = 60L * 1000).count()
    assert(tight >= wide)   // the invariant: tighter gaps never merge
    // the strict split is data-dependent (some user must have two
    // events 1-30 min apart); assert it only when such a gap exists,
    // so a denser regenerated corpus can't fail this spuriously
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts_ms")
    val splittable = Tables.events(spark, sfDir)
      .select($"user_id", $"ts_ms", ($"ts_ms" - lag($"ts_ms", 1).over(w)).as("d"))
      .where($"d" > 60L * 1000 && $"d" <= Analytics.SessionGapMs)
      .limit(1).count() > 0
    if (splittable) assert(tight > wide)
    // liveUsers widens monotonically with the window
    val lu30 = Analytics.liveUsers(spark, sfDir).collect().head.getLong(0)
    val luAll = Analytics.liveUsers(spark, sfDir, gapMs = Long.MaxValue / 4)
      .collect().head.getLong(0)
    assert(luAll >= lu30)
  }

  // ---- VectorSearch: k, threshold, nProbe

  test("knnBrute(k) / knnThreshold(threshold) / annIvf(nProbe)") {
    val k2 = VectorSearch.knnBrute(spark, sfDir, k = 2).collect()
    val k5 = VectorSearch.knnBrute(spark, sfDir).collect()
    assert(k2.count(_.getAs[Long]("q_id") == 0L) === 2)
    // per-query prefix of the default ranking
    val k2ByQ = k2.groupBy(_.getAs[Long]("q_id"))
    k5.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      assert(k2ByQ(q).toSeq === rows.sortBy(_.getAs[Long]("rk")).take(2).toSeq)
    }
    // a maximal threshold keeps nothing
    assert(VectorSearch.knnThreshold(spark, sfDir, threshold = 1.01).count() === 0)
    // NB: nProbe=2's top-3 is NOT a subset of the all-centroid top-3
    // in general — a narrow-probe hit outside the true top-3 is
    // legitimately displaced when widening probes. The properties
    // that DO hold: probing every centroid is exact, and every true
    // neighbor the narrow probe finds is confirmed by the wide run
    // (so widening never loses a correct answer the narrow run had).
    val p2 = VectorSearch.annIvf(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val pAll = VectorSearch.annIvf(spark, sfDir, nProbe = 100).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = VectorSearch.knnBrute(spark, sfDir, k = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert(pAll === exact)   // probing every centroid = brute force
    assert(p2.nonEmpty)
    // the non-vacuous monotonicity check runs at an INTERMEDIATE
    // width (4 is not asserted exact, so this can actually fail):
    // candidates grow with nProbe, and a true top-3 neighbor can
    // never be displaced from a candidate superset — so any true
    // neighbor the nProbe=2 run found must survive at nProbe=4
    val p4 = VectorSearch.annIvf(spark, sfDir, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert(p2.intersect(exact).subsetOf(p4),
      "a true neighbor found at nProbe=2 vanished when probing wider")
    assert(p2.intersect(exact).nonEmpty,
      "narrow probing found no true neighbor at all on this corpus")
  }

  // ---- KeywordSearch: top-k and BM25 shape parameters

  test("keywordSearch(k) / keywordBm25(k1, b) at non-default values") {
    val k2 = KeywordSearch.keywordSearch(spark, sfDir, k = 2).collect()
    assert(k2.groupBy(_.getAs[Long]("q_id")).values.forall(_.length <= 2))
    val dflt = KeywordSearch.keywordSearch(spark, sfDir).collect()
    k2.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      val dRows = dflt.filter(_.getAs[Long]("q_id") == q)
        .sortBy(_.getAs[Long]("rk")).take(rows.length)
      assert(rows.toSeq === dRows.toSeq)
    }
    // b = 0 disables length normalization: scores change but the
    // retrieved doc set per query stays plausible (same vocabulary
    // pruning) and the frame stays deterministic
    val b0a = KeywordSearch.keywordBm25(spark, sfDir, b = 0.0).collect()
    val b0b = KeywordSearch.keywordBm25(spark, sfDir, b = 0.0).collect()
    assert(b0a.toSeq === b0b.toSeq)
    val b75 = KeywordSearch.keywordBm25(spark, sfDir).collect()
    assert(b0a.map(_.getAs[Double]("score")).toSeq !==
      b75.map(_.getAs[Double]("score")).toSeq)
    // k1 = 0 saturates tf entirely: every contributing term scores
    // idf-only, still a valid bounded top-k frame
    val k1z = KeywordSearch.keywordBm25(spark, sfDir, k1 = 0.0)
    assert(k1z.groupBy(col("q_id")).count().collect()
      .forall(_.getAs[Long]("count") <= KeywordSearch.Bm25K))
  }

  // ---- Dedup: report size, sampling rates, contamination floor

  test("dedupMinhash(topN) / deterministicSample(rates) / contaminationCheck(floor)") {
    val t5 = Dedup.dedupMinhash(spark, sfDir, topN = 5).collect()
    assert(t5.length === 5)
    assert(t5.toSeq === Dedup.dedupMinhash(spark, sfDir).collect().take(5).toSeq)
    // keep-everything rates reproduce the full event count
    val all = Dedup.deterministicSample(spark, sfDir,
      baseRate = 1.1, errorRate = 1.1).count()
    val total = graft.sources.Tables.events(spark, sfDir).count()
    assert(all === total)
    val some = Dedup.deterministicSample(spark, sfDir).count()
    assert(some < total && some > 0)
    // floor = 0 flags every doc with any benchmark overlap > 0 … and
    // a floor above 1.0 flags nothing
    val hot = Dedup.contaminationCheck(spark, sfDir, floor = 1.01)
    assert(hot.where(col("contaminated")).count() === 0)
    val cold = Dedup.contaminationCheck(spark, sfDir, floor = 0.0)
    assert(cold.where(!col("contaminated")).count() === 0)
  }

  // ---- TextAnalysis: validation bounds

  test("validateDocs(maxChars, minTokens) at non-default bounds") {
    val strict = TextAnalysis.validateDocs(spark, sfDir,
      maxChars = 100, minTokens = 30).collect()
    val dflt = TextAnalysis.validateDocs(spark, sfDir).collect()
    val strictValid = strict.count(_.getAs[Boolean]("valid"))
    val dfltValid = dflt.count(_.getAs[Boolean]("valid"))
    assert(strictValid < dfltValid)   // tighter bounds reject more
    // tightening can only flip valid→invalid, never the reverse
    val dfltById = dflt.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("valid")).toMap
    strict.foreach { r =>
      if (r.getAs[Boolean]("valid")) assert(dfltById(r.getAs[Long]("doc_id")))
    }
  }

  // ---- Curate: the funnel at a non-default params surface

  test("corpusCurate(Params) at a stricter quality floor") {
    val dflt = Curate.corpusCurate(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("docs_out")).toMap
    val strict = Curate.corpusCurate(spark, sfDir,
      Curate.Params(qualityFloor = 0.9)).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("docs_out")).toMap
    assert(strict("raw") === dflt("raw"))           // same input corpus
    assert(strict("validate") === dflt("validate")) // gate before quality unchanged
    assert(strict("quality") < dflt("quality"))     // the lifted knob bites
    assert(strict("decontaminate") <= dflt("decontaminate"))
    // apply stage agrees with the funnel's terminal count
    val kept = Curate.curateApply(spark, sfDir,
      Curate.Params(qualityFloor = 0.9)).count()
    assert(kept === strict("decontaminate"))
    // and the default path still matches ITS funnel (cache isolation:
    // the non-default run must not have poisoned the default chain)
    assert(Curate.curateApply(spark, sfDir).count() === dflt("decontaminate"))
  }
}
