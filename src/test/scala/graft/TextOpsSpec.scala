package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ingest, TextAnalysis}
import graft.sources.Tables

class TextOpsSpec extends SparkSpec {

  test("approx_top_tokens honors the Misra-Gries sketch guarantee") {
    import spark.implicits._
    val m = TextAnalysis.HeavyHitterCounters
    val exact = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val hh = TextAnalysis.approxTopTokens(spark, sfDir).collect()
    assert(hh.length > 0 && hh.length <= 20)
    hh.foreach { r =>
      val (tok, est, err) =
        (r.getAs[String]("token"), r.getAs[Long]("est_count"), r.getAs[Long]("err"))
      val truth = exact.getOrElse(tok, 0L)
      assert(err <= n / (m + 1) + 1, s"err bound blown for $tok: $err vs N/(m+1)")
      assert(est <= truth && truth <= est + err,
        s"$tok: true $truth not in [est $est, est+err ${est + err}]")
    }
    // every very-heavy token (true > N/(m+1)) must SURVIVE IN THE
    // SKETCH — that is the MG guarantee; a top-20 presentation cut
    // could legitimately hide one behind deficit-depressed estimates,
    // so assert against the un-truncated summary
    val summary = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("tok"))
      .where(col("tok") =!= "")
      .agg(graft.functions.FreqSketch.heavyHitters(m)(col("tok")).as("hh"))
      .select(explode(col("hh")).as("h")).select(col("h.item"))
      .collect().map(_.getString(0)).toSet
    val mustHave = exact.filter(_._2 > n / (m + 1)).keys
    mustHave.foreach(t => assert(summary(t), s"heavy hitter $t missing from summary"))
  }

  test("heavy-hitters sketch: skewed synthetic stream, partition-order robust") {
    import spark.implicits._
    val heavy = Seq.fill(500)("HEAVY") ++ Seq.fill(300)("WARM")
    val noise = (1 to 900).map(i => s"n$i")
    val data = new scala.util.Random(7).shuffle(heavy ++ noise)
    for (parts <- Seq(1, 4, 13)) {
      val hh = data.toDF("tok").repartition(parts)
        .agg(graft.functions.FreqSketch.heavyHitters(16)(col("tok")).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item"), col("h.count"), col("h.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val top = hh.sortBy(-_._2).map(_._1)
      assert(top.head == "HEAVY", s"parts=$parts: $top")
      assert(top.take(2).toSet == Set("HEAVY", "WARM"), s"parts=$parts: $top")
      hh.find(_._1 == "HEAVY").foreach { case (_, est, err) =>
        assert(est <= 500 && 500 <= est + err, s"parts=$parts: est $est err $err")
      }
    }
  }

  test("doc_chunk reconstructs reference chunk_text semantics") {
    val chunks = Ingest.docChunk(spark, sfDir).collect()
    assert(chunks.nonEmpty)
    // indices are dense per doc, chunks bounded by size, non-empty
    chunks.groupBy(_.getAs[Long]("doc_id")).values.foreach { rs =>
      val idx = rs.map(_.getAs[Long]("chunk_index")).sorted
      assert(idx.sameElements(0L until idx.length))
      rs.foreach { r =>
        val c = r.getAs[String]("chunk_text")
        assert(c.nonEmpty && c.length <= Ingest.ChunkSize && c == c.trim)
      }
    }
    // a doc longer than ChunkSize must produce > 1 chunk
    val longDoc = Tables.documents(spark, sfDir)
      .where(col("n_chars") > Ingest.ChunkSize).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val multi = chunks.groupBy(_.getAs[Long]("doc_id"))
      .collect { case (id, rs) if rs.length > 1 => id }.toSet
    assert(longDoc.subsetOf(multi))
  }

  test("doc_embed vectors are unit-normalized in long form") {
    val norms = Ingest.docEmbed(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (_, rs) => rs.map(r => math.pow(r.getAs[Double]("weight"), 2)).sum }
    assert(norms.nonEmpty)
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-3))   // rounded weights
    val dims = Ingest.docEmbed(spark, sfDir).select("dim").distinct()
      .collect().map(_.getLong(0))
    assert(dims.forall(d => d >= 0 && d < Ingest.EmbedDim))
  }

  test("dedup_exact finds exactly the injected duplicates") {
    val groups = Dedup.dedupExact(spark, sfDir).collect()
    val expected = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 7 === 0).count()
    assert(groups.length == expected)
    assert(groups.forall(_.getAs[Long]("n_dups") == 2))
  }

  test("dedup_minhash surfaces the injected near-duplicates with high jaccard") {
    val pairs = Dedup.dedupMinhash(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    // injected pairs are (id, id+100000); they dominate the top
    val injected = pairs.filter(r =>
      r.getAs[Long]("b_id") == r.getAs[Long]("a_id") + 100000L)
    assert(injected.length > pairs.length / 2)
    injected.foreach(r => assert(r.getAs[Double]("jaccard") > 0.8))
  }

  test("dedup_simhash hamming distances are small for injected pairs") {
    val pairs = Dedup.dedupSimhash(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Long]("hamming") <= 6))
    assert(pairs.exists(r => r.getAs[Long]("b_id") == r.getAs[Long]("a_id") + 100000L))
  }

  test("dedup_clusters: every member maps to its component minimum") {
    val rows = Dedup.dedupClusters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cluster = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // cluster ids are fixpoints and the injected pairs collapse together
    cluster.values.foreach(c => assert(cluster.getOrElse(c, c) == c))
    cluster.foreach { case (id, c) => assert(c <= id) }
    val injected = cluster.filter(_._1 >= 100000L)
    assert(injected.nonEmpty)
    injected.foreach { case (id, c) => assert(cluster.get(id - 100000L).forall(_ == c)) }
  }

  test("lang_id picks the argmax profile") {
    val rows = TextAnalysis.langId(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val scores = Map("exec" -> r.getAs[Double]("s_exec"),
        "query" -> r.getAs[Double]("s_query"), "storage" -> r.getAs[Double]("s_storage"))
      assert(scores(r.getAs[String]("predicted")) == scores.values.max)
    }
  }

  test("quality_score ratios are in range") {
    TextAnalysis.qualityScore(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") <= 1)
      assert(r.getAs[Double]("stop_ratio") >= 0 && r.getAs[Double]("stop_ratio") <= 1)
      assert(r.getAs[Double]("quality") >= 0 && r.getAs[Double]("quality") <= 1)
    }
  }

  test("token_count whitespace tokens match chars arithmetic") {
    TextAnalysis.tokenCount(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("ws_tokens") > 0)
      assert(r.getAs[Long]("bpe_ish_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("pii_scrub redacts injected PII and leaves other docs untouched") {
    val rows = TextAnalysis.piiScrub(spark, sfDir).collect()
    rows.foreach { r =>
      val injected = r.getAs[Long]("doc_id") % 11 == 0
      val txt = r.getAs[String]("scrubbed_text")
      assert(r.getAs[Long]("n_redactions") == (if (injected) 2L else 0L))
      assert(!txt.contains("bob@example.com") && !txt.contains("555-123-4567"))
      assert(txt.contains("[REDACTED]") == injected)
    }
  }

  test("stratified_balance keeps at most cap docs per source, reproducibly") {
    val a = TextAnalysis.stratifiedBalance(spark, sfDir, cap = 50).collect()
    val b = TextAnalysis.stratifiedBalance(spark, sfDir, cap = 50).collect()
    assert(a.map(_.getAs[Long]("doc_id")).toSeq == b.map(_.getAs[Long]("doc_id")).toSeq)
    a.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.length <= 50)
    }
  }

  test("repetition_score: ratio in [0,1], zero for shingle-free docs, counts consistent") {
    val rows = TextAnalysis.repetitionScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_shingles")
      val distinct = r.getAs[Long]("n_distinct")
      val ratio = r.getAs[Double]("rep_ratio")
      assert(distinct <= total)
      assert(ratio >= 0.0 && ratio <= 1.0)
      if (total == 0) assert(ratio == 0.0)
    }
    // the synthetic corpus draws from a small word pool: SOME doc must repeat a shingle
    assert(rows.exists(_.getAs[Double]("rep_ratio") > 0.0))
  }

  test("contamination_check: benchmark docs excluded; a planted copy is flagged") {
    val rows = graft.operators.Dedup.contaminationCheck(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Long]("doc_id") % 101 != 0))
    rows.foreach { r =>
      val ov = r.getAs[Double]("max_overlap")
      assert(ov >= 0.0 && ov <= 1.0)
      assert(r.getAs[Boolean]("contaminated") == (ov >= 0.5))
    }
  }

  test("gopher_quality matches an independent per-doc recomputation") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stop = TextAnalysis.Stopwords.toSet
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis.gopherQuality(spark, sfDir).collect()
    assert(out.length == texts.size)
    var kept = 0
    out.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      val text = texts(r.getAs[Long]("doc_id"))
      val (words, chars) = (t.length, text.length)
      val mwl = r4((chars - (words - 1)).toDouble / words)
      val nStop = t.distinct.count(stop)
      def topMass(n: Int): Long =
        if (words < n) 0L
        else (0 to words - n).map(i => t.slice(i, i + n).mkString(" "))
          .filter(_.nonEmpty)
          .groupBy(identity).map { case (g, occ) => occ.size.toLong * g.length }
          .foldLeft(0L)(math.max)
      def frac(m: Long) = if (chars == 0) 0.0 else r4(m.toDouble / chars)
      val dup5 =
        if (words < 5) 0.0
        else {
          val g = (0 to words - 5).map(i => t.slice(i, i + 5).mkString(" "))
          r4(1.0 - g.distinct.size.toDouble / (words - 4))
        }
      assert(r.getAs[Long]("n_words") == words)
      assert(r.getAs[Double]("mean_word_len") == mwl)
      assert(r.getAs[Long]("n_stop") == nStop)
      assert(r.getAs[Double]("top2_frac") == frac(topMass(2)))
      assert(r.getAs[Double]("top3_frac") == frac(topMass(3)))
      assert(r.getAs[Double]("top4_frac") == frac(topMass(4)))
      assert(r.getAs[Double]("dup5_frac") == dup5)
      val keep = words >= TextAnalysis.GopherMinWords &&
        words <= TextAnalysis.GopherMaxWords &&
        mwl >= TextAnalysis.GopherMinMeanWordLen &&
        mwl <= TextAnalysis.GopherMaxMeanWordLen &&
        nStop >= TextAnalysis.GopherMinStopwords &&
        frac(topMass(2)) <= TextAnalysis.GopherTopGramMax(2) &&
        frac(topMass(3)) <= TextAnalysis.GopherTopGramMax(3) &&
        frac(topMass(4)) <= TextAnalysis.GopherTopGramMax(4) &&
        dup5 <= TextAnalysis.GopherDupGramMax
      assert(r.getAs[Boolean]("keep") == keep)
      if (keep) kept += 1
    }
    // the rule set must discriminate on this corpus, not rubber-stamp
    assert(kept > 0 && kept < out.length)
    val filtered = TextAnalysis.gopherFilter(spark, sfDir).collect()
    assert(filtered.length == kept)
  }

  test("gopher rules catch planted degenerate docs") {
    import spark.implicits._
    val healthy = ((1 to 25).map(i => s"word$i") ++ Seq("the", "a", "data")).mkString(" ")
    val repeated = (Seq("the", "a") ++ Seq.fill(40)(Seq("spam", "ham")).flatten
      ++ (1 to 10).map(i => s"word$i")).mkString(" ")
    val noStops = (1 to 30).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, healthy), (2L, "alpha beta gamma"), (3L, repeated), (4L, noStops))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val m = TextAnalysis.gopherMetricsOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Boolean]("keep"))
    assert(!m(2L).getAs[Boolean]("keep") && m(2L).getAs[Long]("n_words") < 20)
    assert(!m(3L).getAs[Boolean]("keep") && m(3L).getAs[Double]("top2_frac") > 0.20
      && m(3L).getAs[Double]("dup5_frac") > 0.15)
    assert(!m(4L).getAs[Boolean]("keep") && m(4L).getAs[Long]("n_stop") == 0)
  }
}
