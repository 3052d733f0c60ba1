package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Per-rule specs for the C4/FineWeb line-level quality family
  * (Raffel et al. 2020 §2.2): each C4 rule is pinned on a tiny
  * in-memory corpus through the pure core (c4MetricsOf), the derived
  * gate corpus's planted features are verified, and the one-narrow-
  * pass plan shape is audited (the gopher_quality contract).
  */
class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(rows: (Long, String)*): Map[Long, org.apache.spark.sql.Row] =
    TextAnalysis.c4MetricsOf(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  // a line that passes every line rule
  private val ok = "alpha beta gamma."

  test("terminal-punctuation rule: unpunctuated lines are dropped, . ! ? \" all terminal") {
    val m = metrics(
      1L -> s"$ok\nno terminal here\n$ok",
      2L -> "alpha beta gamma!\nalpha beta gamma?\nalpha beta gamma\"")
    assert(m(1L).getAs[Long]("n_noterm") === 1)
    assert(m(1L).getAs[Long]("n_kept") === 2)
    // each of ! ? " counts as terminal (C4's terminal set)
    assert(m(2L).getAs[Long]("n_noterm") === 0)
    assert(m(2L).getAs[Long]("n_kept") === 3)
  }

  test("min-words rule: a 2-word line is dropped even when punctuated") {
    val m = metrics(1L -> s"alpha beta.\n$ok\n$ok\n$ok")
    assert(m(1L).getAs[Long]("n_short") === 1)
    assert(m(1L).getAs[Long]("n_kept") === 3)
    assert(m(1L).getAs[Boolean]("keep"))
  }

  test("javascript rule: a line mentioning javascript is dropped, page survives") {
    val m = metrics(1L -> s"alpha javascript gamma.\n$ok\n$ok\n$ok")
    assert(m(1L).getAs[Long]("n_js") === 1)
    assert(m(1L).getAs[Long]("n_kept") === 3)
    assert(m(1L).getAs[Boolean]("keep"))
  }

  test("lorem-ipsum page rule: the whole page is dropped") {
    val m = metrics(1L -> s"lorem ipsum alpha beta.\n$ok\n$ok\n$ok")
    assert(m(1L).getAs[Boolean]("has_lorem"))
    assert(!m(1L).getAs[Boolean]("keep"))
  }

  test("curly-brace page rule: the whole page is dropped") {
    val m = metrics(1L -> s"alpha beta { gamma.\n$ok\n$ok\n$ok")
    assert(m(1L).getAs[Boolean]("has_brace"))
    assert(!m(1L).getAs[Boolean]("keep"))
  }

  test("min-kept-lines page rule: fewer than 3 surviving lines drops the page") {
    val m = metrics(
      1L -> s"$ok\n$ok",                    // only 2 lines at all
      2L -> s"$ok\n$ok\nno terminal\ntiny.") // 4 lines, 2 kept
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[Long]("n_kept") === 2)
    assert(!m(2L).getAs[Boolean]("keep"))
  }

  test("clean_text reassembles exactly the kept lines in order") {
    val m = metrics(1L -> s"$ok\nskip me\nalpha beta delta.\ntiny.")
    assert(m(1L).getAs[String]("clean_text") === s"$ok\nalpha beta delta.")
  }

  test("derived gate corpus: every planted feature fires per its coin") {
    val derived = TextAnalysis.c4DerivedCorpus(spark, sfDir)
      .withColumn("ls", split(col("text"), "\n"))
    // lorem docs are exactly doc_id % 23 == 0
    val loremIds = derived.where(col("text").contains("lorem ipsum"))
      .select("doc_id").as[Long].collect().toSet
    val allIds = derived.select("doc_id").as[Long].collect().toSet
    assert(loremIds === allIds.filter(_ % 23 == 0))
    // per-line coins: check one doc exhaustively against the contract
    val d = derived.where(col("doc_id") === 1L)
      .select(explode(col("ls")).as("line")).as[String].collect()
    d.zipWithIndex.foreach { case (line, i) =>
      assert(line.endsWith(".") === ((1 + i) % 4 != 3), s"punct coin at line $i: $line")
      assert(line.contains("javascript") === ((3 + i) % 13 == 0), s"js coin at line $i")
      assert(line.contains("{") === ((11 + i) % 29 == 0), s"brace coin at line $i")
    }
    // the 2-word degenerate coin: word count (net of planted suffix
    // tokens and punctuation) is 2 where id*5+i ≡ 0 mod 9
    d.zipWithIndex.foreach { case (line, i) =>
      val planted = Seq((3 + i) % 13 == 0, (11 + i) % 29 == 0).count(identity)
      val n = line.stripSuffix(".").split(" ").length - planted
      if ((5 + i) % 9 == 0) assert(n === 2, s"short coin at line $i: $line")
    }
  }

  test("c4_filter output: every surviving page obeys all page rules") {
    val out = TextAnalysis.c4Filter(spark, sfDir)
    assert(out.count() > 0)
    val bad = out.where(col("n_kept") < TextAnalysis.C4MinKeptLines
      || col("clean_text").contains("lorem ipsum")
      || col("clean_text").contains("{")
      || col("clean_text").contains("javascript")).count()
    assert(bad === 0)
    // every kept line ends terminal and has ≥ 3 words
    val lineViolations = out
      .select(explode(split(col("clean_text"), "\n")).as("l"))
      .where(!col("l").rlike(TextAnalysis.C4TerminalRe)
        || size(split(col("l"), " ")) < TextAnalysis.C4MinLineWords)
      .count()
    assert(lineViolations === 0)
  }

  test("fineweb_linededup: first occurrence wins, no duplicate line survives") {
    val out = TextAnalysis.finewebLineDedup(spark, sfDir).collect()
    val boiler = TextAnalysis.FinewebBoilerplate
    // the planted boilerplate line survives in exactly ONE doc — the
    // smallest-id planted doc — and is gone from every other
    val keepers = out.filter(_.getAs[String]("kept_text").split("\n").contains(boiler))
    assert(keepers.length === 1, s"boilerplate survived in ${keepers.length} docs")
    val plantedIds = TextAnalysis.finewebDerivedCorpus(spark, sfDir)
      .where(col("doc_id") % 13 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    assert(keepers.head.getAs[Long]("doc_id") === plantedIds.min)
    // every planted doc lost its (duplicated) boilerplate line except
    // the winner — naturally-colliding lines (the 2-word degenerate
    // coin can repeat across docs) may be lost too, so the assertion
    // is on the boilerplate specifically, not an exact count
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    plantedIds.filterNot(_ == plantedIds.min).foreach { id =>
      assert(!byId(id).getAs[String]("kept_text").split("\n").contains(boiler),
        s"doc $id kept the duplicated boilerplate line")
      assert(byId(id).getAs[Long]("n_kept") < byId(id).getAs[Long]("n_lines"),
        s"doc $id lost no line at all")
    }
    // global invariant: no line is kept twice corpus-wide
    val keptLines = out.flatMap(_.getAs[String]("kept_text").split("\n")).filter(_.nonEmpty)
    assert(keptLines.length === keptLines.distinct.length,
      "a duplicate line survived line-dedup")
    // kept lines stay in original order within a doc
    val sample = byId(plantedIds.min)
    val orig = TextAnalysis.finewebDerivedCorpus(spark, sfDir)
      .where(col("doc_id") === plantedIds.min).collect().head
      .getAs[String]("text").split("\n")
    val kept = sample.getAs[String]("kept_text").split("\n")
    assert(kept.toSeq === orig.filter(kept.contains).toSeq)
  }

  test("fineweb_linededup plan: winner aggregate is map-side partial, no winner join") {
    val df = TextAnalysis.finewebLineDedup(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), s"winner agg not map-side partial:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("c4_span_dedup: all-but-first duplicated 3-span removed, exactly") {
    import spark.implicits._
    // hand-built pages: B carries A's middle block verbatim (a nav
    // template); C shares nothing; D repeats the block AGAIN — only
    // A's (first) occurrence survives. Lines are unique per doc
    // elsewhere so single-line dedup would touch nothing.
    val block = Seq("nav one.", "nav two.", "nav three.")
    val corpus = Seq(
      10L -> (Seq("a head.") ++ block ++ Seq("a tail.")),
      20L -> (Seq("b head.") ++ block ++ Seq("b tail.")),
      30L -> Seq("c one.", "c two.", "c three."),
      40L -> (block ++ Seq("d tail."))
    ).map { case (id, ls) => (id, ls.mkString("\n")) }.toDF("doc_id", "text")
    val got = TextAnalysis.c4SpanDedupOf(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("kept_text")))).toMap
    assert(got(10L) === ((5L, (Seq("a head.") ++ block ++ Seq("a tail.")).mkString("\n"))),
      "first occurrence must keep its block")
    assert(got(20L) === ((2L, "b head.\nb tail.")), "later occurrence keeps only its own lines")
    assert(got(30L) === ((3L, "c one.\nc two.\nc three.")), "untouched doc changed")
    assert(got(40L) === ((1L, "d tail.")), "third occurrence keeps only its own line")
  }

  test("c4_span_dedup gate corpus: every 17th doc planted, non-planted pages mostly intact") {
    val out = TextAnalysis.c4SpanDedup(spark, sfDir).collect()
    val planted = out.filter(_.getAs[Long]("doc_id") % 17 == 0)
    assert(planted.nonEmpty)
    // exactly one planted doc keeps the boilerplate block (the
    // corpus-wide first); every other planted doc lost >= 3 lines
    val keepers = planted.filter(_.getAs[String]("kept_text")
      .contains(TextAnalysis.C4SpanBoilerplate.mkString("\n")))
    assert(keepers.length === 1, s"expected one surviving block, got ${keepers.length}")
    assert(keepers.head.getAs[Long]("doc_id") ===
      planted.map(_.getAs[Long]("doc_id")).min)
    planted.filterNot(_ eq keepers.head).foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_lines") - 3,
        s"doc ${r.getAs[Long]("doc_id")} kept its duplicated block")
    }
    // spot-parity with the prep: n_lines = derived lines (+3 when planted)
    out.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_lines")))
  }

  test("c4_span_dedup plan: winner aggregate is map-side partial, no cartesian") {
    val df = TextAnalysis.c4SpanDedup(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), s"winner agg not map-side partial:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("plan: one narrow pass — no join, no aggregate, only the presentation sort") {
    def finalPlan(df: DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val plan = finalPlan(TextAnalysis.c4LineStats(spark, sfDir))
    assert(!plan.contains("Join"), s"join in a per-row metric pass:\n$plan")
    assert(!plan.contains("Aggregate"),
      s"aggregate in a per-row metric pass (line metrics should be HOFs):\n$plan")
    // r17: the scale-adaptive scan spread (Tables.documentsSpread) adds
    // ONE RoundRobinPartitioning exchange at sub-split-per-core input
    // sizes (identity at production scale) — exclude it, then the only
    // remaining exchange is the presentation range sort (+ AQE echo)
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "roundrobin".r.findAllIn(plan.toLowerCase).length
    assert(exchanges <= 2,
      s"expected only the presentation sort exchange, got $exchanges:\n$plan")
  }
}
