package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.C4Stream

/** Top-level row type: Spark encoders cannot reach a case class
  * nested in the suite instance.
  */
case class C4Doc(doc_id: Long, text: String)

/** The C4 rule stream is stateless (rules are per-doc): it must emit
  * exactly the batch metrics for any micro-batch split. The FineWeb
  * line-dedup stream carries the append-only committed line index:
  * one batch over an empty index IS the batch query; across batches
  * first-winner-stays; re-delivery before the index advances is
  * idempotent.
  */
class C4StreamSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(df: DataFrame): Seq[C4Doc] =
    df.select("doc_id", "text").as[C4Doc].collect().toSeq.sortBy(_.doc_id)

  private def runMetrics(batches: Seq[Seq[C4Doc]]): Seq[Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[C4Doc]
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    val query = C4Stream.metricsSink(input.toDF()) { m =>
      out.synchronized { out ++= m.select(col("doc_id"), col("n_lines"),
        col("n_kept"), col("n_short"), col("n_noterm"), col("n_js"),
        col("has_lorem"), col("has_brace"), col("keep")).collect() }
    }.start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); query.processAllAvailable() }
      out.sortBy(_.getAs[Long]("doc_id")).toSeq
    } finally query.stop()
  }

  test("stateless C4 rule stream == c4_line_stats for any micro-batch split") {
    val corpus = TextAnalysis.c4DerivedCorpus(spark, sfDir)
    val docs = docsOf(corpus)
    val expected = TextAnalysis.c4LineStats(spark, sfDir).collect().toSeq
    assert(runMetrics(Seq(docs)) === expected)
    val third = (docs.length + 2) / 3
    assert(runMetrics(docs.grouped(third).toSeq) === expected)
  }

  private def emptyIndex: DataFrame = Seq.empty[String].toDF("h")

  private type Line = (Long, Long, Long, String)
  private def rowsOf(df: DataFrame): Set[Line] =
    df.collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))
    }.toSet

  test("one batch over an empty index == fineweb_linededup, row for row") {
    val batch = TextAnalysis.finewebDerivedCorpus(spark, sfDir)
    val got = rowsOf(C4Stream.detect(spark, batch, emptyIndex, "spec-empty"))
    val want = rowsOf(TextAnalysis.finewebLineDedup(spark, sfDir))
    assert(got === want,
      s"missing=${(want -- got).take(2)} extra=${(got -- want).take(2)}")
  }

  test("doc_id-ordered batch split + committed index == the batch spelling") {
    val corpus = TextAnalysis.finewebDerivedCorpus(spark, sfDir)
    val mid = 250L
    val b1 = corpus.where(col("doc_id") < mid)
    val b2 = corpus.where(col("doc_id") >= mid)
    val out1 = C4Stream.detect(spark, b1, emptyIndex, "spec-split-1")
      .localCheckpoint()
    val idx = C4Stream.linesOf(out1).localCheckpoint()
    val out2 = C4Stream.detect(spark, b2, idx, "spec-split-2")
    assert(rowsOf(out1) ++ rowsOf(out2)
      === rowsOf(TextAnalysis.finewebLineDedup(spark, sfDir)),
      "in-order incremental line-dedup drifted from the corpus-wide batch run")
  }

  test("committed lines drop on arrival; novel lines win once; replay is idempotent") {
    val idx = Seq(md5Hex("subscribe now.")).toDF("h")
    val batch = Seq(
      C4Doc(100L, "subscribe now.\nfresh insight one."),
      C4Doc(101L, "fresh insight one.\nanother new line.")).toDF()
    val got = C4Stream.detect(spark, batch, idx, "spec-commit")
    val m = got.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))).toMap
    // doc 100: boilerplate committed -> dropped; keeps its novel line,
    // which it wins (first occurrence by (doc_id, line_idx))
    assert(m(100L) === ((1L, "fresh insight one.")))
    // doc 101: its copy of the novel line lost to doc 100 within-batch
    assert(m(101L) === ((1L, "another new line.")))
    // replay before the index advances: byte-identical rows
    assert(rowsOf(C4Stream.detect(spark, batch, idx, "spec-commit-replay"))
      === rowsOf(got))
  }

  test("span stream: one batch over an empty index == c4_span_dedup, row for row") {
    val batch = TextAnalysis.c4SpanDerivedCorpus(spark, sfDir)
    val got = rowsOf(C4Stream.detectSpans(spark, batch, emptyIndex, "span-empty"))
    val want = rowsOf(TextAnalysis.c4SpanDedup(spark, sfDir))
    assert(got === want,
      s"missing=${(want -- got).take(2)} extra=${(got -- want).take(2)}")
  }

  test("span stream: doc_id-ordered split + committed spans == the batch spelling") {
    val corpus = TextAnalysis.c4SpanDerivedCorpus(spark, sfDir)
    val mid = 250L
    val b1 = corpus.where(col("doc_id") < mid)
    val b2 = corpus.where(col("doc_id") >= mid)
    val out1 = C4Stream.detectSpans(spark, b1, emptyIndex, "span-split-1")
      .localCheckpoint()
    val idx = C4Stream.spansOf(b1).localCheckpoint()
    val out2 = C4Stream.detectSpans(spark, b2, idx, "span-split-2")
    assert(rowsOf(out1) ++ rowsOf(out2)
      === rowsOf(TextAnalysis.c4SpanDedup(spark, sfDir)),
      "in-order incremental span-dedup drifted from the corpus-wide batch run")
  }

  test("span stream: a committed block drops whole, even its once-removed copies") {
    // batch 1 carries the block once -> kept and committed; batch 2's
    // two copies BOTH drop (non-first globally), and batch 2's novel
    // duplicated block plays the within-batch rule
    val block = Seq("span nav a.", "span nav b.", "span nav c.")
    val b1 = Seq(C4Doc(300L, (Seq("b1 head.") ++ block).mkString("\n"))).toDF()
    val idx = C4Stream.spansOf(b1)
    val fresh = Seq("fresh x.", "fresh y.", "fresh z.")
    val b2 = Seq(
      C4Doc(310L, (block ++ fresh).mkString("\n")),
      C4Doc(311L, (fresh ++ Seq("tail.")).mkString("\n"))).toDF()
    val m = C4Stream.detectSpans(spark, b2, idx, "span-commit").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("kept_text")))).toMap
    // doc 310: committed block gone; its fresh triple is the FIRST
    // within-batch occurrence -> kept
    assert(m(310L) === ((3L, fresh.mkString("\n"))))
    // doc 311: its copy of the fresh triple lost to doc 310
    assert(m(311L) === ((1L, "tail.")))
  }

  test("runBatch: epoch redelivery after its own index commit replaces, never collapses") {
    val root = java.nio.file.Files.createTempDirectory("c4run").toString
    val (idxDir, outDir) = (s"$root/idx", s"$root/out")
    val b0 = Seq(
      C4Doc(400L, "epoch zero line.\nshared boilerplate."),
      C4Doc(401L, "shared boilerplate.\nepoch zero tail.")).toDF()
    C4Stream.runBatch(spark, b0, 0L, idxDir, outDir)
    val first = rowsOf(spark.read.parquet(outDir).drop("epoch"))
    // the advice scenario: index write landed, checkpoint did NOT
    // commit -> the whole epoch re-delivers with its own hashes
    // already in indexDir. It must not read them (epoch < 0 is
    // empty) and must replace, not append.
    C4Stream.runBatch(spark, b0, 0L, idxDir, outDir)
    val replay = spark.read.parquet(outDir)
    assert(rowsOf(replay.drop("epoch")) === first,
      "replayed epoch drifted from its first delivery")
    assert(replay.count() === 2L, "replayed epoch appended duplicate rows")
    assert(replay.where(col("n_kept") === 0L).count() === 0L,
      "replayed epoch saw its own commits and collapsed n_kept")
    // the next epoch DOES see epoch 0's commits (cross-batch dedup)
    val b1 = Seq(C4Doc(402L, "shared boilerplate.\nepoch one novel.")).toDF()
    C4Stream.runBatch(spark, b1, 1L, idxDir, outDir)
    val e1 = spark.read.parquet(outDir).where(col("epoch") === 1L).collect()
    assert(e1.length === 1 &&
      e1.head.getAs[String]("kept_text") === "epoch one novel.",
      "epoch 1 did not drop the line epoch 0 committed")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
}
