package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.md5Long
import graft.operators.Perplexity
import graft.sources.Tables
import graft.streaming.DsirStream

/** The streaming DSIR scorer applies two EPOCH-FROZEN models via
  * foreachBatch: under the same (raw, target) artifacts the stream
  * must publish exactly the batch scorer's ratios, for any
  * micro-batch split, and re-delivery must re-publish identical rows.
  */
class DsirStreamSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[PplxDoc]],
      raw: org.apache.spark.sql.DataFrame,
      tgt: org.apache.spark.sql.DataFrame): Seq[Row] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PplxDoc]
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    val query = DsirStream.scoreSink(input.toDF(), raw, tgt) { scored =>
      out.synchronized { out ++= scored.collect() }
    }.start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); query.processAllAvailable() }
      out.sortBy(_.getAs[Long]("doc_id")).toSeq
    } finally query.stop()
  }

  test("frozen-model stream publishes exactly the batch DSIR frame, for any split") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir)
    val target = corpus.where(
      md5Long(concat(lit("dsir:"), col("doc_id").cast("string")), 1, 8)
        .cast("double") / 4294967296.0 < Perplexity.DefaultDsirTargetFrac)
    val raw = Perplexity.modelOf(spark, corpus).localCheckpoint()
    val tgt = Perplexity.modelOf(spark, target).localCheckpoint()
    val docs = corpus.select("doc_id", "text").as[PplxDoc]
      .collect().toSeq.sortBy(_.doc_id)
    val expected = Perplexity.dsirScoreAgainst(raw, tgt, corpus)
      .orderBy("doc_id").collect().toSeq

    // one batch, then an uneven split — row-identical both ways, and
    // identical to the GATED query's frame (same corpus, same coin)
    assert(runStream(Seq(docs), raw, tgt) === expected)
    val third = (docs.length + 2) / 3
    assert(runStream(docs.grouped(third).toSeq, raw, tgt) === expected)
    val gated = Perplexity.dsirScore(spark, sfDir).orderBy("doc_id").collect().toSeq
    assert(expected === gated)
  }

  test("re-delivery republishes identical rows (pure function of models + text)") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b c"), (2L, "b a c a")).toDF("doc_id", "text")
    val tgt = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val raw = Perplexity.modelOf(spark, ref).localCheckpoint()
    val tgtM = Perplexity.modelOf(spark, tgt).localCheckpoint()
    val docs = ref.as[PplxDoc].collect().toSeq
    val once = runStream(Seq(docs), raw, tgtM)
    val twice = runStream(Seq(docs, docs), raw, tgtM)
    assert(twice.length == 2 * once.length)
    assert(twice.grouped(2).forall(g => g(0) == g(1)))
  }
}
