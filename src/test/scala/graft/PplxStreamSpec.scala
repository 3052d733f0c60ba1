package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row

import graft.operators.Perplexity
import graft.sources.Tables
import graft.streaming.PplxStream

/** Top-level row type: Spark encoders cannot reach a case class
  * nested in the suite instance.
  */
case class PplxDoc(doc_id: Long, text: String)

/** The streaming scorer applies an EPOCH-FROZEN bigram LM via
  * foreachBatch (see PplxStream's scaladoc for why the per-doc fold
  * is batch-local and stateless): under the same model, the stream
  * must score exactly what the batch scorer scores, for any
  * micro-batch split, and re-delivery must re-publish identical rows.
  */
class PplxStreamSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[PplxDoc]],
      model: org.apache.spark.sql.DataFrame,
      cuts: Option[org.apache.spark.sql.DataFrame] = None,
      scorer: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
        => org.apache.spark.sql.DataFrame = Perplexity.scoreAgainst(_, _))
      : Seq[Row] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PplxDoc]
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    val query = PplxStream.scoreSink(input.toDF(), model, cuts, scorer) { scored =>
      out.synchronized { out ++= scored.collect() }
    }.start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); query.processAllAvailable() }
      out.sortBy(_.getAs[Long]("doc_id")).toSeq
    } finally query.stop()
  }

  test("frozen-model stream scores exactly the batch scorer's frame, for any split") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir)
    val model = Perplexity.modelOf(spark, corpus)
      .localCheckpoint()   // freeze the artifact once
    val docs = corpus.select("doc_id", "text").as[PplxDoc]
      .collect().toSeq.sortBy(_.doc_id)
    val expected = Perplexity.scoreAgainst(model, corpus)
      .orderBy("doc_id").collect().toSeq

    assert(runStream(Seq(docs), model) === expected)
    val third = (docs.length + 2) / 3
    assert(runStream(docs.grouped(third).toSeq, model) === expected)
  }

  test("frozen cutoffs tag the batch bucket; re-delivery re-publishes identical rows") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val model = Perplexity.modelOf(spark, ref).localCheckpoint()
    val cuts = Seq((0.5, 1.0)).toDF("c1", "c2")
    val docs = Seq(PplxDoc(9L, "a b"), PplxDoc(10L, "c c"))

    val once = runStream(Seq(docs), model, Some(cuts))
    assert(once.map(_.getAs[String]("bucket")).forall(Set("head", "middle", "tail")))
    // scores are a pure function of (model, text): replay duplicates
    // rows but never changes a score or a bucket
    val replayed = runStream(Seq(docs, docs), model, Some(cuts))
    assert(replayed.distinct === once.distinct)
  }

  test("the scorer seam: a KN-scored stream equals the KN batch scorer") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir)
    val coin = graft.functions.TextFunctions.md5Long(
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("pplxref:"),
        org.apache.spark.sql.functions.col("doc_id").cast("string")), 1, 8)
      .cast("double") / 4294967296.0
    val model = Perplexity.modelOf(spark, corpus.where(coin < 0.05))
      .localCheckpoint()
    val docs = corpus.select("doc_id", "text").as[PplxDoc]
      .collect().toSeq.sortBy(_.doc_id).take(200)
    val batch = Perplexity.scoreAgainstKn(model,
        docs.toDF().select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")))
      .orderBy("doc_id").collect().toSeq
    val third = (docs.length + 2) / 3
    assert(runStream(docs.grouped(third).toSeq, model,
      scorer = Perplexity.scoreAgainstKn(_, _)) === batch)
  }

  test("malformed inputs fail loudly") {
    import spark.implicits._
    val model = Perplexity.modelOf(spark,
      Seq((1L, "a b")).toDF("doc_id", "text"))
    val docsDf = Seq(PplxDoc(1L, "a b")).toDF()
    intercept[IllegalArgumentException](
      PplxStream.scoreSink(docsDf.drop("text"), model)(_ => ()))
    intercept[IllegalArgumentException](
      PplxStream.scoreSink(docsDf, model,
        Some(Seq((0.5, 1.0, 9)).toDF("c1", "c2", "x")))(_ => ()))
  }
}
