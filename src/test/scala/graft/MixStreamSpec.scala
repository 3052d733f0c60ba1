package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Pack
import graft.sources.Tables
import graft.streaming.MixStream

/** Top-level row type: Spark encoders cannot reach a case class
  * nested in the suite instance.
  */
case class MixDoc(doc_id: Long, lang: String)

/** The streaming mixer applies an EPOCH-FROZEN rate table statelessly
  * (see MixStream's scaladoc for why mixing cannot honestly
  * self-adjust mid-epoch): under the same rates, the stream must keep
  * exactly the documents the batch mixer keeps, for any micro-batch
  * split, and re-delivery must be idempotent (the coin is a pure
  * function of doc_id).
  */
class MixStreamSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[MixDoc]], rates: Seq[(String, Double)],
      name: String): Seq[Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MixDoc]
    val ratesDf = rates.toDF("lang", "rate")
    val query = MixStream.mixApply(spark, input.toDF(), ratesDf)
      .select("doc_id")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); query.processAllAvailable() }
      spark.table(name).collect().map(_.getAs[Long]("doc_id")).toSeq.sorted
    } finally query.stop()
  }

  test("frozen-rate stream keeps exactly the batch mixer's set, for any split") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
      .as[MixDoc].collect().toSeq.sortBy(_.doc_id)
    // the epoch's frozen table IS the batch rate build
    val rates = Pack.mixRatesOf(spark, Tables.documents(spark, sfDir), "lang")
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("rate")).toSeq
    val expected = Pack.datasetMix(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSeq.sorted

    assert(runStream(Seq(docs), rates, "mix_all") === expected)
    val third = (docs.length + 2) / 3
    assert(runStream(docs.grouped(third).toSeq, rates, "mix_split") === expected)
  }

  test("re-delivery is idempotent-equivalent: a replayed batch keeps the same subset") {
    val docs = Seq(MixDoc(1, "a"), MixDoc(2, "a"), MixDoc(3, "b"), MixDoc(4, "b"))
    val rates = Seq("a" -> 1.0, "b" -> 0.5)
    val once = runStream(Seq(docs), rates, "mix_once")
    val replayed = runStream(Seq(docs, docs), rates, "mix_replay")
    // at-least-once delivery duplicates rows, never changes the KEPT SET
    assert(replayed.distinct === once.distinct)
  }

  test("malformed inputs fail loudly") {
    import spark.implicits._
    val ratesBad = Seq(("a", 0.5, 1)).toDF("lang", "rate", "extra")
    val docsDf = Seq(MixDoc(1, "a")).toDF()
    intercept[IllegalArgumentException](
      MixStream.mixApply(spark, docsDf, ratesBad))
    intercept[IllegalArgumentException](
      MixStream.mixApply(spark, docsDf.drop("lang"),
        Seq(("a", 0.5)).toDF("lang", "rate")))
  }
}
