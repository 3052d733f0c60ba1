package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Curate
import graft.streaming.{CurateStream, DocIn}

/** The incremental curation pipeline must reproduce the batch
  * funnel's cleaned corpus when documents arrive in ascending id
  * order (where keep-min ≡ keep-first), across any micro-batch
  * split, and stay incremental: a batch only pays for its own docs
  * plus bounded state joins.
  */
class CurateStreamSpec extends SparkSpec {

  /** The batch funnel's input corpus, ascending — batch keep-min
    * rules coincide with keep-first-arrival in this order.
    */
  private def corpusAscending(): Seq[(Long, String)] =
    Curate.curateCorpus(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1).toSeq

  test("streamed curation over ascending micro-batches equals batch curate_apply") {
    val stateDir = Files.createTempDirectory("graft_curate_stream").toString
    val corpus = corpusAscending()
    import spark.implicits._
    // three uneven batches, processed through the foreachBatch body
    val cuts = Seq(corpus.length / 3, 2 * corpus.length / 3, corpus.length)
    var from = 0
    cuts.foreach { to =>
      CurateStream.processBatch(
        corpus.slice(from, to).toDF("doc_id", "text"), stateDir)
      from = to
    }
    val streamed = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
      .sortBy(_._1).toSeq
    val batch = Curate.curateApply(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
      .sortBy(_._1).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed kept ${streamed.size} docs vs batch ${batch.size}; " +
        s"missing=${(batch.map(_._1).toSet -- streamed.map(_._1).toSet).take(5)} " +
        s"extra=${(streamed.map(_._1).toSet -- batch.map(_._1).toSet).take(5)}")
  }

  test("re-delivered batch is a no-op: exact state makes reprocessing idempotent") {
    val stateDir = Files.createTempDirectory("graft_curate_redeliver").toString
    val corpus = corpusAscending()
    import spark.implicits._
    val half = corpus.length / 2
    CurateStream.processBatch(corpus.take(half).toDF("doc_id", "text"), stateDir)
    val after1 = CurateStream.keptCorpus(spark, stateDir).count()
    // the at-least-once case: the SAME batch arrives again
    CurateStream.processBatch(corpus.take(half).toDF("doc_id", "text"), stateDir)
    assert(CurateStream.keptCorpus(spark, stateDir).count() == after1,
      "re-delivery changed the kept corpus")
    CurateStream.processBatch(corpus.drop(half).toDF("doc_id", "text"), stateDir)
    val streamed = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val batch = Curate.curateApply(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(streamed == batch, "re-delivery broke end-state parity")
  }

  test("out-of-order near-dup arrival keeps the FIRST arrival, not both") {
    val stateDir = Files.createTempDirectory("graft_curate_ooo").toString
    import spark.implicits._
    // find a %13 base doc where BOTH the original and its +200000
    // near-copy pass the per-row gates (so the near-dup stage decides)
    val corpus = corpusAscending().toMap
    val passing = Curate.gateFlags(corpusAscending().toSeq.toDF("doc_id", "text"))
      .where(col("valid") && col("quality_ok") && col("lang_ok"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    def shingles(t: String) = t.split(" ").sliding(3).filter(_.length == 3).map(_.toSeq).toSet
    val x = corpus.keys.filter(id => id % 13 == 0 && id < 100000)
      .filter(id => passing(id) && passing(id + 200000L))
      .find { id =>
        val (a, b) = (shingles(corpus(id)), shingles(corpus(id + 200000L)))
        val inter = (a & b).size
        inter.toDouble / (a.size + b.size - inter) >= Curate.NearDupJaccard
      }.getOrElse(fail("no gate-passing strong near-dup pair in the corpus"))
    // the LATER-ID copy arrives FIRST; keep-first must retain it and
    // drop the original when it arrives — never keep both
    CurateStream.processBatch(
      Seq((x + 200000L, corpus(x + 200000L))).toDF("doc_id", "text"), stateDir)
    CurateStream.processBatch(
      Seq((x, corpus(x))).toDF("doc_id", "text"), stateDir)
    val kept = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(x + 200000L),
      s"expected only the first arrival ${x + 200000L} kept, got $kept")
  }

  test("a benchmark doc arriving late revokes the kept docs it contaminates") {
    val stateDir = Files.createTempDirectory("graft_curate_revoke").toString
    import spark.implicits._
    val corpus = corpusAscending()
    // batch 1: a natural training doc T
    val (tId, tText) = corpus.find { case (id, t) =>
      id % 101 != 0 && id < 100000 && t.split(" ").length >= 20
    }.get
    CurateStream.processBatch(Seq((tId, tText)).toDF("doc_id", "text"), stateDir)
    assert(CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet == Set(tId))
    // batch 2: a benchmark-id doc CONTAINING T's text plus enough
    // extra (T's own words reshuffled) that jaccard stays under the
    // near-dup floor while T's overlap against it is 1.0
    val extra = tText.split(" ").reverse.mkString(" ")
    val bId = 707000L   // 101 * 7000
    CurateStream.processBatch(
      Seq((bId, tText + " " + extra)).toDF("doc_id", "text"), stateDir)
    val kept = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!kept.contains(bId), "benchmark doc must never enter the kept corpus")
    assert(!kept.contains(tId),
      "late-arriving benchmark doc failed to revoke the contaminated kept doc")
  }

  test("curateUpsert wires the same merge through a real stream") {
    val stateDir = Files.createTempDirectory("graft_curate_sink").toString
    val ckpt = Files.createTempDirectory("graft_curate_ckpt").toString
    val corpus = corpusAscending()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocIn]
    val q = CurateStream.curateUpsert(
        input.toDS().select(col("doc_id"), col("text")), stateDir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val t0 = 1700000000000L
      corpus.zipWithIndex.map { case ((id, t), i) => DocIn(id, t0 + i, t) }
        .grouped(400).foreach { b =>
          input.addData(b.toIndexedSeq); q.processAllAvailable()
        }
      val streamed = CurateStream.keptCorpus(spark, stateDir)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      val batch = Curate.curateApply(spark, sfDir)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
