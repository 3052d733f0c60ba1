package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.operators.VectorSearch
import graft.sources.Tables
import graft.streaming.SemDedupStream

/** Top-level row type: Spark encoders cannot reach a case class
  * nested in the suite instance.
  */
case class SemVec(vec_id: Long, emb: Seq[Double])

/** The streaming SemDeDup twin must equal the batch report when one
  * batch arrives over an empty index, drop arrivals dominated by the
  * FROZEN survivor index (and only those — the index is append-only),
  * keep verdicts invariant under the micro-batch splits this corpus
  * admits, and reproduce byte-identical rows under re-delivery.
  */
class SemDedupStreamSpec extends SparkSpec {

  import spark.implicits._

  private type Verdict = (Long, Long, Double, Boolean)

  private def rowsOf(df: DataFrame): Set[Verdict] =
    df.collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
        r.getAs[Double]("ccos"), r.getAs[Boolean]("keep"))
    }.toSet

  private def emptyIndex: DataFrame =
    Seq.empty[(Long, Long, Double, Seq[Double])]
      .toDF("vec_id", "label", "ccos", "emb")

  private def unit(deg: Double): Seq[Double] =
    Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))

  /** Two hand cells: centroid 0 on the x axis, centroid 1 on y. */
  private def handCent: DataFrame =
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("label", "c_emb")

  /** Frozen survivor at 30 deg in cell 0 — ccos spelled exactly as
    * the batch would commit it (round4(cos 30) = 0.866).
    */
  private def frozenF: DataFrame =
    Seq((5L, 0L, 0.866, unit(30))).toDF("vec_id", "label", "ccos", "emb")

  test("one batch over an empty index == batch semdedup, row for row") {
    val batch = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") >= VectorSearch.NQueries)
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
    val got = rowsOf(SemDedupStream.detect(spark, batch,
      VectorSearch.kmeansCentroids(spark, sfDir), emptyIndex, "spec-empty"))
    val want = rowsOf(VectorSearch.semDedup(spark, sfDir))
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("frozen survivors dominate arrivals; the index is append-only") {
    // A at 20 deg (cell 0, ccos cos20~0.9397): cos(F,A)=cos10 >= tau
    // and F.ccos 0.866 < A's -> dropped.
    // B at 40 deg (cell 0, ccos cos40~0.766): cos(F,B)=cos10 >= tau
    // but B's ccos is LOWER than F's -> KEPT (B cannot retroactively
    // drop the committed F — append-only).
    // C at 88 deg lands in cell 1, alone there -> kept.
    val batch = Seq(SemVec(10L, unit(20)), SemVec(11L, unit(40)),
      SemVec(12L, unit(88))).toDF()
    val got = SemDedupStream.detect(spark, batch, handCent, frozenF,
        "spec-frozen").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got == Map(10L -> false, 11L -> true, 12L -> true))
  }

  test("within-batch domination runs in cells the frozen index does not own") {
    // D at 75 deg and E at 65 deg both land in CELL 1 (closer to the
    // y centroid), where no frozen survivor exists; ccos is measured
    // from y: D ~cos15=0.9659, E ~cos25=0.9063. cos(D,E)=cos10 >= tau
    // and E's ccos is lower -> E dominates D within the batch: D
    // dropped, E kept — the frozen cell-0 index never meets them.
    val batch = Seq(SemVec(20L, unit(75)), SemVec(21L, unit(65))).toDF()
    val got = SemDedupStream.detect(spark, batch, handCent, frozenF,
        "spec-frozen2").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got == Map(20L -> false, 21L -> true))
  }

  test("an empty micro-batch yields an empty verdict frame, not a failure") {
    val empty = Seq.empty[SemVec].toDF()
    assert(SemDedupStream.detect(spark, empty, handCent, frozenF,
      "spec-emptybatch").collect().isEmpty)
  }

  test("re-delivery reproduces byte-identical verdicts") {
    val batch = Seq(SemVec(10L, unit(20)), SemVec(11L, unit(40))).toDF()
    val once = rowsOf(SemDedupStream.detect(spark, batch, handCent,
      frozenF, "spec-replay"))
    val twice = rowsOf(SemDedupStream.detect(spark, batch, handCent,
      frozenF, "spec-replay"))
    assert(once == twice)
  }

  test("streamed micro-batches: verdicts match the one-batch run") {
    implicit val sqlCtx = spark.sqlContext
    val frozen = Seq((5L, 0L, 0.866, unit(30)), (6L, 1L, 0.9659, unit(75)))
      .toDF("vec_id", "label", "ccos", "emb").localCheckpoint()
    // 10 at 25 deg: cell 0, dropped by frozen 5 (cos5 >= tau, 0.866 <
    //   cos25). 11 at 80 deg: cell 1, dropped by frozen 6 (cos5 >=
    //   tau, 0.9659 < cos10). 12 at -42 deg: cell 0, cos(F,12)=cos72
    //   < tau -> kept. The only batching-dependent pair is (10, 12)
    //   at cos67 >= tau — it cannot flip a verdict under any split:
    //   10 is dropped by the frozen index in EVERY batching, and 12's
    //   ccos is lower so 10 can never dominate it.
    val arrivals = Seq(SemVec(10L, unit(25)), SemVec(11L, unit(80)),
      SemVec(12L, unit(-42)))
    val outDir = Files.createTempDirectory("graft_sem_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_sem_stream_ck").toString
    val input = MemoryStream[SemVec]
    val query = SemDedupStream.run(spark, input.toDF(), handCent, frozen,
      "spec-stream", s"$outDir/verdicts", ckDir)
    try arrivals.foreach { v =>
      input.addData(v); query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.read.parquet(s"$outDir/verdicts")
    val perBatch = streamed.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(streamed.count() == 3)
    assert(perBatch == Map(10L -> false, 11L -> false, 12L -> true))
    // one-batch run agrees: the frozen index decides, not batch shape
    val oneBatch = SemDedupStream.detect(spark, arrivals.toDF(), handCent,
        frozen, "spec-stream").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(oneBatch == perBatch)
  }
}
