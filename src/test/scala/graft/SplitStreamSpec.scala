package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.SplitStream

/** Top-level row type: Spark encoders cannot reach a case class
  * nested in the suite instance.
  */
case class SplitDoc(doc_id: Long, text: String)

/** The streaming split twin must assign arriving docs EXACTLY as the
  * batch incremental split does when the whole delta is one batch,
  * keep matched-doc assignments invariant under any micro-batch
  * split (the frozen manifest decides them, not batch shape), and
  * reproduce byte-identical rows under at-least-once re-delivery
  * (stateless + deterministic coin).
  */
class SplitStreamSpec extends SparkSpec {

  private type Asg = (Long, Option[Long], Long, String)

  private def rowsOf(df: DataFrame): Set[Asg] =
    df.collect().map { r =>
      (r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
        r.getAs[Long]("group_id"), r.getAs[String]("split"))
    }.toSet

  private lazy val base = Dedup.corpusWithDups(spark, sfDir, perturb = true)
    .where(col("doc_id") < Dedup.CopyIdOffset)
    .select(col("doc_id"), col("text")).localCheckpoint()
  private lazy val manifest =
    Dedup.splitBaseManifest(spark, sfDir).localCheckpoint()
  private lazy val delta: Seq[SplitDoc] =
    Dedup.corpusWithDups(spark, sfDir, perturb = true)
      .where(col("doc_id") >= Dedup.CopyIdOffset)
      .collect()
      .map(r => SplitDoc(r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_.doc_id).toSeq

  private def md5Coin(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  test("whole delta in one batch == datasetSplitIncremental, row for row") {
    import spark.implicits._
    val got = rowsOf(SplitStream.assign(spark, delta.toDF(), base, manifest,
      indexKey = "spec-one"))
    val want = rowsOf(Dedup.datasetSplitIncremental(spark, sfDir))
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("streamed micro-batches: coverage, manifest-frozen matches, per-batch novel groups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("graft_split_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_split_stream_ck").toString
    val input = MemoryStream[SplitDoc]
    val query = SplitStream.run(spark, input.toDF(), base, manifest,
      indexKey = "spec-stream", outDir = s"$outDir/asg", checkpointDir = ckDir)
    val third = (delta.length + 2) / 3
    val batches = delta.grouped(third).toSeq
    try batches.foreach { b =>
      input.addData(b.toIndexedSeq); query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.read.parquet(s"$outDir/asg")
    val got = rowsOf(streamed)
    // exactly one row per delta doc
    assert(streamed.count() == delta.length.toLong)
    assert(got.map(_._1) == delta.map(_.doc_id).toSet)
    // matched docs: the frozen manifest decides, so any split of the
    // stream lands the same rows as the one-batch run
    val oneBatch = rowsOf(Dedup.datasetSplitIncremental(spark, sfDir))
    assert(got.filter(_._2.isDefined) == oneBatch.filter(_._2.isDefined),
      "a matched doc's assignment moved with the micro-batch shape")
    // novel docs: side is the deterministic coin of the group id, and
    // the group is batch-local (its min member arrived in the same batch)
    val batchOf = batches.zipWithIndex
      .flatMap { case (b, i) => b.map(d => d.doc_id -> i) }.toMap
    got.filter(_._2.isEmpty).foreach { case (id, _, group, split) =>
      val expect = if (md5Coin(group) < Dedup.SplitEvalFrac) "eval" else "train"
      assert(split == expect, s"novel doc $id: split $split != coin side")
      assert(batchOf(group) == batchOf(id),
        s"novel doc $id grouped across a batch boundary ($group)")
    }
  }

  test("re-delivery appends byte-identical rows: dedup by doc_id restores the single run") {
    import spark.implicits._
    val batch = delta.take(delta.length / 2)
    val once = rowsOf(SplitStream.assign(spark, batch.toDF(), base, manifest,
      indexKey = "spec-replay"))
    val again = rowsOf(SplitStream.assign(spark, batch.toDF(), base, manifest,
      indexKey = "spec-replay"))
    assert(once == again, "replayed batch produced different assignments")
  }
}
