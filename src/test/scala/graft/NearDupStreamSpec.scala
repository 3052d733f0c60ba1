package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DocIn, NearDupStream}

/** The streaming MinHash near-dup detector must surface the same
  * band-collision candidates as the batch build on the same corpus
  * (SURVEY.md §2.G), with bounded per-bucket state.
  */
class NearDupStreamSpec extends SparkSpec {

  /** The batch near-dup corpus shape (Dedup.corpusWithDups with
    * perturb=true): documents ∪ every-7th doc at doc_id + 100000 with
    * its first word dropped — near- rather than exact duplicates.
    */
  private def perturbedCorpus(): Seq[(Long, String)] = {
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1).toSeq
    base ++ base.filter(_._1 % 7 == 0).map { case (id, t) =>
      (id + 100000L, t.dropWhile(_ != ' ').drop(1))
    }
  }

  test("streamed candidates equal the static band self-join; batch verified pairs are contained") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = perturbedCorpus()
    val t0 = 1700000000000L
    val docs = corpus.zipWithIndex.map { case ((id, t), i) =>
      DocIn(id, t0 + i * 1000L, t)
    }

    // expected: every (a<b) pair sharing a band bucket, from the SAME
    // banded projection run statically
    val stat = NearDupStream.banded(
      docs.toDF("doc_id", "ts_ms", "text"))
    val expected = stat.select(col("bd"), col("band_key"), col("doc_id").as("a_id"))
      .join(stat.select(col("bd"), col("band_key"), col("doc_id").as("b_id")),
        Seq("bd", "band_key"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val input = MemoryStream[DocIn]
    val query = NearDupStream.nearDupPairs(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("neardup").start()
    try {
      docs.grouped(400).foreach { b =>
        input.addData(b.toIndexedSeq); query.processAllAvailable()
      }
      val streamed = spark.table("neardup").collect()
      val pairs = streamed.map(r =>
        (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      assert(pairs === expected,
        s"streamed ${pairs.size} distinct pairs vs static ${expected.size}")

      // any emission's bucket guarantees its band's 4 minima match
      streamed.foreach { r =>
        assert(r.getAs[Double]("est_jaccard") >= 0.25 - 1e-9)
      }

      // the batch VERIFIED pairs are band collisions by construction,
      // so the stream must have surfaced every one of them
      val batch = graft.operators.Dedup.minhashPairs(spark, sfDir)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty && batch.subsetOf(pairs),
        s"${(batch -- pairs).size} batch pairs missing from the stream")
    } finally query.stop()
  }

  test("a hot bucket pairs each arrival against at most the state cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = NearDupStream.MaxBucketDocs + 44
    val t0 = 1700000000000L
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (1 to n).map(i => DocIn(i.toLong, t0 + i * 1000L, text))

    val input = MemoryStream[DocIn]
    val query = NearDupStream.nearDupPairs(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("hot").start()
    try {
      docs.grouped(100).foreach { b =>
        input.addData(b.toIndexedSeq); query.processAllAvailable()
      }
      val pairs = spark.table("hot").collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      // identical docs: the i-th arrival pairs with exactly the
      // min(i-1, cap) retained partners, in every band — the same
      // pair set, so the distinct count is the exact window sum
      val cap = NearDupStream.MaxBucketDocs
      val want = (2 to n).map(i => math.min(i - 1, cap)).sum
      assert(pairs.size === want,
        s"expected the capped pair-window sum $want, got ${pairs.size}")
    } finally query.stop()
  }
}
