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

  test("streamed verified jaccard: exact below the sketch cap; floor-filtered pairs ⊆ batch verified") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // every doc has < SketchSize distinct 3-gram shingles, so the
    // bottom-k sketch IS the shingle set and the streamed jaccard is
    // EXACT — comparable 1:1 against a driver-side posting-set jaccard
    val corpus = perturbedCorpus().map { case (id, t) =>
      (id, t.split(" ").take(40).mkString(" "))   // ≤ 38 shingles
    }
    def shingleSet(t: String): Set[Seq[String]] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.toSeq).toSet
    val exact = {
      val sets = corpus.toMap.view.mapValues(shingleSet).toMap
      for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size if inter > 0
      } yield (a, b) -> inter.toDouble / (sa.size + sb.size - inter)
    }
    val t0 = 1700000000000L
    val docs = corpus.zipWithIndex.map { case ((id, t), i) =>
      DocIn(id, t0 + i * 1000L, t)
    }
    val input = MemoryStream[DocIn]
    val query = NearDupStream.nearDupPairs(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ndverif").start()
    try {
      docs.grouped(400).foreach { b =>
        input.addData(b.toIndexedSeq); query.processAllAvailable()
      }
      val streamed = spark.table("ndverif").collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
          r.getAs[Double]("jaccard")).toMap
      assert(streamed.nonEmpty)
      // exactness: every emitted pair's verified jaccard equals the
      // driver-side posting-set jaccard bit-for-bit
      streamed.foreach { case (pair, jac) =>
        assert(jac == exact.getOrElse(pair, 0.0), s"pair $pair")
      }
      // the floor contract: streamed pairs at jaccard ≥ 0.8 are a
      // subset of the batch verified pairs at the SAME floor (the
      // stream can miss pairs — retention, caps — but never invent)
      val batchVerified = exact.filter(_._2 >= 0.8).keySet
      val streamedStrong = streamed.filter(_._2 >= 0.8).keys.toSet
      assert(streamedStrong.nonEmpty, "no strong pairs streamed at all")
      assert(streamedStrong.subsetOf(batchVerified),
        s"${(streamedStrong -- batchVerified).size} streamed pairs not batch-verified")
    } finally query.stop()
  }

  test("sketchJaccard: exact under the cap, bounded and sane over it") {
    import graft.streaming.NearDupStream.{sketchJaccard, SketchSize}
    // under the cap: plain set jaccard
    assert(sketchJaccard(Seq(1L, 2L, 3L), 3, Seq(2L, 3L, 4L), 3) == 0.5)
    assert(sketchJaccard(Seq(1L), 1, Seq(2L), 1) == 0.0)
    assert(sketchJaccard(Seq.empty, 0, Seq.empty, 0) == 0.0)
    // over the cap: identical sketches of oversized docs → estimate 1
    val big = (1L to (SketchSize + 50L)).toSeq
    val sk = big.take(SketchSize)
    assert(sketchJaccard(sk, big.size.toLong, sk, big.size.toLong) == 1.0)
    // disjoint oversized docs → 0
    val sk2 = big.map(_ + 1000000L).take(SketchSize)
    assert(sketchJaccard(sk, big.size.toLong, sk2, big.size.toLong) == 0.0)
    // half-overlap estimate stays within [0, 1]
    val a = (1L to 100L).take(SketchSize)
    val b = (51L to 150L).take(SketchSize)
    val est = sketchJaccard(a, 100, b, 100)
    assert(est >= 0.0 && est <= 1.0)
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
