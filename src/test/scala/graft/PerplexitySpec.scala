package graft

import org.apache.spark.sql.functions._

import graft.operators.Perplexity
import graft.sources.Tables

/** Invariants for the CCNet-style perplexity scorer (Perplexity.scala):
  * hand-computed LM parity, the reference-model smoothing seam, and the
  * structural bucket properties. The gate (sf0.001/sf0.01/sf0.1 DuckDB
  * compare) pins the full corpus; these pin the algebra and the seam
  * the gate can't see.
  */
class PerplexitySpec extends SparkSpec {

  private def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  test("self-trained bigram LM matches a hand computation") {
    import spark.implicits._
    // c(a,b)=2 c(b,a)=2 c(a,a)=1; c1(a)=3 c1(b)=2; V=2
    val corpus = Seq((1L, "a b a"), (2L, "b a"), (3L, "a a b"))
      .toDF("doc_id", "text")
    val got = Perplexity.scoreAgainst(Perplexity.modelOf(spark, corpus), corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent"))).toMap

    val pBA = 3.0 / 5   // P(b|a) = (2+1)/(3+2)
    val pAB = 3.0 / 4   // P(a|b) = (2+1)/(2+2)
    val pAA = 2.0 / 5   // P(a|a) = (1+1)/(3+2)
    assert(got(1L) === ((2L, r4(-(math.log(pBA) + math.log(pAB)) / 2))))
    assert(got(2L) === ((1L, r4(-math.log(pAB)))))
    assert(got(3L) === ((2L, r4(-(math.log(pAA) + math.log(pBA)) / 2))))
  }

  test("reference-model seam: unseen bigrams take the smoothed floor, not a dropout") {
    import spark.implicits._
    // model corpus: "a b a b" -> c(a,b)=2 c(b,a)=1; c1(a)=2 c1(b)=1; V=2
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val model = Perplexity.modelOf(spark, ref)
    // scored corpus has bigrams the model never saw
    val crawl = Seq(
      (9L, "a c"),   // unseen bigram, seen prefix:  P = 1/(2+2)
      (10L, "c c"))  // unseen prefix too:           P = 1/(0+2)
      .toDF("doc_id", "text")
    val got = Perplexity.scoreAgainst(model, crawl)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent"))).toMap

    // every doc is scored over ALL its bigrams — nothing dropped
    assert(got(9L) === ((1L, r4(-math.log(1.0 / 4)))))
    assert(got(10L) === ((1L, r4(-math.log(1.0 / 2)))))
  }

  test("reference-trained gate query diverges from self-trained where the model is blind") {
    val self = Perplexity.qualityPerplexity(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val ref = Perplexity.qualityPerplexityRef(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    // same scoreable population, but the tiny reference model must
    // score differently (novel bigrams take the smoothing floor) —
    // proves the ref path is not accidentally the self-trained path
    assert(ref.keySet === self.keySet)
    assert(ref.count { case (id, x) => x != self(id) } > 0)
  }

  test("buckets partition the scoreable corpus into ordered terciles") {
    val docs = Tables.documents(spark, sfDir)
    val scoreable = docs
      .where(size(split(col("text"), " ")) >= 2).count()
    val b = Perplexity.qualityPerplexityBuckets(spark, sfDir).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("min_xent"), r.getAs[Double]("max_xent")))
      .toMap

    // a partition: every scoreable doc lands in exactly one bucket
    assert(b.values.map(_._1).sum === scoreable)
    assert(b.keySet === Set("head", "middle", "tail"))
    // ordered, non-overlapping score ranges (thresholds on the round4
    // grid make the boundaries strict)
    assert(b("head")._3 < b("middle")._2)
    assert(b("middle")._3 < b("tail")._2)
    // terciles: no bucket is empty or grossly lopsided on this corpus
    assert(b.values.forall(_._1 > 0))
  }

  test("sampled calibration still buckets the FULL corpus") {
    val docs = Tables.documents(spark, sfDir)
    val scoreable = docs
      .where(size(split(col("text"), " ")) >= 2).count()
    val b = Perplexity.qualityPerplexityBuckets(spark, sfDir, calibFrac = 0.5)
      .collect()
    // cutoffs move (they come from the md5-coin half) but every doc is
    // still assigned: the scan side never shrinks with calibFrac
    assert(b.map(_.getAs[Long]("n_docs")).sum === scoreable)
  }
}
