package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.md5Long
import graft.operators.Perplexity
import graft.sources.Tables

/** DSIR importance scoring (Perplexity.dsirScoreOf): planted
  * distribution-shift separation, the difference-of-rounded parity
  * receipt, and the deterministic top-k selection contract.
  */
class DsirSpec extends SparkSpec {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("planted distribution shift: target-like docs outrank raw-like docs") {
    import spark.implicits._
    // two disjoint-vocabulary populations; the target model sees only
    // population A, so population B's bigrams all hit the smoothing
    // floor and its log_ratio collapses
    def weave(ws: Seq[String]) = Seq.fill(12)(ws).flatten.mkString(" ")
    val tgtLike = (1L to 6L).map(i => (i, weave(Seq("aa", "bb", "cc"))))
    val rawLike = (11L to 16L).map(i => (i, weave(Seq("xx", "yy", "zz"))))
    val corpus = (tgtLike ++ rawLike).toDF("doc_id", "text")
    val target = tgtLike.toDF("doc_id", "text")
    val scored = Perplexity.dsirScoreOf(spark, target, corpus).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("log_ratio")).toMap
    assert(scored.size == 12)
    val minT = tgtLike.map(t => scored(t._1)).min
    val maxR = rawLike.map(t => scored(t._1)).max
    assert(minT > maxR + 0.5,
      s"target-like docs must clearly outrank raw-like: $minT vs $maxR")
  }

  test("gated table equals round4(xent_self - xent_target); midpoint margin holds") {
    val corpus = Tables.documents(spark, sfDir)
    val target = corpus.where(
      md5Long(concat(lit("dsir:"), col("doc_id").cast("string")), 1, 8)
        .cast("double") / 4294967296.0 < Perplexity.DefaultDsirTargetFrac)
    val self = Perplexity.scoreAgainst(Perplexity.modelOf(spark, corpus), corpus)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("xent")).toMap
    val tgt = Perplexity.scoreAgainst(Perplexity.modelOf(spark, target), corpus)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("xent")).toMap
    val gated = Perplexity.dsirScore(spark, sfDir).collect()
    assert(gated.length == self.size)
    var minDist = Double.MaxValue
    gated.foreach { r =>
      val id = r.getLong(0)
      val diff = self(id) - tgt(id)
      assert(r.getAs[Double]("log_ratio") == r4(diff), s"doc $id")
      // difference of two 4-decimal values: distance from the nearest
      // round4 midpoint is ~5e-5 by construction — measure it
      val y = diff * 10000.0
      val frac = y - math.floor(y)
      minDist = math.min(minDist, math.abs(frac - 0.5) / 10000.0)
    }
    assert(minDist > 1e-6, s"round4 midpoint margin too thin: $minDist")
  }

  test("dsir_select is the top-k prefix of the score table's total order") {
    val all = Perplexity.dsirScore(spark, sfDir).collect()
    val sel = Perplexity.dsirSelect(spark, sfDir).collect()
    assert(sel.length == math.min(Perplexity.DefaultDsirK, all.length))
    val expect = all
      .sortBy(r => (-r.getAs[Double]("log_ratio"), r.getLong(0)))
      .take(sel.length).map(_.getLong(0)).toSeq
    assert(sel.map(_.getLong(0)).toSeq == expect)
    intercept[IllegalArgumentException](Perplexity.dsirSelect(spark, sfDir, k = 0))
  }
}
