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

  test("interpolated scorer matches a hand computation") {
    import spark.implicits._
    // model: c(a,b)=2 c(b,a)=2 c(a,a)=1; c1(a)=3 c1(b)=2; V=2; N=5
    // unigram backbone cu = counts as SECOND token: cu(a)=3 cu(b)=2
    val corpus = Seq((1L, "a b a"), (2L, "b a"), (3L, "a a b"))
      .toDF("doc_id", "text")
    val got = Perplexity.scoreAgainstInterp(
        Perplexity.modelOf(spark, corpus), corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent"))).toMap
    def p(c12: Double, c1: Double, cu: Double): Double =
      0.75 * (c12 / c1) + 0.25 * ((cu + 1.0) / (5.0 + 2.0))
    val pBA = p(2, 3, 2)   // P(b|a): c12=2 c1(a)=3 cu(b)=2
    val pAB = p(2, 2, 3)   // P(a|b): c12=2 c1(b)=2 cu(a)=3
    val pAA = p(1, 3, 3)   // P(a|a): c12=1 c1(a)=3 cu(a)=3
    assert(got(1L) === ((2L, r4(-(math.log(pBA) + math.log(pAB)) / 2))))
    assert(got(2L) === ((1L, r4(-math.log(pAB)))))
    assert(got(3L) === ((2L, r4(-(math.log(pAA) + math.log(pBA)) / 2))))
  }

  test("interpolation ranks rare-but-valid text above frequent-context noise where add-one cannot") {
    import spark.implicits._
    // model: context "of" is frequent with a WEAK continuation "b"
    // (c12=5, c1=100); context "zq" is rare with a PERFECT
    // continuation (c12=c1=1); ~100 hapax tokens inflate V so
    // add-one's uniform floor dominates rare contexts
    val filler = (1 to 102).map(i => s"u$i").mkString(" ")
    val model = Perplexity.modelOf(spark,
      ((1 to 95).map(i => (i.toLong, "of a")) ++
       (96 to 100).map(i => (i.toLong, "of b")) :+
       (101L, "zq qz") :+ (102L, filler)).toDF("doc_id", "text"))
    val crawl = Seq((1L, "of b"), (2L, "zq qz")).toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val addone = scores(Perplexity.scoreAgainst(model, crawl))
    val interp = scores(Perplexity.scoreAgainstInterp(model, crawl))
    // add-one: the rare-context doc scores WORSE (higher xent) than
    // the frequent-context weak continuation...
    assert(addone(2L) > addone(1L))
    // ...interpolation flips the order: the observed conditional
    // dominates, so the rare-but-valid doc scores (much) better
    assert(interp(2L) < interp(1L))
  }

  test("Kneser-Ney scorer matches a hand computation") {
    import spark.implicits._
    // model: c(a,b)=2 c(b,a)=2 c(a,a)=1; c1(a)=3 c1(b)=2
    // n1f(a)=2 n1f(b)=1; n1b(a)=2 n1b(b)=1; ND=3; V=2
    val corpus = Seq((1L, "a b a"), (2L, "b a"), (3L, "a a b"))
      .toDF("doc_id", "text")
    val got = Perplexity.scoreAgainstKn(
        Perplexity.modelOf(spark, corpus), corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent"))).toMap
    // operand shapes mirror the Column expression so the doubles agree
    def p(c12: Double, c1: Double, n1f: Double, n1b: Double): Double =
      math.max(c12 - 0.75, 0.0) / c1 +
        0.75 * n1f / c1 * ((n1b + 1.0) / (3.0 + 2.0))
    val pBA = p(2, 3, 2, 1)   // P(b|a)
    val pAB = p(2, 2, 1, 2)   // P(a|b)
    val pAA = p(1, 3, 2, 2)   // P(a|a)
    assert(got(1L) === ((2L, r4(-(math.log(pBA) + math.log(pAB)) / 2))))
    assert(got(2L) === ((1L, r4(-math.log(pAB)))))
    assert(got(3L) === ((2L, r4(-(math.log(pAA) + math.log(pBA)) / 2))))
  }

  test("KN continuation prior orders what both other priors cannot") {
    import spark.implicits._
    // x: frequent (cu=6) but ALWAYS after the same context (n1b=1) —
    // a burst/boilerplate artifact. y: rarer (cu=5) but follows FIVE
    // distinct contexts (n1b=5) — genuinely productive vocabulary.
    // The crawl uses a NOVEL prefix so every scorer is on its prior.
    val model = Perplexity.modelOf(spark,
      (Seq((1L, "q x q x q x q x q x q x")) ++
       Seq("a", "b", "c", "d", "e").zipWithIndex.map {
         case (ctx, i) => ((i + 2).toLong, s"$ctx y") }).toDF("doc_id", "text"))
    val crawl = Seq((1L, "zz x"), (2L, "zz y")).toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val addone = scores(Perplexity.scoreAgainst(model, crawl))
    val interp = scores(Perplexity.scoreAgainstInterp(model, crawl))
    val kn = scores(Perplexity.scoreAgainstKn(model, crawl))
    // add-one's uniform prior sees no difference at all
    assert(addone(1L) == addone(2L))
    // the frequency prior prefers the burst token...
    assert(interp(1L) < interp(2L))
    // ...the continuation prior flips it: productive beats burst
    assert(kn(2L) < kn(1L))
  }

  test("trigram Kneser-Ney scorer matches a hand computation") {
    import spark.implicits._
    // trigrams: (a,b,a):1 from doc1, (b,a,b):2 (doc1+doc2); ND=2, V=2
    // rp12: (a,b)->(c12=1,n1f12=1), (b,a)->(2,1)
    // rmid: (b,a)->1, (a,b)->1; rmidp: a->(1,1), b->(1,1)
    // rcont: a->1, b->1
    val corpus = Seq((1L, "a b a b"), (2L, "b a b")).toDF("doc_id", "text")
    val got = Perplexity.scoreAgainstKn3(
        Perplexity.modelOf3(spark, corpus), corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("xent"))).toMap
    def p1(n1b3: Double): Double = (n1b3 + 1.0) / (2.0 + 2.0)
    def p2(n1b23: Double, nmid: Double, n1fmid: Double, n1b3: Double): Double =
      math.max(n1b23 - 0.75, 0.0) / nmid + 0.75 * n1fmid / nmid * p1(n1b3)
    def p3(c123: Double, c12: Double, n1f12: Double, pp2: Double): Double =
      math.max(c123 - 0.75, 0.0) / c12 + 0.75 * n1f12 / c12 * pp2
    val pABA = p3(1, 1, 1, p2(1, 1, 1, 1))   // P3(a|a,b)
    val pBAB = p3(2, 2, 1, p2(1, 1, 1, 1))   // P3(b|b,a)
    assert(got(1L) === ((2L, r4(-(math.log(pABA) + math.log(pBAB)) / 2))))
    assert(got(2L) === ((1L, r4(-math.log(pBAB)))))
  }

  test("trigram KN separates contexts every bigram scorer must conflate") {
    import spark.implicits._
    // model: "p q r" x10 and "s q t" x10 — the BIGRAM statistics of
    // (q,r) and (q,t) are identical (count 10, one predecessor), so
    // every bigram-order scorer scores "p q r" and "p q t" equally.
    // The trigram (p,q,r) is attested; (p,q,t) is a cross-over the
    // corpus never produced — only a trigram context can see that.
    val model = ((1 to 10).map(i => (i.toLong, "p q r")) ++
      (1 to 10).map(i => (i.toLong + 10, "s q t"))).toDF("doc_id", "text")
    val crawl = Seq((1L, "p q r"), (2L, "p q t")).toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val bi = Perplexity.modelOf(spark, model)
    assert(scores(Perplexity.scoreAgainst(bi, crawl))(1L) ==
      scores(Perplexity.scoreAgainst(bi, crawl))(2L))
    assert(scores(Perplexity.scoreAgainstKn(bi, crawl))(1L) ==
      scores(Perplexity.scoreAgainstKn(bi, crawl))(2L))
    val kn3 = scores(Perplexity.scoreAgainstKn3(
      Perplexity.modelOf3(spark, model), crawl))
    assert(kn3(1L) < kn3(2L),
      "the attested trigram must score strictly better than the cross-over")
  }

  test("5-gram KN separates contexts the trigram order must conflate") {
    import spark.implicits._
    // model: "a b c d e" x10 and "z b c d f" x10 — the TRIGRAM
    // statistics of the crawls below are identical position for
    // position ((c,d,e) and (c,d,f) both attested 10x under the same
    // (c,d) prefix, symmetric lower orders), so kn3 must score them
    // equally. Only an order-4+ context sees that (a,b,c,d) -> e is
    // attested while -> f is a cross-over the corpus never produced.
    val model = ((1 to 10).map(i => (i.toLong, "a b c d e")) ++
      (1 to 10).map(i => (i.toLong + 10, "z b c d f"))).toDF("doc_id", "text")
    val crawl = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val kn3 = scores(Perplexity.scoreAgainstKn3(
      Perplexity.modelOf3(spark, model), crawl))
    assert(kn3(1L) == kn3(2L),
      "corpus not trigram-symmetric — the separation below would be vacuous")
    val kn5 = scores(Perplexity.scoreAgainstKn5(
      Perplexity.modelOf5(spark, model), crawl))
    assert(kn5(1L) < kn5(2L),
      "the attested 5-gram must score strictly better than the cross-over")
  }

  test("empty model fails loudly instead of emitting NULL scores") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val corpus = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Perplexity.scoreAgainst(Perplexity.modelOf(spark, empty), corpus).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("model is empty")))
  }

  test("ln-parity receipt: unrounded scores sit far from every round4 midpoint") {
    // The repo's FP discipline (SURVEY §6) bars transcendentals from
    // oracle-compared values unless the round4 snap provably cannot
    // straddle engines: Spark and DuckDB each compute ln + a
    // differently-ordered sum, so the raw per-doc means differ by
    // ~1e-13 (n_bigrams * accumulated ulp). The receipt: across the
    // gate corpora, measure the minimum distance of any unrounded
    // xent to the nearest round4 midpoint k+0.5e-4 and assert it is
    // orders of magnitude above that drift.
    def margin(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("xent_raw")).collect().map { r =>
        val y = r.getDouble(0) * 10000.0
        math.abs(y - math.floor(y) - 0.5) / 10000.0
      }.min
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1") ++
      Seq("target/scale8").filter(d => new java.io.File(d, "documents.parquet").exists())
    val margins = dirs.flatMap { d =>
      val corpus = Tables.documents(spark, d)
      val self = Perplexity.modelOf(spark, corpus)
      val coin = graft.functions.TextFunctions.md5Long(
        concat(lit("pplxref:"), col("doc_id").cast("string")), 1, 8)
        .cast("double") / 4294967296.0
      val ref = Perplexity.modelOf(spark, corpus.where(coin < 0.05))
      val ref3 = Perplexity.modelOf3(spark, corpus.where(coin < 0.05))
      val ref5 = Perplexity.modelOf5(spark, corpus.where(coin < 0.05))
      Seq(
        s"$d self"    -> margin(Perplexity.scoreAgainstRaw(self, corpus)),
        s"$d ref"     -> margin(Perplexity.scoreAgainstRaw(ref, corpus)),
        s"$d backoff" -> margin(Perplexity.scoreAgainstInterpRaw(ref, corpus)),
        s"$d kn"      -> margin(Perplexity.scoreAgainstKnRaw(ref, corpus)),
        s"$d kn3"     -> margin(Perplexity.scoreAgainstKn3Raw(ref3, corpus)),
        s"$d kn5"     -> margin(Perplexity.scoreAgainstKn5Raw(ref5, corpus)))
    }
    margins.foreach { case (k, m) => info(f"$k%-40s midpoint margin $m%.3e") }
    // floor: >= 2 orders above the ~1e-13 cross-engine drift bound.
    // Observed minima (2026-08, round 13): worst 1.59e-10 at sf0.1
    // ref; every other (dir, scorer) >= 7.9e-10.
    margins.foreach { case (k, m) =>
      assert(m > 1e-11, s"$k: margin $m too close to a rounding midpoint")
    }
  }
}
