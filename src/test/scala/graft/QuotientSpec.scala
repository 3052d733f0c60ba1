package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proves the exact-content quotient contraction of the MinHash build
  * (Dedup.minhashPairsOf's members path) against DOC-LEVEL ground
  * truth on a corpus where the quotient is NOT the identity —
  * `corpusWithGroups` carries exact-duplicate groups of size 2-3 on
  * both sides of near-dup edges plus a group that cannot shingle.
  * The doc-level build is obtained from the SAME code by passing an
  * identity quotient (rep_id = doc_id): `within` is then empty and
  * `cross` lifts trivially, so the pipeline degenerates to banding
  * every doc. (The sf0.01 gate additionally checks the quotient
  * build against DuckDB's independent doc-level SQL spelling —
  * dedup_minhash_grouped / dedup_clusters_grouped.)
  */
class QuotientSpec extends graft.SparkSpec {

  private lazy val corpus = Dedup.corpusWithGroups(spark, sfDir)
  private lazy val members = Dedup.minhashMembersGrouped(spark, sfDir)
  private lazy val quotientPairs = Dedup.minhashPairsGrouped(spark, sfDir)
  private lazy val docPairs = Dedup.minhashPairsOf(corpus,
    Some(corpus.select(col("doc_id"), col("doc_id").as("rep_id"))))(
    _.localCheckpoint())

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("a_id"), col("b_id"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("the grouped corpus actually exercises the quotient (preconditions)") {
    val sizes = members.groupBy(col("rep_id")).agg(count(lit(1)).as("gn"))
    assert(sizes.where(col("gn") >= 3).count() > 0,
      "no group of size >= 3 — the corpus no longer stresses the expansion")
    // a multi-member group whose text cannot shingle (< 3 tokens)
    val shortGroups = members.join(corpus, Seq("doc_id"))
      .where(size(split(col("text"), " ")) < 3)
      .groupBy(col("rep_id")).agg(count(lit(1)).as("gn"))
      .where(col("gn") >= 2)
    assert(shortGroups.count() > 0,
      "no multi-member no-shingle group — the eligibility skip is unexercised")
  }

  test("quotient-expanded pairs are row-identical to the doc-level build") {
    val q = pairSet(quotientPairs)
    val d = pairSet(docPairs)
    assert(q == d,
      s"pair sets differ: quotient-only=${(q -- d).take(5)} doc-only=${(d -- q).take(5)}")
    // the no-shingle groups must pair with nothing (eligibility skip)
    assert(!d.exists { case (a, b, _) => a >= 500000L || b >= 500000L },
      "a two-word-text doc produced a pair")
    // cross-group lift emitted NON-REP member combos (jaccard < 1 pairs
    // whose endpoint is not its group's representative)
    val nonReps = members.where(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(q.exists { case (a, b, j) => j < 1.0 && (nonReps(a) || nonReps(b)) },
      "no cross-group pair was lifted onto a non-representative member")
  }

  test("incremental probe ≡ doc-level best-match across a cloned base/delta cut") {
    // base: every text in 4 exact clones; delta: near-copies of every
    // 3rd doc in 3 clones — the replicated-ladder shape where an
    // uncontracted band join pays clones² combos per true near-pair
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val base = (0 until 4).map(k =>
      docs.select((col("doc_id") + k * 1000000L).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val deltaSeed = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val cut = 50000000L
    val delta = (0 until 3).map(k =>
      deltaSeed.select((col("doc_id") + cut + k * 1000000L).as("doc_id"), col("text")))
      .reduce(_ unionAll _)

    val inc = Dedup.neardupIncrementalOf(base, delta, 0.8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("match_id"),
        r.getAs[Double]("jaccard"))).sortBy(_._1)

    // doc-level ground truth from the identity-quotient pair build:
    // every base×delta pair over threshold, best per delta doc
    val union = base.unionAll(delta)
    val ref = Dedup.minhashPairsOf(union,
        Some(union.select(col("doc_id"), col("doc_id").as("rep_id"))))(
        _.localCheckpoint())
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("jaccard")))
      .filter { case (a, b, j) => a < cut && b >= cut && j >= 0.8 }
      .groupBy(_._2).map { case (d, ps) =>
        val best = ps.minBy { case (a, _, j) => (-j, a) }
        (d, best._1, best._3)
      }.toSeq.sortBy(_._1)

    assert(inc.nonEmpty, "cloned cut produced no matches — test corpus degenerate")
    assert(inc.toSeq === ref)
    // the match is always a base-group REPRESENTATIVE (min clone id):
    // the rep-level tie-break must coincide with the doc-level one
    assert(inc.forall(_._2 < 1000000L), "a non-rep base clone won a tie-break")
  }

  test("trimmed grouped report equals the full expansion's top-50 (r15 slate trim)") {
    def rows(df: DataFrame): Seq[(Long, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("jaccard"))).toSeq
    val full = rows(quotientPairs
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id")).limit(50))
    val trimmed = rows(Dedup.dedupMinhashGrouped(spark, sfDir))
    assert(trimmed === full,
      s"slate-trimmed report diverged from the full expansion's top-50")
    // and the trimmed stream is a SUBSET of the full pair set (the
    // trim may only drop pairs, never invent or re-score them)
    val fullSet = pairSet(quotientPairs)
    val streamSet = pairSet(Dedup.groupedReportStream(spark, sfDir))
    assert(streamSet.subsetOf(fullSet),
      s"trimmed stream invented pairs: ${(streamSet -- fullSet).take(5)}")
  }

  test("quotient closure matches the doc-level component closure") {
    val docComp = Dedup.componentsWithRounds(
      docPairs.where(col("jaccard") >= 0.8).select(col("a_id"), col("b_id")))._1
    val expected = docComp.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.dedupClustersGrouped(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"closure differs: ${(got.toSet -- expected.toSet).take(5)} vs ${(expected.toSet -- got.toSet).take(5)}")
  }
}
