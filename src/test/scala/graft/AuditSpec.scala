package graft

import graft.operators.{Dedup, VectorSearch}

/** The "no silent caps" audit must describe the SAME truncation the
  * capped operators actually perform — otherwise it's a second silent
  * lie on top of the first.
  */
class AuditSpec extends SparkSpec {

  private lazy val rows =
    Audit.capAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("cap"), r.getAs[Long]("candidates"),
          r.getAs[Long]("emitted"), r.getAs[Long]("dropped")))
      .toMap

  test("every capped stage reports, and the arithmetic is consistent") {
    assert(rows.keySet == Set("dedup_simhash.partner_cap",
      "dedup_simhash.bucket_cap", "dedup_simhash.group_cap",
      "ngram_jaccard.bucket_cap", "ngram_jaccard.verify_budget",
      "dedup_embedding.pair_cap", "dedup_embedding.bucket_cap",
      "dedup_embedding.group_cap", "dataset_split_incremental.bridge",
      "semdedup.bucket_cap", "proto_select.tie_band",
      "dedup_minhash_grouped.group_slate", "dedup_minhash_grouped.slate_trim"))
    rows.foreach { case (stage, (cap, cand, emitted, dropped)) =>
      // cap = 0 marks a measurement row (the bridge audit has no bound)
      assert(cap >= 0 && cand >= 0 && emitted >= 0, s"$stage: negative counts")
      assert(emitted <= cand, s"$stage: emitted > candidates")
      assert(dropped == cand - emitted, s"$stage: dropped != candidates - emitted")
    }
  }

  test("audit 'emitted' equals what the capped operators actually emit") {
    val (_, _, simEmitted, _) = rows("dedup_simhash.partner_cap")
    assert(Dedup.dedupSimhash(spark, sfDir).count() == simEmitted,
      "simhash audit disagrees with the query's own output size")
    val (_, _, pairEmitted, _) = rows("dedup_embedding.pair_cap")
    assert(VectorSearch.embeddingDupCandidates(
        VectorSearch.codedVectors(spark, sfDir)).count() == pairEmitted,
      "pair-cap audit disagrees with the candidate stream size")
  }

  test("caps genuinely see candidates on the dup-injected corpus") {
    assert(rows("dedup_simhash.partner_cap")._2 > 0,
      "no simhash candidates — audit is auditing an empty stream")
    assert(rows("ngram_jaccard.verify_budget")._2 > 0,
      "no ngram candidate pairs — audit is auditing an empty stream")
  }
}
