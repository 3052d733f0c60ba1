package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DatasetSplitIncrementalSpec extends SparkSpec {

  private def md5Coin(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }
  private def side(group: Long): String =
    if (md5Coin(group) < Dedup.SplitEvalFrac) "eval" else "train"

  test("delta coverage, coin-exact sides, novel docs self-grouped") {
    val rows = Dedup.datasetSplitIncremental(spark, sfDir).collect()
    val deltaN = Dedup.corpusWithDups(spark, sfDir, perturb = true)
      .where(col("doc_id") >= Dedup.CopyIdOffset).count()
    assert(rows.length.toLong == deltaN)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    assert(rows.exists(_.getAs[java.lang.Long]("match_id") != null),
      "no delta doc matched its base original — probe broken")
    rows.foreach { r =>
      val group = r.getAs[Long]("group_id")
      if (r.getAs[java.lang.Long]("match_id") == null)
        assert(group == r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("split") == side(group))
    }
  }

  test("manifest consistency: matches point into the base, same match => same side") {
    val rows = Dedup.datasetSplitIncremental(spark, sfDir)
      .where(col("match_id").isNotNull).collect()
    val baseIds = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => baseIds.contains(r.getAs[Long]("match_id"))))
    // two crawls of near-copies of the same base doc can never land on
    // opposite sides of the boundary — the invariant the operator exists for
    rows.groupBy(_.getAs[Long]("match_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("split")).distinct.length == 1)
      assert(rs.map(_.getAs[Long]("group_id")).distinct.length == 1)
    }
  }

  test("bridge audit counts a PLANTED novel->matched chain, and only that") {
    import spark.implicits._
    // chain X - M - N on word-3-gram jaccard: M is a near-copy of the
    // base doc X (matched; side frozen by the manifest), N a near-copy
    // of M but NOT of X (novel; own coin) — the irreducible straddle
    // case the audit must surface. 40 tokens, 3 replaced per hop:
    // J(X,M) = J(M,N) = 35/41 ~ 0.853 >= 0.8, J(X,N) = 32/44 ~ 0.727.
    val xTok = (1 to 40).map(i => s"w$i")
    val mTok = xTok.dropRight(3) ++ Seq("ma", "mb", "mc")
    val nTok = Seq("na", "nb", "nc") ++ mTok.drop(3)
    val farTok = (1 to 40).map(i => s"z$i")
    val batch = Seq(
      (1L, xTok.mkString(" ")),     // base
      (100001L, mTok.mkString(" ")), // matched delta
      (100002L, nTok.mkString(" ")), // novel delta, bridges through M
      (100003L, farTok.mkString(" ")) // novel delta, no neighbor
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsOf(batch)(_.localCheckpoint())
      .where(col("jaccard") >= 0.8).localCheckpoint()
    val got = pairs.collect().map(r =>
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // precondition: the chain verified as designed (deterministic
    // md5-based bands; if this moves, re-derive the token overlap)
    assume(got == Set((1L, 100001L), (100001L, 100002L)),
      s"planted chain did not verify as X-M, M-N: $got")
    val novel = Seq(100002L, 100003L).toDF("doc_id")
    val matched = Seq(100001L).toDF("doc_id")
    val row = Dedup.splitBridgeAuditOf(novel, matched, pairs).collect().head
    assert(row.getAs[String]("stage") == "dataset_split_incremental.bridge")
    assert(row.getAs[Long]("candidates") == 2L, "two novel docs in the batch")
    assert(row.getAs[Long]("emitted") == 1L,
      "exactly the far doc's coin is unconstrained")
  }

  test("bridge audit on the real corpus: arithmetic holds, batch exposure reported") {
    val r = Dedup.splitBridgeAudit(spark, sfDir).collect()
    assert(r.length == 1)
    val (cand, emitted) =
      (r.head.getAs[Long]("candidates"), r.head.getAs[Long]("emitted"))
    assert(emitted <= cand)
    // the injected delta is near-copies of base docs, so novel docs are
    // the perturbation outliers — exposure may be 0; the row must still
    // report the batch's novel population it measured
    val novelN = Dedup.datasetSplitIncremental(spark, sfDir)
      .where(col("match_id").isNull).count()
    assert(cand == novelN, s"audit candidates $cand != novel docs $novelN")
  }
}
