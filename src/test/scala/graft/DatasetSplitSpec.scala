package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DatasetSplitSpec extends SparkSpec {

  private def md5Coin(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  test("dataset_split: coverage, group coherence, coin-correct sides") {
    val rows = Dedup.datasetSplit(spark, sfDir).collect()
    val corpusN = Dedup.corpusWithDups(spark, sfDir, perturb = true).count()
    // every corpus doc exactly once
    assert(rows.length.toLong == corpusN)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    // side is exactly the md5 coin over the group id, groups are
    // coherent by construction of the coin
    rows.foreach { r =>
      val expect =
        if (md5Coin(r.getAs[Long]("group_id")) < Dedup.SplitEvalFrac) "eval"
        else "train"
      assert(r.getAs[String]("split") == expect)
    }
    // group-level eval share lands near the nominal fraction
    val groups = rows.map(_.getAs[Long]("group_id")).distinct
    val evalShare =
      groups.count(g => md5Coin(g) < Dedup.SplitEvalFrac).toDouble / groups.length
    assert(evalShare > 0.05 && evalShare < 0.2,
      s"group-level eval share $evalShare implausible for 0.1")
  }

  test("no near-dup pair straddles the train/eval boundary") {
    val side = Dedup.datasetSplit(spark, sfDir, sorted = false)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.minhashPairs(spark, sfDir)
      .where(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"))
    val straddling = pairs
      .join(side.select(col("doc_id").as("a_id"), col("split").as("sa")), Seq("a_id"))
      .join(side.select(col("doc_id").as("b_id"), col("split").as("sb")), Seq("b_id"))
      .where(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0L)
    // ... and a doc-level hash split WOULD straddle: the planted
    // near-copies make the leak non-vacuous on this corpus
    val docLevelStraddle = pairs
      .where((conv(substring(md5(col("a_id").cast("string")), 1, 8), 16, 10)
          .cast("double") / 4294967296.0 < Dedup.SplitEvalFrac) =!=
        (conv(substring(md5(col("b_id").cast("string")), 1, 8), 16, 10)
          .cast("double") / 4294967296.0 < Dedup.SplitEvalFrac))
      .count()
    assert(docLevelStraddle > 0L,
      "corpus has no straddle-prone pairs — leak test is vacuous")
  }

  test("sorted = false drops the presentation exchange") {
    val sortedPlan = Dedup.datasetSplit(spark, sfDir)
      .queryExecution.executedPlan.toString
    val unsortedPlan = Dedup.datasetSplit(spark, sfDir, sorted = false)
      .queryExecution.executedPlan.toString
    assert(sortedPlan.contains("rangepartitioning"))
    assert(!unsortedPlan.contains("rangepartitioning"))
  }
}
