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

  test("incremental split: delta-internal exact dups share a coin end-to-end") {
    import spark.implicits._
    // base docs 7 and 14 spawn perturbed copies (first word dropped)
    // that are EXACT dups of each other and too short to near-match
    // any base (copy-vs-base jaccard 3/4 = 0.75 < 0.8) — the novel
    // within-batch group the round-12 contract only documented. Doc
    // 21's long text keeps the matched path non-empty (its copy
    // near-matches it at 17/18).
    val longTail = (1 to 19).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (7L, "alpha c1 c2 c3 c4 c5"),
      (14L, "beta c1 c2 c3 c4 c5"),
      (21L, s"gamma $longTail"),
      (1L, "filler one two three four five six"),
      (2L, "other seven eight nine ten eleven twelve"))
      .map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_splitinc").toString
    val stagingRoot = java.nio.file.Files.createTempDirectory("graft_splitinc_st").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    System.setProperty("graft.staging", stagingRoot)
    try {
      val rows = Dedup.datasetSplitIncremental(spark, tmp).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(rows.keySet == Set(100007L, 100014L, 100021L))
      // the matched copy inherits its base group
      assert(rows(100021L).getAs[Long]("match_id") == 21L)
      assert(rows(100021L).getAs[Long]("group_id") == 21L)
      // the novel twins: no base match, ONE group (the min delta id),
      // hence one coin and one side — no straddle possible
      Seq(100007L, 100014L).foreach { id =>
        assert(rows(id).isNullAt(rows(id).fieldIndex("match_id")))
        assert(rows(id).getAs[Long]("group_id") == 100007L)
      }
      assert(rows(100007L).getAs[String]("split") ==
        rows(100014L).getAs[String]("split"))
      val expect =
        if (md5Coin(100007L) < Dedup.SplitEvalFrac) "eval" else "train"
      assert(rows(100007L).getAs[String]("split") == expect)
    } finally System.clearProperty("graft.staging")
  }

  test("incremental split survives a corpus with an EMPTY delta") {
    import spark.implicits._
    // no doc_id divisible by 7 -> corpusWithDups injects no copies ->
    // the delta side is empty end to end (probe, quotient, split)
    val docs = Seq(1L, 2L, 3L, 4L)
      .map(id => (id, s"plain text number $id with several words here",
        "en", "synthetic", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_emptydelta").toString
    val stagingRoot = java.nio.file.Files.createTempDirectory("graft_emptydelta_st").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    System.setProperty("graft.staging", stagingRoot)
    try {
      assert(Dedup.datasetSplitIncremental(spark, tmp).count() == 0L)
      // the batch split still covers the whole (all-base) corpus
      assert(Dedup.datasetSplit(spark, tmp).count() == 4L)
    } finally System.clearProperty("graft.staging")
  }

  test("delta-internal quotient groups near-dup components, not just exact dups") {
    import spark.implicits._
    // three 40-token texts differing only in the LAST token: pairwise
    // jaccard 37/39 ≈ 0.949 — chained near-dups forming ONE component;
    // an exact-dup pair; an isolated doc
    val stem = (1 to 39).map(i => s"w$i").mkString(" ")
    val novel = Seq(
      (100001L, s"$stem endA"), (100002L, s"$stem endB"),
      (100003L, s"$stem endC"),
      (100010L, "short exact dup text"), (100011L, "short exact dup text"),
      (100020L, "alone in the batch nothing like it"))
      .toDF("doc_id", "text")
    val got = Dedup.deltaInternalGroups(spark, novel)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("delta_group"))
      .toMap
    assert(got.keySet == Set(100001L, 100002L, 100003L, 100010L, 100011L, 100020L))
    // near-dup component labels converge to the component minimum
    assert(Seq(100001L, 100002L, 100003L).map(got) == Seq.fill(3)(100001L))
    // exact dups share their content rep without any band pair
    assert(got(100010L) == 100010L && got(100011L) == 100010L)
    assert(got(100020L) == 100020L)
  }
}
