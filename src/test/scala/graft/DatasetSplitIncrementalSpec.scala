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
}
