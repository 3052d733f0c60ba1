package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorSearch
import graft.functions.{VectorFunctions => V}
import graft.sources.Tables

class DiversitySampleSpec extends SparkSpec {

  private def md5Coin(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("diversity_sample: per-cluster quota, contiguous ranks, full cluster coverage") {
    val rows = VectorSearch.diversitySample(spark, sfDir).collect()
    val byLabel = rows.groupBy(_.getAs[Long]("label"))
    byLabel.foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("cluster_n")
      assert(rs.forall(_.getAs[Long]("cluster_n") == n))
      assert(rs.length == math.min(VectorSearch.DiversityQuota.toLong, n))
      val srks = rs.map(_.getAs[Long]("srk")).sorted
      assert(srks.sameElements(1L to rs.length))
    }
    // every non-empty cluster of the k-means assignment is represented
    assert(byLabel.values.map(_.head.getAs[Long]("cluster_n")).sum ==
      Tables.embeddings(spark, sfDir)
        .where(col("vec_id") >= VectorSearch.NQueries).count())
  }

  test("diversity_sample matches a driver-side brute force of the assignment") {
    // ground truth: full nearest-centroid assignment, then per cluster
    // the quota smallest (md5 coin, vec_id) — the operator must emit
    // exactly this set with exactly this ranking
    val corpus = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") >= VectorSearch.NQueries)
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
    val assigned = VectorSearch.assignClusters(corpus,
        VectorSearch.kmeansCentroids(spark, sfDir))
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("vec_id")))
    val expect = assigned.groupBy(_._1).toSeq.flatMap { case (label, members) =>
      val picked = members.map(_._2).sortBy(v => (md5Coin(v), v))
        .take(VectorSearch.DiversityQuota)
      picked.zipWithIndex.map { case (v, i) =>
        (label, v, i + 1L, members.length.toLong)
      }
    }.toSet
    val got = VectorSearch.diversitySample(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("srk"), r.getAs[Long]("cluster_n"))).toSet
    assert(got == expect)
  }

  test("diversity_sample(q) is the srk-prefix of diversity_sample(q')") {
    val small = VectorSearch.diversitySample(spark, sfDir, quota = 3).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("vec_id"), r.getAs[Long]("srk"))).toSet
    val prefix = VectorSearch.diversitySample(spark, sfDir).collect()
      .filter(_.getAs[Long]("srk") <= 3)
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("vec_id"), r.getAs[Long]("srk"))).toSet
    assert(small == prefix)
  }
}
