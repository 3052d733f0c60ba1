package graft

import graft.operators.{MLIndex, VectorSearch}
import graft.sources.Tables

class MLIndexSpec extends SparkSpec {

  test("kmeans IVF assigns every vector to a learned bucket") {
    val (indexed, centers) = MLIndex.kmeansIvf(spark, sfDir)
    assert(centers.length == MLIndex.NClusters)
    val rows = indexed.collect()
    assert(rows.length == Tables.embeddings(spark, sfDir).count())
    val buckets = rows.map(_.getAs[Int]("bucket")).distinct
    assert(buckets.forall(b => b >= 0 && b < MLIndex.NClusters))
    assert(buckets.length > 1, "kmeans degenerated to one cluster")
  }

  test("kmeans IVF search is sound and returns k ranked hits per query") {
    val exactTop = VectorSearch.knnBrute(spark, sfDir).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("cos")).toMap
    val hits = MLIndex.kmeansIvfSearch(spark, sfDir, nProbe = 2, k = 3).collect()
    val byQ = hits.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == VectorSearch.NQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 3)
      assert(rs.map(_.getAs[Double]("cos")).max <= exactTop(q) + 1e-9)
    }
  }

  test("tfidf vectors are unit-normalized and deterministic") {
    val v1 = MLIndex.tfidfVectors(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1).toVector).toMap
    val v2 = MLIndex.tfidfVectors(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1).toVector).toMap
    assert(v1.keySet == v2.keySet && v1.nonEmpty)
    v1.foreach { case (id, emb) =>
      val norm = math.sqrt(emb.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"doc $id norm $norm")
      assert(emb.sameElements(v2(id)))
    }
  }

  test("tfidf top pairs are ranked and well-formed") {
    val pairs = MLIndex.tfidfTopPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty && pairs.length <= 20)
    val cos = pairs.map(_.getAs[Double]("cos"))
    assert(cos.sameElements(cos.sortBy(-_)))
    assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
  }
}
