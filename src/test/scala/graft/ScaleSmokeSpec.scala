package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Relational, VectorSearch}
import graft.sources.Tables

/** Scale-behavior smoke: the same operators on an 8×-replicated input
  * must stay correct (decimal sums scale EXACTLY linearly) and keep
  * their plan shape — the local stand-in for a scale-factor jump.
  */
class ScaleSmokeSpec extends SparkSpec {

  private val mult = 8

  test("q1 sums scale exactly linearly under 8x replication") {
    val tmp = Files.createTempDirectory("graft_scale").toString
    val li = Tables.lineitem(spark, sfDir)
    (1 to mult).map(_ => li).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val base = Relational.q1Pricing(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val scaled = Relational.q1Pricing(spark, tmp).collect()
    assert(scaled.length == base.size)
    scaled.foreach { r =>
      val b = base((r.getString(0), r.getString(1)))
      // decimal-routed sums are exact: 8x data = exactly 8x the sum
      assert(r.getAs[Double]("sum_qty") == mult * b.getAs[Double]("sum_qty"))
      assert(r.getAs[Double]("sum_base_price") == mult * b.getAs[Double]("sum_base_price"))
      assert(r.getAs[Long]("count_order") == mult * b.getAs[Long]("count_order"))
      // averages are invariant under replication
      assert(math.abs(r.getAs[Double]("avg_qty") - b.getAs[Double]("avg_qty")) < 1e-9)
    }
  }

  test("knn results are invariant under corpus duplication with distinct ids") {
    val tmp = Files.createTempDirectory("graft_scale_knn").toString
    val emb = Tables.embeddings(spark, sfDir)
    // duplicate the corpus under shifted ids: the top-k COSINES per
    // query must be unchanged (duplicates tie but scores identical)
    emb.unionAll(emb.where(col("vec_id") >= VectorSearch.NQueries)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val base = VectorSearch.knnBrute(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos")).toSeq }
    val scaled = VectorSearch.knnBrute(spark, tmp).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos")).toSeq }
    assert(scaled.keySet == base.keySet)
    base.foreach { case (q, cos) =>
      // each base hit now exists twice; top-k = duplicated list re-truncated
      val expected = cos.flatMap(c => Seq(c, c)).take(VectorSearch.K)
      assert(scaled(q) == expected, s"query $q changed")
    }
  }

  test("components converges in O(log diameter) rounds on a 1024-node chain") {
    import spark.implicits._
    // worst case for plain min-propagation: one long path. Pointer
    // doubling must converge in ~log2(1024)=10 rounds, not ~1024.
    val n = 1024
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("a_id", "b_id")
    val (labels, rounds) = graft.operators.Dedup.componentsWithRounds(pairs)
    val out = labels.collect()
    assert(out.length == n)
    assert(out.forall(_.getAs[Long]("cluster_id") == 0L),
      "chain did not collapse to one component")
    assert(rounds <= 12, s"pointer doubling failed: $rounds rounds for diameter $n")
  }
}
