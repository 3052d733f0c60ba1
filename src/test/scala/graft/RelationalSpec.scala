package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1_pricing groups and sums are consistent") {
    val rows = Relational.q1Pricing(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 1000)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_qty")
      val sum = r.getAs[Double]("sum_qty")
      val n   = r.getAs[Long]("count_order")
      assert(math.abs(avg - sum / n) < 1e-9)
      // discounted price can never exceed base price
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q3_revenue_topk returns at most 10 rows in strictly ranked order") {
    val rows = Relational.q3RevenueTopK(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5_region_join covers only the region's nations") {
    val rows = Relational.q5RegionJoin(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q_window keeps top-3 ranked events per user") {
    val df = Relational.qWindow(spark, sfDir)
    val byUser = df.collect().groupBy(_.getAs[Long]("user_id"))
    assert(byUser.nonEmpty)
    byUser.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rk")).sorted.sameElements(1L to rs.length.toLong))
    }
  }
}
