package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs with zero exchange") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 8)

    // force the sort-merge path (at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "li_bucketed")
        .join(Bucketing.table(spark, "ord_bucketed"), Seq("l_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // and the result matches the unbucketed join
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    val got = Bucketing.table(spark, "li_bucketed")
      .join(Bucketing.table(spark, "ord_bucketed"), Seq("l_orderkey")).count()
    assert(got == expected)
  }
}
