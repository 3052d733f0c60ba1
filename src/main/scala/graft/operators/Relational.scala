package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Par
import graft.sources.Tables

/** Relational core: the engine fundamentals every other operator
  * builds on (scan → filter → join → aggregate → top-k). All joins
  * are declarative so Catalyst/AQE picks broadcast vs shuffle; money
  * aggregates run through DECIMAL for cross-engine exactness
  * (SURVEY.md §6) and are cast back to double at the boundary.
  */
object Relational {

  /** Cast to a decimal wide enough for 100 TB-scale sums. */
  private[operators] def dec(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale))

  /** TPC-H Q1-style pricing summary: single scan, map-side-combinable
    * aggregates, no joins. The shipdate filter is pushed to the
    * parquet scan.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val disc   = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(disc, 4)).cast("double").as("sum_disc_price"),
        sum(dec(charge, 6)).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style: segment filter → 3-way join → revenue top-10.
    * customer/orders filters push down; the final top-k is a bounded
    * sort (orderBy+limit → TakeOrderedAndProject), not a global sort.
    */
  def q3RevenueTopK(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
        .cast("double").as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 6-way join, revenue by nation for one region and
    * one order year. region/nation are tiny → forced broadcast; the
    * customer⋈orders⋈lineitem⋈supplier chain shuffles on its keys
    * and AQE handles skew at scale.
    */
  def q5RegionJoin(spark: SparkSession, dir: String): DataFrame = {
    val reg = broadcast(Tables.region(spark, dir).where(col("r_name") === "ASIA"))
    val nat = broadcast(Tables.nation(spark, dir))
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
             col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    val revenue = sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
      .cast("double").as("revenue")
    Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Revenue by part brand: fact ⋈ dim with the dim auto-broadcast,
    * top-10 brands — exercises the `part` dimension.
    */
  def qPartRevenue(spark: SparkSession, dir: String): DataFrame =
    // deliberately NOT spread (r17): a lineitemSpread variant was
    // measured at 1.26 s vs 0.63 s — shuffling the 4-column fact costs
    // more than the single-task decimal arithmetic it parallelizes
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
          .cast("double").as("revenue"),
        sum(dec(col("l_quantity"))).cast("double").as("total_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("p_brand"))
      .limit(10)

  /** Sliding-frame window patterns per user: 5-row moving average of
    * value and the delta vs the previous event — one shuffle on
    * user_id serves both frames.
    */
  def qRolling(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
      .withColumn("moving_avg5",
        Par.round4(avg(col("value")).over(byTime.rowsBetween(-4, Window.currentRow))))
      .withColumn("delta_prev",
        Par.round4(col("value") - coalesce(lag(col("value"), 1).over(byTime), col("value"))))
      .where(col("user_id") < 20)
      .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
  }

  /** Window functions over the event stream: per-user value ranking
    * plus a running sum in event-time order. One shuffle on user_id
    * serves both windows (same partitioning).
    */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val byValue = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("rk", row_number().over(byValue).cast("long"))
      .withColumn("run_sum", Par.round3(sum(col("value")).over(byTime)))
      .where(col("rk") <= 3)
      .select(col("user_id"), col("event_id"), col("rk"),
        col("run_sum"), col("ts_ms"))
      .orderBy(col("user_id"), col("rk"))
  }
}
