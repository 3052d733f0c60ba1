package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (most-recent-at-or-before) join — an operator Spark lacks
  * natively. Implemented with the scalable union+window idiom: tag
  * both sides, union, one window per key ordered by event time
  * carrying the last right-side row forward, keep left rows. One
  * shuffle on (key), zero range explosion — at 100 TB this beats a
  * range join (no quadratic candidate pairs) and AQE handles key
  * skew on the single exchange.
  */
object AsOf {

  /** left ⟕asof right: for every left row, the latest right row with
    * the same key and rightTs <= leftTs. `rightCols` are the payload
    * columns carried over (null when no prior right row exists). The
    * payloads travel inside ONE struct marker per right row, so a
    * right row whose payload value is genuinely NULL carries that
    * NULL forward (a bare `last(..., ignoreNulls)` per column would
    * skip it and resurrect a stale older value) — and one window
    * expression serves any number of payload columns.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], rightId: String): DataFrame = {
    val carried0 = (rightCols :+ rightId).distinct   // tie-break id must travel too
    val clash = carried0.filter(left.columns.contains)
    require(clash.isEmpty,
      s"rightCols collide with left columns: ${clash.mkString(", ")}")
    val reserved = Seq("_side", "_asof").filter(c =>
      left.columns.contains(c) || right.columns.contains(c))
    require(reserved.isEmpty,
      s"inputs already carry reserved column(s): ${reserved.mkString(", ")}")
    // numeric tie-break: equal-ts ordering coalesces rightId with
    // Long.MaxValue, so a non-numeric id would coerce to string order
    require(right.schema(rightId).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rightId '$rightId' must be numeric for the equal-ts tie-break")
    val lTagged = left.withColumn("_side", lit(1))
      .withColumns(carried0.map(c => c -> lit(null).cast(right.schema(c).dataType)).toMap)
    val rTagged = right.select((key +: ts +: carried0).map(col): _*)
      .withColumn("_side", lit(0))
      .withColumns(left.columns.filterNot((key :: ts :: Nil).contains)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val unioned = lTagged.unionByName(rTagged)
    // right rows sort before left rows at equal ts => "at or before";
    // coalesce tie-break avoids engine-specific NULL ordering
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"),
        coalesce(col(rightId), lit(Long.MaxValue)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof",
      last(when(col("_side") === 0, struct(rightCols.map(col): _*)),
        ignoreNulls = true).over(w))
    rightCols.foldLeft(carried) { (df, c) =>
        df.withColumn(s"asof_$c", col("_asof").getField(c))
      }
      .where(col("_side") === 1)
      .drop((carried0 :+ "_side" :+ "_asof"): _*)
  }

  /** For each purchase event, the user's most recent view at or
    * before it — the query-level demo of the operator.
    */
  def asofPrevView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_ms"), col("event_id").as("view_event_id"))
    joinAsOf(purchases, views, "user_id", "ts_ms", Seq("view_event_id"), "view_event_id")
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("asof_view_event_id").as("prev_view_event_id"))
      .orderBy(col("user_id"), col("event_id"))
  }
}
