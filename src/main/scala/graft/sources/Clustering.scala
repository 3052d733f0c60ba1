package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column data clustering for file skipping — the write-side
  * half of predicate pushdown. Parquet scans skip row groups whose
  * min/max stats exclude the filter, but stats only help if the
  * layout is clustered: a table sorted by one column skips perfectly
  * on that column and not at all on any other. Z-ordering (Morton
  * bit-interleaving, the Delta OPTIMIZE ZORDER / Databricks layout
  * strategy) spreads locality across ALL the cluster columns, so a
  * 100 TB events table filtered by user_id OR by time touches a
  * small fraction of its files either way.
  *
  * Shape: one tiny min/max agg job, then a narrow codegen'd
  * bit-interleave column, `repartitionByRange` on it (one shuffle —
  * sampled range boundaries, no global sort barrier on the data
  * columns), sort-within-partition, write. No driver-side data
  * movement at any size.
  */
object Clustering {

  /** Bucket a numeric column into [0, 2^bits) by uniform min/max
    * range (nulls land in bucket 0, like parquet stats treat them).
    */
  private def bucketed(c: Column, min: Column, max: Column, bits: Int): Column = {
    val n = 1 << bits
    val b = width_bucket(c.cast("double"), min, max, lit(n)) - 1
    least(greatest(coalesce(b, lit(0L)), lit(0L)), lit((n - 1).toLong))
  }

  /** Morton interleave of pre-bucketed values: bit b of column i
    * lands at position b·k + i — equal weight to every column.
    */
  private def interleave(bs: Seq[Column], bits: Int): Column = {
    val k = bs.length
    var z: Column = lit(0L)
    for (b <- 0 until bits; (c, i) <- bs.zipWithIndex)
      z = z.bitwiseOR(shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i))
    z
  }

  /** The z-value column for `zCols` given their (min_<c>, max_<c>)
    * bounds — exposed for reuse over a precomputed bounds row.
    */
  def zValue(zCols: Seq[String], bounds: Map[String, (Double, Double)],
      bits: Int): Column = {
    require(zCols.nonEmpty, "zorder needs at least one column")
    require(bits * zCols.length <= 63,
      s"bits($bits) × cols(${zCols.length}) must fit a long")
    interleave(zCols.map { c =>
      val (lo, hi) = bounds(c)
      // degenerate range (constant column): everything in bucket 0
      if (lo == hi) lit(0L)
      else bucketed(col(c), lit(lo), lit(hi), bits)
    }, bits)
  }

  /** Cluster `df` by the z-order of `zCols` into `numFiles` parquet
    * files at `outPath`. Each output file covers a narrow hypercube
    * of the z-space, so its parquet min/max stats are tight on EVERY
    * clustered column and a filtered scan row-group-skips the rest.
    * Uniform (min/max) bucketing keeps the z computation a pure
    * narrow expression; heavily skewed columns cluster less evenly —
    * pre-transform (e.g. log) or bucket by quantile upstream if a
    * column's range is pathological.
    */
  def zorderWrite(df: DataFrame, zCols: Seq[String], outPath: String,
      numFiles: Int, bits: Int = 8): Unit = {
    // the scratch column would silently shadow (and then drop) a
    // caller column of the same name — same guard as RangeJoin's
    // reserved `_bucket`
    require(!df.columns.contains("_z"),
      "zorderWrite reserves column name `_z`; rename the input column")
    val aggCols = zCols.flatMap(c => Seq(min(col(c)).cast("double").as(s"min_$c"),
      max(col(c)).cast("double").as(s"max_$c")))
    val boundsRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    // all-null column (or empty frame): min/max are SQL NULL —
    // Row.getAs[Double] would silently unbox that to 0.0, so null
    // must be detected positionally
    def at(name: String): Double = {
      val i = boundsRow.fieldIndex(name)
      if (boundsRow.isNullAt(i)) 0.0 else boundsRow.getDouble(i)
    }
    val bounds = zCols.map(c => c -> (at(s"min_$c"), at(s"max_$c"))).toMap
    df.withColumn("_z", zValue(zCols, bounds, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(outPath)
  }
}
