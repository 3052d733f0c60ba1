package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark isolating per-task constant costs (dev tool):
  * compares a plain built-in aggregate, the custom TopKAgg, a window
  * row_number, and a sort over the same tiny 32-partition frame, so a
  * uniform ~200 ms/task cost attributes to the operator class rather
  * than the data. `runMain graft.operators.MicroProbe`.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PAR_FIRST", "true"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "200"))
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach(d => b.config("spark.local.dir", d))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = spark.range(0, 6000).select(
      (col("id") % 600).as("g"), col("id").as("v"))
      .repartition(32).localCheckpoint()

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[micro] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    }
    // warm-up
    df.groupBy("g").agg(max("v")).count()

    // Does persist actually serve blocks on re-use, or recompute?
    // An expensive per-row expression makes recompute visible.
    val slow = df.withColumn("h",
      aggregate(sequence(lit(0), lit(200)), lit(0L),
        (a, i) => a + length(md5(concat(col("v").cast("string"), i.cast("string"))))))
      .groupBy("g").agg(max(col("h")).as("mh"))
      .persist()
    t("persisted: populate") { slow.count() }
    t("persisted: reuse 1") { slow.count() }
    t("persisted: reuse 2") {
      slow.join(slow.select(col("g"), col("mh").as("mh2")), Seq("g")).count()
    }

    for (i <- 1 to 3) {
      t(s"builtin max #$i") { df.groupBy("g").agg(max("v")).count() }
      t(s"topK agg #$i") {
        df.groupBy("g").agg(graft.functions.TopK.topK(8)(
          col("v").cast("double"), col("v")).as("top")).count()
      }
      t(s"window row_number #$i") {
        df.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
            .orderBy(col("v")))).where(col("rk") <= 8).count()
      }
      t(s"collect_list #$i") {
        df.groupBy("g").agg(sort_array(collect_list(col("v")))).count()
      }
      t(s"distinct #$i") { df.distinct().count() }
    }
    spark.stop()
  }
}
