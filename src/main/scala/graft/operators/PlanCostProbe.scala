package graft.operators

import org.apache.spark.sql.SparkSession

/** Driver-cost decomposition probe (dev tool): for each named query,
  * separately times (a) DataFrame BUILD (operator composition), (b)
  * ANALYSIS+OPTIMIZATION+PHYSICAL PLANNING (`executedPlan` force) and
  * (c) EXECUTION (`count()`), over `passes` warm passes — the
  * instrument that tells whether a 0.3 s tail query is paying Catalyst
  * or the cluster. `runMain graft.operators.PlanCostProbe <dir>
  * <q1,q2,...> [passes]`.
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CONSTRAINTS", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.queries("dashboard_stats")(spark, dir).count()
    catch { case _: Throwable => () }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count()   // memos/staging warm
      for (p <- 1 to passes) {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"[plancost] $name%-28s pass=$p build=${(t1 - t0) / 1e6}%6.0f ms " +
          f"plan=${(t2 - t1) / 1e6}%6.0f ms exec=${(t3 - t2) / 1e6}%6.0f ms")
      }
    }
    spark.stop()
  }
}
