package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-pass task-metric receipts for the big-join 256× variance
  * adjudication (r16 verdict "what's wrong" #4): the 4-pass wall-time
  * spreads on q_part_revenue / q5_region_join / session_overlap /
  * value_outliers were attributed to box variance without receipts.
  * This probe runs each query `passes` times and prints ONE JSON line
  * per pass with wall time, summed task run/GC time, shuffle
  * read/write bytes, spill bytes, AND the AQE final-plan hash
  * (expression-id-normalized), so the two hypotheses separate in the
  * artifact itself:
  *   - plan hash identical across passes + flat shuffle bytes + grown
  *     wall/GC ⇒ box state (page cache, GC pause), not the engine;
  *   - plan hash flipping or shuffle bytes moving ⇒ an AQE re-plan,
  *     a real engine-side cause.
  * Dev tool, not part of the driver contract:
  * `SPARK_DRIVER_MEM=96g runMain graft.operators.VarianceProbe
  * target/scale256 [passes]`.
  */
object VarianceProbe {

  /** Task metrics accumulated between marks by a listener. */
  private final class Tally extends SparkListener {
    val runMs, gcMs, shRead, shWrite, spill = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def snapshot(): Seq[Long] =
      Seq(runMs.get, gcMs.get, shRead.get, shWrite.get, spill.get)
  }

  /** Stable hash of the AQE FINAL physical plan: expression ids,
    * plan ids, codegen stage ids and file-index listings are
    * normalized away so two passes hash equal iff the plan SHAPE is
    * the same.
    */
  private[graft] def planHash(df: DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("\\*\\(\\d+\\)", "*")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
      .replaceAll("InMemoryFileIndex\\[[^]]*\\]", "InMemoryFileIndex[]")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString.take(12)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "q_part_revenue" -> (() => Relational.qPartRevenue(spark, dir)),
      "q5_region_join" -> (() => Relational.q5RegionJoin(spark, dir)),
      "session_overlap" -> (() => RangeJoin.sessionOverlap(spark, dir)),
      "value_outliers" -> (() => Analytics.valueOutliers(spark, dir)))

    for ((name, mk) <- queries; p <- 1 to passes) {
      val before = tally.snapshot()
      val t0 = System.nanoTime
      val df = mk()
      df.count()
      val wall = (System.nanoTime - t0) / 1e9
      val d = tally.snapshot().zip(before).map { case (a, b) => a - b }
      println(f"""[vprobe] {"query":"$name","pass":$p,"wall_sec":$wall%.2f,""" +
        s""""task_run_ms":${d(0)},"task_gc_ms":${d(1)},""" +
        s""""shuffle_read_mb":${d(2) / 1048576},"shuffle_write_mb":${d(3) / 1048576},""" +
        s""""spill_mb":${d(4) / 1048576},"plan_hash":"${planHash(df)}"}""")
    }
    spark.stop()
  }
}
