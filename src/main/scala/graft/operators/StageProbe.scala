package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-STAGE attribution probe for any registered query (dev tool,
  * not part of the driver contract): runs the named queries through
  * one cold + N warm `count()` passes and prints, for each stage of
  * the LAST warm pass, the summed task run time, task count, GC,
  * shuffle read/write bytes and the stage's callsite name — the
  * instrument that decomposes a bench median into operator receipts
  * (guide §1.1: find WHERE the time goes before touching anything).
  *
  * `runMain graft.operators.StageProbe <dir> <query>[,<query>...]
  * [warmPasses]` with SPARK_GRAFT_CPUS sizing the session.
  */
object StageProbe {

  private final class StageTally extends SparkListener {
    case class Row(jobDesc: String, stageId: Int, name: String, nTasks: Int,
                   runMs: Long, gcMs: Long, shReadMb: Double, shWriteMb: Double)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    @volatile var currentDesc = ""
    override def onJobStart(j: SparkListenerJobStart): Unit =
      currentDesc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      // the RDD chain names the operators inside the stage — the AQE
      // thread-pool callsite alone is opaque
      val rdds = i.rddInfos.sortBy(_.id).map(_.name).distinct.mkString(">")
      val cpuMs = m.executorCpuTime / 1000000
      val desMs = m.executorDeserializeTime
      rows.add(Row(currentDesc, i.stageId,
        s"cpu=${cpuMs}ms des=${desMs}ms $rdds", i.numTasks,
        m.executorRunTime, m.jvmGCTime,
        m.shuffleReadMetrics.totalBytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0))
    }
    def drainRows(): Seq[Row] = {
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      var r = rows.poll()
      while (r != null) { out += r; r = rows.poll() }
      out.toSeq
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val warm = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PAR_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new StageTally
    spark.sparkContext.addSparkListener(tally)
    val unknown = names.toSet -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.toSeq.sorted.mkString(",")}")

    // JVM/codegen warm-up outside the timed region
    try graft.SparkEntry.queries("dashboard_stats")(spark, dir).count()
    catch { case _: Throwable => () }

    def waitBus(): Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(100) }

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // cold + warm-1 passes populate memos/staging; only the final
      // pass's stages are attributed
      for (p <- 0 until warm) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"[stageprobe] $name pass=$p wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      waitBus(); tally.drainRows()
      val t0 = System.nanoTime()
      val fin = fn(spark, dir)
      fin.count()
      val wall = (System.nanoTime() - t0) / 1e9
      waitBus()
      // operator-level receipts: walk the FINAL adaptive plan (and any
      // nested cached/adaptive subtrees) printing each node's slowest
      // metrics — the SQL-tab view, in text
      if (sys.env.get("SPARK_GRAFT_PLAN_METRICS").contains("1")) {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
        val seen = new java.util.IdentityHashMap[AnyRef, AnyRef]()
        def walk(p: SparkPlan, depth: Int): Unit = {
          if (seen.put(p, p) != null) return
          val ms = p.metrics.collect {
            case (k, m) if m.value > 0 => s"$k=${m.value}"
          }.mkString(" ")
          println(s"[planmetrics] ${"  " * depth}${p.nodeName} $ms")
          p match {
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
            case s: InMemoryTableScanExec =>
              walk(s.relation.cachedPlan, depth + 1)
            case _ => ()
          }
          p.children.foreach(walk(_, depth + 1))
          p.subqueries.foreach(walk(_, depth + 1))
        }
        walk(fin.queryExecution.executedPlan, 0)
      }
      val rows = tally.drainRows().sortBy(-_.runMs)
      println(f"[stageprobe] ===== $name FINAL wall=$wall%.3f s, ${rows.size} stages, " +
        f"sum_task_run=${rows.map(_.runMs).sum} ms =====")
      rows.take(30).foreach { r =>
        println(f"[stageprobe]   run=${r.runMs}%6d ms gc=${r.gcMs}%4d tasks=${r.nTasks}%4d " +
          f"shR=${r.shReadMb}%7.1f shW=${r.shWriteMb}%7.1f  ${r.name.take(140)}")
      }
    }
    spark.stop()
  }
}
