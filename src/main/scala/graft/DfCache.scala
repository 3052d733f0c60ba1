package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of shared intermediate DataFrames — the
  * analog of the reference loading its FAISS index once per process
  * (core/utils.py:150 `load_index`). Keyed on the live SparkSession
  * instance (an identity-hash key can collide after the session is
  * GC'd and hand out a frame bound to a stopped session). The map is
  * weak-keyed, but cached DataFrames strongly reference their session
  * (value → key), so weakness alone cannot collect entries — actual
  * eviction happens via the application-end listener (one per
  * SparkContext) and the explicit [[evict]] hook for tearing down a
  * session inside a long-lived app. Values are persisted/checkpointed
  * frames that several operators sharing a pipeline stage (knn_text,
  * hybrid_*, the dedup family) compute once.
  */
object DfCache {

  private val cache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]]()
  private val hookedApps = ConcurrentHashMap.newKeySet[String]()

  private def perSession(spark: SparkSession): ConcurrentHashMap[String, DataFrame] = {
    val appId = spark.sparkContext.applicationId
    val ctx = spark.sparkContext
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, DataFrame](); cache.put(spark, m) }
      if (hookedApps.add(appId)) {
        // captures only the appId string — never the session itself
        ctx.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            cache.synchronized {
              val it = cache.entrySet().iterator()
              while (it.hasNext) {
                val s = it.next().getKey
                if (s != null && s.sparkContext.applicationId == appId) it.remove()
              }
              hookedApps.remove(appId)
            }
        })
      }
      m
    }
  }

  /** Get the cached frame for (session, key), computing (and caching)
    * it on first use. `compute` must return a frame that is already
    * persisted or locally checkpointed.
    */
  def getOrCompute(spark: SparkSession, key: String)(compute: => DataFrame): DataFrame =
    perSession(spark).computeIfAbsent(key, _ => compute)

  /** Drop and unpersist every cached frame of `spark` — call when
    * retiring a session inside a still-running application.
    */
  def evict(spark: SparkSession): Unit = {
    val m = cache.synchronized(cache.remove(spark))
    if (m != null) m.values.forEach { df =>
      try df.unpersist() catch { case _: Throwable => () }
    }
  }
}
