package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of shared intermediate DataFrames — the
  * analog of the reference loading its FAISS index once per process
  * (core/utils.py:150 `load_index`). Keyed WEAKLY on the live
  * SparkSession instance (an identity-hash key can collide after the
  * session is GC'd and hand out a frame bound to a stopped session;
  * a weak key simply disappears), so long-lived multi-session JVMs
  * don't accumulate entries. Values are persisted/checkpointed
  * frames that several operators sharing a pipeline stage (knn_text,
  * hybrid_*, the dedup family) compute once.
  */
object DfCache {

  private val cache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]]()

  private def perSession(spark: SparkSession): ConcurrentHashMap[String, DataFrame] =
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, DataFrame](); cache.put(spark, m) }
      m
    }

  /** Get the cached frame for (session, key), computing (and caching)
    * it on first use. `compute` must return a frame that is already
    * persisted or locally checkpointed.
    */
  def getOrCompute(spark: SparkSession, key: String)(compute: => DataFrame): DataFrame =
    perSession(spark).computeIfAbsent(key, _ => compute)
}
