package graft

import org.apache.spark.sql.{graftBridge, Column, SparkSession}

import graft.plans.CosineSimilarity

/** Library entry points: Column wrappers for graft's native Catalyst
  * expressions plus SQL registration, so both the DataFrame API and
  * `spark.sql` can use them.
  */
object Graft {

  /** Codegen cosine similarity (see plans.CosineSimilarity). */
  def cosine_similarity(a: Column, b: Column): Column =
    graftBridge.columnOf(
      CosineSimilarity(graftBridge.expressionOf(a), graftBridge.expressionOf(b)))

  private[graft] val cosineBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      CosineSimilarity = exprs => CosineSimilarity(exprs.head, exprs(1))

  /** Register graft SQL functions on a session
    * (`SELECT cosine_similarity(a.embedding, b.embedding) ...`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", cosineBuilder, "built-in")

  /** Expose every operator as a temp view `graft_<name>` over the
    * given data directory, so the whole surface is reachable from
    * `spark.sql` (e.g. `SELECT * FROM graft_sessionize WHERE ...`).
    * Most views are lazy; the dedup family materializes its shared
    * pair stage at registration (DfCache localCheckpoint) — call on a
    * warmed session or accept the one-time build cost.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
}
