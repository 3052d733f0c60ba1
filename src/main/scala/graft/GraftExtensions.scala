package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven injection of graft's native expressions:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * registers the whole [[Graft.sqlFunctions]] catalog
  * (`cosine_similarity`, `graft_dot`, `graft_norm`, `graft_tokens`,
  * `graft_shingles`, `graft_chunks`) on every session the cluster
  * builds — no application code needed (the Spark-idiomatic install
  * path for a library shipping Catalyst expressions;
  * `Graft.register` remains the per-session runtime alternative).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    Graft.sqlFunctions.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(Graft.implClassOf(name), name),
        builder))
    }
}
