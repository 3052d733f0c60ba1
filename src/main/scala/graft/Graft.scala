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

  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  /** Wrong argument counts must be an analysis-time message naming
    * the function, not an IndexOutOfBoundsException from the builder.
    */
  private def arity(name: String, n: Int)(b: Seq[Expr] => Expr): Seq[Expr] => Expr =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
      b(exprs)
    }

  private def fn1(f: Column => Column): Seq[Expr] => Expr =
    exprs => graftBridge.analyzedExpressionOf(f(graftBridge.columnOf(exprs.head)))

  private def fn2(f: (Column, Column) => Column): Seq[Expr] => Expr =
    exprs => graftBridge.analyzedExpressionOf(
      f(graftBridge.columnOf(exprs.head), graftBridge.columnOf(exprs(1))))

  /** A size/overlap-style argument must be a literal: the Column
    * composition bakes it into the expression tree at build time.
    */
  private def intArg(e: Expr, fname: String): Int = {
    require(e.foldable, s"$fname expects a literal integer argument, got $e")
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fname expects an integer literal, got $other")
    }
  }

  /** The SQL function catalog: every entry is a pure-Catalyst
    * expression (native codegen or built-in composition — no UDF, no
    * serialization boundary), so using them from `spark.sql` costs
    * the same as the DataFrame API. Installed per-session by
    * [[register]] or cluster-wide by `spark.sql.extensions=
    * graft.GraftExtensions`.
    */
  private[graft] val sqlFunctions: Seq[(String, Seq[Expr] => Expr)] = Seq(
    "cosine_similarity" -> arity("cosine_similarity", 2)(cosineBuilder),
    "graft_dot"    -> arity("graft_dot", 2)(fn2(graft.functions.VectorFunctions.dot)),
    "graft_norm"   -> arity("graft_norm", 1)(fn1(graft.functions.VectorFunctions.norm)),
    "graft_tokens" -> arity("graft_tokens", 1)(fn1(graft.functions.TextFunctions.tokens)),
    "graft_shingles" -> arity("graft_shingles", 2)(exprs =>
      graftBridge.analyzedExpressionOf(
        graft.functions.TextFunctions.shingles(graftBridge.columnOf(exprs.head),
          intArg(exprs(1), "graft_shingles")))),
    "graft_chunks" -> arity("graft_chunks", 3)(exprs =>
      graftBridge.analyzedExpressionOf(
        graft.functions.TextFunctions.chunks(graftBridge.columnOf(exprs.head),
          intArg(exprs(1), "graft_chunks"), intArg(exprs(2), "graft_chunks")))))

  /** The implementing class DESCRIBE FUNCTION should report: the
    * native expression for cosine, this catalog object otherwise.
    */
  private[graft] def implClassOf(name: String): String =
    if (name == "cosine_similarity") classOf[CosineSimilarity].getName
    else Graft.getClass.getName

  /** Register graft SQL functions on a session
    * (`SELECT cosine_similarity(a.embedding, b.embedding) ...`).
    */
  def register(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

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
