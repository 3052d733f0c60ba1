package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Value-parity of the native one-pass gram-stats expression
  * (plans.GopherGramStats) against the independent HOF spelling it
  * replaced (TextAnalysis.topGramMassHof / gramsOf) — the LshSignCode
  * parity pattern: the interpreted form is the oracle, the native
  * form is the production path.
  */
class GopherExprSpec extends SparkSpec {

  private def statsCol(toks: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftBridge
    graftBridge.columnOf(
      graft.plans.GopherGramStats(graftBridge.expressionOf(toks)))
  }

  private def bothOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"),
      statsCol(col("toks")).as("gs"),
      TextAnalysis.topGramMassHof(col("toks"), 2).as("h2"),
      TextAnalysis.topGramMassHof(col("toks"), 3).as("h3"),
      TextAnalysis.topGramMassHof(col("toks"), 4).as("h4"),
      size(array_distinct(TextAnalysis.gramsOf(col("toks"), 5)))
        .cast("long").as("h5"))

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit =
    bothOf(df).collect().foreach { r =>
      val gs = r.getStruct(r.fieldIndex("gs"))
      assert(gs.getLong(0) == r.getAs[Long]("h2"), s"top2 @ id=${r.get(0)}")
      assert(gs.getLong(1) == r.getAs[Long]("h3"), s"top3 @ id=${r.get(0)}")
      assert(gs.getLong(2) == r.getAs[Long]("h4"), s"top4 @ id=${r.get(0)}")
      assert(gs.getLong(3) == r.getAs[Long]("h5"), s"d5 @ id=${r.get(0)}")
    }

  test("native gram stats match the HOF oracle on the real corpus") {
    assertParity(Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks")))
  }

  test("native gram stats match the HOF oracle on adversarial token arrays") {
    import spark.implicits._
    val rows: Seq[Seq[String]] = Seq(
      Seq.empty,                                   // no tokens at all
      Seq("solo"),                                 // below every n
      Seq("a", "b"),                               // exactly one 2-gram
      Seq("a", "a", "a", "a", "a", "a"),           // one dominant gram per n
      Seq("", "", ""),                             // empty tokens → zero-mass grams
      Seq("a", null, "b", "a", null, "b", "c"),    // nulls skipped by concat_ws
      Seq("héllo", "wörld", "héllo", "wörld", "日本語", "héllo", "wörld"),
      (1 to 100).map(i => s"t${i % 7}"),           // long, heavily repeating
      (1 to 6).map(i => s"u$i"))                   // all-distinct, spans n=5
    val df = rows.zipWithIndex
      .map { case (r, i) => (i.toLong, r) }.toDF("id", "toks")
    assertParity(df)
  }

  test("doGenCode compiles: gopher metrics run with codegen fallback disabled") {
    // whole-stage codegen failures (e.g. a Janino error in the
    // generated compute call) normally fall back SILENTLY to the
    // interpreted path — disabling the fallback turns one into a test
    // failure, proving the expression genuinely participates
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = graft.operators.TextAnalysis.gopherQuality(spark, sfDir).collect()
      assert(out.length > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
