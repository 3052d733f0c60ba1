package graft

import org.apache.spark.sql.functions._

import graft.operators.Curate
import graft.sources.Tables

class CurateSpec extends SparkSpec {

  private lazy val report =
    Curate.corpusCurate(spark, sfDir).collect()

  test("corpus_curate emits a 7-stage chained funnel") {
    assert(report.length === 7)
    assert(report.map(_.getAs[String]("stage")).toSeq === Seq(
      "raw", "validate", "quality", "lang", "dedup_exact", "dedup_near",
      "decontaminate"))
    report.foreach { r =>
      val (in, out, drop) = (r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out"),
        r.getAs[Long]("dropped"))
      assert(out >= 0 && out <= in, s"stage ${r.getAs[String]("stage")}: $out > $in")
      assert(drop === in - out)
    }
    // each stage's input is the previous stage's output
    report.sliding(2).foreach { case Array(prev, next) =>
      assert(next.getAs[Long]("docs_in") === prev.getAs[Long]("docs_out"))
    }
  }

  test("raw count matches the 3-way injected corpus") {
    val base = Tables.documents(spark, sfDir)
    val n = base.count()
    val n7 = base.where(col("doc_id") % 7 === 0).count()
    val n13 = base.where(col("doc_id") % 13 === 0).count()
    assert(report.head.getAs[Long]("docs_in") === n + n7 + n13)
  }

  test("the designed-to-fire stages each drop rows on the synthetic corpus") {
    val dropped = report.map(r => r.getAs[String]("stage") -> r.getAs[Long]("dropped")).toMap
    // exact dedup must at least remove the injected exact copies;
    // near-dup at least fires on the perturbed injections; the
    // quality gate is tuned to trim the low-quality tail
    assert(dropped("quality") > 0)
    assert(dropped("dedup_exact") > 0)
    assert(dropped("dedup_near") > 0)
    // decontaminate removes at minimum the held-out benchmark docs
    assert(dropped("decontaminate") > 0)
  }

  test("curate_apply materializes exactly the funnel's final survivor count") {
    val finalOut = report.last.getAs[Long]("docs_out")
    val applied = Curate.curateApply(spark, sfDir)
    assert(applied.count() === finalOut)
    // survivors carry no benchmark doc (held out) and ids are unique
    assert(applied.where(col("doc_id") % 101 === 0).count() === 0)
    assert(applied.select(col("doc_id")).distinct().count() === finalOut)
  }

  test("exact-dedup stage drops every injected exact copy that survives the gates") {
    // an injected exact copy (id = base + 100000) can only survive
    // dedup_exact if its base was itself filtered out earlier — and
    // then it IS the canonical copy. So the final survivor set can
    // never contain both a base id and its +100000 copy. Re-derive
    // the stage-4 survivor population from the report arithmetic:
    // dedup_exact dropped ≥ (pairs where both base & copy passed the
    // row gates) is implied by the funnel; here spot-check the rule
    // on the corpus directly.
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val withCopies = base.unionAll(
      base.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val kept = withCopies.join(
      withCopies.groupBy(md5(col("text")).as("k")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    // keep-min rule: no +100000 copy survives when its base exists
    assert(kept.where(col("doc_id") >= 100000L).count() === 0)
  }
}
