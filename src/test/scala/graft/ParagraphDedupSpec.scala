package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Block-level exact dedup (Dedup.dedupParagraph): first-occurrence
  * semantics corpus-wide, intra-doc repeats, ragged tails, partition
  * invariance, and the gated corpus's swapped-header contract.
  */
class ParagraphDedupSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def block(p: String) = (1 to 32).map(i => s"$p$i").mkString(" ")
  private val (ba, bb, bc, bn) = (block("a"), block("b"), block("c"), block("n"))

  test("first occurrence wins corpus-wide; partial and full clones trim correctly") {
    val out = Dedup.dedupParagraphOf(corpus(
      1L -> s"$ba $bb $bc",
      2L -> s"$bb $bc $bn",   // shares 2 of 3 blocks with doc 1
      3L -> s"$ba $bb $bc"    // exact clone of doc 1
    )).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_kept") == 3 &&
      out(1L).getAs[String]("kept_text") == s"$ba $bb $bc")
    assert(out(2L).getAs[Long]("n_kept") == 1 &&
      out(2L).getAs[String]("kept_text") == bn)
    assert(out(3L).getAs[Long]("n_kept") == 0 &&
      out(3L).getAs[String]("kept_text") == "")
  }

  test("empty-text docs are excluded, not reported as one empty paragraph") {
    // split("", " ") returns [""], so without the explicit filter an
    // empty doc would report n_paras = 1 and push an "" block into
    // the winner aggregate (and diverge from the oracle's
    // length(text) > 0 rule)
    val out = Dedup.dedupParagraphOf(corpus(1L -> "", 2L -> ba))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(1L), "empty doc must not appear in the report")
    assert(out(2L).getAs[Long]("n_paras") == 1 &&
      out(2L).getAs[Long]("n_kept") == 1)
  }

  test("intra-document repeated block keeps only its first copy") {
    val r = Dedup.dedupParagraphOf(corpus(7L -> s"$ba $ba $bb")).collect().head
    assert(r.getAs[Long]("n_paras") == 3)
    assert(r.getAs[Long]("n_kept") == 2)
    assert(r.getAs[String]("kept_text") == s"$ba $bb")
  }

  test("ragged tail block dedups like any other; result is partition-invariant") {
    val text = s"$ba tail words only"   // 35 words → blocks [ba, "tail words only"]
    val base = corpus(1L -> text, 2L -> text)
    val out1 = Dedup.dedupParagraphOf(base).collect()
    val out8 = Dedup.dedupParagraphOf(base.repartition(8)).collect()
    assert(out1.toSeq == out8.toSeq)
    val m = out1.map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("n_paras") == 2 && m(1L).getAs[Long]("n_kept") == 2)
    assert(m(2L).getAs[Long]("n_kept") == 0)
  }

  test("gated corpus: every injected copy keeps exactly its reversed header") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Dedup.dedupParagraph(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val copies = out.keys.filter(_ >= 100000L)
    assert(copies.nonEmpty)
    copies.foreach { id =>
      val orig = texts(id - 100000L).split(" ", -1)
      val header = orig.take(32).reverse.mkString(" ")
      val r = out(id)
      // the reversed header is novel (kept); every later block equals
      // an original block at the same word offset (dropped) — unless
      // another doc already claimed the header string itself
      assert(r.getAs[Long]("n_kept") <= 1)
      if (r.getAs[Long]("n_kept") == 1)
        assert(r.getAs[String]("kept_text") == header)
    }
  }
}
