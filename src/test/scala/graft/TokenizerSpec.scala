package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeModel, BpeTokenizer, WhitespaceTokenizer}
import graft.operators.{Pack, TextAnalysis}
import graft.sources.Tables

/** The pluggable tokenizer seam (functions/Tokenizers) under the
  * trainer-facing operators: the whitespace stub must reproduce the
  * oracle-gated columnar paths exactly, and the file-loaded BPE
  * merges artifact must be deterministic, genuinely different from
  * the stub (fertility > 1), and still produce a valid packing —
  * the IngestSeamSpec pattern applied to tokenization.
  */
class TokenizerSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def layoutOf(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("doc_id"),
      (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("tok_offset"), r.getAs[Long]("n_tok")))).sortBy(_._1)

  test("seqPackWith(WhitespaceTokenizer) is bit-identical to the columnar seqPack") {
    val seam = layoutOf(Pack.seqPackWith(spark, docs, WhitespaceTokenizer).collect())
    val columnar = layoutOf(Pack.seqPack(spark, sfDir).collect())
    assert(seam.toSeq === columnar.toSeq)
  }

  test("tokenVocabWith(WhitespaceTokenizer) is bit-identical to the columnar tokenVocab") {
    val a = TextAnalysis.tokenVocabWith(spark, docs, WhitespaceTokenizer).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSeq
    val b = TextAnalysis.tokenVocab(spark, sfDir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSeq
    assert(a === b)
  }

  test("BPE merges artifact: deterministic train/write/load round-trip, greedy rank order") {
    val texts = Seq("spark spark sparse", "spark batch batch", "a spark table")
    val merges = BpeModel.train(texts.iterator, 6)
    // three pairs tie at count 5 — (a,r), (p,a), (s,p) all ride
    // 'spark' x4 + 'sparse'; the lexicographic tie-break must pick (a,r)
    assert(merges.head === ("a", "r"))
    assert(merges === BpeModel.train(texts.iterator, 6), "training must be deterministic")

    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges.bin"
    BpeModel.write(path, merges)
    assert(BpeModel.load(path) === merges.zipWithIndex.toMap)

    val enc = new BpeTokenizer(path).open()
    val once = enc.tokenize(texts)
    assert(once === enc.tokenize(texts), "tokenization must be deterministic")
    // every word re-concatenates to itself: BPE only merges, never alters
    texts.zip(once).foreach { case (t, toks) =>
      assert(toks.mkString === t.replace(" ", ""))
    }
  }

  test("BPE path through the pack: fertility > 1 vs whitespace, layout still valid") {
    // tiny artifact trained on a corpus sample — the file-loaded
    // deployment shape, deterministic for the spec
    val sample = docs.orderBy("doc_id").limit(50).select("text")
      .collect().map(_.getString(0)).toSeq
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges.bin"
    BpeModel.write(path, BpeModel.train(sample.iterator, 40))
    val bpe = new BpeTokenizer(path)

    val packed = Pack.seqPackWith(spark, docs, bpe).collect()
    val ws = Pack.seqPackWith(spark, docs, WhitespaceTokenizer).collect()

    // same documents, same sharding — different counting units
    assert(packed.length === ws.length)
    val bpeTok = packed.map(_.getAs[Long]("n_tok")).sum
    val wsTok = ws.map(_.getAs[Long]("n_tok")).sum
    assert(bpeTok > wsTok,
      s"BPE subword counts ($bpeTok) should exceed whitespace word counts ($wsTok)")

    // the layout invariant holds in BPE units too: contiguous, zero-padding
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var expectStart = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val start = r.getAs[Long]("seq_id") * Pack.DefaultSeqTokens +
          r.getAs[Long]("tok_offset")
        assert(start === expectStart, s"gap at doc ${r.getAs[Long]("doc_id")}")
        expectStart = start + r.getAs[Long]("n_tok")
      }
    }
  }
}
