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

  test("id path: v2 artifact emits deterministic ids with the string path's exact layout") {
    import graft.functions.IdTokenEncoder
    val sample = docs.orderBy("doc_id").limit(50).select("text")
      .collect().map(_.getString(0)).toSeq
    val (merges, vocab) = BpeModel.trainArtifact(sample, 40)
    // deterministic id layout: <unk>=0, "" and the sorted alphabet
    // next, merge outputs in rank order; contiguous 0..V-1
    assert(vocab.head === "<unk>")
    assert(vocab(1) === "")
    assert(vocab.distinct === vocab, "vocab ids must be a bijection")
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/model.bin"
    BpeModel.write(path, merges, vocab)

    val enc = new BpeTokenizer(path).open().asInstanceOf[IdTokenEncoder]
    val texts = sample.take(10)
    val strs = enc.tokenize(texts)
    val ids = enc.tokenizeIds(texts)
    // arity contract: element i of the id stream IS token i — any
    // layout computed in token units (packing offsets, budgets) is
    // identical whichever representation the trainer consumes
    assert(ids.map(_.length) === strs.map(_.length))
    // ids are the artifact's vocab positions for exactly the emitted
    // symbols (every training-corpus symbol is in-vocab, so no <unk>)
    val idOf = vocab.zipWithIndex.toMap
    assert(ids === strs.map(_.map(idOf)))
    assert(ids.flatten.forall(i => i >= 0 && i < vocab.size))
    // deterministic for a fixed artifact: a second per-partition load
    // (fresh encoder) reproduces the ids bit-for-bit
    val enc2 = new BpeTokenizer(path).open().asInstanceOf[IdTokenEncoder]
    assert(enc2.tokenizeIds(texts) === ids)
    // a symbol the artifact never saw maps to UnkId, arity preserved
    val odd = Seq("\u00e9\u00e9 spark")
    assert(enc.tokenizeIds(odd).head.length === enc.tokenize(odd).head.length)
    assert(enc.tokenizeIds(odd).head.contains(IdTokenEncoder.UnkId))

    // a merges-only (v1) artifact refuses id emission instead of
    // inventing corpus-dependent ids
    val v1 = java.nio.file.Files.createTempDirectory("bpe").toString + "/v1.bin"
    BpeModel.write(v1, merges)
    val encV1 = new BpeTokenizer(v1).open().asInstanceOf[IdTokenEncoder]
    assert(encV1.tokenize(texts) === strs, "v1 string path unchanged")
    intercept[IllegalArgumentException] { encV1.tokenizeIds(texts) }
  }

  test("sampled DataFrame training: deterministic coin, equals seq-trained on the same sample, bound enforced") {
    import org.apache.spark.sql.functions._
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val (m1, v1) = BpeModel.trainArtifactSampled(corpus, nMerges = 24,
      sampleFrac = 0.2)
    // reproducible: the md5 coin doesn't care about partitioning
    val (m2, v2) = BpeModel.trainArtifactSampled(corpus.repartition(7),
      nMerges = 24, sampleFrac = 0.2)
    assert(m1 === m2 && v1 === v2, "sampled training not deterministic")
    // equals the driver-side trainer fed the same doc_id-ordered sample
    val coin = graft.functions.TextFunctions.md5Long(
        concat(lit("bpetrain:"), col("doc_id").cast("string")), 1, 8)
      .cast("double") / 4294967296.0
    val sample = corpus.where(coin < 0.2).orderBy(col("doc_id"))
      .select(col("text")).collect().map(_.getString(0)).toSeq
    assert(sample.nonEmpty && sample.size < corpus.count(),
      "coin sampled nothing (or everything) — fraction check is vacuous")
    assert((m1, v1) === BpeModel.trainArtifact(sample, 24))
    // the driver-side bound fails loudly instead of collecting a corpus
    val e = intercept[IllegalArgumentException] {
      BpeModel.trainArtifactSampled(corpus, nMerges = 4, sampleFrac = 1.0,
        maxDocs = 3L)
    }
    assert(e.getMessage.contains("maxDocs"))
  }
}
