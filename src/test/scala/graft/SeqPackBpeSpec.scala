package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeModel, BpeTokenizer}
import graft.operators.Pack

/** Specs for the gated BPE packing path (sequence_pack_bpe): the
  * encoder side is pinned here (determinism, fertility, arity — the
  * half the DuckDB oracle takes as given), the layout side by the
  * hash-exact oracle diff over the staged counts.
  */
class SeqPackBpeSpec extends SparkSpec {

  test("bpe counts: fertility > 1 vs whitespace, every doc counted") {
    val counts = Pack.bpeCounted(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(counts.count() === docs.count())
    val bpeTotal = counts.agg(sum("n_tok")).head.getLong(0)
    val wsTotal = docs.agg(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(bpeTotal > wsTotal,
      s"BPE total $bpeTotal should exceed whitespace total $wsTotal (fertility > 1)")
    // and per-doc: BPE can never undercount (a pre-token is >= 1 symbol)
    val under = counts.join(
      docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ws")),
      Seq("doc_id"))
      .where(col("n_tok") < col("ws")).count()
    assert(under === 0)
  }

  test("layout equals seqPackWith over the same artifact (one packLayout spelling)") {
    val counts = Pack.bpeCounted(spark, sfDir)
    // re-derive the artifact path from the staged counts' lineage-free
    // inputs: retrain deterministically and re-encode through the seam
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val (m, v) = BpeModel.trainArtifactSampled(docs,
      Pack.BpeArtifactMerges, Pack.bpeSampleFracFor(docs.count()))
    val path = java.io.File.createTempFile("bpe_spec", ".gbp").getPath
    BpeModel.write(path, m, v)
    val viaSeam = Pack.seqPackWith(spark, docs, new BpeTokenizer(path))
    val gated = Pack.seqPackBpe(spark, sfDir)
    assert(gated.exceptAll(viaSeam).isEmpty && viaSeam.exceptAll(gated).isEmpty,
      "gated BPE layout differs from the direct seam layout")
  }

  test("artifact is v2 (frozen vocab, contiguous ids) and training is deterministic") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val frac = Pack.bpeSampleFracFor(docs.count())
    val (m1, v1) = BpeModel.trainArtifactSampled(docs,
      Pack.BpeArtifactMerges, frac)
    val (m2, v2) = BpeModel.trainArtifactSampled(docs,
      Pack.BpeArtifactMerges, frac)
    assert(m1 === m2 && v1 === v2, "BPE training is not deterministic")
    assert(v1.nonEmpty && v1.distinct.size === v1.size)
    assert(v1.head === "<unk>")
  }

  test("sample frac adapts to corpus size where a fixed frac trips the bound") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    // a fixed 0.25 of this corpus overruns a maxDocs sized for a
    // smaller sample — the loud failure mode the adaptive frac removes
    val cap = math.max(1L, n / 8)
    intercept[IllegalArgumentException] {
      BpeModel.trainArtifactSampled(docs, Pack.BpeArtifactMerges, 0.25,
        maxDocs = cap)
    }
    // deriving the frac from the count targeting cap·4/5 stays under it
    val frac = Pack.bpeSampleFracFor(n, target = cap * 4 / 5)
    val (m, v) = BpeModel.trainArtifactSampled(docs,
      Pack.BpeArtifactMerges, frac, maxDocs = cap)
    assert(m.nonEmpty && v.nonEmpty)
    // the grid: <= target trains on everything; above it the frac
    // snaps DOWN to the round4 grid with a one-step floor
    assert(Pack.bpeSampleFracFor(100L) === 1.0)
    assert(Pack.bpeSampleFracFor(Pack.BpeSampleTargetDocs) === 1.0)
    assert(Pack.bpeSampleFracFor(2560000L) === 0.0976)  // the 1024x rung
    assert(Pack.bpeSampleFracFor(Pack.BpeSampleTargetDocs * 20000) === 1e-4)
    val f = Pack.bpeSampleFracFor(1234567L)
    assert(f === math.floor(f * 1e4) / 1e4, "frac off the round4 grid")
  }

  test("corpus content key separates corpora with equal doc counts") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val b = Seq((1L, "alpha beta"), (2L, "gamma DELTA")).toDF("doc_id", "text")
    assert(Pack.corpusContentKey(a) !== Pack.corpusContentKey(b))
    assert(Pack.corpusContentKey(a) === Pack.corpusContentKey(a.orderBy(desc("doc_id"))))
  }
}
