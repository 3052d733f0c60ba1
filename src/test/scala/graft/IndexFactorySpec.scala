package graft

import graft.operators.{IndexFactory, VectorSearch}
import IndexFactory._

/** The factory must parse the FAISS grammar subset, dispatch to the
  * same frames as the direct operators, and fail fast (with the
  * supported grid) on untrained configurations.
  */
class IndexFactorySpec extends SparkSpec {

  test("parses the implemented grammar") {
    assert(parse("Flat") === IndexSpec(0, FlatFine))
    assert(parse("LSH") === IndexSpec(0, Lsh8))
    assert(parse("SQ8") === IndexSpec(0, Sq8))
    assert(parse("PQ8") === IndexSpec(0, Pq(8, 4)))      // nbits defaults to 4
    assert(parse("PQ8x4") === IndexSpec(0, Pq(8, 4)))
    assert(parse("IVF8,Flat") === IndexSpec(8, FlatFine))
    assert(parse(" IVF8 , PQ8x4 ") === IndexSpec(8, Pq(8, 4)))
    assert(parse("IVF8,PQ8x4").render === "IVF8,PQ8x4")
    assert(parse("OPQ8,PQ8x4") === IndexSpec(0, Pq(8, 4), opq = true))
    assert(parse("OPQ8,PQ8").render === "OPQ8,PQ8x4")
  }

  test("rejects what it cannot parse, names the component") {
    val e1 = intercept[IllegalArgumentException](parse("HNSW32"))
    assert(e1.getMessage.contains("HNSW32"))
    // the HNSW boundary is documented in the error itself, pointing
    // at the IVF family as the scale path
    assert(e1.getMessage.contains("IVF"))
    val e2 = intercept[IllegalArgumentException](parse("IVF8"))
    assert(e2.getMessage.contains("fine stage"))
    val e3 = intercept[IllegalArgumentException](parse("SQ4"))
    assert(e3.getMessage.contains("SQ8"))
    val e4 = intercept[IllegalArgumentException](parse("OPQ16,PQ8x4"))
    assert(e4.getMessage.contains("OPQ16"))
    val e5 = intercept[IllegalArgumentException](parse("OPQ8"))
    assert(e5.getMessage.contains("pre-rotation"))
    intercept[IllegalArgumentException](parse(""))
  }

  test("parseable but untrained configurations fail with the supported grid") {
    for (s <- Seq("IVF32,Flat", "PQ16", "IVF8,PQ4", "PQ8x8", "OPQ8,SQ8",
        "OPQ8,IVF8,PQ8x4")) {
      val e = intercept[IllegalArgumentException](
        IndexFactory.search(spark, sfDir, s))
      assert(e.getMessage.contains("supported:"), s"no grid in message for '$s'")
    }
  }

  test("persisted index: manifest records its factory identity; mismatch fails fast") {
    import graft.sources.ChunkIndex
    val root = java.nio.file.Files.createTempDirectory("graft_factory_idx").toString
    // before any commit: "no index" is distinguishable from a
    // pre-parameter manifest
    assert(ChunkIndex.indexParams(spark, root).isEmpty)
    intercept[java.io.FileNotFoundException](
      IndexFactory.searchPersisted(spark, root, "IVF16,Flat", "hash join"))
    ChunkIndex.write(spark, sfDir, root)
    // the stamped identity round-trips through the manifest
    assert(ChunkIndex.indexParams(spark, root).flatMap(_.get("factory"))
      === Some(ChunkIndex.FactoryString))
    // the matching factory string searches the persisted index and
    // returns exactly what the direct persisted search returns
    val got = IndexFactory.searchPersisted(spark, root,
      ChunkIndex.FactoryString, "hash join", nProbe = 2, k = 5)
      .collect().map(_.toString).toSeq
    val direct = ChunkIndex.search(spark, root, "hash join", nProbe = 2, k = 5)
      .collect().map(_.toString).toSeq
    assert(got === direct && got.nonEmpty)
    // a parseable but different configuration is a loud mismatch,
    // naming both identities
    val e = intercept[IllegalArgumentException](
      IndexFactory.searchPersisted(spark, root, "IVF8,Flat", "hash join"))
    assert(e.getMessage.contains("IVF8,Flat") &&
      e.getMessage.contains(ChunkIndex.FactoryString))
    // grammar errors fail before any manifest read
    intercept[IllegalArgumentException](
      IndexFactory.searchPersisted(spark, root, "HNSW32", "hash join"))
    // an upsert carries the identity forward into the next manifest
    import spark.implicits._
    ChunkIndex.upsert(spark, root,
      Seq((999999L, "carried forward param test")).toDF("doc_id", "text"))
    assert(ChunkIndex.indexParams(spark, root).flatMap(_.get("factory"))
      === Some(ChunkIndex.FactoryString))
  }

  test("every supported string dispatches to the direct operator's frame") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val grid = Seq(
      "Flat"       -> VectorSearch.knnBrute(spark, sfDir),
      "LSH"        -> VectorSearch.annLsh(spark, sfDir),
      "SQ8"        -> VectorSearch.annQuantized(spark, sfDir),
      "PQ8"        -> VectorSearch.annPq(spark, sfDir),
      "OPQ8,PQ8x4" -> VectorSearch.annOpq(spark, sfDir),
      "IVF8,Flat"  -> VectorSearch.annIvfKmeans(spark, sfDir),
      "IVF8,PQ8x4" -> VectorSearch.annIvfPq(spark, sfDir))
    grid.foreach { case (s, direct) =>
      assert(rows(IndexFactory.search(spark, sfDir, s)) === rows(direct),
        s"factory '$s' diverged from the direct operator")
    }
  }
}
