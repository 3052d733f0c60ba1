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
  }

  test("rejects what it cannot parse, names the component") {
    val e1 = intercept[IllegalArgumentException](parse("HNSW32"))
    assert(e1.getMessage.contains("HNSW32"))
    val e2 = intercept[IllegalArgumentException](parse("IVF8"))
    assert(e2.getMessage.contains("fine stage"))
    val e3 = intercept[IllegalArgumentException](parse("SQ4"))
    assert(e3.getMessage.contains("SQ8"))
    intercept[IllegalArgumentException](parse(""))
  }

  test("parseable but untrained configurations fail with the supported grid") {
    for (s <- Seq("IVF32,Flat", "PQ16", "IVF8,PQ4", "PQ8x8")) {
      val e = intercept[IllegalArgumentException](
        IndexFactory.search(spark, sfDir, s))
      assert(e.getMessage.contains("supported:"), s"no grid in message for '$s'")
    }
  }

  test("every supported string dispatches to the direct operator's frame") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val grid = Seq(
      "Flat"       -> VectorSearch.knnBrute(spark, sfDir),
      "LSH"        -> VectorSearch.annLsh(spark, sfDir),
      "SQ8"        -> VectorSearch.annQuantized(spark, sfDir),
      "PQ8"        -> VectorSearch.annPq(spark, sfDir),
      "IVF8,Flat"  -> VectorSearch.annIvfKmeans(spark, sfDir),
      "IVF8,PQ8x4" -> VectorSearch.annIvfPq(spark, sfDir))
    grid.foreach { case (s, direct) =>
      assert(rows(IndexFactory.search(spark, sfDir, s)) === rows(direct),
        s"factory '$s' diverged from the direct operator")
    }
  }
}
