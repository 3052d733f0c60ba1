package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ingest, Multimodal}
import graft.sources.Tables

/** The pluggable inference seams must be drop-in equivalents of the
  * columnar pipelines they stand in for.
  */
class IngestSeamSpec extends SparkSpec {

  test("embedWith(HashedBowEmbedder) batch seam == columnar docEmbed exactly") {
    // pivot the columnar long form to wide vectors
    val colMap = Ingest.docEmbed(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues { rows =>
        val v = new Array[Float](Ingest.EmbedDim)
        rows.foreach(r => v(r.getAs[Long]("dim").toInt) = r.getAs[Double]("weight").toFloat)
        v.toVector
      }.toMap
    val seam = Ingest.embedWith(spark,
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        Ingest.HashedBowEmbedder)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](1).toVector)
      .toMap
    assert(seam.keySet == colMap.keySet)
    val diffs = seam.filter { case (id, v) => v != colMap(id) }
    assert(diffs.isEmpty, s"seam diverges from columnar pipeline: ${diffs.take(2)}")
  }

  test("a custom TextEmbedder drops in and batching is respected") {
    // the embedder is serialized into tasks, so record the batch size
    // IN the output vector instead of via driver-side shared state
    val fixed = new Ingest.TextEmbedder {
      override def batchSize: Int = 7
      def open(): Ingest.TextEncoder = new Ingest.TextEncoder {
        def embed(texts: Seq[String]): Seq[Array[Float]] =
          texts.map(_ => Array(texts.length.toFloat))
      }
    }
    val out = Ingest.embedWith(spark,
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), fixed)
      .collect()
    assert(out.length == Tables.documents(spark, sfDir).count())
    val batchSizes = out.map(_.getSeq[Float](1).head.toInt)
    assert(batchSizes.forall(n => n >= 1 && n <= 7))
    assert(batchSizes.max == 7, "no full batch was ever formed")
  }

  test("doc_extract pages reassemble to the original text") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val pages = Multimodal.docExtract(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(pages.keySet == docs.keySet.filter(docs(_).nonEmpty))
    pages.foreach { case (id, rows) =>
      val joined = rows.sortBy(_.getAs[Long]("page_no"))
        .map(_.getAs[String]("page_text")).mkString
      assert(joined == docs(id), s"pages of doc $id do not reassemble")
      rows.dropRight(1).foreach(r =>
        assert(r.getAs[Long]("page_chars") == Multimodal.PageChars))
    }
  }
}
