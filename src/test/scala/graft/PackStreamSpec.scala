package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Pack
import graft.streaming.{DocIn, PackStream}

/** The streaming packer must reproduce the batch layout when fed the
  * corpus in doc_id order (the append-only ingest contract), for ANY
  * micro-batch split — and stay a valid zero-padding layout under
  * out-of-order arrival.
  */
class PackStreamSpec extends SparkSpec {

  private def loadDocs() = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit(0L).as("ts_ms"), col("text"))
      .as[DocIn].collect().sortBy(_.doc_id)
  }

  private def runStream(batches: Seq[Seq[DocIn]], name: String) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocIn]
    val query = PackStream.pack(spark, input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); query.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"),
            r.getAs[Long]("tok_offset"), r.getAs[Long]("n_tok"))))
        .sortBy(_._1)
    } finally query.stop()
  }

  private def batchLayout() =
    Pack.seqPack(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"),
          r.getAs[Long]("tok_offset"), r.getAs[Long]("n_tok"))))
      .sortBy(_._1)

  test("in-order stream reproduces the batch packing for any micro-batch split") {
    val docs = loadDocs()
    val expected = batchLayout()
    // one big batch, and an uneven 3-way split — same layout both ways
    assert(runStream(Seq(docs.toSeq), "pack_all").toSeq === expected.toSeq)
    val (a, rest) = docs.splitAt(docs.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    assert(runStream(Seq(a.toSeq, b.toSeq, c.toSeq), "pack_split").toSeq === expected.toSeq)
  }

  test("out-of-order arrival still yields a total, contiguous, in-range layout") {
    val docs = loadDocs()
    // reverse arrival order — maximally unlike doc_id order
    val got = runStream(Seq(docs.reverse.toSeq), "pack_rev")
    assert(got.length === docs.length)
    assert(got.map(_._1).distinct.length === docs.length)
    val budget = Pack.DefaultSeqTokens
    // per shard: the assigned (start, n_tok) intervals tile [0, total)
    got.groupBy(_._2._1).foreach { case (_, rows) =>
      val ivs = rows.map { case (_, (_, seq, off, n)) => (seq * budget + off, n) }
        .sortBy(_._1)
      var expectStart = 0L
      ivs.foreach { case (start, n) =>
        assert(start === expectStart)
        assert(start % budget < budget)
        expectStart = start + n
      }
    }
  }
}
