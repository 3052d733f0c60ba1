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

  test("file-loaded RandomProjectionEmbedder: artifact-backed seam, not the columnar twin") {
    val modelPath = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_rp").toFile, "rp.model").getPath
    Ingest.RandomProjectionModel.write(modelPath, seed = 42L, inDim = 64, outDim = 24)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).limit(200)
    val rp = Ingest.embedWith(spark, docs, new Ingest.RandomProjectionEmbedder(modelPath))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](1).toVector).toMap

    // (1) the LOADED WEIGHTS drive the output: a different-seed
    // artifact at the same dims produces different vectors — the seam
    // carries a genuinely external model, not a re-derivation of
    // pipeline math (a dims-only check would pass vacuously)
    val otherPath = new java.io.File(new java.io.File(modelPath).getParent, "rp2.model").getPath
    Ingest.RandomProjectionModel.write(otherPath, seed = 7L, inDim = 64, outDim = 24)
    val rpOther = Ingest.embedWith(spark, docs, new Ingest.RandomProjectionEmbedder(otherPath))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](1).toVector).toMap
    val bow = Ingest.embedWith(spark, docs, Ingest.HashedBowEmbedder)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](1).toVector).toMap
    assert(rp.keySet == bow.keySet && rpOther.keySet == rp.keySet)
    assert(rp.values.head.length == 24 && bow.values.head.length == Ingest.EmbedDim)
    assert(rp.count { case (id, v) => v != rpOther(id) } > 190,
      "different artifacts must embed differently — output ignores the loaded weights")

    // (2) deterministic: a second run over the same artifact bit-matches
    val rp2 = Ingest.embedWith(spark, docs, new Ingest.RandomProjectionEmbedder(modelPath))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](1).toVector).toMap
    assert(rp2 == rp)

    // (3) search self-consistency: embedding a doc's own text again and
    // searching the corpus brute-force by cosine returns that doc top-1
    // (ties only with content-identical duplicates, which score equally)
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def cos(a: Vector[Float], b: Vector[Float]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val sample = texts.keys.toSeq.sorted.take(25)
    sample.foreach { qid =>
      val q = rp(qid)
      val best = rp.maxBy { case (_, v) => cos(q, v) }
      val bestScore = cos(q, best._2)
      assert(math.abs(cos(q, rp(qid)) - bestScore) < 1e-6,
        s"doc $qid does not retrieve itself (or an exact duplicate) top-1")
    }
  }

  test("embedWith: open() runs exactly once per non-empty partition") {
    // local mode shares one JVM, so a static counter observes every
    // task's open(); each open() tags its rows with its own sequence
    // number, so rows prove WHICH open served them
    IngestSeamSpec.openSeq.set(0)
    val counting = new Ingest.TextEmbedder {
      override def batchSize: Int = 16
      def open(): Ingest.TextEncoder = new Ingest.TextEncoder {
        private val id = IngestSeamSpec.openSeq.incrementAndGet()
        def embed(texts: Seq[String]): Seq[Array[Float]] =
          texts.map(_ => Array(id.toFloat))
      }
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).repartition(5)
    val out = Ingest.embedWith(spark, docs, counting).collect()
    assert(out.length === docs.count())
    val opens = out.map(_.getSeq[Float](1).head.toInt).distinct.sorted
    assert(opens.length === 5,
      s"expected one open() per partition (5), rows were served by ${opens.length}")
    assert(IngestSeamSpec.openSeq.get() === 5,
      s"open() ran ${IngestSeamSpec.openSeq.get()} times for 5 partitions — " +
        "the per-partition model load is not amortized")
  }

  test("knn_model: staged artifact search returns k hits per query, no self-hits") {
    import graft.operators.VectorSearch
    val rows = VectorSearch.knnModel(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === (0L until VectorSearch.NQueries.toLong).toSet)
    byQ.foreach { case (q, hits) =>
      assert(hits.length === VectorSearch.K, s"query $q returned ${hits.length} hits")
      assert(hits.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to VectorSearch.K.toLong))
      assert(hits.forall(_.getAs[Long]("doc_id") >= VectorSearch.NQueries),
        s"query $q retrieved a query-batch doc")
      // scores are round4'd and descend with rank
      val cs = hits.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      cs.foreach(c => assert(c === math.floor(c * 1e4 + 0.5) / 1e4))
    }
  }

  test("PCA training is deterministic: same corpus -> identical artifact bytes") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // moments are exact integers, so ANY partitioning folds to the
    // same triple — recompute under a different partitioning
    val (n1, s1, g1) = Ingest.bowMoments(spark, docs, Ingest.RpInDim)
    val (n2, s2, g2) = Ingest.bowMoments(spark, docs.repartition(7), Ingest.RpInDim)
    assert(n1 === n2); assert(s1.toSeq === s2.toSeq); assert(g1.toSeq === g2.toSeq)
    assert(n1 === docs.count())
    // and the driver-side train is a pure function of the moments
    val w1 = Ingest.trainPcaWeights(n1, s1, g1, Ingest.RpInDim, Ingest.PcaOutDim)
    val w2 = Ingest.trainPcaWeights(n2, s2, g2, Ingest.RpInDim, Ingest.PcaOutDim)
    assert(w1.toSeq === w2.toSeq, "training drifted across identical moments")
    assert(w1.exists(_ != 0f))
  }

  test("PCA artifact is LEARNED: a different corpus trains different weights") {
    import spark.implicits._
    val a = Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta epsilon"),
      (2L, "gamma delta zeta"), (3L, "beta gamma eta theta")).toDF("doc_id", "text")
    val b = Seq((0L, "one two three four"), (1L, "two three five"),
      (2L, "four five six"), (3L, "one six seven eight")).toDF("doc_id", "text")
    def weightsOf(df: org.apache.spark.sql.DataFrame): Seq[Float] = {
      val (n, s, g) = Ingest.bowMoments(spark, df, Ingest.RpInDim)
      Ingest.trainPcaWeights(n, s, g, Ingest.RpInDim, Ingest.PcaOutDim).toSeq
    }
    assert(weightsOf(a) !== weightsOf(b),
      "two different corpora trained the same artifact — weights are not learned")
    // self-consistency on the tiny frame too
    assert(weightsOf(a) === weightsOf(a))
  }

  test("knn_model_trained: staged trained-artifact search has knn_model's contract") {
    import graft.operators.VectorSearch
    val rows = VectorSearch.knnModelTrained(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === (0L until VectorSearch.NQueries.toLong).toSet)
    byQ.foreach { case (q, hits) =>
      assert(hits.length === VectorSearch.K, s"query $q returned ${hits.length} hits")
      assert(hits.forall(_.getAs[Long]("doc_id") >= VectorSearch.NQueries),
        s"query $q retrieved a query-batch doc")
      val cs = hits.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      cs.foreach(c => assert(c === math.floor(c * 1e4 + 0.5) / 1e4))
    }
    // the trained projection is a REAL 16-dim embedding: vectors unit-normalized
    val v = Ingest.pcaEmbedCached(spark, sfDir).limit(20).collect()
    v.foreach { r =>
      val e = r.getSeq[Double](r.fieldIndex("emb"))
      assert(e.length === Ingest.PcaOutDim)
      val nrm = math.sqrt(e.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 2e-3, s"doc ${r.getLong(0)}: |emb| = $nrm")
    }
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

object IngestSeamSpec {
  /** JVM-wide open() sequence for the per-partition-load spec. */
  val openSeq = new java.util.concurrent.atomic.AtomicInteger(0)
}
