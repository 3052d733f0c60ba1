package graft

import graft.operators.{KeywordSearch, VectorSearch}

class VectorSearchSpec extends SparkSpec {

  test("knn_brute: k results per query, ranked, cosine in [-1,1]") {
    val rows = VectorSearch.knnBrute(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == VectorSearch.NQueries)
    byQ.values.foreach { rs =>
      assert(rs.length == VectorSearch.K)
      val cos = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(cos.sameElements(cos.sortBy(-_)))
      cos.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
      assert(rs.forall(_.getAs[Long]("vec_id") >= VectorSearch.NQueries))
    }
  }

  test("knn_threshold results all clear the threshold") {
    val rows = VectorSearch.knnThreshold(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Double]("cos") >= VectorSearch.Threshold))
  }

  test("ann_ivf is a sound approximation of brute force") {
    // NOTE: the synthetic `label` buckets are random, not geometric
    // clusters, so recall is ~nProbe/nBuckets by construction; assert
    // soundness (approx ⊆ exact scores) and structure instead.
    val exactTop = VectorSearch.knnBrute(spark, sfDir).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("cos")).toMap
    val approx = VectorSearch.annIvf(spark, sfDir).collect()
    val byQ = approx.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == VectorSearch.NQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 3)
      // approximate best can never beat the exact best
      assert(rs.map(_.getAs[Double]("cos")).max <= exactTop(q) + 1e-9)
    }
  }

  test("ann_lsh is sound: bucket-mates only, never beats exact best") {
    val exactTop = VectorSearch.knnBrute(spark, sfDir).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("cos")).toMap
    val rows = VectorSearch.annLsh(spark, sfDir).collect()
    assert(rows.nonEmpty)   // at least some queries share a bucket
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Double]("cos")).max <= exactTop(q) + 1e-9)
    }
  }

  test("knn_text returns ranked docs per literal query") {
    val rows = VectorSearch.knnText(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(1L, 2L))
    byQ.values.foreach(rs => assert(rs.length == VectorSearch.K))
  }

  test("dedup_embedding pairs are ordered and same-bucket") {
    val rows = VectorSearch.dedupEmbedding(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val cos = rows.map(_.getAs[Double]("cos"))
    assert(cos.sameElements(cos.sortBy(-_)))
    rows.foreach(r => assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("multi-probe LSH recall >= single-probe recall") {
    val exact = VectorSearch.knnBrute(spark, sfDir).collect()
      .filter(_.getAs[Long]("rk") <= 3L)
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    def recall(multi: Boolean): Double = {
      val hits = VectorSearch.annLshWith(spark, sfDir, multiProbe = multi).collect()
        .count(r => exact(r.getAs[Long]("q_id")).contains(r.getAs[Long]("vec_id")))
      hits.toDouble / (exact.size * 3)
    }
    val single = recall(multi = false)
    val multi = recall(multi = true)
    assert(multi >= single, s"multi-probe recall $multi < single-probe $single")
  }

  test("dedup_embedding candidates grow linearly on a hot bucket, not quadratically") {
    import spark.implicits._
    // near-identical vectors: one label, one LSH sub-bucket — the
    // worst-case hot key. The per-vector cap must bound output pairs
    // to ~PairCap*n (8x data -> ~8x pairs; uncapped would be 64x).
    def hot(n: Int) = (0 until n).map { i =>
      (i.toLong, "hot", Array.tabulate(8)(d => 1.0 + d + i * 1e-9))
    }.toDF("vec_id", "label", "emb")
    val c1 = VectorSearch.embeddingDupCandidates(hot(64)).count()
    val c8 = VectorSearch.embeddingDupCandidates(hot(512)).count()
    assert(c1 > 0)
    assert(c8 <= 10 * c1, s"hot-bucket pair growth not linear: $c1 -> $c8")
  }

  test("ann_quantized: int8 codes bounded, scores near exact, recall high") {
    val qz = VectorSearch.annQuantized(spark, sfDir).collect()
    assert(qz.length > 0)
    qz.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // quantized vs exact score drift on shared (q_id, vec_id) pairs
    val exact = VectorSearch.knnBrute(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos")).toMap
    val shared = qz.flatMap { r =>
      exact.get((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
        .map(e => math.abs(e - r.getAs[Double]("cos")))
    }
    assert(shared.nonEmpty && shared.max < 0.05,
      s"int8 quantization drifted cosine by ${if (shared.nonEmpty) shared.max else -1}")
    // recall@3 of the 4x-smaller index stays high on this corpus
    val rec = VectorSearch.annQuantizedRecall(spark, sfDir).collect()
    val mean = rec.map(_.getAs[Double]("recall")).sum / rec.length
    assert(mean >= 0.8, s"quantized recall@3 fell to $mean")
  }

  test("ann_ivf_quantized: probe-pruned quantized search stays sound") {
    val rows = VectorSearch.annIvfQuantized(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per query: ranked 1..k, scores in range and non-increasing
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("cos"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
    // pruning can only shrink the candidate pool: the probed quantized
    // best never beats the unpruned quantized best
    val full = VectorSearch.annQuantized(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Double]("cos")).max).toMap
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Double]("cos")).max <= full(q) + 1e-9, s"q=$q")
    }
  }

  test("kmeans centroids: k clusters, and the assignment is argmax cosine") {
    import spark.implicits._
    val cent = VectorSearch.kmeansCentroids(spark, sfDir)
    val centRows = cent.collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Seq[Double]]("c_emb").toArray)
    assert(centRows.length == VectorSearch.KmClusters)
    assert(centRows.map(_._1).sorted.sameElements(0L until VectorSearch.KmClusters.toLong))
    // the Spark-side assignment (the exact frame annIvfKmeans uses to
    // relabel the index) must equal a driver-side argmax with the
    // (cos desc, label) tie-break, recomputed independently here
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5) / 10000
    }
    val sample = graft.sources.Tables.embeddings(spark, sfDir)
      .where($"vec_id" >= VectorSearch.NQueries && $"vec_id" < VectorSearch.NQueries + 50)
      .select($"vec_id", functions.VectorFunctions.toDouble($"embedding").as("emb"))
    val got = VectorSearch.assignClusters(sample, cent).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("label")).toMap
    val embs = sample.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Double]]("emb").toArray)
    assert(got.size == embs.length)
    embs.foreach { case (id, emb) =>
      val want = centRows.map { case (l, c) => (l, cos4(emb, c)) }
        .minBy { case (l, c) => (-c, l) }._1
      assert(got(id) == want, s"vec $id: spark=${got(id)} driver=$want")
    }
    assert(VectorSearch.annIvfKmeans(spark, sfDir).count() == VectorSearch.NQueries * 3)
  }

  test("ann_ivfpq: probe-pruned PQ search is sound and probe-disciplined") {
    val rows = VectorSearch.annIvfPq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("cos"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
    // probe pruning can only shrink the PQ candidate pool: the probed
    // best never beats the unpruned PQ best, and every hit scores
    // exactly what the full PQ search gives the same (q, vec) pair —
    // the fine stage reads the SAME reconstruction
    val full = VectorSearch.annPq(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos"))
      .toMap
    val fullBest = full.groupBy(_._1._1).view.mapValues(_.values.max).toMap
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Double]("cos")).max <= fullBest(q) + 1e-9, s"q=$q")
      rs.foreach { r =>
        full.get((q, r.getAs[Long]("vec_id"))).foreach { c =>
          assert(c == r.getAs[Double]("cos"), s"q=$q vec=${r.getAs[Long]("vec_id")}")
        }
      }
    }
  }

  test("ann_ivfpq_residual: sound ranks; complete in-domain codes; recall >= non-residual") {
    val rows = VectorSearch.annIvfPqResidual(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("cos"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
    // the stored residual index: every corpus vector carries exactly M
    // codes, labels in [0, Ksub), one coarse cluster per vector
    val idx = VectorSearch.ivfpqResIndex(spark, sfDir).collect()
    val perVec = idx.groupBy(_.getAs[Long]("vec_id"))
    val nCorpus = graft.sources.Tables.embeddings(spark, sfDir)
      .where(functions.VectorFunctions.toDouble(
        org.apache.spark.sql.functions.col("embedding")).isNotNull &&
        org.apache.spark.sql.functions.col("vec_id") >= VectorSearch.NQueries)
      .count()
    assert(perVec.size.toLong == nCorpus)
    perVec.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("m")).sorted.toSeq == (0 until VectorSearch.PqM))
      assert(rs.forall(r => r.getAs[Long]("label") >= 0 &&
        r.getAs[Long]("label") < VectorSearch.PqKsub))
      assert(rs.map(_.getAs[Long]("cl")).distinct.length == 1)
    }
    // residual encoding must not LOSE recall vs the non-residual
    // variant (FAISS defaults to by_residual for a reason). Measured
    // at sf0.1 — the corpus large enough for 16-entry codebooks to
    // train on signal rather than sampling noise: residual 0.133 vs
    // non-residual 0.100. (At sf0.001 the ~90-vector corpus makes
    // both recalls statistical noise, so the comparison is run at
    // sf0.1; its staged index artifacts are shared cross-JVM.)
    val sf01 = "/root/testdata/sf0.1"
    def avgRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val rs = df.collect()
      rs.map(_.getAs[Double]("recall")).sum / rs.length
    }
    assert(avgRecall(VectorSearch.annIvfPqResidualRecall(spark, sf01)) >=
      avgRecall(VectorSearch.annIvfPqRecall(spark, sf01)) - 1e-9)
  }

  test("ann_pq: codebook shape, code domain, and assignment is argmin L2") {
    import spark.implicits._
    val cb = VectorSearch.pqCodebooks(spark, sfDir)
    val cbRows = cb.collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Long]("label")) -> r.getAs[Seq[Double]]("c_sub").toArray)
      .toMap
    assert(cbRows.size == VectorSearch.PqM * VectorSearch.PqKsub)
    cbRows.keys.foreach { case (m, l) =>
      assert(m >= 0 && m < VectorSearch.PqM && l >= 0 && l < VectorSearch.PqKsub)
    }
    val dims = cbRows.values.map(_.length).toSet
    assert(dims.size == 1, s"ragged subspace dims: $dims")
    // codes: every vector carries exactly M codes, all in [0, Ksub)
    val codes = VectorSearch.pqCodes(spark, sfDir).collect()
    val perVec = codes.groupBy(_.getAs[Long]("vec_id"))
    perVec.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("m")).sorted.toSeq == (0 until VectorSearch.PqM))
      assert(rs.forall(r => r.getAs[Long]("label") >= 0 &&
        r.getAs[Long]("label") < VectorSearch.PqKsub))
    }
    // the stored assignment must equal a driver-side argmin of the
    // parity-rounded expanded squared L2 with the label tie-break
    def d2r4(x: Array[Double], c: Array[Double]): Double = {
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      math.floor(((dot(x, x) + dot(c, c)) - 2.0 * dot(x, c)) * 10000 + 0.5) / 10000
    }
    val subDim = dims.head
    val sample = graft.sources.Tables.embeddings(spark, sfDir)
      .where($"vec_id" < 50)
      .select($"vec_id", functions.VectorFunctions.toDouble($"embedding").as("emb"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Double]]("emb").toArray)
    sample.foreach { case (id, emb) =>
      (0 until VectorSearch.PqM).foreach { m =>
        val sub = emb.slice(m * subDim, (m + 1) * subDim)
        val want = (0L until VectorSearch.PqKsub.toLong)
          .map(l => (l, d2r4(sub, cbRows((m, l)))))
          .minBy { case (l, d) => (d, l) }._1
        val got = perVec(id).find(_.getAs[Int]("m") == m).get.getAs[Long]("label")
        assert(got == want, s"vec $id sub $m: spark=$got driver=$want")
      }
    }
  }

  test("ann_pq search is sound and recall is meaningful") {
    val rows = VectorSearch.annPq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("cos"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
    // the synthetic embeddings are noise-like (top-1 cosine ~0.35 vs
    // top-20 ~0.21) — PQ's adversarial case, since there is no
    // low-dimensional structure for the codebooks to capture. The
    // honest contract is the MEASURED recall (ann_pq_recall is
    // itself an oracle row); assert it beats chance (3/|corpus| ≈
    // 0.006 here) by an order of magnitude, not a structured-data
    // recall it cannot have
    val rec = VectorSearch.annPqRecall(spark, sfDir).collect()
    val mean = rec.map(_.getAs[Double]("recall")).sum / rec.length
    val corpusN = graft.sources.Tables.embeddings(spark, sfDir)
      .where(s"vec_id >= ${VectorSearch.NQueries}").count()
    val chance = 3.0 / corpusN
    assert(mean >= 10 * chance, s"pq recall@3 $mean vs chance $chance")
  }

  test("OPQ rotation is orthonormal: norms and pairwise cosines preserved") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("emb"))
      .orderBy(col("vec_id")).limit(20)
    val rows = emb.select(col("vec_id"), col("emb"),
        VectorSearch.opqRotate(col("emb")).as("remb"))
      .collect()
      .map(r => (r.getAs[Seq[Double]]("emb").toArray, r.getAs[Seq[Double]]("remb").toArray))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    rows.foreach { case (x, rx) =>
      assert(rx.length == VectorSearch.OpqDim)
      assert(math.abs(dot(x, x) - dot(rx, rx)) < 1e-9, "norm not preserved")
    }
    for (Seq((x, rx), (y, ry)) <- rows.toSeq.combinations(2).take(50))
      assert(math.abs(dot(x, y) - dot(rx, ry)) < 1e-9,
        "inner product not preserved — rotation is not orthonormal")
    // a wrong-dimension vector fails loudly, not silently
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "emb")
        .select(VectorSearch.opqRotate(col("emb"))).collect()
    }
    assert(e.getMessage.contains("OPQ rotation needs exactly"))
  }

  test("ann_opq: code domain bounded and recall@3 >= plain PQ's (measured)") {
    val codes = VectorSearch.opqCodes(spark, sfDir).collect()
    assert(codes.nonEmpty)
    assert(codes.forall { r =>
      val l = r.getAs[Long]("label")
      l >= 0 && l < VectorSearch.PqKsub && r.getAs[Int]("m") < VectorSearch.PqM
    })
    // the pre-rotation must not cost recall on the same corpus —
    // measured 6 vs 4 hits at sf0.001, 5 vs 5 at sf0.01, 3 vs 2 at
    // sf0.1 (the rotation spreads the corpus's per-subspace variance,
    // which is what OPQ buys)
    val opqHits = VectorSearch.annOpqRecall(spark, sfDir)
      .collect().map(_.getAs[Long]("hits")).sum
    val pqHits = VectorSearch.annPqRecall(spark, sfDir)
      .collect().map(_.getAs[Long]("hits")).sum
    assert(opqHits >= pqHits,
      s"OPQ recall regressed vs plain PQ: $opqHits vs $pqHits hits")
  }

  test("keyword_search scores follow the reference formula bounds") {
    val rows = KeywordSearch.keywordSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s > 0 && s <= 1.0)
    }
  }

  test("hybrid_quality = avg_sim + capped count bonus") {
    KeywordSearch.hybridQuality(spark, sfDir).collect().foreach { r =>
      val q = r.getAs[Double]("quality")
      val avg = r.getAs[Double]("avg_sim")
      assert(q <= 1.0 && q >= avg - 1e-9)
    }
  }

  test("hybrid_rank: high→medium→low priority ordering") {
    val rows = KeywordSearch.hybridRank(spark, sfDir).collect()
    val prios = rows.map(_.getAs[String]("priority")).distinct
    assert(prios.contains("high") && prios.contains("medium"))
    val ords = rows.map(_.getAs[Long]("ord"))
    assert(ords.sameElements(ords.sorted))
    assert(rows.count(_.getAs[String]("priority") == "high") <= 2)
  }

  test("combined context renders both sections in reference order") {
    KeywordSearch.hybridContext(spark, sfDir).collect().foreach { r =>
      val c = r.getAs[String]("combined_context")
      val ci = c.indexOf("USER CONTRIBUTIONS AND ENHANCEMENTS:")
      val fi = c.indexOf("ORIGINAL KNOWLEDGE BASE:")
      assert(ci == 0 && fi > ci, c.take(80))
      assert(c.contains("DOCUMENT #1 (from "))
      assert(!c.contains("SUPPLEMENTARY"))
    }
    KeywordSearch.hybridContextPrioritized(spark, sfDir).collect().foreach { r =>
      val c = r.getAs[String]("combined_context")
      assert(c.startsWith("USER CONTRIBUTIONS (PRIORITIZED):"), c.take(60))
      assert(c.contains("🎯 HIGHLY RELEVANT USER CONTRIBUTION #1"))
      assert(c.contains("SUPPLEMENTARY DOCUMENTATION:"))
      assert(!c.contains("ORIGINAL KNOWLEDGE BASE:"))
    }
  }

  test("ask_batch sources listing and recommendation match the counts") {
    KeywordSearch.askBatch(spark, sfDir).collect().foreach { r =>
      val fc = r.getAs[Long]("faiss_count")
      val cc = r.getAs[Long]("contribution_count")
      val srcs = r.getAs[String]("sources").split("\n")
      assert(srcs.length == fc + cc)
      assert(srcs.count(_.contains("source_type=original_document")) == fc)
      assert(srcs.count(_.contains("source_type=user_contribution")) == cc)
      // documents listed before contributions, as in get_enhanced_sources
      val firstContrib = srcs.indexWhere(_.contains("user_contribution"))
      if (firstContrib >= 0)
        assert(srcs.take(firstContrib).forall(_.contains("original_document")))
      val rec = r.getAs[String]("recommendation")
      val want =
        if (fc == 0 && cc == 0) "No relevant information found"
        else if (fc > 0 && cc > 0) "Great! Found both"
        else if (fc > 0) "Found relevant information"
        else "Found user contributions"
      assert(rec.startsWith(want), rec)
    }
  }
}
