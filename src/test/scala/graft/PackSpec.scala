package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pack, TextAnalysis}
import graft.sources.Tables

/** Invariants for the training-batch prep operators (Pack.scala) and
  * the exact-vocab twin of the Misra–Gries sketch. Everything here is
  * structural — true for ANY corpus — so a regenerated testdata dir
  * cannot fail these spuriously.
  */
class PackSpec extends SparkSpec {

  private val budget = Pack.DefaultSeqTokens

  test("pipeline_trainprep_scored: kept set is curated, non-tail, and laid out validly") {
    import graft.operators.{Curate, Perplexity}
    val packed = Pack.trainPrepScored(spark, sfDir).collect()
    assert(packed.nonEmpty)
    // layout: one row per doc, in-range offsets
    assert(packed.map(_.getAs[Long]("doc_id")).distinct.length === packed.length)
    assert(packed.forall { r =>
      val off = r.getAs[Long]("tok_offset")
      off >= 0 && off < budget && r.getAs[Long]("seq_id") >= 0
    })
    // every packed doc survived curation AND escaped the tail tercile
    val surv = Curate.survivors(spark, sfDir)
    val sc = Perplexity.scoreAgainst(Perplexity.modelOf(spark, surv), surv)
    val cuts = Perplexity.cutsOf(sc).head()
    val keptOk = sc.collect()
      .filter(_.getAs[Double]("xent") <= cuts.getAs[Double]("c2"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(packed.forall(r => keptOk(r.getAs[Long]("doc_id"))),
      "a packed doc is in the dropped tail tercile or unscoreable")
  }

  test("trainPrepScored scorer seam: the KN keep-gate stages separately and holds the same invariants") {
    import graft.operators.{Curate, Perplexity}
    val packed = Pack.trainPrepScored(spark, sfDir,
        scorer = Perplexity.Scorer.kn())
      .collect()
    assert(packed.nonEmpty)
    assert(packed.map(_.getAs[Long]("doc_id")).distinct.length === packed.length)
    // kept ⊆ KN-scored non-tail survivors — the same keep contract,
    // under the KN ranking (cutoffs recomputed over KN scores)
    val surv = Curate.survivors(spark, sfDir)
    val sc = Perplexity.scoreAgainstKn(Perplexity.modelOf(spark, surv), surv)
    val cuts = Perplexity.cutsOf(sc).head()
    val keptOk = sc.collect()
      .filter(_.getAs[Double]("xent") <= cuts.getAs[Double]("c2"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(packed.forall(r => keptOk(r.getAs[Long]("doc_id"))),
      "a KN-packed doc is in the KN tail tercile or unscoreable")
    // a tag that could corrupt the staging path is rejected at
    // Scorer construction — before any artifact name exists
    intercept[IllegalArgumentException](
      Perplexity.Scorer("../evil", Perplexity.scoreAgainst(_, _)))
    // the tag travels WITH the function: the default artifact name
    // only ever holds add-one output, the KN call stages separately
    assert(Perplexity.Scorer.kn().tag != Perplexity.Scorer.AddOne.tag)
  }

  test("trainPrepScored with the 5-gram KN scorer: the scorer's own model builder drives the keep gate") {
    import graft.operators.{Curate, Perplexity}
    val packed = Pack.trainPrepScored(spark, sfDir,
        scorer = Perplexity.Scorer.kn5())
      .collect()
    assert(packed.nonEmpty)
    assert(packed.map(_.getAs[Long]("doc_id")).distinct.length === packed.length)
    // kept ⊆ kn5-scored non-tail survivors, under the kn5 ranking AND
    // the kn5 scoreable population (>= 5 tokens — shorter survivors
    // drop with the tail, the higher-order keep contract)
    val surv = Curate.survivors(spark, sfDir)
    val sc = Perplexity.scoreAgainstKn5(Perplexity.modelOf5(spark, surv), surv)
    val cuts = Perplexity.cutsOf(sc).head()
    val keptOk = sc.collect()
      .filter(_.getAs[Double]("xent") <= cuts.getAs[Double]("c2"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(packed.forall(r => keptOk(r.getAs[Long]("doc_id"))),
      "a kn5-packed doc is in the kn5 tail tercile or below the 5-gram floor")
    // distinct family => distinct staged artifact
    assert(Perplexity.Scorer.kn5().tag != Perplexity.Scorer.kn().tag)
  }

  test("sequence_pack: a total, contiguous, zero-padding layout") {
    val docs = Tables.documents(spark, sfDir)
    val pack = Pack.seqPack(spark, sfDir).collect()

    // total: every document appears exactly once
    assert(pack.length === docs.count())
    assert(pack.map(_.getAs[Long]("doc_id")).distinct.length === pack.length)

    // offsets are in-range and sequences start at 0
    assert(pack.forall { r =>
      val off = r.getAs[Long]("tok_offset")
      off >= 0 && off < budget && r.getAs[Long]("seq_id") >= 0
    })

    // contiguity: within a shard (doc_id order), each doc starts
    // exactly where the previous one ended — the concat-and-chunk
    // stream has no gaps and no overlaps, hence zero padding waste
    pack.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var expectStart = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val start = r.getAs[Long]("seq_id") * budget + r.getAs[Long]("tok_offset")
        assert(start === expectStart, s"gap at doc ${r.getAs[Long]("doc_id")}")
        expectStart = start + r.getAs[Long]("n_tok")
      }
    }
  }

  test("sequence_pack params: nShards=1 is one global stream; budget beyond the corpus is one sequence") {
    val one = Pack.seqPack(spark, sfDir, nShards = 1).collect()
    assert(one.map(_.getAs[Long]("shard")).distinct.toSeq === Seq(0L))
    val starts = one.sortBy(_.getAs[Long]("doc_id"))
      .map(r => r.getAs[Long]("seq_id") * budget + r.getAs[Long]("tok_offset"))
    assert(starts.toSeq === starts.sorted.toSeq) // doc_id order IS stream order

    val big = Pack.seqPack(spark, sfDir, budget = 1 << 30)
    assert(big.where(col("seq_id") =!= 0).count() === 0)
    intercept[IllegalArgumentException](Pack.seqPack(spark, sfDir, budget = 0))
    intercept[IllegalArgumentException](Pack.seqPack(spark, sfDir, nShards = -1))
  }

  test("pack_stats agrees with the packing it summarizes") {
    val stats = Pack.packStats(spark, sfDir).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Double]("fill_ratio"))).toMap
    val byShard = Pack.seqPack(spark, sfDir).collect().groupBy(_.getAs[Long]("shard"))
    assert(stats.keySet === byShard.keySet)
    byShard.foreach { case (shard, rows) =>
      val (nDocs, tot, nSeqs, fill) = stats(shard)
      assert(nDocs === rows.length)
      val totTok = rows.map(_.getAs[Long]("n_tok")).sum
      assert(tot === totTok)
      assert(nSeqs === (totTok + budget - 1) / budget)
      // the only under-fill is the final partial sequence
      assert(math.abs(fill - totTok.toDouble / (nSeqs * budget)) < 1e-4)
      assert(fill > 0.0 && fill <= 1.0)
    }
  }

  test("dataset_mix: binding stratum kept whole, every kept doc under its coin, rates exact") {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val minN = counts.values.min
    val kept = Pack.datasetMix(spark, sfDir)

    // uniform shares ⇒ rate_s = min_n / n_s; the smallest stratum is
    // the binding one and is kept in full
    val rates = kept.select("lang", "rate").distinct().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("rate")).toMap
    rates.foreach { case (lang, rate) =>
      assert(math.abs(rate - math.floor(minN.toDouble / counts(lang) * 1e4 + 0.5) / 1e4) < 1e-9)
    }
    val binding = counts.minBy(_._2)._1
    assert(kept.where(col("lang") === binding).count() === minN)

    // the coin is the salted md5 uniform — no kept doc violates it
    import graft.functions.TextFunctions.md5Long
    val u = md5Long(concat(lit("mix:"), col("doc_id").cast("string")), 1, 8)
      .cast("double") / 4294967296.0
    val keptIds = kept.select("doc_id")
    val violating = docs.join(keptIds, "doc_id")
      .withColumn("u", u)
      .join(kept.select(col("lang"), col("rate")).distinct(), "lang")
      // rate is round4-ed for output; allow the rounding in the check
      .where(col("u") >= col("rate") + 5e-5)
    assert(violating.count() === 0)

    intercept[IllegalArgumentException](
      Pack.datasetMix(spark, sfDir, shares = Map("en" -> -1.0)))
  }

  test("dataset_mix(shares): explicit weights shift the rates, binding stratum at rate 1") {
    val kept = Pack.datasetMix(spark, sfDir, shares = Map("en" -> 3.0, "fr" -> 1.0))
    val langs = kept.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "fr"))) // unweighted strata are dropped
    // whichever stratum binds capacity is kept at rate exactly 1.0
    val rates = kept.select("lang", "rate").distinct().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("rate")).toMap
    assert(rates.values.max === 1.0)
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
  }

  test("dataset_mix_epochs: per-doc copies bounded by the stratum's epoch need, indices contiguous") {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val maxN = counts.values.max
    val out = Pack.datasetMixEpochs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("copy_idx")))

    // per doc: copy indices are exactly 0..k-1 for some k ≥ 1
    out.groupBy(_._1).foreach { case (_, rows) =>
      val idx = rows.map(_._3).sorted
      assert(idx.toSeq === (0L until idx.length).toSeq)
      assert(idx.length <= Pack.MaxEpochs)
    }
    // per stratum: every doc emits either floor(need/n) or one more
    // (need = uniform target = capacity/k ≈ maxN up to FP), and the
    // stratum total sits inside those bounds
    counts.foreach { case (lang, n) =>
      val copies = out.filter(_._2 == lang).groupBy(_._1).map(_._2.length.toLong)
      assert(copies.nonEmpty && copies.size === n)
      val lo = copies.min
      val hi = copies.max
      assert(hi - lo <= 1, s"$lang: copies span more than one epoch: $lo..$hi")
      assert(hi <= math.min((maxN / n + 1), Pack.MaxEpochs.toLong))
    }
    // every document of every stratum appears at least once
    assert(out.map(_._1).distinct.length === docs.count())
    intercept[IllegalArgumentException](
      Pack.datasetMixEpochs(spark, sfDir, maxEpochs = 0))
  }

  test("pipeline_trainprep packs exactly the curated survivor set, contiguously") {
    val survivors = graft.operators.Curate.curateApply(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted
    val packed = Pack.trainPrep(spark, sfDir).collect()
    assert(packed.map(_.getAs[Long]("doc_id")).sorted.toSeq === survivors.toSeq)
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var expectStart = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val start = r.getAs[Long]("seq_id") * budget + r.getAs[Long]("tok_offset")
        assert(start === expectStart)
        expectStart = start + r.getAs[Long]("n_tok")
      }
    }
  }

  test("dataset_mix: a share key matching no stratum fails loudly") {
    // a typo'd stratum name must not silently produce a lossy mixture
    val bad = Pack.datasetMix(spark, sfDir, shares = Map("zz_typo" -> 1.0, "en" -> 1.0))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null && e.getMessage.contains("zz_typo"),
      s"error should name the offending key: ${e.getMessage}")
  }

  test("sorted=false drops the global presentation sort from the plan") {
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    // default keeps the oracle's doc_id order; sorted=false must have
    // NO range exchange (the 100 TB layout path writes shards, not a
    // totally-ordered table)
    assert(finalPlan(Pack.seqPack(spark, sfDir)).contains("rangepartitioning"))
    val unsortedPack = finalPlan(Pack.seqPack(spark, sfDir, sorted = false))
    assert(!unsortedPack.contains("rangepartitioning"),
      s"sorted=false still range-partitions:\n$unsortedPack")
    val unsortedMix = finalPlan(Pack.datasetMix(spark, sfDir, sorted = false))
    assert(!unsortedMix.contains("rangepartitioning"),
      s"sorted=false still range-partitions:\n$unsortedMix")
    val unsortedEpochs = finalPlan(Pack.datasetMixEpochs(spark, sfDir, sorted = false))
    assert(!unsortedEpochs.contains("rangepartitioning"),
      s"sorted=false still range-partitions:\n$unsortedEpochs")
    // same rows either way
    assert(Pack.seqPack(spark, sfDir, sorted = false).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq ===
      Pack.seqPack(spark, sfDir).collect().map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("pipeline_trainprep_mixed: a mixed subset of the survivors, packed contiguously") {
    val survivors = graft.operators.Curate.curateApply(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val full = Pack.trainPrep(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val mixed = Pack.trainPrepMixed(spark, sfDir).collect()
    val mixedIds = mixed.map(_.getAs[Long]("doc_id")).toSet

    // strict subset of the survivor set (the mix drops over-represented
    // strata), never inventing documents
    assert(mixedIds.subsetOf(survivors) && mixedIds.subsetOf(full))
    assert(mixedIds.nonEmpty && mixedIds.size < survivors.size)

    // the packing invariant holds over the mixed subset
    mixed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var expectStart = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val start = r.getAs[Long]("seq_id") * budget + r.getAs[Long]("tok_offset")
        assert(start === expectStart)
        expectStart = start + r.getAs[Long]("n_tok")
      }
    }
    // deterministic: a second run is bit-identical
    assert(Pack.trainPrepMixed(spark, sfDir).collect().map(_.toSeq).toSeq
      === mixed.map(_.toSeq).toSeq)
  }

  test("token_vocab is exact and bounds the Misra-Gries sketch") {
    val exact = TextAnalysis.tokenVocab(spark, sfDir, topN = Int.MaxValue).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("cnt")).toMap
    // top-5 is a prefix of top-50 (total order: cnt desc, token asc)
    val t5 = TextAnalysis.tokenVocab(spark, sfDir, topN = 5).collect().toSeq
    val t50 = TextAnalysis.tokenVocab(spark, sfDir, topN = 50).collect().toSeq
    assert(t5 === t50.take(5))
    // MG honesty through the public operators: est ≤ true ≤ est + err
    TextAnalysis.approxTopTokens(spark, sfDir).collect().foreach { r =>
      val tok = r.getAs[String]("token")
      val est = r.getAs[Long]("est_count")
      val err = r.getAs[Long]("err")
      val truth = exact.getOrElse(tok, 0L)
      assert(est <= truth && truth <= est + err,
        s"sketch dishonest for '$tok': est=$est err=$err true=$truth")
    }
    intercept[IllegalArgumentException](TextAnalysis.tokenVocab(spark, sfDir, topN = 0))
  }

  test("dataset_mix_temperature: exact sqrt rates, smallest stratum whole, stream parity") {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmin = counts.values.min
    val rates = Pack.mixTemperatureRatesOf(docs, "lang").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates.keySet == counts.keySet)
    // bit-exact: one IEEE division + one IEEE sqrt, both correctly rounded
    counts.foreach { case (l, n) =>
      assert(rates(l) == math.sqrt(nmin.toDouble / n.toDouble), s"rate for $l")
    }
    assert(rates(counts.minBy(_._2)._1) == 1.0)
    // soft cut: every temperature rate ≥ the uniform mix's equal-cut
    // rate for the same stratum (sqrt(x) ≥ x on [0,1])
    val uniformRates = Pack.mixRatesOf(spark, docs, "lang").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    counts.keys.foreach(l => assert(rates(l) >= uniformRates(l) - 1e-12))
    // keep decision reproduces through the streaming applier under the
    // mixt: salt — the epoch-frozen-rates deployment path
    val batch = Pack.datasetMixTemperature(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val stream = graft.streaming.MixStream.mixApply(spark, docs,
        Pack.mixTemperatureRatesOf(docs, "lang"), "lang", salt = "mixt:")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == stream)
    assert(batch.nonEmpty && batch.size < counts.values.sum)
  }
}
