package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Curate
import graft.streaming.{CurateStream, DocIn}

/** The incremental curation pipeline must reproduce the batch
  * funnel's cleaned corpus when documents arrive in ascending id
  * order (where keep-min ≡ keep-first), across any micro-batch
  * split, and stay incremental: a batch only pays for its own docs
  * plus bounded state joins.
  */
class CurateStreamSpec extends SparkSpec {

  /** The batch funnel's input corpus, ascending — batch keep-min
    * rules coincide with keep-first-arrival in this order.
    */
  private def corpusAscending(): Seq[(Long, String)] =
    Curate.curateCorpus(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1).toSeq

  test("streamed curation over ascending micro-batches equals batch curate_apply") {
    val stateDir = Files.createTempDirectory("graft_curate_stream").toString
    val corpus = corpusAscending()
    import spark.implicits._
    // three uneven batches, processed through the foreachBatch body
    val cuts = Seq(corpus.length / 3, 2 * corpus.length / 3, corpus.length)
    var from = 0
    cuts.foreach { to =>
      CurateStream.processBatch(
        corpus.slice(from, to).toDF("doc_id", "text"), stateDir)
      from = to
    }
    val streamed = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
      .sortBy(_._1).toSeq
    val batch = Curate.curateApply(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
      .sortBy(_._1).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed kept ${streamed.size} docs vs batch ${batch.size}; " +
        s"missing=${(batch.map(_._1).toSet -- streamed.map(_._1).toSet).take(5)} " +
        s"extra=${(streamed.map(_._1).toSet -- batch.map(_._1).toSet).take(5)}")
  }

  test("re-delivered batch is a no-op: exact state makes reprocessing idempotent") {
    val stateDir = Files.createTempDirectory("graft_curate_redeliver").toString
    val corpus = corpusAscending()
    import spark.implicits._
    val half = corpus.length / 2
    CurateStream.processBatch(corpus.take(half).toDF("doc_id", "text"), stateDir)
    val after1 = CurateStream.keptCorpus(spark, stateDir).count()
    // the at-least-once case: the SAME batch arrives again
    CurateStream.processBatch(corpus.take(half).toDF("doc_id", "text"), stateDir)
    assert(CurateStream.keptCorpus(spark, stateDir).count() == after1,
      "re-delivery changed the kept corpus")
    CurateStream.processBatch(corpus.drop(half).toDF("doc_id", "text"), stateDir)
    val streamed = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val batch = Curate.curateApply(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(streamed == batch, "re-delivery broke end-state parity")
  }

  test("out-of-order near-dup arrival keeps the FIRST arrival, not both") {
    val stateDir = Files.createTempDirectory("graft_curate_ooo").toString
    import spark.implicits._
    // find a %13 base doc where BOTH the original and its +200000
    // near-copy pass the per-row gates (so the near-dup stage decides)
    val corpus = corpusAscending().toMap
    val passing = Curate.gateFlags(corpusAscending().toSeq.toDF("doc_id", "text"))
      .where(col("valid") && col("quality_ok") && col("lang_ok"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    def shingles(t: String) = t.split(" ").sliding(3).filter(_.length == 3).map(_.toSeq).toSet
    val x = corpus.keys.filter(id => id % 13 == 0 && id < 100000)
      .filter(id => passing(id) && passing(id + 200000L))
      .find { id =>
        val (a, b) = (shingles(corpus(id)), shingles(corpus(id + 200000L)))
        val inter = (a & b).size
        inter.toDouble / (a.size + b.size - inter) >= Curate.NearDupJaccard
      }.getOrElse(fail("no gate-passing strong near-dup pair in the corpus"))
    // the LATER-ID copy arrives FIRST; keep-first must retain it and
    // drop the original when it arrives — never keep both
    CurateStream.processBatch(
      Seq((x + 200000L, corpus(x + 200000L))).toDF("doc_id", "text"), stateDir)
    CurateStream.processBatch(
      Seq((x, corpus(x))).toDF("doc_id", "text"), stateDir)
    val kept = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(x + 200000L),
      s"expected only the first arrival ${x + 200000L} kept, got $kept")
  }

  test("a benchmark doc arriving late revokes the kept docs it contaminates") {
    val stateDir = Files.createTempDirectory("graft_curate_revoke").toString
    import spark.implicits._
    val corpus = corpusAscending()
    // batch 1: a natural training doc T
    val (tId, tText) = corpus.find { case (id, t) =>
      id % 101 != 0 && id < 100000 && t.split(" ").length >= 20
    }.get
    CurateStream.processBatch(Seq((tId, tText)).toDF("doc_id", "text"), stateDir)
    assert(CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet == Set(tId))
    // batch 2: a benchmark-id doc CONTAINING T's text plus enough
    // extra (T's own words reshuffled) that jaccard stays under the
    // near-dup floor while T's overlap against it is 1.0
    val extra = tText.split(" ").reverse.mkString(" ")
    val bId = 707000L   // 101 * 7000
    CurateStream.processBatch(
      Seq((bId, tText + " " + extra)).toDF("doc_id", "text"), stateDir)
    val kept = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!kept.contains(bId), "benchmark doc must never enter the kept corpus")
    assert(!kept.contains(tId),
      "late-arriving benchmark doc failed to revoke the contaminated kept doc")
  }

  test("a crash between segment writes leaves the previous snapshot intact") {
    val stateDir = Files.createTempDirectory("graft_curate_crash").toString
    val corpus = corpusAscending()
    import spark.implicits._
    val half = corpus.length / 2
    CurateStream.processBatch(corpus.take(half).toDF("doc_id", "text"), stateDir)
    val before = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
      .sortBy(_._1).toSeq
    assert(before.nonEmpty)
    // kill batch 2 at two different points in the write sequence:
    // after the FIRST segment write and after a LATER one — in both
    // cases no manifest committed, so readers stay on batch 1's state
    Seq("kept", "postings").foreach { table =>
      intercept[RuntimeException] {
        CurateStream.processBatch(
          corpus.drop(half).toDF("doc_id", "text"), stateDir, Some(table))
      }
      val after = CurateStream.keptCorpus(spark, stateDir)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
        .sortBy(_._1).toSeq
      assert(after == before,
        s"crash after '$table' segment write leaked partial state")
    }
    // at-least-once re-delivery completes the batch; end parity holds
    CurateStream.processBatch(corpus.drop(half).toDF("doc_id", "text"), stateDir)
    val streamed = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val batch = Curate.curateApply(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(streamed == batch, "re-delivery after injected crash broke parity")
  }

  test("compaction bounds segment count; vacuum reclaims superseded state") {
    val stateDir = Files.createTempDirectory("graft_curate_compact").toString
    val corpus = corpusAscending()
    import spark.implicits._
    // enough micro-batches to cross the compaction threshold
    val nBatches = CurateStream.CompactSegments + 3
    val per = math.max(1, math.ceil(corpus.length.toDouble / nBatches).toInt)
    corpus.grouped(per).foreach { b =>
      CurateStream.processBatch(b.toDF("doc_id", "text"), stateDir)
    }
    val m = graft.sources.ManifestStore.current(spark, stateDir)
      .getOrElse(fail("no committed manifest"))
    m.tables.foreach { case (t, segs) =>
      assert(segs.size <= CurateStream.CompactSegments,
        s"table $t holds ${segs.size} segments > ${CurateStream.CompactSegments}")
    }
    val streamedBefore = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    CurateStream.vacuum(spark, stateDir)
    // only manifest-referenced data dirs survive the vacuum
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = m.tables.values.flatMap(_.values)
      .map(_.split("/").take(2).mkString("/")).toSet
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(s"$stateDir/data"))
      .map(s => s"data/${s.getPath.getName}").toSet
    assert(onDisk == live, s"vacuum left orphans: ${onDisk -- live}")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$stateDir/manifests"))
      .count(_.getPath.getName.endsWith(".txt")) == 1)
    val streamedAfter = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(streamedAfter == streamedBefore, "vacuum changed the kept corpus")
    val batch = Curate.curateApply(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(streamedAfter == batch, "compacted stream lost batch parity")
  }

  // ladder-scale parity — minutes of work, so opt-in like the bench
  // scoping: SPARK_GRAFT_LADDER_PARITY=1 (optionally
  // SPARK_GRAFT_SCALE_DIR=target/scale32) after ScaleGen has built
  // the scaled dir. This is where state-growth and compaction bugs
  // actually surface: ~40k docs, every copy an exact duplicate, the
  // ascending-id split exercising hash-gate, near-dup AND compaction
  // across batches.
  test("ladder-scale streamed curation equals batch curate_apply bit-for-bit") {
    // self-arming: whenever ladder data is on disk the parity claim
    // is RE-PROVEN, not assumed — a plain `sbt test` after a ladder
    // workflow runs this for real. Without data it cancels with the
    // generate command spelled out (a loud marker, not a silent skip);
    // SPARK_GRAFT_LADDER_PARITY=1 keeps the explicit opt-in spelling.
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale8")
    assume(sys.env.contains("SPARK_GRAFT_LADDER_PARITY") ||
        new java.io.File(s"$dir/documents.parquet").exists,
      s"LADDER PARITY NOT PROVEN THIS RUN: no scaled corpus at $dir — " +
        s"generate one with `sbt 'runMain graft.ScaleGen /root/testdata/sf0.1 $dir 8'` " +
        "and re-run, or set SPARK_GRAFT_LADDER_PARITY=1")
    assume(new java.io.File(s"$dir/documents.parquet").exists,
      s"no scaled testdata at $dir — run graft.ScaleGen first")
    val stateDir = Files.createTempDirectory("graft_curate_ladder").toString
    val corpus = Curate.curateCorpus(spark, dir).localCheckpoint()
    // ascending-id micro-batches (keep-first ≡ batch keep-min); the
    // batch count crosses the compaction threshold so the ladder pass
    // also proves compacted state preserves parity
    val ids = corpus.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val nBatches = CurateStream.CompactSegments + 3
    val per = math.max(1, math.ceil(ids.length.toDouble / nBatches).toInt)
    ids.grouped(per).foreach { g =>
      CurateStream.processBatch(
        corpus.where(col("doc_id").between(g.head, g.last)), stateDir)
    }
    val streamed = CurateStream.keptCorpus(spark, stateDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
      .sortBy(_._1).toSeq
    val batch = Curate.curateApply(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
      .sortBy(_._1).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"ladder parity broke: streamed ${streamed.size} vs batch ${batch.size}; " +
        s"missing=${(batch.map(_._1).toSet -- streamed.map(_._1).toSet).take(5)} " +
        s"extra=${(streamed.map(_._1).toSet -- batch.map(_._1).toSet).take(5)}")
  }

  test("curateUpsert wires the same merge through a real stream") {
    val stateDir = Files.createTempDirectory("graft_curate_sink").toString
    val ckpt = Files.createTempDirectory("graft_curate_ckpt").toString
    val corpus = corpusAscending()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocIn]
    val q = CurateStream.curateUpsert(
        input.toDS().select(col("doc_id"), col("text")), stateDir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val t0 = 1700000000000L
      corpus.zipWithIndex.map { case ((id, t), i) => DocIn(id, t0 + i, t) }
        .grouped(400).foreach { b =>
          input.addData(b.toIndexedSeq); q.processAllAvailable()
        }
      val streamed = CurateStream.keptCorpus(spark, stateDir)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      val batch = Curate.curateApply(spark, sfDir)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
