package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Ingest
import graft.sources.{ChunkIndex, Tables}

class IncrementalSpec extends SparkSpec {

  test("neardupIncremental ≡ the full-corpus pair build restricted to base × delta") {
    import graft.operators.Dedup
    val off = Dedup.CopyIdOffset
    val inc = Dedup.neardupIncremental(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("match_id"),
        r.getAs[Double]("jaccard")))
    // shape: one row per matched delta doc, base match, over threshold
    assert(inc.map(_._1).distinct.length === inc.length)
    assert(inc.forall { case (d, m, j) => d >= off && m < off && j >= 0.8 })
    // equivalence: the incremental probe of the staged base index finds
    // exactly what the batch build finds across the base/delta cut —
    // best base match per delta doc among jaccard ≥ 0.8 pairs
    val expected = Dedup.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("jaccard")))
      .filter { case (a, b, j) => a < off && b >= off && j >= 0.8 }
      .groupBy(_._2).map { case (d, ps) =>
        val best = ps.minBy { case (a, _, j) => (-j, a) }
        (d, best._1, best._3)
      }.toSeq
    assert(inc.sortBy(_._1).toSeq === expected.sortBy(_._1).toSeq)
  }

  test("mergeIncremental upserts: new docs added, changed docs replaced") {
    val existing = Tables.documents(spark, sfDir).select("doc_id", "text")
    val incoming = spark.createDataFrame(Seq(
      (0L, "replacement text zero"), (999999L, "brand new document text")))
      .toDF("doc_id", "text")
    val merged = Ingest.mergeIncremental(existing, incoming)
    assert(merged.count() == existing.count() + 1)
    val doc0 = merged.where(col("doc_id") === 0L).collect().head.getAs[String]("text")
    assert(doc0 == "replacement text zero")
    assert(merged.where(col("doc_id") === 999999L).count() == 1)
    // untouched docs unchanged
    val doc1 = merged.where(col("doc_id") === 1L).collect().head.getAs[String]("text")
    val orig1 = existing.where(col("doc_id") === 1L).collect().head.getAs[String]("text")
    assert(doc1 == orig1)
  }

  test("upsert rewrites only affected partitions and the new docs are searchable") {
    val out = Files.createTempDirectory("graft_upsert_idx").toString
    ChunkIndex.write(spark, sfDir, out)
    val before = ChunkIndex.readChunks(spark, out)
    val nBefore = before.count()
    val doc0ChunksBefore = before.where(col("doc_id") === 0L).count()
    val chunkDirsBefore = ChunkIndex.partitionDirs(spark, out, "chunks")

    // doc 0 replaced, doc 999999 brand new (shards 0 and 7)
    // texts built ONLY from the probe query's tokens so both docs'
    // dominant buckets are guaranteed to be probed (cos = 1.0)
    val incoming = spark.createDataFrame(Seq(
      (0L, "zebra quokka upsert"),
      (999999L, "zebra quokka upsert zebra quokka upsert")))
      .toDF("doc_id", "text")
    ChunkIndex.upsert(spark, out, incoming)

    // merged content: old doc-0 chunks gone, new docs present
    val after = ChunkIndex.readChunks(spark, out)
    val doc0 = after.where(col("doc_id") === 0L).collect()
    assert(doc0.length == 1 && doc0.head.getAs[String]("chunk_text")
      .startsWith("zebra quokka"))
    assert(after.where(col("doc_id") === 999999L).count() == 1)
    assert(after.count() == nBefore - doc0ChunksBefore + 2)

    // physical MERGE guarantee, now by construction: an untouched
    // partition is carried forward AS THE SAME DIRECTORY — the new
    // manifest references the old files rather than copies of them
    val chunkDirsAfter = ChunkIndex.partitionDirs(spark, out, "chunks")
    val touched = Set("0", (999999L % ChunkIndex.ChunkShards).toString)
    chunkDirsBefore.keys.filterNot(touched).foreach { p =>
      assert(chunkDirsAfter(p) == chunkDirsBefore(p),
        s"untouched partition $p was rewritten")
    }
    touched.foreach { p =>
      assert(chunkDirsAfter(p) != chunkDirsBefore(p),
        s"touched partition $p kept its old directory")
    }

    // the re-indexed docs are found by searching the updated index
    val hits = ChunkIndex.search(spark, out, "zebra quokka upsert", nProbe = 4, k = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(hits.contains(0L) && hits.contains(999999L),
      s"upserted docs not searchable: $hits")
  }

  test("upsert deletes a vacated partition instead of leaving stale rows") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_vacate_idx").toString
    ChunkIndex.write(spark, sfDir, out)
    // "zebra"-only text puts a doc's whole weight on one dim: its bucket
    val zBucket = Ingest.embedOf(Seq((1L, "zebra")).toDF("doc_id", "text"))
      .collect().head.getAs[Long]("dim").toInt
    // move EVERY doc of some other bucket B to the zebra bucket -> B is vacated
    val byBucket = ChunkIndex.readEmbeddings(spark, out)
      .select(col("doc_id"), col("bucket")).distinct().collect()
      .groupBy(_.getAs[Int]("bucket"))
    val (bucket, docs) = byBucket.filter(_._1 != zBucket).minBy(_._2.length)
    ChunkIndex.upsert(spark, out,
      docs.map(r => (r.getAs[Long]("doc_id"), "zebra zebra zebra")).toSeq
        .toDF("doc_id", "text"))
    val after = ChunkIndex.readEmbeddings(spark, out)
    assert(after.where(col("bucket") === bucket).count() == 0,
      s"stale rows survive in vacated bucket $bucket")
    assert(!ChunkIndex.partitionDirs(spark, out, "embeddings")
      .contains(bucket.toString),
      s"vacated bucket $bucket still referenced by the manifest")
    val movedBuckets = after
      .where(col("doc_id").isin(docs.map(_.getAs[Long]("doc_id")).toSeq: _*))
      .select(col("bucket")).distinct().collect().map(_.getAs[Int]("bucket")).toSet
    assert(movedBuckets == Set(zBucket), s"moved docs in $movedBuckets, not $zBucket")
  }

  test("a crash between the two table writes is invisible until the manifest commit") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_crash_idx").toString
    ChunkIndex.write(spark, sfDir, out)
    val chunksBefore = ChunkIndex.readChunks(spark, out).count()
    val embBefore = ChunkIndex.readEmbeddings(spark, out).count()
    val doc0Before = ChunkIndex.readChunks(spark, out)
      .where(col("doc_id") === 0L).collect().map(_.getAs[String]("chunk_text")).toSet

    // simulate an upsert killed AFTER its chunks write, BEFORE the
    // manifest commit: new data dirs exist on disk, no manifest names
    // them. (This is exactly the on-disk state the old in-progress
    // marker could only warn about.)
    Seq((0L, 0L, "crashed half-written chunk", 25L, 0))
      .toDF("doc_id", "chunk_index", "chunk_text", "chunk_chars", "shard")
      .write.parquet(s"$out/data/w-crashed/chunks/_p=0")

    // readers resolve the manifest, so the orphaned write is invisible:
    // both tables still serve the previous consistent commit
    assert(ChunkIndex.readChunks(spark, out).count() == chunksBefore)
    assert(ChunkIndex.readEmbeddings(spark, out).count() == embBefore)
    assert(ChunkIndex.readChunks(spark, out).where(col("doc_id") === 0L)
      .collect().map(_.getAs[String]("chunk_text")).toSet == doc0Before,
      "reader saw mixed state from a crashed upsert")

    // recovery = re-deliver the batch (upsert is idempotent): one new
    // commit, both tables consistent with the re-delivered content
    val incoming = Seq((0L, "zebra quokka recovery")).toDF("doc_id", "text")
    ChunkIndex.upsert(spark, out, incoming)
    val doc0 = ChunkIndex.readChunks(spark, out).where(col("doc_id") === 0L).collect()
    assert(doc0.length == 1 && doc0.head.getAs[String]("chunk_text")
      .startsWith("zebra quokka"))
    val emb0 = ChunkIndex.readEmbeddings(spark, out).where(col("doc_id") === 0L)
    assert(emb0.count() > 0, "embeddings side missing the re-delivered doc")

    // vacuum reclaims the orphaned write dir and superseded manifests
    ChunkIndex.vacuum(spark, out)
    assert(!new java.io.File(s"$out/data/w-crashed").exists(),
      "vacuum left the crashed write's orphan data")
    assert(ChunkIndex.readChunks(spark, out).count() > 0, "vacuum broke the live index")
  }

  test("upsert bootstraps an index that was never written") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_boot_idx").toString + "/fresh"
    ChunkIndex.upsert(spark, out,
      Seq((1L, "zebra quokka bootstrap")).toDF("doc_id", "text"))
    assert(ChunkIndex.readChunks(spark, out).count() == 1)
    val hits = ChunkIndex.search(spark, out, "zebra quokka bootstrap", nProbe = 4, k = 5)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(hits.sameElements(Array(1L)))
  }

  test("persisted-index search returns ranked docs through partition pruning") {
    val out = Files.createTempDirectory("graft_search_idx").toString
    ChunkIndex.write(spark, sfDir, out)
    val hits = ChunkIndex.search(spark, out, "join hash table", nProbe = 4, k = 5)
    val rows = hits.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
    // pruning is explicit path selection now: the search read at most
    // nProbe of the index's bucket directories
    val readDirs = hits.inputFiles
      .map(f => new java.io.File(f).getParentFile.getName).toSet
    assert(readDirs.nonEmpty && readDirs.size <= 4,
      s"search read ${readDirs.size} bucket dirs for nProbe=4: $readDirs")
    assert(ChunkIndex.partitionDirs(spark, out, "embeddings").size > readDirs.size,
      "index too small for the pruning assertion to mean anything")
  }
}
