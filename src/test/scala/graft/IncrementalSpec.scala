package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Ingest
import graft.sources.{ChunkIndex, Tables}

class IncrementalSpec extends SparkSpec {

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

  test("persisted-index search returns ranked docs through partition pruning") {
    val out = Files.createTempDirectory("graft_search_idx").toString
    ChunkIndex.write(spark, sfDir, out)
    val hits = ChunkIndex.search(spark, out, "join hash table", nProbe = 4, k = 5)
    val rows = hits.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"search should prune index partitions:\n$plan")
  }
}
