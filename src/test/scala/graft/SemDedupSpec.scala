package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.VectorSearch

/** SemDeDup domination semantics (VectorSearch.semReportOf), the
  * exact-quotient argument under a clone flood, and the
  * histogram-cutoff prototype prune vs the naive sort spelling.
  */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  /** Hand-built clustered frame: (vec_id, label, emb, ccos). */
  private def clustered(rows: Seq[(Long, Long, Seq[Double], Double)]): DataFrame =
    rows.toDF("vec_id", "label", "emb", "ccos")

  private def reportMap(cl: DataFrame): Map[Long, Boolean] =
    VectorSearch.semReportOf(cl, VectorSearch.embMembersOf(cl))
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap

  test("exact clones: only the min-id rep of a group can survive") {
    val v = Seq(0.6, 0.8)
    val cl = clustered(Seq(
      (10L, 0L, v, 0.5), (11L, 0L, v, 0.5), (12L, 0L, v, 0.5), // clone group
      (20L, 0L, Seq(-0.8, 0.6), 0.2)))                         // orthogonal loner
    val keep = reportMap(cl)
    assert(keep == Map(10L -> true, 11L -> false, 12L -> false, 20L -> true))
  }

  test("domination keeps the LOW-centroid-cosine witness; ties break to smaller id") {
    // scaled vectors: distinct content (two quotient groups) but
    // cosine exactly 1 — a qualifying rep pair whose less
    // prototypical (lower ccos) side must survive
    val cl = clustered(Seq(
      (10L, 0L, Seq(1.0, 0.0), 0.9),  // prototypical — dominated by 11
      (11L, 0L, Seq(2.0, 0.0), 0.4),  // same direction, lower ccos — kept
      (30L, 1L, Seq(0.0, 1.0), 0.7),  // tie on ccos with 31: smaller id kept
      (31L, 1L, Seq(0.0, 2.0), 0.7)))
    val keep = reportMap(cl)
    assert(keep == Map(10L -> false, 11L -> true, 30L -> true, 31L -> false))
  }

  test("domination is not transitive-closure: a dropped doc still drops its partners") {
    // chain A~B, B~C with A best priority and cos(A,C) < tau:
    // B dominated by A; C dominated by B even though B itself drops
    def unit(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val a = unit(0); val b = unit(40); val c = unit(80)
    // cos(0,40) ~ 0.766 >= tau; cos(40,80) ~ 0.766; cos(0,80) ~ 0.17 < tau
    val cl = clustered(Seq(
      (10L, 0L, a, 0.1), (11L, 0L, b, 0.2), (12L, 0L, c, 0.3)))
    val keep = reportMap(cl)
    assert(keep == Map(10L -> true, 11L -> false, 12L -> false))
  }

  test("no qualifying partner -> kept, regardless of prototypicality") {
    val cl = clustered(Seq(
      (10L, 0L, Seq(1.0, 0.0), 0.99),
      (11L, 0L, Seq(0.0, 1.0), 0.99))) // orthogonal — both kept
    val keep = reportMap(cl)
    assert(keep == Map(10L -> true, 11L -> true))
  }

  test("clone flood: rep pairs are built on DISTINCT embeddings only") {
    val flood = (0 until 2000).map(i => (100L + i, 0L, Seq(0.6, 0.8), 0.5))
    val others = Seq((10L, 0L, Seq(-0.8, 0.6), 0.2), (11L, 0L, Seq(0.8, -0.6), 0.3))
    val cl = clustered(flood ++ others)
    val members = VectorSearch.embMembersOf(cl)
    val reps = cl.join(
      members.where(col("vec_id") === col("rep_id")).select(col("vec_id")),
      Seq("vec_id"), "left_semi")
    assert(reps.count() == 3, "2000 clones must contract to one rep")
    val qual = VectorSearch.semQualifyingPairsOf(cl, members)
    assert(qual.count() <= 3, "rep-pair stream is quotient-bounded")
    val keep = reportMap(cl)
    assert(keep(100L) && !keep(101L) && !keep(2099L), "one survivor per clone group")
    assert(keep.values.count(identity) == 3)
  }

  test("proto histogram cutoff == naive per-cluster sort, ties included") {
    // cluster 0: 11 rows with a 4-way tie band straddling the cutoff
    // (dropN = 2), cluster 1: 3 rows (dropN = 0 -> all kept),
    // cluster 2: 8 rows, clean bands
    val rows =
      (1L to 4L).map(i => (i, 0L, 0.9)) ++      // tie band at the top
      (5L to 11L).map(i => (i, 0L, 0.1 + 0.01 * i)) ++
      (20L to 22L).map(i => (i, 1L, 0.5)) ++
      (30L to 37L).map(i => (i, 2L, 0.01 * i))
    val kept = rows.toDF("vec_id", "label", "ccos")
    val got = VectorSearch.protoSelectOf(kept)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("label"))
      .orderBy(col("ccos").desc, col("vec_id").desc)
    val cnt = Window.partitionBy(col("label"))
    val naive = kept
      .withColumn("rk", row_number().over(w))
      .withColumn("tot", count(lit(1)).over(cnt))
      .where(col("rk") > floor(col("tot").cast("double") / 4.0))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    // the straddling tie band drops by vec_id DESC: cluster 0 dropN=2
    // falls inside the 4-way 0.9 band -> ids 4,3 dropped, 1,2 kept
    assert(got.contains((1L, 0L)) && got.contains((2L, 0L)))
    assert(!got.contains((4L, 0L)) && !got.contains((3L, 0L)))
    // dropN=0 cluster keeps everything
    assert(Seq(20L, 21L, 22L).forall(i => got.contains((i, 1L))))
  }

  test("degenerate inputs: empty corpus, singleton, all-identical flood") {
    // empty clustered frame -> empty report, empty prune
    val empty = clustered(Seq.empty)
    assert(VectorSearch.semReportOf(empty, VectorSearch.embMembersOf(empty))
      .collect().isEmpty)
    assert(VectorSearch.protoSelectOf(
      Seq.empty[(Long, Long, Double)].toDF("vec_id", "label", "ccos"))
      .collect().isEmpty)
    // singleton corpus: kept, and a 1-row cluster has dropN = 0
    val one = clustered(Seq((10L, 0L, Seq(0.6, 0.8), 0.5)))
    assert(reportMap(one) == Map(10L -> true))
    assert(VectorSearch.protoSelectOf(
      Seq((10L, 0L, 0.5)).toDF("vec_id", "label", "ccos"))
      .collect().map(_.getLong(0)).toSeq == Seq(10L))
    // the whole corpus one exact-content group: exactly one keeper
    val flood = clustered((0 until 500).map(i => (10L + i, 0L, Seq(0.6, 0.8), 0.5)))
    val keep = reportMap(flood)
    assert(keep.values.count(identity) == 1 && keep(10L))
  }

  test("gated corpus: rules discriminate and the three queries are consistent") {
    val rep = VectorSearch.semDedup(spark, sfDir).collect()
    val n = rep.length
    val keptIds = rep.filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    assert(n > 0 && keptIds.nonEmpty && keptIds.size < n,
      s"semdedup must discriminate: kept ${keptIds.size} of $n")
    val applied = VectorSearch.semDedupApply(spark, sfDir).collect()
    assert(applied.map(_.getLong(0)).toSet == keptIds)
    val proto = VectorSearch.protoSelect(spark, sfDir).collect()
    assert(proto.map(_.getLong(0)).toSet.subsetOf(keptIds))
    // per-cluster census: kept_n - floor(kept_n/4) survive the prune
    val keptPerCl = applied.groupBy(_.getLong(1)).map { case (l, rs) => l -> rs.length }
    val protoPerCl = proto.groupBy(_.getLong(1)).map { case (l, rs) => l -> rs.length }
    keptPerCl.foreach { case (l, kn) =>
      assert(protoPerCl.getOrElse(l, 0) == kn - kn / 4, s"cluster $l")
    }
  }
}
