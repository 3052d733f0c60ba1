package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** A banded document on the wire between the signature projection and
  * the bucket state machine: `bd` the band index, `band_key` the
  * band's joined minima, `sig` the full 16-permutation signature,
  * `sketch`/`nsh` the bottom-k shingle sketch and true distinct-
  * shingle count backing the streamed verification stage.
  */
private[streaming] case class BandedDoc(
    bd: Int, band_key: String, doc_id: Long, ts_ms: Long, sig: Seq[Long],
    sketch: Seq[Long], nsh: Long,
    ts: java.sql.Timestamp)   // the watermarked event-time attribute —
                              // must survive into the stateful operator

/** A streamed near-duplicate pair: `est_jaccard` is the MinHash
  * estimate (matching signature components / 16 — an exact multiple
  * of 1/16, so doubles carry it exactly); `jaccard` is the VERIFIED
  * bottom-k sketch estimate — EXACT Jaccard whenever both docs have ≤
  * [[NearDupStream.SketchSize]] distinct shingles, the k-smallest-
  * hashes estimator otherwise — good enough to act on without a batch
  * reconciliation pass. The batch posting-list Jaccard
  * (operators/Dedup.minhashPairs) remains the full-precision
  * reconciler for capped docs.
  */
case class NearDupCand(a_id: Long, b_id: Long, est_jaccard: Double,
    jaccard: Double, ts_ms: Long)

private[streaming] case class BucketDoc(doc_id: Long, ts_ms: Long, sig: Seq[Long],
    sketch: Seq[Long], nsh: Long)
private[streaming] case class BucketState(docs: Seq[BucketDoc])

/** Streaming twin of the batch MinHash+LSH near-dup DETECTION
  * (operators/Dedup.minhashPairsOf): candidate pairs surfaced
  * incrementally as documents arrive, instead of a full-corpus
  * self-join per refresh.
  *
  * Same blocking as batch — identical signatures (the per-row column
  * spellings reduce to the same md5-prefix + arithmetic-permutation
  * minima the batch aggregates compute, so a (doc, band) pair lands
  * in the SAME bucket under either engine) and pairs only ever form
  * inside a band bucket: candidate volume stays O(near-dups), never
  * all-pairs. State per bucket is the retained docs' signatures plus
  * a bottom-k shingle sketch for in-stream verification — ≤ 16 +
  * [[SketchSize]] longs each, NOT the texts — capped at [[MaxBucketDocs]] (newest
  * kept: a hot bucket is duplicate-heavy content whose exact copies
  * the upstream [[DedupStream]] already removed) and evicted
  * [[RetentionMs]] after each doc's event time, so an unbounded
  * stream runs in bounded state.
  *
  * Delivery caveats, both spec-pinned: a pair colliding in several
  * bands emits once per colliding band (cross-band dedup would need
  * a second global-keyed stateful stage; consumers take `distinct`,
  * exactly like the batch build does), and a copy arriving more than
  * the retention horizon after its original is not paired with it —
  * the funnel/dedup-stream retention tradeoff.
  *
  * UPGRADE NOTE: adding the verification sketch changed the
  * flatMapGroupsWithState state schema (BucketDoc gained
  * sketch/nsh). A query restarted against a checkpoint written by
  * the pre-sketch version fails Spark's state-schema compatibility
  * check — start it with a fresh checkpoint location (retained
  * bucket state rebuilds within one retention horizon of traffic);
  * there is no in-place migration for stateful-operator schemas.
  */
object NearDupStream {

  /** How long a doc's signature stays pairable after its event time. */
  val RetentionMs: Long = 24L * 3600 * 1000
  val WatermarkSpec: String = "24 hours"

  /** Per-bucket retained-doc cap — bounds both state size and the
    * per-arrival compare fan-out (≤ cap estimates of 16 longs each).
    */
  val MaxBucketDocs: Int = 256

  /** Bottom-k shingle-sketch size: each retained doc keeps its
    * [[SketchSize]] SMALLEST distinct shingle hashes (a KMV sketch)
    * plus its true distinct count. For docs under the cap the sketch
    * IS the shingle set, so the verified Jaccard is exact; above it,
    * the standard bottom-k estimator (intersection within the k
    * smallest of the union) with ~1/√k relative error. State cost: ≤
    * cap·(16 + k) longs per bucket — still texts-free and bounded.
    */
  val SketchSize: Int = 64

  /** Bottom-k verified Jaccard between two sketches. Exact when both
    * true counts fit the sketch; otherwise restricted to the k
    * smallest union hashes — the only window where both sketches are
    * complete, which is what makes the estimator unbiased.
    * Deterministic for given inputs (pure set arithmetic).
    */
  private[graft] def sketchJaccard(a: Seq[Long], na: Long,
      b: Seq[Long], nb: Long): Double =
    if (na <= SketchSize && nb <= SketchSize) {
      val sa = a.toSet
      val inter = b.count(sa)
      val uni = na + nb - inter
      if (uni == 0) 0.0 else inter.toDouble / uni
    } else {
      val sa = a.toSet
      val sb = b.toSet
      val union = (a ++ b).distinct.sorted.take(SketchSize)
      if (union.isEmpty) 0.0
      else union.count(x => sa(x) && sb(x)).toDouble / union.length
    }

  import graft.operators.Dedup.{Bands, MinhashPerms}

  /** Per-row signature minima, the narrow (shuffle-free) restatement
    * of the batch posting-aggregate: hash each distinct shingle once
    * (`hs` is its own projection — CollapseProject keeps non-cheap
    * expressions referenced more than once out of line, so the md5
    * pass runs once per row, not once per permutation), then take the
    * 16 permutation minima over the array.
    */
  private def sigCols: Seq[Column] =
    (0 until MinhashPerms).map { p =>
      array_min(transform(col("hs"),
        h => TextFunctions.minhashPerm(h, lit(p.toLong)))).as(s"m$p")
    }

  /** (bd, band_key, doc_id, ts_ms, sig) — one row per (doc, band),
    * the same band keys the batch build shuffles on. Works on static
    * frames too (the parity spec runs it both ways).
    */
  private[graft] def banded(docs: DataFrame): DataFrame = {
    val rows = MinhashPerms / Bands
    // `hs` is DISTINCT hashes: the permutation minima are unchanged
    // (min over distinct = min over all) and the bottom-k slice needs
    // set semantics
    val sigged = docs
      .select(col("doc_id"), col("ts_ms"),
        TextFunctions.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), col("ts_ms"),
        array_distinct(transform(col("sh"), g => TextFunctions.md5Long(g, 1, 8))).as("hs"))
      .select(col("doc_id") +: col("ts_ms") +:
        slice(array_sort(col("hs")), 1, SketchSize).as("sketch") +:
        size(col("hs")).cast("long").as("nsh") +: sigCols: _*)
    sigged.select(col("doc_id"), col("ts_ms"), col("sketch"), col("nsh"),
      array((0 until MinhashPerms).map(p => col(s"m$p")): _*).as("sig"),
      posexplode(array((0 until Bands).map { b =>
        concat_ws("|", (0 until rows).map(r => col(s"m${b * rows + r}").cast("string")): _*)
      }: _*)).as(Seq("bd", "band_key")))
  }

  /** Candidate pairs with MinHash-estimated Jaccard ≥ `estFloor`,
    * emitted as soon as the second document of the pair arrives.
    * Within a micro-batch, arrivals fold in (ts_ms, doc_id) order so
    * the emitted (a, b) set is deterministic for a given batching.
    */
  def nearDupPairs(spark: SparkSession, docs: Dataset[DocIn],
      estFloor: Double = 0.0): Dataset[NearDupCand] = {
    import spark.implicits._
    banded(docs.toDF())
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", WatermarkSpec)
      .select(col("bd"), col("band_key"), col("doc_id"), col("ts_ms"),
        col("sig"), col("sketch"), col("nsh"), col("ts"))
      .as[BandedDoc]
      .groupByKey(d => (d.bd, d.band_key))
      .flatMapGroupsWithState[BucketState, NearDupCand](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), in: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          // watermark-driven eviction first: expired partners must not
          // pair with this batch's arrivals
          var retained = state.getOption.map(_.docs).getOrElse(Vector.empty)
            .filter(d => wm < d.ts_ms + RetentionMs).toVector
          val out = Seq.newBuilder[NearDupCand]
          in.toVector.sortBy(d => (d.ts_ms, d.doc_id)).foreach { d =>
            retained.foreach { r =>
              if (r.doc_id != d.doc_id) {
                val matches = (0 until MinhashPerms)
                  .count(i => r.sig(i) == d.sig(i))
                val est = matches.toDouble / MinhashPerms
                if (est >= estFloor)
                  out += NearDupCand(math.min(r.doc_id, d.doc_id),
                    math.max(r.doc_id, d.doc_id), est,
                    sketchJaccard(r.sketch, r.nsh, d.sketch, d.nsh), d.ts_ms)
              }
            }
            retained = (retained :+ BucketDoc(d.doc_id, d.ts_ms, d.sig,
                d.sketch, d.nsh))
              .takeRight(MaxBucketDocs)   // newest win the cap
          }
          if (retained.isEmpty) state.remove()
          else {
            state.update(BucketState(retained))
            // wake when the oldest retained doc expires, so an idle
            // bucket still drains to empty and frees its state row
            state.setTimeoutTimestamp(retained.map(_.ts_ms).min + RetentionMs)
          }
          out.result().iterator
      }
  }
}
