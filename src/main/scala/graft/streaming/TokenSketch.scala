package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{HeavyHitter, HeavyHittersAgg, MgBuf}

/** One shard's current sketch snapshot: the surviving counters, the
  * uniform underestimate bound, and `n` = items folded so far (the
  * monotone batch clock — in an update-mode sink the row with the
  * max `n` per shard IS the latest snapshot).
  */
case class ShardSketch(shard: Int, items: Seq[String], counts: Seq[Long],
    deficit: Long, n: Long)

/** Streaming twin of the batch heavy-hitters report
  * (TextAnalysis.approxTopTokens): the corpus-frequent-token sketch
  * maintained INCREMENTALLY on an unbounded token stream.
  *
  * Tokens are sharded by content hash into [[NumShards]] groups; each
  * group's `mapGroupsWithState` state is one Misra–Gries buffer
  * (functions/FreqSketch semantics, same reduce step), so TOTAL state
  * is ≤ NumShards · m counters — constant, regardless of how many
  * tokens or distinct tokens the stream has carried. That is the
  * whole point of the sketch in streaming form: an exact
  * `groupBy(token).count` in update mode keeps one state row per
  * DISTINCT token forever (unbounded), while this keeps a fixed-size
  * summary per shard and emits a snapshot each micro-batch.
  *
  * Because tokens are partitioned by hash, each token lives in
  * exactly one shard, and shard sketches merge by the mergeable-
  * summaries rule ([[HeavyHittersAgg.merge]]) into a single global
  * summary with the standard bound: true ∈ [count, count + err].
  * [[mergeShards]] performs that roll-up on the latest snapshots.
  *
  * No watermark / no timeout: corpus-frequency is an all-time
  * aggregate and the state is bounded BY CONSTRUCTION, not by
  * eviction — unlike the sessionize/funnel mirrors whose per-key
  * state only stays bounded because the watermark retires keys.
  */
object TokenSketch {

  /** Shard fan-out: bounds per-shard skew and lets the stateful
    * exchange parallelize; total state = NumShards · m counters.
    */
  val NumShards = 32

  private def shardOf(tok: String): Int = math.floorMod(tok.hashCode, NumShards)

  /** Per-shard state: the MG buffer plus the total items ever folded
    * into this shard — `n` is the monotone clock the snapshot carries
    * (the buffer's counters.sum + deficit is NOT monotone: the
    * classic MG step decrements m counters while adding 1 deficit).
    */
  private[streaming] case class ShardState(buf: MgBuf, n: Long)

  /** The per-shard MG fold as a streaming query source: emits each
    * shard's updated snapshot every micro-batch (update mode).
    */
  def shardSketches(spark: SparkSession, tokens: Dataset[String],
      m: Int): Dataset[ShardSketch] = {
    import spark.implicits._
    val agg = new HeavyHittersAgg(m)
    tokens
      .groupByKey(shardOf)
      .mapGroupsWithState[ShardState, ShardSketch](GroupStateTimeout.NoTimeout) {
        (shard: Int, toks: Iterator[String], state: GroupState[ShardState]) =>
          val st = state.getOption.getOrElse(ShardState(MgBuf(Map.empty, 0L), 0L))
          var buf = st.buf
          var folded = 0L
          toks.foreach { t => buf = agg.reduce(buf, t); folded += 1 }
          val next = ShardState(buf, st.n + folded)
          state.update(next)
          // deterministic counter order for a stable snapshot row
          val sorted = buf.counters.toSeq.sortBy { case (k, n) => (-n, k) }
          ShardSketch(shard, sorted.map(_._1), sorted.map(_._2), buf.deficit, next.n)
      }
  }

  /** Roll the latest shard snapshots up into the global heavy-hitter
    * report, the same mergeable-summaries rule as the batch UDAF —
    * driver-side over ≤ NumShards · m counters (a metadata-plane
    * merge, like Bench's cap-audit collects).
    */
  def mergeShards(snapshots: Seq[ShardSketch], m: Int): Seq[HeavyHitter] = {
    val agg = new HeavyHittersAgg(m)
    val merged = snapshots
      .map(s => MgBuf(s.items.zip(s.counts).toMap, s.deficit))
      .foldLeft(agg.zero)(agg.merge)
    agg.finish(merged)
  }

  /** writeStream wiring for BOUNDED-replay tests: update mode into a
    * named in-memory sink. The memory sink appends every emitted
    * snapshot row and never truncates, so on a long-running stream
    * the DRIVER-side sink (not the sketch state) would grow without
    * bound — deployments should use [[runLatest]], which keeps only
    * the newest snapshot per shard.
    */
  def run(spark: SparkSession, tokens: Dataset[String], m: Int,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    shardSketches(spark, tokens, m).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .start()

  /** Long-running wiring: each micro-batch upserts its touched
    * shards' snapshots into a driver-side latest-per-shard map and
    * hands the consumer the current global roll-up — total driver
    * footprint stays ≤ NumShards · m counters, matching the sketch's
    * own bound (the thing [[run]]'s accumulating memory sink loses).
    */
  def runLatest(spark: SparkSession, tokens: Dataset[String], m: Int)(
      onUpdate: Seq[HeavyHitter] => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val latest = new java.util.concurrent.ConcurrentHashMap[Int, ShardSketch]()
    shardSketches(spark, tokens, m).writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[ShardSketch], _: Long) =>
        batch.collect().foreach { s =>
          latest.merge(s.shard, s,
            (a: ShardSketch, b: ShardSketch) => if (b.n >= a.n) b else a)
        }
        onUpdate(mergeShards(
          scala.jdk.CollectionConverters.CollectionHasAsScala(latest.values).asScala.toSeq, m))
      }
      .start()
  }
}
