package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A heavy-hitter estimate: `count` UNDERestimates the true
  * frequency; the true value lies in [count, count + err].
  */
case class HeavyHitter(item: String, count: Long, err: Long)

/** `deficit` = total mass subtracted from every surviving counter so
  * far — the uniform underestimate bound for this buffer. Visible to
  * graft.streaming: the streaming token sketch holds one MgBuf per
  * shard as its mapGroupsWithState state.
  */
private[graft] case class MgBuf(counters: Map[String, Long], deficit: Long)

/** Mergeable heavy-hitters sketch (Misra–Gries 1982; merge rule per
  * Agarwal et al., "Mergeable Summaries", PODS 2012): at most `m`
  * counters per buffer with map-side partial aggregation.
  * Guarantees, for a stream of N items: every item with true
  * frequency > N/(m+1) is present in the output, and each reported
  * count satisfies true ∈ [count, count + err] where err ≤ N/(m+1).
  *
  * The 100 TB shape for "what are the frequent tokens / domains /
  * boilerplate lines in this corpus": an exact `groupBy(token)
  * .count` shuffles every distinct token (billions at corpus scale);
  * this sketch shuffles ≤ m counters + one deficit per map partition
  * — constant — and a single merged summary leaves the aggregation.
  * Like the other sketches (HLL live users, KLL percentiles), no
  * DuckDB oracle: merge order shifts the bounded error, so the spec
  * asserts the guarantee rather than a byte-exact value.
  */
class HeavyHittersAgg(m: Int) extends Aggregator[String, MgBuf, Seq[HeavyHitter]] {
  require(m > 0, s"sketch size must be positive, got $m")

  override def zero: MgBuf = MgBuf(Map.empty, 0L)

  override def reduce(b: MgBuf, item: String): MgBuf =
    b.counters.get(item) match {
      case Some(n) => MgBuf(b.counters.updated(item, n + 1), b.deficit)
      case None if b.counters.size < m =>
        MgBuf(b.counters.updated(item, 1L), b.deficit)
      case None =>
        // classic MG step: decrement every counter (the newcomer's 1
        // cancels against them), dropping the zeros
        MgBuf(b.counters.flatMap { case (k, n) =>
          if (n > 1) Some(k -> (n - 1)) else None
        }, b.deficit + 1)
    }

  override def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
    val summed = (b1.counters.keySet ++ b2.counters.keySet).map { k =>
      k -> (b1.counters.getOrElse(k, 0L) + b2.counters.getOrElse(k, 0L))
    }.toSeq
    if (summed.size <= m) MgBuf(summed.toMap, b1.deficit + b2.deficit)
    else {
      // subtract the (m+1)-th largest count from everyone, drop <= 0:
      // at most m counters survive and the deficit grows by the
      // subtracted amount (Mergeable Summaries, Fig. 1)
      val sorted = summed.sortBy { case (k, n) => (-n, k) }
      val sub = sorted(m)._2
      MgBuf(sorted.iterator.map { case (k, n) => k -> (n - sub) }
        .filter(_._2 > 0).toMap, b1.deficit + b2.deficit + sub)
    }
  }

  override def finish(b: MgBuf): Seq[HeavyHitter] =
    b.counters.toSeq
      .map { case (k, n) => HeavyHitter(k, n, b.deficit) }
      .sortBy(h => (-h.count, h.item))

  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()

  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    ExpressionEncoder[Seq[HeavyHitter]]()
}

object FreqSketch {
  /** Column form: `df.agg(FreqSketch.heavyHitters(m)(col("token")))`. */
  def heavyHitters(m: Int)(item: Column): Column =
    udaf(new HeavyHittersAgg(m)).apply(item)
}
