package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A scored candidate entering the top-k heap. */
case class ScoredId(score: Double, id: Long)

private[functions] case class TopBuf(items: Seq[ScoredId])

/** Bounded top-k aggregate: keeps the k best (score desc, id asc)
  * rows per group with map-side partial aggregation.
  *
  * This is the 100 TB shape for FAISS-style search
  * (core/utils.py:221): a window `row_number` over (query, cosine)
  * shuffles EVERY candidate row to the query's partition before
  * ranking; this aggregator reduces each map partition to ≤ k rows
  * first, so the shuffle carries k·queries rows regardless of corpus
  * size. Deterministic: total order (score desc, id asc), ties
  * impossible (ids unique).
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, TopBuf, Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(items: Seq[ScoredId]): Seq[ScoredId] =
    items.sortWith(better).take(k)

  override def zero: TopBuf = TopBuf(Vector.empty)

  override def reduce(b: TopBuf, a: ScoredId): TopBuf =
    // admit only candidates that beat the current k-th element
    if (b.items.length < k || better(a, b.items.last)) TopBuf(trim(b.items :+ a))
    else b

  override def merge(b1: TopBuf, b2: TopBuf): TopBuf =
    TopBuf(trim(b1.items ++ b2.items))

  override def finish(b: TopBuf): Seq[ScoredId] = trim(b.items)

  override def bufferEncoder: Encoder[TopBuf] = ExpressionEncoder[TopBuf]()

  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** `top_k(score, id)` aggregate Column, k best per group. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k)).apply(score, id)
}
