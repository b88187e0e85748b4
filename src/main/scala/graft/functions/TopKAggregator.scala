package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate for [[TopKAggregator]]. */
case class ScoredId(id: Long, score: Double)

/** Typed `Aggregator` keeping the top-k rows per group by (score desc,
  * id asc) — the UDAF surface from SURVEY §2.2 (absent in the reference,
  * delegated to Greenplum's `ORDER BY ... LIMIT`).
  *
  * Why an aggregator and not a ranking window: `row_number() ≤ k` sorts the
  * ENTIRE group — at 100 TB a hot group's full row set converges on one
  * reducer and gets sorted just to keep 3 rows. This buffer holds AT MOST k
  * entries at every stage: partial top-k per map task, O(k) merges in the
  * combine tree, and the shuffle carries k rows per group per task instead
  * of the group's row count. The result is identical to the window
  * formulation because the order (score desc, id asc) is total.
  */
class TopKAggregator(k: Int)
  extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  // Buffers are kept sorted best-first; better = higher score, then lower id.
  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[ScoredId] = Nil

  // NaN scores are dropped: better() is false in BOTH directions for NaN,
  // which would break the sorted invariant differently in reduce vs merge
  // and make the result depend on partitioning.
  override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
    if (in.score.isNaN || (buf.sizeIs >= k && better(buf.last, in))) buf
    else {
      val (keep, rest) = buf.span(better(_, in))
      (keep ::: in :: rest).take(k)
    }

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] = {
    val m = List.newBuilder[ScoredId]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        m += x.head; x = x.tail
      } else { m += y.head; y = y.tail }
      n += 1
    }
    m.result()
  }

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] =
    ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}
