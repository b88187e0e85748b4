package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` collecting a group's DISTINCT values into a sorted
  * array, with a hard per-buffer cap: once a group exceeds `cap` distinct
  * values it is reported as an EMPTY array (the caller's oversized-group
  * drop), and no buffer at any stage — map-side partial, combine-tree
  * merge, reducer — ever holds more than `cap + 1` elements.
  *
  * Why not `collect_set` + a size filter: collect_set's buffer is
  * unbounded, so ONE degenerate group (a viral order, a crawler session)
  * materializes its full distinct set in a single task before the filter
  * ever runs — the exact skew failure the cap exists to prevent. This
  * buffer refuses to grow past cap+1 (cap elements prove "within cap",
  * one more proves "over cap" — nothing beyond that carries information),
  * making the group-materialization shuffle safe at any skew. The same
  * bounded-buffer-beats-unbounded-state argument as [[TopKAggregator]].
  *
  * Output order is ascending (buffers are kept sorted), so downstream
  * pair generation is deterministic without a second sort.
  */
class BoundedDistinctAggregator(cap: Int)
  extends Aggregator[Long, List[Long], Seq[Long]] {
  require(cap >= 1, s"cap must be positive, got $cap")

  // buffers: sorted ascending, distinct, size ≤ cap + 1
  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], in: Long): List[Long] =
    if (buf.sizeIs > cap) buf // already over — evidence kept, value dropped
    else {
      val (lt, rest) = buf.span(_ < in)
      if (rest.nonEmpty && rest.head == in) buf
      else lt ::: in :: rest
    }

  override def merge(a: List[Long], b: List[Long]): List[Long] = {
    val m = List.newBuilder[Long]
    var (x, y, n) = (a, b, 0)
    while (n <= cap && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && x.head < y.head)) {
        m += x.head
        if (y.nonEmpty && y.head == x.head) y = y.tail
        x = x.tail
      } else {
        m += y.head
        if (x.nonEmpty && x.head == y.head) x = x.tail
        y = y.tail
      }
      n += 1
    }
    m.result()
  }

  override def finish(buf: List[Long]): Seq[Long] =
    if (buf.sizeIs > cap) Nil else buf

  override def bufferEncoder: Encoder[List[Long]] =
    ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
