package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` folding 60-bit value hashes into a fixed Bloom
  * bitmap of `m` bits (k positions per value, double hashing) — constant
  * `m/64`-long buffer per partition regardless of input volume, merged by
  * word-wise OR. That fixed-size state is the whole point at corpus scale:
  * building the same filter as a distinct-position set shuffles O(k·n)
  * rows, while this shuffles exactly one 512-byte buffer (m=4096) per
  * map task.
  *
  * Position derivation is pure integer arithmetic an external engine can
  * restate verbatim (the [[graft.operators.Sketches]] determinism
  * contract): h1 = h mod m, h2 = 1 + ((h div m) mod (m−1)),
  * pos_i = (h1 + i·h2) mod m for i in 0..k−1 (Kirsch–Mitzenmacher double
  * hashing; h2 ≥ 1 so probes always advance). Inputs are the library's
  * non-negative 60-bit md5 hashes, so div/mod carry no sign traps.
  */
class BloomBitsAggregator(m: Int, k: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {
  require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
  require(k >= 1, s"k must be positive, got $k")

  override def zero: Array[Long] = new Array[Long](m / 64)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val h1 = java.lang.Math.floorMod(h, m.toLong)
    val h2 = 1L + java.lang.Math.floorMod(h / m, (m - 1).toLong)
    var i = 0
    while (i < k) {
      val p = java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt
      buf(p >> 6) |= 1L << (p & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
