package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two scan
  * dimensions so that sorting by the combined key clusters BOTH — the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`. A table laid out
  * this way gives every file a tight min/max envelope on each dimension,
  * so a 2-D selective scan (user × time, tenant × date) prunes on footer
  * stats in both dimensions instead of only the leading sort key.
  *
  * Everything here is plain integer bit arithmetic composed from codegen'd
  * builtins (`shiftright`/`shiftleft`/bitwise and/or) — no UDF, so the
  * z-value computation rides the scan inside whole-stage codegen, and an
  * identical expression replays in any engine.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Inputs
    * outside [0, 2^bits) fail the job loudly — a silently masked high bit
    * would scatter the layout. Choose bits = ceil(log2(domain size));
    * 2·bits ≤ 62.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val limit = 1L << bits
    def guarded(c: Column, name: String): Column =
      when(c.isNull || c < 0 || c >= limit,
        raise_error(concat(lit(s"zValue: $name out of [0, $limit): "),
          coalesce(c.cast("string"), lit("null")))))
        .otherwise(c.cast("long"))
    val gx = guarded(x, "x")
    val gy = guarded(y, "y")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(gx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(gy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Layout-quality report for a z-ordered write: assign each row to the
    * z-cell `z >> cellShift` (a fixed-width z-range — the file it would
    * land in under a z-sorted, size-capped writer) and report each cell's
    * row count and per-dimension min/max envelope. Tight envelopes on BOTH
    * dimensions are the whole point — compare against a single-dimension
    * sort's report to quantify the pruning win. Output: (zcell, n_rows,
    * min_x, max_x, min_y, max_y).
    */
  def zorderReport(df: DataFrame, xCol: String, yCol: String,
      bits: Int, cellShift: Int): DataFrame = {
    require(cellShift >= 0 && cellShift < 2 * bits,
      s"cellShift must be in [0, ${2 * bits}), got $cellShift")
    df.select(col(xCol).as("x"), col(yCol).as("y"))
      .withColumn("zcell", shiftright(zValue(col("x"), col("y"), bits), cellShift))
      .groupBy("zcell")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }
}
