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

  /** Hilbert index of (x, y) on the 2^bits × 2^bits grid — the
    * space-filling curve whose CONSECUTIVE indexes are always grid
    * neighbors (Morton order jumps at power-of-two seams), so a range of
    * the sort key maps to one compact square-ish region: tighter file
    * envelopes than z-order on the same data, which is why Iceberg offers
    * it beside Morton for `OPTIMIZE`.
    *
    * The classic per-level quadrant fold (d += s²·((3·rx) XOR ry), then
    * reflect/transpose the remaining low bits), expressed as one
    * `withColumn` STAGE per level rather than a single Column fold: each
    * level's (x, y) state feeds the next level 2–3 times, so a nested
    * Column expression would grow ~3^bits nodes while named stages keep
    * the projection chain LINEAR in `bits` (Catalyst collapses the stack
    * into one codegen'd projection — still zero UDFs, still rides the
    * scan). Low bits are re-masked each level (`x & (s-1)`), keeping every
    * intermediate in [0, s) — no two's-complement subtleties to replicate
    * in an oracle engine.
    *
    * Adds `h` to `df` (input columns untouched); same loud out-of-range
    * guard as [[zValue]].
    */
  def hilbertIndex(df: DataFrame, xCol: String, yCol: String,
      bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val limit = 1L << bits
    def guarded(c: Column, name: String): Column =
      when(c.isNull || c < 0 || c >= limit,
        raise_error(concat(lit(s"hilbertIndex: $name out of [0, $limit): "),
          coalesce(c.cast("string"), lit("null")))))
        .otherwise(c.cast("long"))
    var cur = df
      .withColumn("_hx", guarded(col(xCol), "x"))
      .withColumn("_hy", guarded(col(yCol), "y"))
      .withColumn("_hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = shiftright(col("_hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("_hy"), i).bitwiseAND(lit(1L))
      val xm = col("_hx").bitwiseAND(lit(s - 1))
      val ym = col("_hy").bitwiseAND(lit(s - 1))
      cur = cur
        .withColumn("_hd",
          col("_hd") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry))
        // reflect-then-transpose of the remaining low bits (ry = 0 arm);
        // both new coords must derive from the PRE-update state, hence one
        // select-stage per level, not sequential withColumns
        .withColumn("_nx",
          when(ry === 0, when(rx === 1, lit(s - 1) - ym).otherwise(ym))
            .otherwise(xm))
        .withColumn("_ny",
          when(ry === 0, when(rx === 1, lit(s - 1) - xm).otherwise(xm))
            .otherwise(ym))
        .withColumn("_hx", col("_nx"))
        .withColumn("_hy", col("_ny"))
        .drop("_nx", "_ny")
    }
    cur.withColumn("h", col("_hd")).drop("_hx", "_hy", "_hd")
  }

  /** [[zorderReport]]'s Hilbert twin: cell = `h >> cellShift`, same
    * (count, per-dimension envelope) quality report — run both over one
    * dataset to quantify the locality win curve choice buys.
    */
  def hilbertReport(df: DataFrame, xCol: String, yCol: String,
      bits: Int, cellShift: Int): DataFrame = {
    require(cellShift >= 0 && cellShift < 2 * bits,
      s"cellShift must be in [0, ${2 * bits}), got $cellShift")
    hilbertIndex(df.select(col(xCol).as("x"), col(yCol).as("y")),
        "x", "y", bits)
      .withColumn("hcell", shiftright(col("h"), cellShift))
      .groupBy("hcell")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }
}
