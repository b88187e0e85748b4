package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed sketches with INTEGER-EXACT arithmetic, so a re-statement of
  * the same formulas in another engine (the DuckDB oracle) reproduces every
  * output bit-for-bit — the same determinism contract as
  * [[graft.functions.TextHash]] (no float ever carries a value; the only
  * hash primitive is md5).
  *
  * Why sketches at all: at 100 TB, `count(distinct x)` per group is a full
  * shuffle of every distinct value. A register sketch reduces each partition
  * to a CONSTANT-size state (m registers), so the shuffle carries
  * O(groups × m) rows regardless of data volume, and sketches from disjoint
  * corpora/pipelines merge by max — the property that lets incremental loads
  * update cardinalities without rescanning history.
  */
object Sketches {

  /** Register count 2^8 — standard error ≈ 1.04/√256 ≈ 6.5%. */
  val HllM: Int = 256

  /** `round(α_256 × 10^6)` with α_m = 0.7213/(1 + 1.079/m) (Flajolet et al.,
    * AofA 2007, the standard bias constant for m ≥ 128). Scaled to an exact
    * integer so both engines apply literally the same α.
    */
  val HllAlphaE6: Long = 718273L

  /** Small-range linear-counting table: LC(V) = round(m·ln(m/V)) for V
    * empty registers, indexed 0..m (LC(0) unused — the estimator only
    * consults it when V > 0). ln is transcendental, and evaluating it in
    * each engine risks last-ulp divergence (the q104 lesson) — so the table
    * is computed ONCE here and embedded as the same integer literals in
    * both the Spark plan and the DuckDB oracle. V has only m+1 possible
    * values, which is what makes the exact-lookup trick affordable.
    */
  val HllLinearCount: Array[Long] = Array.tabulate(HllM + 1)(v =>
    if (v == 0) 0L else math.round(HllM * math.log(HllM.toDouble / v)))

  /** Per-(group, register) max leading-zero rank — the HLL register table.
    *
    * Hash layout: h = md5Hash60("hll:" + value) gives 60 bits; the low 8
    * select the register j, the high 52 form the pattern w whose
    * leading-zero rank is ρ = 53 − bitlength(w) (w = 0 → 53, the all-zero
    * pattern). All integer: `bin()`'s string length IS the bitlength, no
    * log2 double anywhere.
    *
    * Scale shape: one narrow projection rides the scan, then ONE shuffle of
    * partial-max rows — map-side combine bounds each task's output at
    * groups × 256 rows no matter how many values it saw.
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllRegisters(df, Seq(groupCol), valueCol)

  /** Multi-key variant: registers per (groupCols…, j) — the granularity to
    * BUILD at. Estimates for any coarser grouping then come from
    * [[hllEstimate]] without rescanning the data: register tables merge by
    * max, exactly (see the merge law pinned in SketchesSpec).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = TextFunctions.domainHash("hll", col(valueCol))
    val gs = groupCols.map(col)
    df.select(gs :+ h.as("_h"): _*)
      .select(gs ++ Seq(pmod(col("_h"), lit(HllM)).as("_j"),
        expr("_h div 256").as("_w")): _*)
      .select(gs ++ Seq(col("_j"),
        when(col("_w") === 0, lit(53))
          .otherwise(lit(53) - length(bin(col("_w")))).cast("long").as("_rho")): _*)
      .groupBy(gs :+ col("_j"): _*)
      .agg(max(col("_rho")).as("m_j"))
  }

  /** Estimate from a register table at any grouping COARSER than (or equal
    * to) the one it was built at: registers first max-merge onto
    * (groupCols…, j) — the sketch-union law — then the same fixed-point
    * estimator as [[hllDistinct]] runs on the merged table. This is the
    * incremental/rollup path: per-(source, lang) sketches persisted once
    * answer per-lang (or corpus-total) cardinalities without touching the
    * corpus again.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    registers
      .groupBy(gs :+ col("_j"): _*)
      .agg(max(col("m_j")).as("m_j"))
      .groupBy(gs: _*)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_j AS INT))")).as("_s_present"),
        count(lit(1)).as("_present"))
      .select(gs ++ Seq(
        expr(s"""CAST(
            (CAST($HllAlphaE6 AS DECIMAL(38,0)) * ${HllM.toLong * HllM}
              * CAST(${1L << 53} AS DECIMAL(38,0)))
            div (CAST(_s_present + (${HllM} - _present) * CAST(${1L << 53} AS BIGINT)
                   AS DECIMAL(38,0))
                 * 1000000)
          AS BIGINT)""").as("_raw"),
        (lit(HllM) - col("_present")).cast("long").as("zero_registers")): _*)
      .select(gs ++ Seq(
        when(col("_raw") < lit(5L * HllM / 2) && col("zero_registers") > 0,
          element_at(array(HllLinearCount.map(lit(_)): _*),
            (col("zero_registers") + 1).cast("int")).cast("long"))
          .otherwise(col("_raw")).as("est_distinct"),
        col("_raw").as("raw_estimate"),
        col("zero_registers")): _*)
  }

  /** Grouped distinct-cardinality estimate via HyperLogLog, integer-exact.
    *
    * Per group emits:
    *   - `raw_estimate` — ⌊α·m²·2^53 / S⌋ with S = Σ_j 2^(53−M_j) computed
    *     in fixed point (empty registers contribute 2^53; S ≤ 2^61 fits
    *     int64; the α product runs in DECIMAL(38,0) — ~4×10^26 max — and
    *     the integral divide lands back in BIGINT). No float touches the
    *     value on either engine.
    *   - `zero_registers` — V, the empty-register count.
    *   - `est_distinct` — the standard HLL decision rule: when the raw
    *     estimate is below 5m/2 and V > 0, substitute linear counting
    *     m·ln(m/V) via the precomputed [[HllLinearCount]] table (exact
    *     integers shared with the oracle); otherwise the raw estimate.
    *
    * The estimate's two aggregations shuffle (group, j) register rows then
    * m-row groups — both independent of input volume.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, Seq(groupCol), valueCol), Seq(groupCol))

  /** Weighted sample of `k` rows without replacement, priority ∝ weight —
    * deterministic, so reruns and the oracle agree row-for-row.
    *
    * Scheme: a row of integer weight w (clamped to [1, maxWeight]) draws w
    * independent 60-bit uniforms u_r = md5Hash60("wps:key:r") and keeps the
    * MINIMUM as its priority; the k smallest priorities win. Pairwise,
    * P(min of w uniforms < min of v uniforms) = w/(w+v) — exactly
    * proportional odds — making this the integer-arithmetic stand-in for
    * Efraimidis–Spirakis keys u^(1/w) (whose log/pow would diverge across
    * engines in the last ulp).
    *
    * Scale shape: per-row work is ≤ maxWeight hashes riding the scan; the
    * global top-k runs as TakeOrdered (per-partition heads + driver merge
    * of k·P rows), never a full sort. Ties (60-bit collisions) break by
    * key so the selection is total-ordered.
    */
  def weightedPrioritySample(
      df: DataFrame, keyCol: String, weightCol: Column, k: Int,
      maxWeight: Int = 8): DataFrame = {
    df.withColumn("weight", clampedWeight(weightCol, maxWeight))
      .withColumn("priority", minOfWeightUniforms(keyCol))
      .orderBy(col("priority"), col(keyCol))
      .limit(k)
  }

  /** Stratified variant: the `kPerGroup` smallest priorities WITHIN each
    * group — importance sampling that cannot let one stratum starve
    * another (the balanced-mixture twin of the global top-k). The rank
    * filter plans as WindowGroupLimit: each task keeps only kPerGroup rows
    * per group before the shuffle, so the exchange carries
    * O(groups × kPerGroup), not the corpus.
    */
  def weightedPrioritySamplePerGroup(
      df: DataFrame, keyCol: String, groupCol: String, weightCol: Column,
      kPerGroup: Int, maxWeight: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .withColumn("weight", clampedWeight(weightCol, maxWeight))
      .withColumn("priority", minOfWeightUniforms(keyCol))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("priority"), col(keyCol))))
    ranked.filter(col("_rk") <= kPerGroup).drop("_rk")
  }

  /** Build an m-bit Bloom filter over `valueCol` (hashed through the
    * "bloom" domain) — the membership pre-filter that turns a 100 TB
    * anti-/semi-join into a map-side bit test plus a small exact
    * verification join on the survivors. The bitmap is a CONSTANT m/64
    * longs per partition (word-OR merged by [[graft.functions.
    * BloomBitsAggregator]]); collecting it to the driver is bounded state
    * by construction (512 B at m=4096), the same contract as k-means
    * centroids. `m` must be a power of two (the probe derives the word and
    * bit indices by shift/mask so the whole test stays codegen'd).
    */
  def bloomBits(df: DataFrame, valueCol: String, m: Int = 4096, k: Int = 3): Array[Long] = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    import df.sparkSession.implicits._
    val agg = new graft.functions.BloomBitsAggregator(m, k).toColumn
    df.select(TextFunctions.domainHash("bloom", col(valueCol)).as("h"))
      .as[Long].select(agg).collect()(0)
  }

  /** Membership test against a built bitmap, as a codegen'd column: k
    * double-hashed positions (same derivation as the build), each tested
    * with element_at + shift/mask against the broadcast literal array. A
    * true is "possibly in the set" (false positives at the standard Bloom
    * rate), false is definitive — callers route `true` rows into the exact
    * verification join and drop the rest unjoined.
    */
  def bloomMightContain(bits: Array[Long], m: Int, k: Int, value: Column): Column = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    require(bits.length == m / 64, s"bitmap length ${bits.length} != m/64 = ${m / 64}")
    val log2m = java.lang.Integer.numberOfTrailingZeros(m)
    val h = TextFunctions.domainHash("bloom", value)
    val h1 = h.bitwiseAND(lit((m - 1).toLong))
    val hd = call_function("shiftrightunsigned", h, lit(log2m))
    val h2 = lit(1L) + pmod(hd, lit((m - 1).toLong))
    val bitsLit = typedLit(bits.toSeq)
    (0 until k).map { i =>
      val p = pmod(h1 + lit(i.toLong) * h2, lit(m.toLong))
      val word = call_function("shiftrightunsigned", p, lit(6)).cast("int")
      val bit = p.bitwiseAND(lit(63L)).cast("int")
      element_at(bitsLit, word + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), bit)) =!= 0L
    }.reduce(_ && _)
  }

  /** Pairwise distinct-overlap estimates between every two groups, at
    * sketch cost: for each unordered pair (a, b) of `groupCol` values,
    * |A∩B| is estimated by inclusion–exclusion over HLL estimates —
    * est(A) + est(B) − est(A∪B) — where the union estimate comes from
    * MAX-MERGING the two groups' register tables (the sketch-union law),
    * never from rescanning rows. Clamped at 0 (quantization noise can push
    * the raw difference slightly negative on disjoint sets); the raw
    * signed value rides along for calibration.
    *
    * This is the sketch twin of the exact source-overlap join: at 100 TB,
    * all-pairs exact intersection is |groups|² shuffles of row data, while
    * this is ONE register build (a corpus scan reduced to groups × m rows)
    * plus driver-scale pair arithmetic. Use it to rank suspicious pairs,
    * then run the exact join on the shortlist.
    */
  def hllIntersectPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val reg = hllRegisters(df, Seq(groupCol), valueCol)
    val singles = hllEstimate(reg, Seq(groupCol))
      .select(col(groupCol), col("est_distinct"))
    val srcs = reg.select(col(groupCol)).distinct()
    // group count is bounded (it is a grouping key), so the pair frame and
    // the pair-register merge below all broadcast
    val pairs = srcs.select(col(groupCol).as("src_a"))
      .crossJoin(srcs.select(col(groupCol).as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val pairReg = broadcast(pairs)
      .join(reg, col(groupCol) === col("src_a") || col(groupCol) === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("_j"))
      .agg(max(col("m_j")).as("m_j"))
    val unionEst = hllEstimate(pairReg, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("est_distinct").as("est_union"))
    unionEst
      .join(broadcast(singles.select(col(groupCol).as("src_a"),
        col("est_distinct").as("est_a"))), Seq("src_a"))
      .join(broadcast(singles.select(col(groupCol).as("src_b"),
        col("est_distinct").as("est_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("raw_intersect"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_intersect"))
  }

  /** Build a Count-Min sketch over `keyCol`: a depth × width counter
    * matrix as rows (i, bucket, cnt) with bucket_i(k) =
    * md5Hash60("cms" + i + ":" + k) mod width. The i-th hash gets its own
    * md5 domain, so the depth rows are independent in the CM sense while
    * every bucket index stays a pure integer both engines recompute
    * identically (Cormode & Muthukrishnan, J. Algorithms 2005).
    *
    * Scale shape: the per-row explode to depth rows is absorbed by
    * map-side combine — each task emits at most depth × width partial
    * counts no matter how many keys it scanned, and the sketch itself is
    * CONSTANT state (depth·width rows ≈ 2k at the defaults), mergeable
    * across loads by summing counters. That is the whole point at 100 TB:
    * per-key frequency queries without shuffling per-key rows.
    */
  def cmsCounters(df: DataFrame, keyCol: String,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame =
    df.select(col(keyCol).cast("string").as("_k"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("i"), col("_k"))
      .select(col("i"), cmsBucket(col("i"), col("_k"), width).as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for `probes` (one row per key) against a
    * built counter table: est(k) = min_i cnt[i][bucket_i(k)], with absent
    * counters reading 0. Overestimates only — est ≥ true count always, and
    * est ≤ true + εN with probability 1−δ for width = ⌈e/ε⌉, depth =
    * ⌈ln 1/δ⌉. The counter table joins broadcast (it is constant-size by
    * construction), so probing rides the probe scan with zero shuffle of
    * corpus rows.
    */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame =
    probes
      .select(col(keyCol), col(keyCol).cast("string").as("_k"))
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("i"),
        col("_k"))
      .select(col(keyCol), col("i"), cmsBucket(col("i"), col("_k"), width).as("bucket"))
      .join(broadcast(counters), Seq("i", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))

  /** Default CM geometry: ε ≈ e/512 ≈ 0.53% of the stream length at
    * δ = e^−4 ≈ 1.8%. */
  val CmsDepth: Int = 4
  val CmsWidth: Int = 512

  /** JOIN-SIZE estimate from two CM sketches over the join key: for each
    * depth row i, the counter inner product Σ_b cntA[i][b]·cntB[i][b]
    * upper-bounds |A ⋈ B| = Σ_k fA(k)·fB(k) (colliding keys only ADD
    * cross terms), so the estimate is min over depth rows — never below
    * the true join size, within ε·|A|·|B| of it with probability 1−δ
    * (Cormode & Muthukrishnan 2005, §4.2; the AMS inner-product idea on
    * CM counters). The query-planning primitive: decide broadcast vs
    * shuffle vs salt BEFORE paying for the join, from two constant-size
    * sketches a scan of each side maintains for free.
    *
    * Inputs are [[cmsCounters]] outputs built with the SAME geometry.
    * Arithmetic is exact integers end-to-end (products summed in
    * DECIMAL(38,0) — two ~10^9 counters already overflow int64), output
    * one row: (est_join_size as DECIMAL(38,0) string-safe bigint when it
    * fits — emitted as DECIMAL(38,0) cast to string to survive any size).
    */
  def cmsJoinSize(countersA: DataFrame, countersB: DataFrame,
      depth: Int = CmsDepth): DataFrame =
    countersA.select(col("i"), col("bucket"), col("cnt").as("cnt_a"))
      .join(countersB.select(col("i"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("i", "bucket"))
      .groupBy(col("i"))
      .agg(sum(col("cnt_a").cast("decimal(38,0)") *
        col("cnt_b").cast("decimal(38,0)")).as("dot"))
      .agg(min(col("dot")).cast("string").as("est_join_size"))

  /** EXACT 1/s-heavy hitters — every key whose count × s strictly exceeds
    * the stream length n, with its exact count — in two passes:
    *
    *   1. Misra-Gries candidates: each partition runs the s-counter MG
    *      summary (increment if tracked, insert if room, else decrement
    *      every counter — FOCS'82 via the Cormode survey). MG guarantees a
    *      partition keeps every key with LOCAL count > n_p/(s+1); by
    *      pigeonhole any key with GLOBAL count > n/s beats n_p/s ≥
    *      n_p/(s+1) in at least one partition, so the UNION of partition
    *      candidate sets is a guaranteed superset of the answer — no
    *      cross-partition summary merge needed, and the intermediate's
    *      partition-dependence cannot leak: pass 2 recounts exactly.
    *   2. Exact recount: semi-join the scan against the broadcast
    *      candidate set (≤ s × partitions keys — a few MB at any scale),
    *      one map-side-combined count, threshold `cnt × s > n` in pure
    *      integers (no float ever carries a value, the oracle-determinism
    *      contract of this file).
    *
    * The MG pass also tallies each partition's row count (one null-key row
    * per partition), so n needs no third scan. Counter work is O(n)
    * amortized — each decrement event pays for itself with previously
    * banked increments — with O(s) state per task: the shape that survives
    * a 100 TB stream where an exact groupBy of ALL keys would shuffle
    * billions of distinct-key rows to find thirty frequent ones.
    *
    * Output: (keyCol, cnt), exact, independent of partitioning. Null keys
    * are dropped (they are absent from n too, matching a SQL restatement
    * that unnests non-null items).
    */
  def heavyHitters(df: DataFrame, keyCol: String, s: Int,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(s >= 2, s"heavyHitters: s must be >= 2, got $s")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(keyCol).cast("string").as("_k"))
      .where(col("_k").isNotNull)
    // (key=None, n_p) once per partition + (key=Some(candidate), 0) rows;
    // persisted — both the total and the candidate projection read it, and
    // unpersisted the MG scan would execute once per consumer
    val sketch = scope.own(items.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { x =>
        n += 1
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < s => counters.update(x, 1L)
          case None =>
            counters.mapValuesInPlace((_, v) => v - 1)
            counters.filterInPlace((_, v) => v > 0)
        }
      }
      Iterator.single((Option.empty[String], n)) ++
        counters.keysIterator.map(k => (Option(k), 0L))
    }.toDF("_k", "_n").persist(StorageLevel.MEMORY_AND_DISK))
    val total = sketch.where(col("_k").isNull)
      .agg(sum(col("_n")).as("_total"))
    val cands = sketch.where(col("_k").isNotNull).select(col("_k")).distinct()
    items
      .join(broadcast(cands), Seq("_k"), "left_semi")
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * s > col("_total"))
      .select(col("_k").as(keyCol), col("cnt"))
  }

  /** Per-GROUP exact 1/s-heavy hitters — [[heavyHitters]] with the MG
    * candidate pass and the threshold both scoped to each group: every
    * (group, key) whose count × s strictly exceeds the GROUP's row count
    * n_g, with its exact count. The trending-terms-per-day / stopwords-
    * per-language shape.
    *
    * The superset guarantee holds per group: within each partition an
    * s-counter MG summary runs per group seen there, keeping every key
    * with local count > n_{p,g}/(s+1); a globally heavy key of group g
    * beats n_{p,g}/s in at least one partition by pigeonhole over that
    * group's partials. Task state is O(groups-seen-by-task × s) — bounded
    * for natural group columns (days, languages, sources); if the group
    * cardinality is huge, repartition the input by `groupCol` first so
    * each task holds only its own groups' counters. The recount join is
    * left to Catalyst/AQE: per-group candidate sets can exceed the
    * broadcast threshold, and AQE picks broadcast at runtime when they
    * don't. Group totals (one row per group) always broadcast.
    */
  def heavyHittersPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      s: Int, scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(s >= 2, s"heavyHittersPerGroup: s must be >= 2, got $s")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(groupCol).cast("string").as("_g"),
        col(keyCol).cast("string").as("_k"))
      .where(col("_g").isNotNull && col("_k").isNotNull)
    val sketch = scope.own(items.as[(String, String)].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.HashMap[String, Long]]
      val ns = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { case (g, x) =>
        ns.update(g, ns.getOrElse(g, 0L) + 1)
        val c = counters.getOrElseUpdate(g,
          scala.collection.mutable.HashMap.empty[String, Long])
        c.get(x) match {
          case Some(v) => c.update(x, v + 1)
          case None if c.size < s => c.update(x, 1L)
          case None =>
            c.mapValuesInPlace((_, v) => v - 1)
            c.filterInPlace((_, v) => v > 0)
        }
      }
      ns.iterator.map { case (g, n) => (g, Option.empty[String], n) } ++
        counters.iterator.flatMap { case (g, c) =>
          c.keysIterator.map(k => (g, Option(k), 0L)) }
    }.toDF("_g", "_k", "_n").persist(StorageLevel.MEMORY_AND_DISK))
    val totals = sketch.where(col("_k").isNull)
      .groupBy(col("_g")).agg(sum(col("_n")).as("_total"))
    val cands = sketch.where(col("_k").isNotNull)
      .select(col("_g"), col("_k")).distinct()
    items.join(cands, Seq("_g", "_k"), "left_semi")
      .groupBy(col("_g"), col("_k"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq("_g"))
      .where(col("cnt") * s > col("_total"))
      .select(col("_g").as(groupCol), col("_k").as(keyCol), col("cnt"))
  }

  private def cmsBucket(i: Column, key: Column, width: Int): Column =
    pmod(TextFunctions.md5Hash60(
      concat(lit("cms"), i.cast("string"), lit(":"), key)), lit(width.toLong))

  private def clampedWeight(weightCol: Column, maxWeight: Int): Column =
    least(lit(maxWeight), greatest(lit(1), weightCol.cast("int")))

  /** min of `weight` md5 uniforms for the row's key — reads the already-
    * clamped `weight` column added by the callers above.
    */
  private def minOfWeightUniforms(keyCol: String): Column =
    array_min(transform(
      sequence(lit(1), col("weight")),
      r => TextFunctions.md5Hash60(
        concat(lit("wps:"), col(keyCol).cast("string"), lit(":"), r.cast("string")))))

  /** 2^60 — the md5h60 hash space, as a DECIMAL literal for exact integer
    * estimate arithmetic ((k−1)·2^60 overflows int64 for k > 8).
    */
  private val HashSpace = "1152921504606846976"

  /** KMV (k-minimum-values) distinct sketch: per group, the `k` smallest
    * md5h60 hashes of the DISTINCT values — (group, h, rn) rows, rn the
    * hash's rank within its group. The direct-estimate sibling of the HLL
    * registers: HLL composes by max-merge (union only), while KMV sketches
    * support UNION *and* INTERSECTION/Jaccard directly
    * ([[kmvOverlapPairs]]) — inclusion–exclusion on HLL estimates
    * ([[hllIntersectPairs]]) loses all precision when |A∩B| ≪ |A∪B|, which
    * is exactly the contamination-screening regime.
    *
    * Scale shape: one distinct shuffle on (group, hash) — dedup happens
    * BEFORE ranking, so a hot value adds one row, not its multiplicity —
    * then a per-group bottom-k rank the optimizer executes as a
    * WindowGroupLimit (every partition keeps only k rows pre-shuffle).
    * State is groups × k rows, persistable and mergeable (merging two
    * sketches = union, re-rank, cut at k).
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        TextFunctions.md5Hash60(concat(lit("kmv:"),
          col(valueCol).cast("string"))).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("h"))
    hashed.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Distinct-cardinality estimate from a KMV sketch: exact when the group
    * holds fewer than k distinct values (the sketch IS the value set);
    * otherwise the k-th-minimum estimator (k−1)·2^60 / h_k, evaluated in
    * DECIMAL so both engines divide the same exact integers. Standard
    * error ≈ 1/√(k−2).
    */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int = 256): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_k"),
        max(when(col("rn") === k, col("h"))).as("h_k"))
      .select(col(groupCol),
        when(col("n_k") < k, col("n_k"))
          // `div` (IntegralDivide) — truncating like DuckDB's `//`; a true
          // division would HALF_UP-round at result scale first
          .otherwise(expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * " +
            s"CAST($HashSpace AS DECIMAL(38,0)) div CAST(h_k AS DECIMAL(38,0))"))
          .cast("long").as("est_distinct"))

  /** Pairwise overlap estimates between every two groups from ONE KMV
    * sketch build: for each unordered pair, the union sketch is the k
    * smallest of the two hash sets combined; with t its largest retained
    * hash, ρ = |{h ∈ A∩B : h ≤ t}| / |union sketch| estimates the Jaccard
    * similarity and ρ·est(|A∪B|) the intersection size (Beyer et al.,
    * "On Synopses for Distinct-Value Estimation Under Multiset
    * Operations", SIGMOD'07). When the combined distinct count is under k
    * the sketches are complete and every output is EXACT — one formula
    * covers both regimes because t is then the union maximum and the
    * denominator is the true union size.
    *
    * Emitted as exact integers (est counts, jaccard in ppm): group count
    * is bounded, so per-group sorted hash arrays (≤ k elements) broadcast
    * and the |groups|²/2 pair arithmetic is array ops on tiny lists —
    * nothing rescans rows.
    */
  def kmvOverlapPairs(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    val arrs = kmvSketch(df, groupCol, valueCol, k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("hs"))
    val pairs = broadcast(arrs.select(col(groupCol).as("src_a"),
        col("hs").as("ha")))
      .crossJoin(broadcast(arrs.select(col(groupCol).as("src_b"),
        col("hs").as("hb"))))
      .filter(col("src_a") < col("src_b"))
    val u = slice(array_sort(array_distinct(concat(col("ha"), col("hb")))),
      1, k)
    val pairCols = pairs
      .withColumn("u", u)
      .withColumn("nu", size(col("u")))
      .withColumn("t", element_at(col("u"), col("nu")))
      .withColumn("matches", size(filter(array_intersect(col("ha"), col("hb")),
        h => h <= col("t"))))
    val estUnion = when(col("nu") < k, col("nu").cast("long"))
      .otherwise(expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * " +
        s"CAST($HashSpace AS DECIMAL(38,0)) div CAST(t AS DECIMAL(38,0))")
        .cast("long"))
    pairCols
      .withColumn("est_union", estUnion)
      .withColumn("jaccard_ppm",
        expr("CAST(matches AS DECIMAL(38,0)) * 1000000 div " +
          "CAST(nu AS DECIMAL(38,0))").cast("long"))
      .withColumn("est_intersect",
        expr("CAST(jaccard_ppm AS DECIMAL(38,0)) * " +
          "CAST(est_union AS DECIMAL(38,0)) div 1000000").cast("long"))
      .select(col("src_a"), col("src_b"), col("nu").cast("long").as("n_union_k"),
        col("est_union"), col("jaccard_ppm"), col("est_intersect"))
  }
}
