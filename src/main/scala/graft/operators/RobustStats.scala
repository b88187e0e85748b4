package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust distribution statistics on exact ORDER STATISTICS — rank-based
  * percentile bounds (no interpolation, so any engine replays them
  * bit-for-bit), winsorized summaries, and exact equi-depth histograms.
  * Interpolating percentiles (`percentile_cont`) mix engine-specific
  * float arithmetic; the k-th order statistic is a data value, exact by
  * construction — the same reason the dedup family hashes instead of
  * scoring.
  *
  * Scale notes:
  *   - Winsorize ranks within (group, value) via one partitioned window —
  *     per-group data crosses one shuffle on the group key, the standard
  *     contract (a group's rows must fit its partition's task).
  *   - The equi-depth histogram needs a GLOBAL rank, and a global
  *     `row_number` window is a single-task funnel. [[equidepthHistogram]]
  *     instead reuses the segmented-scan idea from `Sharding`: a caller-
  *     supplied segmentation MONOTONE in the sort key (e.g. `floor(value)`)
  *     splits the order; per-segment ranks come from partitioned windows,
  *     segment offsets are a bounded driver fold (O(segments) state), and
  *     the global rank is their sum — no single-task stage anywhere.
  */
object RobustStats {

  /** Per-group winsorized summary with exact rank-based bounds: the p-th
    * percentile is the value at 1-based rank ceil(p·n) in (value, tie)
    * order. Values clamp into [lo, hi] = [P(pLoPermille), P(pHiPermille)];
    * sums are exact DECIMAL(18,2) quantized, emitted as double. Output:
    * (group, n, v_lo, v_hi, wsum). Null values/groups are dropped by
    * contract; permille bounds avoid float rank arithmetic entirely:
    * rank = ceil(permille·n/1000) = (permille·n + 999) div 1000.
    */
  def winsorizedSummary(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String, pLoPermille: Int = 50, pHiPermille: Int = 950): DataFrame = {
    require(pLoPermille >= 1 && pHiPermille <= 1000 && pLoPermille < pHiPermille,
      s"permille bounds out of order: [$pLoPermille, $pHiPermille]")
    val rows = df
      .select(col(groupCol).as("grp"), col(valCol).as("v"), col(tieCol).as("tie"))
      .where(col("grp").isNotNull && col("v").isNotNull)
    val w = Window.partitionBy("grp").orderBy(col("v"), col("tie"))
    val ranked = rows
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    val bounds = ranked
      .withColumn("kLo", expr(s"($pLoPermille * n + 999) div 1000"))
      .withColumn("kHi", expr(s"($pHiPermille * n + 999) div 1000"))
      .groupBy("grp")
      .agg(
        max(when(col("rn") === col("kLo"), col("v"))).as("v_lo"),
        max(when(col("rn") === col("kHi"), col("v"))).as("v_hi"))
    rows.join(bounds, Seq("grp"))
      .select(col("grp"), col("v_lo"), col("v_hi"),
        greatest(col("v_lo"), least(col("v_hi"), col("v"))).as("wv"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), first(col("v_lo")).as("v_lo"),
        first(col("v_hi")).as("v_hi"),
        sum(col("wv").cast("decimal(18,2)")).cast("double").as("wsum"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Exact equi-depth histogram over a global (value, tie) order without a
    * single-task global sort: `buckets` buckets, row at global 1-based
    * rank r lands in bucket ((r-1)·buckets) div n. `segCol` must be a
    * deterministic expression MONOTONE NON-DECREASING in `valCol` with a
    * BOUNDED number of distinct values (e.g. `floor(value)` over a known
    * domain, a fixed binning of a timestamp) — it splits the global order
    * so ranks localize; offsets are a driver-side fold over one tiny
    * per-segment count aggregate. Output: (bucket, cnt, min_v, max_v,
    * vsum) with vsum the exact DECIMAL(18,2) sum emitted as double.
    * Nulls in `valCol` are dropped by contract.
    */
  def equidepthHistogram(df: DataFrame, valCol: String, tieCol: String,
      segCol: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val segGuard = when(segCol.cast("long").isNotNull, segCol.cast("long"))
      .otherwise(raise_error(lit(
        "equidepthHistogram: segCol must be non-null and castable to long")))
    val rows = df
      .select(col(valCol).as("v"), col(tieCol).as("tie"), segGuard.as("seg"))
      .where(col("v").isNotNull)
    val segTotals = rows.groupBy("seg").agg(count(lit(1)).as("c"))
      .orderBy("seg").collect().map(r => (r.getLong(0), r.getLong(1)))
    require(segTotals.length <= 65536,
      s"segCol produced ${segTotals.length} segments; driver offset state is O(segments)")
    val n = segTotals.map(_._2).sum
    val offsets: Map[Long, Long] = segTotals.map(_._1)
      .zip(segTotals.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offExpr = element_at(typedlit(offsets), col("seg"))
    val w = Window.partitionBy("seg").orderBy(col("v"), col("tie"))
    rows
      .withColumn("rank", row_number().over(w).cast("long") + offExpr)
      .withColumn("bucket", expr(s"CAST(((rank - 1) * $buckets) div ${math.max(n, 1L)} AS INT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), min("v").as("min_v"), max("v").as("max_v"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("vsum"))
  }

  /** EXACT order-statistic quantiles WITHOUT a global sort — the
    * distributed-selection algorithm: one histogram pass locates the
    * bucket holding each requested rank, then a second pass sorts ONLY the
    * located buckets (expected n/buckets rows each) and picks the ranked
    * element. At 100 TB a global `ORDER BY` is a whole-corpus exchange
    * into a rank-merged write; this touches the data twice with one
    * bounded aggregate (≤ `buckets` rows of driver state) and one filtered
    * window over a sliver.
    *
    * Quantiles are PERMILLE ranks (the winsorize convention — integer rank
    * arithmetic, rank = (permille·n + 999) div 1000, no float rank math
    * anywhere), and the result is a DATA VALUE (percentile_disc
    * semantics), so any engine replays the answer bit-for-bit. Bucket
    * assignment `floor((v − min)/width)` uses float division, but ONLY
    * monotonicity of the bucket function matters for correctness — counts
    * are exact, so the located (bucket, offset) pair identifies the same
    * order statistic no matter how the boundaries round; the oracle
    * restates rank selection directly and never sees the buckets.
    *
    * Degenerate spread (min = max) short-circuits to that value. NULLs are
    * excluded by contract. A pathological distribution that lands most
    * mass in one bucket degrades pass 2 toward a single-bucket sort —
    * still correct, and only reachable when the value range is orders of
    * magnitude wider than the data's bulk.
    *
    * Output: (permille, value), one row per requested permille.
    */
  def exactQuantilesSelect(df: DataFrame, valCol: String,
      permilles: Seq[Int], buckets: Int = 65536,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(permilles.nonEmpty, "exactQuantilesSelect: no permilles requested")
    require(permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000], got $permilles")
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    // cached: the stats probe, the histogram, and the final bucket-local
    // selection all read this projection
    val v = scope.own(df.select(col(valCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val st = v.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    val n = st.getLong(2)
    if (n == 0L) return Seq.empty[(Long, Double)].toDF("permille", "value")
    val lo = st.getDouble(0)
    val hi = st.getDouble(1)
    val ks = permilles.map(p => p.toLong -> math.max(1L, (p.toLong * n + 999) / 1000))
    if (lo == hi) return ks.map { case (p, _) => (p, lo) }.toDF("permille", "value")
    val width = (hi - lo) / buckets
    val bucketCol =
      least(lit(buckets - 1), floor((col("v") - lit(lo)) / lit(width))).cast("int")
    val hist = v.groupBy(bucketCol.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val before = hist.map(_._1).zip(hist.map(_._2).scanLeft(0L)(_ + _)).toMap
    val targets = ks.map { case (p, k) =>
      val (b, _) = hist(hist.indexWhere { case (b, c) => before(b) < k && k <= before(b) + c })
      (p, b, k - before(b)) // 1-based offset of the rank inside its bucket
    }
    val wanted = targets.toDF("permille", "tb", "off")
    val w = Window.partitionBy("b").orderBy(col("v"))
    v.withColumn("b", bucketCol)
      .where(col("b").isInCollection(targets.map(_._2).distinct))
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(wanted),
        col("b") === col("tb") && col("rn") === col("off"))
      .select(col("permille"), col("v").as("value"))
  }

  /** Per-group least-squares SUFFICIENT STATISTICS (n, Σx, Σy, Σxy, Σx²)
    * over integer-valued x/y columns — the distributed half of a linear
    * trend fit. The statistics sum exactly in int64 in any order and MERGE
    * across partitions, corpora, and incremental loads by plain addition
    * (the same contract as the sketch family); the 2×2 normal-equation
    * solve is O(1) per group and belongs on the consumer — see
    * [[solveLinear]]. Emitting the solve's ratio from the query was
    * rejected deliberately: a slope double would tie the result to an
    * engine's wide-integer division/rounding behavior, while these five
    * integers are bit-identical everywhere.
    *
    * Caller owns the scale contract: |x|·|y|·n and x²·n must stay inside
    * int64 — pick x/y quantizations accordingly (e.g. hour-resolution
    * time, hundredth-unit values).
    */
  def regressionStats(df: DataFrame, groupCol: String,
      x: Column, y: Column): DataFrame =
    df.select(col(groupCol), x.cast("long").as("_x"), y.cast("long").as("_y"))
      .where(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("sum_x"), sum(col("_y")).as("sum_y"),
        sum(col("_x") * col("_y")).as("sum_xy"),
        sum(col("_x") * col("_x")).as("sum_xx"))

  /** Per-cell chi-square drift between two corpus splits — the
    * distribution-shift monitor a training pipeline runs between an old
    * and a new corpus snapshot (or two hash-halves as the null-hypothesis
    * calibration): for each cell (e.g. (lang, source)) with split counts
    * (n_a, n_b) and split totals (NA, NB), the 2×C contingency
    * contribution is
    *
    *   dev_a = N·n_a − NA·m   (m = n_a + n_b, N = NA + NB)
    *   chi2  = dev_a² / (N·NA·m) + dev_b² / (N·NB·m)
    *
    * — the textbook (obs − exp)²/exp with every term cleared of division:
    * dev and the denominators are EXACT integers (DECIMAL(38,0) here,
    * HUGEINT in the DuckDB oracle), and only the final two divisions are
    * IEEE double, each on bit-identical operands — so both engines agree
    * on every output bit without any tolerance.
    *
    * Plan: one aggregate exchange to the cell table (|cells| rows), the
    * split totals as a broadcast single-row aggregate joined back — no
    * global window, nothing driver-side. At 100 TB the cell table is
    * |langs|×|sources|, trivially small; the only full-data pass is the
    * map-side-combined count.
    *
    * Scale contract: dev² ≤ (N·m)² must fit DECIMAL(38,0) → N·m < 10^19,
    * i.e. exact up to ~10^9 rows per cell at 10^10 total; beyond that,
    * pre-aggregate counts per (cell, split) shard and feed the summed
    * counts through the same closing arithmetic.
    *
    * A cell with an empty split (NA = 0 or NB = 0 globally) yields NULL
    * chi2 rather than a division error.
    */
  def chiSquareDrift(df: DataFrame, cellCols: Seq[String],
      split: Column, scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cells = scope.own(df
      .withColumn("_s", split)
      .groupBy(cellCols.map(col): _*)
      .agg(sum(when(col("_s") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_s") =!= 0, 1L).otherwise(0L)).as("n_b"))
      // the |cells|-row table anchors BOTH the split-total aggregate and
      // the join back — without the cache the full-corpus count runs twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = cells.agg(sum("n_a").as("na_tot"), sum("n_b").as("nb_tot"))
    cells.crossJoin(broadcast(totals))
      .withColumn("chi2", expr(
        """CASE WHEN na_tot = 0 OR nb_tot = 0 THEN NULL ELSE
          |  CAST((CAST(na_tot + nb_tot AS DECIMAL(38,0)) * n_a
          |        - CAST(na_tot AS DECIMAL(38,0)) * (n_a + n_b))
          |       * (CAST(na_tot + nb_tot AS DECIMAL(38,0)) * n_a
          |          - CAST(na_tot AS DECIMAL(38,0)) * (n_a + n_b)) AS DOUBLE)
          |  / CAST(CAST(na_tot + nb_tot AS DECIMAL(38,0)) * na_tot
          |         * (n_a + n_b) AS DOUBLE)
          |  + CAST((CAST(na_tot + nb_tot AS DECIMAL(38,0)) * n_b
          |          - CAST(nb_tot AS DECIMAL(38,0)) * (n_a + n_b))
          |         * (CAST(na_tot + nb_tot AS DECIMAL(38,0)) * n_b
          |            - CAST(nb_tot AS DECIMAL(38,0)) * (n_a + n_b)) AS DOUBLE)
          |  / CAST(CAST(na_tot + nb_tot AS DECIMAL(38,0)) * nb_tot
          |         * (n_a + n_b) AS DOUBLE)
          |END""".stripMargin))
      .select(cellCols.map(col) ++ Seq(col("n_a"), col("n_b"), col("chi2")): _*)
  }

  /** Close the fit from [[regressionStats]] output: (slope, intercept) of
    * y over x, or None for degenerate groups (n < 2 or zero x variance).
    * Driver-side O(1) arithmetic in BigInt (no overflow) with one final
    * double division each.
    */
  def solveLinear(n: Long, sumX: Long, sumY: Long,
      sumXy: Long, sumXx: Long): Option[(Double, Double)] = {
    val den = BigInt(n) * sumXx - BigInt(sumX) * sumX
    if (n < 2 || den == 0) None
    else {
      val num = BigInt(n) * sumXy - BigInt(sumX) * sumY
      val slope = num.toDouble / den.toDouble
      Some((slope, (sumY - slope * sumX) / n))
    }
  }

  /** Per-group MAD outlier sweep — the robust alternative to z-scores,
    * immune to the outliers it hunts: med = exact LOWER median of the
    * group's values (rank (n+1) div 2 in (value, tie) order), mad = lower
    * median of |v − med| in (dev, tie) order, and a row is flagged when
    * dev × 1000 > factorPermille × mad (default 3×MAD; no 1.4826
    * normal-consistency scaling — fold it into `factorPermille` if normal
    * calibration is wanted, keeping the contract integer). Every selected
    * median is a DATA value (rank-based, no interpolation) and the only
    * float ops are one subtraction, one abs and two single multiplies —
    * a fixed IEEE sequence every engine rounds alike, so the flag set
    * replays bit-identically cross-engine.
    *
    * Note mad = 0 collapses the rule to `dev > 0` only when factor > 0 —
    * a constant-valued majority flags EVERY deviating row, the documented
    * MAD failure mode; winsorizedSummary is the bound-based alternative.
    *
    * Scale shape: two window passes on the SAME group key (the ranked
    * median selections) plus two broadcast joins of the groups-sized
    * median/mad tables — row data shuffles only on the group key, never
    * globally. Output: (group, tie, value, med, mad, dev) for flagged
    * rows. Null groups/values are dropped by contract.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String, factorPermille: Int = 3000): DataFrame = {
    require(factorPermille >= 1,
      s"madOutliers: factorPermille must be positive, got $factorPermille")
    val rows = df
      .select(col(groupCol).as("grp"), col(valCol).as("v"), col(tieCol).as("tie"))
      .where(col("grp").isNotNull && col("v").isNotNull)
    def lowerMedian(in: DataFrame, vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("grp").orderBy(col(vCol), col("tie"))
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("grp"), col(vCol).as(out))
    }
    val med = lowerMedian(rows, "v", "med")
    val dev = rows.join(broadcast(med), Seq("grp"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = lowerMedian(dev.select(col("grp"), col("dev"), col("tie")),
      "dev", "mad")
    dev.join(broadcast(mad), Seq("grp"))
      .filter(col("dev") * 1000 > lit(factorPermille) * col("mad"))
      .select(col("grp").as(groupCol), col("tie").as(tieCol),
        col("v").as(valCol), col("med"), col("mad"), col("dev"))
  }
}
