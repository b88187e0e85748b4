package graft.queries

import graft.operators.{Funnel, IncrementalAgg, Layout, RobustStats, Rolling, Sessionize, Sharding}
import graft.plans.LayoutAdvisor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics pack — the product-analytics queries the reference's
  * users run in Greenplum over CDC-synced event tables (reference:
  * README.md:9,15): sessionization, ordered funnels, cohort retention,
  * distribution histograms — plus the two training-pipeline assembly steps
  * that round out the corpus surface (deterministic corpus shuffle,
  * incremental aggregate maintenance).
  *
  * Every query reads `sfDir` parquet and has a DuckDB oracle below. The
  * events table's ns timestamps ride [[RelationalQueries.events]]'s µs
  * truncation; oracles restate it (`epoch_ns(ts) // 1000`). Time math is
  * exact int64 microseconds end-to-end — no interval or float arithmetic,
  * so session boundaries, funnel orderings, and week offsets replay
  * bit-identically in any engine.
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Gap sessionization (batch): 30-min inactivity gap → per-session
    // stats. One shuffle on user_id shared by the lag window, the running
    // sum, and the final aggregate (Sessionize scaladoc).
    "q105_sessionize" -> ((s, dir) => {
      Sessionize.sessions(RelationalQueries.events(s, dir),
        "user_id", "ts", gapSeconds = 1800,
        extras = Seq(
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          RelationalQueries.dsum(col("value")).as("sum_value")))
    }),

    // ── MATCH_RECOGNIZE-lite: contiguous `view click* purchase` within 30
    // minutes per user — purchases reached from the nearest prior view
    // through clicks ONLY (any other interleaved event kills the match,
    // which the q106 funnel deliberately ignores). One shuffle on user_id;
    // see [[graft.operators.Funnel.matchPattern]].
    "q185_event_pattern" -> ((s, dir) => {
      Funnel.matchPattern(RelationalQueries.events(s, dir),
        "user_id", "ts", "event_id", "event_type",
        startType = "view", midTypes = Seq("click"), endType = "purchase",
        maxSpanUs = 1800000000L)
    }),

    // ── Interval union: each event covers [ts, ts+30 min); overlapping or
    // adjacent coverage merges into maximal per-user spans — total-time-
    // covered semantics (exposure/uptime), which the gap rule of q105
    // cannot express. Same one-shuffle window shape. See
    // [[graft.operators.Sessionize.intervalUnion]].
    "q134_interval_union" -> ((s, dir) => {
      Sessionize.intervalUnion(RelationalQueries.events(s, dir),
        "user_id", "ts", lengthSeconds = 1800)
    }),

    // ── Daily distinct users via the HLL sketch: the sketch × time-bucket
    // composition — per-day register tables are what a dashboard persists
    // to answer "unique users, any date range" by max-merging buckets
    // (q137's union law) instead of re-counting. Estimates are the
    // integer-exact q131 chain. See [[graft.operators.Sketches]].
    "q139_hll_windowed" -> ((s, dir) => {
      graft.operators.Sketches.hllDistinct(
        RelationalQueries.events(s, dir)
          .select(col("ts").cast("date").as("day"), col("user_id")),
        "day", "user_id")
    }),

    // ── NATIVE session windows (batch form of the streaming operator):
    // the same 30-min gap sessions as q105 through Spark's built-in
    // `session_window` — one aggregate, the engine merges overlapping
    // per-event windows itself (vs q105's hand-rolled lag + running-sum
    // form). window.end = last event + gap by the operator's contract;
    // all integer µs arithmetic, so the oracle restates it exactly.
    "q129_session_window_native" -> ((s, dir) => {
      RelationalQueries.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          RelationalQueries.dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"), col("sum_value"))
    }),

    // ── DYNAMIC-GAP session windows: the gap is a PER-EVENT expression
    // (purchases hold a session open 60 min, everything else 15) —
    // Spark's session_window(ts, gapColumn) form, where the engine merges
    // each event's [ts, ts+gap) interval per key. The semantic is exactly
    // interval UNION (q134's running-max-end rule with a variable end),
    // which is what the oracle restates — and why tie order at equal ts
    // cannot flip the result. Same one-shuffle posture as q129.
    "q180_session_dynamic_gap" -> ((s, dir) => {
      val gap = when(col("event_type") === "purchase", lit("60 minutes"))
        .otherwise(lit("15 minutes"))
      RelationalQueries.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), gap))
        .agg(count(lit(1)).as("n_events"),
          RelationalQueries.dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"), col("sum_value"))
    }),

    // ── Grid-blocked spatial radius join: every purchase point within
    // 500 m of each click point, on a synthetic 100 km planar grid (both
    // engines derive coordinates from the same md5 chain — the corpus has
    // no geo columns, so the operator under test is the blocking join +
    // EXACT int64 distance test; see Spatial.radiusJoin for the ×9
    // neighborhood shape that replaces a cross join at 100 TB).
    "q181_spatial_radius" -> ((s, dir) => {
      import graft.functions.TextFunctions.md5Hash60
      def pts(tag: String) = RelationalQueries.events(s, dir)
        .filter(col("event_type") === tag)
        .select(col("event_id"),
          pmod(md5Hash60(concat(lit("x:"), col("event_id").cast("string"))),
            lit(100000L)).as("x"),
          pmod(md5Hash60(concat(lit("y:"), col("event_id").cast("string"))),
            lit(100000L)).as("y"))
      graft.operators.Spatial.radiusJoin(
          pts("click"), pts("purchase"), "event_id", "x", "y", radius = 500L)
        .select(col("id_l").as("click_id"), col("id_r").as("purchase_id"),
          col("dist2"))
    }),

    // ── Nearest-neighbor spatial join: each click's CLOSEST purchase
    // within 500 m (ties by purchase id) — radius candidates from the
    // grid join, then a WindowGroupLimit rank per click; clicks with no
    // in-radius purchase are absent by contract (mirror in the oracle).
    "q182_spatial_nearest" -> ((s, dir) => {
      import graft.functions.TextFunctions.md5Hash60
      def pts(tag: String) = RelationalQueries.events(s, dir)
        .filter(col("event_type") === tag)
        .select(col("event_id"),
          pmod(md5Hash60(concat(lit("x:"), col("event_id").cast("string"))),
            lit(100000L)).as("x"),
          pmod(md5Hash60(concat(lit("y:"), col("event_id").cast("string"))),
            lit(100000L)).as("y"))
      val cand = graft.operators.Spatial.radiusJoin(
        pts("click"), pts("purchase"), "event_id", "x", "y", radius = 500L)
      val w = Window.partitionBy(col("id_l"))
        .orderBy(col("dist2"), col("id_r"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id_l").as("click_id"), col("id_r").as("nearest_purchase"),
          col("dist2"))
    }),

    // ── Ordered funnel signup → view → click → purchase: each stage
    // counted only when STRICTLY after the actor's previous stage. One
    // bounded per-actor aggregate per stage, all keyed on user_id.
    "q106_funnel" -> ((s, dir) => {
      Funnel.counts(RelationalQueries.events(s, dir),
        "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
    }),

    // ── Weekly cohort retention: cohort = Monday of the user's first-ever
    // event week; offset = full weeks since the user's first DAY (exact
    // integer day arithmetic, not week truncation, so a Sunday-join user
    // counts week 1 on their 8th day, not on the next ISO week).
    "q107_cohort_retention" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      val first = ev.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
      ev.join(first, "user_id")
        .select(
          date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
          expr("CAST(datediff(CAST(ts AS DATE), CAST(first_ts AS DATE)) DIV 7 AS INT)")
            .as("week_offset"),
          col("user_id"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("active_users"))
    }),

    // ── Fixed-width 20-bucket histogram of `value`: bounds from one tiny
    // broadcast aggregate, bucket arithmetic a fixed IEEE op sequence
    // ((v-lo), (hi-lo)/20, one division, floor) every engine rounds alike.
    "q108_value_histogram" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      val stats = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      ev.crossJoin(broadcast(stats))
        .select(
          when(col("hi") === col("lo"), 0)
            .otherwise(least(
              floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / 20.0)),
              lit(19L)))
            .cast("int").as("bucket"),
          col("value"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          RelationalQueries.dsum(col("value")).as("sum_value"))
    }),

    // ── Deterministic corpus shuffle: seed-keyed md5 order, shard +
    // in-shard position for training-order assembly (Sharding scaladoc).
    "q109_corpus_shuffle" -> ((s, dir) => {
      Sharding.shuffleShards(
        t(s, dir, "documents").select("doc_id"), "doc_id", shards = 8)
        .select("doc_id", "shard", "pos")
    }),

    // ── Incremental aggregate maintenance: per-(event_type, day) state
    // built separately over a 20-day base and a 10-day delta, merged
    // state-to-state, rendered from state alone — and verified against the
    // oracle's ONE-SHOT aggregate over everything, which is the whole
    // point: the fold must equal the recompute bit-for-bit.
    "q110_incremental_agg" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
        .withColumn("day", col("ts").cast("date"))
      val cut = lit("2024-01-21").cast("timestamp")
      val keys = Seq("event_type", "day")
      val merged = IncrementalAgg.merge(Seq(
        IncrementalAgg.state(ev.filter(col("ts") < cut), keys, Seq("value")),
        IncrementalAgg.state(ev.filter(col("ts") >= cut), keys, Seq("value"))),
        keys)
      IncrementalAgg.finish(merged, keys, Seq("value"))
    }),

    // ── Rolling 7-day distinct actors per day: the linear interval-union
    // form, not a COUNT(DISTINCT) OVER RANGE re-scan and not the
    // O(days × events) grid range join (Rolling scaladoc).
    "q117_rolling_active" -> ((s, dir) => {
      Rolling.rollingDistinct(RelationalQueries.events(s, dir),
        "user_id", "ts", windowDays = 7)
    }),

    // ── Z-order layout report: Morton-interleave (user_id, day-index) and
    // report each 64-z-unit cell's row count + per-dimension envelope —
    // the per-file min/max footer stats a z-sorted writer would produce,
    // tight in BOTH dimensions (Layout scaladoc). The day index is exact
    // integer date arithmetic from the corpus epoch.
    "q119_zorder_layout" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir).select(
        col("user_id").as("x"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("y"))
      Layout.zorderReport(ev, "x", "y", bits = 16, cellShift = 6)
    }),

    // ── Hilbert-curve layout report — q119's Morton twin on a 1024×1024
    // grid (pmod-folded dims, immune to id-range growth across testdata
    // regenerations). Consecutive Hilbert indexes are always grid
    // neighbors, so the >>8 cells tile compact square-ish regions where
    // z-cells jump at power-of-two seams — compare the two reports'
    // envelopes for the curve-choice pruning argument. Unrolled per-level
    // quadrant fold, one codegen'd projection chain riding the scan
    // (Layout.hilbertIndex scaladoc); the oracle replays the identical
    // integer fold as a generated CTE chain.
    "q173_hilbert_layout" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir).select(
        pmod(col("user_id"), lit(1024L)).as("x"),
        pmod(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long"), lit(1024L)).as("y"))
      Layout.hilbertReport(ev, "x", "y", bits = 10, cellShift = 8)
    }),

    // ── Trailing-8-term EWMA of `value` per user: exact decimal weights
    // 2^-(j+1), one window shuffle on the actor key (Rolling scaladoc).
    // ── 5-minute OHLC bars per event type — the time-series downsample an
    // analytics store serves charts from. Bar boundary = integer µs floor
    // (no calendar function, so both engines bucket identically); open and
    // close picked by mirror-image row_number ranks over (ts, event_id) —
    // a total order, so ties cannot flip endpoints across engines. ONE
    // exchange on (type, bar): both window sorts and the final aggregate
    // reuse it; at 100 TB the shuffle carries (type, bar, value, rank
    // bookkeeping) rows, already one per event, and bars aggregate
    // map-side after the windows.
    "q150_ohlc_bars" -> ((s, dir) => {
      val barUs = 300000000L // 5 min in µs
      val e = RelationalQueries.events(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
        .withColumn("bar_us",
          unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(barUs)))
      val asc = Window.partitionBy(col("event_type"), col("bar_us"))
        .orderBy(col("ts"), col("event_id"))
      val desc = Window.partitionBy(col("event_type"), col("bar_us"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(asc))
        .withColumn("rdesc", row_number().over(desc))
        .groupBy(col("event_type"), col("bar_us")) // same keys as the windows
        .agg(
          max(when(col("rn") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rdesc") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_events"),
          RelationalQueries.dsum(col("value")).as("sum_value"))
        .select(col("event_type"), timestamp_micros(col("bar_us")).as("bar_start"),
          col("open"), col("high"), col("low"), col("close"),
          col("n_events"), col("sum_value"))
    }),

    // ── Per-type linear-trend sufficient statistics: x = hours since
    // 2024-01-01 (exact integer bucket), y = value hundredths. Five int64
    // sums that merge across partitions and incremental loads by addition;
    // the O(1) normal-equation solve stays consumer-side
    // ([[graft.operators.RobustStats.solveLinear]]) — emitting the slope
    // ratio here would tie the oracle to an engine's wide-division
    // rounding. One map-side-combined shuffle of 5 longs per group.
    "q152_trend_stats" -> ((s, dir) => {
      graft.operators.RobustStats.regressionStats(
        RelationalQueries.events(s, dir), "event_type",
        expr("unix_micros(ts) div 3600000000") - lit(473352L),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
    }),

    // ── Time-weighted average value per type (TWAP): each event's value
    // holds until the type's next event (the q124 SCD2 hold semantics),
    // weight = exact µs duration, integral accumulated in DECIMAL so the
    // sum is order-independent — a float integral would pin the verifier
    // to accumulation order. One window shuffle on event_type, reused by
    // the final aggregate; the open last interval is excluded on both
    // engines. Zero-length ties contribute zero weight by construction.
    "q151_twap" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      RelationalQueries.events(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
        .withColumn("dur_us",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .filter(col("dur_us").isNotNull)
        // value in exact hundredths (the decimal cast pins the 2-dp data
        // contract); the integral then lives in int64 hundredth-µs units —
        // a decimal-to-double cast would round twice in some engines
        // (int128 → double → /10^scale), so no decimal survives to the
        // output. Scale contract: |value|·Σdur_us·100 < 2^63 per group —
        // ~10^18 hundredth-µs ≈ 300 value-years; wider spans pre-bucket.
        .withColumn("vh", (col("value").cast("decimal(18,2)") * 100).cast("long"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("vh") * col("dur_us")).as("_numh"),
          sum(col("dur_us")).as("total_dur_us"),
          count(lit(1)).as("n_intervals"))
        .select(col("event_type"),
          (col("_numh").cast("double")
            / (col("total_dur_us") * 100).cast("double")).as("twap"),
          col("n_intervals"), col("total_dur_us"))
    }),

    "q120_ewma" -> ((s, dir) => {
      Rolling.ewma(RelationalQueries.events(s, dir),
        "user_id", "ts", "event_id", "value", terms = 8, outCol = "ewma8")
        .select("event_id", "user_id", "ewma8")
    }),

    // ── SCD2-style validity intervals: each event opens a [from, to) state
    // interval for its actor, closed by the actor's next event — the
    // type-2 dimension build warehouses run post-CDC. Exact microsecond
    // arithmetic; one window shuffle on the actor key.
    "q124_scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("valid_from_us"), col("event_id"))
      RelationalQueries.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("valid_from_us"))
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
        .withColumn("is_current", col("valid_to_us").isNull)
    }),

    // ── Markov next-event transition matrix: per-actor event sequences
    // (ordered by exact µs + event_id tie-break) yield (from, to) counts
    // and integer-ppm row-conditional shares — the path-analysis summary
    // behind "what do users do after a click". One window shuffle on the
    // actor key for the lead, one aggregate exchange whose output is
    // |event types|² rows, and a window over that tiny result for the
    // per-from totals; ppm by integer `div` so both engines round alike.
    "q154_transition_matrix" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      RelationalQueries.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("from_total",
          sum(col("n")).over(Window.partitionBy("from_type")))
        .withColumn("ppm", expr("n * 1000000 div from_total"))
    }),

    // ── Time-to-convert: per signup cohort week, how long users take from
    // their first signup to their first purchase AT OR AFTER it — count
    // and the exact rank-based lower median of the delay (the k-th order
    // statistic at k = (n+1) div 2 is a data value both engines agree on;
    // interpolated medians are engine-specific float math). Shape: two
    // per-user min-aggregates on the user key, one broadcast-friendly
    // join, one window per cohort over the already-aggregated (one row
    // per converted user) table — no raw-event window anywhere.
    "q161_time_to_convert" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val delay = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        .join(signup, "user_id")
        .where(col("p_us") >= unix_micros(col("s_ts")))
        .groupBy(col("user_id"), col("s_ts"))
        .agg(min(col("p_us")).as("first_p_us"))
        .select(date_trunc("week", col("s_ts")).cast("date").as("cohort_week"),
          col("user_id"),
          (col("first_p_us") - unix_micros(col("s_ts"))).as("delay_us"))
      val w = Window.partitionBy("cohort_week")
        .orderBy(col("delay_us"), col("user_id"))
      delay
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("cohort_week")))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("cohort_week"), col("n").as("n_converted"),
          col("delay_us").as("median_delay_us"))
    }),

    // ── Date-spine gap fill: per-type daily rollups with MISSING days
    // materialized as explicit zero rows between each type's first and
    // last active day — the time-series completeness step dashboards and
    // forecasting features need (a downstream average-over-days is wrong
    // if absent days silently vanish). One aggregate exchange builds the
    // daily table; the spine is a bounded explode of the per-type
    // (min, max) bounds (types × days rows — tiny at any corpus scale);
    // the fill join runs over two post-aggregate tables, never raw events.
    "q158_date_spine" -> ((s, dir) => {
      val daily = RelationalQueries.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"),
          RelationalQueries.dsum(col("value")).as("sum_value"))
        // the tiny per-day table anchors the bounds aggregate AND the fill
        // join — one events scan, not two
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val spine = daily.groupBy("event_type")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("event_type"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
          col("n_events").isNull.as("is_gap"))
    }),

    // ── Winsorized per-type value summary on exact rank-based p5/p95
    // bounds — no percentile interpolation, so the bounds are data values
    // any engine agrees on (RobustStats scaladoc).
    "q125_winsorize" -> ((s, dir) => {
      RobustStats.winsorizedSummary(RelationalQueries.events(s, dir),
        "event_type", "value", "event_id")
    }),

    // ── Exact equi-depth 10-bucket histogram of value WITHOUT a global
    // single-task sort: floor(value) segments the order, per-segment
    // window ranks + driver offset fold give the global rank
    // (RobustStats scaladoc).
    "q126_equidepth" -> ((s, dir) => {
      RobustStats.equidepthHistogram(RelationalQueries.events(s, dir),
        "value", "event_id", floor(col("value")).cast("long"), buckets = 10)
    }),

    // ── INCREMENTAL sessionization: history sessions (events older than 7
    // days before the corpus max) are stored as blocks, then the last-week
    // delta folds in via [[graft.operators.Sessionize.mergeSessions]] —
    // O(batch + touched sessions), never a history rescan; late events
    // bridging two stored sessions merge them exactly. The oracle is the
    // FULL recompute, so any divergence between the incremental and
    // from-scratch paths hash-fails. Sums stay decimal until the final
    // double cast (double partials would re-merge order-dependently).
    "q196_session_incremental" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
      val cutUs = maxUs - 7L * 86400L * 1000000L
      val hist = ev.filter(unix_micros(col("ts")) < cutUs)
      val delta = ev.filter(unix_micros(col("ts")) >= cutUs)
      val stored = Sessionize.sessions(hist, "user_id", "ts", gapSeconds = 1800,
        extras = Seq(sum(col("value").cast("decimal(18,2)")).as("sum_value")))
      Sessionize.mergeSessions(stored, delta, "user_id", "ts",
        gapSeconds = 1800,
        sumCols = Map("sum_value" -> col("value").cast("decimal(18,2)")))
        .select(col("user_id"), col("session_id"), col("start_us"),
          col("end_us"), col("n_events"), col("dur_us"),
          col("sum_value").cast("double").as("sum_value"))
    }),

    // ── Per-type MAD outliers: |v − median| > 3×MAD with exact rank-based
    // lower medians — the robust anomaly sweep z-scores can't do (the mean
    // and stddev are dragged by the outliers being hunted). Flag set is
    // bit-replayable: medians are data values, the float ops are one fixed
    // IEEE sequence. See [[graft.operators.RobustStats.madOutliers]].
    "q195_mad_outliers" -> ((s, dir) => {
      RobustStats.madOutliers(RelationalQueries.events(s, dir),
        "event_type", "value", "event_id", factorPermille = 3000)
    }),

    // ── Exact p50/p90/p99/p99.9 of the value distribution WITHOUT a
    // global sort: histogram pass locates each rank's bucket, a filtered
    // window sorts only those buckets — the distributed-selection shape
    // that replaces a whole-corpus ORDER BY exchange at 100 TB. Ranks are
    // integer permille arithmetic; the answers are data values, so the
    // oracle replays them by direct rank selection. See
    // [[graft.operators.RobustStats.exactQuantilesSelect]].
    "q189_exact_quantiles" -> ((s, dir) => {
      RobustStats.exactQuantilesSelect(RelationalQueries.events(s, dir),
        "value", permilles = Seq(500, 900, 990, 999))
    }),

    // ── Layout advisor: the storage-side sibling of the q226 MV advisor —
    // profile a fixed 6-query workload's analyzed plans (3 equality votes
    // on event_type, range votes on value/event_id, join votes on
    // user_id), measure exact per-column NDV in one aggregate pass, and
    // rank partition / z-order / bucket picks by integer rows-skipped ×
    // hit arithmetic. The oracle re-derives NDVs from the data and replays
    // the identical scoring, pick gates, and bucket-count rule — a drift
    // in plan profiling, ranking, or the small-files NDV gate hash-fails.
    // See [[graft.plans.LayoutAdvisor]].
    "q237_layout_advisor" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val wl = Seq(
        ev.filter(col("event_type") === "click").agg(count(lit(1))),
        ev.filter(col("event_type") === "view" && col("value") > 50.0)
          .agg(count(lit(1))),
        ev.filter(col("event_id") > 500000L).agg(count(lit(1))),
        ev.join(cust, col("user_id") === col("c_custkey")).agg(count(lit(1))),
        ev.filter(col("event_type").isin("view", "click")
          && col("event_id") <= 900000L).agg(count(lit(1))),
        ev.join(ord, col("user_id") === col("o_custkey")).agg(count(lit(1))))
      LayoutAdvisor.render(s, LayoutAdvisor.advise(ev, wl, exactNdv = true))
    }),

    // ── Advise → APPLY → query, end to end: the q237 recommendation is
    // executed (event_type partition directories, event_id/value file-
    // level clustering) and the advised workload's own filter shape runs
    // against the rewrite — the equality predicate prunes to ONE
    // directory, the range predicate prunes row groups via the tight
    // per-file envelopes the clustered sort produced. The oracle reads
    // the ORIGINAL table: a re-layout must be lossless.
    "q238_layout_applied" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val wl = Seq(
        ev.filter(col("event_type") === "click").agg(count(lit(1))),
        ev.filter(col("event_type") === "view" && col("value") > 50.0)
          .agg(count(lit(1))),
        ev.filter(col("event_id") > 500000L).agg(count(lit(1))),
        ev.join(t(s, dir, "customer"),
          col("user_id") === col("c_custkey")).agg(count(lit(1))))
      val rec = LayoutAdvisor.advise(ev, wl, exactNdv = true)
      val out = java.nio.file.Files.createTempDirectory("graft_q238_layout")
      try {
        LayoutAdvisor.applyTo(ev, rec, out.toString)
        s.read.parquet(out.toString)
          .filter(col("event_type") === "click" && col("event_id") <= 900000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            RelationalQueries.dsum(col("value")).as("sum_value"))
          .localCheckpoint() // eager: detached before the finally sweeps
      } finally {
        scala.util.Using.resource(java.nio.file.Files.walk(out)) { st =>
          st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }),

    // ── Constraint SUGGESTION: profile → contract — the step before the
    // q99/q203 rule engine when a table arrives without one. One exact
    // stats aggregate (count/exact-distinct/min/max) + one bounded pass
    // for low-cardinality string value sets derives the rules the data
    // currently satisfies (not_null / unique / in_range / in_set); by
    // construction Quality.check over the suggestions passes on the data
    // itself (spec-pinned). The oracle re-derives every gate and bound.
    // See [[graft.operators.Quality.suggestRules]].
    "q242_rule_suggestion" -> ((s, dir) => {
      import graft.operators.Quality
      Quality.renderSuggestions(s, Quality.suggestRules(
        t(s, dir, "events"), Seq("event_id", "event_type", "user_id", "value")))
    }))

  val oracles: Map[String, String] = Map(
    // q237: hit counts are the workload constants the plan profiler must
    // extract (a profiling drift changes them and hash-fails); NDVs, the
    // integer skip-score, the [2, 100000] partition NDV gate, the
    // (score DESC, column) ranking, and the power-of-two bucket rule are
    // all re-derived from the data.
    "q237_layout_advisor" ->
      """WITH stats AS (
        |  SELECT count(*) AS n_rows,
        |    count(DISTINCT event_type) AS ndv_et,
        |    count(DISTINCT value) AS ndv_v,
        |    count(DISTINCT event_id) AS ndv_eid,
        |    count(DISTINCT user_id) AS ndv_uid
        |  FROM events),
        |hits(kind, c, h) AS (VALUES
        |  ('eq', 'event_type', 3), ('range', 'event_id', 2),
        |  ('range', 'value', 1), ('join', 'user_id', 2)),
        |sc AS (
        |  SELECT kind, c, CAST(h AS BIGINT) AS hits,
        |    CAST(CASE c WHEN 'event_type' THEN s.ndv_et
        |      WHEN 'value' THEN s.ndv_v WHEN 'event_id' THEN s.ndv_eid
        |      ELSE s.ndv_uid END AS BIGINT) AS ndv,
        |    s.n_rows
        |  FROM hits CROSS JOIN stats s),
        |sc2 AS (
        |  SELECT kind, c, hits, ndv,
        |    hits * (n_rows - n_rows // greatest(ndv, 1)) AS score, n_rows
        |  FROM sc),
        |part AS (
        |  SELECT 'partition' AS role, c, hits, ndv, score, CAST(0 AS BIGINT) AS buckets
        |  FROM sc2 WHERE kind = 'eq' AND ndv BETWEEN 2 AND 100000
        |  ORDER BY score DESC, c LIMIT 1),
        |zord AS (
        |  SELECT 'zorder' || CAST(row_number() OVER (ORDER BY score DESC, c) AS VARCHAR) AS role,
        |    c, hits, ndv, score, CAST(0 AS BIGINT) AS buckets
        |  FROM sc2 WHERE kind = 'range' AND c NOT IN (SELECT c FROM part)
        |  ORDER BY score DESC, c LIMIT 2),
        |bk AS (
        |  SELECT CAST(coalesce((SELECT min(b)
        |    FROM (VALUES (8),(16),(32),(64),(128),(256),(512),(1024),(2048),(4096)) p(b)
        |    WHERE b >= (SELECT (n_rows + 999999) // 1000000 FROM stats)), 4096) AS BIGINT) AS b),
        |buck AS (
        |  SELECT 'bucket' AS role, c, hits, ndv, score, (SELECT b FROM bk) AS buckets
        |  FROM sc2 WHERE kind = 'join' AND c NOT IN (SELECT c FROM part)
        |  ORDER BY score DESC, c LIMIT 1)
        |SELECT role, c AS "column", hits, ndv, score, buckets FROM part
        |UNION ALL
        |SELECT role, c AS "column", hits, ndv, score, buckets FROM zord
        |UNION ALL
        |SELECT role, c AS "column", hits, ndv, score, buckets FROM buck""".stripMargin,

    // q238: the oracle never sees the rewrite — same rows must come back
    // through the partitioned + clustered layout.
    "q238_layout_applied" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type = 'click' AND event_id <= 900000
        |GROUP BY user_id""".stripMargin,

    // q242: every suggestion gate (all-non-null, exact-distinct == rows,
    // numeric bounds, 2..8-value string sets) re-derived from the data;
    // the sorted comma-joined value set pins determinism.
    "q242_rule_suggestion" ->
      """WITH s AS (
        |  SELECT count(*) AS n,
        |    count(event_id) AS nn_eid, count(DISTINCT event_id) AS nd_eid,
        |    CAST(min(event_id) AS DOUBLE) AS lo_eid,
        |    CAST(max(event_id) AS DOUBLE) AS hi_eid,
        |    count(event_type) AS nn_et, count(DISTINCT event_type) AS nd_et,
        |    count(user_id) AS nn_uid, count(DISTINCT user_id) AS nd_uid,
        |    CAST(min(user_id) AS DOUBLE) AS lo_uid,
        |    CAST(max(user_id) AS DOUBLE) AS hi_uid,
        |    count(value) AS nn_v, count(DISTINCT value) AS nd_v,
        |    CAST(min(value) AS DOUBLE) AS lo_v, CAST(max(value) AS DOUBLE) AS hi_v
        |  FROM events),
        |vs AS (
        |  SELECT string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS et_vals
        |  FROM events WHERE event_type IS NOT NULL)
        |SELECT 'event_id' AS "column", 'not_null' AS rule, n AS n_rows,
        |  nn_eid AS metric, CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
        |  CAST(NULL AS VARCHAR) AS vals FROM s WHERE n > 0 AND nn_eid = n
        |UNION ALL
        |SELECT 'event_id', 'unique', n, nd_eid, NULL, NULL, NULL
        |FROM s WHERE n > 0 AND nn_eid = n AND nd_eid = n
        |UNION ALL
        |SELECT 'event_id', 'in_range', n, nd_eid, lo_eid, hi_eid, NULL
        |FROM s WHERE nn_eid > 0
        |UNION ALL
        |SELECT 'event_type', 'not_null', n, nn_et, NULL, NULL, NULL
        |FROM s WHERE n > 0 AND nn_et = n
        |UNION ALL
        |SELECT 'event_type', 'unique', n, nd_et, NULL, NULL, NULL
        |FROM s WHERE n > 0 AND nn_et = n AND nd_et = n
        |UNION ALL
        |SELECT 'event_type', 'in_set', n, nd_et, NULL, NULL, (SELECT et_vals FROM vs)
        |FROM s WHERE nd_et BETWEEN 2 AND 8
        |UNION ALL
        |SELECT 'user_id', 'not_null', n, nn_uid, NULL, NULL, NULL
        |FROM s WHERE n > 0 AND nn_uid = n
        |UNION ALL
        |SELECT 'user_id', 'unique', n, nd_uid, NULL, NULL, NULL
        |FROM s WHERE n > 0 AND nn_uid = n AND nd_uid = n
        |UNION ALL
        |SELECT 'user_id', 'in_range', n, nd_uid, lo_uid, hi_uid, NULL
        |FROM s WHERE nn_uid > 0
        |UNION ALL
        |SELECT 'value', 'not_null', n, nn_v, NULL, NULL, NULL
        |FROM s WHERE n > 0 AND nn_v = n
        |UNION ALL
        |SELECT 'value', 'unique', n, nd_v, NULL, NULL, NULL
        |FROM s WHERE n > 0 AND nn_v = n AND nd_v = n
        |UNION ALL
        |SELECT 'value', 'in_range', n, nd_v, lo_v, hi_v, NULL
        |FROM s WHERE nn_v > 0""".stripMargin,

    // q196: the oracle recomputes sessions from scratch over ALL events —
    // the incremental block merge must be indistinguishable from it.
    "q196_session_incremental" ->
      """WITH ev AS (
        |  SELECT user_id, value, epoch_ns(ts) // 1000 AS us FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(us) AS start_us, max(us) AS end_us,
        |  count(*) AS n_events, max(us) - min(us) AS dur_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    // q195: the same two rank-based median selections and the same fixed
    // IEEE comparison — flag-set equality is the whole point.
    "q195_mad_outliers" ->
      """WITH r AS (
        |  SELECT event_type AS grp, value AS v, event_id AS tie FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |m AS (
        |  SELECT grp, v AS med FROM (
        |    SELECT grp, v,
        |      row_number() OVER (PARTITION BY grp ORDER BY v, tie) AS rn,
        |      count(*) OVER (PARTITION BY grp) AS n FROM r)
        |  WHERE rn = (n + 1) // 2),
        |d AS (
        |  SELECT r.grp, r.v, r.tie, m.med, abs(r.v - m.med) AS dev
        |  FROM r JOIN m USING (grp)),
        |md AS (
        |  SELECT grp, dev AS mad FROM (
        |    SELECT grp, dev,
        |      row_number() OVER (PARTITION BY grp ORDER BY dev, tie) AS rn,
        |      count(*) OVER (PARTITION BY grp) AS n FROM d)
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.grp AS event_type, d.tie AS event_id, d.v AS value,
        |  d.med, md.mad, d.dev
        |FROM d JOIN md USING (grp)
        |WHERE d.dev * 1000 > 3000 * md.mad""".stripMargin,

    // q189: the SPEC, not the algorithm — the k-th order statistic at
    // rank (permille·n + 999) // 1000 selected directly; the histogram/
    // bucket machinery is invisible in the answer by design.
    "q189_exact_quantiles" ->
      """WITH v AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |p AS (SELECT unnest([500, 900, 990, 999]) AS permille)
        |SELECT CAST(p.permille AS BIGINT) AS permille, r.v AS value
        |FROM p, n JOIN r
        |  ON r.rn = greatest(1, (p.permille * n.n + 999) // 1000)""".stripMargin,

    // q185: the matchPattern chain restated — running non-click count +
    // ignore-nulls carry of the nearest view's (rn, us, ncu); an end row
    // matches iff ncu-1 equals the view's ncu (everything strictly between
    // is click) within 30 integer-µs minutes.
    "q185_event_pattern" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |r AS (
        |  SELECT *, row_number() OVER w AS rn,
        |    sum(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ncu
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |l AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type = 'view' THEN rn END IGNORE NULLS)
        |      OVER w AS sv_rn,
        |    last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
        |      OVER w AS sv_us,
        |    last_value(CASE WHEN event_type = 'view' THEN ncu END IGNORE NULLS)
        |      OVER w AS sv_ncu
        |  FROM r WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS match_id, sv_us AS start_us,
        |  us AS end_us, CAST(rn - sv_rn - 1 AS BIGINT) AS n_mid
        |FROM l
        |WHERE event_type = 'purchase' AND sv_rn IS NOT NULL
        |  AND ncu - 1 = sv_ncu AND us - sv_us <= 1800000000""".stripMargin,

    "q105_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(us) AS start_us, max(us) AS end_us,
        |  count(*) AS n_events, max(us) - min(us) AS dur_us,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    // q139: the q131 HLL chain with a per-day group over the events table.
    // The DATE cast is timezone-free on both engines (UTC sessions); the
    // linear-counting list is the same Scala-rendered table as q131's.
    "q139_hll_windowed" ->
      s"""WITH h AS (
        |  SELECT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
        |    CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) AS h
        |  FROM events),
        |reg AS (
        |  SELECT day, h % 256 AS j,
        |    max(CASE WHEN h // 256 = 0 THEN 53
        |             ELSE 53 - length(bin(h // 256)) END) AS m_j
        |  FROM h GROUP BY day, h % 256),
        |agg AS (
        |  SELECT day,
        |    sum(1::BIGINT << CAST(53 - m_j AS INT)) AS s_present,
        |    count(*) AS present
        |  FROM reg GROUP BY day),
        |est AS (
        |  SELECT day,
        |    CAST((CAST(718273 AS HUGEINT) * 65536 * (1::HUGEINT << 53))
        |         // ((s_present + (256 - present) * (1::BIGINT << 53))::HUGEINT
        |             * 1000000) AS BIGINT) AS raw_estimate,
        |    CAST(256 - present AS BIGINT) AS zero_registers
        |  FROM agg)
        |SELECT day,
        |  CASE WHEN raw_estimate < 640 AND zero_registers > 0
        |       THEN ([${graft.operators.Sketches.HllLinearCount.mkString(",")}])
        |              [CAST(zero_registers + 1 AS INT)]
        |       ELSE raw_estimate END AS est_distinct,
        |  raw_estimate, zero_registers
        |FROM est""".stripMargin,

    // q134: the interval-union windows restated — a span breaks where an
    // interval's start exceeds the running max of previous ends (equality
    // merges: half-open adjacency).
    "q134_interval_union" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
        |iv AS (SELECT user_id, us, us + 1800000000 AS e FROM ev),
        |marked AS (
        |  SELECT *, CASE WHEN
        |      max(e) OVER pw IS NULL OR us > max(e) OVER pw
        |    THEN 1 ELSE 0 END AS nw
        |  FROM iv WINDOW pw AS (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |sp AS (
        |  SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        |  FROM marked)
        |SELECT user_id, CAST(span_id AS BIGINT) AS span_id,
        |  min(us) AS span_start_us, max(e) AS span_end_us,
        |  count(*) AS n_intervals, max(e) - min(us) AS span_us
        |FROM sp GROUP BY user_id, span_id""".stripMargin,

    // q129: the q105 session CTEs, but end_us restated per session_window's
    // contract (last event + the 30-min gap, exact integer µs).
    "q129_session_window_native" ->
      """WITH ev AS (
        |  SELECT user_id, value, epoch_ns(ts) // 1000 AS us FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, min(us) AS start_us,
        |  max(us) + 1800000000 AS end_us, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    // q181: same md5-derived planar coordinates; DuckDB verifies by
    // brute-force distance filter (the blocking is Spark's optimization,
    // not the semantic), every term exact int64.
    "q181_spatial_radius" ->
      """WITH p AS (
        |  SELECT event_id, event_type,
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 100000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 100000 AS y
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |SELECT c.event_id AS click_id, b.event_id AS purchase_id,
        |  (c.x - b.x) * (c.x - b.x) + (c.y - b.y) * (c.y - b.y) AS dist2
        |FROM p c JOIN p b
        |  ON c.event_type = 'click' AND b.event_type = 'purchase'
        | AND (c.x - b.x) * (c.x - b.x) + (c.y - b.y) * (c.y - b.y) <= 250000
        |""".stripMargin,

    // q182: brute candidates + the same (dist2, id) rank.
    "q182_spatial_nearest" ->
      """WITH p AS (
        |  SELECT event_id, event_type,
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 100000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 100000 AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |cand AS (
        |  SELECT c.event_id AS click_id, b.event_id AS purchase_id,
        |    (c.x - b.x) * (c.x - b.x) + (c.y - b.y) * (c.y - b.y) AS dist2
        |  FROM p c JOIN p b
        |    ON c.event_type = 'click' AND b.event_type = 'purchase'
        |   AND (c.x - b.x) * (c.x - b.x) + (c.y - b.y) * (c.y - b.y) <= 250000)
        |SELECT click_id, purchase_id AS nearest_purchase, dist2 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY click_id
        |    ORDER BY dist2, purchase_id) AS rn
        |  FROM cand)
        |WHERE rn = 1""".stripMargin,

    // q180: variable-end interval union — a session breaks when the event
    // starts at-or-after the RUNNING MAX of previous interval ends (the
    // fixed-gap lag() shortcut is wrong here: a long-gap purchase can hold
    // the session open past several short-gap events).
    "q180_session_dynamic_gap" ->
      """WITH ev AS (
        |  SELECT user_id, value, epoch_ns(ts) // 1000 AS us,
        |    CASE WHEN event_type = 'purchase' THEN 3600000000
        |         ELSE 900000000 END AS gap
        |  FROM events),
        |m AS (
        |  SELECT *, max(us + gap) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM ev),
        |marked AS (
        |  SELECT *, CASE WHEN prev_end IS NULL OR us >= prev_end
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM m),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, min(us) AS start_us, max(us + gap) AS end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "q106_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2 FROM ev e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND us > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(us) AS t3 FROM ev e JOIN s2 USING (user_id)
        |       WHERE event_type = 'click' AND us > t2 GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(us) AS t4 FROM ev e JOIN s3 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t3 GROUP BY 1)
        |SELECT 1 AS stage_idx, 'signup' AS stage, count(*) AS actors FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4""".stripMargin,

    "q107_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |f AS (SELECT user_id, min(ts) AS first_ts FROM ev GROUP BY 1)
        |SELECT CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
        |  CAST(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) // 7
        |       AS INT) AS week_offset,
        |  count(DISTINCT e.user_id) AS active_users
        |FROM ev e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q108_value_histogram" ->
      """WITH st AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
        |SELECT CAST(CASE WHEN hi = lo THEN 0
        |    ELSE least(floor((value - lo) / ((hi - lo) / 20)), 19) END AS INT) AS bucket,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events, st GROUP BY 1""".stripMargin,

    "q109_corpus_shuffle" ->
      """SELECT doc_id, CAST(h % 8 AS INT) AS shard,
        |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
        |FROM (SELECT doc_id,
        |  CAST(('0x' || substr(md5('shuffle:42:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |       AS BIGINT) AS h FROM documents)""".stripMargin,

    "q110_incremental_agg" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day, value
        |  FROM events)
        |SELECT event_type, day, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_value
        |FROM ev GROUP BY 1, 2""".stripMargin,

    "q117_rolling_active" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
        |grid AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY))
        |                     AS DATE) AS day FROM bounds)
        |SELECT g.day, count(DISTINCT e.user_id) AS n_active
        |FROM grid g JOIN ev e ON e.day BETWEEN g.day - 6 AND g.day
        |GROUP BY g.day""".stripMargin,

    "q119_zorder_layout" -> {
      val interleave = (0 until 16).flatMap { i =>
        Seq(s"(((x >> $i) & 1) << ${2 * i})", s"(((y >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" | ")
      s"""WITH b AS (
         |  SELECT CAST(user_id AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |         AS BIGINT) AS y
         |  FROM events),
         |z AS (SELECT x, y, ($interleave) AS zv FROM b)
         |SELECT zv >> 6 AS zcell, count(*) AS n_rows,
         |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY 1""".stripMargin
    },

    // q173: the identical per-level Hilbert fold as a generated CTE chain —
    // each stage masks the remaining low bits (x & (s-1)) before the
    // reflect/transpose, so every intermediate stays in [0, s) on both
    // engines (no signedness to reconcile); xor() is DuckDB's integer XOR.
    "q173_hilbert_layout" -> {
      val bits = 10
      val levels = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
        val s = 1L << i
        val rx = s"((x >> $i) & 1)"
        val ry = s"((y >> $i) & 1)"
        val xm = s"(x & ${s - 1})"
        val ym = s"(y & ${s - 1})"
        s"""h$k AS (SELECT x0, y0,
           |  d + ${s * s} * xor(3 * $rx, $ry) AS d,
           |  CASE WHEN $ry = 0 THEN
           |    CASE WHEN $rx = 1 THEN ${s - 1} - $ym ELSE $ym END
           |  ELSE $xm END AS x,
           |  CASE WHEN $ry = 0 THEN
           |    CASE WHEN $rx = 1 THEN ${s - 1} - $xm ELSE $xm END
           |  ELSE $ym END AS y
           |  FROM h${if (k == 0) "in" else (k - 1).toString})""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (
         |  SELECT CAST(user_id % 1024 AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 1024
         |         AS BIGINT) AS y
         |  FROM events),
         |hin AS (SELECT x AS x0, y AS y0, CAST(0 AS BIGINT) AS d, x, y FROM b),
         |$levels
         |SELECT d >> 8 AS hcell, count(*) AS n_rows,
         |  min(x0) AS min_x, max(x0) AS max_x,
         |  min(y0) AS min_y, max(y0) AS max_y
         |FROM h${bits - 1} GROUP BY 1""".stripMargin
    },

    // q152: the same hour/hundredth quantizations; every sum an exact
    // BIGINT (bounds documented at the operator).
    "q152_trend_stats" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |  CAST(sum(x * x) AS BIGINT) AS sum_xx
        |FROM (
        |  SELECT event_type,
        |    epoch_us(ts) // 3600000000 - 473352 AS x,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL)
        |GROUP BY event_type""".stripMargin,

    // q151: identical hold-duration lead and int64 hundredth-µs integral;
    // the final divide is one IEEE op over two exactly-agreed int64 casts.
    "q151_twap" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id, value FROM events),
        |d AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vh,
        |    lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id)
        |      - us AS dur_us
        |  FROM e)
        |SELECT event_type,
        |  CAST(CAST(sum(vh * dur_us) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(dur_us) AS BIGINT) * 100 AS DOUBLE) AS twap,
        |  count(*) AS n_intervals,
        |  CAST(sum(dur_us) AS BIGINT) AS total_dur_us
        |FROM d WHERE dur_us IS NOT NULL GROUP BY event_type""".stripMargin,

    // q150: identical µs-floor bucketing and mirror-rank endpoint picks.
    "q150_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id, value,
        |    epoch_us(ts) - epoch_us(ts) % 300000000 AS bar_us
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bar_us
        |                       ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY event_type, bar_us
        |                       ORDER BY ts DESC, event_id DESC) AS rdesc
        |  FROM e)
        |SELECT event_type, make_timestamp(bar_us) AS bar_start,
        |  max(CASE WHEN rn = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rdesc = 1 THEN value END) AS close,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM r GROUP BY event_type, bar_us""".stripMargin,

    "q120_ewma" -> {
      val terms = (0 until 8).map { j =>
        val w = java.math.BigDecimal.ONE.divide(
          new java.math.BigDecimal(2).pow(j + 1)).toPlainString
        if (j == 0) s"COALESCE(x, 0) * $w"
        else s"COALESCE(lag(x, $j) OVER w, 0) * $w"
      }.mkString("\n         |  + ")
      s"""WITH ev AS (
         |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
         |    CAST(value AS DECIMAL(18,2)) AS x FROM events)
         |SELECT event_id, user_id,
         |  CAST($terms
         |  AS DOUBLE) AS ewma8
         |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin
    },

    "q124_scd2_intervals" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events)
        |SELECT user_id, event_id, event_type, us AS valid_from_us,
        |  lead(us) OVER w AS valid_to_us,
        |  lead(us) OVER w IS NULL AS is_current
        |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin,

    // q154: identical µs ordering + event_id tie-break; from_total cast to
    // BIGINT (DuckDB window sum widens to HUGEINT) and ppm via `//` to
    // mirror Spark's integer `div`.
    "q154_transition_matrix" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS to_type
        |  FROM ev),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM tr
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
        |  n * 1000000 // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS ppm
        |FROM c""".stripMargin,

    // q161: same µs arithmetic and week truncation as q107; the lower
    // median is the (n+1)//2-th order statistic under (delay, user) order.
    "q161_time_to_convert" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |s AS (SELECT user_id, min(us) AS s_us FROM ev
        |      WHERE event_type = 'signup' GROUP BY 1),
        |d AS (
        |  SELECT p.user_id, s.s_us, min(p.us) AS first_p_us
        |  FROM ev p JOIN s USING (user_id)
        |  WHERE p.event_type = 'purchase' AND p.us >= s.s_us
        |  GROUP BY 1, 2),
        |delay AS (
        |  SELECT CAST(date_trunc('week', make_timestamp(s_us)) AS DATE)
        |      AS cohort_week,
        |    user_id, first_p_us - s_us AS delay_us
        |  FROM d),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY cohort_week
        |      ORDER BY delay_us, user_id) AS rn,
        |    count(*) OVER (PARTITION BY cohort_week) AS n
        |  FROM delay)
        |SELECT cohort_week, CAST(n AS BIGINT) AS n_converted,
        |  delay_us AS median_delay_us
        |FROM rk WHERE rn = (n + 1) // 2""".stripMargin,

    // q158: same µs→date truncation (UTC sessions make the cast
    // timezone-free); generate_series is inclusive on both engines and
    // steps in whole days, so the spines are identical sets.
    "q158_date_spine" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds)
        |SELECT s.event_type, s.day,
        |  CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
        |  coalesce(d.sum_value, 0.0) AS sum_value,
        |  d.n_events IS NULL AS is_gap
        |FROM spine s LEFT JOIN daily d USING (event_type, day)""".stripMargin,

    "q125_winsorize" ->
      """WITH ev AS (
        |  SELECT event_type AS grp, value AS v, event_id AS tie FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY v, tie) AS rn,
        |       count(*) OVER (PARTITION BY grp) AS n FROM ev),
        |b AS (SELECT grp,
        |  max(CASE WHEN rn = (50 * n + 999) // 1000 THEN v END) AS v_lo,
        |  max(CASE WHEN rn = (950 * n + 999) // 1000 THEN v END) AS v_hi
        |  FROM rk GROUP BY 1)
        |SELECT e.grp AS event_type, count(*) AS n,
        |  min(b.v_lo) AS v_lo, min(b.v_hi) AS v_hi,
        |  CAST(sum(CAST(greatest(b.v_lo, least(b.v_hi, e.v)) AS DECIMAL(18,2)))
        |       AS DOUBLE) AS wsum
        |FROM ev e JOIN b USING (grp) GROUP BY 1""".stripMargin,

    "q126_equidepth" ->
      """WITH ev AS (
        |  SELECT value AS v, event_id AS tie FROM events WHERE value IS NOT NULL),
        |rk AS (SELECT v, row_number() OVER (ORDER BY v, tie) AS rank,
        |       count(*) OVER () AS n FROM ev)
        |SELECT CAST(((rank - 1) * 10) // n AS INT) AS bucket, count(*) AS cnt,
        |  min(v) AS min_v, max(v) AS max_v,
        |  CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS vsum
        |FROM rk GROUP BY 1""".stripMargin)
}
