package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed cases + partition invariance for the event-analytics
  * operators (Sessionize, Funnel, IncrementalAgg) and the deterministic
  * corpus shuffle.
  */
class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  // ── Sessionize ──────────────────────────────────────────────────────────

  test("sessionize: 30-min gap splits sessions, boundary gap starts a new one") {
    // user 1: 0, 10, 40 (gap 30 == boundary → NEW), 41
    // user 2: 5 alone
    val df = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(40)), (1L, ts(41)),
      (2L, ts(5)))
      .toDF("user_id", "ts")
    val got = Sessionize.assign(df, "user_id", "ts", gapSeconds = 1800)
      .select("user_id", "ts", "session_id")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(got === Set(
      (1L, ts(0), 1L), (1L, ts(10), 1L), (1L, ts(40), 2L), (1L, ts(41), 2L),
      (2L, ts(5), 1L)))
  }

  test("sessionize: session stats aggregate the right members") {
    val df = Seq(
      (1L, ts(0), "view", 1.0), (1L, ts(10), "purchase", 2.0),
      (1L, ts(100), "view", 4.0))
      .toDF("user_id", "ts", "event_type", "value")
    val rows = Sessionize.sessions(df, "user_id", "ts", gapSeconds = 1800,
      extras = Seq(count(when(col("event_type") === "purchase", 1)).as("np")))
      .orderBy("session_id")
      .select("session_id", "start_us", "end_us", "n_events", "dur_us", "np")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows === Array(
      (1L, 0L, 10L * 60000000L, 2L, 10L * 60000000L, 1L),
      (2L, 100L * 60000000L, 100L * 60000000L, 1L, 0L, 0L)))
  }

  test("intervalUnion: overlap and half-open adjacency merge; a coverage lapse splits") {
    // 10-min intervals. user 1: 0 and 5 overlap; 10 is ADJACENT to [5,15)
    // (start == running max end → merge); 30 starts after coverage lapsed
    // at 20 → new span. user 2: one interval.
    val df = Seq(
      (1L, ts(0)), (1L, ts(5)), (1L, ts(10)), (1L, ts(30)),
      (2L, ts(7)))
      .toDF("user_id", "ts")
    val got = Sessionize.intervalUnion(df, "user_id", "ts", lengthSeconds = 600)
      .select("user_id", "span_id", "span_start_us", "span_end_us", "n_intervals", "span_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    def us(min: Long) = min * 60000000L
    assert(got === Set(
      (1L, 1L, us(0), us(20), 3L, us(20)),
      (1L, 2L, us(30), us(40), 1L, us(10)),
      (2L, 1L, us(7), us(17), 1L, us(10))))
  }

  test("intervalUnion: an interval nested inside a longer running span never splits it") {
    // [0,10) then [2,12) then [4,14): each start is inside the running
    // coverage even though it exceeds the PREVIOUS ROW's start — the
    // running-MAX-end rule (not lag) is what keeps this one span
    val df = Seq((1L, ts(0)), (1L, ts(2)), (1L, ts(4))).toDF("user_id", "ts")
    val got = Sessionize.intervalUnion(df, "user_id", "ts", lengthSeconds = 600)
      .select("span_id", "n_intervals").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L)))
  }

  test("intervalUnion: result is partition-count invariant") {
    val df = (1 to 200).map(i => ((i % 7).toLong, ts(i * 3L))).toDF("user_id", "ts")
    def run(parts: Int) =
      Sessionize.intervalUnion(df.repartition(parts), "user_id", "ts", 600)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(1) == run(13))
  }

  test("sessionize: result is partition-count invariant") {
    val df = (1 to 400).map(i => ((i % 7).toLong, ts(i * 17 % 500))).toDF("user_id", "ts")
    val a = Sessionize.assign(df.repartition(1), "user_id", "ts", 600)
      .select("user_id", "ts", "session_id").collect().toSet
    val b = Sessionize.assign(df.repartition(13), "user_id", "ts", 600)
      .select("user_id", "ts", "session_id").collect().toSet
    assert(a === b)
  }

  // ── Funnel ──────────────────────────────────────────────────────────────

  private val stages = Seq("signup", "view", "click")

  test("funnel: strictly-ordered stages; out-of-order events never count") {
    val df = Seq(
      // A completes everything in order
      (1L, ts(1), "signup"), (1L, ts(2), "view"), (1L, ts(3), "click"),
      // B views BEFORE signing up — view must not count; stage 1 only
      (2L, ts(5), "view"), (2L, ts(6), "signup"),
      // C never signs up — enters no stage
      (3L, ts(1), "view"), (3L, ts(2), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.counts(df, "user_id", "ts", "event_type", stages)
      .select("stage_idx", "stage", "actors")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got === Array((1, "signup", 2L), (2, "view", 1L), (3, "click", 1L)))
  }

  test("funnel: a simultaneous (same-ts) next stage does not count") {
    val df = Seq((1L, ts(1), "signup"), (1L, ts(1), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.counts(df, "user_id", "ts", "event_type", Seq("signup", "view"))
      .select("stage_idx", "actors").as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 1L, 2 -> 0L))
  }

  test("funnel: stageTimes picks the EARLIEST valid hit per stage") {
    val df = Seq(
      (1L, ts(10), "signup"), (1L, ts(2), "signup"),
      (1L, ts(5), "view"), (1L, ts(20), "view"))
      .toDF("user_id", "ts", "event_type")
    val row = Funnel.stageTimes(df, "user_id", "ts", "event_type", Seq("signup", "view"))
      .select("t1", "t2").as[(Long, Long)].collect().head
    // earliest signup is t=2; earliest view after it is t=5 (not 20)
    assert(row === ((2L * 60000000L, 5L * 60000000L)))
  }

  test("funnel: duplicate stage names are rejected") {
    val df = Seq((1L, ts(1), "a")).toDF("user_id", "ts", "event_type")
    val e = intercept[IllegalArgumentException](
      Funnel.counts(df, "user_id", "ts", "event_type", Seq("a", "a")))
    assert(e.getMessage.contains("duplicate stage"))
  }

  // ── IncrementalAgg ──────────────────────────────────────────────────────

  test("incremental state+merge+finish equals a one-shot aggregate, any split") {
    val rows = (1 to 300).map(i => (s"k${i % 5}", i * 0.17))
    val df = rows.toDF("k", "v")
    val oneShot = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(28,2)")).cast("double").as("sum_v"),
        (sum(col("v").cast("decimal(28,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_v"))
      .as[(String, Long, Double, Double)].collect().toSet
    for (splitAt <- Seq(0, 100, 300)) {
      val (a, b) = rows.splitAt(splitAt)
      val merged = IncrementalAgg.merge(Seq(
        IncrementalAgg.state(a.toDF("k", "v"), Seq("k"), Seq("v")),
        IncrementalAgg.state(b.toDF("k", "v"), Seq("k"), Seq("v"))), Seq("k"))
      val got = IncrementalAgg.finish(merged, Seq("k"), Seq("v"))
        .as[(String, Long, Double, Double)].collect().toSet
      assert(got === oneShot, s"splitAt=$splitAt")
    }
  }

  test("incremental merge keeps keys present in only one state and is associative") {
    val s1 = IncrementalAgg.state(Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val s2 = IncrementalAgg.state(Seq(("b", 2.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val s3 = IncrementalAgg.state(Seq(("a", 3.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val flat = IncrementalAgg.merge(Seq(s1, s2, s3), Seq("k"))
    val nested = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(Seq(s1, s2), Seq("k")), s3), Seq("k"))
    val render = (st: org.apache.spark.sql.DataFrame) =>
      IncrementalAgg.finish(st, Seq("k"), Seq("v"))
        .as[(String, Long, Double, Double)].collect().toSet
    assert(render(flat) === Set(("a", 2L, 4.0, 2.0), ("b", 1L, 2.0, 2.0)))
    assert(render(flat) === render(nested))
  }

  test("incremental merge rejects frames that are not states") {
    val notState = Seq(("a", 1.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      IncrementalAgg.merge(Seq(notState), Seq("k")))
    assert(e.getMessage.contains("not an IncrementalAgg state"))
  }

  // ── shuffleShards ───────────────────────────────────────────────────────

  test("shuffleShards: dense 1-based pos per shard, deterministic, seed-sensitive") {
    val df = (1 to 200).map(_.toLong).toDF("doc_id")
    val a = Sharding.shuffleShards(df, "doc_id", shards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    // every shard's positions are exactly 1..n
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.length).toArray, s"shard $shard")
    }
    val b = Sharding.shuffleShards(df.repartition(7), "doc_id", shards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(a.toSet === b.toSet, "partition-count invariant")
    val other = Sharding.shuffleShards(df, "doc_id", shards = 4, seed = 7L)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(a.toSet !== other.toSet, "a different seed must reshuffle")
  }

  test("shuffleShards fails loudly on null keys and reserved column names") {
    val nullKey = Seq(Some(1L), None).toDF("doc_id")
    val e = intercept[Exception](
      Sharding.shuffleShards(nullKey, "doc_id", shards = 2).collect())
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("; ")
    assert(chain(e).contains("null"), s"expected the null-key guard, got: ${chain(e)}")
    val collides = Seq((1L, 9)).toDF("doc_id", "pos")
    val e2 = intercept[IllegalArgumentException](
      Sharding.shuffleShards(collides, "doc_id", shards = 2))
    assert(e2.getMessage.contains("'pos'"))
  }

  test("sessionize fails loudly on a null timestamp") {
    val df = Seq((1L, Some(ts(0))), (1L, None)).toDF("user_id", "ts")
    val e = intercept[Exception](
      Sessionize.assign(df, "user_id", "ts", 1800).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("; ")
    assert(msgs.contains("null"), s"expected the null-ts guard, got: $msgs")
  }

  // ── matchPattern ────────────────────────────────────────────────────────

  private def patternDf(rows: (Long, Long, Long, String)*) =
    rows.map { case (u, id, min, ty) => (u, id, ts(min), ty) }
      .toDF("user_id", "event_id", "ts", "event_type")

  private def matches(df: org.apache.spark.sql.DataFrame) =
    Funnel.matchPattern(df, "user_id", "ts", "event_id", "event_type",
      "view", Seq("click"), "purchase", maxSpanUs = 30L * 60000000L)
      .select("match_id", "n_mid")
      .as[(Long, Long)].collect().toMap

  test("matchPattern: view click* purchase matches with 0 and 2 mids") {
    val df = patternDf(
      (1L, 1L, 0L, "view"), (1L, 2L, 5L, "purchase"), // direct: n_mid=0
      (2L, 3L, 0L, "view"), (2L, 4L, 1L, "click"), (2L, 5L, 2L, "click"),
      (2L, 6L, 3L, "purchase")) // through clicks: n_mid=2
    assert(matches(df) == Map(2L -> 0L, 6L -> 2L))
  }

  test("matchPattern: an interleaved non-mid event kills the match (vs funnel)") {
    val df = patternDf(
      (1L, 1L, 0L, "view"), (1L, 2L, 1L, "signup"), (1L, 3L, 2L, "purchase"))
    assert(matches(df).isEmpty)
    // the FUNNEL over the same rows does count it — the operators differ
    // exactly on contiguity
    val funnel = Funnel.stageTimes(df, "user_id", "ts", "event_type",
      Seq("view", "purchase")).where(col("t2").isNotNull).count()
    assert(funnel == 1L)
  }

  test("matchPattern: span bound is inclusive; one µs over fails") {
    val base = Seq((1L, 1L, ts(0), "view"),
      (2L, 3L, ts(0), "view")).toDF("user_id", "event_id", "ts", "event_type")
    val ends = Seq(
      (1L, 2L, new java.sql.Timestamp(30L * 60000L), "purchase"), // == bound
      (2L, 4L, new java.sql.Timestamp(30L * 60000L + 1L), "purchase")) // over
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(matches(base.unionByName(ends)) == Map(2L -> 0L))
  }

  test("matchPattern: nearest view wins; an intervening purchase resets") {
    val df = patternDf(
      // v(1) c p(4): second purchase p(5) sees p(4) as non-mid → no match
      (1L, 1L, 0L, "view"), (1L, 2L, 1L, "click"), (1L, 4L, 2L, "purchase"),
      (1L, 5L, 3L, "purchase"),
      // two views: purchase pairs with the NEARER view id=7 (n_mid=0)
      (2L, 6L, 0L, "view"), (2L, 7L, 1L, "view"), (2L, 8L, 2L, "purchase"))
    val got = Funnel.matchPattern(df, "user_id", "ts", "event_id",
      "event_type", "view", Seq("click"), "purchase", 30L * 60000000L)
      .select("match_id", "start_us", "n_mid")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((4L, 0L, 1L), (8L, 60000000L, 0L)))
  }

  test("matchPattern: purchase with no prior view never matches; guards fire") {
    assert(matches(patternDf((1L, 1L, 0L, "purchase"))).isEmpty)
    intercept[IllegalArgumentException](
      Funnel.matchPattern(patternDf(), "user_id", "ts", "event_id",
        "event_type", "view", Seq("view"), "purchase", 1L))
    intercept[IllegalArgumentException](
      Funnel.matchPattern(patternDf(), "user_id", "ts", "event_id",
        "event_type", "view", Seq("click"), "view", 1L))
  }

  test("matchPattern: result is partition-count invariant") {
    val rnd = new scala.util.Random(11)
    val types = Array("view", "click", "purchase", "signup")
    val rows = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(200).toLong,
        types(rnd.nextInt(4))))
    val one = matches(patternDf(rows: _*).repartition(1))
    val many = matches(patternDf(rows: _*).repartition(13))
    assert(one == many && one.nonEmpty)
  }

  // ── mergeSessions ──────────────────────────────────────────────────────

  private def sessOf(df: org.apache.spark.sql.DataFrame) =
    Sessionize.sessions(df, "user_id", "ts", gapSeconds = 1800,
      extras = Seq(sum(col("v").cast("decimal(18,2)")).as("sv")))

  private def mergedVsFull(hist: Seq[(Long, java.sql.Timestamp, Double)],
      delta: Seq[(Long, java.sql.Timestamp, Double)]): Unit = {
    val histDf = hist.toDF("user_id", "ts", "v")
    val deltaDf = delta.toDF("user_id", "ts", "v")
    val full = sessOf(histDf.unionByName(deltaDf))
      .select("user_id", "session_id", "start_us", "end_us", "n_events",
        "dur_us", "sv")
      .as[(Long, Long, Long, Long, Long, Long, BigDecimal)].collect().toSet
    val inc = Sessionize.mergeSessions(sessOf(histDf), deltaDf,
      "user_id", "ts", gapSeconds = 1800,
      sumCols = Map("sv" -> col("v").cast("decimal(18,2)")))
      .select("user_id", "session_id", "start_us", "end_us", "n_events",
        "dur_us", "sv")
      .as[(Long, Long, Long, Long, Long, Long, BigDecimal)].collect().toSet
    assert(inc == full, s"incremental diverged\nfull: $full\ninc: $inc")
  }

  test("mergeSessions: a late event BRIDGES two stored sessions into one") {
    // stored: [0,10] and [50,60] (gap 40 min >= 30 splits); late 25 and 35
    // chain 10→25 (15'), 25→35 (10'), 35→50 (15') — all < 30 → ONE session
    mergedVsFull(
      hist = Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(50), 3.0),
        (1L, ts(60), 4.0)),
      delta = Seq((1L, ts(25), 5.0), (1L, ts(35), 6.0)))
  }

  test("mergeSessions: inside-interval and at-gap-boundary deltas") {
    // event inside a stored interval merges; an event exactly 30 min after
    // a session end starts a NEW session (>= rule), as in a full recompute
    mergedVsFull(
      hist = Seq((1L, ts(0), 1.0), (1L, ts(20), 2.0)),
      delta = Seq((1L, ts(10), 3.0), (1L, ts(50), 4.0)))
  }

  test("mergeSessions: new actors appear; untouched actors pass through") {
    mergedVsFull(
      hist = Seq((1L, ts(0), 1.0), (2L, ts(5), 2.0), (2L, ts(15), 2.5)),
      delta = Seq((3L, ts(7), 9.0), (1L, ts(12), 1.5)))
  }

  test("mergeSessions: five chained micro-batches stay equal to full recompute") {
    // the session-store maintenance loop: each batch folds into the store
    // produced by the previous merge — drift would compound, so equality
    // is checked after EVERY batch
    val rnd = new scala.util.Random(41)
    val batches = (0 until 5).map { b =>
      (1 to 120).map(_ => (rnd.nextInt(8).toLong,
        ts((b * 500 + rnd.nextInt(700)).toLong), rnd.nextInt(50) / 10.0))
    }
    var store = sessOf(batches(0).toDF("user_id", "ts", "v"))
    var seen = batches(0)
    batches.drop(1).foreach { batch =>
      store = Sessionize.mergeSessions(store, batch.toDF("user_id", "ts", "v"),
        "user_id", "ts", gapSeconds = 1800,
        sumCols = Map("sv" -> col("v").cast("decimal(18,2)")))
      seen = seen ++ batch
      val full = sessOf(seen.toDF("user_id", "ts", "v"))
        .select("user_id", "session_id", "start_us", "end_us", "n_events",
          "dur_us", "sv")
        .as[(Long, Long, Long, Long, Long, Long, BigDecimal)].collect().toSet
      val inc = store
        .select("user_id", "session_id", "start_us", "end_us", "n_events",
          "dur_us", "sv")
        .as[(Long, Long, Long, Long, Long, Long, BigDecimal)].collect().toSet
      assert(inc == full, s"drift after folding a batch")
    }
  }

  test("mergeSessions: randomized differential vs full recompute") {
    val rnd = new scala.util.Random(23)
    val all = (1 to 600).map(_ => (rnd.nextInt(12).toLong,
      ts(rnd.nextInt(3000).toLong), rnd.nextInt(100) / 10.0))
    // time-based split plus some straggler late events in the delta
    val cut = 2000L * 60000L
    val (hist, late) = all.partition(_._2.getTime < cut)
    val stragglers = (1 to 40).map(_ => (rnd.nextInt(12).toLong,
      ts(rnd.nextInt(3000).toLong), 1.0))
    mergedVsFull(hist, late ++ stragglers)
  }
}
