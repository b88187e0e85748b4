package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutAdvisorSpec extends SparkTestBase {

  import spark.implicits._

  private def base = Seq(
    (1L, "click", 10.0, 100L), (2L, "view", 20.0, 100L),
    (3L, "click", 30.0, 200L), (4L, "purchase", 40.0, 200L),
    (5L, "view", 50.0, 300L), (6L, "click", 60.0, 300L),
    (7L, "view", 70.0, 400L), (8L, "click", 80.0, 400L)
  ).toDF("event_id", "event_type", "value", "user_id")

  private def dim = Seq((100L, "a"), (200L, "b")).toDF("k", "tag")

  test("profile classifies eq / range / join hits, one vote per query per column") {
    val b = base
    val wl = Seq(
      b.filter(col("event_type") === "click").agg(count(lit(1))),
      // BETWEEN-ish double conjunct on one column: ONE range vote
      b.filter(col("value") >= 20.0 && col("value") < 70.0).agg(count(lit(1))),
      b.filter(col("event_type").isin("view", "click") && col("event_id") > 3L)
        .agg(count(lit(1))),
      b.join(dim, col("user_id") === col("k")).agg(count(lit(1))))
    val p = LayoutAdvisor.profile(wl, b.schema.fieldNames.toSet)
    assert(p.eqHits === Map("event_type" -> 2L))
    assert(p.rangeHits === Map("value" -> 1L, "event_id" -> 1L))
    assert(p.joinHits === Map("user_id" -> 1L))
  }

  test("advise picks a bounded-NDV partition column, two z-order columns, a bucket key") {
    val b = base
    val wl = Seq(
      b.filter(col("event_type") === "click").agg(count(lit(1))),
      b.filter(col("event_type") === "view").agg(count(lit(1))),
      b.filter(col("value") > 30.0).agg(count(lit(1))),
      b.filter(col("event_id") <= 6L && col("value") < 60.0).agg(count(lit(1))),
      b.join(dim, col("user_id") === col("k")).agg(count(lit(1))))
    val rec = LayoutAdvisor.advise(b, wl, exactNdv = true)
    assert(rec.rows === 8L)
    assert(rec.partitionBy.map(_.column) === Some("event_type"))
    assert(rec.partitionBy.get.ndv === 3L)
    // event_type: 2 hits × (8 − 8/3) = 2 × 6 = 12
    assert(rec.partitionBy.get.score === 12L)
    // value: 2 range hits, ndv 8 → 2 × 7; event_id: 1 hit → 7
    assert(rec.zorderBy.map(p => (p.role, p.column)) ===
      Seq(("zorder1", "value"), ("zorder2", "event_id")))
    assert(rec.bucketBy.map(_.column) === Some("user_id"))
    assert(rec.bucketBy.get.buckets === 8L)
  }

  test("a high-NDV equality column is refused as partition key (small-files guard)") {
    val b = base
    val wl = Seq(b.filter(col("event_id") === 3L).agg(count(lit(1))))
    val rec = LayoutAdvisor.advise(b, wl, maxPartitions = 4L, exactNdv = true)
    // event_id has ndv 8 > 4 — no partition pick rather than a lake of dirs
    assert(rec.partitionBy === None)
  }

  test("bucketCount: smallest power of two for ~1M rows per bucket, clamped [8, 4096]") {
    assert(LayoutAdvisor.bucketCount(1L) === 8L)
    assert(LayoutAdvisor.bucketCount(8000000L) === 8L)
    assert(LayoutAdvisor.bucketCount(9000000L) === 16L)
    assert(LayoutAdvisor.bucketCount(100000000L) === 128L)
    assert(LayoutAdvisor.bucketCount(Long.MaxValue / 4L) === 4096L)
  }

  test("applyTo writes partition directories the equality filter prunes to") {
    val b = base
    val wl = Seq(
      b.filter(col("event_type") === "click").agg(count(lit(1))),
      b.filter(col("event_type") === "view").agg(count(lit(1))),
      b.filter(col("event_id") > 2L).agg(count(lit(1))))
    val rec = LayoutAdvisor.advise(b, wl, exactNdv = true)
    assert(rec.partitionBy.map(_.column) === Some("event_type"))
    val out = tmpDir("layout_apply")
    LayoutAdvisor.applyTo(b, rec, out)
    val filtered = spark.read.parquet(out).filter(col("event_type") === "click")
    // lossless under the filter
    assert(filtered.agg(sum(col("event_id"))).head().getLong(0) === (1L + 3L + 6L + 8L))
    // the scan prunes to the one matching directory: partition filters
    // present in the plan, and only click files are read
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"))
    assert(filtered.select(input_file_name()).distinct().collect()
      .forall(_.getString(0).contains("event_type=click")))
  }

  test("applyTo without a partition pick writes files globally disjoint on the lead cluster column") {
    val many = spark.range(0, 1000).toDF("event_id")
      .withColumn("value", col("event_id").cast("double"))
    val wl = Seq(many.filter(col("event_id") > 500L).agg(count(lit(1))))
    val rec = LayoutAdvisor.advise(many, wl, exactNdv = true)
    assert(rec.partitionBy === None && rec.zorderBy.head.column === "event_id")
    val out = tmpDir("layout_range")
    LayoutAdvisor.applyTo(many, rec, out, clusterPartitions = 4)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1)
    perFile.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._2 < w(1)._1,
        s"file envelopes overlap: ${w.toSeq}") // zone-map layout: no overlap
    }
  }

  test("registered ANALYZE stats advise without touching any data") {
    import graft.sources.{ColumnStats, TableStats}
    // a base whose evaluation ALWAYS fails — only plan analysis may run
    val failing = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1)
        .mapPartitions[org.apache.spark.sql.Row](_ =>
          sys.error("layout advise touched data despite registered stats")),
      base.schema)
    val wl = Seq(
      failing.filter(col("event_type") === "click").agg(count(lit(1))),
      failing.filter(col("value") > 30.0).agg(count(lit(1))),
      failing.join(dim, col("user_id") === col("k")).agg(count(lit(1))))
    val ts = TableStats(1L, 8L, Seq(
      ColumnStats("event_type", 8L, 3L, Some("click"), Some("view")),
      ColumnStats("value", 8L, 8L, Some("10.0"), Some("80.0")),
      ColumnStats("user_id", 8L, 4L, Some("100"), Some("400"))), staleBy = 0L)
    val rec = LayoutAdvisor.advise(failing, wl, stats = Some(ts))
    assert(rec.rows === 8L)
    assert(rec.partitionBy.map(_.column) === Some("event_type"))
    assert(rec.zorderBy.map(_.column) === Seq("value"))
    assert(rec.bucketBy.map(_.column) === Some("user_id"))
    // a hit column missing from the record is refused loudly, not guessed
    val bad = intercept[IllegalArgumentException] {
      LayoutAdvisor.advise(failing, wl, stats = Some(ts.copy(columns = ts.columns.tail)))
    }
    assert(bad.getMessage.contains("event_type"))
  }

  test("a workload with no base-column predicate is refused") {
    val e = intercept[IllegalArgumentException] {
      LayoutAdvisor.advise(base, Seq(base.agg(count(lit(1)))), exactNdv = true)
    }
    assert(e.getMessage.contains("no base column"))
  }
}
