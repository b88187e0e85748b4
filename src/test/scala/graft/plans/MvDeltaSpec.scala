package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Delete-aware MV maintenance ([[MaterializedView.refreshDelta]]): the
  * signed-partial merge for sums/counts, the affected-group min/max repair
  * (the one thing partials cannot maintain under deletes), the emptied-group
  * drop, and the loud failure on deletes the base never had. Every test
  * checks values THROUGH the rewrite — a summary corrupted by maintenance
  * must surface as a wrong query answer, exactly as the driver's oracle
  * would see it.
  */
class MvDeltaSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  /** Base/summary fixture over (g, m1:int, m2:int) rows; returns base path. */
  private def setup(rows: Seq[(String, Int, Int)], tag: String): String = {
    val base = tmpDir(s"mvd_${tag}_base")
    rows.toDF("g", "m1", "m2").write.mode("overwrite").parquet(base)
    MaterializedView.build(spark, base, Seq("g"), Seq("m1", "m2"),
      tmpDir(s"mvd_${tag}_sum"))
    base
  }

  private def rollup(base: String): DataFrame =
    spark.read.parquet(base).groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("m1")).as("s1"),
        count(col("m1")).as("c1"), min(col("m1")).as("mn1"),
        max(col("m2")).as("mx2"))

  test("deleting a group's min forces the repair path and the repair is right") {
    val rows = Seq(("a", 1, 10), ("a", 5, 20), ("a", 9, 30), ("b", 4, 40))
    val base = setup(rows, "min")
    val deletes = Seq(("a", 1, 10)).toDF("g", "m1", "m2")
    val kept = rows.filterNot(_ == (("a", 1, 10)))
    kept.toDF("g", "m1", "m2").write.mode("overwrite").parquet(base)
    val nd = MaterializedView.refreshDelta(spark, base, deletes.limit(0), deletes)
    try {
      val q = spark.read.parquet(base).groupBy("g")
        .agg(min(col("m1")).as("mn"), max(col("m1")).as("mx"),
          sum(col("m1")).as("s"), count(lit(1)).as("n"))
      assert(scanPaths(q).contains(MaterializedView.normalize(nd.summaryPath)))
      assert(q.as[(String, Int, Int, Long, Long)].collect().toSet ==
        Set(("a", 5, 9, 14L, 2L), ("b", 4, 4, 4L, 1L)))
    } finally MaterializedView.unregister(base)
  }

  test("a delete not touching any extreme skips repair and still merges sums") {
    val rows = Seq(("a", 1, 10), ("a", 5, 20), ("a", 9, 30))
    val base = setup(rows, "mid")
    val deletes = Seq(("a", 5, 20)).toDF("g", "m1", "m2")
    rows.filterNot(_ == (("a", 5, 20))).toDF("g", "m1", "m2")
      .write.mode("overwrite").parquet(base)
    MaterializedView.refreshDelta(spark, base, deletes.limit(0), deletes)
    try {
      // m2=20 is interior for m2 too (10..30), so no group is affected:
      // the candidate merge alone must carry min/max AND the subtracted sums
      assert(rollup(base).as[(String, Long, Long, Long, Int, Int)]
        .collect().toSet == Set(("a", 2L, 10L, 2L, 1, 30)))
    } finally MaterializedView.unregister(base)
  }

  test("inserts and deletes in one batch; new groups appear, emptied groups vanish") {
    val rows = Seq(("a", 1, 1), ("a", 2, 2), ("b", 7, 7))
    val base = setup(rows, "both")
    val deletes = Seq(("b", 7, 7)).toDF("g", "m1", "m2") // empties b
    val inserts = Seq(("c", 3, 3), ("a", 0, 9)).toDF("g", "m1", "m2")
    Seq(("a", 1, 1), ("a", 2, 2), ("c", 3, 3), ("a", 0, 9))
      .toDF("g", "m1", "m2").write.mode("overwrite").parquet(base)
    MaterializedView.refreshDelta(spark, base, inserts, deletes)
    try {
      assert(rollup(base).as[(String, Long, Long, Long, Int, Int)]
        .collect().toSet ==
        Set(("a", 3L, 3L, 3L, 0, 9), ("c", 1L, 3L, 1L, 3, 3)))
    } finally MaterializedView.unregister(base)
  }

  test("measure deleted to zero values renders NULL sum/min/max, cnt kept") {
    val base = tmpDir("mvd_null_base")
    val rows = Seq(("a", Some(5), 1), ("a", None, 2), ("a", None, 3))
    rows.toDF("g", "m1", "m2").write.mode("overwrite").parquet(base)
    MaterializedView.build(spark, base, Seq("g"), Seq("m1", "m2"),
      tmpDir("mvd_null_sum"))
    val deletes = Seq(("a", Some(5), 1)).toDF("g", "m1", "m2")
    Seq(("a", None: Option[Int], 2), ("a", None: Option[Int], 3))
      .toDF("g", "m1", "m2").write.mode("overwrite").parquet(base)
    MaterializedView.refreshDelta(spark, base, deletes.limit(0), deletes)
    try {
      val row = spark.read.parquet(base).groupBy("g")
        .agg(count(lit(1)).as("n"), count(col("m1")).as("c1"),
          sum(col("m1")).as("s1"), min(col("m1")).as("mn1"))
        .collect()(0)
      assert(row.getString(0) == "a" && row.getLong(1) == 2L)
      assert(row.getLong(2) == 0L)
      assert(row.isNullAt(3) && row.isNullAt(4),
        s"sum/min must be NULL once every m1 value is deleted: $row")
    } finally MaterializedView.unregister(base)
  }

  test("deleting the extreme of a NULL-keyed group repairs it (null-safe joins)") {
    // NULL is a legal dimension value in CDC bases; equi-joins skip NULL
    // keys, so the affected-detection and repair joins must be null-safe
    val rows = Seq((null.asInstanceOf[String], 1, 10),
      (null.asInstanceOf[String], 5, 20), (null.asInstanceOf[String], 9, 30),
      ("b", 4, 40))
    val base = setup(rows, "nullkey")
    val deletes = Seq((null.asInstanceOf[String], 1, 10)).toDF("g", "m1", "m2")
    rows.filterNot(_ == ((null, 1, 10))).toDF("g", "m1", "m2")
      .write.mode("overwrite").parquet(base)
    val nd = MaterializedView.refreshDelta(spark, base, deletes.limit(0), deletes)
    try {
      val got = spark.read.parquet(nd.summaryPath)
        .select("g", "mn_m1", "mx_m1", "s_m1", "cnt")
        .as[(Option[String], Int, Int, Long, Long)].collect().toSet
      assert(got == Set((None, 5, 9, 14L, 2L), (Some("b"), 4, 4, 4L, 1L)),
        s"NULL-keyed group's min must be repaired, got $got")
    } finally MaterializedView.unregister(base)
  }

  test("count-only MV (no measures) refreshes through deltas") {
    val base = tmpDir("mvd_cntonly_base")
    Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "x")
      .write.mode("overwrite").parquet(base)
    MaterializedView.build(spark, base, Seq("g"), Seq.empty,
      tmpDir("mvd_cntonly_sum"))
    val inserts = Seq(("c", 9), ("a", 7)).toDF("g", "x")
    val deletes = Seq(("b", 3)).toDF("g", "x")
    Seq(("a", 1), ("a", 2), ("c", 9), ("a", 7)).toDF("g", "x")
      .write.mode("overwrite").parquet(base)
    val nd = MaterializedView.refreshDelta(spark, base, inserts, deletes)
    try {
      val got = spark.read.parquet(nd.summaryPath)
        .as[(String, Long)].collect().toSet
      assert(got == Set(("a", 3L), ("c", 1L)), s"got $got")
      // and the rewrite still answers counts from it
      val q = spark.read.parquet(base).groupBy("g").agg(count(lit(1)).as("n"))
      assert(scanPaths(q).contains(MaterializedView.normalize(nd.summaryPath)))
      assert(q.as[(String, Long)].collect().toSet == Set(("a", 3L), ("c", 1L)))
    } finally MaterializedView.unregister(base)
  }

  test("deleting rows the base never had fails loudly, not silently") {
    val base = setup(Seq(("a", 1, 1)), "neg")
    val deletes = Seq(("a", 1, 1), ("a", 2, 2)).toDF("g", "m1", "m2")
    Seq.empty[(String, Int, Int)].toDF("g", "m1", "m2")
      .write.mode("overwrite").parquet(base)
    val before = MaterializedView.lookup(MaterializedView.normalize(base)).get
    try {
      val e = intercept[Exception](
        MaterializedView.refreshDelta(spark, base, deletes.limit(0), deletes))
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("negative count")), s"got: $e")
      // crash posture: a failed refresh must leave the registry (and
      // every future query) on the old consistent version
      assert(MaterializedView.lookup(MaterializedView.normalize(base))
        .contains(before), "failed refresh must not move the registration")
    } finally MaterializedView.unregister(base)
  }

  test("CDC loop: refreshDelta after each store merge keeps the MV at table truth") {
    // the reference's user workflow — REFRESH MATERIALIZED VIEW after each
    // merge interval — composed from this engine's parts: a compacted
    // batch's UPSERTS contribute their PRE-IMAGE rows (bucket-pruned read,
    // cost ∝ batch) as MV deletes plus themselves as inserts; delete
    // tombstones contribute their pre-image only.
    import graft.model.TableSpec
    import graft.operators.CompactedBatch
    import graft.sources.ParquetTableStore
    import org.apache.spark.sql.types._
    val spec = TableSpec("public.mvcdc",
      StructType(Seq(StructField("id", LongType), StructField("g", StringType),
        StructField("m", LongType))), Seq("id"))
    val store = new ParquetTableStore(spark, tmpDir("mvcdc_store"), spec, 4)
    val rnd = new scala.util.Random(59)
    var rows = (1L to 200L).map(i => (i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong))
    store.init(rows.toDF("id", "g", "m"))
    val base = tmpDir("mvcdc_base") // MV registry keys on a parquet path
    store.snapshot().write.mode("overwrite").parquet(base)
    var mv = MaterializedView.build(spark, base, Seq("g"), Seq("m"),
      tmpDir("mvcdc_sum"))
    try {
      (1 to 3).foreach { round =>
        val delIds = rnd.shuffle(rows.map(_._1).toList).take(10)
        val upserts = rnd.shuffle((1L to 210L).toList).take(15)
          .filterNot(delIds.contains)
          .map(i => (i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong))
        val batch = CompactedBatch(delIds.toDF("id"),
          upserts.toDF("id", "g", "m"))
        // pre-image of every touched key BEFORE the merge
        val touched = batch.deletes.select("id")
          .unionByName(batch.upserts.select("id"))
        val preImage = store.snapshotForKeys(touched).localCheckpoint()
        store.merge(batch)
        // keep the MV base path in lockstep with the store's snapshot
        store.snapshot().write.mode("overwrite").parquet(base)
        mv = MaterializedView.refreshDelta(spark, base,
          inserts = batch.upserts, deletes = preImage)
        // the rollup THROUGH the rewrite must equal the table truth
        rows = rows.filterNot(r => delIds.contains(r._1))
          .filterNot(r => upserts.exists(_._1 == r._1)) ++ upserts
        val want = rows.groupBy(_._2).map { case (g, rs) =>
          (g, rs.size.toLong, rs.map(_._3).sum, rs.map(_._3).min, rs.map(_._3).max)
        }.toSet
        val q = spark.read.parquet(base).groupBy("g")
          .agg(count(lit(1)).as("n"), sum(col("m")).as("s"),
            min(col("m")).as("mn"), max(col("m")).as("mx"))
        val scans = q.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
              case _ => Nil
            }
        }.flatten
        assert(scans.forall(_.contains("mvcdc_sum")),
          s"round $round must answer from the refreshed summary: $scans")
        assert(q.as[(String, Long, Long, Long, Long)].collect().toSet == want,
          s"MV drifted from table truth at round $round")
      }
    } finally MaterializedView.unregister(base)
  }

  test("CDC loop via change feed: refreshFromFeed keeps the MV at table truth") {
    // the same loop as above, but the maintenance input is the store's OWN
    // row-valued change feed (changeFeedBetween across the merge's version
    // step) — the consumer never computes pre-images itself and never
    // rescans the base: update_pre/delete rows are the subtraction,
    // update_post/insert rows the addition. The min/max repair scan reads
    // the store's post-batch snapshot through the `base` override.
    import graft.model.TableSpec
    import graft.operators.CompactedBatch
    import graft.sources.ParquetTableStore
    import org.apache.spark.sql.types._
    val spec = TableSpec("public.mvfeed",
      StructType(Seq(StructField("id", LongType), StructField("g", StringType),
        StructField("m", LongType))), Seq("id"))
    val store = new ParquetTableStore(spark, tmpDir("mvfeed_store"), spec, 4,
      retainedVersions = 2)
    val rnd = new scala.util.Random(67)
    var rows = (1L to 200L).map(i => (i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong))
    store.init(rows.toDF("id", "g", "m"))
    val base = tmpDir("mvfeed_base") // MV registry keys on a parquet path
    store.snapshot().write.mode("overwrite").parquet(base)
    MaterializedView.build(spark, base, Seq("g"), Seq("m"),
      tmpDir("mvfeed_sum"))
    try {
      (1 to 3).foreach { round =>
        val delIds = rnd.shuffle(rows.map(_._1).toList).take(10)
        val upserts = rnd.shuffle((1L to 210L).toList).take(15)
          .filterNot(delIds.contains)
          .map(i => (i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong))
        val vBefore = store.currentVersion
        store.merge(CompactedBatch(delIds.toDF("id"),
          upserts.toDF("id", "g", "m")))
        val feed = store.changeFeedBetween(vBefore, store.currentVersion)
        MaterializedView.refreshFromFeed(spark, base, feed,
          base = Some(store.snapshot()))
        store.snapshot().write.mode("overwrite").parquet(base)
        rows = rows.filterNot(r => delIds.contains(r._1))
          .filterNot(r => upserts.exists(_._1 == r._1)) ++ upserts
        val want = rows.groupBy(_._2).map { case (g, rs) =>
          (g, rs.size.toLong, rs.map(_._3).sum, rs.map(_._3).min, rs.map(_._3).max)
        }.toSet
        val q = spark.read.parquet(base).groupBy("g")
          .agg(count(lit(1)).as("n"), sum(col("m")).as("s"),
            min(col("m")).as("mn"), max(col("m")).as("mx"))
        assert(scanPaths(q).forall(_.contains("mvfeed_sum")),
          s"round $round must answer from the refreshed summary")
        assert(q.as[(String, Long, Long, Long, Long)].collect().toSet == want,
          s"feed-maintained MV drifted from table truth at round $round")
      }
    } finally MaterializedView.unregister(base)
  }

  test("refreshFromFeed refuses a frame without _change") {
    val base = setup(Seq(("a", 1, 1)), "feedbad")
    try {
      intercept[IllegalArgumentException] {
        MaterializedView.refreshFromFeed(spark, base,
          Seq(("a", 1, 1)).toDF("g", "m1", "m2"))
      }
    } finally MaterializedView.unregister(base)
  }

  test("differential: random batches equal a from-scratch build, v-path bumps") {
    val rnd = new scala.util.Random(83)
    // ~10% NULL group keys: NULL dimensions are routine in CDC bases and
    // the repair joins must stay null-safe under the full batch mix
    def g(n: Int): String =
      if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(n)}"
    var rows = (1 to 300).map(_ =>
      (g(8), rnd.nextInt(200) - 100, rnd.nextInt(50)))
    val base = tmpDir("mvd_fuzz_base")
    rows.toDF("g", "m1", "m2").write.mode("overwrite").parquet(base)
    var d = MaterializedView.build(spark, base, Seq("g"), Seq("m1", "m2"),
      tmpDir("mvd_fuzz_sum"))
    try {
      (1 to 4).foreach { round =>
        val (del, keep) = rows.partition(_ => rnd.nextInt(100) < 20)
        val ins = (1 to 40).map(_ =>
          (g(10), rnd.nextInt(200) - 100, rnd.nextInt(50)))
        rows = keep ++ ins
        rows.toDF("g", "m1", "m2").write.mode("overwrite").parquet(base)
        d = MaterializedView.refreshDelta(spark, base,
          ins.toDF("g", "m1", "m2"), del.toDF("g", "m1", "m2"))
        assert(d.summaryPath.endsWith(s"_v$round"), d.summaryPath)
        val expect = rows.groupBy(_._1).map { case (g, rs) =>
          (g, rs.size.toLong, rs.map(_._2.toLong).sum, rs.map(_._2).min,
            rs.map(_._3).max)
        }.toSet
        val q = spark.read.parquet(base).groupBy("g")
          .agg(count(lit(1)).as("n"), sum(col("m1")).as("s1"),
            min(col("m1")).as("mn1"), max(col("m2")).as("mx2"))
        assert(scanPaths(q).contains(MaterializedView.normalize(d.summaryPath)))
        assert(q.as[(String, Long, Long, Int, Int)].collect().toSet == expect,
          s"diverged at round $round")
      }
    } finally MaterializedView.unregister(base)
  }
}
