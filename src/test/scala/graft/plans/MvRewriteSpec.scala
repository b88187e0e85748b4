package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** The materialized-view rewrite: plans that MUST reroute to the summary
  * (asserted on the physical scan's path — results alone can't distinguish
  * a fired rewrite from a correct fallback), plans that must NOT, and
  * differential value checks against the unrewritten computation.
  */
class MvRewriteSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def writeBase(rows: Seq[(String, String, Int, Double)]): String = {
    val dir = tmpDir("mv_base")
    rows.toDF("g1", "g2", "m1", "m2").write.mode("overwrite").parquet(dir)
    dir
  }

  /** Relation paths of the OPTIMIZED logical plan — the level the rewrite
    * operates at (and AQE-proof: no physical wrapper to unwrap).
    */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private val rows = Seq(
    ("a", "x", 1, 2.0), ("a", "x", 3, 1.5), ("a", "y", 5, 9.0),
    ("b", "x", 7, -1.0), ("b", "y", 2, 4.0), ("b", "y", 4, 0.5))

  private def withMv[A](rows: Seq[(String, String, Int, Double)])(
      f: (String, String) => A): A = {
    val base = writeBase(rows)
    val summary = tmpDir("mv_sum")
    MaterializedView.build(spark, base, Seq("g1", "g2"), Seq("m1", "m2"), summary)
    try f(base, summary)
    finally MaterializedView.unregister(base)
  }

  test("rollup to a coarser grouping rewrites to the summary and matches") {
    withMv(rows) { (base, summary) =>
      val q = spark.read.parquet(base).groupBy("g1")
        .agg(count(lit(1)).as("n"), sum(col("m1")).as("s1"),
          min(col("m2")).as("mn2"), max(col("m2")).as("mx2"),
          count(col("m2")).as("c2"))
      val paths = scanPaths(q)
      assert(paths.contains(MaterializedView.normalize(summary)), s"scan: $paths")
      assert(!paths.contains(MaterializedView.normalize(base)))
      val got = q.as[(String, Long, Long, Double, Double, Long)].collect().toSet
      assert(got == Set(("a", 3L, 9L, 1.5, 9.0, 3L), ("b", 3L, 13L, -1.0, 4.0, 3L)))
    }
  }

  test("group-column filter replays on the summary; measure filter does not rewrite") {
    withMv(rows) { (base, summary) =>
      val filtered = spark.read.parquet(base).filter(col("g2") === "y")
        .groupBy("g1").agg(sum(col("m1")).as("s1"))
      assert(scanPaths(filtered).contains(MaterializedView.normalize(summary)))
      assert(filtered.as[(String, Long)].collect().toSet ==
        Set(("a", 5L), ("b", 6L)))

      val onMeasure = spark.read.parquet(base).filter(col("m1") > 2)
        .groupBy("g1").agg(sum(col("m1")).as("s1"))
      assert(scanPaths(onMeasure) == Seq(MaterializedView.normalize(base)))
      assert(onMeasure.as[(String, Long)].collect().toSet ==
        Set(("a", 8L), ("b", 11L)))
    }
  }

  test("global aggregate rewrites; count survives an empty summary as 0") {
    withMv(rows) { (base, summary) =>
      val q = spark.read.parquet(base)
        .agg(count(lit(1)).as("n"), sum(col("m1")).as("s1"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)))
      assert(q.as[(Long, Long)].collect().toSeq == Seq((6L, 22L)))
    }
    // empty base → empty summary: count must be 0, sum null
    withMv(Seq.empty) { (base, summary) =>
      val q = spark.read.parquet(writeBaseSchemaOnly(base))
        .agg(count(lit(1)).as("n"), sum(col("m1")).as("s1"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)))
      val row = q.collect()(0)
      assert(row.getLong(0) == 0L && row.isNullAt(1))
    }
  }

  // writing an empty Seq still produces a parquet dir with schema
  private def writeBaseSchemaOnly(base: String): String = base

  test("non-rewritable shapes fall through untouched") {
    withMv(rows) { (base, _) =>
      val basePath = MaterializedView.normalize(base)
      // distinct aggregate
      val q1 = spark.read.parquet(base).groupBy("g1")
        .agg(countDistinct(col("m1")).as("d"))
      assert(scanPaths(q1) == Seq(basePath))
      // grouping by an expression OF GROUP COLUMNS is a valid coarsening
      // and now rewrites (values checked below); an expression touching a
      // MEASURE in grouping position must still fall through
      val q2m = spark.read.parquet(base).groupBy((col("m1") % 2).as("parity"))
        .agg(sum(col("m2")).as("s2"))
      assert(scanPaths(q2m) == Seq(basePath))
      // aggregate over an uncovered expression (mixes a measure)
      val q3 = spark.read.parquet(base).groupBy("g1")
        .agg(sum(col("m1") + 1).as("s1"))
      assert(scanPaths(q3) == Seq(basePath))
      // avg with DISTINCT has no summary answer
      val q4 = spark.read.parquet(base).groupBy("g1")
        .agg(expr("avg(DISTINCT m1)").as("a1"))
      assert(scanPaths(q4) == Seq(basePath))
      // TRY-mode aggregates: overflow-to-null points depend on per-row
      // accumulation, which the summary's pre-summed partials erase
      val q4t = spark.read.parquet(base).groupBy("g1")
        .agg(expr("try_sum(m1)").as("s1"), expr("try_avg(m2)").as("a2"))
      assert(scanPaths(q4t) == Seq(basePath))
      // a non-deterministic filter references no attributes at all, but
      // applying it per SUMMARY row would sample whole groups instead of
      // base rows — must fall through (a trivially-true rand() < 2.0 is
      // constant-folded away by the optimizer before our rule, so use a
      // bound that survives)
      val q5 = spark.read.parquet(base).filter(rand(7) < lit(0.5))
        .groupBy("g1").agg(sum(col("m1")).as("s1"))
      assert(scanPaths(q5) == Seq(basePath),
        "rand() filter must refuse the rewrite")
      // all still CORRECT, just unaccelerated
      assert(q1.as[(String, Long)].collect().toSet == Set(("a", 3L), ("b", 3L)))
    }
  }

  test("grouping by an expression of group columns rewrites as a coarsening") {
    withMv(rows) { (base, summary) =>
      val q = spark.read.parquet(base).groupBy(upper(col("g1")).as("gu"))
        .agg(sum(col("m1")).as("s1"), min(col("m2")).as("mn2"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)),
        s"f(group col) grouping must reroute: ${scanPaths(q)}")
      assert(q.as[(String, Long, Double)].collect().toSet ==
        Set(("A", 9L, 1.5), ("B", 13L, -1.0)))
    }
  }

  test("COUNT(DISTINCT group col) rewrites exactly; over a measure it refuses") {
    withMv(rows) { (base, summary) =>
      val q = spark.read.parquet(base).groupBy("g1")
        .agg(countDistinct(col("g2")).as("d2"), sum(col("m1")).as("s1"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)),
        s"distinct over a group column must reroute: ${scanPaths(q)}")
      assert(q.as[(String, Long, Long)].collect().toSet ==
        Set(("a", 2L, 9L), ("b", 2L, 13L)))
      val qm = spark.read.parquet(base).groupBy("g1")
        .agg(countDistinct(col("m1")).as("dm"))
      assert(scanPaths(qm) == Seq(MaterializedView.normalize(base)),
        "distinct over a measure has no summary answer")
    }
  }

  test("avg over a measure rewrites to sum-of-sums over sum-of-counts") {
    withMv(rows) { (base, summary) =>
      val q = spark.read.parquet(base).groupBy("g1")
        .agg(avg(col("m1")).as("a1"), avg(col("m2")).as("a2"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)),
        s"avg must reroute: ${scanPaths(q)}")
      val direct = rows.groupBy(_._1).map { case (g, rs) =>
        (g, rs.map(_._3).sum.toDouble / rs.size, rs.map(_._4).sum / rs.size)
      }.toSet
      assert(q.as[(String, Double, Double)].collect().toSet == direct)
      // global avg over the summary too
      val g = spark.read.parquet(base).agg(avg(col("m1")).as("a"))
      assert(scanPaths(g).contains(MaterializedView.normalize(summary)))
      assert(g.as[Double].collect().toSeq ==
        Seq(rows.map(_._3).sum.toDouble / rows.size))
    }
  }

  test("avg over a decimal measure matches the base bit-exactly") {
    val dir = tmpDir("mv_dec_base")
    val sumDir = tmpDir("mv_dec_sum")
    spark.sql(
      """SELECT g, CAST(v AS DECIMAL(12,2)) AS m FROM VALUES
        |('a', 1.25), ('a', 2.10), ('a', 0.01), ('b', -3.33), ('b', 7.77)
        |AS t(g, v)""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    MaterializedView.build(spark, dir, Seq("g"), Seq("m"), sumDir)
    try {
      val q = spark.read.parquet(dir).groupBy("g").agg(avg(col("m")).as("a"))
      assert(scanPaths(q).contains(MaterializedView.normalize(sumDir)))
      spark.conf.set("spark.graft.mv.enabled", "false")
      val direct =
        try spark.read.parquet(dir).groupBy("g").agg(avg(col("m")).as("a"))
          .as[(String, java.math.BigDecimal)].collect().toSet
        finally spark.conf.unset("spark.graft.mv.enabled")
      assert(q.as[(String, java.math.BigDecimal)].collect().toSet == direct)
      // same type out of both plans (decimal(16,6) per Average's widening)
      assert(q.schema("a").dataType.simpleString == "decimal(16,6)")
    } finally MaterializedView.unregister(dir)
  }

  test("sum/count/avg over a group expression weight by cnt") {
    // g2 length is an integral function of a group column; weighting by the
    // summary's cnt must reproduce base-row semantics exactly
    val data = rows ++ Seq(("c", null.asInstanceOf[String], 5, 1.0))
    withMv(data) { (base, summary) =>
      val q = spark.read.parquet(base).groupBy("g1")
        .agg(sum(length(col("g2"))).as("s"),
          count(col("g2")).as("c"),
          avg(length(col("g2"))).as("a"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)),
        s"group-expr aggregates must reroute: ${scanPaths(q)}")
      val direct = data.groupBy(_._1).map { case (g, rs) =>
        val lens = rs.flatMap(r => Option(r._2)).map(_.length)
        (g, if (lens.isEmpty) null else lens.sum.toLong,
          lens.size.toLong,
          if (lens.isEmpty) null else lens.sum.toDouble / lens.size)
      }.toSet
      assert(q.collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet == direct)
    }
  }

  test("HAVING composes: the filter above the rewritten aggregate stays attached") {
    withMv(rows) { (base, summary) =>
      // Filter(Aggregate) references the aggregate's outputs by exprId —
      // the rewrite preserves output ids, so HAVING must survive intact
      val q = spark.read.parquet(base).groupBy("g1")
        .agg(sum(col("m1")).as("s1"), count(lit(1)).as("n"))
        .filter(col("s1") > 10)
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)),
        s"HAVING rollup must reroute: ${scanPaths(q)}")
      assert(q.as[(String, Long, Long)].collect().toSet == Set(("b", 13L, 3L)))
    }
  }

  test("kill switch and unregister both disable the rewrite") {
    withMv(rows) { (base, summary) =>
      val q = () => spark.read.parquet(base).groupBy("g1").agg(sum(col("m1")).as("s"))
      assert(scanPaths(q()).contains(MaterializedView.normalize(summary)))
      spark.conf.set("spark.graft.mv.enabled", "false")
      try assert(scanPaths(q()) == Seq(MaterializedView.normalize(base)))
      finally spark.conf.unset("spark.graft.mv.enabled")
      MaterializedView.unregister(base)
      assert(scanPaths(q()) == Seq(MaterializedView.normalize(base)))
    }
  }

  test("differential: rewritten rollups equal direct computation on random data") {
    val rnd = new scala.util.Random(19)
    val data = (1 to 400).map(_ => (s"g${rnd.nextInt(7)}", s"h${rnd.nextInt(5)}",
      rnd.nextInt(100) - 50, rnd.nextDouble() * 10 - 5))
    withMv(data) { (base, summary) =>
      val grouped = spark.read.parquet(base).groupBy("g1", "g2")
        .agg(sum(col("m1")).as("s1"), count(lit(1)).as("n"),
          min(col("m1")).as("mn"), max(col("m2")).as("mx"))
      assert(scanPaths(grouped).contains(MaterializedView.normalize(summary)))
      val expect = data.groupBy(r => (r._1, r._2)).map { case ((g1, g2), rs) =>
        (g1, g2, rs.map(_._3.toLong).sum, rs.size.toLong,
          rs.map(_._3).min.toLong, rs.map(_._4).max)
      }.toSet
      assert(grouped.as[(String, String, Long, Long, Long, Double)]
        .collect().toSet == expect)
    }
  }

  test("refresh folds an insert delta: new groups appear, partials add, version bumps") {
    val base = writeBase(rows)
    val summary = tmpDir("mv_sum")
    val d0 = MaterializedView.build(spark, base,
      Seq("g1", "g2"), Seq("m1", "m2"), summary)
    val delta = Seq(("a", "x", 10, 20.0), ("c", "z", 1, -9.0))
      .toDF("g1", "g2", "m1", "m2")
    delta.write.mode("append").parquet(base)
    val d1 = MaterializedView.refresh(spark, base, delta)
    assert(d1.summaryPath == s"${d0.summaryPath}_v1")
    val d2 = MaterializedView.refresh(spark, base,
      Seq(("c", "z", 2, 0.0)).toDF("g1", "g2", "m1", "m2"))
    assert(d2.summaryPath == s"${d0.summaryPath}_v2")
    Seq(("c", "z", 2, 0.0)).toDF("g1", "g2", "m1", "m2")
      .write.mode("append").parquet(base)
    val q = spark.read.parquet(base).groupBy("g1")
      .agg(sum(col("m1")).as("s"), count(lit(1)).as("n"),
        min(col("m2")).as("mn"), max(col("m2")).as("mx"))
    try {
      assert(scanPaths(q).contains(MaterializedView.normalize(d2.summaryPath)))
      assert(q.as[(String, Long, Long, Double, Double)].collect().toSet == Set(
        ("a", 19L, 4L, 1.5, 20.0), ("b", 13L, 3L, -1.0, 4.0),
        ("c", 3L, 2L, -9.0, 0.0)))
    } finally MaterializedView.unregister(base)
  }

  test("refresh without a registration fails loudly") {
    intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, tmpDir("mv_none"),
        Seq(("a", "x", 1, 1.0)).toDF("g1", "g2", "m1", "m2")))
  }

  test("build unregisters first: a rebuild never reads its own stale summary") {
    val base = writeBase(rows)
    val summary = tmpDir("mv_sum")
    MaterializedView.build(spark, base, Seq("g1"), Seq("m1"), summary)
    // base changes; rebuild must rescan the BASE, not the stale summary
    Seq(("a", "x", 100, 0.0)).toDF("g1", "g2", "m1", "m2")
      .write.mode("overwrite").parquet(base)
    MaterializedView.build(spark, base, Seq("g1"), Seq("m1"), summary)
    val q = spark.read.parquet(base).groupBy("g1").agg(sum(col("m1")).as("s"))
    try assert(q.as[(String, Long)].collect().toSet == Set(("a", 100L)))
    finally MaterializedView.unregister(base)
  }
}
