package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Star-schema MV rewrite ([[StarMv]]): aggregate-over-join queries that
  * MUST reroute to the pre-joined summary (asserted on the optimized plan's
  * scan paths), the refusal matrix (different join shape, uncovered
  * columns, outer joins), and differential value checks registry-on vs
  * registry-off.
  */
class StarMvSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  // fact(f_cust, f_item, f_qty, f_price) ⋈ cust(c_id, c_region)
  //                                      ⋈ item(i_id, i_cat)
  private val rnd = new scala.util.Random(17)
  private val custRows = (1 to 8).map(i => (i.toLong, s"r${i % 3}"))
  private val itemRows = (1 to 6).map(i => (i.toLong, s"cat${i % 2}"))
  // unique price per row → unique tuples, so bag-delete tests can remove
  // exactly one row by value
  private val factRows = (1 to 300).map { idx =>
    (rnd.nextInt(8).toLong + 1, rnd.nextInt(6).toLong + 1,
      rnd.nextInt(20) + 1, (100 + idx).toLong)
  }

  private def setup(tag: String): (String, String, String, String) = {
    val (f, c, i, s) = (tmpDir(s"star_${tag}_fact"), tmpDir(s"star_${tag}_cust"),
      tmpDir(s"star_${tag}_item"), tmpDir(s"star_${tag}_sum"))
    factRows.toDF("f_cust", "f_item", "f_qty", "f_price")
      .write.mode("overwrite").parquet(f)
    custRows.toDF("c_id", "c_region").write.mode("overwrite").parquet(c)
    itemRows.toDF("i_id", "i_cat").write.mode("overwrite").parquet(i)
    (f, c, i, s)
  }

  import StarMv.{QCol, StarMvDef}

  private def defFor(f: String, c: String, i: String, s: String) = StarMvDef(
    tables = Seq(f, c, i),
    joins = Seq((QCol(f, "f_cust"), QCol(c, "c_id")),
      (QCol(f, "f_item"), QCol(i, "i_id"))),
    groupCols = Seq(QCol(c, "c_region"), QCol(i, "i_cat")),
    measureCols = Seq(QCol(f, "f_qty")),
    summaryPath = s,
    derivedMeasures = Seq("rev" -> "f_qty * f_price"))

  private def joined(f: String, c: String, i: String): DataFrame =
    spark.read.parquet(f)
      .join(spark.read.parquet(c), col("f_cust") === col("c_id"))
      .join(spark.read.parquet(i), col("f_item") === col("i_id"))

  test("star rollup reroutes to the summary; values equal the direct join") {
    val (f, c, i, s) = setup("basic")
    StarMv.build(spark, defFor(f, c, i, s))
    try {
      val q = joined(f, c, i)
        .groupBy("c_region", "i_cat")
        .agg(count(lit(1)).as("n"), sum(col("f_qty")).as("sq"),
          min(col("f_qty")).as("mnq"), max(col("f_qty")).as("mxq"),
          sum(col("f_qty") * col("f_price")).as("srev"))
      val paths = scanPaths(q)
      assert(paths == Seq(MaterializedView.normalize(s)),
        s"must scan ONLY the summary: $paths")
      val want = factRows.map { case (fc, fi, q0, p) =>
        (custRows(fc.toInt - 1)._2, itemRows(fi.toInt - 1)._2, q0, p) }
        .groupBy(r => (r._1, r._2)).map { case ((r1, r2), rs) =>
          (r1, r2, rs.size.toLong, rs.map(_._3.toLong).sum,
            rs.map(_._3).min, rs.map(_._3).max, rs.map(x => x._3 * x._4).sum)
        }.toSet
      assert(q.as[(String, String, Long, Long, Int, Int, Long)]
        .collect().toSet == want)
    } finally StarMv.unregister(s)
  }

  test("coarsening to one dim attr + filter on a group column replays on summary") {
    val (f, c, i, s) = setup("coarse")
    StarMv.build(spark, defFor(f, c, i, s))
    try {
      val q = joined(f, c, i)
        .filter(col("i_cat") === "cat1")
        .groupBy("c_region")
        .agg(sum(col("f_qty")).as("sq"), count(lit(1)).as("n"))
      assert(scanPaths(q) == Seq(MaterializedView.normalize(s)))
      val want = factRows
        .map { case (fc, fi, q0, p) =>
          (custRows(fc.toInt - 1)._2, itemRows(fi.toInt - 1)._2, q0) }
        .filter(_._2 == "cat1")
        .groupBy(_._1).map { case (r, rs) =>
          (r, rs.map(_._3.toLong).sum, rs.size.toLong) }.toSet
      assert(q.as[(String, Long, Long)].collect().toSet == want)
    } finally StarMv.unregister(s)
  }

  test("refusal matrix: different shapes fall through to the base join") {
    val (f, c, i, s) = setup("refuse")
    StarMv.build(spark, defFor(f, c, i, s))
    try {
      def baseOnly(q: DataFrame): Boolean =
        !scanPaths(q).contains(MaterializedView.normalize(s))
      // missing table: fact ⋈ cust only
      assert(baseOnly(spark.read.parquet(f)
        .join(spark.read.parquet(c), col("f_cust") === col("c_id"))
        .groupBy("c_region").agg(sum(col("f_qty")).as("sq"))))
      // different join key
      assert(baseOnly(spark.read.parquet(f)
        .join(spark.read.parquet(c), col("f_item") === col("c_id"))
        .join(spark.read.parquet(i), col("f_item") === col("i_id"))
        .groupBy("c_region").agg(sum(col("f_qty")).as("sq"))))
      // outer join
      assert(baseOnly(spark.read.parquet(f)
        .join(spark.read.parquet(c), col("f_cust") === col("c_id"), "left")
        .join(spark.read.parquet(i), col("f_item") === col("i_id"))
        .groupBy("c_region").agg(sum(col("f_qty")).as("sq"))))
      // filter on a non-group fact column
      assert(baseOnly(joined(f, c, i).filter(col("f_price") > 500)
        .groupBy("c_region").agg(sum(col("f_qty")).as("sq"))))
      // aggregate over an uncovered expression
      assert(baseOnly(joined(f, c, i)
        .groupBy("c_region").agg(sum(col("f_qty") + 1).as("sq"))))
      // avg over an UNCOVERED column (f_price is neither measure nor group)
      assert(baseOnly(joined(f, c, i)
        .groupBy("c_region").agg(avg(col("f_price")).as("ap"))))
      // measure in grouping position
      assert(baseOnly(joined(f, c, i)
        .groupBy("f_qty").agg(count(lit(1)).as("n"))))
    } finally StarMv.unregister(s)
  }

  test("avg over a plain and a derived measure reroutes and matches the join") {
    val (f, c, i, s) = setup("avg")
    StarMv.build(spark, defFor(f, c, i, s))
    try {
      val q = joined(f, c, i)
        .groupBy("c_region")
        .agg(avg(col("f_qty")).as("aq"),
          avg(col("f_qty") * col("f_price")).as("arev"))
      assert(scanPaths(q) == Seq(MaterializedView.normalize(s)),
        s"avg must reroute: ${scanPaths(q)}")
      val want = factRows
        .map { case (fc, _, q0, p) => (custRows(fc.toInt - 1)._2, q0, p) }
        .groupBy(_._1).map { case (r, rs) =>
          (r, rs.map(_._2).sum.toDouble / rs.size,
            rs.map(x => x._2 * x._3).sum.toDouble / rs.size) }.toSet
      assert(q.as[(String, Double, Double)].collect().toSet == want)
    } finally StarMv.unregister(s)
  }

  test("cycle pair (q73's two-key supplier shape) matches and filters equalities") {
    // fact ⋈ cust on f_cust=c_id, ⋈ item on BOTH f_item=i_id and a cycle
    // pair c_id = i_id (contrived but exercises the both-sides-connected
    // path: the build applies it as a post-join filter)
    val (f, c, i, s) = setup("cycle")
    val d = StarMvDef(
      tables = Seq(f, c, i),
      joins = Seq((QCol(f, "f_cust"), QCol(c, "c_id")),
        (QCol(f, "f_item"), QCol(i, "i_id")),
        (QCol(c, "c_id"), QCol(i, "i_id"))),
      groupCols = Seq(QCol(c, "c_region")),
      measureCols = Seq(QCol(f, "f_qty")),
      summaryPath = s)
    StarMv.build(spark, d)
    try {
      val q = spark.read.parquet(f)
        .join(spark.read.parquet(c), col("f_cust") === col("c_id"))
        .join(spark.read.parquet(i),
          col("f_item") === col("i_id") && col("c_id") === col("i_id"))
        .groupBy("c_region").agg(sum(col("f_qty")).as("sq"))
      assert(scanPaths(q) == Seq(MaterializedView.normalize(s)))
      val want = factRows.filter { case (fc, fi, _, _) => fc == fi }
        .map { case (fc, _, q0, _) => (custRows(fc.toInt - 1)._2, q0.toLong) }
        .groupBy(_._1).map { case (r, rs) => (r, rs.map(_._2).sum) }.toSet
      assert(q.as[(String, Long)].collect().toSet == want)
    } finally StarMv.unregister(s)
  }

  test("differential fuzz: registry on vs off never changes a result") {
    val (f, c, i, s) = setup("fuzz")
    StarMv.build(spark, defFor(f, c, i, s))
    try {
      val shapes: Seq[DataFrame => DataFrame] = Seq(
        _.groupBy("c_region").agg(sum(col("f_qty")).as("a"),
          count(lit(1)).as("b")),
        _.groupBy("i_cat").agg(min(col("f_qty")).as("a"),
          max(col("f_qty")).as("b")),
        _.filter(col("c_region") =!= "r0").groupBy("i_cat")
          .agg(sum(col("f_qty") * col("f_price")).as("a")),
        _.groupBy(upper(col("c_region")).as("g"))
          .agg(count(col("f_qty")).as("a")),
        _.agg(sum(col("f_qty")).as("a"), countDistinct(col("c_region")).as("b")),
        _.groupBy("c_region", "i_cat").agg(max(col("f_qty")).as("a")))
      shapes.zipWithIndex.foreach { case (shape, idx) =>
        val on = shape(joined(f, c, i)).collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.enabled", "false")
        val off = try shape(joined(f, c, i)).collect().map(_.toString).sorted
          finally spark.conf.set("spark.graft.mv.enabled", "true")
        assert(on.sameElements(off), s"shape $idx diverged:\n on=${on.toSeq}\noff=${off.toSeq}")
      }
    } finally StarMv.unregister(s)
  }

  test("q210: the TPC-H star rollup reroutes to the summary, values unchanged") {
    val run = graft.queries.RelationalQueries.queries("q210_star_mv")
    val q = run(spark, "/root/testdata/sf0.001")
    val paths = scanPaths(q)
    assert(paths.nonEmpty && paths.forall(_.contains("starmv_")),
      s"q210 must scan ONLY the pre-joined summary: $paths")
    val on = q.collect().map(_.toString).sorted.toSeq
    assert(on.nonEmpty)
    spark.conf.set("spark.graft.mv.enabled", "false")
    val off = try run(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.graft.mv.enabled", "true")
    assert(on == off, s"rewrite changed q210's values:\n on=$on\noff=$off")
  }

  test("rebuild after a base mutation: versioned swap, fresh values, no self-capture") {
    val (f, c, i, s) = setup("rebuild")
    var d = StarMv.build(spark, defFor(f, c, i, s))
    try {
      // mutate the fact: append rows for customer 1 / item 1
      Seq((1L, 1L, 100, 10L)).toDF("f_cust", "f_item", "f_qty", "f_price")
        .write.mode("append").parquet(f)
      d = StarMv.rebuild(spark, d)
      assert(d.summaryPath == s"${s}_v1", d.summaryPath)
      val q = joined(f, c, i).groupBy("c_region")
        .agg(sum(col("f_qty")).as("sq"), max(col("f_qty")).as("mx"))
      assert(scanPaths(q) == Seq(MaterializedView.normalize(d.summaryPath)),
        "post-rebuild queries must reroute to the NEW version")
      // the appended row must be in the rerouted answer — a rebuild that
      // read its own stale summary would miss it
      val got = q.as[(String, Long, Int)].collect()
        .map { case (k, v, m) => k -> (v, m) }.toMap
      val want = (factRows :+ (1L, 1L, 100, 10L))
        .groupBy { case (fc, _, _, _) => custRows(fc.toInt - 1)._2 }
        .map { case (r, rs) => r -> (rs.map(_._3.toLong).sum, rs.map(_._3).max) }
      assert(got == want)
      d = StarMv.rebuild(spark, d)
      assert(d.summaryPath == s"${s}_v2", d.summaryPath)
    } finally StarMv.unregister(d.summaryPath)
  }

  test("refreshTableDelta on the fact: partials fold, deleted extremes repair") {
    val (f, c, i, s) = setup("tdelta")
    // build over 80% of the fact; the rest arrives as the CDC batch
    val (tail, head) = factRows.zipWithIndex.partition(_._2 % 5 == 0)
    val headRows = head.map(_._1)
    val tailRows = tail.map(_._1)
    headRows.toDF("f_cust", "f_item", "f_qty", "f_price")
      .write.mode("overwrite").parquet(f)
    var d = StarMv.build(spark, defFor(f, c, i, s))
    // the batch: insert the tail AND delete each region's current max-qty
    // row (forces the min/max repair path)
    val byRegion = headRows.groupBy { case (fc, _, _, _) =>
      custRows(fc.toInt - 1)._2 }
    val delRows = byRegion.values.map(_.maxBy(_._3)).toSeq
    val newFact = headRows.filterNot(delRows.contains) ++ tailRows
    newFact.toDF("f_cust", "f_item", "f_qty", "f_price")
      .write.mode("overwrite").parquet(f) // the batch lands in the fact
    d = StarMv.refreshTableDelta(spark, d, f,
      inserts = tailRows.toDF("f_cust", "f_item", "f_qty", "f_price"),
      deletes = delRows.toDF("f_cust", "f_item", "f_qty", "f_price"))
    assert(d.summaryPath.endsWith("_v1"), d.summaryPath)
    try {
      val q = joined(f, c, i).groupBy("c_region")
        .agg(count(lit(1)).as("n"), sum(col("f_qty")).as("sq"),
          min(col("f_qty")).as("mnq"), max(col("f_qty")).as("mxq"),
          sum(col("f_qty") * col("f_price")).as("srev"))
      assert(scanPaths(q) == Seq(MaterializedView.normalize(d.summaryPath)),
        "post-refresh queries must reroute to the new version")
      val want = newFact
        .map { case (fc, fi, q0, p) => (custRows(fc.toInt - 1)._2, q0, p) }
        .groupBy(_._1).map { case (r, rs) =>
          (r, rs.size.toLong, rs.map(_._2.toLong).sum, rs.map(_._2).min,
            rs.map(_._2).max, rs.map(x => x._2 * x._3).sum) }.toSet
      assert(q.as[(String, Long, Long, Int, Int, Long)].collect().toSet == want,
        "refreshed summary diverged from the post-batch join")
    } finally StarMv.unregister(d.summaryPath)
  }

  test("refreshTableDelta on a DIMENSION: deleting a customer drops its join rows") {
    val (fp, c, i, s) = setup("ddelta")
    var d = StarMv.build(spark, defFor(fp, c, i, s))
    // customer 3 leaves; its fact rows fall out of the join entirely
    val gone = custRows(2)
    custRows.filterNot(_ == gone).toDF("c_id", "c_region")
      .write.mode("overwrite").parquet(c)
    d = StarMv.refreshTableDelta(spark, d, c,
      inserts = Seq.empty[(Long, String)].toDF("c_id", "c_region"),
      deletes = Seq(gone).toDF("c_id", "c_region"))
    try {
      val q = joined(fp, c, i).groupBy("c_region", "i_cat")
        .agg(sum(col("f_qty")).as("sq"), count(lit(1)).as("n"),
          max(col("f_qty")).as("mx"))
      assert(scanPaths(q) == Seq(MaterializedView.normalize(d.summaryPath)))
      val want = factRows.filter(_._1 != gone._1)
        .map { case (fc, fi, q0, _) =>
          (custRows(fc.toInt - 1)._2, itemRows(fi.toInt - 1)._2, q0) }
        .groupBy(r => (r._1, r._2)).map { case ((r1, r2), rs) =>
          (r1, r2, rs.map(_._3.toLong).sum, rs.size.toLong, rs.map(_._3).max)
        }.toSet
      assert(q.as[(String, String, Long, Long, Int)].collect().toSet == want)
    } finally StarMv.unregister(d.summaryPath)
  }

  test("build refuses non-unique registered names and disconnected graphs") {
    val (f, c, i, s) = setup("req")
    intercept[IllegalArgumentException] {
      StarMv.build(spark, StarMvDef(Seq(f, c), Seq((QCol(f, "f_cust"), QCol(c, "c_id"))),
        Seq(QCol(c, "c_region"), QCol(c, "c_region")), Nil, s))
    }
    intercept[IllegalArgumentException] {
      StarMv.build(spark, StarMvDef(Seq(f, c, i),
        Seq((QCol(f, "f_cust"), QCol(c, "c_id"))), // item never connected
        Seq(QCol(c, "c_region")), Seq(QCol(f, "f_qty")), s))
    }
  }
}
