package graft.plans

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import graft.sources.MorTableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Randomized multi-round differential for the MOR serving grammar
  * ([[StoreResolvePlan]] + [[StarMv]] Expand path): random fact+dim
  * deltas over merge-on-read stores — extreme-biased deletes, segment
  * moves, overlapping inserts, auto-compaction folding stacks mid-run —
  * and after every sync a RANDOM rollup shape (flat / partial grain /
  * ROLLUP / CUBE over the maintained grain) must (a) serve from the
  * summary and (b) equal the rewrite-off recomputation over the live
  * newest-wins resolution. This fuzzes the composition the directed
  * StarMvMorSpec cases pin one at a time: the Union/Window grammar, the
  * stacked-dir placement guard, pure-rename Project acceptance under
  * Expand, and the exact-dir-set staleness handshake across compactions.
  */
class StarMvMorFuzzSpec extends SparkTestBase {

  import spark.implicits._

  MaterializedView.install(spark)

  private val factSchema = StructType(Seq(
    StructField("o_id", LongType), StructField("f_cust", LongType),
    StructField("v", LongType)))
  private val dimSchema = StructType(Seq(
    StructField("c_cust", LongType), StructField("seg", StringType)))

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten

  test("eight random MOR delta rounds x random rollup shapes equal rewrite-off truth") {
    val rnd = new scala.util.Random(211)
    var facts: Map[Long, (Long, Long)] = (1L to 100L)
      .map(i => i -> (1L + rnd.nextInt(10).toLong, rnd.nextInt(100).toLong))
      .toMap
    var dims: Map[Long, String] = (1L to 10L).map(c => c -> s"s${c % 4}").toMap
    // low compact threshold: stacks fold mid-fuzz, exercising the dir-set
    // handshake and flat-vs-stacked branch placement round over round
    val fs = new MorTableStore(spark, tmpDir("morfz_fs"),
      TableSpec("public.morfz_f", factSchema, Seq("o_id")), 4,
      compactThreshold = 3)
    val ds = new MorTableStore(spark, tmpDir("morfz_ds"),
      TableSpec("public.morfz_d", dimSchema, Seq("c_cust")), 4,
      compactThreshold = 3)
    fs.init(facts.toSeq.map { case (i, (c, v)) => (i, c, v) }
      .toDF("o_id", "f_cust", "v"))
    ds.init(dims.toSeq.toDF("c_cust", "seg"))
    val factKey = tmpDir("morfz_fkey")
    val dimKey = tmpDir("morfz_dkey")
    fs.snapshot().write.mode("overwrite").parquet(factKey)
    ds.snapshot().write.mode("overwrite").parquet(dimKey)
    import StarMv.{QCol, StarMvDef}
    // TWO-column grain (one from each table) so ROLLUP/CUBE shapes have a
    // real lattice to expand over
    val mv = StarMv.build(spark, StarMvDef(
      tables = Seq(factKey, dimKey),
      joins = Seq((QCol(factKey, "f_cust"), QCol(dimKey, "c_cust"))),
      groupCols = Seq(QCol(dimKey, "seg"), QCol(factKey, "f_cust")),
      measureCols = Seq(QCol(factKey, "v")),
      summaryPath = tmpDir("morfz_sum")))
    val m = StarMvMaintainer.create(spark,
      Map(factKey -> fs, dimKey -> ds), mv, tmpDir("morfz_state") + "/s")
    try {
      var nextKey = 1000L
      (1 to 8).foreach { round =>
        // fact delta: extreme-biased deletes + overwrites + inserts
        val byV = facts.toSeq.sortBy(-_._2._2)
        val dels = (byV.take(1 + rnd.nextInt(3)).map(_._1) ++
          rnd.shuffle(facts.keys.toList).take(rnd.nextInt(4))).distinct
        val ups = (0 until rnd.nextInt(7)).map { _ =>
          val key = if (rnd.nextBoolean() && facts.nonEmpty)
            rnd.shuffle(facts.keys.toList).head
          else { nextKey += 1; nextKey }
          (key, 1L + rnd.nextInt(10).toLong, rnd.nextInt(100).toLong)
        }.groupBy(_._1).map(_._2.head).toSeq
          .filterNot(u => dels.contains(u._1))
        facts = facts -- dels ++ ups.map(u => u._1 -> (u._2, u._3))
        fs.merge(CompactedBatch(dels.toDF("o_id"),
          ups.toDF("o_id", "f_cust", "v")))
        // dim delta every other round: segment moves
        if (rnd.nextBoolean()) {
          val moves = rnd.shuffle(dims.keys.toList).take(1 + rnd.nextInt(2))
            .map(c => (c, s"s${rnd.nextInt(5)}_m$round"))
          dims = dims ++ moves
          ds.merge(CompactedBatch(Seq.empty[Long].toDF("c_cust"),
            moves.toDF("c_cust", "seg")))
        }
        m.sync()

        def base: DataFrame = fs.snapshot()
          .join(ds.snapshot(), col("f_cust") === col("c_cust"))
        val aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        // pin the round's shape, then build FRESH DataFrames per probe —
        // a DataFrame caches its queryExecution, so the rewrite-off truth
        // below needs a new plan, not a re-collect of the served one
        val shapeIdx = rnd.nextInt(4)
        // Column-arg overloads for rollup/cube, NOT the String ones: the
        // String overloads resolve via Dataset.col (dataset-id-tagged
        // refs), and Spark's DetectAmbiguousSelfJoin false-positives on
        // tagged refs over any multi-Dataset-composed child plan — the
        // MOR snapshot's resolution union included. An upstream quirk,
        // documented on MorTableStore.snapshot.
        def q: DataFrame = shapeIdx match {
          case 0 => base.groupBy("seg").agg(aggs.head, aggs.tail: _*)
          case 1 => base.groupBy("seg", "f_cust").agg(aggs.head, aggs.tail: _*)
          case 2 => base.rollup(col("seg"), col("f_cust"))
            .agg(aggs.head, aggs.tail: _*)
          case _ => base.cube(col("seg"), col("f_cust"))
            .agg(aggs.head, aggs.tail: _*)
        }
        val served = q
        val paths = scanPaths(served)
        assert(paths.nonEmpty && paths.forall(_.contains("morfz_sum")),
          s"round $round shape $shapeIdx must serve from the summary: $paths")
        val got = served.collect().toSet
        spark.conf.set("spark.graft.mv.enabled", "false")
        val want = try q.collect().toSet
          finally spark.conf.set("spark.graft.mv.enabled", "true")
        assert(got === want,
          s"round $round shape $shapeIdx diverged from rewrite-off truth")
      }
    } finally StarMv.unregister(m.definition.summaryPath)
  }
}
