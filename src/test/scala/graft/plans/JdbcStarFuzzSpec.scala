package graft.plans

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import graft.sources.JdbcTableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Randomized multi-batch differential for [[JdbcStarMaintainer]]: six
  * rounds of random fact+dim batches — extreme-biased deletes (forcing
  * min/max repairs), segment moves, overlapping inserts (new fact rows
  * referencing a dim key inserted in the SAME batch), dangling fact
  * rows, occasional empty halves — where after every sync the served
  * rollup must equal the rewrite-off recomputed warehouse join. This is
  * the composition no directed test walks: reconstructed feeds, apply-
  * order pinning, signed merge, repair against live JDBC snapshots, and
  * the serving pause/resume cycle.
  */
class JdbcStarFuzzSpec extends SparkTestBase {
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

  test("six random batches: served rollup equals rewrite-off truth every round") {
    val rnd = new scala.util.Random(101)
    val url = "jdbc:derby:memory:jsfz;create=true"
    var facts: Map[Long, (Long, Long)] = (1L to 90L)
      .map(i => i -> (1L + rnd.nextInt(12).toLong, rnd.nextInt(100).toLong))
      .toMap
    var dims: Map[Long, String] = (1L to 12L)
      .map(c => c -> s"s${c % 4}").toMap
    val fs = new JdbcTableStore(spark, url,
      TableSpec("public.jsfz_f", factSchema, Seq("o_id")))
    val ds = new JdbcTableStore(spark, url,
      TableSpec("public.jsfz_d", dimSchema, Seq("c_cust")))
    fs.init(facts.toSeq.map { case (i, (c, v)) => (i, c, v) }
      .toDF("o_id", "f_cust", "v"))
    ds.init(dims.toSeq.toDF("c_cust", "seg"))
    import StarMv.{QCol, StarMvDef}
    val fk = fs.servingKey; val dk = ds.servingKey
    val mv = StarMv.build(spark, StarMvDef(
      tables = Seq(fk, dk),
      joins = Seq((QCol(fk, "f_cust"), QCol(dk, "c_cust"))),
      groupCols = Seq(QCol(dk, "seg")),
      measureCols = Seq(QCol(fk, "v")),
      summaryPath = tmpDir("jsfz_sum")),
      tableOverrides = Map(fk -> fs.snapshot(), dk -> ds.snapshot()))
    val m = JdbcStarMaintainer.create(spark,
      Map(fk -> fs, dk -> ds), mv, tmpDir("jsfz_root"))
    try {
      var nextKey = 1000L
      var nextDim = 100L
      (1 to 6).foreach { round =>
        // fact batch: extreme-biased deletes + updates + inserts (some
        // referencing a brand-new dim key, some dangling)
        val byV = facts.toSeq.sortBy(-_._2._2)
        val dels = (byV.take(1 + rnd.nextInt(3)).map(_._1) ++
          rnd.shuffle(facts.keys.toList).take(rnd.nextInt(4))).distinct
        val newDim = if (rnd.nextBoolean()) Some(nextDim) else None
        newDim.foreach(_ => nextDim += 1)
        val ups = (0 until rnd.nextInt(6)).map { _ =>
          val key = if (rnd.nextBoolean() && facts.nonEmpty)
            rnd.shuffle(facts.keys.toList).head
          else { nextKey += 1; nextKey }
          val cust = newDim.filter(_ => rnd.nextInt(3) == 0).getOrElse {
            // sometimes dangling (no dim row), mostly live
            if (rnd.nextInt(5) == 0) 9999L
            else 1L + rnd.nextInt(12).toLong
          }
          (key, cust, rnd.nextInt(100).toLong)
        }.groupBy(_._1).map(_._2.head).toSeq // per-key final action
          .filterNot(u => dels.contains(u._1))
        // dim batch: segment moves + the overlapping insert; occasional
        // deletes of dim keys (their fact rows leave the join)
        val moves = rnd.shuffle(dims.keys.toList).take(rnd.nextInt(3))
          .map(c => (c, s"s${rnd.nextInt(5)}_m$round"))
        val dimDels =
          if (rnd.nextInt(3) == 0)
            rnd.shuffle(dims.keys.toList).take(1).filterNot(c =>
              moves.exists(_._1 == c))
          else Nil
        val dimUps = moves ++ newDim.map(c => (c, s"s_new$round")).toSeq
        // apply to the model
        facts = facts -- dels ++ ups.map(u => u._1 -> (u._2, u._3))
        dims = dims -- dimDels ++ dimUps
        val batches = Map(
          fk -> CompactedBatch(dels.toDF("o_id"),
            ups.toDF("o_id", "f_cust", "v")),
          dk -> CompactedBatch(dimDels.toDF("c_cust"),
            dimUps.toDF("c_cust", "seg")))
        m.sync(round.toLong, batches)

        val rollup = fs.snapshot()
          .join(ds.snapshot(), col("f_cust") === col("c_cust"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
            min(col("v")).as("mn"), max(col("v")).as("mx"))
        val truth = facts.values.toSeq
          .flatMap { case (c, v) => dims.get(c).map(s => (s, v)) }
          .groupBy(_._1).map { case (s, rs) =>
            (s, rs.size.toLong, rs.map(_._2).sum, rs.map(_._2).min,
              rs.map(_._2).max) }.toSet
        assert(scanPaths(rollup).forall(_.contains("jsfz_sum")),
          s"round $round must serve from the summary: ${scanPaths(rollup)}")
        assert(rollup.as[(String, Long, Long, Long, Long)].collect().toSet
          === truth, s"round $round diverged from the recomputed join")
      }
    } finally StarMv.unregister(m.definition.summaryPath)
  }
}
