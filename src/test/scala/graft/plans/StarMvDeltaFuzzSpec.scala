package graft.plans

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Differential fuzz for STAR incremental refresh
  * ([[StarMv.refreshTableDelta]]): eight rounds of random CDC batches on
  * the fact — inserts with fresh values, deletes restating live rows
  * (extremes included with certainty over the walk) — against a
  * three-way-nullable schema (group flag, measure, day timestamp all go
  * null). After every round, rollups by each group dimension (including
  * the DERIVED day) must serve from the refreshed summary and match the
  * rewrite-disabled truth exactly. This walks the signed-partial merge,
  * the null-safe affected-set detection, the min/max repair scan, the
  * derived-group delta joins, and the lossless partner guard (all insert
  * keys reference the verified dimension) in combination — the
  * composition no directed test covers.
  */
class StarMvDeltaFuzzSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  import StarMv.{QCol, StarMvDef}

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private type FactRow = (String, Long, Integer, Timestamp)

  test("random fact deltas: refreshed summary == rewrite-off truth, 8 rounds") {
    val rnd = new scala.util.Random(61)
    val t0 = Timestamp.valueOf("2024-07-01 00:00:00").getTime
    def randRow(): FactRow = (
      if (rnd.nextInt(8) == 0) null else s"f${rnd.nextInt(3)}",
      rnd.nextInt(8).toLong + 1,
      if (rnd.nextInt(8) == 0) null
      else java.lang.Integer.valueOf(rnd.nextInt(400) - 200),
      if (rnd.nextInt(10) == 0) null
      else new Timestamp(t0 + rnd.nextInt(6) * 86400000L +
        rnd.nextInt(86400) * 1000L))

    var facts: Seq[FactRow] = (1 to 400).map(_ => randRow())
    val dims = (1L to 8L).map(k => (k, if (k == 5) null else s"s${k % 3}"))

    val (f, m, s0) = (tmpDir("sdf_fact"), tmpDir("sdf_dim"), tmpDir("sdf_sum"))
    def writeFacts(): Unit = facts.toDF("f_flag", "f_m", "v1", "ts")
      .write.mode("overwrite").parquet(f)
    writeFacts()
    dims.toDF("m_k", "seg").write.mode("overwrite").parquet(m)
    var d = StarMv.build(spark, StarMvDef(
      tables = Seq(f, m),
      joins = Seq((QCol(f, "f_m"), QCol(m, "m_k"))),
      groupCols = Seq(QCol(f, "f_flag"), QCol(m, "seg")),
      measureCols = Seq(QCol(f, "v1")),
      summaryPath = s0,
      losslessTables = Seq(m),
      derivedGroups = Seq("day" -> "cast(ts as date)")))

    def checkShapes(round: Int): Unit = {
      val shapes: Seq[DataFrame => DataFrame] = Seq(
        _.groupBy("f_flag", "seg").agg(count(lit(1)).as("n"),
          sum(col("v1")).as("sv"), min(col("v1")).as("mnv"),
          max(col("v1")).as("mxv"), avg(col("v1")).as("av")),
        _.groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"), sum(col("v1")).as("sv"),
            max(col("v1")).as("mxv")),
        _.groupBy("seg").agg(count(col("v1")).as("cv"),
          min(col("v1")).as("mnv")))
      shapes.zipWithIndex.foreach { case (shape, i) =>
        def q = shape(spark.read.parquet(f)
          .join(spark.read.parquet(m), col("f_m") === col("m_k")))
        val on = q
        assert(scanPaths(on) == Seq(MaterializedView.normalize(d.summaryPath)),
          s"round $round shape $i must serve from the refreshed summary: " +
            s"${scanPaths(on)}")
        val onRows = on.collect().map(_.toString).toSet
        spark.conf.set("spark.graft.mv.enabled", "false")
        val offRows = try q.collect().map(_.toString).toSet
          finally spark.conf.set("spark.graft.mv.enabled", "true")
        assert(onRows === offRows, s"round $round shape $i diverged")
      }
    }

    try {
      checkShapes(0)
      (1 to 8).foreach { round =>
        // deletes restate live rows (the CDC delete image); biased toward
        // extremes by sampling from the sorted tail/head every other round
        val byV = facts.sortBy(r => Option(r._3).map(_.toInt).getOrElse(0))
        val delPool = if (round % 2 == 0) byV.take(30) ++ byV.takeRight(30)
          else rnd.shuffle(facts.toList).take(40)
        val deletes = delPool.distinct.take(20 + rnd.nextInt(20))
        val inserts = (1 to 10 + rnd.nextInt(25)).map(_ => randRow())
        facts = {
          // bag semantics: remove ONE occurrence per delete image
          val remaining = scala.collection.mutable.ArrayBuffer(facts: _*)
          deletes.foreach { r =>
            val i = remaining.indexOf(r); if (i >= 0) remaining.remove(i)
          }
          remaining.toSeq ++ inserts
        }
        writeFacts() // the batch lands FIRST (refresh reads the post state)
        d = StarMv.refreshTableDelta(spark, d, f,
          inserts = inserts.toDF("f_flag", "f_m", "v1", "ts"),
          deletes = deletes.toDF("f_flag", "f_m", "v1", "ts"))
        checkShapes(round)
      }
    } finally StarMv.unregister(d.summaryPath)
  }
}
