package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Differential fuzz for the STAR-MV rewrite over JOIN shapes — the star
  * lift of [[MvRewriteFuzzSpec]]. Random queries over a chain star
  * (fact ⋈ mid ⋈ outer, both extensions verified lossless) must produce
  * IDENTICAL results with the rewrite on and off, across:
  *
  *   - retained subsets: the full join, the fact ⋈ mid sub-join, and the
  *     bare fact (lossless peeling);
  *   - grouping modes: plain GROUP BY, ROLLUP, CUBE (the Expand path),
  *     including the global aggregate and grouping() indicators;
  *   - NULL group keys in every dimension (the r8 NULL-repair regression
  *     class) and NULL measure values (c_m vs cnt distinctions);
  *   - rewritable and non-rewritable aggregates/filters mixed — the rule
  *     must accelerate the former and leave the latter byte-identical.
  *
  * Everything goes through SQL because vanilla Spark rejects Dataset-API
  * rollup/cube over a join (DetectAmbiguousSelfJoin). The spec also
  * asserts the rewrite actually FIRED on a healthy fraction of shapes,
  * separately for sub-join shapes, so the fuzz can't pass by never firing.
  */
class StarMvFuzzSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  import StarMv.{QCol, StarMvDef}

  private def snap(df: DataFrame): Set[String] =
    df.collect().map { row =>
      (0 until row.length).map { i =>
        row.get(i) match {
          case d: Double => f"$d%.9f"
          case other => String.valueOf(other)
        }
      }.mkString("|")
    }.toSet

  private def usesSummary(df: DataFrame, marker: String): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains(marker))
        case _ => false
      }
    }.exists(identity)

  test("random star shapes: rewrite on vs off never diverges") {
    val rnd = new scala.util.Random(313)
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
    // join KEYS stay non-null/unique (the verified lossless contract);
    // GROUP columns and measures go null freely; ts feeds the derived
    // day group (null sometimes — day groups must survive null days)
    val factRows = (1 to 800).map { _ =>
      (if (rnd.nextInt(10) == 0) null else s"f${rnd.nextInt(4)}",
        rnd.nextInt(12).toLong + 1,
        if (rnd.nextInt(10) == 0) null
        else java.lang.Integer.valueOf(rnd.nextInt(1000) - 500),
        (rnd.nextInt(900) - 450).toDouble,
        if (rnd.nextInt(12) == 0) null
        else new java.sql.Timestamp(t0 + rnd.nextInt(10) * 86400000L +
          rnd.nextInt(86400) * 1000L))
    }
    val midRows = (1 to 12).map(m => (m.toLong, (m % 4).toLong + 1,
      if (m % 5 == 0) null else s"s${m % 3}"))
    val outerRows = (1 to 4).map(o => (o.toLong,
      if (o == 3) null else s"r${o % 2}"))
    val (f, m, o, s) = (tmpDir("ssfz_fact"), tmpDir("ssfz_mid"),
      tmpDir("ssfz_outer"), tmpDir("ssfz_sum"))
    factRows.toDF("f_flag", "f_m", "v1", "v2", "ts")
      .write.mode("overwrite").parquet(f)
    midRows.toDF("m_k", "m_o", "seg").write.mode("overwrite").parquet(m)
    outerRows.toDF("o_k", "region").write.mode("overwrite").parquet(o)
    spark.read.parquet(f).createOrReplaceTempView("ssfz_fact")
    spark.read.parquet(m).createOrReplaceTempView("ssfz_mid")
    spark.read.parquet(o).createOrReplaceTempView("ssfz_outer")

    // retained subset -> (FROM clause, available group exprs). The day
    // expression is a DERIVED group (registered below) available in every
    // subset — it lives on the fact.
    val day = "CAST(ts AS DATE)"
    val retainedPool = Seq(
      ("ssfz_fact JOIN ssfz_mid ON f_m = m_k JOIN ssfz_outer ON m_o = o_k",
        Seq("f_flag", "seg", "region", day), "full"),
      ("ssfz_fact JOIN ssfz_mid ON f_m = m_k",
        Seq("f_flag", "seg", day), "sub"),
      ("ssfz_fact", Seq("f_flag", day), "bare"))
    val aggPool: Seq[Int => String] = Seq(
      i => s"sum(v1) AS a$i",
      i => s"sum(v2) AS a$i",
      i => s"count(*) AS a$i",
      i => s"count(v1) AS a$i",
      i => s"min(v1) AS a$i",
      i => s"max(v1) AS a$i",
      i => s"min(v2) AS a$i",
      i => s"max(v2) AS a$i",
      i => s"avg(v1) AS a$i",
      i => s"avg(v2) AS a$i",
      // non-rewritable shapes — must fall through, still correct
      i => s"sum(v1 + 1) AS a$i",
      i => s"count(DISTINCT v1) AS a$i")
    val filterPool: Seq[Option[String]] = Seq(
      None, None, Some("f_flag <> 'f0'"), Some("seg = 's1'"),
      Some("region IS NOT NULL"), Some("v1 > 0"),
      // the optimizer rewrites this into raw-ts midnight bounds before
      // the rule runs — the shared recovery must convert it back
      Some("CAST(ts AS DATE) >= DATE '2024-06-03'"))

    def shape(seed: Int): (String, String) = {
      val r = new scala.util.Random(seed)
      val (from, avail, tag) = retainedPool(r.nextInt(retainedPool.size))
      val mode = r.nextInt(3) // 0 plain, 1 rollup, 2 cube
      val nGroups =
        if (mode == 0) r.nextInt(avail.size + 1) // plain allows global agg
        else 1 + r.nextInt(avail.size)
      val groups = r.shuffle(avail).take(nGroups)
      val aggs = (0 until 1 + r.nextInt(3)).map(i =>
        aggPool(r.nextInt(aggPool.size))(i))
      val gindic = if (mode != 0 && r.nextBoolean())
        Seq(s"CAST(grouping(${groups.head}) AS BIGINT) AS gi") else Nil
      // filters must reference retained tables only
      val filt = filterPool(r.nextInt(filterPool.size)).filter(c =>
        (avail.contains("seg") || !c.contains("seg")) &&
          (avail.contains("region") || !c.contains("region")))
      val select = (groups ++ aggs ++ gindic).mkString(", ")
      val where = filt.map(" WHERE " + _).getOrElse("")
      val by = mode match {
        case 0 => if (groups.isEmpty) "" else groups.mkString(" GROUP BY ", ", ", "")
        case 1 => groups.mkString(" GROUP BY ROLLUP(", ", ", ")")
        case 2 => groups.mkString(" GROUP BY CUBE(", ", ", ")")
      }
      (s"SELECT $select FROM $from$where$by", tag)
    }

    val seeds = 1 to 60
    val before = seeds.map(seed => seed -> snap(spark.sql(shape(seed)._1))).toMap
    StarMv.build(spark, StarMvDef(
      tables = Seq(f, m, o),
      joins = Seq((QCol(f, "f_m"), QCol(m, "m_k")),
        (QCol(m, "m_o"), QCol(o, "o_k"))),
      groupCols = Seq(QCol(f, "f_flag"), QCol(m, "seg"), QCol(o, "region")),
      measureCols = Seq(QCol(f, "v1"), QCol(f, "v2")),
      summaryPath = s,
      losslessTables = Seq(m, o),
      derivedGroups = Seq("day" -> "cast(ts as date)")))
    try {
      var rewrote = 0
      var subRewrote = 0
      seeds.foreach { seed =>
        val (sql, tag) = shape(seed)
        val df = spark.sql(sql)
        val served = usesSummary(df, "ssfz_sum")
        if (served) {
          rewrote += 1
          if (tag != "full") subRewrote += 1
        }
        assert(snap(df) == before(seed),
          s"seed=$seed diverged (served=$served): $sql")
      }
      assert(rewrote >= 20, s"only $rewrote/60 shapes rewrote — pool too weak")
      assert(subRewrote >= 6,
        s"only $subRewrote sub-join shapes rewrote — peeling never exercised")
    } finally StarMv.unregister(s)
  }
}
