package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LineageSpec extends SparkTestBase {
  import spark.implicits._

  private def writeT(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val p = tmpDir("lin") + s"/$name.parquet"
    df.write.mode("overwrite").parquet(p)
    p
  }

  test("expression, join, aggregate and rename lineage") {
    val li = writeT("li", Seq((1L, 10.0, 0.1, 1L)).toDF("l_ok", "price", "disc", "ck"))
    val cu = writeT("cu", Seq((1L, "SEG")).toDF("ck", "seg"))
    val q = spark.read.parquet(li)
      .join(spark.read.parquet(cu), "ck")
      .groupBy(col("seg").as("segment"))
      .agg(sum(col("price") * (lit(1.0) - col("disc"))).as("revenue"),
        count(lit(1)).as("n"))
    val e = Lineage.edges(q).map(x => (x.output, x.table, x.column)).toSet
    assert(e == Set(
      ("segment", "cu", "seg"),
      ("revenue", "li", "price"),
      ("revenue", "li", "disc")))
    // n = count(1): no base references -> no edges, by design
    assert(!e.exists(_._1 == "n"))
  }

  test("self-join: same column name from both sides traces by ExprId, not name") {
    val t = writeT("t", Seq((1L, 2L)).toDF("id", "parent"))
    val a = spark.read.parquet(t).select(col("id"), col("parent"))
    val b = spark.read.parquet(t).select(col("id").as("pid"), col("parent").as("gp"))
    val q = a.join(b, col("parent") === col("pid"))
      .select(col("id").as("child"), col("gp").as("grandparent"))
    val e = Lineage.edges(q).map(x => (x.output, x.column)).toSet
    assert(e == Set(("child", "id"), ("grandparent", "parent")))
  }

  test("union merges positional lineage; filter columns are not data lineage") {
    val x = writeT("x", Seq((1L, "a")).toDF("k", "v"))
    val y = writeT("y", Seq((2L, "b")).toDF("k2", "v2"))
    val q = spark.read.parquet(x).filter(col("v") === "a").select(col("k"))
      .unionByName(spark.read.parquet(y).select(col("k2").as("k")))
    val e = Lineage.edges(q).map(x0 => (x0.table, x0.column)).toSet
    assert(e == Set(("x", "k"), ("y", "k2")))
    // v gates rows but is not a source of k
    assert(!e.contains(("x", "v")))
  }

  test("window functions: the analytic value traces to partition/order inputs") {
    import org.apache.spark.sql.expressions.Window
    val t = writeT("w", Seq((1L, "a", 5.0)).toDF("id", "grp", "score"))
    val q = spark.read.parquet(t)
      .withColumn("rnk", rank().over(
        Window.partitionBy(col("grp")).orderBy(col("score"))))
      .select(col("id"), col("rnk"))
    val e = Lineage.edges(q).map(x => (x.output, x.column)).toSet
    assert(e == Set(("id", "id"), ("rnk", "grp"), ("rnk", "score")))
  }

  test("explode: generator outputs trace to the exploded column") {
    val t = writeT("arr", Seq((1L, Seq("p", "q"))).toDF("id", "toks"))
    val q = spark.read.parquet(t).select(col("id"), explode(col("toks")).as("tok"))
    val e = Lineage.edges(q).map(x => (x.output, x.column)).toSet
    assert(e == Set(("id", "id"), ("tok", "toks")))
  }

  test("control lineage: filter-only and join-only columns appear exactly as control edges") {
    val li = writeT("cli", Seq((1L, 10.0, "F", 1L)).toDF("l_ok", "price", "status", "ck"))
    val cu = writeT("ccu", Seq((1L, "SEG", 5L)).toDF("ck", "seg", "tier"))
    val q = spark.read.parquet(li).alias("l")
      .join(spark.read.parquet(cu).alias("c"), col("l.ck") === col("c.ck"))
      .filter(col("status") === "F" && col("tier") > 2L)
      .select(col("seg"), col("price"))
    // data edges unchanged by the flag being off
    val data = Lineage.edges(q).map(x => (x.output, x.table, x.column, x.kind)).toSet
    assert(data == Set(("seg", "ccu", "seg", "data"),
      ("price", "cli", "price", "data")))
    val all = Lineage.edges(q, includeControl = true)
      .map(x => (x.output, x.table, x.column, x.kind)).toSet
    // every output is gated by every filter/join condition column
    val ctrlCols = Set(("cli", "status"), ("cli", "ck"), ("ccu", "ck"),
      ("ccu", "tier"))
    val expectCtrl = for {
      o <- Set("seg", "price"); (t, c) <- ctrlCols
    } yield (o, t, c, "control")
    assert(all == data ++ expectCtrl)
    // status is filter-only: control edges, never data
    assert(!all.exists(x => x._3 == "status" && x._4 == "data"))
    assert(all.exists(x => x._3 == "status" && x._4 == "control"))
  }

  test("control lineage: a filter over a derived alias traces to the alias's base columns") {
    val t = writeT("cderiv", Seq((1L, 10.0, 0.5)).toDF("id", "price", "disc"))
    val q = spark.read.parquet(t)
      .withColumn("net", col("price") * (lit(1.0) - col("disc")))
      .filter(col("net") > 1.0)
      .select(col("id"))
    val all = Lineage.edges(q, includeControl = true)
      .map(x => (x.output, x.column, x.kind)).toSet
    assert(all == Set(("id", "id", "data"),
      ("id", "price", "control"), ("id", "disc", "control")))
  }

  test("control lineage traverses subquery conditions (IN / EXISTS / scalar, nested)") {
    val f = writeT("lin_f", Seq((1L, 10.0), (2L, 20.0)).toDF("x", "y"))
    val d = writeT("lin_d", Seq((1L, 1, 5L)).toDF("k", "flag", "grp"))
    spark.read.parquet(f).createOrReplaceTempView("lin_f")
    spark.read.parquet(d).createOrReplaceTempView("lin_d")
    val q = spark.sql(
      "SELECT y FROM lin_f WHERE x IN (SELECT k FROM lin_d WHERE flag = 1)")
    val ctrl = Lineage.edges(q, includeControl = true)
      .filter(_.kind == "control").map(e => (e.table, e.column)).toSet
    // the outer probe column, the compared subquery output AND the
    // subquery's own gating column all gate the result
    assert(ctrl == Set(("lin_f", "x"), ("lin_d", "k"), ("lin_d", "flag")),
      s"got $ctrl")
    // data lineage is untouched by the traversal
    val data = Lineage.edges(q, includeControl = true)
      .filter(_.kind == "data").map(e => (e.output, e.table, e.column)).toSet
    assert(data == Set(("y", "lin_f", "y")))
    // nested: the inner subquery's gate surfaces too
    val q2 = spark.sql(
      """SELECT y FROM lin_f WHERE x IN (
        |  SELECT k FROM lin_d WHERE grp IN (SELECT grp FROM lin_d WHERE flag = 1))
        |""".stripMargin)
    val ctrl2 = Lineage.edges(q2, includeControl = true)
      .filter(_.kind == "control").map(e => e.column).toSet
    assert(Set("x", "k", "grp", "flag").subsetOf(ctrl2), s"got $ctrl2")
    // scalar subquery in a filter gates on its output's sources
    val q3 = spark.sql(
      "SELECT y FROM lin_f WHERE y > (SELECT max(k) FROM lin_d WHERE flag = 1)")
    val ctrl3 = Lineage.edges(q3, includeControl = true)
      .filter(_.kind == "control").map(e => (e.table, e.column)).toSet
    assert(ctrl3 == Set(("lin_f", "y"), ("lin_d", "k"), ("lin_d", "flag")),
      s"got $ctrl3")
  }
}
