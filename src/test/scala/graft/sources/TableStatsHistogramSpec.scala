package graft.sources

import graft.SparkTestBase
import graft.model.TableSpec
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructField, StructType}

class TableStatsHistogramSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType(Seq(StructField("id", IntegerType),
    StructField("v", StringType), StructField("x", DoubleType)))

  private def spec = TableSpec("public.h", schema, Seq("id"))

  test("analyze records equi-depth deciles for numeric columns only, and they round-trip") {
    val s = new ParquetTableStore(spark, tmpDir("hist-store"), spec, 4)
    // x uniform over [0, 999]: decile bounds land near 100, 200, … 900
    s.init((0 until 1000).map(i => (i, s"s$i", i.toDouble)).toDF("id", "v", "x"))
    val t0 = s.analyze()
    val byName = t0.columns.map(c => c.name -> c).toMap
    assert(byName("v").histogramBounds.isEmpty, "no histogram for strings")
    val hx = byName("x").histogramBounds
    assert(hx.length === 9)
    hx.zipWithIndex.foreach { case (b, i) =>
      val want = (i + 1) * 100.0
      assert(math.abs(b - want) <= 20.0, s"decile $i: $b vs ~$want")
    }
    // persisted record parses back to the same bounds
    val re = s.stats().get.columns.map(c => c.name -> c).toMap
    assert(re("x").histogramBounds === hx)
    assert(re("v").histogramBounds.isEmpty)
  }

  test("selectivityPpm: equi-depth interpolation within ±1 bucket on uniform and skewed data") {
    val s = new ParquetTableStore(spark, tmpDir("hist-sel"), spec, 4)
    s.init((0 until 1000).map(i => (i, "c", i.toDouble)).toDF("id", "v", "x"))
    val cs = s.analyze().columns.find(_.name == "x").get
    // uniform: [0, 250] holds ~25% of rows
    val uni = cs.selectivityPpm(0.0, 250.0).get
    assert(math.abs(uni - 250000L) <= 100000L, s"uniform [0,250]: $uni ppm")
    // full range → everything; empty band far right → ~0
    assert(cs.selectivityPpm(-1.0, 2000.0).get === 1000000L)
    assert(cs.selectivityPpm(1500.0, 2000.0).get === 0L)
    // skewed: 90% of mass at small values — equi-depth keeps the estimate
    // honest where a uniform min/max assumption would say ~1%
    val sk = new ParquetTableStore(spark, tmpDir("hist-skew"),
      TableSpec("public.sk", schema, Seq("id")), 4)
    sk.init((0 until 1000).map(i =>
      (i, "c", if (i < 900) (i % 10).toDouble else 10000.0 + i)).toDF("id", "v", "x"))
    val skc = sk.analyze().columns.find(_.name == "x").get
    val low = skc.selectivityPpm(0.0, 9.0).get
    assert(low >= 800000L, s"skewed low band should carry ~900k ppm, got $low")
  }

  test("non-numeric and all-null columns yield no estimate; old records parse as histogram-free") {
    val s = new ParquetTableStore(spark, tmpDir("hist-null"), spec, 4)
    s.init(Seq((1, "a", Option.empty[Double])).toDF("id", "v", "x"))
    val byName = s.analyze().columns.map(c => c.name -> c).toMap
    assert(byName("x").histogramBounds.isEmpty, "all-null numeric: no histogram")
    assert(byName("v").selectivityPpm(0.0, 1.0).isEmpty)
    // a pre-histogram record (5 fields) parses with empty bounds
    val old = TableStatsIO.parse(
      "#version=1\trows=2\nid\t2\t2\t1\t2", version = 1L, staleBy = 0L)
    assert(old.columns.head.histogramBounds.isEmpty)
  }
}
