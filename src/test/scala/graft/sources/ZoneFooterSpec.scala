package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r14 optimization guard: append's zone sidecar is now derived from the
  * staged parquet FOOTERS (driver-side) with the one-row aggregate as the
  * fallback — these tests pin that both paths produce BIT-IDENTICAL zones
  * (rendered bytes) on every kind the codec supports, including the
  * adversarial cases the fuzz alphabet exists for (supplementary-plane
  * strings, negative numerics, nulls, all-null columns, multi-file
  * batches), and that the NaN case degrades to the same recorded zone.
  */
class ZoneFooterSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("d", DateType),
    StructField("v", DoubleType),
    StructField("dec", DecimalType(12, 3)),
    StructField("dec2", DecimalType(22, 4)),
    StructField("s", StringType),
    StructField("allnull", IntegerType)))

  private val cols = Seq("id", "ts", "d", "v", "dec", "dec2", "s", "allnull")

  private def ts(x: String) = java.sql.Timestamp.valueOf(x)
  private def dt(x: String) = java.sql.Date.valueOf(x)

  //  (private-use, 3-byte UTF-8) vs the 4-byte supplementary 😀: the
  // UTF-16-vs-UTF-8 order-adversarial pair the zone comparator fuzz uses
  private def trickyDf = Seq(
    (-5L, ts("2024-03-01 10:00:00"), dt("2024-03-01"), -1.5,
      BigDecimal("-12.345"), "😀grin"),
    (7L, ts("2024-03-03 23:59:59"), dt("2024-03-05"), 0.0,
      BigDecimal("99999.999"), "pua"),
    (2L, ts("2024-03-02 00:00:00"), dt("2024-03-02"), 3.25,
      BigDecimal("0.001"), "ascii"))
    .toDF("id", "ts", "d", "v", "dec", "s")
    .withColumn("dec", col("dec").cast("decimal(12,3)"))
    .withColumn("dec2", (col("dec") * lit(1000)).cast("decimal(22,4)"))
    .withColumn("allnull", lit(null).cast("int"))
    .select("id", "ts", "d", "v", "dec", "dec2", "s", "allnull")

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def writeStaged(df: org.apache.spark.sql.DataFrame): Path = {
    val dir = new Path(tmpDir("zfoot"), s"staged_${System.nanoTime()}")
    val k = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "TIMESTAMP_MICROS")
    try df.write.mode("overwrite").parquet(dir.toString)
    finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    dir
  }

  test("footer zones are bit-identical to the aggregate zones (all kinds)") {
    val dir = writeStaged(trickyDf.repartition(1))
    val footer = ZoneMaps.fromParquetFooters(hconf, dir, schema, cols)
    assert(footer.isDefined, "fixed-width + clean-string batch must resolve from footers")
    val agg = ZoneMaps.compute(spark.read.schema(schema).parquet(dir.toString), cols)
    assert(new String(ZoneMaps.render(footer.get), "UTF-8") ==
      new String(ZoneMaps.render(agg), "UTF-8"))
  }

  test("multi-file batches merge per-file footer zones to the aggregate's answer") {
    val dir = writeStaged(trickyDf.repartition(3))
    val footer = ZoneMaps.fromParquetFooters(hconf, dir, schema, cols)
    assert(footer.isDefined)
    val agg = ZoneMaps.compute(spark.read.schema(schema).parquet(dir.toString), cols)
    assert(new String(ZoneMaps.render(footer.get), "UTF-8") ==
      new String(ZoneMaps.render(agg), "UTF-8"))
  }

  test("append records the same sidecar under footer and aggregate paths (NaN included)") {
    // end-to-end: two logs, same batches — one append rides footers (clean
    // data), the NaN batch must fall back and still record the aggregate's
    // zone (unbounded v => omitted line; ts still bounded)
    val log = new AppendLog(spark, tmpDir("zfootlog"), "public.zf",
      StructType(Seq(StructField("id", LongType),
        StructField("ts", TimestampType), StructField("v", DoubleType),
        StructField("s", StringType))), Seq("ts", "v", "s"))
    log.append(Seq(
      (1L, ts("2024-03-01 10:00:00"), 1.0, "a😀"),
      (2L, ts("2024-03-01 11:00:00"), -2.0, "private"))
      .toDF("id", "ts", "v", "s"))
    log.append(Seq(
      (3L, ts("2024-03-02 10:00:00"), Double.NaN, "b"),
      (4L, ts("2024-03-02 11:00:00"), 5.0, "c"))
      .toDF("id", "ts", "v", "s"))
    val rep = log.zoneReport().collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(4), r.getString(5)))
    // batch 0: everything bounded, exact micros and UTF-8-extreme strings
    assert(rep.exists(t => t._1 == 0L && t._2 == "ts" &&
      t._3 == "1709287200000000" && t._4 == "1709290800000000"), rep.mkString("; "))
    assert(rep.exists(t => t._1 == 0L && t._2 == "v" &&
      t._3 == "-2" && t._4 == "1"), rep.mkString("; "))
    assert(rep.exists(t => t._1 == 0L && t._2 == "s" &&
      t._3 == "a😀" && t._4 == "private"), rep.mkString("; "))
    // batch 1: NaN pollutes v — no v line recorded (unbounded), ts still tight
    assert(!rep.exists(t => t._1 == 1L && t._2 == "v"), rep.mkString("; "))
    assert(rep.exists(t => t._1 == 1L && t._2 == "ts"), rep.mkString("; "))
    // and the prune behavior over those sidecars stays correct
    val (kept, total) = log.zonePrune(col("v") > lit(100.0))
    assert(total == 2 && kept.size == 1, s"kept=$kept")
  }

  test("empty and all-null batches record allNull zones from either path") {
    val s2 = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType)))
    val log = new AppendLog(spark, tmpDir("zfootnull"), "public.zn", s2, Seq("ts"))
    log.append(Seq((1L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "ts"))
    val rep = log.zoneReport().collect()
    assert(rep.length == 1 && rep.head.getBoolean(6), rep.mkString("; "))
  }
}
