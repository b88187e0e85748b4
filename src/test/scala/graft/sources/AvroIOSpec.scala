package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro container round trips over the public avro-mapred API: every
  * supported type survives write→read bit-exactly (µs timestamps
  * included), nulls stay null, the files are self-describing (read infers
  * the schema from the container header), and unsupported types fail
  * loudly instead of silently widening.
  */
class AvroIOSpec extends SparkTestBase {
  import spark.implicits._

  test("all supported types round-trip exactly, including µs timestamps and nulls") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "héllo", Array[Byte](1, 2), ts,
        java.sql.Date.valueOf("2024-02-29")),
      Row(null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val dir = tmpDir("avro_rt") + "/out"
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().map(r =>
      (0 until r.length).map(i => r.get(i) match {
        case a: Array[Byte] => a.toSeq
        case v => v
      })).toSet
    val want = rows.map(r =>
      (0 until r.length).map(i => r.get(i) match {
        case a: Array[Byte] => a.toSeq
        case v => v
      })).toSet
    assert(got == want)
    // the µs fraction must survive (getTime-only encoding floors to ms)
    val gotTs = back.filter($"l".isNotNull).collect()(0).getAs[java.sql.Timestamp]("ts")
    assert(gotTs.getNanos == 123456000, s"lost sub-ms precision: ${gotTs.getNanos}")
  }

  test("a whole parquet table survives the avro round trip") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dir = tmpDir("avro_orders") + "/out"
    AvroIO.write(orders, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.count() == orders.count())
    val a = orders.selectExpr("sum(cast(o_totalprice as decimal(18,2)))",
      "max(o_orderdate)", "count(distinct o_orderkey)").collect()(0)
    val b = back.selectExpr("sum(cast(o_totalprice as decimal(18,2)))",
      "max(o_orderdate)", "count(distinct o_orderkey)").collect()(0)
    assert(a == b)
  }

  test("decimal columns are rejected loudly, not widened") {
    val e = intercept[IllegalArgumentException] {
      AvroIO.toAvroSchemaJson(StructType(Seq(
        StructField("x", DecimalType(10, 2)))))
    }
    assert(e.getMessage.contains("lossless"))
  }

  test("reading an empty directory fails with a clear message") {
    val e = intercept[IllegalArgumentException] {
      AvroIO.read(spark, tmpDir("avro_empty"))
    }
    assert(e.getMessage.contains("no .avro files"))
  }
}
