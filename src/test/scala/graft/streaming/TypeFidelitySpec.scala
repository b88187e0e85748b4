package graft.streaming

import graft.SparkTestBase
import graft.model.{TableRegistry, TableSpec}
import graft.parse.{Decoders, DebeziumParser, MaxwellParser, Projection}
import graft.sources.ParquetTableStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end type fidelity over the reference's adversarial golden values
  * (reference: integration_test/maxwell/mysql_setup.sql:31-52 and
  * integration_test/debezium/setup.sql:1-52 — ±2^63−1 bigints, BIT(15)
  * patterns, quotes/backslash/newline/0x00 in strings, NUMERIC(5,2) nulls,
  * TIME(3)/TIMESTAMP(6) fractions): each decoder was unit-tested in
  * isolation, this replays them through the full parse → project → compact →
  * merge → snapshot pipeline like the reference's own golden sync test
  * (integration_test/maxwell/check_result.py:26-37).
  */
class TypeFidelitySpec extends SparkTestBase {
  import spark.implicits._

  test("maxwell e2e: adversarial values survive parse→compact→merge→snapshot") {
    val spec = TableSpec("public.adv",
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("big", LongType),
        StructField("s", StringType),
        StructField("num", DecimalType(5, 2)))
        :+ Decoders.bitField("bits", 15)
        :+ Decoders.timeField("t", 3)
        :+ StructField("ts", TimestampType)),
      Seq("id"))
    val registry = TableRegistry(Map("demo.adv" -> "public.adv"), Map("public.adv" -> spec))
    val store = new ParquetTableStore(spark, tmpDir("adv-store"), spec, 4)

    // the six-char JSON NUL escape, concat-spelled so Scala's lexer never sees
    // a unicode escape — the JSON parser must be the one to decode it
    val jsonNul = "\\" + "u0000"
    val lines = Seq(
      // max/min bigint, embedded quote/backslash/newline/NUL, BIT(15), TIME(3)
      """{"database":"demo","table":"adv","type":"insert","ts":1,"data":{"id":1,"big":9223372036854775807,"s":"he said \"hi\" \\ line1\nline2""" + jsonNul + """end","num":123.45,"bits":21845,"t":"12:34:56.789","ts":"2017-09-20 05:52:38.123456"}}""",
      """{"database":"demo","table":"adv","type":"insert","ts":2,"data":{"id":2,"big":-9223372036854775807,"s":"","num":null,"bits":1,"t":"00:00:00.000","ts":"1970-01-01 00:00:01"}}""",
      """{"database":"demo","table":"adv","type":"insert","ts":3,"data":{"id":3,"big":0,"s":"doomed","num":0.01,"bits":0,"t":"23:59:59.999","ts":"2024-02-29 23:59:59"}}""",
      // last-write-wins on id 2, then delete id 3
      """{"database":"demo","table":"adv","type":"update","ts":4,"data":{"id":2,"big":-9223372036854775807,"s":"updated","num":-99.99,"bits":1,"t":"00:00:00.000","ts":"1970-01-01 00:00:01"},"old":{"s":""}}""",
      """{"database":"demo","table":"adv","type":"delete","ts":5,"data":{"id":3}}""")

    val raw = lines.toDF("value").withColumn("seq", monotonically_increasing_id())
    CdcPipeline.applyBatch(
      MaxwellParser.events(raw, registry, col("seq")), registry,
      Map("public.adv" -> store))

    val rows = store.snapshot().collect().map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet == Set(1, 2))

    val r1 = rows(1)
    assert(r1.getAs[Long]("big") == Long.MaxValue)
    // 0x00 stripped (reference: PipeLine.java:425-427); quotes/newline kept
    assert(r1.getAs[String]("s") == "he said \"hi\" \\ line1\nline2end")
    assert(r1.getAs[java.math.BigDecimal]("num").toString == "123.45")
    assert(r1.getAs[String]("bits") == "101010101010101")
    assert(r1.getAs[String]("t") == "12:34:56.789")
    assert(r1.getAs[java.sql.Timestamp]("ts").toString == "2017-09-20 05:52:38.123456")

    val r2 = rows(2)
    assert(r2.getAs[Long]("big") == -Long.MaxValue)
    assert(r2.getAs[String]("s") == "updated")
    assert(r2.getAs[java.math.BigDecimal]("num").toString == "-99.99")
  }

  test("debezium e2e: epoch/base64 encodings survive the full pipeline") {
    val spec = TableSpec("public.dadv",
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("bin", BinaryType),
        StructField("num", DecimalType(5, 2)),
        StructField("d", DateType))
        :+ Decoders.bitField("bits", 15)
        :+ Decoders.timestampField("ts3", 3)),
      Seq("id"))
    val registry = TableRegistry(Map("public.dadv" -> "public.dadv"),
      Map("public.dadv" -> spec))
    val store = new ParquetTableStore(spark, tmpDir("dadv-store"), spec, 4)

    val b64 = java.util.Base64.getEncoder
    val num = b64.encodeToString(java.math.BigInteger.valueOf(-9999).toByteArray) // -99.99
    val bin = b64.encodeToString("bytes\u0000here".getBytes)
    val bits = b64.encodeToString(Array[Byte](0x55, 0x2A)) // LE → 0x2A55 → 15 bits

    val lines = Seq(
      (s"""{"payload":{"op":"c","ts_ms":1,"after":{"id":1,"bin":"$bin","num":"$num","d":"17436","bits":"$bits","ts3":"1505886758123456789"}}}""", "db.public.dadv"),
      (s"""{"payload":{"op":"c","ts_ms":2,"after":{"id":2,"bin":null,"num":null,"d":"0","bits":"true","ts3":"0000000000"}}}""", "db.public.dadv"),
      (s"""{"payload":{"op":"d","ts_ms":3,"before":{"id":2}}}""", "db.public.dadv"))

    val raw = lines.toDF("value", "topic").withColumn("seq", monotonically_increasing_id())
    CdcPipeline.applyBatch(
      DebeziumParser.events(raw, registry, col("seq"), col("topic")), registry,
      Map("public.dadv" -> store), Projection.Debezium)

    val rows = store.snapshot().collect().map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet == Set(1))
    val r1 = rows(1)
    // binary keeps NUL bytes — only text strips them (reference §1.3)
    assert(new String(r1.getAs[Array[Byte]]("bin")) == "bytes\u0000here")
    assert(r1.getAs[java.math.BigDecimal]("num").toString == "-99.99")
    assert(r1.getAs[java.sql.Date]("d").toString == "2017-09-27")
    assert(r1.getAs[String]("bits") == "010101001010101")
    assert(r1.getAs[java.sql.Timestamp]("ts3").toString == "2017-09-20 05:52:38.123")
  }
}
