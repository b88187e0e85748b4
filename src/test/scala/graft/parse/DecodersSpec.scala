package graft.parse

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DecodersSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head().get(0)

  test("stripNul drops 0x00 but keeps everything else") {
    assert(one(Decoders.stripNul(lit("a\u0000b c"))) == "ab c")
  }

  test("maxwell bit: int literal to zero-padded bit string") {
    assert(one(Decoders.maxwellBit(lit("5"), 15)) == "000000000000101")
    assert(one(Decoders.maxwellBit(lit("0"), 4)) == "0000")
  }

  test("debezium bit: true/false and base64 reversed bytes") {
    assert(one(Decoders.debeziumBit(lit("true"), 1)) == "1")
    assert(one(Decoders.debeziumBit(lit("false"), 1)) == "0")
    // 5 → single byte 0x05 → "00000101" → low 3 bits "101"
    val b5 = java.util.Base64.getEncoder.encodeToString(Array[Byte](5))
    assert(one(Decoders.debeziumBit(lit(b5), 3)) == "101")
    // 0x0102 little-endian payload [0x02, 0x01] reversed → 0x01,0x02
    val b = java.util.Base64.getEncoder.encodeToString(Array[Byte](2, 1))
    assert(one(Decoders.debeziumBit(lit(b), 15)) == "000000100000010")
  }

  test("debezium decimal: base64 unscaled + scale") {
    // 12345 unscaled, scale 2 → 123.45
    val enc = java.util.Base64.getEncoder.encodeToString(
      java.math.BigInteger.valueOf(12345).toByteArray)
    val got = one(Decoders.debeziumDecimal(lit(enc), DecimalType(5, 2)))
    assert(got.toString == "123.45")
    // negative: -1.50
    val neg = java.util.Base64.getEncoder.encodeToString(
      java.math.BigInteger.valueOf(-150).toByteArray)
    assert(one(Decoders.debeziumDecimal(lit(neg), DecimalType(5, 2))).toString == "-1.50")
  }

  test("debezium decimal survives scales beyond Decimal(38,18) exactly") {
    // a BigDecimal-returning UDF would be typed (38,18) at the boundary and
    // silently round the 30-digit scale before the declared-type cast
    val unscaled = new java.math.BigInteger("123456789012345678901234567890")
    val b64 = java.util.Base64.getEncoder.encodeToString(unscaled.toByteArray)
    val got = one(Decoders.debeziumDecimal(lit(b64), DecimalType(38, 30)))
    assert(got.toString == "0.123456789012345678901234567890")
    // and a large integer part beyond 20 digits is not nulled
    val bigInt = new java.math.BigInteger("123456789012345678901234567")
    val b64i = java.util.Base64.getEncoder.encodeToString(bigInt.toByteArray)
    val gotInt = one(Decoders.debeziumDecimal(lit(b64i), DecimalType(38, 0)))
    assert(gotInt.toString == "123456789012345678901234567")
  }

  test("debezium timestamp: numeric-offset zoned form decodes, not crashes") {
    // rendered by a non-UTC server's timestamptz: no 'Z', but an explicit
    // offset — the old contains("Z") routing sent this into the epoch UDF
    // where toLong threw and killed the batch
    val got = one(Decoders.debeziumTimestamp(lit("2024-03-01 10:00:00+02:00"), 6))
    assert(got.toString == "2024-03-01 08:00:00.0")
  }

  test("time precision outside [0, 9] fails at declaration, not mid-batch") {
    intercept[IllegalArgumentException](Decoders.timestampField("ts", 12))
    intercept[IllegalArgumentException](Decoders.timeField("t", -1))
    intercept[IllegalArgumentException](Decoders.bitField("b", 0))
    intercept[IllegalArgumentException](Decoders.debeziumTimestamp(lit("0"), 10))
  }

  test("debezium date: epoch days") {
    assert(one(Decoders.debeziumDate(lit("0"))).toString == "1970-01-01")
    assert(one(Decoders.debeziumDate(lit("17436"))).toString == "2017-09-27")
  }

  test("debezium timestamp: epoch seconds + 9-digit nanos, GMT") {
    // 1505886758 = 2017-09-20T05:52:38Z
    val got = one(Decoders.debeziumTimestamp(lit("1505886758123456789"), 6))
    assert(got.toString == "2017-09-20 05:52:38.123456")
  }

  test("debezium timestamp: Z-suffixed passes through") {
    val got = one(Decoders.debeziumTimestamp(lit("2017-09-20T05:52:38.5Z"), 6))
    assert(got.toString == "2017-09-20 05:52:38.5")
  }

  test("debezium time: epoch seconds + nanos → HH:mm:ss.f") {
    assert(one(Decoders.debeziumTime(lit("1505886758123456789"), 3)) == "05:52:38.123")
    assert(one(Decoders.debeziumTime(lit("1505886758123456789"), 0)) == "05:52:38")
  }

  test("epoch nanos: sub-second and negative values floor correctly") {
    // 0.123456789 s after epoch: no seconds prefix exists to substring
    assert(DecoderRuntime.epochNanosToString("123456789", 3, withDate = false)
      == "00:00:00.123")
    // 1.5 s BEFORE epoch: floor to 23:59:58.5, not the off-by-one 59.5 a
    // decimal-string split would produce
    assert(DecoderRuntime.epochNanosToString("-1500000000", 1, withDate = true)
      == "1969-12-31 23:59:58.5")
    assert(DecoderRuntime.epochNanosToString("-1500000000", 0, withDate = true)
      == "1969-12-31 23:59:58")
  }

  test("debezium timestamp decodes the same instant in any session time zone") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = spark.range(1)
        .select(Decoders.debeziumTimestamp(lit("1505886758500000000"), 1).as("ts"))
        .select(col("ts").cast("long")).collect().head.getLong(0)
      // the instant itself, independent of the session's rendering zone
      assert(got == 1505886758L)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("maxwell bit keeps the LOW-order bits on overflow, like debezium bit") {
    // 255 into BIT(4): low nibble 1111 on both producer paths
    assert(one(Decoders.maxwellBit(lit("255"), 4)) == "1111")
    assert(one(Decoders.maxwellBit(lit("5"), 4)) == "0101")
    val viaDebezium = one(Decoders.debeziumBit(
      lit(java.util.Base64.getEncoder.encodeToString(Array(255.toByte))), 4))
    assert(viaDebezium == "1111")
  }
}
