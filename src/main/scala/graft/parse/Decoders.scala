package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level decoders reproducing the reference's CDC value-decoding rules
  * (reference: PipeLine.java:292-365 `formatColumns`,
  * DebeziumPipeLine.java:114-205, MaxwellPipeLine.java:74-84).
  *
  * Everything stays a Catalyst expression where Spark has a native function;
  * the three genuinely bespoke decodings (Debezium bit, Debezium
  * variable-scale decimal, Debezium epoch time) are Scala UDFs per
  * SURVEY.md §7.4 — they sit on the parse path only, never in analytic
  * hot loops.
  */
object Decoders {

  /** Field-metadata keys marking SQL types Catalyst has no native form for. */
  val BitPrecisionKey = "graft.bit.precision"
  val TimePrecisionKey = "graft.time.precision"

  def bitField(name: String, precision: Int): StructField = {
    require(precision > 0, s"bitField($name): precision must be positive, got $precision")
    StructField(name, StringType, nullable = true,
      new MetadataBuilder().putLong(BitPrecisionKey, precision.toLong).build())
  }

  // fail at FIELD construction, not inside a UDF rows later: the 9-digit
  // nano fraction can only be truncated to 0..9 digits, and a bad precision
  // would otherwise surface as a StringIndexOutOfBounds mid-batch, far from
  // the misconfigured declaration
  private def requireTimePrecision(name: String, precision: Int): Unit =
    require(precision >= 0 && precision <= 9,
      s"$name: time precision must be in [0, 9], got $precision")

  def timeField(name: String, precision: Int): StructField = {
    requireTimePrecision(s"timeField($name)", precision)
    StructField(name, StringType, nullable = true,
      new MetadataBuilder().putLong(TimePrecisionKey, precision.toLong).build())
  }

  /** TIMESTAMP(p) column: fraction truncated to the declared scale on the
    * Debezium path (reference: DebeziumPipeLine.java:146-174). Without this
    * metadata a TimestampType field decodes at full microsecond scale.
    */
  def timestampField(name: String, precision: Int): StructField = {
    requireTimePrecision(s"timestampField($name)", precision)
    StructField(name, TimestampType, nullable = true,
      new MetadataBuilder().putLong(TimePrecisionKey, precision.toLong).build())
  }

  /** Strip NUL characters, which PostgreSQL text COPY cannot carry; the
    * reference drops them with a warning (reference: PipeLine.java:425-427).
    */
  def stripNul(c: Column): Column = regexp_replace(c, "\\x00", "")

  /** Maxwell BIT: integer literal → zero-padded binary string of `precision`
    * bits (reference: MaxwellPipeLine.java:81-84). An over-wide value keeps
    * its LOW-order bits — the same truncation rule as [[debeziumBit]], so
    * the two producer flavors agree on out-of-range payloads (a bare lpad
    * would truncate to the HIGH bits).
    */
  def maxwellBit(c: Column, precision: Int): Column = {
    val b = conv(c, 10, 2)
    lpad(when(length(b) > precision, substring(b, -precision, precision))
      .otherwise(b), precision, "0")
  }

  /** Debezium BIT: "true"/"false" → "1"/"0"; otherwise Base64 bytes in
    * little-endian order → concatenated bit string, truncated to the low
    * `precision` bits (reference: DebeziumPipeLine.java:121-143).
    *
    * The boolean branch is deliberately NOT zero-padded to `precision`: the
    * reference returns the bare "1"/"0" (DebeziumPipeLine.java:122-127)
    * even though its Maxwell twin pads (MaxwellPipeLine.java:81-84) — the
    * asymmetry is the reference's own behavior, pinned here for parity.
    */
  private val debeziumBitUdf = udf { (data: String, precision: Int) =>
    if (data == null) null
    else data match {
      case "true" => "1"
      case "false" => "0"
      case _ =>
        val bytes = java.util.Base64.getDecoder.decode(data).reverse
        val bits = bytes.map(b => f"${(b & 0xff).toBinaryString.toInt}%08d").mkString
        // lpad in case the payload carries fewer bits than the column width
        val padded = if (bits.length < precision) ("0" * (precision - bits.length)) + bits else bits
        padded.substring(padded.length - precision)
    }
  }
  def debeziumBit(c: Column, precision: Int): Column = debeziumBitUdf(c, lit(precision))

  /** Debezium DECIMAL/NUMERIC: Base64-encoded big-endian unscaled bytes +
    * declared scale → decimal (reference: DebeziumPipeLine.java:200-205).
    * The UDF returns the decimal's plain STRING form, not a BigDecimal: a
    * BigDecimal return would be typed as the system default Decimal(38,18)
    * at the UDF boundary, silently rounding scales beyond 18 (and nulling
    * integer parts beyond 20 digits) before the cast to the declared type
    * could see the value. String → cast is exact for every in-range value.
    */
  private val debeziumDecimalUdf = udf { (data: String, scale: Int) =>
    if (data == null) null
    else {
      val unscaled = new java.math.BigInteger(java.util.Base64.getDecoder.decode(data))
      new java.math.BigDecimal(unscaled, scale).toPlainString
    }
  }
  def debeziumDecimal(c: Column, dt: DecimalType): Column =
    debeziumDecimalUdf(c, lit(dt.scale)).cast(dt)

  /** Debezium DATE: epoch-day count → date (reference:
    * DebeziumPipeLine.java:176-190).
    */
  def debeziumDate(c: Column): Column =
    date_add(to_date(lit("1970-01-01")), c.cast(IntegerType))

  /** Debezium TIMESTAMP: epoch seconds concatenated with a 9-digit nano
    * fraction, rendered in GMT with the fraction truncated to the column
    * precision (reference: DebeziumPipeLine.java:146-174). Values already
    * carrying a zone (`Z` suffix) pass through unchanged.
    */
  private val debeziumTimestampUdf = udf { (data: String, precision: Int) =>
    if (data == null) null else DecoderRuntime.epochNanosToString(data, precision, withDate = true)
  }

  /** A bare (optionally negative) integer — Debezium's epoch encoding. The
    * OLD routing tested `contains("Z")`, so a zoned ISO string rendered
    * with a numeric offset ("…+02:00" from a non-UTC server's timestamptz)
    * fell into the epoch path and crashed the batch on `toLong`.
    */
  private def isEpochLiteral(c: Column): Column = c.rlike("^\\s*-?\\d+\\s*$")

  def debeziumTimestamp(c: Column, precision: Int): Column = {
    requireTimePrecision("debeziumTimestamp", precision)
    when(isEpochLiteral(c),
      // the rendered wall-clock string IS UTC, so pin it with an explicit
      // Z — a bare to_timestamp would re-parse it in the session time
      // zone, shifting every decoded value by the session's UTC offset
      concat(debeziumTimestampUdf(c, lit(precision)), lit("Z"))
        .cast(TimestampType))
      // ISO strings carry their zone (Z or numeric offset); cast honors it
      .otherwise(c.cast(TimestampType))
  }

  /** Debezium TIME: same epoch+nanos encoding, formatted HH:mm:ss.fraction
    * (kept as a string column — Catalyst has no time-of-day type).
    */
  private val debeziumTimeUdf = udf { (data: String, precision: Int) =>
    if (data == null) null
    else DecoderRuntime.epochNanosToString(data, precision, withDate = false)
  }
  def debeziumTime(c: Column, precision: Int): Column = {
    requireTimePrecision("debeziumTime", precision)
    // non-numeric forms (already-rendered "HH:mm:ss…" strings) pass through
    // UNCHANGED, fraction and all — the reference returns zoned/rendered
    // strings verbatim without truncating to the column precision
    // (DebeziumPipeLine.java:152-156); parity, not an oversight
    when(isEpochLiteral(c), debeziumTimeUdf(c, lit(precision))).otherwise(c)
  }
}

/** Plain-JVM decode helpers shared by UDFs and unit tests. */
object DecoderRuntime {
  // hoisted: ofPattern builds a whole DateTimeFormatterBuilder chain per
  // call, and this runs once per decoded Debezium time/timestamp value on
  // the parse hot path; DateTimeFormatter is immutable and thread-safe
  private val dateTimeFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val timeFmt = java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss")

  /** `data` = "<epoch seconds><9-digit nanos>"; format in GMT, fraction
    * truncated to `precision` digits (0 → no fraction).
    */
  def epochNanosToString(data: String, precision: Int, withDate: Boolean): String = {
    // floor-divide the NUMERIC value, never split the decimal string: a
    // sub-second value ("123456789" = 0.123s) has no seconds prefix to
    // substring, and a negative value's two's-complement floor disagrees
    // with string truncation by one full second
    val ns = data.trim.toLong
    val sec = java.lang.Math.floorDiv(ns, 1000000000L)
    val fraction = f"${java.lang.Math.floorMod(ns, 1000000000L)}%09d".substring(0, precision)
    val fmt = if (withDate) dateTimeFmt else timeFmt
    val base = java.time.Instant.ofEpochSecond(sec).atZone(java.time.ZoneOffset.UTC).format(fmt)
    if (precision > 0) s"$base.$fraction" else base
  }
}
