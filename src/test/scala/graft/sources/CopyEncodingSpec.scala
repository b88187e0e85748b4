package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The PostgreSQL COPY fast path's text encoding, pinned against the
  * reference byte-for-byte (statement: ChangeLoader.java:334-344; string
  * escaping: PipeLine.java:418-437; bytea octal: PipeLine.java:445-468).
  * The writer itself needs a live pg driver (selected by URL scheme at run
  * time); the encoding is pure and verified here.
  */
class CopyEncodingSpec extends AnyFunSuite {
  import JdbcTableStore._

  test("copy statement matches the reference's exactly") {
    assert(copySql("public.orders", Seq("a", "b")) ==
      "COPY public.orders (a,b) FROM STDIN WITH DELIMITER '|' NULL '' CSV QUOTE '\"' ESCAPE E'\\\\';")
  }

  test("writer selection by URL scheme") {
    assert(isPostgres("jdbc:postgresql://gp-master:5432/warehouse"))
    assert(!isPostgres("jdbc:derby:memory:x;create=true"))
  }

  test("string escaping: NUL deleted, quote and backslash escaped (PipeLine.java:418-437)") {
    assert(escapeCsvString("plain") == "plain")
    assert(escapeCsvString("""say "hi"""") == """say \"hi\"""")
    assert(escapeCsvString("""a\b""") == """a\\b""")
    assert(escapeCsvString("nul\u0000here") == "nulhere")
    assert(escapeCsvString("tab\tand\nnewline") == "tab\tand\nnewline",
      "CSV-quoted fields carry control characters verbatim; only NUL is illegal")
  }

  test("bytea octal encoding (PipeLine.java:445-468)") {
    assert(escapeBinary(Array[Byte]('A', 'z', '0')) == "Az0")
    assert(escapeBinary(Array[Byte]('\\')) == "\\\\")
    assert(escapeBinary(Array[Byte](0x00, 0x1f, 0x7f.toByte)) == "\\000\\037\\177")
    assert(escapeBinary(Array[Byte](0xff.toByte)) == "\\377")
  }

  test("row encoding: nulls empty, strings quoted, temporals in JDBC text form") {
    val fields = Seq(IntegerType, StringType, TimestampType, DoubleType)
    val rows = Iterator(
      Row(1, "a|b\"c", java.sql.Timestamp.valueOf("2024-01-02 03:04:05.6"), 2.5),
      Row(2, null, null, null))
    val lines = copyLines(fields, rows).toSeq
    assert(lines == Seq(
      "1|\"a|b\\\"c\"|2024-01-02 03:04:05.6|2.5",
      "2|||"))
  }

  test("binary column rides the bytea encoding") {
    val lines = copyLines(Seq(BinaryType), Iterator(Row(Array[Byte](0x01, 'k')))).toSeq
    assert(lines == Seq("\\001k"))
  }

  test("zero-length binary encodes as a QUOTED empty field, distinct from the NULL sentinel") {
    // unquoted "" is exactly COPY's `NULL ''` marker: an empty byte array
    // must quote so it reads back as empty bytea, not SQL NULL (the
    // batch-insert writer stores it correctly — the two must agree)
    val lines = copyLines(Seq(BinaryType, BinaryType),
      Iterator(Row(Array.emptyByteArray, null))).toSeq
    assert(lines == Seq("\"\"|"))
  }

  test("LinesReader streams the iterator with newline separators, no materialization") {
    def readAll(lines: Seq[String], bufSize: Int): String = {
      val r = new LinesReader(lines.iterator)
      val sb = new StringBuilder
      val buf = new Array[Char](bufSize)
      var n = r.read(buf, 0, bufSize)
      while (n >= 0) { sb.appendAll(buf, 0, n); n = r.read(buf, 0, bufSize) }
      sb.toString
    }
    assert(readAll(Seq("one", "two", "three"), 4096) == "one\ntwo\nthree\n")
    assert(readAll(Seq("one", "two", "three"), 2) == "one\ntwo\nthree\n",
      "tiny read buffers must not drop or duplicate characters")
    assert(readAll(Seq.empty, 8) == "")
    assert(readAll(Seq("", "x"), 8) == "\nx\n", "empty lines survive")
    // stream-edge empty records: a single-column NULL row encodes to "" —
    // the old prefix-newline formulation silently DROPPED it when it was
    // the only or the last record of a partition
    assert(readAll(Seq(""), 8) == "\n", "an only-empty record must emit")
    assert(readAll(Seq("x", ""), 8) == "x\n\n", "a last-empty record must emit")
  }
}
