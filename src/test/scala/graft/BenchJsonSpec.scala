package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench line is parsed by the driver with a strict JSON reader; a
  * malformed error string would void the round's bench. Pin the escaping
  * against the JSON parser Spark itself ships.
  */
class BenchJsonSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private def parsed(s: String): String =
    mapper.readTree(s"""{"err":${Bench.jstr(s)}}""").get("err").asText()

  test("error strings round-trip through strict JSON parsing") {
    val nasty = Seq(
      "plain message",
      """path "C:\tmp\new" not found""",
      "line1\nline2\ttabbed\rcr",
      "bell\u0007 backspace\b formfeed\u000c",
      "trailing backslash \\")
    nasty.foreach { s =>
      assert(parsed(s) == s.take(200), s"round-trip failed for: $s")
    }
  }

  test("truncation happens before escaping, never splitting an escape pair") {
    // 200 backslashes escape to 400 chars; a post-escape cut at 200 would
    // end mid-pair and break the parse
    val s = "\\" * 300
    assert(parsed(s) == "\\" * 200)
  }
}
