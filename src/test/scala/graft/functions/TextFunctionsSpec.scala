package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Hand-computed fixtures for the scalar text metrics that feed the
  * pipeline queries; the md5/minhash/simhash primitives have their own
  * differential suite in [[TextHashSpec]].
  */
class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def estimates(rows: Seq[(Long, String)]): Map[Long, Long] =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.bpeTokenEstimate(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap

  test("bpeTokenEstimate: ceil(len/6) per word plus one per punctuation char") {
    val got = estimates(Seq(
      (1L, "Hello, world!"),        // hello + world (1 piece each) + ", !" → 4
      (2L, "internationalization"), // one 20-char word → ceil(20/6) = 4 pieces
      (3L, ""),                     // nothing at all
      (4L, "a b c"),                // three 1-char words, spaces are free
      (5L, "x+y=z")))               // three words + two operator chars
    assert(got === Map(1L -> 4L, 2L -> 4L, 3L -> 0L, 4L -> 3L, 5L -> 5L))
  }

  test("bpeTokenEstimate grows sublinearly in word length but linearly in punctuation") {
    val got = estimates(Seq(
      (1L, "aaaaaa"),        // 6 chars → 1 piece
      (2L, "aaaaaaa"),       // 7 chars → 2 pieces
      (3L, "......")))       // 6 punctuation chars → 6 tokens
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 6L))
  }

  test("NULL text scores 0 quality and 0 repetition — never better than real docs") {
    import org.apache.spark.sql.functions.lit
    val rows = Seq((1L, null: String), (2L, ""), (3L, "the quick brown fox and the dog"))
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
      TextFunctions.qualityScore(col("text"), Seq("the", "and")).as("q"),
      TextFunctions.dupTokenFraction(col("text")).as("dup"),
      TextFunctions.topBigramFraction(col("text")).as("big"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // ANSI size(null) is null and least() SKIPS nulls: unguarded, the NULL
    // doc collected the full 0.4 length reward (more than a real short doc)
    // and dupTokenFraction returned null (silently dropped by <= filters)
    assert(got(1L) == ((0.0, 0.0, 0.0)), "null text must score zero, not null/0.4")
    assert(got(2L)._1 == 0.0 && got(2L)._2 == 0.0)
    assert(got(3L)._1 > 0.0)
    // and a threshold filter must KEEP the real doc while dropping null text
    val kept = rows.filter(
      TextFunctions.qualityScore(col("text"), Seq("the", "and")) >= lit(0.1))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("repetition signals: hand-computed duplicate-word and top-bigram fractions") {
    val rows = Seq(
      (1L, "the cat sat on the mat"),      // 6 words, "the" twice → dup 1/6; bigrams all distinct → 1/5
      (2L, "buy now buy now buy now"),     // dup 4/6; "buy now" 3 of 5 bigrams
      (3L, "alpha beta gamma"),            // no repetition
      (4L, "word"),                        // no bigram at all
      (5L, ""))                            // empty
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        TextFunctions.dupTokenFraction(col("text")).as("dw"),
        TextFunctions.topBigramFraction(col("text")).as("tb"))
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((1.0 / 6.0, 1.0 / 5.0)))
    assert(got(2L) === ((4.0 / 6.0, 3.0 / 5.0)))
    assert(got(3L) === ((0.0, 1.0 / 2.0)))
    assert(got(4L) === ((0.0, 0.0)))
    assert(got(5L) === ((0.0, 0.0)))
  }

  test("redactPii masks email/ssn/phone/ip and counts each pattern") {
    val rows = Seq(
      (1L, "mail bob.smith+x@sub.example.co.uk now"),
      (2L, "ssn 123-45-6789 then call 555-123-4567"),
      (3L, "host 192.168.0.1 and 10.0.0.255"),
      (4L, "nothing sensitive here 12345"),
      (5L, "a@b.io c@d.org"))
      .toDF("doc_id", "text")
    val cols = Seq(col("doc_id"), TextFunctions.redactPii(col("text")).as("red")) ++
      TextFunctions.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    val got = rows.select(cols: _*)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    assert(got(1L)._2 === "mail <EMAIL> now")
    assert(got(2L)._2 === "ssn <SSN> then call <PHONE>")
    assert(got(3L)._2 === "host <IP> and <IP>")
    assert(got(4L)._2 === "nothing sensitive here 12345")
    assert(got(5L)._2 === "<EMAIL> <EMAIL>")
    // (n_email, n_ssn, n_phone, n_ip)
    assert(got(1L).productIterator.drop(2).toSeq === Seq(1L, 0L, 0L, 0L))
    assert(got(2L).productIterator.drop(2).toSeq === Seq(0L, 1L, 1L, 0L))
    assert(got(3L).productIterator.drop(2).toSeq === Seq(0L, 0L, 0L, 2L))
    assert(got(5L).productIterator.drop(2).toSeq === Seq(2L, 0L, 0L, 0L))
  }
}
