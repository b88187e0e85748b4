package graft.functions

import java.security.MessageDigest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Differential tests pinning the compiled [[TextHash]] kernels to their
  * column-expression twins in [[TextFunctions]] — md5Hash60 is the one
  * formula that must stay byte-identical for the DuckDB oracles, and
  * tokens/shingles must agree so Dedup's mapPartitions pass computes the
  * same sets the oracle SQL does.
  */
class TextHashSpec extends SparkTestBase {
  import spark.implicits._

  private val samples = Seq(
    "The quick brown fox jumps over the lazy dog",
    "a",
    "",
    "  multiple   spaces\tand\nnewlines  ",
    "Unicode: héllo wörld ÆØÅ 北京 — dashes!",
    "numbers 123 and 456 mixed tokens42 here",
    "the the the the repeated repeated words")

  test("md5Hash60: JVM twin equals the column expression") {
    val fromCol = samples.toDF("s")
      .select(TextFunctions.md5Hash60(col("s")).as("h"))
      .as[Long].collect()
    val fromJvm = samples.map(TextHash.md5Hash60)
    assert(fromCol.toSeq === fromJvm)
  }

  test("native graft_md5h60 equals the historical conv(substring(md5)) chain, nulls included") {
    // the conv chain IS the DuckDB oracle spelling — the native expression
    // replacing it in every hash column must be value-identical on every
    // input shape, and NULL must stay NULL (UnaryExpression null-safety)
    val df = (samples.map(Option(_)) :+ None).toDF("s")
    val legacy = df.select(
      conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h")).collect().map(r => Option(r.get(0)))
    val native = df.select(TextFunctions.md5Hash60(col("s")).as("h"))
      .collect().map(r => Option(r.get(0)))
    assert(native.toSeq === legacy.toSeq)
    assert(native.last.isEmpty, "NULL input must hash to NULL")
  }

  test("graft_md5h60 is registered for SQL users and codegen agrees with interpreted eval") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    samples.toDF("s").createOrReplaceTempView("th_samples")
    val viaSql = spark.sql(
      "SELECT graft_md5h60(CAST(s AS BINARY)) FROM th_samples")
      .as[Long].collect()
    assert(viaSql.toSeq === samples.map(TextHash.md5Hash60))
  }

  test("tokens: JVM twin equals the column expression") {
    val fromCol = samples.toDF("s")
      .select(TextFunctions.tokens(col("s")).as("t"))
      .as[Seq[String]].collect()
    val fromJvm = samples.map(s => TextHash.tokens(s).toSeq)
    assert(fromCol.toSeq === fromJvm)
  }

  test("shingles: JVM twin equals the column expression") {
    val fromCol = samples.toDF("s")
      .select(TextFunctions.shingles(col("s")).as("t"))
      .as[Seq[String]].collect()
    val fromJvm = samples.map(s => TextHash.shingles(TextHash.tokens(s)).toSeq)
    assert(fromCol.toSeq === fromJvm)
  }

  test("shingles: column and JVM twins agree on NULL text") {
    // the column form null-propagated to [NULL] before the coalesce guard;
    // the JVM twin has always produced [""] for empty tokens
    val fromCol = Seq[String](null).toDF("s")
      .select(TextFunctions.shingles(col("s")).as("t"))
      .as[Seq[String]].collect().head
    assert(fromCol === TextHash.shingles(TextHash.tokens(null)).toSeq)
    assert(fromCol === Seq(""))
  }

  test("hashedShingles are distinct, sorted, and reduced mod P") {
    val md = MessageDigest.getInstance("MD5")
    val hs = TextHash.hashedShingles(TextHash.tokens(samples.head), md)
    assert(hs.toSeq === hs.distinct.sorted.toSeq)
    assert(hs.forall(h => h >= 0 && h < TextHash.MinhashPrime))
  }

  test("minhashSignature equals minhashFromHashes over hashed shingles (modulo dedup)") {
    val md = MessageDigest.getInstance("MD5")
    val (a, b) = TextHash.minhashCoeffs(16)
    val toks = TextHash.tokens(samples.head)
    // min() is dedup-insensitive, so the distinct-hashed path must agree
    val viaStrings = TextHash.minhashSignature(TextHash.shingles(toks), a, b, md)
    val viaHashes = TextHash.minhashFromHashes(TextHash.hashedShingles(toks, md), a, b)
    assert(viaStrings.toSeq === viaHashes.toSeq)
  }

  test("bandKeys rejects widths that do not divide the signature") {
    assertThrows[IllegalArgumentException](TextHash.bandKeys(Array(1L, 2L, 3L), 2))
    assertThrows[IllegalArgumentException](TextHash.bandKeys(Array(1L, 2L), 0))
    assert(TextHash.bandKeys(Array(1L, 2L, 3L, 4L), 2).length === 2)
  }

  test("simhash60: identical texts agree, token-less text is None") {
    val md = MessageDigest.getInstance("MD5")
    assert(TextHash.simhash60(md, "hello world") === TextHash.simhash60(md, "hello world"))
    assert(TextHash.simhash60(md, "!!! ???").isEmpty)
    val fp = TextHash.simhash60(md, "hello world").get
    assert(fp >= 0 && fp < (1L << 60))
  }
}
