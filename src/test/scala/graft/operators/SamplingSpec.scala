package graft.operators

import graft.SparkTestBase
import graft.functions.TextHash
import org.apache.spark.sql.functions.col

/** Deterministic-sampling tests: membership is exactly the md5-bucket rule
  * (recomputed on the JVM), the sample is stable under corpus growth, and
  * rate edge cases behave.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, if (i % 3 == 0) "en" else "de"))

  private def jvmExpected(n: Int): Set[(Long, String)] =
    corpus(n).filter { case (id, lang) =>
      val bucket = math.floorMod(TextHash.md5Hash60("sample:" + id), 100L)
      bucket < (if (lang == "en") 50 else 20)
    }.toSet

  test("sampleByHash keeps exactly the rows whose md5 bucket clears the stratum rate") {
    val kept = Sampling.sampleByHash(
        corpus(1000).toDF("doc_id", "lang"), "doc_id", "lang",
        Map("en" -> 50), defaultRate = 20)
      .as[(Long, String)].collect().toSet
    assert(kept === jvmExpected(1000))
    assert(kept.nonEmpty && kept.size < 1000)
  }

  test("sample is stable under corpus growth: surviving keys keep surviving") {
    def sample(n: Int) = Sampling.sampleByHash(
        corpus(n).toDF("doc_id", "lang"), "doc_id", "lang",
        Map("en" -> 50), defaultRate = 20)
      .as[(Long, String)].collect().toSet
    val small = sample(500)
    val grown = sample(1000)
    assert(grown.filter(_._1 <= 500) === small)
  }

  test("rate 0 drops a stratum entirely; rate 100 keeps one entirely") {
    val kept = Sampling.sampleByHash(
        corpus(300).toDF("doc_id", "lang"), "doc_id", "lang",
        Map("en" -> 0), defaultRate = 100)
      .as[(Long, String)].collect()
    assert(!kept.exists(_._2 == "en"))
    assert(kept.count(_._2 == "de") === corpus(300).count(_._2 == "de"))
  }

  test("rates outside [0, 100] are rejected") {
    val df = corpus(10).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      Sampling.sampleByHash(df, "doc_id", "lang", Map("en" -> 101), 20)
    }
    intercept[IllegalArgumentException] {
      Sampling.sampleByHash(df, "doc_id", "lang", Map.empty, -1)
    }
  }

  test("balanceStrata treats NULL as its own stratum instead of dropping or crashing") {
    val withNulls = ((1 to 50).map(i => (i.toLong, Option("en"))) ++
      (101 to 110).map(i => (i.toLong, Option.empty[String]))).toDF("doc_id", "lang")
    val kept = Sampling.balanceStrata(withNulls, "doc_id", "lang")
      .as[(Long, Option[String])].collect()
    assert(kept.count(_._2.isEmpty) == 10, "the smallest (null) stratum survives whole")
    assert(kept.count(_._2.contains("en")) < 50, "'en' is downsampled toward 10")
  }

  test("balanceStrata downsamples every stratum toward the smallest one, keeping it whole") {
    // 900 'de' vs 100 'en': the floor is 100, so 'en' survives entirely
    // (bucket·100 < 100·10⁶ always) and 'de' keeps ≈ 1/9 of its rows.
    val skewed = ((1 to 900).map(i => (i.toLong, "de")) ++
      (1001 to 1100).map(i => (i.toLong, "en"))).toDF("doc_id", "lang")
    val kept = Sampling.balanceStrata(skewed, "doc_id", "lang")
      .as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 100, "the smallest stratum must survive whole")
    assert(byLang("de") > 50 && byLang("de") < 200,
      s"900 'de' rows at rate 100/900 must land near 100, got ${byLang("de")}")
    // determinism: the exact same rows survive on a second evaluation
    val again = Sampling.balanceStrata(skewed, "doc_id", "lang")
      .as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("capPerGroup enforces the cap, keeps small groups whole, equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // group 'big': 200 rows, group 'tiny': 3 rows
    val df = ((1 to 200).map(i => (i.toLong, "big")) ++
      (501 to 503).map(i => (i.toLong, "tiny"))).toDF("doc_id", "source")
    val capped = Sampling.capPerGroup(df, "doc_id", "source", 10)
      .as[(Long, String)].collect()
    val bySrc = capped.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("big").size == 10)
    assert(bySrc("tiny") == Set(501L, 502L, 503L), "groups under the cap survive whole")
    // identical keep-set to the row_number-over-hash formulation
    val w = Window.partitionBy(col("source"))
      .orderBy(pmod(graft.functions.TextFunctions.md5Hash60(
        concat(lit("cap:"), col("doc_id").cast("string"))), lit(1L << 50)),
        col("doc_id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select(col("doc_id"), col("source"))
      .as[(Long, String)].collect()
    assert(capped.toSet == windowed.toSet)
    // growth stability: adding rows never evicts a kept key in favor of a
    // larger-hash one — the kept set of the union is the top-10 of the union
    val grown = df.unionByName(Seq((1000L, "big")).toDF("doc_id", "source"))
    val keptGrown = Sampling.capPerGroup(grown, "doc_id", "source", 10)
      .as[(Long, String)].collect().filter(_._2 == "big").map(_._1).toSet
    assert((bySrc("big") intersect keptGrown).size >= 9,
      "at most one key displaced by one newcomer")
  }

  test("capPerGroup caps per (group, key): a key shared across groups cannot leak") {
    // key 1..30 in group 'a'; key 1 ALSO in group 'b' alongside 2 others.
    // Whatever group a's top-5 is, group b must keep exactly its own 3 rows
    // capped at 5 — never gain or lose rows because key 1 was kept/dropped
    // in group a.
    val df = ((1 to 30).map(i => (i.toLong, "a")) ++
      Seq((1L, "b"), (100L, "b"), (101L, "b"))).toDF("doc_id", "source")
    val kept = Sampling.capPerGroup(df, "doc_id", "source", 5)
      .as[(Long, String)].collect()
    assert(kept.count(_._2 == "a") == 5)
    assert(kept.filter(_._2 == "b").map(_._1).toSet == Set(1L, 100L, 101L),
      "group b is under the cap and must survive whole, independent of group a")
  }

  test("capPerGroup rejects non-integral key columns and bad k") {
    val df = Seq(("a", "s")).toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException](
      Sampling.capPerGroup(df, "doc_id", "source", 5))
    assert(e.getMessage.contains("integral key"))
    val num = Seq((1L, "s")).toDF("doc_id", "source")
    intercept[IllegalArgumentException](
      Sampling.capPerGroup(num, "doc_id", "source", 0))
  }

  test("splitByHash covers every row exactly once and is growth-stable") {
    val df = (1 to 1000).map(i => (i.toLong, "x")).toDF("doc_id", "lang")
    val splits = Seq(("train", 900), ("val", 50), ("test", 50))
    val out = Sampling.splitByHash(df, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.size === 1000)
    assert(out.values.toSet === Set("train", "val", "test"))
    val byName = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
    // growth stability: adding rows never reassigns an existing key
    val grown = (1 to 1500).map(i => (i.toLong, "x")).toDF("doc_id", "lang")
    val out2 = Sampling.splitByHash(grown, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall { case (k, v) => out2(k) == v })
    // shares must sum to 1000
    intercept[IllegalArgumentException](
      Sampling.splitByHash(df, "doc_id", Seq(("a", 500), ("b", 400))))
  }

  test("sampling and split decisions are independent (domain separation)") {
    // Regression: with one shared bare-key hash, a 50% sampler keeps
    // bucket%100 < 50 while the test split needs bucket%1000 in [950,1000)
    // — whose %100 values are all >= 50 — so the test split came out EMPTY.
    // Domain-prefixed hashes decorrelate the two decisions.
    val df = (1 to 2000).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    val sampled = Sampling.sampleByHash(df, "doc_id", "lang", Map.empty, 50)
    val split = Sampling.splitByHash(sampled, "doc_id",
      Seq(("train", 950), ("test", 50)))
    val nTest = split.filter(col("split") === "test").count()
    val nAll = split.count()
    assert(nTest > 0, "test split emptied by sampler correlation")
    assert(nTest < nAll / 5, s"test split implausibly large: $nTest of $nAll")
  }

  test("temperatureMix keeps the smallest stratum whole and flattens the head") {
    // strata sizes 100 / 400 / 1600: at α = ½ the kept volumes should be
    // ∝ sqrt-compressed — 100 kept whole, 400 at ~50%, 1600 at ~25%.
    val rows = (1 to 100).map(i => (i.toLong, "small")) ++
      (1001 to 1400).map(i => (i.toLong, "mid")) ++
      (2001 to 3600).map(i => (i.toLong, "big"))
    val kept = Sampling.temperatureMix(rows.toDF("doc_id", "lang"), "doc_id", "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 100L, "smallest stratum must survive whole")
    // hash buckets are uniform-ish, not exact: allow ±8 percentage points
    assert(kept("mid") >= 400 * 42 / 100 && kept("mid") <= 400 * 58 / 100, kept)
    assert(kept("big") >= 1600 * 17 / 100 && kept("big") <= 1600 * 33 / 100, kept)
    // α = 1 is the raw mix: every stratum keeps everything
    val raw = Sampling.temperatureMix(
      rows.toDF("doc_id", "lang"), "doc_id", "lang", alpha = 1.0)
    assert(raw.count() === rows.size.toLong)
  }

  test("temperatureMix treats NULL as its own stratum instead of dropping rows") {
    val rows = Seq((1L, null: String), (2L, null: String), (3L, "en"), (4L, "en"))
    val raw = Sampling.temperatureMix(rows.toDF("doc_id", "lang"),
      "doc_id", "lang", alpha = 1.0)
    // α = 1 is the raw mix — nothing may vanish, null strata included
    assert(raw.count() === 4L)
    assert(raw.filter(col("lang").isNull).count() === 2L)
  }

  test("temperatureMix is reproducible and growth-stable like sampleByHash") {
    val rows = (1 to 500).map(i => (i.toLong, if (i % 5 == 0) "a" else "b"))
    val df = rows.toDF("doc_id", "lang")
    val kept1 = Sampling.temperatureMix(df, "doc_id", "lang")
      .select("doc_id").as[Long].collect().toSet
    // adding rows to the LARGE stratum can only shrink its rate — survivors
    // of the small stratum must keep surviving (their rate stays 1000‰)
    val grown = (rows ++ (1001 to 1200).map(i => (i.toLong, "b")))
      .toDF("doc_id", "lang")
    val kept2 = Sampling.temperatureMix(grown, "doc_id", "lang")
      .select("doc_id").as[Long].collect().toSet
    val smallIds = rows.collect { case (id, "a") => id }.toSet
    assert((kept1 & smallIds) === (kept2 & smallIds))
  }
}
