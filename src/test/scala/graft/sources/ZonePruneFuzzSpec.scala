package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential fuzz for the zone-prune layer: on random batch layouts
  * and random AND-conjunct predicates, `scanWhere(pred)` must return
  * EXACTLY `scan().filter(pred)` — pruning is a superset filter, so any
  * divergence (a dir wrongly pruned) is a correctness bug, and the fuzz
  * hunts precisely the probe-extraction / bound-comparison edges a
  * hand-written case list misses (inclusive vs exclusive boundaries at
  * exact zone edges, empty IN intersections, mixed-kind conjuncts,
  * all-null dirs, negative/fractional numerics).
  */
class ZonePruneFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("v", DoubleType),
    StructField("s", StringType)))

  // The string alphabet deliberately mixes ASCII, accented BMP, high-BMP
  // (U+FFFD) and supplementary-plane (emoji) code points: UTF-16
  // code-unit order and UTF-8 binary order DISAGREE across the
  // U+E000..U+FFFF vs supplementary boundary, so this domain would catch
  // a probe comparator that drifts from the UTF8_BINARY order Spark's
  // min/max used to build the zones.
  private val strAlphabet =
    Vector("a", "b", "c", "d", "e", "é", "ß", "中", "�", "😀", "🦄")

  test("scanWhere == scan.filter over random layouts and predicates (seeded)") {
    runRounds(new scala.util.Random(42), 8)
  }

  test("scanWhere == scan.filter, second seed (AND/OR mixes)") {
    runRounds(new scala.util.Random(20260816L), 6)
  }

  private def runRounds(rnd: scala.util.Random, nRounds: Int): Unit = {
    (1 to nRounds).foreach { round =>
      val nBatches = 2 + rnd.nextInt(4)
      val log = new AppendLog(spark, tmpDir(s"zfuzz$round"), "public.f",
        schema, Seq("ts", "v", "s"))
      var nextId = 0L
      (1 to nBatches).foreach { b =>
        val rows = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val day = 1 + rnd.nextInt(9)
          val ts =
            if (rnd.nextInt(10) == 0) null
            else java.sql.Timestamp.valueOf(f"2024-02-0$day%d 0${rnd.nextInt(9)}%d:00:00")
          val v: java.lang.Double =
            if (rnd.nextInt(10) == 0) null
            else Double.box((rnd.nextInt(2001) - 1000) / 8.0)
          val sv = if (rnd.nextInt(10) == 0) null
            else strAlphabet(rnd.nextInt(strAlphabet.size)) * (1 + rnd.nextInt(3))
          (nextId, ts, v, sv)
        }
        log.append(rows.toDF("id", "ts", "v", "s"))
      }
      def randPred(): Column = {
        def one(): Column = rnd.nextInt(8) match {
          case 0 => col("v") > ((rnd.nextInt(2001) - 1000) / 8.0)
          case 1 => col("v") <= ((rnd.nextInt(2001) - 1000) / 8.0)
          case 2 => col("ts") >= lit(java.sql.Timestamp.valueOf(
            f"2024-02-0${1 + rnd.nextInt(9)}%d 00:00:00"))
          case 3 => col("ts") < lit(java.sql.Timestamp.valueOf(
            f"2024-02-0${1 + rnd.nextInt(9)}%d 12:00:00"))
          case 4 => col("s") === strAlphabet(rnd.nextInt(strAlphabet.size))
          case 5 => col("v").isin(
            (0 until (1 + rnd.nextInt(3))).map(_ =>
              (rnd.nextInt(2001) - 1000) / 8.0): _*)
          case 6 => col("s") > strAlphabet(rnd.nextInt(strAlphabet.size))
          case 7 => col("s") <= strAlphabet(rnd.nextInt(strAlphabet.size))
        }
        // AND chains, sometimes OR-ing two of them — the boolean
        // refutation tree (compilePred) must stay a superset filter on
        // arbitrary AND/OR mixes, not just conjunct lists
        def chain(): Column =
          (0 until (1 + rnd.nextInt(3))).map(_ => one()).reduce(_ && _)
        rnd.nextInt(3) match {
          case 0 => chain() || chain()
          case 1 => chain() && (one() || one())
          case _ => chain()
        }
      }
      (1 to 12).foreach { _ =>
        val pred = randPred()
        val expect = log.scan().filter(pred)
          .select("id").as[Long].collect().toSet
        val got = log.scanWhere(pred)
          .select("id").as[Long].collect().toSet
        assert(got == expect,
          s"round $round pred ${pred.toString} pruned wrongly: " +
            s"missing ${expect -- got}, extra ${got -- expect}")
      }
    }
  }
}
