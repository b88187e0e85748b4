package graft.operators

import graft.SparkTestBase
import graft.model.TableSpec
import graft.sources.{AppendLog, ParquetTableStore}
import org.apache.spark.sql.types._

/** Differential fuzz for SCD2 maintenance: random initial dimensions and
  * random change/delete waves, checked against an in-memory interval
  * reference applying the same rules (null-safe image compare, no-op
  * skip, delete closes with no successor). Hunts the lifecycle edges a
  * case list misses: re-insert after delete, repeated changes of one
  * key, null attribute flips, waves touching disjoint key sets.
  */
class Scd2FuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.fz2",
    StructType(Seq(
      StructField("nk", LongType),
      StructField("bal", DoubleType),
      StructField("seg", StringType),
      StructField("valid_from_us", LongType))),
    Seq("nk"))
  private val histSchema = StructType(spec.schema.fields :+
    StructField("valid_to_us", LongType))

  private type Img = (java.lang.Double, String)

  test("fullView == in-memory interval reference over random waves (seeded)") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { round =>
      def img(): Img = (
        if (rnd.nextInt(6) == 0) null else Double.box(rnd.nextInt(50).toDouble),
        if (rnd.nextInt(6) == 0) null else Seq("A", "B", "C")(rnd.nextInt(3)))
      val cur = new ParquetTableStore(spark, tmpDir(s"s2fz$round"), spec, 4)
      val hist = new AppendLog(spark, tmpDir(s"s2fzh$round"), "public.h",
        histSchema, Seq("valid_to_us"))
      val init = (1L to (3 + rnd.nextInt(4)).toLong).map(i => i -> img()).toMap
      cur.init(init.toSeq.map { case (k, (b, s0)) => (k, b, s0, 10L) }
        .toDF("nk", "bal", "seg", "valid_from_us"))

      // reference state: open versions + closed intervals
      var open: Map[Long, (Img, Long)] = init.map { case (k, v) => k -> ((v, 10L)) }
      var closed: List[(Long, Img, Long, Long)] = Nil

      var eff = 20L
      (1 to 3).foreach { _ =>
        val keys = rnd.shuffle((1L to 9L).toList)
        val nCh = rnd.nextInt(4)
        val chKeys = keys.take(nCh)
        val delKeys = keys.slice(nCh, nCh + rnd.nextInt(3))
        val changes = chKeys.map { k =>
          // sometimes send the CURRENT image on purpose (no-op probe)
          if (open.contains(k) && rnd.nextInt(3) == 0) k -> open(k)._1
          else k -> img()
        }
        Scd2(cur, hist,
          changes.map { case (k, (b, s0)) => (k, b, s0) }.toDF("nk", "bal", "seg"),
          delKeys.toDF("nk"), effUs = eff)
        // reference apply
        changes.foreach { case (k, image) =>
          open.get(k) match {
            case Some((prev, vf)) =>
              if (prev != image) { // tuple equality == null-safe compare
                closed ::= ((k, prev, vf, eff))
                open = open.updated(k, (image, eff))
              }
            case None => open = open.updated(k, (image, eff))
          }
        }
        delKeys.foreach { k =>
          open.get(k).foreach { case (prev, vf) =>
            closed ::= ((k, prev, vf, eff))
            open -= k
          }
        }
        eff += 10L
      }

      val got = Scd2.fullView(cur, hist).collect().map { r =>
        (r.getLong(0),
          if (r.isNullAt(1)) null else Double.box(r.getDouble(1)),
          if (r.isNullAt(2)) null else r.getString(2),
          r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))
      }.toSet
      val expect: Set[(Long, java.lang.Double, String, Long, Long)] =
        closed.map { case (k, (b, s0), vf, vt) => (k, b, s0, vf, vt) }.toSet ++
          open.map { case (k, ((b, s0), vf)) => (k, b, s0, vf, -1L) }.toSet
      assert(got == expect,
        s"round $round diverged:\n got $got\n expect $expect")
    }
  }
}
