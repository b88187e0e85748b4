package graft.operators

import graft.SparkTestBase
import graft.model.TableSpec
import graft.sources.ParquetTableStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential fuzz for MERGE INTO: random target states, random
  * key-unique sources and random clause thresholds, checked against an
  * in-memory row-by-row reference applying the SAME SQL clause
  * semantics (delete first, then update, NULL condition = false,
  * untouched otherwise). Hunts classification edges: overlapping clause
  * conditions, null attributes in either side, sources mixing hits and
  * misses, empty clause outcomes.
  */
class MergeIntoFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.fz",
    StructType(Seq(
      StructField("id", LongType),
      StructField("bal", DoubleType),
      StructField("seg", StringType))),
    Seq("id"))

  test("store state == in-memory reference over random merges (seeded)") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { round =>
      def someBal(): java.lang.Double =
        if (rnd.nextInt(8) == 0) null else Double.box(rnd.nextInt(100).toDouble)
      def someSeg(): String =
        if (rnd.nextInt(8) == 0) null
        else Seq("A", "B", "D")(rnd.nextInt(3))
      val targetRows = (1L to (5 + rnd.nextInt(8)).toLong)
        .map(i => (i, someBal(), someSeg()))
      val sourceRows = rnd.shuffle((1L to 16L).toList)
        .take(4 + rnd.nextInt(8)).map(i => (i, someBal(), someSeg()))
      val insThresh = rnd.nextInt(50).toDouble

      val store = new ParquetTableStore(spark, tmpDir(s"mifz$round"), spec, 4)
      store.init(targetRows.toDF("id", "bal", "seg"))
      MergeInto(store, store.snapshotForKeys(_),
        sourceRows.toDF("id", "bal", "seg"),
        whenMatchedDelete = Some(col("s.seg") === "D"),
        whenMatchedUpdate = Some(MergeInto.Update(
          col("t.bal") < col("s.bal"), Map("bal" -> col("s.bal")))),
        whenNotMatchedInsert = Some(col("s.bal") > insThresh))

      // in-memory reference, same clause semantics
      var ref = targetRows.map(r => r._1 -> ((r._2, r._3))).toMap
      sourceRows.foreach { case (id, sBal, sSeg) =>
        ref.get(id) match {
          case Some((tBal, _)) =>
            if (sSeg == "D") ref -= id // delete first
            else if (tBal != null && sBal != null && tBal < sBal)
              ref = ref.updated(id, (sBal, ref(id)._2)) // SET bal only
            // NULL comparisons: no clause fires
          case None =>
            if (sBal != null && sBal > insThresh)
              ref = ref.updated(id, (sBal, sSeg))
        }
      }
      val got = store.snapshot().collect()
        .map(r => r.getLong(0) -> ((
          if (r.isNullAt(1)) null else Double.box(r.getDouble(1)),
          if (r.isNullAt(2)) null else r.getString(2)))).toMap
      assert(got == ref, s"round $round diverged: got $got expected $ref")
    }
  }
}
