package graft.sources

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.types._

/** Model-based property test: a seeded random sequence of merge batches is
  * applied to the Parquet store, the JDBC store, and a plain in-memory map
  * implementing the M6/M7 contract (delete changed keys, insert upserts,
  * absent-key deletes are no-ops). After every merge all three must agree —
  * the randomized twin of the replay oracle the driver runs on q21/q22.
  */
class StoreModelPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.t",
    StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
    Seq("id"))

  private def state(s: TableStore): Map[Int, String] =
    s.snapshot().collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("random merge sequences: parquet store == jdbc store == model") {
    val rnd = new scala.util.Random(4242)
    val parquet = new ParquetTableStore(spark, tmpDir("prop-store"), spec, 4)
    val jdbc = new JdbcTableStore(
      spark, s"jdbc:derby:memory:prop${System.nanoTime()};create=true", spec)
    var model = Map.empty[Int, String]

    (1 to 12).foreach { step =>
      val keySpace = 0 until 20
      val deletes = keySpace.filter(_ => rnd.nextDouble() < 0.2)
      val upserts = keySpace.filter(_ => rnd.nextDouble() < 0.3)
        .map(k => (k, s"v$step-$k"))
      // model semantics: deletes remove, upserts replace (M6 delete-then-
      // insert nets to replace; M7 absent-key delete is a no-op)
      model = (model -- deletes) -- upserts.map(_._1) ++ upserts

      val batch = CompactedBatch(
        deletes = deletes.toDF("id"),
        upserts = upserts.toDF("id", "v"))
      parquet.merge(batch)
      // rebuild the batch: CompactedBatch DataFrames are lazy plans, safe to
      // reuse, but rebuilding mirrors two independent consumers
      val batch2 = CompactedBatch(
        deletes = deletes.toDF("id"),
        upserts = upserts.toDF("id", "v"))
      jdbc.merge(batch2)

      assert(state(parquet) == model, s"parquet diverged from model at step $step")
      assert(state(jdbc) == model, s"jdbc diverged from model at step $step")
    }
    assert(model.nonEmpty, "the random walk should end with live rows")
  }

  test("MOR random walk: merges + prefix/full compactions == model; " +
      "a lagging feed consumer converges whenever the floor permits") {
    val rnd = new scala.util.Random(777)
    val mor = new MorTableStore(spark, tmpDir("prop-mor"), spec,
      numBuckets = 4, compactThreshold = 3)
    var model = Map.empty[Int, String]
    mor.init(Seq.empty[(Int, String)].toDF("id", "v"))
    // an independent consumer replaying the change feed into its own map —
    // must reconstruct the model from ANY cursor the floor still covers
    var consumer = Map.empty[Int, String]
    var cursor = mor.currentSeq

    (1 to 15).foreach { step =>
      val keySpace = 0 until 20
      val deletes = keySpace.filter(_ => rnd.nextDouble() < 0.2)
      val upserts = keySpace.filter(_ => rnd.nextDouble() < 0.3)
        .map(k => (k, s"v$step-$k"))
      model = (model -- deletes) -- upserts.map(_._1) ++ upserts
      mor.merge(CompactedBatch(deletes.toDF("id"), upserts.toDF("id", "v")))
      // random compactions, full (deletes final) and prefix (feed-safe)
      if (rnd.nextDouble() < 0.4) { mor.compact(keepNewest = rnd.nextInt(2)); () }
      assert(state(mor) == model, s"MOR diverged from model at step $step")
      // the consumer catches up at random times, skipping rounds — a fold
      // may outrun a cursor this lagged; the contract is then a LOUD
      // refusal (floor check), never a silently incomplete feed
      if (rnd.nextDouble() < 0.6) {
        if (cursor >= mor.feedFloor) {
          val feed = mor.changeFeedSince(cursor)
            .select("id", "v", "_change").collect()
          feed.foreach { r =>
            r.getString(2) match {
              case "insert" | "update_post" =>
                consumer += r.getInt(0) -> r.getString(1)
              case "delete" => consumer -= r.getInt(0)
              case "update_pre" => () // pre-image; the post row follows
            }
          }
          assert(consumer == model,
            s"feed consumer diverged from model at step $step (cursor $cursor)")
          cursor = mor.currentSeq
        } else {
          intercept[IllegalArgumentException] { mor.changeFeedSince(cursor) }
          // the documented recovery: restart from the full current state
          consumer = state(mor)
          cursor = mor.currentSeq
        }
      }
    }
    assert(model.nonEmpty, "the random walk should end with live rows")
  }
}
