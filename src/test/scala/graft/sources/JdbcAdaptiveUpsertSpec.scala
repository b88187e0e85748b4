package graft.sources

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.types._

/** L3 adaptive upsert (reference ChangeLoader.java:49,211-294) and X3
  * slow-delete diagnostics (ChangeLoader.java:44,255-262) on embedded Derby:
  * the optimistic/pessimistic mode machine must converge to the same final
  * table as the always-pessimistic path for every sequence, flipping modes on
  * exactly the reference's two signals (unique violation → pessimistic;
  * clean pessimistic delete → optimistic).
  */
class JdbcAdaptiveUpsertSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.t",
    StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
    Seq("id"))

  private def newStore(slowLogSec: Int = 10) = new JdbcTableStore(
    spark, s"jdbc:derby:memory:adapt${System.nanoTime()};create=true", spec,
    slowDeleteLogSec = slowLogSec)

  private def state(s: TableStore): Map[Int, String] =
    s.snapshot().collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("insert-only merges stay optimistic and land correctly") {
    val s = newStore()
    s.init(Seq((1, "a")).toDF("id", "v"))
    assert(s.isOptimistic, "the mode machine starts optimistic (reference :49)")
    s.merge(CompactedBatch(
      deletes = spark.emptyDataFrame.selectExpr("1 as id").limit(0),
      upserts = Seq((2, "b"), (3, "c")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(s.isOptimistic, "no duplicate was hit — no reason to flip")
  }

  test("an update under the optimistic bet flips pessimistic and still applies (reference :270-289)") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // id=2 already exists: optimistic insert violates the PK, rolls back,
    // retries pessimistically — one merge call, correct final state
    s.merge(CompactedBatch(
      deletes = Seq(1).toDF("id"),
      upserts = Seq((2, "b2"), (4, "d")).toDF("id", "v")))
    assert(state(s) == Map(2 -> "b2", 4 -> "d"))
    assert(!s.isOptimistic, "the unique violation must flip the mode")
  }

  test("a clean pessimistic delete flips back to optimistic (reference :219-224)") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    s.merge(CompactedBatch(Seq(9).toDF("id"), // update → pessimistic
      Seq((2, "b2")).toDF("id", "v")))
    assert(!s.isOptimistic)
    // next batch: tombstone 1 exists, inserts are all new → the pessimistic
    // delete removes exactly the tombstone row, so the machine flips back
    s.merge(CompactedBatch(Seq(1).toDF("id"), Seq((5, "e")).toDF("id", "v")))
    assert(state(s) == Map(2 -> "b2", 5 -> "e"))
    assert(s.isOptimistic, "deleted <= tombstones must restore optimism")
  }

  test("a constraint-free pre-created target never takes the optimistic path (no silent duplicates)") {
    val url = s"jdbc:derby:memory:nopk${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE PUBLIC_T (id INTEGER, v VARCHAR(4000))")
    finally conn.close()
    val s = new JdbcTableStore(spark, url, spec)
    s.init(Seq((1, "a")).toDF("id", "v"))
    // on the optimistic path this update would insert a second id=1 row
    // undetected (no constraint to object); the probe must force pessimistic
    s.merge(CompactedBatch(
      deletes = Seq[Int]().toDF("id"),
      upserts = Seq((1, "a2")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a2"), "exactly one row per key — no duplicate")
  }

  test("adaptiveUpsert=false keeps the legacy always-pessimistic behavior") {
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:noadapt${System.nanoTime()};create=true", spec,
      adaptiveUpsert = false)
    s.init(Seq((1, "a")).toDF("id", "v"))
    s.merge(CompactedBatch(Seq[Int]().toDF("id"), Seq((1, "a2"), (2, "b")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a2", 2 -> "b"))
  }

  test("slow-delete diagnostics path executes (threshold 0 logs every delete)") {
    // Derby branch: no EXPLAIN — the WARN carries timing + SQL. The assert
    // is behavioral (merge unchanged); the log call itself must not throw.
    val s = newStore(slowLogSec = 0)
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    s.merge(CompactedBatch(Seq(1).toDF("id"), Seq((3, "c")).toDF("id", "v")))
    assert(state(s) == Map(2 -> "b", 3 -> "c"))
  }

  test("isUniqueViolation walks SQLState chains (direct, nextException, cause)") {
    def st(code: String) = new java.sql.SQLException("m", code)
    assert(JdbcTableStore.isUniqueViolation(st("23505")))
    assert(!JdbcTableStore.isUniqueViolation(st("42X05")))
    val chained = st("XJ001"); chained.setNextException(st("23505"))
    assert(JdbcTableStore.isUniqueViolation(chained))
    val caused = new java.sql.SQLException("wrap", "XJ001", st("23505"))
    assert(JdbcTableStore.isUniqueViolation(caused))
    // a cycle-free bound: self-referencing chain terminates
    val selfy = st("XJ001"); selfy.setNextException(selfy)
    assert(!JdbcTableStore.isUniqueViolation(selfy))
  }

  test("replay equivalence: adaptive JDBC store equals the parquet store over a mixed sequence") {
    val p = new ParquetTableStore(spark, tmpDir("adaptcontract"), spec, 8)
    val j = newStore()
    val initial = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val batches = Seq(
      CompactedBatch(Seq[Int]().toDF("id"), Seq((4, "d"), (5, "e")).toDF("id", "v")), // optimistic ok
      CompactedBatch(Seq(2).toDF("id"), Seq((1, "a2")).toDF("id", "v")), // flip pessimistic
      CompactedBatch(Seq(3).toDF("id"), Seq((6, "f")).toDF("id", "v")), // flip back
      CompactedBatch(Seq(6).toDF("id"), Seq((5, "e2"), (7, "g")).toDF("id", "v")))
    p.init(initial); j.init(initial)
    batches.foreach { b => p.merge(b); j.merge(b) }
    assert(p.snapshot().collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      state(j))
  }
}
