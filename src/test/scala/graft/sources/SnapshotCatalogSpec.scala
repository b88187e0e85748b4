package graft.sources

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-table consistent snapshots ([[SnapshotCatalog]]): a reader must
  * see every table at ONE committed micro-batch boundary, even while the
  * writer is mid-batch — the torn-read window the per-table manifests
  * leave open.
  */
class SnapshotCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private val specA = TableSpec("public.ta",
    StructType(Seq(StructField("id", LongType), StructField("v", LongType))),
    Seq("id"))
  private val specB = TableSpec("public.tb",
    StructType(Seq(StructField("id", LongType), StructField("w", LongType))),
    Seq("id"))

  private def mkStores(tag: String): (ParquetTableStore, ParquetTableStore, SnapshotCatalog, String) = {
    val root = tmpDir(s"cat_$tag")
    val sa = new ParquetTableStore(spark, root, specA, 4, retainedVersions = 2)
    val sb = new ParquetTableStore(spark, root, specB, 4, retainedVersions = 2)
    val cat = new SnapshotCatalog(spark, root,
      Map("public.ta" -> sa, "public.tb" -> sb))
    (sa, sb, cat, root)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  test("snapshotAll serves one committed boundary across both tables") {
    val (sa, sb, cat, _) = mkStores("basic")
    sa.init((1L to 10L).map(i => (i, i * 10)).toDF("id", "v"))
    sb.init((1L to 10L).map(i => (i, i * 100)).toDF("id", "w"))
    cat.commit()
    val snap = cat.snapshotAll()
    assert(rows(snap("public.ta")) == (1L to 10L).map(i => (i, i * 10)).toSet)
    assert(rows(snap("public.tb")) == (1L to 10L).map(i => (i, i * 100)).toSet)
  }

  test("mid-batch crash: catalog readers stay on the previous consistent pair") {
    val (sa, sb, cat, _) = mkStores("crash")
    sa.init((1L to 10L).map(i => (i, i)).toDF("id", "v"))
    sb.init((1L to 10L).map(i => (i, i)).toDF("id", "w"))
    cat.commit()
    // batch merges table A, then the writer dies BEFORE merging B /
    // committing the catalog
    sa.merge(CompactedBatch(
      deletes = Seq(1L).toDF("id"),
      upserts = Seq((2L, 999L)).toDF("id", "v")))
    // direct store read sees the torn state...
    assert(rows(sa.snapshot()).contains((2L, 999L)))
    // ...but the catalog still serves the consistent pre-batch boundary
    val snap = cat.snapshotAll()
    assert(rows(snap("public.ta")) == (1L to 10L).map(i => (i, i)).toSet,
      "catalog must not see table A's uncommitted batch")
    assert(rows(snap("public.tb")) == (1L to 10L).map(i => (i, i)).toSet)
    // recovery: the replay re-merges A (idempotent), merges B, commits —
    // the catalog then moves BOTH tables to the new boundary together
    sa.merge(CompactedBatch(
      deletes = Seq(1L).toDF("id"),
      upserts = Seq((2L, 999L)).toDF("id", "v")))
    sb.merge(CompactedBatch(
      deletes = Seq(1L).toDF("id"),
      upserts = Seq((2L, 888L)).toDF("id", "w")))
    cat.commit()
    val snap2 = cat.snapshotAll()
    assert(rows(snap2("public.ta")) ==
      ((2L to 10L).map(i => (i, i)).toSet - ((2L, 2L)) + ((2L, 999L))))
    assert(rows(snap2("public.tb")) ==
      ((2L to 10L).map(i => (i, i)).toSet - ((2L, 2L)) + ((2L, 888L))))
  }

  test("a snapshotAll resolved BEFORE a batch still reads the old boundary after it") {
    val (sa, sb, cat, _) = mkStores("stable")
    sa.init((1L to 5L).map(i => (i, i)).toDF("id", "v"))
    sb.init((1L to 5L).map(i => (i, i)).toDF("id", "w"))
    cat.commit()
    val before = cat.snapshotAll() // resolve versions NOW
    sa.merge(CompactedBatch(Seq(1L).toDF("id"), Seq.empty[(Long, Long)].toDF("id", "v")))
    sb.merge(CompactedBatch(Seq(1L).toDF("id"), Seq.empty[(Long, Long)].toDF("id", "w")))
    cat.commit()
    // the pre-batch resolution still evaluates the old retained versions
    assert(rows(before("public.ta")) == (1L to 5L).map(i => (i, i)).toSet)
    assert(rows(before("public.tb")) == (1L to 5L).map(i => (i, i)).toSet)
  }

  test("guard rails: retention requirement, empty catalog, unknown table") {
    val root = tmpDir("cat_guard")
    val s1 = new ParquetTableStore(spark, root, specA, 4) // retainedVersions = 1
    intercept[IllegalArgumentException] {
      new SnapshotCatalog(spark, root, Map("public.ta" -> s1))
    }
    val (sa, sb, cat, _) = mkStores("guard2")
    intercept[IllegalArgumentException](cat.snapshotAll()) // nothing committed
    sa.init(Seq((1L, 1L)).toDF("id", "v"))
    sb.init(Seq((1L, 1L)).toDF("id", "w"))
    cat.commit()
    intercept[IllegalArgumentException](cat.snapshot("public.nope"))
  }

  test("boundary history: cross-table time travel and pruning") {
    val root = tmpDir("cat_hist")
    val sa = new ParquetTableStore(spark, root, specA, 4, retainedVersions = 4)
    val sb = new ParquetTableStore(spark, root, specB, 4, retainedVersions = 4)
    val cat = new SnapshotCatalog(spark, root,
      Map("public.ta" -> sa, "public.tb" -> sb), retainedBoundaries = 2)
    sa.init((1L to 5L).map(i => (i, i)).toDF("id", "v"))
    sb.init((1L to 5L).map(i => (i, i)).toDF("id", "w"))
    cat.commit() // b1
    sa.merge(CompactedBatch(Seq(1L).toDF("id"), Seq((6L, 6L)).toDF("id", "v")))
    cat.commit() // b2
    sb.merge(CompactedBatch(Seq(2L).toDF("id"), Seq((7L, 7L)).toDF("id", "w")))
    cat.commit() // b3 — prunes b1
    assert(cat.boundaries() === Seq(2L, 3L))
    intercept[IllegalArgumentException](cat.at(1L))
    // b2: ta post-batch-1, tb still initial
    val snapB2 = cat.snapshotAllAt(2L)
    assert(rows(snapB2("public.ta")) ==
      ((2L to 5L).map(i => (i, i)) :+ (6L, 6L)).toSet)
    assert(rows(snapB2("public.tb")) == (1L to 5L).map(i => (i, i)).toSet)
  }

  test("changeFeedsBetween: consistent per-table feeds, unchanged tables omitted") {
    val root = tmpDir("cat_feed")
    val sa = new ParquetTableStore(spark, root, specA, 4, retainedVersions = 4)
    val sb = new ParquetTableStore(spark, root, specB, 4, retainedVersions = 4)
    val cat = new SnapshotCatalog(spark, root,
      Map("public.ta" -> sa, "public.tb" -> sb), retainedBoundaries = 3)
    sa.init((1L to 5L).map(i => (i, i)).toDF("id", "v"))
    sb.init((1L to 5L).map(i => (i, i)).toDF("id", "w"))
    cat.commit() // b1
    sa.merge(CompactedBatch(Seq(3L).toDF("id"), Seq((8L, 80L)).toDF("id", "v")))
    cat.commit() // b2: only ta moved
    val feeds = cat.changeFeedsBetween(1L, 2L)
    assert(feeds.keySet === Set("public.ta"),
      "unchanged tb must be omitted from the feed map")
    val fa = feeds("public.ta").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(fa === Set((3L, 3L, "delete"), (8L, 80L, "insert")))
    intercept[IllegalArgumentException](cat.changeFeedsBetween(2L, 1L))
  }

  test("single-writer lease: a second committer fails loudly; takeover fences") {
    val (sa, sb, cat, root) = mkStores("lease")
    sa.init((1L to 5L).map(i => (i, i)).toDF("id", "v"))
    sb.init((1L to 5L).map(i => (i, i)).toDF("id", "w"))
    cat.commit() // claims the writer token
    // a SECOND catalog instance (fresh random writerId) on the same root:
    // reads work, its commit must fail loudly instead of interleaving
    val intruder = new SnapshotCatalog(spark, root,
      Map("public.ta" -> sa, "public.tb" -> sb))
    assert(intruder.current().nonEmpty, "reads are never fenced")
    val e = intercept[IllegalStateException](intruder.commit())
    assert(e.getMessage.contains("single-writer"))
    cat.commit() // the owner keeps committing
    // takeover: the intruder fences the (presumed dead) owner out —
    // now the OLD owner's commit fails loudly
    intruder.takeover()
    intruder.commit()
    val e2 = intercept[IllegalStateException](cat.commit())
    assert(e2.getMessage.contains("single-writer"))
  }

  test("MOR stores in the catalog: boundary snapshots and feeds over the trait") {
    val root = tmpDir("cat_mor")
    val sa = new MorTableStore(spark, root, specA, 4)
    val sb = new ParquetTableStore(spark, root, specB, 4, retainedVersions = 3)
    val cat = new SnapshotCatalog(spark, root,
      Map("public.ta" -> sa, "public.tb" -> sb), retainedBoundaries = 3)
    sa.init((1L to 8L).map(i => (i, i)).toDF("id", "v"))
    sb.init((1L to 8L).map(i => (i, i)).toDF("id", "w"))
    cat.commit() // b1
    // a mixed batch: the MOR table merges (seq advances), CoW merges too
    sa.merge(CompactedBatch(Seq(2L).toDF("id"),
      Seq((1L, 99L), (9L, 90L)).toDF("id", "v")))
    sb.merge(CompactedBatch(Seq(3L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("id", "w")))
    cat.commit() // b2
    // cross-table time travel reaches the MOR store's seq history
    val atB1 = cat.snapshotAllAt(1L)
    assert(rows(atB1("public.ta")) === (1L to 8L).map(i => (i, i)).toSet)
    val atB2 = cat.snapshotAllAt(2L)
    assert(rows(atB2("public.ta")) ===
      ((3L to 8L).map(i => (i, i)).toSet + ((1L, 99L)) + ((9L, 90L))))
    // consistent per-table feeds across the same boundaries, MOR included
    val feeds = cat.changeFeedsBetween(1L, 2L)
    assert(feeds.keySet === Set("public.ta", "public.tb"))
    val fa = feeds("public.ta").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    assert(fa === Set((2L, Some(2L), "delete"),
      (1L, Some(1L), "update_pre"), (1L, Some(99L), "update_post"),
      (9L, Some(90L), "insert")))
  }

  test("single-writer lease: a restart under the same writerId reclaims silently") {
    val root = tmpDir("cat_lease2")
    val sa = new ParquetTableStore(spark, root, specA, 4, retainedVersions = 2)
    val c1 = new SnapshotCatalog(spark, root, Map("public.ta" -> sa),
      writerId = "loader-1")
    sa.init((1L to 3L).map(i => (i, i)).toDF("id", "v"))
    c1.commit()
    // the process restarts: a new instance with the SAME deployment
    // identity continues without any takeover ceremony
    val c2 = new SnapshotCatalog(spark, root, Map("public.ta" -> sa),
      writerId = "loader-1")
    sa.merge(CompactedBatch(Seq(1L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("id", "v")))
    c2.commit()
    assert(c2.boundaries().last == 2L, "the reclaimed writer advanced the boundary")
  }
}
