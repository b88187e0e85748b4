package graft.sources

import graft.SparkTestBase
import graft.model.{TableRegistry, TableSpec}
import graft.operators.CompactedBatch
import org.apache.spark.sql.types._

/** The TableStore contract exercised on the JDBC sink (embedded Derby):
  * same merge scenarios TableStoreSpec runs on the Parquet store, plus the
  * single-transaction rollback the reference's loader guarantees.
  */
class JdbcTableStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.t",
    StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
    Seq("id"))

  private def newStore() = new JdbcTableStore(
    spark, s"jdbc:derby:memory:db${System.nanoTime()};create=true", spec)

  // Derby uppercases unquoted identifiers; read positionally.
  private def state(s: TableStore): Map[Int, String] =
    s.snapshot().collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("init + snapshot round-trips") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(state(s) == Map(1 -> "a", 2 -> "b"))
  }

  test("configured credentials reach every connection (driver, staging, snapshot reader)") {
    // Derby embedded accepts any credentials with auth off — the point is
    // the code PATH: a store built the reference way (target.url +
    // target.user/target.passwd) must thread them to DriverManager and the
    // JDBC reader rather than silently requiring URL-embedded creds
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:cred${System.nanoTime()};create=true", spec,
      user = Some("app"), passwd = Some("secret"))
    s.init(Seq((1, "a")).toDF("id", "v"))
    s.merge(CompactedBatch(
      deletes = Seq(1).toDF("id"),
      upserts = Seq((2, "b")).toDF("id", "v")))
    assert(state(s) == Map(2 -> "b"))
  }

  test("merge applies deletes then upserts (M6) in one transaction") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    s.merge(CompactedBatch(
      deletes = Seq(2).toDF("id"),
      upserts = Seq((1, "a2"), (4, "d")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a2", 3 -> "c", 4 -> "d"))
  }

  test("merge into a missing table creates it; deleting absent keys is a no-op (M7)") {
    val s = newStore()
    s.merge(CompactedBatch(Seq(9).toDF("id"), Seq((1, "a")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a"))
  }

  test("idempotent re-apply of the same batch (crash-replay safety)") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val batch = CompactedBatch(Seq(1).toDF("id"), Seq((2, "b2"), (5, "e")).toDF("id", "v"))
    s.merge(batch)
    val once = state(s)
    s.merge(batch)
    assert(state(s) == once && once == Map(2 -> "b2", 5 -> "e"))
  }

  test("a failing merge rolls back atomically — deletes are not left applied") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // the oversized tuple (beyond Derby's VARCHAR(32672) stage bound)
    // fails the insert stage AFTER the deletes ran; the single transaction
    // must roll both back (reference: 128-138)
    val tooLong = "x" * 40000
    val bad = CompactedBatch(Seq(1).toDF("id"), Seq((2, tooLong)).toDF("id", "v"))
    intercept[Exception](s.merge(bad))
    assert(state(s) == Map(1 -> "a", 2 -> "b"))
  }

  test("a target pre-created by the warehouse side still gets its staging table") {
    val url = s"jdbc:derby:memory:db${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE PUBLIC_T (id INTEGER, v VARCHAR(4000))")
    finally conn.close()
    val s = new JdbcTableStore(spark, url, spec)
    s.merge(CompactedBatch(Seq(9).toDF("id"), Seq((1, "a")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a"))
  }

  test("TableRegistry.fromJdbc probes target metadata and fails fast on a missing PK (§1.4)") {
    val url = s"jdbc:derby:memory:meta${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE PUBLIC_ORDERS (o_id BIGINT NOT NULL, amount DECIMAL(10,2), " +
          "note VARCHAR(100), created TIMESTAMP, PRIMARY KEY (o_id))")
      conn.createStatement().execute("CREATE TABLE PUBLIC_NOPK (x INTEGER)")
    } finally conn.close()

    val reg = TableRegistry.fromJdbc(url, Map("demo.orders" -> "public.orders"))
    val probed = reg.specFor("public.orders")
    assert(probed.pkCols == Seq("o_id"))
    assert(probed.schema == StructType(Seq(
      StructField("o_id", LongType), StructField("amount", DecimalType(10, 2)),
      StructField("note", StringType), StructField("created", TimestampType))))

    // reference: GetPrimaryKeys.java:71-83 — startup must fail, not sync
    val noPk = intercept[IllegalArgumentException](
      TableRegistry.fromJdbc(url, Map("demo.nopk" -> "public.nopk")))
    assert(noPk.getMessage.contains("primary key"))
    // a mapped table absent from the target also fails at startup
    intercept[Exception](
      TableRegistry.fromJdbc(url, Map("demo.ghost" -> "public.ghost")))
  }

  test("a registry probed from the target drives a real merge (metadata round-trip)") {
    val url = s"jdbc:derby:memory:rt${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE PUBLIC_T (id INTEGER NOT NULL, v VARCHAR(4000), PRIMARY KEY (id))")
    finally conn.close()
    val reg = TableRegistry.fromJdbc(url, Map("demo.t" -> "public.t"))
    val s = new JdbcTableStore(spark, url, reg.specFor("public.t"))
    s.init(Seq((1, "a")).toDF("id", "v"))
    s.merge(CompactedBatch(Seq(1).toDF("id"), Seq((2, "b")).toDF("id", "v")))
    assert(state(s) == Map(2 -> "b"))
  }

  test("snapshot splits into range partitions on the integral PK (no single-connection funnel)") {
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:part${System.nanoTime()};create=true", spec,
      snapshotPartitions = 4)
    s.init((1 to 100).map(i => (i, s"v$i")).toDF("id", "v"))
    val snap = s.snapshot()
    assert(snap.rdd.getNumPartitions == 4,
      "a warehouse readback must scan partition-parallel when the leading PK is integral")
    assert(snap.collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      (1 to 100).map(i => i -> s"v$i").toMap)
  }

  test("snapshot of an empty or single-key table falls back to one partition") {
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:part1${System.nanoTime()};create=true", spec,
      snapshotPartitions = 4)
    s.ensureTable()
    assert(s.snapshot().collect().isEmpty) // empty: min/max are NULL
    s.init(Seq((7, "x")).toDF("id", "v"))
    assert(state(s) == Map(7 -> "x")) // lo == hi: no range to split
  }

  test("per-merge staging tables are dropped on completion and on failure") {
    val url = s"jdbc:derby:memory:stage${System.nanoTime()};create=true"
    val s = new JdbcTableStore(spark, url, spec)
    s.init(Seq((1, "a")).toDF("id", "v"))
    s.merge(CompactedBatch(Seq(1).toDF("id"), Seq((2, "b")).toDF("id", "v")))
    intercept[Exception](s.merge(
      CompactedBatch(Seq(1).toDF("id"), Seq((2, "x" * 40000)).toDF("id", "v"))))
    val conn = java.sql.DriverManager.getConnection(url)
    val leftover = try {
      val rs = conn.getMetaData.getTables(null, null, "PUBLIC_T_S%", null)
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      try while (rs.next()) names += rs.getString("TABLE_NAME") finally rs.close()
      names.toSeq
    } finally conn.close()
    assert(leftover.isEmpty,
      s"stage tables must be per-merge and dropped in finally; found $leftover")
  }

  test("gcStages drops orphan staging tables but never the target") {
    val url = s"jdbc:derby:memory:gcstage${System.nanoTime()};create=true"
    val s = new JdbcTableStore(spark, url, spec)
    s.init(Seq((1, "a")).toDF("id", "v"))
    // simulate a JVM that died mid-merge: stage tables exist, merge never
    // completed (created out-of-band with the same naming scheme)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute("CREATE TABLE PUBLIC_T_SK_DEAD1 (id INTEGER)")
      conn.createStatement().execute(
        "CREATE TABLE PUBLIC_T_SR_DEAD1 (id INTEGER, v VARCHAR(100))")
    } finally conn.close()
    s.gcStages()
    val c2 = java.sql.DriverManager.getConnection(url)
    val remaining = try {
      val rs = c2.getMetaData.getTables(null, null, "PUBLIC_T%", null)
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      try { while (rs.next()) names += rs.getString("TABLE_NAME") } finally rs.close()
      names.toSeq
    } finally c2.close()
    assert(remaining == Seq("PUBLIC_T"), s"expected only the target, got $remaining")
    assert(state(s) == Map(1 -> "a"), "target data must survive the sweep")
  }

  test("gcStages never drops a live table that matches the stage pattern only via LIKE wildcards") {
    val url = s"jdbc:derby:memory:gclike${System.nanoTime()};create=true"
    val s = new JdbcTableStore(spark, url, spec)
    s.init(Seq((1, "a")).toDF("id", "v"))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // a REAL orphan stage...
      conn.createStatement().execute("CREATE TABLE PUBLIC_T_SK_DEAD2 (id INTEGER)")
      // ...and live siblings that match 'PUBLIC_T_SK_%' / 'PUBLIC_T_SR_%'
      // only because unescaped '_' matches any character ('_' → 'E'/'1')
      conn.createStatement().execute("CREATE TABLE PUBLIC_T_SKEW (x INTEGER)")
      conn.createStatement().execute("CREATE TABLE PUBLIC_T_SR1X (x INTEGER)")
    } finally conn.close()
    s.gcStages()
    val c2 = java.sql.DriverManager.getConnection(url)
    val remaining = try {
      val rs = c2.getMetaData.getTables(null, null, "PUBLIC_T%", null)
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      try { while (rs.next()) names += rs.getString("TABLE_NAME") } finally rs.close()
      names.toSeq.sorted
    } finally c2.close()
    assert(remaining == Seq("PUBLIC_T", "PUBLIC_T_SKEW", "PUBLIC_T_SR1X"),
      s"the sweep must drop only token-named stages, got $remaining")
  }

  test("binary and double columns merge through Derby (DISTINCT-comparable types, empty bytes kept)") {
    val binSpec = TableSpec(
      "public.bin",
      StructType(Seq(StructField("id", IntegerType),
        StructField("payload", BinaryType), StructField("score", DoubleType))),
      Seq("id"))
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:bin${System.nanoTime()};create=true", binSpec)
    val rows = Seq(
      (1, Array[Byte](1, 2, 3), 1.5),
      (2, Array.emptyByteArray, 2.5), // zero-length must NOT become NULL
      (3, null.asInstanceOf[Array[Byte]], 3.5))
    s.init(rows.toDF("id", "payload", "score"))
    // merge exercises INSERT … SELECT DISTINCT over the binary column —
    // a BLOB mapping fails here (Derby forbids DISTINCT over BLOB)
    s.merge(CompactedBatch(
      deletes = Seq(3).toDF("id"),
      upserts = Seq((4, Array[Byte](9), 4.5)).toDF("id", "payload", "score")))
    val got = s.snapshot().collect()
      .map(r => r.getInt(0) -> Option(r.getAs[Array[Byte]](1)).map(_.toSeq)).toMap
    assert(got == Map(1 -> Some(Seq[Byte](1, 2, 3)), 2 -> Some(Seq.empty[Byte]),
      4 -> Some(Seq[Byte](9))))
  }

  test("pk columns resolve case-insensitively, like TableSpec's own validation") {
    val ciSpec = TableSpec(
      "public.ci",
      StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
      Seq("ID")) // different case than the schema field
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:ci${System.nanoTime()};create=true", ciSpec)
    s.init(Seq((1, "a")).toDF("id", "v"))
    s.merge(CompactedBatch(Seq(1).toDF("id"), Seq((2, "b")).toDF("id", "v")))
    assert(s.snapshot().collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      Map(2 -> "b"))
  }

  test("snapshot of a never-created table reads as empty with the spec schema (Parquet-store parity)") {
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:virgin${System.nanoTime()};create=true", spec)
    val snap = s.snapshot()
    assert(snap.schema == spec.schema)
    assert(snap.collect().isEmpty)
  }

  test("withSnapshotForKeys: small sets use the IN pushdown, large sets the staged EXISTS — never a full pull") {
    val s = newStore()
    s.init((1 to 3000).map(i => (i, s"v$i")).toDF("id", "v"))
    // small: IN pushdown, exact membership
    val smallKeys = Seq(5, 7, 9999).toDF("id")
    val small = s.withSnapshotForKeys(smallKeys)(
      _.collect().map(r => r.getInt(0) -> r.getString(1)).toMap)
    assert(small == Map(5 -> "v5", 7 -> "v7"))
    assert(s.lastKeyedPath == "in")
    // large (> the 1024 IN limit): the key set is staged into the
    // warehouse and read back WHERE EXISTS — server-side semi join, not
    // a whole-table pull (the r10 verdict's named scale cliff)
    val bigKeys = ((1 to 1500) ++ Seq(9999, 10000)).toDF("id")
    val big = s.withSnapshotForKeys(bigKeys)(
      _.collect().map(r => r.getInt(0) -> r.getString(1)).toMap)
    assert(big == (1 to 1500).map(i => i -> s"v$i").toMap)
    assert(s.lastKeyedPath == "staged-exists",
      s"a 1502-key read must take the staged path, took ${s.lastKeyedPath}")
    // the per-call stage table is dropped on exit (gcStages finds nothing)
    s.gcStages()
    s.merge(CompactedBatch(Seq(1).toDF("id"), Seq((1, "z")).toDF("id", "v")))
    assert(state(s).get(1).contains("z"))
    // empty key set short-circuits to an empty frame with the spec schema
    val none = s.withSnapshotForKeys(Seq.empty[Int].toDF("id"))(_.count())
    assert(none == 0L)
  }

  test("withSnapshotForKeys staged readback range-partitions on the integral pk") {
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:wsfk${System.nanoTime()};create=true", spec,
      snapshotPartitions = 4)
    s.init((1 to 2000).map(i => (i, s"v$i")).toDF("id", "v"))
    val keys = (200 to 1800).toDF("id")
    val (parts, n) = s.withSnapshotForKeys(keys)(df =>
      (df.rdd.getNumPartitions, df.count()))
    assert(s.lastKeyedPath == "staged-exists")
    assert(n == 1601L)
    assert(parts == 4, s"staged readback must honor snapshotPartitions, got $parts")
  }

  test("withSnapshotForKeys staged readback parallelizes a STRING lead pk via staged buckets") {
    // r11 verdict #4: a non-integral lead key has no range-partition story,
    // so the staged table carries a Spark-computed GRAFT_BKT and the
    // readback runs one disjoint pk-join per bucket predicate — >1 JDBC
    // partition instead of the old single-connection read.
    val strSpec = TableSpec(
      "public.strkeys",
      StructType(Seq(StructField("k", StringType), StructField("v", StringType))),
      Seq("k"))
    val s = new JdbcTableStore(
      spark, s"jdbc:derby:memory:strk${System.nanoTime()};create=true", strSpec,
      snapshotPartitions = 4)
    s.init((1 to 2000).map(i => (f"key$i%05d", s"v$i")).toDF("k", "v"))
    val keys = ((200 to 1800).map(i => f"key$i%05d") :+ "absent").toDF("k")
    val (parts, got) = s.withSnapshotForKeys(keys)(df =>
      (df.rdd.getNumPartitions,
        df.collect().map(r => r.getString(0) -> r.getString(1)).toMap))
    assert(s.lastKeyedPath == "staged-exists")
    assert(parts == 4, s"string-pk staged readback must bucket-partition, got $parts")
    assert(got == (200 to 1800).map(i => f"key$i%05d" -> s"v$i").toMap)
    // stage table dropped on exit; the store still merges normally after
    s.gcStages()
    s.merge(CompactedBatch(Seq("key00200").toDF("k"),
      Seq(("key00201", "z")).toDF("k", "v")))
    val after = s.snapshot().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!after.contains("key00200") && after.get("key00201").contains("z"))
  }

  test("withSnapshotForKeys randomized differential: every path == snapshot semi-join, hostile keys included") {
    // The keyed readback has three strategies (IN pushdown / staged
    // EXISTS / staged bucketed join) chosen by size and key type; all
    // three must equal the trivial spec `snapshot() ⋉ keys`. Keys include
    // SQL-hostile shapes (quotes, spaces, unicode, empty string) — the
    // staged paths move values via PreparedStatement binds and join
    // server-side, so nothing may be string-spliced into a predicate.
    val rnd = new scala.util.Random(2026)
    val hostile = Seq("o'hara", "", "a b", "Ω≈ç√", "x''; DROP TABLE t--",
      "tab\tsep", "pct%und_er")
    val strSpec = TableSpec(
      "public.fuzzkeys",
      StructType(Seq(StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"))
    for (round <- 0 until 3) {
      val s = new JdbcTableStore(
        spark, s"jdbc:derby:memory:fz$round${System.nanoTime()};create=true",
        strSpec, snapshotPartitions = 3)
      val n = 1200 + rnd.nextInt(800) // straddles the 1024 IN limit
      val all = (0 until n).map(i => (s"k${rnd.nextInt(100000)}%05d-$i", i)) ++
        hostile.zipWithIndex.map { case (h, i) => (h, 100000 + i) }
      s.init(all.toDF("k", "v"))
      // key set: random half + all hostile + some misses
      val keys = (all.filter(_ => rnd.nextBoolean()).map(_._1) ++
        hostile ++ Seq("missing1", "missing2")).distinct
      val inLimit = if (rnd.nextBoolean()) 1024L else keys.size + 10L
      val got = s.withSnapshotForKeys(keys.toDF("k"), inLimit)(
        _.collect().map(r => r.getString(0) -> r.getInt(1)).toMap)
      val want = all.filter { case (k, _) => keys.contains(k) }.toMap
      assert(got == want,
        s"round $round path=${s.lastKeyedPath} inLimit=$inLimit: " +
          s"${(got.keySet diff want.keySet).take(3)} extra, " +
          s"${(want.keySet diff got.keySet).take(3)} missing")
    }
  }

  test("parquet and jdbc stores agree on an identical merge sequence") {
    val p = new ParquetTableStore(spark, tmpDir("contract"), spec, 8)
    val j = newStore()
    val initial = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val batches = Seq(
      CompactedBatch(Seq(2).toDF("id"), Seq((1, "a2"), (4, "d")).toDF("id", "v")),
      CompactedBatch(Seq(4, 9).toDF("id"), Seq((5, "e")).toDF("id", "v")))
    p.init(initial); j.init(initial)
    batches.foreach { b => p.merge(b); j.merge(b) }
    assert(state(p) == state(j))
  }
}
