package graft.parse

import graft.SparkTestBase
import graft.model.{TableRegistry, TableSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EnvelopeParsersSpec extends SparkTestBase {
  import spark.implicits._

  private val testSpec = TableSpec(
    "public.test",
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType))),
    Seq("id"))
  private val registry = TableRegistry(
    Map("demo.test" -> "public.test"),
    Map("public.test" -> testSpec))

  // FIXTURES.md §2 Maxwell fixture
  private val maxwellUpdate =
    """{"database":"demo","table":"test","type":"update","ts":1505886758,
      |"data":{"id":2,"name":"after"},"old":{"id":1,"name":"before"}}""".stripMargin.replace("\n", "")

  test("maxwell envelope: update with PK change") {
    val raw = Seq(maxwellUpdate).toDF("value")
    val ev = MaxwellParser.events(raw, registry, lit(1L))
    val r = ev.head()
    assert(r.getAs[String]("op") == "update")
    assert(r.getAs[String]("sourceTable") == "demo.test")
    assert(r.getAs[String]("mappedTable") == "public.test")
    assert(r.getAs[Long]("ts") == 1505886758000L)
    assert(r.getAs[Map[String, String]]("data") == Map("id" -> "2", "name" -> "after"))
    assert(r.getAs[Map[String, String]]("old") == Map("id" -> "1", "name" -> "before"))

    val typed = Projection.typed(ev, testSpec).head()
    assert(typed.getAs[org.apache.spark.sql.Row]("key").getInt(0) == 2)
    assert(typed.getAs[org.apache.spark.sql.Row]("oldKey").getInt(0) == 1)
    assert(typed.getAs[org.apache.spark.sql.Row]("data").getString(1) == "after")
  }

  test("maxwell: unmapped tables are dropped (F1) and bookkeeping dbs ignored") {
    val raw = Seq(
      maxwellUpdate,
      """{"database":"maxwell","table":"positions","type":"insert","ts":1,"data":{"id":9}}""")
      .toDF("value")
    val ev = MaxwellParser.events(raw, registry, lit(1L))
    assert(ev.count() == 1)
  }

  test("maxwell: update without PK change has null oldKey (M5)") {
    val raw = Seq(
      """{"database":"demo","table":"test","type":"update","ts":2,
        |"data":{"id":7,"name":"n2"},"old":{"name":"n1"}}""".stripMargin.replace("\n", ""))
      .toDF("value")
    val typed = Projection.typed(MaxwellParser.events(raw, registry, lit(1L)), testSpec).head()
    assert(typed.getAs[org.apache.spark.sql.Row]("key").getInt(0) == 7)
    assert(typed.isNullAt(typed.fieldIndex("oldKey")))
  }

  test("maxwell: delete keeps key, null data") {
    val raw = Seq(
      """{"database":"demo","table":"test","type":"delete","ts":3,"data":{"id":5,"name":"x"}}""")
      .toDF("value")
    val typed = Projection.typed(MaxwellParser.events(raw, registry, lit(1L)), testSpec).head()
    assert(typed.getAs[org.apache.spark.sql.Row]("key").getInt(0) == 5)
    assert(typed.isNullAt(typed.fieldIndex("data")))
  }

  test("case-insensitive field lookup (mixed-case alphA column)") {
    val spec = TableSpec("public.t2",
      StructType(Seq(StructField("id", IntegerType), StructField("alphA", StringType))),
      Seq("id"))
    val reg = TableRegistry(Map("demo.t2" -> "public.t2"), Map("public.t2" -> spec))
    val raw = Seq(
      """{"database":"demo","table":"t2","type":"insert","ts":1,"data":{"ID":3,"ALPHA":"v"}}""")
      .toDF("value")
    val typed = Projection.typed(MaxwellParser.events(raw, reg, lit(1L)), spec).head()
    val data = typed.getAs[org.apache.spark.sql.Row]("data")
    assert(data.getInt(0) == 3 && data.getString(1) == "v")
  }

  test("payload keys differing only in case fold first-match, not crash") {
    // legal with quoted pg columns "ID" and "id": a plain transform_keys
    // lower() hits Spark's duplicate-map-key EXCEPTION policy and kills
    // the batch; the reference resolves first-match (BiremeUtility.java:40-64)
    val raw = Seq(
      """{"database":"demo","table":"test","type":"insert","ts":1,"data":{"ID":7,"id":8,"name":"x"}}""")
      .toDF("value")
    val ev = MaxwellParser.events(raw, registry, lit(1L)).head()
    val data = ev.getAs[Map[String, String]]("data")
    assert(data("id") == "7", "first occurrence must win the fold")
    assert(data("name") == "x")
  }

  test("pk declared in a different case than the schema field resolves (not crashes)") {
    // TableSpec validates pkCols case-insensitively; typed() must resolve
    // the same way — a case-sensitive fieldIndex accepted this spec at
    // construction and then threw on the first batch
    val spec = TableSpec("public.t3",
      StructType(Seq(StructField("Id", IntegerType), StructField("v", StringType))),
      Seq("id"))
    val reg = TableRegistry(Map("demo.t3" -> "public.t3"), Map("public.t3" -> spec))
    val raw = Seq(
      """{"database":"demo","table":"t3","type":"insert","ts":1,"data":{"id":4,"v":"a"}}""")
      .toDF("value")
    val typed = Projection.typed(MaxwellParser.events(raw, reg, lit(1L)), spec).head()
    assert(typed.getAs[org.apache.spark.sql.Row]("key").getInt(0) == 4)
  }

  // FIXTURES.md §2 Debezium fixture
  test("debezium envelope: u/c/d op mapping and before/after selection") {
    val reg = TableRegistry(Map("public.test" -> "public.test"), Map("public.test" -> testSpec))
    val raw = Seq(
      ("""{"payload":{"op":"u","ts_ms":1505886758000,"before":{"id":1,"name":"x"},"after":{"id":1,"name":"y"}}}""", "db.public.test"),
      ("""{"payload":{"op":"c","ts_ms":2,"before":null,"after":{"id":2,"name":"b"}}}""", "db.public.test"),
      ("""{"payload":{"op":"d","ts_ms":3,"before":{"id":3,"name":"c"},"after":null}}""", "db.public.test"),
      ("""{"payload":null}""", "db.public.test"))
      .toDF("value", "topic")
    val ev = DebeziumParser.events(raw, reg, lit(1L), col("topic")).collect()
    assert(ev.length == 3)
    val byOp = ev.map(r => r.getAs[String]("op") -> r.getAs[Map[String, String]]("data")).toMap
    assert(byOp("update") == Map("id" -> "1", "name" -> "y"))
    assert(byOp("insert") == Map("id" -> "2", "name" -> "b"))
    assert(byOp("delete") == Map("id" -> "3", "name" -> "c"))
  }

  test("debezium: dotted namespace routes via exact-prefix strip; default strip loses every event") {
    val reg = TableRegistry(Map("public.test" -> "public.test"), Map("public.test" -> testSpec))
    val raw = Seq(
      ("""{"payload":{"op":"c","ts_ms":1,"before":null,"after":{"id":1,"name":"a"}}}""",
        "prod.mysql.public.test"))
      .toDF("value", "topic")
    // Debezium topic.prefix may be dotted ("prod.mysql"): the default
    // first-segment strip yields the 3-part "mysql.public.test", which can
    // never match the table map's enforced db.table keys — SILENT total loss
    assert(DebeziumParser.events(raw, reg, lit(1L), col("topic")).isEmpty)
    // the config boot path passes the exact namespace, which routes
    val ev = DebeziumParser.events(raw, reg, lit(1L), col("topic"),
      namespace = Some("prod.mysql")).collect()
    assert(ev.length == 1)
    assert(ev.head.getAs[String]("sourceTable") == "public.test")
    assert(ev.head.getAs[String]("mappedTable") == "public.test")
    // an exact namespace must not strip a topic that merely LOOKS dotted:
    // "prod" alone is a different prefix and must not route
    assert(DebeziumParser.events(raw, reg, lit(1L), col("topic"),
      namespace = Some("prod.mysql.public")).isEmpty)
  }

  test("debezium: standard update (same PK) keeps oldKey null; PK-changing u deletes the old key") {
    val reg = TableRegistry(Map("public.test" -> "public.test"), Map("public.test" -> testSpec))
    val raw = Seq(
      // standard Debezium: PK unchanged — before must NOT surface an oldKey
      ("""{"payload":{"op":"u","ts_ms":1,"before":{"id":1,"name":"x"},"after":{"id":1,"name":"y"}}}""", "db.public.test"),
      // nonstandard producer: PK moves inside one "u" — the before image
      // must yield oldKey=2 so compaction deletes the stale row
      ("""{"payload":{"op":"u","ts_ms":2,"before":{"id":2,"name":"a"},"after":{"id":3,"name":"b"}}}""", "db.public.test"))
      .toDF("value", "topic")
    val typed = Projection.typed(
      DebeziumParser.events(raw, reg, lit(1L), col("topic")), testSpec, Projection.Debezium)
      .collect().sortBy(_.getAs[Long]("ts"))
    assert(typed(0).isNullAt(typed(0).fieldIndex("oldKey")),
      "same-PK update must null oldKey (standard streams bit-identical)")
    assert(typed(1).getAs[org.apache.spark.sql.Row]("oldKey").getInt(0) == 2)
    assert(typed(1).getAs[org.apache.spark.sql.Row]("key").getInt(0) == 3)
  }

  test("typed projection decodes binary, decimal, date, timestamp, bit (debezium)") {
    val spec = TableSpec("public.typed",
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("bin", BinaryType),
        StructField("dec", DecimalType(5, 2)),
        StructField("d", DateType),
        StructField("ts", TimestampType))
        :+ Decoders.bitField("bits", 3)
        :+ Decoders.timeField("t", 3)),
      Seq("id"))
    val reg = TableRegistry(Map("public.typed" -> "public.typed"), Map("public.typed" -> spec))
    val dec = java.util.Base64.getEncoder.encodeToString(
      java.math.BigInteger.valueOf(12345).toByteArray)
    val bin = java.util.Base64.getEncoder.encodeToString("hi".getBytes)
    val bits = java.util.Base64.getEncoder.encodeToString(Array[Byte](5))
    val raw = Seq((
      s"""{"payload":{"op":"c","ts_ms":1,"after":{"id":1,"bin":"$bin","dec":"$dec","d":"17436","ts":"1505886758123456789","bits":"$bits","t":"1505886758123456789"}}}""",
      "db.public.typed")).toDF("value", "topic")
    val typed = Projection.typed(
      DebeziumParser.events(raw, reg, lit(1L), col("topic")), spec, Projection.Debezium).head()
    val data = typed.getAs[org.apache.spark.sql.Row]("data")
    assert(new String(data.getAs[Array[Byte]]("bin")) == "hi")
    assert(data.getAs[java.math.BigDecimal]("dec").toString == "123.45")
    assert(data.getAs[java.sql.Date]("d").toString == "2017-09-27")
    assert(data.getAs[java.sql.Timestamp]("ts").toString == "2017-09-20 05:52:38.123456")
    assert(data.getAs[String]("bits") == "101")
    assert(data.getAs[String]("t") == "05:52:38.123")
  }

  test("debezium TIMESTAMP(p) truncates the fraction to the declared scale") {
    val spec = TableSpec("public.tsp",
      StructType(Seq(StructField("id", IntegerType))
        :+ Decoders.timestampField("ts3", 3)
        :+ StructField("ts6", TimestampType)),
      Seq("id"))
    val reg = TableRegistry(Map("public.tsp" -> "public.tsp"), Map("public.tsp" -> spec))
    val raw = Seq((
      """{"payload":{"op":"c","ts_ms":1,"after":{"id":1,"ts3":"1505886758123456789","ts6":"1505886758123456789"}}}""",
      "db.public.tsp")).toDF("value", "topic")
    val data = Projection.typed(
      DebeziumParser.events(raw, reg, lit(1L), col("topic")), spec, Projection.Debezium)
      .head().getAs[org.apache.spark.sql.Row]("data")
    // declared TIMESTAMP(3): fraction cut to milliseconds (reference
    // truncates to column scale, DebeziumPipeLine.java:146-174)
    assert(data.getAs[java.sql.Timestamp]("ts3").toString == "2017-09-20 05:52:38.123")
    // undeclared precision keeps the default microsecond scale
    assert(data.getAs[java.sql.Timestamp]("ts6").toString == "2017-09-20 05:52:38.123456")
  }
}
