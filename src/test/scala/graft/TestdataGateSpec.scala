package graft

import org.apache.spark.sql.functions._

class TestdataGateSpec extends SparkTestBase {
  import spark.implicits._

  test("fingerprint is the sorted name:type list of the parquet schema") {
    val dir = tmpDir("gate")
    Seq((1L, "x", 0.5)).toDF("b_key", "a_name", "c_val")
      .withColumn("d_ts", lit("2021-01-01 00:00:00").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(TestdataGate.fingerprint(spark, s"$dir/t.parquet") ==
      "a_name:string,b_key:bigint,c_val:double,d_ts:timestamp")
  }

  test("expected map covers the full driver corpus") {
    assert(TestdataGate.expected.keySet == Set(
      "region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings"))
  }

  test("check reports drift per table and silence on match") {
    val dir = tmpDir("gate-drift")
    // a 'region' table with a WRONG schema must produce a drift line
    Seq((1, "a", "extra")).toDF("r_regionkey", "r_name", "r_comment")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true))
    try TestdataGate.check(spark, dir)
    finally System.setErr(old)
    val out = buf.toString
    assert(out.contains("SCHEMA DRIFT") && out.contains("region.parquet"))
    // missing tables are reported unreadable, not thrown
    assert(out.contains("events.parquet") && out.contains("UNREADABLE"))
  }
}
