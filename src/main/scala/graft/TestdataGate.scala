package graft

import org.apache.spark.sql.SparkSession

/** Testdata-drift smoke gate for the Verify/Bench mains: compare every
  * corpus table's schema against the recorded expectation BEFORE running
  * queries, so an environment-side regeneration surfaces as one loud
  * stderr line instead of dozens of scattered analysis errors (round 7
  * lost 26 queries to events.ts silently flipping TIMESTAMP(NANOS) →
  * timestamp[us]; this gate makes the next flip a one-line diagnosis).
  *
  * Drift is reported, never fatal: readers with schema dispatch (e.g.
  * `RelationalQueries.events`) may handle the new shape fine — the gate's
  * job is attribution, not enforcement. Output goes to stderr so the
  * driver's stdout-tail JSON capture stays clean.
  */
object TestdataGate {

  /** table → sorted `name:simpleString` fingerprint, recorded from the
    * 2026-08-13 testdata regeneration. The corpus writes parquet
    * TIMESTAMP(µs, isAdjustedToUTC = false), which Spark 4 surfaces as
    * `timestamp_ntz` (`spark.sql.parquet.inferTimestampNTZ` defaults on);
    * with the session pinned UTC the ntz values compare identically to
    * instants, and `RelationalQueries.events` normalizes its ts to a plain
    * timestamp via its NTZ branch.
    */
  private[graft] val expected: Map[String, String] = Map(
    "customer" -> "c_acctbal:double,c_custkey:bigint,c_mktsegment:string,c_name:string,c_nationkey:int",
    "documents" -> "doc_id:bigint,lang:string,n_chars:bigint,source:string,text:string",
    "embeddings" -> "embedding:array<float>,label:int,vec_id:bigint",
    "events" -> "event_id:bigint,event_type:string,props:string,ts:timestamp_ntz,user_id:bigint,value:double",
    "lineitem" -> ("l_discount:double,l_extendedprice:double,l_linenumber:int," +
      "l_linestatus:string,l_orderkey:bigint,l_partkey:bigint,l_quantity:double," +
      "l_returnflag:string,l_shipdate:timestamp_ntz,l_suppkey:bigint,l_tax:double"),
    "nation" -> "n_name:string,n_nationkey:int,n_regionkey:int",
    "orders" -> ("o_custkey:bigint,o_orderdate:timestamp_ntz,o_orderkey:bigint," +
      "o_orderpriority:string,o_orderstatus:string,o_totalprice:double"),
    "part" -> "p_brand:string,p_name:string,p_partkey:bigint,p_retailprice:double,p_size:int,p_type:string",
    "region" -> "r_name:string,r_regionkey:int",
    "supplier" -> "s_acctbal:double,s_name:string,s_nationkey:int,s_suppkey:bigint")

  private[graft] def fingerprint(spark: SparkSession, path: String): String =
    spark.read.parquet(path).schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").sorted.mkString(",")

  /** One stderr line when everything matches; one line per drifted /
    * unreadable table otherwise.
    */
  def check(spark: SparkSession, sfDir: String): Unit = {
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (table, want) =>
      val got =
        try fingerprint(spark, s"$sfDir/$table.parquet")
        // NonFatal only: a missing/corrupt table is drift to report, but a
        // VirtualMachineError must abort the run, not become a drift line
        catch { case scala.util.control.NonFatal(e) =>
          s"UNREADABLE(${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)})"
        }
      if (got == want) None else Some((table, want, got))
    }
    if (drifted.isEmpty)
      // stdout, not stderr: the driver tags captured stderr as [error],
      // and the happy-path confirmation must not be the one line keeping
      // the bench tail noisy. Drift stays on stderr — loud, and genuine.
      println(
        s"[gate] testdata schemas match expected (${expected.size} tables) at $sfDir")
    else drifted.foreach { case (table, want, got) =>
      System.err.println(
        s"[gate] SCHEMA DRIFT $sfDir/$table.parquet\n[gate]   expected $want\n[gate]   actual   $got")
    }
  }
}
