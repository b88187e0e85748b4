package graft.model

import java.sql.DriverManager

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Registry metadata-probe edge cases that don't need a SparkSession:
  * JDBC type mapping and primary-key probe scoping.
  */
class ModelSpec extends AnyFunSuite {

  test("unconstrained NUMERIC (precision 0) maps to the widest decimal, not DECIMAL(0,0)") {
    import java.sql.Types._
    // pg-family targets report precision=0, scale=0 for a bare `numeric`
    // declaration; DecimalType(0,0) can hold no non-zero value and every
    // merge would overflow per-row far from the probe
    assert(TableRegistry.catalystType(NUMERIC, 0, 0, "t", "c") ==
      DecimalType.SYSTEM_DEFAULT)
    assert(TableRegistry.catalystType(DECIMAL, 12, 2, "t", "c") == DecimalType(12, 2))
    // beyond Spark's decimal range fails fast HERE with a clear message,
    // not at DecimalType construction
    val e = intercept[IllegalArgumentException](
      TableRegistry.catalystType(NUMERIC, 50, 2, "t", "c"))
    assert(e.getMessage.contains("NUMERIC(50,2)"))
  }

  test("unqualified PK probe scopes to the connection's current schema first") {
    val url = s"jdbc:derby:memory:pkscope${System.nanoTime()};create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // same-named table in ANOTHER schema with a DIFFERENT primary key:
      // getPrimaryKeys(null-schema, ...) searches every schema and could
      // adopt the wrong table's PK — merges would then compact/delete on
      // the wrong key
      st.execute(
        "CREATE TABLE T9 (id INTEGER NOT NULL, v VARCHAR(10), PRIMARY KEY (id))")
      st.execute("CREATE SCHEMA OTHERS")
      st.execute(
        "CREATE TABLE OTHERS.T9 (wrongpk VARCHAR(5) NOT NULL, id INTEGER, " +
          "PRIMARY KEY (wrongpk))")
    } finally conn.close()
    val reg = TableRegistry.fromJdbc(url, Map("d.t" -> "t9"), ident = _ => "T9")
    assert(reg.specFor("t9").pkCols == Seq("id"),
      "the current schema's PK must win over a same-named table elsewhere")
  }
}
