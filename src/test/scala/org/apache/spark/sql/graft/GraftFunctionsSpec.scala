package org.apache.spark.sql.graft

import graft.SparkTestBase
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

class GraftFunctionsSpec extends SparkTestBase {

  test("register exposes graft_dot to spark.sql") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(got == 32.0)
  }

  test("graft_dot rejects wrong arity at resolution") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT graft_dot(array(1.0d)) AS d").collect())
    assert(e.getMessage.contains("2 arguments"))
  }

  test("GraftExtensions injects the same functions into a registry") {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val registry = spark.sessionState.functionRegistry.clone()
    registry.dropFunction(FunctionIdentifier("graft_dot"))
    assert(!registry.functionExists(FunctionIdentifier("graft_dot")))
    ext.registerFunctions(registry)
    assert(registry.functionExists(FunctionIdentifier("graft_dot")))
  }
}
