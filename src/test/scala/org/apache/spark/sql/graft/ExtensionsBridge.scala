package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.parser.ParserInterface

/** Test-only bridge: `SparkSessionExtensions.buildParser` is
  * `private[sql]` (the session-state builder is its only production
  * caller); specs use it to assert the injected parser chain without
  * constructing a whole second SparkSession.
  */
object ExtensionsBridge {
  def buildParser(ext: SparkSessionExtensions, spark: SparkSession,
      delegate: ParserInterface): ParserInterface =
    ext.buildParser(spark, delegate)
}
