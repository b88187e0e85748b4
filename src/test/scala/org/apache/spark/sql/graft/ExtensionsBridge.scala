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

  /** A sibling session over the SAME SparkContext/SharedState with the
    * given extensions installed — what specs use to exercise the
    * extensions-deployment path (resolution rules, parser) without
    * booting a second context. The classic constructor is `private[sql]`;
    * this bridge lives in the sql namespace on purpose.
    */
  def sessionWithExtensions(base: SparkSession,
      configure: SparkSessionExtensions => Unit): SparkSession = {
    val exts = new SparkSessionExtensions
    configure(exts)
    val classic = base.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the 6-arg constructor is fully private; test-only reflection
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getDeclaredConstructors.find(_.getParameterCount == 6).get
    ctor.setAccessible(true)
    ctor.newInstance(classic.sparkContext, Some(classic.sharedState), None,
      exts, Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }
}
