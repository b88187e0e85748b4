package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.config.GraftConfig

/** Boots the production entry point end-to-end from a properties fixture:
  * config → target-DDL probe → per-table JDBC stores (config credentials) →
  * supervised replay stream → state endpoint → orderly stop. This is the
  * whole `Bireme.main` lifecycle minus only the broker socket (the replay
  * source stands in — same parse/compact/merge body).
  */
class GraftMainSpec extends SparkTestBase {

  test("boot runs the full lifecycle: replay source → JDBC target → state endpoint → stop") {
    val dir = tmpDir("gmain")
    val in = tmpDir("gmain-in")
    val dbUrl = s"jdbc:derby:memory:gmain${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(dbUrl)
    try conn.createStatement().execute(
      "CREATE TABLE PUBLIC_TEST (id INTEGER NOT NULL, name VARCHAR(100), PRIMARY KEY (id))")
    finally conn.close()

    Files.write(Paths.get(dir, "config.properties"),
      s"""target.url = $dbUrl
         |data_source = maxwell1
         |maxwell1.type = maxwell
         |maxwell1.replay.dir = $in
         |merge.interval = 1000
         |metrics.reporter = none
         |state.server.port = 0
         |state.server.addr = 127.0.0.1
         |""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "maxwell1.properties"),
      "demo.test = public.test\n".getBytes("UTF-8"))

    Files.write(Paths.get(in, "b0.json"), Seq(
      """{"database":"demo","table":"test","type":"insert","ts":1,"data":{"id":1,"name":"a"}}""",
      """{"database":"demo","table":"test","type":"insert","ts":2,"data":{"id":2,"name":"b"}}""",
      """{"database":"demo","table":"test","type":"update","ts":3,"data":{"id":1,"name":"a2"},"old":{"name":"a"}}""")
      .mkString("\n").getBytes("UTF-8"))

    val cfg = GraftConfig.load(Paths.get(dir, "config.properties").toString)
    // a replay source needs no kafka coordinates
    assert(cfg.sources.head.replayDir.contains(in))

    val running = GraftMain.boot(spark, cfg, tmpDir("gmain-work"))
    try {
      running.sources("maxwell1").processAllAvailable()

      // the JDBC target holds the merged state
      val c2 = java.sql.DriverManager.getConnection(dbUrl)
      val rows = try {
        val rs = c2.createStatement().executeQuery(
          "SELECT id, name FROM PUBLIC_TEST ORDER BY id")
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
        while (rs.next()) buf += rs.getInt(1) -> rs.getString(2)
        buf.toList
      } finally c2.close()
      assert(rows == List(1 -> "a2", 2 -> "b"))

      // the per-source state route serves this source's pipeline JSON
      val url = new java.net.URI(
        s"http://127.0.0.1:${running.stateServer.port}/maxwell1").toURL
      val body = {
        val is = url.openStream()
        try new String(is.readAllBytes(), "UTF-8") finally is.close()
      }
      assert(body.contains("\"source_name\": \"maxwell1\""))
      assert(body.contains("\"state\": \"NORMAL\""))
    } finally running.stop()
    assert(running.sources("maxwell1").state == "STOPPED")
  }
}
