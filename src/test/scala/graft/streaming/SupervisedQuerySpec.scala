package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

object SupervisedQuerySpec {
  // static so executors/restarts share them within the test JVM
  val failures = new AtomicInteger(0)
  val seen = new ConcurrentLinkedQueue[String]()
}

class SupervisedQuerySpec extends SparkTestBase {

  private def fileStream(in: String, ckpt: String)(each: DataFrame => Unit) = () =>
    spark.readStream.text(in).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) => each(b) }
      .start()

  test("a transient failure is restarted and the batch replays from the checkpoint") {
    import SupervisedQuerySpec._
    failures.set(1) // fail exactly once
    seen.clear()
    val in = tmpDir("sup-in")
    Files.write(Paths.get(in, "f0.txt"), "hello\nworld".getBytes)
    val sup = new SupervisedQuery(fileStream(in, tmpDir("sup-ckpt")) { b =>
      if (failures.getAndDecrement() > 0) throw new RuntimeException("transient")
      b.collect().foreach(r => seen.add(r.getString(0)))
    }, maxRestarts = 3).start()
    try {
      sup.processAllAvailable()
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline && seen.size < 2) Thread.sleep(100)
      assert(seen.size == 2, s"batch should replay after restart, saw $seen")
      assert(sup.restarts == 1)
      assert(sup.state == "NORMAL")
      assert(sup.lastError.exists(_.contains("transient")))
    } finally sup.stop()
  }

  test("a persistent failure exhausts the budget and poisons the pipeline (O2)") {
    import SupervisedQuerySpec._
    failures.set(Int.MaxValue)
    val in = tmpDir("sup-in2")
    Files.write(Paths.get(in, "f0.txt"), "boom".getBytes)
    val sup = new SupervisedQuery(fileStream(in, tmpDir("sup-ckpt2")) { _ =>
      throw new RuntimeException("persistent")
    }, maxRestarts = 2).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline && sup.state == "NORMAL") Thread.sleep(100)
      assert(sup.state == "ERROR")
      assert(sup.restarts == 2)
    } finally sup.stop()
    // ERROR is terminal: a shutdown hook's routine stop() must not repaint
    // the poisoned pipeline as cleanly STOPPED for post-shutdown state reads
    assert(sup.state == "ERROR", "stop() must not overwrite the ERROR state")
  }

  test("processAllAvailable enforces its deadline even while blocked inside the query") {
    import SupervisedQuerySpec._
    failures.set(0)
    seen.clear()
    val in = tmpDir("sup-in3")
    Files.write(Paths.get(in, "f0.txt"), "slow".getBytes)
    // a foreachBatch that wedges (stalled JDBC target, hung broker poll):
    // the bare processAllAvailable() call would block forever
    val sup = new SupervisedQuery(fileStream(in, tmpDir("sup-ckpt3")) { _ =>
      Thread.sleep(120000)
    }, maxRestarts = 0).start()
    try {
      val t0 = System.currentTimeMillis()
      val e = intercept[IllegalStateException](sup.processAllAvailable(deadlineMs = 2000))
      val took = System.currentTimeMillis() - t0
      assert(e.getMessage.contains("did not complete"))
      assert(took < 60000, s"deadline must fire while blocked, took ${took}ms")
    } finally sup.stop()
  }
}
