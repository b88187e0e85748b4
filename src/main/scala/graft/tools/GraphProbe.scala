package graft.tools

import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing probe for the graph pack — separates the co-occurrence
  * edge build from each operator's own cost (the bench times them fused),
  * so a regression can be attributed before touching either. Run:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.GraphProbe"`.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()

    // stage breakdown of the co-occurrence build
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("g"), col("l_partkey").as("n"))
      .where(col("g").isNotNull && col("n").isNotNull)
    time("li distinct")(println(s"[probe] distinct = ${li.distinct().count()}"))
    time("li distinct+sizes+join") {
      val nodes = li.distinct()
      val sizes = nodes.groupBy("g").agg(count(lit(1)).as("sz"))
      println(s"[probe] ok = ${nodes.join(sizes.filter(col("sz") <= 1000), Seq("g")).count()}")
    }
    time("full build no persist") {
      println(s"[probe] edges = ${Graph.cooccurrenceEdges(
        spark.read.parquet(s"$dir/lineitem.parquet"),
        "l_orderkey", "l_partkey", minWeight = 1).count()}")
    }

    val edges = time("edges build+count") {
      val e = Graph.cooccurrenceEdges(
        spark.read.parquet(s"$dir/lineitem.parquet"),
        "l_orderkey", "l_partkey", minWeight = 1).select("a", "b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] edges = ${e.count()}")
      e
    }
    time("pagerank 5 rounds (on persisted edges)") {
      Graph.pagerankInt(edges, iterations = 5)
        .orderBy(desc("rank")).limit(20).collect()
    }
    time("pagerank 1 round (on persisted edges)") {
      Graph.pagerankInt(edges, iterations = 1)
        .orderBy(desc("rank")).limit(20).collect()
    }
    time("triangles (broadcast, persisted edges)") {
      Graph.triangles(edges, broadcastEdges = true)
        .orderBy(desc("n_tri")).limit(20).collect()
    }
    spark.stop()
  }
}
