package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val agg = df.filter("l_linestatus = 'F'").groupBy("l_returnflag").count()
    println(agg.queryExecution.analyzed.treeString)
    println("----optimized----")
    println(agg.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
