package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    println(s"[plancheck] scans=$scans reusedExchanges=$reused")
    println(df.queryExecution.executedPlan.treeString.take(4000))
    spark.stop()
  }
}
