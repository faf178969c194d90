package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: print the physical plan of the windowLong ingest assembly. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nCh = 4
    val long = spark.range(4L * 200000)
      .select(lit("p").as("series"), (col("id") % nCh).cast("int").as("channel"),
        lit(null).cast("int").as("band"), lit(1000.0).as("rate"),
        lit(0.0).as("startingTime"), (col("id") / nCh).cast("long").as("t_idx"),
        rand(7).as("value"))
    Windowing.windowLong(long, 65536, 1024).explain("formatted")
    spark.stop()
  }
}
