package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: decompose windowLong's cost at medium scale. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val nCh = 16
    val nSamples = 2000000L
    val stride = 65536
    val context = 1024
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def long = spark.range(nCh * nSamples)
      .select(lit("soak").as("series"), (col("id") % nCh).cast("int").as("channel"),
        lit(null).cast("int").as("band"), lit(10000.0).as("rate"),
        lit(0.0).as("startingTime"), (col("id") / nCh).cast("long").as("t_idx"),
        (sin(col("id") / nCh / 100.0) + sin(col("id") / nCh / 7.0) * 0.3 +
          (pmod(xxhash64(col("id")), lit(10000)) / 10000.0 - 0.5) * 0.1).as("value"))
    time("raw scan (count)") { long.count() }
    time("raw scan x2 (foreach)") { long.foreach(_ => ()) }
    time("windowLong context=0") {
      Windowing.windowLong(long, stride, 0).foreach(_ => ())
    }
    time("windowLong context=1024") {
      Windowing.windowLong(long, stride, context).foreach(_ => ())
    }
    time("shuffle only (repartition by key, no agg)") {
      long.withColumn("_w", floor(col("t_idx") / stride).cast("long"))
        .repartition(col("series"), col("channel"), col("_w"))
        .foreach(_ => ())
    }
    time("agg only after explode-less keying (groupBy+assemble)") {
      long.withColumn("_w", floor(col("t_idx") / stride).cast("long"))
        .groupBy("series", "channel", "band", "rate", "startingTime", "_w")
        .agg(graft.functions.SeriesAssembleFunctions.assembleSeries(
          spark, col("t_idx").cast("long"), col("value").cast("double")).as("values"))
        .foreach(_ => ())
    }
    spark.stop()
  }
}
