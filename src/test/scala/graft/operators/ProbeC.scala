package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: ORDER-FAIR A/B of the two-level vs per-sample windowLong —
  * alternates the two paths for `rounds` rounds in one JVM so JIT/allocator
  * warm-up favors neither; compare per-round pairs (and the min over
  * rounds). */
object ProbeC {
  def main(args: Array[String]): Unit = {
    val nCh = if (args.length > 0) args(0).toInt else 64
    val nSamples = if (args.length > 1) args(1).toLong else 10000000L
    val rounds = if (args.length > 2) args(2).toInt else 2
    val stride = 65536
    val context = 1024
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probeC] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(s"[probeC] $nCh ch x $nSamples samples = ${nCh * nSamples / 1e6} M points")
    def long = spark.range(nCh * nSamples)
      .select(lit("soak").as("series"), (col("id") % nCh).cast("int").as("channel"),
        lit(null).cast("int").as("band"), lit(10000.0).as("rate"),
        lit(0.0).as("startingTime"), (col("id") / nCh).cast("long").as("t_idx"),
        (sin(col("id") / nCh / 100.0) + sin(col("id") / nCh / 7.0) * 0.3 +
          (pmod(xxhash64(col("id")), lit(10000)) / 10000.0 - 0.5) * 0.1).as("value"))
    def oldWindowLong(): Unit = {
      val nWins = long.groupBy("series", "channel")
        .agg((floor(max(col("t_idx")) / stride) + 1).cast("long").as("_nw"))
      val core = floor(col("t_idx") / stride).cast("long")
      long
        .join(broadcast(nWins), Seq("series", "channel"))
        .withColumn("_w", explode(array_compact(array(
          core,
          when(pmod(col("t_idx"), lit(stride)) < context && col("t_idx") >= stride,
            core - 1),
          when(pmod(col("t_idx"), lit(stride)) >= stride - context && core + 1 < col("_nw"),
            core + 1)))))
        .groupBy("series", "channel", "band", "rate", "startingTime", "_w")
        .agg(graft.functions.SeriesAssembleFunctions.assembleSeries(
          spark, col("t_idx").cast("long"), col("value").cast("double")).as("values"))
        .foreach(_ => ())
    }
    for (r <- 1 to rounds) {
      time(s"round $r NEW two-level c=1024") {
        Windowing.windowLong(long, stride, context).foreach(_ => ())
      }
      time(s"round $r OLD per-sample c=1024") { oldWindowLong() }
    }
    spark.stop()
  }
}
