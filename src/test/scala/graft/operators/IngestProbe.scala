package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: decompose windowLong's cost stage by stage.
  *
  * Run: sbt "Test/runMain graft.operators.IngestProbe [nCh] [nSamples]"
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val nCh = if (args.length > 0) args(0).toInt else 16
    val nSamples = if (args.length > 1) args(1).toLong else 2000000L
    val stride = 65536
    val context = 1024
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[probe] $nCh ch x $nSamples samples = ${nCh * nSamples / 1e6} M points")
    def long = spark.range(nCh * nSamples)
      .select(lit("soak").as("series"), (col("id") % nCh).cast("int").as("channel"),
        lit(null).cast("int").as("band"), lit(10000.0).as("rate"),
        lit(0.0).as("startingTime"), (col("id") / nCh).cast("long").as("t_idx"),
        (sin(col("id") / nCh / 100.0) + sin(col("id") / nCh / 7.0) * 0.3 +
          (pmod(xxhash64(col("id")), lit(10000)) / 10000.0 - 0.5) * 0.1).as("value"))
    time("raw scan (count)") { long.count() }
    time("raw scan x2 (foreach)") { long.foreach(_ => ()) }
    time("fragments only (map-side pack, narrow)") {
      Windowing.fragments(long, stride, context).foreach(_ => ())
    }
    time("windowLong context=0") {
      Windowing.windowLong(long, stride, 0).foreach(_ => ())
    }
    time("windowLong context=1024") {
      Windowing.windowLong(long, stride, context).foreach(_ => ())
    }
    time("fragments+join+explode, no agg (context=1024)") {
      val nWins = long.groupBy("series", "channel")
        .agg((floor(max(col("t_idx")) / stride) + 1).cast("long").as("_nw"))
      val core = floor(col("t0") / stride).cast("long")
      val r = pmod(col("t0"), lit(stride))
      Windowing.fragments(long, stride, context).toDF()
        .join(broadcast(nWins), Seq("series", "channel"))
        .withColumn("_w", explode(array_compact(array(
          core,
          when(r < context && col("t0") >= stride, core - 1),
          when(r >= stride - context && core + 1 < col("_nw"), core + 1)))))
        .foreach(_ => ())
    }
    time("OLD windowLong c=1024 (per-sample join+explode+assemble_series)") {
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
    time("nWins agg alone (max t per trace)") {
      long.groupBy("series", "channel")
        .agg((floor(max(col("t_idx")) / stride) + 1).cast("long").as("_nw"))
        .foreach(_ => ())
    }
    time("shuffle only (repartition by key, no agg)") {
      long.withColumn("_w", floor(col("t_idx") / stride).cast("long"))
        .repartition(col("series"), col("channel"), col("_w"))
        .foreach(_ => ())
    }
    time("agg only after explode-less keying (groupBy+assemble_series, old shape)") {
      long.withColumn("_w", floor(col("t_idx") / stride).cast("long"))
        .groupBy("series", "channel", "band", "rate", "startingTime", "_w")
        .agg(graft.functions.SeriesAssembleFunctions.assembleSeries(
          spark, col("t_idx").cast("long"), col("value").cast("double")).as("values"))
        .foreach(_ => ())
    }
    spark.stop()
  }
}
