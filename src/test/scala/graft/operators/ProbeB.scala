package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: isolate the context>0 fragment-membership cost (join vs
  * explode vs agg). */
object ProbeB {
  def main(args: Array[String]): Unit = {
    val nCh = if (args.length > 0) args(0).toInt else 64
    val nSamples = if (args.length > 1) args(1).toLong else 4000000L
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
      println(f"[probeB] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[probeB] $nCh ch x $nSamples samples = ${nCh * nSamples / 1e6} M points")
    def long = spark.range(nCh * nSamples)
      .select(lit("soak").as("series"), (col("id") % nCh).cast("int").as("channel"),
        lit(null).cast("int").as("band"), lit(10000.0).as("rate"),
        lit(0.0).as("startingTime"), (col("id") / nCh).cast("long").as("t_idx"),
        (sin(col("id") / nCh / 100.0) + sin(col("id") / nCh / 7.0) * 0.3 +
          (pmod(xxhash64(col("id")), lit(10000)) / 10000.0 - 0.5) * 0.1).as("value"))
    def nWins = long.groupBy("series", "channel")
      .agg((floor(max(col("t_idx")) / stride) + 1).cast("long").as("_nw"))
    val core = floor(col("t0") / stride).cast("long")
    val r = pmod(col("t0"), lit(stride))
    def membered(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("_w", explode(array_compact(array(
        core,
        when(r < context && col("t0") >= stride, core - 1),
        when(r >= stride - context && core + 1 < col("_nw"), core + 1)))))

    time("A fragments.foreach (warm)") {
      Windowing.fragments(long, stride, context).foreach(_ => ())
    }
    time("B frags count (rows)") {
      println("[probeB]   -> " + Windowing.fragments(long, stride, context).count() + " frag rows")
    }
    time("C frags.join(broadcast nWins), no explode") {
      Windowing.fragments(long, stride, context).toDF()
        .join(broadcast(nWins), Seq("series", "channel"))
        .foreach(_ => ())
    }
    time("D frags + explode with literal _nw (no join)") {
      membered(Windowing.fragments(long, stride, context).toDF()
        .withColumn("_nw", lit((nSamples - 1) / stride + 1)))
        .foreach(_ => ())
    }
    time("E frags + join + explode") {
      membered(Windowing.fragments(long, stride, context).toDF()
        .join(broadcast(nWins), Seq("series", "channel")))
        .foreach(_ => ())
    }
    time("F full windowLong context=1024") {
      Windowing.windowLong(long, stride, context).foreach(_ => ())
    }
    spark.stop()
  }
}
