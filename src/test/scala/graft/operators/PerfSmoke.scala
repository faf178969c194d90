package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{Frames, Synthetic}

/** Dev perf harness (not a test): the reference's tutorial/CI-scale workload
  * and a 10x scale-up, stage by stage. Run:
  *   sbt "Test/runMain graft.operators.PerfSmoke [nChannels] [nSeconds] [rate]"
  */
object PerfSmoke {
  def main(args: Array[String]): Unit = {
    val nCh = if (args.length > 0) args(0).toInt else 64
    val secs = if (args.length > 1) args(1).toDouble else 100.0
    val rate = if (args.length > 2) args(2).toDouble else 10000.0
    val prec = if (args.length > 3) args(3) else "double"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "12g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nSamples = (secs * rate).toLong
    println(s"[perf] $nCh ch x $nSamples samples @ $rate Hz = ${nCh * nSamples / 1e6}M points")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val raw = Synthetic.segments(spark, secs, nCh, rate, seed = 1).cache()
    time("generate+cache")(raw.count())
    val down = DspOperators.resample(raw, rate / 4, precision = prec)
    time("resample /4")(down.foreach(_ => ()))
    val notched = DspOperators.applyLinenoiseNotch(down, precision = prec).cache()
    time("notch(+resample)")(notched.count())
    val car = CommonReferencing.subtractCarSegments(notched, nCh)
    time("CAR segments")(car.foreach(_ => ()))
    val wav = DspOperators.amplitude(
      DspOperators.waveletTransform(notched, "rat", hgOnly = true, precision = prec))
    time("wavelet amp x6 bands")(wav.foreach(_ => ()))
    val full = Pipeline.preprocessBlock(raw, nCh,
      Pipeline.Config(initialRate = rate / 4, finalRate = Some(400.0), scaling = 1.0,
        precision = prec))
    time("full pipeline")(full.foreach(_ => ()))
    spark.stop()
  }
}
