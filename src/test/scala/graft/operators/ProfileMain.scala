package graft.operators

import org.apache.spark.sql.SparkSession
import graft.model.Synthetic

/** Dev profiling harness (not a test): times each stage of the flagship path. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val raw = time("synthetic")(Synthetic.segments(spark, 4.0, 8, 1000.0, seed = 5))
    time("raw count")(raw.count())
    val notched = DspOperators.applyLinenoiseNotch(raw)
    time("notch collect")(notched.collect())
    val cfg = Pipeline.Config(initialRate = 1000.0, finalRate = None,
      filters = "human", hgOnly = true, scaling = 1.0)
    val resampled = time("resample")(DspOperators.resample(raw, 1000.0))
    time("resample count")(resampled.count())
    val car = time("car")(CommonReferencing.subtractCarSegments(notched, 8))
    time("car count")(car.count())
    val wav = DspOperators.waveletTransform(car, "human", hgOnly = true)
    time("wavelet count")(wav.count())
    val amp = DspOperators.amplitude(wav)
    time("amp count")(amp.count())
    val z = time("zscore")(DspOperators.zscoreSegments(amp, 125))
    time("zscore count")(z.count())
    val hg = time("hg trace build")(Pipeline.highGammaTrace(amp, 125))
    time("hg collect")(hg.collect())
    spark.stop()
  }
}
