package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic ECoG source mirroring the reference's generator
  * (/root/reference/src/process_nwb/utils.py:170-219): boxcar(50)-smoothed
  * white noise normalized to std·2, plus a ~1 Hz-modulated 100 Hz
  * "high gamma" component and per-channel-weighted 60 Hz harmonics.
  *
  * Deterministic per (seed, channel): each channel's trace is generated
  * inside one task from its own counter-based RNG, so the source scales to
  * any channel count with no driver-side data. The reference's own tests
  * depend only on statistical properties, not its exact bit-stream
  * (SURVEY.md §7 "hard parts" #4), and so do ours.
  */
object Synthetic {

  /** Gaussian draw k for stream (seed, channel) via SplittableRandom-style
    * counter hashing — stable across partitionings. */
  private def gauss(seed: Long, stream: Long, k: Long): Double = {
    // two uniform doubles from a splitmix64 counter, Box-Muller transform
    def mix(x0: Long): Double = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x = x ^ (x >>> 31)
      ((x >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    }
    val base = seed * 0x632BE59BD9B4E019L + stream * 0x9E3779B97F4A7C15L
    val u1 = mix(base + 2 * k)
    val u2 = mix(base + 2 * k + 1)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private def uniform(seed: Long, stream: Long, k: Long): Double = {
    var x = seed * 0x9E3779B97F4A7C15L + stream * 0xD1B54A32D192ED03L + k + 0x8CB92BA72F3D8DD7L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x = x ^ (x >>> 31)
    ((x >>> 11).toDouble + 0.5) / (1L << 53).toDouble
  }

  /** Public handle for the DSv2 source ([[graft.sources.SyntheticSource]]):
    * same trace, same determinism contract. */
  def rawTraceForSource(nTime: Int, seed: Long, channel: Int): Array[Double] =
    rawTrace(nTime, seed, channel)

  /** One raw (pre-normalization) smoothed-noise trace. */
  private[model] def rawTrace(nTime: Int, seed: Long, channel: Int): Array[Double] = {
    val kernelLength = 50
    val noise = Array.tabulate(nTime)(t => gauss(seed, channel.toLong, t.toLong) / 100.0)
    // np.convolve(mode='same') with boxcar(50): y[i] = sum(noise[i-25 .. i+24])/50,
    // zero-padded at the edges (utils.py:193-198)
    val out = new Array[Double](nTime)
    var acc = 0.0
    var i = -25
    while (i < nTime) {
      val addIdx = i + 24
      if (addIdx >= 0 && addIdx < nTime) acc += noise(addIdx)
      val dropIdx = i - 26
      if (dropIdx >= 0 && dropIdx < nTime) acc -= noise(dropIdx)
      if (i >= 0) out(i) = acc / kernelLength
      i += 1
    }
    out
  }

  /** Generate a SegmentFrame of synthetic data. Two distributed passes: one
    * to get the global std of the smoothed noise (the reference normalizes
    * globally, utils.py:199), one to emit the final traces. */
  def segments(spark: SparkSession, duration: Double, nChannels: Int, rate: Double,
               highGamma: Boolean = true, linenoise: Boolean = true, seed: Long = 0,
               series: String = "ECoG"): DataFrame = {
    import spark.implicits._
    val nTime = (duration * rate).toInt
    val channels = spark.range(nChannels).select(col("id").cast("int").as("channel"))
      .repartition(math.min(nChannels, spark.sparkContext.defaultParallelism))

    val rawUdf = udf((ch: Int) => rawTrace(nTime, seed, ch))
    val raw = channels.withColumn("raw", rawUdf(col("channel")))

    // pass 1: global population std of the smoothed noise. Per-channel
    // (sum, sumsq, n) moments in one JVM pass per row — no per-sample
    // explode (measured 10x faster at 64M points).
    val momentsUdf = udf { (xsIn: Seq[Double]) =>
      val xs = xsIn.toArray // Seq can arrive as a List: need O(1) indexing
      var s = 0.0
      var s2 = 0.0
      var i = 0
      while (i < xs.length) { val v = xs(i); s += v; s2 += v * v; i += 1 }
      (s, s2, xs.length.toLong)
    }
    val m = raw.select(momentsUdf(col("raw")).as("m"))
      .agg(sum(col("m._1")).as("s"), sum(col("m._2")).as("s2"), sum(col("m._3")).as("n"))
      .first()
    val (s1, s2, n) = (m.getDouble(0), m.getDouble(1), m.getLong(2))
    val mean = s1 / n
    val sd = math.sqrt(s2 / n - mean * mean) // numpy population std
    val scale = 1.0 / (sd * 2.0)

    val finishUdf = udf((ch: Int, noise: Seq[Double]) => {
      val x = noise.toArray
      var i = 0
      while (i < x.length) { x(i) *= scale; i += 1 }
      if (highGamma) {
        // 100 Hz carrier amplitude-modulated at ~1 Hz, random phases per channel
        val ph1 = 2.0 * math.Pi * uniform(seed, 1000L + ch, 0)
        val ph2 = 2.0 * math.Pi * uniform(seed, 2000L + ch, 0)
        i = 0
        while (i < x.length) {
          val t = if (x.length == 1) 0.0 else duration * i / (x.length - 1.0)
          val carrier = math.sin(2.0 * math.Pi * t * 100.0 + ph1)
          val mod = math.sin(2.0 * math.Pi * t * 1.0 + ph2)
          x(i) += carrier * (mod * mod + 0.2)
          i += 1
        }
      }
      if (linenoise && rate > 120.0) {
        // sum of harmonics weight * sum_{h=1..H} (1/2)^h sin(h*theta) with
        // theta = 2*pi*60*t, H = last harmonic strictly below rate. Closed
        // form via the geometric phasor series Im(z(1-z^H)/(1-z)), z =
        // q*e^{i*theta}: O(1) per sample instead of O(H) sin calls (H = 166
        // at 10 kHz — measured 10x faster, same statistics).
        val weight = gauss(seed, 3000L + ch, 0)
        val bigH = math.floor((rate - 1e-9) / 60.0).toInt
        if (bigH >= 1) {
          val q = 0.5
          val qH = math.pow(q, bigH)
          i = 0
          while (i < x.length) {
            val t = if (x.length == 1) 0.0 else duration * i / (x.length - 1.0)
            val th = 2.0 * math.Pi * 60.0 * t
            val c = math.cos(th)
            val s = math.sin(th)
            val cH = math.cos(bigH * th)
            val sH = math.sin(bigH * th)
            val ar = 1.0 - qH * cH
            val ai = -qH * sH
            val numr = q * (c * ar - s * ai)
            val numi = q * (c * ai + s * ar)
            val dr = 1.0 - q * c
            val di = -q * s
            val dd = dr * dr + di * di
            x(i) += weight * (numi * dr - numr * di) / dd
            i += 1
          }
        }
      }
      x
    })

    raw.select(
      lit(series).as("series"), col("channel"), lit(null).cast("int").as("band"),
      lit(rate).as("rate"), lit(0.0).as("startingTime"),
      finishUdf(col("channel"), col("raw")).as("values"))
  }
}
