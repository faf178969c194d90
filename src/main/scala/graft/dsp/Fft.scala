package graft.dsp

import org.jtransforms.fft.DoubleFFT_1D
import java.util.concurrent.ConcurrentHashMap

/** FFT layer over JTransforms (already on the Spark classpath at
  * /opt/spark/jars/JTransforms-3.1.jar).
  *
  * Provides numpy/scipy-equivalent `fft`/`ifft`/`rfft`/`irfft` semantics over
  * interleaved complex arrays `[re0, im0, re1, im1, ...]` so that the DSP
  * operators (resample / notch / wavelet — see the reference at
  * /root/reference/src/process_nwb/{resample,linenoise_notch,wavelet_transform}.py)
  * can be expressed exactly as in the reference, but executed inside Spark
  * tasks. JTransforms' own multithreading is disabled: Spark's task
  * parallelism (one channel trace per row) is the parallelism model here.
  */
object Fft {

  // One Spark task = one FFT call; never let JTransforms oversubscribe cores.
  pl.edu.icm.jlargearrays.ConcurrencyUtils.setNumberOfThreads(1)

  private val plans = new ConcurrentHashMap[Int, DoubleFFT_1D]()
  private def plan(n: Int): DoubleFFT_1D =
    plans.computeIfAbsent(n, (k: Int) => new DoubleFFT_1D(k))

  /** Full complex FFT of a real signal: returns 2n interleaved doubles. */
  def fftReal(x: Array[Double]): Array[Double] = {
    val n = x.length
    val a = new Array[Double](2 * n)
    var i = 0
    while (i < n) { a(2 * i) = x(i); i += 1 }
    plan(n).complexForward(a)
    a
  }

  /** In-place complex inverse FFT (scaled by 1/n, numpy convention).
    * `a` has 2n interleaved entries and is mutated and returned. */
  def ifftComplexInPlace(a: Array[Double]): Array[Double] = {
    plan(a.length / 2).complexInverse(a, true)
    a
  }

  /** numpy rfft of a real signal: n/2+1 interleaved complex bins. */
  def rfft(x: Array[Double]): Array[Double] = {
    val n = x.length
    val full = fftReal(x)
    java.util.Arrays.copyOf(full, 2 * (n / 2 + 1))
  }

  /** numpy `irfft(spec, n)`: truncates / zero-pads the one-sided spectrum to
    * n/2+1 bins, extends Hermitian-symmetrically, and returns the length-n
    * real inverse. Imaginary parts of the DC and (even-n) Nyquist bins are
    * ignored, matching pocketfft's c2r transform. */
  def irfft(spec: Array[Double], n: Int): Array[Double] = {
    val m = n / 2 + 1
    val full = new Array[Double](2 * n)
    val mm = math.min(m, spec.length / 2)
    full(0) = spec(0) // DC: imag ignored
    var k = 1
    while (k < mm) {
      val re = spec(2 * k)
      val im = if (2 * k == n) 0.0 else spec(2 * k + 1) // Nyquist: imag ignored
      full(2 * k) = re
      full(2 * k + 1) = im
      if (k != n - k) {
        full(2 * (n - k)) = re
        full(2 * (n - k) + 1) = -im
      }
      k += 1
    }
    ifftComplexInPlace(full)
    val y = new Array[Double](n)
    var i = 0
    while (i < n) { y(i) = full(2 * i); i += 1 }
    y
  }

  /** Smallest 5-smooth (2^a·3^b·5^c) integer >= target — scipy's
    * `next_fast_len` for real transforms; FFTPACK-style mixed-radix FFTs
    * (JTransforms included) are fast exactly at these sizes. */
  def nextFastLen(target: Int): Int = {
    if (target <= 6) return math.max(target, 1)
    if (Integer.bitCount(target) == 1) return target // power of 2
    var best = Long.MaxValue
    var p5 = 1L
    while (p5 < best) {
      var p35 = p5
      while (p35 < best) {
        // smallest power of two >= ceil(target / p35)
        var q = (target + p35 - 1) / p35
        var p2 = 1L
        while (p2 < q) p2 <<= 1
        val candidate = p2 * p35
        if (candidate == target) return target
        if (candidate < best) best = candidate
        p35 *= 3
      }
      p5 *= 5
    }
    best.toInt
  }
}
