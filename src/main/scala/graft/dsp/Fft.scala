package graft.dsp

import org.jtransforms.fft.{DoubleFFT_1D, FloatFFT_1D}
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

  /** Full complex FFT of a real signal: returns 2n interleaved doubles.
    * Computed as a packed real transform + Hermitian mirror (half the
    * compute of a complex transform). */
  def fftReal(x: Array[Double]): Array[Double] = {
    val n = x.length
    val spec = rfft(x) // m = n/2+1 interleaved bins
    val full = new Array[Double](2 * n)
    val m = n / 2 + 1
    full(0) = spec(0)
    full(1) = spec(1)
    var k = 1
    while (k < m) {
      val re = spec(2 * k)
      val im = spec(2 * k + 1)
      full(2 * k) = re
      full(2 * k + 1) = im
      if (k != n - k) {
        full(2 * (n - k)) = re
        full(2 * (n - k) + 1) = -im
      }
      k += 1
    }
    full
  }

  /** In-place complex inverse FFT (scaled by 1/n, numpy convention).
    * `a` has 2n interleaved entries and is mutated and returned. */
  def ifftComplexInPlace(a: Array[Double]): Array[Double] = {
    plan(a.length / 2).complexInverse(a, true)
    a
  }

  /** numpy rfft of a real signal: n/2+1 interleaved complex bins. Uses
    * JTransforms' packed `realForward` (half the work of a complex FFT) and
    * unpacks to the interleaved layout:
    * even n: a[0]=Re0, a[1]=Re[n/2], a[2k]=Re[k], a[2k+1]=Im[k];
    * odd n:  a[0]=Re0, a[1]=Im[(n-1)/2], a[2k]=Re[k], a[2k+1]=Im[k]. */
  def rfft(x: Array[Double]): Array[Double] = {
    val n = x.length
    val a = java.util.Arrays.copyOf(x, n)
    plan(n).realForward(a)
    val m = n / 2 + 1
    val out = new Array[Double](2 * m)
    out(0) = a(0) // DC, Im = 0
    var k = 1
    while (2 * k + 1 < n) { // full (Re, Im) slots
      out(2 * k) = a(2 * k)
      out(2 * k + 1) = a(2 * k + 1)
      k += 1
    }
    if (n % 2 == 0) {
      if (n >= 2) out(2 * (n / 2)) = a(1) // Nyquist bin, Im = 0
    } else if (n > 1) { // odd n: last bin k=(n-1)/2 packs Re at a[n-1], Im at a[1]
      out(2 * k) = a(2 * k)
      out(2 * k + 1) = a(1)
    }
    out
  }

  /** numpy `irfft(spec, n)`: truncates / zero-pads the one-sided spectrum to
    * n/2+1 bins and returns the length-n real inverse via the packed
    * `realInverse`. Imaginary parts of the DC and (even-n) Nyquist bins are
    * ignored, matching pocketfft's c2r transform. */
  def irfft(spec: Array[Double], n: Int): Array[Double] = {
    val a = new Array[Double](n)
    val mm = math.min(n / 2 + 1, spec.length / 2)
    a(0) = spec(0) // DC imag dropped
    var k = 1
    while (2 * k + 1 < n && k < mm) { // full (Re, Im) slots
      a(2 * k) = spec(2 * k)
      a(2 * k + 1) = spec(2 * k + 1)
      k += 1
    }
    if (n % 2 == 0) {
      if (n >= 2 && n / 2 < mm) a(1) = spec(2 * (n / 2)) // Nyquist imag dropped
    } else if (n > 1 && k < mm) { // odd n: last bin packs Re at a[n-1], Im at a[1]
      a(2 * k) = spec(2 * k)
      a(1) = spec(2 * k + 1)
    }
    plan(n).realInverse(a, true)
    a
  }

  // --- float32 transforms (the reference's precision='single' compute mode:
  // scipy.fft on a float32 array runs a single-precision transform and
  // returns complex64; FloatFFT_1D is JTransforms' equivalent). Same packed
  // layouts as the double path above.

  private val plans32 = new ConcurrentHashMap[Int, FloatFFT_1D]()
  private def plan32(n: Int): FloatFFT_1D =
    plans32.computeIfAbsent(n, (k: Int) => new FloatFFT_1D(k))

  /** Full complex FFT of a real float signal: 2n interleaved floats. */
  def fftReal32(x: Array[Float]): Array[Float] = {
    val n = x.length
    val spec = rfft32(x)
    val full = new Array[Float](2 * n)
    val m = n / 2 + 1
    full(0) = spec(0)
    full(1) = spec(1)
    var k = 1
    while (k < m) {
      val re = spec(2 * k)
      val im = spec(2 * k + 1)
      full(2 * k) = re
      full(2 * k + 1) = im
      if (k != n - k) {
        full(2 * (n - k)) = re
        full(2 * (n - k) + 1) = -im
      }
      k += 1
    }
    full
  }

  /** In-place float32 complex inverse FFT (scaled by 1/n). */
  def ifftComplexInPlace32(a: Array[Float]): Array[Float] = {
    plan32(a.length / 2).complexInverse(a, true)
    a
  }

  /** numpy rfft of a float32 signal: n/2+1 interleaved complex64 bins. */
  def rfft32(x: Array[Float]): Array[Float] = {
    val n = x.length
    val a = java.util.Arrays.copyOf(x, n)
    plan32(n).realForward(a)
    val m = n / 2 + 1
    val out = new Array[Float](2 * m)
    out(0) = a(0) // DC, Im = 0
    var k = 1
    while (2 * k + 1 < n) {
      out(2 * k) = a(2 * k)
      out(2 * k + 1) = a(2 * k + 1)
      k += 1
    }
    if (n % 2 == 0) {
      if (n >= 2) out(2 * (n / 2)) = a(1) // Nyquist bin, Im = 0
    } else if (n > 1) { // odd n: last bin packs Re at a[n-1], Im at a[1]
      out(2 * k) = a(2 * k)
      out(2 * k + 1) = a(1)
    }
    out
  }

  /** numpy `irfft(spec, n)` at float32. */
  def irfft32(spec: Array[Float], n: Int): Array[Float] = {
    val a = new Array[Float](n)
    val mm = math.min(n / 2 + 1, spec.length / 2)
    a(0) = spec(0) // DC imag dropped
    var k = 1
    while (2 * k + 1 < n && k < mm) {
      a(2 * k) = spec(2 * k)
      a(2 * k + 1) = spec(2 * k + 1)
      k += 1
    }
    if (n % 2 == 0) {
      if (n >= 2 && n / 2 < mm) a(1) = spec(2 * (n / 2)) // Nyquist imag dropped
    } else if (n > 1 && k < mm) { // odd n: last bin packs Re at a[n-1], Im at a[1]
      a(2 * k) = spec(2 * k)
      a(1) = spec(2 * k + 1)
    }
    plan32(n).realInverse(a, true)
    a
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
