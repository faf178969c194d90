package graft.dsp

import Signal.{PadSpec, FastPad, padPlan}

/** Single-precision (float32) compute path for the spectral core — the
  * reference's `precision='single'` mode (utils.py:9-31), where every
  * operator casts its input to float32 and computes in float32 end to end
  * (scipy transforms of a float32 array run single-precision and return
  * complex64; e.g. resample.py:105-153, wavelet_transform.py:238-239).
  *
  * Mirrors graft.dsp.Signal op for op over `Array[Float]` via Fft's
  * FloatFFT_1D transforms. Pad/trim bookkeeping (`padPlan`) is integer
  * arithmetic and shared with the double path. Kernels stay float64 at
  * build time (the reference builds them with numpy defaults,
  * wavelet_transform.py:131-160) and are rounded to float32 at the
  * multiply, like complex64 × float64 under numpy's in-place dtype rules.
  *
  * Beyond parity, float32 halves the UDF hot path's memory/bandwidth —
  * at 100 TB that is the difference between a spill and a fit.
  */
object Signal32 {

  /** Reflect-limited padding at float32 (utils.py:150-167). */
  def smartPad(x: Array[Float], padLeft: Int, padRight: Int): Array[Float] = {
    if (padLeft == 0 && padRight == 0) return x
    require(padLeft >= 0 && padRight >= 0, "npad must be non-negative")
    val n = x.length
    val out = new Array[Float](padLeft + n + padRight) // zero-filled
    val lRef = math.min(padLeft, n - 1)
    var i = 0
    while (i < lRef) { out(padLeft - lRef + i) = 2.0f * x(0) - x(lRef - i); i += 1 }
    System.arraycopy(x, 0, out, padLeft, n)
    val rRef = math.min(padRight, n - 1)
    i = 0
    while (i < rRef) { out(padLeft + n + i) = 2.0f * x(n - 1) - x(n - 2 - i); i += 1 }
    out
  }

  /** Trim pad remnants off both ends (utils.py:141-147). */
  def trim(x: Array[Float], removeLeft: Int, removeRight: Int): Array[Float] = {
    if (removeLeft <= 0 && removeRight <= 0) x
    else {
      val from = math.max(removeLeft, 0)
      val until = math.min(x.length - removeRight, x.length)
      java.util.Arrays.copyOfRange(x, from, math.max(until, from))
    }
  }

  /** Trim an interleaved-complex float array by complex-sample counts. */
  def trimComplex(a: Array[Float], removeLeft: Int, removeRight: Int): Array[Float] = {
    if (removeLeft <= 0 && removeRight <= 0) a
    else {
      val n = a.length / 2
      val from = math.max(removeLeft, 0)
      val until = math.min(n - removeRight, n)
      java.util.Arrays.copyOfRange(a, 2 * from, math.max(2 * until, 2 * from))
    }
  }

  /** FFT-based resample to exactly `num` samples at float32
    * (resample.py:43-102; see Signal.resampleTo for the algorithm). */
  def resampleTo(x: Array[Float], num: Int, npad: PadSpec = FastPad): Array[Float] = {
    val n = x.length
    val ratio = num.toDouble / n
    val plan = padPlan(n, npad, ratio)
    val padded = smartPad(x, plan.padLeft, plan.padRight)
    val oldLen = padded.length
    val newLen = plan.newLen
    val shorter = newLen < oldLen
    val useLen = if (shorter) newLen else oldLen
    val spec = Fft.rfft32(padded)
    if (useLen % 2 == 0) {
      val nyq = useLen / 2
      if (nyq < spec.length / 2) {
        val f = if (shorter) 2.0f else 0.5f
        spec(2 * nyq) *= f
        spec(2 * nyq + 1) *= f
      }
    }
    var i = 0
    while (i < spec.length) { spec(i) = (spec(i) * ratio).toFloat; i += 1 }
    val y = Fft.irfft32(spec, newLen)
    trim(y, plan.removeLeft, plan.removeRight)
  }

  /** Resample between sampling rates at float32 (resample.py:105-153). */
  def resample(x: Array[Float], newFreq: Double, oldFreq: Double,
               npad: PadSpec = FastPad): Array[Float] = {
    val num = math.ceil(x.length * newFreq / oldFreq).toInt
    resampleTo(x, num, npad)
  }

  /** Notch at `noiseHz` and harmonics at float32 (linenoise_notch.py:8-92;
    * see Signal.notch — the hamming profile is evaluated in float64 and
    * rounded at the bin multiply). */
  def notch(x: Array[Float], rate: Double, noiseHz: Double = 60.0,
            npad: PadSpec = FastPad, continuousProfile: Boolean = false): Array[Float] = {
    val nyquist = rate / 2.0
    if (nyquist < noiseHz) return x
    val delta = 1.0
    val plan = padPlan(x.length, npad)
    val padded = smartPad(x, plan.padLeft, plan.padRight)
    val n = padded.length
    val spec = Fft.rfft32(padded)
    val m = n / 2 + 1
    val freqStep = 1.0 / (n * (1.0 / rate))
    var h = 1
    var notchF = noiseHz
    while (notchF < nyquist) {
      var lo = math.max(math.ceil((notchF - delta) / freqStep).toInt - 2, 0)
      while (lo < m && lo * freqStep <= notchF - delta) lo += 1
      var hi = lo
      while (hi < m && hi * freqStep < notchF + delta) hi += 1
      val size = hi - lo
      if (size > 0) {
        var i = 0
        if (continuousProfile) {
          while (i < size) {
            val f = (lo + i) * freqStep
            val ham = 0.54 - 0.46 * math.cos(math.Pi * (f - (notchF - delta)) / delta)
            val g = 1.0 - ham
            spec(2 * (lo + i)) = (spec(2 * (lo + i)) * g).toFloat
            spec(2 * (lo + i) + 1) = (spec(2 * (lo + i) + 1) * g).toFloat
            i += 1
          }
        } else {
          val win = Kernels.hammingWindow(size)
          while (i < size) {
            val g = 1.0 - win(i)
            spec(2 * (lo + i)) = (spec(2 * (lo + i)) * g).toFloat
            spec(2 * (lo + i) + 1) = (spec(2 * (lo + i) + 1) * g).toFloat
            i += 1
          }
        }
      }
      h += 1
      notchF = noiseHz * h
    }
    val y = Fft.irfft32(spec, n)
    trim(y, plan.removeLeft, plan.removeRight)
  }

  /** Analytic-signal spectrum at float32 (wavelet_transform.py:306-311). */
  def analyticSpectrum(padded: Array[Float]): Array[Float] = {
    val n = padded.length
    val full = Fft.fftReal32(padded)
    val kPos = (n + 1) / 2
    val out = new Array[Float](2 * n)
    var k = 1
    while (k < kPos) {
      out(2 * k) = 2.0f * full(2 * k)
      out(2 * k + 1) = 2.0f * full(2 * k + 1)
      k += 1
    }
    out
  }

  /** Wavelet transform of one float32 trace against a float64-built
    * filterbank (wavelet_transform.py:238-322; see Signal.waveletBands).
    * Returns interleaved complex float32 per band. */
  def waveletBands(x: Array[Float], kernels: Array[Array[Double]],
                   npad: PadSpec = FastPad): Array[Array[Float]] = {
    val plan = padPlan(x.length, npad)
    val padded = smartPad(x, plan.padLeft, plan.padRight)
    val n = padded.length
    val sh = analyticSpectrum(padded)
    val kPos = (n + 1) / 2
    kernels.map { kern =>
      val b =
        if (kern == null) sh.clone()
        else {
          require(kern.length == n, s"kernel length ${kern.length} != padded length $n")
          val arr = new Array[Float](2 * n)
          var i = 1
          while (i < kPos) {
            arr(2 * i) = (sh(2 * i) * kern(i)).toFloat
            arr(2 * i + 1) = (sh(2 * i + 1) * kern(i)).toFloat
            i += 1
          }
          arr
        }
      Fft.ifftComplexInPlace32(b)
      trimComplex(b, plan.removeLeft, plan.removeRight)
    }
  }
}
