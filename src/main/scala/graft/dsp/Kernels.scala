package graft.dsp

/** Frequency-domain filter kernels and filterbank construction.
  *
  * Re-expresses the reference's kernel math (see
  * /root/reference/src/process_nwb/wavelet_transform.py:15-139 and
  * /root/reference/src/process_nwb/utils.py:34-73) in Scala. Kernels are tiny
  * (one double per FFT bin) and are built driver-side or inside a per-executor
  * cache; they are pure functions of (nTime, rate, cf, sd).
  */
object Kernels {

  /** numpy fftfreq(n, d): bin frequencies of a length-n complex FFT. */
  def fftfreq(n: Int, d: Double): Array[Double] = {
    val v = 1.0 / (n * d)
    val out = new Array[Double](n)
    val half = (n - 1) / 2 + 1 // number of non-negative bins
    var k = 0
    while (k < half) { out(k) = k * v; k += 1 }
    var neg = -(n / 2)
    while (k < n) { out(k) = neg * v; k += 1; neg += 1 }
    out
  }

  /** numpy rfftfreq(n, d): n/2+1 non-negative bin frequencies. */
  def rfftfreq(n: Int, d: Double): Array[Double] = {
    val v = 1.0 / (n * d)
    Array.tabulate(n / 2 + 1)(_ * v)
  }

  /** numpy hamming window; M == 1 gives [1.0] (numpy special case). */
  def hammingWindow(m: Int): Array[Double] = {
    if (m <= 0) Array.empty
    else if (m == 1) Array(1.0)
    else Array.tabulate(m)(k => 0.54 - 0.46 * math.cos(2.0 * math.Pi * k / (m - 1)))
  }

  /** Log-spaced center frequencies (numpy logspace semantics, inclusive
    * endpoints). Ref: utils.py:34-46. */
  def logSpacedCfs(fmin: Double, fmax: Double, n: Int): Array[Double] = {
    val lo = math.log10(fmin)
    val hi = math.log10(fmax)
    if (n == 1) Array(math.pow(10, lo))
    else {
      val step = (hi - lo) / (n - 1)
      Array.tabulate(n) { i =>
        if (i == n - 1) math.pow(10, hi) else math.pow(10, lo + step * i)
      }
    }
  }

  /** Constant-Q bandwidths. Ref: utils.py:49-59. */
  def constQSds(cfs: Array[Double], q: Double = 8.0): Array[Double] = cfs.map(_ / q)

  /** Chang-lab variable bandwidths. Ref: utils.py:62-73. */
  def changSds(cfs: Array[Double]): Array[Double] = {
    val scale = 0.39
    cfs.map(cf => math.pow(10.0, math.log10(scale) + 0.5 * math.log10(cf)) * math.sqrt(2.0))
  }

  /** L2-normalized frequency-domain Gaussian at center `cf`, width `sd`,
    * over the two-sided fftfreq grid. Ref: wavelet_transform.py:15-37. */
  def gaussian(nTime: Int, rate: Double, center: Double, sd: Double): Array[Double] = {
    val freq = fftfreq(nTime, 1.0 / rate)
    val k = freq.map { f =>
      val d = math.abs(f) - center
      math.exp(-(d * d) / (2.0 * sd * sd))
    }
    l2Normalize(k)
  }

  /** L2-normalized two-sided band-limited Hamming kernel.
    * Ref: wavelet_transform.py:40-71. */
  def hammingKernel(nTime: Int, rate: Double, minFreq: Double, maxFreq: Double): Array[Double] = {
    val freq = fftfreq(nTime, 1.0 / rate)
    val k = new Array[Double](nTime)
    val posIdx = freq.indices.filter(i => freq(i) >= minFreq && freq(i) <= maxFreq)
    val posWin = hammingWindow(posIdx.length)
    posIdx.indices.foreach(i => k(posIdx(i)) = posWin(i))
    val negIdx = freq.indices.filter(i => freq(i) <= -minFreq && freq(i) >= -maxFreq)
    val negWin = hammingWindow(negIdx.length)
    negIdx.indices.foreach(i => k(negIdx(i)) = negWin(i))
    l2Normalize(k)
  }

  def l2Normalize(k: Array[Double]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < k.length) { ss += k(i) * k(i); i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm == 0.0) k else k.map(_ / nrm)
  }

  /** A built filterbank: per-band frequency-domain kernels plus the band
    * metadata dimension (center frequency, bandwidth). */
  final case class Filterbank(kernels: Array[Array[Double]], cfs: Array[Double], sds: Array[Double])

  val HgLow = 70.0
  val HgHigh = 150.0

  /** Center frequencies for a named filterbank, with optional high-gamma
    * pruning — applied BEFORE any kernel is built (predicate pushdown on the
    * band dimension, ref: wavelet_transform.py:116-118). */
  def centerFrequencies(filters: String, hgOnly: Boolean): Array[Double] = {
    val cfs = filters match {
      case "human" | "changlab" => logSpacedCfs(4.0749286538265, 200.0, 40)
      case "rat"                => logSpacedCfs(2.6308, 1200.0, 54)
      case other => throw new IllegalArgumentException(s"Unknown filterbank '$other'")
    }
    if (hgOnly) cfs.filter(cf => cf >= HgLow && cf <= HgHigh) else cfs
  }

  /** Build the named filterbank for a padded signal length. Raises (like the
    * reference, wavelet_transform.py:121-125) when max cf exceeds Nyquist. */
  def filterbank(filters: String, nTime: Int, rate: Double, hgOnly: Boolean): Filterbank = {
    val cfs = centerFrequencies(filters, hgOnly)
    if (cfs.max * 2.0 > Math.nextUp(rate))
      throw new IllegalArgumentException(
        s"Unable to compute wavelet transform above Nyquist rate (${cfs.max * 2.0} Hz). " +
          s"Increase your rate ($rate Hz) to at least twice your desired maximum frequency of interest.")
    val sds = filters match {
      case "rat" | "human" => constQSds(cfs)
      case "changlab"      => changSds(cfs)
      case other => throw new IllegalArgumentException(s"Unknown filterbank '$other'")
    }
    val kernels = cfs.indices.map(i => gaussian(nTime, rate, cfs(i), sds(i))).toArray
    Filterbank(kernels, cfs, sds)
  }
}
