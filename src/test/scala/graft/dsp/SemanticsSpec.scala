package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's own semantic test oracles
  * (the specs under /root/reference/tests/) — implementation-independent
  * properties. */
class SemanticsSpec extends AnyFunSuite {

  // --- tests/test_resample.py:22-29: constant preservation -----------------
  test("resampling all-ones stays ~1 (atol 1e-3) across lengths and ratios") {
    for (t <- Seq(999, 1000, 1001, 5077); ratio <- Seq(0.5, 1.0, 1.5, 2.0)) {
      val ones = Array.fill(t)(1.0)
      val out = Signal.resample(ones, 200.0 * ratio, 200.0)
      assert(out.length == math.ceil(t * ratio).toInt, s"t=$t ratio=$ratio length")
      val worst = out.map(v => math.abs(v - 1.0)).max
      assert(worst < 1e-3, s"t=$t ratio=$ratio worst dev $worst")
    }
  }

  // --- tests/test_resample.py:32-56: low-frequency fidelity ----------------
  test("sinusoids 1-5.33 Hz survive 400->211 Hz resample (cosine sim > 1-1e-3)") {
    val dur = 40.0
    val oldRate = 400.0
    val newRate = 211.0
    val freqs = Array.tabulate(20)(i => 1.0 + i * (5.33 - 1.0) / 19)
    val nOld = (dur * oldRate).toInt
    val x = Array.tabulate(nOld) { i =>
      val tm = i / oldRate
      freqs.map(f => math.sin(2 * math.Pi * f * tm)).sum
    }
    val y = Signal.resample(x, newRate, oldRate)
    val expected = Array.tabulate(y.length) { i =>
      val tm = i / newRate
      freqs.map(f => math.sin(2 * math.Pi * f * tm)).sum
    }
    val dot = y.zip(expected).map { case (a, b) => a * b }.sum
    val cos = dot / (math.sqrt(y.map(v => v * v).sum) * math.sqrt(expected.map(v => v * v).sum))
    assert(cos > 1 - 1e-3, s"cosine similarity $cos")
    val (m1, m2) = (y.sum / y.length, expected.sum / expected.length)
    assert(math.abs(m1 - m2) < 1e-2, s"mean drift $m1 vs $m2")
  }

  // --- tests/test_linenoise_notch.py:15-44: frequency specificity ----------
  test("notch kills 60 Hz harmonics >=1000x but passes +2 Hz offsets") {
    val rate = 400.0
    val dur = 52.0
    val n = (dur * rate).toInt
    val edge = rate.toInt // cut 1 s from each side before measuring
    def bank(offset: Double): Array[Double] = Array.tabulate(n) { i =>
      val tm = i / rate
      Seq(60.0, 120.0, 180.0).map(h => math.sin(2 * math.Pi * (h + offset) * tm)).sum
    }
    def norm(x: Array[Double]) = math.sqrt(x.map(v => v * v).sum)
    val onHz = bank(0.0)
    val onOut = Signal.notch(onHz, rate)
    val nIn = norm(onHz.slice(edge, n - edge))
    val nOut = norm(onOut.slice(edge, n - edge))
    assert(nIn / nOut > 1000.0, s"attenuation only ${nIn / nOut}x")
    val offHz = bank(2.0)
    val offOut = Signal.notch(offHz, rate)
    val inN = norm(offHz.slice(edge, n - edge))
    val outN = norm(offOut.slice(edge, n - edge))
    assert(math.abs(inN - outN) / inN < 0.01, s"passband distorted: $inN -> $outN")
  }

  // --- tests/test_wavelet_transform.py:10-27 + 44-56 -----------------------
  test("filterbank band counts, L2 norms, non-negativity") {
    val cases = Seq(("human", false, 400.0, 40), ("human", true, 400.0, 8),
                    ("changlab", false, 400.0, 40), ("changlab", true, 400.0, 8),
                    ("rat", false, 2400.0, 54), ("rat", true, 2400.0, 6))
    for ((name, hg, rate, nBands) <- cases) {
      val fb = Kernels.filterbank(name, 1000, rate, hg)
      assert(fb.kernels.length == nBands, s"$name hg=$hg bands")
      for (k <- fb.kernels) {
        val nrm = math.sqrt(k.map(v => v * v).sum)
        assert(math.abs(nrm - 1.0) < 1e-9, s"$name kernel norm $nrm")
        assert(k.forall(_ >= 0.0), s"$name kernel negative values")
      }
    }
  }

  test("filterbank raises below Nyquist (test_wavelet_transform.py:30-41)") {
    for ((name, rate) <- Seq(("human", 399.0), ("changlab", 399.0), ("rat", 2399.0))) {
      assertThrows[IllegalArgumentException](Kernels.filterbank(name, 1000, rate, hgOnly = false))
    }
  }

  // --- tests/test_common_average_referencing.py ----------------------------
  test("trimmed-mean CAR exact values on ramp with and without outliers") {
    val ramp = Array.tabulate(100)(_.toDouble)
    assert(Signal.trimmedMean(ramp, 0.95) == 49.5)
    assert(Signal.trimmedMean(ramp, 1.0) == 49.5)
    val outliers = ramp.clone()
    outliers(0) = -100.0
    outliers(99) = 111.0
    assert(Signal.trimmedMean(outliers, 0.95) == 49.5) // 95% trim excludes both
    // subtract-CAR row means: 0 with full mean; -0.88 with outliers at 95%
    val rowMeanFull = ramp.map(_ - Signal.trimmedMean(ramp, 1.0)).sum / 100
    assert(math.abs(rowMeanFull) < 1e-12)
    val rowMeanOut = outliers.map(_ - Signal.trimmedMean(outliers, 0.95)).sum / 100
    assert(math.abs(rowMeanOut - -0.88) < 1e-9)
  }

  test("trimmed mean rejects excluding all channels") {
    assertThrows[IllegalArgumentException](Signal.trimmedMean(Array(1.0, 2.0), 0.0))
  }

  // --- wavelet amplitude recovers a high-gamma burst -----------------------
  test("wavelet amplitude at 100 Hz tracks a modulated 100 Hz carrier") {
    val rate = 400.0
    val n = 4000
    val x = Array.tabulate(n) { i =>
      val tm = i / rate
      math.sin(2 * math.Pi * 100.0 * tm) * (if (tm > 5.0) 2.0 else 0.5)
    }
    val plan = Signal.padPlan(n, Signal.FastPad)
    val fb = Kernels.filterbank("human", n + plan.padTotal, rate, hgOnly = true)
    val bandIdx = fb.cfs.indices.minBy(i => math.abs(fb.cfs(i) - 100.0))
    val bands = Signal.waveletBands(x, Array(fb.kernels(bandIdx)))
    val amp = Signal.amplitude(bands(0))
    val early = amp.slice(400, 1600).sum / 1200
    val late = amp.slice(2400, 3600).sum / 1200
    assert(late / early > 3.0, s"amplitude ratio ${late / early} (want ~4)")
  }
}
