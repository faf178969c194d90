package graft.dsp

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Bit-level parity of the DSP kernels against numpy-computed golden vectors
  * (tools/gen_dsp_golden.py re-implements the reference semantics of
  * /root/reference/src/process_nwb on deterministic inputs). */
class GoldenSpec extends AnyFunSuite {

  private val golden: Map[String, Any] = {
    val in = getClass.getResourceAsStream("/dsp_golden.json")
    require(in != null, "dsp_golden.json missing — run tools/gen_dsp_golden.py")
    new ObjectMapper().readValue(in, classOf[java.util.Map[String, Any]]).asScala.toMap
  }

  private def arr(v: Any): Array[Double] =
    v.asInstanceOf[java.util.List[Number]].asScala.map(_.doubleValue()).toArray

  private def ints(v: Any): Array[Int] =
    v.asInstanceOf[java.util.List[Number]].asScala.map(_.intValue()).toArray

  /** Deterministic pseudo-signal; must match tools/gen_dsp_golden.py `sig`. */
  private def sig(n: Int, seed: Int): Array[Double] =
    Array.tabulate(n) { i =>
      math.sin(0.01 * i + seed) + 0.5 * math.sin(0.1 * i * (seed + 1)) +
        0.25 * math.cos(0.55 * i) + 0.001 * i
    }

  private def assertClose(got: Array[Double], want: Array[Double],
                          tol: Double = 1e-9, label: String = ""): Unit = {
    assert(got.length == want.length, s"$label length ${got.length} != ${want.length}")
    var worst = 0.0
    var at = -1
    var i = 0
    while (i < got.length) {
      val d = math.abs(got(i) - want(i)) / math.max(1.0, math.abs(want(i)))
      if (d > worst) { worst = d; at = i }
      i += 1
    }
    assert(worst <= tol, s"$label worst rel err $worst at index $at")
  }

  test("rfft/irfft round-trip for odd and even lengths (packed layout)") {
    for (n <- Seq(1, 2, 3, 4, 5, 16, 17, 100, 101, 999, 1000)) {
      val x = sig(n, 9)
      val y = Fft.irfft(Fft.rfft(x), n)
      assertClose(y, x, 1e-12, s"roundtrip n=$n")
      // and resampling to an ODD target length exercises odd-n irfft
      if (n >= 10) {
        val odd = Signal.resampleTo(x, n / 2 * 2 + 1)
        assert(odd.length == n / 2 * 2 + 1)
        assert(odd.forall(v => !v.isNaN && !v.isInfinite))
      }
    }
  }

  test("nextFastLen matches") {
    for (n <- Seq(100, 101, 999, 1000, 1024)) {
      assert(Fft.nextFastLen(n) == golden(s"nextFastLen_$n").asInstanceOf[Number].intValue())
    }
  }

  test("padPlan matches (fast r=0.5, auto r=1.5)") {
    for (n <- Seq(100, 101, 999, 1000, 1024)) {
      val f = ints(golden(s"padPlan_fast_r0.5_$n"))
      val pf = Signal.padPlan(n, Signal.FastPad, 0.5)
      assert(Seq(pf.padLeft, pf.padRight, pf.removeLeft, pf.removeRight, pf.newLen) == f.toSeq, s"fast n=$n")
      val a = ints(golden(s"padPlan_auto_r1.5_$n"))
      val pa = Signal.padPlan(n, Signal.AutoPad, 1.5)
      assert(Seq(pa.padLeft, pa.padRight, pa.removeLeft, pa.removeRight, pa.newLen) == a.toSeq, s"auto n=$n")
    }
  }

  test("smartPad matches, including pad longer than signal") {
    // 1e-15: jvm math.sin and np.sin may differ in the last ulp on the input
    assertClose(Signal.smartPad(sig(200, 2), 7, 4), arr(golden("smartPad_7_4")), 1e-15, "smartPad")
    assertClose(Signal.smartPad(sig(5, 3), 9, 8), arr(golden("smartPad_overlong_9_8")), 1e-15, "overlong")
  }

  test("resample matches numpy within 1e-9") {
    for ((n, nf, of) <- Seq((999, 100.0, 200.0), (1000, 100.0, 200.0),
                            (1000, 300.0, 200.0), (5077, 211.0, 400.0),
                            (1000, 200.0, 200.0))) {
      val got = Signal.resample(sig(n, 4), nf, of)
      assertClose(got, arr(golden(s"resample_${n}_${nf}_${of}")), 1e-9, s"resample $n $nf/$of")
    }
  }

  test("notch matches numpy within 1e-9") {
    for ((n, rate) <- Seq((2000, 400.0), (2048, 512.0), (1999, 1000.0))) {
      val got = Signal.notch(sig(n, 5), rate)
      assertClose(got, arr(golden(s"notch_${n}_$rate")), 1e-9, s"notch $n@$rate")
    }
  }

  test("gaussian kernel matches numpy") {
    assertClose(Kernels.gaussian(1024, 400.0, 75.0, 9.375),
                arr(golden("gaussian_1024_400_75")), 1e-12, "gaussian")
  }

  test("float32 compute path matches the float64 goldens at single-precision tolerance") {
    // the reference's precision='single' mode computes in float32 end to end;
    // its own tests accept atol=1e-3-class deviations (tests/test_resample.py:29)
    def f32(x: Array[Double]): Array[Float] = x.map(_.toFloat)
    for ((n, nf, of) <- Seq((999, 100.0, 200.0), (1000, 300.0, 200.0), (5077, 211.0, 400.0))) {
      val got = Signal32.resample(f32(sig(n, 4)), nf, of).map(_.toDouble)
      assertClose(got, arr(golden(s"resample_${n}_${nf}_${of}")), 1e-3, s"resample32 $n $nf/$of")
    }
    for ((n, rate) <- Seq((2000, 400.0), (1999, 1000.0))) {
      val got = Signal32.notch(f32(sig(n, 5)), rate).map(_.toDouble)
      assertClose(got, arr(golden(s"notch_${n}_$rate")), 1e-3, s"notch32 $n@$rate")
    }
    val x = sig(1500, 6)
    val plan = Signal.padPlan(x.length, Signal.FastPad)
    val n = x.length + plan.padTotal
    val kernels = Array(Kernels.gaussian(n, 400.0, 75.0, 9.375),
                        Kernels.gaussian(n, 400.0, 120.0, 15.0))
    val got = Signal32.waveletBands(f32(x), kernels)
    val want = golden("wavelet_1500_400").asInstanceOf[java.util.List[Any]].asScala
    for (b <- got.indices) {
      val w = want(b).asInstanceOf[java.util.Map[String, Any]].asScala
      val re = Array.tabulate(got(b).length / 2)(i => got(b)(2 * i).toDouble)
      val im = Array.tabulate(got(b).length / 2)(i => got(b)(2 * i + 1).toDouble)
      assertClose(re, arr(w("re")), 1e-3, s"band $b re (f32)")
      assertClose(im, arr(w("im")), 1e-3, s"band $b im (f32)")
    }
  }

  test("wavelet bands match numpy within 1e-9") {
    val x = sig(1500, 6)
    val plan = Signal.padPlan(x.length, Signal.FastPad)
    val n = x.length + plan.padTotal
    val kernels = Array(Kernels.gaussian(n, 400.0, 75.0, 9.375),
                        Kernels.gaussian(n, 400.0, 120.0, 15.0))
    val got = Signal.waveletBands(x, kernels)
    val want = golden("wavelet_1500_400").asInstanceOf[java.util.List[Any]].asScala
    for (b <- got.indices) {
      val w = want(b).asInstanceOf[java.util.Map[String, Any]].asScala
      assertClose(Signal.amplitude(got(b)),
                  arr(w("re")).zip(arr(w("im"))).map { case (r, i) => math.hypot(r, i) },
                  1e-9, s"band $b amplitude")
      val re = Array.tabulate(got(b).length / 2)(i => got(b)(2 * i))
      val im = Array.tabulate(got(b).length / 2)(i => got(b)(2 * i + 1))
      assertClose(re, arr(w("re")), 1e-8, s"band $b re")
      assertClose(im, arr(w("im")), 1e-8, s"band $b im")
    }
  }
}
