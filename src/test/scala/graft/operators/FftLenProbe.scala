package graft.operators

import graft.dsp.{Fft, Signal}

/** Dev probe: JTransforms rfft cost vs transform length — is the FastPad
  * length choice actually fast at the mega-soak's window sizes? */
object FftLenProbe {
  def main(args: Array[String]): Unit = {
    val raw = 2097152 + 2 * 262144 // soak window, raw
    val res = raw / 4
    def padded(n: Int): Int = n + Signal.padPlan(n, Signal.FastPad).padTotal
    val cases = Seq(
      ("raw window padded", padded(raw)),
      ("raw window pow2", Integer.highestOneBit(raw) * 2),
      ("post-resample padded", padded(res)),
      ("post-resample pow2", Integer.highestOneBit(res) * 2),
      ("whole calib padded", padded(1048576)))
    for ((label, n) <- cases) {
      val x = Array.tabulate(n)(i => math.sin(i * 0.001))
      // warm plan + jit
      Fft.rfft(x); Fft.rfft(x)
      val t0 = System.nanoTime()
      var k = 0
      while (k < 3) { Fft.rfft(x); k += 1 }
      println(f"$label%-24s n=$n%9d  rfft ${(System.nanoTime() - t0) / 3e6}%8.1f ms")
    }
  }
}
