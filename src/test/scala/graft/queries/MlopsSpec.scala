package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side invariants of the Mlops threshold/sign machinery — the
  * cross-engine value checks live in the q262-q268 DuckDB oracles; these
  * pin the pure-Scala constants the oracles embed. */
class MlopsSpec extends AnyFunSuite {

  private val two60 = 1152921504606846976L

  test("Poisson(1) thresholds: strictly increasing, inside the 2^60 grid, CDF-shaped") {
    val ts = Mlops.poissonThresholdsForTest
    assert(ts.size === 6)
    assert(ts === ts.sorted && ts.distinct.size === ts.size)
    assert(ts.head > 0 && ts.last < two60)
    // P(0) = e^-1 ~ 0.3679, P(<=1) ~ 0.7358
    assert(math.abs(ts.head.toDouble / two60 - math.exp(-1.0)) < 1e-12)
    assert(math.abs(ts(1).toDouble / two60 - 2 * math.exp(-1.0)) < 1e-12)
  }

  test("geometric (discrete Laplace) thresholds: 16 increasing cut points, symmetric mechanism") {
    val ts = Mlops.geometricThresholdsForTest
    assert(ts.size === 16)
    assert(ts === ts.sorted && ts.distinct.size === ts.size)
    // symmetry up to the clipped tail: support is truncated at ±8, and the
    // un-emitted tail mass (~0.7% per side at alpha = e^-0.5) lands on the
    // ELSE arm, so F(-1) = 1 - F(0) only within that truncation budget
    val alpha = math.exp(-0.5)
    val p0 = (1 - alpha) / (1 + alpha)
    val tail = p0 * math.pow(alpha, 9) / (1 - alpha)
    val fm1 = ts(7).toDouble / two60  // F(-1)
    val f0 = ts(8).toDouble / two60   // F(0)
    assert(math.abs(fm1 - (1 - f0)) < 2 * tail + 1e-9, s"F(-1)=$fm1 F(0)=$f0")
  }

  test("JL signs: ±1 only, deterministic, roughly balanced over 512 cells") {
    val all = for (j <- 0 until 8; i <- 0 until 64) yield Mlops.jlSignForTest(j, i)
    assert(all.forall(s => s == 1 || s == -1))
    assert(all === (for (j <- 0 until 8; i <- 0 until 64) yield Mlops.jlSignForTest(j, i)))
    val pos = all.count(_ == 1)
    assert(pos > 200 && pos < 312, s"suspiciously unbalanced sign matrix: $pos/512 positive")
  }
}
