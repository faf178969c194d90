package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked invariants for q250's driver-side Newton solve — the 3x3
  * symmetric Cramer step over micro-integer sums must invert known systems
  * exactly and pin results to the 9-decimal grid. */
class MlSolverSpec extends AnyFunSuite {

  // sums order: g0, g1, g2, h00, h01, h02, h11, h12, h22 (micro units)
  private def step(w: Array[Double], s: Array[Long]) = Advanced.newtonStep(w, s)

  test("identity Hessian: step from 0 lands exactly on the gradient") {
    val s = Array(1000000L, 2000000L, 3000000L, // G = (1, 2, 3)
      1000000L, 0L, 0L, 1000000L, 0L, 1000000L) // H = I
    assert(step(Array(0.0, 0.0, 0.0), s).toSeq === Seq(1.0, 2.0, 3.0))
  }

  test("diagonal Hessian scales the update; prior weights add through") {
    val s = Array(2000000L, 2000000L, 2000000L, // G = (2, 2, 2)
      2000000L, 0L, 0L, 4000000L, 0L, 8000000L) // H = diag(2, 4, 8)
    assert(step(Array(1.0, 1.0, 1.0), s).toSeq === Seq(2.0, 1.5, 1.25))
  }

  test("update pins to the 9-decimal grid (HALF_UP)") {
    // H = I scaled by 3e6 micro => delta = G / 3 = 1/3, non-terminating
    val s = Array(1000000L, 1000000L, 1000000L,
      3000000L, 0L, 0L, 3000000L, 0L, 3000000L)
    val w = step(Array(0.0, 0.0, 0.0), s)
    assert(w.toSeq === Seq(0.333333333, 0.333333333, 0.333333333))
  }

  test("a full cross-term system inverts correctly") {
    // H = [[2,1,0],[1,2,1],[0,1,2]], G = H * (1, 1, 1) = (3, 4, 3)
    // => delta must be exactly (1, 1, 1)
    val s = Array(3000000L, 4000000L, 3000000L,
      2000000L, 1000000L, 0L, 2000000L, 1000000L, 2000000L)
    assert(step(Array(0.5, -0.5, 0.0), s).toSeq === Seq(1.5, 0.5, 1.0))
  }
}
