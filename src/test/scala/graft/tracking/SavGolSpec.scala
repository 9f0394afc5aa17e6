package graft.tracking

import org.scalatest.funsuite.AnyFunSuite

/** Goldens generated from a NumPy replication of
  * scipy.signal.savgol_filter(..., mode="interp") — the exact algorithm
  * the reference invokes (`kloppy_polars.py:348-352`): least-squares
  * projection interior + polyfit-evaluated edges. */
class SavGolSpec extends AnyFunSuite {
  private val xs = Array(1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0, 9.0, 6.0, 2.5)

  private def assertClose(got: Array[Double], want: Array[Double]): Unit = {
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)), s"got ${got.toSeq} want ${want.toSeq}")
    }
  }

  test("w7 p1 matches scipy mode=interp") {
    assertClose(SavGol(7, 1).smoothArray(xs), Array(
      2.6785714285714275, 3.2142857142857135, 3.749999999999999, 4.285714285714286,
      5.428571428571429, 5.7142857142857135, 5.785714285714285, 5.339285714285712,
      4.892857142857141, 4.446428571428569))
  }

  test("w3 p1 matches scipy mode=interp") {
    assertClose(SavGol(3, 1).smoothArray(xs), Array(
      1.833333333333333, 2.333333333333333, 4.666666666666666, 5.0, 6.666666666666666,
      4.999999999999999, 6.333333333333333, 6.0, 5.833333333333333, 2.583333333333334))
  }

  test("w5 p2 matches scipy mode=interp") {
    assertClose(SavGol(5, 2).smoothArray(xs), Array(
      1.0285714285714265, 3.0857142857142836, 4.571428571428571, 5.342857142857143,
      7.142857142857143, 4.685714285714286, 6.0, 6.642857142857142, 5.471428571428566,
      3.1571428571428495))
  }

  test("series shorter than window passes through") {
    val short = Array(3.0, 1.0, 4.0, 1.0, 5.0)
    assert(SavGol(7, 1).smoothArray(short).toSeq == short.toSeq)
  }

  test("center coefficients of (7,1) are the 1/7 moving average") {
    SavGol(7, 1).centerCoeffs.foreach(c => assert(math.abs(c - 1.0 / 7) < 1e-12))
  }
}
