package graft.models

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden values transcribed from the reference's own line-method test
  * (`tests/test_soccer.py:1169-1202`) — engine-independent geometry
  * ground truth. */
class RayRotationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rays = Seq(
    (0, 1.0, 1.0, 3.0, 2.0),
    (1, 2.0, 3.0, 2.0, 1.0),
    (2, 0.5, 2.5, 1.0, 3.0),
    (3, 4.0, 1.0, -2.0, 1.5)).toDF("i", "x", "y", "vx", "vy")

  private def approx(a: Double, b: Double): Unit =
    assert(math.abs(a - b) <= 1e-8 + 1e-5 * math.abs(b), s"$a !~ $b")

  test("vertical line x=6: reference golden positions/velocities/intersections/mask") {
    val r = RayRotation.rotateAroundLine(rays, 6.0, 0.0, 6.0, 7.0)
      .collect().map(row => row.getInt(0) -> row).toMap

    val expPos = Map(0 -> (11.0, 7.666666666666668), 1 -> (10.0, 7.0),
      2 -> (0.5, 2.5), 3 -> (4.0, 1.0))
    val expVel = Map(0 -> (-3.0, -2.0), 1 -> (-2.0, -1.0),
      2 -> (1.0, 3.0), 3 -> (-2.0, 1.5))
    val expInt = Map(0 -> (6.0, 4.333333333333334), 1 -> (6.0, 5.0),
      2 -> (0.0, 0.0), 3 -> (0.0, 0.0))
    val expMask = Map(0 -> true, 1 -> true, 2 -> false, 3 -> false)

    for (i <- 0 to 3) {
      val row = r(i)
      assert(row.getBoolean(row.fieldIndex("valid")) === expMask(i), s"mask ray $i")
      approx(row.getDouble(row.fieldIndex("rx")), expPos(i)._1)
      approx(row.getDouble(row.fieldIndex("ry")), expPos(i)._2)
      approx(row.getDouble(row.fieldIndex("rvx")), expVel(i)._1)
      approx(row.getDouble(row.fieldIndex("rvy")), expVel(i)._2)
      approx(row.getDouble(row.fieldIndex("ix")), expInt(i)._1)
      approx(row.getDouble(row.fieldIndex("iy")), expInt(i)._2)
    }
  }

  test("horizontal line mirrors the vertical arm; diagonal raises") {
    val r = RayRotation.rotateAroundLine(
      Seq((0, 1.0, 1.0, 0.0, 2.0)).toDF("i", "x", "y", "vx", "vy"),
      0.0, 5.0, 10.0, 5.0).collect().head
    assert(r.getBoolean(r.fieldIndex("valid")))
    approx(r.getDouble(r.fieldIndex("iy")), 5.0)
    approx(r.getDouble(r.fieldIndex("ry")), 9.0) // 2*5 - 1

    intercept[NotImplementedError] {
      RayRotation.rotateAroundLine(rays, 0.0, 0.0, 5.0, 5.0)
    }
  }

  test("zero velocity is invalid, not NaN-poisoned") {
    val r = RayRotation.rotateAroundLine(
      Seq((0, 1.0, 1.0, 0.0, 0.0)).toDF("i", "x", "y", "vx", "vy"),
      6.0, 0.0, 6.0, 7.0).collect().head
    assert(!r.getBoolean(r.fieldIndex("valid")))
    assert(r.getDouble(r.fieldIndex("rx")) === 1.0)
    assert(r.getDouble(r.fieldIndex("ix")) === 0.0)
  }
}
