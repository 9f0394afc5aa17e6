package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ray–line intersection and 180° rotation around the intersection
  * point (`soccer/models/utils.py:102-269`, golden-tested at
  * `tests/test_soccer.py:1169-1202`) — the reference's exported
  * geometry utility for reflecting players "through" a line (e.g. the
  * goal line) along their velocity ray.
  *
  * Re-expressed as pure column arithmetic over (x, y, vx, vy): each
  * row is one ray; the line segment is a broadcast literal. Only
  * axis-aligned lines are supported — the reference raises
  * NotImplementedError for diagonal lines, mirrored here at plan time.
  *
  * Numerics replicate the NumPy kernel:
  *  - t is computed against the NORMALIZED velocity (the reference
  *    normalizes before intersecting), so the component guard is
  *    |v̂| ≥ 1e-10;
  *  - zero-magnitude velocities produce NaN components in NumPy, whose
  *    comparisons are false — Spark orders NaN ABOVE all numbers, so
  *    the guard here tests `norm > 0` explicitly;
  *  - invalid rays keep their position/velocity and report (0, 0) as
  *    the intersection, exactly the reference's zero-initialized
  *    output.
  */
object RayRotation {

  /** Adds `ix, iy` (intersection), `valid`, and `rx, ry, rvx, rvy`
    * (rotated position/velocity; passthrough when invalid). */
  def rotateAroundLine(
      df: DataFrame,
      lineStartX: Double, lineStartY: Double,
      lineEndX: Double, lineEndY: Double,
      x: String = "x", y: String = "y",
      vx: String = "vx", vy: String = "vy"): DataFrame = {
    val vertical = math.abs(lineEndX - lineStartX) < 1e-10
    val horizontal = math.abs(lineEndY - lineStartY) < 1e-10
    if (!vertical && !horizontal)
      throw new NotImplementedError(
        "Diagonal lines are not supported (matches reference models/utils.py:211)")

    // ANSI-mode-safe normalization: a zero-magnitude ray yields null
    // components (NumPy yields NaN; both fail every comparison below)
    val norm = sqrt(col(vx) * col(vx) + col(vy) * col(vy))
    val nvx = when(norm > 0, col(vx) / norm)
    val nvy = when(norm > 0, col(vy) / norm)

    val (t, inBounds) =
      if (vertical) {
        val tt = when(norm > 0 && abs(nvx) >= 1e-10,
          (lit(lineStartX) - col(x)) / nvx)
        val iyv = col(y) + tt * nvy
        (tt, iyv.between(math.min(lineStartY, lineEndY), math.max(lineStartY, lineEndY)))
      } else {
        val tt = when(norm > 0 && abs(nvy) >= 1e-10,
          (lit(lineStartY) - col(y)) / nvy)
        val ixv = col(x) + tt * nvx
        (tt, ixv.between(math.min(lineStartX, lineEndX), math.max(lineStartX, lineEndX)))
      }

    df.withColumn("__t", t)
      .withColumn("valid",
        coalesce(col("__t") >= 0 && inBounds, lit(false)))
      .withColumn("ix", when(col("valid"), col(x) + col("__t") * nvx).otherwise(0.0))
      .withColumn("iy", when(col("valid"), col(y) + col("__t") * nvy).otherwise(0.0))
      .withColumn("rx", when(col("valid"), lit(2) * col("ix") - col(x)).otherwise(col(x)))
      .withColumn("ry", when(col("valid"), lit(2) * col("iy") - col(y)).otherwise(col(y)))
      .withColumn("rvx", when(col("valid"), -col(vx)).otherwise(col(vx)))
      .withColumn("rvy", when(col("valid"), -col(vy)).otherwise(col(vy)))
      .drop("__t")
  }
}
