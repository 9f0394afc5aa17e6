package graft.graphs

import graft.tracking.Cols
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delaunay adjacency (G1's fifth matrix type) — implemented to the
  * reference's LEGACY numpy semantics (`soccer/graphs/features/
  * adjacency_matrix.py:60-124`; the active polars path raises
  * NotImplementedError, so this is a strict superset of the
  * reference): players are triangulated in 2D, every triangle edge
  * connects its endpoints symmetrically, players get NO self-loops,
  * NaN positions are excluded (edgeless), and the ball joins via the
  * usual connect type composition in [[GraphConverter.pairs]].
  *
  * The triangulation itself (Bowyer-Watson, O(n²) at n ≤ 22 per
  * frame) is inherently per-group geometry — exactly the kind of
  * non-relational kernel the engine reserves `flatMapGroups` for
  * (same category as the Hungarian assignment): the shuffle key is
  * the frame, per-frame work is constant-bounded by the squad size,
  * so the operator scales horizontally like every other frame-keyed
  * stage. Verified by the empty-circumcircle property test
  * (DelaunaySpec) — the defining invariant of the triangulation —
  * plus exact small-configuration goldens.
  */
object Delaunay {

  /** 2D Bowyer-Watson. Returns the undirected edge set over the input
    * indices. Exact duplicate points collapse to their first index
    * (later duplicates end up edgeless, like the reference's NaN
    * handling); fewer than 3 distinct points fall back to a path
    * (2 points → 1 edge, < 2 → none). */
  def triangulate(pts: IndexedSeq[(Double, Double)]): Set[(Int, Int)] = {
    val firstOf = scala.collection.mutable.Map.empty[(Double, Double), Int]
    val keep = pts.indices.filter { i =>
      val p = pts(i)
      !p._1.isNaN && !p._2.isNaN && {
        if (firstOf.contains(p)) false else { firstOf(p) = i; true }
      }
    }
    if (keep.size < 2) return Set.empty
    if (keep.size == 2) return Set((keep(0) min keep(1), keep(0) max keep(1)))

    // super-triangle comfortably containing all points
    val xs = keep.map(i => pts(i)._1); val ys = keep.map(i => pts(i)._2)
    val (minX, maxX) = (xs.min, xs.max); val (minY, maxY) = (ys.min, ys.max)
    val d = math.max(maxX - minX, maxY - minY) max 1.0
    val cx = (minX + maxX) / 2; val cy = (minY + maxY) / 2
    val superPts = IndexedSeq(
      (cx - 20 * d, cy - 10 * d), (cx + 20 * d, cy - 10 * d), (cx, cy + 20 * d))
    val all: IndexedSeq[(Double, Double)] = pts ++ superPts
    val s0 = pts.size; val s1 = s0 + 1; val s2 = s0 + 2

    final case class Tri(a: Int, b: Int, c: Int) {
      // circumcircle containment via the standard determinant, sign
      // normalized by triangle orientation
      def circumContains(p: (Double, Double)): Boolean = {
        val (ax, ay) = all(a); val (bx, by) = all(b); val (cx0, cy0) = all(c)
        val (dx, dy) = p
        val orient = (bx - ax) * (cy0 - ay) - (by - ay) * (cx0 - ax)
        val m11 = ax - dx; val m12 = ay - dy; val m13 = m11 * m11 + m12 * m12
        val m21 = bx - dx; val m22 = by - dy; val m23 = m21 * m21 + m22 * m22
        val m31 = cx0 - dx; val m32 = cy0 - dy; val m33 = m31 * m31 + m32 * m32
        val det = m11 * (m22 * m33 - m23 * m32) -
          m12 * (m21 * m33 - m23 * m31) + m13 * (m21 * m32 - m22 * m31)
        if (orient >= 0) det > 1e-12 else det < -1e-12
      }
      def edges: Seq[(Int, Int)] =
        Seq((a min b, a max b), (b min c, b max c), (a min c, a max c))
    }

    var tris = List(Tri(s0, s1, s2))
    keep.foreach { i =>
      val p = all(i)
      val (bad, good) = tris.partition(_.circumContains(p))
      // boundary of the cavity = edges appearing in exactly one bad tri
      val counts = scala.collection.mutable.Map.empty[(Int, Int), Int]
      bad.foreach(_.edges.foreach(e => counts(e) = counts.getOrElse(e, 0) + 1))
      // NB: collect on a Map with tuple results would rebuild a Map
      // (first vertex as key!) and silently drop boundary edges —
      // iterate explicitly
      val boundary = counts.iterator.collect { case (e, 1) => e }.toList
      tris = good ++ boundary.map { case (u, v) => Tri(u, v, i) }
    }
    tris.iterator
      .filterNot(t => Set(t.a, t.b, t.c).exists(_ >= s0))
      .flatMap(_.edges)
      .toSet
  }

  /** Per-frame player-player Delaunay edge table:
    * `(game_id, period_id, frame_id, i_id, j_id)`, BOTH directions.
    * Input: the canonical long table (ball rows are skipped — the
    * reference triangulates players only). */
  def edges(df: DataFrame): DataFrame = {
    import Cols._
    val spark = df.sparkSession
    import spark.implicits._
    val players = df
      .filter(col(TeamId) =!= Ball && col(X).isNotNull && col(Y).isNotNull)
      .select(col(GameId), col(PeriodId).cast(IntegerType),
        col(FrameId).cast(LongType), col(ObjectId), col(X), col(Y))
      .as[(String, Int, Long, String, Double, Double)]
    players
      .groupByKey(r => (r._1, r._2, r._3))
      .flatMapGroups { (key: (String, Int, Long), it: Iterator[(String, Int, Long, String, Double, Double)]) =>
        val rows = it.toIndexedSeq
        val edgeSet = triangulate(rows.map(r => (r._5, r._6)))
        edgeSet.iterator.flatMap { case (i, j) =>
          val a = rows(i)._4; val b = rows(j)._4
          Iterator((key._1, key._2, key._3, a, b), (key._1, key._2, key._3, b, a))
        }.toSeq
      }
      .toDF(GameId, PeriodId, FrameId, "i_id", "j_id")
  }
}
