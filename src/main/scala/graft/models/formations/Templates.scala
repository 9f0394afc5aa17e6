package graft.models.formations

/** One template slot in normalized left-to-right attack space. */
final case class Slot(x: Double, y: Double, label: String)

/** A formation template: outfield slots only (GK excluded), ordered
  * back line → front line, right → left within a line. */
final case class Template(name: String, slots: Vector[Slot]) {
  def n: Int = slots.size
}

/** Formation template library.
  *
  * The reference loads template coordinates from the mplsoccer package
  * at runtime (`soccer/models/formations/detection.py:178-235`) and
  * hard-codes the shaw-glickman formation *name list*
  * (`detection.py:153-174`). mplsoccer's coordinate data is not
  * redistributable here, so templates are **generated data**: a
  * formation string's digit groups become evenly spaced lines across
  * the attack axis, players evenly spaced across the width. Since EFPI
  * rescales every candidate template jointly to the team's bounding box
  * before matching (`efpi.py:150-164`), only the relative geometry of
  * the template set matters — the generator preserves the structural
  * semantics (line counts, ordering, left/right symmetry) that drive
  * the assignment. Labels follow the familiar scheme (RB/RCB/../LB,
  * CDM, RCM.., RF/LF).
  *
  * Being parametric, the generator also covers small-sided templates
  * ("21", "111") used by the driver-oracle queries on synthetic
  * 3-a-side tracking.
  */
object Templates {

  /** Formation names available under the `"shaw-glickman"` option
    * (`detection.py:153-174`). */
  val ShawGlickman: Seq[String] = Seq(
    "5221", "352", "343flat", "3232", "4222", "41212", "343", "41221",
    "433", "4321", "4141", "442", "3331", "31312", "3241", "3142",
    "2422", "2332", "2431")

  /** Role suffix per line, back to front. */
  def lineRoles(nLines: Int): Seq[String] = nLines match {
    case 1 => Seq("M")
    case 2 => Seq("B", "F")
    case 3 => Seq("B", "M", "F")
    case 4 => Seq("B", "DM", "M", "F")
    case 5 => Seq("B", "DM", "M", "AM", "F")
    case n => (0 until n).map(i => s"L$i")
  }

  /** Side prefix for k players in a line, right to left. */
  def sides(k: Int): Seq[String] = k match {
    case 1 => Seq("C")
    case 2 => Seq("R", "L")
    case 3 => Seq("R", "C", "L")
    case 4 => Seq("R", "RC", "LC", "L")
    case 5 => Seq("R", "RC", "C", "LC", "L")
    case n => (1 to n).map(i => s"S$i")
  }

  /** Generate the LTR template for a formation string. Digits are the
    * line sizes back→front; non-digit suffixes ("343flat") only
    * distinguish the name. Lines sit at x=(i+1)/(L+1); players within
    * a line at y=(j+1)/(k+1), right to left. */
  def generate(name: String): Template = {
    val digits = name.filter(_.isDigit).map(_.asDigit).toVector
    require(digits.nonEmpty && digits.forall(_ > 0), s"bad formation '$name'")
    val roles = lineRoles(digits.size)
    val slots = for {
      (k, i) <- digits.zipWithIndex
      j <- 0 until k
    } yield Slot(
      (i + 1).toDouble / (digits.size + 1),
      (j + 1).toDouble / (k + 1),
      s"${sides(k)(j)}${roles(i)}")
    Template(name, slots.toVector)
  }

  /** RTL variant: both axes flipped (mirrors mplsoccer's
    * x_flip/y_flip, `detection.py:225-231`). Labels unchanged. */
  def rtl(t: Template): Template =
    Template(t.name, t.slots.map(s => Slot(1.0 - s.x, 1.0 - s.y, s.label)))

  /** Joint bounds (minX, minY, maxX, maxY) across a whole candidate
    * set — the reference scales all formations of a player count with
    * ONE global min/max (`efpi.py:152-156`). */
  def jointBounds(ts: Seq[Template]): (Double, Double, Double, Double) = {
    val xs = ts.flatMap(_.slots.map(_.x)); val ys = ts.flatMap(_.slots.map(_.y))
    (xs.min, ys.min, xs.max, ys.max)
  }

  /** A resolved library: candidate templates grouped by outfield count
    * and direction, with precomputed joint bounds. */
  final case class Library(
      byCount: Map[Int, IndexedSeq[Template]],
      rtlByCount: Map[Int, IndexedSeq[Template]],
      bounds: Map[(Int, Boolean), (Double, Double, Double, Double)]) extends Serializable {
    def templates(n: Int, ltr: Boolean): IndexedSeq[Template] =
      if (ltr) byCount.getOrElse(n, IndexedSeq.empty)
      else rtlByCount.getOrElse(n, IndexedSeq.empty)
    def boundsFor(n: Int, ltr: Boolean): (Double, Double, Double, Double) = bounds((n, ltr))
  }

  def library(names: Seq[String]): Library = {
    val ltr = names.map(generate)
    fromTemplates(ltr, rtl)
  }

  /** Build a library from a user-supplied template table — the
    * pluggability escape hatch for deployments that want
    * reference-identical formation output: dump mplsoccer's coordinate
    * data (or any in-house geometry) to a `(formation, slot_x, slot_y,
    * label)` parquet/JSON/CSV table and pass it here. Coordinates are
    * interpreted in left-to-right attack space with any units — EFPI
    * jointly rescales every candidate set to the team's bounding box
    * before matching (`efpi.py:150-164`), so only relative geometry
    * matters. The RTL variants mirror each count-group inside its own
    * joint bounds (equivalent to mplsoccer's `x_flip`/`y_flip`,
    * `detection.py:225-231`, under the joint rescale).
    *
    * The table is template data (formations × ~10 slots), collected to
    * the driver once and broadcast with the job — never a distributed
    * join at match time. */
  def library(df: org.apache.spark.sql.DataFrame): Library = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(
      col("formation").cast("string"), col("slot_x").cast("double"),
      col("slot_y").cast("double"), col("label").cast("string")).collect()
    require(rows.nonEmpty, "template table is empty")
    val ltr = rows.groupBy(_.getString(0)).map { case (name, rs) =>
      Template(name, rs.map(r => Slot(r.getDouble(1), r.getDouble(2), r.getString(3)))
        .sortBy(s => (s.x, s.y, s.label)).toVector)
    }.toSeq
    // mirror within the count-group's joint bounds (user units need not
    // be the unit square the generator emits)
    val boundsByCount = ltr.groupBy(_.n).map { case (k, v) => k -> jointBounds(v) }
    fromTemplates(ltr, t => {
      val (x0, y0, x1, y1) = boundsByCount(t.n)
      Template(t.name, t.slots.map(s => Slot(x0 + x1 - s.x, y0 + y1 - s.y, s.label)))
    })
  }

  private def fromTemplates(ltr: Seq[Template], mirror: Template => Template): Library = {
    val byCount = ltr.groupBy(_.n).map { case (k, v) => k -> v.toIndexedSeq }
    val rtlByCount = byCount.map { case (k, v) => k -> v.map(mirror) }
    val bounds =
      byCount.map { case (k, v) => (k, true) -> jointBounds(v) } ++
      rtlByCount.map { case (k, v) => (k, false) -> jointBounds(v) }
    Library(byCount, rtlByCount, bounds.toMap)
  }
}
