package graft.tools

/** The declared-trade registry: SURVEY §6.1.a's adjudicated table parsed
  * as the SINGLE list both measurement gates consult (r12 VERDICT item 8 —
  * previously the adjudications lived in per-round prose and each gate
  * carried its own ad-hoc exclusions, so prose and gate could drift).
  *
  * The table is plain markdown between `ADJUDICATED_SLOPES_BEGIN/END`
  * HTML-comment markers; a row declares, per query, an optional ×10 warm
  * slope CEILING (`max_warm_slope` — [[SlopeCheck]] swaps its generic
  * growth flag for this bound) and an optional sf0.1 bench band
  * `lo-hi` seconds (`band_sec` — [[BenchDiff]] excludes a cross-round
  * survivor sitting inside it). A blank cell means that gate's default
  * rule applies. Parsing is strict: missing markers or a malformed row
  * fail loudly, because a silently-empty registry would turn every
  * adjudicated trade back into a red flag (or worse, a gate edit could
  * "fix" a red by breaking the parse). */
object Adjudicated {
  final case class Entry(query: String, maxWarmSlope: Option[Double],
                         bandSec: Option[(Double, Double)], reason: String)

  def load(surveyPath: String = "SURVEY.md"): Map[String, Entry] = {
    val src = scala.io.Source.fromFile(surveyPath, "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val begin = lines.indexWhere(_.contains("ADJUDICATED_SLOPES_BEGIN"))
    val end = lines.indexWhere(_.contains("ADJUDICATED_SLOPES_END"))
    require(begin >= 0 && end > begin,
      s"$surveyPath lacks the ADJUDICATED_SLOPES_BEGIN/END markers (SURVEY §6.1.a)")
    val rows = lines.slice(begin + 1, end).map(_.trim)
      .filter(l => l.startsWith("|") && !l.startsWith("|---"))
      .filterNot(_.toLowerCase.startsWith("| query"))
    rows.map { l =>
      val cells = l.stripPrefix("|").stripSuffix("|").split("\\|", -1).map(_.trim)
      require(cells.length >= 4, s"malformed adjudicated row (need 4 cells): $l")
      val query = cells(0).stripPrefix("`").stripSuffix("`")
      require(query.nonEmpty, s"adjudicated row with empty query cell: $l")
      val slope = if (cells(1).isEmpty) None else Some(cells(1).toDouble)
      val band = if (cells(2).isEmpty) None else {
        val parts = cells(2).split("-").map(_.trim)
        require(parts.length == 2, s"band_sec must be lo-hi: $l")
        val (lo, hi) = (parts(0).toDouble, parts(1).toDouble)
        require(lo <= hi, s"band_sec lo > hi: $l")
        Some((lo, hi))
      }
      Entry(query, slope, band, cells(3))
    }.map(e => e.query -> e).toMap
  }
}
