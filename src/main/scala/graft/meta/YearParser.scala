package graft.meta

/** Survey-year input parsing.
  *
  * Reproduces hbsir/utils/parsing_utils.py:13-101: a year spec may be an
  * int, a collection of ints, `"all"`, `"last"`, or a comma-separated
  * string of years / `a-b` inclusive ranges. Two-digit years pivot:
  * <=60 -> +1400, <100 -> +1300. Out-of-range years raise.
  */
object YearParser {
  final case class YearBounds(first: Int, last: Int)
  /** Reference default range: hbsir/config/default_settings.yaml:40-41. */
  val DefaultBounds: YearBounds = YearBounds(1363, 1401)

  def parse(spec: String, bounds: YearBounds = DefaultBounds): List[Int] =
    spec.trim.toLowerCase match {
      case "all"  => (bounds.first to bounds.last).toList
      case "last" => List(bounds.last)
      case s      => parseYearStr(s, bounds)
    }

  def parse(year: Int, bounds: YearBounds): List[Int] =
    List(checkValidity(year, bounds))
  def parse(years: Iterable[Int], bounds: YearBounds): List[Int] =
    years.map(checkValidity(_, bounds)).toList

  def checkValidity(year0: Int, bounds: YearBounds = DefaultBounds): Int = {
    val year =
      if (year0 <= 60) year0 + 1400
      else if (year0 < 100) year0 + 1300
      else year0
    if (year < bounds.first || year > bounds.last)
      throw new IllegalArgumentException(
        s"Year $year not in range (${bounds.first}, ${bounds.last})")
    year
  }

  private def parseYearStr(s: String, bounds: YearBounds): List[Int] =
    s.split(",").toList.flatMap { part =>
      if (part.contains("-")) {
        val iv = part.split("-")
        if (iv.length != 2)
          throw new IllegalArgumentException(s"Interval Not Valid $part")
        val start = checkValidity(iv(0).trim.toInt, bounds)
        val end = checkValidity(iv(1).trim.toInt, bounds)
        (start to end).toList
      } else List(checkValidity(part.trim.toInt, bounds))
    }

  /** (table, year) availability: hbsir/utils/parsing_utils.py:104-143.
    * `availability` maps table name -> Argham year spec; tables absent
    * from the map are available for all years.
    */
  def tableYearPairs(
      tables: Seq[String],
      years: Seq[Int],
      availability: Map[String, Argham],
      bounds: YearBounds = DefaultBounds,
  ): List[(String, Int)] =
    tables.toList.flatMap { t =>
      availability.get(t) match {
        case Some(a) => years.collect { case y if a.contains(y) => (t, y) }
        case None    => years.map((t, _))
      }
    }
}
