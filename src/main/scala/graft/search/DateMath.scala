package graft.search

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit
import java.time.temporal.ChronoUnit._

/** Solr date-math expressions (reference
  * solr/core/src/java/org/apache/solr/util/DateMathParser.java): an
  * anchor (`NOW`) followed by any sequence of `/UNIT` (floor to unit
  * start), `+N UNIT` and `-N UNIT`, evaluated strictly left to right in
  * UTC — e.g. `NOW/DAY-7DAYS` = start of the day one week ago. Month
  * arithmetic clamps to the last day of the target month
  * (java.time semantics, matching Calendar.add in the reference).
  */
object DateMath {

  private val UnitOf: Map[String, ChronoUnit] = Map(
    "YEAR" -> YEARS, "YEARS" -> YEARS,
    "MONTH" -> MONTHS, "MONTHS" -> MONTHS,
    "DAY" -> DAYS, "DAYS" -> DAYS, "DATE" -> DAYS,
    "HOUR" -> HOURS, "HOURS" -> HOURS,
    "MINUTE" -> MINUTES, "MINUTES" -> MINUTES,
    "SECOND" -> SECONDS, "SECONDS" -> SECONDS,
    "MILLI" -> MILLIS, "MILLIS" -> MILLIS,
    "MILLISECOND" -> MILLIS, "MILLISECONDS" -> MILLIS)

  private val Op = "(/([A-Z]+))|(([+-])(\\d+)([A-Z]+))".r

  /** Round `t` down to the start of `unit` (UTC). */
  private def floorTo(t: LocalDateTime, unit: ChronoUnit): LocalDateTime =
    unit match {
      case YEARS  => t.toLocalDate.withDayOfYear(1).atStartOfDay
      case MONTHS => t.toLocalDate.withDayOfMonth(1).atStartOfDay
      case _      => t.truncatedTo(unit)
    }

  /** Evaluate `expr` (must start with `NOW`) against the given anchor.
    * `zone` is Solr's TZ request parameter (DateMathParser's timezone
    * argument): rounding and day/month arithmetic happen in that zone's
    * local calendar, default UTC. */
  def resolve(now: Instant, expr: String,
              zone: java.time.ZoneId = ZoneOffset.UTC): Instant = {
    require(expr.startsWith("NOW"), s"date math must start with NOW: $expr")
    val math = expr.substring(3)
    var t = LocalDateTime.ofInstant(now, zone)
    var consumed = 0
    for (m <- Op.findAllMatchIn(math)) {
      require(m.start == consumed, s"garbled date math at '${math.substring(consumed)}'")
      consumed = m.end
      if (m.group(1) != null) {
        val u = UnitOf.getOrElse(m.group(2), sys.error(s"bad unit ${m.group(2)}"))
        t = floorTo(t, u)
      } else {
        val u = UnitOf.getOrElse(m.group(6), sys.error(s"bad unit ${m.group(6)}"))
        val n = m.group(5).toLong
        t = if (m.group(4) == "+") t.plus(n, u) else t.minus(n, u)
      }
    }
    require(consumed == math.length, s"garbled date math tail in '$expr'")
    t.atZone(zone).toInstant
  }
}
