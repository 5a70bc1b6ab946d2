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

  /** One parsed math op: floor-to-unit, or a signed offset. Units are
    * canonical ChronoUnits (aliases like DATE/MILLIS already folded). */
  sealed trait MathOp
  final case class Floor(unit: ChronoUnit) extends MathOp
  final case class Offset(sign: Int, n: Long, unit: ChronoUnit) extends MathOp

  /** Tokenize a math string (`/DAY+8HOURS-30MINUTES` …) with the
    * reference's strict no-garbled-text validation. The ONE parser both
    * [[resolve]] and the analytics date_math compiler share. */
  def parseOps(math: String): Seq[MathOp] = {
    val out = Seq.newBuilder[MathOp]
    var consumed = 0
    for (m <- Op.findAllMatchIn(math)) {
      require(m.start == consumed,
        s"garbled date math at '${math.substring(consumed)}'")
      consumed = m.end
      if (m.group(1) != null)
        out += Floor(UnitOf.getOrElse(m.group(2),
          sys.error(s"bad unit ${m.group(2)}")))
      else
        out += Offset(if (m.group(4) == "+") 1 else -1, m.group(5).toLong,
          UnitOf.getOrElse(m.group(6), sys.error(s"bad unit ${m.group(6)}")))
    }
    require(consumed == math.length, s"garbled date math tail in '$math'")
    out.result()
  }

  /** Spark SQL unit name (date_trunc / INTERVAL) for a ChronoUnit. */
  def sparkUnitName(u: ChronoUnit): String = u match {
    case YEARS => "year"; case MONTHS => "month"; case DAYS => "day"
    case HOURS => "hour"; case MINUTES => "minute"; case SECONDS => "second"
    case MILLIS => "millisecond"
    case other => sys.error(s"no spark unit for $other")
  }

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
    parseOps(math).foreach {
      case Floor(u) => t = floorTo(t, u)
      case Offset(s, n, u) => t = if (s > 0) t.plus(n, u) else t.minus(n, u)
    }
    t.atZone(zone).toInstant
  }
}
