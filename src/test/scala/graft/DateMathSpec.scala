package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.search.DateMath

/** Solr date-math semantics (reference
  * solr/core/src/test/org/apache/solr/util/DateMathParserTest.java):
  * floor-to-unit, add/sub, left-to-right chaining, month clamping. */
class DateMathSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-03-31T14:45:30.123Z")

  private def r(e: String): String = DateMath.resolve(now, e).toString

  test("floor to unit") {
    assert(r("NOW/SECOND") == "2024-03-31T14:45:30Z")
    assert(r("NOW/MINUTE") == "2024-03-31T14:45:00Z")
    assert(r("NOW/HOUR") == "2024-03-31T14:00:00Z")
    assert(r("NOW/DAY") == "2024-03-31T00:00:00Z")
    assert(r("NOW/MONTH") == "2024-03-01T00:00:00Z")
    assert(r("NOW/YEAR") == "2024-01-01T00:00:00Z")
  }

  test("add / subtract") {
    assert(r("NOW+2HOURS") == "2024-03-31T16:45:30.123Z")
    assert(r("NOW-1DAY") == "2024-03-30T14:45:30.123Z")
    assert(r("NOW+500MILLIS") == "2024-03-31T14:45:30.623Z")
  }

  test("left-to-right chaining (reference: /DAY then math)") {
    assert(r("NOW/DAY-7DAYS") == "2024-03-24T00:00:00Z")
    assert(r("NOW/HOUR+30MINUTES") == "2024-03-31T14:30:00Z")
    // ordering matters: -7DAYS/DAY != /DAY-7DAYS only when NOW has
    // sub-day precision; both floor afterwards here
    assert(r("NOW-7DAYS/DAY") == "2024-03-24T00:00:00Z")
  }

  test("month arithmetic clamps to last day (Calendar.add semantics)") {
    assert(r("NOW-1MONTH") == "2024-02-29T14:45:30.123Z") // leap clamp
    assert(r("NOW+1MONTH") == "2024-04-30T14:45:30.123Z")
    assert(r("NOW/DAY-1MONTH") == "2024-02-29T00:00:00Z")
  }

  test("DATE is an alias for DAY; plural units accepted") {
    assert(r("NOW/DATE") == r("NOW/DAY"))
    assert(r("NOW-2DAYS") == r("NOW-1DAY-1DAY"))
  }

  test("TZ parameter: rounding happens in the request timezone") {
    val la = java.time.ZoneId.of("America/Los_Angeles")
    val n = Instant.parse("2024-06-15T03:30:00Z") // 2024-06-14 20:30 in LA
    assert(DateMath.resolve(n, "NOW/DAY", la).toString ==
      "2024-06-14T07:00:00Z") // LA midnight = 07:00Z in PDT
    assert(DateMath.resolve(n, "NOW/DAY").toString == "2024-06-15T00:00:00Z")
  }

  test("garbled input raises") {
    intercept[IllegalArgumentException](r("NOW/"))
    intercept[IllegalArgumentException](r("NOW+DAY"))
    intercept[IllegalArgumentException](r("TODAY/DAY"))
    intercept[RuntimeException](r("NOW/FORTNIGHT"))
  }
}
