package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.JsExpr

/** Golden vectors from the reference expressions tests:
  *  - js/TestJavascriptOperations.java (arithmetic, comparison, boolean,
  *    bitwise/shift with 6-bit count masking, conditional, precedence)
  *  - js/TestJavascriptFunction.java (function table spot checks)
  *  - TestExpressionSorts-style variable binding over columns
  */
class JsExprSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def eval(src: String): Double =
    spark.range(1).select(JsExpr.compile(src, Map.empty).as("v"))
      .collect()(0).getDouble(0)

  private def evalsTo(cases: (String, Double)*): Unit =
    cases.foreach { case (src, want) =>
      val got = eval(src)
      assert(got === want, s"'$src' => $got, want $want")
    }

  test("additive / multiplicative / modulo (TestJavascriptOperations)") {
    evalsTo("1+1" -> 2, "1+0.5+0.5" -> 2, "1+1+2" -> 4, "1-(1-2)" -> 2,
      "5-10" -> -5, "50*0.1" -> 5, "27/(9/3)" -> 9, "10/5/2" -> 1,
      "10%3" -> 1, "10%3%2" -> 1, "(27%10)%4" -> 3, "27%(9%5)" -> 3,
      "-1" -> -1, "--1" -> 1, "-(-1)" -> 1, "-0" -> 0)
    assert(eval("1/0").isPosInfinity) // (long) cast of it is MAX_VALUE
  }

  test("comparison chains yield 1.0/0.0") {
    evalsTo("1 < 1" -> 0, "2 < 1" -> 0, "1 < 2" -> 1,
      "2 < 1 < 3" -> 1, "2 < (1 < 3)" -> 0, "(2 < 1) < 1" -> 1,
      "-1 < -2" -> 0, "1 <= 1" -> 1, "2 >= 3" -> 0, "3 > 2" -> 1,
      "1 == 1" -> 1, "-0 == 0" -> 1, "1.1 != 1.1" -> 0, "-1 != 1" -> 1)
  }

  test("boolean not/and/or over truthiness") {
    evalsTo("!1" -> 0, "!!1" -> 1, "!0" -> 1, "!-2" -> 0,
      "1 && 1" -> 1, "-1 && -1" -> 1, "-1 && 0" -> 0, "-0 && -0" -> 0,
      "1 || 0" -> 1, "0 || 0" -> 0, "-1 || 0" -> 1, "-0 || -0" -> 0)
  }

  test("bitwise ops on (long) casts; shifts mask the count to 6 bits") {
    evalsTo("1 << 1" -> 2, "-1 << 31" -> -2147483648d, "3 << 5" -> 96,
      "4195 << 66" -> 16780, "4195 << 70" -> 268480, "-4195 << 70" -> -268480,
      "-15 << 62" -> 4611686018427387904d,
      "1 >>> 1" -> 0, "2 >>> 1" -> 1, "-1 >>> 37" -> 134217727,
      "4 >> 1" -> 2, "-8 >> 2" -> -2,
      "5 & 3" -> 1, "5 | 3" -> 7, "5 ^ 3" -> 6, "~5" -> -6,
      "0xF0 | 0x0F" -> 255, "010 + 1" -> 9) // hex + octal literals
  }

  test("conditional and precedence") {
    evalsTo("1 ? 2 : 3" -> 2, "0 ? 2 : 3" -> 3,
      "1 ? 0 ? 4 : 5 : 3" -> 5, "2 + 3 * 4" -> 14, "(2 + 3) * 4" -> 20,
      "1 + 2 < 4 && 2 * 3 == 6" -> 1)
  }

  test("function table (TestJavascriptFunction spot checks)") {
    assert(eval("abs(-5)") === 5.0)
    assert(eval("sqrt(16)") === 4.0)
    assert(eval("pow(2,10)") === 1024.0)
    assert(eval("min(3, max(1, 2))") === 2.0)
    assert(eval("ln(exp(1))") === 1.0)
    assert(eval("log10(1000)") === math.log10(1000))
    assert(eval("logn(2, 8)") === 3.0)
    assert(eval("ceil(1.2)") === 2.0)
    assert(eval("floor(-1.2)") === -2.0)
    assert(math.abs(eval("atan2(1, 1)") - math.Pi / 4) < 1e-12)
    assert(math.abs(eval("asinh(1)") - 0.8813735870195429) < 1e-12)
    assert(math.abs(eval("acosh(2)") - 1.3169578969248166) < 1e-12)
    assert(math.abs(eval("atanh(0.5)") - 0.5493061443340549) < 1e-12)
    assert(math.abs(eval("atanh(-0.5)") + 0.5493061443340549) < 1e-12)
    // haversin: zero at the same point, symmetric, ~157 km for 1x1 deg at equator
    assert(eval("haversin(0,0,0,0)") === 0.0)
    val d = eval("haversin(0, 0, 1, 1)")
    assert(math.abs(d - 157.2) < 0.5, s"haversin(0,0,1,1) = $d")
    assert(eval("haversin(40, -74, 51, 0)") === eval("haversin(51, 0, 40, -74)"))
  }

  test("variables bind to columns") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "score")
    val c = JsExpr.compile("sqrt(score) + id * 2", Map(
      "id" -> col("id"), "score" -> col("score")))
    val got = df.select(c.as("v")).as[Double].collect().toList
    assert(got === List(math.sqrt(10) + 2, math.sqrt(20) + 4, math.sqrt(30) + 6))
    intercept[IllegalArgumentException] {
      JsExpr.compile("nope + 1", Map.empty)
    }
  }
}
