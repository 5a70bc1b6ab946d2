package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.FuncQuery

/** Solr function-query parsing semantics vs the reference function
  * classes (lucene/queries/.../valuesource package): linear, recip, map
  * (4- and 5-arg), scale (corpus min/max), if/def/exists booleans,
  * arithmetic, strdist. */
class FuncQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private lazy val df = Seq((1L, 10.0), (2L, 50.0), (3L, 90.0))
    .toDF("id", "x")
  private val fields = Map("id" -> col("id"), "x" -> col("x"))

  private def evalAll(src: String): List[Double] =
    df.orderBy("id")
      .select(FuncQuery.compile(src, fields, df).as("v"))
      .as[Double].collect().toList

  test("arithmetic and nesting") {
    assert(evalAll("sum(x,1)") === List(11.0, 51.0, 91.0))
    assert(evalAll("sub(x,10)") === List(0.0, 40.0, 80.0))
    assert(evalAll("product(x,2)") === List(20.0, 100.0, 180.0))
    assert(evalAll("div(x,2)") === List(5.0, 25.0, 45.0))
    assert(evalAll("pow(x,0.5)") === List(math.sqrt(10), math.sqrt(50), math.sqrt(90)))
    assert(evalAll("log(product(x,10))") === List(2.0, math.log10(500), math.log10(900)))
    assert(evalAll("max(x,min(50,70))") === List(50.0, 50.0, 90.0))
  }

  test("linear(x,m,c) = m*x+c (LinearFloatFunction)") {
    assert(evalAll("linear(x,2,4)") === List(24.0, 104.0, 184.0))
  }

  test("recip(x,m,a,b) = a/(m*x+b) (ReciprocalFloatFunction)") {
    assert(evalAll("recip(x,1,1000,1000)") === List(
      1000.0 / 1010, 1000.0 / 1050, 1000.0 / 1090))
  }

  test("map(x,min,max,target[,def]) (RangeMapFloatFunction)") {
    assert(evalAll("map(x,0,20,999)") === List(999.0, 50.0, 90.0))
    assert(evalAll("map(x,0,20,999,-1)") === List(999.0, -1.0, -1.0))
  }

  test("scale(x,minTo,maxTo) uses corpus min/max (ScaleFloatFunction)") {
    assert(evalAll("scale(x,0,1)") === List(0.0, 0.5, 1.0))
    assert(evalAll("scale(x,10,30)") === List(10.0, 20.0, 30.0))
  }

  test("if/def/exists/not booleans as 1.0/0.0") {
    assert(evalAll("if(sub(x,50),7,8)") === List(7.0, 8.0, 7.0))
    assert(evalAll("not(sub(x,50))") === List(0.0, 1.0, 0.0))
    assert(evalAll("exists(x)") === List(1.0, 1.0, 1.0))
    assert(evalAll("def(x,42)") === List(10.0, 50.0, 90.0))
  }

  test("strdist 'edit' = 1 - lev/maxLen") {
    val got = spark.range(1)
      .select(FuncQuery.compile("strdist('kitten','sitting','edit')",
        Map.empty).as("v")).as[Double].collect()(0)
    assert(math.abs(got - (1.0 - 3.0 / 7.0)) < 1e-12)
  }

  test("unknown field / function errors") {
    intercept[IllegalArgumentException] { FuncQuery.compile("nope(x)", fields) }
    intercept[IllegalArgumentException] { FuncQuery.compile("sum(ghost,1)", fields) }
  }

  test("mod, xor (odd-count true), constants, literal, field()") {
    assert(evalAll("mod(x,7)") === List(3.0, 1.0, 6.0))
    // xor chains ^ over truthiness: odd number of trues -> 1
    assert(evalAll("xor(true, false)") === List(1.0, 1.0, 1.0))
    assert(evalAll("xor(true, true)") === List(0.0, 0.0, 0.0))
    assert(evalAll("xor(true, true, true)") === List(1.0, 1.0, 1.0))
    assert(evalAll("xor(exists(x), mod(x, 20))") === List(0.0, 0.0, 0.0))
    assert(evalAll("xor(exists(x), sub(x, 10))") === List(1.0, 0.0, 0.0))
    // e/pi both as calls and bare identifiers
    assert(evalAll("e()") === List(math.E, math.E, math.E))
    assert(evalAll("sum(pi, 0)") === List(math.Pi, math.Pi, math.Pi))
    assert(evalAll("if(true, 1, 2)") === List(1.0, 1.0, 1.0))
    assert(evalAll("if(false, 1, 2)") === List(2.0, 2.0, 2.0))
    assert(evalAll("sum(field('x'), field(x))") === List(20.0, 100.0, 180.0))
    assert(evalAll("literal(3.5)") === List(3.5, 3.5, 3.5))
  }

}
