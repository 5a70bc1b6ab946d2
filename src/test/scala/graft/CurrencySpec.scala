package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Currency
import graft.operators.Currency.Rates

/** CurrencyField vectors from the reference's own suite
  * (AbstractCurrencyFieldTest.testCurrencyRangeSearch/-PointQuery/-Sort,
  * solr/core/src/test/org/apache/solr/schema/AbstractCurrencyFieldTest
  * .java:137-300) on the reference's test currency.xml rates — including
  * the deliberately ASYMMETRIC USD->EUR 2.5 / EUR->USD 0.5 pair. */
class CurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // solr/core/src/test-files/solr/collection1/conf/currency.xml:28-35
  private val rates = Rates(Map(
    ("USD", "JPY") -> 81.29, ("USD", "EUR") -> 2.5, ("USD", "GBP") -> 0.5,
    ("EUR", "GBP") -> 0.5, ("MXN", "USD") -> 0.5, ("EUR", "USD") -> 0.5))

  test("exchange rate resolution: same, direct, 1/symmetric, asymmetric") {
    assert(rates.rate("USD", "USD") === 1.0)
    assert(rates.rate("USD", "EUR") === 2.5)
    assert(rates.rate("EUR", "USD") === 0.5) // direct wins over 1/2.5
    assert(rates.rate("GBP", "USD") === 2.0) // inverse of USD->GBP
    assert(rates.rate("JPY", "USD") === 1.0 / 81.29)
    intercept[IllegalArgumentException](rates.rate("USD", "CHF"))
  }

  test("convertAmount digit-delta quirks (CurrencyValue.convertAmount)") {
    // USD (2 digits) -> JPY (0 digits): 1000*81.29 = 81289.999... in
    // double, *0.1 *0.1 -> 812.899..., TRUNCATED -> 812 (not 813: the
    // reference's repeated-multiply + (long) cast, not rounding)
    assert(Currency.convertAmount(81.29, 2, 1000L, 0) === 812L)
    // JPY -> USD: delta +2
    assert(Currency.convertAmount(1.0 / 81.29, 0, 812L, 2) === 998L)
    // truncation toward zero, negatives too
    assert(Currency.convertAmount(0.5, 2, 101L, 2) === 50L)
    assert(Currency.convertAmount(0.5, 2, -101L, 2) === -50L)
  }

  test("parse: minor units with rounding, '*' open bound") {
    assert(Currency.parse("12.34,EUR", "USD") === Some((1234L, "EUR")))
    assert(Currency.parse("10", "USD") === Some((1000L, "USD")))
    // 1.005*100 = 100.49999... in double -> Math.round -> 100 (the
    // reference's double-then-round parse, not decimal arithmetic)
    assert(Currency.parse("1.005,USD", "USD") === Some((100L, "USD")))
    assert(Currency.parse("*,EUR", "USD") === None)
    assert(Currency.parse("*", "USD") === None)
  }

  /** The reference's testCurrencyRangeSearch corpus: 0,USD; 1..10,USD;
    * -100..-104,USD; another 0,USD; plus docs with no value. */
  private lazy val corpus = {
    import spark.implicits._
    val vals = Seq((0L, 0L, "USD")) ++
      (1 to 10).map(i => (i.toLong, i * 100L, "USD")) ++
      (-104 to -100).map(i => (i.toLong, i * 100L, "USD")) ++
      Seq((40L, 0L, "USD")) ++
      (100 to 150).map(i => (i.toLong, 0L, null: String)) // no value
    vals.toDF("id", "amount", "currency")
  }

  private def count(lo: String, hi: String, cur: String = "USD"): Long = {
    val l = Currency.parse(lo, cur).map(_._1)
    val h = Currency.parse(hi, cur).map(_._1)
    corpus.where(Currency.rangeFilter(rates, col("amount"), col("currency"),
      cur, l, h)).count()
  }

  test("range search vectors (testCurrencyRangeSearch)") {
    assert(count("2.00", "5.00") === 4)
    assert(count("0.50", "1.00") === 1)
    assert(count("24.00", "25.00") === 0)
    // GBP is 1/2 USD: docs 1 and 2 fall in [0.50,1.00] GBP
    assert(count("0.50", "1.00", "GBP") === 2)
    // EUR is 2.5x USD: doc 10 = 25.00 EUR
    assert(count("24.00", "25.00", "EUR") === 1)
    assert(count("24.99", "25.01", "EUR") === 1) // asymmetric rate path
    // open bounds: all 17 docs WITH a value (2 zeros + 10 + 5 negative)
    assert(count("*", "*") === 17)
    assert(count("*", "*", "EUR") === 17)
    assert(count("*", "5") === 12) // 2 zeros + docs 1..5 + 5 negatives
  }

  test("point query (testCurrencyPointQuery shape)") {
    import spark.implicits._
    val docs = Seq((1L, 1000L, "USD"), (2L, 1500L, "EUR")).toDF("id", "amount", "currency")
    def point(q: String): Seq[Long] = {
      val Some((v, c)) = Currency.parse(q, "USD")
      docs.where(Currency.rangeFilter(rates, col("amount"), col("currency"),
        c, Some(v), Some(v))).select("id").as[Long].collect().toSeq
    }
    assert(point("15.00,EUR") === Seq(2L))
    assert(point("7.50,USD") === Seq(2L)) // EUR->USD 0.5 (direct asymmetric)
    assert(point("7.49,USD") === Seq.empty)
    assert(point("7.51,USD") === Seq.empty)
  }

  test("sort by converted value (testCurrencySort shape)") {
    import spark.implicits._
    val docs = Seq((1L, 1099L, "USD"), (2L, 1500L, "EUR"), (3L, 100L, "USD"))
      .toDF("id", "amount", "currency")
    val sorted = docs.orderBy(Currency.convertedColumn(rates, col("amount"),
      col("currency"), "USD").desc).select("id").as[Long].collect().toSeq
    // 15.00 EUR = 7.50 USD, so: 1 (10.99), 2 (7.50), 3 (1.00)
    assert(sorted === Seq(1L, 2L, 3L))
  }
}
