package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Solr CurrencyField (reference solr/core/src/java/org/apache/solr/
  * schema/CurrencyField.java:69-1010): money stored as (minor-unit long,
  * currency code), converted AT QUERY TIME through an exchange-rate
  * table so point/range queries and sorts can be expressed in any
  * currency without reindexing.
  *
  * Replicated semantics:
  *  - getExchangeRate (FileExchangeRateProvider:693-715): same-currency
  *    1.0, else the DIRECT rate, else 1/symmetric — directed rates may
  *    be deliberately asymmetric (the reference's own test currency.xml
  *    registers USD->EUR 2.5 AND EUR->USD 0.5);
  *  - CurrencyValue.convertAmount (:983-1005): value = amount * rate in
  *    double, fraction-digit delta applied as REPEATED *0.1 / *10.0
  *    multiplications, then (long) truncation toward zero;
  *  - CurrencyValue.parse (:920-950): "12.34,EUR" with Math.round into
  *    minor units; "*" = open bound;
  *  - fraction digits from java.util.Currency (same JVM data source).
  *
  * Spark shape: the conversion is a PURE Column expression — a when()
  * chain over the (few) currency codes with constant-folded rates — so
  * range filters and sorts stay inside whole-stage codegen and predicate
  * evaluation; no UDF, no shuffle beyond the query's own.
  */
object Currency {

  /** Directed exchange-rate table. */
  final case class Rates(table: Map[(String, String), Double]) {
    /** FileExchangeRateProvider.getExchangeRate. */
    def rate(from: String, to: String): Double =
      if (from == to) 1.0
      else table.get((from, to)).orElse(table.get((to, from)).map(1.0 / _))
        .getOrElse(throw new IllegalArgumentException(
          s"No available conversion rate between $from to $to"))
    def currencies: Seq[String] =
      table.keysIterator.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
  }

  def fractionDigits(code: String): Int =
    java.util.Currency.getInstance(code).getDefaultFractionDigits

  /** CurrencyValue.convertAmount: double multiply, repeated 0.1/10.0
    * digit-delta adjustment, truncation toward zero. */
  def convertAmount(rate: Double, sourceFractionDigits: Int,
                    sourceAmount: Long, targetFractionDigits: Int): Long = {
    val digitDelta = targetFractionDigits - sourceFractionDigits
    var value = sourceAmount.toDouble * rate
    if (digitDelta < 0) (0 until -digitDelta).foreach(_ => value *= 0.1)
    else (0 until digitDelta).foreach(_ => value *= 10.0)
    value.toLong
  }

  /** CurrencyValue.parse: (minor units, code); None = open '*' bound. */
  def parse(externalVal: String, defaultCurrency: String): Option[(Long, String)] = {
    var amount = externalVal
    var code = defaultCurrency
    if (externalVal.contains(",")) {
      val ac = externalVal.split(",")
      amount = ac(0); code = ac(1)
    }
    if (amount == "*") None
    else Some((math.round(amount.toDouble *
      math.pow(10.0, fractionDigits(code))), code))
  }

  /** Column form of convertAmount over (amount, currency) columns into
    * `target` minor units — a constant-folded when() chain, one branch
    * per known currency (RawCurrencyValueSource's per-ordinal rate cache
    * becomes compile-time constants). */
  def convertedColumn(rates: Rates, amountCol: Column, currencyCol: Column,
                      target: String): Column = {
    val tgtDigits = fractionDigits(target)
    def branch(src: String): Column = {
      val r = rates.rate(src, target)
      val delta = tgtDigits - fractionDigits(src)
      var e = amountCol.cast("double") * lit(r)
      if (delta < 0) (0 until -delta).foreach(_ => e = e * lit(0.1))
      else (0 until delta).foreach(_ => e = e * lit(10.0))
      e.cast("long")
    }
    // Only currencies with a derivable rate to `target` get a branch
    // (the reference throws per-doc at scoring time for unconvertible
    // pairs; here such rows resolve to null and fall out of filters).
    (rates.currencies :+ target).distinct
      .filter(src => scala.util.Try(rates.rate(src, target)).isSuccess)
      .foldLeft(lit(null).cast("long")) { (acc, src) =>
        when(currencyCol === src, branch(src)).otherwise(acc)
      }
  }

  /** CurrencyField.getRangeQuery over converted values: bounds parsed in
    * any currency ("*" open), inclusive like the reference's field
    * queries. Bounds in DIFFERENT currencies are each converted to
    * `queryCurrency` minor units by the caller's parse (the reference
    * requires both ends in the same currency; we take pre-parsed minor
    * units here). */
  def rangeFilter(rates: Rates, amountCol: Column, currencyCol: Column,
                  queryCurrency: String, lo: Option[Long],
                  hi: Option[Long]): Column = {
    val conv = convertedColumn(rates, amountCol, currencyCol, queryCurrency)
    val loC = lo.map(l => conv >= l).getOrElse(lit(true))
    val hiC = hi.map(h => conv <= h).getOrElse(lit(true))
    currencyCol.isNotNull && loC && hiC
  }
}
