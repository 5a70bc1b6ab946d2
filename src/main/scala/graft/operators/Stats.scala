package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Approximate-cardinality statistics — the Solr 5.2 StatsComponent
  * `cardinality=true` option (reference
  * solr/core/src/java/org/apache/solr/handler/component/StatsValuesFactory.java,
  * which delegates to the java-hll HyperLogLog): a deterministic HLL with
  * p=12 (4096 byte registers, ~1.6% standard error) and the standard
  * linear-counting small-range correction.
  *
  * Scale shape: a typed `Aggregator` exposed through `functions.udaf`, so
  * Catalyst runs it with map-side partial aggregation — each partition
  * reduces its rows into a fixed 4 KiB register array per group and only
  * registers cross the shuffle, never values. That is exactly why Solr
  * added the HLL option over exact distinct counts.
  *
  * Determinism contract (what makes this SQL-oracle checkable, unlike a
  * library HLL): the input hash is the md5-derived 60-bit value of
  * TextFns.md5Bits60, the register sum Σ 2^(49-ρ) is an exact BIGINT,
  * and every double op appears in one fixed order — so DuckDB re-derives
  * the estimate bit-for-bit.
  */
object Stats {

  /** Register-index bits: m = 2^p registers, stderr ~ 1.04/sqrt(m). */
  final val P = 12
  final val M = 1 << P

  /** Value bits below the register index (60-bit hash minus P). */
  final val W = 60 - P
  /** Max rank = W + 1; Σ 2^(MaxRank - ρ) is exact in a Long. */
  final val MaxRank = W + 1
  final val Two49: Double = math.pow(2.0, MaxRank).toLong.toDouble

  val AlphaMM: Double = (0.7213 / (1.0 + 1.079 / M)) * M * M

  /** Estimate from a full register array (shared by engine + spec). */
  def estimate(regs: Array[Byte]): Long = {
    var sumInt = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = regs(i) & 0xFF
      sumInt += 1L << (MaxRank - r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = AlphaMM * Two49 / sumInt.toDouble
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** HLL over the 60-bit md5 hash values of TextFns.md5Bits60. */
  val hllAgg: Aggregator[Long, Array[Byte], Long] =
    new Aggregator[Long, Array[Byte], Long] {
      def zero: Array[Byte] = new Array[Byte](M)
      def reduce(b: Array[Byte], h: Long): Array[Byte] = {
        val idx = (h >>> W).toInt // top P of the 60 hash bits
        val w = h & ((1L << W) - 1)
        // rank of the highest set bit within the W value bits, from the
        // top: ρ = 1 for a leading 1, …, MaxRank when all W bits are 0
        val rho =
          if (w == 0L) MaxRank
          else java.lang.Long.numberOfLeadingZeros(w) - (63 - W)
        if (rho > (b(idx) & 0xFF)) b(idx) = rho.toByte
        b
      }
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        var i = 0
        while (i < M) { if ((b(i) & 0xFF) > (a(i) & 0xFF)) a(i) = b(i); i += 1 }
        a
      }
      def finish(b: Array[Byte]): Long = estimate(b)
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  private lazy val hllUdaf = udaf(hllAgg)

  /** `cardinality(value)` as an aggregate Column usable in any groupBy.
    * The value is hashed via its canonical string form (what Solr's
    * field-value hashing does for its HLL input). */
  def cardinality(value: Column): Column =
    hllUdaf(TextFns.md5Bits60(value.cast("string")))
}
