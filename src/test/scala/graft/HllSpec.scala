package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** HLL cardinality (Solr 5.2 stats cardinality=true analog): accuracy vs
  * exact distinct counts across the linear-counting and raw-estimate
  * regimes, plus merge associativity (the property map-side partial
  * aggregation relies on). */
class HllSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def estimateOf(n: Int, salt: String = ""): Long = {
    val df = (0 until n).map(i => s"v$salt$i").toDF("v")
    df.agg(Stats.cardinality(col("v"))).head().getLong(0)
  }

  test("estimate within 3% of exact across regimes (p=12)") {
    for (n <- Seq(1, 10, 100, 1000, 5000, 20000, 100000)) {
      val est = estimateOf(n)
      val err = math.abs(est - n).toDouble / n
      assert(err <= 0.03, s"n=$n est=$est err=$err")
    }
  }

  test("duplicates don't move the estimate") {
    val uniq = (0 until 2000).map(i => s"k$i")
    val dup = uniq ++ uniq ++ uniq
    val e1 = uniq.toDF("v").agg(Stats.cardinality(col("v"))).head().getLong(0)
    val e2 = dup.toDF("v").agg(Stats.cardinality(col("v"))).head().getLong(0)
    assert(e1 == e2)
  }

  test("register merge == single-pass reduce (partial-agg soundness)") {
    val hashes = (0 until 3000).map(i =>
      // any deterministic 60-bit values work; reuse the estimator's own
      // input domain via a simple spread
      (i.toLong * 2654435761L) & ((1L << 60) - 1))
    val whole = hashes.foldLeft(Stats.hllAgg.zero)(Stats.hllAgg.reduce)
    val (l, r) = hashes.splitAt(1234)
    val merged = Stats.hllAgg.merge(
      l.foldLeft(Stats.hllAgg.zero)(Stats.hllAgg.reduce),
      r.foldLeft(Stats.hllAgg.zero)(Stats.hllAgg.reduce))
    assert(whole.toSeq == merged.toSeq)
    assert(Stats.estimate(whole) == Stats.estimate(merged))
  }

  test("grouped cardinality: per-group registers are independent") {
    val rows = (0 until 4000).map(i => (s"g${i % 4}", s"x${i % 500}"))
    val got = rows.toDF("g", "v").groupBy("g")
      .agg(Stats.cardinality(col("v")).as("c"))
      .as[(String, Long)].collect().toMap
    // each group sees 125 distinct values (i%500 stratified over i%4)
    for ((g, c) <- got) assert(math.abs(c - 125) <= 4, s"$g -> $c")
  }
}
